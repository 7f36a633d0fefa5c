package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextStats}
import graft.functions.{TextFunctions => T}

/** The LLM-training-data operator surface: dedup families, similarity
  * search, text analysis, multimodal plumbing — each driven through the
  * oracle gate where the semantics are SQL-expressible (DuckDB list
  * comprehensions cover shingling; inner products verified bit-exact
  * against Spark's double fold). Approximate variants (LSH/IVF/SimHash)
  * whose hash spaces aren't portable SQL are exercised as rows-only
  * queries plus recall assertions in ScalaTest.
  */
object LlmOps {

  /** The ingest-parity queries (q94/q116) replay their micro-batches
    * into per-run temp dirs; the result is materialized EAGERLY
    * (localCheckpoint) so the dirs can be deleted before returning —
    * repeated gate/bench sweeps must not accumulate orphaned slices
    * under the system temp dir. */
  /** Shared known-item query set for the BM25 family
    * (q217/q219/q220/q222/q225): every 101st document's first six
    * tokens — the Spark side of [[bm25OracleCtes]]'s `q` CTE.
    *
    * Scale-probe knob (round 9): with SPARK_GRAFT_BM25_PIN_QUERIES
    * set, the query set pins to replica-0 ids (doc_id <
    * [[ScaleProbeReplicaOffset]], mirroring tools/scaleprobe.py's
    * OFFSET — keep the two in sync), so the retrieval scale rungs can
    * measure the KERNEL's growth in corpus size at CONSTANT query
    * count, separated from the gate construction's queries×postings
    * growth (the query set otherwise grows with the corpus by design,
    * doc_id % 101). An identity at every real SF — all doc ids are
    * replica-0 there — so oracle gates are unaffected; only
    * scaleprobe's replicated dirs differ. */
  private val ScaleProbeReplicaOffset = 10000000L
  private def knownItemQueries(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = docs.filter(col("doc_id") % 101 === 7)
    val pinned =
      if (sys.env.contains("SPARK_GRAFT_BM25_PIN_QUERIES"))
        base.filter(col("doc_id") < ScaleProbeReplicaOffset)
      else base
    pinned.select(col("doc_id").as("qid"),
      array_join(slice(split(col("text"), " "), 1, 6), " ").as("qtext"))
  }

  /** Exact brute-force cosine top-5 oracle shared by q224, q226 and
    * q229 (the q27 spelling): any ANN store probing ALL cells must
    * equal this, whatever model built the store — one definition so a
    * cross-engine float-parity tweak can never make the gates
    * diverge. The CANDIDATE corpus is parameterized (q229 ranks
    * against the as-of snapshot — the even-id half — while the query
    * set stays the full-table construction). */
  private val annBruteOracleSql: String = annBruteOracleSqlOver("TRUE")

  private def annBruteOracleSqlOver(corpusWhere: String): String = s"""
        WITH q AS (SELECT vec_id qid, embedding::DOUBLE[] qv
                   FROM embeddings WHERE vec_id % 97 = 3),
             c AS (SELECT vec_id cid, embedding::DOUBLE[] cv
                   FROM embeddings WHERE $corpusWhere),
             sc AS (
               SELECT qid, cid,
                      list_inner_product(qv,cv) /
                      (sqrt(list_inner_product(qv,qv)) *
                       sqrt(list_inner_product(cv,cv))) AS c
               FROM q CROSS JOIN c WHERE qid != cid),
             ranked AS (
               SELECT qid, cid, c,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY c DESC, cid) AS rk
               FROM sc)
        SELECT qid AS query_id, CAST(rk AS BIGINT) AS rank,
               cid AS neighbor_id, round(c, 4) AS cosine
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank"""

  /** The BM25 oracle pipeline shared by q217/q219/q220/q222 (the
    * relSql precedent from the graph family): known-item queries, one
    * corpus tokenization, tf/len/df ledgers, N/avgdl, per-(query, doc)
    * scores rounded to 4 dp and the per-query rank — mirroring
    * [[graft.operators.TextStats.bm25FromPostings]] term for term
    * (milli-division constants so both engines evaluate the SAME IEEE
    * division, the Lucene non-negative idf, ranked by rounded score
    * then doc id). Tails differ per query; the arithmetic lives here
    * ONCE. */
  private val bm25OracleCtes: String = bm25OracleCtesOver("documents")

  /** [[bm25OracleCtes]] with a parameterized CORPUS relation (q225
    * scores against the post-redaction corpus while the query set
    * stays the full-table known-item construction — exactly the
    * streaming store's view after a tombstone re-ingest). */
  private def bm25OracleCtesOver(corpus: String): String = s"""
        q AS (
          SELECT doc_id AS qid,
                 array_to_string(string_split(text, ' ')[1:6], ' ')
                   AS qtext
          FROM documents WHERE doc_id % 101 = 7),
        qt AS (SELECT DISTINCT qid,
                      unnest(string_split(qtext, ' ')) AS token FROM q),
        tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
               FROM $corpus),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY 1, 2),
        len AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY 1),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM len),
        ad AS (SELECT avg(len) AS avgdl FROM len),
        w AS (
          SELECT qt.qid, tf.doc_id,
                 ln(1.0 + (n.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
                 (tf.tf * (2200/1000.0)) /
                 (tf.tf + (1200/1000.0) *
                   ((250/1000.0) + (750/1000.0) * len.len / ad.avgdl))
                   AS w
          FROM qt JOIN tf USING (token) JOIN dfq USING (token)
          JOIN len ON tf.doc_id = len.doc_id
          CROSS JOIN n CROSS JOIN ad),
        sc AS (SELECT qid, doc_id, round(sum(w), 4) AS score
               FROM w GROUP BY 1, 2),
        rk AS (SELECT qid, doc_id, score,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY score DESC, doc_id) AS rn
               FROM sc)"""

  private def materializeAndClean(
      df: org.apache.spark.sql.DataFrame, dirs: String*)
      : org.apache.spark.sql.DataFrame = {
    val out = df.localCheckpoint(true)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    dirs.foreach(d => rm(new java.io.File(d)))
    out
  }

  /** One relation's skew-profile block in DuckDB SQL — the exact
    * integer arithmetic of [[graft.operators.Profile.skewProfile]]
    * (distinct-frequency ledger, discrete-lower percentiles over keys,
    * milli fixed-point ratios via BIGINT floor division). */
  private def skewSql(rel: String, table: String, key: String): String = s"""
        SELECT '$rel' AS relation, n_rows, n_keys, max_freq,
               avg_freq_milli, p50_freq, p99_freq,
               (max_freq * 1000000) // avg_freq_milli AS skew_ratio_milli,
               (max_freq * 1000 + avg_freq_milli - 1) // avg_freq_milli
                 AS suggested_salt
        FROM (
          WITH f AS (SELECT count(*) AS f FROM $table GROUP BY $key),
          led AS (SELECT f, count(*) AS nk FROM f GROUP BY 1),
          c AS (SELECT f, nk, sum(nk) OVER (ORDER BY f) AS ck FROM led),
          s AS (SELECT CAST(sum(f * nk) AS BIGINT) AS n_rows,
                       CAST(sum(nk) AS BIGINT) AS n_keys,
                       CAST(max(f) AS BIGINT) AS max_freq FROM c)
          SELECT s.n_rows, s.n_keys, s.max_freq,
                 (s.n_rows * 1000) // s.n_keys AS avg_freq_milli,
                 (SELECT CAST(min(f) AS BIGINT) FROM c CROSS JOIN s
                  WHERE ck * 100 >= 50 * s.n_keys) AS p50_freq,
                 (SELECT CAST(min(f) AS BIGINT) FROM c CROSS JOIN s
                  WHERE ck * 100 >= 99 * s.n_keys) AS p99_freq
          FROM s)"""

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // Join-key skew profile: per-key frequency extremes, discrete
    // percentiles, max/avg skew ratio and the leveling salt factor —
    // the diagnostic read before choosing hash join vs SkewJoin
    // salting vs AQE skew splits for a key. Everything beyond the
    // (key → freq) aggregate runs on the distinct-frequency ledger
    // (the q153 √(2n) bound), in exact milli fixed-point integers.
    // ------------------------------------------------------------------
    "q154_skew_profile" -> Q(
      fn = (s, dir) => {
        import graft.operators.Profile
        Profile.skewProfile(Tables(s, dir, "events"), "user_id")
          .select(lit("events.user_id").as("relation"), col("*"))
          .unionByName(
            Profile.skewProfile(Tables(s, dir, "lineitem"), "l_partkey")
              .select(lit("lineitem.l_partkey").as("relation"), col("*")))
          .orderBy("relation")
      },
      oracle = Some(s"""
        ${skewSql("events.user_id", "events", "user_id")}
        UNION ALL
        ${skewSql("lineitem.l_partkey", "lineitem", "l_partkey")}
        ORDER BY relation""")),

    // ---------------------------------------------------------- dedup
    "q22_dedup_exact" -> Q(
      fn = (s, dir) => {
        Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text")
          .orderBy("keep_id")
          .select("fp", "keep_id", "n_copies")
      },
      oracle = Some("""
        SELECT md5(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '', 'g')) AS fp,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY keep_id""")),

    "q23_dedup_ngram_jaccard" -> Q(
      fn = (s, dir) => {
        Dedup.ngramJaccardPairs(
          Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.5, partitionCol = Some("lang"))
          .orderBy("a_id", "b_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                     (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3) AS jaccard
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                    (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3) >= 0.5
        ORDER BY a_id, b_id""")),

    // Same oracle as q23: the LSH pass must recover every pair the
    // exact algorithm finds (planted near-dups sit at J≥0.95, where
    // 8 bands × 4 rows has miss probability ~1e-7 — and the run is
    // deterministic, so local green ⇒ driver green).
    "q24_dedup_minhash_lsh" -> Q(
      fn = (s, dir) => {
        Dedup.minhashLshPairs(
          Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.5, numHashes = 32, bands = 8,
          partitionCol = Some("lang"))
          .orderBy("a_id", "b_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                     (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3) AS jaccard
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                    (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3) >= 0.5
        ORDER BY a_id, b_id""")),

    // Incremental (delta-ingest) dedup: pairs touching the "new" half
    // of the corpus, computed new×new + new×old — never old×old. The
    // oracle computes all pairs and filters; the Spark side never
    // generates the old self-join in the first place (the asymmetry is
    // the point at scale).
    "q70_incremental_dedup" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Dedup.incrementalJaccardPairs(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text", n = 3, threshold = 0.5,
          partitionCol = Some("lang"))
          .orderBy("a_id", "b_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id, lang, (doc_id % 2 = 0) AS is_new,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                     (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
                 AS jaccard
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE (a.is_new OR b.is_new) AND
              round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                    (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
              >= 0.5
        ORDER BY a_id, b_id""")),

    // ------------------------------------------------------------------
    // Continuous-ingest dedup, gated END-TO-END: the corpus arrives as
    // two micro-batches (doc_id parity) through the streaming path's
    // per-batch step — batch 0 emits even×even pairs, batch 1 odd×odd +
    // odd×even — and the union of the per-batch batch_id=N pair slices
    // must equal the FULL corpus pair set (every pair surfaces exactly
    // once, when its later doc arrives). The oracle recomputes the
    // whole-corpus Jaccard pairs directly, so the incremental
    // decomposition + the replay-idempotent file protocol are both on
    // the hook. Fresh temp dirs per invocation; pair content is
    // deterministic.
    // ------------------------------------------------------------------
    "q94_ingest_dedup_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val corpusDir = java.nio.file.Files
          .createTempDirectory("graft-q94-corpus").toString
        val pairsDir = java.nio.file.Files
          .createTempDirectory("graft-q94-pairs").toString
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        Streaming.ingestDedupBatch(docs.filter(col("doc_id") % 2 === 0),
          0L, corpusDir, pairsDir, "doc_id", "text", n = 3, threshold = 0.5)
        Streaming.ingestDedupBatch(docs.filter(col("doc_id") % 2 =!= 0),
          1L, corpusDir, pairsDir, "doc_id", "text", n = 3, threshold = 0.5)
        materializeAndClean(
          s.read.option("basePath", pairsDir).parquet(pairsDir)
            .select("a_id", "b_id", "jaccard")
            .orderBy("a_id", "b_id"),
          corpusDir, pairsDir)
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                     (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
                 AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                    (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
              >= 0.5
        ORDER BY a_id, b_id""")),

    // ORACLE-GATED (promoted from rows-only in r6): the SimHash kernel
    // is FNV-1a + splitmix64 — emulated in DuckDB via HUGEINT mod-2^64
    // arithmetic ([[PortableHashSql]]), and the oracle brute-forces all
    // pairs because 4×16-bit banding is recall-complete at hamming <= 3
    // (pigeonhole): banding changes cost, never the answer. Recall of
    // the planted near-dup pairs is additionally asserted in DedupSpec.
    "q25_dedup_simhash" -> Q(
      fn = (s, dir) => {
        Dedup.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3)
          .orderBy("a_id", "b_id")
      },
      oracle = Some(PortableHashSql.simhashPairsSql)),

    // Character-level n-gram Jaccard over the unsegmented-script slice
    // (zh) — the tokenization CJK dedup needs; whitespace shingles
    // would be blind to non-space-delimited boundaries. Char 5-grams,
    // same prefix-filter + full-index-verify machinery as q23.
    "q55_dedup_char_ngram" -> Q(
      fn = (s, dir) => {
        Dedup.ngramJaccardPairs(
          Tables(s, dir, "documents").filter(col("lang") === "zh"),
          "doc_id", "text", n = 5, threshold = 0.25, charLevel = true)
          .orderBy("a_id", "b_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id,
                 list_distinct([text[i+1:i+5]
                                for i in range(len(text)-4)]) AS sh
          FROM documents WHERE lang = 'zh')
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                     (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
                 AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                    (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
              >= 0.25
        ORDER BY a_id, b_id""")),

    // Near-dup pairs → transitive-closure clusters: every doc labeled
    // with the minimum id of its connected component, sizes + id
    // checksums pinning the exact membership. The oracle closes the
    // same char-ngram pair graph with a recursive CTE — small there
    // (closure is quadratic in SQL), O(log n) alternating-star rounds
    // on the Spark side.
    "q64_dedup_clusters" -> Q(
      fn = (s, dir) => {
        import graft.operators.ConnectedComponents
        val pairs = Dedup.ngramJaccardPairs(
          Tables(s, dir, "documents").filter(col("lang") === "zh"),
          "doc_id", "text", n = 5, threshold = 0.25, charLevel = true)
        ConnectedComponents(pairs, "a_id", "b_id")
          .groupBy(col("component"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("id")).as("id_checksum"))
          .orderBy("component")
      },
      oracle = Some("""
        WITH RECURSIVE s AS (
          SELECT doc_id,
                 list_distinct([text[i+1:i+5]
                                for i in range(len(text)-4)]) AS sh
          FROM documents WHERE lang = 'zh'),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                      (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
                >= 0.25),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, lbl) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
        SELECT component, count(*) AS n_docs,
               CAST(sum(id) AS BIGINT) AS id_checksum
        FROM comp GROUP BY component ORDER BY component""")),

    // ------------------------------------------------------------------
    // SoftDeDup-style reweighting: instead of DROPPING near-duplicates,
    // every document gets sampling weight 1/|near-dup cluster| (docs in
    // no cluster keep weight 1), so a cluster of k near-identical docs
    // contributes ONE document's worth of mass to the training mix —
    // the soft alternative to q64/q67's hard keeper rule, preserving
    // rare-variant diversity while neutralizing duplication bias.
    // Composes the guarded Jaccard-pair + CC primitives; the weight
    // join-back is one broadcast of the model-sized cluster ledger.
    // ------------------------------------------------------------------
    "q91_soft_dedup_weights" -> Q(
      fn = (s, dir) => {
        import graft.operators.ConnectedComponents
        val zh = Tables(s, dir, "documents").filter(col("lang") === "zh")
        val pairs = Dedup.ngramJaccardPairs(
          zh, "doc_id", "text", n = 5, threshold = 0.25, charLevel = true)
        val comp = ConnectedComponents(pairs, "a_id", "b_id")
        val sizes = comp.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        zh.select("doc_id", "source", "n_chars")
          .join(
            comp.join(sizes, "component")
              .select(col("id"), col("cluster_size")),
            col("doc_id") === col("id"), "left")
          .withColumn("w",
            lit(1.0) / coalesce(col("cluster_size"), lit(1L)))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("w")), 4).as("effective_docs"),
            sum(col("n_chars")).as("raw_chars"),
            round(sum(col("w") * col("n_chars")), 2).as("effective_chars"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH RECURSIVE s AS (
          SELECT doc_id,
                 list_distinct([text[i+1:i+5]
                                for i in range(len(text)-4)]) AS sh
          FROM documents WHERE lang = 'zh'),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                      (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
                >= 0.25),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, lbl) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
        sizes AS (
          SELECT component, count(*) AS cluster_size FROM comp
          GROUP BY component),
        wdoc AS (
          SELECT d.doc_id, d.source, d.n_chars,
                 CAST(1.0 AS DOUBLE) / coalesce(z.cluster_size, 1) AS w
          FROM documents d
          LEFT JOIN (SELECT c.id, s2.cluster_size
                     FROM comp c JOIN sizes s2 USING (component)) z
            ON d.doc_id = z.id
          WHERE d.lang = 'zh')
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               round(sum(w), 4) AS effective_docs,
               CAST(sum(n_chars) AS BIGINT) AS raw_chars,
               round(sum(w * n_chars), 2) AS effective_chars
        FROM wdoc GROUP BY source ORDER BY source""")),

    // ORACLE-GATED (promoted from rows-only in r6): the rolling-hash
    // fingerprint replays in DuckDB as the algebraically-equal direct
    // polynomial mod 2^64 + splitmix64 ([[PortableHashSql]]), window
    // minima with rightmost tie-break and the candidate df-cap both
    // mirrored. The winnowing guarantee + overlap semantics are
    // additionally asserted in DedupSpec.
    "q43_dedup_winnowing" -> Q(
      fn = (s, dir) => {
        Dedup.winnowingPairs(Tables(s, dir, "documents"), "doc_id", "text",
          k = 8, w = 8, minOverlap = 0.5)
          .orderBy("a_id", "b_id")
      },
      oracle = Some(PortableHashSql.winnowingPairsSql())),

    // SemDeDup semantic dedup: cluster-then-compare. K-means cell
    // assignment isn't portable SQL → rows-only; precision-1 subset
    // (vs the q26 exact grid), recall, and determinism are gated in
    // DedupSpec, the row count by the EntrySpec golden.
    "q85_dedup_semantic" -> Q(
      fn = (s, dir) => {
        Dedup.semanticPairs(
          Tables(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.45, targetCellSize = 64, probes = 2)
          .orderBy("a_id", "b_id")
      }),

    "q26_dedup_embedding" -> Q(
      fn = (s, dir) => {
        Dedup.embeddingCosinePairs(
          Tables(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.45)
          .orderBy("a_id", "b_id")
      },
      oracle = Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_inner_product(a.v,b.v) /
                     (sqrt(list_inner_product(a.v,a.v)) *
                      sqrt(list_inner_product(b.v,b.v))), 4) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_inner_product(a.v,b.v) /
                    (sqrt(list_inner_product(a.v,a.v)) *
                     sqrt(list_inner_product(b.v,b.v))), 4) >= 0.45
        ORDER BY a_id, b_id""")),

    // Int8 embedding quantization round-trip: per-vector scale, max
    // component error, and reconstruction cosine — all recomputed
    // identically by the oracle (same rounding, same fold).
    "q54_embedding_quantize" -> Q(
      fn = (s, dir) => {
        import graft.functions.{VectorFunctions => V}
        import graft.plans.DotProduct
        val e = Tables(s, dir, "embeddings")
          .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
          .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
          .withColumn("deq", V.dequantize(V.quantizeInt8(col("v")), col("ma")))
        e.select(
          col("vec_id"),
          round(col("ma"), 6).as("max_abs"),
          round(array_max(transform(arrays_zip(col("v"), col("deq")),
            p => abs(p.getField("v") - p.getField("deq")))), 6).as("max_err"),
          round(DotProduct(col("v"), col("deq")) /
            (sqrt(DotProduct(col("v"), col("v"))) *
             sqrt(DotProduct(col("deq"), col("deq")))), 6).as("recon_cosine"))
          .orderBy("vec_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        m AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS ma
          FROM e),
        d AS (
          SELECT vec_id, v, ma,
                 list_transform(v, x -> round(x * 127 / ma) * ma / 127) AS deq
          FROM m)
        SELECT vec_id,
               round(ma, 6) AS max_abs,
               round(list_max(list_transform(v,
                     x -> abs(x - round(x * 127 / ma) * ma / 127))), 6)
                 AS max_err,
               round(list_inner_product(v, deq) /
                     (sqrt(list_inner_product(v, v)) *
                      sqrt(list_inner_product(deq, deq))), 6) AS recon_cosine
        FROM d
        ORDER BY vec_id""")),

    // ----------------------------------------------------- similarity
    "q27_sim_topk_brute" -> Q(
      fn = (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 5)
          .orderBy("query_id", "rank")
      },
      oracle = Some("""
        WITH q AS (SELECT vec_id qid, embedding::DOUBLE[] qv
                   FROM embeddings WHERE vec_id < 20),
             c AS (SELECT vec_id cid, embedding::DOUBLE[] cv FROM embeddings),
             sc AS (
               SELECT qid, cid,
                      list_inner_product(qv,cv) /
                      (sqrt(list_inner_product(qv,qv)) *
                       sqrt(list_inner_product(cv,cv))) AS c
               FROM q CROSS JOIN c WHERE qid != cid),
             ranked AS (
               SELECT qid, cid, c,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY c DESC, cid) AS rk
               FROM sc)
        SELECT qid AS query_id, CAST(rk AS BIGINT) AS rank,
               cid AS neighbor_id, round(c, 4) AS cosine
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank""")),

    // Approximate ANN (hyperplane LSH). Oracle-gated since round 7:
    // the bucket space is a seeded deterministic hash (not a trained
    // model), so it ports to DuckDB the same way q25/q43's kernels
    // did — splitmix64 in HUGEINT and the sign-deciding dot product
    // as an order-pinned sequential fold (see
    // [[PortableHashSql.lshTopKSql]]). Recall vs brute force is
    // additionally asserted in SimilaritySpec.
    "q28_sim_topk_lsh" -> Q(
      fn = (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        Similarity.lshTopK(
          emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          emb, "vec_id", "embedding",
          k = 5, nBits = 6, probes = 2)
          .orderBy("query_id", "rank")
      },
      oracle = Some(PortableHashSql.lshTopKSql(
        nBits = 6, probes = 2, seed = 42L, k = 5, qMaxVecId = 20L))),

    "q29_sim_topk_ivf" -> Q(
      fn = (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        Similarity.ivfTopK(
          emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          emb, "vec_id", "embedding",
          k = 5, nCells = 16, nProbe = 4)
          .orderBy("query_id", "rank")
      }),

    // IVF-PQ ANN (rows-only like q28/q29 — the hash/model space is
    // engine-local): coarse cells prune, product-quantized codes
    // stand in for vectors inside probed cells, exact re-rank of the
    // ADC shortlist restores true cosines. Content-golden in
    // EntrySpec; recall gates in SimilaritySpec.
    "q108_sim_topk_ivfpq" -> Q(
      fn = (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        Similarity.ivfPqTopK(
          emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          emb, "vec_id", "embedding",
          k = 5, nCells = 16, nProbe = 4)
          .orderBy("query_id", "rank")
      }),

    // Cluster-balanced diversity sample (rows-only — k-means cell
    // space is engine-local): exact content-stable perCell rows from
    // every embedding cluster, so dense regions stop dominating.
    // Content-golden in EntrySpec; count/stability gates in
    // SimilaritySpec.
    "q114_cluster_balanced_sample" -> Q(
      fn = (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
          perCell = 8, nCells = 16)
          .select(col("vec_id"), col("cell"), col("label"))
          .orderBy("vec_id")
      }),

    // Streaming continuous-prep capstone: two micro-batch replays of
    // the prep pipeline (quality gate + first-occurrence fingerprint
    // dedup, lowest (batch, id) wins) must equal the batch-twin the
    // oracle computes directly — gating the foreachBatch path, the
    // fingerprint anti-join against the accepted store, and the
    // replay-idempotent slice protocol end-to-end.
    "q116_prep_ingest_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val acceptedDir = java.nio.file.Files
          .createTempDirectory("graft-q116-accepted").toString
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        Streaming.prepIngestBatch(docs.filter(col("doc_id") % 2 === 0),
          0L, acceptedDir, "doc_id", "text", minTokens = 50L)
        Streaming.prepIngestBatch(docs.filter(col("doc_id") % 2 =!= 0),
          1L, acceptedDir, "doc_id", "text", minTokens = 50L)
        materializeAndClean(
          // the API form of the accepted-store contract: readStore
          // resolves base + live slices and restores true batch ids
          // (a raw parquet read would surface the compacted base's
          // synthetic batch_id=-B partition value)
          graft.streaming.IngestStore.readStore(s, acceptedDir)
            .select(col("doc_id"), col("batch_id"))
            .orderBy("doc_id"),
          acceptedDir)
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, doc_id % 2 AS b,
                 md5(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '', 'g'))
                   AS fp
          FROM documents
          WHERE len(string_split(text, ' ')) >= 50),
        r AS (SELECT doc_id, b,
                     row_number() OVER (PARTITION BY fp
                                        ORDER BY b, doc_id) AS rn
              FROM d)
        SELECT doc_id, CAST(b AS BIGINT) AS batch_id
        FROM r WHERE rn = 1 ORDER BY doc_id""")),

    // BPE merge learning — ORACLE-GATED: the merge loop is fully
    // deterministic under the (count desc, then lexicographic) tie
    // break, and DuckDB's recursive CTEs are permissive enough to
    // replay it exactly — the recursive term may aggregate over and
    // self-join the working table, so each iteration re-counts adjacent
    // pairs over the evolving symbol sequences and applies the argmax
    // merge. Symbol sequences thread through the recursion as
    // delimiter-wrapped strings (each symbol wrapped in U+001F, pairs
    // keyed with U+001E): `replace` on the wrapped spelling consumes
    // both wrapped symbols per hit and rescans AFTER the replacement —
    // exactly bpeMergePair's non-overlapping left-to-right pass
    // (overlap check: "␟a␟␟a␟␟a␟" merged on (a,a) yields [aa, a], and
    // the four-a case yields [aa, aa]). Contract: the corpus must not
    // contain U+001E/U+001F (true of the synthetic tables); the Spark
    // side is array-based and has no such constraint. Also
    // content-golden in EntrySpec; hand-computed classic fixture +
    // encode round-trip in TextStatsSpec.
    "q117_bpe_train" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.bpeTrain(Tables(s, dir, "documents"), "text",
          nMerges = 40, minCount = 2L, maxWords = 4096)
          .orderBy("rank")
      },
      oracle = Some("""
        WITH RECURSIVE
        words AS (
          SELECT w, count(*)::BIGINT AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE w <> '' GROUP BY w HAVING count(*) >= 2
          ORDER BY c DESC, w LIMIT 4096),
        seqs0 AS (
          SELECT c,
                 chr(31) || array_to_string(regexp_extract_all(w, '(?s).'),
                                            chr(31) || chr(31)) || chr(31)
                   AS s
          FROM words),
        rec AS (
          SELECT 0 AS it, 'w' AS kind, c, s,
                 NULL::VARCHAR AS l, NULL::VARCHAR AS r, NULL::BIGINT AS pc
          FROM seqs0
          UNION ALL
          (
            WITH prev AS (SELECT it, c, s FROM rec
                          WHERE kind = 'w' AND it < 40),
            pairs AS (
              SELECT string_split(p, chr(30))[1] AS l,
                     string_split(p, chr(30))[2] AS r,
                     sum(c)::BIGINT AS pc
              FROM (
                SELECT c, unnest([syms[i] || chr(30) || syms[i+1]
                                  for i in range(1, len(syms))]) AS p
                FROM (SELECT c, string_split(trim(s, chr(31)),
                                             chr(31) || chr(31)) AS syms
                      FROM prev)
                WHERE len(syms) > 1)
              GROUP BY 1, 2),
            best AS (SELECT l, r, pc FROM pairs ORDER BY pc DESC, l, r
                     LIMIT 1)
            SELECT p.it + 1, 'w', p.c,
                   replace(p.s,
                           chr(31) || b.l || chr(31) || chr(31) || b.r
                             || chr(31),
                           chr(31) || b.l || b.r || chr(31)),
                   NULL, NULL, NULL
            FROM prev p CROSS JOIN best b
            UNION ALL
            SELECT p0.it, 'm', NULL, NULL, b.l, b.r, b.pc
            FROM (SELECT max(it) AS it FROM prev) p0 CROSS JOIN best b
          ))
        SELECT it::BIGINT AS "rank", l AS "left", r AS "right",
               l || r AS merged, pc AS pair_count
        FROM rec WHERE kind = 'm' ORDER BY "rank"""")),

    // ------------------------------------------------- text analysis
    "q30_text_quality" -> Q(
      fn = (s, dir) => {
        val d = Tables(s, dir, "documents")
        d.select(
          col("doc_id"),
          T.tokenCount(col("text")).as("n_tokens"),
          T.distinctTokenCount(col("text")).as("n_distinct"),
          T.typeTokenRatio(col("text")).as("ttr"),
          T.avgTokenLen(col("text")).as("avg_token_len"),
          T.punctRatio(col("text")).as("punct_ratio"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               round(len(list_distinct(toks))::DOUBLE / len(toks), 4) AS ttr,
               round((length(text) - (len(toks) - 1))::DOUBLE / len(toks), 4)
                 AS avg_token_len,
               round((length(text) -
                      length(translate(text, '.,!?;:''"()-', '')))::DOUBLE
                     / length(text), 4) AS punct_ratio
        FROM t ORDER BY doc_id""")),

    "q31_text_langid" -> Q(
      fn = (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"), T.langId(col("text")).as("lang_pred"))
          .orderBy("doc_id")
      },
      oracle = Some(LangIdOracle.sql)),

    "q32_token_stats" -> Q(
      fn = (s, dir) => {
        val d = Tables(s, dir, "documents")
        d.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(T.tokenCount(col("text"))).as("total_tokens"),
            round(avg(T.tokenCount(col("text"))), 2).as("avg_tokens"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
               round(avg(len(string_split(text,' '))), 2) AS avg_tokens,
               count(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang ORDER BY lang""")),

    // BPE-ish token budgeting per language: regex pre-tokenization
    // (letter/digit/punct runs) vs whitespace counts — the ratio is the
    // "tokenizer inflation" quality signal.
    "q44_bpeish_tokens" -> Q(
      fn = (s, dir) => {
        val d = Tables(s, dir, "documents")
        d.groupBy(col("lang"))
          .agg(
            sum(T.bpeishTokenCount(col("text"))).as("bpeish_tokens"),
            sum(T.tokenCount(col("text"))).as("ws_tokens"),
            round(sum(T.bpeishTokenCount(col("text"))).cast("double") /
              sum(T.tokenCount(col("text"))), 4).as("inflation"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang,
               CAST(sum(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+'))) AS BIGINT)
                 AS bpeish_tokens,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
               round(sum(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')))::DOUBLE /
                 sum(len(string_split(text, ' '))), 4) AS inflation
        FROM documents GROUP BY lang ORDER BY lang""")),

    // Train/eval contamination: even-numbered sources are "training",
    // odd are "held-out"; report held-out docs >= 50% of whose 3-gram
    // shingles appear in some training doc.
    "q52_contamination" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .withColumn("grp", substring(col("source"), 4, 10).cast("int") % 2)
        Dedup.crossContamination(
          docs.filter(col("grp") === 0), docs.filter(col("grp") === 1),
          "doc_id", "text", n = 3, threshold = 0.5,
          partitionCol = Some("lang"))
          .orderBy("train_id", "test_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id, lang, CAST(substr(source, 4) AS INT) % 2 AS grp,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM documents),
        tr AS (SELECT * FROM s WHERE grp = 0),
        te AS (SELECT * FROM s WHERE grp = 1)
        SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
               round(len(list_intersect(tr.sh, te.sh))::DOUBLE / len(te.sh), 3)
                 AS contamination
        FROM tr JOIN te ON tr.lang = te.lang
        WHERE round(len(list_intersect(tr.sh, te.sh))::DOUBLE / len(te.sh), 3)
              >= 0.5
        ORDER BY train_id, test_id""")),

    // Deterministic content-stable train/test split: assignment is a
    // pure function of md5(doc_id), so the oracle reproduces the exact
    // membership (fixed-width lowercase hex compares in numeric order).
    "q56_train_test_split" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        Sampling.hashSplit(Tables(s, dir, "documents"), "doc_id",
          trainFrac = 0.8)
          .groupBy(col("split"), col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(T.tokenCount(col("text"))).as("total_tokens"))
          .orderBy("split", "lang")
      },
      oracle = Some("""
        SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                    THEN 'train' ELSE 'test' END AS split,
               lang, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang""")),

    // One-pass column profile (Deequ-style analyzers): counts, exact
    // distincts, portable min/max strings, numeric means. Output is
    // #columns rows — model-sized; the corpus is read once.
    "q88_column_profile" -> Q(
      fn = (s, dir) => {
        import graft.operators.Profile
        Profile.profile(Tables(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"))
          .orderBy("column")
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT 'doc_id' AS "column", count(doc_id) AS n,
                 count(*) - count(doc_id) AS n_null,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                 CAST(min(doc_id) AS VARCHAR) AS min_s,
                 CAST(max(doc_id) AS VARCHAR) AS max_s,
                 round(avg(doc_id), 4) AS mean
          FROM documents
          UNION ALL
          SELECT 'lang', count(lang), count(*) - count(lang),
                 CAST(count(DISTINCT lang) AS BIGINT),
                 min(lang), max(lang), NULL
          FROM documents
          UNION ALL
          SELECT 'source', count(source), count(*) - count(source),
                 CAST(count(DISTINCT source) AS BIGINT),
                 min(source), max(source), NULL
          FROM documents
          UNION ALL
          SELECT 'n_chars', count(n_chars), count(*) - count(n_chars),
                 CAST(count(DISTINCT n_chars) AS BIGINT),
                 CAST(min(n_chars) AS VARCHAR),
                 CAST(max(n_chars) AS VARCHAR),
                 round(avg(n_chars), 4)
          FROM documents)
        ORDER BY "column" """)),

    // Decontamination-report capstone: content-stable 80/20 hash split
    // → exact 8-gram decontam of test against train → one verdict row
    // PER TEST DOC (clean docs included with zeros) — the artifact an
    // eval-integrity review actually reads. Composes q56's split and
    // q75's scrub; the oracle replays the identical pipeline.
    "q87_decontam_report" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val docs = Tables(s, dir, "documents")
        val split = Sampling.hashSplit(docs, "doc_id", trainFrac = 0.8)
        val train = split.filter(col("split") === "train")
        val test = split.filter(col("split") === "test")
        val leaks = Dedup.exactNgramDecontam(train, test,
          "doc_id", "text", n = 8)
          .groupBy("test_id")
          .agg(countDistinct(col("train_id")).as("n_train_docs"),
            sum(col("n_shared")).as("n_shared_total"))
        test.select(col("doc_id").as("test_id"), col("lang"))
          .join(leaks, Seq("test_id"), "left")
          .select(col("test_id"), col("lang"),
            when(col("n_train_docs").isNull, 1L).otherwise(0L)
              .as("is_clean"),
            coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
            coalesce(col("n_shared_total"), lit(0L)).as("n_shared_total"))
          .orderBy("test_id")
      },
      oracle = Some("""
        WITH labeled AS (
          SELECT doc_id, lang, text,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                   AS is_train
          FROM documents),
        s AS (
          SELECT doc_id, is_train, list_distinct(
                 [array_to_string(string_split(text,' ')[i+1:i+8],' ')
                  for i in range(len(string_split(text,' '))-7)]) AS sh
          FROM labeled),
        tr AS (SELECT doc_id, unnest(sh) AS gram FROM s WHERE is_train),
        te AS (SELECT doc_id, unnest(sh) AS gram FROM s WHERE NOT is_train),
        pairs AS (
          SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
                 count(*) AS n_shared
          FROM tr JOIN te USING (gram) GROUP BY 1, 2),
        leaks AS (
          SELECT test_id,
                 CAST(count(DISTINCT train_id) AS BIGINT) AS n_train_docs,
                 CAST(sum(n_shared) AS BIGINT) AS n_shared_total
          FROM pairs GROUP BY 1)
        SELECT l.doc_id AS test_id, l.lang,
               CAST(CASE WHEN k.test_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
                 AS is_clean,
               coalesce(k.n_train_docs, 0) AS n_train_docs,
               coalesce(k.n_shared_total, 0) AS n_shared_total
        FROM labeled l LEFT JOIN leaks k ON k.test_id = l.doc_id
        WHERE NOT l.is_train
        ORDER BY test_id""")),

    // Flagship composite: the full training-data cleaning pipeline in
    // one plan — quality gate → exact dedup (keep min id per
    // fingerprint) → near-dup removal (drop the HIGHER id of every
    // >= 0.5-Jaccard pair among survivors, whether or not its partner
    // was itself dropped — a deterministic, order-free rule) →
    // per-language corpus stats. Every stage is one of the library's
    // gated operators; the oracle replays the identical pipeline in SQL.
    "q51_clean_corpus" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val quality = docs.filter(T.tokenCount(col("text")) >= 25)
        val keepIds = Dedup.exact(quality, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val survivors = quality.join(keepIds, Seq("doc_id"), "left_semi")
        val nearDupDrops = Dedup.ngramJaccardPairs(
          survivors, "doc_id", "text", n = 3, threshold = 0.5,
          partitionCol = Some("lang"))
          .select(col("b_id").as("doc_id")).distinct()
        val cleaned = survivors.join(nearDupDrops, Seq("doc_id"), "left_anti")
        cleaned.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(T.tokenCount(col("text"))).as("total_tokens"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH q AS (
          SELECT * FROM documents WHERE len(string_split(text, ' ')) >= 25),
        k AS (
          SELECT min(doc_id) AS keep_id FROM q
          GROUP BY md5(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '', 'g'))),
        s AS (SELECT q.* FROM q JOIN k ON q.doc_id = k.keep_id),
        sh AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM s),
        drops AS (
          SELECT DISTINCT b.doc_id
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 3)
                >= 0.5),
        c AS (SELECT * FROM s WHERE doc_id NOT IN (SELECT doc_id FROM drops))
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM c GROUP BY lang ORDER BY lang""")),

    // Flagship v2 — the cluster-closed cleaning pipeline: quality gate
    // → exact dedup → near-dup PAIR graph → connected-component
    // closure, keeping exactly one doc (the min id) per near-dup
    // CLUSTER. Unlike q51's pair-local drop rule, closure also removes
    // C when A~B and B~C but A~C was never emitted as a pair — the
    // semantics a real corpus dedup wants. The oracle replays the
    // identical pipeline with a recursive CTE.
    "q67_clean_corpus_clustered" -> Q(
      fn = (s, dir) => {
        import graft.operators.ConnectedComponents
        val docs = Tables(s, dir, "documents")
        val quality = docs.filter(T.tokenCount(col("text")) >= 25)
        val keepIds = Dedup.exact(quality, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val survivors = quality.join(keepIds, Seq("doc_id"), "left_semi")
        val pairs = Dedup.ngramJaccardPairs(
          survivors, "doc_id", "text", n = 3, threshold = 0.5,
          partitionCol = Some("lang"))
        val cleaned = ConnectedComponents.keepers(
          survivors, "doc_id", pairs, "a_id", "b_id")
        cleaned.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(T.tokenCount(col("text"))).as("total_tokens"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH RECURSIVE q AS (
          SELECT * FROM documents WHERE len(string_split(text, ' ')) >= 25),
        k AS (
          SELECT min(doc_id) AS keep_id FROM q
          GROUP BY md5(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '', 'g'))),
        s AS (SELECT q.* FROM q JOIN k ON q.doc_id = k.keep_id),
        sh AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM s),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 3)
                >= 0.5),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, lbl) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
        drops AS (SELECT id FROM comp WHERE id != component),
        c AS (SELECT * FROM s
              WHERE doc_id NOT IN (SELECT id FROM drops))
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM c GROUP BY lang ORDER BY lang""")),

    // -------------------------------------------------- multimodal
    // Real typed plumbing (binary payload + header-parse feature
    // extraction through Multimodal.extractFeatures); the payload is a
    // deterministic fake (12-byte header + text bytes) so the oracle
    // can reproduce every derived field.
    "q33_multimodal_features" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        import Multimodal.MediaItem
        val items = Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            when(col("doc_id") % 3 === 0, "image")
              .when(col("doc_id") % 3 === 1, "audio")
              .otherwise("video").as("kind"),
            col("text"), col("n_chars"))
          .as[(Long, String, String, Long)]
          .map { case (id, kind, text, nChars) =>
            MediaItem(id, kind, Multimodal.DecoderStub.encode(
              (nChars % 1024).toInt, (id % 768).toInt, (id % 30).toInt,
              text.getBytes("UTF-8")))
          }
        Multimodal.extractFeatures(items)
          .select(col("media_id"), col("kind"), col("byte_len"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"))
          .orderBy("media_id")
      },
      oracle = Some("""
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               octet_length(encode(text)) + 12 AS byte_len,
               n_chars % 1024 AS width,
               doc_id % 768 AS height,
               doc_id % 30 AS n_frames
        FROM documents ORDER BY media_id""")),

    "q34_multimodal_frames" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        import Multimodal.MediaItem
        val items = Tables(s, dir, "documents")
          .filter(col("doc_id") % 3 === 2)
          .select(col("doc_id"), col("text"), col("n_chars"))
          .as[(Long, String, Long)]
          .map { case (id, text, nChars) =>
            MediaItem(id, "video", Multimodal.DecoderStub.encode(
              (nChars % 1024).toInt, (id % 768).toInt, (id % 30).toInt,
              text.getBytes("UTF-8")))
          }
        Multimodal.sampleFrames(items, everyN = 5)
          .select(col("media_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
          .orderBy("media_id", "frame_idx")
      },
      oracle = Some("""
        SELECT doc_id AS media_id,
               unnest(range(0, doc_id % 30, 5)) AS frame_idx,
               n_chars % 1024 AS width,
               doc_id % 768 AS height
        FROM documents
        WHERE doc_id % 3 = 2 AND doc_id % 30 > 0
        ORDER BY media_id, frame_idx""")),

    // Exact per-stratum sampling (training-mix balancing): every
    // language contributes exactly ceil(0.3 · n_lang) docs, chosen by
    // the content-stable md5 order. The id checksum pins the exact
    // SELECTION, not just the counts.
    "q58_stratified_sample" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        Sampling.stratifiedSample(Tables(s, dir, "documents"),
          "doc_id", "lang", frac = 0.3)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang, count(*) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM (
          SELECT * FROM documents
          QUALIFY row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
            <= ceil(0.3 * count(*) OVER (PARTITION BY lang)))
        GROUP BY lang ORDER BY lang""")),

    // Exact-share training mix: per-language ratios (en-heavy, zh
    // down-weighted, everything else dropped via default 0), selection
    // content-stable and pinned by id checksums.
    "q73_training_mix" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        Sampling.mixSample(Tables(s, dir, "documents"), "doc_id", "lang",
          fracs = Map("en" -> 0.5, "zh" -> 0.2, "de" -> 0.35))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang, count(*) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM (
          SELECT * FROM documents
          QUALIFY row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
            <= ceil(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2
                              WHEN 'de' THEN 0.35 ELSE 0.0 END
                    * count(*) OVER (PARTITION BY lang)))
        GROUP BY lang ORDER BY lang""")),

    // Gopher-style n-gram repetition signals (token-fraction analogues
    // of the MassiveText char-fraction filters): the n-gram tier that
    // catches looped paragraphs token-level stats miss. Both fractions
    // are overlap-ignoring coverage, rounded identically on both sides.
    "q74_ngram_repetition" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.ngramRepetition(Tables(s, dir, "documents"),
          "doc_id", "text", topN = 2, dupN = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        g2 AS (SELECT doc_id, array_to_string(toks[i+1:i+2],' ') AS g
               FROM (SELECT doc_id, toks, unnest(range(len(toks)-1)) AS i FROM t)),
        c2 AS (SELECT doc_id, max(c) AS top_c FROM (
                 SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1,2)
               GROUP BY 1),
        g3 AS (SELECT doc_id, array_to_string(toks[i+1:i+3],' ') AS g
               FROM (SELECT doc_id, toks, unnest(range(len(toks)-2)) AS i FROM t)),
        c3 AS (SELECT doc_id, sum(c) AS dup_occ FROM (
                 SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1,2) cc
               WHERE c >= 2 GROUP BY 1)
        SELECT t.doc_id,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               round(2.0 * coalesce(c2.top_c, 0) / len(t.toks), 4)
                 AS top_ngram_frac,
               round(3.0 * coalesce(c3.dup_occ, 0) / len(t.toks), 4)
                 AS dup_ngram_frac
        FROM t LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
        ORDER BY doc_id""")),

    // Exact n-gram decontamination (zero-tolerance eval-leak scrub, the
    // 13-gram recipe run here at n=8 where the synthetic corpus has
    // collisions): any shared 8-gram across the train/test split flags
    // the pair. Count of DISTINCT shared grams rides along; the Spark
    // side counts shared 64-bit gram hashes (collision odds ~1e-13 at
    // this cardinality — and the driver compare would catch one).
    "q75_exact_decontam" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .withColumn("grp", substring(col("source"), 4, 10).cast("int") % 2)
        Dedup.exactNgramDecontam(
          docs.filter(col("grp") === 0), docs.filter(col("grp") === 1),
          "doc_id", "text", n = 8)
          .orderBy("train_id", "test_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id, CAST(substr(source, 4) AS INT) % 2 AS grp,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+8],' ')
                                for i in range(len(string_split(text,' '))-7)]) AS sh
          FROM documents),
        tr AS (SELECT doc_id, unnest(sh) AS gram FROM s WHERE grp = 0),
        te AS (SELECT doc_id, unnest(sh) AS gram FROM s WHERE grp = 1)
        SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
               count(*) AS n_shared
        FROM tr JOIN te USING (gram)
        GROUP BY 1, 2
        ORDER BY train_id, test_id""")),

    // ------------------------------------------------------------------
    // q75's scale path: the SAME exact decontamination with the bloom
    // pre-filter on — the test-gram bloom (bytes, in-plan scalar
    // subquery) screens the train gram stream with might_contain
    // before the shuffle. The oracle is IDENTICAL to q75's by design:
    // bloom false negatives are impossible and false positives die in
    // the exact equi-join, so only the shuffled volume changes.
    // ------------------------------------------------------------------
    "q96_decontam_bloom" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .withColumn("grp", substring(col("source"), 4, 10).cast("int") % 2)
        Dedup.exactNgramDecontam(
          docs.filter(col("grp") === 0), docs.filter(col("grp") === 1),
          "doc_id", "text", n = 8, bloomPrefilter = true)
          .orderBy("train_id", "test_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id, CAST(substr(source, 4) AS INT) % 2 AS grp,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+8],' ')
                                for i in range(len(string_split(text,' '))-7)]) AS sh
          FROM documents),
        tr AS (SELECT doc_id, unnest(sh) AS gram FROM s WHERE grp = 0),
        te AS (SELECT doc_id, unnest(sh) AS gram FROM s WHERE grp = 1)
        SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
               count(*) AS n_shared
        FROM tr JOIN te USING (gram)
        GROUP BY 1, 2
        ORDER BY train_id, test_id""")),

    // ------------------------------------------------------------------
    // Temperature (α-weighted) multilingual mix — the mT5/multilingual
    // pretraining recipe: per-language take counts proportional to
    // cnt^α (α=0.5 upsamples the tail relative to raw proportions),
    // realized exactly by takePerStratum's content-stable per-stratum
    // prefix. The share computation is a MODEL-SIZED driver step
    // (#langs rows collected — the same documented contract as the
    // centroid pool), and all boundary arithmetic is integral: weights
    // are round(sqrt(cnt)·1e6) BIGINTs and k_l = ceil-div in longs, so
    // no float-sum order or ceil boundary can diverge across engines.
    // ------------------------------------------------------------------
    "q98_temperature_mix" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val docs = Tables(s, dir, "documents")
        val budget = 200L
        val cnts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val wts = cnts.map { case (l, c) =>
          l -> math.round(math.sqrt(c.toDouble) * 1e6) }
        val tw = wts.values.sum
        val take = wts.map { case (l, w) => l -> ((budget * w + tw - 1) / tw) }
        val nTake = take.foldLeft(lit(0L)) { case (acc, (l, k)) =>
          when(col("lang") === l, lit(k)).otherwise(acc) }
        Sampling.takePerStratum(docs, "doc_id", "lang", take)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_selected"),
            sum(col("doc_id")).as("id_checksum"))
          .withColumn("n_take", nTake)
          .select("lang", "n_take", "n_selected", "id_checksum")
          .orderBy("lang")
      },
      oracle = Some("""
        WITH n AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        w AS (SELECT lang, cnt,
                     CAST(round(sqrt(cnt::DOUBLE) * 1000000) AS BIGINT) AS wt
              FROM n),
        t AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM w),
        k AS (SELECT lang, ((200 * wt + tw - 1) // tw) AS k_l FROM w, t),
        sel AS (SELECT d.lang, d.doc_id,
                       row_number() OVER (PARTITION BY d.lang
                         ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
                         AS rk
                FROM documents d)
        SELECT s.lang, k.k_l AS n_take,
               CAST(count(*) AS BIGINT) AS n_selected,
               CAST(sum(s.doc_id) AS BIGINT) AS id_checksum
        FROM sel s JOIN k ON s.lang = k.lang
        WHERE s.rk <= k.k_l
        GROUP BY s.lang, k.k_l ORDER BY s.lang""")),

    // Per-doc n-gram novelty (share of trigrams unique to the doc
    // corpus-wide) — the inverse of boilerplate mining; docs shorter
    // than n have no defined novelty and are absent on both sides.
    "q76_ngram_novelty" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.ngramNovelty(Tables(s, dir, "documents"),
          "doc_id", "text", n = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM documents),
        gr AS (SELECT doc_id, unnest(sh) AS gram FROM s),
        gdf AS (SELECT gram, count(*) AS d FROM gr GROUP BY 1)
        SELECT gr.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               round(sum(CASE WHEN gdf.d = 1 THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 4) AS novel_frac
        FROM gr JOIN gdf USING (gram)
        GROUP BY 1 ORDER BY doc_id""")),

    // Corpus-level overlap matrix: exact distinct-5-gram Jaccard /
    // containment between every source pair — "how contaminated is
    // corpus A by corpus B" before any doc-level scrub. Gram recipe
    // matches q75/q76 (single-space split, space-joined n-grams).
    "q84_corpus_overlap" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.corpusOverlap(Tables(s, dir, "documents"),
          "source", "text", n = 5)
          .orderBy("part_a", "part_b")
      },
      oracle = Some("""
        WITH s AS (
          SELECT source, list_distinct(
                 [array_to_string(string_split(text,' ')[i+1:i+5],' ')
                  for i in range(len(string_split(text,' '))-4)]) AS sh
          FROM documents),
        gr AS (SELECT DISTINCT source, unnest(sh) AS gram FROM s),
        sz AS (SELECT source, count(*) AS sz FROM gr GROUP BY 1),
        pr AS (
          SELECT a.source AS part_a, b.source AS part_b, count(*) AS n_common
          FROM gr a JOIN gr b USING (gram)
          WHERE a.source < b.source
          GROUP BY 1, 2)
        SELECT part_a, part_b, n_common,
               round(n_common::DOUBLE / (sa.sz + sb.sz - n_common), 4)
                 AS jaccard,
               round(n_common::DOUBLE / least(sa.sz, sb.sz), 4)
                 AS containment
        FROM pr JOIN sz sa ON sa.source = pr.part_a
                JOIN sz sb ON sb.source = pr.part_b
        ORDER BY part_a, part_b""")),

    // Content-stable exact-k sample: the same 100 docs on any engine,
    // run, or cluster size; plans as TakeOrderedAndProject.
    "q62_deterministic_sample" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        Sampling.takeDeterministic(Tables(s, dir, "documents"),
          "doc_id", k = 100)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id, lang, n_chars FROM (
          SELECT * FROM documents
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100)
        ORDER BY doc_id""")),

    // Weighted deterministic sample: longer docs proportionally more
    // likely, selection exact and engine-portable (min-of-w md5
    // replica subkeys — pure string space, no float pow/ln; see
    // Sampling.weightedTake). DuckDB realizes the same per-row key
    // with a scalar generate_series list.
    "q83_weighted_sample" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val docs = Tables(s, dir, "documents")
        Sampling.weightedTake(docs, "doc_id",
          weightCol = expr("n_chars div 256"), k = 200, maxWeight = 16)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH keyed AS (
          SELECT doc_id, lang, n_chars,
                 list_min(list_transform(
                   generate_series(1, least(16, greatest(1, n_chars // 256))),
                   j -> md5(CAST(doc_id AS VARCHAR) || ':' ||
                            CAST(j AS VARCHAR)))) AS sk
          FROM documents)
        SELECT doc_id, lang, n_chars FROM (
          SELECT * FROM keyed ORDER BY sk, doc_id LIMIT 200)
        ORDER BY doc_id""")),

    // Corpus-relative quality gate: drop exactly the worst decile by
    // (type-token ratio, doc_id) rank — rank-based, so no interpolated
    // float threshold can make boundary rows diverge across engines.
    "q63_quality_gate" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val scored = Tables(s, dir, "documents")
          .withColumn("ttr", T.typeTokenRatio(col("text")))
        Sampling.dropBottomFraction(scored, "ttr", "doc_id", frac = 0.1)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            round(avg(col("ttr")), 4).as("avg_ttr"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH scored AS (
          SELECT doc_id, lang,
                 round(len(list_distinct(string_split(text,' ')))::DOUBLE /
                       len(string_split(text,' ')), 4) AS ttr
          FROM documents),
        kept AS (
          SELECT * FROM scored
          QUALIFY row_number() OVER (ORDER BY ttr, doc_id)
            > ceil(0.1 * count(*) OVER ()))
        SELECT lang, count(*) AS n_kept, round(avg(ttr), 4) AS avg_ttr
        FROM kept GROUP BY lang ORDER BY lang""")),

    // PII scrub: detect + redact emails / SSNs / phones / IPs. The
    // synthetic corpus contains no PII, so the query PLANTS
    // deterministic PII derived from doc ids (same precedent as the
    // q33/q34 fake media payloads) and both engines replay identical
    // planting, counting, and ordered redaction. Counts run each
    // pattern independently over the raw text (an SSN is also a valid
    // phone-shaped digit run — redaction order, not the counters,
    // disambiguates); the redacted text is pinned by md5 + length.
    "q65_pii_redact" -> Q(
      fn = (s, dir) => {
        import graft.functions.{PiiFunctions => P}
        val planted = Tables(s, dir, "documents").withColumn("t", concat(
          col("text"),
          when(col("doc_id") % 2 === 0, concat(
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail"), (col("doc_id") % 7).cast("string"),
            lit(".example.com"))).otherwise(lit("")),
          when(col("doc_id") % 3 === 0, concat(
            lit(" call +1 555-01"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, concat(
            lit(" ssn "), (col("doc_id") % 900 + 100).cast("string"),
            lit("-"), (col("doc_id") % 90 + 10).cast("string"),
            lit("-"), (col("doc_id") % 9000 + 1000).cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, concat(
            lit(" host 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 200).cast("string")))
            .otherwise(lit(""))))
        planted.select(
          col("doc_id"),
          P.countEmails(col("t")).cast("long").as("n_emails"),
          P.countSsns(col("t")).cast("long").as("n_ssns"),
          P.countPhones(col("t")).cast("long").as("n_phones"),
          P.countIps(col("t")).cast("long").as("n_ips"),
          md5(P.redact(col("t"))).as("red_md5"),
          length(P.redact(col("t"))).cast("long").as("red_len"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT doc_id, text ||
            CASE WHEN doc_id % 2 = 0 THEN ' contact user' || doc_id ||
              '@mail' || (doc_id % 7) || '.example.com' ELSE '' END ||
            CASE WHEN doc_id % 3 = 0 THEN ' call +1 555-01' ||
              lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ELSE '' END ||
            CASE WHEN doc_id % 5 = 0 THEN ' ssn ' || (doc_id % 900 + 100)
              || '-' || (doc_id % 90 + 10) || '-' || (doc_id % 9000 + 1000)
              ELSE '' END ||
            CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || (doc_id % 256) ||
              '.0.' || (doc_id % 200) ELSE '' END AS t
          FROM documents),
        r AS (
          SELECT doc_id, t,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
              '\+?\d[\d -]{7,}\d', '[PHONE]', 'g'),
              '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS red
          FROM p)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(t,
                 '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssns,
               CAST(len(regexp_extract_all(t,
                 '\+?\d[\d -]{7,}\d')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(t,
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
                 AS n_ips,
               md5(red) AS red_md5,
               CAST(length(red) AS BIGINT) AS red_len
        FROM r ORDER BY doc_id""")),

    // Training-sequence packing: concat docs in content-stable order,
    // split at a 512-token budget. The Spark side computes the global
    // running offset as a two-phase distributed prefix sum (see
    // operators/Packing.scala — a bare global window would
    // single-partition the corpus); the oracle recomputes it as the
    // global window it semantically is.
    "q66_sequence_packing" -> Q(
      fn = (s, dir) => {
        import graft.operators.Packing
        Packing.packSequences(Tables(s, dir, "documents"),
          "doc_id", T.tokenCount(col("text")), budget = 512)
          .groupBy(col("seq"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("n_tokens"),
            sum(col("straddles").cast("long")).as("n_straddle"))
          .orderBy("seq")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                 len(string_split(text, ' ')) AS tok
          FROM documents),
        o AS (
          SELECT doc_id, tok,
                 coalesce(sum(tok) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS off
          FROM t)
        SELECT CAST(off // 512 AS BIGINT) AS seq,
               count(*) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN tok > 0 AND (off + tok - 1) // 512 > off // 512
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
        FROM o GROUP BY 1 ORDER BY seq""")),

    // End-to-end training-data preparation in ONE plan: quality gate →
    // exact dedup → content-stable ordering → sequence packing at a
    // 512-token budget. The capstone composition: every stage is an
    // already-gated operator, and the final per-sequence manifest is
    // what a trainer would actually consume.
    "q72_prepare_training_data" -> Q(
      fn = (s, dir) => {
        import graft.operators.Packing
        val docs = Tables(s, dir, "documents")
        val quality = docs.filter(T.tokenCount(col("text")) >= 25)
        val keepIds = Dedup.exact(quality, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val survivors = quality.join(keepIds, Seq("doc_id"), "left_semi")
        Packing.packSequences(survivors, "doc_id",
          T.tokenCount(col("text")), budget = 512)
          .groupBy(col("seq"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("n_tokens"),
            sum(col("straddles").cast("long")).as("n_straddle"))
          .orderBy("seq")
      },
      oracle = Some("""
        WITH q AS (
          SELECT * FROM documents WHERE len(string_split(text, ' ')) >= 25),
        k AS (
          SELECT min(doc_id) AS keep_id FROM q
          GROUP BY md5(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '', 'g'))),
        s AS (SELECT q.* FROM q JOIN k ON q.doc_id = k.keep_id),
        t AS (
          SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                 len(string_split(text, ' ')) AS tok
          FROM s),
        o AS (
          SELECT doc_id, tok,
                 coalesce(sum(tok) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS off
          FROM t)
        SELECT CAST(off // 512 AS BIGINT) AS seq,
               count(*) AS n_docs,
               CAST(sum(tok) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN tok > 0 AND (off + tok - 1) // 512 > off // 512
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
        FROM o GROUP BY 1 ORDER BY seq""")),

    // Gopher-style repetition quality profile: duplicate-token fraction
    // and top-token share per document.
    "q59_repetition_profile" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.repetitionProfile(Tables(s, dir, "documents"),
          "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_tokens"),
            col("dup_frac"), col("top_tok_frac"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        cnt AS (
          SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY doc_id, tok)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               round(1.0 - count(*)::DOUBLE / sum(c), 4) AS dup_frac,
               round(max(c)::DOUBLE / sum(c), 4) AS top_tok_frac
        FROM cnt GROUP BY doc_id ORDER BY doc_id""")),

    // Per-doc TF-IDF keywords: ranking happens on the ROUNDED score
    // (then token) on both engines, so float last-ulp differences
    // can't reorder ranks across engines.
    "q68_tfidf_keywords" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.tfidfTopK(Tables(s, dir, "documents"),
          "doc_id", "text", k = 3)
          .select(col("id").as("doc_id"), col("rank"),
            col("token"), col("score"))
          .orderBy("doc_id", "rank")
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tf AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        df AS (SELECT tok, count(DISTINCT doc_id) AS d FROM tk GROUP BY 1),
        n AS (SELECT count(*) AS nn FROM documents),
        sc AS (
          SELECT tf.doc_id, tf.tok,
                 round(tf.c * ln(nn::DOUBLE / d), 4) AS score
          FROM tf JOIN df USING (tok) CROSS JOIN n),
        rk AS (
          SELECT doc_id, tok, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, tok) AS rn
          FROM sc)
        SELECT doc_id, CAST(rn AS BIGINT) AS rank, tok AS token, score
        FROM rk WHERE rn <= 3
        ORDER BY doc_id, rank""")),

    // Unigram-surprisal quality scoring (the statistical stand-in for
    // LM-perplexity filters): corpus unigram model, per-doc mean
    // negative log-likelihood.
    "q69_unigram_surprisal" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.unigramSurprisal(Tables(s, dir, "documents"),
          "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_tokens"), col("surprisal"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
        tot AS (SELECT count(*) AS t FROM tk),
        sc AS (
          SELECT tk.doc_id, -ln(c::DOUBLE / t) AS s
          FROM tk JOIN cnt USING (tok) CROSS JOIN tot)
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(s), 4) AS surprisal
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // Bigram-LM quality score (corpus-self-trained CCNet flavor):
    // add-one-smoothed bigram negative log-likelihood per doc.
    "q86_bigram_lm_score" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.bigramLmScore(Tables(s, dir, "documents"),
          "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_bigrams"), col("nll"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest([toks[i+1] || ' ' || toks[i+2]
                         for i in range(len(toks)-1)]) AS bigram
          FROM s),
        cb AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
        cl AS (SELECT string_split(bigram, ' ')[1] AS w1, count(*) AS cl
               FROM bg GROUP BY 1),
        v AS (SELECT count(DISTINCT tok) AS v FROM
                (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents)),
        sc AS (
          SELECT bg.doc_id,
                 -ln((cb.cb + 1)::DOUBLE / (cl.cl + v.v)) AS s
          FROM bg JOIN cb USING (bigram)
                  JOIN cl ON cl.w1 = string_split(bg.bigram, ' ')[1]
                  CROSS JOIN v)
        SELECT doc_id, count(*) AS n_bigrams, round(avg(s), 4) AS nll
        FROM sc GROUP BY 1 ORDER BY doc_id""")),

    // Vocabulary build + document encoding: top-16 frequency vocab
    // (count desc, token asc — fully deterministic), docs re-expressed
    // as token-id sequences with OOV = -1, pinned by an engine-neutral
    // md5 of the '-'-joined ids.
    "q71_vocab_encode" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.vocabEncode(Tables(s, dir, "documents"),
          "doc_id", "text", vocabSize = 16)
          .select(col("id").as("doc_id"), col("n_tokens"),
            col("n_oov"), col("enc_md5"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        tk0 AS (SELECT doc_id,
                       unnest([{'pos': i, 'tok': toks[i+1]}
                               for i in range(len(toks))]) AS u
                FROM t),
        tk AS (SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok AS tok
               FROM tk0),
        cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
        vocab AS (
          SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) - 1
                           AS INT) AS tid
          FROM cnt ORDER BY c DESC, tok LIMIT 16),
        enc AS (
          SELECT tk.doc_id, tk.pos, coalesce(v.tid, -1) AS tid
          FROM tk LEFT JOIN vocab v USING (tok))
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_oov,
               md5(string_agg(tid, '-' ORDER BY pos)) AS enc_md5
        FROM enc GROUP BY doc_id ORDER BY doc_id""")),

    // Corpus-level boilerplate mining: the 20 word-3-gram shingles with
    // the highest document frequency — the keys the dedup df-caps
    // exist to keep out of candidate self-joins.
    "q60_boilerplate_ngrams" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.topShingles(Tables(s, dir, "documents"),
          "doc_id", "text", n = 3, k = 20)
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id,
                 unnest(list_distinct(
                   [array_to_string(string_split(text,' ')[i+1:i+3],' ')
                    for i in range(len(string_split(text,' '))-2)])) AS shingle
          FROM documents)
        SELECT shingle, count(*) AS doc_freq
        FROM s GROUP BY shingle
        ORDER BY doc_freq DESC, shingle LIMIT 20""")),

    // Token-window chunking (context-length packing): 50-token windows
    // every 40 tokens, reassembled distributively by (doc, chunk).
    "q61_token_chunks" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.chunkTokens(Tables(s, dir, "documents"),
          "doc_id", "text", chunkSize = 50, stride = 40)
          .select(col("id").as("doc_id"), col("chunk"),
            col("n_tokens"), col("chunk_text"))
          .orderBy("doc_id", "chunk")
      },
      oracle = Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
                   FROM documents),
        tk AS (SELECT doc_id,
                      unnest([{'pos': i, 'tok': toks[i+1]}
                              for i in range(len(toks))]) AS u
               FROM t),
        toks AS (SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok AS tok
                 FROM tk),
        ech AS (SELECT doc_id, pos, tok,
                       unnest([c for c in range(
                         greatest(0, CAST(ceil((pos - 50 + 1) / 40.0)
                                          AS BIGINT)),
                         pos // 40 + 1)]) AS c
                FROM toks),
        ch AS (SELECT doc_id, CAST(c AS INT) AS chunk, count(*) AS n_tokens,
                      string_agg(tok, ' ' ORDER BY pos) AS chunk_text
               FROM ech GROUP BY doc_id, chunk)
        SELECT doc_id, chunk, CAST(n_tokens AS BIGINT) AS n_tokens,
               chunk_text
        FROM ch ORDER BY doc_id, chunk""")),

    // ------------------------------------------------------------------
    // Duplicate-span scrub (Lee et al. 2021 EXACTSUBSTR at word-8-gram
    // granularity): positions covered by a cross-document-duplicated
    // 8-gram are EXCISED and the document rewritten — the treatment
    // for boilerplate stitched into otherwise-novel pages, where
    // doc-level dedup would either drop the whole page or keep the
    // boilerplate. Exact-text equality of the rewritten corpus is the
    // gate. Gram recipe matches q75/q76 (single-space split).
    // ------------------------------------------------------------------
    "q107_dup_span_scrub" -> Q(
      fn = (s, dir) => {
        import graft.operators.Dedup
        Dedup.dupSpanScrub(Tables(s, dir, "documents"),
          "doc_id", "text", n = 8)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH s AS (SELECT doc_id, string_split(text,' ') AS tk
                   FROM documents),
        gi AS (SELECT doc_id,
                      unnest([{'gs': i,
                               'g': array_to_string(tk[i+1:i+8],' ')}
                              for i in range(len(tk)-7)]) AS u
               FROM s),
        g AS (SELECT doc_id, u.gs AS gstart, u.g AS gram FROM gi),
        gdf AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS d
                                  FROM g GROUP BY 1) WHERE d >= 2),
        ds AS (SELECT DISTINCT g.doc_id, g.gstart
               FROM g JOIN gdf USING (gram)),
        ti AS (SELECT doc_id,
                      unnest([{'p': i, 't': tk[i+1]}
                              for i in range(len(tk))]) AS u
               FROM s),
        tp AS (SELECT doc_id, u.p AS pos, u.t AS tok FROM ti),
        fl AS (SELECT tp.doc_id, tp.pos, tp.tok,
                      EXISTS (SELECT 1 FROM ds
                              WHERE ds.doc_id = tp.doc_id
                                AND ds.gstart BETWEEN tp.pos - 7
                                                  AND tp.pos) AS dup
               FROM tp)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(*) FILTER (dup) AS BIGINT) AS n_dup_tokens,
               coalesce(string_agg(tok, ' ' ORDER BY pos)
                        FILTER (NOT dup), '') AS scrubbed
        FROM fl GROUP BY doc_id ORDER BY doc_id""")),

    // Model-based quality filter (fastText-shaped hashed bag-of-words
    // linear classifier, Joulin 2016) — the trained-classifier stage
    // of GPT-3/LLaMA/FineWeb curation, complementing the rule-based
    // heuristics of q30. Weights in integer milli units make the score
    // exact 64-bit arithmetic, so the oracle (FNV+splitmix emulated in
    // HUGEINT, [[PortableHashSql.hashedBowScoreSql]]) compares
    // bit-for-bit. Per-row expression: no shuffle, model ships once
    // per stage.
    "q120_quality_classifier" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        val dims = 64
        val weights =
          Array.tabulate(dims)(i => (i.toLong * 2654435761L) % 2001L - 1000L)
        TextStats.hashedBowScore(Tables(s, dir, "documents"),
          "doc_id", "text", weights)
          .orderBy("doc_id")
      },
      oracle = Some(PortableHashSql.hashedBowScoreSql(64)))
  )

  /** q121/q122 live in a second map only to keep [[defs]] under the
    * Scala 2.13 large-literal-method limits as the surface grows. */
  /** The evens/odds/redaction index-store fixture shared by the
    * as-of gate (q227) and the snapshot-export gate (q235): batch 0
    * = even docs, batch 1 = odd docs, batch 2 = a null-text REDACTION
    * of the 17-residue evens — an asOf=0 view must hide both the
    * later ingest AND the later redaction while the store physically
    * holds them. ONE spelling (with its matching oracle corpus
    * [[evenCorpusOracleSql]]) so the two gates can never drift into
    * testing different stores. */
  private def evensOddsRedactionStore(
      docs: org.apache.spark.sql.DataFrame, storeDir: String): Unit = {
    import graft.streaming.Streaming
    Streaming.indexIngestBatch(
      docs.filter(col("doc_id") % 2 === 0), 0L, storeDir,
      "doc_id", "text", compactEvery = 0)
    Streaming.indexIngestBatch(
      docs.filter(col("doc_id") % 2 =!= 0), 1L, storeDir,
      "doc_id", "text", compactEvery = 0)
    Streaming.indexIngestBatch(
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 17 === 3)
        .select(col("doc_id"), lit(null).cast("string").as("text")),
      2L, storeDir, "doc_id", "text", compactEvery = 0)
  }

  /** The oracle over [[evensOddsRedactionStore]]'s asOf=0 corpus. */
  private val evenCorpusOracleSql: String = s"""
        WITH live AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
        ${bm25OracleCtesOver("live")}
        SELECT qid, CAST(rn AS BIGINT) AS rank, doc_id, score
        FROM rk WHERE rn <= 5
        ORDER BY qid, rank"""

  val defs2: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // Streaming drift monitor, gated END-TO-END: the corpus arrives as
    // two micro-batches (doc_id parity) through the streaming path's
    // per-batch step — batch 0 seeds the unigram-counts store (NULL
    // drift: no reference distribution yet), batch 1 is scored against
    // the accumulated store (add-one-smoothed KL + total variation over
    // the union vocabulary). The oracle recomputes both batch ledgers
    // directly from the parity split, so the store protocol (slice
    // write, prior read, smoothing arithmetic) is on the hook end to
    // end. Fresh temp dirs per invocation; content is deterministic.
    // ------------------------------------------------------------------
    "q147_drift_monitor" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q147-store").toString
        val driftDir = java.nio.file.Files
          .createTempDirectory("graft-q147-drift").toString
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        Streaming.driftMonitorBatch(docs.filter(col("doc_id") % 2 === 0),
          0L, storeDir, driftDir, "text")
        Streaming.driftMonitorBatch(docs.filter(col("doc_id") % 2 =!= 0),
          1L, storeDir, driftDir, "text")
        materializeAndClean(
          s.read.option("basePath", driftDir).parquet(driftDir)
            .select(col("batch_id").cast("long").as("batch_id"),
              col("n_tokens"), col("n_distinct"),
              col("kl_vs_store"), col("tv_vs_store"))
            .orderBy("batch_id"),
          storeDir, driftDir)
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id % 2 AS b, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        c AS (SELECT b, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        b0 AS (SELECT tok, c FROM c WHERE b = 0),
        b1 AS (SELECT tok, c FROM c WHERE b = 1),
        j AS (
          SELECT COALESCE(b1.c, 0) AS cb, COALESCE(b0.c, 0) AS cp
          FROM b1 FULL OUTER JOIN b0 ON b1.tok = b0.tok),
        s AS (SELECT CAST(sum(cb) AS BIGINT) AS nb,
                     CAST(sum(cp) AS BIGINT) AS np,
                     count(*) AS v FROM j)
        SELECT CAST(0 AS BIGINT) AS batch_id,
               (SELECT CAST(sum(c) AS BIGINT) FROM b0) AS n_tokens,
               (SELECT count(*) FROM b0) AS n_distinct,
               CAST(NULL AS DOUBLE) AS kl_vs_store,
               CAST(NULL AS DOUBLE) AS tv_vs_store
        UNION ALL
        SELECT CAST(1 AS BIGINT),
               (SELECT nb FROM s),
               (SELECT count(*) FROM b1),
               (SELECT round(sum(((cb+1)::DOUBLE/(nb+v)) *
                        ln(((cb+1)::DOUBLE/(nb+v)) /
                           ((cp+1)::DOUBLE/(np+v)))), 4)
                FROM j CROSS JOIN s),
               (SELECT round(sum(abs(((cb+1)::DOUBLE/(nb+v)) -
                        ((cp+1)::DOUBLE/(np+v)))) / 2, 4)
                FROM j CROSS JOIN s)
        ORDER BY batch_id""")),

    // ------------------------------------------------------------------
    // Context-length planning: the truncate/pad/pack cost ledger for
    // candidate max_seq_len values — docs that fit, token loss under
    // truncation, pad-batch utilization, and the perfectly-packed
    // sequence count — the profile read before committing a training
    // run's sequence length (the planning step ahead of q66's packer).
    // ------------------------------------------------------------------
    "q152_seqlen_plan" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.seqLenPlan(Tables(s, dir, "documents"), "text",
          lengths = Seq(32, 64, 128, 256, 512, 1024))
          .orderBy("max_len")
      },
      oracle = Some("""
        WITH lens AS (
          SELECT len(string_split(text, ' ')) AS len FROM documents),
        x AS (
          SELECT l.max_len, lens.len
          FROM lens CROSS JOIN (VALUES (32), (64), (128), (256), (512),
                                       (1024)) AS l(max_len)),
        g AS (
          SELECT max_len,
                 count(*) AS n_docs,
                 CAST(sum(CASE WHEN len <= max_len THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_docs_fit,
                 CAST(sum(len) AS BIGINT) AS tot,
                 CAST(sum(least(len, max_len)) AS BIGINT) AS kept
          FROM x GROUP BY 1)
        SELECT CAST(max_len AS BIGINT) AS max_len,
               n_docs_fit,
               round(n_docs_fit::DOUBLE / n_docs, 4) AS pct_docs_fit,
               round(1.0 - kept::DOUBLE / tot, 4) AS trunc_loss_pct,
               round(kept::DOUBLE / (n_docs * max_len), 4)
                 AS pad_utilization,
               CAST((kept + max_len - 1) // max_len AS BIGINT)
                 AS packed_seqs
        FROM g ORDER BY max_len""")),

    // ------------------------------------------------------------------
    // Vocabulary coverage curve (the Zipf profile behind tokenizer
    // vocab sizing): token share covered by the K most frequent types,
    // for candidate vocab sizes K. Runs entirely on the distinct-count
    // ledger (≤ √(2·n_tokens) rows by the distinct-sum bound) — rank
    // ties carry equal counts, so no vocab-wide ordering exists
    // anywhere in the plan.
    // ------------------------------------------------------------------
    "q153_vocab_coverage" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.vocabCoverage(Tables(s, dir, "documents"), "text",
          ks = Seq(100L, 1000L, 4000L, 16000L, 64000L))
          .orderBy("k")
      },
      oracle = Some("""
        WITH tk AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
        bc AS (SELECT c, count(*) AS n_types, c * count(*) AS toks
               FROM cnt GROUP BY 1),
        led AS (
          SELECT c, n_types, toks,
                 COALESCE(sum(n_types) OVER (ORDER BY c DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS ctb,
                 COALESCE(sum(toks) OVER (ORDER BY c DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS ckb
          FROM bc),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS v FROM cnt),
        kk AS (SELECT k.k, least(k.k, tot.v) AS k0
               FROM (VALUES (100), (1000), (4000), (16000), (64000))
                 k(k) CROSS JOIN tot)
        SELECT CAST(kk.k AS BIGINT) AS k,
               CAST(kk.k0 AS BIGINT) AS n_types_used,
               CAST(led.ckb + (kk.k0 - led.ctb) * led.c AS BIGINT)
                 AS coverage_tokens,
               round((led.ckb + (kk.k0 - led.ctb) * led.c)::DOUBLE
                 / tot.n, 4) AS coverage_pct
        FROM kk
        JOIN led ON led.ctb < kk.k0 AND kk.k0 <= led.ctb + led.n_types
        CROSS JOIN tot
        ORDER BY k""")),

    // ------------------------------------------------------------------
    // Per-source duplication report: what share of each source's docs
    // is exact-duplicated (normalized fingerprint) anywhere in the
    // corpus, and what share collides ACROSS sources — the
    // provenance-level dedup observability read before deciding which
    // source's copies to keep. One fingerprint aggregate joined back;
    // text never shuffles twice.
    // ------------------------------------------------------------------
    "q157_source_dup_report" -> Q(
      fn = (s, dir) => {
        import graft.functions.{TextFunctions => T}
        val fp = Tables(s, dir, "documents")
          .select(col("source"), T.fingerprint(col("text")).as("fp"))
        val g = fp.groupBy(col("fp"))
          .agg(count(lit(1)).as("__n"),
            countDistinct(col("source")).as("__ns"))
        fp.join(g, Seq("fp"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
            sum(when(col("__ns") > 1, 1L).otherwise(0L))
              .as("n_cross_source_docs"))
          .select(col("source"), col("n_docs"), col("n_dup_docs"),
            round(col("n_dup_docs").cast("double") / col("n_docs"), 4)
              .as("dup_share"),
            col("n_cross_source_docs"),
            round(col("n_cross_source_docs").cast("double")
              / col("n_docs"), 4).as("cross_share"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH fp AS (
          SELECT source,
                 md5(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '',
                     'g')) AS fp
          FROM documents),
        g AS (SELECT fp, count(*) AS n,
                     count(DISTINCT source) AS ns
              FROM fp GROUP BY 1)
        SELECT fp.source, count(*) AS n_docs,
               CAST(sum(CASE WHEN g.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_docs,
               round(sum(CASE WHEN g.n > 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS dup_share,
               CAST(sum(CASE WHEN g.ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cross_source_docs,
               round(sum(CASE WHEN g.ns > 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS cross_share
        FROM fp JOIN g ON fp.fp = g.fp
        GROUP BY fp.source ORDER BY fp.source""")),

    // ------------------------------------------------------------------
    // Collocation (phrase) mining: adjacent-bigram phrase scores à la
    // word2phrase — (c(ab) − δ)·N / (c(a)·c(b)) in exact milli fixed
    // point (pure rational arithmetic over exact counts: both engines
    // agree bit-for-bit, no log in sight). In-doc bigrams come from an
    // index-transform expression (no self-join); the unigram side
    // stays a distributed equi-join (a 100 TB vocab never broadcasts).
    // ------------------------------------------------------------------
    "q159_collocations" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.collocations(Tables(s, dir, "documents"), "text",
          minCount = 5L, delta = 5L, k = 40)
      },
      oracle = Some("""
        WITH tk AS (SELECT string_split(text, ' ') AS l FROM documents),
        n AS (SELECT CAST(sum(len(l)) AS BIGINT) AS n FROM tk),
        ug AS (SELECT unnest(l) AS w FROM tk),
        uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ug GROUP BY 1),
        ix AS (SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
               FROM tk),
        bg AS (SELECT l[i] AS a, l[i + 1] AS b FROM ix),
        bc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab
               FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
        SELECT bc.a, bc.b, bc.cab, ua.c AS ca, ub.c AS cb,
               ((bc.cab - 5) * n.n * 1000) // (ua.c * ub.c) AS score_milli
        FROM bc JOIN uc ua ON bc.a = ua.w
                JOIN uc ub ON bc.b = ub.w
                CROSS JOIN n
        ORDER BY score_milli DESC, a, b LIMIT 40""")),

    // ------------------------------------------------------------------
    // Label-centroid confusion matrix: pairwise cosine between
    // per-label mean embeddings — the label-quality read (merge
    // candidates, annotation noise) before training on the labels.
    // Centroids are one (label, dim)-keyed partial+final average; the
    // pairwise stage is a broadcast self-join of the LABEL-sized
    // centroid frame (upper triangle).
    // ------------------------------------------------------------------
    "q161_label_confusion" -> Q(
      fn = (s, dir) => {
        Similarity.labelConfusion(
          Tables(s, dir, "embeddings"), "vec_id", "embedding", "label")
          .orderBy("grp_a", "grp_b")
      },
      oracle = Some("""
        WITH e AS (SELECT label, embedding::DOUBLE[] AS v
                   FROM embeddings WHERE label IS NOT NULL),
        d AS (SELECT label, unnest(v) AS x,
                     generate_subscripts(v, 1) AS i FROM e),
        m AS (SELECT label, i, avg(x) AS m, CAST(count(*) AS BIGINT) AS n
              FROM d GROUP BY label, i),
        c AS (SELECT label, list(m ORDER BY i) AS c, max(n) AS n
              FROM m GROUP BY label)
        SELECT a.label AS grp_a, b.label AS grp_b, a.n AS n_a, b.n AS n_b,
               round(list_inner_product(a.c, b.c) /
                 (sqrt(list_inner_product(a.c, a.c)) *
                  sqrt(list_inner_product(b.c, b.c))), 4)
                 AS centroid_cosine
        FROM c a JOIN c b ON a.label < b.label
        ORDER BY grp_a, grp_b""")),

    // Corpus snapshot diff (data-versioning): two snapshots derived
    // deterministically from the documents table (old drops ids
    // ≡3 mod 10, new drops ids ≡2 mod 7 and appends ' v2' to ids
    // ≡0 mod 13), classified added/removed/changed/unchanged by one
    // full-outer join of (id, md5) projections.
    "q121_corpus_diff" -> Q(
      fn = (s, dir) => {
        import graft.operators.Dedup
        val docs = Tables(s, dir, "documents")
        val oldSnap = docs.filter(col("doc_id") % 10 =!= 3)
        val newSnap = docs.filter(col("doc_id") % 7 =!= 2)
          .withColumn("text",
            when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("id")).as("id_checksum"))
          .orderBy("status")
      },
      oracle = Some("""
        WITH oldd AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3),
        newd AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                      ELSE text END AS text
          FROM documents WHERE doc_id % 7 != 2),
        d AS (
          SELECT coalesce(o.doc_id, n.doc_id) AS id,
                 CASE WHEN o.doc_id IS NULL THEN 'added'
                      WHEN n.doc_id IS NULL THEN 'removed'
                      WHEN md5(o.text) IS DISTINCT FROM md5(n.text)
                        THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id)
        SELECT status, count(*) AS n_docs,
               CAST(sum(id) AS BIGINT) AS id_checksum
        FROM d GROUP BY status ORDER BY status""")),

    // ------------------------------------------------------------------
    // Chunk-level snapshot reuse via content-defined chunking: q121's
    // old/new snapshots re-chunked with rolling-hash cut points
    // (TextStats.cdcChunks), then per-status reuse accounting — the
    // read that justifies INCREMENTAL crawl processing: a changed doc
    // re-pays only the chunks its edit touched (boundaries resync
    // because cut points are local content), where fixed-stride
    // chunking would shift and invalidate every downstream chunk.
    // Multiset reuse per (doc, fingerprint): least(old, new) copies.
    // ------------------------------------------------------------------
    "q168_cdc_chunk_reuse" -> Q(
      fn = (s, dir) => {
        import graft.operators.{Dedup, TextStats}
        val docs = Tables(s, dir, "documents")
        val oldSnap = docs.filter(col("doc_id") % 10 =!= 3)
        val newSnap = docs.filter(col("doc_id") % 7 =!= 2)
          .withColumn("text",
            when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        def ledger(snap: org.apache.spark.sql.DataFrame, side: String) =
          TextStats.cdcChunks(snap, "doc_id", "text")
            .groupBy(col("id"), col("chunk_md5"))
            .agg(count(lit(1)).as(s"c_$side"),
              min(col("n_tokens")).as(s"nt_$side"))
        val j = ledger(oldSnap, "old")
          .join(ledger(newSnap, "new"), Seq("id", "chunk_md5"),
            "full_outer")
          .select(col("id"),
            coalesce(col("c_old"), lit(0L)).as("c_old"),
            coalesce(col("c_new"), lit(0L)).as("c_new"),
            coalesce(col("nt_old"), col("nt_new")).as("nt"))
        val perDoc = j.groupBy(col("id")).agg(
          sum(col("c_old")).as("d_old"),
          sum(col("c_new")).as("d_new"),
          sum(least(col("c_old"), col("c_new"))).as("d_reused"),
          sum(col("c_new") * col("nt")).as("d_tok_new"),
          sum(least(col("c_old"), col("c_new")) * col("nt"))
            .as("d_tok_reused"))
        Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
          .select(col("id"), col("status"))
          .join(perDoc, Seq("id"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("d_old")).as("n_chunks_old"),
            sum(col("d_new")).as("n_chunks_new"),
            sum(col("d_reused")).as("n_chunks_reused"),
            sum(col("d_tok_new")).as("n_tokens_new"),
            sum(col("d_tok_reused")).as("n_tokens_reused"))
          .orderBy("status")
      },
      oracle = Some("""
        WITH oldd AS MATERIALIZED (
          SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3),
        newd AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                      ELSE text END AS text
          FROM documents WHERE doc_id % 7 != 2),
        tko AS MATERIALIZED (
          SELECT doc_id, unnest([{'pos': i, 'tok': toks[i+1],
                   'cut': CASE WHEN i >= 4 THEN
                     substr(md5(array_to_string(toks[i-3:i], ' ')), 1, 1)
                       = '0' ELSE false END}
                 for i in range(len(toks))]) AS u
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM oldd)),
        cho AS MATERIALIZED (
          SELECT doc_id, seg, count(*) AS nt,
                 md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
          FROM (SELECT doc_id, u.pos AS pos, u.tok AS tok,
                       sum(CASE WHEN u.cut THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY u.pos
                               ROWS UNBOUNDED PRECEDING) AS seg
                FROM tko)
          GROUP BY doc_id, seg),
        co AS MATERIALIZED (
          SELECT doc_id, fp, count(*) AS c_old, min(nt) AS nt_old
          FROM cho GROUP BY 1, 2),
        tkn AS MATERIALIZED (
          SELECT doc_id, unnest([{'pos': i, 'tok': toks[i+1],
                   'cut': CASE WHEN i >= 4 THEN
                     substr(md5(array_to_string(toks[i-3:i], ' ')), 1, 1)
                       = '0' ELSE false END}
                 for i in range(len(toks))]) AS u
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM newd)),
        chn AS MATERIALIZED (
          SELECT doc_id, seg, count(*) AS nt,
                 md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
          FROM (SELECT doc_id, u.pos AS pos, u.tok AS tok,
                       sum(CASE WHEN u.cut THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY u.pos
                               ROWS UNBOUNDED PRECEDING) AS seg
                FROM tkn)
          GROUP BY doc_id, seg),
        cn AS MATERIALIZED (
          SELECT doc_id, fp, count(*) AS c_new, min(nt) AS nt_new
          FROM chn GROUP BY 1, 2),
        jj AS MATERIALIZED (
          SELECT coalesce(co.doc_id, cn.doc_id) AS id,
                 coalesce(c_old, 0) AS c_old,
                 coalesce(c_new, 0) AS c_new,
                 coalesce(nt_old, nt_new) AS nt
          FROM co FULL OUTER JOIN cn
            ON co.doc_id = cn.doc_id AND co.fp = cn.fp),
        pd AS MATERIALIZED (
          SELECT id, sum(c_old) AS d_old, sum(c_new) AS d_new,
                 sum(least(c_old, c_new)) AS d_reused,
                 sum(c_new * nt) AS d_tok_new,
                 sum(least(c_old, c_new) * nt) AS d_tok_reused
          FROM jj GROUP BY id),
        st AS MATERIALIZED (
          SELECT coalesce(o.doc_id, n.doc_id) AS id,
                 CASE WHEN o.doc_id IS NULL THEN 'added'
                      WHEN n.doc_id IS NULL THEN 'removed'
                      WHEN md5(o.text) IS DISTINCT FROM md5(n.text)
                        THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id)
        SELECT st.status, count(*) AS n_docs,
               CAST(sum(d_old) AS BIGINT) AS n_chunks_old,
               CAST(sum(d_new) AS BIGINT) AS n_chunks_new,
               CAST(sum(d_reused) AS BIGINT) AS n_chunks_reused,
               CAST(sum(d_tok_new) AS BIGINT) AS n_tokens_new,
               CAST(sum(d_tok_reused) AS BIGINT) AS n_tokens_reused
        FROM st JOIN pd ON st.id = pd.id
        GROUP BY st.status ORDER BY st.status""")),

    // ------------------------------------------------------------------
    // Screen-bite matrix: per-source pass counts for each cheap
    // quality gate (length band, word-shape band, blocklist) and
    // their conjunction — the "which screens bite where" read a
    // curation pipeline runs BEFORE committing to a gate stack:
    // a screen that zeroes one source is usually a domain mismatch,
    // not a quality signal. Every gate is a per-row expression over
    // one scan; the matrix is one keyed conditional aggregate.
    // ------------------------------------------------------------------
    "q176_screen_bite_matrix" -> Q(
      fn = (s, dir) => {
        val d = Tables(s, dir, "documents").select(col("source"),
          col("n_chars"), size(split(col("text"), " ")).cast("long")
            .as("nt"),
          size(filter(split(lower(col("text")), " "),
            t => t.isin("dup", "crash"))).cast("long").as("nb"))
        d.select(col("source"),
            col("n_chars").between(200, 1200).as("p_len"),
            expr("(`n_chars` * 10) div `nt`").between(48, 60)
              .as("p_shape"),
            (col("nb") === 0L).as("p_block"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("p_len"), 1L).otherwise(0L)).as("pass_len"),
            sum(when(col("p_shape"), 1L).otherwise(0L)).as("pass_shape"),
            sum(when(col("p_block"), 1L).otherwise(0L)).as("pass_block"),
            sum(when(col("p_len") && col("p_shape") && col("p_block"),
              1L).otherwise(0L)).as("pass_all"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH d AS (
          SELECT source, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                 len(list_filter(string_split(lower(text), ' '),
                   t -> list_contains(['dup', 'crash'], t))) AS nb
          FROM documents),
        f AS (
          SELECT source,
                 n_chars BETWEEN 200 AND 1200 AS p_len,
                 (n_chars * 10) // nt BETWEEN 48 AND 60 AS p_shape,
                 nb = 0 AS p_block
          FROM d)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN p_len THEN 1 ELSE 0 END) AS BIGINT)
                 AS pass_len,
               CAST(sum(CASE WHEN p_shape THEN 1 ELSE 0 END) AS BIGINT)
                 AS pass_shape,
               CAST(sum(CASE WHEN p_block THEN 1 ELSE 0 END) AS BIGINT)
                 AS pass_block,
               CAST(sum(CASE WHEN p_len AND p_shape AND p_block
                             THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
        FROM f GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // Source mirror matrix: which source PAIRS share rare word-5-grams
    // — the cross-crawl mirror/syndication detector (q84 checks two
    // named corpora; this scans all C(sources,2) pairs at once). The
    // pair generation is [[Graphs.coOccurrence]] verbatim with grams
    // as the left (blocking) side: cost Σ C(sources-per-gram, 2),
    // never sources²·grams, and the df-cap drops grams in > 10
    // sources (boilerplate — exactly what mirror detection should
    // ignore; recall contract inherited from the kernel, replayed by
    // the oracle's HAVING). Top 30 by (shared grams, pair) — total
    // order.
    // ------------------------------------------------------------------
    "q175_source_mirror_matrix" -> Q(
      fn = (s, dir) => {
        import graft.operators.Graphs
        // native single-pass shingle kernel, not the HOF
        // transform/slice spelling (which re-evaluates the full split
        // per position — O(len²) per doc; the [[graft.functions
        // .TextFunctions.wordShingles]] scaladoc measurement).
        // wordShingles is per-doc DISTINCT where the HOF kept
        // duplicates, but coOccurrence's dedupedRel distincts the
        // (gram, source) relation anyway — identical pairs, gated.
        val rel = Tables(s, dir, "documents")
          .select(col("source"),
            explode(T.wordShingles(col("text"), 5)).as("g"))
        Graphs.coOccurrence(rel, "g", "source",
            minShared = 1L, maxLeftDegree = Some(10))
          .select(col("a").as("s_a"), col("b").as("s_b"),
            col("n_shared"))
          .orderBy(col("n_shared").desc, col("s_a"), col("s_b"))
          .limit(30)
      },
      oracle = Some("""
        WITH t AS (
          SELECT source, string_split(text, ' ') AS toks FROM documents),
        g0 AS (
          SELECT source, unnest([array_to_string(toks[i+1:i+5], ' ')
                   for i in range(len(toks) - 4)]) AS g
          FROM t),
        g AS (SELECT DISTINCT source, g FROM g0),
        keep AS (SELECT g FROM g GROUP BY g HAVING count(*) <= 10),
        gg AS (SELECT g.source, g.g FROM g JOIN keep USING (g)),
        p AS (
          SELECT a.source AS s_a, b.source AS s_b, count(*) AS n_shared
          FROM gg a JOIN gg b ON a.g = b.g AND a.source < b.source
          GROUP BY 1, 2)
        SELECT s_a, s_b, CAST(n_shared AS BIGINT) AS n_shared
        FROM p ORDER BY n_shared DESC, s_a, s_b LIMIT 30""")),

    // ------------------------------------------------------------------
    // Per-source token-mass Gini: how head-heavy is each source's doc
    // length distribution — the concentration read behind packing
    // efficiency (q66/q152) and per-doc token budgets (q125). Exact
    // integers end-to-end on the distinct-count LEDGER: ties share
    // consecutive ranks, so the rank-weighted mass is
    // v·(c·C_below + c(c+1)/2) per ledger row (no doc-level rank
    // anywhere), and Gini_milli = 1000·(2S − (n+1)T) / (nT) by
    // Chebyshev's sum inequality is provably ≥ 0 — positive operands,
    // so DuckDB // equals Spark div.
    // ------------------------------------------------------------------
    "q174_token_gini" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val led = Tables(s, dir, "documents")
          .groupBy(col("source"),
            size(split(col("text"), " ")).cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        led
          .withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("n"),
            sum(col("v") * col("c")).as("t"),
            sum(col("v") * (col("c") * col("cb") +
              expr("(`c` * (`c` + 1)) div 2"))).as("s"))
          .select(col("source"), col("n").as("n_docs"),
            col("t").as("total_tokens"),
            expr("(1000 * (2 * `s` - (`n` + 1) * `t`)) div (`n` * `t`)")
              .as("gini_milli"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH led AS (
          SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
                 count(*) AS c
          FROM documents GROUP BY 1, 2),
        cb AS (
          SELECT source, v, c,
                 COALESCE(sum(c) OVER (PARTITION BY source ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cb
          FROM led),
        a AS (
          SELECT source,
                 CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(v * c) AS BIGINT) AS t,
                 CAST(sum(v * (c * cb + (c * (c + 1)) // 2)) AS BIGINT)
                   AS s
          FROM cb GROUP BY source)
        SELECT source, n AS n_docs, t AS total_tokens,
               CAST((1000 * (2 * s - (n + 1) * t)) // (n * t) AS BIGINT)
                 AS gini_milli
        FROM a ORDER BY source""")),

    // ------------------------------------------------------------------
    // Per-source Kolmogorov–Smirnov drift of the doc-length
    // distribution vs the whole corpus — the NONPARAMETRIC
    // distribution-shift test beside q145's (vocabulary-bound) KL: KS
    // sees shape changes KL smoothing can blur, needs no binning
    // choices, and is exact here. Everything runs on the
    // distinct-length LEDGER (sources × distinct lengths — bounded by
    // the max doc length, never corpus-sized), so the cumulative
    // windows are ledger-windows (the q153/q154 device). The distance
    // itself is EXACT integer cross-multiplication:
    // max |cumS·N − cumG·nS| over the merged step points, divided
    // once at the end — no per-step floating CDFs to disagree on.
    // ------------------------------------------------------------------
    "q173_ks_length_drift" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables(s, dir, "documents")
          .select(col("source"), col("n_chars"))
        val g = docs.groupBy(col("n_chars").as("v"))
          .agg(count(lit(1)).as("cg"))
        val sv = docs.groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("cs"))
        val srcs = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("ns"))
        val n = graft.plans.Scalars.of(docs.agg(count(lit(1)).as("n")))
        val grid = srcs.crossJoin(g)
          .join(sv, Seq("source", "v"), "left")
          .withColumn("cs", coalesce(col("cs"), lit(0L)))
        val w = Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid
          .withColumn("cums", sum(col("cs")).over(w))
          .withColumn("cumg", sum(col("cg")).over(w))
          .withColumn("__n", n)
          .groupBy(col("source"))
          .agg(min(col("ns")).as("n_docs"),
            max(abs(col("cums") * col("__n") - col("cumg") * col("ns")))
              .as("__m"),
            min(col("__n")).as("__nn"))
          .select(col("source"), col("n_docs"),
            expr("(1000 * `__m`) div (`n_docs` * `__nn`)").as("ks_milli"))
          .orderBy(col("ks_milli").desc, col("source"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT n_chars AS v, count(*) AS cg FROM documents GROUP BY 1),
        s AS (
          SELECT source, n_chars AS v, count(*) AS cs
          FROM documents GROUP BY 1, 2),
        src AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM documents),
        grid AS (
          SELECT src.source, src.ns, g.v, g.cg, COALESCE(s.cs, 0) AS cs
          FROM src CROSS JOIN g
          LEFT JOIN s ON s.source = src.source AND s.v = g.v),
        c AS (
          SELECT source, ns,
                 sum(cs) OVER w AS cums, sum(cg) OVER w AS cumg
          FROM grid
          WINDOW w AS (PARTITION BY source ORDER BY v
                       ROWS UNBOUNDED PRECEDING)),
        d AS (
          SELECT source,
                 CAST(max(abs(cums * (SELECT n FROM nn) - cumg * ns))
                   AS BIGINT) AS m,
                 CAST(min(ns) AS BIGINT) AS ns
          FROM c GROUP BY source)
        SELECT source, ns AS n_docs,
               CAST((1000 * m) // (ns * (SELECT n FROM nn)) AS BIGINT)
                 AS ks_milli
        FROM d ORDER BY ks_milli DESC, source""")),

    // ------------------------------------------------------------------
    // Quality-signal correlation matrix: pairwise Pearson between the
    // per-doc signals an ensemble (q139) would fuse — token count,
    // type-token ratio, chars-per-token — computed from exact-integer
    // per-row signals through ONE global fold of long moment sums
    // (the q170 device); only the final correlations assemble in
    // double, rounded 4dp. The redundancy read BEFORE weighting an
    // ensemble: on this corpus TTR is ~anti-proportional to length
    // (Heaps' law) — fusing both double-counts one signal.
    // ------------------------------------------------------------------
    "q171_signal_correlation" -> Q(
      fn = (s, dir) => {
        val sig = Tables(s, dir, "documents").select(
          size(split(col("text"), " ")).cast("long").as("nt"),
          expr("""(size(array_distinct(split(`text`, ' '))) * 1000L)
                  div size(split(`text`, ' '))""").as("ttr"),
          expr("(`n_chars` * 1000) div size(split(`text`, ' '))")
            .as("cpt"))
        def r(n: org.apache.spark.sql.Column,
            sx: org.apache.spark.sql.Column, sy: org.apache.spark.sql.Column,
            sxy: org.apache.spark.sql.Column, sxx: org.apache.spark.sql.Column,
            syy: org.apache.spark.sql.Column) =
          round((n.cast("double") * sxy - sx.cast("double") * sy) /
            (sqrt(n.cast("double") * sxx - sx.cast("double") * sx) *
             sqrt(n.cast("double") * syy - sy.cast("double") * sy)), 4)
        sig.agg(count(lit(1)).as("n"),
            sum(col("nt")).as("sa"), sum(col("ttr")).as("sb"),
            sum(col("cpt")).as("sc"),
            sum(col("nt") * col("nt")).as("saa"),
            sum(col("ttr") * col("ttr")).as("sbb"),
            sum(col("cpt") * col("cpt")).as("scc"),
            sum(col("nt") * col("ttr")).as("sab"),
            sum(col("nt") * col("cpt")).as("sac"),
            sum(col("ttr") * col("cpt")).as("sbc"))
          .select(col("n").as("n_docs"),
            r(col("n"), col("sa"), col("sb"), col("sab"), col("saa"),
              col("sbb")).as("r_tokens_ttr"),
            r(col("n"), col("sa"), col("sc"), col("sac"), col("saa"),
              col("scc")).as("r_tokens_cpt"),
            r(col("n"), col("sb"), col("sc"), col("sbc"), col("sbb"),
              col("scc")).as("r_ttr_cpt"))
      },
      oracle = Some("""
        WITH sig AS (
          SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                 CAST((len(list_distinct(string_split(text, ' '))) * 1000)
                      // len(string_split(text, ' ')) AS BIGINT) AS ttr,
                 CAST((n_chars * 1000) // len(string_split(text, ' '))
                      AS BIGINT) AS cpt
          FROM documents),
        m AS (
          SELECT count(*) AS n,
                 CAST(sum(nt) AS BIGINT) sa,
                 CAST(sum(ttr) AS BIGINT) sb,
                 CAST(sum(cpt) AS BIGINT) sc,
                 CAST(sum(nt * nt) AS BIGINT) saa,
                 CAST(sum(ttr * ttr) AS BIGINT) sbb,
                 CAST(sum(cpt * cpt) AS BIGINT) scc,
                 CAST(sum(nt * ttr) AS BIGINT) sab,
                 CAST(sum(nt * cpt) AS BIGINT) sac,
                 CAST(sum(ttr * cpt) AS BIGINT) sbc
          FROM sig)
        SELECT n AS n_docs,
               round((n::DOUBLE * sab - sa::DOUBLE * sb) /
                 (sqrt(n::DOUBLE * saa - sa::DOUBLE * sa) *
                  sqrt(n::DOUBLE * sbb - sb::DOUBLE * sb)), 4)
                 AS r_tokens_ttr,
               round((n::DOUBLE * sac - sa::DOUBLE * sc) /
                 (sqrt(n::DOUBLE * saa - sa::DOUBLE * sa) *
                  sqrt(n::DOUBLE * scc - sc::DOUBLE * sc)), 4)
                 AS r_tokens_cpt,
               round((n::DOUBLE * sbc - sb::DOUBLE * sc) /
                 (sqrt(n::DOUBLE * sbb - sb::DOUBLE * sb) *
                  sqrt(n::DOUBLE * scc - sc::DOUBLE * sc)), 4)
                 AS r_ttr_cpt
        FROM m""")),

    // ------------------------------------------------------------------
    // Deterministic Poisson bootstrap (Chamandy 2012, the streaming
    // bootstrap): 32 replicates where doc d's weight in replicate b is
    // the Poisson(1) inverse-CDF of the hash-uniform u =
    // substr(md5(b:id), 1, 4) — the q56 hex-threshold device, cuts
    // precomputed as 4-hex literals (tail truncated at 7, mass ~1e-4,
    // protocol-documented). Content-stable: the same corpus gives the
    // same replicates on any engine or cluster size, so the CI itself
    // is gate-checkable. ONE pass: the 32-way explode collapses
    // map-side into 32 partial aggregates per partition — replicate
    // ledgers, never 32 corpus copies, shuffle. Exact milli means.
    // ------------------------------------------------------------------
    "q172_bootstrap_ci" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        docs.withColumn("b", explode(sequence(lit(0), lit(31))))
          .withColumn("u", substring(md5(
            concat(col("b").cast("string"), lit(":"),
              col("doc_id").cast("string")).cast("binary")), 1, 4))
          .withColumn("w",
            when(col("u") < "5e2d", 0L).when(col("u") < "bc5a", 1L)
              .when(col("u") < "eb71", 2L).when(col("u") < "fb23", 3L)
              .when(col("u") < "ff10", 4L).when(col("u") < "ffd9", 5L)
              .when(col("u") < "fffa", 6L).otherwise(7L))
          .groupBy(col("b"))
          .agg(sum(col("w")).as("n_eff"),
            sum(col("w") * col("nt")).as("__ts"))
          .filter(col("n_eff") > 0)
          .select(col("b").cast("long").as("replicate"), col("n_eff"),
            expr("(`__ts` * 1000) div `n_eff`").as("mean_tokens_milli"))
          .orderBy("replicate")
      },
      oracle = Some("""
        WITH reps AS (
          SELECT t.b, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                 substr(md5(t.b || ':' || doc_id), 1, 4) AS u
          FROM documents, (SELECT unnest(range(0, 32)) AS b) t),
        w AS (
          SELECT b, nt,
                 CASE WHEN u < '5e2d' THEN 0 WHEN u < 'bc5a' THEN 1
                      WHEN u < 'eb71' THEN 2 WHEN u < 'fb23' THEN 3
                      WHEN u < 'ff10' THEN 4 WHEN u < 'ffd9' THEN 5
                      WHEN u < 'fffa' THEN 6 ELSE 7 END AS w
          FROM reps)
        SELECT CAST(b AS BIGINT) AS replicate,
               CAST(sum(w) AS BIGINT) AS n_eff,
               CAST((CAST(sum(w * nt) AS BIGINT) * 1000) //
                    CAST(sum(w) AS BIGINT) AS BIGINT)
                 AS mean_tokens_milli
        FROM w GROUP BY b HAVING sum(w) > 0 ORDER BY replicate""")),

    // Leakage-safe split: near-dup CLUSTERS (q55's char-ngram pair
    // graph on the zh slice, closed by CC) are the split unit, so no
    // near-dup pair can straddle train/test — the contamination mode
    // per-document hash splitting cannot avoid. Oracle closes the same
    // pair graph with a recursive CTE and applies the identical
    // md5-bucket rule to the component representative.
    "q122_leakage_safe_split" -> Q(
      fn = (s, dir) => {
        import graft.operators.{Dedup, Sampling}
        val zh = Tables(s, dir, "documents").filter(col("lang") === "zh")
        val pairs = Dedup.ngramJaccardPairs(
          zh, "doc_id", "text", n = 5, threshold = 0.25, charLevel = true)
        Sampling.leakageSafeSplit(zh, "doc_id",
            pairs.select("a_id", "b_id"), trainFrac = 0.8)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("cluster_rep")).as("n_units"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("split")
      },
      oracle = Some("""
        WITH RECURSIVE s AS (
          SELECT doc_id,
                 list_distinct([text[i+1:i+5]
                                for i in range(len(text)-4)]) AS sh
          FROM documents WHERE lang = 'zh'),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                      (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
                >= 0.25),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, lbl) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
        rep AS (
          SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_rep
          FROM (SELECT doc_id FROM documents WHERE lang = 'zh') d
          LEFT JOIN comp c ON c.id = d.doc_id),
        sp AS (
          SELECT doc_id, cluster_rep,
                 CASE WHEN substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 4)
                           < 'cccd'
                      THEN 'train' ELSE 'test' END AS split
          FROM rep)
        SELECT split, count(*) AS n_docs,
               count(DISTINCT cluster_rep) AS n_units,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM sp GROUP BY split ORDER BY split""")),

    // Per-source quality quota: cap every source at its 10 best docs
    // by (type-token ratio, doc_id) — the host-level cap that keeps a
    // single domain from dominating a crawl-derived training mix.
    // Salted two-pass top-k (Sampling.topKPerStratum), so a giant
    // source never serializes into one window task.
    "q123_source_quota" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val scored = Tables(s, dir, "documents")
          .withColumn("q", T.typeTokenRatio(col("text")))
        Sampling.topKPerStratum(scored, "source", "q", "doc_id", k = 10)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            round(avg(col("q")), 4).as("avg_q"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH scored AS (
          SELECT doc_id, source,
                 round(len(list_distinct(string_split(text,' ')))::DOUBLE /
                       len(string_split(text,' ')), 4) AS q
          FROM documents),
        kept AS (
          SELECT * FROM scored
          QUALIFY row_number() OVER (PARTITION BY source
                    ORDER BY q DESC NULLS LAST, doc_id) <= 10)
        SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
               round(avg(q), 4) AS avg_q,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM kept GROUP BY source ORDER BY source""")),

    // Deterministic global training-order shuffle: a content-stable,
    // re-seedable permutation of the corpus (rank of md5(seed:id)) —
    // the "shuffle before writing training shards" step. Two-phase
    // bucket rank; the oracle recomputes the same permutation from
    // the same public hash.
    "q124_shuffle_order" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        Sampling.shuffleOrder(
            Tables(s, dir, "documents").select(col("doc_id")),
            "doc_id", seed = "ep0")
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(row_number() OVER (
                 ORDER BY md5('ep0:' || CAST(doc_id AS VARCHAR)),
                          'ep0:' || CAST(doc_id AS VARCHAR)) - 1
                 AS BIGINT) AS shuffle_pos
        FROM documents ORDER BY doc_id""")),

    // Budget-capped curation: keep the best documents by type-token
    // ratio until a 12k-token budget is spent (whole docs only — the
    // maximal quality-prefix). Two-phase distributed prefix sum in
    // score order; the oracle recomputes it as the single global
    // window the Spark side deliberately avoids.
    "q125_token_budget" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val scored = Tables(s, dir, "documents")
          .withColumn("q", T.typeTokenRatio(col("text")))
          .withColumn("ntok", T.tokenCount(col("text")))
        Sampling.takeTokenBudget(scored, "q", "doc_id", col("ntok"),
            budget = 12000L)
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("tok_used"),
            round(avg(col("q")), 4).as("avg_q"),
            sum(col("doc_id")).as("id_checksum"))
      },
      oracle = Some("""
        WITH scored AS (
          SELECT doc_id,
                 len(string_split(text,' ')) AS ntok,
                 round(len(list_distinct(string_split(text,' ')))::DOUBLE /
                       len(string_split(text,' ')), 4) AS q
          FROM documents),
        sel AS (
          SELECT * FROM scored
          QUALIFY sum(ntok) OVER (ORDER BY q DESC NULLS LAST, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  <= 12000)
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS tok_used,
               round(avg(q), 4) AS avg_q,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM sel""")),

    // Epoch-repetition schedule for data-constrained training
    // (Muennighoff 2023): a 2.5-epoch token budget → every doc seen 2
    // full epochs, the best docs by type-token ratio get a 3rd up to
    // the remainder. Corpus total and budget are in-plan scalars; the
    // remainder prefix is the q125 two-phase prefix sum. The oracle
    // recomputes the schedule with the global window the Spark side
    // deliberately avoids.
    "q126_repetition_schedule" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val scored = Tables(s, dir, "documents")
          .withColumn("q", T.typeTokenRatio(col("text")))
          .withColumn("ntok", T.tokenCount(col("text")))
        Sampling.repetitionScheduleEpochs(scored, "q", "doc_id",
            col("ntok"), epochs = 2.5)
          .groupBy(col("repeats"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("tok"),
            round(avg(col("q")), 4).as("avg_q"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("repeats")
      },
      oracle = Some("""
        WITH scored AS (
          SELECT doc_id,
                 len(string_split(text,' ')) AS ntok,
                 round(len(list_distinct(string_split(text,' ')))::DOUBLE /
                       len(string_split(text,' ')), 4) AS q
          FROM documents),
        par AS (
          SELECT CAST(ceil(2.5 * sum(ntok)) AS BIGINT) AS b,
                 CAST(sum(ntok) AS BIGINT) AS t
          FROM scored),
        pfx AS (
          SELECT s.*, coalesce(sum(ntok) OVER (
                   ORDER BY q DESC NULLS LAST, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS p
          FROM scored s),
        rep AS (
          SELECT pfx.*, ((b - b % t) // t) +
                 (CASE WHEN p + ntok <= b % t THEN 1 ELSE 0 END) AS repeats
          FROM pfx, par)
        SELECT CAST(repeats AS BIGINT) AS repeats,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS tok,
               round(avg(q), 4) AS avg_q,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM rep GROUP BY repeats ORDER BY repeats""")),

    // Per-source score calibration: exact percent_rank of the quality
    // score WITHIN each source (two-phase bucketed rank — no one-task-
    // per-source window), then keep each source's best 25% — the fair
    // cross-source cut raw scores can't give (CCNet's per-dump quality
    // buckets, Wenzek 2019). The oracle is the literal percent_rank
    // window.
    "q127_calibrated_quality" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val scored = Tables(s, dir, "documents")
          .withColumn("q", T.typeTokenRatio(col("text")))
        Sampling.scoreRankPerStratum(scored, "source", "q", "doc_id",
            outCol = "spr")
          .filter(col("spr") <= 0.25)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            round(avg(col("q")), 4).as("avg_q"),
            round(max(col("spr")), 4).as("max_pr"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH scored AS (
          SELECT doc_id, source,
                 round(len(list_distinct(string_split(text,' ')))::DOUBLE /
                       len(string_split(text,' ')), 4) AS q
          FROM documents),
        pr AS (
          SELECT *, percent_rank() OVER (PARTITION BY source
                      ORDER BY q DESC NULLS LAST, doc_id) AS spr
          FROM scored)
        SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
               round(avg(q), 4) AS avg_q,
               round(max(spr), 4) AS max_pr,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM pr WHERE spr <= 0.25 GROUP BY source ORDER BY source""")),

    // Per-language fraction quota: keep exactly the best ceil(30%) of
    // every language by quality score — the fraction complement of
    // q123's absolute per-source cap, spelled as a pure filter against
    // a broadcast per-stratum threshold map (full rows never shuffle).
    // The oracle recomputes the cut with the per-partition window the
    // Spark side deliberately avoids.
    "q128_lang_top_fraction" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val scored = Tables(s, dir, "documents")
          .withColumn("q", T.typeTokenRatio(col("text")))
        Sampling.topFractionPerStratum(scored, "lang", "q", "doc_id",
            frac = 0.3)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            round(avg(col("q")), 4).as("avg_q"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH scored AS (
          SELECT doc_id, lang,
                 round(len(list_distinct(string_split(text,' ')))::DOUBLE /
                       len(string_split(text,' ')), 4) AS q
          FROM documents),
        kept AS (
          SELECT * FROM scored
          QUALIFY row_number() OVER (PARTITION BY lang
                    ORDER BY q DESC NULLS LAST, doc_id)
                  <= ceil(0.3 * count(*) OVER (PARTITION BY lang)))
        SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
               round(avg(q), 4) AS avg_q,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM kept GROUP BY lang ORDER BY lang""")),

    // ------------------------------------------------------------------
    // Per-SOURCE token budgets — how a production mixture is actually
    // specified ("this many tokens of web, that many of code"): within
    // each listed source keep the best whole documents until that
    // source's token budget is spent; unlisted sources drop. The q125
    // weighted-prefix machinery under the q128 threshold-map spelling —
    // full rows never shuffle, the per-source cut lives in a one-row
    // scalar map. Budgets exercise the edges: a zero budget (src0),
    // partial cuts, and an over-corpus budget (src3, keeps all). The
    // oracle recomputes the cut with the per-source window the Spark
    // side deliberately avoids.
    // ------------------------------------------------------------------
    "q130_source_token_budget" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        val scored = Tables(s, dir, "documents")
          .withColumn("q", T.typeTokenRatio(col("text")))
          .withColumn("ntok", T.tokenCount(col("text")))
        Sampling.takeTokenBudgetPerStratum(scored, "source", "q",
            "doc_id", col("ntok"),
            budgets = Map("src0" -> 0L, "src1" -> 700L, "src2" -> 900L,
              "src3" -> 1000000L, "src19" -> 500L))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("tok_used"),
            round(avg(col("q")), 4).as("avg_q"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH scored AS (
          SELECT doc_id, source,
                 len(string_split(text,' ')) AS ntok,
                 round(len(list_distinct(string_split(text,' ')))::DOUBLE /
                       len(string_split(text,' ')), 4) AS q
          FROM documents),
        budgeted AS (
          SELECT *, CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 700
                                WHEN 'src2' THEN 900 WHEN 'src3' THEN 1000000
                                WHEN 'src19' THEN 500 END AS b
          FROM scored),
        kept AS (
          SELECT * FROM budgeted WHERE b IS NOT NULL
          QUALIFY sum(ntok) OVER (PARTITION BY source
                    ORDER BY q DESC NULLS LAST, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  <= b)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS tok_used,
               round(avg(q), 4) AS avg_q,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM kept GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // Information-theoretic quality profile (Shannon entropy —
    // the low-entropy/gibberish signal family of public curation
    // stacks, e.g. RedPajama-v2's quality-signal set): per-doc word
    // entropy, code-point entropy, and top-token mass from ONE native
    // per-row pass ([[graft.plans.TextEntropyExpr]] — no shuffle, no
    // explode). The oracle recomputes all three from unnest+group
    // counts using the same algebraic form, log2(n) − Σ c·log2 c / n.
    // ------------------------------------------------------------------
    "q131_entropy_profile" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.entropyProfile(Tables(s, dir, "documents"),
          "doc_id", "text")
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 string_split(text, '') AS chs
          FROM documents),
        wg AS (
          SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
          GROUP BY doc_id, tok),
        ws AS (
          SELECT doc_id, sum(c * log2(c)) AS s, max(c) AS maxc
          FROM wg GROUP BY doc_id),
        cg AS (
          SELECT doc_id, ch, count(*) AS c
          FROM (SELECT doc_id, unnest(chs) AS ch FROM t)
          GROUP BY doc_id, ch),
        cs AS (SELECT doc_id, sum(c * log2(c)) AS s FROM cg GROUP BY doc_id)
        SELECT t.doc_id AS doc_id,
               round(log2(len(toks)) - ws.s / len(toks), 4) AS word_entropy,
               round(log2(len(chs)) - cs.s / len(chs), 4) AS char_entropy,
               round(ws.maxc::DOUBLE / len(toks), 4) AS top_token_share
        FROM t JOIN ws ON ws.doc_id = t.doc_id
               JOIN cs ON cs.doc_id = t.doc_id
        ORDER BY t.doc_id""")),

    // ------------------------------------------------------------------
    // DSIR importance weighting + resampling (Xie et al. 2023,
    // arXiv:2302.03169): hashed-bigram bucket models for target
    // (source = 'src0') vs the full raw corpus, per-doc log importance
    // weight, then Gumbel-top-k resampling. See
    // [[graft.operators.Dsir]] for the scale contracts; the oracle
    // replays the q120 hash toolkit + the same four-ln λ chain.
    // ------------------------------------------------------------------
    "q132_dsir_weights" -> Q(
      fn = (s, dir) => {
        import graft.operators.Dsir
        val docs = Tables(s, dir, "documents")
        Dsir.importanceWeights(
          docs, docs.filter(col("source") === "src0"),
          "doc_id", "text", dims = 4096, alpha = 1.0)
          .select(col("id").as("doc_id"), col("n_features"), col("logw"))
          .orderBy("doc_id")
      },
      oracle = Some(PortableHashSql.dsirWeightsSql(
        dims = 4096, alpha = 1.0, targetWhere = "source = 'src0'"))),

    "q133_dsir_resample" -> Q(
      fn = (s, dir) => {
        import graft.operators.Dsir
        val docs = Tables(s, dir, "documents")
        val w = Dsir.importanceWeights(
          docs, docs.filter(col("source") === "src0"),
          "doc_id", "text", dims = 4096, alpha = 1.0)
        Dsir.gumbelTopK(w, "id", "logw", k = 100, seed = Some(7L))
          .select(col("id").as("doc_id"), col("rank"),
            col("key"), col("logw"))
          .orderBy("rank")
      },
      oracle = Some(PortableHashSql.dsirTopKSql(
        dims = 4096, alpha = 1.0, targetWhere = "source = 'src0'",
        k = 100, seed = 7L))),

    // ------------------------------------------------------------------
    // Embedding-space outlier scrub: cosine of every vector against its
    // LABEL-group mean centroid, flagged below 0.0 (pointing away from
    // its cohort) — the off-topic/noise removal step before semantic
    // dedup. Centroids are distributed (group, dim)-keyed avg
    // aggregates (no driver training), broadcast back for the fused
    // dot-product scoring; see Similarity.centroidCosineOutliers.
    // ------------------------------------------------------------------
    "q134_embedding_outliers" -> Q(
      fn = (s, dir) => {
        Similarity.centroidCosineOutliers(
          Tables(s, dir, "embeddings"), "vec_id", "embedding", "label",
          threshold = 0.0)
          .select(col("id").as("vec_id"), col("grp").as("label"),
            col("cos_centroid"), col("is_outlier"))
          .orderBy("vec_id")
      },
      oracle = Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                   FROM embeddings),
        d AS (SELECT label, unnest(v) AS x,
                     generate_subscripts(v, 1) AS i FROM e),
        m AS (SELECT label, i, avg(x) AS m FROM d GROUP BY label, i),
        c AS (SELECT label, list(m ORDER BY i) AS c FROM m GROUP BY label),
        sc AS (
          SELECT e.vec_id, e.label,
                 round(list_inner_product(e.v, c.c) /
                   (sqrt(list_inner_product(e.v, e.v)) *
                    sqrt(list_inner_product(c.c, c.c))), 4) AS cos_centroid
          FROM e JOIN c USING (label))
        SELECT vec_id, label, cos_centroid,
               cos_centroid < 0.0 AS is_outlier
        FROM sc ORDER BY vec_id""")),

    // ------------------------------------------------------------------
    // Corpus diversity profile per source: doc/token/type counts,
    // type-token ratio, distinct-vs-total word-3-gram diversity — the
    // lexical-diversity report before fixing a training mixture. Three
    // group-keyed partial+final aggregations (distinct counts two-phase
    // on (group, value)); text never shuffles.
    // ------------------------------------------------------------------
    "q135_corpus_diversity" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.diversityProfile(Tables(s, dir, "documents"),
          "source", "text", n = 3)
          .select(col("grp").as("source"), col("n_docs"), col("n_tokens"),
            col("n_types"), col("ttr"), col("n_grams"),
            col("n_distinct_grams"), col("gram_diversity"))
          .orderBy("source")
      },
      oracle = Some("""
        WITH t AS (
          SELECT source, string_split(text, ' ') AS tk FROM documents),
        d AS (SELECT source, count(*) AS n_docs FROM documents
              GROUP BY source),
        tok AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(count(DISTINCT u) AS BIGINT) AS n_types
          FROM (SELECT source, unnest(tk) AS u FROM t) GROUP BY source),
        gr AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_grams
          FROM (SELECT source,
                       unnest([tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                               for i in range(len(tk)-2)]) AS g
                FROM t)
          GROUP BY source)
        SELECT d.source, d.n_docs,
               coalesce(tok.n_tokens, 0) AS n_tokens,
               coalesce(tok.n_types, 0) AS n_types,
               round(tok.n_types::DOUBLE / tok.n_tokens, 4) AS ttr,
               coalesce(gr.n_grams, 0) AS n_grams,
               coalesce(gr.n_distinct_grams, 0) AS n_distinct_grams,
               round(gr.n_distinct_grams::DOUBLE / gr.n_grams, 4)
                 AS gram_diversity
        FROM d LEFT JOIN tok USING (source) LEFT JOIN gr USING (source)
        ORDER BY d.source""")),

    // ------------------------------------------------------------------
    // Corpus-wide kNN graph via IVF cells (rows-only like q29/q85 —
    // the trained centroid space is engine-local; EntrySpec pins the
    // full sf0.01 content golden, SimilaritySpec grades recall vs
    // brute force): every vector's top-5 cosine neighbors, both join
    // sides the corpus (no broadcast query side), per-query ranking
    // windows bounded by probes x cellSize.
    // ------------------------------------------------------------------
    "q136_knn_graph" -> Q(
      fn = (s, dir) => {
        // cell count AUTO-SCALES with the corpus (n / targetCellSize)
        // — a pinned nCells keeps Σ|cell|² quadratic in n (the r7
        // 10x probe measured e10 = 1.39 with nCells = 16); the auto
        // rule holds cell size ~constant so candidate volume is linear
        Similarity.knnGraph(Tables(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5, targetCellSize = 256,
          probes = 2)
          .orderBy("query_id", "rank")
      }),

    // ------------------------------------------------------------------
    // C4-style blocklist screen: per-doc count of blocklisted token
    // occurrences (case-insensitive) + keep flag — one per-row array
    // expression, no explode, no shuffle.
    // ------------------------------------------------------------------
    "q137_blocklist_filter" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.blocklistFilter(Tables(s, dir, "documents"),
          "doc_id", "text", blocklist = Seq("dup", "crash"))
          .select(col("id").as("doc_id"), col("n_blocked"), col("keep"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(len(list_filter(string_split(lower(text), ' '),
                 t -> list_contains(['dup', 'crash'], t))) AS BIGINT)
                 AS n_blocked,
               len(list_filter(string_split(lower(text), ' '),
                 t -> list_contains(['dup', 'crash'], t))) = 0 AS keep
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Gopher heuristic quality gate (Rae 2021 App. A): word-count
    // bounds, mean word length, stopword floor, alpha-word fraction,
    // top-token repetition mass — all per-row expressions, keep = AND
    // of all screens on rounded/integer values.
    // ------------------------------------------------------------------
    "q138_gopher_gate" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.gopherQualityGate(Tables(s, dir, "documents"),
          "doc_id", "text",
          minWords = 20, maxWords = 1000,
          minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
          minStopwords = 2,
          stopwords = Seq("the", "a", "of", "to", "and"),
          minAlphaFrac = 0.8, maxTopTokenShare = 0.15)
          .select(col("id").as("doc_id"), col("n_words"),
            col("mean_word_len"), col("n_stopwords"), col("alpha_frac"),
            col("top_token_share"), col("keep"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        tok AS (
          SELECT doc_id, u, count(*) AS c
          FROM (SELECT doc_id, unnest(tk) AS u FROM t) GROUP BY doc_id, u),
        top AS (
          SELECT doc_id, round(max(c)::DOUBLE / sum(c), 4) AS shr
          FROM tok GROUP BY doc_id),
        s AS (
          SELECT t.doc_id,
                 CAST(len(tk) AS BIGINT) AS n_words,
                 round(list_reduce(list_prepend(0.0::DOUBLE,
                     list_transform(tk, x -> len(x)::DOUBLE)),
                   (a, b) -> a + b) / len(tk), 4) AS mean_word_len,
                 CAST(len(list_filter(tk, x -> list_contains(
                   ['the', 'a', 'of', 'to', 'and'], lower(x))))
                   AS BIGINT) AS n_stopwords,
                 round(len(list_filter(tk,
                     x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                   / len(tk), 4) AS alpha_frac,
                 top.shr AS top_token_share
          FROM t JOIN top USING (doc_id))
        SELECT doc_id, n_words, mean_word_len, n_stopwords, alpha_frac,
               top_token_share,
               (n_words >= 20 AND n_words <= 1000 AND
                mean_word_len >= 3.0 AND mean_word_len <= 10.0 AND
                n_stopwords >= 2 AND alpha_frac >= 0.8 AND
                top_token_share <= 0.15) AS keep
        FROM s ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Multi-signal rank-fusion quality ensemble: word entropy, token
    // count and stopword ratio each converted to exact global percent
    // rank (two-phase bucketed kernel — never one corpus-wide window
    // task), mean of ranks as the ensemble score. Signals pre-rounded
    // so identical-content docs compare EQUAL and the doc_id tie-break
    // stays engine-portable.
    // ------------------------------------------------------------------
    "q139_quality_ensemble" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        import graft.plans.TextModelExpressions
        val sig = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            TextModelExpressions.textEntropy(col("text")).as("e"))
          .select(col("doc_id"),
            round(col("e.word_entropy"), 4).as("s_ent"),
            size(split(col("text"), " ")).cast("long").as("s_len"),
            T.stopwordRatio(col("text"), Seq("the", "a")).as("s_stop"))
        Sampling.rankEnsemble(sig, Seq("s_ent", "s_len", "s_stop"),
          "doc_id", outCol = "ensemble_pr")
          .select(col("doc_id"),
            col("__pr_s_ent").as("pr_ent"), col("__pr_s_len").as("pr_len"),
            col("__pr_s_stop").as("pr_stop"), col("ensemble_pr"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        wg AS (
          SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
          GROUP BY doc_id, tok),
        ws AS (SELECT doc_id, sum(c * log2(c)) AS sm FROM wg
               GROUP BY doc_id),
        sig AS (
          SELECT t.doc_id,
                 round(log2(len(toks)) - ws.sm / len(toks), 4) AS s_ent,
                 CAST(len(toks) AS BIGINT) AS s_len,
                 round(len(list_filter(toks,
                     x -> list_contains(['the', 'a'], x)))::DOUBLE
                   / len(toks), 4) AS s_stop
          FROM t JOIN ws USING (doc_id)),
        pr AS (
          SELECT doc_id,
                 percent_rank() OVER (ORDER BY s_ent DESC NULLS LAST,
                                      doc_id) AS pr_ent,
                 percent_rank() OVER (ORDER BY s_len DESC NULLS LAST,
                                      doc_id) AS pr_len,
                 percent_rank() OVER (ORDER BY s_stop DESC NULLS LAST,
                                      doc_id) AS pr_stop
          FROM sig)
        SELECT doc_id, pr_ent, pr_len, pr_stop,
               round((pr_ent + pr_len + pr_stop) / 3, 6) AS ensemble_pr
        FROM pr ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Anchor-similarity mining ("find more like these"): every vector's
    // best cosine against a broadcast seed set (vec_id < 8), winning
    // anchor id, keep flag — argmax on the ROUNDED cosine, ties to the
    // smallest anchor. No corpus shuffle for the join; one id-keyed
    // partial+final max.
    // ------------------------------------------------------------------
    "q140_anchor_mining" -> Q(
      fn = (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        Similarity.anchorSimilarity(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          threshold = 0.3)
          .select(col("id").as("vec_id"), col("best_anchor"),
            col("cosine"), col("keep"))
          .orderBy("vec_id")
      },
      oracle = Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        a AS (SELECT vec_id AS aid, embedding::DOUBLE[] AS av
              FROM embeddings WHERE vec_id < 8),
        sc AS (
          SELECT e.vec_id, a.aid,
                 round(list_inner_product(e.v, a.av) /
                   (sqrt(list_inner_product(e.v, e.v)) *
                    sqrt(list_inner_product(a.av, a.av))), 4) AS c
          FROM e CROSS JOIN a),
        best AS (
          SELECT vec_id, aid, c,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY c DESC, aid) AS rn
          FROM sc)
        SELECT vec_id, aid AS best_anchor, c AS cosine,
               c >= 0.3 AS keep
        FROM best WHERE rn = 1 ORDER BY vec_id""")),

    // ------------------------------------------------------------------
    // Edit-distance similarity join (Ed-Join): every doc pair within 5
    // character edits — the typo/OCR-noise notion of "near duplicate",
    // complementing the set-overlap families (q23-q25, q43, q55). The
    // q-gram prefix filter is LOSSLESS here (len 48+ docs, q=8, k=5:
    // len-q+1 > k*q holds corpus-wide), so the operator's output is
    // the EXACT pair set and the oracle can brute-force it directly
    // (length band |Δlen| <= k, then full Levenshtein). Both engines
    // compute character-level distance; the corpus is ASCII, where
    // DuckDB's byte-level implementation coincides.
    // ------------------------------------------------------------------
    "q179_dedup_edit_distance" -> Q(
      fn = (s, dir) => {
        Dedup.editDistancePairs(
          Tables(s, dir, "documents"), "doc_id", "text",
          q = 8, maxDist = 5)
          .orderBy("a_id", "b_id")
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, text, len(text) AS L FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(levenshtein(a.text, b.text) AS INT) AS ed
        FROM d a JOIN d b
          ON a.doc_id < b.doc_id AND abs(a.L - b.L) <= 5
        WHERE levenshtein(a.text, b.text) <= 5
        ORDER BY a_id, b_id""")),

    // ------------------------------------------------------------------
    // Streaming trending tokens, gated END-TO-END like q147: the
    // corpus arrives as two micro-batches (doc_id parity) through the
    // per-batch step — batch 0 seeds the counts store and emits no
    // rows (no reference yet), batch 1 reports its top-10 tokens by
    // smoothed integer-milli frequency lift against the accumulated
    // store. The drift alarm (q147) says THAT the batch moved; this
    // says WHERE. The oracle recomputes the lift ledger directly from
    // the parity split — same smoothing, same (lift desc, tok) total
    // order, bit-exact integer arithmetic.
    // ------------------------------------------------------------------
    "q184_trending_tokens" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q184-store").toString
        val trendDir = java.nio.file.Files
          .createTempDirectory("graft-q184-trend").toString
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        Streaming.trendingTokensBatch(docs.filter(col("doc_id") % 2 === 0),
          0L, storeDir, trendDir, "text")
        Streaming.trendingTokensBatch(docs.filter(col("doc_id") % 2 =!= 0),
          1L, storeDir, trendDir, "text")
        materializeAndClean(
          s.read.option("basePath", trendDir).parquet(trendDir)
            .select(col("batch_id").cast("long").as("batch_id"),
              col("tok"), col("cb"), col("cp"), col("lift_milli"))
            .orderBy(col("lift_milli").desc, col("tok")),
          storeDir, trendDir)
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id % 2 AS b, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        c AS (SELECT b, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        b0 AS (SELECT tok, c FROM c WHERE b = 0),
        b1 AS (SELECT tok, c FROM c WHERE b = 1),
        j AS (SELECT COALESCE(b1.tok, b0.tok) AS tok,
                     COALESCE(b1.c, 0) AS cb, COALESCE(b0.c, 0) AS cp
              FROM b1 FULL OUTER JOIN b0 ON b1.tok = b0.tok),
        s AS (SELECT CAST(sum(cb) AS BIGINT) AS nb,
                     CAST(sum(cp) AS BIGINT) AS np,
                     count(*) AS v FROM j)
        SELECT CAST(1 AS BIGINT) AS batch_id, tok,
               CAST(cb AS BIGINT) AS cb, CAST(cp AS BIGINT) AS cp,
               CAST((1000 * (cb + 1) * (np + v)) //
                    ((nb + v) * (cp + 1)) AS BIGINT) AS lift_milli
        FROM j CROSS JOIN s
        WHERE cb > 0
        ORDER BY lift_milli DESC, tok LIMIT 10""")),

    // ------------------------------------------------------------------
    // Near-dup provenance matrix: VERIFIED J>=0.5 pairs grouped by the
    // (unordered) source pair they straddle — the provenance
    // refinement of q157's per-source dup shares, on exact verified
    // pairs where q175's mirror matrix counts rare-gram candidates
    // (signal vs evidence: this is the one you act on). A cross-source
    // cell is syndication; a diagonal cell is re-crawl within one
    // source. Pair volume is output-sized, so the provenance joins
    // ride a slim (doc_id, source) projection.
    // ------------------------------------------------------------------
    "q193_neardup_source_matrix" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.5, partitionCol = Some("lang"))
        val src = docs.select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("a_id"),
            col("source").as("__sa")), "a_id")
          .join(src.select(col("doc_id").as("b_id"),
            col("source").as("__sb")), "b_id")
          .groupBy(least(col("__sa"), col("__sb")).as("src_a"),
            greatest(col("__sa"), col("__sb")).as("src_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("n_pairs").desc, col("src_a"), col("src_b"))
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id, lang, source,
                 list_distinct([array_to_string(
                   string_split(text,' ')[i+1:i+3],' ')
                   for i in range(len(string_split(text,' '))-2)]) AS s
          FROM documents),
        p AS (
          SELECT least(a.source, b.source) AS src_a,
                 greatest(a.source, b.source) AS src_b
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.s,b.s))::DOUBLE /
                (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 3)
                >= 0.5)
        SELECT src_a, src_b, count(*) AS n_pairs
        FROM p GROUP BY 1, 2
        ORDER BY n_pairs DESC, src_a, src_b""")),

    // ------------------------------------------------------------------
    // Per-document dedup disposition: the governance audit trail a
    // production pipeline files BEFORE rows disappear — every doc
    // labeled drop_exact (an exact copy that lost the min-id keeper
    // vote), review_near_dup (member of a J>=0.5 near-dup pair), or
    // keep. Composes the q22 fingerprint family vote and the q23 pair
    // graph into one per-doc ledger; counts alone (q157) can't answer
    // "why did doc 4711 vanish".
    // ------------------------------------------------------------------
    "q191_dedup_disposition" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val fp = docs.select(col("doc_id"),
          T.fingerprint(col("text")).as("fp"))
        val keepers = Dedup.exact(docs, "doc_id", "text")
          .select(col("fp"), col("keep_id"))
        val exactDrop = fp.join(keepers, Seq("fp"))
          .filter(col("doc_id") =!= col("keep_id"))
          .select(col("doc_id")).withColumn("__ex", lit(true))
        val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.5, partitionCol = Some("lang"))
        val nearMember = pairs.select(col("a_id").as("doc_id"))
          .unionAll(pairs.select(col("b_id").as("doc_id")))
          .distinct().withColumn("__nd", lit(true))
        docs.select(col("doc_id"), col("lang"), col("source"))
          .join(exactDrop, Seq("doc_id"), "left")
          .join(nearMember, Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang"), col("source"),
            when(coalesce(col("__ex"), lit(false)), "drop_exact")
              .when(coalesce(col("__nd"), lit(false)), "review_near_dup")
              .otherwise("keep").as("disposition"))
          .filter(col("disposition") =!= "keep") // the audit rows
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH fp AS (
          SELECT doc_id, lang, source,
                 md5(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '',
                     'g')) AS fp
          FROM documents),
        keepers AS (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY 1),
        ex AS (SELECT f.doc_id FROM fp f JOIN keepers k USING (fp)
               WHERE f.doc_id <> k.keep_id),
        sh AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(
                   string_split(text,' ')[i+1:i+3],' ')
                   for i in range(len(string_split(text,' '))-2)]) AS s
          FROM documents),
        p AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.s,b.s))::DOUBLE /
                (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 3)
                >= 0.5),
        nd AS (SELECT a_id AS doc_id FROM p
               UNION SELECT b_id FROM p)
        SELECT d.doc_id, d.lang, d.source,
               CASE WHEN d.doc_id IN (SELECT doc_id FROM ex)
                      THEN 'drop_exact'
                    WHEN d.doc_id IN (SELECT doc_id FROM nd)
                      THEN 'review_near_dup'
                    ELSE 'keep' END AS disposition
        FROM documents d
        WHERE d.doc_id IN (SELECT doc_id FROM ex)
           OR d.doc_id IN (SELECT doc_id FROM nd)
        ORDER BY d.doc_id""")),

    // ------------------------------------------------------------------
    // Dedup threshold sensitivity: how many pairs (and docs) each
    // candidate Jaccard threshold would implicate — the sweep read
    // before committing a dedup config, from ONE pair computation at
    // the LOWEST threshold re-thresholded upward (lossless: the prefix
    // filter at 0.3 provably keeps every pair any higher threshold
    // admits). Thresholds ride the plan as a literal array (the q152
    // device); the pair frame is output-sized, so the per-threshold
    // distinct-doc explode is free.
    // ------------------------------------------------------------------
    "q192_dedup_sensitivity" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val pairs = Dedup.ngramJaccardPairs(
          Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.3, partitionCol = Some("lang"))
        val hit = pairs.select(col("a_id"), col("b_id"), col("jaccard"),
            explode(typedLit(Seq(300, 500, 700, 900))).as("t_milli"))
          .filter(col("jaccard") >= col("t_milli").cast("double") / 1000.0)
        val nPairs = hit.groupBy(col("t_milli"))
          .agg(count(lit(1)).as("n_pairs"))
        val nDocs = hit
          .select(col("t_milli"),
            explode(array(col("a_id"), col("b_id"))).as("doc_id"))
          .groupBy(col("t_milli"))
          .agg(countDistinct(col("doc_id")).as("n_docs"))
        Seq(300, 500, 700, 900).toDF("t_milli")
          .join(nPairs, Seq("t_milli"), "left")
          .join(nDocs, Seq("t_milli"), "left")
          .select(col("t_milli"),
            coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"))
          .orderBy("t_milli")
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(
                   string_split(text,' ')[i+1:i+3],' ')
                   for i in range(len(string_split(text,' '))-2)]) AS s
          FROM documents),
        p AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 round(len(list_intersect(a.s,b.s))::DOUBLE /
                   (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 3)
                   AS j
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.s,b.s))::DOUBLE /
                (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 3)
                >= 0.3),
        t(t_milli) AS (VALUES (300), (500), (700), (900)),
        f AS (SELECT t.t_milli, p.a_id, p.b_id
              FROM t LEFT JOIN p ON p.j >= t.t_milli / 1000.0),
        g AS (SELECT t_milli, count(a_id) AS n_pairs FROM f GROUP BY 1),
        d AS (SELECT t_milli, count(DISTINCT id) AS n_docs
              FROM (SELECT t_milli, unnest([a_id, b_id]) AS id
                    FROM f WHERE a_id IS NOT NULL)
              GROUP BY 1)
        SELECT g.t_milli, g.n_pairs,
               COALESCE(d.n_docs, 0) AS n_docs
        FROM g LEFT JOIN d USING (t_milli)
        ORDER BY t_milli""")),

    // ------------------------------------------------------------------
    // Language-ID confusion matrix: q31's n-gram-marker classifier
    // scored against the gold lang column — (gold, predicted, count,
    // per-gold share in exact milli). The standard error-analysis read
    // for ANY classifier the engine hosts: accuracy per class lives on
    // the diagonal, and the off-diagonal mass says WHICH languages the
    // marker set confuses (the q161 label-confusion idea applied to a
    // real in-engine model). One per-row expression pass + one ledger
    // aggregate; the oracle embeds the q31 classifier SQL verbatim, so
    // the two gates can never drift apart.
    // ------------------------------------------------------------------
    "q190_langid_confusion" -> Q(
      fn = (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("lang"), T.langId(col("text")).as("lang_pred"))
          .groupBy(col("lang"), col("lang_pred"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("gold_share_milli",
            expr("1000L * `n_docs` div " +
              "sum(`n_docs`) over (partition by `lang`)"))
          .orderBy("lang", "lang_pred")
      },
      oracle = Some(s"""
        WITH pred AS (${LangIdOracle.core}),
        g AS (
          SELECT d.lang, p.lang_pred, count(*) AS n_docs
          FROM documents d JOIN pred p USING (doc_id)
          GROUP BY 1, 2)
        SELECT lang, lang_pred, n_docs,
               CAST(1000 * n_docs //
                 (sum(n_docs) OVER (PARTITION BY lang)) AS BIGINT)
                 AS gold_share_milli
        FROM g ORDER BY lang, lang_pred""")),

    // ------------------------------------------------------------------
    // Asymmetric containment near-dups: ordered (src, sup) pairs with
    // |S_src ∩ S_sup| / |S_src| >= 0.6 over word-3-gram sets, confined
    // to a language — the subset/superset duplication symmetric
    // Jaccard misses (a page quoted inside a 10x page has J≈0.1,
    // C=1.0). Candidates from the src side's lossless rarity prefix
    // against the full index; exact sorted-merge verify. The oracle
    // brute-forces the pairwise definition directly.
    // ------------------------------------------------------------------
    "q197_dedup_containment" -> Q(
      fn = (s, dir) => {
        Dedup.containmentPairs(
          Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.6, partitionCol = Some("lang"))
          .orderBy("src_id", "sup_id")
      },
      oracle = Some("""
        WITH s AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(string_split(text,' ')[i+1:i+3],' ')
                                for i in range(len(string_split(text,' '))-2)]) AS sh
          FROM documents
          WHERE len(string_split(text,' ')) >= 3)
        SELECT a.doc_id AS src_id, b.doc_id AS sup_id,
               round(len(list_intersect(a.sh,b.sh))::DOUBLE / len(a.sh), 3)
                 AS containment
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
        WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE / len(a.sh), 3)
              >= 0.6
        ORDER BY src_id, sup_id""")),

    // ------------------------------------------------------------------
    // Exact heavy hitters WITHOUT a vocabulary-wide shuffle: every
    // token with global count strictly > N/(k+1), k=30 — per-partition
    // Misra–Gries summaries (bounded memory), then one exact recount
    // restricted to the model-sized candidate union (a provable
    // superset: pigeonhole over the per-partition undercount bound).
    // The oracle is the plain exact spelling; the operator's point is
    // the PHYSICAL plan, so equality IS the gate.
    // ------------------------------------------------------------------
    "q198_heavy_hitters" -> Q(
      fn = (s, dir) => {
        TextStats.heavyHitters(Tables(s, dir, "documents"), "text", k = 30)
      },
      oracle = Some("""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        tot AS (SELECT count(*) AS n FROM toks)
        SELECT tok, count(*) AS cnt
        FROM toks GROUP BY tok
        HAVING count(*) * 31 > (SELECT n FROM tot)
        ORDER BY cnt DESC, tok""")),

    // ------------------------------------------------------------------
    // q198 stratified by language: per-language heavy hitters through
    // the GROUPED Misra–Gries aggregate (a true aggregate function, so
    // per-group bounded-memory summaries are just groupBy + the same
    // fused sketch/count pass) — which boilerplate dominates WHICH
    // language, at O(k) memory per group.
    // ------------------------------------------------------------------
    "q214_heavy_hitters_per_lang" -> Q(
      fn = (s, dir) => {
        TextStats.heavyHittersPerGroup(Tables(s, dir, "documents"),
            "lang", "text", k = 30)
          .withColumnRenamed("group", "lang")
      },
      oracle = Some("""
        WITH toks AS (
          SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        tot AS (SELECT lang, count(*) AS n FROM toks GROUP BY 1),
        g AS (SELECT lang, tok, count(*) AS cnt
              FROM toks GROUP BY 1, 2)
        SELECT g.lang, g.tok, g.cnt
        FROM g JOIN tot ON g.lang IS NOT DISTINCT FROM tot.lang
        WHERE g.cnt * 31 > tot.n
        ORDER BY g.lang NULLS FIRST, cnt DESC, tok""")),

    // ------------------------------------------------------------------
    // Syndication DIRECTION matrix: q197's containment pairs grouped
    // by the (containee source, container source) pair — q193's
    // symmetric "which sources share near-dups" upgraded with an
    // arrow: a cell (A, B) with large counts and its mirror (B, A)
    // near zero says B republishes A's content, not the reverse — the
    // evidence that decides WHICH source's copies get dropped. Pair
    // frame is output-sized, provenance joins slim, one keyed count.
    // ------------------------------------------------------------------
    "q203_syndication_direction" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.6, partitionCol = Some("lang"))
        val src = docs.select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("src_id"),
            col("source").as("containee")), "src_id")
          .join(src.select(col("doc_id").as("sup_id"),
            col("source").as("container")), "sup_id")
          .groupBy("containee", "container")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("n_pairs").desc, col("containee"), col("container"))
      },
      oracle = Some("""
        WITH sh AS (
          SELECT doc_id, lang, source,
                 list_distinct([array_to_string(
                   string_split(text,' ')[i+1:i+3],' ')
                   for i in range(len(string_split(text,' '))-2)]) AS s
          FROM documents
          WHERE len(string_split(text,' ')) >= 3),
        p AS (
          SELECT a.source AS containee, b.source AS container
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id <> b.doc_id
          WHERE round(len(list_intersect(a.s,b.s))::DOUBLE / len(a.s), 3)
                >= 0.6)
        SELECT containee, container, count(*) AS n_pairs
        FROM p GROUP BY 1, 2
        ORDER BY n_pairs DESC, containee, container""")),

    // ------------------------------------------------------------------
    // Near-dup cluster-size histogram: how duplicated IS the corpus —
    // (cluster_size → n_clusters, n_docs) over the J>=0.5 pair graph's
    // connected components, with every doc outside any pair counted as
    // a size-1 cluster (total docs minus pair members, two in-plan
    // scalars — no anti-join). The one-table answer to "is duplication
    // a few giant families or a long tail of twins", which decides
    // whether cluster-keeper policies (q142) matter or exact dedup
    // (q22) already covers the mass.
    // ------------------------------------------------------------------
    "q204_cluster_size_histogram" -> Q(
      fn = (s, dir) => {
        import graft.operators.ConnectedComponents
        val docs = Tables(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.5, partitionCol = Some("lang"))
        val comp = ConnectedComponents(pairs, "a_id", "b_id")
          .localCheckpoint(true) // sizes + the member-count scalar
        val hist = comp.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"))
        val totalDocs = graft.plans.Scalars.of(
          docs.agg(count(lit(1)).as("n")))
        val members = graft.plans.Scalars.of(
          comp.agg(count(lit(1)).as("n")))
        val singletons = s.range(1)
          .select(lit(1L).as("cluster_size"),
            (totalDocs - members).as("n_clusters"))
        hist.unionByName(singletons)
          .groupBy("cluster_size")
          .agg(sum(col("n_clusters")).as("n_clusters"))
          .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
          .orderBy("cluster_size")
      },
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(
                   string_split(text,' ')[i+1:i+3],' ')
                   for i in range(len(string_split(text,' '))-2)]) AS s
          FROM documents),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.s,b.s))::DOUBLE /
                (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 3)
                >= 0.5),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, lbl) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
        sizes AS (SELECT component, count(*) AS cluster_size
                  FROM comp GROUP BY 1),
        hist AS (SELECT cluster_size, count(*) AS n_clusters
                 FROM sizes GROUP BY 1
                 UNION ALL
                 SELECT 1, (SELECT count(*) FROM documents)
                           - (SELECT count(*) FROM comp))
        SELECT cluster_size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters,
               CAST(cluster_size * sum(n_clusters) AS BIGINT) AS n_docs
        FROM hist GROUP BY cluster_size
        ORDER BY cluster_size""")),

    // ------------------------------------------------------------------
    // Vocabulary growth curve: token types introduced by each tenth of
    // the corpus, walked in the seeded content-stable shuffle order
    // (file order correlates with source and biases the curve) — the
    // empirical Heaps'-law read behind "will more data still grow the
    // vocabulary". One (token → min position) aggregate, a step
    // ledger, integral checkpoint arithmetic on both engines.
    // ------------------------------------------------------------------
    "q205_vocab_growth" -> Q(
      fn = (s, dir) => {
        TextStats.vocabGrowth(Tables(s, dir, "documents"),
            "doc_id", "text", seed = "vg0", steps = 10, n = 2)
          .orderBy("step")
      },
      oracle = Some("""
        WITH ord AS (
          SELECT text,
                 row_number() OVER (
                   ORDER BY md5('vg0:' || CAST(doc_id AS VARCHAR)),
                            'vg0:' || CAST(doc_id AS VARCHAR)) - 1 AS pos
          FROM documents),
        n AS (SELECT count(*) AS n FROM documents),
        fs AS (
          SELECT tok, min(pos) AS fs
          FROM (SELECT pos,
                       unnest([array_to_string(
                         string_split(text,' ')[i+1:i+2],' ')
                         for i in range(len(string_split(text,' '))-1)])
                         AS tok
                FROM ord)
          GROUP BY tok),
        led AS (
          SELECT fs * 10 // (SELECT n FROM n) + 1 AS step,
                 count(*) AS new_types
          FROM fs GROUP BY 1)
        SELECT CAST(step AS BIGINT) AS step,
               CAST((step * (SELECT n FROM n)) // 10 AS BIGINT) AS cum_docs,
               CAST(new_types AS BIGINT) AS new_types,
               CAST(sum(new_types) OVER (ORDER BY step) AS BIGINT)
                 AS cum_types
        FROM led ORDER BY step""")),

    // ------------------------------------------------------------------
    // Incremental closure: the near-dup pair graph arrives in two
    // batches; batch 0 is clustered once, batch 1 is FOLDED IN through
    // label contraction (old components collapse to their min-id
    // labels, the closure runs on a graph bounded by the new batch,
    // never the accumulated history) — the delta-ingest asymmetry q70
    // applies to pair GENERATION, applied here to the closure step.
    // The oracle recomputes components over the union directly, so the
    // gate is exactly "incremental == full recompute".
    // ------------------------------------------------------------------
    "q209_incremental_cc" -> Q(
      fn = (s, dir) => {
        import graft.operators.ConnectedComponents
        val pairs = Dedup.ngramJaccardPairs(
          Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.5, partitionCol = Some("lang"))
          .localCheckpoint(true) // consumed by both batch slices
        val batch0 = pairs.filter((col("a_id") + col("b_id")) % 2 === 0)
        val batch1 = pairs.filter((col("a_id") + col("b_id")) % 2 =!= 0)
        ConnectedComponents.incremental(
            ConnectedComponents(batch0, "a_id", "b_id"),
            batch1, "a_id", "b_id")
          .groupBy(col("component"))
          .agg(count(lit(1)).as("n_docs"), sum(col("id")).as("id_checksum"))
          .orderBy("component")
      },
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id, lang,
                 list_distinct([array_to_string(
                   string_split(text,' ')[i+1:i+3],' ')
                   for i in range(len(string_split(text,' '))-2)]) AS s
          FROM documents),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.s,b.s))::DOUBLE /
                (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 3)
                >= 0.5),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, lbl) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
        SELECT component, count(*) AS n_docs,
               CAST(sum(id) AS BIGINT) AS id_checksum
        FROM comp GROUP BY component ORDER BY component""")),

    // ------------------------------------------------------------------
    // Streaming cluster-maintenance parity (the q94 protocol applied
    // to the CLOSURE): the corpus arrives as two micro-batches through
    // clusterIngestBatch — each batch's verified pairs FOLD into the
    // persistent (id, component) labels store by label contraction,
    // with the per-batch delta bounded by the batch — and the final
    // accumulated labeling must equal the full-corpus clustering the
    // oracle recomputes directly. Fresh temp dirs per invocation.
    // ------------------------------------------------------------------
    "q211_cluster_ingest_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val corpusDir = java.nio.file.Files
          .createTempDirectory("graft-q211-corpus").toString
        val pairsDir = java.nio.file.Files
          .createTempDirectory("graft-q211-pairs").toString
        val labelsDir = java.nio.file.Files
          .createTempDirectory("graft-q211-labels").toString
        // a two-language slice: the protocol (two replays through the
        // full ingest + closure machinery) is the thing under test,
        // and the de+fr slice keeps the gate's bench cost
        // proportionate while still crossing several cluster families;
        // the ingest path itself runs language-agnostic (no
        // partitionCol), so the oracle scopes the same slice
        val docs = Tables(s, dir, "documents")
          .filter(col("lang").isin("de", "fr"))
          .select(col("doc_id"), col("text"))
        Streaming.clusterIngestBatch(
          docs.filter(col("doc_id") % 2 === 0), 0L,
          corpusDir, pairsDir, labelsDir, "doc_id", "text",
          n = 3, threshold = 0.5)
        Streaming.clusterIngestBatch(
          docs.filter(col("doc_id") % 2 =!= 0), 1L,
          corpusDir, pairsDir, labelsDir, "doc_id", "text",
          n = 3, threshold = 0.5)
        materializeAndClean(
          Streaming.clusterLabels(s, labelsDir,
              org.apache.spark.sql.types.LongType)
            .groupBy(col("component"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("id")).as("id_checksum"))
            .orderBy("component"),
          corpusDir, pairsDir, labelsDir)
      },
      oracle = Some("""
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(
                   string_split(text,' ')[i+1:i+3],' ')
                   for i in range(len(string_split(text,' '))-2)]) AS s
          FROM documents WHERE lang IN ('de', 'fr')),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.s,b.s))::DOUBLE /
                (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))), 3)
                >= 0.5),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, lbl) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
        SELECT component, count(*) AS n_docs,
               CAST(sum(id) AS BIGINT) AS id_checksum
        FROM comp GROUP BY component ORDER BY component""")),

    // ------------------------------------------------------------------
    // Streaming volume monitor, gated end-to-end: events arrive as two
    // micro-batches (event_id parity); batch 0 seeds the hourly-count
    // store (NULL statistics — no reference yet), batch 1's hours are
    // scored against batch 0's accumulated hourly distribution by the
    // exact integer median/MAD rule (q202 made incremental, the q147
    // store protocol). The oracle recomputes both batch ledgers from
    // the parity split directly.
    // ------------------------------------------------------------------
    "q213_volume_monitor" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q213-store").toString
        val outDir = java.nio.file.Files
          .createTempDirectory("graft-q213-out").toString
        val ev = graft.Tables.eventsWithTs(s, dir)
          .select(col("event_id"), unix_millis(col("ts")).as("ms"))
        Streaming.volumeMonitorBatch(
          ev.filter(col("event_id") % 2 === 0), 0L, storeDir, outDir, "ms")
        Streaming.volumeMonitorBatch(
          ev.filter(col("event_id") % 2 =!= 0), 1L, storeDir, outDir, "ms")
        materializeAndClean(
          s.read.option("basePath", outDir).parquet(outDir)
            .select(col("batch_id").cast("long").as("batch_id"),
              col("hour"), col("n_events"), col("med2"), col("mad4"),
              col("anomaly"))
            .orderBy("batch_id", "hour"),
          storeDir, outDir)
      },
      oracle = Some("""
        WITH h0 AS (
          SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS n
          FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        h1 AS (
          SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS n
          FROM events WHERE event_id % 2 = 1 GROUP BY 1),
        n0 AS (SELECT count(*) AS n FROM h0),
        c AS (SELECT n AS v, count(*) AS c FROM h0 GROUP BY 1),
        cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM c),
        med AS (SELECT
          (SELECT min(v) FROM cum WHERE cum >= ((SELECT n FROM n0)+1)//2)
          + (SELECT min(v) FROM cum
             WHERE cum >= (SELECT n FROM n0)//2 + 1) AS med2),
        d AS (SELECT abs(2*h0.n - (SELECT med2 FROM med)) AS dv FROM h0),
        dc AS (SELECT dv, count(*) AS c FROM d GROUP BY 1),
        dcum AS (SELECT dv, c, sum(c) OVER (ORDER BY dv) AS cum FROM dc),
        mad AS (SELECT
          (SELECT min(dv) FROM dcum
           WHERE cum >= ((SELECT n FROM n0)+1)//2)
          + (SELECT min(dv) FROM dcum
             WHERE cum >= (SELECT n FROM n0)//2 + 1) AS mad4)
        SELECT CAST(0 AS BIGINT) AS batch_id, hour,
               CAST(n AS BIGINT) AS n_events,
               CAST(NULL AS BIGINT) AS med2, CAST(NULL AS BIGINT) AS mad4,
               CAST(NULL AS BOOLEAN) AS anomaly
        FROM h0
        UNION ALL
        SELECT CAST(1 AS BIGINT), hour, CAST(n AS BIGINT),
               CAST((SELECT med2 FROM med) AS BIGINT),
               CAST((SELECT mad4 FROM mad) AS BIGINT),
               2*abs(2*n - (SELECT med2 FROM med))
                 > 3*(SELECT mad4 FROM mad)
        FROM h1
        ORDER BY batch_id, hour""")),

    // BM25 top-k retrieval over the corpus, known-item style: every
    // 101st document's first six tokens become a query; the inverted-
    // index join scores candidates and a per-query window ranks the
    // top 5 by ROUNDED score (then doc id) so float last-ulp
    // differences can't reorder ranks across engines. BM25 constants
    // enter as 1200/1000.0-style divisions on BOTH sides — the same
    // IEEE operation, not a decimal literal that might round
    // differently. NOTE: this synthetic corpus's ~30-word vocabulary
    // makes every posting list corpus-dense; on natural text postings
    // are sparse and the kernel's maxDocFreq stop-list contract is the
    // scale lever (see TextStats.bm25TopK).
    "q217_bm25_topk" -> Q(
      fn = (s, dir) => {
        val docs = Tables(s, dir, "documents")
        TextStats.bm25TopK(docs, "doc_id", "text",
            knownItemQueries(docs), "qid", "qtext", k = 5)
          .select(col("qid"), col("rank"), col("doc").as("doc_id"),
            col("score"))
          .orderBy("qid", "rank")
      },
      oracle = Some(s"""
        WITH $bm25OracleCtes
        SELECT qid, CAST(rn AS BIGINT) AS rank, doc_id, score
        FROM rk WHERE rn <= 5
        ORDER BY qid, rank""")),

    // Known-item MRR decomposition over the q217 retrieval: each
    // query's truth is the document it was cut from; reciprocal ranks
    // are exact integer millis (1000 div rank, 0 on a top-10 miss) so
    // the mean replays bit-identically downstream.
    "q219_known_item_mrr" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        val docs = Tables(s, dir, "documents")
        val qs = knownItemQueries(docs)
        val ranked = TextStats.bm25TopK(docs, "doc_id", "text",
          qs, "qid", "qtext", k = 10)
        Eval.reciprocalRank(ranked, "qid", "doc", "rank",
            qs.select(col("qid"), col("qid").as("doc_id")),
            "qid", "doc_id")
          .orderBy("qid")
      },
      oracle = Some(s"""
        WITH $bm25OracleCtes
        SELECT q.qid AS qid,
               CAST(COALESCE(rk.rn, 0) AS BIGINT) AS hit_rank,
               CAST(COALESCE(1000 // rk.rn, 0) AS BIGINT) AS rr_milli
        FROM q LEFT JOIN rk
          ON q.qid = rk.qid AND q.qid = rk.doc_id AND rk.rn <= 10
        ORDER BY q.qid""")),

    // Hard-negative mining over the q217 retrieval (the DPR recipe:
    // BM25 top results minus the positive): per query, the 3 highest-
    // ranked non-self docs in retrieval order — the anti-join and
    // re-rank run on the k-bounded top-k frame, never the corpus.
    "q220_hard_negatives" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        val docs = Tables(s, dir, "documents")
        val qs = knownItemQueries(docs)
        val ranked = TextStats.bm25TopK(docs, "doc_id", "text",
          qs, "qid", "qtext", k = 6)
        Eval.hardNegatives(ranked, "qid", "doc", "rank",
            qs.select(col("qid"), col("qid").as("doc_id")),
            "qid", "doc_id", n = 3)
          .select(col("qid"), col("neg_rank"), col("doc").as("doc_id"))
          .orderBy("qid", "neg_rank")
      },
      oracle = Some(s"""
        WITH $bm25OracleCtes,
        neg AS (SELECT qid, doc_id, row_number() OVER (
                  PARTITION BY qid ORDER BY rn) AS neg_rank
                FROM rk WHERE rn <= 6 AND doc_id <> qid)
        SELECT qid, CAST(neg_rank AS BIGINT) AS neg_rank, doc_id
        FROM neg WHERE neg_rank <= 3
        ORDER BY qid, neg_rank""")),

    // Zipf rank-frequency fit over the top-500 vocabulary: the
    // corpus-health read (slope near -1 = natural-looking frequency
    // decay). The vocab cut is a TakeOrdered heap + a window over at
    // most 500 rows; both engines fit the identical ln-ln points.
    "q221_zipf_fit" -> Q(
      fn = (s, dir) => {
        TextStats.zipfFit(Tables(s, dir, "documents"), "text", v = 500)
          .select(col("n_types"), col("slope"), col("icept"))
      },
      oracle = Some("""
        WITH tk AS (
          SELECT unnest(string_split(text, ' ')) AS token
          FROM documents),
        c AS (SELECT token, count(*) AS c FROM tk GROUP BY 1),
        top AS (SELECT token, c FROM c ORDER BY c DESC, token LIMIT 500),
        rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, token) AS r
               FROM top),
        pt AS (SELECT ln(r::DOUBLE) AS x, ln(c::DOUBLE) AS y FROM rk),
        s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*y) AS sxy, sum(x*x) AS sxx FROM pt)
        SELECT CAST(n AS BIGINT) AS n_types,
               round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
               round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n,
                     6) AS icept
        FROM s""")),

    // Incremental retrieval-index parity: the corpus arrives as two
    // micro-batches into the postings store (replay-idempotent slices,
    // supersede-aware compaction), then BM25 over the ACCUMULATED
    // store must equal the whole-corpus batch retrieval — the oracle
    // is exactly q217's. Gates the streaming index end to end: the
    // postings decomposition (per-batch tokenize only), the store
    // protocol, and the query-time df/N/avgdl derivation.
    "q222_index_ingest_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q222-idx").toString
        val docs = Tables(s, dir, "documents")
        Streaming.indexIngestBatch(
          docs.filter(col("doc_id") % 2 === 0), 0L, storeDir,
          "doc_id", "text")
        Streaming.indexIngestBatch(
          docs.filter(col("doc_id") % 2 =!= 0), 1L, storeDir,
          "doc_id", "text")
        materializeAndClean(
          Streaming.bm25FromIndex(s, storeDir, knownItemQueries(docs),
              "qid", "qtext", k = 5, maxDocFreq = None)
            .select(col("qid"), col("rank"), col("doc").as("doc_id"),
              col("score"))
            .orderBy("qid", "rank"),
          storeDir)
      },
      oracle = Some(s"""
        WITH $bm25OracleCtes
        SELECT qid, CAST(rn AS BIGINT) AS rank, doc_id, score
        FROM rk WHERE rn <= 5
        ORDER BY qid, rank""")),

    // Incremental embedding-index parity: the corpus arrives as two
    // micro-batches into the IVF store (model trained once on batch 0,
    // persisted; later batches only assign cells), then an ALL-CELLS
    // probe over the accumulated store must equal exact brute-force
    // cosine top-k — the oracle is the q27 spelling. Gates the
    // streaming embedding index end to end: the train-once model
    // protocol, the slice store, and the probed-candidate ranking
    // (recall at nProbe < nCells is spec-graded like the batch IVF).
    "q224_emb_ingest_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q224-emb").toString
        val emb = Tables(s, dir, "embeddings")
        Streaming.embIngestBatch(
          emb.filter(col("vec_id") % 2 === 0), 0L, storeDir,
          "vec_id", "embedding", nCells = 8)
        Streaming.embIngestBatch(
          emb.filter(col("vec_id") % 2 =!= 0), 1L, storeDir,
          "vec_id", "embedding", nCells = 8)
        val qs = emb.filter(col("vec_id") % 97 === 3)
          .select(col("vec_id"), col("embedding"))
        materializeAndClean(
          Streaming.annFromStore(s, storeDir, qs, "vec_id", "embedding",
              k = 5, nProbe = 8)
            .orderBy("query_id", "rank"),
          storeDir)
      },
      oracle = Some(annBruteOracleSql)),

    // Immediate-redaction parity: a subset of docs is re-ingested as
    // NULL text (the tombstone shape) in a later batch and NO
    // compaction ever runs — the read-time latest-per-doc supersede
    // alone must make retrieval equal the batch operator over the
    // post-redaction corpus, with the stale postings still physically
    // in the store. The query set stays the full-table known-item
    // construction (a redacted doc's query remains a valid query; its
    // known item is simply no longer retrievable).
    "q225_index_redaction_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q225-idx").toString
        val docs = Tables(s, dir, "documents")
        Streaming.indexIngestBatch(docs, 0L, storeDir,
          "doc_id", "text", compactEvery = 0)
        Streaming.indexIngestBatch(
          docs.filter(col("doc_id") % 17 === 3)
            .select(col("doc_id"), lit(null).cast("string").as("text")),
          1L, storeDir, "doc_id", "text", compactEvery = 0)
        materializeAndClean(
          Streaming.bm25FromIndex(s, storeDir, knownItemQueries(docs),
              "qid", "qtext", k = 5, maxDocFreq = None)
            .select(col("qid"), col("rank"), col("doc").as("doc_id"),
              col("score"))
            .orderBy("qid", "rank"),
          storeDir)
      },
      oracle = Some(s"""
        WITH live AS (SELECT * FROM documents WHERE doc_id % 17 != 3),
        ${bm25OracleCtesOver("live")}
        SELECT qid, CAST(rn AS BIGINT) AS rank, doc_id, score
        FROM rk WHERE rn <= 5
        ORDER BY qid, rank""")),

    // Snapshot (as-of) retrieval parity: the index accumulates three
    // batches — evens, odds, then a REDACTION of some evens — and the
    // query pins asOf = batch 0: the result must equal the batch
    // operator over the even-docs corpus alone, with both the later
    // ingest and the later redaction invisible (reproducible
    // retrieval over a pinned training-set moment while ingest
    // continues; IngestStore.readAsOf's retention contract).
    "q227_index_asof_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q227-idx").toString
        val docs = Tables(s, dir, "documents")
        evensOddsRedactionStore(docs, storeDir)
        materializeAndClean(
          Streaming.bm25FromIndex(s, storeDir, knownItemQueries(docs),
              "qid", "qtext", k = 5, maxDocFreq = None, asOf = Some(0L))
            .select(col("qid"), col("rank"), col("doc").as("doc_id"),
              col("score"))
            .orderBy("qid", "rank"),
          storeDir)
      },
      oracle = Some(evenCorpusOracleSql)),

    // Graded-relevance retrieval eval: nDCG@10 over q217's retrieval
    // with a two-level synthetic judgment set (the known item at
    // rel=3, its successor id at rel=1 — the successor is usually NOT
    // retrieved, so dcg < idcg and the metric separates from MRR's
    // binary read). Exercises the exponential-gain formula, the ideal
    // ordering cut, and the explicit-zero contract for truth queries
    // the retrieval missed.
    "q228_ndcg" -> Q(
      fn = (s, dir) => {
        import graft.operators.{Eval, TextStats}
        val docs = Tables(s, dir, "documents")
        val qs = knownItemQueries(docs)
        val ranked = TextStats.bm25TopK(docs, "doc_id", "text",
          qs, "qid", "qtext", k = 10)
        val truth = qs.select(col("qid"), col("qid").as("doc"),
            lit(3L).as("rel"))
          .unionByName(qs.select(col("qid"),
            (col("qid") + 1).as("doc"), lit(1L).as("rel")))
        Eval.ndcgAtK(ranked, "qid", "doc", "rank",
            truth, "qid", "doc", "rel", k = 10)
          .orderBy("qid")
      },
      oracle = Some(s"""
        WITH $bm25OracleCtes,
        rk10 AS (SELECT qid, doc_id, rn FROM rk WHERE rn <= 10),
        truth AS (
          SELECT doc_id AS qid, doc_id AS doc, 3 AS rel
          FROM documents WHERE doc_id % 101 = 7
          UNION ALL
          SELECT doc_id, doc_id + 1, 1
          FROM documents WHERE doc_id % 101 = 7),
        dcg AS (
          SELECT t.qid,
                 round(sum((pow(2, t.rel) - 1) /
                       (ln(r.rn + 1.0) / ln(2.0))), 6) AS dcg
          FROM truth t JOIN rk10 r ON t.qid = r.qid AND t.doc = r.doc_id
          GROUP BY 1),
        pos AS (
          SELECT qid, rel,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY rel DESC, doc) AS p
          FROM truth WHERE rel > 0),
        idcg AS (
          SELECT qid, round(sum((pow(2, rel) - 1) /
                        (ln(p + 1.0) / ln(2.0))), 6) AS idcg
          FROM pos WHERE p <= 10 GROUP BY 1),
        tq AS (SELECT DISTINCT qid FROM truth)
        SELECT tq.qid,
               coalesce(dcg.dcg, 0.0) AS dcg,
               coalesce(idcg.idcg, 0.0) AS idcg,
               CASE WHEN coalesce(idcg.idcg, 0) > 0
                    THEN round(coalesce(dcg.dcg, 0.0) / idcg.idcg, 6)
               END AS ndcg
        FROM tq LEFT JOIN dcg USING (qid) LEFT JOIN idcg USING (qid)
        ORDER BY qid""")),

    // Store re-train migration parity: the accumulated embedding store
    // (trained at nCells=8 on its first batch) migrates through
    // migrateEmbStore into a FRESH store with DIFFERENT knobs
    // (nCells=4, new seed) — the documented "re-training is a NEW
    // store" lifecycle made operational — and an all-cells probe over
    // the migrated store must still equal exact brute-force cosine
    // top-k (the q224 oracle): migration may re-bucket candidates,
    // never change answers.
    "q226_emb_migration_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        def tmp(p: String) = java.nio.file.Files
          .createTempDirectory(p).toString
        val (oldDir, newDir) = (tmp("graft-q226-old"), tmp("graft-q226-new"))
        val emb = Tables(s, dir, "embeddings")
        Streaming.embIngestBatch(
          emb.filter(col("vec_id") % 2 === 0), 0L, oldDir,
          "vec_id", "embedding", nCells = 8)
        Streaming.embIngestBatch(
          emb.filter(col("vec_id") % 2 =!= 0), 1L, oldDir,
          "vec_id", "embedding", nCells = 8)
        Streaming.migrateEmbStore(s, oldDir, newDir,
          nCells = 4, seed = 7L, lloydIters = 2)
        val qs = emb.filter(col("vec_id") % 97 === 3)
          .select(col("vec_id"), col("embedding"))
        materializeAndClean(
          Streaming.annFromStore(s, newDir, qs, "vec_id", "embedding",
              k = 5, nProbe = 4)
            .orderBy("query_id", "rank"),
          oldDir, newDir)
      },
      oracle = Some(annBruteOracleSql)),

    // Snapshot (as-of) ANN parity — the embedding-store twin of q227
    // (the bm25 as-of gate): the store accumulates three batches —
    // evens, odds, then a NULL-vector REDACTION of some evens — and
    // the query pins asOf = batch 0 with an all-cells probe: the
    // result must equal exact brute-force cosine top-k over the
    // even-id corpus alone, with both the later ingest and the later
    // redaction invisible (reproducible ANN over a pinned training
    // moment while ingest continues; the train-once model is
    // store-lifetime, so snapshot assignments are the live ones).
    "q229_emb_asof_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q229-emb").toString
        val emb = Tables(s, dir, "embeddings")
        Streaming.embIngestBatch(
          emb.filter(col("vec_id") % 2 === 0), 0L, storeDir,
          "vec_id", "embedding", nCells = 8)
        Streaming.embIngestBatch(
          emb.filter(col("vec_id") % 2 =!= 0), 1L, storeDir,
          "vec_id", "embedding", nCells = 8)
        Streaming.embIngestBatch(
          emb.filter(col("vec_id") % 2 === 0 && col("vec_id") % 31 === 5)
            .select(col("vec_id"),
              lit(null).cast("array<double>").as("embedding")),
          2L, storeDir, "vec_id", "embedding", nCells = 8)
        val qs = emb.filter(col("vec_id") % 97 === 3)
          .select(col("vec_id"), col("embedding"))
        materializeAndClean(
          Streaming.annFromStore(s, storeDir, qs, "vec_id", "embedding",
              k = 5, nProbe = 8, asOf = Some(0L))
            .orderBy("query_id", "rank"),
          storeDir)
      },
      oracle = Some(annBruteOracleSqlOver("vec_id % 2 = 0"))),

    // The compacted-store retrieval path end to end: four batches
    // land under compactEvery=2 (so batches 0-1 FOLD into a base and
    // the df/N/avgdl stats sidecar commits), then batch 3 REVISES one
    // doc subset and TOMBSTONES another — both still un-compacted
    // live slices at query time. bm25FromIndex must serve from the
    // sidecar plus the live-delta correction (subtract the revised/
    // redacted docs' base contribution, add their latest version)
    // over the live-key hot/cold split, and equal the batch operator
    // on the LATEST corpus. q222 gates the never-compacted derive
    // path; THIS gates the sidecar + delta + split path the r10 cost
    // work added — the oracle knows nothing of sidecars, so a wrong
    // correction (stale df, double-subtracted base, un-superseded
    // revision) is a wrong answer here, not a slow one.
    "q230_index_compacted_delta_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q230-idx").toString
        val docs = Tables(s, dir, "documents")
        val revised = col("doc_id") % 23 === 5
        val redacted = col("doc_id") % 29 === 7 && col("doc_id") % 23 =!= 5
        Seq(
          docs.filter(col("doc_id") % 4 <= 1) -> 0L,
          docs.filter(col("doc_id") % 4 === 2) -> 1L,
          docs.filter(col("doc_id") % 4 === 3) -> 2L, // fold + sidecar
          docs.filter(revised)
            .select(col("doc_id"),
              concat(lit("revised "), col("text")).as("text"))
            .unionByName(docs.filter(redacted)
              .select(col("doc_id"),
                lit(null).cast("string").as("text"))) -> 3L
        ).foreach { case (batch, id) =>
          Streaming.indexIngestBatch(batch, id, storeDir,
            "doc_id", "text", compactEvery = 2)
        }
        materializeAndClean(
          Streaming.bm25FromIndex(s, storeDir, knownItemQueries(docs),
              "qid", "qtext", k = 5, maxDocFreq = None)
            .select(col("qid"), col("rank"), col("doc").as("doc_id"),
              col("score"))
            .orderBy("qid", "rank"),
          storeDir)
      },
      oracle = Some(s"""
        WITH live AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 23 = 5 THEN 'revised ' || text
                      ELSE text END AS text
          FROM documents
          WHERE NOT (doc_id % 29 = 7 AND doc_id % 23 != 5)),
        ${bm25OracleCtesOver("live")}
        SELECT qid, CAST(rn AS BIGINT) AS rank, doc_id, score
        FROM rk WHERE rn <= 5
        ORDER BY qid, rank""")),

    // Hybrid-retrieval fusion: reciprocal-rank fusion of two runs with
    // genuinely different orderings — BM25 top-10 and a coordination-
    // level run (distinct RARE-query-term overlap count, terms in at
    // most 5% of docs: the fractional form of the bm25 stop-list
    // contract, so the run's candidate volume stays scale-invariant
    // instead of letting boilerplate terms drag queries×postings at
    // 10x) top-10 — fused in exact integer micro units
    // (Σ 1000000 div (60 + rank)), per-query top-5 by
    // (rrf_micro desc, doc asc). The standard BM25 ⊕ dense combiner
    // shape, gated here with two lexically-derived runs so the oracle
    // is portable SQL end to end.
    "q231_rrf_fusion" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.{Eval, TextStats}
        val docs = Tables(s, dir, "documents")
        val qs = knownItemQueries(docs)
        val runA = TextStats.bm25TopK(docs, "doc_id", "text",
          qs, "qid", "qtext", k = 10)
        val qt = qs.select(col("qid"),
          explode(split(col("qtext"), " ")).as("token")).distinct()
        // lazy on purpose: both consumers (rare-term df, the overlap
        // join) aggregate the exploded frame straight down with
        // map-side partials — materializing it (10x the corpus bytes)
        // measured 2x SLOWER at 10x than re-running the cheap
        // scan+explode lineage twice
        val posts = TextStats.postings(docs, "doc_id", "text")
          .select(col("doc"), col("token"))
        // the rare-term cap's denominator is the RAW corpus row count
        // — and the oracle's rare CTE counts the same thing (its own
        // nd CTE, NOT the bm25 model's len-based indexed-doc n), so
        // the two engines agree by construction even on a corpus with
        // empty/null texts. Raw count deliberately: it is a
        // metadata-only scan, where the indexed-doc spelling
        // (distinct postings docs, or text IS NOT NULL) costs a full
        // text-column pass per query — both are self-consistent
        // definitions of a corpus-fraction stop-list cap
        val nDocs = graft.plans.Scalars.of(
          docs.agg(count(lit(1)).as("n")))
        val rare = posts.groupBy("token").agg(count(lit(1)).as("df"))
          .filter(col("df") * 20 <= nDocs)
        val overlap = qt
          .join(rare.select("token"), "token")
          .join(posts, "token")
          .groupBy("qid", "doc").agg(count(lit(1)).as("ov"))
          .withColumn("rank", row_number().over(Window.partitionBy("qid")
            .orderBy(col("ov").desc, col("doc"))))
          .filter(col("rank") <= 10)
        Eval.rrfFuse(
          Seq(runA.select(col("qid"), col("doc"), col("rank")),
            overlap.select(col("qid"), col("doc"), col("rank"))),
          "qid", "doc", "rank", k = 5)
          .select(col("qid"), col("fused_rank"),
            col("doc").as("doc_id"), col("rrf_micro"))
          .orderBy("qid", "fused_rank")
      },
      oracle = Some(s"""
        WITH $bm25OracleCtes,
        ra AS (SELECT qid, doc_id, rn FROM rk WHERE rn <= 10),
        nd AS (SELECT count(*) AS n FROM documents),
        rare AS (SELECT token FROM dfq CROSS JOIN nd
                 WHERE df * 20 <= nd.n),
        ov AS (SELECT qt.qid, tf.doc_id, count(*) AS ov
               FROM qt JOIN rare USING (token) JOIN tf USING (token)
               GROUP BY 1, 2),
        rb AS (SELECT qid, doc_id,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY ov DESC, doc_id) AS rn
               FROM ov),
        rbk AS (SELECT qid, doc_id, rn FROM rb WHERE rn <= 10),
        u AS (SELECT qid, doc_id, 1000000 // (rn + 60) AS c FROM ra
              UNION ALL
              SELECT qid, doc_id, 1000000 // (rn + 60) FROM rbk),
        f AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro
              FROM u GROUP BY 1, 2),
        fz AS (SELECT qid, doc_id, rrf_micro,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY rrf_micro DESC, doc_id) AS zr
               FROM f)
        SELECT qid, CAST(zr AS BIGINT) AS fused_rank, doc_id, rrf_micro
        FROM fz WHERE zr <= 5
        ORDER BY qid, fused_rank""")),

    // Set-overlap retrieval evals in exact integer milli units:
    // precision@10 / recall@10 of the BM25 run against the q228
    // graded truth (the known item at rel 3 + its successor doc at
    // rel 1 — two positives per query, so recall is non-trivially
    // 0/500/1000 and hits varies with what the run surfaced).
    "q232_precision_recall_at_k" -> Q(
      fn = (s, dir) => {
        import graft.operators.{Eval, TextStats}
        val docs = Tables(s, dir, "documents")
        val qs = knownItemQueries(docs)
        val ranked = TextStats.bm25TopK(docs, "doc_id", "text",
          qs, "qid", "qtext", k = 10)
        val truth = qs.select(col("qid"), col("qid").as("doc"),
            lit(3L).as("rel"))
          .unionByName(qs.select(col("qid"),
            (col("qid") + 1).as("doc"), lit(1L).as("rel")))
        Eval.precisionRecallAtK(ranked, "qid", "doc", "rank",
            truth, "qid", "doc", "rel", k = 10)
          .orderBy("qid")
      },
      oracle = Some(s"""
        WITH $bm25OracleCtes,
        rk10 AS (SELECT qid, doc_id, rn FROM rk WHERE rn <= 10),
        truth AS (
          SELECT doc_id AS qid, doc_id AS doc, 3 AS rel
          FROM documents WHERE doc_id % 101 = 7
          UNION ALL
          SELECT doc_id, doc_id + 1, 1
          FROM documents WHERE doc_id % 101 = 7),
        posv AS (
          SELECT qid, doc FROM (
            SELECT qid, doc, max(rel) AS rel FROM truth
            WHERE doc IS NOT NULL GROUP BY 1, 2)
          WHERE rel > 0),
        nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel
                 FROM posv GROUP BY 1),
        h AS (SELECT p.qid, CAST(count(*) AS BIGINT) AS hits
              FROM posv p JOIN rk10 r
                ON p.qid = r.qid AND p.doc = r.doc_id
              GROUP BY 1)
        SELECT nrel.qid, n_rel,
               CAST(coalesce(hits, 0) AS BIGINT) AS hits,
               CAST(1000 * coalesce(hits, 0) // 10 AS BIGINT)
                 AS p_milli,
               CAST(1000 * coalesce(hits, 0) // n_rel AS BIGINT)
                 AS r_milli
        FROM nrel LEFT JOIN h USING (qid)
        ORDER BY qid""")),

    // Average precision@10 (the MAP decomposition) over the same run
    // and truth, in exact integer micro units — integer division at
    // each step so both engines sum identical operands.
    "q233_map_at_k" -> Q(
      fn = (s, dir) => {
        import graft.operators.{Eval, TextStats}
        val docs = Tables(s, dir, "documents")
        val qs = knownItemQueries(docs)
        val ranked = TextStats.bm25TopK(docs, "doc_id", "text",
          qs, "qid", "qtext", k = 10)
        val truth = qs.select(col("qid"), col("qid").as("doc"),
            lit(3L).as("rel"))
          .unionByName(qs.select(col("qid"),
            (col("qid") + 1).as("doc"), lit(1L).as("rel")))
        Eval.averagePrecisionAtK(ranked, "qid", "doc", "rank",
            truth, "qid", "doc", "rel", k = 10)
          .orderBy("qid")
      },
      oracle = Some(s"""
        WITH $bm25OracleCtes,
        rk10 AS (SELECT qid, doc_id, rn FROM rk WHERE rn <= 10),
        truth AS (
          SELECT doc_id AS qid, doc_id AS doc, 3 AS rel
          FROM documents WHERE doc_id % 101 = 7
          UNION ALL
          SELECT doc_id, doc_id + 1, 1
          FROM documents WHERE doc_id % 101 = 7),
        posv AS (
          SELECT qid, doc FROM (
            SELECT qid, doc, max(rel) AS rel FROM truth
            WHERE doc IS NOT NULL GROUP BY 1, 2)
          WHERE rel > 0),
        nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel
                 FROM posv GROUP BY 1),
        hit AS (SELECT p.qid, r.rn,
                       row_number() OVER (PARTITION BY p.qid
                         ORDER BY r.rn, p.doc) AS i
                FROM posv p JOIN rk10 r
                  ON p.qid = r.qid AND p.doc = r.doc_id),
        ap AS (SELECT qid,
                      CAST(sum(1000000 * i // rn) AS BIGINT) AS sp,
                      CAST(count(*) AS BIGINT) AS hits
               FROM hit GROUP BY 1)
        SELECT nrel.qid, n_rel,
               CAST(coalesce(hits, 0) AS BIGINT) AS hits,
               CAST(coalesce(sp, 0) // least(n_rel, 10) AS BIGINT)
                 AS ap_micro
        FROM nrel LEFT JOIN ap USING (qid)
        ORDER BY qid""")),

    // Redaction-through-compaction parity — the erasure-completion
    // gate: docs redacted in batch 1 (tombstones), HALF of them
    // legitimately re-ingested in batch 2, then batch 3 triggers the
    // compaction whose purge physically drops the still-redacted
    // docs' tombstones from the base (their stale postings already
    // superseded away). Retrieval over the compacted+purged store
    // must equal the batch operator over the post-redaction corpus —
    // the oracle knows nothing of tombstones, purges, or sidecars
    // (the q230 pattern for gating a cost/storage-path rework), so a
    // purge that resurrects a stale version, blocks a re-ingest, or
    // desyncs the stats sidecar is a WRONG ANSWER here, not a storage
    // detail. Physical zero-bytes absence is spec-pinned
    // (StreamingSpec) — not SQL-expressible.
    "q234_redaction_purge_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q234-idx").toString
        val docs = Tables(s, dir, "documents")
        Streaming.indexIngestBatch(docs, 0L, storeDir,
          "doc_id", "text", compactEvery = 3)
        Streaming.indexIngestBatch(
          docs.filter(col("doc_id") % 17 === 3)
            .select(col("doc_id"), lit(null).cast("string").as("text")),
          1L, storeDir, "doc_id", "text", compactEvery = 3)
        Streaming.indexIngestBatch(
          docs.filter(col("doc_id") % 34 === 3),
          2L, storeDir, "doc_id", "text", compactEvery = 3)
        // batch 3: empty — lands the slice that triggers the
        // compaction (boundary 3 absorbs batches 0-2) and the stats
        // sidecar rewrite; the query below is served from the purged
        // base + that sidecar
        Streaming.indexIngestBatch(
          docs.filter(lit(false)), 3L, storeDir,
          "doc_id", "text", compactEvery = 3)
        materializeAndClean(
          Streaming.bm25FromIndex(s, storeDir, knownItemQueries(docs),
              "qid", "qtext", k = 5, maxDocFreq = None)
            .select(col("qid"), col("rank"), col("doc").as("doc_id"),
              col("score"))
            .orderBy("qid", "rank"),
          storeDir)
      },
      oracle = Some(s"""
        WITH live AS (SELECT * FROM documents
                      WHERE doc_id % 17 != 3 OR doc_id % 34 = 3),
        ${bm25OracleCtesOver("live")}
        SELECT qid, CAST(rn AS BIGINT) AS rank, doc_id, score
        FROM rk WHERE rn <= 5
        ORDER BY qid, rank""")),

    // Snapshot EXPORT parity — the reproducible-training-set freeze:
    // the q227 store construction (evens, then odds, then a
    // redaction of some evens), but instead of querying the source
    // at asOf=0, the snapshot is EXPORTED to a new independent store
    // (canonical single base, true batch ids, stats sidecar) and THE
    // EXPORT is queried with no asOf at all. Must equal the batch
    // operator over the even-docs corpus — the oracle knows nothing
    // of stores, exports, or sidecars, so a snapshot that leaks the
    // later ingest/redaction, double-carries a version into the
    // supersede-free base read, or desyncs its sidecar is a wrong
    // answer. (The source keeps serving its own latest view — the
    // export is what survives the source compacting past the
    // moment.)
    "q235_snapshot_export_parity" -> Q(
      fn = (s, dir) => {
        import graft.streaming.Streaming
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft-q235-src").toString
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft-q235-snap").toString
        val docs = Tables(s, dir, "documents")
        evensOddsRedactionStore(docs, storeDir)
        Streaming.snapshotIndexStore(s, storeDir, snapDir, asOf = 0L)
        materializeAndClean(
          Streaming.bm25FromIndex(s, snapDir, knownItemQueries(docs),
              "qid", "qtext", k = 5, maxDocFreq = None)
            .select(col("qid"), col("rank"), col("doc").as("doc_id"),
              col("score"))
            .orderBy("qid", "rank"),
          storeDir, snapDir)
      },
      oracle = Some(evenCorpusOracleSql))
  )
}

/** The langid scoring expressed as portable SQL — generated from the
  * same marker table the Column implementation uses, so the two can
  * never drift apart. */
object LangIdOracle {
  val sql: String = {
    val scores = T.langMarkers.map { case (lang, markers) =>
      val terms = markers.map { m =>
        val esc = m.replace("'", "''")
        s"CAST((length(p) - length(replace(p, '$esc', ''))) / ${m.length} AS BIGINT)"
      }.mkString(" + ")
      s"$terms AS s_$lang"
    }.mkString(",\n               ")
    val langs = T.langMarkers.map(_._1)
    val gr = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = $gr THEN '$l'").mkString("\n                    ")
    s"""
        WITH p0 AS (
          SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
             sc AS (
          SELECT doc_id,
               $scores
          FROM p0)
        SELECT doc_id,
               CASE WHEN $gr = 0 THEN 'und'
                    $cases
                    END AS lang_pred
        FROM sc ORDER BY doc_id"""
  }

  /** [[sql]] without the trailing ORDER BY — embeddable as a CTE body
    * (q190 wraps it to join predictions against gold labels). */
  val core: String = {
    val s = sql
    s.substring(0, s.lastIndexOf("ORDER BY doc_id")).trim
  }
}
