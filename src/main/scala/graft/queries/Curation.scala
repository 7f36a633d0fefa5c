package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Corpus-composition planning: budget allocation and mixture design
  * over per-stratum ledgers (the step BEFORE the row-level samplers in
  * [[graft.operators.Sampling]] apply the plan to the corpus). */
object CurationQueries {

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // k-anonymity suppression ledger (Sweeney 2002): group the corpus
    // by its quasi-identifier tuple (lang, source, length centile) and
    // suppress combos with fewer than k=5 members — the re-
    // identification screen a data RELEASE runs after the row-level
    // PII redaction (q65) has scrubbed direct identifiers: a rare
    // combo is itself identifying even with clean text. One keyed
    // partial+final count; the ledger IS the output (combo-sized, not
    // corpus-sized).
    // ------------------------------------------------------------------
    "q167_k_anonymity" -> Q(
      fn = (s, dir) => {
        Tables(s, dir, "documents")
          .groupBy(col("lang"), col("source"),
            expr("`n_chars` div 100").as("len_bucket"))
          .agg(count(lit(1)).as("n_docs"))
          .select(col("lang"), col("source"), col("len_bucket"),
            col("n_docs"), (col("n_docs") >= 5L).as("kept"))
          .orderBy("lang", "source", "len_bucket")
      },
      oracle = Some("""
        SELECT lang, source, n_chars // 100 AS len_bucket,
               count(*) AS n_docs,
               count(*) >= 5 AS kept
        FROM documents
        GROUP BY lang, source, len_bucket
        ORDER BY lang, source, len_bucket""")),

    // ------------------------------------------------------------------
    // UniMax budget allocation (Chung et al. 2023): total budget = 2
    // average epochs, per-language epoch cap = 3 (chosen so the cap BINDS on this
    // corpus: the smallest language is fully funded at its cap while
    // the rest split the remainder at the water level — both branches
    // of the allocation are exercised by the gate). Low-resource
    // languages are fully funded to their cap; the big ones split the
    // remainder at the water level. Exact integer waterfilling — the
    // allocation sums EXACTLY to the budget and both engines agree
    // bit-for-bit (no float anywhere).
    // ------------------------------------------------------------------
    "q143_unimax_budget" -> Q(
      fn = (s, dir) => {
        val sizes = Tables(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(sum(size(split(col("text"), " ")).cast("long"))
            .as("n_tokens"))
          .withColumn("capacity", col("n_tokens") * 3)
        val total = graft.plans.Scalars.of(
          sizes.agg((sum(col("n_tokens")) * 2).as("b")))
        Sampling.waterfillBudgets(sizes, "lang", "capacity", total)
          .select(col("lang"), col("n_tokens"), col("capacity"),
            col("budget_tokens"),
            expr("(`budget_tokens` * 1000) div `n_tokens`")
              .as("epochs_milli"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH t AS (
          SELECT lang,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens
          FROM documents GROUP BY lang),
        tot AS (SELECT CAST(2 * sum(n_tokens) AS BIGINT) AS b FROM t),
        led AS (
          SELECT lang, n_tokens, 3 * n_tokens AS capacity,
                 row_number() OVER (ORDER BY 3 * n_tokens, lang) AS i,
                 COALESCE(sum(3 * n_tokens) OVER (
                   ORDER BY 3 * n_tokens, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS pe,
                 count(*) OVER () AS n
          FROM t),
        f AS (
          SELECT led.*, tot.b,
                 (pe + capacity * (n - i + 1) <= tot.b) AS funded
          FROM led CROSS JOIN tot),
        agg AS (
          SELECT count(*) FILTER (WHERE funded) AS fcnt,
                 COALESCE(sum(capacity) FILTER (WHERE funded), 0) AS pf
          FROM f),
        o AS (
          SELECT f.lang, f.n_tokens, f.capacity,
                 CASE WHEN f.funded THEN f.capacity
                      ELSE ((f.b - a.pf) // (f.n - a.fcnt)) +
                           (CASE WHEN f.i - a.fcnt <=
                                   ((f.b - a.pf) % (f.n - a.fcnt))
                                 THEN 1 ELSE 0 END)
                 END AS budget_tokens
          FROM f CROSS JOIN agg a)
        SELECT lang, n_tokens, capacity,
               CAST(budget_tokens AS BIGINT) AS budget_tokens,
               CAST((budget_tokens * 1000) // n_tokens AS BIGINT)
                 AS epochs_milli
        FROM o ORDER BY lang""")),

    // ------------------------------------------------------------------
    // Triplet mining for contrastive training (Schroff 2015): per
    // anchor, the hardest positive (nearest same-label neighbor) and
    // hardest negative (nearest different-label neighbor) with the
    // margin between them. Anchors broadcast; both argmaxes ride one
    // partial+final aggregate — no window, no per-anchor task.
    // ------------------------------------------------------------------
    "q144_triplet_mining" -> Q(
      fn = (s, dir) => {
        import graft.operators.Similarity
        val emb = Tables(s, dir, "embeddings")
        Similarity.tripletMine(
          emb.filter(col("vec_id") < 32), "vec_id", "embedding", "label",
          emb, "vec_id", "embedding", "label")
          .orderBy("anchor_id")
      },
      oracle = Some("""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                   FROM embeddings),
        a AS (SELECT * FROM e WHERE vec_id < 32),
        sc AS (
          SELECT a.vec_id AS anchor_id, a.label AS albl,
                 e.vec_id AS nid, e.label AS clbl,
                 round(list_inner_product(a.v, e.v) /
                   (sqrt(list_inner_product(a.v, a.v)) *
                    sqrt(list_inner_product(e.v, e.v))), 4) AS c
          FROM a JOIN e ON a.vec_id <> e.vec_id),
        pos AS (
          SELECT anchor_id, nid, c,
                 row_number() OVER (PARTITION BY anchor_id
                                    ORDER BY c DESC, nid) AS rn
          FROM sc WHERE albl = clbl),
        neg AS (
          SELECT anchor_id, nid, c,
                 row_number() OVER (PARTITION BY anchor_id
                                    ORDER BY c DESC, nid) AS rn
          FROM sc WHERE albl <> clbl)
        SELECT p.anchor_id, p.nid AS pos_id, p.c AS pos_cos,
               n.nid AS neg_id, n.c AS neg_cos,
               round(p.c - n.c, 4) AS margin
        FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
        WHERE p.rn = 1 AND n.rn = 1
        ORDER BY p.anchor_id""")),

    // ------------------------------------------------------------------
    // Deterministic negative sampling: per anchor, 8 pseudo-random
    // different-label negatives drawn by md5(seed:anchor:item) rank —
    // content-stable and re-seedable per epoch; the unbiased-background
    // complement of q144's hardest-negative mining. The salted
    // two-pass top-k does the per-anchor draw without an anchor-sized
    // window partition.
    // ------------------------------------------------------------------
    "q155_negative_sample" -> Q(
      fn = (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        Sampling.negativeSample(
          emb.filter(col("vec_id") < 16), "vec_id", "label",
          emb, "vec_id", "label", k = 8, seed = "ep0")
          .orderBy("anchor_id", "neg_id")
      },
      oracle = Some("""
        WITH a AS (SELECT vec_id AS anchor_id, label AS albl
                   FROM embeddings WHERE vec_id < 16),
        i AS (SELECT vec_id AS neg_id, label AS ilbl FROM embeddings),
        cand AS (
          SELECT a.anchor_id, i.neg_id,
                 md5(concat_ws(':', 'ep0', a.anchor_id, i.neg_id)) AS h
          FROM a JOIN i ON a.albl <> i.ilbl),
        r AS (SELECT anchor_id, neg_id,
                     row_number() OVER (PARTITION BY anchor_id
                                        ORDER BY h DESC, neg_id) AS rn
              FROM cand)
        SELECT anchor_id, neg_id FROM r WHERE rn <= 8
        ORDER BY anchor_id, neg_id""")),

    // ------------------------------------------------------------------
    // Leave-last-out temporal split with a 1-hour embargo: each user's
    // last event is the eval example; events inside the hour before it
    // are quarantined (near-boundary leakage); the rest train. One
    // per-user window aggregate — a user's history is the state bound.
    // Epoch-ms arithmetic on both engines (the sessionize discipline).
    // ------------------------------------------------------------------
    "q158_temporal_split" -> Q(
      fn = (s, dir) => {
        val ev = graft.Tables.eventsWithTs(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"))
        Sampling.leaveLastOut(ev, "user_id", "ts", "event_id",
            embargoMs = 3600000L)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("event_id")).as("id_checksum"))
          .orderBy("split")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        r AS (
          SELECT user_id, event_id, ms,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ms DESC, event_id DESC) AS rn,
                 first_value(ms) OVER (PARTITION BY user_id
                                       ORDER BY ms DESC, event_id DESC)
                   AS lms
          FROM e),
        s AS (SELECT user_id, event_id,
                     CASE WHEN rn = 1 THEN 'eval'
                          WHEN ms > lms - 3600000 THEN 'embargo'
                          ELSE 'train' END AS split
              FROM r)
        SELECT split, CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(sum(event_id) AS BIGINT) AS id_checksum
        FROM s GROUP BY split ORDER BY split""")),

    // ------------------------------------------------------------------
    // Length-curriculum training order: token-count buckets of 32
    // ascending (short docs first), content-stable md5 shuffle inside
    // each bucket — the two-phase prefix rank, no global sort. The
    // oracle recomputes it as the single global window the Spark side
    // deliberately avoids (the q124/q125 pattern).
    // ------------------------------------------------------------------
    "q160_curriculum_order" -> Q(
      fn = (s, dir) => {
        val docs = graft.Tables(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("ntok"))
        Sampling.curriculumOrder(docs, "ntok", bucketWidth = 32L,
            "doc_id", seed = "c0")
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT)
                            AS ntok
                   FROM documents)
        SELECT doc_id, ntok,
               CAST(row_number() OVER (
                 ORDER BY ntok // 32,
                          md5('c0:' || CAST(doc_id AS VARCHAR)),
                          'c0:' || CAST(doc_id AS VARCHAR)) - 1
                 AS BIGINT) AS curriculum_pos
        FROM d ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Unigram-distribution drift per source vs the whole corpus:
    // add-one-smoothed KL divergence + total-variation distance over
    // the corpus vocabulary — the per-dump distribution-shift monitor
    // run before mixing weights are chosen.
    // ------------------------------------------------------------------
    "q145_unigram_drift" -> Q(
      fn = (s, dir) => {
        import graft.operators.TextStats
        TextStats.unigramDrift(Tables(s, dir, "documents"),
          "text", "source")
          .orderBy("source")
      },
      oracle = Some("""
        WITH tk AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        sc AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        gc AS (SELECT tok, CAST(sum(c) AS BIGINT) AS gC FROM sc
               GROUP BY 1),
        ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns,
                      count(*) AS nd
               FROM sc GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sc),
        vv AS (SELECT count(*) AS v FROM gc),
        dense AS (
          SELECT ns.source, ns.ns, ns.nd, gc.gC,
                 COALESCE(sc.c, 0) AS cg
          FROM ns CROSS JOIN gc
          LEFT JOIN sc ON sc.source = ns.source AND sc.tok = gc.tok)
        SELECT d.source,
               min(d.ns) AS n_tokens,
               CAST(min(d.nd) AS BIGINT) AS n_distinct,
               round(sum(((d.cg + 1)::DOUBLE / (d.ns + vv.v)) *
                 ln(((d.cg + 1)::DOUBLE / (d.ns + vv.v)) /
                    ((d.gC + 1)::DOUBLE / (tot.n + vv.v)))), 4)
                 AS kl_vs_corpus,
               round(sum(abs(((d.cg + 1)::DOUBLE / (d.ns + vv.v)) -
                 ((d.gC + 1)::DOUBLE / (tot.n + vv.v)))) / 2, 4)
                 AS tv_vs_corpus
        FROM dense d CROSS JOIN tot CROSS JOIN vv
        GROUP BY d.source ORDER BY d.source""")),

    // ------------------------------------------------------------------
    // Curation-signal AUC: does a proposed quality signal (here the
    // exact whitespace token count) actually rank the target cohort
    // (English docs) above the rest? The tie-aware Mann–Whitney AUC is
    // the standard acceptance gate for a new curation classifier
    // before it's allowed to move tokens (q120/q139 produce scores;
    // this measures them). Exact integer U statistic via the two-phase
    // bucketed prefix sum — corpus rows shuffle once, as two longs;
    // the oracle recomputes the same statistic with a direct global
    // window over the per-score ledger.
    // ------------------------------------------------------------------
    "q178_signal_auc" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        Eval.auc(Tables(s, dir, "documents"),
          score = size(split(col("text"), " ")),
          label = col("lang") === "en")
      },
      oracle = Some("""
        WITH b AS (
          SELECT len(string_split(text, ' ')) AS s,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        g AS (SELECT s, sum(y) AS np, sum(1 - y) AS nn
              FROM b GROUP BY s),
        c AS (SELECT np, nn,
                     COALESCE(sum(nn) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS below
              FROM g)
        SELECT CAST(sum(np) AS BIGINT) AS n_pos,
               CAST(sum(nn) AS BIGINT) AS n_neg,
               round(sum(np * (2 * below + nn))::DOUBLE /
                     (2.0 * sum(np) * sum(nn)), 6) AS auc
        FROM c""")),

    // ------------------------------------------------------------------
    // Robust per-source length profile: exact median + MAD (the
    // outlier-immune center/scale pair — a source whose mean length a
    // single megadoc can drag keeps an honest median) and a robust-z
    // outlier count at |x − med| > 3·MAD. All integer fixed-point
    // (med2 = 2·median, mad4 = 4·MAD), computed on the
    // (source, length) → count ledger, never corpus-row windows; the
    // oracle replays the identical bracket order statistics.
    // ------------------------------------------------------------------
    "q180_robust_length_profile" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        Eval.medianMad(Tables(s, dir, "documents"),
          stratum = col("source"), value = col("n_chars"), k = 3)
          .withColumnRenamed("stratum", "source")
          .orderBy("source")
      },
      oracle = Some("""
        WITH g AS (SELECT source, n_chars AS v, count(*) AS c
                   FROM documents GROUP BY 1, 2),
        t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
              FROM g GROUP BY 1),
        cum AS (SELECT g.source, g.v, g.c, t.n,
                       sum(g.c) OVER (PARTITION BY g.source
                                      ORDER BY g.v) AS cm
                FROM g JOIN t USING (source)),
        med AS (SELECT source, min(n) AS n,
                       min(CASE WHEN cm >= (n + 1) // 2 THEN v END) +
                       min(CASE WHEN cm >= n // 2 + 1 THEN v END) AS med2
                FROM cum GROUP BY source),
        dl AS (SELECT g.source, abs(2 * g.v - m.med2) AS d,
                      CAST(sum(g.c) AS BIGINT) AS c
               FROM g JOIN med m USING (source) GROUP BY 1, 2),
        dcum AS (SELECT dl.source, dl.d, dl.c, m.n,
                        sum(dl.c) OVER (PARTITION BY dl.source
                                        ORDER BY dl.d) AS cm
                 FROM dl JOIN med m USING (source)),
        mad AS (SELECT source,
                       min(CASE WHEN cm >= (n + 1) // 2 THEN d END) +
                       min(CASE WHEN cm >= n // 2 + 1 THEN d END) AS mad4
                FROM dcum GROUP BY source),
        outl AS (SELECT dl.source,
                        CAST(sum(CASE WHEN 2 * dl.d > 3 * mad.mad4
                                 THEN dl.c ELSE 0 END) AS BIGINT)
                          AS n_outliers
                 FROM dl JOIN mad USING (source) GROUP BY 1)
        SELECT med.source, med.n AS n_docs,
               CAST(med.med2 AS BIGINT) AS med2,
               CAST(mad.mad4 AS BIGINT) AS mad4,
               outl.n_outliers
        FROM med JOIN mad USING (source) JOIN outl USING (source)
        ORDER BY source""")),

    // ------------------------------------------------------------------
    // l-diversity release ledger (Machanavajjhala 2007): k-anonymity
    // (q167) alone can't stop attribute disclosure — a combo whose
    // members all share one sensitive value (here: language) leaks it
    // even at k >= 5. Each quasi-identifier combo must also carry >= l
    // distinct sensitive values. One keyed partial+final count +
    // distinct-count pass; the ledger IS the output.
    // ------------------------------------------------------------------
    "q183_l_diversity" -> Q(
      fn = (s, dir) => {
        Tables(s, dir, "documents")
          .groupBy(col("source"),
            expr("`n_chars` div 100").as("len_bucket"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_sensitive"))
          .select(col("source"), col("len_bucket"), col("n_docs"),
            col("n_sensitive"),
            (col("n_docs") >= 5L && col("n_sensitive") >= 3L).as("kept"))
          .orderBy("source", "len_bucket")
      },
      oracle = Some("""
        SELECT source, n_chars // 100 AS len_bucket,
               count(*) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_sensitive,
               count(*) >= 5 AND count(DISTINCT lang) >= 3 AS kept
        FROM documents
        GROUP BY source, len_bucket
        ORDER BY source, len_bucket""")),

    // ------------------------------------------------------------------
    // Per-source signal AUC: q178's acceptance gate, stratified — a
    // signal can look strong corpus-wide yet be flat or inverted
    // inside one source (Simpson's reversal), and a per-source ledger
    // is what catches it before the signal moves tokens everywhere.
    // Same exact doubled-U arithmetic, every step additionally keyed
    // by the source.
    // ------------------------------------------------------------------
    "q188_auc_per_source" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        Eval.aucPerStratum(Tables(s, dir, "documents"),
          stratum = col("source"),
          score = size(split(col("text"), " ")),
          label = col("lang") === "en")
          .withColumnRenamed("stratum", "source")
          .orderBy("source")
      },
      oracle = Some("""
        WITH b AS (
          SELECT source, len(string_split(text, ' ')) AS s,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        g AS (SELECT source, s, sum(y) AS np, sum(1 - y) AS nn
              FROM b GROUP BY source, s),
        c AS (SELECT source, np, nn,
                     COALESCE(sum(nn) OVER (PARTITION BY source ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS below
              FROM g)
        SELECT source,
               CAST(sum(np) AS BIGINT) AS n_pos,
               CAST(sum(nn) AS BIGINT) AS n_neg,
               CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
                 round(sum(np * (2 * below + nn))::DOUBLE /
                       (2.0 * sum(np) * sum(nn)), 6)
               END AS auc
        FROM c GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // k-fold cross-validation assignment balance: folds from the q56
    // content-stable md5 device (fold = first md5 nibbles mod k — the
    // same doc lands in the same fold on any engine, cluster size, or
    // run), reported as a fold × language balance ledger with each
    // fold's share in exact milli. The protocol read before k-fold
    // evaluation: a fold that under-represents a language invalidates
    // its round's eval.
    // ------------------------------------------------------------------
    "q189_fold_balance" -> Q(
      fn = (s, dir) => {
        val folds = 5
        // fold from the first FOUR md5 nibbles (the q56 hex device made
        // numeric): both engines parse the same 16-bit value, so fold
        // assignment is content-stable and engine-portable
        val withFold = Tables(s, dir, "documents")
          .withColumn("fold",
            expr("conv(substring(md5(cast(`doc_id` as string)), 1, 4)," +
              s" 16, 10)").cast("long") % folds)
        withFold.groupBy(col("fold"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("fold_share_milli",
            expr("1000L * `n_docs` div " +
              "sum(`n_docs`) over (partition by `lang`)"))
          .orderBy("fold", "lang")
      },
      oracle = Some("""
        WITH h AS (
          SELECT lang, md5(CAST(doc_id AS VARCHAR)) AS m
          FROM documents),
        f AS (
          SELECT lang,
                 ((instr('0123456789abcdef', m[1:1]) - 1) * 4096 +
                  (instr('0123456789abcdef', m[2:2]) - 1) * 256 +
                  (instr('0123456789abcdef', m[3:3]) - 1) * 16 +
                  (instr('0123456789abcdef', m[4:4]) - 1)) % 5 AS fold
          FROM h),
        g AS (SELECT fold, lang, count(*) AS n_docs
              FROM f GROUP BY 1, 2)
        SELECT CAST(fold AS BIGINT) AS fold, lang, n_docs,
               CAST(1000 * n_docs //
                 (sum(n_docs) OVER (PARTITION BY lang)) AS BIGINT)
                 AS fold_share_milli
        FROM g ORDER BY fold, lang""")),

    // ------------------------------------------------------------------
    // Skyline / 2-D Pareto frontier (Börzsönyi 2001): the documents no
    // other document beats on BOTH length and vocabulary size — the
    // multi-criteria shortlist a single weighted score can't express
    // (any weighting picks one frontier point; the skyline returns
    // them all). Two ledger passes + a pure per-row filter — no
    // pairwise comparisons, no corpus-row windows; the oracle is the
    // literal NOT EXISTS dominance definition.
    // ------------------------------------------------------------------
    "q196_pareto_frontier" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        val pts = Tables(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            size(array_distinct(split(col("text"), " "))).as("n_types"))
        Eval.paretoFrontier2D(pts, x = col("n_chars"),
            y = col("n_types"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT doc_id, n_chars,
                 len(list_distinct(string_split(text, ' '))) AS n_types
          FROM documents)
        SELECT doc_id, n_chars, n_types
        FROM p b
        WHERE NOT EXISTS (
          SELECT 1 FROM p a
          WHERE a.n_chars >= b.n_chars AND a.n_types >= b.n_types
            AND (a.n_chars > b.n_chars OR a.n_types > b.n_types))
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Chi-square independence of language × source (Pearson 1900) with
    // Cramér's V effect size: "is the language mix the same across
    // sources" — the mixture-design read before per-source language
    // quotas (q128/q143) are set; a large V says per-source language
    // balancing is load-bearing, a small one says source quotas alone
    // suffice. One corpus shuffle into the (lang, source) contingency
    // ledger; everything else — row/col totals, the χ² fold, dof —
    // runs on ledger rows (languages × sources, model-sized). The χ²
    // terms assemble in double from exact integer cell/marginal counts
    // (the q171 discipline), rounded 4dp on both engines.
    // ------------------------------------------------------------------
    "q185_chi2_lang_source" -> Q(
      fn = (s, dir) => {
        val g = Tables(s, dir, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("o"))
        val rt = g.groupBy(col("lang")).agg(sum(col("o")).as("r"))
        val ct = g.groupBy(col("source")).agg(sum(col("o")).as("c"))
        g.join(broadcast(rt), Seq("lang"))
          .join(broadcast(ct), Seq("source"))
          .agg(sum(col("o")).as("n"),
            countDistinct(col("lang")).as("__nr"),
            countDistinct(col("source")).as("__nc"),
            sum(col("o").cast("double") * col("o") /
              (col("r").cast("double") * col("c"))).as("__t"))
          .select(col("n"),
            ((col("__nr") - 1) * (col("__nc") - 1)).as("dof"),
            round(col("n") * col("__t") - col("n"), 4).as("chi2"),
            round(sqrt((col("n") * col("__t") - col("n")) /
              (col("n") * (least(col("__nr"), col("__nc")) - 1))), 4)
              .as("cramers_v"))
      },
      oracle = Some("""
        WITH g AS (SELECT lang, source, count(*) AS o
                   FROM documents GROUP BY 1, 2),
        rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r
               FROM g GROUP BY 1),
        ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS c
               FROM g GROUP BY 1),
        m AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                     CAST(count(DISTINCT g.lang) AS BIGINT) AS nr,
                     CAST(count(DISTINCT g.source) AS BIGINT) AS nc,
                     sum(o::DOUBLE * o / (r::DOUBLE * c)) AS t
              FROM g JOIN rt USING (lang) JOIN ct USING (source))
        SELECT n, (nr - 1) * (nc - 1) AS dof,
               round(n * t - n, 4) AS chi2,
               round(sqrt((n * t - n) / (n * (least(nr, nc) - 1))), 4)
                 AS cramers_v
        FROM m""")),

    // ------------------------------------------------------------------
    // Spearman rank correlation between two curation signals (char
    // length vs vocabulary size): the robust, monotone-only complement
    // of q171's Pearson matrix — outlier docs can't drag it, and a
    // nonlinear-but-monotone redundancy still shows as |rho| ~ 1. Tie-
    // averaged integer ranks from distinct-value ledgers (corpus rows
    // never window-sort), exact decimal moment sums, double only in
    // the final assembly; the oracle replays the identical rank
    // arithmetic.
    // ------------------------------------------------------------------
    "q181_spearman_signals" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        Eval.spearman(Tables(s, dir, "documents"),
          x = col("n_chars"),
          y = size(array_distinct(split(col("text"), " "))))
      },
      oracle = Some("""
        WITH b AS (
          SELECT n_chars AS x,
                 len(list_distinct(string_split(text, ' '))) AS y
          FROM documents),
        rx AS (SELECT x, 2 * COALESCE(sum(c) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) + c + 1 AS rxv
               FROM (SELECT x, count(*) AS c FROM b GROUP BY x)),
        ry AS (SELECT y, 2 * COALESCE(sum(c) OVER (ORDER BY y
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) + c + 1 AS ryv
               FROM (SELECT y, count(*) AS c FROM b GROUP BY y)),
        j AS (SELECT rx.rxv, ry.ryv
              FROM b JOIN rx USING (x) JOIN ry USING (y)),
        m AS (SELECT count(*) AS n, sum(rxv) AS sx, sum(ryv) AS sy,
                     sum(rxv * ryv) AS sxy, sum(rxv * rxv) AS sxx,
                     sum(ryv * ryv) AS syy
              FROM j)
        SELECT CAST(n AS BIGINT) AS n,
               round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
                     (sqrt(n::DOUBLE * sxx::DOUBLE -
                           sx::DOUBLE * sx::DOUBLE) *
                      sqrt(n::DOUBLE * syy::DOUBLE -
                           sy::DOUBLE * sy::DOUBLE)), 4) AS rho
        FROM m""")),

    // ------------------------------------------------------------------
    // Calibration reliability bins: the type-token-ratio quality
    // signal bucketed into width-50 milli bins against the q178 'en'
    // cohort — AUC (q178/q188) says the signal RANKS, this says
    // whether its VALUES are honest probabilities (a bin whose actual
    // positive rate sits far from its score is where a global
    // threshold lies). One bin-keyed partial+final aggregate, exact
    // integer rates on both engines.
    // ------------------------------------------------------------------
    "q206_calibration_bins" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        val docs = Tables(s, dir, "documents")
        Eval.calibrationBins(docs,
            scoreMilli = expr(
              "(1000 * size(array_distinct(split(text, ' ')))) div " +
                "size(split(text, ' '))"),
            label = col("lang") === "en", width = 50L)
          .orderBy("bin")
      },
      oracle = Some("""
        WITH b AS (
          SELECT (1000 * len(list_distinct(string_split(text, ' ')))) //
                   len(string_split(text, ' ')) AS s,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        g AS (SELECT s // 50 AS bin, count(*) AS n_docs,
                     CAST(sum(y) AS BIGINT) AS n_pos,
                     CAST(sum(s) AS BIGINT) AS ssum
              FROM b GROUP BY 1)
        SELECT bin, CAST(bin * 50 AS BIGINT) AS bin_lo, n_docs, n_pos,
               CAST((1000 * n_pos) // n_docs AS BIGINT) AS pos_rate_milli,
               CAST(ssum // n_docs AS BIGINT) AS mean_score_milli
        FROM g ORDER BY bin""")),

    // ------------------------------------------------------------------
    // Exact stratified 80/10/10 split: every language contributes
    // exactly ceil-share rows to train/val/test at content-stable,
    // re-seedable cut ranks — the eval-protocol splitter (a hash-
    // threshold split drifts per stratum; an accidentally half-sized
    // eval slice for one language mis-ranks multilingual models).
    // Gated as per-(lang, split) counts + id checksum.
    // ------------------------------------------------------------------
    "q207_stratified_split" -> Q(
      fn = (s, dir) => {
        Sampling.stratifiedSplit(Tables(s, dir, "documents"),
            "doc_id", "lang", cutTrain = 0.8, cutVal = 0.9, seed = "sp")
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("lang", "split")
      },
      oracle = Some("""
        WITH r AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5('sp:' || CAST(doc_id AS VARCHAR)),
                            'sp:' || CAST(doc_id AS VARCHAR)) AS rk,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents),
        s AS (SELECT doc_id, lang,
                CASE WHEN rk <= ceil(0.8 * n) THEN 'train'
                     WHEN rk <= ceil(0.9 * n) THEN 'val'
                     ELSE 'test' END AS split
              FROM r)
        SELECT lang, split, count(*) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM s GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // Language-proportional interleave order: each language's r-th of
    // n_s rows lands at the exact integral (2r−1)/(2·n_s) quantile of
    // [0, N), so every contiguous slice of the training order — a
    // shard, an epoch prefix — carries each language at its corpus
    // share (a plain shuffle gets that in expectation; file order not
    // at all). Gated per-document on the key itself.
    // ------------------------------------------------------------------
    "q208_interleave_order" -> Q(
      fn = (s, dir) => {
        Sampling.interleaveOrder(Tables(s, dir, "documents")
            .select(col("doc_id"), col("lang")),
            "doc_id", "lang", seed = "il")
          .select(col("doc_id"), col("lang"),
            col("interleave_key"), col("stratum_rank"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH r AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5('il:' || CAST(doc_id AS VARCHAR)),
                            'il:' || CAST(doc_id AS VARCHAR)) AS rk,
                 count(*) OVER (PARTITION BY lang) AS n,
                 count(*) OVER () AS total
          FROM documents)
        SELECT doc_id, lang,
               CAST(((2 * rk - 1) * total) // (2 * n) AS BIGINT)
                 AS interleave_key,
               CAST(rk AS BIGINT) AS stratum_rank
        FROM r ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Per-source quality drift over crawl order: OLS slope of the
    // type-token-ratio milli signal against document sequence within
    // each source — "is this source degrading as the crawl deepens",
    // the per-source complement of q182's per-type value trend and the
    // ORDER-correlated read q145/q173's order-blind distribution
    // drifts can't make. Exact decimal moment sums, double only in
    // the final rounded assembly.
    // ------------------------------------------------------------------
    "q210_source_quality_trend" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        Eval.olsTrend(Tables(s, dir, "documents"),
            group = col("source"), x = col("doc_id"),
            y = expr("(1000 * size(array_distinct(split(text, ' ')))) " +
              "div size(split(text, ' '))"))
          .withColumnRenamed("grp", "source")
          .orderBy("source")
      },
      oracle = Some("""
        WITH b AS (
          SELECT source, doc_id AS x,
                 (1000 * len(list_distinct(string_split(text, ' ')))) //
                   len(string_split(text, ' ')) AS y
          FROM documents),
        m AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x * y) AS sxy, sum(x * x) AS sxx
              FROM b GROUP BY source)
        SELECT source, CAST(n AS BIGINT) AS n,
               CASE WHEN n >= 2 AND n::DOUBLE * sxx::DOUBLE -
                         sx::DOUBLE * sx::DOUBLE > 0 THEN
                 round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
                   6)
               END AS slope,
               CASE WHEN n >= 2 AND n::DOUBLE * sxx::DOUBLE -
                         sx::DOUBLE * sx::DOUBLE > 0 THEN
                 round((sy::DOUBLE -
                   ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
                    (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
                   * sx::DOUBLE) / n::DOUBLE, 6)
               END AS icept
        FROM m ORDER BY source"""))
  )
}
