package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}
import graft.plans.{DotProduct, SketchExpressions => SK}

/** Deduplication operators for training-data pipelines. All families —
  * exact, exact n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
  * — are pure DataFrame programs: candidate generation is an equi-join
  * on a derived key (fingerprint / prefix shingle / band / simhash-band
  * / grid cell), so at 100 TB each one compiles to hash-partitioned
  * shuffles on keys whose cardinality grows with the corpus — never a
  * cross join, never a driver-side materialization.
  *
  * Candidate generation and verification are split everywhere:
  * candidates come from a pruned/sketched index (cheap, possibly
  * lossy-by-contract), while Jaccard/cosine VALUES are always computed
  * from the full data — so pruning knobs can only affect recall, never
  * corrupt a reported similarity.
  */
object Dedup {

  /** Exact dedup via normalized-text fingerprint: one summary row per
    * distinct content with the keeper (min id) and duplicate count.
    * Map-side partial agg makes this one shuffle of (fingerprint) pairs.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), T.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Every public entry point exposes `spread: Boolean = true` — see
    * [[Spread]] for the shared policy and the production off-switch. */
  private def maybeSpread(df: DataFrame, spread: Boolean): DataFrame =
    Spread(df, spread)

  /** One-row aggregate as an in-plan scalar-subquery expression — see
    * [[graft.plans.Scalars]] (lazy, no BNLJ in the plan). */
  private def scalarOf(agg: DataFrame): Column = graft.plans.Scalars.of(agg)

  /** Inverted index (id, k) with k = hash of (partition, shingle).
    * Shingles are array_distinct upstream so (id, k) is unique.
    * `charLevel` switches to character n-grams — the tokenization for
    * unsegmented scripts (CJK etc.), where whitespace shingling would
    * silently index whole sentences as single shingles.
    *
    * `private[graft]` (not private): the streaming ingest path
    * ([[graft.streaming.Streaming.ingestDedupBatch]]) persists exactly
    * these rows as its shingle-index sidecar, and the key derivation must
    * be THE single definition — a re-derived hash in the streaming layer
    * could silently diverge. `carry` forwards extra columns (e.g. a
    * provenance batch id) through the explode untouched. */
  private[graft] def shingleIndex(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, partitionCol: Option[String],
      charLevel: Boolean = false,
      spread: Boolean = true,
      carry: Seq[String] = Nil): DataFrame = {
    val sh = if (charLevel) T.charShingles(col(textCol), n)
      else T.wordShingles(col(textCol), n)
    maybeSpread(df, spread).select(
      col(idCol).as("id") +:
        partitionCol.map(col).getOrElse(lit("")).as("part") +:
        explode(sh).as("shingle") +:
        carry.map(col): _*)
      .select(col("id") +: xxhash64(col("part"), col("shingle")).as("k") +:
        carry.map(col): _*)
  }

  /** Prefix-filtered candidate index (PPJoin-style, Xiao et al. /
    * Bayardo et al. — public set-similarity-join literature): order
    * each doc's shingles by the GLOBAL rarity order (ascending document
    * frequency, hash as tie-break) and keep only the first
    * `sz - ceil(threshold*sz) + 1`. Two docs with Jaccard >= threshold
    * must share >= ceil(threshold*max(sz_a, sz_b)) shingles, so their
    * rarity-prefixes provably intersect — candidate generation from
    * prefixes alone is LOSSLESS while shrinking the self-joined index
    * to its rarest keys (frequent shingles fall out of prefixes, which
    * is exactly what caps the sum-of-df^2 pair explosion at scale).
    *
    * `maxDocFreq` / `maxDocFreqRatio` additionally drop hyper-frequent
    * keys from the prefix index before ranking — a skew guard for
    * boilerplate-heavy corpora. The ratio form caps document frequency
    * at `ceil(ratio * corpus_docs)`, so the guard scales with the
    * corpus instead of hard-coding an absolute count (an absolute cap
    * that preserves recall at one SF silently starts dropping true
    * pairs at 10× the docs, where boilerplate df grows linearly). The
    * corpus count enters the plan as a broadcast one-row aggregate —
    * fully lazy, no driver-side action. Because either cap only gates
    * CANDIDATES (verification always uses the full index), it can only
    * lose pairs whose every shared prefix shingle is hyper-frequent,
    * never report a wrong value.
    *
    * Per-doc sizes (`sz` = FULL pre-cap shingle count, which the
    * prefix-length formula requires) are computed with a window count
    * over the same `id` partitioning the ranking window uses — one
    * exchange total, instead of a separate groupBy-and-join that
    * re-shuffled the whole index.
    */
  /** The full index ranked in the global rarity order: every (k, id)
    * row with `sz` (FULL pre-cap per-doc shingle count) and `rn` (the
    * row's position in its doc's ascending-df, hash-tie-broken order).
    * [[prefixIndex]] is this frame filtered to the prefix length
    * ([[inPrefix]]). Note [[containmentPairs]] deliberately does NOT
    * consume the ranked frame on its sup side — the A/B documented
    * there measured the sup-side kdf-join + rank window at 2–3× the
    * whole operator, more than its pruning saves. Cap semantics
    * documented on [[prefixIndex]]. */
  private def rankedIndex(
      index: DataFrame,
      maxDocFreq: Option[Int],
      maxDocFreqRatio: Option[Double] = None,
      nDocsAgg: Option[DataFrame] = None): DataFrame = {
    val kdf = index.groupBy("k").agg(count(lit(1)).as("kdf"))
    val wid = Window.partitionBy("id")
    val sized = index.join(kdf, "k")
      .withColumn("sz", count(lit(1)).over(wid))
    // both caps supplied → both apply (the stricter one wins); a cap
    // the caller asked for is never silently ignored
    def relCap: Column = {
      // `nDocsAgg` (when the caller still holds the pre-explode docs):
      // the same one-row count computed WITHOUT a pass over the
      // exploded index — countDistinct over index ids equals a
      // distinct count of non-null doc ids with >= 1 shingle, which
      // the caller can evaluate on doc-level rows
      val nDocs = nDocsAgg.getOrElse(
        index.agg(countDistinct(col("id")).as("n_docs")))
      ceil(lit(maxDocFreqRatio.get) * scalarOf(nDocs))
    }
    val guarded = (maxDocFreq, maxDocFreqRatio) match {
      case (Some(m), Some(_)) =>
        sized.filter(col("kdf") <= m && col("kdf") <= relCap)
      case (Some(m), None) => sized.filter(col("kdf") <= m)
      case (None, Some(_)) => sized.filter(col("kdf") <= relCap)
      case _ => sized
    }
    guarded
      .withColumn("rn", row_number().over(wid.orderBy(col("kdf"), col("k"))))
      .select("k", "id", "sz", "rn")
  }

  /** The per-doc rarity-prefix length for `threshold`, shared by the
    * prefix filter and its callers. Sized from threshold − 0.001, NOT
    * threshold: downstream verification (and every oracle) admits by
    * the ROUNDED value `round(v, 3) >= t`, so a pair with true score
    * as low as t − 0.0005 is a legitimate output; a prefix sized for
    * score >= t exactly would be allowed to miss it (all O shared
    * keys could sit in the ceil(t·sz) − 1 suffix). With
    * t_s = t − 0.001: an admitted pair has O > t_s·sz >=
    * ceil(t_s·sz) − 1 = |suffix|, so a shared prefix key exists — the
    * pigeonhole survives the admission band. Cost: prefixes grow by
    * at most 0.001·sz + 1 keys. */
  private def inPrefix(threshold: Double): Column = {
    val ts = math.max(0.0, threshold - 0.001)
    col("rn") <= col("sz") - ceil(lit(ts) * col("sz")) + 1
  }

  private def prefixIndex(
      index: DataFrame, threshold: Double,
      maxDocFreq: Option[Int],
      maxDocFreqRatio: Option[Double] = None,
      nDocsAgg: Option[DataFrame] = None): DataFrame =
    rankedIndex(index, maxDocFreq, maxDocFreqRatio, nDocsAgg)
      .filter(inPrefix(threshold))
      // sz (full pre-cap shingle count) and rn (prefix position in the
      // global rarity order) ride along for the Jaccard-only candidate
      // pruning filters; plain-key consumers just project them away

  /** Candidate pairs from any (k, id) candidate index: equi-join on the
    * derived key, ordered ids, deduped. */
  private def candidatePairs(candIndex: DataFrame): DataFrame = {
    // same explosive self-join shape as [[candidatePairsJaccard]] —
    // explicit cores-derived partitioning (rationale there)
    val p = candIndex.sparkSession.sparkContext.defaultParallelism
    val a = candIndex.select(col("k"), col("id").as("a_id"))
      .repartition(p, col("k"))
    val b = candIndex.select(col("k"), col("id").as("b_id"))
      .repartition(p, col("k"))
    a.join(b, Seq("k"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Candidate pairs for JACCARD >= threshold from a [[prefixIndex]]
    * carrying (sz, rn), with two provably lossless PPJoin-style pruning
    * filters (Xiao et al., public set-similarity-join literature)
    * applied INSIDE the key join — before the pair-dedup exchange, so
    * they cut shuffled candidate volume, not just verify fan-in:
    *
    *   - length filter: J >= t forces t·max(sz_a,sz_b) <= min(...), so
    *     any pair failing `sz_a >= t·sz_b && sz_b >= t·sz_a` cannot
    *     reach the threshold;
    *   - positional filter: J >= t forces |A∩B| >= ceil(t/(1+t) ·
    *     (sz_a+sz_b)); for a shared key at positions (rn_a, rn_b) of
    *     the SAME global rarity order, shared elements split into
    *     those strictly before (<= min(rn_a,rn_b) − 1 — each occupies
    *     one earlier position in BOTH orders), this key (1), and those
    *     after (<= min(sz_a−rn_a, sz_b−rn_b)), so
    *     min(rn_a,rn_b) + min(sz_a−rn_a, sz_b−rn_b) upper-bounds the
    *     overlap. Hyper-frequent grams dropped by a df-cap rank
    *     strictly AFTER every kept gram (ascending-df order), so rn is
    *     the true full-order position and sz is the full count — the
    *     bound stays valid under either cap.
    *
    * A true pair passes both filters on EVERY shared-key row (the
    * bounds hold per row), so no distinct-loss interaction exists;
    * the randomized brute-force spec and the df-cap equality spec gate
    * both. Only valid for Jaccard semantics — winnowing's containment
    * score (|∩|/min) has no length constraint, so it stays on
    * [[candidatePairs]].
    *
    * Both bounds are evaluated at `threshold − 0.001`, not `threshold`:
    * [[verifyPairs]] (and every DuckDB oracle) admits by the ROUNDED
    * value `round(J, 3) >= t`, so a pair with true J as low as
    * t − 0.0005 is a legitimate output — pruning derived from J >= t
    * exactly would be allowed to drop it. The 0.001 slack strictly
    * covers that admission band plus any float-product ulp (the
    * overlap bound is also spelled multiplicatively, ub·(1+t) >= t·Σsz,
    * rather than via ceil() of a double, whose upward ulp on an
    * integral product would over-tighten the requirement by one). A
    * threshold <= 0.001 degenerates to no pruning — safe, not wrong. */
  private def candidatePairsJaccard(
      prefix: DataFrame, threshold: Double): DataFrame = {
    val ts = math.max(0.0, threshold - 0.001)
    // explicit cores-derived partitioning on the self-join key: the
    // candidate join fans out df(k)² rows per prefix key from a
    // byte-slim input, the explosive-join shape AQE's byte-based
    // coalescing under-parallelizes (the [[graft.operators.Graphs]]
    // wedge-join finding: a 75 s single-task join; REPARTITION_BY_NUM
    // opts out of coalescing without adding an exchange the join did
    // not already need, and defaultParallelism stays cluster-adaptive)
    val p = prefix.sparkSession.sparkContext.defaultParallelism
    val a = prefix.select(col("k"), col("id").as("a_id"),
      col("sz").as("a_sz"), col("rn").as("a_rn"))
      .repartition(p, col("k"))
    val b = prefix.select(col("k"), col("id").as("b_id"),
      col("sz").as("b_sz"), col("rn").as("b_rn"))
      .repartition(p, col("k"))
    a.join(b, Seq("k"))
      .filter(col("a_id") < col("b_id") &&
        col("a_sz") >= lit(ts) * col("b_sz") &&
        col("b_sz") >= lit(ts) * col("a_sz") &&
        (least(col("a_rn"), col("b_rn")) +
          least(col("a_sz") - col("a_rn"), col("b_sz") - col("b_rn")))
          .cast("double") * lit(1.0 + ts) >=
          lit(ts) * (col("a_sz") + col("b_sz")))
      .select("a_id", "b_id").distinct()
  }

  /** Per-doc compacted shingle sets: one array row per doc instead of
    * one row per (doc, shingle). The verify joins below ship ONE array
    * per candidate-pair side through the shuffle instead of exploding
    * every pair into sz_a + sz_b narrow rows and re-aggregating them —
    * at low thresholds (where prefix filtering provably cannot prune,
    * e.g. J >= 0.25 over boilerplate-heavy char-grams, candidates ~=
    * all pairs) this is the difference between shuffling ~sz × |pairs|
    * rows and shuffling |pairs| rows. (id, k) is distinct upstream so
    * the sorted list is a set and the sorted-merge kernel
    * [[graft.plans.SortedIntersectCount]] counts a true |A ∩ B| in
    * O(sz_a + sz_b) per pair with zero allocation (the built-in
    * `array_intersect` builds a hash set per evaluated pair). */
  private def docSets(index: DataFrame): DataFrame =
    index.groupBy("id")
      .agg(sort_array(collect_list(col("k"))).as("ks"),
        count(lit(1)).as("sz"))

  /** Exact-Jaccard verification of candidate pairs against the FULL
    * index, compacted to per-doc arrays: two equi-joins on the pair
    * ids, then one sorted-merge intersect per pair. Per-pair work is
    * linear in the docs' shingle counts, so verification cost scales
    * with the candidate count the sketch produced, not with corpus^2 —
    * and no row explosion ever enters a shuffle. */
  private def verifyPairs(
      cands: DataFrame, index: DataFrame, threshold: Double): DataFrame = {
    val sets = docSets(index)
    cands
      .join(sets.select(col("id").as("a_id"), col("ks").as("a_ks"),
        col("sz").as("a_sz")), "a_id")
      .join(sets.select(col("id").as("b_id"), col("ks").as("b_ks"),
        col("sz").as("b_sz")), "b_id")
      .withColumn("inter", SK.sortedIntersectCount(col("a_ks"), col("b_ks")))
      .withColumn("jaccard", round(
        col("inter").cast("double") / (col("a_sz") + col("b_sz") - col("inter")), 3))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Exact n-gram Jaccard near-dup pairs: rarity-prefix candidate
    * generation (lossless, see [[prefixIndex]]) + full-index
    * verification. `partitionCol` (e.g. language) confines candidates.
    *
    * Character n-grams repeat across documents orders of magnitude
    * more than word shingles (same measurement that turned winnowing's
    * df-cap on by default: the hottest char 8-gram appears in 77% of
    * docs), so when `charLevel` is set and the caller supplies no cap,
    * the candidate stage defaults to a RELATIVE df-cap of 15% of the
    * corpus. On the synthetic corpus the rarest shared shingle of any
    * true J≥0.25 pair sits at ~9–11% of corpus docs at BOTH sf0.01 and
    * sf0.1 (the boilerplate fraction is scale-free), so 15% preserves
    * every true pair at every measured SF while cutting the hot-key
    * Σ df(k)² candidate-join blowup; values are verified on the full
    * index regardless.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      partitionCol: Option[String] = None,
      maxDocFreq: Option[Int] = None,
      charLevel: Boolean = false,
      maxDocFreqRatio: Option[Double] = None,
      spread: Boolean = true): DataFrame = {
    val ratio =
      if (charLevel && maxDocFreq.isEmpty && maxDocFreqRatio.isEmpty)
        Some(0.15)
      else maxDocFreqRatio
    // materialized ONCE: the index lineage (tokenize + explode + hash,
    // the kernel's per-row hot path) is consumed by subtrees with
    // DIFFERENT partitionings — the df ledger + ranking (hash(k)) and
    // the verify side's per-doc sets (hash(id)) — so ReuseExchange
    // cannot share them and the explode re-ran per consumer. The same
    // measurement that makes the streaming path write its batch index
    // to parquet before querying it ("measured ~2x on the parity
    // gate"); here an executor-local checkpoint does the same job
    // inside one query. |index| = corpus gram rows — the size class
    // the streaming store already materializes; spills to disk under
    // MEMORY_AND_DISK at scale.
    val index =
      shingleIndex(df, idCol, textCol, n, partitionCol, charLevel, spread)
        .localCheckpoint(true)
    // the relative df-cap's corpus count, computed on DOC-level rows
    // (one scan of df, no explode): distinct non-null ids with >= 1
    // shingle — exactly the ids the exploded index contains
    val sh = if (charLevel) T.charShingles(col(textCol), n)
      else T.wordShingles(col(textCol), n)
    val nDocsAgg = df
      .filter(col(idCol).isNotNull && size(sh) > 0)
      .agg(countDistinct(col(idCol)).as("n_docs"))
    val cands = candidatePairsJaccard(
      prefixIndex(index, threshold, maxDocFreq, ratio, Some(nDocsAgg)),
      threshold)
    verifyPairs(cands, index, threshold)
  }

  /** Asymmetric CONTAINMENT near-dup pairs: every ORDERED pair
    * (src, sup) of distinct docs with
    * `C(src→sup) = |S_src ∩ S_sup| / |S_src| >= threshold` over
    * distinct word (or char) n-gram sets — the subset/superset notion
    * of duplication that symmetric Jaccard structurally misses: a page
    * fully quoted inside a 10× larger page has J ≈ 0.1 but C = 1.0.
    * Production corpora are full of these (wrapper pages, quote
    * aggregators, doc+boilerplate mirrors), and dropping the contained
    * side is the standard cleanup. Output: `src_id`, `sup_id`,
    * `containment` (rounded to 3; both directions reported when both
    * clear the threshold).
    *
    * Candidate generation is LOSSLESS and one-sided: C >= t needs
    * overlap O >= t·sz_src, and admission is by `round(C,3) >= t`, so
    * with t_s = t − 0.001 an admitted pair has O > t_s·sz_src >=
    * ceil(t_s·sz_src) − 1 = |suffix| — the src doc's RARITY PREFIX
    * (the [[prefixIndex]] machinery verbatim: the per-side prefix
    * length it computes for Jaccard, sz − ceil(t_s·sz) + 1, is exactly
    * the containment bound, because J >= t also forces O >= t·sz_a
    * per side) must share a key with the sup doc. The sup side has no
    * usable prune (its size places NO constraint on C(src→sup)), so
    * candidates = src-prefix ⋈ FULL index on the gram key. That stays
    * scale-sane for the same reason the Jaccard join does: prefixes
    * hold each doc's RAREST grams, so the per-key fan-out df(k) is
    * small by construction; hyper-frequent grams never enter any
    * prefix. `maxDocFreq`/ratio caps apply to the src prefix only and
    * carry the same recall caveat as [[prefixIndex]].
    *
    * Verification is exact on per-doc compacted sets ([[docSets]] +
    * the sorted-merge intersect kernel): texts never shuffle, each
    * candidate ships two sorted arrays once. No candidate-side
    * length/positional pruning is interposed: the PPJoin-style
    * in-join filters need per-row (sz, rn) on the sup side, i.e. the
    * full index run through the rarity ranking — and an A/B at sf0.1
    * measured that extra kdf-join + per-doc window on the sup branch
    * at 2–3× the whole operator's cost, far more than the pruned
    * candidates save (the containment length bound `sz_sup >=
    * t·sz_src` is weak by nature — the sup side is usually the BIGGER
    * document). The verify's containment check subsumes both bounds
    * exactly. */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      partitionCol: Option[String] = None,
      maxDocFreq: Option[Int] = None,
      charLevel: Boolean = false,
      maxDocFreqRatio: Option[Double] = None,
      spread: Boolean = true): DataFrame = {
    val index =
      shingleIndex(df, idCol, textCol, n, partitionCol, charLevel, spread)
    val srcPrefix = prefixIndex(index, threshold, maxDocFreq, maxDocFreqRatio)
    val cands = srcPrefix.select(col("k"), col("id").as("src_id"))
      .join(index.select(col("k"), col("id").as("sup_id")), Seq("k"))
      .filter(col("src_id") =!= col("sup_id"))
      .select("src_id", "sup_id").distinct()
    val sets = docSets(index)
    cands
      .join(sets.select(col("id").as("src_id"), col("ks").as("src_ks"),
        col("sz").as("src_sz")), "src_id")
      .join(sets.select(col("id").as("sup_id"), col("ks").as("sup_ks")),
        "sup_id")
      .withColumn("containment", round(
        SK.sortedIntersectCount(col("src_ks"), col("sup_ks")).cast("double") /
          col("src_sz"), 3))
      .filter(col("containment") >= threshold)
      .select("src_id", "sup_id", "containment")
  }

  /** Edit-distance similarity join (Ed-Join, Xiao/Wang/Lin 2008):
    * all pairs with character Levenshtein distance <= `maxDist`,
    * reported as `(a_id, b_id, ed)` — the string-level twin of
    * [[ngramJaccardPairs]] for corpora where "near duplicate" means a
    * handful of character EDITS (OCR noise, typo-mutated mirrors)
    * rather than set overlap.
    *
    * Candidate generation is the q-gram PREFIX FILTER, and it is
    * LOSSLESS: one edit destroys at most `q` positional char q-grams,
    * so `ed(a,b) <= k` implies at most `k*q` distinct gram TYPES of
    * each side vanish from the other (a type lost loses its every
    * occurrence, each at some destroyed position); order all types by
    * global rarity (ascending df, hash tie-break — the [[prefixIndex]]
    * order) and keep each doc's first `k*q + 1`: if the two prefixes
    * were disjoint, the side whose prefix ends LATER in the order
    * (say a) yields >= 1 of b's prefix types present in a (b's prefix
    * has k*q+1 types, at most k*q missing from a) — which then sits in
    * a's SUFFIX, after a's prefix end, contradicting that b's prefix
    * precedes it. Hence candidates = the prefix-prefix equi-join.
    * Strings with fewer than `k*q + q` chars can in principle lose ALL
    * their gram types to k edits; callers joining such short strings
    * should lower q (the guarantee needs `len - q + 1 > k*q`).
    *
    * Verification is exact and banded: a length filter first
    * (`|len_a - len_b| <= k` — each edit changes length by at most 1),
    * then Spark's built-in threshold Levenshtein, which early-exits
    * the DP past `k` (codegen'd, O(len·k) not O(len²)). Values are
    * always computed from the full strings — the filter stack can only
    * drop candidates, never corrupt a reported distance.
    *
    * Scale shape: the only corpus-sized shuffles are the gram-index
    * aggregates and the prefix equi-join on RARE grams (hot grams fall
    * out of every prefix — same economics as [[prefixIndex]]); texts
    * travel once, to verify surviving candidates. */
  def editDistancePairs(
      df: DataFrame, idCol: String, textCol: String,
      q: Int = 8, maxDist: Int = 5,
      spread: Boolean = true): DataFrame = {
    require(q >= 2 && q <= 32, "q must be in [2, 32]")
    require(maxDist >= 0 && maxDist <= 64, "maxDist must be in [0, 64]")
    // materialized ONCE (the dedupedRel discipline): the gram index is
    // consumed twice — the df aggregate and the prefix join — and its
    // lineage is the O(len) char-shingle explode (the checkpoint
    // bought q179 from 5.2 s to 3.6 s at sf0.1)
    val index =
      shingleIndex(df, idCol, textCol, q, None, charLevel = true, spread)
        .localCheckpoint(true)
    val kdf = index.groupBy("k").agg(count(lit(1)).as("kdf"))
    val wid = Window.partitionBy("id")
    // the per-doc length RIDES the prefix index so the banded verify's
    // length necessary-condition (`|len_a − len_b| <= k` — each edit
    // changes length by at most 1) prunes INSIDE the key self-join,
    // before the pair-dedup exchange and before any text bytes attach:
    // measured at sf0.1, the raw prefix join admits 1.55M distinct
    // candidate pairs of which only 48k are length-compatible — the
    // old spelling shipped the 32× fan-in through both text joins just
    // to length-filter it afterwards. The lens join lands on the
    // window's existing hash(id) partitioning (no new exchange on the
    // index side; lens itself is one slim (id, len) shuffle).
    val lens = df.select(col(idCol).as("id"),
      length(col(textCol)).as("__len"))
    val pref = index.join(kdf, "k")
      .withColumn("rn",
        row_number().over(wid.orderBy(col("kdf"), col("k"))))
      .filter(col("rn") <= maxDist * q + 1)
      .select("k", "id")
      .join(lens, "id")
    // explicit cores-derived partitioning on the self-join key — the
    // [[candidatePairs]] explosive-join rationale
    val p = pref.sparkSession.sparkContext.defaultParallelism
    val a = pref.select(col("k"), col("id").as("a_id"),
      col("__len").as("__la")).repartition(p, col("k"))
    val b = pref.select(col("k"), col("id").as("b_id"),
      col("__len").as("__lb")).repartition(p, col("k"))
    val cands = a.join(b, Seq("k"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .select("a_id", "b_id").distinct()
    val t = df.select(col(idCol).as("id"), col(textCol).as("__t"))
    cands
      .join(t.select(col("id").as("a_id"), col("__t").as("__ta")), "a_id")
      .join(t.select(col("id").as("b_id"), col("__t").as("__tb")), "b_id")
      .withColumn("ed", levenshtein(col("__ta"), col("__tb"), maxDist))
      .filter(col("ed") >= 0) // threshold form returns -1 past maxDist
      .select(col("a_id"), col("b_id"), col("ed"))
  }

  /** MinHash + LSH near-dup pairs: signature → band keys → bucket join
    * for candidates → exact-Jaccard verification computed ONLY over
    * candidate pairs (per-pair joins against the full index — see
    * [[verifyPairs]]). Identical output contract to
    * `ngramJaccardPairs` when recall holds; candidate work scales with
    * bucket collision counts, not corpus^2, and nothing ever touches
    * the driver.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      numHashes: Int = 32, bands: Int = 8,
      partitionCol: Option[String] = None,
      spread: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val base = maybeSpread(df, spread).select(
      col(idCol).as("id"),
      partitionCol.map(col).getOrElse(lit("")).as("part"),
      T.wordShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigs = base.withColumn("sig", SK.minhashSig(col("sh"), numHashes))
    val bandIndex = sigs.select(
      col("id"),
      explode(SK.minhashBandKeys(col("sig"), bands)).as("bkey"),
      col("part"))
      .select(col("id"), xxhash64(col("part"), col("bkey")).as("k"))
    val cands = candidatePairs(bandIndex)
    val index =
      shingleIndex(df, idCol, textCol, n, partitionCol, spread = spread)
    verifyPairs(cands, index, threshold)
  }

  /** SimHash near-dup pairs: 64-bit signature, 4×16-bit band bucketing
    * (full recall for hamming ≤ 3 by pigeonhole), verify with exact
    * hamming distance. The signature is a native kernel; ids keep their
    * source type (any orderable type works for the a < b dedup).
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, spread: Boolean = true): DataFrame = {
    // the 4×16-bit banding is pigeonhole-complete ONLY up to hamming 3
    // (4 differing bits can land one per band and never share a key) —
    // a larger threshold would silently lose recall, so reject it
    require(maxHamming >= 0 && maxHamming <= 3,
      s"simhashPairs: 4-band bucketing guarantees recall only for " +
        s"maxHamming <= 3, got $maxHamming")
    val sigs = maybeSpread(df, spread)
      .select(col(idCol).as("id"), SK.simhash64(col(textCol)).as("simhash"))
    val banded = sigs.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        xxhash64(lit(b), H.simhashBand(col("simhash"), b))): _*))
        .as("k"))
    val a = banded.select(col("k"), col("id").as("a_id"), col("simhash").as("a_sim"))
    val b = banded.select(col("k"), col("id").as("b_id"), col("simhash").as("b_sim"))
    a.join(b, Seq("k"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sim", "b_sim")
      .distinct()
      .withColumn("hamming", H.hammingDistance(col("a_sim"), col("b_sim")))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Cross-corpus contamination detection: for each held-out (test)
    * document, find training documents containing >= `threshold` of its
    * n-gram shingles (containment = |train ∩ test| / |test|) — the
    * train/eval-leakage check every training pipeline needs.
    *
    * Candidate generation is one-sided prefix filtering: containment
    * >= t means the overlap has >= ceil(t·|test|) of the test doc's
    * shingles, so by pigeonhole the test doc's rarity-prefix of length
    * |test| - ceil(t·|test|) + 1 must contain at least one shared
    * shingle — joining the FULL train index against only test PREFIXES
    * is therefore lossless, while rare-first prefixes keep hot shingles
    * out of the join. Verification recomputes exact containment from
    * the full indexes, per candidate pair.
    */
  def crossContamination(
      train: DataFrame, test: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      partitionCol: Option[String] = None,
      maxDocFreq: Option[Int] = None,
      spread: Boolean = true): DataFrame = {
    val ti = shingleIndex(train, idCol, textCol, n, partitionCol,
      spread = spread)
    val si = shingleIndex(test, idCol, textCol, n, partitionCol,
      spread = spread)
    // same prefix length formula as Jaccard: sz - ceil(t*sz) + 1
    val testPrefix = prefixIndex(si, threshold, maxDocFreq)
    val cands = ti.select(col("k"), col("id").as("train_id"))
      .join(testPrefix.select(col("k"), col("id").as("test_id")), Seq("k"))
      .select("train_id", "test_id").distinct()
    val trainSets = docSets(ti)
    val testSets = docSets(si)
    cands
      .join(trainSets.select(col("id").as("train_id"),
        col("ks").as("train_ks")), "train_id")
      .join(testSets.select(col("id").as("test_id"),
        col("ks").as("test_ks"), col("sz")), "test_id")
      .withColumn("inter",
        SK.sortedIntersectCount(col("train_ks"), col("test_ks")))
      .withColumn("contamination",
        round(col("inter").cast("double") / col("sz"), 3))
      .filter(col("contamination") >= threshold)
      .select("train_id", "test_id", "contamination")
  }

  /** Exact n-gram decontamination: every (train, test) document pair
    * sharing AT LEAST ONE word n-gram, with the count of distinct
    * shared grams — the overlap filter used to scrub eval sets out of
    * training corpora (the 13-gram exact-collision recipe popularized
    * by the GPT-3 appendix; public methodology). Unlike
    * [[crossContamination]]'s thresholded containment, this is a
    * zero-tolerance exact test: no prefix pruning is possible (ANY
    * shared gram counts, so every gram is load-bearing) and no df-cap
    * is offered (a cap would silently un-flag contaminated pairs —
    * exactness is the contract).
    *
    * The scale knob is `n` itself: at the n this check is run in
    * practice (8–13), n-grams are near-unique across a corpus, so the
    * gram equi-join is linear in the indexes; a SMALL n over
    * boilerplate-heavy text makes hot grams pair every train doc with
    * every test doc — that blow-up is inherent to the exact semantics
    * at small n, not to this implementation. One shuffled equi-join on
    * the gram hash + one (train_id, test_id) partial+final count.
    *
    * `bloomPrefilter` is the 100 TB shuffle cut: the TEST gram set is
    * small (eval suites), so a bloom filter aggregated from it (a
    * partial+final `bloom_filter_agg` — bytes, riding an in-plan
    * scalar subquery) screens the TRAIN gram stream with
    * `might_contain` BEFORE the shuffle, dropping the overwhelmingly
    * non-colliding majority at the scan. Lossless by construction:
    * bloom filters have no false negatives, and its false positives
    * are discarded by the exact equi-join that follows — the result is
    * bit-identical with the option on or off (spec-pinned), only the
    * shuffled volume changes. The TEST index lineage has two consumers
    * (the bloom aggregate and the join probe); it is materialized once
    * — eager localCheckpoint, hash-partitioned on the gram key — under
    * the size contract below (exchange reuse alone is defeated by the
    * optimizer: column pruning and `InferFiltersFromConstraints`
    * specialize the two copies, so their canonicalized subtrees
    * differ). The contract: test/eval corpora are SMALL relative to
    * train — that is what makes the bloom worthwhile at all, and it is
    * also what bounds the materialization.
    *
    * `bloomExpectedGrams` sizes the filter (default 2^22 — bits scale
    * 8× the estimate via the aggregate's sizing rule, ~2% FPP at the
    * estimate). An UNDER-sized filter stays bit-identical (the exact
    * join discards the extra false positives) but quietly degrades
    * toward pass-through, evaporating the shuffle cut the option
    * exists for — size it at or above the distinct test-gram count.
    * Spark clamps the estimate to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4M) and the bits to `...maxNumBits`; raise those confs in step
    * for larger test corpora.
    */
  def exactNgramDecontam(
      train: DataFrame, test: DataFrame, idCol: String, textCol: String,
      n: Int, partitionCol: Option[String] = None,
      spread: Boolean = true, bloomPrefilter: Boolean = false,
      bloomExpectedGrams: Long = 1L << 22): DataFrame = {
    val ti = shingleIndex(train, idCol, textCol, n, partitionCol,
      spread = spread)
    val si = shingleIndex(test, idCol, textCol, n, partitionCol,
      spread = spread)
    val trainGrams = ti.select(col("k"), col("id").as("train_id"))
    val (screened, testIndex) =
      if (!bloomPrefilter) (trainGrams, si)
      else {
        // the test index has TWO consumers on this path (the bloom
        // aggregate and the join probe) — without care it would
        // scan+shingle the test corpus twice, and exchange REUSE is
        // defeated by the optimizer (column pruning strips `id` below
        // the bloom's copy; InferFiltersFromConstraints mirrors the
        // might_contain predicate onto the probe's copy, so the
        // canonicalized subtrees differ). The index is therefore
        // MATERIALIZED once (eager localCheckpoint, hash-partitioned
        // on the gram key the join wants anyway) — safe by the same
        // contract that makes the bloom worthwhile at all: test/eval
        // corpora are small relative to train, so their index is
        // cheap to hold. The rankEnsemble exception pattern: the
        // multi-consumption is internal to the operator.
        val siShared = si.repartition(col("k")).localCheckpoint(true)
        // bloom_filter_agg/might_contain are internal Catalyst
        // expressions (no SQL registry entry) — built directly, with
        // the bloom riding a scalar subquery INLINE as might_contain's
        // bloom child (its analysis check requires a constant or
        // scalar subquery there, so a materialized column would be
        // rejected)
        import org.apache.spark.sql.GraftSqlBridge
        import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        val bfAgg = siShared.agg(GraftSqlBridge.column(
          new BloomFilterAggregate(GraftSqlBridge.expression(col("k")),
            org.apache.spark.sql.catalyst.expressions.Literal(
              bloomExpectedGrams))
            .toAggregateExpression()).as("bf"))
        (trainGrams.filter(GraftSqlBridge.column(BloomFilterMightContain(
          GraftSqlBridge.expression(graft.plans.Scalars.of(bfAgg)),
          GraftSqlBridge.expression(col("k"))))), siShared)
      }
    screened
      .join(testIndex.select(col("k"), col("id").as("test_id")), Seq("k"))
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Incremental (delta-ingest) n-gram Jaccard dedup: near-dup pairs
    * that TOUCH a newly-arrived batch — new×new plus new×old — without
    * ever self-joining the existing corpus. The production shape for
    * continuous ingestion at 100 TB: the old corpus contributes only
    * (a) its full inverted index on the new docs' prefix keys (a plain
    * equi-join against what is in practice a static, bucketable table)
    * and (b) per-doc compacted arrays for verification; the old×old
    * quadratic term — the overwhelming bulk of a full recompute — is
    * skipped entirely, because those pairs were already found when
    * their docs were themselves the new batch.
    *
    * Losslessness of the one-sided candidate step: J(new, old) >=
    * t implies |overlap| >= ceil(t · max(sz)) >= ceil(t · sz_new), so
    * the new doc's rarity-prefix of length sz_new − ceil(t·sz_new) + 1
    * must contain a shared shingle (pigeonhole — the same argument as
    * [[crossContamination]]'s test-side prefix).
    *
    * An id present in BOTH inputs is an UPDATED document: the new
    * version supersedes the old one (old rows with new-batch ids are
    * dropped up front), so the effective corpus is newDf ∪ (oldDf \
    * new ids) and a doc never verifies against a merged bag of both
    * versions' shingles.
    */
  def incrementalJaccardPairs(
      newDf: DataFrame, oldDf: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      partitionCol: Option[String] = None,
      maxDocFreq: Option[Int] = None,
      charLevel: Boolean = false,
      maxDocFreqRatio: Option[Double] = None,
      spread: Boolean = true,
      oldMaxDocFreq: Option[Int] = None): DataFrame = {
    val ratio =
      if (charLevel && maxDocFreq.isEmpty && maxDocFreqRatio.isEmpty)
        Some(0.15)
      else maxDocFreqRatio
    val oldOnly = oldDf.join(
      newDf.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
    // both indexes materialized once (the [[ngramJaccardPairs]]
    // argument): the candidate path consumes them under hash(k), the
    // verify path under hash(id), so ReuseExchange cannot share the
    // tokenize+explode lineage between them — and the streaming path's
    // parquet-backed indexes get exactly this for free
    val ni =
      shingleIndex(newDf, idCol, textCol, n, partitionCol, charLevel, spread)
        .localCheckpoint(true)
    val oi =
      shingleIndex(oldOnly, idCol, textCol, n, partitionCol, charLevel, spread)
        .localCheckpoint(true)
    incrementalJaccardPairsIndexed(ni, oi, threshold, maxDocFreq, ratio,
      oldMaxDocFreq = oldMaxDocFreq)
  }

  /** The incremental candidate/verify core over PREBUILT (id, k) indexes —
    * the new batch's index `ni` and the old corpus' index `oi` (already
    * excluding ids superseded by the new batch). Split out so the
    * continuous-ingest path ([[graft.streaming.Streaming.ingestDedupBatch]])
    * can feed `oi` from its persisted shingle-index sidecar instead of
    * re-shingling the accumulated corpus every batch — the step that turns
    * per-batch cost from O(corpus) shingling into an equi-join against a
    * static columnar table.
    *
    * `restrictOldSide` (the ingest path's setting): verification reads
    * the OLD index restricted to docs sharing at least one key with the
    * new batch — a provable superset of every candidate's old member
    * (candidates share a prefix key, prefixes are keys). The restriction
    * is two semi-joins against the batch's (small) key set, so the
    * per-doc compaction aggregate ([[docSets]]) shuffles only
    * batch-touching docs instead of the whole corpus index — the term
    * that otherwise makes per-batch cost corpus-proportional. It is a
    * SUPERSET restriction computed from the indexes directly, not from
    * the candidate pairs, so the candidate subtree is never evaluated
    * twice. Leave false for bulk incremental runs where the "new" side
    * is corpus-sized (most old docs are touched anyway and the two
    * semi-joins are pure overhead).
    *
    * `oldMaxDocFreq` — the OLD-side hot-gram cap, the bound the 10x
    * scale probe priced (BENCH_scale round 7: uncapped, candidate mass
    * from corpus-hot grams grows as batch-df x corpus-df — local
    * exponent 1.32 on the ingest parity shape): a gram whose df within
    * the PROBED old index exceeds the cap is dropped from candidate
    * generation (never from verification — Jaccard values are always
    * exact). Recall contract matches the batch operators' `maxDocFreq`:
    * a true pair is missed only if EVERY shared new-prefix gram is
    * that hot — boilerplate by definition. None (default) keeps the
    * lossless behavior the parity gates pin.
    *
    * CONTRACT: `oi` must share no ids with `ni` (both callers
    * anti-join the new batch's ids out of the old side) — the
    * new×new and new×old candidate sets are then disjoint, which is
    * what lets the verify step skip a distinct over their union. */
  private[graft] def incrementalJaccardPairsIndexed(
      ni: DataFrame, oi: DataFrame, threshold: Double,
      maxDocFreq: Option[Int],
      maxDocFreqRatio: Option[Double],
      restrictOldSide: Boolean = false,
      oldMaxDocFreq: Option[Int] = None): DataFrame = {
    val newPrefix = prefixIndex(ni, threshold, maxDocFreq, maxDocFreqRatio)
    // new×new is plain Jaccard over the batch — the lossless length +
    // positional pruning applies; new×old keeps the plain key join
    // (the old side carries no sz/rn, and computing them would cost
    // the very corpus pass this path exists to avoid)
    val nnCands = candidatePairsJaccard(newPrefix, threshold)
    // the old rows probed by the batch's prefix keys; with the cap on,
    // hot keys are screened by their df WITHIN this probed subset
    // (equal to their full old df — a key either matches or not), so
    // the cap costs one keyed count over probed rows, never a pass
    // over the whole old index
    val oldForCands = oldMaxDocFreq match {
      case Some(cap) =>
        val probed = oi.join(newPrefix.select(col("k")).distinct(),
          Seq("k"), "left_semi")
        val kdf = probed.groupBy(col("k"))
          .agg(count(lit(1)).as("__odf"))
        probed.join(
          kdf.filter(col("__odf") <= cap).select(col("k")), Seq("k"))
      case None => oi
    }
    val oldVerify =
      if (!restrictOldSide) oi
      else {
        // capped path: every candidate's old member matched a capped
        // key, so the (tighter) touched set is oldForCands' own ids
        val touchedIds = oldMaxDocFreq match {
          case Some(_) => oldForCands.select(col("id")).distinct()
          case None => oi
            .join(ni.select(col("k")).distinct(), Seq("k"), "left_semi")
            .select(col("id")).distinct()
        }
        oi.join(touchedIds, Seq("id"), "left_semi")
      }
    // slim (id, size) ledger over the old index — the TRUE per-doc
    // shingle counts (all rows of each id, multi-version unions
    // included, exactly [[docSets]]'s sz), feeding the lossless PPJoin
    // LENGTH bound (J >= t forces t·max(sz) <= min(sz); evaluated at
    // t − 0.001, the [[candidatePairsJaccard]] admission band) that
    // prunes new×old candidates before the pair-dedup exchange and
    // before any per-doc ARRAY attaches in verification. ONE slim pass
    // over `oi` (no semi-join lineage — the touched restriction is
    // implicit: the inner join below consults candidate ids only),
    // joined onto the key join's OUTPUT where AQE broadcasts the
    // doc-count-sized ledger from its measured size (falling back to
    // a slim candidate shuffle past broadcast size — same answer) —
    // never an id-exchange of the whole old index on the input side.
    // The old side carries no rn (ranking it would need the
    // corpus-index pass this path exists to avoid — and a write-time
    // rank would be stale under a fresher df order), so the
    // positional bound stays new×new-only; measured at sf0.1 the
    // length bound alone drops 25% of the new×old candidate mass
    // (301k → 227k on the q94 batch shape); measured at the 10×
    // rung it cuts q94 −13..16% end to end.
    val szOld = oi.groupBy(col("id")).agg(count(lit(1)).as("__osz"))
    val ts = math.max(0.0, threshold - 0.001)
    // same explosive-join discipline as [[candidatePairsJaccard]]:
    // new×old candidate fan-out is df_new(k)·df_old(k) per key from a
    // byte-slim input — explicit cores-derived partitioning
    val p = ni.sparkSession.sparkContext.defaultParallelism
    val noCands = oldForCands.select(col("k"), col("id").as("o_id"))
      .repartition(p, col("k"))
      .join(newPrefix.select(col("k"), col("id").as("n_id"),
          col("sz").as("__nsz"))
        .repartition(p, col("k")), Seq("k"))
      .filter(col("o_id") =!= col("n_id"))
      .join(szOld.select(col("id").as("o_id"), col("__osz")), "o_id")
      .filter(col("__osz").cast("double") >= lit(ts) * col("__nsz") &&
        col("__nsz").cast("double") >= lit(ts) * col("__osz"))
      .select(least(col("o_id"), col("n_id")).as("a_id"),
        greatest(col("o_id"), col("n_id")).as("b_id"))
      .distinct()
    // NO distinct over the union: the two candidate sets are DISJOINT
    // by construction — a new×new pair has both ids in `ni`, a new×old
    // pair has exactly one id in `oi`, and both callers anti-join the
    // new batch's ids out of `oi` (incrementalJaccardPairs's oldOnly;
    // ingestDedupBatch's supersede anti-join), so no pair can appear
    // in both and each set is already internally distinct. The removed
    // distinct was a full exchange + aggregate over the whole
    // candidate mass per batch.
    verifyPairs(nnCands.union(noCands),
      ni.union(oldVerify), threshold)
  }

  /** Winnowing-fingerprint near-dup pairs (rolling-hash document
    * fingerprinting — see [[graft.plans.WinnowingFingerprint]]): each
    * doc is sketched to its winnowed k-gram hash set; pairs sharing
    * fingerprints are scored by containment overlap
    * |A∩B| / min(|A|,|B|). Position-independent (catches copied
    * passages, not just whole-document near-dups) and, by the
    * winnowing guarantee, never misses a shared run of
    * >= w + k - 1 characters. Same inverted-index equi-join shape as
    * the other dedup families; `maxDocFreq` prunes boilerplate
    * fingerprints shared by more than that many docs from CANDIDATE
    * GENERATION (scores always come from the full sketch, so the knob
    * is recall-only). Character k-grams are orders of magnitude more
    * repetitive across documents than word shingles — on the test
    * corpus at sf0.1 the hottest 8-gram appears in 77% of docs and the
    * unguarded self-join is ~5.6e8 pair-rows vs ~4.7e6 capped — so
    * unlike the Jaccard family this guard defaults ON; pass None only
    * for corpora known to lack boilerplate.
    */
  def winnowingPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 8, minOverlap: Double = 0.5,
      maxDocFreq: Option[Int] = Some(64),
      spread: Boolean = true): DataFrame = {
    val fp = maybeSpread(df, spread).select(
      col(idCol).as("id"),
      explode(SK.winnowFingerprint(col(textCol), k, w)).as("k"))
    val candIndex = maxDocFreq match {
      case Some(m) =>
        val keep = fp.groupBy("k").agg(count(lit(1)).as("kdf"))
          .filter(col("kdf") <= m).select("k")
        fp.join(keep, "k")
      case None => fp
    }
    val shared = candidatePairs(candIndex)
    val sets = docSets(fp)
    shared
      .join(sets.select(col("id").as("a_id"), col("ks").as("a_ks"),
        col("sz").as("a_sz")), "a_id")
      .join(sets.select(col("id").as("b_id"), col("ks").as("b_ks"),
        col("sz").as("b_sz")), "b_id")
      .withColumn("n_shared",
        SK.sortedIntersectCount(col("a_ks"), col("b_ks")))
      .withColumn("overlap", round(
        col("n_shared").cast("double") / least(col("a_sz"), col("b_sz")), 3))
      .filter(col("overlap") >= minOverlap)
      .select("a_id", "b_id", "overlap")
  }

  /** Embedding near-dup pairs by cosine >= threshold — EXACT, via a
    * triangle-grid all-pairs join (the standard balanced block scheme
    * for distributed similarity joins): rows land in group
    * g = hash(id) mod G; every row is replicated to the G cells
    * {(g, j) | j >= g} ∪ {(i, g) | i <= g} of the upper-triangular
    * G×G grid, and a pair meets in EXACTLY one cell
    * (least(g_a,g_b), greatest(g_a,g_b)). The join is a plain shuffled
    * equi-join on the cell id: no BroadcastNestedLoopJoin, no
    * cartesian, no driver involvement; work is spread evenly over
    * G(G+1)/2 cells and replication is bounded at G per row.
    *
    * Exact low-threshold similarity join is inherently Θ(n²) pair
    * evaluations (dense vectors admit no lossless pruning at e.g.
    * cosine 0.45, and sketch recall there is worse than brute force) —
    * what scales is DISTRIBUTING those pairs, which this shape does.
    * By default the grid auto-sizes from an in-plan corpus count
    * (broadcast one-row aggregate, fully lazy): G = max(8, n/1000)
    * targets ~10⁶ pair evaluations per cell, so cells stay
    * memory-sized as the corpus grows WITHOUT the caller having to
    * remember to retune a knob that silently stops scaling (the grid
    * id G is an ordinary column, so the cell expressions stay the same
    * plan shape either way). Pass `groups` to pin it explicitly. For
    * high thresholds where approximate recall is acceptable, use
    * `Similarity.lshTopK`'s bucketing instead. The per-pair kernel is
    * the fused native [[DotProduct]] with per-row precomputed self-dots
    * (bit-identical to recomputing per pair).
    */
  def embeddingCosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, groups: Option[Int] = None,
      spread: Boolean = true): DataFrame = {
    val base0 = maybeSpread(df, spread)
      .select(col(idCol).as("id"), V.toDouble(col(vecCol)).as("v"))
      .withColumn("ss", DotProduct(col("v"), col("v")))
    // NB the grid-size column is "gn", not "G": analysis is
    // case-insensitive by default, so "G" would capture the row's own
    // grid coordinate "g".
    // grid coordinates and cell ids are LONG throughout: with the
    // auto-sized G = n/1000, int arithmetic (g*gn+j) would overflow at
    // G ≈ 46341 — i.e. ~46M rows, inside the scale this operator
    // advertises — aliasing distinct cells onto wrapped ids
    val base = groups match {
      case Some(g) =>
        require(g > 0, "groups must be positive")
        base0.withColumn("gn", lit(g.toLong))
      case None =>
        val n = df.agg(count(lit(1)).as("n_rows"))
        base0.withColumn("gn",
          greatest(lit(8), ceil(scalarOf(n) / 1000.0)).cast("long"))
    }
    val e = base
      .withColumn("g", pmod(xxhash64(col("id")), col("gn")))
      .withColumn("cell", explode(array_distinct(concat(
        transform(sequence(col("g"), col("gn") - 1),
          j => col("g") * col("gn") + j),
        transform(sequence(lit(0L), col("g")),
          i => i * col("gn") + col("g"))))))
    val a = e.select(col("cell"), col("gn"), col("g").as("a_g"),
      col("id").as("a_id"), col("v").as("a_v"), col("ss").as("a_ss"))
    val b = e.select(col("cell"), col("g").as("b_g"), col("id").as("b_id"),
      col("v").as("b_v"), col("ss").as("b_ss"))
    a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id") &&
        col("cell") === least(col("a_g"), col("b_g")) * col("gn") +
          greatest(col("a_g"), col("b_g")))
      .withColumn("cosine", round(
        DotProduct(col("a_v"), col("b_v")) / (sqrt(col("a_ss")) * sqrt(col("b_ss"))), 4))
      .filter(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }

  /** Auto-size ceiling for [[semanticPairs]]' cell count — see its
    * scaladoc for the regime argument. */
  private[operators] val MaxAutoCells: Int = 2048

  /** SemDeDup-style semantic near-dup pairs (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540 — public literature): k-means
    * the embedding space (the shared [[Similarity.centroidModel]]
    * engine: k-means|| seeding + Lloyd passes, deterministic under
    * `seed`), then compare pairs only WITHIN a cluster and report
    * those with cosine >= `threshold`.
    *
    * The contract vs [[embeddingCosinePairs]]: the exact grid
    * distributes an inherently Θ(n²) pair space; SemDeDup PRUNES it —
    * candidate cost falls to Σ|cell|² ≈ n·cellSize when nCells is
    * sized to n/cellSize, linear in the corpus at fixed cell size.
    * The trade is recall: a duplicate pair split across two cells is
    * unreported (semantic duplicates cluster together, which is the
    * paper's empirical bet; DedupSpec measures the recall on the gate
    * corpus). Every reported pair carries an exactly-computed cosine,
    * so precision is 1 by construction — the reported set is a SUBSET
    * of the exact grid's at the same threshold, never a superset.
    *
    * `nCells` <= 0 auto-sizes to max(4, n/`targetCellSize`) from one
    * corpus count — an unavoidable driver-side integer (it sizes the
    * model arrays), grouped with the model-building actions the
    * centroid engine already runs; everything corpus-sized stays
    * distributed. The auto-size is CLAMPED to `MaxAutoCells` (2048):
    * the centroid model trains driver-locally, and its cost grows
    * with nCells · sample — unclamped, a 10M-vector corpus would
    * auto-size ~20k cells and turn the driver step into the job.
    * Past the clamp (n ≳ MaxAutoCells·targetCellSize ≈ 1M vectors at
    * the defaults) cell sizes grow with n/2048 and the within-cell
    * pair cost bends up accordingly — at that scale pass an explicit
    * `nCells` (accepting the documented driver Lloyd cost) or shard
    * the corpus before pairing; the training COLLECT itself stays
    * bounded regardless ([[Similarity.MaxTrainVectors]]). Cell sizes
    * are data-dependent (k-means cells, not hash buckets): moderate
    * imbalance is AQE-skew-split territory, and the cell histogram is
    * one groupBy away when a corpus needs monitoring.
    *
    * `probes` > 1 soft-assigns every vector to its `probes` nearest
    * cells (multi-probe, the standard recall lever for boundary
    * pairs): candidate cost scales by ≤ probes², and a pair meeting
    * in several shared cells is deduplicated exactly (same rounded
    * cosine in every cell) by a final distinct.
    */
  def semanticPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 0, targetCellSize: Int = 512,
      probes: Int = 1, seed: Long = 42L, lloydIters: Int = 2,
      spread: Boolean = true): DataFrame = {
    require(targetCellSize > 0, "targetCellSize must be positive")
    require(probes >= 1, "probes must be at least 1")
    val c = maybeSpread(df, spread)
      .select(col(idCol).as("id"), V.toDouble(col(vecCol)).as("v"))
    val k =
      if (nCells > 0) nCells
      else math.min(MaxAutoCells.toLong,
        math.max(4L, df.count() / targetCellSize)).toInt
    val centroids = Similarity.centroidModel(c, "id", "v",
      k, seed, lloydIters)
    val assigned = c
      .withColumn("cell",
        explode(SK.nearestCells(col("v"), centroids, math.min(probes, k))))
      .withColumn("ss", DotProduct(col("v"), col("v")))
    val a = assigned.select(col("cell"), col("id").as("a_id"),
      col("v").as("a_v"), col("ss").as("a_ss"))
    val b = assigned.select(col("cell"), col("id").as("b_id"),
      col("v").as("b_v"), col("ss").as("b_ss"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", round(
        DotProduct(col("a_v"), col("b_v")) /
          (sqrt(col("a_ss")) * sqrt(col("b_ss"))), 4))
      .filter(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
    if (probes > 1) pairs.distinct() else pairs
  }

  /** Duplicate-span scrub (Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499 — the
    * EXACTSUBSTR variant realized at word-n-gram granularity): a token
    * position is duplicated iff it is covered by at least one n-gram
    * of its document that also occurs in ANOTHER document, and the
    * scrubbed text is the original with all duplicated positions
    * excised. Unlike the doc-level dedup families (which drop or
    * reweight whole documents), this REWRITES documents, keeping their
    * unique remainder — the treatment for boilerplate stitched into
    * otherwise-novel pages.
    *
    * Spark spelling, all keyed and per-doc bounded:
    *   1. positional gram instances via [[SK.wordNgrams]] + posexplode
    *      (array index IS the start position);
    *   2. gram document-frequency on the per-doc DISTINCT gram set —
    *      partial+final count on the gram key, `>= 2` keeps only
    *      corpus-duplicated grams (their count is bounded by the
    *      corpus, not the token stream);
    *   3. duplicated START positions per doc: instance-level equi-join
    *      on the gram, collect_set per doc (bounded by doc length —
    *      the per-document-in-memory contract shared with every
    *      text operator here);
    *   4. coverage + excision as pure codegen'd ARRAY expressions on
    *      the id-keyed join-back: covered = ∪ [s, s+n-1], kept = the
    *      positions outside it, scrubbed = concat_ws over kept — no
    *      token-level explode ever reaches a shuffle, no window.
    *
    * Conscious cost trade: the gram explode lineage is consumed TWICE
    * (once for the gram-df aggregate, once for the instance join), so
    * the O(len) text shingling runs two passes — the repo's no-persist
    * stance (nothing cached that an executor loss would strand, same
    * as the prefix-index dedup family, which re-derives its index the
    * same way). A caller scrubbing one corpus many times should
    * persist its own `(id, gstart, gram)` projection first.
    *
    * Output: (id, n_tokens, n_dup_tokens, scrubbed). Docs shorter than
    * n have no grams and pass through unscrubbed.
    */
  def dupSpanScrub(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      spread: Boolean = true): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val grams = maybeSpread(base, spread).select(col("id"),
      posexplode(SK.wordNgrams(col("text"), n)).as(Seq("gstart", "gram")))
    val dupGrams = grams.select("gram", "id").distinct()
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= 2).select("gram")
    val dupStarts = grams.join(dupGrams, Seq("gram"))
      .groupBy("id").agg(collect_set(col("gstart")).as("starts"))
    base.join(dupStarts, Seq("id"), "left_outer")
      .withColumn("tk", split(col("text"), " "))
      .withColumn("covered", array_distinct(flatten(transform(
        coalesce(col("starts"), array().cast("array<int>")),
        s => sequence(s, s + lit(n - 1))))))
      .select(
        col("id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(col("covered")).cast("long").as("n_dup_tokens"),
        concat_ws(" ", filter(col("tk"),
          (t, i) => !array_contains(col("covered"), i))).as("scrubbed"))
  }

  /** Corpus snapshot diff — the data-versioning primitive behind
    * incremental re-training decisions ("what changed since the last
    * crawl?"): classifies every document id across two snapshots as
    * `added` (new only), `removed` (old only), `changed` (both, exact
    * content differs) or `unchanged`. Content comparison is by md5 of
    * the EXACT text (no normalization — diff answers "did the bytes
    * change", dedup's normalized fingerprint answers "is it the same
    * content"; conflating them would hide whitespace/punct edits).
    *
    * Scale shape: each side is projected to (id, md5) before the
    * single full-outer equi-join on id — the text column never
    * shuffles, and the join is the sort-merge/hash shuffle on the id
    * key that any diff must pay. Output: `id`, `status`, `old_fp`,
    * `new_fp` (null where the side is absent).
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def fps(df: DataFrame, side: String) = df.select(
      col(idCol).as(s"${side}_id"),
      md5(col(textCol).cast("binary")).as(s"${side}_fp"))
    fps(oldDf, "old").join(fps(newDf, "new"),
        col("old_id") === col("new_id"), "full_outer")
      .select(
        coalesce(col("old_id"), col("new_id")).as("id"),
        when(col("old_id").isNull, "added")
          .when(col("new_id").isNull, "removed")
          // null-SAFE compare: a text that changed between NULL and
          // non-NULL must read as 'changed', not fall through a
          // three-valued =!= into 'unchanged'
          .when(!(col("old_fp") <=> col("new_fp")), "changed")
          .otherwise("unchanged").as("status"),
        col("old_fp"), col("new_fp"))
  }
}
