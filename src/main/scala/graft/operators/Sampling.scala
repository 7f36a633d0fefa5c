package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-stable dataset splitting and sampling for
  * training pipelines. Assignment is a pure function of the key — no
  * RNG state, no partition dependence — so a row lands in the same
  * split on every engine, every run, and at any scale (the property
  * that makes held-out sets trustworthy across pipeline re-runs).
  *
  * Mechanics: the first 4 hex chars of md5(key) are compared as a
  * string against a threshold. Fixed-width lowercase hex compares
  * lexicographically in numeric order, and md5 is identical everywhere,
  * so the rule ports to any SQL engine verbatim (the oracle gate relies
  * on exactly this). Granularity: 1/65536.
  */
object Sampling {

  private def bucket(keyCol: Column): Column =
    substring(md5(keyCol.cast("string")), 1, 4)

  /** ceil(frac · n) in exact DECIMAL arithmetic. The double spelling
    * `ceil(lit(frac) * n)` can overshoot (0.07d * 100 =
    * 7.000000000000001 → ceil 8) while an engine computing in decimal
    * (DuckDB; SQL literals) gets 7 — the rank-contract operators here
    * promise engine-exact counts, so the count itself must be exact. */
  private def exactCeil(frac: Double, n: Column): Column =
    ceil(lit(new java.math.BigDecimal(frac.toString)) * n)

  /** True for the ~`frac` of keys whose bucket falls below the
    * threshold. `frac` rounding to the full 65536 buckets means "all
    * rows": there is no 4-hex threshold above "ffff", so that case is
    * a literal true (a "ffff"-threshold compare would silently strip
    * the 1/65536 of keys whose bucket IS "ffff"). */
  private def selected(keyCol: Column, frac: Double): Column = {
    require(frac >= 0.0 && frac <= 1.0, "fraction must be in [0,1]")
    val t = math.round(frac * 65536).toInt
    if (t >= 65536) lit(true)
    else bucket(keyCol) < lit(f"$t%04x")
  }

  /** Adds a `split` column: "train" for ~`trainFrac` of rows (by
    * md5-bucket of `keyCol`), "test" for the rest. */
  def hashSplit(df: DataFrame, keyCol: String, trainFrac: Double): DataFrame =
    df.withColumn("split",
      when(selected(col(keyCol), trainFrac), "train").otherwise("test"))

  /** Leakage-safe train/test split: the split unit is the NEAR-DUP
    * CLUSTER, not the document. A per-document [[hashSplit]] puts two
    * near-identical documents on opposite sides of the split with
    * probability 2·f·(1-f) each — held-out "unseen" data the model has
    * effectively trained on, the contamination failure mode doc-level
    * splitting cannot avoid. Here every connected component of the
    * caller's near-dup pair graph (`pairs`: two id columns, e.g. from
    * [[Dedup.ngramJaccardPairs]] / [[Dedup.minhashLshPairs]]) is
    * assigned atomically by the md5-bucket of its representative
    * (component min id; singleton documents represent themselves), so
    * NO pair of the graph ever straddles the split — by construction,
    * not by audit.
    *
    * Scale shape: [[ConnectedComponents]] is |E|-bounded alternating
    * star rounds; the assignment join-back is one equi-join on the doc
    * id (left side keeps the corpus partitioning; the component frame
    * is cluster-membership-sized, broadcast when small). Output: input
    * columns + `cluster_rep` + `split`.
    */
  def leakageSafeSplit(
      df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "a_id", bCol: String = "b_id",
      trainFrac: Double = 0.8): DataFrame = {
    // both CC output columns ride sigil names: a caller whose frame
    // already has a 'component' column (plausible in dedup pipelines)
    // must not trip an ambiguous-reference failure on the join-back
    val comp = ConnectedComponents(pairs.select(col(aCol), col(bCol)),
        aCol, bCol)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.join(comp, col(idCol) === col("__cc_id"), "left")
      .withColumn("cluster_rep", coalesce(col("__cc_comp"), col(idCol)))
      .drop("__cc_id", "__cc_comp")
      .withColumn("split",
        when(selected(col("cluster_rep"), trainFrac), "train")
          .otherwise("test"))
  }

  /** Deterministic ~`frac` sample of rows by md5-bucket of `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, frac: Double): DataFrame =
    df.filter(selected(col(keyCol), frac))

  /** Deterministic exact-`k` sample: the `k` rows whose md5(key) sorts
    * first — a content-stable "give me exactly 10k docs to eyeball /
    * eval on" that returns the SAME rows on every engine, run, and
    * cluster size (unlike `df.limit(k)`, which is partition-order
    * dependent, or RNG sampling, which is seed-and-partitioning
    * dependent). Plans as TakeOrderedAndProject: per-partition heap of
    * k + driver merge, never a global sort. */
  def takeDeterministic(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.orderBy(md5(col(keyCol).cast("string")), col(keyCol)).limit(k)

  /** Per-stratum exact global rank without a stratum-sized window: the
    * [[Packing.packSequences]] two-phase prefix rank, applied WITHIN
    * each stratum. The within-stratum sort key is md5(key) — already
    * uniform — so range buckets fall out of the hash prefix for free
    * (first 2 hex chars; bucket order is a prefix of the md5 order by
    * construction, no boundary sketch needed):
    *
    *   1. `row_number` within (stratum, bucket) — parallel across 256
    *      buckets per stratum, so a single giant stratum spreads over
    *      256 tasks instead of serializing into one;
    *   2. a (stratum, bucket) count ledger (256·|strata| rows; strata
    *      are languages/sources — small by nature — so the ledger is
    *      model-sized and broadcast) carries each bucket's base rank
    *      and the stratum total via windows over the LEDGER, never the
    *      corpus.
    *
    * Emits `__rk` (1-based rank in the stratum's md5 order, key as
    * tie-break) and `__n` (stratum size); callers filter and drop.
    *
    * NULL-key rows are EXCLUDED before ranking — the module-wide null
    * policy ([[weightedTake]] documents why): a null key has no
    * content identity, so no deterministic content-stable order
    * exists for it (any two null-key rows tie on every sort key, and
    * rank among ties is partition-order dependent — the
    * nondeterminism these samplers exist to eliminate). `__n` counts
    * rankable rows only; callers who need null-key rows kept should
    * coalesce the key to a surrogate before sampling. */
  private def withStratumRank(
      df: DataFrame, keyCol: String, stratumCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .filter(col(keyCol).isNotNull)
      .withColumn("__h", md5(col(keyCol).cast("string")))
      .withColumn("__bucket", substring(col("__h"), 1, 2))
    val inBucket = Window.partitionBy(col(stratumCol), col("__bucket"))
      .orderBy(col("__h"), col(keyCol))
    val byStratum = Window.partitionBy(col(stratumCol))
      .orderBy(col("__bucket"))
    // the STRATUM join key stays NULL-SAFE (<=>): a null stratum is a
    // valid window partition in the old single-window spelling, and a
    // plain equi-join would silently drop its rows. (Null KEYS are
    // excluded above, so the bucket column is never null — but <=> is
    // kept on both keys so the join can never re-grow a silent-drop
    // path if the exclusion moves.)
    val ledger = keyed.groupBy(col(stratumCol), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__base", coalesce(
        sum(col("__cnt")).over(
          byStratum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n",
        sum(col("__cnt")).over(byStratum.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(stratumCol).as("__ls"), col("__bucket").as("__lb"),
        col("__base"), col("__n"))
    keyed
      .withColumn("__rbk", row_number().over(inBucket))
      .join(broadcast(ledger),
        col(stratumCol) <=> col("__ls") && col("__bucket") <=> col("__lb"))
      .drop("__ls", "__lb")
      .withColumn("__rk", col("__base") + col("__rbk"))
  }

  /** Exact per-stratum deterministic sampling: within each stratum,
    * rows rank by md5(key) (content-stable total order; key as
    * tie-break) and the first ceil(frac · stratum_size) survive. Where
    * threshold sampling is proportional only in expectation, every
    * stratum here contributes EXACTLY its share — what a training-mix
    * builder needs when balancing languages or sources.
    *
    * Shape: [[withStratumRank]]'s two-phase rank — parallel across 256
    * hash buckets per stratum, so there is no giant-stratum
    * serialization; the only broadcast is the model-sized bucket
    * ledger. */
  def stratifiedSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "fraction must be in [0,1]")
    withStratumRank(df, keyCol, stratumCol)
      .filter(col("__rk") <= exactCeil(frac, col("__n")))
      .select(df.columns.map(col): _*)
  }

  /** Exact stratified three-way split: every stratum is divided
    * train/val/test at EXACT cumulative boundaries — rank r in the
    * stratum's content-stable md5 order lands in train iff
    * `r <= ceil(cutTrain·n_s)`, in val iff
    * `r <= ceil(cutVal·n_s)`, else test — so each stratum contributes
    * exactly its share to every split (a hash-threshold split like
    * [[hashSplit]] is proportional only in expectation, and its
    * per-stratum shares wander; an eval set where one language is
    * accidentally 2× under-sampled mis-ranks multilingual models).
    *
    * `cutTrain` / `cutVal` are CUMULATIVE boundaries (e.g. 0.8 and
    * 0.9 = 80/10/10), taken as literals into exact decimal arithmetic
    * ([[exactCeil]]) — callers must not pass computed doubles like
    * `0.8 + 0.1` (float noise would shift a boundary rank; the
    * engines would disagree). Re-seedable; null keys drop (module
    * policy); a null stratum is its own stratum. Same two-phase
    * bucketed rank as [[stratifiedSample]] — no giant-stratum window,
    * broadcast bucket ledger only. Adds `split` to `df`'s columns. */
  def stratifiedSplit(
      df: DataFrame, keyCol: String, stratumCol: String,
      cutTrain: Double, cutVal: Double, seed: String = ""): DataFrame = {
    require(cutTrain > 0.0 && cutTrain <= cutVal && cutVal <= 1.0,
      "need 0 < cutTrain <= cutVal <= 1")
    val out = df.columns.map(col) :+ col("split")
    df
      .withColumn("__sk",
        concat(lit(seed), lit(":"), col(keyCol).cast("string")))
      .transform(withStratumRank(_, "__sk", stratumCol))
      .withColumn("split",
        when(col("__rk") <= exactCeil(cutTrain, col("__n")), "train")
          .when(col("__rk") <= exactCeil(cutVal, col("__n")), "val")
          .otherwise("test"))
      .select(out: _*)
  }

  /** Deterministic stratum-proportional interleave key: position
    * every stratum's rows uniformly across the whole training order,
    * so any contiguous slice (a shard, an epoch prefix, a curriculum
    * stage) carries each stratum at its corpus share — the
    * "interleave languages before writing shards" discipline; a plain
    * [[shuffleOrder]] only gets this in expectation, and source-
    * clustered file order doesn't get it at all.
    *
    * Each row's key is `((2·r − 1) · N) div (2·n_s)` — the r-th of
    * n_s stratum rows lands at the (2r−1)/(2·n_s) quantile of [0, N),
    * the exact integral midpoint-quantile placement — with r the
    * stratum's content-stable, re-seedable md5 rank and (n_s, N) from
    * the rank ledger and a one-row scalar. Consumers sort by
    * `(interleave_key, stratum, r)` — a total order; the key alone
    * ties only across strata, by construction at most #strata rows
    * per key. Proportionality bound: in any prefix of the full order
    * a stratum's count deviates from proportional by < 1 + its
    * per-key collision share (spec-pinned ±1 per stratum on the
    * integral grid). Adds `interleave_key` and `stratum_rank`; one
    * two-phase rank, one scalar, zero corpus-wide windows. */
  def interleaveOrder(
      df: DataFrame, keyCol: String, stratumCol: String,
      seed: String = ""): DataFrame = {
    val total = graft.plans.Scalars.of(
      df.filter(col(keyCol).isNotNull).agg(count(lit(1)).as("n")))
    val out = df.columns.map(col) ++
      Seq(col("interleave_key"), col("stratum_rank"))
    df
      .withColumn("__sk",
        concat(lit(seed), lit(":"), col(keyCol).cast("string")))
      .transform(withStratumRank(_, "__sk", stratumCol))
      // NOT "__N": Spark resolution is case-insensitive, so a column
      // differing from the kernel's "__n" only in case would silently
      // REPLACE it (measured: the key degenerated to rk - 1)
      .withColumn("__tot", total)
      .withColumn("interleave_key",
        expr("((2 * `__rk` - 1) * `__tot`) div (2 * `__n`)"))
      .withColumn("stratum_rank", col("__rk"))
      .select(out: _*)
  }

  /** Exact-share training-mix sampling: per-stratum sampling fractions
    * (e.g. per-language or per-source mix ratios), each stratum
    * contributing EXACTLY ceil(frac_s · n_s) rows chosen by the
    * content-stable md5 order — [[stratifiedSample]] generalized from
    * one fraction to a mix specification. Strata absent from the map
    * get `defaultFrac` (0.0 = drop unlisted strata, the usual mix-spec
    * reading). Same two-phase shape, same giant-stratum safety.
    */
  def mixSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      fracs: Map[String, Double],
      defaultFrac: Double = 0.0): DataFrame = {
    (fracs.values ++ Seq(defaultFrac)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, "fractions must be in [0,1]"))
    // the stratum's share, as an exact-decimal column expression
    val fracCol = fracs.foldLeft(
      lit(new java.math.BigDecimal(defaultFrac.toString))) {
      case (acc, (s, f)) =>
        when(col(stratumCol) === s,
          lit(new java.math.BigDecimal(f.toString))).otherwise(acc)
    }
    withStratumRank(df, keyCol, stratumCol)
      .filter(col("__rk") <= ceil(fracCol * col("__n")))
      .select(df.columns.map(col): _*)
  }

  /** Exact-COUNT per-stratum sampling: the first `counts(stratum)`
    * rows of each stratum's content-stable md5 order (strata absent
    * from the map contribute nothing; a count above the stratum size
    * takes the whole stratum). The integral-count complement of
    * [[mixSample]]'s fraction spec — what a temperature/α-weighted
    * training-mix builder computes (per-stratum take counts from a
    * model-sized share calculation) and then needs realized exactly.
    * `counts` is model-sized by contract (#strata entries — languages
    * or sources). Same two-phase rank shape, same giant-stratum
    * safety. */
  def takePerStratum(
      df: DataFrame, keyCol: String, stratumCol: String,
      counts: Map[String, Long]): DataFrame = {
    counts.values.foreach(k =>
      require(k >= 0, "per-stratum counts must be non-negative"))
    val kCol = counts.foldLeft(lit(0L)) { case (acc, (s, k)) =>
      when(col(stratumCol) === s, lit(k)).otherwise(acc)
    }
    withStratumRank(df, keyCol, stratumCol)
      .filter(col("__rk") <= kCol)
      .select(df.columns.map(col): _*)
  }

  /** Deterministic WEIGHTED exact-k sample without replacement
    * (Efraimidis & Spirakis, "Weighted random sampling with a
    * reservoir", IPL 2006 — realized portably): each row draws the
    * sampling key min over j in 1..w of md5(key ':' j), where w =
    * clamp(`weightCol`, 1, `maxWeight`). The minimum of w iid uniforms
    * is Beta(1, w)-distributed, so ascending order by that min is
    * EXACTLY the ES u^(1/w) descending order — a row with twice the
    * weight is twice as likely to make the cut — but computed entirely
    * in fixed-width lowercase-hex string space: no float `pow`/`ln`
    * whose last-ulp engine differences could flip a rank. The w
    * replica hashes ride ONE `transform(sequence(...))` column
    * expression per row (no explode, no extra shuffle); selection
    * plans as TakeOrderedAndProject (per-partition heap of k + driver
    * merge, never a global sort). `maxWeight` bounds the per-row hash
    * work; weights above it saturate (documented contract, not a
    * silent drop).
    *
    * Weight contract: the replica count is integral, so a fractional
    * weight is ROUNDED half-up (2.9 → 3, 2.4 → 2) before clamping to
    * [1, maxWeight] — truncation would silently bias fractional
    * weights down a full replica. Rows with a NULL `keyCol` are
    * dropped before ranking: a null key has no content identity to
    * hash, and engines disagree on where null sort keys rank (Spark
    * nulls-first would ALWAYS select them; DuckDB nulls-last never
    * would), so excluding them is the only portable reading.
    */
  def weightedTake(
      df: DataFrame, keyCol: String, weightCol: Column, k: Int,
      maxWeight: Int = 64): DataFrame = {
    require(k >= 0, "k must be non-negative")
    require(maxWeight >= 1, "maxWeight must be at least 1")
    val w = least(lit(maxWeight.toLong),
      greatest(lit(1L), round(weightCol.cast("double")).cast("long")))
    val sk = array_min(transform(sequence(lit(1L), w), j =>
      md5(concat(col(keyCol).cast("string"), lit(":"), j.cast("string")))))
    df.filter(col(keyCol).isNotNull)
      .withColumn("__wk", sk)
      .orderBy(col("__wk"), col(keyCol))
      .limit(k)
      .drop("__wk")
  }

  /** Corpus-relative quality gating: drop exactly the bottom
    * ceil(frac · n) rows by (`scoreCol`, `tieCol`) rank — "cut the
    * worst decile" without ever comparing against an interpolated
    * float threshold (whose last-ulp differences across engines make
    * boundary rows nondeterministic; rank + a unique tie-break is
    * portable exactly).
    *
    * The r6.2 spelling is THRESHOLD-BASED: only the exact k-th
    * smallest (score, tie) tuple (k = ceil(frac · n)) is computed —
    * over a SLIM (score, tie) projection, never the full rows — and
    * the result is a plain `df.filter(tuple > kth)`. The full corpus
    * is therefore NEVER shuffled or window-sorted (the r6.0 spelling
    * shuffled every row, text payloads included, into range buckets);
    * the output preserves the input's partitioning, so a downstream
    * consumer sees a filter, not an exchange. The k-th tuple itself
    * is found without a corpus-sized single-partition window via the
    * [[Packing.packSequences]] two-phase trick on the slim rows:
    *
    *   1. an in-plan `approx_percentile` sketch over a deterministic
    *      hash-sample yields `nBuckets`-1 RANGE boundaries (a scalar
    *      subquery — no driver action). Bucket order == score order by
    *      construction; sketch and sample error move rows between
    *      ADJACENT buckets but the per-bucket counts below are exact,
    *      so placement only affects balance, never the result;
    *   2. the slim projection is exchanged ONCE on its range bucket;
    *      both the bucket-count ledger (a one-row (bucket -> count)
    *      map scalar subquery, <= nBuckets+1 entries) and the
    *      within-bucket `row_number` window hang off that SAME
    *      exchange, so exchange reuse evaluates the score expression
    *      once for both;
    *   3. the row whose global rank (O(nBuckets) prefix walk of the
    *      ledger map + within-bucket rank) equals k becomes a one-row
    *      scalar subquery; the main plan compares each row's
    *      (score, tie) struct against it (nulls-first struct order ==
    *      the rank order). k = 0 (frac too small to drop anything)
    *      yields an EMPTY subquery → null → keep-all.
    *
    * Tie contract: `tieCol` must be row-unique (the module-wide key
    * convention — doc ids). Rows DUPLICATED on (score, tie) have no
    * defined rank order among themselves (the old row_number spelling
    * broke such ties by partition order — nondeterministic); under
    * the threshold spelling every copy equal to the k-th tuple drops
    * together, so a duplicated boundary tuple can over-drop. Unique
    * ties make the cut exact: exactly ceil(frac · n) rows go.
    *
    * Degenerate distributions (one score value dominating) collapse
    * adjacent boundaries and that value's rows land in one bucket —
    * the per-bucket sort degrades toward the single-task spelling for
    * exactly those rows (spillable, inherent, and now over SLIM rows
    * only: equal scores are one rank range). Null scores bucket first,
    * matching Spark's nulls-first ascending order.
    */
  def dropBottomFraction(
      df: DataFrame, scoreCol: String, tieCol: String,
      frac: Double, nBuckets: Int = 32): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "fraction must be in [0,1]")
    require(nBuckets >= 2, "nBuckets must be at least 2")
    // the range-bucketing casts the score to double for the boundary
    // sketch — a non-numeric orderable score (date, string) would
    // either fail analysis or silently collapse every row into one
    // bucket (cast → null), resurrecting the single-task sort this
    // spelling exists to avoid. Fail loudly instead; non-numeric
    // scores should be mapped to a numeric rank by the caller. The
    // lookup is case-INsensitive like Spark's own column resolution
    // (a case-variant name must not trip an unrelated error here).
    df.schema.fields.find(_.name.equalsIgnoreCase(scoreCol))
      .map(_.dataType) match {
      case Some(_: org.apache.spark.sql.types.NumericType) | None => ()
      case Some(t) => throw new IllegalArgumentException(
        s"dropBottomFraction needs a NUMERIC score column; " +
          s"'$scoreCol' is ${t.simpleString}")
    }
    import org.apache.spark.sql.expressions.Window
    val score = col(scoreCol)
    // Boundary sketch over a DETERMINISTIC ~6% hash-sample of rows (on
    // the tie column, so the score expression is evaluated only for
    // sampled rows): boundaries only balance the buckets — per-bucket
    // counts below are exact, so neither sketch error nor sample error
    // can ever change the result, only skew the bucket sizes. (The r5
    // full-input sketch was one of three full score evaluations; the
    // r6 bench showed q63's cost at sf0.1 is stage overhead + score
    // evaluation, so both are minimized: two full evaluations total —
    // the ledger and the rank shuffle — and the sketch rides the
    // cheap sampled scan. An empty sample, possible only on tiny
    // inputs, degrades to one bucket — exact, just unbalanced.)
    val probs = array((1 until nBuckets)
      .map(i => lit(i.toDouble / nBuckets)): _*)
    val bndAgg = df
      .filter(pmod(xxhash64(col(tieCol)), lit(16)) === 0)
      .agg(percentile_approx(score.cast("double"), probs, lit(100)).as("b"))
    // SLIM projection: only (score, tie) rides the rank machinery —
    // the text/payload columns never shuffle. One exchange on the
    // range bucket feeds BOTH the ledger aggregate and the rank
    // window (identical child ⇒ exchange reuse ⇒ the score
    // expression is evaluated once for the pair of subqueries).
    val slim = df
      .select(score.as("__s"), col(tieCol).as("__t"))
      .withColumn("__bnds", graft.plans.Scalars.of(bndAgg))
      .withColumn("__bucket",
        when(col("__s").isNull, lit(-1)).otherwise(when(col("__bnds").isNull,
          lit(0)).otherwise(
          size(filter(col("__bnds"), b => b <= col("__s").cast("double"))))))
      .drop("__bnds")
      .repartition(col("__bucket"))
    val inBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col("__s"), col("__t"))
    // rank AND per-bucket count ride the same window pass (same
    // partitioning + ordering → one distribution, no extra exchange;
    // the unbounded count buffers per bucket — spillable, slim rows)
    val ranked = slim
      .withColumn("__rk", row_number().over(inBucket))
      .withColumn("__cnt", count(lit(1)).over(
        inBucket.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // The bucket-count ledger is ONE one-row scalar subquery — a
    // (bucket -> count) map plus the total — DERIVED FROM the ranked
    // output (each bucket's rk==1 row carries its count), not from a
    // separate aggregate over `slim`: that way the ledger's plan and
    // the k-th row's plan share an IDENTICAL exchange+window prefix,
    // so exchange reuse computes the slim shuffle once for both. (An
    // independent `slim.groupBy(bucket).count()` looks cheaper, but
    // column pruning narrows its exchange to just `__bucket`, the
    // plans stop canonicalizing equal, and the whole scan + score
    // evaluation runs twice — measured at +0.5 s on q63 at sf0.1.)
    val ledgerAgg = ranked
      .filter(col("__rk") === 1)
      .agg(
        map_from_entries(collect_list(
          struct(col("__bucket"), col("__cnt")))).as("m"),
        sum(col("__cnt")).as("total"))
      // scalar subqueries are single-column: pack (map, total) in a struct
      .select(struct(col("m"), col("total")).as("s"))
    val ledger = graft.plans.Scalars.of(ledgerAgg)
    // exactly ONE slim row has global rank k (ranks are a permutation
    // of 1..n), so this subquery is one-row by construction; k = 0
    // matches nothing → scalar null → keep-all below.
    //
    // The base-rank prefix walk over the ledger map is ONE `aggregate`
    // HOF referencing the ledger exactly once. Two traps shaped this
    // spelling: (a) subquery expressions are rejected ANYWHERE inside
    // a higher-order function, so the scalar is materialized into a
    // column first — AFTER the rank window, so the per-row map copy
    // exists only in the streamed projection feeding the filter,
    // never in the exchange or the sort buffer; (b) the r6.0 unrolled
    // walk carried nBuckets+1 COPIES of the subquery expression, and
    // every copy is re-analyzed and re-planned per run — ~60 ms of
    // driver planning per term, 2.2 s of q63's wall at nBuckets=32.
    val kthAgg = ranked
      .withColumn("__ledger", ledger)
      .filter(
        aggregate(
          map_entries(col("__ledger").getField("m")), lit(0L),
          (acc, e) => acc + when(e.getField("key") < col("__bucket"),
            e.getField("value")).otherwise(lit(0L)))
          + col("__rk") ===
          exactCeil(frac, col("__ledger").getField("total")))
      .select(struct(col("__s"), col("__t")).as("kth"))
    val kth = graft.plans.Scalars.of(kthAgg)
    // struct comparison orders fields left-to-right with null fields
    // first — exactly the rank order (score nulls-first, then tie), so
    // `tuple > kth` reproduces "global rank > k" without ranking the
    // full rows. The left struct is never null, so the comparison is
    // null exactly when kth is (k = 0, keep-all) — coalesce(…, true)
    // covers that case with the subquery referenced ONCE (a separate
    // `kth.isNull` term would carry a second copy of the subquery
    // expression, re-planned per run; trap (b) above). The result is
    // a pure filter: no corpus exchange, no corpus window, input
    // partitioning preserved.
    df.filter(coalesce(
      struct(score.as("__s"), col(tieCol).as("__t")) > kth, lit(true)))
  }

  /** Per-stratum QUALITY quota: within each stratum (source / domain /
    * language), keep only the `k` best rows by (`scoreCol` DESC,
    * `tieCol` ASC) — the per-domain cap every crawl-derived corpus
    * applies so that no single domain dominates the training mix
    * (cf. the host-level caps in Gopher's and FineWeb's pipelines,
    * public in Rae 2021 §A.1.1 / Penedo 2024 §3.2).
    *
    * [[takePerStratum]] caps by CONTENT-HASH rank (a fair random
    * quota); this ranks by an explicit quality score, which breaks the
    * md5 trick there — hash-prefix buckets are not score-ordered. The
    * scale spelling is the classic salted two-pass top-k instead:
    *
    *   1. rank within (stratum, salt) — `salts` parallel tasks per
    *      stratum, so a giant stratum never serializes into one task —
    *      and keep each salt's top `k`;
    *   2. re-rank the ≤ salts·k survivors per stratum (model-sized by
    *      construction) and keep the true top `k`.
    *
    * Pass 1 is lossless for pass 2: a stratum's true top-k rows each
    * rank ≤ k within their own salt, so none is dropped early.
    * Determinism: `tieCol` must be row-unique (module convention);
    * null scores rank LAST (worst), null `tieCol` rows are dropped
    * (module-wide null-key policy — see [[weightedTake]]). */
  def topKPerStratum(
      df: DataFrame, stratumCol: String, scoreCol: String,
      tieCol: String, k: Int, salts: Int = 64): DataFrame = {
    require(k >= 0, "k must be non-negative")
    require(salts >= 1, "salts must be at least 1")
    import org.apache.spark.sql.expressions.Window
    val rankOrder = Seq(col(scoreCol).desc_nulls_last, col(tieCol))
    val pass1 = Window
      .partitionBy(col(stratumCol), col("__salt")).orderBy(rankOrder: _*)
    val pass2 = Window.partitionBy(col(stratumCol)).orderBy(rankOrder: _*)
    df.filter(col(tieCol).isNotNull)
      .withColumn("__salt", pmod(xxhash64(col(tieCol)), lit(salts)))
      .withColumn("__r1", row_number().over(pass1))
      .filter(col("__r1") <= k)
      .withColumn("__r2", row_number().over(pass2))
      .filter(col("__r2") <= k)
      .select(df.columns.map(col): _*)
  }

  /** Deterministic negative sampling for contrastive training
    * (word2vec / SimCLR-style random negatives — Mikolov 2013 §2.2,
    * public): per anchor, `k` pseudo-random DIFFERENT-label items,
    * drawn by ranking md5(seed:anchor:item) — content-stable (every
    * engine, run and cluster size draws the same negatives) and
    * re-seedable (a new `seed` per epoch gives an independent draw),
    * the [[shuffleOrder]] determinism contract applied to pair
    * sampling. The complement of [[Similarity.tripletMine]]: that
    * mines the HARDEST negative, this draws the unbiased background
    * sample the loss also needs.
    *
    * Scale shape: the anchor side is broadcast (model-sized by
    * contract — O(10³) anchors per pass, the tripletMine sharding
    * rule), candidates stream map-side, and the per-anchor draw is
    * [[topKPerStratum]]'s salted two-pass top-k (no anchor-sized
    * window partition ever serializes). Null labels never pair
    * (conservative; the module null-key policy). */
  def negativeSample(
      anchors: DataFrame, aIdCol: String, aLblCol: String,
      items: DataFrame, iIdCol: String, iLblCol: String,
      k: Int, seed: String = "", salts: Int = 64): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val a = anchors.select(col(aIdCol).as("anchor_id"),
      col(aLblCol).as("__albl"))
    val cand = items
      .select(col(iIdCol).as("neg_id"), col(iLblCol).as("__ilbl"))
      .crossJoin(broadcast(a))
      .filter(col("__albl") =!= col("__ilbl"))
      .withColumn("__h", md5(concat_ws(":", lit(seed),
        col("anchor_id"), col("neg_id"))))
    topKPerStratum(cand, "anchor_id", "__h", "neg_id", k, salts)
      .select(col("anchor_id"), col("neg_id"))
  }

  /** Deterministic GLOBAL training-order shuffle: adds `shuffle_pos`
    * (0-based, a permutation of 0..n-1) ranking rows by
    * md5(seed ':' key) — the "shuffle the corpus before writing
    * training shards" step, made content-stable so every engine, run,
    * and cluster size produces the SAME order, and re-seedable so each
    * epoch gets an independent order from the same corpus.
    *
    * Shape: [[withStratumRank]]'s two-phase rank under a constant
    * stratum — rank within 256 md5-prefix buckets in parallel, add a
    * broadcast 256-row ledger of bucket base offsets; no global sort,
    * no single-task window. Null-key rows are dropped (module
    * null-key policy). */
  def shuffleOrder(
      df: DataFrame, keyCol: String, seed: String = ""): DataFrame = {
    val out = df.columns.map(col) :+ col("shuffle_pos")
    df
      // concat (not concat_ws): a null key must stay null so the
      // rank's null-key exclusion sees it — concat_ws would fold every
      // null key to the same surrogate, an undefined-order tie
      .withColumn("__sk",
        concat(lit(seed), lit(":"), col(keyCol).cast("string")))
      .withColumn("__all", lit("all"))
      .transform(withStratumRank(_, "__sk", "__all"))
      .withColumn("shuffle_pos", col("__rk") - 1)
      .select(out: _*)
  }

  /** Budget-capped curation: rank rows by (`scoreCol` DESC, `tieCol`)
    * and keep the maximal quality-prefix of WHOLE rows whose
    * cumulative `weightCol` (token count) fits `budget` — "take the
    * best documents until the token budget is spent", the selection
    * rule of data-constrained training-set construction (Muennighoff
    * 2023's quality-ordered repetition budgets, public).
    *
    * SQL spelling (ANSI; the q125 oracle is this form):
    * {{{
    *   SELECT * FROM t WHERE tie IS NOT NULL
    *   QUALIFY sum(w) OVER (ORDER BY score DESC NULLS LAST, tie
    *                        ROWS UNBOUNDED PRECEDING) <= :budget
    * }}}
    * Do NOT run that spelling at scale: the unpartitioned window
    * serializes the corpus into one task. This operator computes the
    * identical kept-set with the threshold plan below.
    *
    * The defining computation is a global running sum in score order —
    * the same scale-killer [[Packing.packSequences]] documents — but
    * the OUTPUT is just a kept-set, so it compiles to the
    * [[dropBottomFraction]] threshold spelling, weighted
    * ([[qualityBudgetCut]]): the main plan is a pure filter — the
    * full rows never shuffle, never window-sort, and keep their input
    * partitioning — while the weighted prefix ranking runs in scalar
    * subqueries over a slim (order-tuple, weight) projection.
    *
    * Selection contract: a row is kept iff its whole weight fits —
    * offsets are monotone in rank order, so the kept set is exactly
    * the rank-prefix ending before the first straddler (no later row
    * can dip back under the budget). `weightCol` must be non-negative
    * integral (negative weights would break the monotonicity the
    * prefix argument rests on); null scores rank last; null `tieCol`
    * rows are dropped (module null-key policy). */
  def takeTokenBudget(
      df: DataFrame, scoreCol: String, tieCol: String, weightCol: Column,
      budget: Long, nBuckets: Int = 32): DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    df.filter(col(tieCol).isNotNull && qualityBudgetCut(
      df, scoreCol, tieCol, weightCol, _ => lit(budget), nBuckets))
  }

  /** The quality ORDER tuple: ascending struct order == (`score` DESC
    * NULLS LAST, `tie` ASC). Every field is non-null (null scores ride
    * the flag; struct comparison sorts null FIELDS first, which would
    * put null scores at the wrong end), so a tuple-vs-threshold
    * comparison is null exactly when the threshold subquery is —
    * the empty-kept-set case the caller coalesces to false. NaN
    * scores order after every finite score (Spark's NaN-greatest
    * convention survives the negation because both the boundary
    * bucketing and this tuple use the same negated spelling). */
  private def qualityOrd(score: Column, tie: Column): Column = struct(
    when(score.isNull, lit(1)).otherwise(lit(0)).as("__nf"),
    coalesce(negate(score.cast("double")), lit(0.0)).as("__ns"),
    tie.as("__t"))

  /** The shared threshold kernel behind [[takeTokenBudget]] and
    * [[repetitionSchedule]]: a membership PREDICATE for "this row is
    * in the maximal (`scoreCol` DESC NULLS LAST, `tieCol`) quality
    * prefix whose cumulative `weightCol` fits the budget" — the
    * [[dropBottomFraction]] r6.2 threshold spelling, weighted. The
    * main plan stays a pure filter: full rows never shuffle, never
    * window-sort, and input partitioning is preserved; everything
    * rank-shaped happens in scalar subqueries over a slim
    * (order-tuple, weight) projection.
    *
    * Mechanics: range buckets from an `approx_percentile` boundary
    * sketch over a ~6% hash sample of the NEGATED score (ascending
    * buckets == descending score; bucket = #boundaries strictly below,
    * so equal scores share a bucket and per-bucket sums stay exact
    * under any sketch error); ONE slim exchange on the bucket feeds a
    * single window pass computing per-row rank, EXCLUSIVE in-bucket
    * running weight, and the whole-bucket weight; the rk==1 rows
    * aggregate into a one-row (bucket → weight map, total) ledger
    * scalar (derived from the ranked output, not an independent
    * groupBy — identical exchange+window prefix ⇒ exchange reuse, the
    * [[dropBottomFraction]] lesson); the threshold tuple is
    * max(ord) over rows whose ledger-walk base + inner + own weight
    * fits the budget (kept rows form a prefix because weights are
    * non-negative, so max(ord) IS the last kept row); the predicate
    * is `ord(row) <= threshold`. Both planner traps documented on
    * [[dropBottomFraction]] apply verbatim (no subqueries inside
    * higher-order functions — the ledger is materialized into a
    * column after the window; reference the threshold subquery
    * exactly once).
    *
    * `budgetOf` receives the corpus total weight (from the ledger —
    * zero extra subqueries, zero extra passes) and returns the
    * effective budget, letting [[repetitionSchedule]] spell
    * `budget % total` without a second corpus aggregate. The caller
    * must conjoin `tieCol IS NOT NULL` (module null-key policy —
    * null tie fields would otherwise sort FIRST in the struct
    * comparison, not drop). */
  private def qualityBudgetCut(
      df: DataFrame, scoreCol: String, tieCol: String, weightCol: Column,
      budgetOf: Column => Column, nBuckets: Int): Column = {
    require(nBuckets >= 2, "nBuckets must be at least 2")
    requireNumericScore(df, scoreCol)
    import org.apache.spark.sql.expressions.Window
    val score = col(scoreCol)
    // sample on the tie hash ONLY, so the (caller-computed, possibly
    // expensive) score expression is evaluated just for sampled rows;
    // percentile_approx skips the sample's null scores itself
    val bndAgg = df
      .filter(pmod(xxhash64(col(tieCol)), lit(16)) === 0)
      .agg(percentile_approx(negate(score.cast("double")),
        boundaryProbs(nBuckets), lit(100)).as("b"))
    val slim = df
      .filter(col(tieCol).isNotNull)
      .select(qualityOrd(score, col(tieCol)).as("__o"),
        weightCol.cast("long").as("__tok"))
      .withColumn("__bnds", graft.plans.Scalars.of(bndAgg))
      .withColumn("__bucket",
        when(col("__o").getField("__nf") === 1, lit(nBuckets))
          .otherwise(when(col("__bnds").isNull, lit(0)).otherwise(
            size(filter(col("__bnds"),
              b => b < col("__o").getField("__ns"))))))
      .drop("__bnds")
      .repartition(col("__bucket"))
    val inBucket = Window.partitionBy(col("__bucket")).orderBy(col("__o"))
    val ranked = slim
      .withColumn("__rk", row_number().over(inBucket))
      .withColumn("__inner", coalesce(sum(col("__tok")).over(
        inBucket.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__btot", sum(col("__tok")).over(
        inBucket.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val ledgerAgg = ranked
      .filter(col("__rk") === 1)
      .agg(
        map_from_entries(collect_list(
          struct(col("__bucket"), col("__btot")))).as("m"),
        sum(col("__btot")).as("total"))
      .select(struct(col("m"), col("total")).as("s"))
    val ledger = graft.plans.Scalars.of(ledgerAgg)
    val thrAgg = ranked
      .withColumn("__ledger", ledger)
      .filter(
        aggregate(
          map_entries(col("__ledger").getField("m")), lit(0L),
          (acc, e) => acc + when(e.getField("key") < col("__bucket"),
            e.getField("value")).otherwise(lit(0L)))
          + col("__inner") + col("__tok")
          <= budgetOf(coalesce(col("__ledger").getField("total"), lit(0L))))
      .agg(max(col("__o")).as("thr"))
    val thr = graft.plans.Scalars.of(thrAgg)
    coalesce(qualityOrd(score, col(tieCol)) <= thr, lit(false))
  }

  private def requireNumericScore(df: DataFrame, scoreCol: String): Unit =
    df.schema.fields.find(_.name.equalsIgnoreCase(scoreCol))
      .map(_.dataType) match {
      case Some(_: org.apache.spark.sql.types.NumericType) | None => ()
      case Some(t) => throw new IllegalArgumentException(
        s"quality ranking needs a NUMERIC score column; " +
          s"'$scoreCol' is ${t.simpleString}")
    }

  private def boundaryProbs(nBuckets: Int): Column =
    array((1 until nBuckets).map(i => lit(i.toDouble / nBuckets)): _*)

  /** Epoch-repetition schedule for data-constrained training
    * (Muennighoff 2023, public): given a token `budget` LARGER than
    * the corpus, every document is seen floor(budget / total) full
    * epochs, and the remainder budget % total goes to the BEST
    * documents — the maximal (`scoreCol` DESC, `tieCol`) quality
    * prefix of whole documents that fits it — as one extra epoch.
    * Appends `repeats` (long ≥ 0); a sub-corpus budget degrades to
    * [[takeTokenBudget]] membership spelled as repeats ∈ {0, 1}; a
    * negative budget expression clamps to 0 (everything gets 0
    * repeats) rather than violating the non-negative contract.
    *
    * SQL spelling (ANSI; the q126 oracle is this form): with
    * `total = (SELECT sum(w) FROM t)`,
    * {{{
    *   SELECT *, :budget // total
    *            + CASE WHEN sum(w) OVER (ORDER BY score DESC NULLS
    *                     LAST, tie ROWS UNBOUNDED PRECEDING)
    *                   <= :budget % total THEN 1 ELSE 0 END AS repeats
    *   FROM t WHERE tie IS NOT NULL
    * }}}
    * — same unpartitioned-window scale trap as [[takeTokenBudget]];
    * this operator computes it as a pure projection + the threshold
    * predicate.
    *
    * Scale shape: corpus total and the budget arrive as in-plan
    * scalars (no driver round-trip), and the extra-epoch membership is
    * the [[qualityBudgetCut]] threshold predicate — the main plan is a
    * projection over the unshuffled input. `weightCol`
    * must be non-negative integral; null scores rank last (they still
    * earn the full epochs); null `tieCol` rows are dropped (module
    * null-key policy). */
  def repetitionSchedule(
      df: DataFrame, scoreCol: String, tieCol: String, weightCol: Column,
      budget: Column, nBuckets: Int = 32,
      outCol: String = "repeats"): DataFrame =
    scheduleCore(df, scoreCol, tieCol, weightCol,
      _ => budget.cast("long"), nBuckets, outCol)

  /** [[repetitionSchedule]] with the budget given RELATIVE to the
    * corpus — `epochs` × total tokens, the way a data-constrained run
    * is actually specified ("train for 2.5 epochs of the corpus").
    * The budget derives from the corpus total in-plan, so no action
    * happens here and no extra pass is spent. */
  def repetitionScheduleEpochs(
      df: DataFrame, scoreCol: String, tieCol: String, weightCol: Column,
      epochs: Double, nBuckets: Int = 32,
      outCol: String = "repeats"): DataFrame = {
    require(epochs >= 0.0, "epochs must be non-negative")
    scheduleCore(df, scoreCol, tieCol, weightCol,
      total => ceil(total
        * lit(new java.math.BigDecimal(epochs.toString))).cast("long"),
      nBuckets, outCol)
  }

  /** Shared spine of the two schedule spellings: `budgetFromTotal`
    * maps the corpus total weight to the absolute budget (identity
    * for a literal budget; ×epochs for the relative one), evaluated
    * once against the materialized total column in the main plan and
    * once against the ledger total inside the cut subquery — both
    * in-plan, zero extra corpus passes, and the threshold subquery
    * is referenced exactly once (the [[dropBottomFraction]] replanning
    * trap). Floor-div is spelled (b − b%t)/t on longs: the quotient
    * is an epoch count, far below 2^53, so the double division is
    * exact; t = 0 (all-zero weights / empty corpus) guards to 0 full
    * epochs with the remainder prefix judged against the raw budget. */
  private def scheduleCore(
      df: DataFrame, scoreCol: String, tieCol: String, weightCol: Column,
      budgetFromTotal: Column => Column, nBuckets: Int,
      outCol: String): DataFrame = {
    // clamp the effective budget at 0 CENTRALLY: a caller-supplied
    // negative budget Column (repetitionSchedule accepts an arbitrary
    // expression) would otherwise flow through floor-div into negative
    // `repeats`, violating the documented long >= 0 output contract
    val clamped: Column => Column =
      t => greatest(budgetFromTotal(t).cast("long"), lit(0L))
    val totAgg = df.filter(col(tieCol).isNotNull)
      .agg(coalesce(sum(weightCol.cast("long")), lit(0L)).as("t"))
    val extra = qualityBudgetCut(df, scoreCol, tieCol, weightCol,
      total => {
        val b = clamped(total)
        when(total > lit(0L), pmod(b, total)).otherwise(b)
      }, nBuckets)
    val t = col("__tot")
    val b = clamped(t)
    val full = when(t > lit(0L),
      ((b - pmod(b, t)) / t).cast("long")).otherwise(lit(0L))
    df.filter(col(tieCol).isNotNull)
      .withColumn("__tot", graft.plans.Scalars.of(totAgg))
      .withColumn(outCol, full + when(extra, lit(1L)).otherwise(lit(0L)))
      .select(df.columns.map(col) :+ col(outCol): _*)
  }

  /** Exact per-stratum score percentile (SQL `percent_rank()` over
    * (`stratumCol` PARTITION, `scoreCol` DESC NULLS LAST, `tieCol`)):
    * appends `outCol` = (rank − 1) / (n − 1) in [0, 1] (0 for a
    * single-row stratum — the SQL convention). This is the score
    * CALIBRATION step a multi-source corpus needs before any global
    * quality threshold: raw scores are not comparable across sources
    * (boilerplate-heavy domains score systematically lower), so the
    * fair cut is "best X% WITHIN each source" (cf. the per-dump
    * quality buckets in CCNet, Wenzek 2019 §4, public).
    *
    * SQL spelling (ANSI; the q127 oracle is this form):
    * {{{
    *   SELECT *, percent_rank() OVER (PARTITION BY stratum
    *               ORDER BY score DESC NULLS LAST, tie) AS score_pr
    *   FROM t WHERE tie IS NOT NULL
    * }}}
    *
    * Scale shape: the naive spelling is one window partition per
    * stratum — a single task per SOURCE, serializing a giant source
    * exactly like the global-window scale-killers this module
    * replaces. Instead: per-stratum RANGE-bucket boundaries from a
    * grouped `approx_percentile` sketch over a hash sample (strata
    * missing from the sample degrade to one bucket — exact, just
    * unbalanced), in-bucket `row_number` over (stratum, bucket) — each
    * task holds ~|stratum|/nBuckets rows — and a broadcast ledger of
    * per-(stratum, bucket) base offsets and stratum sizes. The ledger
    * is #strata × (nBuckets+1) rows: strata are sources / domains /
    * languages — model-sized by definition of "stratum" here; the
    * broadcast contract fails loudly, not silently, if violated.
    * Equal scores land in the same bucket (strictly-above counting),
    * so per-bucket ranks are exact regardless of sketch error.
    *
    * Null scores rank last within their stratum; NaN scores rank
    * after every finite score and before nulls (the [[qualityOrd]]
    * convention — this kernel orders by the same negated tuple as
    * [[takeTokenBudget]] / [[topFractionPerStratum]], so the module
    * has ONE NaN ordering, not two); null `tieCol` rows are dropped
    * (module null-key policy); a NULL stratum is a valid stratum
    * (null-safe join + window partition). `tieCol` must be row-unique
    * so percent_rank has no tie plateaus (rank == row_number — the
    * property the oracle parity rests on). */
  def scoreRankPerStratum(
      df: DataFrame, stratumCol: String, scoreCol: String, tieCol: String,
      outCol: String = "score_pr", nBuckets: Int = 32): DataFrame =
    scoreRanksFused(df, stratumCol, Seq((scoreCol, outCol)), tieCol,
      nBuckets)

  /** The kernel behind [[scoreRankPerStratum]] (one signal) and
    * [[rankEnsemble]] (k signals IN ONE PLAN): every signal's
    * boundary sketch rides ONE grouped aggregate over the shared
    * sample, every signal's bucket tag is a projection on the shared
    * broadcast-joined frame, and the per-signal in-bucket
    * `row_number` windows + broadcast offset ledgers chain on that
    * frame — so k signals cost one boundary job, k ledger broadcasts
    * and one main pass, instead of k SEPARATE three-consumer passes
    * each needing its own materialization (the fold spelling ran 26
    * serial jobs for 1.2 s of task work on the 3-signal q139 —
    * per-fold checkpoints existed ONLY because each step's output fed
    * the next step's three consumers; fusing removes the
    * multi-consumption, so the checkpoints go with it). Per-signal
    * arithmetic is IDENTICAL to the single-signal kernel — windows
    * add columns, never rows, so chaining signal i's window on a
    * frame carrying signal j's tags changes nothing. */
  private def scoreRanksFused(
      df: DataFrame, stratumCol: String,
      signals: Seq[(String, String)], tieCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be at least 2")
    signals.foreach { case (s, _) => requireNumericScore(df, s) }
    import org.apache.spark.sql.expressions.Window
    val sketches = signals.zipWithIndex.map { case ((s, _), i) =>
      percentile_approx(negate(col(s).cast("double")),
        boundaryProbs(nBuckets), lit(100)).as(s"__bnds_$i")
    }
    val bnd = df
      .filter(col(tieCol).isNotNull)
      .filter(pmod(xxhash64(col(tieCol)), lit(16)) === 0)
      .groupBy(col(stratumCol))
      .agg(sketches.head, sketches.tail: _*)
      .select(col(stratumCol).as("__bs") +:
        signals.indices.map(i => col(s"__bnds_$i")): _*)
    val tagged = signals.zipWithIndex.foldLeft(
      df.filter(col(tieCol).isNotNull)
        .join(broadcast(bnd), col(stratumCol) <=> col("__bs"), "left")) {
      case (acc, ((s, _), i)) =>
        acc.withColumn(s"__o_$i", qualityOrd(col(s), col(tieCol)))
          .withColumn(s"__bucket_$i",
            when(col(s"__o_$i").getField("__nf") === 1, lit(nBuckets))
              .otherwise(when(col(s"__bnds_$i").isNull, lit(0)).otherwise(
                size(filter(col(s"__bnds_$i"),
                  b => b < col(s"__o_$i").getField("__ns"))))))
    }.drop("__bs" +: signals.indices.map(i => s"__bnds_$i"): _*)
    val ranked = signals.zipWithIndex.foldLeft(tagged) {
      case (acc, ((_, outCol), i)) =>
        val inBucket = Window
          .partitionBy(col(stratumCol), col(s"__bucket_$i"))
          .orderBy(col(s"__o_$i"))
        val byStratum = Window.partitionBy(col(stratumCol))
          .orderBy(col(s"__bucket_$i"))
        val ledger = tagged.groupBy(col(stratumCol), col(s"__bucket_$i"))
          .agg(count(lit(1)).as("__cnt"))
          .withColumn("__base", coalesce(
            sum(col("__cnt")).over(
              byStratum.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .withColumn("__n", sum(col("__cnt")).over(byStratum.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
          .select(col(stratumCol).as(s"__ls_$i"),
            col(s"__bucket_$i").as(s"__lb_$i"),
            col("__base").as(s"__base_$i"), col("__n").as(s"__n_$i"))
        acc
          .withColumn(s"__rbk_$i", row_number().over(inBucket))
          .join(broadcast(ledger),
            col(stratumCol) <=> col(s"__ls_$i") &&
              col(s"__bucket_$i") === col(s"__lb_$i"))
          .withColumn(outCol, when(col(s"__n_$i") > lit(1L),
              (col(s"__base_$i") + col(s"__rbk_$i") - 1).cast("double")
                / (col(s"__n_$i") - 1))
            .otherwise(lit(0.0)))
    }
    ranked.select(
      df.columns.map(col) ++ signals.map(p => col(p._2)): _*)
  }

  /** Multi-signal rank-fusion quality score — the ensemble device for
    * curation when no single quality signal is trusted alone (rank
    * averaging / Borda-style fusion, classic IR methodology): each
    * signal column is converted to its EXACT global percent rank
    * (descending — higher signal = better), and the ensemble score is
    * the mean of the per-signal ranks, rounded. Rank space makes
    * incommensurable signals (entropy in bits, counts, ratios)
    * directly averageable without calibration.
    *
    * Each per-signal rank is one [[scoreRankPerStratum]] pass over a
    * single surrogate stratum — the two-phase range-bucketed spelling,
    * so the corpus is never window-sorted in one task; per-signal cost
    * is one slim (order-tuple) exchange. Signals should be PRE-ROUNDED
    * by the caller when they come from float summations (two docs with
    * identical token multisets must compare EQUAL, not differ by a
    * summation-order ulp, for the tie-break to stay engine-portable).
    * Null `tieCol` rows drop (module convention); the mean is a fixed
    * left-associative chain so engines agree bit-for-bit on it.
    *
    * The input is MATERIALIZED once (eager `localCheckpoint`) before
    * the fold: each rank pass consumes it three times (boundary
    * sample, bucket tagging, offset ledger), so k signals re-execute
    * the input lineage ~3k times otherwise — ruinous when the signals
    * are expression-heavy (entropy, classifier scores). This is the
    * module's one deliberate exception to the caller-persists stance
    * ([[graft.operators.Dedup]]'s no-persist note), because the
    * multi-consumption is internal to this operator, invisible to the
    * caller. Consequently pass a SLIM projection — `tieCol` + the
    * signal columns; join wide columns back on `tieCol` afterwards —
    * since whatever is passed is what gets materialized.
    *
    * SQL spelling (ANSI):
    * {{{
    *   round((percent_rank() OVER (ORDER BY s1 DESC NULLS LAST, tie)
    *        + ... + percent_rank() OVER (...sk...)) / k, 6)
    * }}}
    * — identical values because the total (signal, tie) order makes
    * rank == row_number, which is what the two-phase kernel computes.
    *
    * Output: input columns + `__pr_<signal>` per signal + `outCol`.
    */
  def rankEnsemble(
      df: DataFrame, signalCols: Seq[String], tieCol: String,
      outCol: String = "ensemble_pr", nBuckets: Int = 32): DataFrame = {
    require(signalCols.nonEmpty, "at least one signal column required")
    // ONE input materialization: the fused kernel consumes it through
    // k+2 subtrees (shared boundary sample, the main tagged frame, k
    // offset ledgers). All k signals rank in ONE plan
    // ([[scoreRanksFused]]) — the earlier per-signal fold needed a
    // checkpoint per step purely to stop step k re-executing step
    // k−1's three-consumer lineage, and those per-step jobs were the
    // bulk of q139's 26-job serial latency.
    val tagged = df.withColumn("__one", lit("")).localCheckpoint(true)
    scoreRanksFused(tagged, "__one",
      signalCols.map(s => (s, s"__pr_$s")), tieCol, nBuckets)
      .withColumn(outCol,
        round(signalCols.map(s => col(s"__pr_$s")).reduce(_ + _) /
          signalCols.size, 6))
      .drop("__one")
  }

  /** Per-stratum token budgets: within each listed stratum keep the
    * maximal (`scoreCol` DESC NULLS LAST, `tieCol`) quality prefix of
    * WHOLE rows whose cumulative `weightCol` fits that stratum's
    * budget — the way production training mixtures are actually
    * specified ("this many tokens of web, that many of code"): the
    * per-source composition of [[takeTokenBudget]], and the
    * token-weighted complement of [[topKPerStratum]]'s doc-count cap.
    * Strata missing from `budgets` are DROPPED (the
    * [[takePerStratum]]/[[mixSample]] convention); a zero budget keeps
    * nothing of its stratum; an over-corpus budget keeps everything.
    *
    * SQL spelling (ANSI; the q130 oracle is this form): with
    * `b = budgets[stratum]`,
    * {{{
    *   SELECT * FROM t WHERE tie IS NOT NULL AND b IS NOT NULL
    *   QUALIFY sum(w) OVER (PARTITION BY stratum
    *             ORDER BY score DESC NULLS LAST, tie
    *             ROWS UNBOUNDED PRECEDING) <= b
    * }}}
    * — one window task per stratum at scale; this operator computes
    * the identical kept-set as a pure filter.
    *
    * Scale shape: the [[takeTokenBudget]] weighted-prefix machinery
    * under the [[topFractionPerStratum]] threshold-MAP spelling. A
    * slim (stratum-key, order-tuple, weight) projection is
    * range-bucketed per stratum (grouped `approx_percentile` sketch
    * over a hash sample), ONE slim exchange on (stratum, bucket) feeds
    * one window pass (in-bucket rank, EXCLUSIVE running weight, bucket
    * weight), rk==1 rows aggregate into per-stratum (bucket→weight
    * map) ledger rows, and the per-stratum threshold tuple — max(ord)
    * over rows whose ledger-walk base + inner + own weight fits that
    * stratum's budget — lands in a ONE-ROW scalar map. The gate is
    * `ord <= map[stratum]`: full rows never shuffle, never
    * window-sort, and keep their input partitioning. The budget map
    * itself rides a `typedLit` (model-sized: strata are
    * sources/domains/languages). Kept sets are exact under sketch
    * error by the same per-bucket-sums argument as
    * [[qualityBudgetCut]]; weights must be non-negative integral
    * (prefix monotonicity); null scores rank last; NaN after finite
    * (module [[qualityOrd]] convention); null `tieCol` rows drop; a
    * NULL stratum is addressable via its surrogate key only if the
    * caller lists it. */
  def takeTokenBudgetPerStratum(
      df: DataFrame, stratumCol: String, scoreCol: String, tieCol: String,
      weightCol: Column, budgets: Map[String, Long],
      nBuckets: Int = 32): DataFrame = {
    budgets.values.foreach(b =>
      require(b >= 0L, "per-stratum budgets must be non-negative"))
    require(nBuckets >= 2, "nBuckets must be at least 2")
    requireNumericScore(df, scoreCol)
    if (budgets.isEmpty) return df.filter(lit(false))
    import org.apache.spark.sql.expressions.Window
    val score = col(scoreCol)
    def sk(stratum: Column): Column =
      when(stratum.isNull, lit(NullStratumKey))
        .otherwise(stratum.cast("string"))
    def budgetOf(k: Column): Column = element_at(typedLit(budgets), k)
    val bnd = df
      .filter(col(tieCol).isNotNull &&
        pmod(xxhash64(col(tieCol)), lit(16)) === 0)
      .groupBy(sk(col(stratumCol)).as("__bs"))
      .agg(percentile_approx(negate(score.cast("double")),
        boundaryProbs(nBuckets), lit(100)).as("__bnds"))
    val slim = df
      .filter(col(tieCol).isNotNull)
      .select(sk(col(stratumCol)).as("__sk"),
        qualityOrd(score, col(tieCol)).as("__o"),
        weightCol.cast("long").as("__tok"))
      .filter(budgetOf(col("__sk")).isNotNull) // unlisted strata drop
      .join(broadcast(bnd), col("__sk") === col("__bs"), "left")
      .withColumn("__bucket",
        when(col("__o").getField("__nf") === 1, lit(nBuckets))
          .otherwise(when(col("__bnds").isNull, lit(0)).otherwise(
            size(filter(col("__bnds"),
              b => b < col("__o").getField("__ns"))))))
      .drop("__bs", "__bnds")
      .repartition(col("__sk"), col("__bucket"))
    val w = Window.partitionBy(col("__sk"), col("__bucket"))
      .orderBy(col("__o"))
    val ranked = slim
      .withColumn("__rk", row_number().over(w))
      .withColumn("__inner", coalesce(sum(col("__tok")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__btot", sum(col("__tok")).over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
    val ledger = ranked
      .filter(col("__rk") === 1)
      .groupBy(col("__sk"))
      .agg(map_from_entries(collect_list(
        struct(col("__bucket"), col("__btot")))).as("__m"))
      .select(col("__sk").as("__ls"), col("__m"))
    val thrAgg = ranked
      .join(broadcast(ledger), col("__sk") === col("__ls"))
      .filter(
        aggregate(map_entries(col("__m")), lit(0L),
          (acc, e) => acc + when(e.getField("key") < col("__bucket"),
            e.getField("value")).otherwise(lit(0L)))
          + col("__inner") + col("__tok")
          <= budgetOf(col("__sk")))
      .groupBy(col("__sk"))
      .agg(max(col("__o")).as("__thr"))
      .agg(map_from_entries(collect_list(
        struct(col("__sk"), col("__thr")))).as("t"))
    val thr = graft.plans.Scalars.of(thrAgg)
    df.filter(col(tieCol).isNotNull && coalesce(
      qualityOrd(score, col(tieCol)) <=
        element_at(thr, sk(col(stratumCol))), lit(false)))
  }

  /** Map key standing in for a NULL stratum (map keys cannot be null).
    * Strata are cast to string for the threshold map; a real stratum
    * value equal to this sentinel would collide — vanishingly unlikely
    * (NUL bytes) and documented rather than defended. */
  private val NullStratumKey = "\u0000\u0000<null stratum>"

  /** Keep the best `frac` of every stratum: within each stratum
    * (source / domain / language), retain exactly ceil(frac · n) rows
    * by (`scoreCol` DESC NULLS LAST, `tieCol`) — the fraction-quota
    * complement of [[topKPerStratum]]'s absolute cap, and the
    * per-stratum analogue of [[dropBottomFraction]] (CCNet keeps
    * fixed-fraction quality buckets per dump, Wenzek 2019 §4).
    *
    * SQL spelling (ANSI; the q128 oracle is this form):
    * {{{
    *   SELECT * FROM t WHERE tie IS NOT NULL
    *   QUALIFY row_number() OVER (PARTITION BY stratum
    *             ORDER BY score DESC NULLS LAST, tie)
    *        <= ceil(:frac * count(*) OVER (PARTITION BY stratum))
    * }}}
    * — one window task per stratum at scale; this operator computes
    * the identical kept-set with the threshold-map plan below.
    *
    * Scale shape — the threshold spelling, per stratum: full rows
    * never shuffle, never window-sort, and keep their input
    * partitioning. A slim (stratum, order-tuple) projection is
    * range-bucketed per stratum (grouped `approx_percentile` sketch
    * over a hash sample; missing strata degrade to one bucket —
    * exact, just unbalanced), ONE slim exchange feeds one window pass
    * keyed (stratum, bucket) computing in-bucket rank and bucket
    * count, the rk==1 rows aggregate into per-stratum (bucket→count
    * map, total) ledger rows (model-sized: strata are sources /
    * languages), and the row whose in-stratum rank equals
    * ceil(frac · n) — exactly one per stratum — lands in a one-row
    * scalar MAP of stratum → threshold tuple. The gate is
    * `ord(row) <= map[stratum]`, a pure filter.
    *
    * Null scores rank last; null `tieCol` rows are dropped (module
    * null-key policy); a NULL stratum is a valid stratum (surrogate
    * map key). The ledger and threshold walk reference the ranked
    * output (not independent aggregates), so exchange reuse computes
    * the slim shuffle once — the [[dropBottomFraction]] lesson. */
  def topFractionPerStratum(
      df: DataFrame, stratumCol: String, scoreCol: String, tieCol: String,
      frac: Double, nBuckets: Int = 32): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "fraction must be in [0,1]")
    require(nBuckets >= 2, "nBuckets must be at least 2")
    requireNumericScore(df, scoreCol)
    import org.apache.spark.sql.expressions.Window
    val score = col(scoreCol)
    def sk(stratum: Column): Column =
      when(stratum.isNull, lit(NullStratumKey))
        .otherwise(stratum.cast("string"))
    val bnd = df
      .filter(col(tieCol).isNotNull &&
        pmod(xxhash64(col(tieCol)), lit(16)) === 0)
      .groupBy(sk(col(stratumCol)).as("__bs"))
      .agg(percentile_approx(negate(score.cast("double")),
        boundaryProbs(nBuckets), lit(100)).as("__bnds"))
    val slim = df
      .filter(col(tieCol).isNotNull)
      .select(sk(col(stratumCol)).as("__sk"),
        qualityOrd(score, col(tieCol)).as("__o"))
      .join(broadcast(bnd), col("__sk") === col("__bs"), "left")
      .withColumn("__bucket",
        when(col("__o").getField("__nf") === 1, lit(nBuckets))
          .otherwise(when(col("__bnds").isNull, lit(0)).otherwise(
            size(filter(col("__bnds"),
              b => b < col("__o").getField("__ns"))))))
      .drop("__bs", "__bnds")
      .repartition(col("__sk"), col("__bucket"))
    val w = Window.partitionBy(col("__sk"), col("__bucket"))
      .orderBy(col("__o"))
    val ranked = slim
      .withColumn("__rk", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
    val ledger = ranked
      .filter(col("__rk") === 1)
      .groupBy(col("__sk"))
      .agg(
        map_from_entries(collect_list(
          struct(col("__bucket"), col("__cnt")))).as("__m"),
        sum(col("__cnt")).as("__n"))
      .select(col("__sk").as("__ls"), col("__m"), col("__n"))
    // the in-stratum ranks are a permutation of 1..n, so exactly one
    // row per stratum matches ceil(frac·n) when frac > 0; frac = 0
    // matches none → the stratum is absent from the map → keep none
    val thrAgg = ranked
      .join(broadcast(ledger), col("__sk") === col("__ls"))
      .filter(
        aggregate(map_entries(col("__m")), lit(0L),
          (acc, e) => acc + when(e.getField("key") < col("__bucket"),
            e.getField("value")).otherwise(lit(0L)))
          + col("__rk") === exactCeil(frac, col("__n")).cast("long"))
      .agg(map_from_entries(collect_list(
        struct(col("__sk"), col("__o")))).as("t"))
    val thr = graft.plans.Scalars.of(thrAgg)
    df.filter(col(tieCol).isNotNull && coalesce(
      qualityOrd(score, col(tieCol)) <=
        element_at(thr, sk(col(stratumCol))), lit(false)))
  }

  /** Exact integer water-filling over a per-stratum capacity ledger —
    * the UniMax allocation (Chung et al. 2023, public): given a total
    * token budget and per-stratum capacities (corpus size × max
    * epochs), every stratum receives `min(capacity, θ)` tokens where
    * the water level θ is the largest value whose total allocation
    * fits the budget. Low-resource strata are fully funded up to their
    * epoch cap; high-resource strata split the remainder evenly. The
    * integer remainder (budget − Σ min(cap, θ)) goes +1 to the first
    * `rem` unfunded strata in (capacity, stratum) order, so the
    * allocation sums EXACTLY to `min(budget, Σ capacities)` and is a
    * pure function of the ledger — engine-portable with no float in
    * sight.
    *
    * Closed form, not a loop: with strata sorted by (capacity asc,
    * stratum), stratum i is fully funded iff
    * `prefix(i−1) + cap_i · (n−i+1) <= budget` (monotone in i under
    * this tie-break), θ = `(budget − fundedSum) div unfundedCount`.
    *
    * SQL spelling (ANSI; the q143 oracle is this form): the same
    * prefix-sum test via `sum() OVER (ORDER BY capacity, stratum ROWS
    * UNBOUNDED PRECEDING)` windows.
    *
    * Scale shape: the input is a per-stratum LEDGER (strata are
    * sources / languages / domains — model-sized by definition, the
    * module's broadcast-ledger convention), so the global windows here
    * run over a model-sized frame — a few thousand rows in one task is
    * the honest spelling, not a scale hazard. The CORPUS never enters
    * this operator; feed the result to [[takeTokenBudgetPerStratum]] /
    * [[repetitionSchedule]] to apply the budgets.
    *
    * Null capacities are treated as 0 (funded with 0 tokens); negative
    * capacities and budgets are rejected. Output: input columns +
    * `outCol` (the budget, long). */
  def waterfillBudgets(
      sizes: DataFrame, stratumCol: String, capacityCol: String,
      budget: Column, outCol: String = "budget_tokens"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = greatest(coalesce(col(capacityCol).cast("long"), lit(0L)),
      lit(0L))
    // loud, not silent: assert_true kills the job on a negative input
    val capChecked = when(
      coalesce(col(capacityCol).cast("long"), lit(0L)) < 0,
      raise_error(lit("waterfillBudgets: negative capacity")))
      .otherwise(cap)
    val bud = when(budget.cast("long") < 0,
      raise_error(lit("waterfillBudgets: negative budget")))
      .otherwise(budget.cast("long"))
    val byCap = Window.orderBy(col("__cap"), col(stratumCol))
    val all = Window.partitionBy(lit(1))
    sizes
      .withColumn("__cap", capChecked)
      .withColumn("__b", bud)
      .withColumn("__i", row_number().over(byCap))
      .withColumn("__pe", coalesce(
        sum(col("__cap")).over(byCap.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__funded",
        col("__pe") + col("__cap") * (col("__n") - col("__i") + 1)
          <= col("__b"))
      .withColumn("__F", coalesce(
        sum(when(col("__funded"), 1L).otherwise(0L)).over(all), lit(0L)))
      .withColumn("__PF", coalesce(
        sum(when(col("__funded"), col("__cap")).otherwise(0L)).over(all),
        lit(0L)))
      .withColumn("__theta",
        when(col("__n") > col("__F"),
          expr("(`__b` - `__PF`) div (`__n` - `__F`)")).otherwise(lit(0L)))
      .withColumn("__rem",
        when(col("__n") > col("__F"),
          expr("(`__b` - `__PF`) % (`__n` - `__F`)")).otherwise(lit(0L)))
      .withColumn(outCol,
        when(col("__funded"), col("__cap"))
          .otherwise(col("__theta") +
            when(col("__i") - col("__F") <= col("__rem"), lit(1L))
              .otherwise(lit(0L))))
      .select(sizes.columns.map(col) :+ col(outCol): _*)
  }

  /** Leave-last-out temporal split with an embargo gap — the held-out
    * protocol for behavioral/recsys training data: each key's LAST
    * interaction becomes the eval example, and interactions within
    * `embargoMs` BEFORE it are quarantined so near-boundary leakage
    * (features computed "just before" the target) can't contaminate
    * the train side (the purged/embargoed walk-forward discipline of
    * financial ML, López de Prado 2018 ch.7, public).
    *
    * Adds `split`: "eval" for the (ts, tie)-max row per key, "embargo"
    * for rows with ts strictly inside (last_ts − embargoMs, last_ts),
    * "train" for the rest. A single-interaction key contributes only
    * its eval row. `tieCol` must be unique per key (it breaks
    * same-timestamp ties AND identifies the eval row — a duplicated
    * (ts, tie) pair would mark both copies eval). Null keys/timestamps
    * are dropped (module null-key policy).
    *
    * Scale shape: ONE per-key window aggregate (max of the
    * (epoch-ms, tie) struct) — a key's history is the state bound,
    * never the corpus (the EventAnalytics contract). Timestamp
    * arithmetic is whole epoch-milliseconds on both engines (the
    * sessionize discipline: `unix_millis` ↔ DuckDB `epoch_ms`). */
  def leaveLastOut(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, embargoMs: Long): DataFrame = {
    require(embargoMs >= 0L, "embargoMs must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
    val ms = unix_millis(col(tsCol))
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__last",
        max(struct(ms.as("ms"), col(tieCol).as("t"))).over(w))
      .withColumn("split",
        when(ms === col("__last.ms") && col(tieCol) === col("__last.t"),
          lit("eval"))
          .when(ms > col("__last.ms") - lit(embargoMs), lit("embargo"))
          .otherwise(lit("train")))
      .drop("__last")
  }

  /** Deterministic length-curriculum training order: adds
    * `curriculum_pos` (0-based, a permutation of 0..n-1) ordering rows
    * by (`weightCol` div `bucketWidth` ASC, md5(seed ':' key), key) —
    * coarse difficulty buckets ascending (short sequences first:
    * curriculum learning, Bengio 2009, public; equally the
    * length-bucketed shard order that cuts pad waste in batch
    * assembly), with a content-stable, re-seedable [[shuffleOrder]]
    * shuffle INSIDE each bucket so input order carries no secondary
    * correlation.
    *
    * Shape: [[withStratumRank]] with the difficulty bucket as the
    * stratum — per-bucket md5 ranks run in parallel over 256 hash
    * sub-buckets — plus ONE broadcast ledger of difficulty-bucket base
    * offsets (n_rows/bucketWidth-bounded, model-sized; its cumulative
    * window orders a tiny aggregate, never rows). No global sort, no
    * single-task window anywhere. Null keys/weights are dropped
    * (module null-key policy); negative weights are caller error
    * (`div` truncates toward zero, which would interleave bucket
    * −0 with bucket 0). */
  def curriculumOrder(df: DataFrame, weightCol: String, bucketWidth: Long,
      keyCol: String, seed: String = ""): DataFrame = {
    require(bucketWidth >= 1L, "bucketWidth must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val out = df.columns.map(col) :+ col("curriculum_pos")
    val base = df
      .filter(col(weightCol).isNotNull && col(keyCol).isNotNull)
      .withColumn("__cb",
        expr(s"cast(`$weightCol` as long) div $bucketWidth"))
      .withColumn("__sk",
        concat(lit(seed), lit(":"), col(keyCol).cast("string")))
    val ledger = base.groupBy(col("__cb"))
      .agg(count(lit(1)).as("__bc"))
      .withColumn("__bbase", coalesce(
        sum(col("__bc")).over(Window.orderBy(col("__cb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__cb").as("__lcb"), col("__bbase"))
    withStratumRank(base, "__sk", "__cb")
      .join(broadcast(ledger), col("__cb") === col("__lcb"))
      .withColumn("curriculum_pos", col("__bbase") + col("__rk") - 1)
      .select(out: _*)
  }

  /** ANSI `FETCH FIRST k ROWS WITH TIES` over a descending integral
    * order — the standard top-k whose cut NEVER splits a tie group
    * (Spark's `orderBy().limit(k)` picks an arbitrary k rows inside a
    * tie; rank-aware selection needs a window). Keeps every row whose
    * `RANK() <= k`, i.e. whose value has fewer than k STRICTLY GREATER
    * rows.
    *
    * The scale-safe spelling: no global-order window ever sees corpus
    * rows. One (value → count) ledger; the strictly-greater mass comes
    * from the two-phase bucketed prefix sum over the NEGATED value
    * (below(-v) = mass above v); the threshold — the smallest value
    * with rank <= k — is a one-row scalar subquery; the result is
    * `df.filter(value >= threshold)`, a pure filter that preserves the
    * input partitioning (the q63/q125 threshold discipline). Null
    * values never qualify (ANSI: NULLS LAST under DESC, and the
    * threshold is non-null whenever the input has >= 1 non-null row). */
  def topKWithTies(df: DataFrame, value: Column, k: Long,
      buckets: Int = 256): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val g = df.select(value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .withColumn("__nv", -col("__v"))
    val above = Eval.exclusivePrefix(g, "__nv", "__c", buckets, "__above")
    val threshold = graft.plans.Scalars.of(
      above.filter(col("__above") < k).agg(min(col("__v")).as("__t")))
    df.filter(value.cast("long") >= threshold)
  }
}
