package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline evaluation metrics over scored corpora — the measurement
  * step after a curation signal is computed (q120's classifier, q139's
  * ensemble, plain heuristics): does the score actually separate the
  * cohort it claims to? Complements the eval harnesses that live with
  * their operators (q169 next-event hit-rate, q161 label confusion,
  * q172 bootstrap CIs).
  *
  * The defining computation of rank metrics is a GLOBAL score order.
  * The naive spelling — `rank().over(Window.orderBy(score))` with no
  * partitioning — moves the whole corpus into ONE task; at 100 TB
  * that's the scale-killer. AUC admits the same two-phase escape as
  * [[Packing]]'s running offset, with one extra reduction: group by
  * DISTINCT SCORE first (the tie-aware Mann–Whitney statistic only
  * needs per-score positive/negative counts), then prefix-sum the
  * grouped ledger in score-range buckets. Corpus rows shuffle exactly
  * once, on the score, carrying two longs. */
object Eval {

  /** Tie-aware ROC AUC (the Mann–Whitney U statistic normalized by
    * `n_pos * n_neg`): the probability that a uniformly random
    * positive outscores a uniformly random negative, ties counting
    * half (Hanley & McNeil 1982). Returns ONE row
    * `(n_pos, n_neg, auc)` — `auc` rounded to `decimals`, null when
    * either class is empty (the statistic is undefined, not 0.5).
    *
    * `score` must cast losslessly to long (fixed-point millis for
    * fractional signals — the repo-wide exactness discipline); `label`
    * is the positive-class predicate. Exactness: all counting is in
    * longs; the only division is the final `u2 / (2 * np * nn)`, and
    * doubling U keeps the tie half-credits integral until then.
    *
    * Plan shape: one slim (score, 0/1) shuffle into the per-score
    * ledger; range buckets from a broadcast (min, max) scalar (bucket
    * assignment only needs MONOTONICITY in the score, so the double
    * arithmetic inside the bucket formula is harmless); in-bucket
    * exclusive prefix sums as bucket-partitioned windows; one
    * `buckets`-row single-partition window (model-sized by
    * construction); one final aggregate. Nothing corpus-sized is
    * collected, windowed without a partition, or shuffled twice. */
  def auc(df: DataFrame, score: Column, label: Column,
      buckets: Int = 256, decimals: Int = 6): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20),
      "buckets must be in [1, 2^20]")
    val g = df
      .select(score.cast("long").as("__s"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__np"),
        sum(lit(1L) - col("__y")).as("__nn"))
    withBelow(g, "__s", "__nn", buckets, "__below")
      .agg(sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__np") *
          (lit(2L) * col("__below") + col("__nn")))
          .as("__u2"))
      .select(
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), decimals))
          .as("auc"))
  }

  /** The shared two-phase distributed prefix sum over a one-row-per-
    * distinct-value ledger: adds `out` = Σ `w` over all STRICTLY
    * SMALLER `v` (exclusive running sum in global `v` order) without a
    * global-order window. Range buckets come from a broadcast
    * (min, max) scalar — bucket assignment only needs monotonicity in
    * `v`, so the double arithmetic in the bucket formula is harmless;
    * in-bucket exclusive prefixes are bucket-partitioned windows; the
    * only unpartitioned window runs over the `buckets`-row bucket
    * ledger (model-sized by construction). */
  /** [[withBelow]] for sibling operators ([[Sampling.topKWithTies]]
    * runs it over negated values to get the strictly-ABOVE mass). */
  private[operators] def exclusivePrefix(ledger: DataFrame, v: String,
      w: String, buckets: Int, out: String): DataFrame =
    withBelow(ledger, v, w, buckets, out)

  /** The MAX-monoid twin of [[exclusivePrefix]]: `out` = max `w` over
    * strictly smaller `v`, NULL when no smaller row exists (a running
    * max has no zero element, so the empty prefix must stay
    * distinguishable — skyline callers treat it as "undominated").
    * Same bucketed two-phase shape ([[Sampling.topKWithTies]]'s
    * device); [[paretoFrontier2D]] runs it over negated x. */
  private[operators] def exclusivePrefixMax(ledger: DataFrame, v: String,
      w: String, buckets: Int, out: String): DataFrame =
    withBelow(ledger, v, w, buckets, out, useMax = true)

  private def withBelow(ledger: DataFrame, v: String, w: String,
      buckets: Int, out: String, keys: Seq[String] = Nil,
      useMax: Boolean = false): DataFrame = {
    // with `keys`, every step partitions by them too: (min, max) come
    // from a keys-sized broadcast ledger, the bucket-base window runs
    // per key over <= `buckets` rows — stratified prefix sums at the
    // same cost shape. Callers wrap nullable keys in a struct (complex-
    // type equality is null-safe; a bare nullable join key is not).
    val bucketed =
      if (keys.isEmpty) {
        val mm = ledger.agg(min(col(v)).as("__lo"), max(col(v)).as("__hi"))
        ledger.crossJoin(broadcast(mm))
      } else {
        val mm = ledger.groupBy(keys.map(col): _*)
          .agg(min(col(v)).as("__lo"), max(col(v)).as("__hi"))
        ledger.join(broadcast(mm), keys)
      }
    val kc = keys.map(col)
    val inBucket = Window.partitionBy(kc :+ col("__bkt"): _*)
      .orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, -1)
    def part(c: Column) = if (useMax) max(c) else sum(c)
    // the sum monoid has a zero (empty prefix = 0); max does not, so
    // its empty prefix stays NULL and the combine is null-skipping
    // `greatest` instead of `+`
    def z(c: Column) = if (useMax) c else coalesce(c, lit(0L))
    val withInner = bucketed
      .withColumn("__bkt",
        floor((col(v) - col("__lo")).cast("double") * buckets /
          (col("__hi") - col("__lo") + lit(1)).cast("double"))
          .cast("long"))
      .withColumn("__inner", z(part(col(w)).over(inBucket)))
    val bucketBase = withInner
      .groupBy(kc :+ col("__bkt"): _*)
      .agg(part(col(w)).as("__btot"))
      .withColumn("__base", z(
        part(col("__btot")).over(Window.partitionBy(kc: _*)
          .orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1))))
      .select((keys :+ "__bkt" :+ "__base").map(col): _*)
    withInner
      .join(broadcast(bucketBase), keys :+ "__bkt")
      .withColumn(out,
        if (useMax) greatest(col("__base"), col("__inner"))
        else col("__base") + col("__inner"))
      .drop("__lo", "__hi", "__bkt", "__inner", "__base")
  }

  /** [[auc]] stratified: one AUC ledger row per stratum
    * `(stratum, n_pos, n_neg, auc)` — "does the signal's discriminative
    * power hold across sources/languages", the per-cohort acceptance
    * read a single corpus-wide AUC can mask (a signal can be strong
    * overall yet inverted inside one source — Simpson's reversal).
    * Same exact doubled-U arithmetic and null-when-degenerate contract
    * as [[auc]], per stratum; same plan shape with every step
    * additionally keyed by the stratum (the struct wrap keeps a NULL
    * stratum alive through the joins). */
  def aucPerStratum(df: DataFrame, stratum: Column, score: Column,
      label: Column, buckets: Int = 256, decimals: Int = 6): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20),
      "buckets must be in [1, 2^20]")
    val g = df
      .select(struct(stratum.as("stratum")).as("__sk"),
        score.cast("long").as("__s"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy(col("__sk"), col("__s"))
      .agg(sum(col("__y")).as("__np"),
        sum(lit(1L) - col("__y")).as("__nn"))
    withBelow(g, "__s", "__nn", buckets, "__below", keys = Seq("__sk"))
      .groupBy(col("__sk"))
      .agg(sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__np") *
          (lit(2L) * col("__below") + col("__nn"))).as("__u2"))
      .select(col("__sk").getField("stratum").as("stratum"),
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), decimals))
          .as("auc"))
  }

  /** Spearman rank correlation between two integral signals: Pearson
    * over tie-averaged ranks (Spearman 1904; the tie-aware form, NOT
    * the 6·Σd² shortcut, which is only valid tie-free). Returns ONE
    * row `(n, rho)` — `rho` rounded to `decimals`, null when n < 2 or
    * either signal is constant (zero rank variance). Rows where either
    * signal is null are excluded.
    *
    * Exactness: the tie-averaged rank of value v is
    * `below(v) + (c(v) + 1) / 2`; doubling (`r2 = 2·below + c + 1`)
    * keeps it integral. All five moment sums accumulate in
    * decimal(38,0) — exact: Σ r2x·r2y <= 4n³ < 10^38 for any real
    * corpus — and only the final correlation assembles in double (the
    * q171 discipline), from integer sums both engines agree on
    * bit-for-bit.
    *
    * Plan shape: one slim (x, y) projection; per-signal rank ledgers
    * via [[withBelow]] (grouped by distinct value — corpus rows never
    * window-sort); two equi-joins stamping ranks back onto the rows
    * (ledger-sized build sides); one global moment fold. */
  def spearman(df: DataFrame, x: Column, y: Column,
      buckets: Int = 256, decimals: Int = 4): DataFrame = {
    val base = df
      .select(x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def rankLedger(v: String, r: String): DataFrame =
      withBelow(
        base.groupBy(col(v)).agg(count(lit(1)).as("__c")),
        v, "__c", buckets, "__below")
        .select(col(v),
          (lit(2L) * col("__below") + col("__c") + lit(1L)).as(r))
    val dec = "decimal(38,0)"
    val m = base
      .join(rankLedger("__x", "__rx"), "__x")
      .join(rankLedger("__y", "__ry"), "__y")
      .agg(count(lit(1)).as("n"),
        sum(col("__rx").cast(dec)).as("__sx"),
        sum(col("__ry").cast(dec)).as("__sy"),
        sum((col("__rx").cast(dec) * col("__ry")).cast(dec)).as("__sxy"),
        sum((col("__rx").cast(dec) * col("__rx")).cast(dec)).as("__sxx"),
        sum((col("__ry").cast(dec) * col("__ry")).cast(dec)).as("__syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val varX = nD * d("__sxx") - d("__sx") * d("__sx")
    val varY = nD * d("__syy") - d("__sy") * d("__sy")
    m.select(col("n"),
      when(col("n") >= 2 && varX > 0 && varY > 0,
        round((nD * d("__sxy") - d("__sx") * d("__sy")) /
          (sqrt(varX) * sqrt(varY)), decimals))
        .as("rho"))
  }

  /** Per-group ordinary-least-squares trend line of an integral signal
    * `y` against an integral regressor `x` (a time bucket, a batch id):
    * one ledger row per group `(grp, n, slope, icept)` — the drift
    * monitor read "is this source's quality trending down", the
    * regression complement of [[graft.operators.TextStats]]' KS /
    * KL drift snapshots.
    *
    * Exactness: the five moment sums accumulate in decimal(38,0) —
    * exact for any real corpus — and only the closed-form assembly
    * (`slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, intercept from the
    * means) runs in double, from integer sums both engines agree on
    * bit-for-bit (the q171 discipline). `slope`/`icept` are null when
    * n < 2 or x is constant within the group (the line is undefined,
    * not 0). Rows with a null x or y are excluded.
    *
    * Plan shape: ONE partial+final aggregate over a slim 3-column
    * projection — no windows, no joins, nothing driver-side. */
  def olsTrend(df: DataFrame, group: Column, x: Column, y: Column,
      decimals: Int = 6): DataFrame = {
    val dec = "decimal(38,0)"
    val m = df
      .select(group.as("grp"), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum((col("__x").cast(dec) * col("__y")).cast(dec)).as("__sxy"),
        sum((col("__x").cast(dec) * col("__x")).cast(dec)).as("__sxx"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val den = nD * d("__sxx") - d("__sx") * d("__sx")
    val slope = (nD * d("__sxy") - d("__sx") * d("__sy")) / den
    m.select(col("grp"), col("n"),
      when(col("n") >= 2 && den > 0, round(slope, decimals)).as("slope"),
      when(col("n") >= 2 && den > 0,
        round((d("__sy") - slope * d("__sx")) / nD, decimals)).as("icept"))
  }

  /** 2-D Pareto frontier (the skyline operator, Börzsönyi 2001): the
    * rows no other row dominates, where `a` dominates `b` iff
    * `x_a >= x_b && y_a >= y_b` with at least one strict — both
    * criteria maximized. Duplicated points never dominate each other,
    * so all copies of a frontier point survive. Returns the input
    * rows (original columns) filtered to the frontier.
    *
    * In 2-D the frontier is the STAIRCASE: a row survives iff its y is
    * the maximum within its x AND strictly exceeds every y at larger
    * x. That makes the skyline — quadratic in general dimension — two
    * ledger passes here: one (x → max y) aggregate, the bucketed
    * prefix-MAX over descending x (the [[Sampling.topKWithTies]]
    * device with the max monoid), and a pure per-row filter. No
    * windows over corpus rows, no pairwise comparisons. */
  def paretoFrontier2D(df: DataFrame, x: Column, y: Column,
      buckets: Int = 256): DataFrame = {
    val pts = df
      .withColumn("__x", x.cast("long"))
      .withColumn("__y", y.cast("long"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val ledger = pts.groupBy(col("__x")).agg(max(col("__y")).as("__my"))
      .withColumn("__nx", -col("__x"))
    val withAbove =
      exclusivePrefixMax(ledger, "__nx", "__my", buckets, "__above")
        .select(col("__x"), col("__my"), col("__above"))
    // the ledger is distinct-x-sized (domain-bounded for integral
    // signals — the module contract); the join back to rows is a
    // plain equi-join on x
    pts.join(withAbove, Seq("__x"))
      .filter(col("__y") === col("__my") &&
        (col("__above").isNull || col("__y") > col("__above")))
      .drop("__x", "__y", "__my", "__above")
  }

  /** Exact per-stratum median + MAD (median absolute deviation —
    * Hampel's robust scale estimate) over an integral signal, with a
    * robust-z outlier count: one ledger row per stratum
    * `(stratum, n_docs, med2, mad4, n_outliers)` where
    * `med2 = 2·median(x)`, `mad4 = 4·MAD(x)` (both exact integers —
    * doubling clears the even-count midpoint average, the repo-wide
    * fixed-point discipline), and an outlier is `|x − med| > k·MAD`,
    * evaluated as the integer predicate `2·dev2 > k·mad4` with
    * `dev2 = |2x − med2|`.
    *
    * Scale shape: the corpus is scanned ONCE and shuffled ONCE, into
    * the `(stratum, value) → count` ledger; every subsequent step —
    * cumulative counts, the two order statistics bracketing the
    * median, the deviation re-ledger (derived from the value ledger,
    * not the corpus), MAD, and the outlier count — runs on ledger
    * rows. The ledger windows partition BY STRATUM over DISTINCT
    * VALUES, so partition size is bounded by the signal's value
    * domain (char lengths, milli-scores — domain-bounded by
    * construction), not by corpus rows; callers with genuinely
    * unbounded-domain signals should quantize the value first (the
    * same contract as [[auc]]'s score).
    *
    * Null values are excluded from the statistic; a null stratum is
    * its own ledger row (Spark and DuckDB group nulls identically). */
  /** Calibration reliability bins: equal-width bins over a
    * non-negative integral milli score, each with its doc count,
    * positive count, exact positive RATE (milli, truncating) and mean
    * score (milli, truncating) — the reliability-diagram ledger read
    * next to [[auc]]: AUC says the signal RANKS the cohort, this says
    * whether its VALUES mean what they claim (a bin whose pos_rate
    * sits far from its mean score is miscalibrated there, which
    * decides whether a global threshold is usable or per-bin cuts are
    * needed). One partial+final aggregate keyed by the bin — the bin
    * domain is score-range/width, model-sized by construction. All
    * arithmetic integral (`div`), so engines agree exactly; negative
    * scores are caller error (truncating vs floor division diverge
    * below zero — quantize first). */
  def calibrationBins(df: DataFrame, scoreMilli: Column, label: Column,
      width: Long): DataFrame = {
    require(width >= 1, "bin width must be positive")
    df.select(scoreMilli.cast("long").as("__s"),
        when(label, 1L).otherwise(0L).as("__y"))
      .filter(col("__s").isNotNull)
      .groupBy(expr(s"`__s` div ${width}L").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__y")).as("n_pos"),
        sum(col("__s")).as("__ssum"))
      .select(col("bin"), (col("bin") * lit(width)).as("bin_lo"),
        col("n_docs"), col("n_pos"),
        expr("(1000 * `n_pos`) div `n_docs`").as("pos_rate_milli"),
        expr("`__ssum` div `n_docs`").as("mean_score_milli"))
  }

  def medianMad(df: DataFrame, stratum: Column, value: Column,
      k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in [1, 1000]")
    // all internal keying goes through a struct-wrapped stratum:
    // complex-type equality is null-safe, so a NULL stratum survives
    // every equi-join below (a bare-column join key would drop it)
    // the value ledger is materialized ONCE (the dedupedRel
    // discipline): three consumers (totals, the median bracket, the
    // deviation re-ledger) would otherwise each re-run the corpus
    // shuffle's whole lineage
    val g = df
      .select(struct(stratum.as("stratum")).as("__sk"),
        value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__sk"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val totals = g.groupBy(col("__sk")).agg(sum(col("__c")).as("n"))
    // x_k = min value whose cumulative count reaches k; the median is
    // the (n+1) div 2 and n div 2 + 1 bracket (equal when n is odd)
    def bracket(ledger: DataFrame, v: String): DataFrame = {
      val cum = ledger
        .withColumn("__cum", sum(col("__c")).over(
          Window.partitionBy(col("__sk")).orderBy(col(v))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .join(broadcast(totals), Seq("__sk"))
      cum.groupBy(col("__sk")).agg(
        min(col("n")).as("n"),
        (min(when(col("__cum") >= expr("(`n` + 1) div 2"), col(v))) +
          min(when(col("__cum") >= expr("`n` div 2 + 1"), col(v))))
          .as("__stat2"))
    }
    val med = bracket(g, "__v")
      .select(col("__sk"), col("__stat2").as("med2"))
    // deviation ledger DERIVED from the value ledger (two values can
    // collapse onto one deviation, hence the re-aggregate)
    val devLedger = g.join(broadcast(med), Seq("__sk"))
      .select(col("__sk"),
        abs(lit(2L) * col("__v") - col("med2")).as("__d"), col("__c"))
      .groupBy(col("__sk"), col("__d"))
      .agg(sum(col("__c")).as("__c"))
    val mad = bracket(devLedger, "__d")
      .select(col("__sk"), col("__stat2").as("mad4"))
    val outliers = devLedger.join(broadcast(mad), Seq("__sk"))
      .groupBy(col("__sk"))
      .agg(sum(when(lit(2L) * col("__d") > lit(k.toLong) * col("mad4"),
        col("__c")).otherwise(lit(0L))).as("n_outliers"))
    totals.select(col("__sk"), col("n").as("n_docs"))
      .join(broadcast(med), Seq("__sk"))
      .join(broadcast(mad), Seq("__sk"))
      .join(broadcast(outliers), Seq("__sk"))
      .select(col("__sk").getField("stratum").as("stratum"),
        col("n_docs"), col("med2"), col("mad4"), col("n_outliers"))
  }

  /** Per-query reciprocal rank of the known-relevant item — the
    * per-row decomposition of MRR, the standard known-item retrieval
    * metric (Voorhees 1999, the TREC-8 QA track's measure; public
    * literature). `ranked` is a (qid, doc, rank) top-k retrieval
    * output ([[TextStats.bm25TopK]]'s shape); `truth` maps each query
    * to its one relevant doc. Returns one row per TRUTH query:
    * `(qid, hit_rank, rr_milli)` — `hit_rank` the relevant doc's rank
    * (0 when it missed the top-k), `rr_milli = 1000 div hit_rank`
    * (0 on a miss), exact integer arithmetic throughout so MRR sums
    * replay bit-identically (mean = sum(rr_milli) / n downstream).
    *
    * One equi-join on (qid, doc) against a k-bounded frame, left from
    * the truth side so missed queries surface as explicit zeros
    * rather than silently shrinking the denominator. */
  def reciprocalRank(
      ranked: DataFrame, qidCol: String, docCol: String, rankCol: String,
      truth: DataFrame, tQidCol: String, tDocCol: String): DataFrame = {
    val r = ranked.select(col(qidCol).as("qid"), col(docCol).as("__doc"),
      col(rankCol).cast("long").as("__rk"))
    truth.select(col(tQidCol).as("qid"), col(tDocCol).as("__doc"))
      .join(r, Seq("qid", "__doc"), "left")
      .select(col("qid"),
        coalesce(col("__rk"), lit(0L)).as("hit_rank"),
        coalesce(expr("1000 div `__rk`"), lit(0L)).as("rr_milli"))
  }

  /** Hard-negative mining from a retrieval run: the top-ranked
    * results that are NOT the query's positive, re-ranked 1..`n` in
    * retrieval order — the strongest contrastive negatives for
    * dense-retriever training (Karpukhin et al. 2020, "Dense Passage
    * Retrieval for Open-Domain Question Answering", which mines them
    * from exactly this BM25-top-k-minus-positive shape; public
    * literature). Returns `(qid, neg_rank, doc)`.
    *
    * One anti-join of the k-bounded ranked frame against the truth
    * pairs, then a per-query re-rank window over at most k survivors
    * — nothing here is corpus-sized (the retrieval already cut to
    * top-k). Queries whose entire top-k was the positive emit no
    * rows; queries missing from `truth` keep all k candidates. */
  def hardNegatives(
      ranked: DataFrame, qidCol: String, docCol: String, rankCol: String,
      truth: DataFrame, tQidCol: String, tDocCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "n must be positive")
    val r = ranked.select(col(qidCol).as("qid"), col(docCol).as("__doc"),
      col(rankCol).cast("long").as("__rk"))
    r.join(truth.select(col(tQidCol).as("qid"), col(tDocCol).as("__doc")),
        Seq("qid", "__doc"), "left_anti")
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("__rk"))))
      .filter(col("neg_rank") <= n)
      .select(col("qid"), col("neg_rank").cast("long").as("neg_rank"),
        col("__doc").as("doc"))
  }

  /** nDCG@k over a retrieval run with GRADED relevance (Järvelin &
    * Kekäläinen 2002, "Cumulated gain-based evaluation of IR
    * techniques"; the exponential-gain spelling popularized by Burges
    * et al. 2005 — public literature): the eval the binary-relevance
    * [[reciprocalRank]] cannot express (a rank-2 "perfect" answer and
    * a rank-2 "partial" answer score differently).
    *
    * Per TRUTH query: `dcg = Σ_{hits, rank<=k} (2^rel − 1) /
    * log2(rank+1)` over the retrieved hits, `idcg` the same sum over
    * the IDEAL ordering of that query's positive judgments (rel desc,
    * doc asc — a total order, so the cut is deterministic; zero-gain
    * judgments never occupy ideal positions), `ndcg = dcg/idcg`, NULL
    * when the query has no positive judgment (no denominator — made
    * explicit rather than a silent 0). dcg/idcg are rounded to 6 dp
    * BEFORE the division and the quotient rounded again, so both
    * engines divide identical operands (the repo's rounded-rank
    * discipline). Returns `(qid, dcg, idcg, ndcg)`, one row per
    * truth query with at least one non-NULL-doc judgment; queries
    * with judgments but no retrieved hit emit
    * explicit `dcg = 0` rows (the denominator never silently shrinks
    * — the [[reciprocalRank]] contract).
    *
    * Judgment hygiene (applied, not assumed): duplicate (qid, doc)
    * judgments collapse to their MAX relevance before anything else —
    * a doc judged twice must not contribute two dcg terms against one
    * retrieved rank nor occupy two ideal positions — and a NULL-doc
    * judgment is dropped (it can never match a retrieved hit, so
    * keeping it would inflate idcg and deflate ndcg forever).
    *
    * Shape: one (qid, doc) equi-join of the judgments against the
    * k-bounded ranked frame + one per-query window over the
    * judgments — everything is eval-set-sized, nothing corpus-sized
    * (the retrieval already cut to top-k). */
  def ndcgAtK(
      ranked: DataFrame, qidCol: String, docCol: String, rankCol: String,
      truth: DataFrame, tQidCol: String, tDocCol: String,
      tRelCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val ln2 = log(lit(2.0))
    val r = ranked.select(col(qidCol).as("qid"), col(docCol).as("__doc"),
      col(rankCol).cast("long").as("__rk"))
      .filter(col("__rk") <= k)
    val t = truth.select(col(tQidCol).as("qid"), col(tDocCol).as("__doc"),
      col(tRelCol).cast("long").as("__rel"))
      .filter(col("__doc").isNotNull)
      .groupBy("qid", "__doc").agg(max(col("__rel")).as("__rel"))
    def gainAt(pos: Column): Column =
      (pow(lit(2.0), col("__rel").cast("double")) - lit(1.0)) /
        (log(pos.cast("double") + lit(1.0)) / ln2)
    // rel <= 0 judgments carry ZERO gain on BOTH sides (the standard
    // nDCG treatment — TREC-style rel = -1 "judged junk" rows must not
    // inject NEGATIVE gain into dcg while being excluded from idcg,
    // which would push ndcg outside [0,1]); filtering them before the
    // join also shrinks its input (rel = 0's 2^0 - 1 gain is 0 anyway)
    val dcg = t.filter(col("__rel") > 0).join(r, Seq("qid", "__doc"))
      .select(col("qid"), gainAt(col("__rk")).as("__g"))
      .groupBy("qid").agg(round(sum(col("__g")), 6).as("dcg"))
    val idcg = t.filter(col("__rel") > 0)
      .withColumn("__pos", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("__rel").desc, col("__doc"))))
      .filter(col("__pos") <= k)
      .select(col("qid"), gainAt(col("__pos")).as("__g"))
      .groupBy("qid").agg(round(sum(col("__g")), 6).as("idcg"))
    t.select("qid").distinct()
      .join(dcg, Seq("qid"), "left")
      .join(idcg, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"),
        coalesce(col("idcg"), lit(0.0)).as("idcg"),
        when(coalesce(col("idcg"), lit(0.0)) > 0,
          round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6))
          .as("ndcg"))
  }

  /** The judgment-hygiene frame shared by the set-overlap evals
    * ([[precisionRecallAtK]], [[averagePrecisionAtK]]): duplicate
    * (qid, doc) judgments collapse to their MAX relevance, NULL-doc
    * judgments drop, and only positives (`rel > 0` — the binary view
    * of graded truth, [[ndcgAtK]]'s zero-gain treatment) survive, as
    * `(qid, __doc)`. NOT shared with [[ndcgAtK]] itself: its
    * denominator row set deliberately keeps queries whose judgments
    * are all non-positive (explicit NULL ndcg), which this frame
    * drops (no positives ⇒ recall/AP have no denominator at all). */
  private def positives(
      truth: DataFrame, tQidCol: String, tDocCol: String,
      tRelCol: String): DataFrame =
    truth.select(col(tQidCol).as("qid"), col(tDocCol).as("__doc"),
      col(tRelCol).cast("long").as("__rel"))
      .filter(col("__doc").isNotNull)
      .groupBy("qid", "__doc").agg(max(col("__rel")).as("__rel"))
      .filter(col("__rel") > 0)
      .select(col("qid"), col("__doc"))

  /** The k-bounded ranked frame shared by the set-overlap evals, with
    * [[rrfFuse]]'s 1-based-rank contract enforced IN-PLAN: a NULL or
    * < 1 rank raises loudly instead of silently skewing the metric (a
    * 0-based run would keep k+1 docs past the `<= k` cut here, and
    * NULL out of AP's integer division — the exact silent-divergence
    * class the rrfFuse guard exists for). Ranks are validated on
    * EVERY input row, not only the kept ones. The ranked frame must
    * be a ranking — one row per (qid, doc) — as everywhere in this
    * file; a doc listed twice would double-count its hit. */
  private def rankedAtK(
      op: String, ranked: DataFrame, qidCol: String, docCol: String,
      rankCol: String, k: Int): DataFrame = {
    val rk = col(rankCol).cast("long")
    ranked.select(col(qidCol).as("qid"), col(docCol).as("__doc"),
      when(rk.isNull || rk < lit(1L), raise_error(concat(
        lit(s"$op: `$rankCol` must be a 1-based rank, got "),
        coalesce(col(rankCol).cast("string"), lit("NULL")))))
        .otherwise(rk).as("__rk"))
      .filter(col("__rk") <= k)
  }

  /** Precision@k and recall@k over a retrieval run — the set-overlap
    * evals beside the rank-aware [[ndcgAtK]]/[[averagePrecisionAtK]],
    * in exact integer milli units (the rrf_micro discipline, so both
    * engines compute identical values with no float step): per truth
    * query with at least one positive judgment,
    * `(qid, n_rel, hits, p_milli, r_milli)` where `hits` =
    * |top-k ∩ positives|, `p_milli = 1000*hits div k`, `r_milli =
    * 1000*hits div n_rel`. Judgment hygiene per [[positives]];
    * queries with positives but no retrieved hit emit explicit zero
    * rows (the [[reciprocalRank]] denominator contract — macro
    * averages downstream must never silently shrink).
    *
    * Shape: one (qid, doc) equi-join of the positives against the
    * k-bounded ranked frame + two per-query counts — everything
    * eval-set-sized, nothing corpus-sized. */
  def precisionRecallAtK(
      ranked: DataFrame, qidCol: String, docCol: String, rankCol: String,
      truth: DataFrame, tQidCol: String, tDocCol: String,
      tRelCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val pos = positives(truth, tQidCol, tDocCol, tRelCol)
    val r = rankedAtK("precisionRecallAtK", ranked, qidCol, docCol,
      rankCol, k)
    val nrel = pos.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val hits = pos.join(r, Seq("qid", "__doc"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    nrel.join(hits, Seq("qid"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(col("qid"), col("n_rel"), col("hits"),
        expr(s"1000 * hits div $k").as("p_milli"),
        expr("1000 * hits div n_rel").as("r_milli"))
  }

  /** Average precision@k — the per-query decomposition of MAP (mean
    * average precision, the classic TREC summary metric; Manning,
    * Raghavan & Schütze 2008 §8.4, public literature) — in exact
    * integer micro units: for the i-th hit (by rank) at rank `r <= k`,
    * `prec_i = 1000000 * i div r`; `ap_micro = (Σ_i prec_i) div
    * min(n_rel, k)`. Integer division at each step keeps replays
    * bit-identical across engines (the float spelling differs in
    * last-ulp association order). Judgment hygiene per [[positives]]
    * (`rel > 0` = relevant); ranks must be distinct per query (a
    * ranking — every operator here emits one; the hit index breaks
    * any residual tie on doc id, so the output is total either way).
    * Returns one row per truth query with at least one positive:
    * `(qid, n_rel, hits, ap_micro)`, explicit zeros for no-hit
    * queries; MAP = avg(ap_micro)/1e6 downstream.
    *
    * Shape: one (qid, doc) equi-join + one per-query window over at
    * most k hits — eval-set-sized, nothing corpus-sized. */
  def averagePrecisionAtK(
      ranked: DataFrame, qidCol: String, docCol: String, rankCol: String,
      truth: DataFrame, tQidCol: String, tDocCol: String,
      tRelCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val pos = positives(truth, tQidCol, tDocCol, tRelCol)
    val r = rankedAtK("averagePrecisionAtK", ranked, qidCol, docCol,
      rankCol, k)
    val nrel = pos.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val prec = pos.join(r, Seq("qid", "__doc"))
      // cast to long BEFORE the multiply: row_number is 32-bit, and
      // `1000000 * __i` in int silently wraps past hit index 2147
      // under non-ANSI arithmetic while the BIGINT oracle stays
      // correct — the bit-identity discipline forbids the divergence
      .withColumn("__i", row_number().over(Window.partitionBy("qid")
        .orderBy(col("__rk"), col("__doc"))).cast("long"))
      .select(col("qid"),
        expr("1000000 * `__i` div `__rk`").as("__p"))
    val ap = prec.groupBy("qid")
      .agg(sum(col("__p")).as("__sp"), count(lit(1)).as("hits"))
    nrel.join(ap, Seq("qid"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(col("qid"), col("n_rel"), col("hits"),
        expr(s"coalesce(`__sp`, cast(0 as bigint)) div " +
          s"least(n_rel, cast($k as bigint))").as("ap_micro"))
  }

  /** Reciprocal-rank fusion of N retrieval runs (Cormack, Clarke &
    * Büttcher 2009, "Reciprocal rank fusion outperforms Condorcet and
    * individual rank learning methods" — public literature; the
    * standard hybrid-retrieval combiner, e.g. BM25 ⊕ dense ANN):
    * per (query, doc), `rrf_micro = Σ_runs 1000000 div (kRrf + rank)`
    * — the 1/(k+rank) sum in exact integer micro units, so fusion
    * replays bit-identically across engines with no float rounding
    * step — then the per-query top-`k` by (rrf_micro desc, doc asc),
    * a total order. A doc absent from a run contributes nothing for
    * that run (the standard treatment); each run frame must carry one
    * row per (query, doc).
    *
    * Ranks must be 1-BASED (`rank >= 1`, the shape every retrieval
    * operator here emits) — enforced IN-PLAN with a loud error, not
    * assumed: with `kRrf = 0` a 0-based run would make
    * `1000000 div 0` evaluate to NULL under Spark's non-ANSI
    * division and silently VANISH from the fused sum (while an ANSI
    * engine errors on the same input) — a contract violation must
    * refuse identically on every engine, never diverge silently.
    * With `rank >= 1` and `kRrf >= 0` the divisor is always >= 1.
    *
    * Returns `(qid, fused_rank, doc, rrf_micro)`. Shape: a union of
    * k-bounded run frames + one keyed sum + one per-query window —
    * everything is eval-set-sized (the retrievals already cut to
    * top-k), nothing corpus-sized. */
  def rrfFuse(
      runs: Seq[DataFrame], qidCol: String, docCol: String,
      rankCol: String, k: Int, kRrf: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    require(k >= 1, "k must be positive")
    require(kRrf >= 0, "kRrf must be non-negative")
    val contribs = runs.map { run =>
      val rk = col(rankCol).cast("long")
      run.select(
        col(qidCol).as("qid"), col(docCol).as("doc"),
        when(rk.isNull || rk < lit(1L), raise_error(concat(
          lit(s"rrfFuse: `$rankCol` must be a 1-based rank, got "),
          coalesce(col(rankCol).cast("string"), lit("NULL")))))
          .otherwise(
            expr(s"1000000 div (cast(`$rankCol` as bigint) + $kRrf)"))
          .as("__c"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy("qid", "doc").agg(sum(col("__c")).as("rrf_micro"))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("rrf_micro").desc, col("doc"))))
      .filter(col("fused_rank") <= k)
      .select(col("qid"), col("fused_rank").cast("long").as("fused_rank"),
        col("doc"), col("rrf_micro"))
  }
}
