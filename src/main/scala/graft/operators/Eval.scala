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
    val mm = g.agg(min(col("__s")).as("__lo"), max(col("__s")).as("__hi"))
    val bucketed = g.crossJoin(broadcast(mm))
      .withColumn("__bkt",
        floor((col("__s") - col("__lo")).cast("double") * buckets /
          (col("__hi") - col("__lo") + lit(1)).cast("double"))
          .cast("long"))
    val inBucket = Window.partitionBy(col("__bkt")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withInner = bucketed.withColumn("__inner",
      coalesce(sum(col("__nn")).over(inBucket), lit(0L)))
    val bucketBase = withInner.groupBy(col("__bkt"))
      .agg(sum(col("__nn")).as("__btot"))
      .withColumn("__base", coalesce(
        sum(col("__btot")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__base"))
    withInner
      .join(broadcast(bucketBase), "__bkt")
      .agg(sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__np") *
          (lit(2L) * (col("__base") + col("__inner")) + col("__nn")))
          .as("__u2"))
      .select(
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), decimals))
          .as("auc"))
  }
}
