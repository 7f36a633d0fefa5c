package graft.operators

import org.apache.spark.sql.DataFrame

/** The one spread policy, shared by every operator family that exposes
  * a `spread: Boolean` knob ([[Dedup]], [[Similarity]]): round-robin
  * the input across defaultParallelism partitions so compute-heavy
  * kernels parallelize even when the scan yields few splits (our
  * single-row-group test parquet scans as ONE partition). It IS a full
  * input exchange — callers on well-split production data pass
  * `spread = false` and compute in place. Centralized so a future
  * policy change (conf-driven sizing, range partitioning) cannot
  * silently diverge between operator families.
  */
private[operators] object Spread {
  def apply(df: DataFrame, spread: Boolean): DataFrame =
    if (spread)
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df
}
