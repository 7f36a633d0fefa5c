package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: concatenate documents in a deterministic
  * content-stable order and split the stream at fixed token budgets —
  * the "concat and chunk" packing every LLM pre-training pipeline runs
  * to turn ragged documents into fixed-length sequences.
  *
  * The defining computation is a GLOBAL running token offset. The
  * naive spelling — `sum(tok).over(Window.orderBy(...))` with no
  * partitioning — moves the whole corpus into ONE task (Spark warns
  * "No Partition Defined for Window operation"); at 100 TB that's the
  * scale-killer. This implementation is the classic two-phase
  * distributed prefix sum instead:
  *
  *   1. every row gets a RANGE BUCKET = the first byte of its md5 sort
  *      key, so bucket order == global order prefix (256 buckets);
  *   2. the running sum WITHIN each bucket is an ordinary partitioned
  *      window — parallel across buckets;
  *   3. per-bucket totals (256 rows, model-sized) get their own running
  *      sum — the only single-partition window, over 256 rows — and
  *      broadcast-join back as each bucket's base offset.
  *
  * Result: identical to the global window (the oracle recomputes it
  * that way), with the corpus-sized work fully parallel. Offsets are
  * integral longs throughout (`div`, not `/` — double division loses
  * exactness past 2^53, the same bug class as epoch-nano timestamps).
  */
object Packing {

  /** Adds `tok` (weight), `off` (exclusive running offset), `seq`
    * (budget-sized sequence id the doc STARTS in) and `straddles`
    * (whether it crosses a sequence boundary) to `df`. `weight` must
    * be a non-negative integral Column. */
  def packSequences(
      df: DataFrame, idCol: String, weight: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    // working columns are __-prefixed so caller columns with the same
    // names survive; tok/off/seq/straddles are the declared outputs
    val keyed = df
      .withColumn("tok", weight.cast("long"))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__bucket", substring(col("__h"), 1, 2))
    val inBucket = Window.partitionBy("__bucket")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withInner = keyed.withColumn("__inner",
      coalesce(sum(col("tok")).over(inBucket), lit(0L)))
    // 256-row bucket ledger: the single-partition window is model-sized
    // by construction, never corpus-sized.
    val bucketBase = withInner.groupBy("__bucket")
      .agg(sum(col("tok")).as("__btot"))
      .withColumn("__base", coalesce(
        sum(col("__btot")).over(Window.orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bucket", "__base")
    withInner
      .join(broadcast(bucketBase), "__bucket")
      .withColumn("off", col("__base") + col("__inner"))
      .withColumn("seq", expr(s"off div ${budget}L"))
      .withColumn("straddles",
        col("tok") > 0 &&
          expr(s"(off + tok - 1) div ${budget}L") > col("seq"))
      .drop("__h", "__bucket", "__inner", "__base")
  }
}
