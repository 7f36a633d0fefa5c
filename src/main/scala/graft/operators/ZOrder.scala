package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Scalars

/** Z-order (Morton-curve) data clustering — the lakehouse layout
  * optimization (public technique: Morton 1966; Delta's OPTIMIZE
  * ZORDER, Iceberg sort orders) that makes MULTI-column min/max file
  * pruning work. Range-partitioning by a single column gives perfect
  * pruning on that column and none on any other; interleaving the
  * bucketed bits of several columns gives every key locality, so a
  * selective predicate on ANY of them skips most files at scan time.
  *
  * At 100 TB this is a write-once cost that every subsequent scan
  * collects on: parquet footers carry per-file min/max, and a z-ordered
  * layout turns those from useless (each file spans the whole domain of
  * the non-partitioning columns) into tight boxes along the curve.
  *
  * Scale shape: each key is quantile-bucketed to 8 bits against its
  * approx_percentile boundaries — a mergeable sketch aggregation whose
  * 255-double result enters the plan as a scalar subquery (model-sized,
  * lazy, no driver action, no corpus-sized window — an exact
  * `percent_rank` spelling would move the whole dataset through ONE
  * task). Quantile bucketing also means skewed domains still spread
  * over the full grid. Bucket lookup and bit interleaving are pure
  * Column expressions.
  */
object ZOrder {

  private val Bits = 8

  /** Interleave the low `Bits` bits of the given int columns (first
    * column gets the highest-order bit positions). */
  def interleave(cols: Seq[Column]): Column = {
    require(cols.nonEmpty && cols.size * Bits <= 63,
      s"1..${63 / Bits} columns supported")
    val n = cols.size
    // bit b of column c lands at position b*n + (n-1-c)
    val parts = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until Bits
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + (n - 1 - ci))
    parts.reduce(_.bitwiseOR(_))
  }

  /** Add a `zval` column: each key quantile-bucketed to [0, 2^8) then
    * bit-interleaved. Keys must be numeric. */
  def withZValue(df: DataFrame, keys: Seq[String]): DataFrame = {
    val nBuckets = 1 << Bits
    val pcts = array((1 until nBuckets).map(i =>
      lit(i.toDouble / nBuckets)): _*)
    // ALL keys' boundary arrays come from ONE aggregation (a single
    // corpus scan however many keys interleave), entering the plan as
    // one array<array<double>> scalar subquery. It is projected into a
    // column first because subquery expressions may not appear inside a
    // higher-order-function lambda.
    val boundsAgg = df.agg(
      array(keys.map(k =>
        percentile_approx(col(k).cast("double"), pcts, lit(10000))): _*)
        .as("b"))
    val withBounds = df.withColumn("__zb", Scalars.of(boundsAgg))
    val normalized = keys.zipWithIndex.map { case (k, i) =>
      size(filter(col("__zb").getItem(i), b => b <= col(k).cast("double")))
        .cast("long")
    }
    withBounds.withColumn("zval", interleave(normalized))
      .drop("__zb")
  }

  /** Cluster rows into `numFiles` range partitions of the Morton curve
    * (each output file covers a contiguous z-range = a tight box in
    * key space). Write the result with any sink; drop `zval` first if
    * the schema must stay clean. */
  def clusterBy(df: DataFrame, keys: Seq[String], numFiles: Int): DataFrame =
    withZValue(df, keys).repartitionByRange(numFiles, col("zval"))
}
