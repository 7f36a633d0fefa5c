package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join via interval bucketing — the standard
  * equi-join rewrite of `point BETWEEN lo AND hi` (the same family of
  * rewrite Spark vendors expose as "range join optimization"; the
  * reference has no join operator at all, SURVEY §2.2).
  *
  * Naively, Spark plans a non-equi join condition as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a broadcast of
  * a whole side. Here both sides are instead keyed by
  * `floor(value / binWidth)`: each interval is exploded to the bins it
  * overlaps, each point lands in exactly one bin, and the join becomes
  * a plain shuffled equi-join on (bin [, extra equi keys]) followed by
  * the exact `BETWEEN` filter. With binWidth chosen near the typical
  * interval length, each interval explodes to ~2 bins, so shuffle
  * volume is ~2·|intervals| + |points| rows — hash-partitioned,
  * spillable, AQE-balanceable, no broadcast of anything data-sized.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose closed
    * interval [loCol, hiCol] contains pointCol. All three columns must
    * be integral (cast timestamps to epoch ms/µs first); column names
    * of the two inputs must be disjoint. `equiKeys` are additional
    * exact-match join keys present on both sides (e.g. a user id).
    *
    * binWidth: bucketing granularity. Intervals explode to
    * ceil(len/binWidth)+1 bins — pick it near the common interval
    * length. Correctness does not depend on it, only shuffle size.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // Exact integral floor-div. A double-division floor is exact only
    // below 2^53 — epoch-NANOS (~1.7e18) silently land in the wrong
    // bin. `div` alone truncates toward zero, so subtract pmod (always
    // non-negative for positive binWidth) first: the dividend becomes
    // exactly divisible and truncation direction stops mattering,
    // preserving floor semantics for negative inputs too.
    def bin(c: org.apache.spark.sql.Column) = {
      import org.apache.spark.sql.GraftSqlBridge
      import org.apache.spark.sql.catalyst.expressions.IntegralDivide
      val v = c.cast("long")
      GraftSqlBridge.column(IntegralDivide(
        GraftSqlBridge.expression(v - pmod(v, lit(binWidth))),
        GraftSqlBridge.expression(lit(binWidth))))
    }
    val ivx = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val ptx = points.withColumn("__bin", bin(col(pointCol)))
    ptx.join(ivx, Seq("__bin") ++ equiKeys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
