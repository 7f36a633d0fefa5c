package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HLL-family approximate distinct counting (SURVEY §2.2
  * "Aggregations": approx_count_distinct). Exact distinct is gated by
  * q12; the sketch variants are engine-specific (Spark HLL++ vs DuckDB
  * HLL differ by construction), so they are bounded against the exact
  * answer here instead of an oracle.
  */
class ApproxDistinctSpec extends SparkSpec {

  private lazy val events = graft.Tables(spark, sf("sf0.001"), "events")

  test("approx_count_distinct within 5% of exact") {
    val row = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("hll sketches merge across partitions (union = distinct of union)") {
    // build one sketch per event_type, union them, estimate — the
    // mergeable-sketch path a 100 TB rollup would use (sketch once,
    // re-aggregate cheaply at any grain)
    val perType = events.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = perType.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head().getLong(0)
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"exact=$exact merged=$merged")
  }
}
