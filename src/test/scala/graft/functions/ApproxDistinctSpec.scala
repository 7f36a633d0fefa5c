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

  test("approx_percentile within rank tolerance of exact percentiles") {
    // exact percentiles (q48) need a full sort per group; the sketch is
    // the 100 TB path. approx_percentile(col, p, accuracy) guarantees a
    // RANK error <= n/accuracy, so assert on the value's true rank
    // rather than on the value itself.
    val n = events.count()
    val accuracy = 1000
    val approx = events.agg(
      percentile_approx(col("value"), lit(0.5), lit(accuracy))).head().getDouble(0)
    val rank = events.filter(col("value") <= approx).count()
    assert(math.abs(rank - n / 2.0) <= n.toDouble / accuracy + 1,
      s"n=$n approxMedian=$approx rank=$rank")
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
