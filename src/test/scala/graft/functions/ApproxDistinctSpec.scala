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

  test("count-min sketch: frequency estimates within eps*N, never under") {
    // the third mergeable sketch beside HLL (distinct) and KLL-ish
    // quantiles: heavy-hitter frequencies without a (token, count)
    // shuffle of the whole vocabulary. CMS guarantees estimate >=
    // true and estimate <= true + eps*N with prob 1-delta.
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val eps = 0.01
    val n = toks.count()
    val sketch = toks.select(
      count_min_sketch(col("tok"), lit(eps), lit(0.99), lit(42))
        .as("sk")).head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch))
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (tok, c) =>
      val est = cms.estimateCount(tok)
      assert(est >= c, s"CMS underestimated $tok: $est < $c")
      assert(est <= c + (eps * n).toLong + 1,
        s"CMS error bound violated for $tok: est=$est true=$c n=$n")
    }
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
