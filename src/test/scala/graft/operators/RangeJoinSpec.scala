package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  test("pointInInterval matches the naive BETWEEN join, incl. negatives") {
    import spark.implicits._
    val points = Seq(-25L, -10L, -1L, 0L, 3L, 7L, 10L, 99L, 100L, 101L)
      .toDF("p").withColumn("p_id", monotonically_increasing_id())
    val intervals = Seq(
      (1L, -30L, -20L), (2L, -5L, 5L), (3L, 0L, 10L),
      (4L, 90L, 100L), (5L, 200L, 300L))
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      binWidth = 7L)
      .select("iv_id", "p").as[(Long, Long)].collect().toSet
    val want = (for {
      p <- Seq(-25L, -10L, -1L, 0L, 3L, 7L, 10L, 99L, 100L, 101L)
      (iv, lo, hi) <- Seq((1L, -30L, -20L), (2L, -5L, 5L), (3L, 0L, 10L),
        (4L, 90L, 100L), (5L, 200L, 300L))
      if p >= lo && p <= hi
    } yield (iv, p)).toSet
    assert(got === want)
  }

  test("range join plans as an equi-join, not a nested loop") {
    import spark.implicits._
    val points = (1L to 100L).toDF("p")
    val intervals = (1L to 50L).map(i => (i, i * 10, i * 10 + 9))
      .toDF("iv_id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      binWidth = 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("randomized: equals the naive BETWEEN join for arbitrary data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val pts = Seq.fill(300)(rnd.between(-1000L, 1000L)).distinct
      val ivs = Seq.tabulate(120) { i =>
        val lo = rnd.between(-1100L, 1100L)
        (i.toLong, lo, lo + rnd.between(0L, 150L))
      }
      val binWidth = Seq(7L, 64L, 1000L)(trial - 1)
      val got = RangeJoin.pointInInterval(
        pts.toDF("p"), ivs.toDF("iv_id", "lo", "hi"),
        "p", "lo", "hi", binWidth)
        .select("iv_id", "p").as[(Long, Long)].collect().toSet
      val want = (for {
        p <- pts; (iv, lo, hi) <- ivs if p >= lo && p <= hi
      } yield (iv, p)).toSet
      assert(got === want, s"trial $trial binWidth=$binWidth")
    }
  }

  test("equiKeys confine matches to the same key") {
    import spark.implicits._
    val points = Seq(("u1", 5L), ("u2", 5L)).toDF("user", "p")
    val intervals = Seq(("u1", 0L, 10L)).toDF("user", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      binWidth = 10L, equiKeys = Seq("user"))
      .select("user").as[String].collect().toSeq
    assert(got === Seq("u1"))
  }

  test("epoch-nanosecond magnitudes bin exactly (no double rounding)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val base = 1_700_000_000_000_000_000L // ~2023 in epoch nanos
    val binWidth = 1_000_000_000L
    val pts = Seq.fill(400)(base + rnd.between(-5_000_000_000L, 5_000_000_000L))
      .distinct
    val ivs = Seq.tabulate(80) { i =>
      val lo = base + rnd.between(-5_500_000_000L, 5_500_000_000L)
      (i.toLong, lo, lo + rnd.between(0L, 3_000_000_000L))
    }
    val got = RangeJoin.pointInInterval(
      pts.toDF("p"), ivs.toDF("iv_id", "lo", "hi"),
      "p", "lo", "hi", binWidth)
      .select("iv_id", "p").as[(Long, Long)].collect().toSet
    val want = (for {
      p <- pts; (iv, lo, hi) <- ivs if p >= lo && p <= hi
    } yield (iv, p)).toSet
    assert(got === want)
  }

  test("negative values keep floor-aligned bins") {
    import spark.implicits._
    // interval straddling zero: a truncating (toward-zero) bin would
    // put -1 and +1 in the same bin 0 and still pass the final filter,
    // but a point in [-10, -6] with binWidth 5 must land in bin -2
    // to MEET its interval at all.
    val pts = Seq(-8L)
    val ivs = Seq((1L, -10L, -6L))
    val got = RangeJoin.pointInInterval(
      pts.toDF("p"), ivs.toDF("iv_id", "lo", "hi"),
      "p", "lo", "hi", binWidth = 5L)
      .select("iv_id", "p").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, -8L)))
  }
}
