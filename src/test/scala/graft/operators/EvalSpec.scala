package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rank-metric evaluation ([[Eval]]): tie-aware AUC vs hand cases and
  * an all-pairs brute force, degenerate classes, and bucket-count
  * invariance (the two-phase prefix sum is an implementation detail —
  * the statistic must not see it). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  /** All-pairs reference: P(pos > neg) + P(pos == neg)/2. */
  private def bruteAuc(rows: Seq[(Long, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    num.toDouble / (2.0 * pos.size * neg.size)
  }

  private def runAuc(rows: Seq[(Long, Boolean)], buckets: Int = 256)
      : (Long, Long, Option[Double]) = {
    val r = Eval.auc(rows.toDF("s", "y"), col("s"), col("y"),
        buckets = buckets, decimals = 9)
      .collect().head
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  private def r9(x: Double) = BigDecimal(x)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("auc: hand cases — perfect separation, perfect inversion, " +
      "all-tied = 0.5") {
    val perfect = Seq((10L, true), (9L, true), (1L, false), (2L, false))
    assert(runAuc(perfect) === ((2L, 2L, Some(1.0))))
    val inverted = perfect.map { case (s, y) => (s, !y) }
    assert(runAuc(inverted) === ((2L, 2L, Some(0.0))))
    val tied = Seq((5L, true), (5L, false), (5L, true), (5L, false))
    assert(runAuc(tied) === ((2L, 2L, Some(0.5))))
  }

  test("auc: a degenerate class (no positives / no negatives / empty " +
      "input) reports null, not 0.5") {
    assert(runAuc(Seq((1L, true), (2L, true))) === ((2L, 0L, None)))
    assert(runAuc(Seq((1L, false), (2L, false))) === ((0L, 2L, None)))
    assert(runAuc(Seq.empty[(Long, Boolean)]) === ((0L, 0L, None)))
  }

  test("auc agrees with the all-pairs brute force on seeded random " +
      "data with heavy ties, at several bucket counts") {
    val rnd = new Random(19)
    // scores drawn from a small range so ties are common; labels
    // correlated with score so the AUC is informative, not 0.5
    val rows = (1 to 400).map { _ =>
      val s = rnd.nextInt(20).toLong
      (s, rnd.nextInt(20) < s + 3)
    }
    val want = r9(bruteAuc(rows))
    for (b <- Seq(1, 7, 256)) {
      val (np, nn, got) = runAuc(rows, buckets = b)
      assert(np === rows.count(_._2).toLong)
      assert(nn === rows.count(!_._2).toLong)
      assert(got === Some(want), s"buckets=$b")
    }
  }

  test("auc: negative scores and a single distinct score bucket edge") {
    val rows = Seq((-5L, false), (-1L, true), (0L, false), (3L, true))
    assert(runAuc(rows, buckets = 2)._3 === Some(r9(bruteAuc(rows))))
  }
}
