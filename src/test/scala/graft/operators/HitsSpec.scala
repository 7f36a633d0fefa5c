package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Integer fixed-point HITS. Ground truth is an in-test replay of the
  * exact arithmetic (long sums, L∞ normalization by truncating
  * division) — the same spelling the q151 DuckDB oracle unrolls. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Exact in-memory replay of the operator's integer recurrence. */
  private def brute(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L): Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val in = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var h = out.keySet.map(_ -> scale).toMap
    var a = Map.empty[Long, Long]
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> (v * scale) / mx }
    }
    for (_ <- 1 to iters) {
      a = norm(in.map { case (d, srcs) => d -> srcs.map(h).sum })
      h = norm(out.map { case (s, dsts) =>
        s -> dsts.map(d => a.getOrElse(d, 0L)).sum })
    }
    (out.keySet ++ in.keySet).map(n =>
      n -> (h.getOrElse(n, 0L), a.getOrElse(n, 0L))).toMap
  }

  private def run(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] =
    Hits(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("hand case: the better-connected authority reads scale, hubs " +
      "split by what they point at") {
    // hubs 1,2,3; authorities 10 (pointed at by all), 11 (by 1 only)
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
    val got = run(edges, iters = 2)
    assert(got === brute(edges, 2))
    assert(got(10L)._2 === 1000000L) // top authority pins the scale
    assert(got(1L)._1 === 1000000L) // hub 1 points at both
    assert(got(2L)._1 === got(3L)._1)
    assert(got(2L)._1 < got(1L)._1)
    assert(got(11L)._2 < got(10L)._2)
    // pure hubs carry authority 0, pure authorities hub 0
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 === 0L))
    assert(Seq(10L, 11L).forall(got(_)._1 === 0L))
  }

  test("a node on both sides gets both scores") {
    // 1 -> 2 -> 3: node 2 is a hub (points at 3) and an authority
    val edges = Seq((1L, 2L), (2L, 3L))
    val got = run(edges, iters = 3)
    assert(got === brute(edges, 3))
    assert(got(2L)._1 > 0L && got(2L)._2 > 0L)
  }

  test("duplicate edges are deduped by default") {
    val edges = Seq((1L, 10L), (1L, 10L), (2L, 11L))
    assert(run(edges, iters = 2) === brute(edges, 2))
  }

  test("seeded random bipartite digraph matches the integer replay " +
      "bit-for-bit") {
    val rnd = new Random(13)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(40).toLong, 100L + rnd.nextInt(20))).distinct
    assert(run(edges, iters = 4) === brute(edges, 4))
  }
}
