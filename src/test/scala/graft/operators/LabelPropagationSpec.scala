package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Synchronous LPA. Ground truth is an in-test replay of the exact
  * update (integer votes, count-desc/label-asc tie order) — the same
  * spelling the q150 DuckDB oracle unrolls. */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Exact in-memory replay of the synchronous update. */
  private def brute(edges: Seq[(Long, Long)], iters: Int,
      dedup: Boolean = true): Map[Long, Long] = {
    val e = if (dedup) edges.distinct else edges
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val upd = e.groupBy(_._1).map { case (src, es) =>
        val votes = es.map(x => lbl(x._2))
          .groupBy(identity).map { case (l, v) => (l, v.size) }
        src -> votes.minBy { case (l, c) => (-c, l) }._1
      }
      lbl = lbl.map { case (n, old) => n -> upd.getOrElse(n, old) }
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
      dedupEdges: Boolean = true,
      noSinkNodes: Boolean = false,
      checkpointEvery: Int = 1): Map[Long, Long] =
    LabelPropagation(edges.toDF("src", "dst"), "src", "dst",
      iterations = iters, dedupEdges = dedupEdges,
      noSinkNodes = noSinkNodes, checkpointEvery = checkpointEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques with a bridge converge to two communities") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val half = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
    val undirected = half ++ half.map(_.swap) :+ (4L, 10L) :+ (10L, 4L)
    val got = run(undirected, iters = 4)
    assert(got === brute(undirected, 4))
    // every member of each clique carries that clique's minimum label
    assert(Seq(1L, 2L, 3L, 4L).map(got).toSet === Set(1L))
    assert(Seq(10L, 11L, 12L, 13L).map(got).toSet === Set(10L))
  }

  test("tie-break: equal votes go to the smallest label") {
    // 3 hears {1, 2} once each → takes 1; directed on purpose
    val edges = Seq((3L, 1L), (3L, 2L), (1L, 1L), (2L, 2L))
    assert(run(edges, iters = 1)(3L) === 1L)
  }

  test("duplicate edges double a vote unless deduped") {
    // 3 hears label 2 twice via the doubled edge, label 1 once
    val edges = Seq((3L, 1L), (3L, 2L), (3L, 2L), (1L, 1L), (2L, 2L))
    assert(run(edges, iters = 1, dedupEdges = false)(3L) === 2L)
    assert(run(edges, iters = 1, dedupEdges = true)(3L) === 1L)
  }

  test("a node with no out-edges keeps its label (sink-node join)") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 5L)) // 5 is a pure sink
    val got = run(edges, iters = 3)
    assert(got(5L) === 5L)
    assert(got === brute(edges, 3))
  }

  test("seeded random digraph matches brute force; checkpoint stride " +
      "and noSinkNodes (on a symmetrized graph) change nothing") {
    val rnd = new Random(11)
    val half = (1 to 200).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = half ++ half.map(_.swap)
    val expected = brute(sym, 5, dedup = false)
    assert(run(sym, 5, dedupEdges = false) === expected)
    assert(run(sym, 5, dedupEdges = false, noSinkNodes = true,
      checkpointEvery = 5) === expected)
  }

  test("bipartite two-cycle is sampled deterministically") {
    // star center 0 ↔ leaves 1..3: labels oscillate; both parities
    // must replay exactly
    val edges = (1L to 3L).flatMap(i => Seq((0L, i), (i, 0L)))
    assert(run(edges, 1) === brute(edges, 1))
    assert(run(edges, 2) === brute(edges, 2))
  }
}
