package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Static graph kernels ([[Graphs]]): bipartite projection, triangle
  * counting (degree-ordered orientation vs an in-test brute force),
  * Adamic–Adar scores vs hand arithmetic, and the hub-cap recall
  * contract. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("coOccurrence: shared-left counts, canonical a<b, multiplicity " +
      "ignored, minShared filters") {
    // c1 -> {A,B}, c2 -> {A,B}, c3 -> {B,C}; duplicate rows are noise
    val rel = Seq(("c1", "A"), ("c1", "B"), ("c1", "B"),
      ("c2", "A"), ("c2", "B"), ("c3", "B"), ("c3", "C"))
      .toDF("cust", "item")
    val all = Graphs.coOccurrence(rel, "cust", "item")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(all === Set(("A", "B", 2L), ("B", "C", 1L)))
    val filtered = Graphs.coOccurrence(rel, "cust", "item", minShared = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(filtered === Set(("A", "B", 2L)))
  }

  test("coOccurrence maxLeftDegree: hub lefts drop from pair generation; " +
      "an edge survives iff SOME shared left is under the cap") {
    // hub sees everything; (A,B) is also shared by c1 and survives with
    // its count reduced; (A,C)/(B,C) were hub-only and vanish
    val rel = Seq(("hub", "A"), ("hub", "B"), ("hub", "C"),
      ("c1", "A"), ("c1", "B")).toDF("cust", "item")
    val capped = Graphs.coOccurrence(rel, "cust", "item",
      maxLeftDegree = Some(2))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(capped === Set(("A", "B", 1L)))
  }

  /** O(n³) reference count over canonical undirected edges. */
  private def bruteTriangles(edges: Set[(Long, Long)])
      : Map[Long, (Long, Long)] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keySet
    val tri = for {
      x <- nodes.toSeq; y <- adj(x) if y > x; z <- adj(y) if z > y
      if adj(x).contains(z)
    } yield Seq(x, y, z)
    val perNode = tri.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    nodes.map(n =>
      n -> (adj(n).size.toLong, perNode.getOrElse(n, 0L))).toMap
  }

  test("triangles: hand case — one triangle, a pendant, reversed and " +
      "self-loop edges canonicalized") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), // dup reversed
      (3L, 4L), (4L, 4L), // pendant + self-loop
      (5L, 6L)).toDF("a", "b")
    val got = Graphs.triangles(edges, "a", "b")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      1L -> (2L, 1L), 2L -> (2L, 1L), 3L -> (3L, 1L),
      4L -> (1L, 0L), 5L -> (1L, 0L), 6L -> (1L, 0L)))
  }

  test("triangles: complete K5 — every node in C(4,2) triangles") {
    val edges = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b))
      .toDF("a", "b")
    val got = Graphs.triangles(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === (1L to 5L).map(_ -> 6L).toMap)
  }

  test("triangles: star graph has none (and the skewed hub exercises " +
      "the degree orientation, not a hub-squared wedge join)") {
    val edges = (1L to 40L).map(i => (0L, i)).toDF("a", "b")
    val got = Graphs.triangles(edges, "a", "b")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(0L) === (40L, 0L))
    assert((1L to 40L).forall(i => got(i) === (1L, 0L)))
  }

  test("triangles agree with brute force on a seeded random graph") {
    val rnd = new Random(7)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    val got = Graphs.triangles(edges.toSeq.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === bruteTriangles(edges))
  }

  /** Exact replay of kCore's synchronous peel on symmetrized rows. */
  private def bruteKCore(sym: Seq[(Long, Long)], k: Long, rounds: Int)
      : Map[Long, Long] = {
    var e = sym.distinct
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter { case (a, b) => keep(a) && keep(b) }
    }
    e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  private def runKCore(sym: Seq[(Long, Long)], k: Long, rounds: Int)
      : Map[Long, Long] =
    Graphs.kCore(sym.toDF("src", "dst"), "src", "dst", lit(k),
        rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def sym(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map(_.swap)

  test("kCore: peeling a path CASCADES across rounds — each round " +
      "exposes the next endpoint") {
    // path 1-2-3-4-5 with k=2: endpoints peel one per round until empty
    val path = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(runKCore(path, k = 2, rounds = 1).keySet === Set(2L, 3L, 4L))
    // round 2: node 3 passes the degree vote but both neighbors fall —
    // it keeps no live edge, so the edge-row report drops it, matching
    // the converged 2-core of a path (empty)
    assert(runKCore(path, k = 2, rounds = 2) === Map.empty)
    assert(runKCore(path, k = 2, rounds = 3) === Map.empty)
  }

  test("kCore: triangle with a pendant — the triangle IS the 2-core, " +
      "final degrees reported") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L)))
    val got = runKCore(g, k = 2, rounds = 4)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore agrees with the brute-force replay on a seeded random " +
      "graph, at every round count") {
    val rnd = new Random(13)
    val edges = (1 to 260).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val g = sym(edges).distinct
    for (r <- Seq(1, 2, 4, 8); k <- Seq(3L, 6L, 9L)) {
      assert(runKCore(g, k, r) === bruteKCore(g, k, r), s"k=$k rounds=$r")
    }
  }

  test("kCore: duplicate rows dedup by default; dedupEdges=false " +
      "counts multiplicity (the caller-guarantees-distinct fast path)") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val doubled = g ++ g
    assert(Graphs.kCore(doubled.toDF("src", "dst"), "src", "dst",
        lit(2L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // multiplicity doubles degrees when dedup is off
    assert(Graphs.kCore(doubled.toDF("src", "dst"), "src", "dst",
        lit(4L), rounds = 2, dedupEdges = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 4L, 2L -> 4L, 3L -> 4L))
  }

  test("adamicAdar: hand arithmetic, finite by construction") {
    // shared lefts: (A,B) via c1 (deg 2) and c2 (deg 3);
    // (A,C)/(B,C) via c2 only
    val rel = Seq(("c1", "A"), ("c1", "B"),
      ("c2", "A"), ("c2", "B"), ("c2", "C")).toDF("cust", "item")
    val got = Graphs.adamicAdar(rel, "cust", "item")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3))))
      .toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map(
      ("A", "B") -> (2L, r4(1 / math.log(2) + 1 / math.log(3))),
      ("A", "C") -> (1L, r4(1 / math.log(3))),
      ("B", "C") -> (1L, r4(1 / math.log(3)))))
  }

  private def runBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Int] =
    Graphs.bfsHops(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("nid"), "nid", maxHops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("bfsHops: hand case — levels on a directed path + branch; " +
      "unreachable and beyond-maxHops nodes absent") {
    // 1 -> 2 -> 3 -> 4, 2 -> 5; 9 isolated downstream of nothing
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (9L, 1L))
    assert(runBfs(e, Seq(1L), maxHops = 2) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 5L -> 2))
    assert(runBfs(e, Seq(1L), maxHops = 8) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 2))
  }

  test("bfsHops: multi-source min wins; seeds off-graph report hop 0; " +
      "maxHops=0 returns exactly the seed set") {
    val e = Seq((1L, 2L), (2L, 3L), (7L, 3L))
    // node 3 reachable at hop 2 from seed 1 and hop 1 from seed 7
    assert(runBfs(e, Seq(1L, 7L, 42L), maxHops = 3) ===
      Map(1L -> 0, 7L -> 0, 42L -> 0, 2L -> 1, 3L -> 1))
    assert(runBfs(e, Seq(1L, 42L), maxHops = 0) ===
      Map(1L -> 0, 42L -> 0))
  }

  test("bfsHops: early exit on a cycle — frontier empties once all " +
      "nodes settle, revisits never relabel") {
    val e = sym(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(runBfs(e, Seq(1L), maxHops = 50) ===
      Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("bfsHops agrees with a brute-force BFS on a seeded random graph") {
    val rnd = new Random(7)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    val seeds = Seq(0L, 1L, 2L)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (mh <- Seq(1, 3, 7)) {
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (h <- 1 to mh) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .diff(dist.keySet)
        dist ++= next.map(_ -> h)
        frontier = next
      }
      assert(runBfs(edges, seeds, mh) === dist, s"maxHops=$mh")
    }
  }

  test("clusteringCoefficient: triangle + pendant hand case, and K5 is " +
      "all-1000") {
    import spark.implicits._
    // triangle {1,2,3} with pendant 4 on node 1: node 1 closes 1 of
    // its C(3,2)=3 wedges (cc=333 milli truncating), nodes 2/3 close
    // their single wedge (1000), the pendant has no wedge (0)
    val df = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("a", "b")
    val got = Graphs.clusteringCoefficient(df, "a", "b")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((3L, 1L, 333L)), 2L -> ((2L, 1L, 1000L)),
      3L -> ((2L, 1L, 1000L)), 4L -> ((1L, 0L, 0L))))
    val k5 = (for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b))
      .toDF("a", "b")
    val ccs = Graphs.clusteringCoefficient(k5, "a", "b")
      .collect().map(_.getLong(3)).toSet
    assert(ccs === Set(1000L))
  }

  test("modularity: two bridged triangles, hand-computed Q shares; " +
      "singleton labeling; partial labels dilute") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by the bridge (3,4):
    // m = 7; each triangle community has m_c = 3, D_c = 7
    // q_contrib = (4*7*3 - 49) / (4*49) = 35/196 = 0.178571
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a", "b")
    val lab = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y")).toDF("id", "c")
    val got = Graphs.modularity(e, "a", "b", lab, "id", "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got === Map(
      "x" -> ((3L, 7L, 3L, 0.178571)),
      "y" -> ((3L, 7L, 3L, 0.178571))))

    // every node its own community: intra = 0, contrib = -d^2/(4m^2)
    val single = Graphs.modularity(e, "a", "b",
        (1L to 6L).map(i => (i, i.toString)).toDF("id", "c"), "id", "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(single("1") === ((0L, BigDecimal(-4.0 / 196)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(single("3") === ((0L, BigDecimal(-9.0 / 196)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // sum over singleton contribs is <= 0 (no labeling beats chance
    // by assigning nobody together)
    assert(single.values.map(_._2).sum < 0)

    // partial labeling: m and degrees stay full-graph, the unlabeled
    // triangle forms no community and dilutes x's share
    val partial = Graphs.modularity(e, "a", "b",
        lab.filter(col("c") === "x"), "id", "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(partial === Map("x" -> ((3L, 7L, 3L, 0.178571))))
  }

  test("modularity equals a brute-force Newman Q on seeded random " +
      "graphs and labelings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 8 + rnd.nextInt(8)
      val edges = (for (a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.35) yield (a, b)).toVector
      if (edges.nonEmpty) {
        val labels = (1L to n).map(i => i -> s"c${rnd.nextInt(3)}")
        val m = edges.size.toLong
        val deg = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val labOf = labels.toMap
        val want = labels.groupBy(_._2).map { case (c, members) =>
          val ids = members.map(_._1).toSet
          val mc = edges.count(e => ids(e._1) && ids(e._2)).toLong
          val dc = ids.toSeq.map(i => deg.getOrElse(i, 0L)).sum
          val nodes = ids.count(deg.contains)
          c -> ((nodes.toLong, dc, mc,
            BigDecimal((4L * m * mc - dc * dc).toDouble / (4L * m * m))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }.filter(_._2._1 > 0) // labels with no edge-touching node absent
        val got = Graphs.modularity(edges.toDF("a", "b"),
            "a", "b", labels.toDF("id", "c"), "id", "c")
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
          .toMap
        assert(got === want, s"trial $trial")
        // additivity: the shares sum to Newman Q of the full labeling
        val q = (4L * m * edges.count(e => labOf(e._1) == labOf(e._2))
          - want.values.map(v => v._2 * v._2).sum).toDouble / (4L * m * m)
        assert(math.abs(got.values.map(_._4).sum - q) < 1e-4,
          s"trial $trial additivity")
      }
    }
  }
}
