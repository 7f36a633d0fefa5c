package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Transitive-closure clustering over near-dup pairs. Ground truth in
  * the randomized test is an in-test union-find — the same oracle shape
  * the driver's recursive-CTE gate uses for q64, but over arbitrary
  * generated graphs instead of the shingle pair graph. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    // union-find ground truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents(edges.toDF("a_id", "b_id"), "a_id", "b_id")
      .as[(Long, Long)].collect().toMap

  test("path + triangle + isolated pair: exact component mins") {
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 4L), // path -> component 1
      (10L, 11L),                   // pair -> component 10
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle -> component 20
    assert(run(edges) === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges (O(log n) alternating-star rounds, not O(diameter))") {
    // a 200-node path: naive min-label propagation needs ~200 rounds;
    // alternating star must close it well inside the 64-round cap.
    val edges = (1L until 200L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size === 200)
    assert(got.values.toSet === Set(1L))
  }

  test("randomized graphs match union-find ground truth") {
    val rnd = new Random(42)
    (1 to 3).foreach { _ =>
      val n = 150
      val edges = Seq.fill(120)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) === components(edges))
    }
  }

  test("edge orientation and duplicates don't matter") {
    val canonical = run(Seq((1L, 2L), (2L, 3L)))
    assert(run(Seq((2L, 1L), (3L, 2L), (1L, 2L), (2L, 3L))) === canonical)
  }

  test("reliable-checkpoint mode: same components, intermediate files cleaned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
      .toString
    val edges = (1L until 60L).map(i => (i, i + 1)) ++ Seq((100L, 101L))
    val got = ConnectedComponents(
      edges.toDF("a_id", "b_id"), "a_id", "b_id",
      checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(got === components(edges))
    // every superseded iteration's checkpoint files are deleted as soon
    // as its successor materializes — only the final converged edge set
    // may remain on disk
    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("rdd-"))
      .count()
    assert(rddDirs <= 1, s"expected <= 1 surviving checkpoint, saw $rddDirs")
  }

  test("superseded iterations are unpersisted (no edge-set pile-up)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = (1L until 80L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.values.toSet === Set(1L))
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    // the multi-round chain localCheckpoints one edge set per iteration;
    // all but the final converged set must have been unpersisted
    assert(fresh.size <= 1,
      s"expected <= 1 resident checkpoint after convergence, saw ${fresh.size}")
  }

  test("keepers: transitive clusters drop every non-root member") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // 1~2 and 2~3: pair-local "drop b of each pair" would also drop 3
    // here, but with pairs (2,3) only — i.e. when 1~3 was never emitted
    // — clustering still drops BOTH 2 and 3.
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val kept = ConnectedComponents.keepers(docs, "doc_id", pairs, "a_id", "b_id")
      .as[Long].collect().sorted
    assert(kept === Array(1L, 4L, 5L, 6L))
  }
}
