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

  /** Default path: small graphs take the driver union-find finisher. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents(edges.toDF("a_id", "b_id"), "a_id", "b_id")
      .as[(Long, Long)].collect().toMap

  /** Cap 0 forces the distributed alternating-star loop. */
  private def runLoop(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents(edges.toDF("a_id", "b_id"), "a_id", "b_id",
      driverFinishMaxEdges = 0L)
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
    // (cap forced to 0 — the distributed loop is what this pins)
    val edges = (1L until 200L).map(i => (i, i + 1))
    val got = runLoop(edges)
    assert(got.size === 200)
    assert(got.values.toSet === Set(1L))
  }

  test("randomized graphs: driver finisher and distributed loop agree " +
      "with union-find ground truth and with each other") {
    val rnd = new Random(42)
    (1 to 3).foreach { _ =>
      val n = 150
      val edges = Seq.fill(120)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val truth = components(edges)
      assert(run(edges) === truth)     // driver union-find path
      assert(runLoop(edges) === truth) // alternating-star loop path
    }
  }

  test("mid-loop handoff: a dense graph contracting under the cap mid-run " +
      "matches ground truth") {
    // 4000 random edges over 100 nodes: distinct e0 ≈ thousands of
    // edges > cap 600, but two alternating-star rounds contract the
    // distinct edge set toward ~#non-root nodes (≤ 99) < cap → the
    // loop hands the contracted graph to the driver finisher, whose
    // components must equal the input graph's (node set and
    // connectivity are round-invariants).
    val rnd = new Random(7)
    val edges = Seq.fill(4000)(
      (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter { case (a, b) => a != b }
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = ConnectedComponents(edges.toDF("a_id", "b_id"),
      "a_id", "b_id", driverFinishMaxEdges = 600L)
      .as[(Long, Long)].collect().toMap
    assert(got === components(edges))
    // the finisher consumed every checkpoint — nothing stays resident
    // (the loop path keeps exactly the final converged set; the driver
    // path keeps nothing)
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(fresh.isEmpty, s"leaked checkpoints: $fresh")
  }

  test("driver finisher: string ids compare as unsigned UTF-8 bytes " +
      "(Spark's ordering), not UTF-16") {
    // "𐀀" (U+10000, 4-byte UTF-8) vs "�": UTF-16
    // order puts the surrogate pair first; UTF-8 byte order puts
    // U+FFFD (EF BF BD) below U+10000 (F0 90 80 80). Component min
    // must match what Spark's least()/min() would pick.
    val hi = "𐀀"
    val lo = "�"
    import org.apache.spark.sql.functions.least
    val sparkMin = Seq((hi, lo)).toDF("a", "b")
      .select(least($"a", $"b")).as[String].head()
    val got = ConnectedComponents(
      Seq((hi, lo)).toDF("a_id", "b_id"), "a_id", "b_id")
      .as[(String, String)].collect().toMap
    assert(got.values.toSet === Set(sparkMin))
    assert(got === Map(hi -> sparkMin, lo -> sparkMin))
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
      checkpointDir = Some(dir), driverFinishMaxEdges = 0L)
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
    val got = runLoop(edges)
    assert(got.values.toSet === Set(1L))
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    // the multi-round chain localCheckpoints one edge set per iteration;
    // all but the final converged set must have been unpersisted
    assert(fresh.size <= 1,
      s"expected <= 1 resident checkpoint after convergence, saw ${fresh.size}")
  }

  test("binary ids stay on the distributed loop (the driver comparator " +
      "cannot order Array[Byte]) and still produce exact components") {
    import org.apache.spark.sql.functions.col
    // binary ids order bytewise-unsigned in Spark; the finisher's
    // HashMap/Comparable machinery would crash (or worse, treat equal
    // arrays as distinct under reference equality) — the type guard
    // must route these to the loop even under the default cap
    val edges = Seq(
      (Array[Byte](1), Array[Byte](2)),
      (Array[Byte](2), Array[Byte](3)),
      (Array[Byte](10), Array[Byte](11)))
      .toDF("a_id", "b_id")
    val got = ConnectedComponents(edges, "a_id", "b_id")
      .select(col("id").cast("string"), col("component").cast("string"))
      .as[(String, String)].collect().toMap
    // string casts of binary render hex-ish; compare structurally via
    // the component grouping instead of exact rendering
    assert(got.size === 5)
    assert(got.values.toSet.size === 2)
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

  test("keepBest: each cluster keeps its max-score member, ties to min id") {
    val docs = Seq(
      (1L, 10L), (2L, 99L), (3L, 50L), // cluster {1,2,3}: 2 wins on score
      (4L, 7L), (5L, 7L),              // cluster {4,5}: tie -> min id 4
      (6L, 1L))                        // singleton survives
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a_id", "b_id")
    val kept = ConnectedComponents
      .keepBest(docs, "doc_id", "score", pairs, "a_id", "b_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 4L, 6L))
  }

  test("keepBest: null scores lose; an all-null cluster falls back to min id") {
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, null),
        org.apache.spark.sql.Row(2L, java.lang.Long.valueOf(5L)),
        org.apache.spark.sql.Row(3L, null),
        org.apache.spark.sql.Row(4L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.LongType, nullable = true))))
    // cluster {1,2}: 2 wins (non-null beats null); cluster {3,4}: all
    // null -> min id 3
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a_id", "b_id")
    val kept = ConnectedComponents
      .keepBest(docs, "doc_id", "score", pairs, "a_id", "b_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L))
  }

  test("keepBest on randomized graphs equals a brute-force argmax") {
    val rnd = new Random(31)
    for (trial <- 1 to 3) {
      val n = 30
      val docRows = (1L to n).map(i => (i, rnd.nextInt(10).toLong))
      val edges = (1 to 15).map(_ =>
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter(p => p._1 != p._2)
      val comp = components(edges)
      val score = docRows.toMap
      val want = (1L to n).filter { id =>
        comp.get(id) match {
          case None => true // not in any pair
          case Some(c) =>
            val members = comp.collect { case (m, cc) if cc == c => m }
            val mx = members.map(score).max
            id == members.filter(score(_) == mx).min
        }
      }
      val got = ConnectedComponents
        .keepBest(docRows.toDF("doc_id", "score"), "doc_id", "score",
          edges.toDF("a_id", "b_id"), "a_id", "b_id")
        .select("doc_id").as[Long].collect().sorted
      assert(got === want.toArray, s"trial $trial")
    }
  }

  test("incremental: folding a batch into an old labeling equals the " +
      "full recompute, on randomized splits (merges, new-only " +
      "components, untouched components)") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 3) {
      val n = 60L
      val all = (1 to 150).map(_ =>
        (rnd.nextInt(n.toInt).toLong + 1, rnd.nextInt(n.toInt).toLong + 1))
        .filter(p => p._1 != p._2).distinct
      // arbitrary batch split; batch 1 includes edges that bridge
      // batch-0 components and edges among entirely fresh ids
      val (oldE, newE) = all.partition(_ => rnd.nextBoolean())
      val fresh = Seq((200L, 201L), (201L, 202L), (300L, 1L))
      val newAll = newE ++ fresh
      val oldComp = ConnectedComponents(
        oldE.toDF("a", "b"), "a", "b")
      val got = ConnectedComponents.incremental(
          oldComp, newAll.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val want = ConnectedComponents(
          (oldE ++ newAll).toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("incremental: self-pairs and null-endpoint pairs in the batch " +
      "contribute no nodes — parity with apply()'s pair conventions") {
    import spark.implicits._
    val oldComp = ConnectedComponents(
      Seq((1L, 2L)).toDF("a", "b"), "a", "b")
    // batch: one real edge, one self-pair (7,7), one half-null pair —
    // apply() over the accumulated pairs sees only (1,2) and (2,3), so
    // nodes 7 and 9 must NOT surface as singletons
    val batch = Seq(
      (Some(2L), Some(3L)), (Some(7L), Some(7L)), (Some(9L), None))
      .toDF("a", "b")
    val got = ConnectedComponents.incremental(oldComp, batch, "a", "b")
      .as[(Long, Long)].collect().toMap
    val want = ConnectedComponents(
        Seq((1L, 2L), (2L, 3L), (7L, 7L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // the delta likewise emits nothing for the degenerate pairs
    val delta = ConnectedComponents.incrementalDelta(
        oldComp, batch, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(delta === Map(3L -> 1L))
  }
}
