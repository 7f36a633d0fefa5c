package graft.operators

import graft.SparkSpec

/** ANN operators: brute force is the exactness baseline; LSH/IVF are
  * graded on recall against it. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
  private lazy val queries = {
    import org.apache.spark.sql.functions.col
    emb.filter(col("vec_id") < 10)
  }

  private lazy val bruteTop5: Map[Long, Seq[Long]] =
    Similarity.bruteForceTopK(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
      }

  test("lloydStep: an empty cell keeps its previous centroid — model " +
      "never shrinks, cell ids never remap") {
    // 2-D training points in two tight clumps; centroid (0,-1) attracts
    // nothing under cosine assignment — its cell must come back
    // unchanged, not vanish and shift later cell ids down
    val train = Array.fill(10)(Array(1.0, 0.0)) ++
      Array.fill(10)(Array(0.0, 1.0))
    val before = Array(
      Array(2.0, 0.0), Array(0.0, 2.0), Array(0.0, -1.0))
    val after = Similarity.lloydStep(train, before)
    assert(after.length === 3)
    assert(after(0).toSeq === Seq(1.0, 0.0)) // mean of its members
    assert(after(1).toSeq === Seq(0.0, 1.0))
    assert(after(2).toSeq === Seq(0.0, -1.0)) // carried forward, same id
  }

  test("brute force: k results per query, self excluded, ranks contiguous") {
    assert(bruteTop5.size === 10)
    bruteTop5.foreach { case (q, ns) =>
      assert(ns.size === 5)
      assert(!ns.contains(q))
    }
  }

  test("brute force: rank 1 really is the max cosine neighbor") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorFunctions => V}
    val q0 = emb.filter(col("vec_id") === 0).select(
      V.toDouble(col("embedding")).as("qv"))
    val best = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q0))
      .select(col("vec_id"),
        V.cosine(V.toDouble(col("embedding")), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(1).collect()(0).getLong(0)
    assert(bruteTop5(0L).head === best)
  }

  test("LSH top-k: well-formed results + nonzero recall vs brute force") {
    val rows = Similarity.lshTopK(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, nBits = 4, probes = 3)
      .collect()
    val lsh = rows.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    // structural: ≤k rows per query, contiguous ranks from 1, no self
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks === (1L to ranks.size))
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
    }
    // recall floor only — random embeddings are LSH's worst case; the
    // scale story (bucketed candidates ≪ corpus) is the property here
    val recall = bruteTop5.map { case (q, exact) =>
      lsh.get(q).map(c => exact.count(c.contains).toDouble / 5).getOrElse(0.0)
    }.sum / bruteTop5.size
    assert(recall > 0.05, s"LSH recall@5 = $recall")
  }

  test("IVF top-k: higher recall than single-bucket LSH at nProbe=4") {
    val ivf = Similarity.ivfTopK(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    val recall = bruteTop5.map { case (q, exact) =>
      ivf.get(q).map(c => exact.count(c.contains).toDouble / 5).getOrElse(0.0)
    }.sum / bruteTop5.size
    assert(recall > 0.5, s"IVF recall@5 = $recall")
  }

  test("IVF recall holds as the cell count scales (nCells 16 and 64)") {
    // k-means||-style seeding must keep recall usable at BOTH a coarse
    // and a fine cell grid when the probed fraction is held at 1/4 —
    // the old lowest-id seeding degraded with nCells because seeds
    // crowded one region of the id order
    for (nCells <- Seq(16, 64)) {
      val ivf = Similarity.ivfTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5,
        nCells = nCells, nProbe = nCells / 4)
        .collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
      val recall = bruteTop5.map { case (q, exact) =>
        ivf.get(q).map(c => exact.count(c.contains).toDouble / 5).getOrElse(0.0)
      }.sum / bruteTop5.size
      assert(recall > 0.5, s"IVF recall@5 at nCells=$nCells = $recall")
    }
  }

  test("ivfTopK leaves no persisted corpus behind (cache released after model)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Similarity.ivfTopK(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, nCells = 8, nProbe = 2).count()
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(fresh.isEmpty,
      s"expected no resident cache after ivfTopK, saw ${fresh.size}")
  }
}
