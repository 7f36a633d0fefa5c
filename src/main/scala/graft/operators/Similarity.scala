package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Three tiers:
  *   - `bruteForceTopK` — exact baseline: broadcast the (small) query
  *     set against the corpus, rank per query. One pass over the corpus,
  *     no corpus shuffle; scales linearly in corpus size.
  *   - `lshTopK` — random-hyperplane LSH: corpus bucketed once by sign
  *     signature; queries probe their bucket (+ optional multi-probe by
  *     flipping low bits). Candidate set ≪ corpus at scale.
  *   - `ivfTopK` — IVF: k centroids (sampled + one Lloyd refinement
  *     pass, all DataFrame aggs), corpus assigned to nearest centroid
  *     cell; queries probe the nProbe nearest cells.
  */
object Similarity {

  /** Exact top-k neighbors per query vector. `queries` is expected to be
    * small (it is broadcast); ties broken by corpus id for determinism. */
  def bruteForceTopK(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"),
      V.toDouble(col(qVecCol)).as("qv"))
    val c = corpus.select(col(cIdCol).as("neighbor_id"),
      V.toDouble(col(cVecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", V.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** LSH-bucketed ANN: corpus hashed once into 2^nBits sign-buckets;
    * each query probes its own bucket plus `probes` single-bit-flip
    * neighbors. Returns top-k within probed candidates (approximate:
    * recall < 1, cost ~ corpus/2^nBits per query at scale).
    */
  def lshTopK(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, dim: Int, nBits: Int = 8, probes: Int = 2,
      seed: Long = 42L): DataFrame = {
    val bucketOf = (v: org.apache.spark.sql.Column) =>
      V.bitsToBucket(V.hyperplaneBits(v, dim, nBits, seed))
    val c = corpus.select(col(cIdCol).as("neighbor_id"),
      V.toDouble(col(cVecCol)).as("cv"))
      .withColumn("bucket", bucketOf(col("cv")))
    val q0 = queries.select(col(qIdCol).as("query_id"),
      V.toDouble(col(qVecCol)).as("qv"))
      .withColumn("bucket0", bucketOf(col("qv")))
    // multi-probe: own bucket + flipping each of the lowest `probes` bits
    val probeBuckets = array(
      (col("bucket0") +: (0 until probes).map(b =>
        col("bucket0").bitwiseXOR(lit(1L << b)))): _*)
    val q = q0.select(col("query_id"), col("qv"),
      explode(probeBuckets).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", V.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** IVF ANN: sample nCells corpus vectors as seed centroids, one Lloyd
    * refinement pass (DataFrame aggs), assign corpus to nearest cell,
    * probe nProbe nearest cells per query. The centroid "model" is tiny
    * (nCells × dim) and rides a broadcast; everything data-sized stays
    * distributed.
    */
  def ivfTopK(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val c = corpus.select(col(cIdCol).as("neighbor_id"),
      V.toDouble(col(cVecCol)).as("cv"))

    // seed centroids: deterministic sample (lowest ids)
    val seeds: Array[(Int, Seq[Double])] = c.orderBy("neighbor_id")
      .limit(nCells).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }

    def nearestCell(centroids: Array[(Int, Seq[Double])]) = {
      val scored = array(centroids.map { case (cid, vec) =>
        val cvec = array(vec.map(lit): _*)
        struct(
          (V.dot(col("cv"), cvec) / (V.l2Norm(col("cv")) * V.l2Norm(cvec)))
            .as("sim"),
          lit(-cid).as("negcid"))
      }: _*)
      (-array_max(scored).getField("negcid")).as("cell")
    }

    // one Lloyd pass: mean of members per cell
    val assigned0 = c.withColumn("cell", nearestCell(seeds))
    val dim = seeds.head._2.length
    val refined: Array[(Int, Seq[Double])] = assigned0
      .groupBy("cell")
      .agg(array((0 until dim).map(i => avg(col("cv").getItem(i))): _*).as("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

    val assigned = c.withColumn("cell", nearestCell(refined))

    // queries probe nProbe nearest cells
    val qScored = queries.select(col(qIdCol).as("query_id"),
      V.toDouble(col(qVecCol)).as("qv"))
      .withColumn("cells", array(refined.map { case (cid, vec) =>
        val cvec = array(vec.map(lit): _*)
        struct((V.dot(col("qv"), cvec) / (V.l2Norm(col("qv")) * V.l2Norm(cvec))).as("sim"),
          lit(cid).as("cid"))
      }: _*))
      .withColumn("probed", slice(array_sort(col("cells"),
        (a, b) => when(a.getField("sim") > b.getField("sim"), -1)
          .when(a.getField("sim") < b.getField("sim"), 1).otherwise(0)),
        1, nProbe))
      .select(col("query_id"), col("qv"),
        explode(col("probed").getField("cid")).as("cell"))

    val scored = assigned.join(broadcast(qScored), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", V.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }
}
