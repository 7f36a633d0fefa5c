package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{VectorFunctions => V}
import graft.plans.{DotProduct, SketchExpressions => SK}

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Three tiers:
  *   - `bruteForceTopK` — exact baseline: broadcast the (small) query
  *     set against the corpus, rank per query. Corpus-linear.
  *   - `lshTopK` — random-hyperplane LSH: corpus bucketed once by sign
  *     signature; queries probe their bucket (+ optional multi-probe by
  *     flipping low bits). Candidate set ≪ corpus at scale.
  *   - `ivfTopK` — IVF: k centroids (sampled + one Lloyd refinement
  *     pass, all DataFrame aggs), corpus assigned to nearest centroid
  *     cell; queries probe the nProbe nearest cells.
  *
  * `spread` (default true) round-robins the corpus across
  * defaultParallelism partitions before scoring — needed when the
  * input's split count is tiny (our single-row-group test parquet
  * scans as ONE partition, which would serialize the kernels), but it
  * IS a full corpus exchange: on well-split production data pass
  * `spread = false` and score in place with zero corpus shuffle.
  */
object Similarity {

  private def maybeSpread(df: DataFrame, spread: Boolean): DataFrame =
    if (spread)
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df

  /** Shared ranking epilogue: top-k per query by cosine desc, corpus id
    * as the deterministic tie-break. ONE definition so the output
    * contract (rank type, rounding) cannot drift between tiers. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Exact top-k neighbors per query vector. `queries` is expected to be
    * small (it is broadcast); ties broken by corpus id for determinism. */
  def bruteForceTopK(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, spread: Boolean = true): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"),
      V.toDouble(col(qVecCol)).as("qv"))
      .withColumn("qn", sqrt(DotProduct(col("qv"), col("qv"))))
    val c = maybeSpread(corpus, spread)
      .select(col(cIdCol).as("neighbor_id"), V.toDouble(col(cVecCol)).as("cv"))
      .withColumn("cn", sqrt(DotProduct(col("cv"), col("cv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        DotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topK(scored, k)
  }

  /** LSH-bucketed ANN: corpus hashed once into 2^nBits sign-buckets;
    * each query probes its own bucket plus `probes` single-bit-flip
    * neighbors. Returns top-k within probed candidates (approximate:
    * recall < 1, cost ~ corpus/2^nBits per query at scale). Norms are
    * precomputed per ROW — a hot bucket joins a corpus row to many
    * queries, and the O(dim) norm fold must not be paid per PAIR. */
  def lshTopK(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, nBits: Int = 8, probes: Int = 2,
      seed: Long = 42L, spread: Boolean = true): DataFrame = {
    val bucketOf = (v: org.apache.spark.sql.Column) =>
      SK.hyperplaneBucket(v, nBits, seed)
    val c = maybeSpread(corpus, spread)
      .select(col(cIdCol).as("neighbor_id"), V.toDouble(col(cVecCol)).as("cv"))
      .withColumn("cn", sqrt(DotProduct(col("cv"), col("cv"))))
      .withColumn("bucket", bucketOf(col("cv")))
    val q0 = queries.select(col(qIdCol).as("query_id"),
      V.toDouble(col(qVecCol)).as("qv"))
      .withColumn("qn", sqrt(DotProduct(col("qv"), col("qv"))))
      .withColumn("bucket0", bucketOf(col("qv")))
    // multi-probe: own bucket + flipping each of the lowest `probes` bits
    val probeBuckets = array(
      (col("bucket0") +: (0 until probes).map(b =>
        col("bucket0").bitwiseXOR(lit(1L << b)))): _*)
    val q = q0.select(col("query_id"), col("qv"), col("qn"),
      explode(probeBuckets).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        DotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topK(scored, k)
  }

  /** IVF ANN: sample nCells corpus vectors as seed centroids, one Lloyd
    * refinement pass (DataFrame aggs), assign corpus to nearest cell,
    * probe nProbe nearest cells per query. The centroid "model" is tiny
    * (nCells × dim) and rides a broadcast; everything data-sized stays
    * distributed. The prepared corpus is persisted (memory-and-disk):
    * it feeds THREE actions — seed sampling, the Lloyd pass, and the
    * final query join — which would otherwise each re-scan and
    * re-shuffle the corpus from scratch.
    */
  def ivfTopK(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      spread: Boolean = true): DataFrame = {
    val c = maybeSpread(corpus, spread)
      .select(col(cIdCol).as("neighbor_id"), V.toDouble(col(cVecCol)).as("cv"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // seed centroids: deterministic sample (lowest ids); the "model" is
    // nCells × dim doubles — driver-side by design, like any trained model
    val seeds: Array[Array[Double]] = c.orderBy("neighbor_id")
      .limit(nCells).collect().map(_.getSeq[Double](1).toArray)

    // one Lloyd refinement pass: mean of members per cell (cell id =
    // position in the centroid array). Per-dimension means go through
    // posexplode + one hash agg on (cell, pos) — the plan stays a
    // handful of expressions at ANY dim (building `dim` avg() columns
    // instead blows up analysis/codegen at embedding dims like 1536),
    // and the agg is partial+final so the exploded rows never shuffle
    // raw.
    val assigned0 = c.withColumn("cell",
      element_at(SK.nearestCells(col("cv"), seeds, 1), 1))
    val refined: Array[Array[Double]] = assigned0
      .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
      .groupBy("cell")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)

    val assigned = c.withColumn("cell",
      element_at(SK.nearestCells(col("cv"), refined, 1), 1))
      .withColumn("cn", sqrt(DotProduct(col("cv"), col("cv"))))

    // queries probe the nProbe nearest cells
    val q = queries.select(col(qIdCol).as("query_id"),
      V.toDouble(col(qVecCol)).as("qv"))
      .withColumn("qn", sqrt(DotProduct(col("qv"), col("qv"))))
      .withColumn("cell", explode(SK.nearestCells(col("qv"), refined, nProbe)))

    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        DotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topK(scored, k)
  }
}
