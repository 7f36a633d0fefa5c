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
    Spread(df, spread)

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

  /** IVF ANN: k-means centroid model (see [[centroidModel]] — k-means||
    * seeding + Lloyd refinement, deterministic under `seed`, with the
    * corpus persisted only for the model-building actions), corpus
    * assigned to its nearest cell, queries probing the `nProbe`
    * nearest cells. The centroid "model" is tiny (nCells × dim) and
    * rides a broadcast; everything data-sized stays distributed. The
    * final query join re-reads the corpus from source — one scan it
    * needs anyway, against the possibly-updated table rather than a
    * stale cache.
    */
  def ivfTopK(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      spread: Boolean = true, seed: Long = 42L,
      lloydIters: Int = 2): DataFrame = {
    val c = maybeSpread(corpus, spread)
      .select(col(cIdCol).as("neighbor_id"), V.toDouble(col(cVecCol)).as("cv"))
    val refined = centroidModel(c, "neighbor_id", "cv",
      nCells, seed, lloydIters)

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

  /** K-means centroid model over a prepared (`idCol`, `vecCol`:
    * array<double>) frame — the shared clustering engine behind
    * [[ivfTopK]]'s cell index and `Dedup.semanticPairs`' SemDeDup
    * clustering. k-means||-style seeding (Bahmani et al., VLDB 2012)
    * + `lloydIters` Lloyd refinement passes, all DataFrame aggs; the
    * returned model is nCells × dim doubles.
    *
    * Seeding: a deterministic hash-ordered oversample of 4×nCells
    * corpus vectors (TakeOrderedAndProject — distributed, no skew
    * toward low ids like a lowest-id sample, which degenerates when
    * ids correlate with content, e.g. time-ordered corpora), each
    * weighted by how many corpus points it attracts (one distributed
    * assignment pass), then reduced to nCells seeds by weighted
    * k-means++ ON THE DRIVER — the reduction input is 4×nCells×dim
    * doubles, model-sized by construction, exactly the k-means||
    * recipe. A fixed `seed` keeps the whole operator deterministic.
    *
    * The input is persisted (memory-and-disk) across the
    * model-building actions — pool sampling, candidate weighting, the
    * Lloyd passes — and UNPERSISTED before returning: a long-lived
    * session building models repeatedly must not accumulate cached
    * corpora. Driver traffic is model-sized throughout (pool vectors,
    * attraction counts, per-cell means — never the corpus).
    */
  private[operators] def centroidModel(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, seed: Long, lloydIters: Int): Array[Array[Double]] = {
    require(nCells > 0, "nCells must be positive")
    val c = corpus.select(col(idCol).as("__mid"), col(vecCol).as("__mv"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // candidate pool: deterministic pseudo-random oversample
    val pool: Array[Array[Double]] = c
      .orderBy(xxhash64(col("__mid")), col("__mid"))
      .limit(math.max(nCells * 4, nCells))
      .collect().map(_.getSeq[Double](1).toArray)

    val seeds: Array[Array[Double]] =
      if (pool.length <= nCells) pool
      else {
        // k-means|| weighting: attraction counts per candidate
        // (distributed partial+final agg; ≤ 4×nCells longs collected)
        val weights = Array.fill(pool.length)(0.0)
        c.withColumn("cand", element_at(SK.nearestCells(col("__mv"), pool, 1), 1))
          .groupBy("cand").agg(count(lit(1)).as("w"))
          .collect()
          .foreach(r => weights(r.getInt(0)) = r.getLong(1).toDouble)
        // weighted k-means++ reduction over the model-sized pool
        def d2(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
          s
        }
        val rnd = new scala.util.Random(seed)
        // weighted draw that can only land on a POSITIVE-score index:
        // the raw cumulative walk lets float residue dump the leftover
        // mass on the last index even when its score is 0 (an
        // already-chosen point), which would silently duplicate a
        // centroid — fall back to the first positive index instead,
        // and return -1 only when no positive score remains
        def pickPositive(score: Array[Double]): Int = {
          val total = score.sum
          if (total <= 0) return -1
          var r = rnd.nextDouble() * total
          var i = 0
          while (i < score.length - 1 && r >= score(i)) { r -= score(i); i += 1 }
          if (score(i) > 0) i else score.indexWhere(_ > 0)
        }
        val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        val minD2 = Array.fill(pool.length)(Double.PositiveInfinity)
        val first = pickPositive(weights)
        chosen += pool(math.max(0, first))
        var exhausted = false
        while (chosen.size < nCells && !exhausted) {
          var i = 0
          while (i < pool.length) {
            val d = d2(pool(i), chosen.last)
            if (d < minD2(i)) minD2(i) = d
            i += 1
          }
          val pick = pickPositive(
            Array.tabulate(pool.length)(i => weights(i) * minD2(i)))
          if (pick < 0) exhausted = true // < nCells distinct points: done
          else chosen += pool(pick)
        }
        chosen.toArray
      }

    // Lloyd refinement: `lloydIters` [[lloydStep]] passes over the
    // cached corpus
    val refined: Array[Array[Double]] =
      (1 to lloydIters).foldLeft(seeds)((cs, _) => lloydStep(c, "__mv", cs))

    // model built — release the cache (see scaladoc: repeated calls in a
    // long session must not accumulate corpora; the final join's single
    // scan recomputes from source)
    c.unpersist(blocking = false)
    refined
  }

  /** One Lloyd refinement pass: mean of members per cell (cell id =
    * position in the centroid array). Per-dimension means go through
    * posexplode + one hash agg on (cell, pos) — the plan stays a
    * handful of expressions at ANY dim (building `dim` avg() columns
    * instead blows up analysis/codegen at embedding dims like 1536),
    * and the agg is partial+final so the exploded rows never shuffle
    * raw.
    *
    * The result array is indexed BY CELL ID with the previous centroid
    * carried forward for cells that ended the pass with no members —
    * rebuilding by rank would silently shrink the model below nCells
    * and remap cell ids between passes (recall would degrade on small
    * or duplicate-heavy corpora where cells empty out). */
  private[operators] def lloydStep(
      c: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val out = centroids.clone()
    c.withColumn("cell",
      element_at(SK.nearestCells(col(vecCol), centroids, 1), 1))
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
      .groupBy("cell")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
      .collect()
      .foreach(r => out(r.getInt(0)) = r.getSeq[Double](1).toArray)
    out
  }
}
