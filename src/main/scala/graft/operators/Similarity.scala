package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *   - `ivfTopK` — IVF: k centroids trained on a bounded sample
  *     (k-means|| seeding + Lloyd refinement), corpus assigned to
  *     nearest centroid cell; queries probe the nProbe nearest cells.
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
  // private[graft]: the streaming embedding index (Streaming.annFromStore)
  // ranks its probed candidates through the SAME tie rule
  private[graft] def topK(scored: DataFrame, k: Int): DataFrame = {
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
    * seeding + Lloyd refinement over a bounded training sample,
    * deterministic under `seed`; model building costs one corpus
    * pass), corpus assigned to its nearest cell, queries probing the
    * `nProbe` nearest cells. The centroid "model" is tiny (nCells ×
    * dim) and rides a broadcast; everything data-sized stays
    * distributed. The final query join reads the corpus from source —
    * one scan it needs anyway.
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

  /** IVF-PQ ANN (Jégou et al. 2011; the faiss `IVFPQ + refine`
    * pipeline): coarse IVF cells prune the corpus, PRODUCT-QUANTIZED
    * codes stand in for the raw vectors inside the probed cells, and
    * an exact re-rank of the ADC shortlist restores true cosines.
    *
    * Why this is THE 100 TB ANN shape: the candidate join shuffles
    * `m`-byte-class codes (m·4 B here, dim·8 B raw — 16× less at the
    * defaults) instead of embeddings, per-pair scoring is an O(m)
    * table walk (the per-query O(dim·ksub) ADC table is built ONCE
    * per query row by [[SK.pqAdcTable]]), and only the
    * `rerankFactor·k`-row shortlist per query ever touches raw
    * vectors again — via an id-keyed equi-join that broadcasts the
    * shortlist, not the corpus. Both models (coarse centroids + m
    * sub-codebooks) train driver-locally on the ONE bounded
    * hash-ordered sample shared with [[ivfTopK]] ([[trainingSample]]),
    * so model building costs one corpus pass total.
    *
    * Recall levers, by error source: `nProbe` (coarse-cell miss),
    * `rerankFactor` (ADC-ordering miss inside probed cells), `m`/
    * `ksub` (quantization noise). The exact re-rank means reported
    * cosines are always TRUE cosines — approximation can only affect
    * WHICH neighbors surface, never a reported similarity (the same
    * candidates-vs-verify split as the dedup families).
    *
    * Query-side size contract (this tier's broadcast is HEAVIER than
    * lsh/ivf's): the broadcast query frame is exploded to `nProbe`
    * rows per query and each row carries its ADC table — so
    * |queries| · nProbe · (m · ksub · 8 B) must fit a broadcast
    * (defaults: 4 KiB per probe row → ~4 GiB per million query-probe
    * rows). "Queries are the small side" is the contract exactly as in
    * the other tiers, but here small means COUNT, not just bytes — a
    * million-query batch should be split into chunks, or the roles
    * inverted, before this broadcast is the bottleneck.
    */
  def ivfPqTopK(
      queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16, rerankFactor: Int = 4,
      spread: Boolean = true, seed: Long = 42L,
      lloydIters: Int = 2, trainPerCell: Int = 256): DataFrame = {
    require(rerankFactor >= 1, "rerankFactor must be at least 1")
    val c = maybeSpread(corpus, spread)
      .select(col(cIdCol).as("neighbor_id"), V.toDouble(col(cVecCol)).as("cv"))
    val train = trainingSample(c, "neighbor_id", "cv",
      trainCap(nCells, trainPerCell))
    val coarse = centroidsFrom(train, nCells, seed, lloydIters)
    val cbs = pqCodebooksFrom(train, m, ksub, seed)
    val ksubMax = cbs.map(_.length).max
    // ||reconstruction||² per codeword, flat [j·ksubMax + c] — the
    // PQ estimate of the corpus norm, recovered from the code alone
    val normsSq = typedLit((0 until m).flatMap { j =>
      (0 until ksubMax).map { cc =>
        if (cc < cbs(j).length) cbs(j)(cc).map(x => x * x).sum else 0.0
      }
    })

    val encoded = c.select(col("neighbor_id"),
        element_at(SK.nearestCells(col("cv"), coarse, 1), 1).as("cell"),
        SK.pqEncode(col("cv"), cbs).as("code"))
      .withColumn("rn", sqrt(aggregate(
        zip_with(col("code"), sequence(lit(0), lit(m - 1)),
          (cd, j) => element_at(normsSq, j * ksubMax + cd + 1)),
        lit(0.0), _ + _)))

    val qBase = queries.select(col(qIdCol).as("query_id"),
        V.toDouble(col(qVecCol)).as("qv"))
      .withColumn("qn", sqrt(DotProduct(col("qv"), col("qv"))))
    val q = qBase
      .withColumn("tbl", SK.pqAdcTable(col("qv"), cbs))
      .withColumn("cell", explode(SK.nearestCells(col("qv"), coarse, nProbe)))
      .select("query_id", "qn", "tbl", "cell")

    val adc = encoded.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adot", aggregate(
        zip_with(col("code"), sequence(lit(0), lit(m - 1)),
          (cd, j) => element_at(col("tbl"), j * ksubMax + cd + 1)),
        lit(0.0), _ + _))
      .withColumn("acos",
        when(col("rn") > 0.0 && col("qn") > 0.0,
          col("adot") / (col("qn") * col("rn"))).otherwise(lit(-2.0)))

    // the shortlist window ranks a SLIM projection — (query, candidate,
    // score) only — so the exchange it needs never carries the raw
    // query vector per candidate row (that would re-inflate the shuffle
    // to raw-vector volume, defeating the code-sized-shuffle contract);
    // qv/qn come back via a broadcast of the tiny query frame
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("acos").desc, col("neighbor_id"))
    val shortlist = adc
      .select("query_id", "neighbor_id", "acos")
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= k * rerankFactor)
      .select("query_id", "neighbor_id")
      .join(broadcast(qBase), Seq("query_id"))

    // the corpus side stays in place: the rerankFactor·k-per-query
    // shortlist is the broadcast side, never the corpus. The re-rank
    // guards zero norms like the ADC stage (-2.0 sentinel) — an
    // all-zeros embedding must rank LAST, not surface as a NaN cosine
    // (Spark orders NaN above every double).
    val scored = c.join(broadcast(shortlist), Seq("neighbor_id"))
      .withColumn("cn", sqrt(DotProduct(col("cv"), col("cv"))))
      .withColumn("cosine",
        when(col("cn") > 0.0 && col("qn") > 0.0,
          DotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .otherwise(lit(-2.0)))
    topK(scored, k)
  }

  /** Cluster-balanced (diversity) sampling — the embedding-space
    * curation recipe: k-means cells partition the corpus by content
    * region, then an EXACT, content-stable `perCell` rows are taken
    * from each cell, so dense regions stop dominating the sample and
    * sparse regions keep representation (cluster-stratified curation;
    * the coverage-balancing complement of SemDeDup's within-cell
    * pruning). Composes the audited primitives: the driver-local
    * sample-trained [[centroidModel]] (one corpus pass), an in-plan
    * nearest-cell assignment, and [[Sampling.takePerStratum]]'s
    * two-phase per-stratum prefix rank (exact counts, no
    * stratum-sized single-partition window, selection invariant to
    * partitioning/engine by md5 rank). Output = input columns +
    * `cell`.
    */
  def clusterBalancedSample(
      df: DataFrame, idCol: String, vecCol: String,
      perCell: Long, nCells: Int = 16, seed: Long = 42L,
      lloydIters: Int = 2, spread: Boolean = true): DataFrame = {
    require(perCell > 0, "perCell must be positive")
    val prepared = maybeSpread(df, spread)
      .withColumn("__v", V.toDouble(col(vecCol)))
    val model = centroidModel(prepared, idCol, "__v", nCells, seed,
      lloydIters)
    val assigned = prepared
      .withColumn("cell",
        element_at(SK.nearestCells(col("__v"), model, 1), 1))
      .drop("__v")
    val take = model.indices.map(i => i.toString -> perCell).toMap
    Sampling.takePerStratum(
      assigned.withColumn("cell", col("cell").cast("string")),
      idCol, "cell", take)
      .withColumn("cell", col("cell").cast("int"))
  }

  /** Per-subspace PQ codebooks from the training sample: the vector
    * splits into `m` contiguous subspaces and each gets an
    * independent L2 k-means codebook of (at most) `ksub` entries —
    * plain driver loops over the model-sized sample, the same
    * contract as [[centroidsFrom]]. Deterministic under `seed` (one
    * derived seed per subspace). A sample with fewer than `ksub`
    * distinct subvectors yields a shorter codebook (the encoder and
    * ADC table handle that by construction). */
  private[operators] def pqCodebooksFrom(
      train: Array[Array[Double]], m: Int, ksub: Int, seed: Long,
      iters: Int = 4): Array[Array[Array[Double]]] = {
    require(train.nonEmpty, "pq codebooks: empty training sample")
    val dim = train(0).length
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    require(ksub > 1, "ksub must be at least 2")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      l2Kmeans(train.map(_.slice(j * dsub, (j + 1) * dsub)), ksub,
        seed + j, iters)
    }
  }

  /** Standard L2 k-means on a driver-side point set: k-means++
    * seeding (Arthur & Vassilvitskii 2007) + `iters` Lloyd passes
    * with empty-cell carry-forward (same policy as [[lloydStep]]).
    * Returns at most `k` centroids — fewer when the points admit
    * fewer distinct seeds. */
  private def l2Kmeans(
      pts: Array[Array[Double]], k: Int, seed: Long,
      iters: Int): Array[Array[Double]] = {
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val rnd = new scala.util.Random(seed)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    chosen += pts(rnd.nextInt(pts.length))
    val minD2 = pts.map(d2(_, chosen.head))
    while (chosen.size < math.min(k, pts.length) && minD2.exists(_ > 0)) {
      val total = minD2.sum
      var r = rnd.nextDouble() * total
      var i = 0
      while (i < pts.length - 1 && r >= minD2(i)) { r -= minD2(i); i += 1 }
      val pick = if (minD2(i) > 0) i else minD2.indexWhere(_ > 0)
      chosen += pts(pick)
      var p = 0
      while (p < pts.length) {
        val d = d2(pts(p), chosen.last)
        if (d < minD2(p)) minD2(p) = d
        p += 1
      }
    }
    var cents = chosen.toArray
    val dim = pts(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](cents.length, dim)
      val counts = new Array[Long](cents.length)
      pts.foreach { p =>
        var best = 0
        var bestD = Double.PositiveInfinity
        var ci = 0
        while (ci < cents.length) {
          val d = d2(p, cents(ci))
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        var d = 0
        while (d < dim) { sums(best)(d) += p(d); d += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(cents.length) { ci =>
        if (counts(ci) > 0) Array.tabulate(dim)(d => sums(ci)(d) / counts(ci))
        else cents(ci)
      }
      it += 1
    }
    cents
  }

  /** K-means centroid model over a prepared (`idCol`, `vecCol`:
    * array<double>) frame — the shared clustering engine behind
    * [[ivfTopK]]'s cell index and `Dedup.semanticPairs`' SemDeDup
    * clustering. k-means||-style seeding (Bahmani et al., VLDB 2012)
    * + `lloydIters` Lloyd refinement passes; the returned model is
    * nCells × dim doubles.
    *
    * Seeding: a deterministic hash-ordered oversample of 4×nCells
    * vectors — the training sample's prefix (TakeOrderedAndProject on
    * the corpus — no skew toward low ids like a lowest-id sample,
    * which degenerates when ids correlate with content, e.g.
    * time-ordered corpora), each weighted by how many training points
    * it attracts, then reduced to nCells seeds by weighted k-means++ —
    * the reduction input is 4×nCells×dim doubles, model-sized by
    * construction, exactly the k-means|| recipe. A fixed `seed` keeps
    * the whole operator deterministic.
    *
    * Training runs on a bounded deterministic SAMPLE, the standard IVF
    * recipe (faiss trains its coarse quantizer on O(100) vectors per
    * centroid): ONE corpus action extracts the first
    * `nCells · trainPerCell` rows of the xxhash64(id) order — the same
    * order the seed pool draws from, so a corpus at or below the cap
    * trains on exactly the full corpus — and seeding, weighting and
    * the Lloyd passes are then plain driver loops over the sample.
    * The collect is model-sized BY CONSTRUCTION (cap · dim doubles —
    * a few MB at embedding dims), the same contract as the pool
    * collect before it; distributing a few-MB k-means is pure
    * scheduling overhead (measured: 4 extra jobs ≈ +1 s at sf0.1),
    * and nothing is ever persisted. Model building therefore costs
    * one corpus pass regardless of `lloydIters`; only the caller's
    * final cell assignment touches the corpus again. K-means over a
    * uniform sample estimates the cell means with sampling noise
    * ~1/sqrt(trainPerCell) per cell — recall-neutral at the defaults,
    * and gated by the recall specs.
    */
  private[graft] def centroidModel(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, seed: Long, lloydIters: Int,
      trainPerCell: Int = 256): Array[Array[Double]] = {
    centroidsFrom(
      trainingSample(corpus, idCol, vecCol,
        trainCap(nCells, trainPerCell)),
      nCells, seed, lloydIters)
  }

  /** Absolute ceiling on the driver-side training sample. The
    * per-cell budget (`trainPerCell`) alone is NOT a bound when the
    * caller auto-sizes nCells from the corpus (SemDeDup's fixed cell
    * size makes nCells ∝ n, so nCells·trainPerCell ∝ n — collecting
    * half the corpus is exactly the driver materialization this
    * engine forbids). Above the ceiling the effective per-cell budget
    * shrinks (more sampling noise per cell — recall-gated, and the
    * multi-probe lever compensates); driver memory is bounded at
    * MaxTrainVectors · dim · 8 B regardless of corpus or cell count —
    * made ABSOLUTE by [[trainCap]]'s loud rejection of nCells beyond
    * the ceiling (a sample smaller than nCells could not even seed
    * the model). */
  private[operators] val MaxTrainVectors: Int = 1 << 18

  /** How many lazy diversity folds [[mmrSelect]] stacks before cutting
    * the plan with an eager checkpoint: between cuts a round's pass
    * re-evaluates ≤ this many single-vector dot products per row
    * (CPU-cheap, bounded codegen), and the candidate frame is rewritten
    * to executor storage only k/this times across the run — the middle
    * ground between the O(k²)-literal rebuild and a per-round frame
    * rewrite. */
  private[operators] val MmrCheckpointEveryRounds = 8

  /** The shared sample-size bound for both model trainers — one
    * definition so the ceiling cannot drift between the IVF and PQ
    * paths. */
  /** Scale-correct cell count: n / targetCellSize (≥ 4, clamped at
    * [[Dedup.MaxAutoCells]]). A PINNED cell count makes the IVF
    * candidate join Σ|cell|² quadratic in corpus size (the r7 10x
    * probe measured e10 = 1.39 on q136 with nCells = 16); this rule
    * holds cell size ~constant so candidate volume stays linear up to
    * the clamp. */
  private[operators] def autoCells(n: Long, targetCellSize: Int): Int =
    math.min(Dedup.MaxAutoCells.toLong,
      math.max(4L, n / targetCellSize)).toInt

  private[operators] def trainCap(nCells: Int, trainPerCell: Int): Int = {
    require(nCells > 0, "nCells must be positive")
    require(trainPerCell >= 4, "trainPerCell must be at least 4")
    require(nCells <= MaxTrainVectors,
      s"nCells=$nCells exceeds the driver-local training ceiling " +
        s"($MaxTrainVectors): a bounded sample cannot seed that many " +
        "centroids — reduce nCells or shard the corpus")
    math.min(nCells.toLong * trainPerCell, MaxTrainVectors.toLong).toInt
  }

  /** The bounded deterministic training sample both model trainers
    * draw from: the first `cap` rows of the xxhash64(id) order — ONE
    * corpus action, model-sized by construction (cap · dim doubles).
    * Exposed separately so [[ivfPqTopK]] trains its coarse centroids
    * AND its PQ codebooks from a single collect. */
  private[operators] def trainingSample(
      corpus: DataFrame, idCol: String, vecCol: String,
      cap: Int): Array[Array[Double]] =
    corpus
      .select(col(idCol).as("__mid"), col(vecCol).as("__mv"))
      .orderBy(xxhash64(col("__mid")), col("__mid"))
      .limit(cap)
      .collect().map(_.getSeq[Double](1).toArray)

  private[operators] def centroidsFrom(
      train: Array[Array[Double]],
      nCells: Int, seed: Long, lloydIters: Int): Array[Array[Double]] = {
    // candidate pool: the sample's prefix (same hash order)
    val pool: Array[Array[Double]] =
      train.take(math.max(nCells * 4, nCells))

    val seeds: Array[Array[Double]] =
      if (pool.length <= nCells) pool
      else {
        // k-means|| weighting: attraction counts per candidate over
        // the training sample (cosine-nearest, [[nearestIdx]] — the
        // same rule the in-plan NearestCells expression applies)
        val weights = Array.fill(pool.length)(0.0)
        val poolNorms = pool.map(norm2)
        train.foreach { v =>
          val i = nearestIdx(v, pool, poolNorms)
          if (i >= 0) weights(i) += 1.0
        }
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
    // training sample
    (1 to lloydIters).foldLeft(seeds)((cs, _) => lloydStep(train, cs))
  }

  private def norm2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** Cosine-nearest centroid index with EXACTLY the in-plan
    * [[SK.nearestCells]] rule — ties to the lowest index, zero-norm
    * vectors/centroids score -2.0 — so the driver-side training and
    * the expression-side assignment agree on every boundary case. */
  private def nearestIdx(
      v: Array[Double], cents: Array[Array[Double]],
      norms: Array[Double]): Int = {
    val vn = norm2(v)
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length != v.length)
        throw new IllegalArgumentException(
          s"centroid model: vector dim ${v.length} != centroid dim ${cent.length}")
      var acc = 0.0; var d = 0
      while (d < v.length) { acc += v(d) * cent(d); d += 1 }
      val sim = if (vn == 0.0 || norms(c) == 0.0) -2.0
        else acc / (vn * norms(c))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** One Lloyd refinement pass over the training sample: mean of
    * members per cell (cell id = position in the centroid array;
    * cosine-nearest assignment, [[nearestIdx]]).
    *
    * The result array is indexed BY CELL ID with the previous centroid
    * carried forward for cells that ended the pass with no members —
    * rebuilding only from observed members would silently shrink the
    * model below nCells and remap cell ids between passes (recall
    * would degrade on small or duplicate-heavy corpora where cells
    * empty out). */
  private[operators] def lloydStep(
      train: Array[Array[Double]],
      centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val out = centroids.clone()
    if (train.isEmpty || centroids.isEmpty) return out
    val norms = centroids.map(norm2)
    val dim = train(0).length
    val sums = Array.ofDim[Double](centroids.length, dim)
    val counts = new Array[Long](centroids.length)
    train.foreach { v =>
      val c = nearestIdx(v, centroids, norms)
      if (c >= 0) {
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
        counts(c) += 1
      }
    }
    var c = 0
    while (c < centroids.length) {
      if (counts(c) > 0)
        out(c) = Array.tabulate(dim)(d => sums(c)(d) / counts(c))
      c += 1
    }
    out
  }

  /** Anchor-similarity mining — "find more like these": every corpus
    * vector scored by its best cosine against a small set of ANCHOR
    * embeddings (positive prototypes — hand-picked exemplars of the
    * domain being mined), with the winning anchor id and a keep flag.
    * The seed-based retrieval filter of embedding-curation pipelines
    * (mine a web-scale corpus for documents resembling a curated seed
    * set).
    *
    * Scale shape: the anchor side is broadcast (anchors are O(10²) by
    * use-case — each corpus row meets every anchor map-side, no
    * corpus shuffle for the join), and the per-vector best is one
    * partial+final `max` of a (cosine, anchor) struct keyed by the
    * vector id — argmax ties break toward the SMALLEST anchor id via
    * the negated-id struct field, on the ROUNDED cosine so the winner
    * is a pure function of gate-compared values. Norms are
    * precomputed per side, the kernel is the fused [[DotProduct]].
    */
  def anchorSimilarity(
      corpus: DataFrame, idCol: String, vecCol: String,
      anchors: DataFrame, aIdCol: String, aVecCol: String,
      threshold: Double, spread: Boolean = true): DataFrame = {
    val c = maybeSpread(corpus, spread)
      .select(col(idCol).as("id"), V.toDouble(col(vecCol)).as("v"))
      .withColumn("vn", sqrt(DotProduct(col("v"), col("v"))))
    val a = anchors
      .select(col(aIdCol).as("aid"), V.toDouble(col(aVecCol)).as("av"))
      .withColumn("an", sqrt(DotProduct(col("av"), col("av"))))
    c.crossJoin(broadcast(a))
      .withColumn("cos", round(
        DotProduct(col("v"), col("av")) / (col("vn") * col("an")), 4))
      .groupBy(col("id"))
      .agg(max(struct(col("cos"), negate(col("aid")).as("na"))).as("b"))
      .select(col("id"),
        negate(col("b.na")).as("best_anchor"),
        col("b.cos").as("cosine"),
        (col("b.cos") >= threshold).as("keep"))
  }

  /** Triplet mining for contrastive training (FaceNet, Schroff et al.
    * 2015 §3.2, public): for each ANCHOR vector, the hardest positive
    * proxy (nearest neighbor sharing its label, self excluded) and the
    * hardest negative (nearest neighbor with a DIFFERENT label), plus
    * the margin between them. Anchors with a negative margin are the
    * ones a metric-learning pass should train on; anchors missing
    * either side (singleton label, or a single-label corpus) are
    * dropped — a triplet needs all three corners.
    *
    * Scale shape: the [[anchorSimilarity]] pattern — the anchor side
    * is broadcast (model-sized by contract: mining batches are O(10³)
    * anchors per pass; shard bigger anchor sets across calls), the
    * corpus streams by map-side, and BOTH argmaxes ride ONE
    * partial+final aggregate keyed by anchor id (conditional
    * (rounded-cosine, negated-id) struct maxes — no window, no
    * per-anchor task). Ties break toward the smallest neighbor id on
    * the ROUNDED cosine, so winners are a pure function of
    * gate-compared values. Corpus-wide mining (every vector an
    * anchor) belongs on the [[knnGraph]] IVF path instead.
    *
    * Null labels on either side never match `===` or `=!=`, so
    * null-labeled rows contribute to neither side (and a null-labeled
    * anchor yields no triplet). */
  def tripletMine(
      anchors: DataFrame, aIdCol: String, aVecCol: String,
      aLblCol: String,
      corpus: DataFrame, cIdCol: String, cVecCol: String,
      cLblCol: String, spread: Boolean = true): DataFrame = {
    val a = anchors
      .select(col(aIdCol).as("anchor_id"),
        V.toDouble(col(aVecCol)).as("av"), col(aLblCol).as("albl"))
      .withColumn("an", sqrt(DotProduct(col("av"), col("av"))))
    val c = maybeSpread(corpus, spread)
      .select(col(cIdCol).as("nid"), V.toDouble(col(cVecCol)).as("cv"),
        col(cLblCol).as("clbl"))
      .withColumn("cn", sqrt(DotProduct(col("cv"), col("cv"))))
    c.crossJoin(broadcast(a))
      .filter(col("anchor_id") =!= col("nid"))
      .withColumn("cos", round(
        DotProduct(col("av"), col("cv")) / (col("an") * col("cn")), 4))
      .groupBy(col("anchor_id"))
      .agg(
        max(when(col("albl") === col("clbl"),
          struct(col("cos"), negate(col("nid")).as("ni")))).as("p"),
        max(when(col("albl") =!= col("clbl"),
          struct(col("cos"), negate(col("nid")).as("ni")))).as("n"))
      .filter(col("p").isNotNull && col("n").isNotNull)
      .select(col("anchor_id"),
        negate(col("p.ni")).as("pos_id"), col("p.cos").as("pos_cos"),
        negate(col("n.ni")).as("neg_id"), col("n.cos").as("neg_cos"),
        round(col("p.cos") - col("n.cos"), 4).as("margin"))
  }

  /** Approximate k-nearest-neighbor GRAPH over the whole corpus — every
    * vector's top-k neighbors by cosine, the substrate of graph-based
    * curation analytics (SemDeDup's cluster inspection, diversity
    * audits, label propagation). Same IVF pruning as
    * [[Dedup.semanticPairs]]: k-means cells bound the candidate space
    * to within-cell pairs (Σ|cell|² ≈ n·cellSize — linear in the
    * corpus at fixed cell size), `probes` soft-assigns each vector to
    * its nearest cells for boundary recall. Unlike the `*TopK` serving
    * tiers there is no broadcast query side — BOTH sides of the cell
    * join are the corpus, so the graph build is one shuffled equi-join
    * on the cell id however large the corpus is.
    *
    * Ranking is a per-query window over the probed candidates —
    * partitioned by query id, so the sort is bounded by
    * probes·cellSize rows per query, never corpus-wide. Reported
    * cosines are exact ([[DotProduct]] on the raw vectors); recall < 1
    * is the IVF trade (a true neighbor in an unprobed cell is missed),
    * measured against brute force in SimilaritySpec. Output matches
    * the serving tiers: (query_id, rank, neighbor_id, cosine), ties
    * broken by neighbor id. Like q29/q85, the trained centroid space
    * is engine-local — content-golden gating, no SQL oracle.
    */
  def knnGraph(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      nCells: Int = 0, targetCellSize: Int = 512, probes: Int = 1,
      seed: Long = 42L, lloydIters: Int = 2,
      spread: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    require(targetCellSize > 0, "targetCellSize must be positive")
    require(probes >= 1, "probes must be at least 1")
    val c = maybeSpread(df, spread)
      .select(col(idCol).as("id"), V.toDouble(col(vecCol)).as("v"))
    val kc = if (nCells > 0) nCells
             else autoCells(df.count(), targetCellSize)
    val centroids = centroidModel(c, "id", "v", kc, seed, lloydIters)
    val assigned = c
      .withColumn("cell",
        explode(SK.nearestCells(col("v"), centroids, math.min(probes, kc))))
      .withColumn("ss", DotProduct(col("v"), col("v")))
    val a = assigned.select(col("cell"), col("id").as("query_id"),
      col("v").as("qv"), col("ss").as("qss"))
    val b = assigned.select(col("cell"), col("id").as("neighbor_id"),
      col("v").as("nv"), col("ss").as("nss"))
    val scored0 = a.join(b, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", DotProduct(col("qv"), col("nv")) /
        (sqrt(col("qss")) * sqrt(col("nss"))))
      .select("query_id", "neighbor_id", "cosine")
    // multi-probe: a pair meeting in several shared cells repeats with
    // a BIT-IDENTICAL cosine (same vectors, same fold) — dedup before
    // ranking so duplicates can't occupy two ranks
    val scored = if (probes > 1) scored0.distinct() else scored0
    topK(scored, k)
  }

  /** Embedding-space outlier scoring against per-GROUP mean centroids —
    * the "does this vector even belong to its cohort" scrub of
    * embedding-curation pipelines (off-topic/noise removal before
    * semantic dedup or coverage sampling): each vector is scored by
    * cosine against the mean embedding of its group (label, language,
    * source, cluster id …) and flagged when the ROUNDED cosine falls
    * below `threshold`.
    *
    * Scale shape, fully distributed end to end (unlike the k-means
    * engines, this trains nothing on the driver):
    *   - centroid estimation is `posexplode` → partial+final `avg` on
    *     the (group, dim) key — map-side partial aggregation collapses
    *     the dim-exploded stream before it ships, so the shuffle is
    *     bounded by partitions × groups × dims rows, never corpus-sized;
    *   - the centroid table (groups × dims doubles) joins back under an
    *     explicit `broadcast()` — model-sized by the same contract as
    *     the IVF centroid lists;
    *   - scoring is the fused [[graft.plans.DotProduct]] per row, norms
    *     precomputed per side.
    * The input lineage is consumed twice (centroid agg + scoring) — the
    * documented no-persist two-pass trade ([[Dedup.dupSpanScrub]]).
    *
    * Float contract: centroid components are float `avg`s (summation
    * order differs between engines and runs by last-ulps), so the
    * cosine is rounded to 4 decimals BEFORE the threshold compare —
    * the flag is then a pure function of the gate-compared value.
    * Rows with a null group or vector keep their null cosine and a
    * null flag; a zero-norm vector yields NaN (0/0), documented.
    */
  def centroidCosineOutliers(
      df: DataFrame, idCol: String, vecCol: String, groupCol: String,
      threshold: Double, spread: Boolean = true): DataFrame = {
    val base = maybeSpread(df, spread).select(
      col(idCol).as("id"), col(groupCol).as("grp"),
      V.toDouble(col(vecCol)).as("v"))
    val comp = base
      .select(col("grp"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(avg(col("x")).as("m"))
    val centroids = comp
      .groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
      .withColumn("cn", sqrt(DotProduct(col("c"), col("c"))))
    base
      .withColumn("vn", sqrt(DotProduct(col("v"), col("v"))))
      .join(broadcast(centroids), Seq("grp"), "left_outer")
      .withColumn("cos_centroid",
        round(DotProduct(col("v"), col("c")) / (col("vn") * col("cn")), 4))
      .select(col("id"), col("grp"), col("cos_centroid"),
        (col("cos_centroid") < threshold).as("is_outlier"))
  }

  /** Label-centroid confusion matrix — the label-quality diagnostic
    * before training a classifier or contrastive head on the corpus:
    * pairwise cosine between per-label mean vectors. Label pairs whose
    * centroids nearly coincide are merge candidates (or annotation
    * noise); the matrix is the read that finds them without any
    * per-example pass.
    *
    * Scale shape: centroids come from ONE (label, dim)-keyed
    * partial+final average over the posexploded corpus (the
    * [[centroidCosineOutliers]] kernel — corpus-linear, no windows);
    * the pairwise stage is a broadcast self-join of the LABEL-sized
    * centroid frame (labels² pairs — model-sized by definition, never
    * corpus-sized). Upper triangle only (grp_a < grp_b by the
    * column's natural order). Cosines rounded to 4dp (the q134
    * precedent: double averages agree cross-engine at that grain). */
  def labelConfusion(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
      V.toDouble(col(vecCol)).as("v"))
      .filter(col("grp").isNotNull)
    val centroids = base
      .select(col("grp"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(avg(col("x")).as("m"), count(lit(1)).as("cnt"))
      .groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"),
        max(col("cnt")).as("n"))
      .withColumn("cn", sqrt(DotProduct(col("c"), col("c"))))
    val a = centroids.select(col("grp").as("grp_a"), col("c").as("ca"),
      col("cn").as("na"), col("n").as("n_a"))
    val b = centroids.select(col("grp").as("grp_b"), col("c").as("cb"),
      col("cn").as("nb"), col("n").as("n_b"))
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        round(DotProduct(col("ca"), col("cb")) / (col("na") * col("nb")), 4)
          .as("centroid_cosine"))
  }

  /** Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein
    * 1998, public): greedily select `k` vectors maximizing
    * `λ·sim(c, query) − (1−λ)·max_{s∈selected} sim(c, s)` — the
    * relevance/diversity trade every retrieval-for-context and
    * diverse-few-shot-selection step runs, where a plain top-k returns
    * k near-copies of the best hit. Output: one row per selection,
    * `(rank, id, rel_milli, div_milli, score_milli)` in selection
    * order.
    *
    * Exactness: every similarity is ROUNDED to integer milli before
    * entering a comparison and the score is pure integer arithmetic
    * (`lambdaMilli·rel − (1000−lambdaMilli)·div`), so the greedy
    * argmax — ties to the smallest id — is a function of gate-compared
    * integers and replays bit-identically in SQL (the q120/q141
    * fixed-point discipline applied to a greedy loop).
    *
    * Scale shape: the scored candidate frame is materialized ONCE and
    * the max-similarity-to-selected term is carried FORWARD on it —
    * after each selection the frame drops the winner and folds
    * `div' = greatest(div, sim(·, newest))` in LAZILY, re-checkpointed
    * (predecessor released) only every [[MmrCheckpointEveryRounds]]
    * rounds. Between checkpoints a round's pass re-evaluates at most
    * that many stacked single-vector dot products per row (CPU-cheap,
    * bounded plan size); at the boundary one materialization cuts the
    * stack. So neither failure mode of the naive spellings occurs:
    * not the O(k²) all-selected `greatest` literal rebuild (plan /
    * codegen blowup near k = 1000), and not a full candidate-frame
    * rewrite to executor storage on EVERY round (I/O blowup at corpus
    * scale with small k — the q212 shape). Each round finishes in a
    * TakeOrderedAndProject of ONE row. The driver holds exactly k
    * (id, vector) pairs: the bounded-collect contract (k is a
    * result-page size by use-case, enforced ≤ 1000). Zero-norm
    * vectors are excluded (cosine undefined).
    *
    * `shortlist = Some(N)` (N ≥ k) is the 100 TB spelling: candidates
    * are pre-cut to the top-N by relevance (rel desc, id asc — total
    * order, deterministic cut) and the k greedy rounds scan N rows
    * instead of the corpus. EXACT whenever the shortlist provably
    * contains every possible selection: N ≥ the eligible corpus size,
    * or `lambdaMilli = 1000` (pure relevance — the greedy argmax can
    * never leave the top-k, so any N ≥ k reproduces the full run).
    * Otherwise it is the standard production recall contract
    * (Carbonell & Goldstein's reranking framing: MMR re-ranks a
    * relevance retrieval): a candidate can out-score a shortlist
    * member only by the diversity term, whose reach is bounded —
    * λ·(rel_in − rel_out) > 2·(1000−λ)·1000 for the worst in/out
    * relevance gap guarantees no exclusion matters — so pick N ≫ k
    * (100× is customary). Default None keeps the exact full-corpus
    * greedy the q212 gate pins. */
  def mmrSelect(
      corpus: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, lambdaMilli: Long = 700L,
      spread: Boolean = true, shortlist: Option[Int] = None): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in [1, 1000]")
    require(lambdaMilli >= 0L && lambdaMilli <= 1000L,
      "lambdaMilli must be in [0, 1000]")
    shortlist.foreach(n => require(n >= k,
      s"shortlist ($n) must be at least k ($k)"))
    val qn = math.sqrt(query.map(x => x * x).sum)
    require(qn > 0, "query vector must have positive norm")
    val spark = corpus.sparkSession
    def simMilliTo(vec: Seq[Double],
        norm: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val vn = math.sqrt(vec.map(x => x * x).sum)
      round(lit(1000.0) * DotProduct(col("v"), typedLit(vec)) /
        (norm * lit(vn))).cast("long")
    }
    // a superseded round frame's cached blocks are dead weight once the
    // successor is materialized (eager localCheckpoint) — stale frames
    // of executor storage otherwise pile up for the session lifetime
    def release(df: DataFrame): Unit =
      PlanLeaves.localCheckpointRdd(df).foreach(_.unpersist(blocking = false))
    val scored = maybeSpread(corpus, spread)
      .select(col(idCol).as("id"), V.toDouble(col(vecCol)).as("v"))
      .withColumn("vn", sqrt(DotProduct(col("v"), col("v"))))
      .filter(col("vn") > 0)
      .withColumn("rel_milli", simMilliTo(query.toSeq, col("vn")))
    val base = shortlist match {
      case Some(n) => scored.orderBy(col("rel_milli").desc, col("id"))
        .limit(n)
      case None => scored
    }
    // the working frame carries div_milli FORWARD across rounds. The
    // seed is a sentinel BELOW any reachable sim (cosine milli ≥
    // -1000): round 1's score is then a constant shift of pure
    // relevance (same argmax and ties as the spec's div=0 convention
    // — the winner's reported div is pinned to 0 below), and the first
    // fold's greatest(sentinel, sim) yields sim itself, never a
    // zero-floored max — negative diversities survive exactly as the
    // all-selected greatest produced them.
    var ckpt = base.withColumn("div_milli", lit(-2000L))
      .localCheckpoint(true)
    var cur: DataFrame = ckpt
    var lazyFolds = 0
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Any, Seq[Double], Long, Long)] // id, vec, rel, div
    var exhausted = false
    for (round <- 1 to k if !exhausted) {
      val next = cur
        .withColumn("score_milli",
          lit(lambdaMilli) * col("rel_milli") -
            lit(1000L - lambdaMilli) * col("div_milli"))
        .orderBy(col("score_milli").desc, col("id"))
        .limit(1)
        .select("id", "v", "rel_milli", "div_milli")
        .collect()
      // fewer than k eligible vectors: stop instead of launching the
      // remaining rounds as guaranteed-empty scans
      if (next.isEmpty) exhausted = true
      next.foreach { r =>
        val (id, vec) = (r.get(0), r.getSeq[Double](1))
        // round 1's div is 0 by convention (nothing selected yet), not
        // the sentinel the constant-shift trick rode on
        selected += ((id, vec, r.getLong(2),
          if (round == 1) 0L else r.getLong(3)))
        if (round < k) {
          // fold the newest selection in LAZILY: drop the winner, lift
          // div by its similarity — the incremental max equals the
          // all-selected greatest because each pairwise sim is rounded
          // before entering either max. The stack of pending folds is
          // cut by one eager checkpoint every MmrCheckpointEveryRounds
          // rounds: plans stay bounded AND the candidate frame is not
          // rewritten to executor storage every round
          cur = cur
            .filter(col("id") =!= lit(id))
            .withColumn("div_milli", greatest(col("div_milli"),
              simMilliTo(vec, col("vn"))))
          lazyFolds += 1
          if (lazyFolds >= MmrCheckpointEveryRounds) {
            val cut = cur.localCheckpoint(true)
            release(ckpt)
            ckpt = cut
            cur = cut
            lazyFolds = 0
          }
        }
      }
    }
    release(ckpt)
    import scala.jdk.CollectionConverters._
    val rows = selected.toSeq.zipWithIndex.map {
      case ((id, _, rel, div), i) =>
        org.apache.spark.sql.Row(i + 1L, id, rel, div,
          lambdaMilli * rel - (1000L - lambdaMilli) * div)
    }
    val idType = corpus.schema(idCol).dataType
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("id", idType,
          nullable = true),
        org.apache.spark.sql.types.StructField("rel_milli",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("div_milli",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("score_milli",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
