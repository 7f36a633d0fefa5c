package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface: the streaming generalization of the
  * dataflow API (SURVEY §2.2 — the reference is batch-only; its
  * `Reduce` contract generalizes to `flatMapGroupsWithState`).
  *
  * Everything here is incremental-friendly: watermarks bound state,
  * windowed aggs use Spark's streaming hash aggregation, and the
  * sessionizer keeps one small state object per key. At scale, state
  * lives in the state store (RocksDB-backed on a real cluster), keyed
  * by the same hash partitioning as a batch groupBy.
  */
object Streaming {

  /** Nested rather than `extends Logging`: the trait's `log` member
    * would shadow `org.apache.spark.sql.functions.log` across this
    * whole file. */
  private object Log extends org.apache.spark.internal.Logging {
    def warn(msg: => String): Unit = logWarning(msg)
  }

  /** Tumbling/sliding window counts + sums with late-data handling:
    * the direct streaming analogue of `groupBy(window(...))`. */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      slideDuration: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val win = slideDuration match {
      case Some(s) => window(col(tsCol), windowDuration, s)
      case None => window(col(tsCol), windowDuration)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(win.as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(
        col("win.start").as("window_start"),
        col("win.end").as("window_end"),
        col(keyCol), col("n"), col("total"))
  }

  /** Gap-based session aggregation via Spark's built-in
    * `session_window` — the declarative alternative to [[sessionize]]
    * (which keeps arbitrary per-key state): same session boundaries,
    * but limited to mergeable aggregates. Works identically on batch
    * and streaming input; StreamingSpec cross-validates it against
    * [[sessionizeBatch]]. */
  def sessionWindowAgg(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      gap: String, watermark: String = "10 minutes"): DataFrame = {
    val base = if (events.isStreaming) events.withWatermark(tsCol, watermark)
      else events
    base
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("n_events"), col("total_value"))
  }

  /** Streaming exact dedup on a derived fingerprint: drops rows whose
    * fingerprint was already seen within the watermark horizon — the
    * incremental twin of `Dedup.exact` for ingestion pipelines. State
    * is bounded by the watermark (old fingerprints age out; a dup
    * arriving later than `watermark` can slip through — the standard
    * trade of bounded state for exactness-within-horizon). */
  def dedupStream(
      events: DataFrame, tsCol: String, fingerprintCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** Watermarked stream-stream join: match rows of two live streams on
    * a key when the right event lands within
    * [left - within, left + within] event time. Both sides carry
    * watermarks AND the join condition carries the time interval —
    * that pair is what lets Spark bound the join state (each side
    * buffers only `watermark + within` of history per key-partition
    * before eviction); a stream-stream join without the interval would
    * grow state forever. Output is append-mode: a match is emitted
    * once, when both sides have it.
    *
    * `joinType` "inner" (default) or "left_outer": the outer variant
    * emits an unmatched left row (right columns null) only once the
    * watermark proves no in-interval right row can still arrive — the
    * unmatched output is therefore delayed by `watermark + within`,
    * the price of a correct negative at-scale (the standard Spark
    * outer-interval-join contract).
    */
  def intervalJoinStreams(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      within: String, watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    // same-schema streams are the normal case: EVERY right column that
    // collides with a left column is renamed with an `_r` suffix before
    // the join, so the condition (and the caller's projections) are
    // never ambiguous. The suffixed name must itself be FREE on both
    // sides — a right stream already carrying e.g. both "value" and
    // "value_r" would otherwise end up with two "value_r" columns and
    // ambiguous downstream references — so probe `_r`, `_r2`, ... for
    // the first unused suffix (one suffix for the whole rename, keeping
    // the output schema predictable).
    // collisions are detected CASE-INSENSITIVELY: Spark resolves
    // column names case-insensitively by default, so left "Value" vs
    // right "value" is just as ambiguous downstream as an exact match
    // and must be renamed too
    val leftLower = left.columns.map(_.toLowerCase).toSet
    val collisions =
      right.columns.filter(c => leftLower(c.toLowerCase)).toSet
    val taken = (left.columns ++ right.columns).map(_.toLowerCase).toSet
    val suffix = (Iterator("_r") ++ Iterator.from(2).map(i => s"_r$i"))
      .find(s => collisions.forall(c => !taken(s"$c$s".toLowerCase)))
      .get // the probe space is infinite, a free suffix always exists
    val renamed = collisions.foldLeft(right)(
      (d, c) => d.withColumnRenamed(c, s"$c$suffix"))
    val collisionsLower = collisions.map(_.toLowerCase)
    def rName(c: String): String =
      if (collisionsLower(c.toLowerCase)) s"$c$suffix" else c
    val l = left.withWatermark(leftTs, watermark)
    val r = renamed.withWatermark(rName(rightTs), watermark)
    l.join(r,
      col(key) === col(rName(key)) &&
        col(rName(rightTs)) >= col(leftTs) - expr(s"INTERVAL $within") &&
        col(rName(rightTs)) <= col(leftTs) + expr(s"INTERVAL $within"),
      joinType)
      .drop(col(rName(key)))
  }

  /** Stream-static enrichment: join a stream against a static
    * dimension (broadcast — the dim is re-resolved per micro-batch, so
    * slowly-changing dims pick up updates on file sources). The
    * workhorse shape for attaching profiles/metadata to an event
    * stream without stateful streaming joins. */
  def enrich(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Exactly-once(-effective) file sink via foreachBatch: each
    * micro-batch lands in its own `batch_id=<n>` directory with
    * overwrite semantics, so a replayed batch (failure/restart — Spark
    * re-runs the last uncommitted batch id) REPLACES its own previous
    * partial output instead of appending a duplicate. Idempotent
    * per-batch overwrite + the checkpoint's batch-id tracking is the
    * standard exactly-once recipe for file outputs; downstream readers
    * just scan `path` (batch_id is a hive partition column).
    */
  def exactlyOnceFileSink(
      df: DataFrame, path: String, format: String = "parquet")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      writeBatch(batch, path, format, batchId)
    }

  /** The per-batch write — separated so tests (and manual backfills)
    * can invoke a replay directly and observe idempotence. */
  def writeBatch(
      batch: DataFrame, path: String, format: String, batchId: Long): Unit =
    batch.write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format(format)
      .save(s"$path/batch_id=$batchId")

  // --------------------------------------- continuous-ingest dedup

  /** Continuous-ingest near-dup detection: every arriving micro-batch
    * is checked against ITSELF and the accumulated corpus (new×new +
    * new×old — the quadratic old×old bulk is structurally skipped;
    * those pairs surfaced when their docs were themselves the new
    * batch), flagged pairs are appended to `pairsPath` and the batch
    * itself to the corpus at `corpusPath` — both as `batch_id=N`
    * slices, so a replayed batch OVERWRITES its own partitions (the
    * [[exactlyOnceFileSink]] idempotence recipe). Replay safety also
    * requires excluding the current batch's own slice from the "old"
    * corpus read — a half-written slice from a failed attempt would
    * otherwise self-join the batch — which [[IngestStore.read]] does on
    * the partition column (pruned: the excluded slice is never read).
    *
    * Two maintenance devices keep per-batch cost from growing with the
    * accumulated corpus (see [[IngestStore]] for the file protocol):
    *
    *   - the corpus' SHINGLE INDEX is persisted as a sidecar store
    *     (`corpusPath/_shingle_index`, one slice per batch, built by the
    *     same [[graft.operators.Dedup.shingleIndex]] the operators use),
    *     so the new×old candidate join probes a static columnar (id, k)
    *     table instead of re-shingling every old document each batch —
    *     per-batch compute scales with the batch, not the corpus;
    *   - every `compactEvery` batches, both stores are COMPACTED: slices
    *     are absorbed into a single consolidated base partition, so the
    *     file count (and per-batch listing cost) stays bounded by
    *     `compactEvery` instead of growing one slice-directory (with up
    *     to shuffle-partitions files) per batch forever;
    *   - a generational GRAM-LEVEL BLOOM sidecar over the index store
    *     (`corpusPath/_shingle_index/_bloom`, sized by
    *     `idxBloomExpectedItems`/`idxBloomFpp` — constants over the
    *     store's life, like the prep sidecar's knobs;
    *     `idxBloomExpectedItems <= 0` disables the sidecar for streams
    *     whose batches always collide) screens the
    *     batch's gram keys BEFORE any index I/O: a batch with no
    *     might-contain hit provably shares no shingle with the corpus,
    *     so the new×old candidate join folds to an empty relation and
    *     the index scan is skipped for that batch. Lossless (no bloom
    *     false negatives; false positives just take the exact path),
    *     spec-pinned bit-identical with the sidecar present or absent.
    *
    * What remains proportional to corpus size — for batches that DO
    * collide — is one columnar SCAN of the compacted index (the
    * candidate equi-join's probe side) — sequential parquet reads of
    * two long columns, the part a 1000-executor cluster is good at —
    * not corpus-sized SHINGLING or a corpus-sized aggregation:
    * verification compacts per-doc arrays only for candidate-touching
    * docs.
    *
    * `oldMaxDocFreq` — the production hot-gram bound the 10x scale
    * probe priced (BENCH_scale round 7): uncapped, a gram shared by
    * d corpus docs contributes d candidate rows to EVERY batch that
    * carries it in a prefix — corpus-boilerplate grams make per-batch
    * candidate mass grow with corpus size. The cap drops
    * hotter-than-cap grams from CANDIDATE generation only
    * (verification Jaccards stay exact; the recall contract matches
    * the batch operators' `maxDocFreq`: a true pair is missed only if
    * every shared prefix gram is that hot). None (default) keeps the
    * lossless parity the q94 gate pins.
    *
    * Contracts: `n` must stay constant over a store's life (the stored
    * index keys are n-dependent); an id re-ingested in the SAME batch
    * as its update supersedes cleanly (new version replaces old in the
    * check), and a re-ingest in a LATER batch supersedes at the next
    * COMPACTION (`IngestStore.compact` keeps only each id's
    * latest-batch rows in corpus and index — the latest-version-wins
    * contract): batches between the re-ingest and that compaction
    * still verify against the union of both versions' shingles — the
    * bounded (≤ `compactEvery` batches) degradation of not paying a
    * per-id max-batch shuffle on every micro-batch. A legacy corpus
    * written before the index
    * sidecar existed is migrated in place: the first batch that sees the
    * coverage gap shingles the old corpus once and seeds the index store
    * with a compacted base (crash-safe, one-time O(corpus) catch-up).
    */
  def dedupIngest(
      stream: DataFrame, corpusPath: String, pairsPath: String,
      idCol: String, textCol: String, n: Int, threshold: Double,
      compactEvery: Int = 16,
      idxBloomExpectedItems: Long = 1L << 20,
      idxBloomFpp: Double = 0.03,
      oldMaxDocFreq: Option[Int] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      ingestDedupBatch(batch, batchId, corpusPath, pairsPath,
        idCol, textCol, n, threshold, compactEvery,
        idxBloomExpectedItems, idxBloomFpp, oldMaxDocFreq)
    }

  /** The per-batch step — separated (like [[writeBatch]]) so tests and
    * manual backfills can replay a batch directly and observe
    * idempotence. All store reads go through [[IngestStore.read]]'s
    * explicit-schema contract (an existing-but-empty directory reads as
    * zero rows instead of killing batch 0 in schema inference). */
  def ingestDedupBatch(
      batch: DataFrame, batchId: Long, corpusPath: String,
      pairsPath: String, idCol: String, textCol: String,
      n: Int, threshold: Double, compactEvery: Int = 16,
      idxBloomExpectedItems: Long = 1L << 20,
      idxBloomFpp: Double = 0.03,
      oldMaxDocFreq: Option[Int] = None): Unit = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    // persisted: the batch lineage is consumed by the index-slice
    // write, the supersede anti-join, the final corpus-slice write and
    // (on the fallback path) a full re-shingle — without the cache each
    // action re-runs the source scan, the cost prepIngestBatch's
    // winners cache already eliminates on its path. Batch-sized by
    // definition; released in the finally.
    val sel = batch.select(col(idCol), col(textCol)).persist()
    try {
      val corpusSchema = sel.schema
      // underscore prefix hides the sidecar from corpus-root reads (the
      // hidden-name filter applies to DISCOVERED children, not to a path
      // given explicitly as a read root — Spark logs a spurious "all paths
      // were ignored" warning but lists and reads it; IngestStoreSpec's
      // 20-batch case pins the behavior via the cross-batch pairs)
      val indexPath = s"$corpusPath/_shingle_index"
      val idxSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "id", sel.schema(idCol).dataType, nullable = true),
        org.apache.spark.sql.types.StructField(
          "k", org.apache.spark.sql.types.LongType, nullable = true)))
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
        // latest-version-wins supersede rides the compaction rewrite:
        // an id re-ingested in a later batch drops its superseded
        // versions from corpus AND index here, so post-compaction
        // batches verify against only the latest text
        IngestStore.compact(spark, corpusPath, corpusSchema,
          upTo = batchId, latestPerKey = Some(idCol))
        IngestStore.compact(spark, indexPath, idxSchema,
          upTo = batchId, latestPerKey = Some("id"))
      }
      // the batch's index slice is written FIRST and the pairs job reads
      // it back from parquet: candidate generation + verification
      // reference the batch index many times (prefix ranking, the
      // self-join, the union for verify), and each reference would
      // otherwise re-run the scan+shingle+explode lineage — materializing
      // once turns those into cheap columnar re-reads (measured ~2x on
      // the parity gate). Idempotent like every slice write.
      writeBatch(Dedup.shingleIndex(sel, idCol, textCol, n,
        partitionCol = None), indexPath, "parquet", batchId)
      val ni = spark.read.schema(idxSchema)
        .parquet(s"$indexPath/batch_id=$batchId")
      val corpusCov = IngestStore.coverage(spark, corpusPath, batchId)
      var idxCov = IngestStore.coverage(spark, indexPath, batchId)
      // seed only when the index is STRICTLY BEHIND the corpus: if the
      // index covers at least as far (e.g. corpus tail slices removed
      // externally while index slices survive), seeding cannot reconcile
      // the two — it would re-shingle the whole corpus every batch and
      // still land on the fallback. Skip straight to the fallback there.
      if (idxCov != corpusCov && corpusCov.prefix > 0 &&
          corpusCov.contiguous && idxCov.prefix < corpusCov.prefix) {
        // one-time catch-up (legacy pre-sidecar corpus, or a crash between
        // the two stores' writes): shingle the old corpus once and seed the
        // index store with an equivalent compacted base
        val oldWithBatch = IngestStore.read(
          spark, corpusPath, corpusSchema, excludeBatch = batchId)
        IngestStore.seedBase(spark, indexPath,
          Dedup.shingleIndex(oldWithBatch, idCol, textCol, n,
            partitionCol = None, carry = Seq("batch_id")),
          upTo = corpusCov.prefix)
        idxCov = IngestStore.coverage(spark, indexPath, batchId)
      }
      val indexed = idxCov == corpusCov
      // gram-level bloom sidecar over the index store (the same
      // generational machinery the prep store uses for fingerprints):
      // screens the BATCH's gram keys before any index I/O — a batch
      // whose grams the sketch has never seen cannot share a key with
      // any stored doc, so the new×old candidate join and the verify
      // restriction fold to an empty relation and the
      // corpus-proportional index scan is skipped outright. Lossless:
      // blooms have no false negatives (a missed collision is
      // impossible), and a false positive only routes the batch down
      // the normal exact path. The sidecar over-approximates after a
      // supersede compaction (it still remembers dropped versions'
      // grams) — one-sided in the safe direction.
      // idxBloomExpectedItems <= 0 disables the sidecar entirely (no
      // probe, no maintenance) — the knob for streams whose batches
      // always collide with the corpus, where the screen can never
      // fire and its per-batch build cost buys nothing
      val idxBloomOn = idxBloomExpectedItems > 0L
      val sidecar =
        if (!indexed || !idxBloomOn) None
        else IngestStore.latestBloom(spark, indexPath, beforeBatch = batchId)
      val sidecarCovers =
        sidecar.exists { case (upto, _) => idxCov.allAtOrBelow(upto) }
      // ONE fused pass over the batch index computes BOTH sidecar
      // artifacts: the batch's own bloom (tomorrow's sidecar merge) and
      // the any-hit probe against the predecessor sidecar (today's
      // skip decision) — instead of a probe job plus a separate
      // stat.bloomFilter job
      val fused =
        if (!indexed || !idxBloomOn) None
        else {
          val hitCol = sidecar match {
            case Some((_, bf)) if sidecarCovers =>
              max(when(
                IngestStore.mightContain(spark, bf, col("k")), lit(1))
                .otherwise(lit(0)))
            case _ => max(lit(1)) // no usable sidecar: never skip
          }
          Some(ni.agg(
            IngestStore.bloomAggCol(col("k"), idxBloomExpectedItems,
              idxBloomFpp).as("bf"),
            hitCol.as("hit")).head())
        }
      val batchBloom = fused.flatMap(r =>
        if (r.isNullAt(0)) None // empty batch
        else Some(org.apache.spark.util.sketch.BloomFilter
          .readFrom(r.getAs[Array[Byte]](0))))
      val pairs =
        if (indexed) {
          val oldIdxAll = IngestStore
            .read(spark, indexPath, idxSchema, excludeBatch = batchId)
            .select(col("id"), col("k"))
            // an id in the current batch supersedes its stored version
            .join(sel.select(col(idCol).as("id")).distinct(),
              Seq("id"), "left_anti")
          val skipOld = sidecarCovers &&
            fused.exists(r => !r.isNullAt(1) && r.getInt(1) == 0)
          val oldIdx = if (skipOld) oldIdxAll.limit(0) else oldIdxAll
          Dedup.incrementalJaccardPairsIndexed(ni, oldIdx, threshold,
            maxDocFreq = None, maxDocFreqRatio = None,
            restrictOldSide = true, oldMaxDocFreq = oldMaxDocFreq)
        } else {
          // non-contiguous corpus history (external surgery on the store):
          // fall back to re-shingling the old corpus for this batch
          val old = IngestStore
            .read(spark, corpusPath, corpusSchema, excludeBatch = batchId)
            .select(col(idCol), col(textCol))
          Dedup.incrementalJaccardPairs(sel, old, idCol, textCol, n,
            threshold, oldMaxDocFreq = oldMaxDocFreq)
        }
      writeBatch(pairs, pairsPath, "parquet", batchId)
      writeBatch(sel, corpusPath, "parquet", batchId)
      // maintain the index sidecar LAST (a crash here leaves it behind;
      // the next healthy batch detects the gap and rebuilds). Only on
      // the indexed path: under a corpus/index coverage divergence the
      // index content is suspect, and the rebuild on the next
      // consistent batch reseeds from whatever the store then holds.
      if (indexed && idxBloomOn) {
        // bootstrap/heal path (first batch, pre-sidecar store, sidecar
        // behind after a crash, or sizing knobs changed mid-stream):
        // one single-column pass over the OLD index with the CURRENT
        // knobs, then OR in the already-built batch bloom (same knobs,
        // so always mergeable)
        def rebuilt(): org.apache.spark.util.sketch.BloomFilter = {
          // the aggregate form (not df.stat.bloomFilter, which NPEs on
          // an empty input — the normal batch-0 bootstrap state)
          val r = IngestStore.read(spark, indexPath, idxSchema,
              excludeBatch = batchId)
            .agg(IngestStore.bloomAggCol(col("k"), idxBloomExpectedItems,
              idxBloomFpp).as("bf")).head()
          val base =
            if (r.isNullAt(0)) org.apache.spark.util.sketch.BloomFilter
              .create(idxBloomExpectedItems, idxBloomFpp)
            else org.apache.spark.util.sketch.BloomFilter
              .readFrom(r.getAs[Array[Byte]](0))
          batchBloom.foreach(base.mergeInPlace)
          base
        }
        val merged = sidecar match {
          case Some((_, bf)) if sidecarCovers =>
            try { batchBloom.foreach(bf.mergeInPlace); bf }
            catch {
              case _: org.apache.spark.util.sketch.IncompatibleMergeException =>
                rebuilt()
            }
          case _ => rebuilt()
        }
        IngestStore.writeBloom(spark, indexPath, batchId, merged)
      }
    } finally sel.unpersist()
  }

  /** Continuous near-dup CLUSTER maintenance: [[dedupIngest]]'s
    * per-batch pair emission composed with
    * [[graft.operators.ConnectedComponents.incrementalDelta]]'s label
    * contraction — each micro-batch's verified pairs FOLD into a
    * persistent (id, component) labeling instead of re-clustering the
    * accumulated pair graph (whose closure cost would grow with
    * corpus history; the contracted closure is bounded by the batch).
    *
    * The labels store is last-writer-wins: slice `batch_id=N` holds
    * only the labels batch N changed or introduced; the current
    * labeling is each id's LATEST row ([[clusterLabels]] — ids absent
    * from the store are singletons, the [[graft.operators
    * .ConnectedComponents]] nodes-in-pairs convention), and
    * compaction rewrites the base through the same latest-per-key
    * supersede the corpus store uses. Replay-idempotent by the slice
    * protocol (a replaying batch excludes its own half-written slice
    * from the prior-labels read, and the delta recomputes
    * identically). */
  def clusterIngest(
      stream: DataFrame, corpusPath: String, pairsPath: String,
      labelsPath: String, idCol: String, textCol: String,
      n: Int, threshold: Double, compactEvery: Int = 16,
      idxBloomExpectedItems: Long = 1L << 20,
      idxBloomFpp: Double = 0.03,
      oldMaxDocFreq: Option[Int] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      clusterIngestBatch(batch, batchId, corpusPath, pairsPath,
        labelsPath, idCol, textCol, n, threshold, compactEvery,
        idxBloomExpectedItems, idxBloomFpp, oldMaxDocFreq)
    }

  private def labelsSchemaOf(idType: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType, nullable = true),
      org.apache.spark.sql.types.StructField(
        "component", idType, nullable = true)))

  /** The current (id, component) labeling a [[clusterIngest]] stream
    * has accumulated: each id's latest delta row (ids the store never
    * saw are singleton components by convention). One columnar store
    * scan + one id-keyed argmax — the standard consumer read. */
  def clusterLabels(
      spark: org.apache.spark.sql.SparkSession, labelsPath: String,
      idType: org.apache.spark.sql.types.DataType): DataFrame =
    IngestStore.read(spark, labelsPath, labelsSchemaOf(idType))
      .groupBy(col("id"))
      .agg(expr("max_by(component, batch_id)").as("component"))

  /** The per-batch step, separated for direct replay (the
    * [[ingestDedupBatch]] convention). */
  def clusterIngestBatch(
      batch: DataFrame, batchId: Long, corpusPath: String,
      pairsPath: String, labelsPath: String, idCol: String,
      textCol: String, n: Int, threshold: Double,
      compactEvery: Int = 16,
      idxBloomExpectedItems: Long = 1L << 20,
      idxBloomFpp: Double = 0.03,
      oldMaxDocFreq: Option[Int] = None): Unit = {
    import graft.operators.ConnectedComponents
    ingestDedupBatch(batch, batchId, corpusPath, pairsPath, idCol,
      textCol, n, threshold, compactEvery, idxBloomExpectedItems,
      idxBloomFpp, oldMaxDocFreq)
    val spark = batch.sparkSession
    val idType = batch.schema(idCol).dataType
    val labelsSchema = labelsSchemaOf(idType)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      IngestStore.compact(spark, labelsPath, labelsSchema,
        upTo = batchId, latestPerKey = Some("id"))
    val pairSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a_id", idType, true),
      org.apache.spark.sql.types.StructField("b_id", idType, true),
      org.apache.spark.sql.types.StructField("jaccard",
        org.apache.spark.sql.types.DoubleType, true)))
    val newPairs = spark.read.schema(pairSchema)
      .parquet(s"$pairsPath/batch_id=$batchId")
      .select("a_id", "b_id")
    // prior labeling: latest row per id across base + slices, the
    // replaying batch's own slice excluded (replay idempotence)
    val prior = IngestStore
      .read(spark, labelsPath, labelsSchema, excludeBatch = batchId)
      .groupBy(col("id"))
      .agg(expr("max_by(component, batch_id)").as("component"))
    val delta = ConnectedComponents.incrementalDelta(
      prior, newPairs, "a_id", "b_id")
    writeBatch(delta, labelsPath, "parquet", batchId)
  }

  /** Streaming volume-anomaly monitor: each micro-batch's hourly
    * event counts are scored against the ACCUMULATED hourly-count
    * store by the exact median/MAD rule
    * ([[graft.operators.EventAnalytics.hourlyVolumeAnomaly]]'s Hampel
    * identifier made incremental, the [[driftMonitor]] protocol
    * applied to volume): batch hours land as replay-idempotent
    * slices, the prior distribution is one two-column store scan
    * re-summed per hour, and `med2`/`mad4` ride the q180 integer
    * doubling discipline so the flags are bit-exact. Batch 0 emits
    * NULL statistics (no reference distribution yet — the q147
    * convention, never a fake zero). The counts store sum-merges to
    * an hours-sized base at compaction (the [[IngestStore]] `reduce`
    * hook). */
  def volumeMonitor(
      stream: DataFrame, storePath: String, outPath: String,
      msCol: String, k: Int = 3, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      volumeMonitorBatch(batch, batchId, storePath, outPath, msCol, k,
        compactEvery)
    }

  /** The per-batch step of [[volumeMonitor]] — separated so tests and
    * manual backfills can replay a batch directly (the
    * [[ingestDedupBatch]] convention). */
  def volumeMonitorBatch(
      batch: DataFrame, batchId: Long, storePath: String,
      outPath: String, msCol: String, k: Int = 3,
      compactEvery: Int = 16): Unit = {
    import graft.operators.Eval
    import graft.plans.Scalars
    val spark = batch.sparkSession
    val hourSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("hour",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = true)))
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      IngestStore.compact(spark, storePath, hourSchema, upTo = batchId,
        reduce = Some(df => df.groupBy(col("hour"))
          .agg(sum(col("n")).as("n"))
          .withColumn("batch_id", lit(0L))))
    val bh = batch
      .groupBy(expr(s"`$msCol` div 3600000").as("hour"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // the slice write + the scoring pass
    writeBatch(bh, storePath, "parquet", batchId)
    val prior = IngestStore
      .read(spark, storePath, hourSchema, excludeBatch = batchId)
      .groupBy(col("hour")).agg(sum(col("n")).as("n"))
      .localCheckpoint(true) // emptiness probe + medianMad consumers
    val scored =
      if (prior.isEmpty)
        bh.select(col("hour"), col("n").as("n_events"),
          lit(null).cast("long").as("med2"),
          lit(null).cast("long").as("mad4"),
          lit(null).cast("boolean").as("anomaly"))
      else {
        val mm = Eval.medianMad(prior, lit("all"), col("n"), k)
        val med2 = Scalars.of(mm.select(col("med2")))
        val mad4 = Scalars.of(mm.select(col("mad4")))
        bh.select(col("hour"), col("n").as("n_events"),
          med2.as("med2"), mad4.as("mad4"),
          (lit(2L) * abs(lit(2L) * col("n") - med2) >
            lit(k.toLong) * mad4).as("anomaly"))
      }
    writeBatch(scored, outPath, "parquet", batchId)
  }

  /** Continuous training-data PREPARATION: the ingest-side composition
    * of the batch prep pipeline — each arriving micro-batch is
    * quality-gated (token count ≥ `minTokens`) and only FIRST
    * occurrences of a content fingerprint are admitted: lowest id
    * wins within the batch (exact duplicate rows collapse to one), and
    * anything already in the accepted store is dropped
    * (first-batch-wins across batches). Accepted docs land as
    * replay-idempotent `batch_id=N` slices carrying their fingerprint,
    * so the cross-batch check never re-reads or re-hashes old text.
    *
    * Two maintenance devices keep per-batch cost from growing with the
    * accumulated store (see [[IngestStore]] for the file protocol):
    *
    *   - a generational BLOOM sidecar over the stored fingerprints
    *     screens the new batch BEFORE the store is touched: rows whose
    *     fingerprint the sketch has never seen (the overwhelming
    *     majority of a healthy stream) are admitted without any store
    *     I/O, and only might-contain rows — true dups plus the sketch's
    *     small false-positive slice — reach the exact fingerprint
    *     anti-join. Lossless by construction: blooms have no false
    *     negatives, and false positives are decided by the exact join
    *     that follows, so output is bit-identical with the sidecar
    *     present or absent (spec-pinned);
    *   - every `compactEvery` batches the store is COMPACTED into a
    *     consolidated base partition, bounding the file count (and the
    *     exact join's worst-case scan) regardless of how many batches
    *     the stream has processed. Original batch ids are preserved
    *     through compaction — read the store back with
    *     [[IngestStore.readStore]], which restores them.
    *
    * The sidecar's sizing knobs (`bloomExpectedItems`, `bloomFpp`) are
    * a per-store CONSTANT (generations merge bitwise, and blooms only
    * merge when identically sized): size `bloomExpectedItems` for the
    * expected TOTAL corpus cardinality, not the batch — an undersized
    * sketch degrades gracefully (false-positive rate rises, more rows
    * take the exact-join path; never wrong output). A store predating
    * the sidecar, or one whose sidecar fell behind (a crash between the
    * slice and sidecar writes), is healed by one full single-column
    * pass that seeds a fresh complete sidecar.
    */
  def prepIngest(
      stream: DataFrame, acceptedPath: String,
      idCol: String, textCol: String, minTokens: Long,
      compactEvery: Int = 16,
      bloomExpectedItems: Long = 1L << 20, bloomFpp: Double = 0.03)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      prepIngestBatch(batch, batchId, acceptedPath, idCol, textCol,
        minTokens, compactEvery, bloomExpectedItems, bloomFpp)
    }

  /** The per-batch step — separated so tests and manual backfills can
    * replay a batch directly and observe idempotence. */
  def prepIngestBatch(
      batch: DataFrame, batchId: Long, acceptedPath: String,
      idCol: String, textCol: String, minTokens: Long,
      compactEvery: Int = 16,
      bloomExpectedItems: Long = 1L << 20, bloomFpp: Double = 0.03): Unit = {
    import graft.functions.{TextFunctions => T}
    val spark = batch.sparkSession
    val qual = batch.select(col(idCol), col(textCol))
      .filter(T.tokenCount(col(textCol)) >= minTokens)
      .withColumn("fp", T.fingerprint(col(textCol)))
    // within-batch winners: lowest id per fingerprint (one keyed agg +
    // join-back — the q22 exact-dedup shape), then ONE row per
    // fingerprint even if the winning id itself is duplicated in the
    // batch (min raw text as the deterministic representative among
    // normalization-equal variants)
    val keep = qual.groupBy(col("fp")).agg(min(col(idCol)).as("__keep"))
    // persisted: the bloom-probe path consumes winners TWICE (the
    // never-seen branch and the might-contain branch of the union), and
    // without the cache each branch re-runs the batch scan +
    // fingerprint + two aggregations. Batch-sized by definition.
    val winners = qual.join(keep, Seq("fp"))
      .filter(col(idCol) === col("__keep")).drop("__keep")
      .groupBy(col("fp"), col(idCol)).agg(min(col(textCol)).as(textCol))
      .persist()
    // everything after the persist runs inside the try: a transient
    // failure in compact/coverage/latestBloom would otherwise leak the
    // winners cache registration (the finally below is its only release)
    var acc: DataFrame = null
    try {
      val dataSchema = winners.schema
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        IngestStore.compact(spark, acceptedPath, dataSchema, upTo = batchId)
      val covered = IngestStore.coverage(spark, acceptedPath, batchId)
      val sidecar = IngestStore.latestBloom(spark, acceptedPath,
        beforeBatch = batchId)
      val sidecarCoversStore =
        sidecar.exists { case (upto, _) => covered.allAtOrBelow(upto) }
      val oldFps = IngestStore
        .read(spark, acceptedPath, dataSchema, excludeBatch = batchId)
        .select(col("fp"))
      val accepted = sidecar match {
        case Some((_, bf)) if sidecarCoversStore =>
          val probe = IngestStore.mightContain(spark, bf, col("fp"))
          winners.filter(!probe).unionByName(
            winners.filter(probe).join(oldFps, Seq("fp"), "left_anti"))
        case _ =>
          winners.join(oldFps, Seq("fp"), "left_anti")
      }
      acc = accepted.persist()
      writeBatch(acc, acceptedPath, "parquet", batchId)
      // exactly ONE bloom-build job per batch: the aggregation merges a
      // filter-sized buffer per task, so building twice (or building
      // over the full store when the batch suffices) is real cost
      val merged = sidecar match {
        case Some((_, bf)) if sidecarCoversStore =>
          try bf.mergeInPlace(IngestStore.buildBloom(
            acc, col("fp"), bloomExpectedItems, bloomFpp))
          catch {
            // sizing knobs changed mid-stream: rebuild a fresh complete
            // sidecar from the store + this batch
            case _: org.apache.spark.util.sketch.IncompatibleMergeException =>
              IngestStore.buildBloom(
                oldFps.unionByName(acc.select(col("fp"))), col("fp"),
                bloomExpectedItems, bloomFpp)
          }
        case _ =>
          // bootstrap (first batch / pre-sidecar store / sidecar behind
          // after a crash): one full single-column pass seeds a complete
          // sidecar
          IngestStore.buildBloom(
            oldFps.unionByName(acc.select(col("fp"))), col("fp"),
            bloomExpectedItems, bloomFpp)
      }
      IngestStore.writeBloom(spark, acceptedPath, batchId, merged)
    } finally {
      if (acc != null) acc.unpersist()
      winners.unpersist()
      ()
    }
  }

  // ------------------------------------ continuous index maintenance

  /** The postings-store row contract shared by [[indexIngestBatch]]
    * and [[bm25FromIndex]]: doc ids cast to long at ingest so the
    * query side can read the store without the original batch. */
  private val postingsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("token",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tf",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("len",
      org.apache.spark.sql.types.LongType)))

  // ------------------------- BM25 stats sidecar (df / N / Σlen)

  private def bm25StatsDfPath(p: String): String = s"$p/_stats/df"
  private def bm25StatsScalarsPath(p: String): String =
    s"$p/_stats/scalars"
  private def bm25StatsMarker(p: String): String =
    s"$p/_stats_committed"

  /** Fold the postings store's corpus statistics into a sidecar at
    * compaction time: `(token, df)` over the compacted BASE plus one
    * `(n, lensum)` scalar row (indexed-doc count and total length —
    * avgdl = lensum/n), both excluding tombstones. With the sidecar,
    * [[bm25FromIndex]] no longer re-derives df/N/avgdl from (and
    * localCheckpoints) the FULL postings store on every query — the
    * per-query cost becomes candidate-bounded, with at most a
    * live-delta-sized correction between compactions. Cost: TWO
    * columnar base passes per compaction (the df aggregate and the
    * doc-length aggregate are separate write actions — materializing
    * the filtered base just to save the second scan would write the
    * same volume a third time), amortized at compaction cadence like
    * the fold itself.
    *
    * Commit protocol = [[writeCentroids]]'s marker discipline, plus
    * CONTENT: the marker names the boundary the stats cover, so a
    * sidecar that raced a crash (or predates a later compaction)
    * reads as ABSENT and the query path falls back to deriving from
    * postings — never a silently stale df table. The marker is
    * cleared BEFORE the (non-atomic) parquet overwrites begin. */
  private[streaming] def writeBm25Stats(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    val b = IngestStore.boundary(spark, indexPath)
    if (b <= 0) return
    val marker = new org.apache.hadoop.fs.Path(bm25StatsMarker(indexPath))
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(marker))
      require(fs.delete(marker, false),
        s"indexIngest: could not clear the stats marker $marker " +
          "before rewriting the sidecar — refusing to overwrite " +
          "under a live commit marker")
    val base = IngestStore.read(spark, indexPath, postingsSchema)
      .filter(col("batch_id") < b && col("token").isNotNull)
    base.groupBy("token").agg(count(lit(1)).as("df"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(bm25StatsDfPath(indexPath))
    base.groupBy("doc").agg(max(col("len")).as("len"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("len")), lit(0L)).as("lensum"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(bm25StatsScalarsPath(indexPath))
    // marker content = the covered boundary, committed atomically
    // (write-to-temp + overwriting rename, the boundary-file recipe)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$indexPath/._stats_committed.tmp")
    val out = fs.create(tmp, true)
    try out.write(b.toString.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(marker.toUri,
      fs.getConf)
      .rename(tmp, marker,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The committed stats sidecar, IF it covers the CALLER-CAPTURED
    * boundary (the [[IngestStore.pinnedView]] value the query frame
    * was built against — comparing against a freshly-read boundary
    * would let a racing compaction pair a new sidecar with an old
    * frame): `(dfTable, scalarsRow)`. Any mismatch (no marker, a
    * marker naming a different boundary, an unreadable table) reads
    * as absent AT OPEN — the query path then derives stats from the
    * postings, correct at the old cost. The one-row scalars table is
    * validated EAGERLY (collected here and handed back as a local
    * frame), so no later plan stage can find it torn; the
    * vocabulary-sized df table is validated to its footers only — a
    * racing overwrite that deletes its files between this open and
    * the query's action fails that action LOUDLY (the store
    * protocol's documented racing-reader retry caveat), never
    * silently. `expectBoundary <= 0` is always absent (a sidecar is
    * only ever written over a base). */
  private def readBm25Stats(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, expectBoundary: Long)
      : Option[(DataFrame, DataFrame)] =
    try {
      if (expectBoundary <= 0 ||
          bm25StatsBoundary(spark, indexPath) != expectBoundary) None
      else {
        // footer/schema read — throws here (not at the action) on a
        // missing or footer-torn table
        val dfTable = spark.read.parquet(bm25StatsDfPath(indexPath))
        val scRead = spark.read.parquet(bm25StatsScalarsPath(indexPath))
        // the scalars table is ONE row — materialize it now so the
        // sidecar-served plan carries its n/lensum as local data
        // immune to any race after this point; anything but exactly
        // one row is a torn write and reads as absent
        val scRows = scRead.collect()
        require(scRows.length == 1,
          s"stats scalars sidecar holds ${scRows.length} rows, want 1")
        val scalars = spark.createDataFrame(
          java.util.Arrays.asList(scRows(0)), scRead.schema)
        Some((dfTable, scalars))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Log.warn(
          s"readBm25Stats($indexPath): sidecar present but unreadable " +
            "— deriving query stats from the postings store instead " +
            s"(correct, at the pre-sidecar cost). Cause: $e")
        None
    }

  /** The boundary the committed stats sidecar covers; -1 when absent
    * or unreadable. One marker read — the cheap staleness probe
    * [[indexIngestBatch]] runs per batch so a crash between the
    * compaction commit and the stats write self-heals on the next
    * batch (replay or live). */
  private def bm25StatsBoundary(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Long = {
    val marker = new org.apache.hadoop.fs.Path(bm25StatsMarker(indexPath))
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      if (!fs.exists(marker)) -1L
      else {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim.toLong
        finally in.close()
      }
    } catch {
      case scala.util.control.NonFatal(_) => -1L
    }
  }

  /** The store-id contract shared by [[indexIngestBatch]] and
    * [[embIngestBatch]]: ids must cast LOSSLESSLY to long. A
    * non-castable id (a string doc id like "doc-1") or a null id
    * would become a NULL store key — the postings/vector groupBys
    * would silently merge every such row into one phantom document,
    * and null keys collide in the latest-per-key supersede — and a
    * TRUNCATING cast (double 1.2 and 1.7 both landing on key 1,
    * double→long overflow clamping to Long.Max) merges distinct
    * documents just as silently, so losslessness is checked by a
    * round-trip compare (long → original type → equal), not merely
    * by null-ness. Refuse the batch loudly instead (the repo-wide
    * refuse-loudly ethos).
    * This is the standalone PROBE spelling (one batch-sized scan +
    * limit(1) collect) — kept only for the replay-over-existing-slice
    * path, where the write's Overwrite would destroy committed bytes
    * before an in-write guard could refuse. The hot path fuses the
    * same predicate into the slice write instead ([[guardedLongId]] +
    * [[rethrowingIdGuard]] — zero extra jobs per batch). */
  private def requireLongIds(
      batch: DataFrame, idCol: String, op: String): Unit =
    badIdCondition(batch, idCol).foreach { bad =>
      batch.filter(bad)
        .select(col(idCol).cast("string")).limit(1).collect()
        .headOption.foreach { r =>
          throw new IllegalArgumentException(
            idGuardMessage(op, idCol,
              Option(r.getString(0)).getOrElse("NULL")))
        }
    }

  /** The lossless-long-id violation predicate, or None when the SCHEMA
    * already proves losslessness (non-nullable integral id — the
    * common prepIngest-fed shape; no scan needed at all). Shared by
    * the standalone probe ([[requireLongIds]]) and the in-write guard
    * ([[guardedLongId]]), so the two spellings of "bad id" can never
    * diverge. */
  private def badIdCondition(
      batch: DataFrame, idCol: String): Option[Column] = {
    import org.apache.spark.sql.types._
    val f = batch.schema(idCol)
    val integral = f.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (integral && !f.nullable) None
    else if (integral) Some(col(idCol).isNull)
    else {
      val asLong = col(idCol).cast("long")
      Some(col(idCol).isNull || asLong.isNull ||
        asLong.cast(f.dataType) =!= col(idCol))
    }
  }

  private def idGuardMessage(
      op: String, idCol: String, value: String): String =
    s"$op: id column '$idCol' carries a value that does not " +
      s"cast losslessly to long (e.g. $value) — a NULL " +
      "or truncated store key silently merges distinct rows " +
      "into one phantom document and collides in the " +
      "latest-per-key supersede; map ids to longs before ingest"

  /** The store-id cast with the lossless check FUSED into it: a bad id
    * raises DURING whatever action first evaluates the column (for the
    * ingest batches, the slice write itself), so the per-batch
    * limit(1) PROBE JOB [[requireLongIds]] costs on every
    * nullable-or-non-integral batch disappears from the hot path —
    * zero extra jobs, the check rides the write's own pass (guide:
    * don't pay a separate pass for what another action already reads).
    * Callers pair it with [[rethrowingIdGuard]] so the refusal surface
    * (IllegalArgumentException, offending value in the message) stays
    * EXACTLY the probe's, and clean up any partial slice so a refused
    * batch still leaves no readable store mutation. */
  private def guardedLongId(
      batch: DataFrame, idCol: String, op: String): Column =
    badIdCondition(batch, idCol) match {
      case None => col(idCol).cast("long")
      case Some(bad) =>
        val msg = concat(
          lit(s"$op: id column '$idCol' carries a value that does " +
            "not cast losslessly to long (e.g. "),
          coalesce(col(idCol).cast("string"), lit("NULL")),
          lit(") — a NULL or truncated store key silently merges " +
            "distinct rows into one phantom document and collides " +
            "in the latest-per-key supersede; map ids to longs " +
            "before ingest"))
        when(bad, raise_error(msg).cast("long"))
          .otherwise(col(idCol).cast("long"))
    }

  /** Run `body` (the actions that evaluate a [[guardedLongId]] column)
    * converting the guard's raised error back to the refusal contract:
    * IllegalArgumentException carrying OUR message (the spec-pinned
    * surface), with `cleanup` executed first (delete the partial slice
    * the failed write may have left, so a refused batch mutates
    * nothing readable — a crash between failure and cleanup leaves at
    * most the half-written-slice state every mid-write crash already
    * can, which the replay protocol owns). Non-guard failures pass
    * through untouched. */
  private def rethrowingIdGuard[A](
      op: String, idCol: String)(cleanup: => Unit)(body: => A): A =
    try body
    catch {
      case e: Throwable =>
        val marker = s"$op: id column '$idCol'"
        // INNERMOST matching message (Spark's outer job-abort message
        // embeds the task failure plus a multi-KB driver stack trace
        // AFTER the raise text — the innermost cause carries the raise
        // text alone), truncated at the first newline so the rethrown
        // message equals the raise_error text exactly, as the refusal
        // contract ("EXACTLY the probe's surface") requires
        val guardMsg = Iterator.iterate[Throwable](e)(_.getCause)
          .takeWhile(_ != null).take(16)
          .map(t => Option(t.getMessage).getOrElse(""))
          .filter(_.contains(marker))
          .foldLeft(Option.empty[String])((_, m) => Some(m))
        guardMsg match {
          case Some(m) =>
            try cleanup catch { case scala.util.control.NonFatal(_) => () }
            throw new IllegalArgumentException(
              m.substring(m.indexOf(marker)).takeWhile(_ != '\n'))
          case None => throw e
        }
    }

  /** Measured cap on the live-key probe: at or under this many
    * distinct live keys, [[latestAtRead]] runs its live-key SPLIT
    * (broadcast semi/anti join, no full-store shuffle); above it, the
    * full-store window fallback — the decide-the-path-never-the-answer
    * discipline ([[annFromStore]]'s query-broadcast caps). 4M long
    * keys broadcast at ~32 MiB. */
  private[streaming] val LiveKeyBroadcastMaxRows = 4L << 20

  /** Driver-collection cap for [[bm25FromIndex]]'s query-term
    * pushdown: at or under this many DISTINCT query terms the set
    * collects (bounded limit-collect, never a full count first) and
    * becomes a static scan filter; past it the pushdown is skipped —
    * the candidate join alone then bounds the work, the pre-pushdown
    * cost. 16Ki strings is a trivial driver allocation; parquet
    * rewrites large IN sets to min/max range bounds, which
    * token-clustered row groups still exploit. */
  private[streaming] val TokenPushdownMaxTerms = 1 << 14

  /** Which rows of a store read can hold a superseded sibling —
    * [[latestAtRead]]'s dispatch: `NoVersions` (no relevant live
    * slices ⇒ at most one version per key ⇒ skip the window),
    * `AllKeys` (no compacted base ⇒ EVERY row is live ⇒ the split
    * would be pure overhead over the one-window spelling), or
    * `LiveKeys` (base + a live delta — the split's win case). */
  private[streaming] sealed trait SupersedeScope
  private[streaming] case object NoVersions extends SupersedeScope
  private[streaming] case object AllKeys extends SupersedeScope
  private[streaming] final case class LiveKeys(keys: DataFrame)
      extends SupersedeScope

  /** Read-time latest-per-key supersede — the query-surface twin of
    * [[IngestStore.compact]]'s `latestPerKey`: keeps only each key's
    * rows from its NEWEST batch. [[IngestStore.read]] restores every
    * base row's ORIGINAL batch id (not the synthetic `-B` partition
    * value), and absorbed originals are strictly below the boundary
    * while live slice ids sit at/above it — so max-of-batch_id
    * totally orders versions across base and slices and picks the
    * latest exactly as compaction does. This is what makes re-ingest
    * and REDACTION immediate at the query surface: a null-payload
    * tombstone wins the max, so the stale postings / vector never
    * score and a duplicate can never hold two top-k slots — WITHOUT
    * waiting up to `compactEvery` batches for the physical fold
    * (compaction stays the storage-reclaim step, no longer a
    * correctness step).
    *
    * Cost shape — LIVE-DELTA-BOUNDED, not a full-store shuffle: only
    * a key present in an un-absorbed slice can hold two versions (the
    * latestPerKey-compacted base holds at most one version per key —
    * the precondition that makes the split and the full window
    * bit-equal), so under a `LiveKeys` scope with a small key set
    * (MEASURED against `maxLiveKeys`, never assumed) the store splits
    * by a broadcast semi/anti join on the key set: the hot subset
    * (live keys' rows across base + slices — delta-proportional) pays
    * the supersede window, the cold remainder passes through
    * UNSHUFFLED. Two map-side columnar passes over the store replace
    * the full-store shuffle the one-window spelling pays between
    * compactions. Past the cap (a store with compaction far behind
    * ingest) and under `AllKeys` (no base yet — every row is live, so
    * the split could only add overhead), the one-window fallback —
    * same answer, the old cost. Skipped entirely under `NoVersions`
    * (no live slices ⇒ fully compacted ⇒ at most one version per key
    * exists).
    *
    * A `LiveKeys` frame is re-executed by each consumer (the count
    * and the two joins — Spark's ReuseExchange dedups the two
    * identical broadcasts within the query): keep its lineage the
    * delta-sized [[IngestStore.readSlices]] scan ([[liveScopeOf]]),
    * never something corpus-priced. */
  private[streaming] def latestAtRead(
      store: DataFrame, scope: SupersedeScope, key: String,
      maxLiveKeys: Long = LiveKeyBroadcastMaxRows): DataFrame =
    scope match {
      case NoVersions => store
      case AllKeys => supersedeWindow(store, key)
      case LiveKeys(lk0) =>
        val lk = lk0.select(col(key).as("__livek")).distinct()
        // measured, never assumed: one delta-sized count decides the
        // path (the repo's broadcast-contract discipline)
        if (lk.count() <= maxLiveKeys) {
          val (hot, cold) = splitByLiveKeys(store, lk, key)
          supersedeWindow(hot, key).unionByName(cold)
        } else supersedeWindow(store, key)
    }

  /** The hot/cold broadcast semi/anti split — ONE spelling of the
    * bit-equality invariant shared by [[latestAtRead]]'s LiveKeys
    * branch and [[bm25FromIndex]]'s sidecar correction (two
    * hand-maintained copies is how a fix reaches one and not the
    * other). `keys` must be a one-column `__livek` frame; the CALLER
    * decides its materialization (latestAtRead re-executes the
    * delta-sized lineage, the sidecar path checkpoints because it
    * consumes the hot side five ways) and must have verified the
    * broadcast cap. */
  private def splitByLiveKeys(
      store: DataFrame, keys: DataFrame, key: String)
      : (DataFrame, DataFrame) = (
    store.join(broadcast(keys), col(key) <=> col("__livek"), "left_semi"),
    store.join(broadcast(keys), col(key) <=> col("__livek"), "left_anti"))

  /** The one-window latest-per-key spelling (max of true batch ids —
    * the order compaction's `latestPerKey` uses). [[latestAtRead]]'s
    * fallback and the building block of its hot branch. */
  private def supersedeWindow(rows: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    rows
      .withColumn("__mx",
        max(col("batch_id")).over(Window.partitionBy(col(key))))
      .filter(col("batch_id") === col("__mx"))
      .drop("__mx")
  }

  /** The pinned store read both query paths share:
    * `(boundary, scope, frame)` all derived from ONE
    * [[IngestStore.pinnedView]] (one marker read + one listing) — a
    * multi-instant spelling (fresh boundary here, fresh listing
    * there) is how a racing compaction silently corrupts a supersede
    * split or a sidecar correction; from the pinned view a racer
    * either leaves the old view fully readable (correct as of that
    * instant) or fails the read loudly (the protocol's retry caveat).
    * `asOf` applies [[IngestStore.validateAsOf]]'s refusals against
    * the SAME view, filters the frame to the snapshot, and restricts
    * the live set — keys live only in LATER slices are invisible to
    * the snapshot and must not force its rows through the window.
    * The `LiveKeys` frame's lineage is the partition-pruned
    * [[IngestStore.readSlices]] scan over ids from the SAME listing
    * — delta-sized I/O, no base read, no second listing. */
  private def pinnedRead(
      spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType, key: String,
      asOf: Option[Long]): (Long, SupersedeScope, DataFrame) = {
    val (b, liveAll, frame0) = IngestStore.pinnedView(spark, path, schema)
    asOf.foreach(n => IngestStore.validateAsOf(path, b, liveAll.toSet, n))
    val frame = asOf.fold(frame0)(n => frame0.filter(col("batch_id") <= n))
    val liveIds = liveAll.filter(id => asOf.forall(id <= _))
    val scope =
      if (liveIds.isEmpty) NoVersions
      else if (b <= 0) AllKeys // no base: every row is live already
      else LiveKeys(IngestStore.readSlices(spark, path, schema, liveIds)
        .select(col(key)).distinct())
    (b, scope, frame)
  }

  /** Continuous retrieval-index maintenance: every arriving
    * micro-batch's documents are tokenized ONCE into BM25 postings
    * ([[graft.operators.TextStats.postings]] — one (doc, token, tf,
    * len) row per distinct (document, term)) and appended to the
    * postings store at `indexPath` as a `batch_id=N` slice (the
    * [[exactlyOnceFileSink]] protocol: a re-delivered batch overwrites
    * its own partition, and [[IngestStore]]'s boundary/coverage rules
    * keep half-written slices invisible). Every `compactEvery` batches
    * the slices fold into one marker-committed base with
    * latest-version-wins supersede PER DOC (`latestPerKey`): a doc
    * re-ingested in a later batch replaces its old postings at the
    * next compaction — and the QUERY side applies the same supersede
    * at read ([[latestAtRead]]), so only the latest version ever
    * scores, even before the physical fold. Feed this from
    * [[prepIngest]]'s accepted store and ids are first-occurrence
    * unique by construction, making queries exact at every moment.
    *
    * Cost shape at scale: per batch, the batch's own tokenize + two
    * keyed aggs + one slice write — the accumulated corpus is NEVER
    * re-tokenized — plus, at compaction cadence only, two base passes
    * that fold df/N/avgdl into the stats sidecar
    * ([[writeBm25Stats]]). Query time ([[bm25FromIndex]]) then pays
    * the token-keyed candidate join the batch operator already
    * prices, a vocabulary-sized sidecar read, and at most a
    * live-delta-sized supersede correction — never a per-query
    * re-aggregation of the full postings store (that derivation
    * remains only as the fallback for never-compacted stores and
    * torn sidecars). */
  def indexIngest(
      stream: DataFrame, indexPath: String,
      idCol: String, textCol: String, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      indexIngestBatch(batch, batchId, indexPath, idCol, textCol,
        compactEvery)
    }

  /** The per-batch step — separated so tests and manual backfills can
    * replay a batch directly and observe idempotence.
    *
    * A NULL-text doc produces no postings — but it must still
    * SUPERSEDE any earlier version of the same id (re-ingesting a doc
    * as null is the redaction shape), so the slice carries a
    * `token IS NULL` TOMBSTONE row per null-text doc: `latestPerKey`
    * sees the newer batch at compaction and drops the stale postings,
    * and the query side filters tombstones before scoring — the doc
    * ends unindexed, exactly like the batch operator on the latest
    * corpus. Redaction is IMMEDIATE at the query surface: the
    * tombstone wins [[latestAtRead]]'s supersede from the moment its
    * slice commits — and compaction COMPLETES the erasure physically:
    * the purge drops the tombstone itself from the absorbed base
    * (with the stale postings already superseded away), so zero bytes
    * about the redacted doc survive the next compaction
    * ([[IngestStore.compact]]'s purge contract; parity q234, physical
    * absence spec-pinned). */
  def indexIngestBatch(
      batch: DataFrame, batchId: Long, indexPath: String,
      idCol: String, textCol: String, compactEvery: Int = 16): Unit = {
    val spark = batch.sparkSession
    // the lossless-id check rides the slice write ([[guardedLongId]] —
    // no per-batch probe job) EXCEPT when this batch id's slice
    // already exists: the write's Overwrite would delete the committed
    // slice before the in-write guard could refuse, so a replay over
    // existing bytes keeps the zero-mutation pre-write probe
    val slicePath = new org.apache.hadoop.fs.Path(
      s"$indexPath/batch_id=$batchId")
    val fs = slicePath.getFileSystem(
      spark.sessionState.newHadoopConf())
    val replayOverExisting = fs.exists(slicePath)
    if (replayOverExisting) requireLongIds(batch, idCol, "indexIngest")
    val idExpr =
      if (replayOverExisting) col(idCol).cast("long")
      else guardedLongId(batch, idCol, "indexIngest")
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      // refuse-before-any-store-maintenance: the in-write guard fires
      // only at the slice write, which would let a bad-id batch
      // re-trigger this compaction rewrite (and the stats rewrite
      // below) on every replay attempt. One batch-sized probe,
      // amortized against the compaction rewrite it gates — never on
      // the per-batch hot path.
      if (!replayOverExisting) requireLongIds(batch, idCol, "indexIngest")
      IngestStore.compact(spark, indexPath, postingsSchema,
        upTo = batchId, latestPerKey = Some("doc"),
        sortBy = Seq("token"),
        // erasure completion: a doc whose latest absorbed version is
        // the redaction tombstone leaves ZERO bytes in the base (the
        // tombstone already wins every still-readable as-of snapshot,
        // so dropping it changes no answer — IngestStore.compact's
        // purge contract); q234 gates this path against a purge-blind
        // oracle
        purge = Some(col("token").isNull))
    }
    // stats sidecar: rewrite whenever the committed marker does not
    // name the current boundary — covers the just-compacted case AND
    // self-heals a crash between the boundary commit and the stats
    // write (one cheap marker read per batch decides; the rewrite
    // itself is two base passes, amortized with compaction). Runs
    // BEFORE this batch's slice lands, and writeBm25Stats's
    // `batch_id < boundary` filter keeps any half-written replay
    // slice out of the fold.
    val b0 = IngestStore.boundary(spark, indexPath)
    if (b0 > 0 && bm25StatsBoundary(spark, indexPath) != b0)
      writeBm25Stats(spark, indexPath)
    val slim = batch.select(idExpr.as("__id"), col(textCol))
    val posts = graft.operators.TextStats.postings(
      slim.filter(col(textCol).isNotNull), "__id", textCol)
    val tombstones = slim.filter(col(textCol).isNull)
      .select(col("__id").as("doc"),
        lit(null).cast("string").as("token"),
        lit(0L).as("tf"), lit(0L).as("len"))
    // token-clustered within each written file (batch-local sort,
    // nothing shuffles): parquet row-group min/max stats on `token`
    // then let bm25FromIndex's query-term pushdown skip row groups
    // whose token range can't match — the postings analogue of the
    // embedding store's cell clustering
    rethrowingIdGuard("indexIngest", idCol) {
      fs.delete(slicePath, true)
    } {
      writeBatch(posts.unionByName(tombstones)
        .sortWithinPartitions("token"), indexPath, "parquet",
        batchId)
    }
  }

  /** Deadline-driven erasure for the retrieval index: force the
    * compaction (with its tombstone purge) NOW, at the store's
    * current contiguous frontier, instead of waiting for the next
    * `compactEvery` cadence batch — the operational answer to "the
    * redaction is already INGESTED (tombstone committed, logically
    * invisible since q225's supersede), but its bytes must be gone by
    * a deadline, not by the next multiple-of-N batch". Exactly the
    * per-batch compaction [[indexIngestBatch]] runs (latest-per-doc
    * supersede, token clustering, `token IS NULL` purge) plus the
    * stats-sidecar rewrite the NEXT batch would otherwise perform, so
    * the store is indistinguishable from one whose cadence happened
    * to land here (spec-pinned bit-identical). Returns true iff a
    * fold committed (false = already compacted to the frontier, or
    * nothing to absorb — a pending-GC retry either way, harmless).
    *
    * Single-writer discipline: call from the ingest process between
    * batches (or with the stream paused) — the store protocol assumes
    * ONE writer, and this IS a write. Crash-safe and replayable like
    * any compaction ([[IngestStore.compact]]'s marker commit). */
  def indexEraseNow(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Boolean = {
    val cov = IngestStore.coverage(spark, indexPath,
      excludeBatch = Long.MinValue)
    val did = cov.prefix > 0 &&
      IngestStore.compact(spark, indexPath, postingsSchema,
        upTo = cov.prefix, latestPerKey = Some("doc"),
        sortBy = Seq("token"), purge = Some(col("token").isNull))
    if (did) writeBm25Stats(spark, indexPath)
    did
  }

  /** Freeze the retrieval index's snapshot `asOf` into a NEW store —
    * [[IngestStore.snapshotStore]] with the index store's canonical
    * form (latest-per-doc, tombstone purge, token clustering) plus
    * the BM25 stats sidecar written over the frozen base, so queries
    * against the export are sidecar-served from the first read. The
    * export then answers [[bm25FromIndex]] (no asOf) bit-identically
    * to `bm25FromIndex(srcPath, ..., asOf = Some(asOf))` — but keeps
    * answering it after the source compacts past the moment
    * (reproducible-training-set freeze; spec-pinned). Target must be
    * empty; torn exports are deleted and re-run (the source is
    * read-only throughout) — with ONE healable exception: a crash
    * BETWEEN the base's boundary commit and the stats write leaves a
    * complete base missing only its sidecar, and unlike a live store
    * no per-batch marker check ever runs on a static export to heal
    * it (queries would silently fall back to deriving df/N/avgdl
    * forever — correct at exactly the cost the export exists to
    * avoid). A re-run that finds the export's own committed base
    * (boundary `asOf + 1`, no slices) with a non-covering stats
    * marker completes the sidecar instead of refusing — the export
    * content is deterministic, so the healed result equals the
    * uninterrupted run (spec-pinned). */
  def snapshotIndexStore(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String, asOf: Long): Unit = {
    val tornSidecar =
      IngestStore.boundary(spark, dstPath) == asOf + 1 &&
        IngestStore.sliceIds(spark, dstPath).isEmpty &&
        bm25StatsBoundary(spark, dstPath) != asOf + 1
    if (!tornSidecar)
      IngestStore.snapshotStore(spark, srcPath, dstPath, postingsSchema,
        asOf, latestPerKey = Some("doc"),
        purge = Some(col("token").isNull), sortBy = Seq("token"))
    writeBm25Stats(spark, dstPath)
  }

  /** [[snapshotIndexStore]] for the embedding store: the frozen base
    * (latest-per-vec, null-vector purge, cell clustering) plus a COPY
    * of the source's centroid model — a snapshot deliberately
    * PRESERVES the model (stored cell assignments are
    * model-dependent; the frozen rows carry the source model's
    * cells), where [[migrateEmbStore]] deliberately RETRAINS into
    * fresh assignments. Model lands AFTER the base, so a torn export
    * is a base without a model — [[annFromStore]] refuses loudly
    * rather than serving a silently partial snapshot; delete and
    * re-run. A source still before its first trained batch (no
    * model, only tombstone slices) snapshots without a model. */
  def snapshotEmbStore(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String, asOf: Long): Unit = {
    require(readCentroids(spark, dstPath).isEmpty,
      s"snapshotEmbStore: target $dstPath already carries a centroid " +
        "model — a torn snapshot cannot be resumed; delete it and " +
        "re-run")
    IngestStore.snapshotStore(spark, srcPath, dstPath, embSchema,
      asOf, latestPerKey = Some("vec"),
      purge = Some(col("v").isNull), sortBy = Seq("cell"))
    readCentroids(spark, srcPath)
      .foreach(m => writeCentroids(spark, dstPath, m))
  }

  /** [[indexEraseNow]] for the embedding store: force the compaction
    * whose purge physically drops null-vector redaction tombstones
    * (and the superseded vector payloads) at the current contiguous
    * frontier — same fold [[embIngestBatch]]'s cadence runs
    * (latest-per-vec, cell clustering, `v IS NULL` purge), same
    * single-writer discipline, same idempotent return contract. */
  def embEraseNow(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String): Boolean = {
    val cov = IngestStore.coverage(spark, storePath,
      excludeBatch = Long.MinValue)
    cov.prefix > 0 &&
      IngestStore.compact(spark, storePath, embSchema,
        upTo = cov.prefix, latestPerKey = Some("vec"),
        sortBy = Seq("cell"), purge = Some(col("v").isNull))
  }

  /** BM25 top-k over the accumulated postings store — the query side
    * of [[indexIngest]]: reads the committed slices/base (explicit
    * schema, half-written and absorbed slices pruned), applies the
    * [[latestAtRead]] per-doc supersede (a re-ingested or REDACTED
    * doc's stale postings never score, immediately — not only after
    * the next compaction), and scores with
    * [[graft.operators.TextStats.bm25FromPostings]]. The result over
    * a store built from any batch decomposition of a corpus equals
    * [[graft.operators.TextStats.bm25TopK]] over the LATEST version
    * of that corpus at every moment (parity-gated by q222; the
    * pre-compaction redaction path by q225).
    *
    * `maxDocFreq` is REQUIRED here (unlike the batch operator's
    * `None` default): this entry point exists purely for the
    * accumulated-corpus scale path, where an uncapped boilerplate
    * term ("the") drags corpus-dense posting rows into every query's
    * ranking window — so the stop-list recall contract must be an
    * explicit choice. Passing `None` is still legal (exactness) but
    * the query then carries an observed metric under
    * `uncappedMetricName` (`candidate_rows` — the Σ_t df(t) join
    * volume actually paid, readable from a QueryExecutionListener)
    * so the uncapped cost is visible in operations, not silent.
    * Observed-metric names must be unique within one query plan —
    * a caller combining TWO uncapped retrievals in a single action
    * (union over two stores) passes distinct names.
    *
    * Query-side size contract: the query frame is joined BY TOKEN
    * (never broadcast-forced — AQE picks the strategy from measured
    * sizes), so unlike [[annFromStore]] there is no driver-memory
    * cliff to cap here; a corpus-sized query table degrades to an
    * ordinary shuffled equi-join. On the SIDECAR paths the frame's
    * lineage is additionally executed for the bounded query-term
    * collect (and, past that cap, a sizing aggregate + broadcast for
    * the df semi-join) — a caller with an expensive or
    * NON-DETERMINISTIC query lineage (a rand() sample, a temp view
    * under concurrent rewrite) must materialize it first
    * (cache/checkpoint): the scoring side and the pushdown must see
    * ONE realization, or pushed-away terms silently score zero. The
    * same stability assumption the multi-consumer operators repo-wide
    * make, stated here because the consumption is easy to miss.
    *
    * `asOf`: retrieve against the SNAPSHOT of the index as it stood
    * after that batch committed ([[IngestStore.readAsOf]]'s
    * reproducibility + retention contract — exact back to the
    * compaction horizon, refused beyond it). The supersede still
    * applies WITHIN the snapshot, so a doc re-ingested twice before
    * `asOf` scores once, at its version as of that moment
    * (parity-gated by q227).
    *
    * Query cost shape (the stats sidecar, [[writeBm25Stats]]): when
    * the sidecar covers the current boundary, df/N/avgdl come from it
    * — a vocabulary-sized read, NOT a per-query re-aggregation (and
    * re-checkpoint) of the full postings store — corrected by a
    * live-delta-sized supersede adjustment between compactions
    * (subtract the live keys' base contribution, add their latest
    * non-tombstone version; exact integer arithmetic, so it equals
    * the derived stats bit-for-bit — spec-gated). The candidate join
    * consumes the store scan ONCE, split live-key hot/cold exactly
    * like [[latestAtRead]]. Fallbacks, all answer-identical: a
    * never-compacted store or torn sidecar derives stats from the
    * postings ([[graft.operators.TextStats.bm25FromPostings]]); a
    * live-key set past [[LiveKeyBroadcastMaxRows]] derives over the
    * one-window supersede. */
  def bm25FromIndex(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1Milli: Int = 1200, bMilli: Int = 750,
      maxDocFreq: Option[Long],
      uncappedMetricName: String = "graft_bm25_uncapped",
      asOf: Option[Long] = None): DataFrame = {
    import graft.operators.TextStats
    import graft.plans.Scalars
    // validate the scalar parameters BEFORE any store I/O, listing,
    // count or checkpoint — a bad k must refuse for free
    TextStats.validateBm25Params(k, k1Milli, bMilli)
    val observe =
      if (maxDocFreq.isEmpty) Some(uncappedMetricName) else None
    // boundary, scope and frame all pinned to ONE view — every
    // decision below (sidecar match, hot/cold split, the
    // base-contribution filter) uses b0, never a fresher read
    val (b0, lk, store) =
      pinnedRead(spark, indexPath, postingsSchema, "doc", asOf)
    // query-term pushdown (sidecar paths only — the derive fallback
    // must aggregate the UNFILTERED postings for its stats): the
    // distinct query terms become a static filter on the SCORING
    // frame, which the optimizer pushes to the store scan wherever no
    // supersede window intervenes — with token-clustered slices/bases
    // the row groups outside the query's term range never read.
    // Bounded collect (limit cap+1), skipped past the cap. The filter
    // must never touch the stats-correction frames (a doc with no
    // query term still counts in N/avgdl) and must sit ABOVE the
    // window (an old version's query-term row must not outlive a
    // newer term-less version).
    lazy val qTerms: Option[Array[String]] = {
      val few = queries
        // the ONE query-tokenizer spelling (TextStats.queryTokenCol):
        // this term set becomes a scan FILTER on the postings the
        // scoring join reads — tokenized any other way it would push
        // away rows the join expects and silently zero those terms
        .select(TextStats.queryTokenCol(qtextCol).as("__t")).distinct()
        .limit(TokenPushdownMaxTerms + 1).collect()
      if (few.length > TokenPushdownMaxTerms) None
      else Some(few.map(_.getString(0)).filter(_ != null))
    }
    def withTermFilter(tf: DataFrame): DataFrame =
      qTerms.fold(tf)(ts => tf.filter(col("token").isin(ts: _*)))
    def derive(frame: DataFrame): DataFrame =
      TextStats.bm25FromPostings(
        frame.select(col("doc"), col("token"), col("tf"), col("len")),
        queries, qidCol, qtextCol, k, k1Milli, bMilli, maxDocFreq,
        observe)
    def score(tf: DataFrame, dfreq: DataFrame,
        n: org.apache.spark.sql.Column,
        avgdl: org.apache.spark.sql.Column): DataFrame =
      TextStats.bm25Score(
        tf.select(col("doc"), col("token"), col("tf"), col("len")),
        dfreq, n, avgdl, queries, qidCol, qtextCol,
        k, k1Milli, bMilli, maxDocFreq, observe)
    readBm25Stats(spark, indexPath, expectBoundary = b0) match {
      case None => derive(latestAtRead(store, lk, "doc"))
      case Some((dfBase, scBase)) => lk match {
        case NoVersions =>
          // no relevant live slices: the (possibly asOf-horizon) view
          // IS the base the sidecar covers — stats apply verbatim
          score(withTermFilter(store), dfBase,
            Scalars.of(scBase.select(col("n"))),
            Scalars.of(scBase.select((col("lensum").cast("double") /
              col("n").cast("double")).as("a"))))
        case AllKeys =>
          // unreachable with a committed sidecar (it requires a
          // boundary > 0); kept total and correct regardless
          derive(supersedeWindow(store, "doc"))
        case LiveKeys(keys0) =>
          val keys = keys0.select(col("doc").as("__livek")).distinct()
            .localCheckpoint(true) // consumed 3x: count + semi + anti
          if (keys.count() > LiveKeyBroadcastMaxRows) {
            // past the cap the checkpointed key set is never consumed
            // again — release its BLOCKS, not just the cache entry
            // (Dataset.unpersist does not reach a localCheckpoint's
            // persisted RDD; the ckRdd precedent in the graph family)
            keys.queryExecution.analyzed.collectFirst {
              case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
            }.foreach(_.unpersist(false))
            derive(supersedeWindow(store, "doc"))
          } else {
            // delta-sized (live keys' rows across base + slices);
            // consumed ~5x below — checkpoint per the repo rule
            val (hot0, cold) = splitByLiveKeys(store, keys, "doc")
            val hot = hot0.localCheckpoint(true)
            val hotLatest = supersedeWindow(hot, "doc")
              .filter(col("token").isNotNull)
            // exactly the rows the sidecar counted for these keys —
            // b0 is the SAME boundary the sidecar match used
            val hotBase = hot.filter(
              col("batch_id") < b0 && col("token").isNotNull)
            val tfFinal = withTermFilter(
              cold.select("doc", "token", "tf", "len")
                .unionByName(hotLatest.select("doc", "token", "tf", "len")))
            // df correction: sidecar − base-version + latest-version
            // contributions of the live keys — delta-sized
            // aggregations plus a merge that is QUERY-VOCAB-bounded
            // when the query's token set broadcasts (measured below,
            // never assumed: at web scale the sidecar's vocabulary is
            // itself huge, and only tokens the queries mention can
            // ever join downstream in bm25Score), vocabulary-bounded
            // on the shuffle fallback — same answer either way. One
            // extra pass over the query frame's lineage, the
            // annFromStore sizing-aggregate precedent.
            val dfIn = qTerms match {
              case Some(ts) =>
                // the already-collected term set doubles as a STATIC
                // prefilter on the vocabulary sidecar — it pushes
                // into the sidecar's parquet scan, and no extra
                // aggregate or broadcast runs (the terms sit on the
                // driver; one realization feeds filter and scoring)
                dfBase.filter(col("token").isin(ts: _*))
              case None =>
                // too many terms to collect: the measured broadcast
                // semi-join — rows AND payload bytes, the
                // annFromStore cap discipline (tokens are strings; a
                // row cap alone could admit a multi-GiB broadcast)
                val qtok = queries
                  .select(graft.operators.TextStats
                    .queryTokenCol(qtextCol).as("__qtok"))
                  .distinct()
                val qsz = qtok.agg(count(lit(1)).as("n"),
                  coalesce(sum(octet_length(col("__qtok"))), lit(0L))
                    .cast("long").as("b")).head()
                if (qsz.getLong(0) <= LiveKeyBroadcastMaxRows &&
                    qsz.getLong(1) <= QueryBroadcastMaxBytes)
                  dfBase.join(broadcast(qtok),
                    col("token") <=> col("__qtok"), "left_semi")
                else dfBase
            }
            val dfFinal = dfIn.select(col("token"), col("df"))
              .unionByName(hotBase.groupBy("token")
                .agg((-count(lit(1))).as("df")))
              .unionByName(hotLatest.groupBy("token")
                .agg(count(lit(1)).as("df")))
              .groupBy("token").agg(sum(col("df")).as("df"))
              .filter(col("df") > 0)
            def contrib(rows: DataFrame, sign: Int): DataFrame = rows
              .groupBy("doc").agg(max(col("len")).as("len"))
              .agg((lit(sign.toLong) * count(lit(1))).as("n"),
                (lit(sign.toLong) * coalesce(sum(col("len")), lit(0L)))
                  .as("lensum"))
            val scAll = scBase.select(col("n"), col("lensum"))
              .unionByName(contrib(hotBase, -1))
              .unionByName(contrib(hotLatest, 1))
              .agg(sum(col("n")).as("n"), sum(col("lensum")).as("lensum"))
            score(tfFinal, dfFinal,
              Scalars.of(scAll.select(col("n"))),
              Scalars.of(scAll.select((col("lensum").cast("double") /
                col("n").cast("double")).as("a"))))
          }
      }
    }
  }

  // --------------------------- continuous embedding index (IVF store)

  /** The embedding-store row contract shared by [[embIngestBatch]] and
    * [[annFromStore]]: id cast to long, vector widened to double, the
    * IVF cell and the L2 norm precomputed at ingest (norms must never
    * be paid per candidate pair at query time). */
  private val embSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
    org.apache.spark.sql.types.StructField("cn",
      org.apache.spark.sql.types.DoubleType)))

  private def centroidsPath(storePath: String): String =
    s"$storePath/_centroids"
  private def centroidsMarker(storePath: String): String =
    s"$storePath/_centroids_committed"

  /** The COMMITTED centroid model, if one exists. Lives as a tiny
    * parquet table under the store root (`_centroids` is inert to
    * [[IngestStore.read]]'s slice listing, like the bloom sidecars),
    * committed by a marker file written strictly AFTER the parquet —
    * a multi-file parquet overwrite is not atomic, and a torn model
    * from a mid-write crash must read as ABSENT (the replay retrains
    * deterministically and re-commits) rather than be trusted
    * forever. The same marker-commit argument as [[IngestStore]]'s
    * boundary protocol. */
  private def readCentroids(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String): Option[Array[Array[Double]]] = {
    val marker = new org.apache.hadoop.fs.Path(centroidsMarker(storePath))
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(marker)) None
    else try {
      val rows = spark.read.parquet(centroidsPath(storePath))
        .orderBy("cell").collect()
      if (rows.isEmpty) None
      else Some(rows.map(_.getAs[Seq[Double]]("c").toArray))
    } catch {
      // marker present but the table unreadable (externally damaged:
      // AnalysisException for a missing/invalid table, SparkException
      // for a torn footer that only surfaces at collect()): treat as
      // absent — the ingest path then either retrains (no assigned
      // slices yet) or refuses loudly (model genuinely lost; see
      // embIngestBatch's assigned-slice check). A fatal error (OOM,
      // interrupt) still propagates. LOGGED so a transient I/O
      // failure is distinguishable from a genuinely absent model when
      // the misleading downstream symptom ("no committed centroid
      // model", or an unexpected retrain) is investigated.
      case scala.util.control.NonFatal(e) =>
        Log.warn(
          s"readCentroids($storePath): marker present but the model " +
            "table failed to read — treating the model as ABSENT " +
            "(externally damaged or transient I/O); the query path " +
            "will refuse and the ingest path will retrain or refuse " +
            s"per its assigned-slice check. Cause: $e")
        None
    }
  }

  private def writeCentroids(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      model: Array[Array[Double]]): Unit = {
    val marker = new org.apache.hadoop.fs.Path(centroidsMarker(storePath))
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    // the marker must be GONE before the (non-atomic) parquet
    // overwrite starts, or a mid-overwrite crash leaves a committed
    // marker over a torn table — a failed delete must fail the batch
    if (fs.exists(marker))
      require(fs.delete(marker, false),
        s"embIngest: could not clear the model marker $marker " +
          "before rewriting the model — refusing to overwrite under " +
          "a live commit marker")
    import spark.implicits._
    model.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "c")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(centroidsPath(storePath))
    fs.create(marker, true).close()
  }

  /** Continuous embedding-index maintenance — the IVF analogue of
    * [[indexIngest]] (faiss's static-coarse-quantizer + growing-index
    * deployment shape, Jégou et al. 2011; public literature): the
    * centroid model trains ONCE, on the first batch carrying vectors
    * (the [[graft.operators.Similarity.centroidModel]] bounded
    * driver-local sample — deterministic, so a replay of that batch
    * either finds the marker-committed model or retrains the
    * identical one), persists beside the store, and every later
    * batch only ASSIGNS its vectors to cells and appends a
    * `(vec, cell, v, cn)` slice under the replay-idempotent batch_id
    * protocol. Compaction applies latest-version-wins supersede per
    * vec id. Model knobs (nCells, seed, lloydIters) are store-lifetime
    * constants — the [[dedupIngest]] "n must stay constant" contract;
    * re-training on later data is a NEW store (re-ingest the corpus),
    * never an in-place mutation, because stored cell assignments are
    * model-dependent.
    *
    * Per-batch cost: one bounded assignment pass over the batch (the
    * model is a broadcast-sized literal) + one slice write — nothing
    * corpus-proportional, the accumulated corpus is never re-assigned.
    * Query time ([[annFromStore]]) probes nProbe cells per query over
    * one columnar store scan — the IVF candidate cost the batch
    * operator already prices, now over an incrementally-built index. */
  def embIngest(
      stream: DataFrame, storePath: String,
      idCol: String, vecCol: String,
      nCells: Int = 16, seed: Long = 42L, lloydIters: Int = 2,
      compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      embIngestBatch(batch, batchId, storePath, idCol, vecCol,
        nCells, seed, lloydIters, compactEvery)
    }

  /** The per-batch step — separated so tests and manual backfills can
    * replay a batch directly and observe idempotence.
    *
    * Model lifecycle: the model trains on the FIRST batch that carries
    * a non-null vector (deterministic sample, so a replay of that
    * batch either finds the committed model or retrains the identical
    * one) — an empty or all-null leading batch writes its empty slice
    * and defers training rather than committing an empty model that
    * would wedge every later batch.
    *
    * NULL-vector rows are the redaction shape here, mirroring
    * [[indexIngestBatch]]'s tombstones: they carry no cell (a null
    * never equi-joins, so they are retrieval-invisible) but DO carry
    * the latest batch id, so compaction's latest-per-vec supersede
    * drops the redacted vector's old postings — and its purge then
    * drops the tombstone row itself, so the erased vector leaves zero
    * bytes in the base ([[IngestStore.compact]]'s purge contract).
    * They are excluded from model training. */
  def embIngestBatch(
      batch: DataFrame, batchId: Long, storePath: String,
      idCol: String, vecCol: String,
      nCells: Int = 16, seed: Long = 42L, lloydIters: Int = 2,
      compactEvery: Int = 16): Unit = {
    val spark = batch.sparkSession
    // in-write id guard with the replay-over-existing probe fallback —
    // the indexIngestBatch rationale verbatim
    val slicePath = new org.apache.hadoop.fs.Path(
      s"$storePath/batch_id=$batchId")
    val fs = slicePath.getFileSystem(
      spark.sessionState.newHadoopConf())
    val replayOverExisting = fs.exists(slicePath)
    if (replayOverExisting) requireLongIds(batch, idCol, "embIngest")
    val idExpr =
      if (replayOverExisting) col(idCol).cast("long")
      else guardedLongId(batch, idCol, "embIngest")
    import graft.functions.{VectorFunctions => V}
    import graft.plans.{DotProduct, SketchExpressions => SK}
    val slim = batch.select(idExpr.as("vec"),
      V.toDouble(col(vecCol)).as("v"))
    val model: Option[Array[Array[Double]]] =
      rethrowingIdGuard("embIngest", idCol)(()) {
      readCentroids(spark, storePath).orElse {
        // No committed model: the training collect would be slim's
        // first action — but it filters v IS NOT NULL, and that filter
        // pushes BELOW the guarded id projection, so a bad id sitting
        // only on null-vector (tombstone) rows would never evaluate
        // the guard during training, the model would train and COMMIT
        // _centroids, and only the later slice write would refuse —
        // leaving a readable store mutation behind a refused batch.
        // Probe ALL rows first (one batch-sized scan, only on the
        // no-model path — bounded: this branch runs only while no
        // model exists), so a bad-id batch refuses before any write.
        requireLongIds(batch, idCol, "embIngest")
        // Retraining is only legitimate when the
        // store carries NO model-assigned rows (first vector batch,
        // or a replay of it after a pre-marker crash) — assigned
        // slices under a missing model mean the model was LOST, and
        // retraining on this batch alone would silently invalidate
        // every stored cell. Refuse loudly instead. Bounded cost:
        // this branch runs only while no model exists.
        val assignedBefore = IngestStore
          .read(spark, storePath, embSchema, excludeBatch = batchId)
          .filter(col("cell").isNotNull)
        require(assignedBefore.isEmpty,
          s"embIngest: store at $storePath carries cell-assigned " +
            "slices but no committed centroid model — the model was " +
            "lost; restore _centroids + its marker (retraining here " +
            "would invalidate every stored assignment)")
        val m = graft.operators.Similarity.centroidModel(
          slim.filter(col("v").isNotNull), "vec", "v",
          nCells, seed, lloydIters)
        if (m.isEmpty) None // nothing to train on yet — defer
        else { writeCentroids(spark, storePath, m); Some(m) }
      }
      }
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      // refuse-before-any-store-maintenance (the indexIngestBatch
      // rationale): one batch-sized probe gates the compaction rewrite
      // so a permanently bad batch cannot re-trigger it per replay
      if (!replayOverExisting) requireLongIds(batch, idCol, "embIngest")
      IngestStore.compact(spark, storePath, embSchema,
        upTo = batchId, latestPerKey = Some("vec"),
        sortBy = Seq("cell"),
        // erasure completion, mirroring indexIngestBatch: a vec whose
        // latest absorbed version is the null-vector redaction leaves
        // zero bytes in the base (null vectors are retrieval-invisible
        // at every still-readable snapshot, so the drop changes no
        // answer)
        purge = Some(col("v").isNull))
    val assigned = model match {
      case Some(m) => slim
        .withColumn("cell",
          element_at(SK.nearestCells(col("v"), m, 1), 1))
        .withColumn("cn", sqrt(DotProduct(col("v"), col("v"))))
        .select("vec", "cell", "v", "cn")
      case None => // empty/all-null batch before any model: the slice
        // still lands (protocol coverage stays contiguous); null-vec
        // rows are tombstones exactly as in the trained path
        slim.select(col("vec"), lit(null).cast("int").as("cell"),
          col("v"), lit(null).cast("double").as("cn"))
    }
    // cell-clustered within each written file: parquet row-group
    // min/max stats on `cell` then make annFromStore's probed-cell
    // IN-filter skip un-probed cells' vector payloads at scan time —
    // a batch-local sort, nothing shuffles
    rethrowingIdGuard("embIngest", idCol) {
      fs.delete(slicePath, true)
    } {
      writeBatch(assigned.sortWithinPartitions("cell"), storePath,
        "parquet", batchId)
    }
  }

  /** Query-frame broadcast caps for [[annFromStore]] — the measured
    * form of the family's "queries are the small side" convention
    * ([[graft.operators.TextStats.heavyHittersPerGroup]]'s
    * decide-the-path-never-the-answer discipline): the broadcast frame
    * is |queries|·nProbe rows, each carrying the full query vector, so
    * the size test measures BOTH exploded rows and vector payload
    * bytes (Σ dims · 8 B · nProbe). At or under both caps the
    * candidate join broadcasts; above either it runs as an ordinary
    * cell-keyed shuffle join — same answer, no driver-memory cliff. */
  private[streaming] val QueryBroadcastMaxRows = 1L << 20
  private[streaming] val QueryBroadcastMaxBytes = 64L << 20

  /** ANN top-k over the accumulated embedding store — the query side
    * of [[embIngest]]: queries probe their `nProbe` nearest cells
    * under the PERSISTED model and rank exact cosines within the
    * probed candidates ([[graft.operators.Similarity.topK]]'s tie
    * rule, so results over a store built from any batch decomposition
    * equal the batch IVF given the same model — and equal
    * [[graft.operators.Similarity.bruteForceTopK]] outright when
    * `nProbe = nCells`, the exact spelling q224 oracle-gates).
    *
    * The store scan applies the [[latestAtRead]] per-vec supersede:
    * a re-ingested vector scores only in its newest version (never at
    * two ranks), and a null-vector REDACTION is retrieval-invisible
    * immediately — not only after the next compaction.
    *
    * Query-side size contract: the query frame broadcasts only while
    * MEASURED under `broadcastMaxRows` exploded rows AND
    * `broadcastMaxBytes` of vector payload (one aggregate over the
    * query frame, never assumed — both caps are parameters so a
    * caller raising one can never be silently re-capped by the
    * other); past either cap the join falls back to a cell-keyed
    * shuffle — identical results either way. The sizing aggregate is
    * one extra execution of the query frame's lineage per call: fine
    * for the eval-set-sized frames this serves; a caller with an
    * expensive query-frame lineage should cache/checkpoint it first.
    *
    * `asOf`: probe the SNAPSHOT of the store as of that batch
    * ([[IngestStore.readAsOf]] — reproducible ANN over a pinned
    * corpus moment while ingest continues; the train-once model is
    * store-lifetime, so snapshot assignments are the live ones). */
  def annFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nProbe: Int = 4,
      broadcastMaxRows: Long = QueryBroadcastMaxRows,
      broadcastMaxBytes: Long = QueryBroadcastMaxBytes,
      asOf: Option[Long] = None): DataFrame = {
    import graft.functions.{VectorFunctions => V}
    import graft.plans.{DotProduct, SketchExpressions => SK}
    val model = readCentroids(spark, storePath).getOrElse(
      throw new IllegalStateException(
        s"annFromStore: no committed centroid model at $storePath — " +
          "ingest a batch with vectors first"))
    val (_, scope, frame) =
      pinnedRead(spark, storePath, embSchema, "vec", asOf)
    val q0 = queries.select(col(qIdCol).as("query_id"),
      V.toDouble(col(qVecCol)).as("qv"))
    // measured, never assumed: one aggregate over the (pre-explode)
    // query frame; the explode multiplies rows and payload by nProbe
    val sz = q0.agg(count(lit(1)).as("n"),
      coalesce(sum(size(col("qv"))), lit(0)).cast("long").as("d")).head()
    val small = sz.getLong(0) * nProbe <= broadcastMaxRows &&
      sz.getLong(1) * 8L * nProbe <= broadcastMaxBytes
    // under the caps the query frame MATERIALIZES ONCE (a broadcast
    // collects this much to the driver anyway) and every decision AND
    // the answer derive from that one realization — a sampled or
    // concurrently-changing query source cannot diverge between the
    // probed-cell collect and the in-plan probe (the path-vs-answer
    // discipline: the sizing aggregate sees its own realization, but
    // it only picks the PATH)
    val qBase =
      if (!small) q0
      else spark.createDataFrame(
        java.util.Arrays.asList(q0.collect(): _*), q0.schema)
    // probed-cell pushdown: the distinct cells this query batch will
    // probe are BOUNDED BY nCells (a store-lifetime knob), so they
    // collect safely from the materialized frame and become a STATIC
    // IN-filter the optimizer pushes to the store scan wherever no
    // supersede window intervenes — the fully-compacted steady state
    // and the split's cold branch — so row-group stats skip un-probed
    // cells' vector payloads entirely. It must sit ABOVE
    // [[latestAtRead]], never below: a superseding version can live
    // in an un-probed cell, and pre-filtering would resurface the
    // stale probed-cell version. Skipped when the batch provably
    // probes at least half the cells (no selectivity to buy — the
    // nProbe guard also spares exact-mode all-cells callers the
    // collect) and on the shuffle path (no materialized frame to stay
    // consistent with).
    val probed: Option[Array[Int]] =
      if (!small || nProbe * 2 >= model.length) None
      else Some(qBase
        .select(explode(SK.nearestCells(col("qv"), model, nProbe))
          .as("__cell"))
        .distinct().collect().map(_.getInt(0)))
    val c0 = latestAtRead(frame, scope, "vec")
    val c = probed.filter(_.length * 2 < model.length)
      .fold(c0)(cells =>
        c0.filter(col("cell").isin(cells.map(Integer.valueOf): _*)))
      .select(col("vec").as("neighbor_id"), col("cell"),
        col("v").as("cv"), col("cn"))
    val q = qBase
      .withColumn("qn", sqrt(DotProduct(col("qv"), col("qv"))))
      .withColumn("cell",
        explode(SK.nearestCells(col("qv"), model, nProbe)))
    val scored = c.join(if (small) broadcast(q) else q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        DotProduct(col("qv"), col("cv")) / (col("qn") * col("cn")))
    graft.operators.Similarity.topK(scored, k)
  }

  /** Re-train migration for [[embIngest]] stores — the operational
    * form of the documented "re-training is a NEW store" contract
    * (stored cell assignments are model-dependent, so new knobs can
    * never mutate a live store in place): replays the accumulated
    * LATEST-version vectors (tombstoned redactions drop) through a
    * fresh model with the new knobs into `newStorePath`, as one
    * batch-0 slice under the standard protocol. The old store is
    * READ-ONLY throughout — queries against it are unaffected
    * mid-migration (spec-gated) and it stays the serving store until
    * the caller flips reads over.
    *
    * Crash story: the new store's model marker commits before its
    * data slice lands, so a torn migration leaves either (a) no
    * marker — [[annFromStore]] refuses, or (b) a model with no/partial
    * batch-0 slice, which THIS function refuses to resume into
    * (target must be empty); delete the target directory and re-run —
    * the migration is deterministic, the old store never moved.
    * Cost: one scan of the old store + the bounded model train + one
    * assignment pass — corpus-linear, paid once.
    *
    * @return the number of vectors migrated */
  def migrateEmbStore(
      spark: org.apache.spark.sql.SparkSession,
      oldStorePath: String, newStorePath: String,
      nCells: Int = 16, seed: Long = 42L, lloydIters: Int = 2): Long = {
    require(
      IngestStore.sliceIds(spark, newStorePath).isEmpty &&
        IngestStore.boundary(spark, newStorePath) == 0L &&
        readCentroids(spark, newStorePath).isEmpty,
      s"migrateEmbStore: target $newStorePath is not empty — a " +
        "half-migrated target cannot be resumed (the model may not " +
        "match the slices); delete it and re-run")
    val live = {
      val (_, scope, frame) =
        pinnedRead(spark, oldStorePath, embSchema, "vec", None)
      latestAtRead(frame, scope, "vec")
    }
      .filter(col("v").isNotNull)
      .select(col("vec"), col("v"))
      .localCheckpoint(true) // consumed twice: train+assign, count
    try {
      embIngestBatch(live, 0L, newStorePath, "vec", "v",
        nCells, seed, lloydIters, compactEvery = 0)
      live.count()
    } finally live.unpersist(false) // a corpus-sized vector snapshot
    // must not stay pinned in the block manager of the long-lived
    // session this API serves — release it the moment the new store
    // has its slice
  }

  // ------------------------------------------- drift monitoring

  /** Continuous distribution-drift monitor: each arriving micro-batch's
    * unigram distribution is compared against the ACCUMULATED corpus
    * distribution (all prior batches), emitting one
    * `(n_tokens, n_distinct, kl_vs_store, tv_vs_store)` row per batch —
    * the streaming form of [[graft.operators.TextStats.unigramDrift]]
    * (per-dump drift vs the whole corpus becomes per-batch drift vs the
    * corpus-so-far): the alarm that fires when a crawl snapshot's
    * topic/language mix silently shifts, BEFORE mixing weights are
    * chosen (Wenzek 2019's monitoring concern, made incremental).
    *
    * Arithmetic (matches `unigramDrift`): add-one smoothing over the
    * union vocabulary `V` of batch and store,
    * `p(t) = (c_batch+1)/(n_batch+|V|)`,
    * `q(t) = (c_store+1)/(n_store+|V|)`; `kl = Σ p·ln(p/q)`,
    * `tv = Σ|p−q|/2`. Batch 0 (empty store) has no reference
    * distribution and emits NULL drift — its counts still seed the
    * store.
    *
    * Store shape at scale: the counts store holds `(tok, c)` slices,
    * one per batch, absorbed every `compactEvery` batches through
    * [[IngestStore.compact]]'s `reduce` hook into a sum-merged
    * VOCABULARY-sized base (the mergeable-counter contract) — per-batch
    * cost is the batch's own tokenize+agg plus one columnar scan of
    * that two-column store (the same honest corpus-proportional term as
    * the ingest index probes), never a re-tokenization of old text.
    * Replay-idempotent by the standard slice protocol: counts slice and
    * drift row both overwrite their own `batch_id` partition, and the
    * store read excludes the replaying batch's half-written slice. */
  def driftMonitor(
      stream: DataFrame, storePath: String, driftPath: String,
      textCol: String, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      driftMonitorBatch(batch, batchId, storePath, driftPath, textCol,
        compactEvery)
    }

  /** Streaming trending-token monitor: per micro-batch, the top-k
    * tokens by smoothed frequency LIFT against the accumulated corpus
    * — "what vocabulary is this batch suddenly heavy in", the
    * token-level read beside [[driftMonitor]]'s one-number KL/TV (a
    * drift alarm says THAT the batch moved; this says WHERE). Shares
    * the drift monitor's counts-store protocol byte-for-byte (same
    * `(tok, c)` slices, same reduce-compaction, same replay-idempotent
    * slice overwrite), so one store can feed both monitors.
    *
    * Lift arithmetic (exact integer milli): with batch counts `cb`,
    * store counts `cp`, totals `nb`/`np`, union vocabulary `V`,
    * `lift_milli = (1000·(cb+1)·(np+|V|)) div ((nb+|V|)·(cp+1))` — the
    * add-one-smoothed p(t)/q(t) ratio of [[driftMonitor]] in milli
    * fixed point, positive operands so DuckDB `//` = Spark `div`.
    * Overflow contract: 1000·(max cb + 1)·(np+|V|) < 2^63 — a
    * ~10^15-token store at kilotoken batch counts; past that, coarsen
    * the unit. Top-k order is (lift_milli desc, tok asc) — total, so
    * the cut is deterministic. Batch 0 has no reference and emits NO
    * rows (its counts still seed the store). */
  def trendingTokens(
      stream: DataFrame, storePath: String, trendPath: String,
      textCol: String, k: Int = 10, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      trendingTokensBatch(batch, batchId, storePath, trendPath, textCol,
        k, compactEvery)
    }

  /** The per-batch step of [[trendingTokens]] — separated so tests and
    * manual backfills can replay a batch directly. */
  def trendingTokensBatch(
      batch: DataFrame, batchId: Long, storePath: String,
      trendPath: String, textCol: String, k: Int = 10,
      compactEvery: Int = 16): Unit = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = batch.sparkSession
    val cntSchema = StructType(Seq(
      StructField("tok", StringType, nullable = true),
      StructField("c", LongType, nullable = true)))
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      IngestStore.compact(spark, storePath, cntSchema, upTo = batchId,
        reduce = Some(rows => rows.groupBy(col("tok"))
          .agg(sum(col("c")).as("c"))
          .withColumn("batch_id", lit(0L))))
    writeBatch(
      batch.select(explode(split(col(textCol), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c")),
      storePath, "parquet", batchId)
    val bc = spark.read.schema(cntSchema)
      .parquet(s"$storePath/batch_id=$batchId")
    val prior = IngestStore
      .read(spark, storePath, cntSchema, excludeBatch = batchId)
      .filter(col("batch_id") < lit(batchId))
      .groupBy(col("tok")).agg(sum(col("c")).as("cp"))
    // union-vocabulary frame, pinned once: three scalar subqueries and
    // the top-k rank all consume it
    val joined = bc.select(col("tok"), col("c").as("cb"))
      .join(prior, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("cp"), lit(0L)).as("cp"))
      .localCheckpoint(true)
    import graft.plans.Scalars
    val nb = Scalars.of(joined.agg(sum(col("cb")).as("v")))
    val np = Scalars.of(joined.agg(sum(col("cp")).as("v")))
    val v = Scalars.of(joined.agg(count(lit(1)).as("v")))
    val trend = joined
      .filter(col("cb") > 0 && np > 0) // batch vocab only; batch 0 empty
      .withColumn("__nb", nb).withColumn("__np", np).withColumn("__v", v)
      .withColumn("lift_milli",
        expr("(1000L * (`cb` + 1) * (`__np` + `__v`)) " +
          "div ((`__nb` + `__v`) * (`cp` + 1))"))
      .orderBy(col("lift_milli").desc, col("tok"))
      .limit(k)
      .select(col("tok"), col("cb"), col("cp"), col("lift_milli"))
    writeBatch(trend, trendPath, "parquet", batchId)
  }

  /** The per-batch step — separated so tests and manual backfills can
    * replay a batch directly and observe idempotence. */
  def driftMonitorBatch(
      batch: DataFrame, batchId: Long, storePath: String,
      driftPath: String, textCol: String, compactEvery: Int = 16): Unit = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = batch.sparkSession
    val cntSchema = StructType(Seq(
      StructField("tok", StringType, nullable = true),
      StructField("c", LongType, nullable = true)))
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      IngestStore.compact(spark, storePath, cntSchema, upTo = batchId,
        reduce = Some(rows => rows.groupBy(col("tok"))
          .agg(sum(col("c")).as("c"))
          .withColumn("batch_id", lit(0L))))
    // slice first, read back: the drift compute references the batch
    // counts twice more than the store write (the vocab join + its own
    // aggregate) — a materialized slice turns those into columnar
    // re-reads instead of repeated tokenize+agg runs (the
    // ingestDedupBatch recipe)
    writeBatch(
      batch.select(explode(split(col(textCol), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c")),
      storePath, "parquet", batchId)
    val bc = spark.read.schema(cntSchema)
      .parquet(s"$storePath/batch_id=$batchId")
    val prior = IngestStore
      .read(spark, storePath, cntSchema, excludeBatch = batchId)
      .filter(col("batch_id") < lit(batchId))
      .groupBy(col("tok")).agg(sum(col("c")).as("cp"))
    // union-vocabulary frame, pinned once: three scalar subqueries and
    // the final aggregate all consume it
    val joined = bc.select(col("tok"), col("c").as("cb"))
      .join(prior, Seq("tok"), "full_outer")
      .select(coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("cp"), lit(0L)).as("cp"))
      .localCheckpoint(true)
    import graft.plans.Scalars
    val nb = Scalars.of(joined.agg(sum(col("cb")).as("v")))
    val np = Scalars.of(joined.agg(sum(col("cp")).as("v")))
    val v = Scalars.of(joined.agg(count(lit(1)).as("v")))
    val p = (col("cb") + 1).cast("double") / (nb + v)
    val q = (col("cp") + 1).cast("double") / (np + v)
    val drift = joined.agg(
        sum(col("cb")).as("n_tokens"),
        sum(when(col("cb") > 0, 1L).otherwise(0L)).as("n_distinct"),
        round(sum(p * log(p / q)), 4).as("kl"),
        round(sum(abs(p - q)) / 2, 4).as("tv"))
      .select(
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        when(np > 0, col("kl")).as("kl_vs_store"),
        when(np > 0, col("tv")).as("tv_vs_store"))
    writeBatch(drift, driftPath, "parquet", batchId)
  }

  // ------------------------------------------------------- sessionize

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      total_value: Double)
  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Gap-based sessionization via flatMapGroupsWithState — arbitrary
    * per-key state with timeout-driven emission, the streaming form of
    * the reference's per-key Reducer (emit at end-of-input becomes emit
    * at session timeout).
    *
    * Disorder contract: batch equivalence ([[sessionizeBatch]]) is
    * exact for per-key in-order arrival and for cross-batch lateness
    * within the open session's gap reach (such events extend the span
    * via min/max — state timestamps are monotonic, sessions can never
    * invert). An event older than `start - gap` belongs to a session
    * already emitted (or never observed): it is emitted as a
    * best-effort LATE session — consecutive such events within gap of
    * each other in the same batch merge into one (they are visible
    * together in the sorted batch, so this is free), but they are
    * never merged into the already-emitted original — the bounded
    * degradation of keeping one state object per key instead of
    * buffering history. */
  /** @param idleFlush when true (production default), idle sessions are
    *   flushed via processing-time timeouts; tests that drive the query
    *   with `processAllAvailable` use false — with a continuous trigger,
    *   pending timeouts keep the micro-batch loop busy and
    *   `processAllAvailable` never settles. Gap-closure emission works
    *   either way. */
  def sessionize(
      events: Dataset[Event],
      gapMillis: Long,
      idleFlush: Boolean = true): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[Session]
      var cur = state.getOption
      // accumulator for OUT-OF-GAP late arrivals: consecutive lates
      // within gap of each other are visible together in the sorted
      // batch, so merging them into one best-effort session is free —
      // per-event singletons would diverge from batch semantics more
      // than the one-state-per-key limitation requires
      var late: Option[SessionState] = None
      def flushLate(): Unit = late.foreach { l =>
        out ::= Session(userId, new java.sql.Timestamp(l.start),
          new java.sql.Timestamp(l.last), l.n, l.total)
        late = None
      }
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          // monotonic merge: a cross-batch LATE arrival inside the
          // session's gap reach extends the span via min/max — the
          // previous `last = t` spelling REGRESSED `last` on t < last,
          // emitting inverted sessions (end < start) and misclosing
          // the gap on the next in-order event
          case Some(s) if t >= s.start - gapMillis && t - s.last <= gapMillis =>
            cur = Some(s.copy(start = math.min(s.start, t),
              last = math.max(s.last, t), n = s.n + 1,
              total = s.total + e.value))
          // out-of-gap late arrival (older than the open session could
          // reach): its true session was already emitted or never
          // observed — accumulate into a best-effort late session
          // (merged with in-gap NEIGHBORING lates, sorted order makes
          // t >= late.last) rather than corrupt the open session's
          // state. Exact batch equivalence holds for per-key in-order
          // (or within-gap-disordered) arrival; this is the documented
          // degradation beyond it.
          case Some(s) if t < s.start - gapMillis =>
            late match {
              case Some(l) if t - l.last <= gapMillis =>
                late = Some(l.copy(last = t, n = l.n + 1,
                  total = l.total + e.value))
              case _ =>
                flushLate()
                late = Some(SessionState(t, t, 1, e.value))
            }
          case Some(s) =>
            out ::= Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      flushLate()
      if (state.hasTimedOut) {
        val s = state.get
        out ::= Session(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n, s.total)
        state.remove()
      } else cur.foreach { s =>
        state.update(s)
        if (idleFlush) state.setTimeoutDuration(gapMillis)
      }
      out.reverseIterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleFlush) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }

  /** Batch-mode sessionization with identical semantics (windows over
    * lag-gap cumulative sums) — lets batch tests and the oracle gate
    * validate what the streaming path computes. */
  def sessionizeBatch(
      events: DataFrame, userCol: String, tsCol: String, valueCol: String,
      gapMillis: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          (unix_millis(col(tsCol)) - unix_millis(col("prev_ts"))) > gapMillis)
          .cast("int"))
      .withColumn("session_no",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_no"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
  }
}
