package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
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
    val collisions = right.columns.filter(left.columns.toSet).toSet
    val taken = (left.columns ++ right.columns).toSet
    val suffix = (Iterator("_r") ++ Iterator.from(2).map(i => s"_r$i"))
      .find(s => collisions.forall(c => !taken(s"$c$s")))
      .get // the probe space is infinite, a free suffix always exists
    val renamed = collisions.foldLeft(right)(
      (d, c) => d.withColumnRenamed(c, s"$c$suffix"))
    def rName(c: String): String = if (collisions(c)) s"$c$suffix" else c
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
    * is checked against ITSELF and the accumulated corpus via
    * [[graft.operators.Dedup.incrementalJaccardPairs]] (new×new +
    * new×old — the quadratic old×old bulk is structurally skipped;
    * those pairs surfaced when their docs were themselves the new
    * batch), flagged pairs are appended to `pairsPath` and the batch
    * itself to the corpus at `corpusPath` — both as `batch_id=N`
    * slices, so a replayed batch OVERWRITES its own partitions (the
    * [[exactlyOnceFileSink]] idempotence recipe). Replay safety also
    * requires excluding the current batch's own slice from the "old"
    * corpus read — a half-written slice from a failed attempt would
    * otherwise self-join the batch — hence the corpus scan filters
    * `batch_id != current` on the partition column (partition-pruned:
    * the excluded slice is never read).
    *
    * At scale the corpus side is exactly the incremental operator's
    * design target: a static, partition-pruned parquet table joined
    * once per batch on the new docs' prefix keys; per-batch cost
    * scales with the batch, not the accumulated corpus size.
    */
  def dedupIngest(
      stream: DataFrame, corpusPath: String, pairsPath: String,
      idCol: String, textCol: String, n: Int, threshold: Double)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      ingestDedupBatch(batch, batchId, corpusPath, pairsPath,
        idCol, textCol, n, threshold)
    }

  /** The per-batch step — separated (like [[writeBatch]]) so tests and
    * manual backfills can replay a batch directly and observe
    * idempotence.
    *
    * The old-corpus read supplies an EXPLICIT schema (the batch's own
    * two selected columns + the `batch_id` partition column) rather
    * than inferring one: inference inside a stream's batch function is
    * fragile — an existing-but-empty corpus directory (pre-created by a
    * deploy script, an object-store marker, or a failed first attempt
    * that made the dir without files) has nothing to infer from and
    * would kill batch 0 with UNABLE_TO_INFER_SCHEMA, and even on the
    * happy path the first batch would silently define the contract.
    * With the schema pinned, an empty or fileless directory reads as
    * zero rows and the column types never drift from the stream's. */
  def ingestDedupBatch(
      batch: DataFrame, batchId: Long, corpusPath: String,
      pairsPath: String, idCol: String, textCol: String,
      n: Int, threshold: Double): Unit = {
    val spark = batch.sparkSession
    val sel = batch.select(col(idCol), col(textCol))
    val root = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val corpusSchema = org.apache.spark.sql.types.StructType(
      sel.schema.fields :+ org.apache.spark.sql.types.StructField(
        "batch_id", org.apache.spark.sql.types.LongType, nullable = true))
    val old =
      if (fs.exists(root))
        spark.read.option("basePath", corpusPath).schema(corpusSchema)
          .parquet(corpusPath)
          .filter(col("batch_id") =!= batchId)
          .select(col(idCol), col(textCol))
      else sel.limit(0)
    val pairs = graft.operators.Dedup.incrementalJaccardPairs(
      sel, old, idCol, textCol, n, threshold)
    writeBatch(pairs, pairsPath, "parquet", batchId)
    writeBatch(sel, corpusPath, "parquet", batchId)
  }

  /** Continuous training-data PREPARATION: the ingest-side composition
    * of the batch prep pipeline — each arriving micro-batch is
    * quality-gated (token count ≥ `minTokens`) and only FIRST
    * occurrences of a content fingerprint are admitted: lowest id
    * wins within the batch, and anything already in the accepted
    * store is dropped (first-batch-wins across batches). Accepted
    * docs land as replay-idempotent `batch_id=N` slices carrying
    * their fingerprint, so the cross-batch check is a fingerprint
    * LEFT ANTI join against a partition-pruned static table — per-
    * batch cost scales with the batch (the [[dedupIngest]] contract),
    * and the stored `fp` column means the old corpus' text is never
    * re-read or re-hashed.
    *
    * Same file protocol as [[ingestDedupBatch]]: explicit schema on
    * the store read (an empty/pre-created dir reads as zero rows),
    * `batch_id != current` excludes a half-written own slice on
    * replay, and the slice overwrite makes replays idempotent.
    */
  def prepIngest(
      stream: DataFrame, acceptedPath: String,
      idCol: String, textCol: String, minTokens: Long)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      prepIngestBatch(batch, batchId, acceptedPath, idCol, textCol,
        minTokens)
    }

  /** The per-batch step — separated so tests and manual backfills can
    * replay a batch directly and observe idempotence. */
  def prepIngestBatch(
      batch: DataFrame, batchId: Long, acceptedPath: String,
      idCol: String, textCol: String, minTokens: Long): Unit = {
    import graft.functions.{TextFunctions => T}
    val spark = batch.sparkSession
    val qual = batch.select(col(idCol), col(textCol))
      .filter(T.tokenCount(col(textCol)) >= minTokens)
      .withColumn("fp", T.fingerprint(col(textCol)))
    // within-batch winners: lowest id per fingerprint (one keyed agg +
    // join-back — the q22 exact-dedup shape)
    val keep = qual.groupBy(col("fp")).agg(min(col(idCol)).as("__keep"))
    val winners = qual.join(keep, Seq("fp"))
      .filter(col(idCol) === col("__keep")).drop("__keep")
    val root = new org.apache.hadoop.fs.Path(acceptedPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val storeSchema = org.apache.spark.sql.types.StructType(
      winners.schema.fields :+ org.apache.spark.sql.types.StructField(
        "batch_id", org.apache.spark.sql.types.LongType, nullable = true))
    val oldFps =
      if (fs.exists(root))
        spark.read.option("basePath", acceptedPath).schema(storeSchema)
          .parquet(acceptedPath)
          .filter(col("batch_id") =!= batchId)
          .select(col("fp"))
      else winners.select(col("fp")).limit(0)
    val accepted = winners.join(oldFps, Seq("fp"), "left_anti")
    writeBatch(accepted, acceptedPath, "parquet", batchId)
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
    * at session timeout). */
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
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMillis =>
            cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
          case Some(s) =>
            out ::= Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
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
