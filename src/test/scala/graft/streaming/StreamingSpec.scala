package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import Streaming._

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedAgg: tumbling window counts via memory sink") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(
      Event(1L, ts(1), 1.0), Event(1L, ts(2), 2.0),
      Event(2L, ts(7), 3.0), Event(1L, ts(8), 4.0))
    val agg = windowedAgg(ms.toDF(), "ts", "user_id", "value",
      windowDuration = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT user_id, n, total FROM win_out ORDER BY window_start, user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 3.0)))
  }

  test("windowedAgg: watermark finalizes windows and drops late data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val agg = windowedAgg(ms.toDF(), "ts", "user_id", "value",
      windowDuration = "5 minutes", watermark = "5 minutes")
    // append mode: a window row is emitted only once the watermark
    // passes its end — i.e. results are FINAL, late rows can't mutate them
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    ms.addData(Event(1L, ts(1), 1.0), Event(1L, ts(2), 2.0))
    q.processAllAvailable()
    ms.addData(Event(1L, ts(30), 9.0)) // advances watermark to 10:25
    q.processAllAvailable()
    ms.addData(Event(1L, ts(3), 100.0)) // 10:03 < watermark → dropped
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT n, total FROM wm_out ORDER BY window_start")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // the 10:00-10:05 window finalized with the two on-time rows only;
    // the 10:30 window is still open (watermark < its end), not emitted
    assert(rows.toSeq === Seq((2L, 3.0)))
  }

  test("stream-static enrichment join (broadcast dim)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream[Event]
    val q = Streaming.enrich(ms.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    ms.addData(Event(1L, ts(1), 1.0), Event(2L, ts(2), 2.0),
      Event(3L, ts(3), 3.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT user_id, tier FROM enrich_out ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "gold"), (2L, "silver"), (3L, null)))
  }

  test("sessionize: gap closure emits completed sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = sessionize(ms.toDS(), gapMillis = 10 * 60 * 1000L,
        idleFlush = false)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // session 1: minutes 1,2,3 — closed by the minute-30 event
    ms.addData(Event(1L, ts(1), 1.0), Event(1L, ts(2), 1.0), Event(1L, ts(3), 1.0))
    q.processAllAvailable()
    ms.addData(Event(1L, ts(30), 5.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.sql(
      "SELECT user_id, n_events, total_value FROM sess_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sessions.toSeq === Seq((1L, 3L, 3.0)))
  }

  test("dedupStream drops duplicate fingerprints within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    // fingerprint = value (stands in for a content hash)
    val q = Streaming.dedupStream(ms.toDF(), "ts", "value",
      watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    ms.addData(Event(1L, ts(1), 7.0), Event(2L, ts(2), 7.0),  // dup content
      Event(3L, ts(3), 8.0))
    q.processAllAvailable()
    ms.addData(Event(4L, ts(5), 7.0)) // still within watermark → dropped
    q.processAllAvailable()
    q.stop()
    val vals = spark.sql("SELECT value FROM dedup_out ORDER BY value")
      .collect().map(_.getDouble(0))
    assert(vals.toSeq === Seq(7.0, 8.0))
  }

  test("sessionWindowAgg streaming: watermark closes gap sessions (event time)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streaming.sessionWindowAgg(ms.toDF(), "ts", "user_id", "value",
      gap = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    // session: 10:01, 10:02 (extends to 10:12 exclusive)
    ms.addData(Event(1L, ts(1), 1.0), Event(1L, ts(2), 2.0))
    q.processAllAvailable()
    // event at 10:40 → watermark 10:35 > 10:12 → session finalized;
    // event-time semantics, no wall-clock involved
    ms.addData(Event(1L, ts(40), 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT user_id, n_events, total_value FROM sw_out ORDER BY session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // only the closed session is emitted; the 10:40 one is still open
    assert(rows.toSeq === Seq((1L, 2L, 3.0)))
  }

  test("session_window agrees with the lag-gap sessionizer on real events") {
    // two independent formulations of gap sessions must produce the
    // same (user, session_start, n, total) sets over the events table.
    // NB session_window closes a session gap AFTER the last event (an
    // event at t extends the window to t+gap, exclusive), while the
    // lag-gap form starts a new session when delta > gap — identical
    // boundaries for delta != gap exactly, and the testdata has no
    // exact-gap deltas (verified by equality here).
    val ev = graft.Tables.eventsWithTs(spark, sf("sf0.001"))
    val gapMs = 30 * 60 * 1000L
    val a = Streaming.sessionWindowAgg(ev, "ts", "user_id", "value",
      gap = "30 minutes")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        math.round(r.getDouble(3) * 100)))
      .toSet
    val b = Streaming.sessionizeBatch(ev, "user_id", "ts", "value", gapMs)
      .select("user_id", "session_start", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        math.round(r.getDouble(3) * 100)))
      .toSet
    assert(a === b)
  }

  test("intervalJoinStreams: matches within the interval, misses outside") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    // identical schemas on both sides — the operator auto-renames every
    // colliding right column with an _r suffix
    val joined = Streaming.intervalJoinStreams(
      clicks.toDF(), buys.toDF(),
      key = "user_id", leftTs = "ts", rightTs = "ts",
      within = "2 minutes", watermark = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    clicks.addData(Event(1L, ts(1), 1.0), Event(2L, ts(5), 2.0))
    buys.addData(
      Event(1L, ts(2), 10.0),  // 1 min after click  → match
      Event(1L, ts(10), 20.0), // 9 min after click  → outside interval
      Event(2L, ts(6), 30.0))  // 1 min after click  → match
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT user_id, value, value_r FROM ssj_out ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, 1.0, 10.0), (2L, 2.0, 30.0)))
  }

  test("intervalJoinStreams left_outer: unmatched lefts emit once the watermark proves them") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = Streaming.intervalJoinStreams(
      clicks.toDF(), buys.toDF(),
      key = "user_id", leftTs = "ts", rightTs = "ts",
      within = "2 minutes", watermark = "5 minutes",
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer_out")
      .outputMode("append").start()
    clicks.addData(Event(1L, ts(1), 1.0), Event(2L, ts(2), 2.0))
    buys.addData(Event(2L, ts(3), 30.0)) // match for u2; u1 has no buy
    q.processAllAvailable()
    // the unmatched u1 row may only emit after the watermark passes
    // ts(1) + within + watermark on both streams — push it, then run
    // one more batch so eviction fires
    clicks.addData(Event(9L, ts(60), 0.0))
    buys.addData(Event(9L, ts(60), 0.0))
    q.processAllAvailable()
    clicks.addData(Event(9L, ts(61), 0.0))
    buys.addData(Event(9L, ts(61), 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT user_id, value, value_r FROM ssj_outer_out WHERE user_id < 9")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows.contains((2L, 2.0, Some(30.0))), rows)
    assert(rows.contains((1L, 1.0, None)),
      s"unmatched left row must surface with null right side: $rows")
  }

  test("intervalJoinStreams: a right stream already carrying _r names stays unambiguous") {
    // "value" collides and would rename to "value_r" — but the right
    // stream ALREADY has a value_r column, so the operator must probe
    // for a free suffix instead of emitting two value_r columns
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double, Double)]
    val joined = Streaming.intervalJoinStreams(
      clicks.toDF(),
      buys.toDF().toDF("user_id", "ts", "value", "value_r"),
      key = "user_id", leftTs = "ts", rightTs = "ts",
      within = "2 minutes", watermark = "5 minutes")
    assert(joined.columns.distinct.length === joined.columns.length,
      s"duplicate output columns: ${joined.columns.mkString(",")}")
    val q = joined.writeStream.format("memory").queryName("ssj_sfx_out")
      .outputMode("append").start()
    clicks.addData(Event(1L, ts(1), 1.0))
    buys.addData((1L, ts(2), 10.0, 99.0))
    q.processAllAvailable(); q.stop()
    val row = spark.sql(
      "SELECT user_id, value, value_r, value_r2, ts_r2 FROM ssj_sfx_out")
      .collect()
    assert(row.length === 1)
    assert((row(0).getLong(0), row(0).getDouble(1), row(0).getDouble(2),
      row(0).getDouble(3)) === ((1L, 1.0, 99.0, 10.0)))
  }

  test("intervalJoinStreams agrees with the batch interval join") {
    // the streaming operator is the incremental twin of a plain
    // conditioned join; on a closed dataset the two must agree
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val l = (1 to 30).map(i => Event(i % 3L, ts(i), i.toDouble))
    val r = (1 to 30).map(i => Event(i % 3L, ts((i * 7) % 45), i * 10.0))
    val lms = MemoryStream[Event]
    val rms = MemoryStream[Event]
    val joined = Streaming.intervalJoinStreams(
      lms.toDF(),
      rms.toDF().withColumnRenamed("ts", "r_ts")
        .withColumnRenamed("value", "r_value"),
      key = "user_id", leftTs = "ts", rightTs = "r_ts",
      within = "3 minutes", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_eq_out")
      .outputMode("append").start()
    lms.addData(l: _*); rms.addData(r: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
      "SELECT user_id, value, r_value FROM ssj_eq_out")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
      .toSet
    val batch = l.toDF().join(
      r.toDF().withColumnRenamed("ts", "r_ts")
        .withColumnRenamed("value", "r_value")
        .withColumnRenamed("user_id", "uid_r"),
      $"user_id" === $"uid_r" &&
        $"r_ts" >= $"ts" - org.apache.spark.sql.functions.expr("INTERVAL 3 minutes") &&
        $"r_ts" <= $"ts" + org.apache.spark.sql.functions.expr("INTERVAL 3 minutes"))
      .select("user_id", "value", "r_value")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
      .toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("observedStream: per-micro-batch metrics surface in query progress") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val observed = graft.operators.Metrics.observedStream(
      ms.toDF(), "batch_stats",
      count(lit(1)).as("rows"), sum(col("value")).as("total"))
    val q = observed.writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    ms.addData(Event(1L, ts(1), 1.5), Event(2L, ts(2), 2.5))
    q.processAllAvailable()
    val m = q.lastProgress.observedMetrics.get("batch_stats")
    q.stop()
    assert(m != null, "no observed metrics in progress")
    assert(m.getAs[Long]("rows") === 2L)
    assert(m.getAs[Double]("total") === 4.0)
  }

  test("exactlyOnceFileSink: batches land in batch dirs; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-eos").toString
    val ms = MemoryStream[Event]
    val q = Streaming.exactlyOnceFileSink(ms.toDF(), dir)
      .option("checkpointLocation", s"$dir-ckpt").start()
    ms.addData(Event(1L, ts(1), 1.0), Event(2L, ts(2), 2.0))
    q.processAllAvailable(); q.stop()
    val once = spark.read.parquet(dir)
    assert(once.count() === 2)
    // replay the same batch id (what a post-failure restart does):
    // output must be REPLACED, not appended
    val replay = Seq(Event(1L, ts(1), 1.0), Event(2L, ts(2), 2.0)).toDF()
    Streaming.writeBatch(replay, dir, "parquet", batchId = 0L)
    assert(spark.read.parquet(dir).count() === 2)
  }

  test("dedupIngest: per-batch new×new + new×old pairs; idempotent replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-corpus").toString
    val pairsDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-pairs").toString
    // 3-gram shingles: 1 = {abc,bcd,cde,def}, 2 = {abc,bcd,cde,deg}
    // → J(1,2) = 3/5 = 0.6; 4 = {abc,bcd,cde,def,efh} → J(1,4) = 0.8,
    // J(2,4) = 3/6 = 0.5; 3 shares nothing
    val ms = MemoryStream[(Long, String)]
    // a SHARED checkpoint across the two starts is load-bearing: without
    // it each start() makes a fresh temp checkpoint, the MemoryStream
    // replays from scratch, and the second run re-processes docs 1-3 as
    // a new batch 0 instead of resuming at batch 1 with doc 4 only
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-ckpt").toString
    val writer = Streaming.dedupIngest(
      ms.toDF().toDF("doc_id", "text"), corpusDir, pairsDir,
      "doc_id", "text", n = 3, threshold = 0.5)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    ms.addData((1L, "a b c d e f"), (2L, "a b c d e g"),
      (3L, "x y z w q r"))
    val q1 = writer.start(); q1.processAllAvailable(); q1.stop()
    ms.addData((4L, "a b c d e f h"))
    val q2 = writer.start(); q2.processAllAvailable(); q2.stop()

    def pairsOf(batch: Long): Set[(Long, Long)] =
      spark.read.option("basePath", pairsDir).parquet(pairsDir)
        .filter(col("batch_id") === batch)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 0: the within-batch pair only
    assert(pairsOf(0) === Set((1L, 2L)))
    // batch 1: pairs TOUCHING the new batch — and (1,2) NOT re-reported
    assert(pairsOf(1) === Set((1L, 4L), (2L, 4L)))
    // corpus accumulated both slices
    assert(spark.read.parquet(corpusDir).count() === 4)

    // replay batch 1 (post-failure restart): its own half-written slice
    // is excluded from the "old" side, output replaced not appended
    Streaming.ingestDedupBatch(
      Seq((4L, "a b c d e f h")).toDF("doc_id", "text"), 1L,
      corpusDir, pairsDir, "doc_id", "text", n = 3, threshold = 0.5)
    assert(pairsOf(1) === Set((1L, 4L), (2L, 4L)))
    assert(spark.read.parquet(corpusDir).count() === 4)
  }

  test("clusterIngest: label deltas fold to the full-recompute " +
      "labeling; deltas stay batch-bounded; replay idempotent; " +
      "compaction supersedes") {
    import spark.implicits._
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-clu-corpus").toString
    val pairsDir = java.nio.file.Files
      .createTempDirectory("graft-clu-pairs").toString
    val labelsDir = java.nio.file.Files
      .createTempDirectory("graft-clu-labels").toString
    def step(batchId: Long, docs: Seq[(Long, String)]): Unit =
      Streaming.clusterIngestBatch(docs.toDF("doc_id", "text"), batchId,
        corpusDir, pairsDir, labelsDir, "doc_id", "text",
        n = 3, threshold = 0.4, compactEvery = 2)
    def labels(): Map[Long, Long] =
      Streaming.clusterLabels(spark, labelsDir,
          org.apache.spark.sql.types.LongType)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch 0: two separate near-dup families (J = 0.6 within each)
    step(0L, Seq((1L, "a b c d e f"), (2L, "a b c d e g"),
      (10L, "p q r s t u"), (11L, "p q r s t v")))
    assert(labels() === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    // batch 1: doc 5 bridges BOTH families at J = 0.4 — the two old
    // components must merge through label contraction
    step(1L, Seq((5L, "a b c d e f p q r s t u")))
    assert(labels() ===
      Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L))
    // the delta slice is BOUNDED by what changed: docs 1/2 (label
    // already 1) are not rewritten
    val slice1 = spark.read
      .option("basePath", labelsDir).parquet(s"$labelsDir/batch_id=1")
      .collect().map(_.getLong(0)).toSet
    assert(slice1 === Set(5L, 10L, 11L))
    // batch 2 (a compaction batch): a fresh family + an isolated doc
    // (absent from the labeling — singleton convention)
    step(2L, Seq((20L, "m n o w x y"), (21L, "m n o w x z"),
      (30L, "j k l i h g")))
    val after2 = labels()
    assert(after2 === Map(1L -> 1L, 2L -> 1L, 5L -> 1L,
      10L -> 1L, 11L -> 1L, 20L -> 20L, 21L -> 20L))
    // full-recompute parity over the accumulated pair store
    val allPairs = spark.read.option("basePath", pairsDir)
      .parquet(pairsDir).select("a_id", "b_id")
    val full = graft.operators.ConnectedComponents(
        allPairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after2 === full)
    // replay batch 1 (restart): labeling unchanged
    Streaming.clusterIngestBatch(
      Seq((5L, "a b c d e f p q r s t u")).toDF("doc_id", "text"), 1L,
      corpusDir, pairsDir, labelsDir, "doc_id", "text",
      n = 3, threshold = 0.4, compactEvery = 2)
    assert(labels() === after2)
  }

  test("volumeMonitorBatch: batch 0 emits NULL stats; later batches " +
      "score against the accumulated store; replay idempotent") {
    import spark.implicits._
    val H = 3600000L
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-vm-store").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-vm-out").toString
    // batch 0: 5 steady hours of 10 events each
    val b0 = (0 until 5).flatMap(h => (1 to 10).map(_ => h * H + 1L))
    Streaming.volumeMonitorBatch(b0.toDF("ms"), 0L, storeDir, outDir, "ms")
    val out0 = spark.read.option("basePath", outDir).parquet(outDir)
      .filter(col("batch_id") === 0).collect()
    assert(out0.length === 5 && out0.forall(_.isNullAt(2)))
    // batch 1: one steady hour, one 100-event burst. Prior med2 = 20,
    // mad4 = 0 — the burst flags (360 > 0), the steady hour does not
    // (0 > 0 is false)
    val b1 = (1 to 10).map(_ => 10L * H + 1L) ++
      (1 to 100).map(_ => 11L * H + 1L)
    def run1(): Map[Long, (Long, Long, Boolean)] = {
      Streaming.volumeMonitorBatch(b1.toDF("ms"), 1L, storeDir, outDir, "ms")
      spark.read.option("basePath", outDir).parquet(outDir)
        .filter(col("batch_id") === 1).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    }
    val got = run1()
    assert(got === Map(10L -> ((20L, 0L, false)), 11L -> ((20L, 0L, true))))
    // replay (restart after an unflushed batch): identical output
    assert(run1() === got)
  }

  test("ingestDedupBatch: batch 0 succeeds against a pre-created EMPTY corpus dir") {
    import spark.implicits._
    // a provisioned-but-empty corpus path (mkdir -p in a deploy script,
    // an object-store dir marker) must read as an empty corpus, not die
    // in schema inference
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-empty-corpus").toString
    val pairsDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-empty-pairs").toString
    Streaming.ingestDedupBatch(
      Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text"),
      0L, corpusDir, pairsDir, "doc_id", "text", n = 3, threshold = 0.5)
    val pairs = spark.read.option("basePath", pairsDir).parquet(pairsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    assert(spark.read.parquet(corpusDir).count() === 2)
  }

  test("dedupIngest: query killed after an unflushed batch — restart " +
      "re-delivers it and converges to the uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (corpusDir, pairsDir, ckptDir) =
      (tmp("graft-crash-corpus"), tmp("graft-crash-pairs"),
        tmp("graft-crash-ckpt"))
    val b0 = Seq((1L, "a b c d e f"), (2L, "a b c d e g"),
      (3L, "x y z w q r"))
    val b1 = Seq((4L, "a b c d e f h"))
    val b2 = Seq((5L, "a b c d e f j"))
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.dedupIngest(
      ms.toDF().toDF("doc_id", "text"), corpusDir, pairsDir,
      "doc_id", "text", n = 3, threshold = 0.5)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    ms.addData(b0: _*); runOnce()
    ms.addData(b1: _*); runOnce()
    // simulate a crash DURING batch 1, after some sink writes but
    // before the checkpoint commit: remove the commit marker (Spark's
    // own "batch ran but never committed" state) and leave the batch's
    // output slices HALF-WRITTEN — a partial corpus slice, a partial
    // shingle-index slice, and an empty pairs slice
    val commit1 = new java.io.File(s"$ckptDir/commits/1")
    assert(commit1.exists, "expected a commit marker for batch 1")
    assert(commit1.delete())
    // the local ChecksumFs keeps a .crc sidecar per file; a real crash
    // would have written neither — remove it too or the re-commit's
    // rename trips over the stale checksum
    new java.io.File(s"$ckptDir/commits/.1.crc").delete()
    Streaming.writeBatch(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      corpusDir, "parquet", 1L)
    Streaming.writeBatch(
      Seq((4L, 99L)).toDF("id", "k"), s"$corpusDir/_shingle_index",
      "parquet", 1L)
    Streaming.writeBatch(
      spark.read.option("basePath", pairsDir).parquet(pairsDir)
        .filter(col("batch_id") === 0).drop("batch_id").limit(0),
      pairsDir, "parquet", 1L)
    // restart from the checkpoint: Spark itself re-delivers the
    // uncommitted batch 1 through the real foreachBatch, whose
    // overwrite-slice protocol must repair every half-written output
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/1").exists,
      "restart must have re-run and committed batch 1")
    // then the stream continues normally
    ms.addData(b2: _*); runOnce()

    // uninterrupted reference: the same three batches replayed directly
    val (refCorpus, refPairs) =
      (tmp("graft-crash-refc"), tmp("graft-crash-refp"))
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.ingestDedupBatch(rows.toDF("doc_id", "text"), id,
        refCorpus, refPairs, "doc_id", "text", n = 3, threshold = 0.5)
    }
    def pairsSet(dir: String): Set[(Long, Long, Long)] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("a_id"), col("b_id"), col("batch_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    def corpusSet(dir: String): Set[(Long, String, Long)] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("doc_id"), col("text"), col("batch_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    assert(pairsSet(pairsDir) === pairsSet(refPairs))
    assert(corpusSet(corpusDir) === corpusSet(refCorpus))
  }

  test("dedupIngest: crash AT a compaction batch — restart replays the " +
      "compaction idempotently through Spark's own recovery") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (corpusDir, pairsDir, ckptDir) =
      (tmp("graft-ccrash-corpus"), tmp("graft-ccrash-pairs"),
        tmp("graft-ccrash-ckpt"))
    def text(b: Long) = (b to b + 9).map(i => s"tok$i").mkString(" ")
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.dedupIngest(
      ms.toDF().toDF("doc_id", "text"), corpusDir, pairsDir,
      "doc_id", "text", n = 3, threshold = 0.5, compactEvery = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    (0L to 2L).foreach { b => ms.addData((b, text(b))); runOnce() }
    // batch 2 ran the compaction (compactEvery=2): boundary committed,
    // slices 0-1 absorbed. Crash "after the work, before the commit":
    // Spark must re-deliver batch 2, whose foreachBatch re-runs
    // compact() — the marker-committed base makes the replay a no-op
    // GC retry, and the slice overwrites repair the outputs
    assert(IngestStore.boundary(spark, corpusDir) === 2L)
    val commit2 = new java.io.File(s"$ckptDir/commits/2")
    assert(commit2.exists && commit2.delete())
    new java.io.File(s"$ckptDir/commits/.2.crc").delete()
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/2").exists)
    // continue past the crash point, then compare with an uninterrupted
    // run: content (pairs + corpus) must be identical
    ms.addData((3L, text(3))); runOnce()
    val (refC, refP) = (tmp("graft-ccrash-refc"), tmp("graft-ccrash-refp"))
    (0L to 3L).foreach { b =>
      Streaming.ingestDedupBatch(Seq((b, text(b))).toDF("doc_id", "text"),
        b, refC, refP, "doc_id", "text", n = 3, threshold = 0.5,
        compactEvery = 2)
    }
    def pairs(dir: String): Set[(Long, Long, Long)] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("a_id"), col("b_id"), col("batch_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(pairs(pairsDir) === pairs(refP))
    assert(IngestStore.readStore(spark, corpusDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(0L, 1L, 2L, 3L))
    assert(IngestStore.boundary(spark, corpusDir) === 2L)
  }

  test("clusterIngest: crash AT a labels-compaction batch — Spark's " +
      "own recovery re-delivers it and the labeling equals the " +
      "uninterrupted run bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (corpusDir, pairsDir, labelsDir, ckptDir) =
      (tmp("graft-clucrash-corpus"), tmp("graft-clucrash-pairs"),
        tmp("graft-clucrash-labels"), tmp("graft-clucrash-ckpt"))
    // b0: two separate families; b1: a bridge doc merges them (the
    // delta rewrites 10/11); b2 (the compactEvery=2 boundary): a fresh
    // family — the compaction absorbs slices 0-1 of corpus, index AND
    // labels; b3: a second bridge touching the merged family after the
    // crash point
    val b0 = Seq((1L, "a b c d e f"), (2L, "a b c d e g"),
      (10L, "p q r s t u"), (11L, "p q r s t v"))
    val b1 = Seq((5L, "a b c d e f p q r s t u"))
    val b2 = Seq((20L, "m n o w x y"), (21L, "m n o w x z"))
    val b3 = Seq((6L, "a b c d e g p q r s t v"))
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.clusterIngest(
      ms.toDF().toDF("doc_id", "text"), corpusDir, pairsDir, labelsDir,
      "doc_id", "text", n = 3, threshold = 0.4, compactEvery = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    ms.addData(b0: _*); runOnce()
    ms.addData(b1: _*); runOnce()
    ms.addData(b2: _*); runOnce()
    // batch 2 ran the labels compaction (slices 0-1 absorbed into the
    // marker-committed base). Crash "after the work, before the
    // commit": delete the commit marker and leave the labels slice
    // HALF-WRITTEN (empty) — Spark must re-deliver batch 2, whose
    // foreachBatch re-runs the compaction as a no-op GC retry and the
    // slice overwrite repairs the labels output
    assert(IngestStore.boundary(spark, labelsDir) === 2L)
    val commit2 = new java.io.File(s"$ckptDir/commits/2")
    assert(commit2.exists && commit2.delete())
    new java.io.File(s"$ckptDir/commits/.2.crc").delete()
    Streaming.writeBatch(Seq.empty[(Long, Long)].toDF("id", "component"),
      labelsDir, "parquet", 2L)
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/2").exists,
      "restart must have re-run and committed batch 2")
    ms.addData(b3: _*); runOnce()

    // uninterrupted reference: the same four batches replayed directly
    val (refC, refP, refL) = (tmp("graft-clucrash-refc"),
      tmp("graft-clucrash-refp"), tmp("graft-clucrash-refl"))
    Seq((b0, 0L), (b1, 1L), (b2, 2L), (b3, 3L)).foreach { case (rows, id) =>
      Streaming.clusterIngestBatch(rows.toDF("doc_id", "text"), id,
        refC, refP, refL, "doc_id", "text", n = 3, threshold = 0.4,
        compactEvery = 2)
    }
    def labels(dir: String): Map[Long, Long] =
      Streaming.clusterLabels(spark, dir,
          org.apache.spark.sql.types.LongType)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(labelsDir) === labels(refL))
    // the recovered labeling also equals the full recompute over the
    // accumulated pair store (one merged family + the fresh one)
    val full = graft.operators.ConnectedComponents(
        spark.read.option("basePath", pairsDir).parquet(pairsDir)
          .select("a_id", "b_id"), "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(labelsDir) === full)
    assert(labels(labelsDir) === Map(1L -> 1L, 2L -> 1L, 5L -> 1L,
      6L -> 1L, 10L -> 1L, 11L -> 1L, 20L -> 20L, 21L -> 20L))
    assert(IngestStore.boundary(spark, labelsDir) === 2L)
  }

  test("volumeMonitor: query killed AT a reduce-compaction batch — " +
      "restart re-delivers through the checkpoint and the scores " +
      "equal the uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val H = 3600000L
    val (storeDir, outDir, ckptDir) =
      (tmp("graft-vmcrash-store"), tmp("graft-vmcrash-out"),
        tmp("graft-vmcrash-ckpt"))
    val b0 = (0 until 5).flatMap(h => (1 to 10).map(_ => h * H + 1L))
    val b1 = (1 to 10).map(_ => 10L * H + 1L)
    val b2 = (1 to 100).map(_ => 11L * H + 1L) // burst, compaction batch
    val b3 = (1 to 10).map(_ => 12L * H + 1L)
    val ms = MemoryStream[Long]
    val writer = Streaming.volumeMonitor(
      ms.toDF().toDF("ms"), storeDir, outDir, "ms", compactEvery = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    ms.addData(b0: _*); runOnce()
    ms.addData(b1: _*); runOnce()
    ms.addData(b2: _*); runOnce()
    // batch 2 ran the counts-store REDUCE compaction (hour rows of
    // slices 0-1 sum-merged into the base). Crash before the commit:
    // the marker-committed base makes the re-delivered compaction a
    // no-op retry, and the half-written score slice is overwritten
    val commit2 = new java.io.File(s"$ckptDir/commits/2")
    assert(commit2.exists && commit2.delete())
    new java.io.File(s"$ckptDir/commits/.2.crc").delete()
    Streaming.writeBatch(
      spark.read.option("basePath", outDir).parquet(outDir)
        .filter(col("batch_id") === 0).drop("batch_id").limit(0),
      outDir, "parquet", 2L)
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/2").exists,
      "restart must have re-run and committed batch 2")
    ms.addData(b3: _*); runOnce()

    // uninterrupted reference via direct batch replays
    val (refStore, refOut) =
      (tmp("graft-vmcrash-refstore"), tmp("graft-vmcrash-refout"))
    Seq((b0, 0L), (b1, 1L), (b2, 2L), (b3, 3L)).foreach { case (rows, id) =>
      Streaming.volumeMonitorBatch(rows.toDF("ms"), id, refStore, refOut,
        "ms", compactEvery = 2)
    }
    def scores(dir: String): Set[(Long, Long, Long, Option[(Long, Long, Boolean)])] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("batch_id").cast("long"), col("hour"),
          col("n_events"), col("med2"), col("mad4"), col("anomaly"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None
          else Some((r.getLong(3), r.getLong(4), r.getBoolean(5))))).toSet
    assert(scores(outDir) === scores(refOut))
    // the burst batch flagged against the 10-events/hour prior
    assert(scores(outDir).contains((2L, 11L, 100L, Some((20L, 0L, true)))))
    // store content identical after recovery (per-hour sums)
    def hours(dir: String): Map[Long, Long] =
      IngestStore.readStore(spark, dir)
        .groupBy(col("hour")).agg(sum(col("n")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hours(storeDir) === hours(refStore))
  }

  test("prepIngest: query killed after an unflushed batch — restart " +
      "re-delivers it and converges to the uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (accDir, ckptDir) = (tmp("graft-pcrash-acc"), tmp("graft-pcrash-ckpt"))
    val b0 = Seq((1L, "alpha beta gamma delta"), (2L, "too short"))
    val b1 = Seq((4L, "alpha beta gamma delta"), // dup of stored fp
      (5L, "epsilon zeta eta theta"))
    val b2 = Seq((6L, "epsilon zeta eta theta"), // dup of batch-1 doc
      (7L, "iota kappa lambda mu"))
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.prepIngest(
      ms.toDF().toDF("doc_id", "text"), accDir, "doc_id", "text",
      minTokens = 3L)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    ms.addData(b0: _*); runOnce()
    ms.addData(b1: _*); runOnce()
    // crash during batch 1 AFTER the slice and bloom-sidecar writes but
    // before the checkpoint commit (the hardest replay: the sidecar for
    // the dying batch already exists and must not double-admit or wedge
    // the rerun) — then corrupt the slice down to a half-written subset
    val commit1 = new java.io.File(s"$ckptDir/commits/1")
    assert(commit1.exists && commit1.delete())
    new java.io.File(s"$ckptDir/commits/.1.crc").delete()
    val half = spark.read.option("basePath", accDir).parquet(accDir)
      .filter(col("batch_id") === 1).drop("batch_id").limit(0)
    Streaming.writeBatch(half, accDir, "parquet", 1L)
    // restart: Spark re-delivers batch 1; then continue with batch 2
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/1").exists,
      "restart must have re-run and committed batch 1")
    ms.addData(b2: _*); runOnce()

    // uninterrupted reference
    val refDir = tmp("graft-pcrash-ref")
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.prepIngestBatch(rows.toDF("doc_id", "text"), id,
        refDir, "doc_id", "text", minTokens = 3L)
    }
    def accepted(dir: String): Set[(Long, Long)] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("doc_id"), col("batch_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(accepted(accDir) === accepted(refDir))
    assert(accepted(accDir) === Set((1L, 0L), (5L, 1L), (7L, 2L)))
  }

  test("indexIngest: postings accumulate per batch, a replayed batch " +
      "is idempotent, and bm25FromIndex equals the whole-corpus batch " +
      "retrieval") {
    import spark.implicits._
    import graft.operators.TextStats
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val idxDir = tmp("graft-idx")
    val b0 = Seq((1L, "spark query engine fast"),
      (2L, "query query plan slow engine"))
    val b1 = Seq((3L, "vector index search"), (4L, "fast fast query"))
    Streaming.indexIngestBatch(b0.toDF("doc_id", "text"), 0L, idxDir,
      "doc_id", "text")
    Streaming.indexIngestBatch(b1.toDF("doc_id", "text"), 1L, idxDir,
      "doc_id", "text")
    def store(): Set[(Long, String, Long, Long)] =
      spark.read.option("basePath", idxDir).parquet(idxDir)
        .select(col("doc"), col("token"), col("tf"), col("len"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
    val once = store()
    // replay batch 1 (a re-delivered micro-batch): bit-identical store
    Streaming.indexIngestBatch(b1.toDF("doc_id", "text"), 1L, idxDir,
      "doc_id", "text")
    assert(store() === once)
    // the accumulated store scores exactly like the batch operator
    val corpus = (b0 ++ b1).toDF("doc_id", "text")
    val qs = Seq((10L, "query engine"), (20L, "fast plan"))
      .toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(
      rows(Streaming.bm25FromIndex(spark, idxDir, qs, "qid", "qtext", 3,
          maxDocFreq = None))
        === rows(TextStats.bm25TopK(corpus, "doc_id", "text", qs,
          "qid", "qtext", 3)))
  }

  test("indexIngest: a NULL-text re-ingest TOMBSTONES the doc — the " +
      "stale postings fall at compaction and retrieval unindexes it, " +
      "matching the batch operator on the latest corpus") {
    import spark.implicits._
    import graft.operators.TextStats
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val idxDir = tmp("graft-idx-tomb")
    val b0 = Seq((1L, "secret text"), (2L, "other words"))
    val b1 = Seq((1L, null.asInstanceOf[String])) // redaction re-ingest
    val b2 = Seq((3L, "closing batch"))           // triggers compaction
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        idxDir, "doc_id", "text", compactEvery = 2)
    }
    // post-compaction store: the purge completed the erasure — doc 1
    // left ZERO physical rows (stale postings superseded, then the
    // tombstone itself dropped from the base); a raw scan over every
    // file in the store proves the bytes are gone, not just filtered
    val doc1 = spark.read.option("basePath", idxDir).parquet(idxDir)
      .filter(col("doc") === 1L)
      .select(col("token")).collect().map(r => Option(r.getString(0)))
    assert(doc1.toSeq === Seq.empty)
    // retrieval: the redacted doc is gone; everything else matches the
    // batch operator over the LATEST corpus (doc 1 now null)
    val latest = Seq((1L, null.asInstanceOf[String]),
      (2L, "other words"), (3L, "closing batch")).toDF("doc_id", "text")
    val qs = Seq((9L, "secret"), (10L, "other closing"))
      .toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val fromStore =
      Streaming.bm25FromIndex(spark, idxDir, qs, "qid", "qtext", 3,
        maxDocFreq = None)
    assert(!rows(fromStore).exists(_._3 == 1L))
    assert(rows(fromStore) === rows(TextStats.bm25TopK(
      latest, "doc_id", "text", qs, "qid", "qtext", 3)))
  }

  test("indexIngest purge lifecycle: an erased doc can be legitimately " +
      "RE-INGESTED after its purge (a fresh id, not a resurrection), " +
      "a second compaction folds it into the base, and the stats " +
      "sidecar + retrieval agree with the batch operator at every " +
      "step") {
    import spark.implicits._
    import graft.operators.TextStats
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val idxDir = tmp("graft-idx-purge-life")
    val b0 = Seq((1L, "alpha beta"), (2L, "gamma delta"))
    val b1 = Seq((1L, null.asInstanceOf[String])) // redact doc 1
    val b2 = Seq((3L, "epsilon zeta"))  // compaction: purge doc 1
    val b3 = Seq((1L, "alpha reborn"))  // re-ingest AFTER the purge
    val b4 = Seq((4L, "eta theta"))     // second compaction folds b3
    Seq((b0, 0L), (b1, 1L), (b2, 2L), (b3, 3L), (b4, 4L))
      .foreach { case (rows, id) =>
        Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
          idxDir, "doc_id", "text", compactEvery = 2)
      }
    assert(IngestStore.boundary(spark, idxDir) === 4L)
    // the base holds the REBORN version (true batch id 3) and no
    // tombstone anywhere in the store
    val raw = spark.read.option("basePath", idxDir).parquet(idxDir)
    assert(raw.filter(col("token").isNull).count() === 0L)
    assert(raw.filter(col("doc") === 1L)
      .select(col("token")).collect().map(_.getString(0)).toSet ===
      Set("alpha", "reborn"))
    // retrieval equals the batch operator over the latest corpus
    val latest = Seq((1L, "alpha reborn"), (2L, "gamma delta"),
      (3L, "epsilon zeta"), (4L, "eta theta")).toDF("doc_id", "text")
    val qs = Seq((9L, "alpha"), (8L, "gamma eta")).toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(rows(Streaming.bm25FromIndex(spark, idxDir, qs,
      "qid", "qtext", k = 5, maxDocFreq = None)) ===
      rows(TextStats.bm25TopK(latest, "doc_id", "text",
        qs, "qid", "qtext", k = 5)))
  }

  test("indexEraseNow/embEraseNow: deadline-driven erasure folds the " +
      "store NOW — bit-identical to a cadence compaction landing at " +
      "the same frontier, stats sidecar covered, replay a no-op, " +
      "redacted bytes physically gone") {
    import spark.implicits._
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val b0 = Seq((1L, "secret alpha"), (2L, "beta gamma"))
    val b1 = Seq((1L, null.asInstanceOf[String])) // redact doc 1
    val b2 = Seq((3L, "delta epsilon"))
    // erase-now store: cadence disabled, erasure forced between
    // batches 1 and 2 (the deadline moment)
    val nowDir = tmp("graft-erase-now")
    Streaming.indexIngestBatch(b0.toDF("doc_id", "text"), 0L, nowDir,
      "doc_id", "text", compactEvery = 0)
    Streaming.indexIngestBatch(b1.toDF("doc_id", "text"), 1L, nowDir,
      "doc_id", "text", compactEvery = 0)
    assert(Streaming.indexEraseNow(spark, nowDir))
    assert(!Streaming.indexEraseNow(spark, nowDir)) // replay no-op
    Streaming.indexIngestBatch(b2.toDF("doc_id", "text"), 2L, nowDir,
      "doc_id", "text", compactEvery = 0)
    // cadence reference: compactEvery=2 lands the fold at the same
    // upTo=2 frontier
    val refDir = tmp("graft-erase-ref")
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        refDir, "doc_id", "text", compactEvery = 2)
    }
    val pSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("len",
        org.apache.spark.sql.types.LongType)))
    def store(dir: String) =
      IngestStore.read(spark, dir, pSchema).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    assert(IngestStore.boundary(spark, nowDir) === 2L)
    assert(store(nowDir) === store(refDir))
    // redacted bytes physically gone; sidecar covers the boundary
    assert(spark.read.option("basePath", nowDir).parquet(nowDir)
      .filter(col("doc") === 1L).count() === 0L)
    assert(scala.io.Source.fromFile(s"$nowDir/_stats_committed")
      .mkString.trim === "2")
    // embEraseNow: same contract on the embedding store
    val embDir = tmp("graft-erase-emb")
    Streaming.embIngestBatch(Seq((1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 1.0))).toDF("vec_id", "embedding"), 0L, embDir,
      "vec_id", "embedding", nCells = 2, compactEvery = 0)
    Streaming.embIngestBatch(
      Seq((1L, null.asInstanceOf[Seq[Double]]))
        .toDF("vec_id", "embedding"), 1L, embDir,
      "vec_id", "embedding", nCells = 2, compactEvery = 0)
    assert(Streaming.embEraseNow(spark, embDir))
    assert(!Streaming.embEraseNow(spark, embDir))
    assert(spark.read.option("basePath", embDir).parquet(embDir)
      .filter(col("vec") === 1L).count() === 0L)
    val got = Streaming.annFromStore(spark, embDir,
        Seq((9L, Seq(1.0, 0.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, nProbe = 2)
      .collect().map(_.getLong(2)).toSet
    assert(got === Set(2L))
  }

  test("snapshotIndexStore/snapshotEmbStore: the export answers the " +
      "pinned moment bit-identically, KEEPS answering after the " +
      "source compacts past it (readAsOf there now refuses), " +
      "preserves the emb model, purges tombstones, and refuses a " +
      "non-empty target") {
    import spark.implicits._
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("graft-snap-src")
    val b0 = Seq((2L, "alpha beta"), (4L, "gamma delta"))
    val b1 = Seq((1L, "alpha zeta"), (3L, "beta eta"))
    val b2 = Seq((2L, null.asInstanceOf[String])) // redact an even
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        src, "doc_id", "text", compactEvery = 0)
    }
    val qs = Seq((9L, "alpha beta"), (8L, "gamma zeta"))
      .toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val pinned = rows(Streaming.bm25FromIndex(spark, src, qs,
      "qid", "qtext", k = 5, maxDocFreq = None, asOf = Some(0L)))
    val snap = tmp("graft-snap-dst")
    Streaming.snapshotIndexStore(spark, src, snap, asOf = 0L)
    // the export IS the pinned moment — no asOf needed, sidecar
    // covers its boundary, horizon collapses to the frozen instant
    assert(rows(Streaming.bm25FromIndex(spark, snap, qs,
      "qid", "qtext", k = 5, maxDocFreq = None)) === pinned)
    assert(IngestStore.asOfHorizon(spark, snap) === Some((0L, 0L)))
    assert(scala.io.Source.fromFile(s"$snap/_stats_committed")
      .mkString.trim === "1")
    // a torn/re-run export refuses a non-empty target
    val e = intercept[IllegalArgumentException] {
      Streaming.snapshotIndexStore(spark, src, snap, asOf = 0L)
    }
    assert(e.getMessage.contains("not empty"))
    // ...EXCEPT the one healable torn state: base committed, stats
    // sidecar never written (crash between the two) — a re-run
    // completes the sidecar instead of refusing, and the healed
    // export serves identically to the uninterrupted one
    val torn = tmp("graft-snap-torn")
    IngestStore.snapshotStore(spark, src, torn,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tf",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("len",
          org.apache.spark.sql.types.LongType))), asOf = 0L,
      latestPerKey = Some("doc"),
      purge = Some(col("token").isNull), sortBy = Seq("token"))
    assert(!new java.io.File(s"$torn/_stats_committed").exists)
    Streaming.snapshotIndexStore(spark, src, torn, asOf = 0L) // heals
    assert(scala.io.Source.fromFile(s"$torn/_stats_committed")
      .mkString.trim === "1")
    assert(rows(Streaming.bm25FromIndex(spark, torn, qs,
      "qid", "qtext", k = 5, maxDocFreq = None)) === pinned)
    // a COMPLETE export (marker covers the boundary) still refuses
    intercept[IllegalArgumentException] {
      Streaming.snapshotIndexStore(spark, src, torn, asOf = 0L)
    }
    // source compacts PAST the moment: its own asOf=0 erodes
    // (readAsOf refuses), the export keeps answering — the point
    Streaming.indexEraseNow(spark, src)
    intercept[IllegalArgumentException] {
      IngestStore.readAsOf(spark, src,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("token",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("tf",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("len",
            org.apache.spark.sql.types.LongType))), 0L).collect()
    }
    assert(rows(Streaming.bm25FromIndex(spark, snap, qs,
      "qid", "qtext", k = 5, maxDocFreq = None)) === pinned)

    // embedding store: model PRESERVED (same cells, same answers),
    // tombstones purged from the frozen base
    val esrc = tmp("graft-snap-esrc")
    Streaming.embIngestBatch(
      Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
        (7L, null.asInstanceOf[Seq[Double]]))
        .toDF("vec_id", "embedding"), 0L, esrc,
      "vec_id", "embedding", nCells = 2, compactEvery = 0)
    Streaming.embIngestBatch(
      Seq((3L, Seq(-1.0, 0.2))).toDF("vec_id", "embedding"), 1L, esrc,
      "vec_id", "embedding", nCells = 2, compactEvery = 0)
    val vq = Seq((9L, Seq(1.0, 0.1))).toDF("vec_id", "embedding")
    def ann(dir: String, asOf: Option[Long]) =
      Streaming.annFromStore(spark, dir, vq, "vec_id", "embedding",
          k = 3, nProbe = 2, asOf = asOf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val epin = ann(esrc, Some(0L))
    val esnap = tmp("graft-snap-edst")
    Streaming.snapshotEmbStore(spark, esrc, esnap, asOf = 0L)
    assert(ann(esnap, None) === epin)
    // vec 7's tombstone left zero bytes in the export
    assert(spark.read.option("basePath", esnap).parquet(esnap)
      .filter(col("vec") === 7L).count() === 0L)
    // the model files are a byte-copy in behavior: identical probes
    // at nProbe=1 (cell routing depends only on the model)
    assert(Streaming.annFromStore(spark, esnap, vq, "vec_id",
        "embedding", k = 1, nProbe = 1).collect().map(_.getLong(2))
      .toSeq ===
      Streaming.annFromStore(spark, esrc, vq, "vec_id",
        "embedding", k = 1, nProbe = 1, asOf = Some(0L))
        .collect().map(_.getLong(2)).toSeq)
  }

  test("indexIngest: crash AT a compaction batch — restart re-delivers " +
      "through the checkpoint and the store converges to the " +
      "uninterrupted run (supersede folded by the compaction)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (idxDir, ckptDir) = (tmp("graft-icrash-idx"), tmp("graft-icrash-ckpt"))
    val b0 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
    val b1 = Seq((3L, "zeta eta theta"),
      (1L, "alpha beta gamma REVISED")) // later-batch re-ingest of doc 1
    val b2 = Seq((4L, "iota kappa"))    // batchId 2 = the compaction batch
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.indexIngest(
      ms.toDF().toDF("doc_id", "text"), idxDir, "doc_id", "text",
      compactEvery = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    ms.addData(b0: _*); runOnce()
    ms.addData(b1: _*); runOnce()
    ms.addData(b2: _*); runOnce()
    // crash AT the compaction batch: its commit never landed, and the
    // batch-2 slice is corrupted down to a half-written empty shard
    val commit2 = new java.io.File(s"$ckptDir/commits/2")
    assert(commit2.exists && commit2.delete())
    new java.io.File(s"$ckptDir/commits/.2.crc").delete()
    Streaming.writeBatch(
      spark.read.option("basePath", idxDir).parquet(idxDir)
        .filter(col("batch_id") === 2).drop("batch_id").limit(0),
      idxDir, "parquet", 2L)
    runOnce() // Spark re-delivers batch 2; compaction + slice replay
    assert(new java.io.File(s"$ckptDir/commits/2").exists)
    // uninterrupted reference
    val refDir = tmp("graft-icrash-ref")
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        refDir, "doc_id", "text", compactEvery = 2)
    }
    // boundary-aware store read (the query side's view): absorbed
    // slices and uncommitted base attempts must stay invisible
    val pSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("len",
        org.apache.spark.sql.types.LongType)))
    def store(dir: String): Set[(Long, String, Long, Long)] =
      IngestStore.read(spark, dir, pSchema)
        .select(col("doc"), col("token"), col("tf"), col("len"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
    assert(store(idxDir) === store(refDir))
    // the compaction superseded doc 1's first version: only REVISED
    // postings remain for it
    assert(!store(idxDir).exists { case (d, t, _, l) =>
      d == 1L && l == 3L })
    assert(store(idxDir).exists { case (d, t, _, _) =>
      d == 1L && t == "REVISED" })
    // the stats SIDECAR also converged through the crash: the replay
    // healed the marker to the boundary on both stores, and the
    // sidecar-served query path answers identically over each
    def marker(dir: String) =
      scala.io.Source.fromFile(s"$dir/_stats_committed").mkString.trim
    assert(marker(idxDir) === "2" && marker(refDir) === "2")
    val qs = Seq((9L, "alpha beta"), (8L, "zeta kappa"))
      .toDF("qid", "qtext")
    def topk(dir: String) = Streaming.bm25FromIndex(spark, dir, qs,
        "qid", "qtext", k = 5, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(topk(idxDir) === topk(refDir))
  }

  test("embIngest: the model trains once, on the first batch with " +
      "vectors (an empty leading batch defers, a replay converges " +
      "bit-identically), slices replay idempotently, and an " +
      "all-cells probe equals brute force over the union corpus") {
    import spark.implicits._
    import graft.operators.Similarity
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val storeDir = tmp("graft-emb")
    val b0 = Seq((1L, Seq(1.0, 0.1)), (2L, Seq(0.9, 0.2)),
      (3L, Seq(-1.0, 0.3)), (4L, Seq(-0.8, 0.1)))
    val b1 = Seq((5L, Seq(0.95, 0.05)), (6L, Seq(-0.9, 0.2)))
    // an EMPTY leading batch defers training (no committed model, no
    // wedge) — the first batch WITH vectors trains
    val deferDir = tmp("graft-emb-defer")
    Streaming.embIngestBatch(
      Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding"), 0L,
      deferDir, "vec_id", "embedding", nCells = 2)
    intercept[IllegalStateException] {
      Streaming.annFromStore(spark, deferDir,
        b0.toDF("vec_id", "embedding"), "vec_id", "embedding", 1, 2)
    }
    Streaming.embIngestBatch(b0.toDF("vec_id", "embedding"), 1L,
      deferDir, "vec_id", "embedding", nCells = 2)
    assert(Streaming.annFromStore(spark, deferDir,
      b0.take(1).toDF("vec_id", "embedding"), "vec_id", "embedding",
      1, 2).count() === 1L)

    Streaming.embIngestBatch(b0.toDF("vec_id", "embedding"), 0L,
      storeDir, "vec_id", "embedding", nCells = 2)
    def model() = spark.read.parquet(s"$storeDir/_centroids")
      .orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList)).toList
    def store(): Set[(Long, Int, Double)] =
      spark.read.option("basePath", storeDir).parquet(storeDir)
        .filter(col("batch_id") >= 0)
        .select(col("vec"), col("cell"), col("cn"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val model1 = model()
    val store0 = store()
    // the crash-between-parquet-and-marker path: batch 0 never
    // committed (no later batch exists), the marker is gone and the
    // slice is torn — the replay must RETRAIN from the same
    // deterministic sample and converge bit-identically
    assert(new java.io.File(s"$storeDir/_centroids_committed").delete())
    Streaming.writeBatch(
      spark.read.option("basePath", storeDir).parquet(storeDir)
        .filter(col("batch_id") === 0).drop("batch_id").limit(0),
      storeDir, "parquet", 0L)
    Streaming.embIngestBatch(b0.toDF("vec_id", "embedding"), 0L,
      storeDir, "vec_id", "embedding", nCells = 2)
    assert(store() === store0 && model() === model1)

    Streaming.embIngestBatch(b1.toDF("vec_id", "embedding"), 1L,
      storeDir, "vec_id", "embedding", nCells = 2)
    val once = store()
    // replay batch 1 with the marker committed: the fast path reuses
    // the model; store unchanged
    Streaming.embIngestBatch(b1.toDF("vec_id", "embedding"), 1L,
      storeDir, "vec_id", "embedding", nCells = 2)
    assert(store() === once && model() === model1)
    // a LOST model over an ASSIGNED store must refuse loudly, never
    // silently retrain on one batch and invalidate stored cells
    assert(new java.io.File(s"$storeDir/_centroids_committed").delete())
    intercept[IllegalArgumentException] {
      Streaming.embIngestBatch(b1.toDF("vec_id", "embedding"), 2L,
        storeDir, "vec_id", "embedding", nCells = 2)
    }
    // restore the marker (the operator-intervention path) and move on
    new java.io.File(s"$storeDir/_centroids_committed").createNewFile()
    // all-cells probe == exact brute force over the union corpus
    val corpus = (b0 ++ b1).toDF("vec_id", "embedding")
    val qs = Seq((1L, Seq(1.0, 0.1)), (6L, Seq(-0.9, 0.2)))
      .toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(rows(Streaming.annFromStore(spark, storeDir, qs,
        "vec_id", "embedding", k = 3, nProbe = 2)) ===
      rows(Similarity.bruteForceTopK(qs, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3)))
  }

  test("embIngest: a NULL-vector re-ingest tombstones the vec — " +
      "retrieval-invisible immediately, old postings superseded at " +
      "compaction; null vectors never enter training") {
    import spark.implicits._
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val storeDir = tmp("graft-emb-tomb")
    // batch 0 carries a null vector alongside real ones: training
    // must skip it (no NPE) and the row lands as a tombstone
    val b0 = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (7L, null.asInstanceOf[Seq[Double]]))
    val b1 = Seq((1L, null.asInstanceOf[Seq[Double]])) // redact vec 1
    val b2 = Seq((3L, Seq(-1.0, 0.2)))  // batchId 2 = compaction batch
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.embIngestBatch(rows.toDF("vec_id", "embedding"), id,
        storeDir, "vec_id", "embedding", nCells = 2, compactEvery = 2)
    }
    // post-compaction: the purge completed the erasure — vec 1 (and
    // the batch-0 tombstone vec 7) left ZERO physical rows; a raw
    // scan over every file proves the bytes are gone, not filtered
    val purgedIds = spark.read.option("basePath", storeDir)
      .parquet(storeDir)
      .filter(col("vec") === 1L || col("vec") === 7L)
      .collect()
    assert(purgedIds.isEmpty)
    // retrieval never surfaces a tombstoned vec
    val got = Streaming.annFromStore(spark, storeDir,
        Seq((9L, Seq(1.0, 0.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, nProbe = 2)
      .collect().map(_.getLong(2)).toSet
    assert(!got.contains(1L) && !got.contains(7L))
    assert(got === Set(2L, 3L))
  }

  test("embIngest: probed retrieval at nProbe < nCells never beats " +
      "brute force at any rank and holds recall on real embeddings") {
    import graft.operators.Similarity
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-emb-recall").toString
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    Streaming.embIngestBatch(emb.filter(col("vec_id") % 2 === 0), 0L,
      storeDir, "vec_id", "embedding", nCells = 8)
    Streaming.embIngestBatch(emb.filter(col("vec_id") % 2 =!= 0), 1L,
      storeDir, "vec_id", "embedding", nCells = 8)
    val qs = emb.filter(col("vec_id") < 10)
    def byQuery(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // nProbe 4 of 8: the store's model trains on batch 0 ALONE (the
    // train-once protocol), so cells fit half the corpus — measured
    // recall@5 here is 0.48 at nProbe=2 and comfortably above 0.6 at
    // 4 (the multi-probe lever compensating for sample-era drift,
    // exactly the documented trade)
    val approx = byQuery(Streaming.annFromStore(spark, storeDir, qs,
      "vec_id", "embedding", k = 5, nProbe = 4))
    val exact = byQuery(Similarity.bruteForceTopK(qs,
      "vec_id", "embedding", emb, "vec_id", "embedding", k = 5))
    // per (query, rank): the probed cosine can never EXCEED the exact
    // one (pruning loses candidates, it cannot invent better ones)
    approx.foreach { case (qr, (_, c)) =>
      exact.get(qr).foreach { case (_, ce) => assert(c <= ce + 1e-9) } }
    // and the probed top-5 sets overlap the exact ones substantially
    val hits = approx.count { case ((q, _), (id, _)) =>
      exact.exists { case ((q2, _), (id2, _)) => q2 == q && id2 == id } }
    assert(hits >= (exact.size * 6) / 10,
      s"recall@5 too low: $hits / ${exact.size}")
  }

  test("embIngest: crash AT a compaction batch — restart re-delivers " +
      "and the store (with a superseded re-ingested vector) converges " +
      "to the uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (storeDir, ckptDir) = (tmp("graft-ecrash"), tmp("graft-ecrash-ckpt"))
    val b0 = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
    val b1 = Seq((1L, Seq(0.5, 0.5)), (3L, Seq(-1.0, 0.0)))
    val b2 = Seq((4L, Seq(0.7, -0.7)))   // batchId 2 = compaction batch
    val ms = MemoryStream[(Long, Seq[Double])]
    val writer = Streaming.embIngest(
      ms.toDF().toDF("vec_id", "embedding"), storeDir,
      "vec_id", "embedding", nCells = 2, compactEvery = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    ms.addData(b0: _*); runOnce()
    ms.addData(b1: _*); runOnce()
    ms.addData(b2: _*); runOnce()
    val commit2 = new java.io.File(s"$ckptDir/commits/2")
    assert(commit2.exists && commit2.delete())
    new java.io.File(s"$ckptDir/commits/.2.crc").delete()
    Streaming.writeBatch(
      spark.read.option("basePath", storeDir).parquet(storeDir)
        .filter(col("batch_id") === 2).drop("batch_id").limit(0),
      storeDir, "parquet", 2L)
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/2").exists)
    val refDir = tmp("graft-ecrash-ref")
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.embIngestBatch(rows.toDF("vec_id", "embedding"), id,
        refDir, "vec_id", "embedding", nCells = 2, compactEvery = 2)
    }
    val pSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("cn",
        org.apache.spark.sql.types.DoubleType)))
    def store(dir: String): Set[(Long, Seq[Double])] =
      IngestStore.read(spark, dir, pSchema)
        .select(col("vec"), col("v")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    assert(store(storeDir) === store(refDir))
    // vec 1's batch-0 version fell at the compaction; the re-ingested
    // vector is the only one left
    assert(store(storeDir).count(_._1 == 1L) === 1)
    assert(store(storeDir).contains((1L, Seq(0.5, 0.5))))
  }

  test("sessionize: open-session state survives a restart from the " +
      "checkpoint, and a crash before the commit re-emits the batch " +
      "idempotently through Spark's state store") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (outDir, ckptDir) = (tmp("graft-sess-out"), tmp("graft-sess-ckpt"))
    val ms = MemoryStream[Event]
    // the stateful path: per-key session state lives in Spark's STATE
    // STORE (versioned under the checkpoint), not in a store of our
    // own design — this is the one crash surface the file-protocol
    // kill/restart tests don't touch. Output goes through the
    // idempotent slice sink so re-delivered batches overwrite.
    val writer = sessionize(ms.toDS(), gapMillis = 10 * 60 * 1000L,
        idleFlush = false)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.Dataset[Session], id: Long) =>
          Streaming.writeBatch(b.toDF(), outDir, "parquet", id)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    def sessions(): Set[(Long, Long, Long, Double)] =
      spark.read.option("basePath", outDir).parquet(outDir)
        .select(col("batch_id").cast("long"), col("user_id"),
          col("n_events"), col("total_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    // batch 0 opens a session (no emission yet — append mode)
    ms.addData(Event(1L, ts(1), 1.0), Event(1L, ts(3), 2.0)); runOnce()
    assert(sessions().isEmpty)
    // RESTART (new query instance, same checkpoint): the closing event
    // must find the open session's state — one session, full span
    ms.addData(Event(1L, ts(30), 5.0)); runOnce()
    assert(sessions() === Set((1L, 1L, 2L, 3.0)))
    // crash DURING batch 1, after the slice write but before the
    // commit: Spark re-delivers batch 1 against the state version
    // batch 0 left, so the re-run emits the SAME session and the
    // slice overwrite repairs the half-written output
    val commit1 = new java.io.File(s"$ckptDir/commits/1")
    assert(commit1.exists && commit1.delete())
    new java.io.File(s"$ckptDir/commits/.1.crc").delete()
    Streaming.writeBatch(
      spark.read.option("basePath", outDir).parquet(outDir)
        .filter(col("batch_id") === 1).drop("batch_id").limit(0),
      outDir, "parquet", 1L)
    assert(sessions().isEmpty) // half-written state visible pre-restart
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/1").exists)
    assert(sessions() === Set((1L, 1L, 2L, 3.0)))
    // and the stream continues: closing the ts(30) session emits it
    // from the RECOVERED post-replay state (no loss, no duplicate)
    ms.addData(Event(1L, ts(55), 7.0)); runOnce()
    assert(sessions() ===
      Set((1L, 1L, 2L, 3.0), (2L, 1L, 1L, 5.0)))
  }

  test("sessionizeBatch matches hand-computed sessions") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(1), 1.0), (1L, ts(5), 2.0),   // session 1 (gap 4 min)
      (1L, ts(40), 3.0),                    // session 2
      (2L, ts(2), 4.0))                     // session 1 of user 2
      .toDF("user_id", "ts", "value")
    val out = Streaming.sessionizeBatch(df, "user_id", "ts", "value",
      gapMillis = 10 * 60 * 1000L)
      .select("user_id", "session_no", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 4.0)))
  }

  test("prepIngestBatch: quality gate + first-occurrence dedup across " +
      "batches; idempotent replay; empty pre-created store dir") {
    import spark.implicits._
    val acceptedDir = java.nio.file.Files
      .createTempDirectory("graft-prep-accepted").toString // pre-created, EMPTY
    def accepted(): Set[(Long, Long)] =
      spark.read.option("basePath", acceptedDir).parquet(acceptedDir)
        .select(col("doc_id"), col("batch_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 0 against the empty store: doc 1 passes; doc 2 is a
    // within-batch duplicate of 1 (same fingerprint after
    // normalization); doc 3 fails the 3-token quality gate
    Streaming.prepIngestBatch(Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "Alpha, beta GAMMA delta!"),
      (3L, "too short")).toDF("doc_id", "text"),
      0L, acceptedDir, "doc_id", "text", minTokens = 3L)
    assert(accepted() === Set((1L, 0L)))
    // batch 1: doc 4 duplicates the stored fingerprint → dropped;
    // doc 5 is new → admitted
    Streaming.prepIngestBatch(Seq(
      (4L, "alpha beta gamma delta"),
      (5L, "epsilon zeta eta theta")).toDF("doc_id", "text"),
      1L, acceptedDir, "doc_id", "text", minTokens = 3L)
    assert(accepted() === Set((1L, 0L), (5L, 1L)))
    // replay batch 1 (post-failure restart): own slice excluded from
    // the old side, output replaced not appended, nothing duplicated
    Streaming.prepIngestBatch(Seq(
      (4L, "alpha beta gamma delta"),
      (5L, "epsilon zeta eta theta")).toDF("doc_id", "text"),
      1L, acceptedDir, "doc_id", "text", minTokens = 3L)
    assert(accepted() === Set((1L, 0L), (5L, 1L)))
  }

  test("sessionize: cross-batch late arrivals never corrupt the open session") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = sessionize(ms.toDS(), gapMillis = 10 * 60 * 1000L,
        idleFlush = false)
      .writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").start()
    ms.addData(Event(1L, ts(20), 1.0), Event(1L, ts(22), 1.0))
    q.processAllAvailable()
    // late but within gap reach of the open session's start: must
    // EXTEND the span backward (old code regressed `last` to 15:00,
    // which then mis-closed the gap and emitted end < start)
    ms.addData(Event(1L, ts(15), 1.0))
    q.processAllAvailable()
    ms.addData(Event(1L, ts(50), 2.0)) // closes the session
    q.processAllAvailable()
    // out-of-gap late arrival (before 50-10): best-effort singleton,
    // open session untouched
    ms.addData(Event(1L, ts(25), 9.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.sql(
      "SELECT session_start, session_end, n_events, total_value " +
        "FROM sess_late_out")
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(sessions === Set(
      (ts(15), ts(22), 3L, 3.0),  // extended backward, never inverted
      (ts(25), ts(25), 1L, 9.0))) // the stale singleton
    sessions.foreach { case (a, b, _, _) => assert(!b.before(a)) }
  }

  test("sessionize: adjacent out-of-gap lates merge into one late session") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = sessionize(ms.toDS(), gapMillis = 10 * 60 * 1000L,
        idleFlush = false)
      .writeStream.format("memory").queryName("sess_latemerge_out")
      .outputMode("append").start()
    ms.addData(Event(1L, ts(40), 1.0), Event(1L, ts(42), 1.0))
    q.processAllAvailable()
    // one replayed batch delivers three out-of-gap lates: :05 and :07
    // are within gap of each other (one best-effort session, matching
    // what sessionizeBatch would yield), :25 is beyond their reach (a
    // second late session); the open 40-42 session must be untouched
    ms.addData(Event(1L, ts(5), 2.0), Event(1L, ts(7), 3.0),
      Event(1L, ts(25), 4.0))
    q.processAllAvailable()
    ms.addData(Event(1L, ts(58), 9.0)) // closes the open session
    q.processAllAvailable()
    q.stop()
    val sessions = spark.sql(
      "SELECT session_start, session_end, n_events, total_value " +
        "FROM sess_latemerge_out")
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(sessions === Set(
      (ts(5), ts(7), 2L, 5.0),    // merged late pair, summed total
      (ts(25), ts(25), 1L, 4.0),  // out of the pair's reach
      (ts(40), ts(42), 2L, 2.0))) // open session untouched
  }

  test("driftMonitor: per-batch KL/TV vs the accumulated store; " +
      "batch 0 emits NULL drift; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-drift-store").toString
    val driftDir = java.nio.file.Files
      .createTempDirectory("graft-drift-out").toString
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-drift-ckpt").toString
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.driftMonitor(
      ms.toDF().toDF("doc_id", "text"), storeDir, driftDir, "text")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    // batch 0 counts: a:2 b:2 c:1 (n=5, V=3)
    ms.addData((1L, "a a b"), (2L, "b c"))
    val q1 = writer.start(); q1.processAllAvailable(); q1.stop()
    // batch 1 counts: a:1 b:2 d:1 (n=4); union vocab {a,b,c,d} (V=4)
    // p = (c_b+1)/(4+4), q = (c_s+1)/(5+4):
    //   KL = .25 ln(.25/(3/9)) + .375 ln(.375/(3/9))
    //      + .125 ln(.125/(2/9)) + .25 ln(.25/(1/9)) = 0.1031 (4dp)
    //   TV = (|.25-3/9| + |.375-3/9| + |.125-2/9| + |.25-1/9|)/2
    //      = 0.1806 (4dp)
    ms.addData((3L, "a b b d"))
    val q2 = writer.start(); q2.processAllAvailable(); q2.stop()

    def driftRows(): Seq[(Long, Long, Long, Option[Double], Option[Double])] =
      spark.read.option("basePath", driftDir).parquet(driftDir)
        .select(col("batch_id").cast("long"), col("n_tokens"),
          col("n_distinct"), col("kl_vs_store"), col("tv_vs_store"))
        .orderBy("batch_id")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val expected = Seq(
      (0L, 5L, 3L, None, None),
      (1L, 4L, 3L, Some(0.1031), Some(0.1806)))
    assert(driftRows() === expected)
    // replay batch 1 directly (post-failure restart): the half-written
    // slice is excluded from the prior read, the drift row is replaced
    // not appended, and the store did not double-count
    Streaming.driftMonitorBatch(
      Seq((3L, "a b b d")).toDF("doc_id", "text"), 1L,
      storeDir, driftDir, "text")
    assert(driftRows() === expected)
    assert(spark.read.option("basePath", storeDir).parquet(storeDir)
      .agg(sum(col("c"))).head().getLong(0) === 9L)
  }

  test("trendingTokens: per-batch top-k by exact milli lift vs the " +
      "accumulated store; batch 0 emits NO rows; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-trend-store").toString
    val trendDir = java.nio.file.Files
      .createTempDirectory("graft-trend-out").toString
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-trend-ckpt").toString
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.trendingTokens(
      ms.toDF().toDF("doc_id", "text"), storeDir, trendDir, "text", k = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    // batch 0 counts: a:2 b:2 c:1 (n=5) — seeds the store, no rows
    ms.addData((1L, "a a b"), (2L, "b c"))
    val q1 = writer.start(); q1.processAllAvailable(); q1.stop()
    // batch 1 counts: a:1 b:2 d:1 (nb=4); union vocab {a,b,c,d} (V=4),
    // store totals np=5. lift = 1000·(cb+1)·9 div (8·(cp+1)):
    //   a: 1000·2·9 div (8·3) = 750;  b: 1000·3·9 div (8·3) = 1125
    //   d: 1000·2·9 div (8·1) = 2250  → top-2 = d(2250), b(1125)
    ms.addData((3L, "a b b d"))
    val q2 = writer.start(); q2.processAllAvailable(); q2.stop()
    def trendRows(): Seq[(Long, String, Long, Long, Long)] =
      spark.read.option("basePath", trendDir).parquet(trendDir)
        .select(col("batch_id").cast("long"), col("tok"), col("cb"),
          col("cp"), col("lift_milli"))
        .orderBy(col("batch_id"), col("lift_milli").desc, col("tok"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
    val expected = Seq(
      (1L, "d", 1L, 0L, 2250L),
      (1L, "b", 2L, 2L, 1125L))
    assert(trendRows() === expected)
    // replay batch 1 directly (post-failure restart): slice excluded
    // from its own prior read, trend rows replaced not appended
    Streaming.trendingTokensBatch(
      Seq((3L, "a b b d")).toDF("doc_id", "text"), 1L,
      storeDir, trendDir, "text", k = 2)
    assert(trendRows() === expected)
    assert(spark.read.option("basePath", storeDir).parquet(storeDir)
      .agg(sum(col("c"))).head().getLong(0) === 9L)
  }

  test("trendingTokens: query killed AT a reduce-compaction batch — " +
      "restart re-delivers through the checkpoint and the trend rows " +
      "equal the uninterrupted run (closes the counts-store family's " +
      "crash symmetry)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (storeDir, trendDir, ckptDir) =
      (tmp("graft-trcrash-store"), tmp("graft-trcrash-out"),
        tmp("graft-trcrash-ckpt"))
    val b0 = Seq((1L, "a a b"), (2L, "b c"))
    val b1 = Seq((3L, "a b b d"))
    val b2 = Seq((4L, "d d e a")) // the compactEvery=2 boundary batch
    val b3 = Seq((5L, "e e f b"))
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.trendingTokens(
      ms.toDF().toDF("doc_id", "text"), storeDir, trendDir, "text",
      k = 2, compactEvery = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    ms.addData(b0: _*); runOnce()
    ms.addData(b1: _*); runOnce()
    ms.addData(b2: _*); runOnce()
    // batch 2 ran the counts-store REDUCE compaction (token rows of
    // slices 0-1 sum-merged into the base). Crash before the commit,
    // trend slice half-written (empty): the marker-committed base
    // makes the re-delivered compaction a no-op retry and the slice
    // overwrite repairs the trend output
    val commit2 = new java.io.File(s"$ckptDir/commits/2")
    assert(commit2.exists && commit2.delete())
    new java.io.File(s"$ckptDir/commits/.2.crc").delete()
    Streaming.writeBatch(
      spark.read.option("basePath", trendDir).parquet(trendDir)
        .filter(col("batch_id") === 1).drop("batch_id").limit(0),
      trendDir, "parquet", 2L)
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/2").exists,
      "restart must have re-run and committed batch 2")
    ms.addData(b3: _*); runOnce()

    // uninterrupted reference via direct batch replays
    val (refStore, refTrend) =
      (tmp("graft-trcrash-refstore"), tmp("graft-trcrash-refout"))
    Seq((b0, 0L), (b1, 1L), (b2, 2L), (b3, 3L)).foreach { case (rows, id) =>
      Streaming.trendingTokensBatch(rows.toDF("doc_id", "text"), id,
        refStore, refTrend, "text", k = 2, compactEvery = 2)
    }
    def trends(dir: String): Set[(Long, String, Long, Long, Long)] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("batch_id").cast("long"), col("tok"), col("cb"),
          col("cp"), col("lift_milli"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    assert(trends(trendDir) === trends(refTrend))
    assert(trends(trendDir).nonEmpty)
    def counts(dir: String): Map[String, Long] =
      IngestStore.readStore(spark, dir)
        .groupBy(col("tok")).agg(sum(col("c")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(storeDir) === counts(refStore))
  }

  test("driftMonitor: reduce-compaction changes neither drift nor " +
      "store content, and bounds the store to a vocab-sized base") {
    import spark.implicits._
    def run(compactEvery: Int): (String, Seq[(Long, Double)]) = {
      val storeDir = java.nio.file.Files
        .createTempDirectory(s"graft-drift-cmp$compactEvery-store").toString
      val driftDir = java.nio.file.Files
        .createTempDirectory(s"graft-drift-cmp$compactEvery-out").toString
      (0L to 8L).foreach { b =>
        Streaming.driftMonitorBatch(
          Seq((b, s"w${b % 3} w${(b + 1) % 4} common tail")
            ).toDF("doc_id", "text"),
          b, storeDir, driftDir, "text", compactEvery = compactEvery)
      }
      val drift = spark.read.option("basePath", driftDir).parquet(driftDir)
        .select(col("batch_id").cast("long"), col("kl_vs_store"))
        .filter(col("batch_id") > 0) // batch 0's drift is NULL by contract
        .orderBy("batch_id")
        .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
      (storeDir, drift)
    }
    val (compacted, driftA) = run(compactEvery = 4)
    val (plain, driftB) = run(compactEvery = 0)
    assert(driftA === driftB) // bit-identical drift with or without
    def counts(dir: String): Map[String, Long] =
      graft.streaming.IngestStore.readStore(spark, dir)
        .groupBy(col("tok")).agg(sum(col("c")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(compacted) === counts(plain))
    // compaction at batch 8 sum-merged [0,8) into ONE row per token:
    // base rows = vocabulary size, not 8 batches × their vocabularies
    val base = spark.read.option("basePath", compacted)
      .parquet(s"$compacted/batch_id=-8")
    assert(base.count() ===
      base.select(col("tok")).distinct().count())
  }

  test("driftMonitor: query killed AT a reduce-compaction batch — " +
      "restart re-delivers through the checkpoint and the drift rows " +
      "equal the uninterrupted run (every counts-store OPERATOR now " +
      "carries the crash e2e, not only the family)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (storeDir, driftDir, ckptDir) =
      (tmp("graft-drcrash-store"), tmp("graft-drcrash-out"),
        tmp("graft-drcrash-ckpt"))
    val b0 = Seq((1L, "a a b"), (2L, "b c"))
    val b1 = Seq((3L, "a b b d"))
    val b2 = Seq((4L, "d d e a")) // the compactEvery=2 boundary batch
    val b3 = Seq((5L, "e e f b"))
    val ms = MemoryStream[(Long, String)]
    val writer = Streaming.driftMonitor(
      ms.toDF().toDF("doc_id", "text"), storeDir, driftDir, "text",
      compactEvery = 2)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
    def runOnce(): Unit = {
      val q = writer.start(); q.processAllAvailable(); q.stop()
    }
    ms.addData(b0: _*); runOnce()
    ms.addData(b1: _*); runOnce()
    ms.addData(b2: _*); runOnce()
    // batch 2 ran the counts-store REDUCE compaction. Crash before the
    // commit, drift slice half-written (empty): the marker-committed
    // base makes the re-delivered compaction a no-op retry and the
    // slice overwrite repairs the drift output
    val commit2 = new java.io.File(s"$ckptDir/commits/2")
    assert(commit2.exists && commit2.delete())
    new java.io.File(s"$ckptDir/commits/.2.crc").delete()
    Streaming.writeBatch(
      spark.read.option("basePath", driftDir).parquet(driftDir)
        .filter(col("batch_id") === 1).drop("batch_id").limit(0),
      driftDir, "parquet", 2L)
    runOnce()
    assert(new java.io.File(s"$ckptDir/commits/2").exists,
      "restart must have re-run and committed batch 2")
    ms.addData(b3: _*); runOnce()

    // uninterrupted reference via direct batch replays
    val (refStore, refDrift) =
      (tmp("graft-drcrash-refstore"), tmp("graft-drcrash-refout"))
    Seq((b0, 0L), (b1, 1L), (b2, 2L), (b3, 3L)).foreach { case (rows, id) =>
      Streaming.driftMonitorBatch(rows.toDF("doc_id", "text"), id,
        refStore, refDrift, "text", compactEvery = 2)
    }
    def drifts(dir: String)
        : Set[(Long, Long, Long, Option[(Double, Double)])] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("batch_id").cast("long"), col("n_tokens"),
          col("n_distinct"), col("kl_vs_store"), col("tv_vs_store"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None
          else Some((r.getDouble(3), r.getDouble(4))))).toSet
    assert(drifts(driftDir) === drifts(refDrift))
    assert(drifts(driftDir).size === 4)
    def counts(dir: String): Map[String, Long] =
      IngestStore.readStore(spark, dir)
        .groupBy(col("tok")).agg(sum(col("c")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(storeDir) === counts(refStore))
  }

  test("indexIngest/embIngest refuse a batch whose ids do not cast " +
      "losslessly to long — never a silent NULL-key merge") {
    import spark.implicits._
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    // a string doc id that parses would be fine; one that doesn't must
    // refuse the whole batch and leave NO readable store mutation
    // (the in-write guard deletes the partial slice it refused)
    def assertNoSlices(dir: String): Unit = {
      val d = new java.io.File(dir)
      val slices = Option(d.list()).getOrElse(Array.empty[String])
        .filter(_.startsWith("batch_id="))
      assert(slices.isEmpty,
        s"refused batch left slice dirs: ${slices.mkString(",")}")
    }
    val badTextDir = tmp("graft-badid-idx")
    val badText = intercept[IllegalArgumentException] {
      Streaming.indexIngestBatch(
        Seq(("7", "fine"), ("doc-1", "poison")).toDF("doc_id", "text"),
        0L, badTextDir, "doc_id", "text")
    }
    assert(badText.getMessage.contains("doc-1"))
    assertNoSlices(badTextDir)
    val nullId = intercept[IllegalArgumentException] {
      Streaming.indexIngestBatch(
        Seq((java.lang.Long.valueOf(1L), "a"),
          (null.asInstanceOf[java.lang.Long], "b"))
          .toDF("doc_id", "text"),
        0L, tmp("graft-nullid-idx"), "doc_id", "text")
    }
    assert(nullId.getMessage.contains("NULL"))
    val badVecDir = tmp("graft-badid-emb")
    val badVec = intercept[IllegalArgumentException] {
      Streaming.embIngestBatch(
        Seq(("vec-9", Seq(1.0, 0.0))).toDF("vec_id", "embedding"),
        0L, badVecDir, "vec_id", "embedding", nCells = 2)
    }
    assert(badVec.getMessage.contains("vec-9"))
    assertNoSlices(badVecDir)
    // TRUNCATION is as silent a merge as NULL: double ids 1.2 and 1.7
    // would both land on store key 1 — the round-trip check refuses
    val truncated = intercept[IllegalArgumentException] {
      Streaming.indexIngestBatch(
        Seq((1.2, "a"), (1.7, "b")).toDF("doc_id", "text"),
        0L, tmp("graft-truncid-idx"), "doc_id", "text")
    }
    assert(truncated.getMessage.contains("losslessly"))
    // numeric-string and whole-double ids are lossless and stay legal
    val okDir = tmp("graft-okid-idx")
    Streaming.indexIngestBatch(
      Seq(("7", "fine")).toDF("doc_id", "text"), 0L, okDir,
      "doc_id", "text")
    assert(spark.read.option("basePath", okDir).parquet(okDir)
      .select("doc").head().getLong(0) === 7L)
    val okDir2 = tmp("graft-okid2-idx")
    Streaming.indexIngestBatch(
      Seq((2.0, "fine")).toDF("doc_id", "text"), 0L, okDir2,
      "doc_id", "text")
    assert(spark.read.option("basePath", okDir2).parquet(okDir2)
      .select("doc").head().getLong(0) === 2L)
  }

  test("indexIngest: redaction and re-ingest are IMMEDIATE at the " +
      "query surface — before any compaction, the store equals the " +
      "batch operator on the latest corpus and a revised doc holds " +
      "one rank, not two") {
    import spark.implicits._
    import graft.operators.TextStats
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val idxDir = tmp("graft-idx-immediate")
    val b0 = Seq((1L, "secret launch codes"), (2L, "secret recipes"),
      (3L, "other words"))
    val b1 = Seq((1L, null.asInstanceOf[String]), // redact doc 1
      (2L, "revised secret recipes"))             // revise doc 2
    // compactEvery high on purpose: NO compaction ever runs here — the
    // read-time supersede alone must hide the stale versions
    Seq((b0, 0L), (b1, 1L)).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        idxDir, "doc_id", "text", compactEvery = 100)
    }
    // the stale postings are still PHYSICALLY in the store...
    assert(spark.read.option("basePath", idxDir).parquet(idxDir)
      .filter(col("doc") === 1L && col("token").isNotNull)
      .count() > 0)
    val qs = Seq((9L, "secret")).toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val got = rows(Streaming.bm25FromIndex(spark, idxDir, qs,
      "qid", "qtext", k = 10, maxDocFreq = None))
    // ...but they never score: doc 1 is gone NOW, doc 2 appears ONCE
    assert(!got.exists(_._3 == 1L))
    assert(got.count(_._3 == 2L) === 1)
    val latest = Seq((1L, null.asInstanceOf[String]),
      (2L, "revised secret recipes"), (3L, "other words"))
      .toDF("doc_id", "text")
    assert(got === rows(TextStats.bm25TopK(latest, "doc_id", "text",
      qs, "qid", "qtext", k = 10)))
  }

  test("annFromStore: a pre-compaction NULL-vector redaction is " +
      "retrieval-invisible immediately, a re-ingested vector holds " +
      "one rank, and the sub-cap broadcast path equals the forced " +
      "shuffle fallback") {
    import spark.implicits._
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val storeDir = tmp("graft-emb-immediate")
    val b0 = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.0, 1.0)))
    val b1 = Seq((1L, null.asInstanceOf[Seq[Double]]), // redact vec 1
      (2L, Seq(-0.9, 0.1)))                            // move vec 2
    // compactEvery high on purpose: no compaction — read-time
    // supersede must carry the semantics alone
    Seq((b0, 0L), (b1, 1L)).foreach { case (rows, id) =>
      Streaming.embIngestBatch(rows.toDF("vec_id", "embedding"), id,
        storeDir, "vec_id", "embedding", nCells = 2, compactEvery = 100)
    }
    // stale versions physically present...
    assert(spark.read.option("basePath", storeDir).parquet(storeDir)
      .filter(col("vec").isin(1L, 2L) && col("cell").isNotNull)
      .count() === 3) // vec1@b0, vec2@b0, vec2@b1
    val qs = Seq((9L, Seq(1.0, 0.05))).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val got = rows(Streaming.annFromStore(spark, storeDir, qs,
      "vec_id", "embedding", k = 5, nProbe = 2))
    // ...but only the latest versions score
    assert(!got.exists(_._3 == 1L))
    assert(got.count(_._3 == 2L) === 1)
    // vec 2's surviving cosine is its MOVED vector's (negative dot)
    assert(got.find(_._3 == 2L).exists(_._4 < 0))
    // decide-the-path-never-the-answer: cap 0 forces the shuffle join
    val forced = rows(Streaming.annFromStore(spark, storeDir, qs,
      "vec_id", "embedding", k = 5, nProbe = 2, broadcastMaxRows = 0L))
    assert(forced === got)
  }

  test("indexIngest read-time supersede across a compaction boundary: " +
      "a re-ingest AFTER the fold supersedes the doc's BASE version, " +
      "and a fully-compacted store skips the window entirely") {
    import spark.implicits._
    import graft.operators.TextStats
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val idxDir = tmp("graft-idx-xboundary")
    val b0 = Seq((1L, "alpha beta"), (2L, "gamma delta"))
    val b1 = Seq((3L, "epsilon zeta"))
    val b2 = Seq((4L, "eta theta"))        // compactEvery=2 boundary
    val b3 = Seq((1L, "alpha REVISED"))    // re-ingest AFTER the fold:
    // doc 1's old version now lives in the BASE (original batch id 0),
    // the new one in live slice 3 — max-of-restored-ids must pick 3
    Seq((b0, 0L), (b1, 1L), (b2, 2L), (b3, 3L)).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        idxDir, "doc_id", "text", compactEvery = 2)
    }
    assert(IngestStore.boundary(spark, idxDir) === 2L)
    val qs = Seq((9L, "alpha beta REVISED")).toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val got = rows(Streaming.bm25FromIndex(spark, idxDir, qs,
      "qid", "qtext", k = 10, maxDocFreq = None))
    assert(got.count(_._3 == 1L) === 1)
    val latest = Seq((1L, "alpha REVISED"), (2L, "gamma delta"),
      (3L, "epsilon zeta"), (4L, "eta theta")).toDF("doc_id", "text")
    assert(got === rows(TextStats.bm25TopK(latest, "doc_id", "text",
      qs, "qid", "qtext", k = 10)))

    // fully-compacted store: one version per key can exist, so the
    // store read must carry NO supersede window (the hasLiveSlices
    // skip — a key-partitioned shuffle the common steady-state read
    // should not pay). Probed through annFromStore, whose plan keeps
    // the store scan visible (bm25's eager postings checkpoint hides
    // its upstream); the supersede logic is shared (latestAtRead).
    def windows(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.size
    val embDir = tmp("graft-emb-flat")
    val vecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
    Streaming.embIngestBatch(vecs.toDF("vec_id", "embedding"), 0L,
      embDir, "vec_id", "embedding", nCells = 2, compactEvery = 0)
    val vq = Seq((9L, Seq(1.0, 0.1))).toDF("vec_id", "embedding")
    // live slice present: ranking window + supersede window
    assert(windows(Streaming.annFromStore(spark, embDir, vq,
      "vec_id", "embedding", k = 2, nProbe = 2)) === 2)
    IngestStore.compact(spark, embDir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("cn",
          org.apache.spark.sql.types.DoubleType))),
      upTo = 1L, latestPerKey = Some("vec"))
    val flatAnn = Streaming.annFromStore(spark, embDir, vq,
      "vec_id", "embedding", k = 2, nProbe = 2)
    assert(windows(flatAnn) === 1,
      "fully-compacted store read must not pay the supersede window")
    assert(flatAnn.count() === 2L)
  }

  test("latestAtRead: the live-key split and the full-window " +
      "spelling are bit-equal on a store with a compacted base, a " +
      "base re-ingest, two live versions of one key, and a " +
      "tombstone — and the split never shuffles cold base keys") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft-split-eq").toString
    // boundary lands at 2 (compactEvery=2 fires on batch 2): docs 1-3
    // fold into the base; then doc 1 re-ingests at b2 AND b3 (two
    // live versions over a base version), doc 2 tombstones at b3,
    // doc 3 stays cold (base-only), doc 4 is live-only
    Seq(
      (Seq((1L, "alpha beta"), (2L, "gamma delta"),
        (3L, "epsilon zeta")), 0L),
      (Seq((4L, "eta theta")), 1L),
      (Seq((1L, "alpha v2")), 2L),
      (Seq((1L, "alpha v3"),
        (2L, null.asInstanceOf[String])), 3L)
    ).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        dir, "doc_id", "text", compactEvery = 2)
    }
    assert(IngestStore.boundary(spark, dir) === 2L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("token",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("len",
        org.apache.spark.sql.types.LongType)))
    val liveIds = IngestStore.sliceIds(spark, dir).filter(_ >= 2L)
    assert(liveIds.toSet === Set(2L, 3L))
    def lk = IngestStore.readSlices(spark, dir, schema, liveIds)
      .select(col("doc")).distinct()
    assert(lk.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    def store = IngestStore.read(spark, dir, schema)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val split = Streaming.latestAtRead(store, Streaming.LiveKeys(lk), "doc")
    val full = Streaming.latestAtRead(store, Streaming.LiveKeys(lk), "doc",
      maxLiveKeys = 0L) // cap 0 forces the one-window fallback
    val splitRows = rows(split)
    assert(splitRows === rows(full))
    // semantic spot-checks: doc 1 survives only at b3 ("alpha v3"),
    // doc 2 only as its tombstone, cold docs 3/4 untouched
    assert(splitRows.filter(_._1 == 1L).map(_._5) === Set(3L))
    assert(splitRows.filter(_._1 == 1L).flatMap(_._2) ===
      Set("alpha", "v3"))
    assert(splitRows.filter(_._1 == 2L).map(_._2) === Set(None))
    assert(splitRows.exists(_._1 == 3L) && splitRows.exists(_._1 == 4L))
    // the split's supersede window runs over the HOT subset only —
    // the cold branch reaches the union with no Window above it
    val windowedUnder = split.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.collectLeaves().size
    }
    val allLeaves = split.queryExecution.optimizedPlan.collectLeaves().size
    assert(windowedUnder.forall(_ < allLeaves),
      "the supersede window must not sit over the whole store scan")
  }

  test("bm25FromIndex stats sidecar: the sidecar-corrected path is " +
      "bit-equal to the derived-stats path across a live re-ingest + " +
      "tombstone delta, the fully-compacted path runs with NO " +
      "per-query store checkpoint, and a torn sidecar self-heals on " +
      "the next ingest batch") {
    import spark.implicits._
    import graft.operators.TextStats
    val dir =
      java.nio.file.Files.createTempDirectory("graft-sidecar").toString
    val marker = new java.io.File(s"$dir/_stats_committed")
    // compactEvery=2: batches 0-1 fold at batch 2; slices 2-3 stay
    // live with a double re-ingest of doc 1 and a tombstone of doc 2
    Seq(
      (Seq((1L, "alpha beta gamma"), (2L, "gamma delta"),
        (3L, "epsilon zeta alpha")), 0L),
      (Seq((4L, "eta theta alpha")), 1L),
      (Seq((1L, "alpha v2")), 2L),
      (Seq((1L, "alpha v3 beta"),
        (2L, null.asInstanceOf[String])), 3L)
    ).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        dir, "doc_id", "text", compactEvery = 2)
    }
    assert(IngestStore.boundary(spark, dir) === 2L)
    assert(marker.exists, "compaction must commit the stats sidecar")
    assert(scala.io.Source.fromFile(marker).mkString.trim === "2")
    val qs = Seq((9L, "alpha beta"), (8L, "gamma delta"))
      .toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    def query() = Streaming.bm25FromIndex(spark, dir, qs,
      "qid", "qtext", k = 10, maxDocFreq = None)
    val viaSidecar = rows(query())
    // the delta-corrected stats equal the batch operator on the
    // LATEST corpus (doc 1 at its v3 text, doc 2 gone)...
    val latest = Seq((1L, "alpha v3 beta"), (3L, "epsilon zeta alpha"),
      (4L, "eta theta alpha")).toDF("doc_id", "text")
    assert(viaSidecar === rows(TextStats.bm25TopK(latest, "doc_id",
      "text", qs, "qid", "qtext", k = 10)))
    // ...and are BIT-equal to the derive-from-postings spelling
    // (delete the marker: the sidecar reads as absent)
    assert(marker.delete())
    assert(rows(query()) === viaSidecar)
    // torn sidecar self-heals: the next ingest batch sees a marker
    // that does not name the boundary and rewrites the fold
    Streaming.indexIngestBatch(
      Seq((5L, "iota kappa")).toDF("doc_id", "text"), 4L,
      dir, "doc_id", "text", compactEvery = 2)
    assert(marker.exists, "stale sidecar must be rewritten on ingest")
    assert(scala.io.Source.fromFile(marker).mkString.trim === "4")
    // fully compacted (NO live slices): ingest one more live slice,
    // fold EVERYTHING, refresh the sidecar (the same maintenance call
    // indexIngestBatch makes per batch) — stats then apply verbatim
    // and the query plan carries no per-query localCheckpoint at all:
    // the store scan feeds the candidate join once, un-checkpointed
    Streaming.indexIngestBatch(
      Seq((5L, "iota kappa")).toDF("doc_id", "text"), 5L,
      dir, "doc_id", "text", compactEvery = 0)
    IngestStore.compact(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tf",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("len",
          org.apache.spark.sql.types.LongType))),
      upTo = 6L, latestPerKey = Some("doc"))
    Streaming.writeBm25Stats(spark, dir)
    assert(scala.io.Source.fromFile(marker).mkString.trim === "6")
    val flat = query()
    val latestAll = Seq((1L, "alpha v3 beta"),
      (3L, "epsilon zeta alpha"), (4L, "eta theta alpha"),
      (5L, "iota kappa")).toDF("doc_id", "text")
    assert(rows(flat) === rows(TextStats.bm25TopK(latestAll, "doc_id",
      "text", qs, "qid", "qtext", k = 10)))
    val rdds = flat.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }
    assert(rdds.isEmpty,
      "the fully-compacted sidecar path must not checkpoint the " +
        "store (or anything else) per query")
    // ...and the query-term pushdown reaches the scan: with no window
    // intervening, the static In(token, ...) filter lands in the
    // parquet scan's PushedFilters, so token-clustered row groups
    // outside the query's term range never read
    val flatStr = flat.queryExecution.executedPlan.toString
    assert(flatStr.contains("In(token") || flatStr.contains("EqualTo(token"),
      "query-term filter must reach the scan's PushedFilters:\n" +
        flatStr.linesIterator.filter(_.contains("PushedFilters"))
          .mkString("\n"))
  }

  test("bm25FromIndex randomized store-lifecycle parity: seeded " +
      "random batches, revisions, tombstones and compaction cadences " +
      "— the store query (sidecar, delta correction, term pushdown, " +
      "live-key split, all exercised at whatever state the walk " +
      "lands in) equals the batch operator on the latest corpus") {
    import spark.implicits._
    import graft.operators.TextStats
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta", "iota", "kappa")
    def text(): String =
      Seq.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-rand-idx-$trial").toString
      val nBatches = 4 + rnd.nextInt(3)     // 4-6 batches
      val compactEvery = 1 + rnd.nextInt(3) // 1-3: several folds
      var latest = Map.empty[Long, Option[String]]
      var nextId = 1L
      for (b <- 0 until nBatches) {
        val news = (0 until (2 + rnd.nextInt(4))).map { _ =>
          val id = nextId; nextId += 1; id -> Some(text())
        }
        val existing = latest.keys.toVector.sorted
        val mods =
          if (existing.isEmpty) Seq.empty
          else (0 until rnd.nextInt(3)).map { _ =>
            val id = existing(rnd.nextInt(existing.size))
            id -> (if (rnd.nextBoolean()) Some(text()) else None)
          }
        val batch = (news ++ mods).toMap // one row per id per batch
        latest ++= batch
        Streaming.indexIngestBatch(
          batch.toSeq.map { case (id, t) => (id, t.orNull) }
            .toDF("doc_id", "text"),
          b.toLong, dir, "doc_id", "text", compactEvery)
      }
      val corpus = latest.collect { case (id, Some(t)) => (id, t) }.toSeq
      val someDoc = corpus(rnd.nextInt(corpus.size))._2
        .split(" ").take(3).mkString(" ")
      val qs = Seq(
        (901L, s"${vocab(rnd.nextInt(vocab.size))} " +
          s"${vocab(rnd.nextInt(vocab.size))}"),
        (902L, someDoc),
        (903L, "unseen_token")).toDF("qid", "qtext")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getDouble(3))).toSet
      val viaStore = rows(Streaming.bm25FromIndex(spark, dir, qs,
        "qid", "qtext", k = 5, maxDocFreq = None))
      val viaBatch = rows(TextStats.bm25TopK(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        qs, "qid", "qtext", k = 5))
      assert(viaStore === viaBatch,
        s"trial $trial (nBatches=$nBatches compactEvery=$compactEvery)")
    }
  }

  test("annFromStore probed-cell pushdown: the static IN-filter " +
      "reaches the scan on a compacted store, sits ABOVE the " +
      "supersede on a live one (a version moved to an un-probed cell " +
      "never resurfaces its stale probed-cell sibling), and both " +
      "spellings answer identically") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft-cellpush").toString
    // four clean clusters at (±1,0),(0,±1) → nCells=4 model; vec 5
    // starts in the (1,0) cluster and MOVES to the (-1,0) cluster in
    // a live batch-1 re-ingest
    val b0 = Seq(
      1L -> Seq(1.0, 0.05), 2L -> Seq(1.0, -0.05), 3L -> Seq(0.95, 0.0),
      5L -> Seq(0.9, 0.1),
      10L -> Seq(0.0, 1.0), 11L -> Seq(-0.05, 1.0),
      20L -> Seq(-1.0, 0.0), 21L -> Seq(-0.95, -0.05),
      30L -> Seq(0.0, -1.0), 31L -> Seq(0.05, -1.0))
    Streaming.embIngestBatch(b0.toDF("vec_id", "embedding"), 0L, dir,
      "vec_id", "embedding", nCells = 4, compactEvery = 0)
    Streaming.embIngestBatch(
      Seq(5L -> Seq(-0.99, 0.0)).toDF("vec_id", "embedding"), 1L, dir,
      "vec_id", "embedding", nCells = 4, compactEvery = 0)
    val qs = Seq(9L -> Seq(1.0, 0.0)).toDF("vec_id", "embedding")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val live = Streaming.annFromStore(spark, dir, qs,
      "vec_id", "embedding", k = 2, nProbe = 1)
    val liveIds = ids(live)
    // the moved vector's latest version lives in an un-probed cell:
    // it must not appear — and neither may its STALE probed-cell
    // version (the filter sits above the supersede window)
    assert(!liveIds.exists(_._3 == 5L))
    assert(liveIds.map(_._3).subsetOf(Set(1L, 2L, 3L)))
    // fully compacted: same answer, and the IN-filter is now PUSHED
    // to the parquet scan (no window intervenes)
    IngestStore.compact(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("cn",
          org.apache.spark.sql.types.DoubleType))),
      upTo = 2L, latestPerKey = Some("vec"), sortBy = Seq("cell"))
    val flat = Streaming.annFromStore(spark, dir, qs,
      "vec_id", "embedding", k = 2, nProbe = 1)
    assert(ids(flat) === liveIds)
    val scanStr = flat.queryExecution.executedPlan.toString
    // one probed cell folds In(cell, [c]) to EqualTo(cell, c)
    assert(scanStr.contains("In(cell") || scanStr.contains("EqualTo(cell"),
      s"probed-cell filter must reach the scan's PushedFilters:\n" +
        scanStr.linesIterator.filter(_.contains("PushedFilters"))
          .mkString("\n"))
    // probing every cell buys no selectivity: the filter is skipped
    // and the all-cells answer still equals brute force (q224's gate
    // covers the oracle form; here just the no-filter plan)
    val all = Streaming.annFromStore(spark, dir, qs,
      "vec_id", "embedding", k = 2, nProbe = 4)
    val allStr = all.queryExecution.executedPlan.toString
    assert(!allStr.contains("In(cell") && !allStr.contains("EqualTo(cell"))
  }

  test("as-of retrieval: bm25FromIndex/annFromStore pin a corpus " +
      "moment — later ingests AND later redactions are invisible, the " +
      "supersede applies WITHIN the snapshot, and the result is " +
      "stable while ingest continues") {
    import spark.implicits._
    import graft.operators.{Similarity, TextStats}
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val idxDir = tmp("graft-idx-asof")
    val b0 = Seq((1L, "secret alpha"), (2L, "beta gamma"))
    val b1 = Seq((2L, "beta REVISED"))                 // revise doc 2
    val b2 = Seq((1L, null.asInstanceOf[String]),      // redact doc 1
      (3L, "delta epsilon"))                           // new doc
    Seq((b0, 0L), (b1, 1L), (b2, 2L)).foreach { case (rows, id) =>
      Streaming.indexIngestBatch(rows.toDF("doc_id", "text"), id,
        idxDir, "doc_id", "text", compactEvery = 0)
    }
    val qs = Seq((9L, "secret beta delta REVISED")).toDF("qid", "qtext")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    def fromIdx(asOf: Option[Long]) =
      rows(Streaming.bm25FromIndex(spark, idxDir, qs, "qid", "qtext",
        k = 10, maxDocFreq = None, asOf = asOf))
    def batchOver(docs: Seq[(Long, String)]) =
      rows(TextStats.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", qs, "qid", "qtext", k = 10))
    // as of batch 0: doc 1 alive, doc 2 original, doc 3 absent
    assert(fromIdx(Some(0L)) === batchOver(b0))
    // as of batch 1: the supersede applies WITHIN the snapshot (doc 2
    // revised, once); the later redaction of doc 1 is invisible
    assert(fromIdx(Some(1L)) ===
      batchOver(Seq((1L, "secret alpha"), (2L, "beta REVISED"))))
    // the live read sees the redaction and the new doc
    assert(fromIdx(None) === batchOver(Seq(
      (1L, null.asInstanceOf[String]), (2L, "beta REVISED"),
      (3L, "delta epsilon"))))

    // the embedding analogue: a pinned probe over the batch-0 corpus
    val embDir = tmp("graft-emb-asof")
    val e0 = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
    val e1 = Seq((1L, null.asInstanceOf[Seq[Double]]), // redact vec 1
      (3L, Seq(0.9, 0.1)))
    Seq((e0, 0L), (e1, 1L)).foreach { case (rows, id) =>
      Streaming.embIngestBatch(rows.toDF("vec_id", "embedding"), id,
        embDir, "vec_id", "embedding", nCells = 2, compactEvery = 0)
    }
    val vq = Seq((9L, Seq(1.0, 0.05))).toDF("vec_id", "embedding")
    assert(rows(Streaming.annFromStore(spark, embDir, vq,
        "vec_id", "embedding", k = 3, nProbe = 2, asOf = Some(0L))) ===
      rows(Similarity.bruteForceTopK(vq, "vec_id", "embedding",
        e0.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3)))
    val liveIds = Streaming.annFromStore(spark, embDir, vq,
      "vec_id", "embedding", k = 3, nProbe = 2)
      .collect().map(_.getLong(2)).toSet
    assert(liveIds === Set(2L, 3L))
  }

  test("migrateEmbStore: replays the latest-version vectors through a " +
      "fresh model into a NEW store — the old store serves unchanged " +
      "mid-migration, tombstoned ids drop, and a non-empty target is " +
      "refused") {
    import spark.implicits._
    import graft.operators.Similarity
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val oldDir = tmp("graft-emb-mig-old")
    val b0 = Seq((1L, Seq(1.0, 0.1)), (2L, Seq(0.9, 0.2)),
      (3L, Seq(-1.0, 0.3)), (4L, Seq(-0.8, 0.1)))
    val b1 = Seq((5L, Seq(0.95, 0.05)),
      (3L, null.asInstanceOf[Seq[Double]])) // redact vec 3, pre-compaction
    Seq((b0, 0L), (b1, 1L)).foreach { case (rows, id) =>
      Streaming.embIngestBatch(rows.toDF("vec_id", "embedding"), id,
        oldDir, "vec_id", "embedding", nCells = 2, compactEvery = 100)
    }
    val qs = Seq((9L, Seq(1.0, 0.0)), (10L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val before = rows(Streaming.annFromStore(spark, oldDir, qs,
      "vec_id", "embedding", k = 3, nProbe = 2))
    // migrate to doubled resolution
    val newDir = tmp("graft-emb-mig-new")
    // createTempDirectory makes the dir itself — empty is still "empty"
    val n = Streaming.migrateEmbStore(spark, oldDir, newDir,
      nCells = 4, seed = 7L, lloydIters = 2)
    assert(n === 4L) // vecs 1,2,4,5 — the tombstoned 3 dropped
    // old store untouched, serving bit-identically
    assert(rows(Streaming.annFromStore(spark, oldDir, qs,
      "vec_id", "embedding", k = 3, nProbe = 2)) === before)
    // new store: all-cells probe equals brute force over the LIVE
    // latest corpus under the NEW model
    val live = Seq((1L, Seq(1.0, 0.1)), (2L, Seq(0.9, 0.2)),
      (4L, Seq(-0.8, 0.1)), (5L, Seq(0.95, 0.05)))
      .toDF("vec_id", "embedding")
    assert(rows(Streaming.annFromStore(spark, newDir, qs,
        "vec_id", "embedding", k = 3, nProbe = 4)) ===
      rows(Similarity.bruteForceTopK(qs, "vec_id", "embedding",
        live, "vec_id", "embedding", k = 3)))
    assert(spark.read.parquet(s"$newDir/_centroids").count() === 4L)
    // the migrated store never holds vec 3 in any version
    assert(spark.read.option("basePath", newDir).parquet(newDir)
      .filter(col("vec") === 3L).count() === 0L)
    // a non-empty target refuses (half-migrated targets cannot resume)
    val err = intercept[IllegalArgumentException] {
      Streaming.migrateEmbStore(spark, oldDir, newDir, nCells = 8)
    }
    assert(err.getMessage.contains("not empty"))
  }

  test("intervalJoinStreams renames case-variant column collisions too") {
    import spark.implicits._
    val left = Seq((1L, ts(10), 7.0)).toDF("k", "lts", "Value")
    val right = Seq((1L, ts(11), 8.0)).toDF("k", "rts", "value")
    val out = Streaming.intervalJoinStreams(
      left, right, key = "k", leftTs = "lts", rightTs = "rts",
      within = "10 minutes")
    // right's case-variant 'value' must be suffixed like an exact match
    assert(out.columns.count(_.equalsIgnoreCase("value_r")) === 1)
    val row = out.select(col("Value"), col("value_r")).head()
    assert(row.getDouble(0) === 7.0 && row.getDouble(1) === 8.0)
  }
}
