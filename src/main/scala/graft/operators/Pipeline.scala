package graft.operators

import scala.collection.mutable

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import KV.encoder

/** The fluent dataflow builder — the reference's `Pipeline`
  * (/root/reference/pipeline.go) re-expressed over `Dataset[KV]`.
  *
  * Every operator is a pure `Dataset[KV] => Dataset[KV]` step, so the
  * whole pipeline stays one declarative Spark plan: narrow chains
  * (map/flatMap/filter/sort/do) fuse into a single stage with no
  * shuffle (the reference's PreservePartitioner rule, which Spark's DAG
  * scheduler applies automatically — SURVEY §2.3 #3), and partitioning
  * directives compile to explicit `repartition` exchanges.
  *
  * Scale: no driver-side materialization anywhere; state for
  * reduce/sort is per-partition and spills via Spark (the reference
  * keeps both unbounded in memory — SURVEY §4.2).
  */
final class Pipeline private (
    val spark: SparkSession,
    ds: Dataset[KV],
    broadcasts: Map[String, Any],
    metricsAcc: MetricsAccumulator) {

  import Pipeline.TaskCtx

  private def next(d: Dataset[KV]): Pipeline =
    new Pipeline(spark, d, broadcasts, metricsAcc)

  private def bc: Broadcast[Map[String, Any]] =
    Pipeline.broadcastCache.synchronized {
      Pipeline.broadcastCache.getOrElseUpdate(
        (spark, broadcasts),
        spark.sparkContext.broadcast(broadcasts))
    }

  /** C1 — register a broadcast value readable via `ctx.broadcast(key)`
    * (reference pipeline.go:51-56). */
  def broadcast(key: String, value: Any): Pipeline =
    new Pipeline(spark, ds, broadcasts + (key -> value), metricsAcc)

  // ---------------------------------------------------------------- T1–T7

  def map(m: Mapper): Pipeline = {
    val (b, acc) = (bc, metricsAcc)
    next(ds.mapPartitions { it =>
      val ctx = new TaskCtx(b, acc)
      it.grouped(Pipeline.BatchSize).flatMap(batch => m.map(ctx, batch))
    })
  }

  def flatMap(fm: FlatMapper): Pipeline = {
    val (b, acc) = (bc, metricsAcc)
    next(ds.mapPartitions { it =>
      val ctx = new TaskCtx(b, acc)
      it.grouped(Pipeline.BatchSize).flatMap(batch => fm.flatMap(ctx, batch))
    })
  }

  def filter(f: RowFilter): Pipeline =
    next(ds.filter((kv: KV) => f.accept(kv)))

  /** T3 — per-key fold within each partition; one row per key per
    * partition at end-of-input. Precede with `groupByKey()` for one
    * row per key globally (parity trap #1, SURVEY §2.3). */
  def reduce(rf: ReducerFactory): Pipeline = {
    val (b, acc) = (bc, metricsAcc)
    next(ds.mapPartitions { it =>
      val ctx = new TaskCtx(b, acc)
      val states = mutable.LinkedHashMap.empty[String, Reducer]
      it.foreach { row =>
        val r = states.getOrElseUpdate(row.key, {
          val r0 = rf.create(row.key)
          ctx.currentKey = row.key
          r0.init(ctx)
          r0
        })
        ctx.currentKey = row.key
        r.reduce(ctx, row)
      }
      states.iterator.flatMap { case (key, r) =>
        ctx.currentKey = key
        r.complete(ctx)
      }
    })
  }

  /** T4 — partition-local sort with a user comparator (NOT global;
    * use after groupByKey() for per-key total order). */
  def sort(s: Sorter): Pipeline =
    next(ds.mapPartitions { it =>
      val buf = it.toArray
      java.util.Arrays.sort(
        buf,
        ((a: KV, b: KV) =>
          if (s.isLessThan(a, b)) -1
          else if (s.isLessThan(b, a)) 1
          else 0): java.util.Comparator[KV])
      buf.iterator
    })

  /** T5 — raw iterator-in/iterator-out stage. */
  def transform(t: Transformer): Pipeline = {
    val (b, acc) = (bc, metricsAcc)
    next(ds.mapPartitions { it => t.transform(new TaskCtx(b, acc), it) })
  }

  // ---------------------------------------------------------------- P1–P5

  /** P1 — hash-partition by key so the next stage sees every row of a
    * key in one task (reference pipeline.go:91-94). */
  def groupByKey(): Pipeline = next(ds.repartition(col("key")))

  def groupByKey(numPartitions: Int): Pipeline =
    next(ds.repartition(numPartitions, col("key")))

  /** P2 — finite-key partitioner; rows with unknown keys are silently
    * dropped (reference partitions/partitioner.go:62-92 + the ErrNoOutput
    * drop at output/writer.go:41-45), counted in the `droppedRows`
    * metric (the reference TODO's this alert). */
  def groupByKnownKeys(keys: Seq[String]): Pipeline = {
    val acc = metricsAcc
    val keySet = keys.toSet
    val kept = ds.mapPartitions { it =>
      it.filter { kv =>
        val ok = keySet.contains(kv.key)
        if (!ok) acc.add(("droppedRows", 1L))
        ok
      }
    }
    next(kept.repartition(math.max(keys.size, 1), col("key")))
  }

  /** P3 — round-robin redistribution, key-oblivious
    * (reference partitions/partitioner.go:110-127). */
  def shuffle(): Pipeline = next(ds.repartition(ds.rdd.getNumPartitions))

  /** P4 — set partition count for the next stage. */
  def repartition(n: Int): Pipeline = next(ds.repartition(n))

  /** P5 — custom partitioner: user maps a row to a partition id in
    * [0, n). RDD detour: Dataset has no arbitrary-partitioner API. */
  def partitionedBy(n: Int)(part: KV => Int): Pipeline = {
    val rdd = ds.rdd
      .keyBy(part)
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    next(spark.createDataset(rdd))
  }

  // ---------------------------------------------------------------- runs

  def dataset: Dataset[KV] = ds

  /** R1 — attached run; rows stream back to the driver
    * (`Result.outputs` is `toLocalIterator`). */
  def runAndCollect(): Result = new Result(ds, metricsAcc)

  /** R2 — detached run (reference pipeline.go:153-177): the action runs
    * under a job group so it can be aborted/polled by job id, in-process
    * (the reference's cross-process etcd choreography collapses into
    * driver-local state — SURVEY §3.2). */
  def runInBackground(jobId: String = java.util.UUID.randomUUID().toString)
      : RunningJob =
    RunningJob.start(jobId, spark, ds, metricsAcc)
}

object Pipeline {
  /** Physical batch size fed to Mapper/FlatMapper — mirrors the
    * reference's batched channels; carries no semantics. */
  val BatchSize = 256

  // One spark Broadcast per distinct broadcast-map per session.
  private val broadcastCache =
    mutable.HashMap.empty[(SparkSession, Map[String, Any]), Broadcast[Map[String, Any]]]

  /** S1 — source from in-memory rows (reference lrmr.go:12-14). */
  def parallelize(spark: SparkSession, data: Seq[KV]): Pipeline =
    fromDataset(spark.createDataset(data))

  /** S2 — source = recursive file walk emitting ONE ROW PER FILE PATH
    * (value = path); decoding is a downstream FlatMap's job, exactly as
    * the reference (lrmr.go:17-19, input.go:11-22). For real columnar
    * reads use `fromDataFrame`/Tables — this exists for parity. */
  def fromLocalFile(spark: SparkSession, root: String): Pipeline = {
    import scala.jdk.CollectionConverters._
    val paths = java.nio.file.Files
      .walk(java.nio.file.Paths.get(root))
      .iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(_.toString).toSeq.sorted
    parallelize(spark, paths.map(p => KV.of(p, p)))
  }

  /** S3 — pluggable feeder: any Dataset[KV] (or DataFrame via
    * fromDataFrame) is a source. */
  def fromDataset(ds: Dataset[KV]): Pipeline =
    new Pipeline(ds.sparkSession, ds, Map.empty, {
      val acc = new MetricsAccumulator
      ds.sparkSession.sparkContext.register(acc, "graft.pipeline.metrics")
      acc
    })

  /** Bridge from the relational surface: key = stringified keyExpr,
    * value = UTF-8 of valueExpr. */
  def fromDataFrame(
      df: org.apache.spark.sql.DataFrame,
      keyCol: String,
      valueCol: String): Pipeline = {
    import org.apache.spark.sql.functions._
    fromDataset(
      df.select(
        coalesce(col(keyCol).cast("string"), lit("")).as("key"),
        col(valueCol).cast("string").as("value"))
        .withColumn("value", col("value").cast("binary"))
        .as[KV](KV.encoder))
  }

  private[operators] final class TaskCtx(
      bc: Broadcast[Map[String, Any]],
      acc: MetricsAccumulator) extends Context {
    var currentKey: String = ""
    override def broadcast(key: String): Any = bc.value(key)
    override def addMetric(name: String, delta: Long): Unit =
      acc.add((name, delta))
    override def partitionId: Int = org.apache.spark.TaskContext.getPartitionId()
    override def partitionKey: String = currentKey
  }
}
