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
  * Scale: no driver-side materialization anywhere. `reduce`/`sort`
  * keep per-partition state on the JVM heap — the same memory profile
  * as the reference (SURVEY §4.2), because their contracts (streaming
  * per-key fold with first-seen emission order; arbitrary comparator)
  * preclude Spark's spilling operators. For spill-friendly, map-side-
  * combined aggregation use [[combine]], which compiles to Spark's
  * partial+final hash aggregation.
  */
final class Pipeline private (
    val spark: SparkSession,
    ds: Dataset[KV],
    broadcasts: Map[String, Any],
    bcHolder: Pipeline.BcHolder,
    metricsAcc: MetricsAccumulator,
    workers: Option[Int],
    slotsPerWorker: Option[Int]) {

  import Pipeline.TaskCtx

  private def next(d: Dataset[KV]): Pipeline =
    new Pipeline(spark, d, broadcasts, bcHolder, metricsAcc,
      workers, slotsPerWorker)

  // One Spark Broadcast per pipeline chain, created on first use and
  // invalidated when `broadcast()` extends the map. Scoped to the chain
  // (not a process-global cache) so Spark's ContextCleaner can reclaim
  // it once the pipeline is unreferenced.
  private def bc: Broadcast[Map[String, Any]] = bcHolder.synchronized {
    if (bcHolder.handle == null)
      bcHolder.handle = spark.sparkContext.broadcast(broadcasts)
    bcHolder.handle
  }

  /** C1 — register a broadcast value readable via `ctx.broadcast(key)`
    * (reference pipeline.go:51-56). */
  def broadcast(key: String, value: Any): Pipeline =
    new Pipeline(spark, ds, broadcasts + (key -> value),
      new Pipeline.BcHolder, metricsAcc, workers, slotsPerWorker)

  // ------------------------------------------------------------------ C3
  // The reference sizes a stage's task slots as nodes × executors-per-
  // node (pipeline.go:116-124, MaxNodes / ExecutorsPerNode). Spark has
  // no per-stage node placement from its SQL API (documented divergence
  // — SURVEY §2.1 C3/C4), so both compile to ONE number: the partition
  // count used by subsequent partitioning operators (groupByKey /
  // shuffle / groupByKnownKeys). Narrow stages (map/filter/…) inherit
  // their parent's partitioning, exactly like the reference's
  // PreservePartitioner stages; an explicit count passed to an operator
  // still wins over these defaults.

  /** C3 — WithWorkerCount (reference pipeline.go:116-119): subsequent
    * partitioning steps target `n × concurrencyPerWorker` partitions
    * (concurrency defaults to 1 task slot per worker). */
  def withWorkerCount(n: Int): Pipeline = {
    require(n > 0, "worker count must be positive")
    new Pipeline(spark, ds, broadcasts, bcHolder, metricsAcc,
      Some(n), slotsPerWorker)
  }

  /** C3 — WithConcurrencyPerWorker (reference pipeline.go:121-124):
    * task slots per worker; multiplies [[withWorkerCount]] (worker
    * count defaults to 1 if unset). */
  def withConcurrencyPerWorker(n: Int): Pipeline = {
    require(n > 0, "concurrency must be positive")
    new Pipeline(spark, ds, broadcasts, bcHolder, metricsAcc,
      workers, Some(n))
  }

  /** Partition count implied by C3 directives; None = Spark decides
    * (spark.sql.shuffle.partitions / AQE). */
  private def stageSlots: Option[Int] =
    if (workers.isEmpty && slotsPerWorker.isEmpty) None
    else Some(workers.getOrElse(1) * slotsPerWorker.getOrElse(1))

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

  /** T7 — map-side combine (the reference's Combiner contract,
    * transformations.go:209-213) compiled to a typed Spark
    * `Aggregator`: Spark plans it as partial (map-side) + final hash
    * aggregation, so the shuffle carries one accumulator per
    * (task, key) instead of one row per input — no prior
    * `groupByKey()` needed, and aggregation state spills via Spark.
    * Accumulators are kryo-serialized between the partial and final
    * stages (the reference marshals its accumulators the same way).
    */
  def combine[B](cb: Combiner[B])(implicit ct: scala.reflect.ClassTag[B]): Pipeline = {
    import org.apache.spark.sql.{Encoders, expressions}
    val (bh, macc) = (bc, metricsAcc)
    val agg = new expressions.Aggregator[KV, B, B] {
      @transient private lazy val ctx = new TaskCtx(bh, macc)
      def zero: B = null.asInstanceOf[B]
      def reduce(acc: B, row: KV): B = {
        ctx.currentKey = row.key
        if (acc == null) cb.createAccumulator(ctx, row)
        else cb.mergeValue(ctx, acc, row)
      }
      def merge(x: B, y: B): B =
        if (x == null) y else if (y == null) x
        else cb.mergeAccumulators(x, y)
      def finish(acc: B): B = acc
      def bufferEncoder: org.apache.spark.sql.Encoder[B] = Encoders.kryo[B]
      def outputEncoder: org.apache.spark.sql.Encoder[B] = Encoders.kryo[B]
    }
    val combined = ds.groupByKey(_.key)(Encoders.STRING).agg(agg.toColumn)
    next(combined.mapPartitions { it =>
      val ctx = new TaskCtx(bh, macc)
      it.map { case (key, acc) =>
        ctx.currentKey = key
        cb.complete(ctx, key, acc)
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

  /** T4b — partition-local sort by derived COLUMNS instead of a
    * comparator: compiles to Spark's `sortWithinPartitions`, whose
    * external sorter spills to disk — the variant to use when a
    * partition's rows may not fit on the heap (the arbitrary-comparator
    * [[sort]] must hold the partition in memory, same profile as the
    * reference's in-memory sort). Keys sort as strings; pass extractors
    * to sort by derived values. */
  def sortBy(keys: (KV => String)*): Pipeline = {
    require(keys.nonEmpty, "sortBy needs at least one key extractor")
    val spark0 = spark
    import spark0.implicits._
    val extract = keys
    val keyed = ds.map(kv => (extract.map(_(kv)), kv))
    next(keyed.toDF("sk", "row")
      .sortWithinPartitions((0 until extract.length)
        .map(i => col("sk").getItem(i)): _*)
      .select("row.key", "row.value").as[KV])
  }

  /** T5 — raw iterator-in/iterator-out stage. */
  def transform(t: Transformer): Pipeline = {
    val (b, acc) = (bc, metricsAcc)
    next(ds.mapPartitions { it => t.transform(new TaskCtx(b, acc), it) })
  }

  // ---------------------------------------------------------------- P1–P5

  /** P1 — hash-partition by key so the next stage sees every row of a
    * key in one task (reference pipeline.go:91-94). Partition count:
    * explicit `numPartitions` > C3 directives > Spark's default. */
  def groupByKey(): Pipeline = stageSlots match {
    case Some(n) => groupByKey(n)
    case None => next(ds.repartition(col("key")))
  }

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
    * (reference partitions/partitioner.go:110-127). Count: C3
    * directives if set, else the cluster's task-slot count
    * (defaultParallelism) — the reference redistributes across cluster
    * slots, and asking the current PLAN for its partition count
    * (`queryExecution.toRdd` / `ds.rdd`) would, under AQE, eagerly
    * execute every upstream stage at build time and then run them
    * again at the real action. */
  def shuffle(): Pipeline = {
    val n = stageSlots.getOrElse(spark.sparkContext.defaultParallelism)
    next(ds.repartition(n))
  }

  /** P4 — set partition count for the next stage. */
  def repartition(n: Int): Pipeline = next(ds.repartition(n))

  /** P5 — custom partitioner: user maps a row to a partition id in
    * [0, n). RDD detour: Dataset has no arbitrary-partitioner API.
    * NB under AQE the `.rdd` access materializes the UPSTREAM stages
    * at build time; their shuffle outputs remain referenced by the
    * returned RDD lineage, so the action reuses (not re-runs) them —
    * the cost is early execution, not double execution. */
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

  /** Lazily-created Broadcast handle shared along one pipeline chain
    * (fresh holder whenever `broadcast()` changes the map). */
  private[operators] final class BcHolder {
    var handle: Broadcast[Map[String, Any]] = null
  }

  /** S1 — source from in-memory rows (reference lrmr.go:12-14). */
  def parallelize(spark: SparkSession, data: Seq[KV]): Pipeline =
    fromDataset(spark.createDataset(data))

  /** S2 — source = recursive file walk emitting ONE ROW PER FILE PATH
    * (value = path); decoding is a downstream FlatMap's job, exactly as
    * the reference (lrmr.go:17-19, input.go:11-22). For real columnar
    * reads use `fromDataFrame`/Tables — this exists for parity. */
  def fromLocalFile(spark: SparkSession, root: String): Pipeline = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    val paths =
      try walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).toSeq.sorted
      finally walk.close() // the stream holds open directory handles
    parallelize(spark, paths.map(p => KV.of(p, p)))
  }

  /** S3 — pluggable feeder: any Dataset[KV] (or DataFrame via
    * fromDataFrame) is a source. */
  def fromDataset(ds: Dataset[KV]): Pipeline =
    new Pipeline(ds.sparkSession, ds, Map.empty, new BcHolder, {
      val acc = new MetricsAccumulator
      ds.sparkSession.sparkContext.register(acc, "graft.pipeline.metrics")
      acc
    }, None, None)

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
