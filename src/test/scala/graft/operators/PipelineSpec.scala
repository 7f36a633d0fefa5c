package graft.operators

import scala.concurrent.duration._

import graft.SparkSpec

/** Ports of the reference's pipeline fixtures with their golden outputs
  * (FIXTURES.md §A; goldens from /root/reference/test/ *_test.go). */
class PipelineSpec extends SparkSpec {

  private def countReducer(metric: Option[String] = None): ReducerFactory =
    new ReducerFactory {
      def create(key: String): Reducer = new Reducer {
        private var n = 0L
        def reduce(ctx: Context, row: KV): Unit = {
          n += 1
          metric.foreach(m => ctx.addMetric(m, 1))
        }
        def complete(ctx: Context): Option[KV] = Some(KV.of(ctx.partitionKey, n))
      }
    }

  // A1 — SimpleCount golden: foo→2, bar→1, metric Events==3
  // (/root/reference/test/group_by_test.go:105-127)
  test("SimpleCount: groupByKey + count reduce") {
    val input = KV.fromStringSliceMap(
      Map("foo" -> Seq("goo", "hoo"), "bar" -> Seq("baz")))
    val result = Pipeline.parallelize(spark, input)
      .groupByKey()
      .reduce(countReducer(metric = Some("Events")))
      .runAndCollect()
    val rows = result.collect()
    val byKey = rows.map(kv => kv.key -> kv.valueLong).toMap
    assert(rows.size === 2)
    assert(byKey === Map("foo" -> 2L, "bar" -> 1L))
    assert(result.metrics("Events") === 3L)
  }

  // A2 — Map: 3 chained ×2 maps over 1..1000; golden max 8000, 1000 rows
  // (/root/reference/test/map_test.go:16-32)
  test("Map: three chained narrow stages") {
    val times2 = new Mapper {
      def map(ctx: Context, rows: Seq[KV]): Seq[KV] =
        rows.map(kv => KV.of(kv.key, kv.valueLong * 2))
    }
    val rows = Pipeline.parallelize(spark, KV.fromInts(1 to 1000: _*))
      .map(times2).map(times2).map(times2)
      .runAndCollect().collect()
    assert(rows.size === 1000)
    assert(rows.map(_.valueLong).max === 8000L)
  }

  // A3 — FlatMap: 3 chained n→[2n,2n]; 8000 rows out
  // (/root/reference/test/flatmap_test.go)
  test("FlatMap: row multiplication") {
    val dup2 = new FlatMapper {
      def flatMap(ctx: Context, rows: Seq[KV]): Seq[KV] =
        rows.flatMap(kv =>
          Seq(KV.of(kv.key, kv.valueLong * 2), KV.of(kv.key, kv.valueLong * 2)))
    }
    val rows = Pipeline.parallelize(spark, KV.fromInts(1 to 1000: _*))
      .flatMap(dup2).flatMap(dup2).flatMap(dup2)
      .runAndCollect().collect()
    assert(rows.size === 8000)
    assert(rows.map(_.valueLong).max === 8000L)
  }

  // A4 — Sort golden: foo→"6789", bar→"2345", baz→"1359"
  // (/root/reference/test/sort_test.go:26-35): partition-local sort
  // after groupByKey, then ordered concat in the reduce.
  test("Sort: partition-local ordered reduce") {
    val input = KV.fromIntSliceMap(Map(
      "foo" -> Seq(9, 8, 7, 6),
      "bar" -> Seq(5, 4, 3, 2),
      "baz" -> Seq(9, 5, 1, 3)))
    val ascByValue = new Sorter {
      def isLessThan(a: KV, b: KV): Boolean =
        if (a.key != b.key) a.key < b.key
        else a.valueLong < b.valueLong
    }
    val concat = new ReducerFactory {
      def create(key: String): Reducer = new Reducer {
        private val sb = new StringBuilder
        def reduce(ctx: Context, row: KV): Unit = sb.append(row.valueString)
        def complete(ctx: Context): Option[KV] =
          Some(KV.of(ctx.partitionKey, sb.toString))
      }
    }
    val rows = Pipeline.parallelize(spark, input)
      .groupByKey()
      .sort(ascByValue)
      .reduce(concat)
      .runAndCollect().collect()
    val byKey = rows.map(kv => kv.key -> kv.valueString).toMap
    assert(byKey === Map("foo" -> "6789", "bar" -> "2345", "baz" -> "1359"))
  }

  // T4b — the spill-friendly columnar sort must agree with the
  // comparator sort AND compile to Spark's external (spillable) sorter
  // instead of an in-heap array.
  test("sortBy: agrees with comparator sort, plans as sortWithinPartitions") {
    val input = KV.fromIntSliceMap(Map(
      "foo" -> Seq(9, 8, 7, 6),
      "bar" -> Seq(5, 4, 3, 2)))
    def lpad(kv: KV): String = f"${kv.valueLong}%019d"
    val p = Pipeline.parallelize(spark, input)
      .groupByKey(1)
      .sortBy(_.key, lpad)
    val rows = p.runAndCollect().collect()
    assert(rows.map(kv => (kv.key, kv.valueLong)).toSeq ===
      Seq(("bar", 2L), ("bar", 3L), ("bar", 4L), ("bar", 5L),
        ("foo", 6L), ("foo", 7L), ("foo", 8L), ("foo", 9L)))
    val plan = p.dataset.queryExecution.executedPlan.toString
    assert(plan.contains("Sort ") && !plan.contains("global=true"),
      plan.take(1200))
  }

  // P2 — GroupByKnownKeys: unknown keys silently dropped, counted
  // (reference partitions/partitioner.go:86-92, output/writer.go:41-45)
  test("GroupByKnownKeys: silent drop of unknown keys + drop metric") {
    val input = KV.fromStringSliceMap(Map(
      "a" -> Seq("1", "2"), "b" -> Seq("3"), "zz" -> Seq("4", "5", "6")))
    val result = Pipeline.parallelize(spark, input)
      .groupByKnownKeys(Seq("a", "b"))
      .reduce(countReducer())
      .runAndCollect()
    val byKey = result.collect().map(kv => kv.key -> kv.valueLong).toMap
    assert(byKey === Map("a" -> 2L, "b" -> 1L))
    assert(result.metrics("droppedRows") === 3L)
  }

  // S2 — FromLocalFile: one row per file path, decode downstream
  // (reference lrmr.go:17-19, input.go:11-22)
  test("FromLocalFile: one row per file, value = path, decode is user-land") {
    val dir = java.nio.file.Files.createTempDirectory("graft-s2")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("sub"))
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "1,2,3")
    java.nio.file.Files.writeString(sub.resolve("b.txt"), "4,5")
    val rows = Pipeline.fromLocalFile(spark, dir.toString)
      .flatMap(new FlatMapper {
        def flatMap(ctx: Context, rows: Seq[KV]): Seq[KV] = rows.flatMap { kv =>
          val text = new String(
            java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(kv.valueString)), "UTF-8")
          text.split(',').map(v => KV.of(kv.key, v.toLong))
        }
      })
      .runAndCollect().collect()
    assert(rows.map(_.valueLong).sorted === Seq(1L, 2L, 3L, 4L, 5L))
  }

  // C1 — Broadcast through context (reference test/broadcast.go:15-26);
  // struct-field flavor = plain closure capture, also exercised.
  test("Broadcast: context and closure-captured values") {
    val captured = "foo"
    val rows = Pipeline.parallelize(spark, KV.fromStrings("x"))
      .broadcast("throughContext", "bar")
      .map(new Mapper {
        def map(ctx: Context, rows: Seq[KV]): Seq[KV] = rows.map { kv =>
          KV.of(kv.key,
            s"throughStruct=$captured, throughContext=${ctx.broadcast("throughContext")}")
        }
      })
      .runAndCollect().collect()
    assert(rows.head.valueString === "throughStruct=foo, throughContext=bar")
  }

  // T6 — Filter (declared-unused in the reference, realized here)
  test("Filter: keeps accepted rows only") {
    val rows = Pipeline.parallelize(spark, KV.fromInts(1 to 100: _*))
      .filter(new RowFilter {
        def accept(row: KV): Boolean = row.valueLong % 2 == 0
      })
      .runAndCollect().collect()
    assert(rows.size === 50)
    assert(rows.forall(_.valueLong % 2 == 0))
  }

  // T5 — raw Transformer stage
  test("Do/Transform: iterator-in iterator-out") {
    val rows = Pipeline.parallelize(spark, KV.fromInts(1 to 10: _*))
      .repartition(2)
      .transform(new Transformer {
        def transform(ctx: Context, in: Iterator[KV]): Iterator[KV] = {
          var sum = 0L
          in.foreach(kv => sum += kv.valueLong)
          Iterator.single(KV.of(s"p${ctx.partitionId}", sum))
        }
      })
      .runAndCollect().collect()
    assert(rows.map(_.valueLong).sum === 55L)
    assert(rows.size === 2)
  }

  // P5 — custom partitioner: every row routed to its declared partition
  test("PartitionedBy: custom row→partition routing") {
    val rows = Pipeline.parallelize(spark, KV.fromInts(1 to 100: _*))
      .partitionedBy(4)(kv => (kv.valueLong % 4).toInt)
      .transform(new Transformer {
        def transform(ctx: Context, in: Iterator[KV]): Iterator[KV] = {
          val pid = ctx.partitionId
          in.map { kv => assert((kv.valueLong % 4).toInt == pid); kv }
        }
      })
      .runAndCollect().collect()
    assert(rows.size === 100)
  }

  // Partial-reduce parity trap (SURVEY §2.3 #1): without a partitioner,
  // reduce yields per-partition partials.
  test("Reduce without partitioner yields per-partition partials") {
    val input = (1 to 40).map(i => KV.of("k", i.toLong))
    val rows = Pipeline.parallelize(spark, input)
      .repartition(4)
      .reduce(countReducer())
      .runAndCollect().collect()
    assert(rows.size === 4)                       // one partial per partition
    assert(rows.map(_.valueLong).sum === 40L)
  }

  import PipelineSpec.Acc

  private val countSumCombiner = new Combiner[Acc] {
    def createAccumulator(ctx: Context, row: KV): Acc = Acc(1L, row.valueLong)
    def mergeValue(ctx: Context, acc: Acc, row: KV): Acc =
      Acc(acc.n + 1, acc.sum + row.valueLong)
    def mergeAccumulators(a: Acc, b: Acc): Acc = Acc(a.n + b.n, a.sum + b.sum)
    def complete(ctx: Context, key: String, acc: Acc): KV =
      KV.of(key, s"${acc.n}:${acc.sum}")
  }

  // T7 — Combiner (reference transformations.go:209-213): one global
  // row per key with NO explicit groupByKey — combine owns the shuffle.
  test("Combine: map-side combine matches groupByKey+reduce semantics") {
    val input = (1 to 1000).map(i => KV.of(s"k${i % 3}", i.toLong))
    val rows = Pipeline.parallelize(spark, input)
      .repartition(4)
      .combine(countSumCombiner)
      .runAndCollect().collect()
    val byKey = rows.map(kv => kv.key -> kv.valueString).toMap
    val expect = (1 to 1000).groupBy(i => s"k${i % 3}")
      .map { case (k, is) => k -> s"${is.size}:${is.map(_.toLong).sum}" }
    assert(byKey === expect)
  }

  test("Combine: shuffle carries accumulators, not input rows") {
    import java.util.concurrent.atomic.AtomicLong
    val records = new AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          records.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def measure(f: => Unit): Long = {
      spark.sparkContext.addSparkListener(listener)
      records.set(0)
      try {
        f
        // listener events are async; wait until the count settles
        var prev = -1L
        var tries = 0
        while (records.get != prev && tries < 50) {
          prev = records.get; Thread.sleep(100); tries += 1
        }
        records.get
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // parallelize starts at defaultParallelism partitions; measure just
    // the aggregation shuffle of each variant
    val input = (1 to 10000).map(i => KV.of(s"k${i % 5}", i.toLong))
    val naive = measure {
      Pipeline.parallelize(spark, input)
        .groupByKey().reduce(countReducer()).runAndCollect().collect()
    }
    val combined = measure {
      Pipeline.parallelize(spark, input)
        .combine(countSumCombiner).runAndCollect().collect()
    }
    // naive shuffles all 10000 rows; combine shuffles ≤ tasks × 5 keys
    assert(naive >= 10000L, s"naive=$naive")
    assert(combined < naive / 10, s"combined=$combined naive=$naive")
  }

  // C3 — WithWorkerCount / WithConcurrencyPerWorker → partition counts
  // (reference pipeline.go:116-124; divergence documented in scaladoc).
  test("withWorkerCount × withConcurrencyPerWorker sizes the next shuffle") {
    val p = Pipeline.parallelize(spark, KV.fromInts(1 to 100: _*))
      .withWorkerCount(3).withConcurrencyPerWorker(2)
    assert(p.groupByKey().dataset.rdd.getNumPartitions === 6)
    assert(p.shuffle().dataset.rdd.getNumPartitions === 6)
    val w = Pipeline.parallelize(spark, KV.fromInts(1 to 100: _*))
      .withWorkerCount(5)
    assert(w.groupByKey().dataset.rdd.getNumPartitions === 5)
    // explicit count still wins over the directive
    assert(w.groupByKey(2).dataset.rdd.getNumPartitions === 2)
  }

  // R2/R3 — background run, status registry, failure surfacing
  test("RunInBackground: wait + status + fetch by id") {
    val job = Pipeline.parallelize(spark, KV.fromInts(1 to 100: _*))
      .map(new Mapper {
        def map(ctx: Context, rows: Seq[KV]): Seq[KV] = rows
      })
      .runInBackground("graft-test-job-1")
    val rows = job.waitForResult(2.minutes)
    assert(rows.size === 100)
    assert(job.status === "succeeded")
    assert(RunningJob.fetch("graft-test-job-1").exists(_.isDone))
  }

  test("FailingJob: user exception surfaces to waiters") {
    val job = Pipeline.parallelize(spark, KV.fromInts(1 to 10: _*))
      .map(new Mapper {
        def map(ctx: Context, rows: Seq[KV]): Seq[KV] =
          throw new IllegalStateException("failing on purpose")
      })
      .runInBackground("graft-test-job-fail")
    val outcome = job.waitForCompletion(2.minutes)
    assert(outcome.isFailure)
    assert(job.status === "failed")
  }
}

object PipelineSpec {
  /** Public: kryo-encoded accumulators must be public classes. */
  final case class Acc(n: Long, sum: Long)
}
