package graft.operators

import java.nio.file.{Files, Path}

import scala.concurrent.duration._

import graft.SparkSpec

/** Port of the reference's end-to-end "complicated query" fixture
  * (/root/reference/test/complicated.go + complicated_test.go):
  * FromLocalFile → FlatMap(csv decode, header-aware, `Files` metric) →
  * Map(nop) → GroupByKey → Reduce(count, `Events` metric), run
  * DETACHED, then metrics + per-key counts validated. The reference's
  * 946k-row CSV tarball isn't shipped, so the fixture derives its CSVs
  * (and the golden) from the events testdata — same shape, same
  * assertions: Files == #files, Events == #rows, counts == golden.
  */
class ComplicatedQuerySpec extends SparkSpec {

  private def writeCsvFiles(dir: Path, nFiles: Int): (Long, Map[String, Long]) = {
    val rows = graft.Tables(spark, sf("sf0.001"), "events")
      .select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.grouped(math.max(1, rows.length / nFiles + 1)).zipWithIndex
      .foreach { case (chunk, i) =>
        val body = "event_type,event_id\n" +
          chunk.map { case (t, id) => s"$t,$id" }.mkString("\n")
        Files.writeString(dir.resolve(f"part$i%02d.csv"), body)
      }
    (rows.length.toLong,
      rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap)
  }

  private val decodeCsv = new FlatMapper {
    def flatMap(ctx: Context, rows: Seq[KV]): Seq[KV] = rows.flatMap { kv =>
      val lines = Files.readAllLines(
        java.nio.file.Paths.get(kv.valueString))
      ctx.addMetric("Files", 1)
      val header = lines.get(0).split(',')
      val keyIdx = header.indexOf("event_type")
      (1 until lines.size()).map { i =>
        val cols = lines.get(i).split(',')
        KV.of(cols(keyIdx), lines.get(i))
      }
    }
  }

  test("ComplicatedQuery: file walk → csv decode → group → count, detached") {
    val dir = Files.createTempDirectory("graft-complicated")
    val (totalRows, golden) = writeCsvFiles(dir, nFiles = 4)
    val job = Pipeline.fromLocalFile(spark, dir.toString)
      .flatMap(decodeCsv)
      .map(new Mapper { // nop map stage, as in the reference fixture
        def map(ctx: Context, rows: Seq[KV]): Seq[KV] = rows
      })
      .groupByKey()
      .reduce(new ReducerFactory {
        def create(key: String): Reducer = new Reducer {
          private var n = 0L
          def reduce(ctx: Context, row: KV): Unit = {
            n += 1; ctx.addMetric("Events", 1)
          }
          def complete(ctx: Context): Option[KV] =
            Some(KV.of(ctx.partitionKey, n))
        }
      })
      .runInBackground("graft-complicated-query")
    val out = job.waitForResult(2.minutes)
    assert(job.status === "succeeded")
    assert(job.metrics("Files") === 4L)
    assert(job.metrics("Events") === totalRows)
    assert(out.map(kv => kv.key -> kv.valueLong).toMap === golden)
  }

  // GroupByWithPartitionsWithNoInput (reference group_by.go:33-41 +
  // group_by_test.go): more partitions than keys — empty partitions
  // must flow through reduce without emitting anything.
  test("GroupByKey with empty partitions emits only real keys") {
    val rows = Pipeline
      .parallelize(spark, KV.fromStringSliceMap(Map("foo" -> Seq("goo"))))
      .repartition(10)
      .groupByKey()
      .reduce(new ReducerFactory {
        def create(key: String): Reducer = new Reducer {
          private var n = 0L
          def reduce(ctx: Context, row: KV): Unit = n += 1
          def complete(ctx: Context): Option[KV] =
            Some(KV.of(ctx.partitionKey, n))
        }
      })
      .runAndCollect().collect()
    assert(rows.map(kv => kv.key -> kv.valueLong).toMap === Map("foo" -> 1L))
  }
}
