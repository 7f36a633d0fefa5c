package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** The lrmr-parity dataflow surface (SURVEY §2.1) exercised through the
  * driver's oracle gate: each query builds a `graft.operators.Pipeline`
  * over a testdata table and lands back in a DataFrame whose result an
  * ANSI-SQL oracle can reproduce.
  */
object Pipelines {

  /** Accumulator for the q37 combine — one long per (task, key).
    * (Public: kryo-encoded accumulators must be public classes.) */
  final case class CountAcc(n: Long)

  val defs: Map[String, Q] = Map(

    // T3+P1 — groupByKey + per-key count reduce (the reference's
    // canonical BasicGroupByKey benchmark shape).
    "q19_pipeline_groupby_count" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val events = Tables(s, dir, "events")
        val counted = Pipeline
          .fromDataFrame(events, "event_type", "event_id")
          .groupByKey()
          .reduce(new ReducerFactory {
            def create(key: String): Reducer = new Reducer {
              private var n = 0L
              def reduce(ctx: Context, row: KV): Unit = n += 1
              def complete(ctx: Context): Option[KV] =
                Some(KV.of(ctx.partitionKey, n))
            }
          })
          .dataset
        counted.map(kv => (kv.key, kv.valueLong)).toDF("key", "cnt")
          .orderBy("key")
      },
      oracle = Some("""
        SELECT event_type AS key, count(*) AS cnt
        FROM events GROUP BY event_type ORDER BY key""")),

    // T4+T3 — partition-local sort then ordered concat fold (the
    // reference's Sort fixture shape, test/sort.go:55-63).
    "q20_pipeline_sort_concat" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val events = Tables(s, dir, "events")
          .filter(col("event_id") < 500)
        val sorted = Pipeline
          .fromDataFrame(events, "event_type", "event_id")
          .groupByKey()
          .sort(new Sorter {
            def isLessThan(a: KV, b: KV): Boolean =
              if (a.key != b.key) a.key < b.key
              else a.valueLong < b.valueLong
          })
          .reduce(new ReducerFactory {
            def create(key: String): Reducer = new Reducer {
              private val sb = new StringBuilder
              def reduce(ctx: Context, row: KV): Unit = {
                if (sb.nonEmpty) sb.append(',')
                sb.append(row.valueString)
              }
              def complete(ctx: Context): Option[KV] =
                Some(KV.of(ctx.partitionKey, sb.toString))
            }
          })
          .dataset
        sorted.map(kv => (kv.key, kv.valueString)).toDF("key", "vals")
          .orderBy("key")
      },
      oracle = Some("""
        SELECT event_type AS key,
               string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS vals
        FROM events WHERE event_id < 500
        GROUP BY event_type ORDER BY key""")),

    // P2 — GroupByKnownKeys silent-drop + T1 Map (value transform).
    "q21_pipeline_known_keys" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val events = Tables(s, dir, "events")
        val out = Pipeline
          .fromDataFrame(events, "event_type", "value")
          .groupByKnownKeys(Seq("click", "purchase"))
          .map(new Mapper {
            def map(ctx: Context, rows: Seq[KV]): Seq[KV] =
              rows.map(kv => KV.of(kv.key,
                math.round(kv.valueString.toDouble * 100).toString))
          })
          .reduce(new ReducerFactory {
            def create(key: String): Reducer = new Reducer {
              private var sum = 0L
              def reduce(ctx: Context, row: KV): Unit = sum += row.valueLong
              def complete(ctx: Context): Option[KV] =
                Some(KV.of(ctx.partitionKey, sum))
            }
          })
          .dataset
        out.map(kv => (kv.key, kv.valueLong)).toDF("key", "cents")
          .orderBy("key")
      },
      oracle = Some("""
        SELECT event_type AS key,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type ORDER BY key""")),

    // T7 — Combiner: same result as q19's groupByKey+reduce, but via
    // map-side combine (partial+final hash agg — the shuffle carries
    // one accumulator per task×key instead of one row per event).
    "q37_pipeline_combine" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val events = Tables(s, dir, "events")
        val counted = Pipeline
          .fromDataFrame(events, "event_type", "event_id")
          .combine(new Combiner[CountAcc] {
            def createAccumulator(ctx: Context, row: KV): CountAcc = CountAcc(1L)
            def mergeValue(ctx: Context, acc: CountAcc, row: KV): CountAcc =
              CountAcc(acc.n + 1)
            def mergeAccumulators(a: CountAcc, b: CountAcc): CountAcc =
              CountAcc(a.n + b.n)
            def complete(ctx: Context, key: String, acc: CountAcc): KV =
              KV.of(key, acc.n)
          })
          .dataset
        counted.map(kv => (kv.key, kv.valueLong)).toDF("key", "cnt")
          .orderBy("key")
      },
      oracle = Some("""
        SELECT event_type AS key, count(*) AS cnt
        FROM events GROUP BY event_type ORDER BY key""")),

    // T2 FlatMap + T6 Filter + T5 Do/Transformer — the three parity
    // operators that previously carried only ScalaTest gates, driven
    // through one oracle-expressible chain: each event fans out to
    // (cents, 2·cents), odd values drop, the raw-iterator stage adds
    // one, and a keyed aggregate makes the result deterministic.
    "q129_pipeline_flatmap_filter" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val events = Tables(s, dir, "events")
        val out = Pipeline
          .fromDataFrame(events, "event_type", "value")
          .flatMap(new FlatMapper {
            def flatMap(ctx: Context, rows: Seq[KV]): Seq[KV] =
              rows.flatMap { kv =>
                val cents = math.round(kv.valueString.toDouble * 100)
                Seq(KV.of(kv.key, cents), KV.of(kv.key, cents * 2))
              }
          })
          .filter(new RowFilter {
            def accept(row: KV): Boolean = row.valueLong % 2 == 0
          })
          .transform(new Transformer {
            def transform(ctx: Context, rows: Iterator[KV]): Iterator[KV] =
              rows.map(kv => KV.of(kv.key, kv.valueLong + 1))
          })
          .dataset
        out.map(kv => (kv.key, kv.valueLong)).toDF("key", "v")
          .groupBy("key")
          .agg(count(lit(1)).as("n"), sum("v").as("total"))
          .orderBy("key")
      },
      oracle = Some("""
        WITH base AS (
          SELECT event_type AS key,
                 CAST(round(value * 100) AS BIGINT) AS c
          FROM events),
        exploded AS (
          SELECT key, unnest([c, c * 2]) AS v FROM base),
        f AS (SELECT key, v + 1 AS v FROM exploded WHERE v % 2 = 0)
        SELECT key, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS total
        FROM f GROUP BY key ORDER BY key"""))
  )
}
