package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. Reads go
  * through `spark.read.parquet` so Catalyst gets full pushdown/pruning on
  * the scan — at cluster scale these would be partitioned directories and
  * the same code holds.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // the generated events.ts has shipped as both parquet INT64
      // TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
      // nanosAsLong reads it as a raw long) and as TIMESTAMP(MICROS)
      // (read as TIMESTAMP_NTZ). Normalize BOTH to the contract every
      // consumer here codes against: `ts` = epoch NANOS as a long.
      // Sessions run in UTC, so the NTZ→timestamp cast is a no-op
      // numerically and ns = us * 1000 is exact in long arithmetic.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => raw
        case _ =>
          import org.apache.spark.sql.functions._
          raw.withColumn("ts",
            expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` as a microsecond-precision TimestampType column
    * (truncated from nanos), plus the raw `ts_ns` long. */
  def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // `div` is integral division — `/` would go through double, which
    // cannot represent epoch-nanos (~1.7e18 > 2^53) exactly and flips
    // low-order microseconds on ~2% of rows. The CASE makes it FLOOR
    // division: `div` truncates toward zero, which would round
    // pre-epoch (negative) nanos to the WRONG (later) microsecond.
    apply(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr(
        "ts_ns div 1000 - (CASE WHEN ts_ns % 1000 < 0 THEN 1 ELSE 0 END)")))
  }

  /** Register every table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
