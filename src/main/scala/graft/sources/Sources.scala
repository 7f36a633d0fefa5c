package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink facade (SURVEY §2.2 "Scans/sources" / "Sinks") — the
  * columnar complement to the parity-mode `Pipeline.fromLocalFile`
  * (which, like the reference, emits one row per file path and leaves
  * decoding to the user; /root/reference/lrmr.go:17-19).
  *
  * Contracts chosen for the 100 TB case:
  *   - csv/json REQUIRE a schema: schema inference reads the data an
  *     extra time and can silently widen types between runs — never
  *     acceptable on a large lake. Parquet carries its own schema.
  *   - binary payloads come through Spark's `binaryFile` source as one
  *     (path, modificationTime, length, content) row per file — the
  *     input shape of the multimodal operators.
  *   - writes go through [[writePartitioned]]: hive-style partition
  *     directories give every downstream reader free partition pruning.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan — like parquet it is self-describing columnar with
    * predicate pushdown and column pruning; the lake format beside
    * parquet that Spark supports natively. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** One row per file: (path, modificationTime, length, content:binary).
    * `pathGlobFilter` narrows by file name (e.g. "*.png"). */
  def binaryFiles(spark: SparkSession, path: String,
      pathGlobFilter: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlobFilter)
      .load(path)

  /** Raw text scan: one row per LINE (column `value: string`),
    * compressed files (gzip/bzip2/…) decoded transparently by
    * extension — the ingestion shape of .txt dumps before any
    * structure exists (.jsonl goes through [[json]] with a schema).
    * `wholetext = true` flips to one row per FILE — the
    * document-per-file crawl layout, read without line reassembly.
    * `lineSep` overrides the \n/\r/\r\n default for unusual record
    * delimiters (e.g. \0-separated dumps). */
  def text(spark: SparkSession, path: String,
      wholetext: Boolean = false,
      lineSep: Option[String] = None): DataFrame = {
    var r = spark.read.option("wholetext", wholetext.toString)
    lineSep.foreach(s => r = r.option("lineSep", s))
    r.text(path)
  }

  /** XML scan (Spark 4's BUILT-IN xml source — the spark-xml donation,
    * SPARK-44751; no external connector): one row per `rowTag`
    * element. Schema REQUIRED, same no-inference contract as csv/json
    * (XML inference is an extra full pass and a drift hazard).
    * `ignoreSurroundingSpaces` is forced OFF — the source's default
    * TRIMS element text, which silently corrupts whitespace-significant
    * payloads (document corpora) on a roundtrip AND collapses the
    * empty string to NULL; with trim off both whitespace and ""
    * survive exactly (spec-pinned). NULL still roundtrips as an
    * ABSENT element → NULL. The write side is symmetric:
    * `df.write.option("rowTag", ...).format("xml")`. */
  def xml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag)
      .option("ignoreSurroundingSpaces", "false")
      .format("xml").load(path)

  /** Partitioned columnar sink: `partitionBy` columns become directory
    * keys (pruned for free by any later scan's partition filters). */
  def writePartitioned(df: DataFrame, path: String, format: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format(format)
    val wp = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    val wh = if (format == "csv") wp.option("header", "true") else wp
    wh.save(path)
  }

  /** Small-file compaction: rewrite a MATERIALIZED table (a scan-rooted
    * DataFrame) into ~`targetFileBytes` output files, the file count
    * derived from Catalyst's size statistics (no extra scan — parquet
    * footers / InMemoryFileIndex already know the bytes). The
    * unglamorous operator every long-lived lake needs: streaming sinks
    * and fine-grained partitioned writes accumulate thousands of
    * KB-sized files whose per-file open/footer/task overhead eventually
    * dominates scans; compaction trades one rewrite for every future
    * read. Writes to `path` (a NEW location — compact-in-place via
    * overwrite would lose data on failure mid-write).
    *
    * Contracts and trade-offs:
    *   - intended for scan-rooted plans, where `sizeInBytes` is the
    *     real file size. On joins/aggregates Catalyst's non-CBO
    *     estimate can be wildly high (a join multiplies child sizes),
    *     so the file count additionally clamps at `maxFiles`;
    *   - with `partitionBy`, rows hash-partition BY those columns so
    *     each directory's rows arrive in few tasks (a round-robin
    *     spread would emit up to nFiles files per directory —
    *     fragmenting MORE than the input);
    *   - `shuffle = false` uses `coalesce` — a narrow, exchange-free
    *     merge (cheapest possible rewrite) at the cost of uneven file
    *     sizes; the default full shuffle buys evenly-sized files;
    *   - either way the rewrite DESTROYS any existing sort/cluster
    *     layout (file-level min/max pruning from e.g.
    *     [[graft.operators.ZOrder]]). Re-cluster after compacting when
    *     layout matters: `ZOrder.clusterBy` already yields
    *     size-balanced range partitions, so z-ordered tables should be
    *     compacted by re-clustering, not by this operator.
    */
  def compactTo(df: DataFrame, path: String, format: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil,
      maxFiles: Int = 4096,
      shuffle: Boolean = true): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(maxFiles > 0, "maxFiles must be positive")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((bytes + targetFileBytes - 1) / targetFileBytes)
      .max(1).min(maxFiles).toInt
    val arranged =
      if (!shuffle) df.coalesce(nFiles)
      else if (partitionBy.nonEmpty)
        df.repartition(nFiles, partitionBy.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    writePartitioned(arranged, path, format, partitionBy)
  }

  /** Bucketed columnar sink (session catalog): rows hash into `buckets`
    * files by `bucketCols`, sorted within each bucket by `sortCols`.
    * The single biggest repeated-join lever at 100 TB: two tables
    * bucketed (and sorted) the same way join with ZERO exchange and
    * zero sort — the shuffle every equi-join otherwise pays is prepaid
    * once at write time and amortized over every subsequent join or
    * aggregation on that key. Bucket counts must match across tables
    * meant to co-join (Spark only elides the exchange when they align).
    */
  def writeBucketed(df: DataFrame, table: String,
      buckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty)
      w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Read a bucketed table back (scan exposes the bucketing, so joins
    * and aggregations on the bucket key skip their exchange). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
