package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables(spark, sf("sf0.001"), "documents").cache()
  private lazy val base =
    Files.createTempDirectory("graft-sources").toString

  test("partitioned parquet sink round-trips and prunes partitions") {
    Sources.writePartitioned(docs, s"$base/docs_parquet", "parquet",
      partitionBy = Seq("lang"))
    val back = Sources.parquet(spark, s"$base/docs_parquet")
    assert(back.count() === docs.count())
    val pruned = back.filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    assert(pruned.count() ===
      docs.filter(col("lang") === "en").count())
  }

  test("csv sink + schema-required csv source round-trip values") {
    val slim = docs.select("doc_id", "lang", "n_chars")
    Sources.writePartitioned(slim, s"$base/docs_csv", "csv")
    val back = Sources.csv(spark, s"$base/docs_csv", slim.schema)
    assert(back.orderBy("doc_id").collect().toSeq ===
      slim.orderBy("doc_id").collect().toSeq)
  }

  test("json sink + schema-required json source round-trip values") {
    val slim = docs.select("doc_id", "source", "n_chars")
    Sources.writePartitioned(slim, s"$base/docs_json", "json")
    val back = Sources.json(spark, s"$base/docs_json", slim.schema)
    assert(back.orderBy("doc_id").collect().toSeq ===
      slim.orderBy("doc_id").collect().toSeq)
  }

  test("orc sink round-trips, prunes partitions and pushes filters") {
    Sources.writePartitioned(docs, s"$base/docs_orc", "orc",
      partitionBy = Seq("lang"))
    val back = Sources.orc(spark, s"$base/docs_orc")
    assert(back.count() === docs.count())
    val pruned = back.filter(col("lang") === "en" && col("n_chars") > 300)
      .select("doc_id", "n_chars")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,300)]"),
      plan.take(1500))
    assert(pruned.count() ===
      docs.filter(col("lang") === "en" && col("n_chars") > 300).count())
  }

  test("compactTo merges small files; content identical") {
    // fragment: 32 partitions of a 500-row table -> 32 tiny files
    Sources.writePartitioned(docs.repartition(32),
      s"$base/docs_small", "parquet")
    val small = new java.io.File(s"$base/docs_small")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(small > 8, s"fixture should fragment, got $small files")
    val fragmented = Sources.parquet(spark, s"$base/docs_small")
    Sources.compactTo(fragmented, s"$base/docs_compact", "parquet",
      targetFileBytes = 512L * 1024 * 1024)
    val compacted = new java.io.File(s"$base/docs_compact")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(compacted === 1, s"expected 1 compacted file, got $compacted")
    val back = Sources.parquet(spark, s"$base/docs_compact")
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)

    // partitioned compaction: rows hash BY the partition column, so
    // each lang directory gets ONE file (a round-robin spread would
    // fragment each directory into nFiles pieces)
    Sources.compactTo(fragmented, s"$base/docs_compact_p", "parquet",
      targetFileBytes = 512L * 1024 * 1024, partitionBy = Seq("lang"))
    val perDir = new java.io.File(s"$base/docs_compact_p")
      .listFiles().filter(_.getName.startsWith("lang=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perDir.nonEmpty && perDir.forall(_._2 === 1),
      s"per-directory files: ${perDir.toSeq}")

    // exchange-free path: coalesce merge, content still identical
    Sources.compactTo(fragmented, s"$base/docs_compact_c", "parquet",
      targetFileBytes = 512L * 1024 * 1024, shuffle = false)
    assert(Sources.parquet(spark, s"$base/docs_compact_c")
      .orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("binaryFiles lists files with lengths and content") {
    val slim = docs.select("doc_id", "lang")
    Sources.writePartitioned(slim, s"$base/docs_bin_src", "csv")
    val files = Sources.binaryFiles(spark, s"$base/docs_bin_src", "*.csv")
    val rows = files.select("path", "length", "content").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("length") ===
        r.getAs[Array[Byte]]("content").length.toLong)
    }
  }

  test("text source: line mode round-trips; wholetext gives one row " +
      "per file; gzip decodes transparently; lineSep overrides") {
    import spark.implicits._
    val lines = Seq("alpha beta", "", "gamma")
    lines.toDF("value").coalesce(1)
      .write.mode("overwrite").text(s"$base/txt_plain")
    // line mode: one row per line, empty lines preserved
    assert(Sources.text(spark, s"$base/txt_plain")
      .as[String].collect().sorted.toSeq === lines.sorted)
    // wholetext: one row per FILE, lines still inside (the
    // document-per-file crawl layout) — single file by coalesce above
    val whole = Sources.text(spark, s"$base/txt_plain", wholetext = true)
      .as[String].collect()
    assert(whole.length === 1 &&
      whole.head.split("\n", -1).toSeq.take(3) === lines)
    // compressed input decodes by extension, content identical
    lines.toDF("value").coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").text(s"$base/txt_gz")
    assert(Sources.text(spark, s"$base/txt_gz")
      .as[String].collect().sorted.toSeq === lines.sorted)
    // custom record delimiter: a | separated dump is three records
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/txt_sep"),
      "a|b|c".getBytes("UTF-8"))
    assert(Sources.text(spark, s"$base/txt_sep", lineSep = Some("|"))
      .as[String].collect().sorted.toSeq === Seq("a", "b", "c"))
  }

  test("xml sink + schema-required xml source round-trip values " +
      "(built-in Spark 4 xml: escaping exact, surrounding whitespace " +
      "AND the empty string preserved under the facade's trim-off " +
      "option; a NULL writes as an absent element and reads back NULL)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "en", "plain words"),
      (2L, "de", "escaping <tags> & \"quotes\""),
      (3L, "fr", ""),            // trim-default would read this NULL
      (4L, "ja", "  padded  "),  // trim-default would corrupt this
      (5L, "zh", null.asInstanceOf[String]))
    rows.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").option("rowTag", "doc")
      .format("xml").save(s"$base/docs_xml")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val back = Sources.xml(spark, s"$base/docs_xml", schema, "doc")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(back === Set(
      (1L, "en", Some("plain words")),
      (2L, "de", Some("escaping <tags> & \"quotes\"")),
      (3L, "fr", Some("")),
      (4L, "ja", Some("  padded  ")),
      (5L, "zh", None)))
  }

}
