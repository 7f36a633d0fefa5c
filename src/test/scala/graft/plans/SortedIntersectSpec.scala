package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sorted-merge intersect kernel must agree exactly with the
  * built-in hash-based `array_intersect` on sorted duplicate-free
  * inputs — it is the verify-stage scorer for every dedup family. */
class SortedIntersectSpec extends SparkSpec {

  test("sorted_intersect_count equals size(array_intersect) on random sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      def set(): Array[Long] =
        (0 until rnd.nextInt(50)).map(_ => rnd.nextInt(40).toLong)
          .distinct.sorted.toArray
      (i, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
      SketchExpressions.sortedIntersectCount(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("hash"))
      .collect()
    out.foreach(r => assert(r.getLong(1) === r.getLong(2), s"row ${r.getInt(0)}"))
  }

  test("edge cases: empty, disjoint, identical") {
    import spark.implicits._
    val df = Seq(
      (1, Array.empty[Long], Array(1L, 2L)),
      (2, Array(1L, 3L, 5L), Array(2L, 4L, 6L)),
      (3, Array(1L, 2L, 3L), Array(1L, 2L, 3L))).toDF("id", "a", "b")
    val got = df.select(col("id"),
      SketchExpressions.sortedIntersectCount(col("a"), col("b")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(1 -> 0L, 2 -> 0L, 3 -> 3L))
  }

  test("expression participates in whole-stage codegen") {
    // spark.range, not a local Seq: a constant relation gets folded
    // into a LocalTableScan at plan time and never exercises codegen
    val df = spark.range(100)
      .select(array(col("id")).as("a"), array(col("id")).as("b"))
      .select(SketchExpressions.sortedIntersectCount(col("a"), col("b")).as("c"))
    // "*(n)" marks operators inside a WholeStageCodegen span; a Janino
    // failure in doGenCode would silently fall back, so also force the
    // result through an action
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
    assert(df.agg(sum(col("c"))).collect()(0).getLong(0) === 100L)
  }

  test("nullable-element arrays are accepted; an actual null slot fails loudly") {
    // array<bigint> read back from parquet/DDL defaults to
    // containsNull=true — static rejection would lock stored signature
    // columns out (ADVICE r3); only a REAL null slot may fail
    import spark.implicits._
    val ok = Seq(
      (1, Seq(Option(1L), Option(2L)), Seq(Option(2L), Option(3L))))
      .toDF("id", "a", "b")
    val out = ok.select(
      SketchExpressions.sortedIntersectCount(col("a"), col("b"))).collect()
    assert(out(0).getLong(0) === 1L)
    val bad = Seq(
      (1, Seq(Option(1L), None), Seq(Option(1L), Option(2L))))
      .toDF("id", "a", "b")
    val e = intercept[Exception] {
      bad.select(
        SketchExpressions.sortedIntersectCount(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null array element")),
      messages(e).mkString(" | "))
  }

  test("minhash_band_keys accepts nullable-element signatures, rejects real nulls") {
    import spark.implicits._
    val sig = (0 until 32).map(i => Option(i.toLong))
    val ok = Seq(Tuple1(sig)).toDF("sig")
      .select(SketchExpressions.minhashBandKeys(col("sig"), 8).as("k"))
      .collect()
    assert(ok(0).getSeq[Long](0).length === 8)
    val bad = Seq(Tuple1(sig.updated(3, Option.empty[Long]))).toDF("sig")
    val e = intercept[Exception] {
      bad.select(SketchExpressions.minhashBandKeys(col("sig"), 8)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null signature slot")),
      messages(e).mkString(" | "))
  }
}
