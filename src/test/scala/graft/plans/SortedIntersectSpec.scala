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
}
