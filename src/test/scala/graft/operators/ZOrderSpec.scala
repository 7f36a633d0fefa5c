package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known bit patterns") {
    val r = Seq((1L, 0L, 255L)).toDF("a", "b", "c").select(
      ZOrder.interleave(Seq(col("a"), col("b"))).as("ab"),
      ZOrder.interleave(Seq(col("b"), col("a"))).as("ba"),
      ZOrder.interleave(Seq(col("c"), col("c"))).as("cc")).head()
    assert(r.getLong(0) === 2L) // a's bit 0 -> position 1
    assert(r.getLong(1) === 1L) // a's bit 0 -> position 0
    assert(r.getLong(2) === 65535L) // all 16 low bits set
  }

  private def fileBoxes(df: DataFrame): Array[(Long, Long, Long, Long)] =
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("z-order layout prunes on BOTH keys; single-key range layout cannot") {
    val pts = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val df = pts.toDF("x", "y")
    val zBoxes = fileBoxes(ZOrder.clusterBy(df, Seq("x", "y"), 16))
    val xBoxes = fileBoxes(df.repartitionByRange(16, col("x")))
    assert(zBoxes.length === 16 && xBoxes.length === 16)

    // a selective predicate on y: min/max pruning keeps only files
    // whose [y0, y1] intersects [0, 7]
    def hitsY(boxes: Array[(Long, Long, Long, Long)]): Int =
      boxes.count { case (_, _, y0, y1) => y0 <= 7 && y1 >= 0 }
    // x-range layout: every file spans the full y domain -> no pruning
    assert(hitsY(xBoxes) === 16)
    // z-order: only the curve's low-y quadrants qualify
    assert(hitsY(zBoxes) <= 8, s"zorder y-pruning: ${hitsY(zBoxes)}/16")

    // and x stays prunable too (not as tight as pure x-range, but far
    // better than nothing)
    def hitsX(boxes: Array[(Long, Long, Long, Long)]): Int =
      boxes.count { case (x0, x1, _, _) => x0 <= 7 && x1 >= 0 }
    assert(hitsX(zBoxes) <= 8, s"zorder x-pruning: ${hitsX(zBoxes)}/16")
  }

  test("clusterBy preserves rows and respects the file budget") {
    val df = (1L to 1000L).map(i => (i % 97, i % 89)).toDF("x", "y")
    val z = ZOrder.clusterBy(df, Seq("x", "y"), 8)
    assert(z.count() === 1000L)
    assert(z.rdd.getNumPartitions <= 8)
  }
}
