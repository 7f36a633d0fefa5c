package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-phase distributed prefix sum must be row-for-row identical
  * to the single-window global cumsum it replaces (which is also how
  * the q66 oracle computes it). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase offsets equal the naive global-window cumsum") {
    val df = (1L to 1000L).map(i => (i, (i * 37 % 90) + 1)).toDF("id", "w")
    val packed = Packing.packSequences(df, "id", col("w"), budget = 256)
      .select("id", "tok", "off", "seq", "straddles")
    val naive = df
      .withColumn("h", md5(col("id").cast("string")))
      .withColumn("off", coalesce(sum(col("w")).over(
        Window.orderBy(col("h"), col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("w").cast("long").as("tok"), col("off"),
        expr("off div 256L").as("seq"),
        (expr("(off + w - 1) div 256L") > expr("off div 256L"))
          .as("straddles"))
    assert(packed.exceptAll(naive).isEmpty && naive.exceptAll(packed).isEmpty)
  }

  test("offsets are a contiguous token stream") {
    val df = (1L to 200L).map(i => (i, i % 13 + 1)).toDF("id", "w")
    val rows = Packing.packSequences(df, "id", col("w"), budget = 64)
      .select("off", "tok").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.head._1 === 0L)
    rows.sliding(2).foreach {
      case Array((o1, t1), (o2, _)) => assert(o1 + t1 === o2)
      case _ => ()
    }
  }

  test("sequence ids cover 0..max with no gaps and budget-bounded starts") {
    val df = (1L to 500L).map(i => (i, i % 29 + 1)).toDF("id", "w")
    val packed = Packing.packSequences(df, "id", col("w"), budget = 128)
    val seqs = packed.select("seq").distinct().as[Long].collect().sorted
    assert(seqs === (0L to seqs.max).toArray)
    // a doc starts in seq s iff its offset lies in [s*B, (s+1)*B)
    assert(packed.filter(
      col("off") < col("seq") * 128 || col("off") >= (col("seq") + 1) * 128)
      .isEmpty)
  }

  test("no partition-less window over the corpus in the physical plan") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "w")
    val plan = Packing.packSequences(df, "id", col("w"), budget = 64)
      .queryExecution.executedPlan.toString
    // every corpus-sized Window must be keyed by bucket; the only
    // unkeyed window is the 256-row bucket ledger (partitioned by
    // nothing but fed by a 256-row aggregate)
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.exists(_.contains("bucket")),
      s"expected bucket-partitioned window in:\n$plan")
  }
}
