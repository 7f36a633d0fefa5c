package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.plans.{SketchExpressions => SK}
object P6 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PHASE $name ${(System.nanoTime()-t0)/1e9}%.2f"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Tables(spark, "/root/testdata/sf0.1", "documents")
    val base = df.repartition(32).select(col("doc_id").as("id"), col("lang").as("part"),
      T.wordShingles(col("text"), 3).as("sh")).filter(size(col("sh")) > 0)
    val sigs = base.withColumn("sig", SK.minhashSig(col("sh"), 32))
    t("bandkeys_no_explode")(sigs.select(col("id"), SK.minhashBandKeys(col("sig"), 8).as("bks")).count())
    t("explode_only")(sigs.select(col("id"), explode(SK.minhashBandKeys(col("sig"), 8)).as("bkey")).count())
    t("sig_only_again")(sigs.count())
    spark.stop()
  }
}
