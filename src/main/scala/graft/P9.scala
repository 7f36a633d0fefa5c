package graft
import org.apache.spark.sql.SparkSession
object P9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q24_dedup_minhash_lsh")(spark, "/root/testdata/sf0.1").count()
      println(f"PROFILE aqe=off iter=$i rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
