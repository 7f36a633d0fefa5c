package graft
import org.apache.spark.sql.SparkSession
object P2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (name <- Seq("q24_dedup_minhash_lsh", "q22_dedup_exact", "q03_join_revenue_by_nation", "q28_sim_topk_lsh", "q29_sim_topk_ivf", "q23_dedup_ngram_jaccard")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"PROFILE $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
