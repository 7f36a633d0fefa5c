package graft
import org.apache.spark.sql.SparkSession
object P7 {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q24_dedup_minhash_lsh")(spark, "/root/testdata/sf0.1").count()
      println(f"PROFILE aqe=$aqe iter=$i rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
