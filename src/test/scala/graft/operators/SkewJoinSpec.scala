package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain equi-join on a skewed fixture") {
    import spark.implicits._
    // 10k rows of hot key + a tail
    val left = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "id")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 1.5) }.toDF("k", "w")
    val plain = left.join(right, Seq("k"))
      .select("k", "id", "w").as[(String, Long, Double)].collect().toSet
    val salted = SkewJoin.salted(left, right, "k", salts = 8,
      saltBy = col("id"))
      .select("k", "id", "w").as[(String, Long, Double)].collect().toSet
    assert(salted === plain)
    assert(salted.size === 10100)
  }

  test("hot key spreads across multiple salt partitions") {
    import spark.implicits._
    val left = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "id")
    val salts = left.withColumn("__salt",
      pmod(xxhash64(col("id")), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts === 8L)
  }
}
