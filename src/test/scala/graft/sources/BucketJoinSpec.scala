package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The co-located-join contract: equal bucketing on the join key must
  * eliminate BOTH sides' exchanges (and, with sorted buckets, both
  * sorts) from a sort-merge join — the plan property that makes
  * repeated big-table joins affordable at 100 TB. Asserted on the
  * executed plan, so a Spark-conf or write-path regression that brings
  * the shuffle back fails here instead of on a cluster.
  */
class BucketJoinSpec extends SparkSpec {

  test("equal-bucketed tables join with no exchange; results match") {
    val lineitem = graft.Tables(spark, sf("sf0.001"), "lineitem")
    val orders = graft.Tables(spark, sf("sf0.001"), "orders")
    Sources.writeBucketed(lineitem, "li_bucketed",
      buckets = 4, bucketCols = Seq("l_orderkey"), sortCols = Seq("l_orderkey"))
    Sources.writeBucketed(orders, "ord_bucketed",
      buckets = 4, bucketCols = Seq("o_orderkey"), sortCols = Seq("o_orderkey"))

    // sf0.001 dims fit under the broadcast threshold, which would turn
    // the join into a broadcast join and prove nothing about bucketing;
    // at real scale both sides are broadcast-impossible, so pin the
    // shuffle-join path the contract is about.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Sources.table(spark, "li_bucketed")
        .join(Sources.table(spark, "ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      // keep only AQE's final plan — the trailing "== Initial Plan =="
      // section would double-count every node
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)

      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan.take(2000))
      // the whole point: no shuffle on either join side — the single
      // allowed exchange is AFTER the join, for the groupBy; the join
      // inputs come straight from the bucketed scans
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 1, s"join sides re-shuffled:\n${plan.take(3000)}")
      assert(plan.contains("Bucketed: true"), plan.take(2000))

      // same answer as the unbucketed join
      val want = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE li_bucketed")
      spark.sql("DROP TABLE ord_bucketed")
    }
  }

  test("aggregation on the bucket key also skips its exchange") {
    val lineitem = graft.Tables(spark, sf("sf0.001"), "lineitem")
    Sources.writeBucketed(lineitem, "li_bucketed_agg",
      buckets = 4, bucketCols = Seq("l_orderkey"))
    val agg = Sources.table(spark, "li_bucketed_agg")
      .groupBy("l_orderkey").agg(sum(col("l_quantity")).as("qty"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg still shuffles:\n${plan.take(2000)}")
    spark.sql("DROP TABLE li_bucketed_agg")
  }
}
