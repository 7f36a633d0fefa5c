package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Spark's runtime bloom-filter injection under the confs
  * [[RuntimeFilters]] manages: the selective-dim ⋈ fact shape must
  * carry a partial+final `bloom_filter_agg` build on the dim side and
  * a `bloom_filter_might_contain` predicate on the fact side. If a
  * Spark upgrade renames a conf or stops injecting, this fails CI —
  * the 100 TB plan contract, verified at test scale by widening the
  * same thresholds a real deployment would tune. */
class RuntimeFiltersSpec extends SparkSpec {

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom filter enabled by default; tuneForScale sets the knobs") {
    assert(RuntimeFilters.isEnabled(spark),
      "Spark no longer enables runtime bloom filters by default")
    withConfs(
      RuntimeFilters.CreationSideKey -> "10MB",
      RuntimeFilters.ApplicationSideKey -> "10GB") {
      RuntimeFilters.tuneForScale(spark,
        creationSideThreshold = "123MB",
        applicationSideScanSizeThreshold = "7GB")
      assert(spark.conf.get(RuntimeFilters.CreationSideKey) === "123MB")
      assert(spark.conf.get(RuntimeFilters.ApplicationSideKey) === "7GB")
    }
  }

  test("selective dim join injects bloom build + might_contain probe") {
    val lineitem = graft.Tables(spark, sf("sf0.01"), "lineitem")
    val orders = graft.Tables(spark, sf("sf0.01"), "orders")
    withConfs(
      // force the shuffle-join shape the rule targets (the dim would
      // broadcast at this SF, which replaces rather than demonstrates
      // the runtime filter)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RuntimeFilters.CreationSideKey -> "100MB",
      // test-scale stand-in for tuneForScale's deployment values: the
      // fact scan here is far below any realistic threshold
      RuntimeFilters.ApplicationSideKey -> "0") {
      val dim = orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val agg = lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy().count()
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      // partial+final bloom build on the dim side — never a collect
      assert(p.contains("partial_bloom_filter_agg"), p.take(3000))
      // the probe must sit on the FACT side, pre-shuffle: the
      // might_contain predicate filters the fact join key
      val probeLines = p.split("\n").filter(_.contains("might_contain"))
      assert(probeLines.nonEmpty, p.take(3000))
      assert(probeLines.exists(_.contains("l_orderkey")),
        probeLines.mkString("\n"))
    }
  }

  test("q89 entry restores every tuned conf after materializing") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      RuntimeFilters.EnabledKey, RuntimeFilters.CreationSideKey,
      RuntimeFilters.ApplicationSideKey)
    val before = keys.map(k => k -> spark.conf.getOption(k))
    val df = graft.queries.Registry
      .allQueries("q89_bloom_pruned_revenue").fn(spark, sf("sf0.001"))
    assert(df.count() > 0)
    val after = keys.map(k => k -> spark.conf.getOption(k))
    assert(after === before,
      "q89 leaked session confs past its finally-restore")
  }

  test("q89 gated shape carries the bloom build + fact-side probe " +
      "under tuned thresholds") {
    // the exact join/agg body the q89 entry checkpoints, asserted
    // pre-checkpoint under the same confs the entry sets
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RuntimeFilters.CreationSideKey -> "100MB",
      RuntimeFilters.ApplicationSideKey -> "0") {
      val df = graft.queries.Relational.bloomPrunedRevenue(spark, sf("sf0.01"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("partial_bloom_filter_agg"), p.take(3000))
      assert(p.split("\n").exists(l =>
        l.contains("might_contain") && l.contains("l_orderkey")), p.take(3000))
    }
  }
}
