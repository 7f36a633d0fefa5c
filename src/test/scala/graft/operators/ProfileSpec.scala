package graft.operators

import graft.SparkSpec

/** Profile semantics on a fixture with nulls, duplicates, and mixed
  * types: counts exclude nulls, distincts are exact, min/max are
  * portable strings, means exist only for numerics. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distincts, string min/max, numeric mean") {
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, None, 20),
      (3L, Some("a"), 30),
      (4L, Some("b"), 20))
      .toDF("id", "tag", "v")
    val got = Profile.profile(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    assert(got("id") === ((4L, 0L, 4L, "1", "4", Some(2.5))))
    assert(got("tag") === ((3L, 1L, 2L, "a", "b", None)))
    assert(got("v") === ((4L, 0L, 3L, "10", "30", Some(20.0))))
  }

  test("profile: single aggregation pass — exactly one table scan") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val plan = Profile.profile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    // the multi-distinct agg plans through Expand over ONE scan, not
    // one scan per column
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 2, plan.take(2000))
  }
}
