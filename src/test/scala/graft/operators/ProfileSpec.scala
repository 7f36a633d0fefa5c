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

  test("skewProfile: hand-computed ledger arithmetic") {
    // key freqs: a:1 b:1 c:2 d:4 → rows 8, keys 4, max 4,
    // avg_milli 2000; ledger (f,nk,ck) = (1,2,2) (2,1,3) (4,1,4):
    // p50 = min f with ck·100 ≥ 50·4 = 1; p99 = min f with ck·100 ≥
    // 99·4 = 4; skew_milli = 4·10^6 // 2000 = 2000; salt =
    // (4000 + 1999) // 2000 = 2
    val df = Seq("a", "b", "c", "c", "d", "d", "d", "d").toDF("k")
    val r = Profile.skewProfile(df, "k").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((8L, 4L, 4L, 2000L, 1L, 4L, 2000L, 2L)))
  }

  test("skewProfile: uniform keys report ratio 1000 and salt 1") {
    val df = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    val r = Profile.skewProfile(df, "k").collect()(0)
    assert((r.getLong(2), r.getLong(3), r.getLong(6), r.getLong(7)) ===
      ((2L, 2000L, 1000L, 1L)))
    assert((r.getLong(4), r.getLong(5)) === ((2L, 2L)))
  }
}
