package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asOf picks latest right row at or before left ts, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts(5), "t1"), (1L, ts(20), "t2"), (2L, ts(3), "t3"))
      .toDF("acct", "t_ts", "trade")
    val quotes = Seq(
      (1L, ts(1), 10.0), (1L, ts(5), 11.0), (1L, ts(9), 12.0),
      (2L, ts(7), 99.0))
      .toDF("acct", "q_ts", "px")
    val out = AsOfJoin.asOf(trades, quotes, "acct", "t_ts", "q_ts",
      payloadCols = Seq("px"))
      .collect()
      .map(r => (r.getAs[Long]("acct"), r.getAs[String]("trade"),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
      .toSet
    assert(out === Set(
      (1L, "t1", Some(11.0)),  // tie at ts(5): <= includes it
      (1L, "t2", Some(12.0)),  // latest preceding
      (2L, "t3", None)))       // no quote yet → null (left join)
  }

  test("asOf forward picks earliest right row at or after left ts") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts(5), "t1"), (1L, ts(20), "t2"), (2L, ts(3), "t3"))
      .toDF("acct", "t_ts", "trade")
    val quotes = Seq(
      (1L, ts(5), 11.0), (1L, ts(9), 12.0), (2L, ts(1), 99.0))
      .toDF("acct", "q_ts", "px")
    val out = AsOfJoin.asOf(trades, quotes, "acct", "t_ts", "q_ts",
      payloadCols = Seq("px"), direction = "forward")
      .collect()
      .map(r => (r.getAs[String]("trade"),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
      .toSet
    assert(out === Set(
      ("t1", Some(11.0)),  // tie at ts(5): >= includes it
      ("t2", None),        // nothing at or after ts(20)
      ("t3", None)))       // key 2's quote is before, not after
  }

  test("asOf tolerance nulls out matches farther than the bound") {
    import spark.implicits._
    val trades = Seq((1L, ts(30), "t1"), (1L, ts(6), "t2"))
      .toDF("acct", "t_ts", "trade")
    val quotes = Seq((1L, ts(5), 11.0)).toDF("acct", "q_ts", "px")
    val out = AsOfJoin.asOf(trades, quotes, "acct", "t_ts", "q_ts",
      payloadCols = Seq("px"), toleranceMs = Some(2 * 60 * 1000L))
      .collect()
      .map(r => (r.getAs[String]("trade"),
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
      .toSet
    assert(out === Set(
      ("t1", None),         // 25 min gap > 2 min tolerance
      ("t2", Some(11.0))))  // 1 min gap within tolerance
  }
}
