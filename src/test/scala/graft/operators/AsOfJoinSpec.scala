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

  test("asOf: a matching right row with a NULL payload stays null (no stale carry)") {
    import spark.implicits._
    val trades = Seq((1L, ts(3), "t1")).toDF("acct", "t_ts", "trade")
    val quotes = Seq(
      (1L, ts(1), Some(10.0)),
      (1L, ts(2), Option.empty[Double])) // most recent match, px NULL
      .toDF("acct", "q_ts", "px")
    // row-atomic semantics: the ts(2) quote IS the as-of match, so its
    // null px must come through — not the stale 10.0 from ts(1)
    val out = AsOfJoin.asOf(trades, quotes, "acct", "t_ts", "q_ts",
      payloadCols = Seq("px"), toleranceMs = Some(60 * 1000L))
      .collect().map(r =>
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble))
    assert(out.toSeq === Seq(None))
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

  test("randomized: backward/forward equal a naive per-row argmin/argmax") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val trades = Seq.tabulate(200)(i =>
      (rnd.between(1L, 6L), ts(rnd.between(0, 60)), s"t$i"))
    // quotes unique per (key, ts): at equal timestamps the window-carry
    // winner among right rows is tie-broken arbitrarily (q36 dedupes
    // for the same reason), so the fixture avoids the tie entirely
    val quotes = rnd.shuffle(
      for (k <- 1L to 5L; m <- 0 until 60) yield (k, m)).take(80)
      .zipWithIndex.map { case ((k, m), i) => (k, ts(m), i.toDouble) }
    def naive(dir: String): Set[(String, Option[Double])] =
      trades.map { case (k, t, id) =>
        val cands = quotes.filter { case (qk, qt, _) =>
          qk == k && (if (dir == "backward") !qt.after(t) else !qt.before(t))
        }
        val best =
          if (cands.isEmpty) None
          else if (dir == "backward") Some(cands.maxBy(_._2.getTime)._3)
          else Some(cands.minBy(_._2.getTime)._3)
        (id, best)
      }.toSet
    for (dir <- Seq("backward", "forward")) {
      val got = AsOfJoin.asOf(
        trades.toDF("acct", "t_ts", "trade"),
        quotes.toDF("acct", "q_ts", "px"),
        "acct", "t_ts", "q_ts", Seq("px"), direction = dir)
        .collect()
        .map(r => (r.getAs[String]("trade"),
          Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)))
        .toSet
      assert(got === naive(dir), s"direction=$dir")
    }
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
