package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel / retention semantics on hand-built fixtures: strict step
  * ordering, the first-step window bound, and exact week offsets. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  test("funnel: strict order required; window bound measured from first step") {
    val ev = Seq(
      // user 1: view(0) -> click(10) -> purchase(20): full funnel
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // user 2: click BEFORE view — click can't count; re-click never
      // happens -> stops at step 1
      (2L, "click", ts(0)), (2L, "view", ts(5)), (2L, "purchase", ts(9)),
      // user 3: view(0) -> click(30) but purchase at 90 > 60-minute
      // window from FIRST step -> stops at step 2
      (3L, "view", ts(0)), (3L, "click", ts(30)), (3L, "purchase", ts(90)),
      // user 4: never views -> not even step 1
      (4L, "click", ts(0)), (4L, "purchase", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), withinMs = Some(60L * 60000))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "view", 3L),      // users 1, 2, 3
      (2L, "click", 2L),     // users 1, 3 (user 2's click precedes view)
      (3L, "purchase", 1L))) // user 1 only (user 3 outside window)
  }

  test("funnel: unbounded window lets slow completions through") {
    val ev = Seq(
      (3L, "view", ts(0)), (3L, "click", ts(30)), (3L, "purchase", ts(90)))
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnelCounts(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("funnelLevels: re-anchoring counts chains the first-touch funnel misses") {
    // user 1: first view at 0 times out (no click within 60m of it is
    // followed by purchase), but the SECOND view at 50 anchors a
    // complete chain — windowFunnel semantics credit level 3
    val ev = Seq(
      (1L, "view", 0L), (1L, "view", 50L), (1L, "click", 70L),
      (1L, "purchase", 90L),
      // user 2: click precedes every view -> stuck at level 1
      (2L, "click", 0L), (2L, "view", 10L))
      .map { case (u, t, min) => (u, t, min * 60000L) }
      .toDF("user_id", "event_type", "ms")
    val got = EventAnalytics.funnelLevels(ev, "user_id", "event_type", "ms",
      Seq("view", "click", "purchase"), withinMs = 60L * 60000)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 1))
    // the first-touch variant stops user 1 at STEP 1: the click at 70
    // is outside 60m of the FIRST view (t=0), so its chain never forms
    val ft = EventAnalytics.funnelCounts(
      ev.withColumn("ts", timestamp_millis(col("ms"))),
      "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), withinMs = Some(60L * 60000))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(ft === Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("funnelLevels equals brute-force max-chain search on random corpora") {
    val rnd = new scala.util.Random(19)
    val steps = Vector("a", "b", "c", "d")
    val w = 40L
    for (trial <- 1 to 3) {
      val events = (1 to 400).map { _ =>
        (rnd.nextInt(25).toLong + 1L,
          steps(rnd.nextInt(steps.size)),
          rnd.nextInt(150).toLong)
      }
      // EXHAUSTIVE brute force — every chain, not the greedy one, so
      // this independently validates the operator's greedy-optimality
      // argument rather than assuming it
      def brute(evs: Seq[(String, Long)]): Int = {
        val byStep = steps.map(s => evs.filter(_._1 == s).map(_._2).sorted)
        def extend(level: Int, anchor: Long, last: Long): Int =
          if (level == steps.size) level
          else {
            val opts = byStep(level).filter(t => t > last && t - anchor <= w)
            if (opts.isEmpty) level
            else opts.map(t => extend(level + 1, anchor, t)).max
          }
        val anchors = byStep(0)
        if (anchors.isEmpty) 0
        else anchors.map(a => extend(1, a, a)).max
      }
      val expected = events.groupBy(_._1)
        .map { case (u, evs) => u -> brute(evs.map(e => (e._2, e._3))) }
        .filter(_._2 >= 1)
      val got = EventAnalytics.funnelLevels(
        events.toDF("user_id", "event_type", "ms"),
        "user_id", "event_type", "ms", steps, withinMs = w)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === expected, s"trial=$trial")
    }
  }

  test("retention: cohort week offsets count distinct active users") {
    // 2023-11-13 is a Monday; minutes offset keeps everything that week
    def day(d: Int): Timestamp = Timestamp.valueOf(s"2023-11-$d 10:00:00")
    val ev = Seq(
      (1L, day(13)), (1L, day(14)), (1L, day(20)), // cohort w0, active w0+w1
      (2L, day(14)),                               // cohort w0, only w0
      (3L, day(21)), (3L, day(28)))                // cohort w1, active w1+w2
      .toDF("user_id", "ts")
    val got = EventAnalytics.retentionMatrix(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("2023-11-13", 0L) -> 2L, // users 1, 2
      ("2023-11-13", 1L) -> 1L, // user 1 again
      ("2023-11-20", 0L) -> 1L, // user 3's own cohort week
      ("2023-11-20", 1L) -> 1L))
  }

  test("transitions: per-user consecutive pairs, tie-broken, normalized") {
    val ev = Seq(
      // user 1: a(0) -> b(1) -> a(2); user 2: a(0) -> a(1)
      (1L, "a", 0L, 10L), (1L, "b", 1L, 11L), (1L, "a", 2L, 12L),
      (2L, "a", 0L, 20L), (2L, "a", 1L, 21L),
      // user 3: two events at the SAME time — event_id breaks the tie,
      // so b(id 30) precedes c(id 31) deterministically
      (3L, "b", 5L, 30L), (3L, "c", 5L, 31L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.transitionMatrix(ev,
      "user_id", "event_type", Seq("ts", "event_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("a", "b") -> ((1L, 0.5)), // from a: 1 of 2 observations
      ("a", "a") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 0.5)), // from b: user 1's b->a, user 3's b->c
      ("b", "c") -> ((1L, 0.5))))
  }

  test("lastTouch: latest in-window touch wins; same-instant touch " +
      "counts; nanosecond ties break by id; lookback nulls out") {
    import spark.implicits._
    val ns = 1000000000L
    val ev = Seq(
      // user 1: touch at t=10s, touch at t=20s, purchase at t=25s
      //         → credited to the 20 s touch, lag 5 s
      (101L, 1L, "click", 10 * ns, 1.0),
      (102L, 1L, "view", 20 * ns, 1.0),
      (103L, 1L, "purchase", 25 * ns, 9.99),
      // user 2: touch at the SAME nanosecond as the purchase → counts
      //         (<=), lag 0; two touches at that instant → higher
      //         event_id wins
      (201L, 2L, "click", 40 * ns, 1.0),
      (202L, 2L, "view", 40 * ns, 1.0),
      (203L, 2L, "purchase", 40 * ns, 5.0),
      // user 3: only touch is outside the 100 s lookback → unattributed
      (301L, 3L, "click", 10 * ns, 1.0),
      (302L, 3L, "purchase", 200 * ns, 3.0),
      // user 4: purchase BEFORE any touch → unattributed
      (401L, 4L, "purchase", 10 * ns, 2.0),
      (402L, 4L, "click", 20 * ns, 1.0),
      // noise: ignored event type between touch and purchase
      (104L, 1L, "error", 22 * ns, 0.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventAnalytics.lastTouchAttribution(ev,
      "user_id", "event_type", "ts", "event_id", "value",
      touchTypes = Seq("click", "view"), convType = "purchase",
      lookbackNs = 100 * ns)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.getString(4)), Option(r.get(5)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(out(103L) === ((Some(102L), Some("view"), Some(5L))))
    assert(out(203L) === ((Some(202L), Some("view"), Some(0L))))
    assert(out(302L) === ((None, None, None)))
    assert(out(401L) === ((None, None, None)))
  }

  test("lastTouch equals brute force on random event streams with " +
      "timestamp collisions") {
    import spark.implicits._
    val types = Array("click", "view", "purchase", "error", "signup")
    val lb = 5L * 1000000000L
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(2000 + trial)
      // ts drawn from only 20 distinct seconds → plenty of exact ties,
      // the case the (ts, id) ordering contract exists for
      val ev = (0L until 60L).map { id =>
        (id, rnd.nextInt(5).toLong, types(rnd.nextInt(types.length)),
          rnd.nextInt(20).toLong * 1000000000L, rnd.nextDouble())
      }
      val touch = Set("click", "view")
      val want = ev.filter(_._3 == "purchase").map { e =>
        val cands = ev.filter(t => touch(t._3) && t._2 == e._2 &&
          t._4 <= e._4 && e._4 - t._4 <= lb)
        val best = cands.sortBy(t => (t._4, t._1)).lastOption
        e._1 -> ((best.map(_._1), best.map(_._3),
          best.map(t => (e._4 - t._4) / 1000000000L)))
      }.toMap
      val got = EventAnalytics.lastTouchAttribution(
        ev.toDF("event_id", "user_id", "event_type", "ts", "value"),
        "user_id", "event_type", "ts", "event_id", "value",
        touchTypes = Seq("click", "view"), convType = "purchase",
        lookbackNs = lb)
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.getString(4)),
            Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("decayedEngagement: hand-computed halvings against the corpus " +
      "reference instant; clamp and null-value semantics") {
    import spark.implicits._
    val H = 3600000L // one hour in ms
    // reference instant = max ms = 10*H (user 2's event)
    val ev = Seq(
      (1L, 10L * H, Some(1000L)),  // 0 halvings -> 1000
      (1L, 9L * H, Some(1000L)),   // 1 hour -> 500
      (1L, 7L * H, Some(999L)),    // 3 hours -> 124 (truncating)
      (2L, 10L * H, Some(800L)),   // reference row itself -> 800
      (2L, 0L, Some(1000L)),       // 10 hours -> 0 (1000 >> 10)
      (2L, 8L * H, None)           // null value: counted, sums skip it
    ).toDF("user_id", "ms", "vm")
    val got = EventAnalytics.decayedEngagement(
        ev, "user_id", "ms", col("vm"), halfLifeHours = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((3L, 2999L, 1624L)),
      2L -> ((3L, 1800L, 800L))))
    // 48h half-life at 24h elapsed: k = 0 — no decay before a full
    // half-life elapses (truncating div contract)
    val oneUser = Seq((1L, 24L * H, Some(1000L)), (1L, 0L, Some(1000L)))
      .toDF("user_id", "ms", "vm")
    val slow = EventAnalytics.decayedEngagement(
        oneUser, "user_id", "ms", col("vm"), halfLifeHours = 48L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(slow.toSeq === Seq((2L, 2000L, 2000L)))
  }

  test("rfmSegments equals a brute-force replay on randomized events " +
      "(exact discrete quartiles, tie-sharing codes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 2) {
      val ev = (1 to 400).map { i =>
        (rnd.nextInt(40).toLong + 1L,           // user
          rnd.nextInt(1000).toLong * 3600000L,  // ms
          rnd.nextInt(5000).toLong)             // vm
      }
      val ref = ev.map(_._2).max
      val users = ev.groupBy(_._1).map { case (u, es) =>
        (u, ref - es.map(_._2).max, es.size.toLong, es.map(_._3).sum)
      }.toSeq
      val n = users.size.toLong
      def th(vs: Seq[Long], q: Int): Long =
        vs.sorted.find(v => 4L * vs.count(_ <= v) >= q * n).get
      def code(v: Long, vs: Seq[Long]): Long =
        1L + (1 to 3).count(q => v > th(vs, q))
      val recs = users.map(_._2); val freqs = users.map(_._3)
      val mons = users.map(_._4)
      val want = users.groupBy { case (_, r, f, m) =>
        (code(r, recs), code(f, freqs), code(m, mons))
      }.map { case (k, us) =>
        k -> ((us.size.toLong, us.map(_._4).sum))
      }
      val got = EventAnalytics.rfmSegments(
          ev.toDF("user_id", "ms", "vm"), "user_id", "ms", col("vm"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("hourlyVolumeAnomaly flags exactly the hours a hand median/MAD " +
      "replay flags; steady traffic flags nothing") {
    import spark.implicits._
    val H = 3600000L
    // 20 steady hours of ~10 events, one 100-event burst, one 1-event
    // trough
    val ev = (0 until 20).flatMap(h =>
      (1 to (10 + h % 2)).map(_ => h * H + 1L)) ++
      (1 to 100).map(_ => 20L * H + 5L) ++ Seq(21L * H + 7L)
    val counts = ev.groupBy(_ / H).view.mapValues(_.size.toLong).toMap
    def stat2(vs: Seq[Long]): Long = {
      val s = vs.sorted; val n = s.size
      s((n + 1) / 2 - 1) + s(n / 2)
    }
    val med2 = stat2(counts.values.toSeq)
    val mad4 = stat2(counts.values.toSeq.map(v => (2 * v - med2).abs))
    val want = counts.filter { case (_, v) =>
      2 * (2 * v - med2).abs > 3 * mad4
    }.keySet
    val got = EventAnalytics.hourlyVolumeAnomaly(
        ev.toDF("ms"), "ms", k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got === want && want === Set(20L, 21L))
    // steady traffic: identical counts everywhere -> MAD 0, but dev 0
    // too — nothing flags
    val steady = (0 until 10).flatMap(h => (1 to 5).map(_ => h * H + 1L))
    assert(EventAnalytics.hourlyVolumeAnomaly(
      steady.toDF("ms"), "ms", k = 3).count() === 0L)
  }
}
