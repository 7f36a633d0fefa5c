package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams — the funnel/cohort tier of
  * an events warehouse (the capability ClickHouse exposes as
  * `windowFunnel` / retention maps; public analytics SQL patterns).
  * Everything is user-keyed aggregation + joins: no windows over the
  * full corpus, no driver-side state, shuffle keys are (user) or
  * (cohort, week) throughout — corpus-linear at any scale.
  */
object EventAnalytics {

  /** Epoch-milliseconds normalization for kernels that compare raw ms
    * (currently [[funnelLevels]] — the other kernels work on interval
    * arithmetic over the native timestamp type and never materialize
    * ms): a TimestampType column floors to whole epoch ms
    * (cross-engine safe for nanos-typed sources — the negative-epoch
    * guard keeps the floor a true floor); an integral column is epoch
    * ms as-is. */
  private def msOf(events: DataFrame, tsCol: String): Column =
    events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        expr(s"unix_micros($tsCol) div 1000 - " +
          s"(CASE WHEN unix_micros($tsCol) % 1000 < 0 THEN 1 ELSE 0 END)")
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => col(tsCol)
      case t => throw new IllegalArgumentException(
        s"tsCol must be timestamp or integral ms, got $t")
    }

  /** FIRST-TOUCH ordered funnel: for each step k, the number of users
    * who performed `steps(0) < steps(1) < ... < steps(k)` in strict
    * time order, each completion no later than `withinMs` after the
    * user's EARLIEST step-1 event. The chain is anchored at that first
    * touch and matched greedily earliest-first — fully deterministic,
    * which is what makes it oracle-comparable across engines.
    *
    * NOT ClickHouse-windowFunnel-equivalent: windowFunnel MAXIMIZES the
    * reached level over every candidate anchor (a user whose first
    * touch times out but whose later re-touch completes still counts);
    * this first-touch variant reports that user as stopped — a
    * deliberate trade of anchor-maximization for a deterministic,
    * join-shaped plan (the maximizing form needs per-user event-list
    * state; `Pipeline`/`flatMapGroupsWithState` are the escape hatches
    * if that semantic is required).
    *
    * Shape: one user-keyed min-aggregation per step, chained by a
    * user-keyed join that carries (previous step time, first-step
    * time). Step count is a small constant; every shuffle is keyed by
    * user. Returns (step_no, step, n_users) with n_users
    * monotonically non-increasing.
    */
  def funnelCounts(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], withinMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinMs.forall(_ > 0), "withinMs must be positive")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("ts"))
    def windowOk(ts: Column, tFirst: Column): Column =
      withinMs.map(w =>
        ts <= tFirst + expr(s"INTERVAL $w MILLISECONDS")).getOrElse(lit(true))
    val s0 = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("t_step"))
      .withColumn("t_first", col("t_step"))
    val reached = steps.zipWithIndex.drop(1).scanLeft(s0) {
      case (prev, (step, _)) =>
        ev.filter(col("et") === step)
          .join(prev, "u")
          .filter(col("ts") > col("t_step") &&
            windowOk(col("ts"), col("t_first")))
          .groupBy("u").agg(
            min(col("ts")).as("t_step"),
            first(col("t_first")).as("t_first"))
    }
    steps.zip(reached).zipWithIndex.map { case ((step, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("step_no"),
          lit(step).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** ANCHOR-MAXIMIZING funnel levels (the ClickHouse-windowFunnel
    * semantic, exact): for each user, the deepest step k such that SOME
    * chain `steps(0) < ... < steps(k-1)` exists with strictly
    * increasing event times, all within `withinMs` of the chain's OWN
    * first-step event. Unlike [[funnelCounts]] (first-touch anchor), a
    * user whose first touch times out but whose later re-touch
    * completes still counts at full depth.
    *
    * Distributed shape: secondary sort — repartition by user, sort
    * within partitions by (user, time, step) — then ONE streaming pass
    * per partition. Per user the scan keeps a Pareto frontier of
    * (anchor, lastStepTime) per level: a new chain enters level k only
    * with a strictly larger anchor than the frontier tail (larger
    * anchor = looser window for future steps; smaller last = looser
    * ordering — and appends always carry the scan's current time, so
    * the frontier stays sorted on both coordinates and feasibility is
    * one binary search). State is O(#step-1 events) per user worst
    * case — bounded by the user's own anchor count, never the corpus,
    * and never a materialized event list. Greedy earliest-extension is
    * optimal per anchor (an earlier intermediate step only loosens
    * every later constraint), which is what makes the level EXACT and
    * oracle-comparable.
    *
    * `tsCol` may be a TimestampType column (floored to whole epoch ms
    * — cross-engine-safe for nanos-typed sources) or an integral
    * epoch-milliseconds column used as-is. `userCol` must be integral.
    * Returns (user_id, level), one row per user with >= 1 step-1
    * event; level in 1..steps.size.
    */
  def funnelLevels(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], withinMs: Long): DataFrame = {
    require(steps.size >= 2, "funnel needs at least two steps")
    require(withinMs > 0, "withinMs must be positive")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val msCol = msOf(events, tsCol)
    val stepK = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(typeCol) === s, i).otherwise(acc)
      }
    val nSteps = steps.size
    val w = withinMs
    events
      .select(col(userCol).cast("long").as("u"), msCol.as("ms"),
        stepK.as("k"))
      .filter(col("k") >= 0)
      .repartition(col("u"))
      .sortWithinPartitions(col("u"), col("ms"), col("k"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        import scala.collection.mutable.ArrayBuffer
        // frontier(k): (anchor, last) pairs, ascending in BOTH coords
        val frontier = Array.fill(nSteps)(ArrayBuffer.empty[(Long, Long)])
        var curU = 0L
        var open = false
        def levelOf: Int = {
          var k = nSteps - 1
          while (k >= 0 && frontier(k).isEmpty) k -= 1
          k + 1
        }
        def reset(): Unit = frontier.foreach(_.clear())
        // largest index whose last < t (lasts ascend) — binary search
        def latestBefore(fs: ArrayBuffer[(Long, Long)], t: Long): Int = {
          var lo = 0; var hi = fs.length - 1; var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (fs(mid)._2 < t) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
          ans
        }
        def push(k: Int, anchor: Long, last: Long): Unit = {
          val fs = frontier(k)
          if (fs.isEmpty || anchor > fs.last._1) fs += ((anchor, last))
        }
        def feed(u: Long, ms: Long, k: Int): Option[(Long, Int)] = {
          val out =
            if (open && u != curU) Some((curU, levelOf)) else None
          if (!open || u != curU) { reset(); curU = u; open = true }
          if (k == 0) push(0, ms, ms)
          else if (frontier(k - 1).nonEmpty) {
            val j = latestBefore(frontier(k - 1), ms)
            if (j >= 0) {
              val anchor = frontier(k - 1)(j)._1
              if (ms - anchor <= w) push(k, anchor, ms)
            }
          }
          out
        }
        val main = it.flatMap { case (u, ms, k) => feed(u, ms, k) }
        val tail = new Iterator[(Long, Int)] {
          private var done = false
          def hasNext: Boolean = !done && open
          def next(): (Long, Int) = { done = true; (curU, levelOf) }
        }
        (main ++ tail).filter(_._2 >= 1)
      }
      .toDF("user_id", "level")
  }

  /** Cohort retention matrix: users grouped by the week of their first
    * event (ISO weeks, Monday start — `date_trunc("week", ...)` agrees
    * between Spark and DuckDB), counted in every later week they were
    * active. Returns (cohort_week, week_offset, n_users). Week offsets
    * divide exactly because both endpoints are week-truncated
    * timestamps in a fixed-offset session zone (UTC here). One
    * user-keyed first-event agg, one distinct (user, week) projection,
    * one join, one (cohort, week) agg.
    */
  def retentionMatrix(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstW = events.groupBy(col(userCol).as("u"))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort"))
    val active = events.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).as("w")).distinct()
    active.join(firstW, "u")
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        ((unix_timestamp(col("w")) - unix_timestamp(col("cohort"))) / 604800L)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for every consecutive event pair within a user's
    * timeline (ordered by `orderCols` — pass an exact total order,
    * e.g. (raw-nanos ts, event_id), so the "next" event is
    * deterministic), one (from_type, to_type) observation; aggregated
    * to counts and per-from_type transition probabilities.
    *
    * Distributed shape: one user-keyed window (`lead`) — the sequence
    * scan shuffles on user only — then a (from, to) hash agg. The
    * probability normalization is a window over the AGGREGATED
    * matrix, |event types|² rows, model-sized by construction (never
    * the event stream). Returns (from_type, to_type, n, prob) with
    * prob = n / Σ n over the same from_type.
    */
  def transitionMatrix(
      events: DataFrame, userCol: String, typeCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "transitionMatrix needs an ordering")
    val seq = Window.partitionBy(col(userCol))
      .orderBy(orderCols.map(col): _*)
    val counts = events
      .withColumn("to_type", lead(col(typeCol), 1).over(seq))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val perFrom = Window.partitionBy(col("from_type"))
    counts.withColumn("prob",
      col("n").cast("double") / sum(col("n")).over(perFrom))
  }

  /** LAST-TOUCH attribution: each conversion event is credited to the
    * user's most recent touch event at or before it, within a
    * lookback window — the standard marketing-attribution join (an
    * as-of join specialized to one event stream). Exact integral
    * semantics: `tsCol` is a raw epoch-NANOS long, the winning touch
    * is max (ts, id) among `touch.ts <= conv.ts` (ties at the same
    * nanosecond break by id, so both engines agree bit-for-bit), and
    * the lookback gate is long arithmetic.
    *
    * Shape: ONE user-keyed window pass over the filtered touch+conv
    * stream. Touch rows sort before conversion rows at equal (ts) via
    * the side flag, so a same-instant touch is visible to its
    * conversion; `last(struct, ignoreNulls)` carries the winning
    * touch ROW atomically (same contract as [[AsOfJoin]] — a stale
    * payload can never pair with a newer ts). Per-row state is one
    * struct; no event list, no corpus window, no self-join — at 100×
    * this is a single shuffle on the user key.
    *
    * Output: one row per conversion — (conv_id, user, value,
    * touch_id, touch_type, lag_seconds), the touch columns null when
    * no touch is inside the lookback.
    */
  def lastTouchAttribution(
      events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, valueCol: String,
      touchTypes: Seq[String], convType: String,
      lookbackNs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouchAttribution needs touch types")
    require(!touchTypes.contains(convType),
      s"convType '$convType' must not also be a touch type: the side " +
        "split would silently reclassify every conversion as " +
        "non-attributable instead of crediting earlier conversions")
    require(lookbackNs > 0, "lookbackNs must be positive")
    val base = events
      .filter(col(typeCol).isin(touchTypes: _*) || col(typeCol) === convType)
      .withColumn("__side",
        when(col(typeCol) === convType, 1).otherwise(0))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touchRow = when(col("__side") === 0, struct(
      col(tsCol).as("t_ts"), col(idCol).as("t_id"),
      col(typeCol).as("t_type")))
    base
      .withColumn("__touch", last(touchRow, ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__touch",
        when(col(tsCol) - col("__touch").getField("t_ts") <= lookbackNs,
          col("__touch")))
      .withColumn("__lag_ns", col(tsCol) - col("__touch").getField("t_ts"))
      .select(
        col(idCol).as("conv_id"),
        col(userCol).as("user_id"),
        col(valueCol).as("value"),
        col("__touch").getField("t_id").as("touch_id"),
        col("__touch").getField("t_type").as("touch_type"),
        // integral `div` — never a double on the lag path (nanos are
        // the exactness contract shared with q82/q95)
        expr("__lag_ns div 1000000000").as("lag_seconds"))
  }

  /** Half-life-decayed per-user engagement ledger: each event's milli
    * value contributes `vm >> k` where `k = elapsed div halfLife`
    * halvings relative to the CORPUS reference instant (the max event
    * time, an in-plan one-row scalar — no wall clock, so the result is
    * content-deterministic and replay-stable). Truncating binary
    * halving is the fixed-point spelling of exponential decay: exact
    * integer arithmetic end to end, so both engines agree bit-for-bit
    * — a float `pow(0.5, dt/hl)` would hand every comparison a
    * rounding dispute. Arithmetic right-shift IS floor division by
    * 2^k on both engines; k clamps at 62 (beyond which every long
    * value has decayed to 0 or −1) so shift widths stay in range.
    *
    * Output per user: `n_events`, `raw_milli` (undecayed sum), and
    * `decayed_milli` — the recency-weighted feature-store read (who is
    * engaged NOW) beside q163's point-in-time trailing windows. One
    * partial+final aggregate keyed by user; per-row state is three
    * longs, never an event list. Null values ride SUM's null-skipping
    * on both engines; `msCol` must be non-null epoch millis. */
  def decayedEngagement(
      events: DataFrame, userCol: String, msCol: String,
      valueMilli: Column, halfLifeHours: Long = 24L): DataFrame = {
    require(halfLifeHours > 0, "half-life must be positive")
    val hlMs = 3600000L * halfLifeHours
    val refMs = graft.plans.Scalars.of(
      events.agg(max(col(msCol)).as("m")))
    events
      .withColumn("__vm", valueMilli.cast("long"))
      .withColumn("__ref", refMs)
      .withColumn("__k",
        least(expr(s"(__ref - `$msCol`) div ${hlMs}L"), lit(62L)))
      .withColumn("__dec", expr("shiftright(__vm, cast(__k as int))"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__vm")).as("raw_milli"),
        sum(col("__dec")).as("decayed_milli"))
  }

  /** RFM segmentation (the classic recency/frequency/monetary read):
    * per-user `rec` (ms since last event, against the corpus max event
    * time — no wall clock), `freq` (event count), `mon` (milli-value
    * sum), each quartile-coded 1–4 by EXACT discrete quartiles of the
    * per-user distribution, then rolled up to the 4×4×4 segment grid
    * with user counts and segment value mass.
    *
    * Codes are uniformly ascending in the underlying value — `r_seg 1`
    * = most recent (smallest staleness), `f_seg`/`m_seg 1` = lowest
    * activity/value — with quartile q's threshold the smallest value
    * whose cumulative user count reaches ceil(q·n/4) (discrete-lower,
    * ties share a code; integral spelling `4·cum >= q·n`).
    *
    * Scale shape: corpus rows shuffle ONCE (the per-user aggregate);
    * each dimension's thresholds come from a (value → user count)
    * ledger run through the bucketed two-phase exclusive prefix sum
    * ([[Sampling.topKWithTies]]'s device — no user-wide ordering
    * window anywhere), landing as nine in-plan scalars; assignment is
    * a pure per-row expression and the output is the model-sized
    * 64-cell grid. */
  def rfmSegments(
      events: DataFrame, userCol: String, msCol: String,
      valueMilli: Column): DataFrame = {
    import graft.plans.Scalars
    val refMs = Scalars.of(events.agg(max(col(msCol)).as("m")))
    val users = events
      .withColumn("__vm", valueMilli.cast("long"))
      .groupBy(col(userCol))
      .agg(max(col(msCol)).as("__last"),
        count(lit(1)).as("freq"), sum(col("__vm")).as("mon"))
      .withColumn("rec", refMs - col("__last"))
      .localCheckpoint(true) // 3 threshold ledgers + the assignment pass
    val nUsers = Scalars.of(users.agg(count(lit(1)).as("n")))
    def quartiles(vc: String): Column = {
      val g = users.groupBy(col(vc).as("__v")).agg(count(lit(1)).as("__c"))
      val pref = Eval.exclusivePrefix(g, "__v", "__c", 256, "__below")
      // ONE struct-valued scalar per measure instead of three scalar
      // subqueries each re-filtering the ledger: conditional mins fold
      // the three quartile thresholds into one aggregate pass, cutting
      // the plan's subquery-job count 9 -> 3 (profiled: q201 ran 53
      // serial single-task jobs — subquery and checkpoint latency, not
      // data work)
      def cut(q: Int): Column =
        min(when((col("__below") + col("__c")) * 4 >=
          lit(q.toLong) * nUsers, col("__v")))
      val ts = Scalars.of(
        pref.agg(cut(1).as("t1"), cut(2).as("t2"), cut(3).as("t3"))
          .select(struct(col("t1"), col("t2"), col("t3")).as("t")))
      (lit(1) + when(col(vc) > ts.getField("t1"), 1).otherwise(0) +
        when(col(vc) > ts.getField("t2"), 1).otherwise(0) +
        when(col(vc) > ts.getField("t3"), 1).otherwise(0)).cast("long")
    }
    users
      .withColumn("r_seg", quartiles("rec"))
      .withColumn("f_seg", quartiles("freq"))
      .withColumn("m_seg", quartiles("mon"))
      .groupBy("r_seg", "f_seg", "m_seg")
      .agg(count(lit(1)).as("n_users"), sum(col("mon")).as("mon_milli"))
  }

  /** Hourly volume-anomaly screen: hours whose event count deviates
    * from the corpus-wide hourly median by more than `k` robust
    * standard units (|x − med| > k·MAD, the Hampel identifier — the
    * outage/bot-burst read a mean/stddev z-score misses, because
    * anomalies inflate the very stddev meant to flag them while the
    * median/MAD stay put). Exact integer fixed point throughout:
    * med2 = 2·median, mad4 = 4·MAD (the [[Eval.medianMad]] doubling
    * discipline), and the flag is the integral predicate
    * `2·|2x − med2| > k·mad4` — engines agree bit-for-bit.
    *
    * Scale shape: events shuffle ONCE into the hour ledger (one row
    * per hour — time-bounded by construction, 8.8k rows/year no
    * matter the corpus size); the median/MAD machinery and the flags
    * run entirely on that ledger, with the two statistics entering
    * the plan as scalar subqueries. Output: the anomalous hours only,
    * `(hour, n_events, med2, mad4)`. */
  def hourlyVolumeAnomaly(
      events: DataFrame, msCol: String, k: Int = 3): DataFrame = {
    import graft.plans.Scalars
    val hourly = events
      .groupBy(expr(s"`$msCol` div 3600000").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint(true) // the medianMad pass + the flag pass
    val mm = Eval.medianMad(hourly, lit("all"), col("n_events"), k)
    val med2 = Scalars.of(mm.select(col("med2")))
    val mad4 = Scalars.of(mm.select(col("mad4")))
    hourly
      .withColumn("med2", med2)
      .withColumn("mad4", mad4)
      .filter(lit(2L) * abs(lit(2L) * col("n_events") - col("med2")) >
        lit(k.toLong) * col("mad4"))
      .select(col("hour"), col("n_events"), col("med2"), col("mad4"))
  }
}
