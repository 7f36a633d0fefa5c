package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams — the funnel/cohort tier of
  * an events warehouse (the capability ClickHouse exposes as
  * `windowFunnel` / retention maps; public analytics SQL patterns).
  * Everything is user-keyed aggregation + joins: no windows over the
  * full corpus, no driver-side state, shuffle keys are (user) or
  * (cohort, week) throughout — corpus-linear at any scale.
  */
object EventAnalytics {

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
}
