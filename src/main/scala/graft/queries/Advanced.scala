package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin
import graft.streaming.Streaming

/** Advanced composite operators over the events stream table. */
object Advanced {

  val defs: Map[String, Q] = Map(

    // Gap-based sessionization (batch form; the streaming form shares
    // semantics — see graft.streaming.Streaming.sessionize + its spec).
    // Gap arithmetic is done in whole epoch-milliseconds on BOTH sides
    // so ns→µs truncation can't flip a boundary.
    "q35_sessionize" -> Q(
      fn = (s, dir) => {
        val ev = Tables.eventsWithTs(s, dir)
        Streaming.sessionizeBatch(ev, "user_id", "ts", "value",
          gapMillis = 30 * 60 * 1000L)
          .select(
            col("user_id"),
            col("session_no").cast("long").as("session_no"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("start_s"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("end_s"),
            col("n_events"),
            round(col("total_value"), 2).as("total_value"))
          .orderBy("user_id", "session_no")
      },
      oracle = Some("""
        WITH w AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER wu IS NULL
                        OR epoch_ms(ts) - epoch_ms(lag(ts) OVER wu) > 1800000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW wu AS (PARTITION BY user_id ORDER BY ts)),
             g AS (
          SELECT user_id, ts, value,
                 CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_no
          FROM w)
        SELECT user_id, session_no,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_s,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM g GROUP BY user_id, session_no
        ORDER BY user_id, session_no""")),

    // As-of join: each purchase event enriched with the most recent
    // prior (or simultaneous, at ms granularity) click of the same
    // user. Right side deduped to one row per (user, ms) so the as-of
    // winner is deterministic on both engines.
    "q36_asof_join" -> Q(
      fn = (s, dir) => {
        val ev = Tables.eventsWithTs(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), unix_millis(col("ts")).as("cms"))
          .agg(max(col("event_id")).as("click_id"))
          .withColumn("cts", timestamp_millis(col("cms")))
          .select("user_id", "cts", "click_id")
        AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "cts",
          payloadCols = Seq("click_id"))
          .select(
            col("user_id"), col("event_id"),
            round(col("value"), 2).as("value"),
            col("asof_click_id"))
          .orderBy("user_id", "event_id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT user_id, event_id, value, epoch_ms(ts) AS pms
          FROM events WHERE event_type = 'purchase'),
             c AS (
          SELECT user_id, epoch_ms(ts) AS cms, max(event_id) AS click_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        SELECT p.user_id, p.event_id, round(p.value, 2) AS value,
               c.click_id AS asof_click_id
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.cms <= p.pms
        ORDER BY p.user_id, p.event_id"""))
  )
}
