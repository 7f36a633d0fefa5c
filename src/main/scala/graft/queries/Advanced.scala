package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
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
        ORDER BY user_id, session_no"""))
  )
}
