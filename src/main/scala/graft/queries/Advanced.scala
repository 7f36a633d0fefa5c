package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}
import graft.streaming.Streaming

/** Advanced composite operators over the events stream table. */
object Advanced {

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // Behavioral sequence construction: each user's event-type stream
    // as a training token sequence — (ts, event_id)-ordered, CONSECUTIVE
    // repeats collapsed (the run-length dedup every behavioral-LM prep
    // applies), truncated to the first 64 tokens. User-keyed windows
    // only (the EventAnalytics state bound — a user's history, never
    // the corpus); the ordered reassembly is one sort_array over the
    // per-user collapsed rows.
    // ------------------------------------------------------------------
    "q156_event_sequences" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val collapsed = ev
          .withColumn("__prev", lag(col("event_type"), 1).over(w))
          .filter(!(col("__prev") <=> col("event_type")))
        collapsed.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sort_array(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))).as("__arr"))
          .select(col("user_id"), col("n_tokens"),
            array_join(expr("transform(slice(`__arr`, 1, 64), " +
              "x -> x.event_type)"), " ").as("seq_text"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH o AS (
          SELECT user_id, ts, event_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events),
        k AS (SELECT user_id, ts, event_id, event_type FROM o
              WHERE prev IS DISTINCT FROM event_type),
        r AS (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM k)
        SELECT user_id, count(*) AS n_tokens,
               string_agg(CASE WHEN rn <= 64 THEN event_type END,
                          ' ' ORDER BY rn) AS seq_text
        FROM r GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // Point-in-time-correct feature backfill: each purchase event gets
    // its user's trailing-7-day activity count/spend and recency,
    // computed over STRICTLY-PRIOR events only (frame ends at
    // 1 ms PRECEDING — the current row and its exact-timestamp peers
    // never leak into their own features, the López de Prado
    // train-time discipline q158 applies to splits, applied here to
    // features). User-keyed RANGE windows only — a user's history is
    // the state bound, never the corpus; features ride ONE sort per
    // user partition. Epoch-ms arithmetic + milli-long spend on both
    // engines (the sessionize parity discipline) — bit-exact gate.
    // ------------------------------------------------------------------
    "q163_rolling_features" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.eventsWithTs(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"),
            round(col("value") * 1000).cast("long").as("vm"))
        val w7 = Window.partitionBy(col("user_id")).orderBy(col("ms"))
          .rangeBetween(-604800000L, -1L)
        val wa = Window.partitionBy(col("user_id")).orderBy(col("ms"))
          .rangeBetween(Window.unboundedPreceding, -1L)
        ev.withColumn("n_prior_7d", count(lit(1)).over(w7))
          .withColumn("spend_milli_7d",
            coalesce(sum(col("vm")).over(w7), lit(0L)))
          .withColumn("n_prior_total", count(lit(1)).over(wa))
          .withColumn("ms_since_last", col("ms") - max(col("ms")).over(wa))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ms"),
            col("n_prior_7d"), col("spend_milli_7d"),
            col("n_prior_total"), col("ms_since_last"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms,
                 CAST(round(value * 1000) AS BIGINT) AS vm
          FROM events),
        f AS (
          SELECT event_id, user_id, ms, event_type,
                 count(*) OVER w7 AS n_prior_7d,
                 COALESCE(sum(vm) OVER w7, 0) AS spend_milli_7d,
                 count(*) OVER wa AS n_prior_total,
                 ms - max(ms) OVER wa AS ms_since_last
          FROM ev
          WINDOW w7 AS (PARTITION BY user_id ORDER BY ms
                        RANGE BETWEEN 604800000 PRECEDING
                        AND 1 PRECEDING),
                 wa AS (PARTITION BY user_id ORDER BY ms
                        RANGE BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING))
        SELECT event_id, user_id, ms,
               CAST(n_prior_7d AS BIGINT) AS n_prior_7d,
               CAST(spend_milli_7d AS BIGINT) AS spend_milli_7d,
               CAST(n_prior_total AS BIGINT) AS n_prior_total,
               ms_since_last
        FROM f WHERE event_type = 'purchase' ORDER BY event_id""")),

    // ------------------------------------------------------------------
    // Automation screen: per-user inter-event-gap regularity — machine
    // traffic fires on a clock (squared coefficient of variation ≪ 1),
    // humans are bursty (cv² ≈ 1 for Poisson-ish arrivals) — the
    // row-source hygiene screen run BEFORE events feed behavioral
    // training (q156/q163). Exact integer protocol: second-granular
    // gaps from a per-user lag, per-user long sums, floor-division
    // mean/var/cv² in milli fixed point with the var clamped at 0
    // (floor rounding can push a near-zero variance to −1) — bit-exact
    // cross-engine, positive operands so DuckDB // = Spark div.
    // Overflow contract: n·maxgap² ≤ span² bounds the widest term
    // 10^6·(Σg² div n) — month-long second-granular histories sit at
    // ~7·10^18 < 2^63; longer spans coarsen the gap unit.
    // ------------------------------------------------------------------
    "q166_bot_regularity" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.eventsWithTs(s, dir)
          .select(col("user_id"), col("event_id"),
            expr("unix_millis(`ts`) div 1000").as("sec"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("sec"), col("event_id"))
        ev.withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
          .filter(col("gap").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"),
            sum(col("gap")).as("__sg"),
            sum(col("gap") * col("gap")).as("__sg2"))
          .filter(col("n_gaps") >= 8)
          .select(col("user_id"), col("n_gaps"),
            expr("`__sg` div `n_gaps`").as("mean_gap_s"),
            expr("""greatest(`__sg2` div `n_gaps` -
                    (`__sg` div `n_gaps`) * (`__sg` div `n_gaps`), 0L)
                 """).as("__var"))
          .filter(col("mean_gap_s") > 0)
          .withColumn("cv2_milli", expr(
            "(1000000L * `__var`) div (`mean_gap_s` * `mean_gap_s`)"))
          .select(col("user_id"), col("n_gaps"), col("mean_gap_s"),
            col("cv2_milli"),
            (col("cv2_milli") < 250000L).as("is_bot"))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_ms(ts) // 1000 AS sec
          FROM events),
        g AS (
          SELECT user_id,
                 sec - lag(sec) OVER (PARTITION BY user_id
                                      ORDER BY sec, event_id) AS gap
          FROM ev),
        a AS (
          SELECT user_id, count(*) AS n_gaps,
                 CAST(sum(gap) AS BIGINT) AS sg,
                 CAST(sum(gap * gap) AS BIGINT) AS sg2
          FROM g WHERE gap IS NOT NULL
          GROUP BY user_id HAVING count(*) >= 8),
        v AS (
          SELECT user_id, n_gaps, sg // n_gaps AS mean_gap_s,
                 greatest(sg2 // n_gaps -
                          (sg // n_gaps) * (sg // n_gaps), 0) AS var
          FROM a),
        c AS (
          SELECT user_id, n_gaps, mean_gap_s,
                 (1000000 * var) // (mean_gap_s * mean_gap_s)
                   AS cv2_milli
          FROM v WHERE mean_gap_s > 0)
        SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
               CAST(mean_gap_s AS BIGINT) AS mean_gap_s,
               CAST(cv2_milli AS BIGINT) AS cv2_milli,
               cv2_milli < 250000 AS is_bot
        FROM c ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // In-engine eval harness: leave-last-out next-event prediction.
    // Train = every user transition EXCEPT each user's final one
    // (q158's temporal-split discipline applied to a model eval);
    // model = the argmax bigram transition matrix (count desc, label
    // asc tie — deterministic); score = per-context accuracy on the
    // held-out finals, milli fixed point. A held-out context unseen
    // in training predicts nothing and scores INCORRECT (left join,
    // null never equals). The transition matrix and argmax live on an
    // event-type²-sized aggregate — model-sized windows only; the
    // corpus passes once through user-keyed lag/rank windows.
    // ------------------------------------------------------------------
    "q169_next_event_eval" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.eventsWithTs(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
        val wAsc = Window.partitionBy(col("user_id"))
          .orderBy(col("ms"), col("event_id"))
        val wDesc = Window.partitionBy(col("user_id"))
          .orderBy(col("ms").desc, col("event_id").desc)
        val t2 = ev
          .withColumn("prv", lag(col("event_type"), 1).over(wAsc))
          .withColumn("rdesc", row_number().over(wDesc))
          .filter(col("prv").isNotNull)
          .select(col("prv"), col("event_type").as("nxt"),
            (col("rdesc") === 1).as("heldout"))
        val train = t2.filter(!col("heldout"))
          .groupBy(col("prv"), col("nxt"))
          .agg(count(lit(1)).as("c"))
        val pred = train
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("prv"))
              .orderBy(col("c").desc, col("nxt"))))
          .filter(col("rn") === 1)
          .select(col("prv"), col("nxt").as("pred"))
        t2.filter(col("heldout"))
          .join(pred, Seq("prv"), "left")
          .groupBy(col("prv"))
          .agg(count(lit(1)).as("n_eval"),
            sum(when(col("nxt") === col("pred"), 1L).otherwise(0L))
              .as("n_correct"))
          .withColumn("acc_milli",
            expr("(1000 * `n_correct`) div `n_eval`"))
          .orderBy("prv")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
          FROM events),
        tr AS (
          SELECT user_id, event_type AS nxt,
                 lag(event_type) OVER w AS prv,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ms DESC, event_id DESC)
                   AS rdesc
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        t2 AS (
          SELECT prv, nxt, rdesc = 1 AS heldout
          FROM tr WHERE prv IS NOT NULL),
        train AS (
          SELECT prv, nxt, count(*) AS c
          FROM t2 WHERE NOT heldout GROUP BY 1, 2),
        pred AS (
          SELECT prv, nxt AS pred FROM (
            SELECT prv, nxt, row_number() OVER (
              PARTITION BY prv ORDER BY c DESC, nxt) AS rn
            FROM train) WHERE rn = 1)
        SELECT t2.prv, count(*) AS n_eval,
               CAST(sum(CASE WHEN t2.nxt = p.pred THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_correct,
               CAST((1000 * sum(CASE WHEN t2.nxt = p.pred
                                     THEN 1 ELSE 0 END)) // count(*)
                 AS BIGINT) AS acc_milli
        FROM t2 LEFT JOIN pred p ON t2.prv = p.prv
        WHERE t2.heldout
        GROUP BY t2.prv ORDER BY t2.prv""")),

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
        ORDER BY p.user_id, p.event_id""")),

    // Tumbling-window aggregation — the BATCH evaluation of the exact
    // expression Streaming.windowedAgg runs incrementally (groupBy
    // window(ts, '1 hour')); Spark windows align to epoch-hour
    // boundaries, which the oracle reproduces with integral epoch-ms
    // arithmetic (sub-ms ns→µs truncation can't move an hour bucket).
    "q38_windowed_agg" -> Q(
      fn = (s, dir) => {
        val ev = Tables.eventsWithTs(s, dir)
        Streaming.windowedAgg(ev, "ts", "event_type", "value", "1 hour")
          .select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("event_type"),
            col("n"),
            round(col("total"), 2).as("total"))
          .orderBy("win_start", "event_type")
      },
      oracle = Some("""
        SELECT strftime(make_timestamp(((epoch_ms(ts) // 3600000) * 3600000) * 1000),
                        '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type, count(*) AS n, round(sum(value), 2) AS total
        FROM events
        GROUP BY 1, 2
        ORDER BY win_start, event_type""")),

    // Sink surface (SURVEY §2.2 "Sinks"): aggregate → parquet sink →
    // re-scan → csv sink (header) → re-scan with explicit schema. The
    // gate compares the twice-round-tripped result against the oracle,
    // so both writers and both readers must preserve values and types.
    "q39_sink_roundtrip" -> Q(
      fn = (s, dir) => {
        val base = Q.scratchPath(s, dir, "graft_sink")
        val agg = Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("total"))
        agg.write.mode("overwrite").parquet(s"$base/parquet")
        val fromParquet = s.read.parquet(s"$base/parquet")
        fromParquet.write.mode("overwrite")
          .option("header", "true").csv(s"$base/csv")
        s.read.schema(fromParquet.schema).option("header", "true")
          .csv(s"$base/csv")
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // Raw-text surface (SURVEY §2.2 "Scans/sources"): the ingestion
    // shape of .txt dumps — documents' text written through the text
    // sink (one row per line), re-scanned with the text source, and
    // summarized. The gate proves the line-oriented writer+reader pair
    // preserves content exactly (counts, bytes, token structure). The
    // corpus is newline-free by dataset contract (a multi-line doc
    // would split; use wholetext for the per-file layout — spec-gated
    // in SourcesSpec); nulls excluded identically on both sides.
    "q216_text_roundtrip" -> Q(
      fn = (s, dir) => {
        val base = Q.scratchPath(s, dir, "graft_text")
        Tables(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("text"))
          .write.mode("overwrite").text(base)
        graft.sources.Sources.text(s, base)
          .agg(count(lit(1)).as("n_lines"),
            sum(length(col("value"))).cast("long").as("n_chars"),
            sum(size(split(col("value"), " "))).cast("long").as("n_tokens"))
      },
      oracle = Some("""
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(length(text)) AS BIGINT) AS n_chars,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL""")),

    // XML roundtrip through Spark 4's BUILT-IN xml source (the
    // spark-xml donation — no external connector): documents written
    // as <doc> elements (text escaped on the way out), re-read with
    // an explicit schema (surrounding-space trim disabled — the
    // source's default corrupts whitespace-significant corpora), and
    // aggregated per language — values must survive escape/unescape
    // exactly vs DuckDB on the parquet. A NULL source text writes as
    // an absent element and reads back NULL; the coalesce (identical
    // in the oracle) normalizes that one case so the gate holds on
    // ANY corpus content.
    "q223_xml_roundtrip" -> Q(
      fn = (s, dir) => {
        val base = Q.scratchPath(s, dir, "graft_xml")
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))
          .write.mode("overwrite").option("rowTag", "doc")
          .format("xml").save(base)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))
        graft.sources.Sources.xml(s, base, schema, "doc")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(coalesce(col("text"), lit(""))))
              .cast("long").as("n_chars"),
            max(col("doc_id")).as("max_id"))
          .orderBy("lang")
      },
      oracle = Some("""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(length(coalesce(text, '')))AS BIGINT) AS n_chars,
               max(doc_id) AS max_id
        FROM documents GROUP BY lang ORDER BY lang""")),

    // Range join via interval bucketing (RangeJoin.pointInInterval):
    // clicks landing in the 10 minutes before each purchase, counted
    // per purchase. A non-equi BETWEEN that Spark would otherwise plan
    // as a nested-loop join becomes an equi-join on time bins. All
    // time arithmetic in whole epoch-ms on both sides.
    "q40_range_join" -> Q(
      fn = (s, dir) => {
        val ev = Tables.eventsWithTs(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), unix_millis(col("ts")).as("pms"))
          .withColumn("lo", col("pms") - 600000L)
          .withColumn("hi", col("pms") - 1L)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), unix_millis(col("ts")).as("cms"))
        val matched = RangeJoin.pointInInterval(
          clicks, purchases, "cms", "lo", "hi", binWidth = 600000L)
          .groupBy("p_id").agg(count(lit(1)).as("n_clicks"))
        purchases.select("p_id")
          .join(matched, Seq("p_id"), "left")
          .select(col("p_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
          .orderBy("p_id")
      },
      oracle = Some("""
        WITH p AS (
          SELECT event_id AS p_id, epoch_ms(ts) AS pms
          FROM events WHERE event_type = 'purchase'),
             c AS (
          SELECT epoch_ms(ts) AS cms
          FROM events WHERE event_type = 'click')
        SELECT p.p_id, CAST(count(c.cms) AS BIGINT) AS n_clicks
        FROM p LEFT JOIN c
          ON c.cms >= p.pms - 600000 AND c.cms <= p.pms - 1
        GROUP BY p.p_id
        ORDER BY p.p_id""")),

    // Salted skew join (SkewJoin.salted): events are heavily skewed on
    // event_type (5 hot keys), the per-type profile is too small to
    // shuffle sensibly but the demo forgoes broadcast — salting spreads
    // each hot key over 8 (key, salt) partitions. Result is identical
    // to the unsalted join by construction.
    // First-touch funnel (view -> click -> purchase, each within 24h of
    // the user's FIRST view): greedy earliest matching is
    // deterministic, so the step counts compare exactly. Counts are
    // monotone by construction. Both engines floor event time to whole
    // epoch MILLISECONDS before comparing (the repo-wide discipline for
    // the nanos-typed events.ts: raw-timestamp comparisons would hinge
    // on each engine's ns handling — DuckDB truncates to us at 1.0 but
    // reads native ns from 1.1, so a sub-us boundary could flip).
    "q79_funnel" -> Q(
      fn = (s, dir) => {
        import graft.operators.EventAnalytics
        val ev = Tables(s, dir, "events")
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_millis(expr(
            "ts_ns div 1000000 - (CASE WHEN ts_ns % 1000000 < 0 THEN 1 ELSE 0 END)")))
        EventAnalytics.funnelCounts(ev,
          "user_id", "event_type", "ts",
          steps = Seq("view", "click", "purchase"),
          withinMs = Some(24L * 3600 * 1000))
          .orderBy("step_no")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        s1 AS (
          SELECT user_id, min(ms) AS t1 FROM ev
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (
          SELECT e.user_id, min(e.ms) AS t2, any_value(s1.t1) AS t1
          FROM ev e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ms > s1.t1
            AND e.ms <= s1.t1 + 86400000
          GROUP BY 1),
        s3 AS (
          SELECT e.user_id, min(e.ms) AS t3
          FROM ev e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ms > s2.t2
            AND e.ms <= s2.t1 + 86400000
          GROUP BY 1)
        SELECT * FROM (
          SELECT 1 AS step_no, 'view' AS step,
                 (SELECT count(*) FROM s1) AS n_users
          UNION ALL
          SELECT 2, 'click', (SELECT count(*) FROM s2)
          UNION ALL
          SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        ORDER BY step_no""")),

    // Anchor-maximizing funnel-level histogram (windowFunnel-exact —
    // contrast with q79's first-touch anchoring): deepest chain within
    // 6h of the chain's OWN first step. The oracle realizes the same
    // semantic as greedy-per-anchor CTEs (optimal per anchor: an
    // earlier intermediate step only loosens later constraints); both
    // engines work in whole epoch ms.
    "q81_funnel_levels" -> Q(
      fn = (s, dir) => {
        import graft.operators.EventAnalytics
        EventAnalytics.funnelLevels(Tables.eventsWithTs(s, dir),
          "user_id", "event_type", "ts",
          steps = Seq("view", "click", "purchase"),
          withinMs = 6L * 3600 * 1000)
          .groupBy(col("level").cast("long").as("level"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("level")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        v AS (SELECT user_id, ms AS t1 FROM ev WHERE event_type = 'view'),
        c AS (SELECT v.user_id, v.t1, min(e.ms) AS t2
              FROM v JOIN ev e ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ms > v.t1
                AND e.ms <= v.t1 + 21600000
              GROUP BY 1, 2),
        p AS (SELECT c.user_id, c.t1, min(e.ms) AS t3
              FROM c JOIN ev e ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ms > c.t2
                AND e.ms <= c.t1 + 21600000
              GROUP BY 1, 2),
        lvl AS (
          SELECT v.user_id,
                 max(CASE WHEN p.t1 IS NOT NULL THEN 3
                          WHEN c.t1 IS NOT NULL THEN 2 ELSE 1 END) AS level
          FROM v LEFT JOIN c ON v.user_id = c.user_id AND v.t1 = c.t1
                 LEFT JOIN p ON v.user_id = p.user_id AND v.t1 = p.t1
          GROUP BY 1)
        SELECT level, count(*) AS n_users FROM lvl
        GROUP BY 1 ORDER BY level""")),

    // Cohort retention matrix: ISO-week cohorts (Monday-start
    // date_trunc agrees between engines; offsets divide exactly in a
    // UTC session).
    "q80_retention" -> Q(
      fn = (s, dir) => {
        import graft.operators.EventAnalytics
        EventAnalytics.retentionMatrix(Tables.eventsWithTs(s, dir),
          "user_id", "ts")
          .orderBy("cohort_week", "week_offset")
      },
      oracle = Some("""
        WITH fw AS (
          SELECT user_id, date_trunc('week', min(ts)) AS cohort
          FROM events GROUP BY 1),
        act AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        SELECT strftime(fw.cohort, '%Y-%m-%d') AS cohort_week,
               CAST((epoch(act.w) - epoch(fw.cohort)) / 604800 AS BIGINT)
                 AS week_offset,
               count(*) AS n_users
        FROM act JOIN fw USING (user_id)
        GROUP BY 1, 2
        ORDER BY cohort_week, week_offset""")),

    // First-order Markov event-transition matrix. Ordering is the raw
    // nanos long + event_id — an exact integral total order both
    // engines reproduce bit-for-bit (DuckDB: epoch_ns; no float, no
    // truncation ambiguity). prob is integer-count division on both
    // sides, rounded identically.
    "q82_event_transitions" -> Q(
      fn = (s, dir) => {
        import graft.operators.EventAnalytics
        val ev = Tables(s, dir, "events") // ts read as raw nanos long
        EventAnalytics.transitionMatrix(ev,
          "user_id", "event_type", orderCols = Seq("ts", "event_id"))
          .select(col("from_type"), col("to_type"), col("n"),
            round(col("prob"), 6).as("prob"))
          .orderBy("from_type", "to_type")
      },
      oracle = Some("""
        WITH ord AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER
                   (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
                   AS to_type
          FROM events),
             cnt AS (
          SELECT event_type AS from_type, to_type, count(*) AS n
          FROM ord WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               round(CAST(n AS DOUBLE)
                     / sum(n) OVER (PARTITION BY from_type), 6) AS prob
        FROM cnt ORDER BY from_type, to_type""")),

    // Last-touch attribution: every purchase credited to the user's
    // most recent click/view within a 24 h lookback. One user-keyed
    // window pass (an as-of join specialized to one stream); winning
    // touch = max (nanos, event_id) — exact integral ordering, same
    // contract as q82. The oracle decorrelates to the identical
    // greatest-row-per-group subquery.
    "q109_last_touch_attribution" -> Q(
      fn = (s, dir) => {
        import graft.operators.EventAnalytics
        val ev = Tables(s, dir, "events") // ts read as raw nanos long
        EventAnalytics.lastTouchAttribution(ev,
          "user_id", "event_type", "ts", "event_id", "value",
          touchTypes = Seq("click", "view"), convType = "purchase",
          lookbackNs = 86400L * 1000000000L)
          .select(col("conv_id"), col("user_id"),
            round(col("value"), 2).as("value"),
            col("touch_id"), col("touch_type"), col("lag_seconds"))
          .orderBy("conv_id")
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns, value
          FROM events),
        p AS (SELECT * FROM e WHERE event_type = 'purchase'),
        t AS (SELECT * FROM e WHERE event_type IN ('click', 'view')),
        m AS (
          SELECT p.event_id AS conv_id, p.user_id, p.value, p.tns,
                 (SELECT t.event_id FROM t
                  WHERE t.user_id = p.user_id AND t.tns <= p.tns
                    AND p.tns - t.tns <= 86400000000000
                  ORDER BY t.tns DESC, t.event_id DESC LIMIT 1) AS touch_id
          FROM p)
        SELECT m.conv_id, m.user_id, round(m.value, 2) AS value,
               m.touch_id, t2.event_type AS touch_type,
               (m.tns - t2.tns) // 1000000000 AS lag_seconds
        FROM m LEFT JOIN t t2 ON m.touch_id = t2.event_id
        ORDER BY conv_id""")),

    "q42_skew_join" -> Q(
      fn = (s, dir) => {
        val ev = Tables(s, dir, "events")
        val profile = ev.groupBy(col("event_type"))
          .agg(avg(col("value")).as("type_avg"))
        SkewJoin.salted(ev, profile, "event_type",
          salts = 8, saltBy = col("event_id"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            count(when(col("value") > col("type_avg"), 1)).as("n_above"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH prof AS (
          SELECT event_type, avg(value) AS type_avg
          FROM events GROUP BY event_type)
        SELECT e.event_type,
               count(*) AS n,
               CAST(count(CASE WHEN e.value > p.type_avg THEN 1 END) AS BIGINT)
                 AS n_above
        FROM events e JOIN prof p ON e.event_type = p.event_type
        GROUP BY e.event_type
        ORDER BY e.event_type""")),

    // ------------------------------------------------------------------
    // Event-time RANGE-frame sliding window: per user, count and value
    // sum over the trailing hour of EVENT TIME (not row count — the
    // frame a rate limiter or rolling-exposure feature needs; q57's
    // ROWS frame is the other kind). Ordering and the frame bound are
    // raw epoch NANOS on both engines — integral arithmetic, so no
    // ns→µs truncation or float interval math can flip a boundary row.
    // ------------------------------------------------------------------
    "q95_sliding_hour_window" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourNs = 3600L * 1000000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
          .rangeBetween(-hourNs, 0L)
        Tables.eventsWithTs(s, dir)
          .select(
            col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_1h"),
            round(sum(col("value")).over(w), 2).as("sum_1h"))
          .orderBy("user_id", "event_id")
      },
      oracle = Some("""
        SELECT user_id, event_id,
               CAST(count(*) OVER w AS BIGINT) AS n_1h,
               round(sum(value) OVER w, 2) AS sum_1h
        FROM (SELECT user_id, event_id, value, epoch_ns(ts) AS ts_ns
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns
                     RANGE BETWEEN 3600000000000 PRECEDING
                           AND CURRENT ROW)
        ORDER BY user_id, event_id""")),

    // ------------------------------------------------------------------
    // Semi-structured schema-on-read: the events' JSON props column
    // parsed ONCE into Spark 4's VARIANT type (binary-encoded,
    // shredding-ready — the open-format answer to schema-free
    // payloads, exactly the reference's "keyed binary rows" data model
    // made queryable), then typed extraction and per-type aggregation.
    // The oracle reads the same payloads through DuckDB's JSON
    // extraction — exact integers end to end.
    // ------------------------------------------------------------------
    "q194_variant_props" -> Q(
      fn = (s, dir) => {
        Tables(s, dir, "events")
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'bigint')")
              .as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            count(col("k")).as("n_with_k"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy("event_type")
      },
      oracle = Some("""
        SELECT event_type, count(*) AS n,
               count(CAST(props ->> '$.k' AS BIGINT)) AS n_with_k,
               CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT)
                 AS sum_k,
               min(CAST(props ->> '$.k' AS BIGINT)) AS min_k,
               max(CAST(props ->> '$.k' AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // Conversion-latency profile: per first-view hour-of-day cohort,
    // the robust center/scale of view→purchase latency — each user's
    // FIRST view and their FIRST purchase at-or-after it, latency in
    // whole seconds, then [[graft.operators.Eval.medianMad]] over the
    // (cohort, latency) ledger (exact median + MAD + robust-z outlier
    // count; a p99-dragging whale can't move it). Two user-keyed
    // aggregates + one ledger pass; the funnel-timing read beside
    // q79/q81's conversion COUNTS.
    // ------------------------------------------------------------------
    "q187_conversion_latency" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        val ev = Tables.eventsWithTs(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ms")).as("vms"))
        val latency = ev.filter(col("event_type") === "purchase")
          .join(firstView, Seq("user_id"))
          .filter(col("ms") >= col("vms"))
          .groupBy(col("user_id"))
          .agg(min(col("ms")).as("pms"), min(col("vms")).as("vms2"))
          .select(
            expr("(`vms2` div 3600000) % 24").as("view_hour"),
            expr("(`pms` - `vms2`) div 1000").as("latency_s"))
        Eval.medianMad(latency, stratum = col("view_hour"),
          value = col("latency_s"), k = 3)
          .withColumnRenamed("stratum", "view_hour")
          .withColumnRenamed("n_docs", "n_users")
          .orderBy("view_hour")
      },
      oracle = Some("""
        WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
                    FROM events),
        fv AS (SELECT user_id, min(ms) AS vms FROM ev
               WHERE event_type = 'view' GROUP BY 1),
        lat AS (SELECT (fv.vms // 3600000) % 24 AS view_hour,
                       (min(ev.ms) - fv.vms) // 1000 AS latency_s
                FROM ev JOIN fv USING (user_id)
                WHERE ev.event_type = 'purchase' AND ev.ms >= fv.vms
                GROUP BY ev.user_id, fv.vms),
        g AS (SELECT view_hour, latency_s AS v, count(*) AS c
              FROM lat GROUP BY 1, 2),
        t AS (SELECT view_hour, CAST(sum(c) AS BIGINT) AS n
              FROM g GROUP BY 1),
        cum AS (SELECT g.view_hour, g.v, g.c, t.n,
                       sum(g.c) OVER (PARTITION BY g.view_hour
                                      ORDER BY g.v) AS cm
                FROM g JOIN t USING (view_hour)),
        med AS (SELECT view_hour, min(n) AS n,
                       min(CASE WHEN cm >= (n + 1) // 2 THEN v END) +
                       min(CASE WHEN cm >= n // 2 + 1 THEN v END) AS med2
                FROM cum GROUP BY view_hour),
        dl AS (SELECT g.view_hour, abs(2 * g.v - m.med2) AS d,
                      CAST(sum(g.c) AS BIGINT) AS c
               FROM g JOIN med m USING (view_hour) GROUP BY 1, 2),
        dcum AS (SELECT dl.view_hour, dl.d, dl.c, m.n,
                        sum(dl.c) OVER (PARTITION BY dl.view_hour
                                        ORDER BY dl.d) AS cm
                 FROM dl JOIN med m USING (view_hour)),
        mad AS (SELECT view_hour,
                       min(CASE WHEN cm >= (n + 1) // 2 THEN d END) +
                       min(CASE WHEN cm >= n // 2 + 1 THEN d END) AS mad4
                FROM dcum GROUP BY view_hour),
        outl AS (SELECT dl.view_hour,
                        CAST(sum(CASE WHEN 2 * dl.d > 3 * mad.mad4
                                 THEN dl.c ELSE 0 END) AS BIGINT)
                          AS n_outliers
                 FROM dl JOIN mad USING (view_hour) GROUP BY 1)
        SELECT med.view_hour, med.n AS n_users,
               CAST(med.med2 AS BIGINT) AS med2,
               CAST(mad.mad4 AS BIGINT) AS mad4,
               outl.n_outliers
        FROM med JOIN mad USING (view_hour) JOIN outl USING (view_hour)
        ORDER BY view_hour""")),

    // ------------------------------------------------------------------
    // Frequent behavioral trigrams: the top-20 length-3 event-type
    // patterns across all user streams — the sequential-pattern read
    // behind next-event models (q169 evaluates one; this says which
    // contexts dominate) and behavioral-LM vocab design (q156 builds
    // the sequences; this profiles them). Two user-keyed lead()
    // windows (a user's stream is the state bound, never the corpus)
    // + one partial+final trigram count; top-20 plans as
    // TakeOrderedAndProject under the (n desc, trigram) total order.
    // ------------------------------------------------------------------
    "q186_event_trigrams" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("t1"))
          .withColumn("t2", lead(col("t1"), 1).over(w))
          .withColumn("t3", lead(col("t1"), 2).over(w))
          .filter(col("t3").isNotNull)
          .groupBy(col("t1"), col("t2"), col("t3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
          .limit(20)
      },
      oracle = Some("""
        WITH o AS (
          SELECT event_type AS t1,
                 lead(event_type, 1) OVER w AS t2,
                 lead(event_type, 2) OVER w AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT t1, t2, t3, count(*) AS n
        FROM o WHERE t3 IS NOT NULL
        GROUP BY t1, t2, t3
        ORDER BY n DESC, t1, t2, t3 LIMIT 20""")),

    // ------------------------------------------------------------------
    // Per-event-type value trend: OLS slope/intercept of the milli-
    // fixed-point event value against the hour index — the regression
    // drift monitor ("is this stream's value drifting, and how fast")
    // complementing the distributional snapshots (q145/q147/q173).
    // Exact decimal moment sums through one aggregate; both engines
    // assemble the closed form from bit-identical integers (the q171
    // discipline), with the q163 round(value·1000) milli device.
    // Units: slope = milli-value per hour.
    // ------------------------------------------------------------------
    "q182_event_value_trend" -> Q(
      fn = (s, dir) => {
        import graft.operators.Eval
        val ev = Tables.eventsWithTs(s, dir)
          .select(col("event_type"),
            expr("unix_millis(ts) div 3600000").as("h"),
            round(col("value") * 1000).cast("long").as("vm"))
        Eval.olsTrend(ev, group = col("event_type"),
          x = col("h"), y = col("vm"))
          .withColumnRenamed("grp", "event_type")
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT event_type, epoch_ms(ts) // 3600000 AS x,
                 CAST(round(value * 1000) AS BIGINT) AS y
          FROM events),
        m AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
                     sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
              FROM ev GROUP BY event_type)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CASE WHEN n >= 2 AND n::DOUBLE * sxx::DOUBLE -
                         sx::DOUBLE * sx::DOUBLE > 0 THEN
                 round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                   / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
                   6)
               END AS slope,
               CASE WHEN n >= 2 AND n::DOUBLE * sxx::DOUBLE -
                         sx::DOUBLE * sx::DOUBLE > 0 THEN
                 round((sy::DOUBLE -
                   ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
                    (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
                   * sx::DOUBLE) / n::DOUBLE, 6)
               END AS icept
        FROM m ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // Half-life-decayed engagement: per-user recency-weighted value,
    // one halving per elapsed 24 h relative to the corpus max event
    // time — exponential decay in EXACT integer fixed point (vm >> k;
    // arithmetic shift = floor division by 2^k on both engines), so
    // the gate is bit-exact where a float pow() spelling would be a
    // rounding dispute. The "who is engaged NOW" feature-store read
    // beside q163's point-in-time trailing windows; one partial+final
    // user-keyed aggregate.
    // ------------------------------------------------------------------
    "q200_decayed_engagement" -> Q(
      fn = (s, dir) => {
        import graft.operators.EventAnalytics
        val ev = Tables.eventsWithTs(s, dir).select(
          col("user_id"), unix_millis(col("ts")).as("ms"),
          round(col("value") * 1000).cast("long").as("vm"))
        EventAnalytics.decayedEngagement(ev, "user_id", "ms",
            col("vm"), halfLifeHours = 24L)
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ms,
                 CAST(round(value * 1000) AS BIGINT) AS vm
          FROM events),
        r AS (SELECT max(ms) AS ref FROM ev)
        SELECT user_id, count(*) AS n_events,
               CAST(sum(vm) AS BIGINT) AS raw_milli,
               CAST(sum(vm >> LEAST((ref - ms) // 86400000, 62))
                 AS BIGINT) AS decayed_milli
        FROM ev CROSS JOIN r
        GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // RFM segmentation: per-user recency/frequency/monetary, each
    // quartile-coded by EXACT discrete quartiles (smallest value whose
    // cumulative user count reaches ceil(q·n/4) — the integral 4·cum
    // >= q·n spelling), rolled up to the 4×4×4 segment grid. Corpus
    // rows shuffle once; the nine thresholds ride the bucketed
    // two-phase prefix-sum ledgers as in-plan scalars — never a
    // user-wide ordering window. Ascending codes: r_seg 1 = most
    // recent, f/m_seg 1 = lowest.
    // ------------------------------------------------------------------
    "q201_rfm_segments" -> Q(
      fn = (s, dir) => {
        import graft.operators.EventAnalytics
        val ev = Tables.eventsWithTs(s, dir).select(
          col("user_id"), unix_millis(col("ts")).as("ms"),
          round(col("value") * 1000).cast("long").as("vm"))
        EventAnalytics.rfmSegments(ev, "user_id", "ms", col("vm"))
          .orderBy("r_seg", "f_seg", "m_seg")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ms,
                 CAST(round(value * 1000) AS BIGINT) AS vm
          FROM events),
        u AS (
          SELECT user_id,
                 (SELECT max(ms) FROM ev) - max(ms) AS rec,
                 count(*) AS freq,
                 CAST(sum(vm) AS BIGINT) AS mon
          FROM ev GROUP BY user_id),
        n AS (SELECT count(*) AS n FROM u),
        cr AS (SELECT rec AS v, count(*) OVER (ORDER BY rec) AS cum FROM u),
        cf AS (SELECT freq AS v, count(*) OVER (ORDER BY freq) AS cum FROM u),
        cm AS (SELECT mon AS v, count(*) OVER (ORDER BY mon) AS cum FROM u),
        t AS (SELECT
          (SELECT min(v) FROM cr WHERE cum*4 >= 1*(SELECT n FROM n)) AS r1,
          (SELECT min(v) FROM cr WHERE cum*4 >= 2*(SELECT n FROM n)) AS r2,
          (SELECT min(v) FROM cr WHERE cum*4 >= 3*(SELECT n FROM n)) AS r3,
          (SELECT min(v) FROM cf WHERE cum*4 >= 1*(SELECT n FROM n)) AS f1,
          (SELECT min(v) FROM cf WHERE cum*4 >= 2*(SELECT n FROM n)) AS f2,
          (SELECT min(v) FROM cf WHERE cum*4 >= 3*(SELECT n FROM n)) AS f3,
          (SELECT min(v) FROM cm WHERE cum*4 >= 1*(SELECT n FROM n)) AS m1,
          (SELECT min(v) FROM cm WHERE cum*4 >= 2*(SELECT n FROM n)) AS m2,
          (SELECT min(v) FROM cm WHERE cum*4 >= 3*(SELECT n FROM n)) AS m3),
        s AS (
          SELECT mon,
            CAST(1 + (CASE WHEN rec > t.r1 THEN 1 ELSE 0 END)
                   + (CASE WHEN rec > t.r2 THEN 1 ELSE 0 END)
                   + (CASE WHEN rec > t.r3 THEN 1 ELSE 0 END) AS BIGINT)
              AS r_seg,
            CAST(1 + (CASE WHEN freq > t.f1 THEN 1 ELSE 0 END)
                   + (CASE WHEN freq > t.f2 THEN 1 ELSE 0 END)
                   + (CASE WHEN freq > t.f3 THEN 1 ELSE 0 END) AS BIGINT)
              AS f_seg,
            CAST(1 + (CASE WHEN mon > t.m1 THEN 1 ELSE 0 END)
                   + (CASE WHEN mon > t.m2 THEN 1 ELSE 0 END)
                   + (CASE WHEN mon > t.m3 THEN 1 ELSE 0 END) AS BIGINT)
              AS m_seg
          FROM u CROSS JOIN t)
        SELECT r_seg, f_seg, m_seg, count(*) AS n_users,
               CAST(sum(mon) AS BIGINT) AS mon_milli
        FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ------------------------------------------------------------------
    // Hourly volume anomalies: hours whose event count deviates from
    // the corpus hourly median by > 3 robust units (|x − med| > 3·MAD,
    // Hampel) — the outage/bot-burst screen a mean/stddev z misses
    // because bursts inflate the stddev itself. Events shuffle once
    // into the time-bounded hour ledger; median/MAD ride the q180
    // exact-integer doubling discipline (med2/mad4) as in-plan
    // scalars, so the gate is bit-exact.
    // ------------------------------------------------------------------
    "q202_volume_anomaly" -> Q(
      fn = (s, dir) => {
        import graft.operators.EventAnalytics
        val ev = Tables.eventsWithTs(s, dir)
          .select(unix_millis(col("ts")).as("ms"))
        EventAnalytics.hourlyVolumeAnomaly(ev, "ms", k = 3)
          .orderBy("hour")
      },
      oracle = Some("""
        WITH ev AS (
          SELECT epoch_ms(ts) // 3600000 AS hour FROM events),
        h AS (SELECT hour, count(*) AS n_events FROM ev GROUP BY 1),
        n AS (SELECT count(*) AS n FROM h),
        c AS (SELECT n_events AS v, count(*) AS c FROM h GROUP BY 1),
        cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM c),
        med AS (SELECT
          (SELECT min(v) FROM cum WHERE cum >= ((SELECT n FROM n)+1)//2)
          + (SELECT min(v) FROM cum
             WHERE cum >= (SELECT n FROM n)//2 + 1) AS med2),
        d AS (SELECT abs(2*h.n_events - (SELECT med2 FROM med)) AS dv
              FROM h),
        dc AS (SELECT dv, count(*) AS c FROM d GROUP BY 1),
        dcum AS (SELECT dv, c, sum(c) OVER (ORDER BY dv) AS cum FROM dc),
        mad AS (SELECT
          (SELECT min(dv) FROM dcum WHERE cum >= ((SELECT n FROM n)+1)//2)
          + (SELECT min(dv) FROM dcum
             WHERE cum >= (SELECT n FROM n)//2 + 1) AS mad4)
        SELECT h.hour, h.n_events,
               CAST((SELECT med2 FROM med) AS BIGINT) AS med2,
               CAST((SELECT mad4 FROM mad) AS BIGINT) AS mad4
        FROM h
        WHERE 2*abs(2*h.n_events - (SELECT med2 FROM med))
              > 3*(SELECT mad4 FROM mad)
        ORDER BY hour"""))
  )
}
