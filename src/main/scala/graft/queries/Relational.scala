package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The relational operator surface (SURVEY.md §2.2 gap table), expressed
  * Spark-first: declarative DataFrame programs that Catalyst compiles to
  * pushed-down scans, hash/sort aggregates, broadcast/shuffled joins,
  * window operators and TakeOrderedAndProject — nothing hand-scheduled.
  *
  * Scale notes (100 TB thinking):
  *   - dimension tables (region/nation/customer at low SF) are joined with
  *     an explicit `broadcast()` hint where they would stay small at scale;
  *   - fact-fact joins key on the natural join columns so the shuffle is
  *     a single hash exchange per side;
  *   - aggregates are expressed with `groupBy().agg()` so Spark performs
  *     partial (map-side) aggregation automatically;
  *   - every scan projects only needed columns → parquet column pruning.
  */
object Relational {

  /** q89's join/agg body, pre-checkpoint — exposed so
    * RuntimeFiltersSpec can pin the bloom build + might_contain probe
    * on the exact gated shape (the gated entry materializes eagerly
    * under tuned confs, so its returned plan is already a LogicalRDD). */
  private[graft] def bloomPrunedRevenue(
      s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // Aggregation: hash agg with partial+final, multiple agg functions.
    // TPC-H Q1 shape. (SURVEY §2.2 "Aggregations")
    // ------------------------------------------------------------------
    "q01_pricing_summary" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4)      AS avg_qty,
               round(avg(l_discount), 4)      AS avg_disc,
               count(*)                       AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------------
    // Projection + filter: both predicates and the 4-column projection
    // reach the parquet scan (PushedFilters / ReadSchema).
    // ------------------------------------------------------------------
    "q02_filter_pushdown" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_quantity") < 5 && col("l_shipdate") >= lit("2000-01-01"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity"), 2).as("qty"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_quantity, 2) AS qty,
               strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        FROM lineitem
        WHERE l_quantity < 5 AND l_shipdate >= TIMESTAMP '2000-01-01'
        ORDER BY l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------------
    // Multi-way join: fact-fact shuffle join (orders⋈lineitem) plus
    // broadcast dims (customer at this SF would shuffle at 100 TB — keyed
    // equi-join lets AQE pick; nation is broadcast explicitly).
    // ------------------------------------------------------------------
    "q03_join_revenue_by_nation" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
      },
      oracle = Some("""
        SELECT n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey  = o_orderkey
        JOIN customer ON o_custkey   = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name""")),

    // ------------------------------------------------------------------
    // Broadcast equi-join + agg on the dim attribute.
    // ------------------------------------------------------------------
    "q04_broadcast_join_segments" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        val ord = t(s, dir, "orders").select("o_custkey", "o_totalprice")
        ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total"),
            round(avg(col("o_totalprice")), 4).as("avg_price"))
          .orderBy(col("c_mktsegment"))
      },
      oracle = Some("""
        SELECT c_mktsegment,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // ------------------------------------------------------------------
    // Left-semi join (EXISTS).
    // ------------------------------------------------------------------
    "q05_semi_join" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer")
        val big = t(s, dir, "orders")
          .filter(col("o_totalprice") > 400000).select("o_custkey")
        cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // Left-anti join (NOT EXISTS).
    // ------------------------------------------------------------------
    "q06_anti_join" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer")
        val big = t(s, dir, "orders")
          .filter(col("o_totalprice") > 300000).select("o_custkey")
        cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // Window functions: row_number / rank / lag over a per-key window.
    // Deterministic: the ORDER BY key (o_orderdate, o_orderkey) is unique.
    // ------------------------------------------------------------------
    "q07_window_rank" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ord = t(s, dir, "orders")
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        ord
          .withColumn("rn", row_number().over(w))
          .withColumn("prev_price",
            round(lag(col("o_totalprice"), 1).over(w), 2))
          .withColumn("running_total",
            round(sum(col("o_totalprice"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .select(
            col("o_custkey"), col("o_orderkey"), col("rn"),
            col("prev_price"), col("running_total"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER w AS INTEGER) AS rn,
               round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
               round(sum(o_totalprice) OVER
                 (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, rn""")),

    // ------------------------------------------------------------------
    // Top-k: orderBy+limit → Catalyst TakeOrderedAndProject (no full sort
    // materialization; per-partition heaps + driver merge at scale).
    // ------------------------------------------------------------------
    "q08_topk_orders" -> Q(
      fn = (s, dir) => {
        t(s, dir, "orders")
          .select(
            col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice"), 2).as("price"))
          .orderBy(col("price").desc, col("o_orderkey"))
          .limit(10)
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders
        ORDER BY price DESC, o_orderkey
        LIMIT 10""")),

    // ------------------------------------------------------------------
    // ANSI FETCH FIRST k ROWS WITH TIES — the top-k whose cut never
    // splits a tie group (q08's limit(10) keeps an ARBITRARY 10 inside
    // a tie; rank-aware selection is what reproducible leaderboards
    // need). Spark has no native WITH TIES; the operator realizes it
    // as a pure threshold filter — the strictly-greater mass from the
    // bucketed prefix sum over the (value → count) ledger, the kth
    // value as a scalar subquery — so no global-order window ever sees
    // corpus rows. The oracle is DuckDB's native QUALIFY rank().
    // ------------------------------------------------------------------
    "q195_topk_with_ties" -> Q(
      fn = (s, dir) => {
        import graft.operators.Sampling
        Sampling.topKWithTies(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          value = col("n_chars"), k = 50)
          .orderBy(col("n_chars").desc, col("doc_id"))
      },
      oracle = Some("""
        SELECT doc_id, n_chars
        FROM documents
        QUALIFY rank() OVER (ORDER BY n_chars DESC) <= 50
        ORDER BY n_chars DESC, doc_id""")),

    // ------------------------------------------------------------------
    // Set ops: UNION (distinct), INTERSECT, EXCEPT.
    // ------------------------------------------------------------------
    "q09_union" -> Q(
      fn = (s, dir) => {
        val a = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val b = t(s, dir, "orders")
          .filter(col("o_totalprice") > 450000)
          .select(col("o_custkey").as("custkey"))
        a.union(b).distinct().orderBy("custkey")
      },
      oracle = Some("""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey FROM orders WHERE o_totalprice > 450000
        ORDER BY custkey""")),

    "q10_intersect" -> Q(
      fn = (s, dir) => {
        val a = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey").as("custkey"))
        val b = t(s, dir, "orders")
          .filter(col("o_totalprice") > 350000)
          .select(col("o_custkey").as("custkey"))
        a.intersect(b).orderBy("custkey")
      },
      oracle = Some("""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_totalprice > 350000
        ORDER BY custkey""")),

    "q11_except" -> Q(
      fn = (s, dir) => {
        val a = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "HOUSEHOLD")
          .select(col("c_custkey").as("custkey"))
        val b = t(s, dir, "orders")
          .filter(col("o_totalprice") > 250000)
          .select(col("o_custkey").as("custkey"))
        a.except(b).orderBy("custkey")
      },
      oracle = Some("""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'HOUSEHOLD'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice > 250000
        ORDER BY custkey""")),

    // ------------------------------------------------------------------
    // Distinct aggregation (expand + two-phase agg under the hood).
    // ------------------------------------------------------------------
    "q12_distinct_agg" -> Q(
      fn = (s, dir) => {
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderstatus"))
      },
      oracle = Some("""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_cust,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // ROLLUP / CUBE grouping sets.
    // ------------------------------------------------------------------
    "q13_rollup" -> Q(
      fn = (s, dir) => {
        t(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("n"), col("total"))
          .orderBy(col("status"), col("prio"))
      },
      oracle = Some("""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, prio""")),

    "q14_cube" -> Q(
      fn = (s, dir) => {
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("n"))
          .orderBy(col("status"), col("prio"))
      },
      oracle = Some("""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, prio""")),

    // ------------------------------------------------------------------
    // Explicit GROUPING SETS (beyond rollup/cube): the two 1-D
    // marginals plus the 2-D cells, Expand + single hash agg.
    // ------------------------------------------------------------------
    "q41_grouping_sets" -> Q(
      fn = (s, dir) => {
        t(s, dir, "orders")
          .groupingSets(
            Seq(
              Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")),
              Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("n"), col("total"))
          .orderBy(col("status"), col("prio"))
      },
      oracle = Some("""
        SELECT coalesce(o_orderstatus, 'ALL')   AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        ORDER BY status, prio""")),

    // ------------------------------------------------------------------
    // Scalar functions: string ops (all codegen'd built-ins).
    // ------------------------------------------------------------------
    "q15_string_funcs" -> Q(
      fn = (s, dir) => {
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            length(col("p_name")).cast("long").as("name_len"),
            substring(col("p_type"), 1, 6).as("type6"),
            regexp_replace(col("p_brand"), "#", "-").as("brand_dash"),
            concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
          .orderBy(col("p_partkey"))
      },
      oracle = Some("""
        SELECT p_partkey,
               upper(p_name) AS uname,
               length(p_name) AS name_len,
               substr(p_type, 1, 6) AS type6,
               replace(p_brand, '#', '-') AS brand_dash,
               concat(p_brand, ':', p_type) AS brand_type
        FROM part
        ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // Scalar functions: date parts.
    // ------------------------------------------------------------------
    "q16_date_funcs" -> Q(
      fn = (s, dir) => {
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("d"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_orderkey,
               year(o_orderdate)  AS y,
               month(o_orderdate) AS m,
               day(o_orderdate)   AS d,
               strftime(o_orderdate, '%Y-%m') AS ym
        FROM orders
        ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // Scalar functions: CASE / math.
    // ------------------------------------------------------------------
    "q17_case_math" -> Q(
      fn = (s, dir) => {
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_quantity") < 10, "low")
              .when(col("l_quantity") < 30, "mid")
              .otherwise("high").as("band"),
            round(abs(col("l_extendedprice") - 5000.0), 2).as("dist"),
            floor(col("l_quantity") / 7).cast("long").as("q7"),
            (col("l_linenumber") % 3).cast("long").as("ln_mod"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity < 10 THEN 'low'
                    WHEN l_quantity < 30 THEN 'mid'
                    ELSE 'high' END AS band,
               round(abs(l_extendedprice - 5000.0), 2) AS dist,
               CAST(floor(l_quantity / 7) AS BIGINT) AS q7,
               CAST(l_linenumber % 3 AS BIGINT) AS ln_mod
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------------
    // Events aggregate (no timestamp column → safe regardless of the
    // parquet NANOS logical type).
    // ------------------------------------------------------------------
    "q18_events_agg" -> Q(
      fn = (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("sum_value"),
            round(avg(col("value")), 4).as("avg_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        SELECT event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value,
               round(avg(value), 4) AS avg_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // Scalar functions: JSON build + path extraction. Both engines
    // construct the identical JSON string, then extract typed values by
    // JSONPath (SURVEY §2.2 "Scalar functions ... json").
    // ------------------------------------------------------------------
    "q45_json_funcs" -> Q(
      fn = (s, dir) => {
        t(s, dir, "nation")
          .select(col("n_nationkey"),
            concat(lit("{\"key\":"), col("n_nationkey"),
              lit(",\"name\":\""), col("n_name"),
              lit("\",\"region\":"), col("n_regionkey"), lit("}")).as("j"))
          .select(
            col("n_nationkey"),
            col("j"),
            get_json_object(col("j"), "$.name").as("name_out"),
            get_json_object(col("j"), "$.region").cast("long").as("region_out"))
          .orderBy(col("n_nationkey"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT n_nationkey,
                 '{"key":' || n_nationkey || ',"name":"' || n_name ||
                 '","region":' || n_regionkey || '}' AS j
          FROM nation)
        SELECT n_nationkey, j,
               json_extract_string(j, '$.name') AS name_out,
               CAST(json_extract_string(j, '$.region') AS BIGINT) AS region_out
        FROM b
        ORDER BY n_nationkey""")),

    // ------------------------------------------------------------------
    // Scalar functions: array ops over tokenized text (SURVEY §2.2
    // "Scalar functions ... array").
    // ------------------------------------------------------------------
    "q46_array_funcs" -> Q(
      fn = (s, dir) => {
        t(s, dir, "part")
          .select(col("p_partkey"), split(col("p_name"), " ").as("toks"))
          .select(
            col("p_partkey"),
            size(col("toks")).cast("long").as("n_toks"),
            array_join(array_sort(col("toks")), "|").as("sorted_toks"),
            element_at(col("toks"), 1).as("first_tok"),
            element_at(col("toks"), -1).as("last_tok"),
            array_contains(col("toks"), "green").cast("long").as("has_green"),
            array_join(slice(col("toks"), 1, 2), " ").as("first_two"))
          .orderBy(col("p_partkey"))
      },
      oracle = Some("""
        WITH b AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
        SELECT p_partkey,
               CAST(len(toks) AS BIGINT) AS n_toks,
               array_to_string(list_sort(toks), '|') AS sorted_toks,
               toks[1] AS first_tok,
               toks[-1] AS last_tok,
               CAST(list_contains(toks, 'green') AS BIGINT) AS has_green,
               array_to_string(toks[1:2], ' ') AS first_two
        FROM b
        ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // The SQL entry point: every table registered as a temp view
    // (Tables.registerAll), query authored in ANSI SQL via spark.sql —
    // proving a reference user can bring raw SQL, not just the
    // DataFrame API. Same Catalyst plan as the q03-style composition.
    // ------------------------------------------------------------------
    "q47_sql_surface" -> Q(
      fn = (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""
          SELECT r_name,
                 CAST(count(*) AS BIGINT) AS n_suppliers,
                 round(sum(s_acctbal), 2) AS total_bal
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name
          ORDER BY r_name""")
      },
      oracle = Some("""
        SELECT r_name,
               count(*) AS n_suppliers,
               round(sum(s_acctbal), 2) AS total_bal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")),

    // ------------------------------------------------------------------
    // Exact interpolated percentiles per group (sort-based agg). Both
    // engines use the R-7 linear-interpolation definition.
    // ------------------------------------------------------------------
    "q48_percentiles" -> Q(
      fn = (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.9)"), 4).as("p90"),
            round(expr("percentile(value, 0.99)"), 4).as("p99"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4)  AS p50,
               round(quantile_cont(value, 0.9), 4)  AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // Second-moment statistics: stddev / variance / covariance /
    // correlation (partial+final via merged moment sketches).
    // ------------------------------------------------------------------
    "q49_moment_stats" -> Q(
      fn = (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
              .as("cov_qty_price"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4)
              .as("corr_qty_price"))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_samp(l_quantity), 4) AS var_qty,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    // Pivot: one column per category (explicit value list so the plan
    // is a single pass; the oracle spells the same thing as conditional
    // aggregation — semantically identical).
    // ------------------------------------------------------------------
    "q50_pivot" -> Q(
      fn = (s, dir) => {
        t(s, dir, "events")
          .withColumn("user_bucket", (col("user_id") % 4).cast("long"))
          .groupBy(col("user_bucket"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("user_bucket"))
      },
      oracle = Some("""
        SELECT CAST(user_id % 4 AS BIGINT) AS user_bucket,
               count(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
               count(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'view'     THEN 1 END) AS view
        FROM events
        GROUP BY 1
        ORDER BY user_bucket""")),

    // ------------------------------------------------------------------
    // Window frames: running total (unbounded-preceding..current) and
    // lag over a deterministic per-customer order. Cumulative sums are
    // a sequential fold in frame order on both engines → exact.
    // ------------------------------------------------------------------
    "q57_window_running" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") % 10 === 0)
          .select(
            col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice")).over(wf), 2).as("running_total"),
            round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2)
              .as("prev_total"),
            row_number().over(w).cast("long").as("seq"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_total,
               round(coalesce(lag(o_totalprice, 1) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 0.0), 2) AS prev_total,
               row_number() OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                 AS seq
        FROM orders
        WHERE o_custkey % 10 = 0
        ORDER BY o_custkey, o_orderkey""")),

    // ------------------------------------------------------------------
    // Full outer join: both sides restricted to overlapping-but-
    // different subsets so all three null patterns occur, then counted.
    // ------------------------------------------------------------------
    "q53_full_outer_join" -> Q(
      fn = (s, dir) => {
        val c = t(s, dir, "customer")
          .filter(col("c_custkey") % 3 === 0).select("c_custkey")
        val o = t(s, dir, "orders")
          .filter(col("o_custkey") % 5 === 0).select("o_custkey", "o_orderkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .agg(
            count(when(col("o_custkey").isNull, 1)).as("cust_only"),
            count(when(col("c_custkey").isNull, 1)).as("order_only"),
            count(when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, 1))
              .as("matched"))
      },
      oracle = Some("""
        WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0),
             o AS (SELECT o_custkey, o_orderkey FROM orders WHERE o_custkey % 5 = 0)
        SELECT count(CASE WHEN o_custkey IS NULL THEN 1 END) AS cust_only,
               count(CASE WHEN c_custkey IS NULL THEN 1 END) AS order_only,
               count(CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
                          THEN 1 END) AS matched
        FROM c FULL OUTER JOIN o ON c_custkey = o_custkey""")),

    // TPC-H Q5 shape — the multi-join flagship: six tables, a selective
    // region/date filter, and the "local supplier" correlation
    // (c_nationkey = s_nationkey) that rides the supplier join as a
    // second equi-key. The fact chain (lineitem⋈orders⋈customer⋈
    // supplier) stays shuffled-hash/sort-merge on keys; only the
    // truly-constant-size dims (nation 25 rows, region 5) are forced
    // broadcast — supplier GROWS with SF, so broadcasting it would stop
    // scaling at exactly the size this query exists to handle.
    "q77_tpch_local_revenue" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
        val reg = t(s, dir, "region")
          .filter(col("r_name") === "ASIA").select("r_regionkey")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(sup, li("l_suppkey") === sup("s_suppkey") &&
            cust("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy("n_name")
      },
      oracle = Some("""
        SELECT n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY n_name ORDER BY n_name""")),

    // TPC-H Q10 shape — returned-item customer ranking: a selective
    // fact filter (l_returnflag = 'R'), customer-keyed revenue agg,
    // top-20 by rounded revenue (custkey tiebreak → deterministic
    // across engines) planned as TakeOrderedAndProject, never a global
    // sort of all customers.
    "q78_tpch_returned_topk" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_nationkey")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT c_custkey, c_name, n_name,
                 round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
          GROUP BY c_custkey, c_name, n_name
          ORDER BY revenue DESC, c_custkey LIMIT 20)
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // Runtime bloom-filter pruning, end-to-end: the selective-dim ⋈
    // giant-fact shape run under RuntimeFilters.tuneForScale, so the
    // filtered orders side builds a partial+final bloom_filter_agg and
    // lineitem rows that cannot match are dropped by a
    // bloom_filter_might_contain probe BEFORE the fact shuffle — the
    // shuffle-volume cut that matters most at 100 TB. Conf discipline:
    // injection happens at optimization time, so the query EXECUTES
    // eagerly under the tuned session (localCheckpoint materializes the
    // small result) and every touched conf is restored before
    // returning — no other query's plan ever sees the tuned values.
    // Auto-broadcast is disabled inside the block to hold the
    // shuffled-join shape the rule targets at test SF (at deployment
    // scale the fact join shuffles on its own); the zero application-
    // side threshold is the test-scale stand-in for a deployment's
    // real fact-scan sizes. The plan contract (bloom build on the dim
    // side, might_contain on l_orderkey) is pinned in
    // RuntimeFiltersSpec against this very query.
    // ------------------------------------------------------------------
    "q89_bloom_pruned_revenue" -> Q(
      fn = (s, dir) => {
        import graft.operators.RuntimeFilters
        val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
          RuntimeFilters.EnabledKey, RuntimeFilters.CreationSideKey,
          RuntimeFilters.ApplicationSideKey)
        val olds = keys.map(k => k -> s.conf.getOption(k))
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        RuntimeFilters.tuneForScale(s,
          creationSideThreshold = "100MB",
          applicationSideScanSizeThreshold = "0")
        try bloomPrunedRevenue(s, dir).localCheckpoint(true)
        finally olds.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      },
      oracle = Some("""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_items,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // TPC-H Q3 shape — shipping priority: selective date filters on
    // BOTH fact sides of a cutoff, a segment-filtered customer slice,
    // top-10 by revenue. The customer slice is ~1/5 of the table and
    // GROWS with SF, so it stays a shuffled equi-join (broadcasting it
    // would stop scaling at exactly the size the query targets); the
    // top-k plans as TakeOrderedAndProject, never a global sort.
    // ------------------------------------------------------------------
    "q90_tpch_shipping_priority" -> Q(
      fn = (s, dir) => {
        val cutoff = lit("1996-06-01").cast("timestamp")
        val cust = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") < cutoff)
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          .orderBy("l_orderkey")
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT l_orderkey, o_orderdate,
                 round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1996-06-01'
            AND l_shipdate  > TIMESTAMP '1996-06-01'
          GROUP BY l_orderkey, o_orderdate
          ORDER BY revenue DESC, l_orderkey LIMIT 10)
        ORDER BY l_orderkey""")),

    // ------------------------------------------------------------------
    // TPC-H Q7 shape — volume shipping between two nations, by ship
    // year: the nation dims are pre-filtered to the TWO named nations
    // BEFORE broadcasting (2-row broadcasts; the cross-direction OR is
    // applied after the joins), so the selective predicate prunes the
    // fact chain instead of riding a post-join filter over everything.
    // ------------------------------------------------------------------
    "q92_tpch_volume_shipping" -> Q(
      fn = (s, dir) => {
        val pair = Seq("NATION_1", "NATION_2")
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey",
            "l_extendedprice", "l_discount", "l_shipdate")
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val n1 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n1_key"),
            col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n2_key"),
            col("n_name").as("cust_nation"))
        li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .withColumn("l_year", year(col("l_shipdate")).cast("long"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      oracle = Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ------------------------------------------------------------------
    // Distribution window functions — ntile deciles, percent_rank,
    // cume_dist per segment: the ranking-function tier q07's
    // rank/dense_rank doesn't cover. Both engines compute the same
    // closed-form fractions ((rank-1)/(n-1), cume/n), rounded so float
    // formatting can't diverge.
    // ------------------------------------------------------------------
    "q97_distribution_windows" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, dir, "customer")
          .select(
            col("c_custkey"), col("c_mktsegment"),
            ntile(10).over(w).cast("long").as("decile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy("c_custkey")
      },
      oracle = Some("""
        SELECT c_custkey, c_mktsegment,
               CAST(ntile(10) OVER w AS BIGINT) AS decile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // TPC-H Q14 shape — promo revenue share: a date-windowed fact scan
    // joined to part (both sides grow with SF — no forced broadcast;
    // AQE picks the strategy for the actual sizes) with a conditional
    // aggregate computing the promo share in one pass. The date window
    // reaches the lineitem scan as PushedFilters.
    // ------------------------------------------------------------------
    "q93_tpch_promo_share" -> Q(
      fn = (s, dir) => {
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val promoRev = when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select("l_partkey", "l_extendedprice", "l_discount")
        val part = t(s, dir, "part").select("p_partkey", "p_type")
        li.join(part, col("l_partkey") === col("p_partkey"))
          .agg(
            round(sum(promoRev), 2).as("promo_revenue"),
            round(sum(rev), 2).as("total_revenue"),
            round(lit(100.0) * sum(promoRev) / sum(rev), 4)
              .as("promo_share_pct"))
      },
      oracle = Some("""
        SELECT round(sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1.0 - l_discount)
                     ELSE 0.0 END), 2) AS promo_revenue,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                 AS total_revenue,
               round(CAST(100.0 AS DOUBLE) *
                     sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1.0 - l_discount)
                         ELSE 0.0 END) /
                     sum(l_extendedprice * (1.0 - l_discount)), 4)
                 AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'""")),

    // ------------------------------------------------------------------
    // TPC-H Q4 shape — order priority checking: a date-windowed orders
    // scan LEFT-SEMI joined to lineitem on (key, l_shipdate >
    // o_orderdate) — the EXISTS-with-correlated-predicate shape. The
    // non-equi term rides the equi-join as a residual condition, so the
    // plan is one hash semi-join (no nested loop); the date window
    // reaches the orders scan as PushedFilters. At 100× both sides
    // shuffle on the order key — nothing is collected or broadcast.
    // (The reference's schema has no commit/receipt dates, so "late" is
    // shipped-after-order-date.)
    // ------------------------------------------------------------------
    "q99_tpch_order_priority" -> Q(
      fn = (s, dir) => {
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select("o_orderkey", "o_orderpriority", "o_orderdate")
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        ord.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // TPC-H Q8 shape — national market share: the full 7-table snow-
    // flake (lineitem ⋈ supplier ⋈ orders ⋈ customer with nation
    // twice and region once). The nation/region dims are FIXED-SIZE
    // (25/5 rows at any SF) so they broadcast; supplier/customer/
    // orders grow with SF and stay shuffled equi-joins. The share is a
    // conditional aggregate over one pass — no second join against a
    // "market total" subquery.
    // ------------------------------------------------------------------
    "q100_tpch_market_share" -> Q(
      fn = (s, dir) => {
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val ord = t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val nSupp = t(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))
        val nCust = t(s, dir, "nation")
          .select(col("n_nationkey").as("cn_key"),
            col("n_regionkey").as("c_regionkey"))
        val reg = t(s, dir, "region")
          .filter(col("r_name") === "ASIA").select("r_regionkey")
        li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
          .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
          .join(broadcast(reg), col("c_regionkey") === col("r_regionkey"))
          .withColumn("o_year", year(col("o_orderdate")).cast("long"))
          .groupBy(col("o_year"))
          .agg(
            round(sum(when(col("supp_nation") === "NATION_1", rev)
              .otherwise(lit(0.0))), 2).as("nation_revenue"),
            round(sum(rev), 2).as("market_revenue"),
            round(sum(when(col("supp_nation") === "NATION_1", rev)
              .otherwise(lit(0.0))) / sum(rev), 6).as("mkt_share"))
          .orderBy("o_year")
      },
      oracle = Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(CASE WHEN ns.n_name = 'NATION_1'
                     THEN l_extendedprice * (1.0 - l_discount)
                     ELSE 0.0 END), 2) AS nation_revenue,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                 AS market_revenue,
               round(sum(CASE WHEN ns.n_name = 'NATION_1'
                     THEN l_extendedprice * (1.0 - l_discount)
                     ELSE 0.0 END) /
                     sum(l_extendedprice * (1.0 - l_discount)), 6)
                 AS mkt_share
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // TPC-H Q13 shape — customer order-count distribution: customer
    // LEFT OUTER orders (zero-order customers must survive with count
    // 0 — count(col) skips the nulls the outer join manufactures),
    // then a second aggregation over the per-customer counts. Both
    // aggs are partial+final hash aggs; the first shuffles on
    // c_custkey, the second on the (tiny-domain) count value.
    // ------------------------------------------------------------------
    "q101_tpch_custdist" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      oracle = Some("""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")),

    // ------------------------------------------------------------------
    // TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    // per-supplier aggregate is |suppliers|-sized (grows with SF), so
    // the max rides an in-plan SCALAR SUBQUERY (`Scalars.of`) — never
    // an unkeyed window over the supplier-level rows and never a
    // driver collect. Ties all surface, as in the spec's view form.
    // Revenue is rounded identically on both sides BEFORE the max/
    // equality so float formatting can't split a tie.
    // ------------------------------------------------------------------
    "q102_tpch_top_supplier" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select("l_suppkey", "l_extendedprice", "l_discount")
        val rev = li.groupBy(col("l_suppkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("total_revenue"))
        val mx = graft.plans.Scalars.of(
          rev.agg(max(col("total_revenue")).as("max_revenue")))
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_name")
        rev.filter(col("total_revenue") === mx)
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey""")),

    // ------------------------------------------------------------------
    // TPC-H Q17 shape — small-quantity-order revenue: the correlated
    // per-part AVG subquery is decorrelated into a per-partkey
    // aggregate JOINED back on the part key — one extra shuffle over
    // the brand-filtered slice instead of a per-row subquery. The
    // brand filter cuts part BEFORE the fact join, and only the
    // filtered partkeys' lineitems flow into the avg (equivalent to
    // the spec's correlation because the correlation key IS the join
    // key). The float threshold (0.2·avg) follows the TPC-H spec;
    // per-part avgs are short sums whose engine-order ulp differences
    // are ~1e-13 relative, orders below any realistic quantity
    // boundary — the gate would only wobble if a quantity sat within
    // ulps of the threshold, which round quantities never do.
    // ------------------------------------------------------------------
    "q103_tpch_small_qty_revenue" -> Q(
      fn = (s, dir) => {
        val parts = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#1").select("p_partkey")
        val li = t(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
        val branded = li.join(parts, col("l_partkey") === col("p_partkey"))
        val perPart = branded.groupBy(col("p_partkey").as("a_partkey"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        branded.join(perPart, col("l_partkey") === col("a_partkey"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg(round(sum(col("l_extendedprice")) / lit(7.0), 2)
            .as("avg_yearly"))
      },
      oracle = Some("""
        SELECT round(sum(l_extendedprice) / CAST(7.0 AS DOUBLE), 2)
                 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
            SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""")),

    // ------------------------------------------------------------------
    // TPC-H Q18 shape — large-volume customers: a HAVING-filtered
    // per-order quantity aggregate (big-order keys are rare) joined
    // back to orders + customer, top-100 by order value. The aggregate
    // runs FIRST so the joins see only qualifying keys, and the top-k
    // plans as TakeOrderedAndProject — at 100× the agg is one
    // partial+final pass over lineitem, the join input is the
    // qualifying slice (not the fact table), and nothing global-sorts.
    // ------------------------------------------------------------------
    "q104_tpch_large_volume" -> Q(
      fn = (s, dir) => {
        val big = t(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity")
          .groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
          .filter(col("total_qty") > 200.0)
        val ord = t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        val cust = t(s, dir, "customer").select("c_custkey", "c_name")
        big.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
          .orderBy("o_orderkey")
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                 total_qty
          FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING round(sum(l_quantity), 2) > 200.0)
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
        ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // TPC-H Q19 shape — disjunctive predicate revenue: three (brand,
    // size-range, quantity-range) conjunctions OR-ed together. Because
    // the disjunction references BOTH sides, Catalyst cannot push any
    // of it below the join on its own — so the IMPLIED one-sided
    // prefilters (brand IN the three brands, quantity within the
    // union of the ranges) are stated explicitly. They are lossless
    // (every disjunct entails them), reach the scans as PushedFilters,
    // and the exact disjunction is re-checked post-join. One equi-join
    // on the part key — the OR never degrades it to a nested loop.
    // ------------------------------------------------------------------
    "q105_tpch_disjunctive_revenue" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .filter(col("l_quantity").between(1, 50))
        val part = t(s, dir, "part")
          .select("p_partkey", "p_brand", "p_size")
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        val cond =
          (col("p_brand") === "Brand#1" &&
            col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" &&
            col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 35)) ||
          (col("p_brand") === "Brand#3" &&
            col("p_size").between(20, 50) &&
            col("l_quantity").between(25, 50))
        li.join(part, col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"))
      },
      oracle = Some("""
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 25 AND 50)""")),

    // ------------------------------------------------------------------
    // TPC-H Q22 shape — global sales opportunity: customers above the
    // positive-balance average (an in-plan scalar subquery —
    // `Scalars.of` — so no join materializes for it) with NO orders
    // (LEFT ANTI join), grouped by the trailing-2-digit "code" of
    // c_name. The anti-join shuffles on the customer key; the average
    // is one scan-side aggregate, never a driver round-trip. (This
    // dataset gives every customer SOME order, so the spec's "never
    // ordered" is realized as "dormant since 2000" — the anti side is
    // the date-filtered slice, which also pushes the date to the scan.)
    // ------------------------------------------------------------------
    "q106_tpch_sales_opportunity" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"),
            substring(col("c_name"), -2, 2).as("code"))
        val avgBal = graft.plans.Scalars.of(
          cust.filter(col("c_acctbal") > 0.0)
            .agg(avg(col("c_acctbal")).as("avg_bal")))
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey")
        cust.filter(col("c_acctbal") > avgBal)
          .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("code"))
          .agg(count(lit(1)).as("numcust"),
            round(sum(col("c_acctbal")), 2).as("totacctbal"))
          .orderBy("code")
      },
      oracle = Some("""
        SELECT substr(c_name, length(c_name) - 1, 2) AS code,
               CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // TPC-H Q21 shape — suppliers who kept orders waiting: late
    // (shipped > 60 days after order) line items on MULTI-supplier
    // orders where the supplier is the ONLY late one. The spec's
    // correlated EXISTS / NOT EXISTS pair decorrelates into two
    // per-order aggregates (distinct-supplier count ≥ 2; late-supplier
    // count = 1) joined back on the order key — each a single
    // partial+final pass, no per-row rescan of the fact table, every
    // shuffle keyed by order or supplier. Top-100 suppliers plan as
    // TakeOrderedAndProject. (No commit/receipt dates in this schema —
    // "late" is the shipped-long-after-order proxy, as in q99.)
    // ------------------------------------------------------------------
    "q110_tpch_waiting_suppliers" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
        val late = li
          .join(ord, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select("l_orderkey", "l_suppkey").distinct()
        val multi = li.groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"))
          .filter(col("n_supp") >= 2).select("l_orderkey")
        val lone = late.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_late"))
          .filter(col("n_late") === 1).select("l_orderkey")
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_name")
        late.join(multi, Seq("l_orderkey"))
          .join(lone, Seq("l_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
          .orderBy("s_name")
      },
      oracle = Some("""
        WITH late AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
        multi AS (SELECT l_orderkey FROM lineitem
                  GROUP BY 1 HAVING count(DISTINCT l_suppkey) >= 2),
        lone AS (SELECT l_orderkey FROM late
                 GROUP BY 1 HAVING count(*) = 1)
        SELECT * FROM (
          SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
          FROM late JOIN multi USING (l_orderkey)
                    JOIN lone  USING (l_orderkey)
          JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY s_name
          ORDER BY numwait DESC, s_name LIMIT 100)
        ORDER BY s_name""")),

    // ------------------------------------------------------------------
    // TPC-H Q16 shape — supplier diversity per part class: distinct
    // suppliers per (brand, size bucket), excluding a blocklist of
    // suppliers (negative balance stands in for the spec's complaint
    // filter). The NOT IN realizes as a LEFT ANTI join against the
    // tiny blocklist BEFORE the part join; the (part, supplier)
    // distinct reconstructs the partsupp relation this schema lacks
    // from lineitem — one distinct shuffle, then a distinct-count agg.
    // ------------------------------------------------------------------
    "q111_tpch_supplier_diversity" -> Q(
      fn = (s, dir) => {
        val bad = t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0.0).select("s_suppkey")
        val ps = t(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct()
        val part = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
        ps.join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(part, col("l_partkey") === col("p_partkey"))
          .withColumn("size_bucket",
            expr("CAST(p_size div 10 AS BIGINT)"))
          .groupBy(col("p_brand"), col("size_bucket"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"),
            col("size_bucket"))
      },
      oracle = Some("""
        SELECT p_brand, CAST(p_size // 10 AS BIGINT) AS size_bucket,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        JOIN part ON l_partkey = p_partkey
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0.0)
        GROUP BY 1, 2
        ORDER BY supplier_cnt DESC, p_brand, size_bucket""")),

    // ------------------------------------------------------------------
    // TPC-H Q9 shape — product-type profit by supplier nation and
    // order year: a name-substring part filter cuts the fact chain
    // first, profit is computed per row (revenue minus a retail-price
    // cost proxy — this schema has no ps_supplycost) and aggregated
    // per (nation, year). Nation broadcasts (fixed-size); part/
    // supplier/orders stay shuffled equi-joins. The LIKE filter can't
    // push as a parquet range but still prunes before every join.
    // ------------------------------------------------------------------
    "q112_tpch_product_profit" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount")
        val part = t(s, dir, "part")
          .filter(col("p_name").like("%widget%"))
          .select("p_partkey", "p_retailprice")
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name").as("nation"))
        val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
        val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")
        li.join(part, col("l_partkey") === col("p_partkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .withColumn("o_year", year(col("o_orderdate")).cast("long"))
          .groupBy(col("nation"), col("o_year"))
          .agg(round(sum(profit), 2).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      oracle = Some("""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(l_extendedprice * (1.0 - l_discount)
                         - CAST(0.6 AS DOUBLE) * p_retailprice * l_quantity),
                     2) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC""")),

    // ------------------------------------------------------------------
    // TPC-H Q11 shape — important parts by shipped value for one
    // nation's suppliers: GROUP BY part HAVING value > fraction × the
    // GLOBAL value — the global total rides an in-plan scalar
    // subquery over the SAME filtered aggregate (Spark plans the agg
    // once per branch; the subquery branch is its own tiny stage, no
    // 1-row join, no driver collect). Nation broadcasts pre-filtered
    // to one row. The HAVING threshold is a float comparison by spec
    // (fraction × global sum); as in q103, a flip would need a part
    // value within ulps of the boundary — prices make that
    // astronomically unlikely, and the gate pins it at the gate SF.
    // ------------------------------------------------------------------
    "q113_tpch_important_parts" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice")
        val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, dir, "nation")
          .filter(col("n_name") === "NATION_1").select("n_nationkey")
        val byPart = li
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice")).as("raw_val"))
        val total = graft.plans.Scalars.of(
          byPart.agg(sum(col("raw_val")).as("t")))
        byPart.filter(col("raw_val") > lit(0.002) * total)
          .select(col("l_partkey"),
            round(col("raw_val"), 2).as("part_value"))
          .orderBy(col("part_value").desc, col("l_partkey"))
      },
      oracle = Some("""
        WITH v AS (
          SELECT l_partkey, sum(l_extendedprice) AS raw_val
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_1'
          GROUP BY 1)
        SELECT l_partkey, round(raw_val, 2) AS part_value
        FROM v
        WHERE raw_val > CAST(0.002 AS DOUBLE) * (SELECT sum(raw_val) FROM v)
        ORDER BY part_value DESC, l_partkey"""))  ,

    // ------------------------------------------------------------------
    // TPC-H Q2 shape — best supplier per part in a region: the
    // correlated per-part MIN subquery decorrelates into a per-part
    // aggregate joined back on (part, min-value) — the same rewrite
    // as q103, here over the region-filtered candidate set. The join
    // on the min BALANCE is raw stored-value equality (no arithmetic
    // touches it), so ties surface identically on both engines. The
    // fixed-size nation/region dims broadcast; the (part, supplier)
    // relation is the q111 lineitem-distinct reconstruction.
    // ------------------------------------------------------------------
    "q115_tpch_best_supplier" -> Q(
      fn = (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct()
        val sup = t(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        val nat = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"),
            col("n_name").as("nation"))
        val reg = t(s, dir, "region")
          .filter(col("r_name") === "ASIA").select("r_regionkey")
        val parts = t(s, dir, "part")
          .filter(col("p_size") === 10).select("p_partkey")
        val cand = ps
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .join(parts, col("l_partkey") === col("p_partkey"))
        val best = cand.groupBy(col("p_partkey").as("b_key"))
          .agg(min(col("s_acctbal")).as("min_bal"))
        cand.join(best, col("l_partkey") === col("b_key") &&
            col("s_acctbal") === col("min_bal"))
          .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
            col("nation"), round(col("s_acctbal"), 2).as("s_acctbal"))
          .orderBy("l_partkey", "l_suppkey")
      },
      oracle = Some("""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        cand AS (
          SELECT ps.l_partkey, ps.l_suppkey, s_acctbal, s_name,
                 n_name AS nation
          FROM ps JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          JOIN part   ON l_partkey = p_partkey
          WHERE r_name = 'ASIA' AND p_size = 10),
        best AS (SELECT l_partkey AS b_key, min(s_acctbal) AS min_bal
                 FROM cand GROUP BY 1)
        SELECT l_partkey, l_suppkey, s_name, nation,
               round(s_acctbal, 2) AS s_acctbal
        FROM cand JOIN best ON l_partkey = b_key AND s_acctbal = min_bal
        ORDER BY l_partkey, l_suppkey""")),

    // ------------------------------------------------------------------
    // TPC-H Q6 analogue (forecasting revenue change) — EXPRESSIBLE as of
    // round 6: the regenerated testdata added l_discount/l_tax. The
    // whole query is one scan with every predicate (date window,
    // discount band, quantity cap) reaching parquet as PushedFilters,
    // then a single partial+final aggregate — no join, no shuffle beyond
    // the one-row final agg. The 100 TB plan IS this plan.
    // ------------------------------------------------------------------
    "q118_tpch_forecast_revenue" -> Q(
      fn = (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(
            round(sum(col("l_extendedprice") * col("l_discount")), 2)
              .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      oracle = Some("""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""")),

    // ------------------------------------------------------------------
    // TPC-H Q1 in FULL (q01 predates l_discount/l_tax and kept the
    // reduced measure set): disc_price and charge exercise the new
    // columns; still one scan + one grouped partial+final aggregate
    // over a 4-value grouping key.
    // ------------------------------------------------------------------
    "q119_tpch_pricing_full" -> Q(
      fn = (s, dir) => {
        val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(disc), 2).as("sum_disc_price"),
            round(sum(disc * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                 AS sum_disc_price,
               round(sum(l_extendedprice * (1.0 - l_discount)
                         * (1.0 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""))
  )
}
