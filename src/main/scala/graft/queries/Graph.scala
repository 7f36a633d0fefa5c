package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ConnectedComponents, Dedup, Graphs, Hits, LabelPropagation, PageRank}

/** Graph-analytics composites: link-analysis ranking and quality-aware
  * dedup-cluster consolidation. The reference runtime's programming
  * model is MapReduce-shaped; iterative graph jobs (PageRank being the
  * literature's canonical one) are the workload class such runtimes
  * exist for, re-expressed here as Catalyst plans. */
object GraphQueries {

  /** One unrolled integer-PageRank iteration in DuckDB SQL — the exact
    * arithmetic of [[graft.operators.PageRank]]: per-edge contribution
    * `(85 * (rank // outdeg)) // 100` (all BIGINT, positive operands,
    * so DuckDB's floor `//` equals Spark's truncating `div`), new rank
    * `baseSql + sum(contribs)` (baseSql = the per-node teleport term:
    * a constant for uniform PageRank, a seed-set CASE for the
    * personalized variant). Unrolled — not a recursive CTE — because
    * the per-step aggregate is clearer and the iteration count is a
    * fixed 5 on both sides. */
  private def prIter(i: Int, baseSql: String): String = s"""
        r$i AS (
          SELECT n.id,
                 $baseSql + COALESCE(s.c, 0) AS pr_rank
          FROM n LEFT JOIN (
            SELECT e.dst AS id,
                   CAST(sum((85 * (r.pr_rank // e.dg)) // 100) AS BIGINT) AS c
            FROM r${i - 1} r JOIN ed e ON r.id = e.src
            GROUP BY e.dst) s ON n.id = s.id)"""

  /** Shared edge-derivation SQL for q141/q146: one distinct
    * customer→supplier trade edge per (custkey, suppkey), symmetrized;
    * node ids disambiguated by parity. */
  private val edgeSql: String = """
        WITH e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        eb AS (SELECT src, dst FROM e0
               UNION ALL SELECT dst, src FROM e0),
        dg AS (SELECT src, count(*) AS dg FROM eb GROUP BY src),
        ed AS (SELECT eb.src, eb.dst, dg.dg FROM eb JOIN dg USING (src)),
        n AS (SELECT src AS id FROM eb UNION SELECT dst FROM eb),"""

  /** One unrolled BFS min-relaxation round in DuckDB SQL — the exact
    * level set of [[graft.operators.Graphs.bfsHops]]: settled nodes
    * keep their hop, the frontier's out-neighbors are offered hop+1,
    * min() resolves both re-reached and multiply-reached nodes.
    * MATERIALIZED: each round references its predecessor twice, so
    * default CTE inlining would re-expand the recurrence ~2^rounds. */
  private def bfsIter(i: Int): String = s"""
        d$i AS MATERIALIZED (
          SELECT id, min(hop) AS hop FROM (
            SELECT id, hop FROM d${i - 1}
            UNION ALL
            SELECT e.dst AS id, d.hop + 1 AS hop
            FROM d${i - 1} d JOIN eb e ON d.id = e.src) u
          GROUP BY id)"""

  /** One unrolled HITS iteration in DuckDB SQL — the exact integer
    * arithmetic of [[graft.operators.Hits]]: authority half-step
    * (sum of in-hub scores, L∞-normalized so max = 10^6 via BIGINT
    * floor division — positive operands, so DuckDB `//` equals
    * Spark's truncating `div`), then the hub half-step likewise. */
  private def hitsIter(i: Int): String = s"""
        ar$i AS (
          SELECT e.dst AS id, CAST(sum(h.h) AS BIGINT) AS r
          FROM e JOIN h${i - 1} h ON e.src = h.id GROUP BY 1),
        a$i AS (
          SELECT id, CAST((r * 1000000) // (SELECT max(r) FROM ar$i)
                     AS BIGINT) AS a
          FROM ar$i),
        hr$i AS (
          SELECT e.src AS id, CAST(sum(a.a) AS BIGINT) AS r
          FROM e JOIN a$i a ON e.dst = a.id GROUP BY 1),
        h$i AS (
          SELECT id, CAST((r * 1000000) // (SELECT max(r) FROM hr$i)
                     AS BIGINT) AS h
          FROM hr$i)"""

  /** One unrolled label-propagation iteration in DuckDB SQL — the
    * exact argmax of [[graft.operators.LabelPropagation]]: per-node
    * neighbor-label counts, winner by (count desc, label asc). */
  private def lpIter(i: Int): String = s"""
        v$i AS (
          SELECT e.src AS id, l.lbl, count(*) AS c
          FROM eb e JOIN l${i - 1} l ON e.dst = l.id
          GROUP BY 1, 2),
        l$i AS (
          SELECT id, lbl FROM (
            SELECT id, lbl, row_number() OVER (
              PARTITION BY id ORDER BY c DESC, lbl) AS rn
            FROM v$i) WHERE rn = 1)"""

  /** One unrolled synchronous k-core peel round in DuckDB SQL — the
    * exact protocol of [[graft.operators.Graphs.kCore]]: survivors =
    * nodes whose live degree meets the scalar threshold, then both
    * edge endpoints re-screened. MATERIALIZED: each round references
    * its predecessor twice (and kk re-references e0), so DuckDB's
    * default CTE inlining would re-expand the recurrence ~2^rounds. */
  private def kcIter(i: Int): String = {
    val prev = if (i == 1) "eb" else s"e${i - 1}"
    s"""
        d$i AS MATERIALIZED (
          SELECT src AS id FROM $prev GROUP BY src
          HAVING count(*) >= (SELECT k FROM kk)),
        e$i AS MATERIALIZED (
          SELECT e.src, e.dst FROM $prev e
          JOIN d$i a ON e.src = a.id
          JOIN d$i b ON e.dst = b.id)"""
  }

  /** Shared bipartite (customer, supplier) relation SQL for q148/q149:
    * one row per distinct trade within a market segment. */
  private def relSql(segment: String): String = s"""
        rel AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON c_custkey = o_custkey
                WHERE c_mktsegment = '$segment')"""

  /** The Spark side of [[relSql]]. */
  private def relDf(s: org.apache.spark.sql.SparkSession, dir: String,
      segment: String): org.apache.spark.sql.DataFrame = {
    val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val ord = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === segment).select("c_custkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
  }

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // Per-supplier triangle participation in the co-purchase graph:
    // project the bipartite (customer, supplier) trade relation onto
    // suppliers (edge = co-purchased by enough shared customers), then
    // count each supplier's triangles — the local clustering signal
    // community detectors seed from. The edge threshold is
    // SCALE-ADAPTIVE (1.25× the mean pair weight, exact integer
    // arithmetic) so the graph is non-degenerate at every SF rather
    // than complete at one and empty at another. Degree-ordered
    // orientation bounds the wedge join (see Graphs.triangles); the
    // oracle enumerates the same (orientation-invariant) triangle set
    // with plain id-ordering.
    // ------------------------------------------------------------------
    "q148_triangle_count" -> Q(
      fn = (s, dir) => {
        // pinned once: the cutoff scalar and the edge filter both
        // consume the pair aggregate
        val pairs = Graphs.coOccurrence(relDf(s, dir, "BUILDING"),
          "cust", "supp").localCheckpoint(true)
        val th = graft.plans.Scalars.of(pairs.agg(
          expr("(5 * sum(`n_shared`)) div (4 * count(1))").as("th")))
        Graphs.triangles(pairs.filter(col("n_shared") >= th), "a", "b")
          .select(col("id").as("s_key"), col("degree"),
            col("n_triangles"))
          .orderBy("s_key")
      },
      oracle = Some(s"""
        WITH ${relSql("BUILDING")},
        p AS (SELECT a.s AS a, b.s AS b, count(*) AS n
              FROM rel a JOIN rel b ON a.c = b.c AND a.s < b.s
              GROUP BY 1, 2),
        cut AS (SELECT (5 * sum(n)) // (4 * count(*)) AS th FROM p),
        e AS (SELECT a, b FROM p CROSS JOIN cut WHERE n >= th),
        deg AS (SELECT id, count(*) AS degree FROM (
                  SELECT a AS id FROM e UNION ALL SELECT b FROM e)
                GROUP BY 1),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        tc AS (SELECT id, count(*) AS n FROM (
                 SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri) GROUP BY 1)
        SELECT d.id AS s_key, CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(tc.n, 0) AS BIGINT) AS n_triangles
        FROM deg d LEFT JOIN tc ON d.id = tc.id
        ORDER BY s_key""")),

    // ------------------------------------------------------------------
    // Adamic–Adar link prediction on the trade relation: score supplier
    // pairs by their shared customers, discounting each shared customer
    // by 1/ln(its supplier count) — a customer who buys from everyone
    // says little about any pair. Top 50 predicted links (deterministic:
    // rounded score, then keys).
    // ------------------------------------------------------------------
    "q149_adamic_adar" -> Q(
      fn = (s, dir) => {
        Graphs.adamicAdar(relDf(s, dir, "MACHINERY"), "cust", "supp")
          .orderBy(col("aa").desc, col("a"), col("b"))
          .limit(50)
          .select(col("a").as("s_a"), col("b").as("s_b"),
            col("n_shared"), col("aa"))
      },
      oracle = Some(s"""
        WITH ${relSql("MACHINERY")},
        d AS (SELECT c, count(*) AS ld FROM rel GROUP BY 1),
        p AS (SELECT a.s AS s_a, b.s AS s_b, count(*) AS n_shared,
                     round(sum(1.0 / ln(d.ld)), 4) AS aa
              FROM rel a JOIN rel b ON a.c = b.c AND a.s < b.s
              JOIN d ON d.c = a.c
              GROUP BY 1, 2)
        SELECT s_a, s_b, CAST(n_shared AS BIGINT) AS n_shared, aa
        FROM p ORDER BY aa DESC, s_a, s_b LIMIT 50""")),

    // ------------------------------------------------------------------
    // PageRank over the customer–supplier transaction graph (an edge
    // per distinct customer→supplier trade, symmetrized so no node
    // dangles): "which counterparties sit at the center of the trade
    // network". Node ids are disambiguated by parity (customer = 2k,
    // supplier = 2k+1). Integer fixed-point arithmetic end to end —
    // long sums are order-independent, so Spark and DuckDB agree
    // bit-for-bit with no rounding step at all (see PageRank scaladoc).
    // ------------------------------------------------------------------
    // ------------------------------------------------------------------
    // Multi-source BFS hop distance from a supplier seed set over the
    // symmetrized trade graph — "how many trade hops away is every
    // customer/supplier from these four suppliers": the reachability
    // complement of q146's proximity RANKING (PPR weights paths; BFS
    // reports the shortest one). The oracle replays the frontier
    // expansion as unrolled min-relaxation rounds (Bellman-Ford over
    // unit weights): after k rounds every node within k hops carries
    // its exact BFS level — identical to the operator's frontier
    // protocol, which merely skips already-settled nodes.
    // ------------------------------------------------------------------
    "q177_bfs_hops" -> Q(
      fn = (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = Tables(s, dir, "supplier")
          .filter(col("s_suppkey") <= 4)
          .select((col("s_suppkey") * 2 + 1).cast("long").as("nid"))
        Graphs.bfsHops(edges, "src", "dst", seeds, "nid", maxHops = 3,
          dedupEdges = false)
          .select(
            when(pmod(col("id"), lit(2)) === 0, lit("customer"))
              .otherwise(lit("supplier")).as("node_type"),
            expr("`id` div 2").as("key"),
            col("hop"))
          .orderBy("node_type", "key")
      },
      oracle = Some(s"""
        $edgeSql
        d0 AS MATERIALIZED (
          SELECT CAST(s_suppkey * 2 + 1 AS BIGINT) AS id, 0 AS hop
          FROM supplier WHERE s_suppkey <= 4),
        ${(1 to 3).map(bfsIter).mkString(",")}
        SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               CAST(id // 2 AS BIGINT) AS key,
               CAST(hop AS INT) AS hop
        FROM d3 ORDER BY node_type, key""")),

    "q141_pagerank" -> Q(
      fn = (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        // symmetrized graph: every node receives, so the per-iteration
        // node-list join is skippable; the two directions of an
        // already-distinct half cannot collide (parity-disjoint ids),
        // so the operator's dedup exchange is skippable too; 5 fixed
        // iterations pipeline as one job (checkpointEvery = 5)
        PageRank(edges, "src", "dst", iterations = 5,
          noDanglingReceivers = true, dedupEdges = false,
          checkpointEvery = 5)
          .select(
            when(pmod(col("id"), lit(2)) === 0, lit("customer"))
              .otherwise(lit("supplier")).as("node_type"),
            expr("`id` div 2").as("key"),
            col("rank").as("pr_rank"))
          .orderBy("node_type", "key")
      },
      oracle = Some(s"""
        $edgeSql
        r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS pr_rank FROM n),
        ${(1 to 5).map(prIter(_, "150000000000")).mkString(",")}
        SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               CAST(id // 2 AS BIGINT) AS key,
               CAST(pr_rank AS BIGINT) AS pr_rank
        FROM r5 ORDER BY node_type, key""")),

    // ------------------------------------------------------------------
    // Personalized PageRank from a supplier seed set: teleport mass
    // lands only on suppliers 1-4, so rank measures graph proximity TO
    // the seeds — the trade-network complement of q140's
    // embedding-space anchor mining. Top 100 by rank (integer ranks:
    // deterministic order with the (node_type, key) tie-break).
    // ------------------------------------------------------------------
    "q146_personalized_pagerank" -> Q(
      fn = (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        PageRank(edges, "src", "dst", iterations = 5,
          dedupEdges = false, checkpointEvery = 5,
          seeds = Some(Seq(3L, 5L, 7L, 9L)))
          .select(
            when(pmod(col("id"), lit(2)) === 0, lit("customer"))
              .otherwise(lit("supplier")).as("node_type"),
            expr("`id` div 2").as("key"),
            col("rank").as("pr_rank"))
          .orderBy(col("pr_rank").desc, col("node_type"), col("key"))
          .limit(100)
      },
      oracle = Some(s"""
        $edgeSql
        r0 AS (SELECT id,
                 CAST(CASE WHEN id IN (3, 5, 7, 9)
                      THEN 1000000000000 ELSE 0 END AS BIGINT) AS pr_rank
               FROM n),
        ${(1 to 5).map(prIter(_,
          "(CASE WHEN n.id IN (3, 5, 7, 9) THEN 150000000000 ELSE 0 END)"))
          .mkString(",")}
        SELECT CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               CAST(id // 2 AS BIGINT) AS key,
               CAST(pr_rank AS BIGINT) AS pr_rank
        FROM r5 ORDER BY pr_rank DESC, node_type, key LIMIT 100""")),

    // ------------------------------------------------------------------
    // Synchronous label-propagation communities over the trade graph:
    // q141's symmetrized customer–supplier edges, 4 majority-vote
    // rounds from self-labels, reported as community ledgers. Exact
    // integer votes + total tie order (count desc, label asc) make the
    // unrolled DuckDB replay bit-exact; the fixed iteration count
    // samples the bipartite two-cycle orbit deterministically.
    // ------------------------------------------------------------------
    "q150_label_propagation" -> Q(
      fn = (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        // symmetrized + parity-disjoint: vote dedup and the sink-node
        // join are both skippable; 4 iterations pipeline as one job
        LabelPropagation(edges, "src", "dst", iterations = 4,
          dedupEdges = false, noSinkNodes = true, checkpointEvery = 4)
          .groupBy(col("lbl"))
          .agg(count(lit(1)).as("n_nodes"), sum(col("id")).as("id_checksum"))
          .select(col("lbl").as("community"), col("n_nodes"),
            col("id_checksum"))
          .orderBy("community")
      },
      oracle = Some(s"""
        WITH e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        eb AS (SELECT src, dst FROM e0
               UNION ALL SELECT dst, src FROM e0),
        n AS (SELECT src AS id FROM eb UNION SELECT dst FROM eb),
        l0 AS (SELECT id, id AS lbl FROM n),
        ${(1 to 4).map(lpIter).mkString(",")}
        SELECT CAST(lbl AS BIGINT) AS community,
               count(*) AS n_nodes,
               CAST(sum(id) AS BIGINT) AS id_checksum
        FROM l4 GROUP BY lbl ORDER BY community""")),

    // ------------------------------------------------------------------
    // HITS hubs & authorities over the DIRECTED customer→supplier
    // trade graph: hub customers buy from authoritative suppliers,
    // authoritative suppliers are bought by hub customers — the
    // two-sided ranking the one-walk PageRank family can't express
    // (q141 had to symmetrize; here direction IS the signal). Integer
    // fixed-point with per-half-step L∞ normalization; top 100 by
    // (authority, hub) with key tie-breaks.
    // ------------------------------------------------------------------
    "q151_hits" -> Q(
      fn = (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
        Hits(e0, "src", "dst", iterations = 3, dedupEdges = false)
          .select(
            when(pmod(col("id"), lit(2)) === 0, lit("customer"))
              .otherwise(lit("supplier")).as("node_type"),
            expr("`id` div 2").as("key"),
            col("hub"), col("authority"))
          .orderBy(col("authority").desc, col("hub").desc,
            col("node_type"), col("key"))
          .limit(100)
      },
      oracle = Some(s"""
        WITH e AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        h0 AS (SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS h
               FROM e),
        ${(1 to 3).map(hitsIter).mkString(",")},
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
        SELECT CASE WHEN n.id % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               CAST(n.id // 2 AS BIGINT) AS key,
               CAST(COALESCE(h.h, 0) AS BIGINT) AS hub,
               CAST(COALESCE(a.a, 0) AS BIGINT) AS authority
        FROM nodes n
        LEFT JOIN h3 h ON n.id = h.id
        LEFT JOIN a3 a ON n.id = a.id
        ORDER BY authority DESC, hub DESC, node_type, key
        LIMIT 100""")),

    // ------------------------------------------------------------------
    // Degree assortativity (Newman 2002) of the trade graph: the
    // Pearson correlation of endpoint degrees over the symmetrized
    // edge rows — negative r is the hub-periphery signature
    // (small-degree nodes attach to hubs), positive r a core of
    // mutually-connected heavyweights; the one-number structure read
    // before choosing between q165's core peel and q150's
    // communities. The six moment sums are EXACT longs (one degree
    // aggregate + two slim joins + one fold); only the final Pearson
    // assembles in double — both engines fold identical longs through
    // identical IEEE ops, rounded 4dp (the q149 discipline).
    // ------------------------------------------------------------------
    "q170_assortativity" -> Q(
      fn = (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
        val eb = e0.union(
            e0.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint(true) // 3 consumers: deg agg + 2 joins
        val deg = eb.groupBy(col("src")).agg(count(lit(1)).as("dg"))
        val xy = eb
          .join(deg.select(col("src"), col("dg").as("x")), Seq("src"))
          .join(deg.select(col("src").as("dst"), col("dg").as("y")),
            Seq("dst"))
        xy.agg(count(lit(1)).as("n_edges"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sx2"),
            sum(col("y") * col("y")).as("sy2"))
          .select(col("n_edges"),
            round((col("n_edges").cast("double") * col("sxy") -
                col("sx").cast("double") * col("sy")) /
              (sqrt(col("n_edges").cast("double") * col("sx2") -
                col("sx").cast("double") * col("sx")) *
               sqrt(col("n_edges").cast("double") * col("sy2") -
                col("sy").cast("double") * col("sy"))), 4)
              .as("assortativity"))
      },
      oracle = Some("""
        WITH e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        eb AS (SELECT src, dst FROM e0
               UNION ALL SELECT dst, src FROM e0),
        dg AS (SELECT src, count(*) AS dg FROM eb GROUP BY src),
        xy AS (SELECT a.dg AS x, b.dg AS y
               FROM eb JOIN dg a ON eb.src = a.src
                       JOIN dg b ON eb.dst = b.src),
        m AS (SELECT count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sx2,
                     CAST(sum(y * y) AS BIGINT) AS sy2
              FROM xy)
        SELECT n AS n_edges,
               round((n::DOUBLE * sxy - sx::DOUBLE * sy) /
                 (sqrt(n::DOUBLE * sx2 - sx::DOUBLE * sx) *
                  sqrt(n::DOUBLE * sy2 - sy::DOUBLE * sy)), 4)
                 AS assortativity
        FROM m""")),

    // ------------------------------------------------------------------
    // k-core of the trade graph: peel nodes below half the mean degree
    // until the dense backbone remains — the cohesion read (which
    // counterparties sit in the mutually-dense trading core) that
    // degree alone overstates (a hub with many one-shot partners
    // peels; a moderately-connected clique member survives). The
    // threshold is SCALE-ADAPTIVE (exact-integer half-mean via a
    // scalar subquery) so the core is non-degenerate at every SF; 6
    // synchronous peel rounds, fixed (monotone — extra rounds no-op
    // once converged). Exact integer degrees → bit-exact oracle.
    // ------------------------------------------------------------------
    "q165_kcore" -> Q(
      fn = (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct()
        // half-mean degree of the symmetrized graph, spelled on the
        // directed half: |E| div (|V_left| + |V_right|) — exact ints
        val k = graft.plans.Scalars.of(e0.agg(expr(
          "count(1) div (count(distinct `src`) + count(distinct `dst`))")
          .as("k")))
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        // parity-disjoint symmetrization of a distinct half: no dedup
        Graphs.kCore(edges, "src", "dst", k, rounds = 6,
            dedupEdges = false)
          .select(
            when(pmod(col("id"), lit(2)) === 0, lit("customer"))
              .otherwise(lit("supplier")).as("node_type"),
            expr("`id` div 2").as("key"),
            col("degree"))
          .orderBy("node_type", "key")
      },
      oracle = Some(s"""
        WITH e0 AS MATERIALIZED (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        kk AS MATERIALIZED (
          SELECT count(*) // (count(DISTINCT src) + count(DISTINCT dst))
            AS k
          FROM e0),
        eb AS MATERIALIZED (SELECT src, dst FROM e0
               UNION ALL SELECT dst, src FROM e0),
        ${(1 to 6).map(kcIter).mkString(",")}
        SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               CAST(src // 2 AS BIGINT) AS key,
               CAST(count(*) AS BIGINT) AS degree
        FROM e6 GROUP BY src ORDER BY node_type, key""")),

    // ------------------------------------------------------------------
    // Quality-aware near-dup consolidation: the q64 char-ngram cluster
    // graph, but each cluster keeps its LONGEST member (ties → min id)
    // instead of q67's arbitrary min-id keeper — crawl dedup should
    // retain the full copy, not whichever truncation sorts first.
    // ------------------------------------------------------------------
    "q142_cluster_keep_best" -> Q(
      fn = (s, dir) => {
        val zh = Tables(s, dir, "documents").filter(col("lang") === "zh")
        val pairs = Dedup.ngramJaccardPairs(
          zh, "doc_id", "text", n = 5, threshold = 0.25, charLevel = true)
        ConnectedComponents.keepBest(zh, "doc_id", "n_chars",
            pairs, "a_id", "b_id")
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy("doc_id")
      },
      oracle = Some("""
        WITH RECURSIVE s AS (
          SELECT doc_id,
                 list_distinct([text[i+1:i+5]
                                for i in range(len(text)-4)]) AS sh
          FROM documents WHERE lang = 'zh'),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE round(len(list_intersect(a.sh,b.sh))::DOUBLE /
                      (len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))), 3)
                >= 0.25),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, lbl) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
        sc AS (
          SELECT c.component, d.doc_id, d.n_chars
          FROM comp c JOIN documents d ON d.doc_id = c.id),
        mx AS (SELECT component, max(n_chars) AS mx FROM sc
               GROUP BY component),
        keepids AS (
          SELECT sc.component, min(sc.doc_id) AS keep_id
          FROM sc JOIN mx ON sc.component = mx.component
                         AND sc.n_chars = mx.mx
          GROUP BY sc.component),
        drops AS (
          SELECT id FROM comp
          WHERE id NOT IN (SELECT keep_id FROM keepids))
        SELECT doc_id, source, n_chars
        FROM documents
        WHERE lang = 'zh' AND doc_id NOT IN (SELECT id FROM drops)
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // Local clustering coefficient over the co-purchase projection:
    // per supplier, the fraction of its co-purchase neighbors that are
    // themselves co-purchased (2·tri / deg·(deg−1), exact milli) —
    // degree says how CONNECTED, cc says how CLIQUISH; a high-degree/
    // low-cc node is a bridge, high/high sits inside a community. Same
    // scale-adaptive edge threshold and orientation-bounded triangle
    // kernel as q148, on a different market segment; the cc arithmetic
    // is pure integer post-processing, so the oracle replays it
    // verbatim on the id-ordered triangle enumeration.
    // ------------------------------------------------------------------
    "q199_clustering_coefficient" -> Q(
      fn = (s, dir) => {
        val pairs = Graphs.coOccurrence(relDf(s, dir, "AUTOMOBILE"),
          "cust", "supp").localCheckpoint(true)
        val th = graft.plans.Scalars.of(pairs.agg(
          expr("(5 * sum(`n_shared`)) div (4 * count(1))").as("th")))
        Graphs.clusteringCoefficient(
            pairs.filter(col("n_shared") >= th), "a", "b")
          .select(col("id").as("s_key"), col("degree"),
            col("n_triangles"), col("cc_milli"))
          .orderBy("s_key")
      },
      oracle = Some(s"""
        WITH ${relSql("AUTOMOBILE")},
        p AS (SELECT a.s AS a, b.s AS b, count(*) AS n
              FROM rel a JOIN rel b ON a.c = b.c AND a.s < b.s
              GROUP BY 1, 2),
        cut AS (SELECT (5 * sum(n)) // (4 * count(*)) AS th FROM p),
        e AS (SELECT a, b FROM p CROSS JOIN cut WHERE n >= th),
        deg AS (SELECT id, count(*) AS degree FROM (
                  SELECT a AS id FROM e UNION ALL SELECT b FROM e)
                GROUP BY 1),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        tc AS (SELECT id, count(*) AS n FROM (
                 SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri) GROUP BY 1)
        SELECT d.id AS s_key, CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(tc.n, 0) AS BIGINT) AS n_triangles,
               CAST(CASE WHEN d.degree >= 2
                         THEN (2000 * COALESCE(tc.n, 0)) //
                              (d.degree * (d.degree - 1))
                         ELSE 0 END AS BIGINT) AS cc_milli
        FROM deg d LEFT JOIN tc ON d.id = tc.id
        ORDER BY s_key""")),

    // ------------------------------------------------------------------
    // Newman modularity of the nation partition over the co-purchase
    // graph: does geography explain who gets co-purchased? The same
    // scale-adaptive edge threshold as q199 (on a different market
    // segment), then one row per nation with its additive share of Q
    // — observed intra-nation edges minus the configuration-model
    // expectation, (4·m·m_c − D_c²)/(4·m²) as ONE double division
    // over exact integers. Σ q_contrib = Q; near 0 everywhere means
    // nation labels carry no co-purchase signal (the null read a
    // community detector must beat).
    // ------------------------------------------------------------------
    "q218_modularity_by_nation" -> Q(
      fn = (s, dir) => {
        val pairs = Graphs.coOccurrence(relDf(s, dir, "FURNITURE"),
          "cust", "supp").localCheckpoint(true)
        val th = graft.plans.Scalars.of(pairs.agg(
          expr("(5 * sum(`n_shared`)) div (4 * count(1))").as("th")))
        val labels = Tables(s, dir, "supplier")
          .join(Tables(s, dir, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        Graphs.modularity(pairs.filter(col("n_shared") >= th), "a", "b",
            labels, "s_suppkey", "n_name")
          .select(col("label").as("community"), col("n_nodes"),
            col("deg_sum"), col("intra_edges"), col("q_contrib"))
          .orderBy("community")
      },
      oracle = Some(s"""
        WITH ${relSql("FURNITURE")},
        p AS (SELECT a.s AS a, b.s AS b, count(*) AS n
              FROM rel a JOIN rel b ON a.c = b.c AND a.s < b.s
              GROUP BY 1, 2),
        cut AS (SELECT (5 * sum(n)) // (4 * count(*)) AS th FROM p),
        e AS (SELECT a, b FROM p CROSS JOIN cut WHERE n >= th),
        m AS (SELECT count(*) AS m FROM e),
        deg AS (SELECT id, count(*) AS d FROM (
                  SELECT a AS id FROM e UNION ALL SELECT b FROM e)
                GROUP BY 1),
        lab AS (SELECT s_suppkey AS id, n_name AS lab
                FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        nd AS (SELECT lab, count(*) AS n_nodes, sum(d) AS deg_sum
               FROM deg JOIN lab USING (id) GROUP BY 1),
        ie AS (SELECT la.lab AS lab, count(*) AS intra
               FROM e JOIN lab la ON e.a = la.id
               JOIN lab lb ON e.b = lb.id
               WHERE la.lab = lb.lab GROUP BY 1)
        SELECT nd.lab AS community,
               CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST(deg_sum AS BIGINT) AS deg_sum,
               CAST(COALESCE(intra, 0) AS BIGINT) AS intra_edges,
               round(CAST(4 * m.m * COALESCE(intra, 0)
                          - deg_sum * deg_sum AS DOUBLE)
                     / CAST(4 * m.m * m.m AS DOUBLE), 6) AS q_contrib
        FROM nd LEFT JOIN ie USING (lab) CROSS JOIN m
        ORDER BY community"""))
  )
}
