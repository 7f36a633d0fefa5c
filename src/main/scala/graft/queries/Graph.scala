package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ConnectedComponents, Dedup, PageRank}

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

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // PageRank over the customer–supplier transaction graph (an edge
    // per distinct customer→supplier trade, symmetrized so no node
    // dangles): "which counterparties sit at the center of the trade
    // network". Node ids are disambiguated by parity (customer = 2k,
    // supplier = 2k+1). Integer fixed-point arithmetic end to end —
    // long sums are order-independent, so Spark and DuckDB agree
    // bit-for-bit with no rounding step at all (see PageRank scaladoc).
    // ------------------------------------------------------------------
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
        ORDER BY doc_id"""))
  )
}
