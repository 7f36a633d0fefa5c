package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Static graph kernels over edge DataFrames: bipartite co-occurrence
  * projection, degree-ordered triangle counting, and common-neighbor
  * link prediction — the non-iterative complement of [[PageRank]] /
  * [[ConnectedComponents]] (clustering structure and link scoring
  * rather than reachability or centrality).
  *
  * All kernels are equi-join + partial/final-aggregate plans: nothing
  * is collected, no windows over unbounded partitions, and the one
  * genuinely super-linear step (per-left-entity pair generation in the
  * projection) carries an explicit hub cap with a documented recall
  * contract, the same df-cap discipline as [[Dedup]]'s candidate
  * generators. */
object Graphs {

  /** Co-occurrence projection of a bipartite relation (Newman 2001's
    * one-mode projection): an undirected edge `(a, b, n_shared)` per
    * pair of right-side entities sharing at least `minShared` distinct
    * left-side entities. `a < b` canonically; the relation is
    * de-duplicated first, so multiplicity on the input carries no
    * weight.
    *
    * Scale shape: pair generation is one self-equi-join on the left
    * key — a left entity of degree d contributes C(d,2) rows, so cost
    * is Σ C(d,2), never |R|². `maxLeftDegree` caps that sum: left
    * entities with more than the cap distinct right neighbors are
    * DROPPED from pair generation (the [[Dedup]] `maxDocFreq` recall
    * contract: an edge is lost only if every shared left entity is
    * that hot — and such hub-mediated co-occurrence is exactly the
    * signal (a customer who buys everything, a stopword-like token)
    * that projection weighting schemes discount anyway). None = exact. */
  def coOccurrence(
      rel: DataFrame, leftCol: String, rightCol: String,
      minShared: Long = 1L,
      maxLeftDegree: Option[Int] = None): DataFrame = {
    val r = dedupedRel(rel, leftCol, rightCol, maxLeftDegree)
    val p = explosiveJoinPartitions(rel)
    // explicit cores-derived partition count on BOTH join inputs (see
    // [[explosiveJoinPartitions]]): the pair join fans out C(d,2) rows
    // per left entity from a byte-slim input, exactly the shape AQE's
    // byte-based coalescing under-parallelizes
    val x = r.select(col("l"), col("r").as("a")).repartition(p, col("l"))
    val y = r.select(col("l").as("__l"), col("r").as("b"))
      .repartition(p, col("__l"))
    x.join(y, col("l") === col("__l") && col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Partition count for a CPU-EXPLOSIVE equi-join (guide §2.5/§2.2):
    * a self-join whose per-key fan-out is quadratic in key frequency
    * (wedge generation, pair generation) produces orders of magnitude
    * more CPU per input byte than a plain join, so AQE's byte-based
    * partition coalescing — correct for byte-bound shuffles — collapses
    * its few-MB input to one or two partitions and serializes minutes
    * of join CPU onto one core (measured: q199's wedge join ran as ONE
    * task, 75 s of a 88 s query). An EXPLICIT numPartitions on the
    * join-key repartition opts the exchange out of AQE coalescing
    * (REPARTITION_BY_NUM origin) without adding an exchange — the join
    * needed the hash distribution anyway. Cores-derived, so it is
    * cluster-adaptive rather than tuned to any one box; per-key skew
    * is bounded by the callers' own contracts (degree-ordered
    * orientation caps wedge keys at O(√m); the hub cap bounds pair
    * keys). */
  private def explosiveJoinPartitions(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** The shared (l, r)-distinct + hub-cap step of [[coOccurrence]] and
    * [[adamicAdar]]. Columns renamed to (l, r) so self-joins downstream
    * have unambiguous attribute ids. */
  private def dedupedRel(
      rel: DataFrame, leftCol: String, rightCol: String,
      maxLeftDegree: Option[Int]): DataFrame = {
    // the deduped relation is materialized ONCE: every caller consumes
    // it at least twice (both self-join sides; plus the hub-degree
    // ledger when capped), and an expensive upstream lineage — an
    // n-gram explode, a multi-table join — would otherwise re-run per
    // consumer (measured ~3x of q175's gram relation)
    val r = rel.select(col(leftCol).as("l"), col(rightCol).as("r"))
      .distinct()
      .localCheckpoint(true)
    maxLeftDegree match {
      case Some(cap) =>
        // one aggregate over the deduped relation; the cap filter is a
        // semi-join shape (broadcastable: the hot-hub ledger is small
        // by construction — it only holds entities ABOVE the cap)
        val hot = r.groupBy(col("l")).agg(count(lit(1)).as("__d"))
          .filter(col("__d") > cap).select(col("l"))
        r.join(broadcast(hot), Seq("l"), "left_anti")
      case None => r
    }
  }

  /** Per-node triangle participation over an undirected simple graph.
    * Input edges `(aCol, bCol)` are canonicalized (self-loops dropped,
    * both orderings of a pair collapse to one); output is one row per
    * node appearing in an edge: `(id, degree, n_triangles)`.
    *
    * The plan is the degree-ordered orientation algorithm (Chiba–
    * Nishizeki / Schank's forward counting, the shape every
    * distributed triangle counter uses): orient each edge from its
    * lower to its higher endpoint under the total order (degree, id) —
    * every out-neighborhood then has size O(√m) on any graph — build
    * wedges by joining out-edges on their source, and close each wedge
    * with one more equi-join against the oriented edge set. Wedge
    * volume is Σ C(outdeg,2) ≤ O(m^1.5) worst-case (vs Σ C(deg,2),
    * which a star graph drives to n² under naive id-ordering); each
    * triangle {x≺y≺z} is produced exactly once, as wedge (x→y, x→z)
    * closed by y→z. The orientation is internal — the triangle SET is
    * orientation-invariant, so an id-ordered oracle enumerates the
    * same triangles. */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // explode(array(u, v)) rather than unionAll of two projections:
    // a union's branches are DISTINCT subtrees after column pruning, so
    // the upstream distinct would run once PER BRANCH (no exchange
    // reuse) — explode evaluates the edge set once
    val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true) // consumed 3× (two orientation joins + output)
    // orient along the (degree, id) total order; carry the head's rank
    // key so the wedge join can compare heads without re-joining deg
    val du = deg.select(col("id").as("u"), col("degree").as("__du"))
    val dv = deg.select(col("id").as("v"), col("degree").as("__dv"))
    val uFirst = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("u") < col("v"))
    val dirE = e.join(du, "u").join(dv, "v")
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("__dv")).otherwise(col("__du")).as("ddeg"))
      .localCheckpoint(true) // consumed 3× (both wedge sides + closure)
    // the wedge join is the kernel's explosive step — Σ C(outdeg,2)
    // output rows from an |E|-row input — so both sides carry an
    // explicit cores-derived partition count ([[explosiveJoinPartitions]]
    // rationale; measured 75 s single-task → seconds across cores)
    val p = explosiveJoinPartitions(edges)
    val e1 = dirE.select(col("src"), col("dst").as("y"), col("ddeg").as("__dy"))
      .repartition(p, col("src"))
    val e2 = dirE.select(col("src").as("__s"), col("dst").as("z"),
      col("ddeg").as("__dz"))
      .repartition(p, col("__s"))
    val wedge = e1.join(e2,
      col("src") === col("__s") &&
        (col("__dy") < col("__dz") ||
          (col("__dy") === col("__dz") && col("y") < col("z"))))
    val tri = wedge.join(
      dirE.select(col("src").as("__cs"), col("dst").as("__cd")),
      col("y") === col("__cs") && col("z") === col("__cd"))
      .select(col("src"), col("y"), col("z"))
    // ONE evaluation of the wedge+closure pipeline: the previous
    // unionAll of three per-corner projections made the Union's
    // branches three distinct subtrees (column pruning differs per
    // branch, so no exchange reuse applies) and the measured plan ran
    // the explosive join THREE times — explode(array(...)) counts all
    // three corners from a single pass
    val corners = tri
      .select(explode(array(col("src"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("__n"))
    deg.join(corners, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("__n"), lit(0L)).as("n_triangles"))
  }

  /** Local clustering coefficient per node (Watts & Strogatz 1998):
    * the fraction of a node's neighbor pairs that are themselves
    * connected, `2·tri / (deg·(deg−1))`, reported in exact MILLI fixed
    * point (truncating integer division — engine-portable, no float
    * rounding to disagree on). Nodes of degree < 2 have no wedge to
    * close and report 0 by convention. Output:
    * `(id, degree, n_triangles, cc_milli)`.
    *
    * Pure post-processing of [[triangles]] — one per-row expression on
    * its output, so the cost and the O(m^1.5) wedge bound are exactly
    * the triangle count's. Degree alone says how CONNECTED a node is;
    * cc says how CLIQUISH its neighborhood is — the pair (hub with
    * cc≈0 vs hub inside a near-clique) is the standard community/
    * bridge discrimination read. */
  def clusteringCoefficient(
      edges: DataFrame, aCol: String, bCol: String): DataFrame =
    triangles(edges, aCol, bCol)
      .withColumn("cc_milli",
        when(col("degree") >= 2,
          expr("(2000 * `n_triangles`) div (`degree` * (`degree` - 1))"))
          .otherwise(lit(0L)))

  /** Adamic–Adar link scores (Adamic & Adar 2003) over a bipartite
    * relation: for each right-side pair sharing at least one left
    * entity, `aa = Σ_{shared l} 1 / ln(degree(l))` — common neighbors,
    * discounted by how promiscuous each shared neighbor is. Returns
    * `(a, b, n_shared, aa)` with `a < b`, `aa` rounded to `decimals`.
    *
    * Every shared left entity has degree ≥ 2 (sharing requires two
    * right neighbors), so `ln` never sees 1 and the score is finite.
    * Same pair-generation shape and `maxLeftDegree` contract as
    * [[coOccurrence]] — the hub cap here approximates the exact score
    * from below by at most `n_hot / ln(cap)`, and the entities it
    * drops are the ones AA's own 1/ln weight already sends toward 0. */
  def adamicAdar(
      rel: DataFrame, leftCol: String, rightCol: String,
      maxLeftDegree: Option[Int] = None,
      decimals: Int = 4): DataFrame = {
    val r = dedupedRel(rel, leftCol, rightCol, maxLeftDegree)
      .localCheckpoint(true) // consumed 3× (degree agg + both join sides)
    val ldeg = r.groupBy(col("l")).agg(count(lit(1)).as("__ld"))
    // same explosive pair-join shape as [[coOccurrence]] — explicit
    // cores-derived partitioning (see [[explosiveJoinPartitions]])
    val p = explosiveJoinPartitions(rel)
    val x = r.select(col("l"), col("r").as("a")).repartition(p, col("l"))
    val y = r.select(col("l").as("__l"), col("r").as("b"))
      .repartition(p, col("__l"))
    x.join(y, col("l") === col("__l") && col("a") < col("b"))
      .join(ldeg, Seq("l"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"),
        round(sum(lit(1.0) / log(col("__ld"))), decimals).as("aa"))
  }

  /** Multi-source BFS hop distance: for every node reachable from the
    * seed set within `maxHops` edge traversals, the minimum hop count
    * (seeds report 0). Edges are DIRECTED ROWS — pass both orientations
    * for an undirected graph (the [[PageRank]] q141 symmetrization).
    * Returns `(id, hop)`.
    *
    * The plan is textbook frontier BFS (Cormen et al., the level-
    * synchronous form every distributed BFS uses — Pregel's canonical
    * example): per level, expand the frontier along one equi-join,
    * `distinct` the candidates down to |V|-bounded size BEFORE the
    * visited check, anti-join the visited ledger, and stop early when
    * the frontier empties — on small-diameter graphs (trade networks,
    * co-occurrence graphs: O(log n) diameter) that exit, not `maxHops`,
    * is the usual bound. Per level: two slim shuffles (candidate
    * distinct + visited anti-join), both |E|/|V|-bounded; nothing is
    * collected, no windows. Each LEVEL frame is eagerly checkpointed
    * (lineage stays flat across levels); the visited set is a lazy
    * union of those materialized leaves — every level's rows are part
    * of the result, so nothing is superseded and re-checkpointing the
    * union would only re-copy pinned rows.
    *
    * Seeds not present in any edge row still report hop 0 (reachable
    * by the empty path); `maxHops = 0` returns exactly the seed set. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int,
      dedupEdges: Boolean = true): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64, "maxHops must be in [0, 64]")
    def ckRdd(df: DataFrame) =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }
    // LAZY checkpoints throughout: each level's frontier COUNT (the
    // frontier-empty exit test the loop needs anyway) doubles as the
    // checkpoint's materializing action — one Spark job per level
    // instead of an eager-checkpoint job PLUS an isEmpty job (the
    // [[ConnectedComponents]] signature discipline). The edge and seed
    // frames materialize inside level 1's job the same way.
    val e = {
      val e0 = edges
        .select(col(srcCol).cast("long").as("__src"),
          col(dstCol).cast("long").as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull)
      (if (dedupEdges) e0.distinct() else e0)
        .localCheckpoint(false) // consumed once per BFS level
    }
    var dist = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("hop", lit(0).cast("int"))
      .localCheckpoint(false)
    var frontier = dist
    var h = 0
    var exhausted = false
    while (h < maxHops && !exhausted) {
      h += 1
      // distinct BEFORE the visited anti-join: candidate volume is
      // frontier-out-degree-bounded pre-distinct, |V|-bounded after —
      // the anti-join then probes the (larger) visited ledger with the
      // small side
      val next = frontier
        .join(e, col("id") === col("__src"))
        .select(col("__dst").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .withColumn("hop", lit(h).cast("int"))
        .localCheckpoint(false)
      if (next.count() == 0L) {
        exhausted = true
        ckRdd(next).foreach(_.unpersist(blocking = false))
      } else {
        // dist stays a LAZY union of checkpointed level frames: its
        // parents are already-materialized leaves, so the next level's
        // visited anti-join reads cache — re-checkpointing the union
        // would pay one extra |V|-sized job per level for rows that
        // are already pinned (measured ~25% of q177)
        dist = dist.unionAll(next)
        frontier = next
      }
    }
    ckRdd(e).foreach(_.unpersist(blocking = false))
    dist
  }

  /** Synchronous k-core peel (Seidman 1983, the Batagelj–Zaveršnik
    * bulk variant): `rounds` rounds of "drop every node whose current
    * degree < k", over an edge list treated as DIRECTED ROWS of an
    * undirected graph (pass both orientations — the [[PageRank]] q141
    * symmetrization; degree(n) = row count with src = n). Returns the
    * surviving `(id, degree)` frame — the k-core exactly once the
    * peel has converged (survivors stabilize), a decreasing superset
    * after a fixed prefix of rounds otherwise: peeling is monotone,
    * so extra rounds are no-ops and the fixed count samples
    * convergence deterministically (the [[LabelPropagation]]
    * finite-plan contract).
    *
    * `k` is a Column so callers can pin scale-adaptive thresholds
    * (e.g. an exact-integer mean-degree scalar subquery) that stay
    * non-degenerate at every corpus size.
    *
    * Survivors are reported FROM THE LIVE EDGE ROWS: a node that
    * passes a round's degree vote but loses every incident edge (all
    * neighbors fell the same round) reports no row — which is exactly
    * right at convergence, where every k-core member has degree
    * ≥ k ≥ 1 by definition; mid-peel, such a node is one the next
    * round would drop anyway (spec-pinned on the path graph).
    *
    * Scale shape: per round ONE degree aggregate over the live edge
    * set + two semi-join shapes against the survivor ledger — |E|-row
    * bounded, no windows, nothing collected; the live set only
    * shrinks. Eager checkpoint per round, superseded frames released
    * (the [[PageRank]] loop discipline), and the loop exits at the
    * fixed point (equal live-edge counts — monotonicity makes that a
    * set equality, so the early exit provably returns the same frame
    * the full `rounds` run would). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: org.apache.spark.sql.Column, rounds: Int = 6,
      dedupEdges: Boolean = true): DataFrame = {
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    def ckRdd(df: DataFrame) =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }
    // LAZY checkpoints throughout the peel: the fixpoint COUNT is the
    // action that materializes each round's edge set (the
    // [[ConnectedComponents]] signature discipline) — one Spark job
    // per round instead of an eager-checkpoint job PLUS a count job.
    var e = {
      val e0 = edges
        .select(col(srcCol).cast("long").as("__src"),
          col(dstCol).cast("long").as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull)
      (if (dedupEdges) e0.distinct() else e0).localCheckpoint(false)
    }
    // early exit at the fixed point: the peel is monotone (next ⊆ e),
    // so equal live-edge COUNTS mean equal SETS, and every further
    // round is a no-op — the result equals the full `rounds` run
    // exactly. The count doubles as the checkpoint's materializing
    // action; nothing is collected.
    var live = e.count()
    var r = 0
    var fixed = false
    while (r < rounds && !fixed) {
      // keep stays LAZY: its two semi-join consumers share one
      // canonical aggregate plan, so ReuseExchange materializes the
      // survivor ledger once — no extra checkpoint job per round
      val keep = e.groupBy(col("__src")).agg(count(lit(1)).as("__dg"))
        .filter(col("__dg") >= k)
        .select(col("__src").as("__id"))
      val next = e
        .join(keep, col("__src") === col("__id"), "left_semi")
        .join(keep, col("__dst") === col("__id"), "left_semi")
        .localCheckpoint(false)
      val nextLive = next.count()
      ckRdd(e).foreach(_.unpersist(blocking = false))
      fixed = nextLive == live
      live = nextLive
      e = next
      r += 1
    }
    val out = e.groupBy(col("__src")).agg(count(lit(1)).as("degree"))
      .select(col("__src").as("id"), col("degree"))
      .localCheckpoint(true) // node-sized; the release below needs it
    ckRdd(e).foreach(_.unpersist(blocking = false))
    out
  }

  /** Newman modularity, decomposed per community (Newman & Girvan
    * 2004, "Finding and evaluating community structure in networks"):
    * for a partition {c} of an undirected simple graph,
    * Q = Σ_c [ m_c/m − (D_c/2m)² ] with m the edge count, m_c the
    * intra-community edge count and D_c the community's degree sum —
    * the standard "observed minus expected-under-the-configuration-
    * model" read of how well the labeling explains the edge structure.
    * Returns one row per community:
    * `(label, n_nodes, deg_sum, intra_edges, q_contrib)` — `q_contrib`
    * the community's additive share of Q (Σ q_contrib = Q), computed
    * as ONE double division over exact integers,
    * (4·m·m_c − D_c²) / (4·m²), rounded to 6 dp — so both engines see
    * bit-identical inputs to a single IEEE operation.
    *
    * Inputs: `edges` must be simple and canonical (one row per
    * undirected edge; self-loops and duplicates are the caller's to
    * scrub — [[coOccurrence]] output qualifies as-is). `labels` maps
    * node id → community. m and the degree ledger are of the FULL
    * input graph; an unlabeled endpoint forms no community row (inner
    * join) and an edge counts as intra only when BOTH endpoints carry
    * the same label — under a partial labeling the unlabeled mass is
    * background that dilutes every community's share, which is the
    * honest read (a labeling that covers 1% of the graph should not
    * score like one that explains it).
    *
    * Scale shape: two slim label equi-joins on the edge endpoints
    * (labels are corpus-sized — a shuffled join by design, never a
    * broadcast), one node-keyed degree aggregation and two
    * label-keyed aggregations; m enters as an in-plan scalar
    * subquery. Everything is keyed by node or label — corpus-linear,
    * no windows, nothing collected. */
  def modularity(
      edges: DataFrame, aCol: String, bCol: String,
      labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    // three consumer subtrees (degree ledger, intra join, the m
    // scalar) — materialize once, the adamicAdar discipline, so an
    // expensive caller-side edge lineage never re-runs per consumer
    val e = edges.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .localCheckpoint(true)
    val lab = labels.select(col(idCol).as("__id"), col(labelCol).as("label"))
    val m = graft.plans.Scalars.of(e.agg(count(lit(1)).as("m")))
    val deg = e.select(col("__a").as("__id"))
      .unionAll(e.select(col("__b").as("__id")))
      .groupBy("__id").agg(count(lit(1)).as("__d"))
    val byLabel = deg.join(lab, "__id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum(col("__d")).as("deg_sum"))
    val intra = e
      .join(lab.select(col("__id").as("__a"), col("label").as("__la")), "__a")
      .join(lab.select(col("__id").as("__b"), col("label").as("__lb")), "__b")
      .filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label"))
      .agg(count(lit(1)).as("intra_edges"))
    byLabel.join(intra, Seq("label"), "left")
      .select(col("label"), col("n_nodes"), col("deg_sum"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"))
      .withColumn("q_contrib", round(
        (lit(4L) * m * col("intra_edges") - col("deg_sum") * col("deg_sum"))
          .cast("double") /
          (lit(4L) * m * m).cast("double"), 6))
  }
}
