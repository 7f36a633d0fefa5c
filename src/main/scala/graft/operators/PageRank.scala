package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — link-analysis
  * importance scoring, the canonical iterative-MapReduce workload of
  * the runtime family the reference belongs to (the lrmr programming
  * model is explicitly MapReduce-shaped; PageRank is literature's
  * standard exercise for it — Page et al. 1999, public). In the
  * training-data layer it ranks interaction graphs (user–item,
  * doc–doc kNN, domain link graphs) so curation can weight documents
  * by graph centrality rather than content signals alone.
  *
  * INTEGER arithmetic throughout — ranks are fixed-point longs scaled
  * by `scale`, the per-edge contribution is
  * `(dampNum * (rank div outdeg)) div dampDen`, and the new rank is
  * `base + sum(contribs)` with `base = ((dampDen−dampNum)·scale) div
  * dampDen`. Long sums are order-independent, so two engines (or two
  * partitionings of the same cluster) agree BIT-FOR-BIT — a float
  * spelling would diverge across plusses in summation order, which is
  * exactly what the repo's oracle-parity discipline forbids. The cost
  * is ≤1 ulp-of-scale truncation per edge per iteration; at the
  * default `scale` = 10^12 that is relative error ~10^-12·outdeg —
  * far below anything a ranking consumer can observe.
  *
  * Semantics (the "no redistribution" variant): per iteration every
  * node sends `rank div outdeg` down each out-edge; dangling nodes
  * (out-degree 0) send nothing, so their mass DECAYS rather than
  * being redistributed — the simplest published variant, chosen
  * because it keeps the per-iteration plan to one join + one
  * aggregate. Callers who need mass conservation symmetrize the edge
  * set (each undirected edge as two directed ones — the q141
  * spelling), which leaves no node dangling. Self-loops and duplicate
  * edges are legal input; duplicates are dropped (`distinct`), loops
  * feed a node's own next rank.
  *
  * Scale shape: the edge set (+ precomputed out-degree) is
  * materialized ONCE (`localCheckpoint`), then each iteration is one
  * equi-join of the (id, rank) frame against it — broadcastable
  * whenever node count is model-sized, an ordinary shuffle hash join
  * otherwise — followed by one partial+final sum keyed by destination
  * and one left join back to the node list. Nothing is ever
  * collected; no windows; per-iteration shuffle volume is |E| slim
  * rows. Each iteration's (id, rank) frame is eagerly checkpointed to
  * keep the task binary flat (the CC-loop discipline,
  * [[ConnectedComponents]]), and the superseded iteration's blocks
  * are released as soon as the successor is materialized — only the
  * final frame stays resident, because the returned DataFrame reads
  * from it.
  *
  * Overflow contract (ANSI mode makes violations LOUD, not silent):
  * total mass is ≤ |V|·scale at every iteration, and the widest
  * intermediate is `dampNum · (per-node rank)`, so the caller must
  * keep `dampNum · |V| · scale < 2^63` — at the defaults that is
  * ~10^5 nodes of headroom per 10^12 of scale; pass a smaller `scale`
  * (10^9 keeps 10^8 nodes safe) for web-scale graphs. Node ids must
  * be integral (they ride the arithmetic as longs).
  */
object PageRank {

  private def ckRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

  /** (id, rank) for every node appearing in `edges` after `iterations`
    * synchronous rounds from a uniform start of `scale` per node.
    * Rows with a null endpoint are dropped.
    *
    * `noDanglingReceivers`: set true when EVERY node has at least one
    * in-edge (a symmetrized graph guarantees it) — the per-iteration
    * left join back to the node list is then provably a no-op and is
    * skipped, saving one n-row join per iteration. The default keeps
    * the join: a node with out-edges but no in-edges (a pure source)
    * would otherwise vanish from the result.
    *
    * `dedupEdges`: duplicate edges change the arithmetic (a doubled
    * edge sends twice), so the default dedups. Set false when the
    * caller guarantees distinctness (e.g. a symmetrized union of an
    * already-distinct half, where the two directions cannot collide) —
    * skipping the dedup saves one full \|E\|-row exchange.
    *
    * `checkpointEvery`: iterations between eager lineage cuts. 1 (the
    * default) is the CC-loop discipline — flattest task binaries, one
    * job per iteration. A fixed SMALL iteration count can afford a
    * larger stride: the chained shuffles then pipeline inside fewer
    * jobs, trading task-binary depth for fewer scheduling round-trips.
    * The final iteration ALWAYS checkpoints — the returned frame must
    * be a leaf so the operator's edge/node materializations can be
    * released on exit.
    *
    * `seeds`: PERSONALIZED PageRank (Page et al. 1999 §6's
    * personalized teleport; the "related to these" graph-proximity
    * retrieval primitive). When set, the teleport mass lands only on
    * the seed set: seeds start at `scale` and receive the base term,
    * non-seeds start at 0 and receive only propagated mass — so rank
    * measures proximity TO the seeds, the graph-structural complement
    * of [[Similarity.anchorSimilarity]]'s embedding-space anchors.
    * Seed sets are plan literals (an `isin` over O(10³) ids at most —
    * the [[graft.operators.TextStats.blocklistFilter]] size
    * discipline; bigger seed sets want a join spelling, which this
    * operator deliberately does not grow until needed). Seeding
    * implies the per-iteration node join (the base term is
    * node-dependent), so `noDanglingReceivers` is ignored with seeds.
    * Integer contract only relaxes: total mass ≤ \|seeds\|·scale. */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      noDanglingReceivers: Boolean = false,
      dedupEdges: Boolean = true,
      checkpointEvery: Int = 1,
      seeds: Option[Seq[Long]] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      "iterations must be in [1, 64]")
    require(scale > 0, "scale must be positive")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must satisfy 0 <= dampNum <= dampDen")
    require(checkpointEvery >= 1, "checkpointEvery must be at least 1")

    val ewd = {
      val e0 = edges
        .select(col(srcCol).cast("long").as("__src"),
          col(dstCol).cast("long").as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull)
      val e = if (dedupEdges) e0.distinct() else e0
      val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      e.join(deg, "__src").localCheckpoint(true)
    }
    seeds.foreach(s => require(s.nonEmpty, "seed set must be non-empty"))
    // UNSEEDED runs start uniform (rank = scale for every node), so
    // iteration 1's |E| join against the start frame is provably
    // `rank div __deg` = `scale div __deg` — a pure edge aggregate
    // (folded below). The node list is then consumed ONLY by the
    // per-iteration dangling-receiver left join; when that join is
    // skipped too (noDanglingReceivers), the union+distinct and its
    // checkpoint job never build at all.
    val nodesNeeded = seeds.isDefined || !noDanglingReceivers
    lazy val nodes = ewd.select(col("__src").as("id"))
      .union(ewd.select(col("__dst").as("id")))
      .distinct()
      .localCheckpoint(true)

    val base = lit(((dampDen - dampNum) * scale) / dampDen)
    val isSeed = seeds.map(s => col("id").isin(s: _*))
    val baseTerm =
      isSeed.map(f => when(f, base).otherwise(lit(0L))).getOrElse(base)
    var ranks: DataFrame =
      if (seeds.isEmpty) null // iteration 1 folds the uniform start
      else nodes.select(col("id"),
        when(isSeed.get, lit(scale)).otherwise(lit(0L)).as("rank"))
    var prev: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iterations) {
      val contrib =
        if (i == 1 && seeds.isEmpty)
          ewd.select(col("__dst").as("id"),
            expr(s"($dampNum * (${scale}L div `__deg`)) div $dampDen")
              .as("__c"))
            .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
        else ranks.join(ewd, col("id") === col("__src"))
          .select(col("__dst").as("id"),
            expr(s"($dampNum * (`rank` div `__deg`)) div $dampDen").as("__c"))
          .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      val step = (if (noDanglingReceivers && seeds.isEmpty) contrib
        else nodes.join(contrib, Seq("id"), "left"))
        .select(col("id"),
          (baseTerm + coalesce(col("__s"), lit(0L))).as("rank"))
      // the FINAL iteration always checkpoints: the returned frame
      // must be a leaf so the edge/node materializations below can be
      // released without stranding its lineage
      val next =
        if (i % checkpointEvery == 0 || i == iterations) {
          val ck = step.localCheckpoint(true)
          // successor is materialized (eager): the superseded
          // iteration's blocks are dead weight now
          prev.foreach(_.unpersist(blocking = false))
          prev = ckRdd(ck)
          ck
        } else step
      ranks = next
    }
    // the returned frame reads the FINAL checkpoint only; the edge and
    // node materializations are released (nodes only if it was ever
    // built — forcing the lazy val here would RUN its checkpoint job)
    (Seq(ewd) ++ (if (nodesNeeded) Seq(nodes) else Nil))
      .flatMap(ckRdd).foreach(_.unpersist(blocking = false))
    ranks
  }
}
