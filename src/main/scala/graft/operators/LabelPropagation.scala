package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Fixed-iteration synchronous label propagation (Raghavan et al.
  * 2007) over an edge list — community detection by majority vote:
  * every node starts labeled with its own id, and each round adopts
  * the most frequent label among its neighbors (ties → smallest
  * label). In the training-data layer it clusters interaction and
  * similarity graphs (domain link graphs, doc–doc kNN) into
  * communities that curation can sample or cap as units, the
  * coarse-grained complement of [[ConnectedComponents]] (which only
  * separates disconnected parts) and [[PageRank]] (which ranks within
  * them).
  *
  * Determinism: the update is argmax over exact integer counts with a
  * total tie order (count desc, label asc), so two engines agree
  * exactly — asynchronous/randomized LPA variants trade that away for
  * faster convergence, which an oracle-gated repo cannot accept. A
  * FIXED iteration count (not convergence detection) keeps the plan
  * finite and the cross-engine contract trivial; synchronous LPA can
  * two-cycle on bipartite structure, and a fixed count simply samples
  * that orbit deterministically.
  *
  * Neighbor semantics: labels flow along edges src←dst (a node's
  * neighbors are the dst endpoints of its out-edges); symmetrize for
  * undirected graphs (the q141 spelling). A node with NO out-edges
  * keeps its current label through the per-iteration left join back
  * to the node list — skippable via `noSinkNodes` when every node has
  * at least one out-edge (a symmetrized graph guarantees it).
  *
  * Scale shape: the edge set is materialized once; each iteration is
  * one |E|-row equi-join + two keyed aggregates (label counts, then a
  * struct-min argmax — SortAggregate, as struct extrema always are)
  * and an optional node join. Same checkpoint/release discipline as
  * [[PageRank]]: eager lineage cuts every `checkpointEvery`
  * iterations, superseded frames released as soon as the successor is
  * materialized, nothing collected. */
object LabelPropagation {

  private def ckRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

  /** (id, label) for every node appearing in `edges` after
    * `iterations` synchronous rounds. Rows with a null endpoint are
    * dropped; duplicate edges are dropped by default (`dedupEdges` —
    * a doubled edge double-counts its neighbor's vote; set false only
    * when distinctness is guaranteed, e.g. a symmetrized union of an
    * already-distinct parity-disjoint half). Node ids must be
    * integral. */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 4,
      dedupEdges: Boolean = true,
      noSinkNodes: Boolean = false,
      checkpointEvery: Int = 1): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      "iterations must be in [1, 64]")
    require(checkpointEvery >= 1, "checkpointEvery must be at least 1")

    val e = {
      val e0 = edges
        .select(col(srcCol).cast("long").as("__src"),
          col(dstCol).cast("long").as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull)
      (if (dedupEdges) e0.distinct() else e0).localCheckpoint(true)
    }
    // the node list is consumed only by the per-iteration sink-node
    // left join (iteration 1's self-label start folds into an edge
    // aggregate below); with noSinkNodes it never builds at all
    lazy val nodes = e.select(col("__src").as("id"))
      .union(e.select(col("__dst").as("id")))
      .distinct()
      .localCheckpoint(true)

    var labels: DataFrame = null // iteration 1 folds the self-label start
    var prev: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iterations) {
      // Iteration 1 over self-labels needs no join: every neighbor
      // votes its OWN id (lbl(dst) = dst at the start), so the vote
      // relation is just the edge rows themselves — duplicate-edge
      // multiplicity still counts exactly as the joined spelling would
      // (the doubled-vote semantics the spec pins for
      // dedupEdges = false). The |E| join against the start frame and
      // the start frame itself fold away.
      val votes =
        if (i == 1) e.groupBy(col("__src"), col("__dst").as("lbl"))
          .agg(count(lit(1)).as("__c"))
        else labels.join(e, col("id") === col("__dst"))
          .groupBy(col("__src"), col("lbl"))
          .agg(count(lit(1)).as("__c"))
      // argmax by (count desc, label asc) as one struct-min aggregate —
      // no per-node window, no rank pass
      val upd = votes.groupBy(col("__src"))
        .agg(min(struct((-col("__c")).as("nc"), col("lbl").as("l")))
          .as("__m"))
        .select(col("__src").as("id"), col("__m.l").as("__new"))
      // sink nodes (no out-edges) keep their current label; at i == 1
      // that current label is the self-label, spelled directly
      val step = (if (noSinkNodes) upd.select(col("id"), col("__new"))
        else if (i == 1) nodes.join(upd, Seq("id"), "left")
          .select(col("id"), coalesce(col("__new"), col("id")).as("__new"))
        else labels.join(upd, Seq("id"), "left")
          .select(col("id"), coalesce(col("__new"), col("lbl")).as("__new")))
        .withColumnRenamed("__new", "lbl")
      val next =
        if (i % checkpointEvery == 0 || i == iterations) {
          val ck = step.localCheckpoint(true)
          prev.foreach(_.unpersist(blocking = false))
          prev = ckRdd(ck)
          ck
        } else step
      labels = next
    }
    // nodes only if it was ever built — forcing the lazy val here
    // would RUN its checkpoint job
    (Seq(e) ++ (if (noSinkNodes) Nil else Seq(nodes)))
      .flatMap(ckRdd).foreach(_.unpersist(blocking = false))
    labels
  }
}
