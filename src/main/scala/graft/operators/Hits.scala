package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (Kleinberg 1999) over a directed edge list —
  * hub and authority scoring, the two-sided complement of
  * [[PageRank]]'s one-sided centrality: a good hub points at good
  * authorities, a good authority is pointed at by good hubs. On
  * bipartite interaction graphs (customer→supplier, doc→domain,
  * query→document) the two sides get separately meaningful scores —
  * which PageRank, mixing both into one walk, cannot give.
  *
  * INTEGER arithmetic throughout, the [[PageRank]] discipline: scores
  * are fixed-point longs, each half-step is one equi-join + one keyed
  * long sum, and the per-iteration L∞ normalization (HITS is defined
  * up to normalization; L2 would need a square root, and L1 would
  * smear `scale` across the whole side, collapsing per-node integer
  * precision to scale/|V|) is `score * scale div max` with the max an
  * in-plan scalar subquery — each side's top node reads exactly
  * `scale`. Long sums and integer division are order-independent, so
  * two engines agree bit-for-bit.
  *
  * Overflow contract (ANSI mode makes violations loud): after each
  * normalization every score is ≤ scale, so the widest intermediate
  * is `raw · scale ≤ maxdeg · scale²` — keep that under 2^63; the
  * default `scale = 10^6` leaves ~9·10^6 of max-degree headroom. Node
  * ids must be integral.
  *
  * Scale shape: edges materialized once; per half-step shuffle volume
  * is |E| slim rows; eager checkpoint + release per iteration
  * ([[PageRank]]'s loop discipline); nothing collected. */
object Hits {

  private def ckRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

  /** `(id, hub, authority)` — hubs are the distinct src endpoints
    * (authority 0 unless also a dst), authorities the distinct dst
    * endpoints. `iterations` full rounds (authority half-step then hub
    * half-step, synchronous), from a uniform `scale` start, each side
    * L1-normalized to `scale` after its half-step. Duplicate edges are
    * dropped by default (a doubled edge double-counts; `dedupEdges =
    * false` when distinctness is guaranteed). Null endpoints drop. */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, scale: Long = 1000000L,
      dedupEdges: Boolean = true): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      "iterations must be in [1, 64]")
    require(scale > 0, "scale must be positive")

    val e = {
      val e0 = edges
        .select(col(srcCol).cast("long").as("__src"),
          col(dstCol).cast("long").as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull)
      (if (dedupEdges) e0.distinct() else e0).localCheckpoint(true)
    }
    val hubs = e.select(col("__src").as("id")).distinct()
      .localCheckpoint(true)
    val auths = e.select(col("__dst").as("id")).distinct()
      .localCheckpoint(true)

    /** L∞-normalize a positive (id, raw) frame to max = scale. The max
      * is an in-plan scalar subquery over the SAME frame — raw is a
      * checkpointed leaf, so the two consumers are cheap re-reads.
      * Attached as a named column so the division can be spelled `div`
      * (INTEGER division — `/` on longs is double division, which goes
      * precision-lossy past 2^53 and would break cross-engine parity). */
    def normalized(raw: DataFrame, vCol: String): DataFrame = {
      val t = graft.plans.Scalars.of(raw.agg(max(col(vCol)).as("t")))
      raw.withColumn("__t", t)
        .select(col("id"),
          expr(s"(`$vCol` * ${scale}L) div `__t`").as(vCol))
    }

    // Only the RAW half-step aggregates are checkpointed; each
    // normalized frame stays a lazy narrow projection over its raw
    // leaf (its consumers — the next half-step join, and the final
    // assembly — re-run one cheap select + one tiny scalar stage
    // instead of paying a second materialization job per half-step).
    // A raw frame is released as soon as its LAST consumer is
    // materialized: hRaw_{i−1} feeds only aRaw_i, and aRaw_i feeds
    // only hRaw_i (plus, on the final iteration, the assembly below).
    var h = hubs.select(col("id"), lit(scale).as("h"))
    var a: DataFrame = null
    var aRawPrev: Option[org.apache.spark.rdd.RDD[_]] = None
    var hRawPrev: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iterations) {
      val aRaw = h.join(e, col("id") === col("__src"))
        .groupBy(col("__dst")).agg(sum(col("h")).as("a"))
        .select(col("__dst").as("id"), col("a"))
        .localCheckpoint(true)
      hRawPrev.foreach(_.unpersist(blocking = false))
      a = normalized(aRaw, "a")
      val hRaw = a.join(e, col("id") === col("__dst"))
        .groupBy(col("__src")).agg(sum(col("a")).as("h"))
        .select(col("__src").as("id"), col("h"))
        .localCheckpoint(true)
      if (i < iterations) ckRdd(aRaw).foreach(_.unpersist(blocking = false))
      else aRawPrev = ckRdd(aRaw)
      hRawPrev = ckRdd(hRaw)
      h = normalized(hRaw, "h")
    }
    // assemble (id, hub, authority); a node can be on both sides. The
    // returned frame must be a LEAF (it references hubs/auths and the
    // final half-step checkpoints, all released below), so it
    // checkpoints too — node-sized by construction.
    val out = hubs.select(col("id")).union(auths.select(col("id")))
      .distinct()
      .join(h.select(col("id"), col("h")), Seq("id"), "left")
      .join(a.select(col("id"), col("a")), Seq("id"), "left")
      .select(col("id"), coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("authority"))
      .localCheckpoint(true)
    (Seq(e, hubs, auths).flatMap(ckRdd) ++ aRawPrev ++ hRawPrev)
      .foreach(_.unpersist(blocking = false))
    out
  }
}
