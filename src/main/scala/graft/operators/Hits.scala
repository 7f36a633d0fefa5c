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
    // hubs is consumed twice (the final assembly; the uniform start is
    // folded into iteration 1 below), auths once (the assembly) — both
    // are cheap distinct projections over the cached edge leaf, so
    // neither pays an eager checkpoint JOB: hubs lazily checkpoints on
    // its first consumer's pass, auths stays a plain lazy frame (its
    // one consumer, the assembly, checkpoints eagerly before `e` is
    // released).
    val hubs = e.select(col("__src").as("id")).distinct()
      .localCheckpoint(false)
    val auths = e.select(col("__dst").as("id")).distinct()

    /** Materialize a raw half-step AND compute its L∞ max in ONE job:
      * the lazy local checkpoint persists during the max-aggregate's
      * own pass (the ConnectedComponents signature discipline), so the
      * per-half-step eager-checkpoint job and the normalization's
      * scalar-subquery job (re-run per consumer execution) both fold
      * into a single action. The max is a driver LITERAL thereafter —
      * bit-identical to the scalar subquery it replaces (same
      * aggregate over the same frame), and the division stays `div`
      * (INTEGER division — `/` on longs is double division, which goes
      * precision-lossy past 2^53 and would break cross-engine parity). */
    def materializedNorm(raw0: DataFrame, vCol: String)
        : (DataFrame, DataFrame) = {
      val raw = raw0.localCheckpoint(false)
      val row = raw.agg(max(col(vCol)).as("t")).head()
      // an empty side (no edges) normalizes an empty frame — the
      // divisor value is then irrelevant; 1 keeps the expression total
      val t = if (row.isNullAt(0)) 1L else row.getLong(0)
      (raw, raw.select(col("id"),
        expr(s"(`$vCol` * ${scale}L) div ${t}L").as(vCol)))
    }

    // A raw frame is released as soon as its LAST consumer is
    // materialized: hRaw_{i−1} feeds only aRaw_i, and aRaw_i feeds
    // only hRaw_i (plus, on the final iteration, the assembly below).
    var h: DataFrame = null
    var a: DataFrame = null
    var aRawPrev: Option[org.apache.spark.rdd.RDD[_]] = None
    var hRawPrev: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iterations) {
      // iteration 1's authority half-step over the uniform start
      // (h = scale for every hub) is a pure edge aggregate: each dst
      // receives scale per distinct in-edge, so the |E| join against
      // the start frame is provably sum(h) = scale * indegree — the
      // edge set is distinct by contract (dedupEdges, or the caller's
      // guarantee). raw ≤ maxdeg·scale, inside the overflow contract.
      val aStep =
        if (i == 1) e.groupBy(col("__dst"))
          .agg((count(lit(1)) * scale).as("a"))
          .select(col("__dst").as("id"), col("a"))
        else h.join(e, col("id") === col("__src"))
          .groupBy(col("__dst")).agg(sum(col("h")).as("a"))
          .select(col("__dst").as("id"), col("a"))
      val (aRaw, aNorm) = materializedNorm(aStep, "a")
      hRawPrev.foreach(_.unpersist(blocking = false))
      a = aNorm
      val (hRaw, hNorm) = materializedNorm(
        a.join(e, col("id") === col("__dst"))
          .groupBy(col("__src")).agg(sum(col("a")).as("h"))
          .select(col("__src").as("id"), col("h")), "h")
      if (i < iterations) ckRdd(aRaw).foreach(_.unpersist(blocking = false))
      else aRawPrev = ckRdd(aRaw)
      hRawPrev = ckRdd(hRaw)
      h = hNorm
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
    // auths is a plain projection over `e` (never checkpointed), so
    // only e, hubs and the final half-step leaves hold blocks
    (Seq(e, hubs).flatMap(ckRdd) ++ aRawPrev ++ hRawPrev)
      .foreach(_.unpersist(blocking = false))
    out
  }
}
