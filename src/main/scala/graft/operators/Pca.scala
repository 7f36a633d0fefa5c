package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding corpus by fixed-iteration
  * power iteration over the CENTERED data — the axis a whitening /
  * anisotropy-removal prep ("all-but-the-top", Mu 2018) subtracts, and
  * the first diagnostic of embedding-space drift between corpus
  * snapshots. The reference runtime expresses iterative numeric jobs
  * as chained MapReduce stages (`job.go`); here each half-step is one
  * Catalyst join + keyed aggregate.
  *
  * INTEGER fixed-point end to end — the [[PageRank]]/[[Hits]]
  * discipline, extended to SIGNED values: components quantize to
  * truncated milli longs, the per-dimension mean is subtracted in
  * exact integer arithmetic, and each matrix–vector product is one
  * equi-join + long-sum aggregate. Long sums are order-independent,
  * so Spark and a DuckDB replay agree bit-for-bit with no rounding
  * step. Signedness is why every division needs TRUNCATING semantics
  * (Spark `div`): DuckDB's `//` floors, so the oracle spells the same
  * division sign-split
  * (`CASE WHEN x >= 0 THEN x // t ELSE -((-x) // t) END`), and the
  * milli quantization goes through `trunc()` (a bare DuckDB CAST
  * would round where Spark's double→long cast truncates).
  *
  * Per-step L∞ normalization (max |component| reads exactly `scale`)
  * keeps the iterate integral — L2 would need a square root. The sign
  * of the returned direction is pinned by the all-ones start vector
  * and the deterministic protocol (an eigenvector is defined up to
  * sign; two engines replaying the same integers land on the same
  * one).
  *
  * Overflow contract (ANSI mode makes violations loud): with
  * `maxAbsMilli = max |centered component| · 1000` (≤ 2 · the raw
  * milli max), the widest intermediates are
  * `|s_i| · scale ≤ dims · maxAbsMilli · scale²` (the score
  * normalization) and `|u_d| · scale ≤ n · maxAbsMilli · scale²`
  * (the direction normalization) — keep both under 2^63. The default
  * `scale = 10^3` and unit-ish embeddings leave headroom to ~10^9
  * vectors; larger corpora pre-aggregate per shard or lower `scale`.
  *
  * Scale shape: the quantized and centered (id, dim, x) frames are
  * each materialized ONCE and reused by every iteration; per
  * iteration the shuffle volume is (n·dims) slim long rows for the
  * two keyed sums — never a gram matrix, never a driver collect.
  * Fixed iteration count keeps the plan finite (the [[Hits]]
  * convergence-sampling contract); 3–5 rounds separate a dominant
  * eigenvalue well, and the gate pins the protocol, not convergence.
  */
object Pca {

  private def ckRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

  /** Fitted state: dims-sized mean frame `mn(d, m)`, centered matrix
    * leaf `xc(id, d, x)`, final direction `v(d, v)` (a lazy
    * normalization over the last checkpointed half-step), and the
    * leaves to release once consumers are materialized. */
  private final case class Fit(mn: DataFrame, xc: DataFrame,
      v: DataFrame, release: Seq[org.apache.spark.rdd.RDD[_]])

  private def fit(df: DataFrame, idCol: String, vecCol: String,
      iterations: Int, scale: Long): Fit = {
    require(iterations >= 1 && iterations <= 64,
      "iterations must be in [1, 64]")
    require(scale > 0, "scale must be positive")

    // quantize: truncated milli (toward zero, matching DuckDB trunc())
    val x0 = df
      .select(col(idCol).cast("long").as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "xf")))
      .filter(col("id").isNotNull && col("xf").isNotNull)
      .select(col("id"), col("d").cast("long").as("d"),
        (col("xf") * 1000d).cast("long").as("x"))
      .localCheckpoint(true) // two consumers: mean agg + centering join

    // exact integer per-dim mean (Spark div truncates toward zero on
    // signed sums — the oracle sign-splits its floor //)
    val mn = x0.groupBy(col("d"))
      .agg(expr("sum(`x`) div count(1)").as("m"))
      .localCheckpoint(true) // dims-sized

    val xc = x0.join(mn, Seq("d"))
      .select(col("id"), col("d"), (col("x") - col("m")).as("x"))
      .localCheckpoint(true) // 2 consumers per iteration + assembly
    ckRdd(x0).foreach(_.unpersist(blocking = false))

    // L∞-normalize a signed (key, raw) frame so max |value| = scale;
    // the max is an in-plan scalar subquery over the checkpointed raw
    // leaf (Hits's normalized() with abs)
    def normalized(raw: DataFrame, kCol: String, vCol: String): DataFrame = {
      val t = graft.plans.Scalars.of(raw.agg(max(abs(col(vCol))).as("t")))
      raw.withColumn("__t", t)
        .select(col(kCol),
          expr(s"(`$vCol` * ${scale}L) div `__t`").as(vCol))
    }

    // per iteration: scores s = Xc·v (one join + id-keyed sum), then
    // direction u = Xcᵀ·s (one join + dim-keyed sum), each normalized
    // lazily over its checkpointed raw leaf (the Hits discipline: raw
    // frames released at their last consumer)
    var v = mn.select(col("d"), lit(scale).as("v"))
    var uRawPrev: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iterations) {
      val sRaw = xc.join(v, Seq("d"))
        .groupBy(col("id")).agg(sum(col("x") * col("v")).as("s"))
        .localCheckpoint(true)
      uRawPrev.foreach(_.unpersist(blocking = false))
      val sn = normalized(sRaw, "id", "s")
      val uRaw = xc.join(sn, Seq("id"))
        .groupBy(col("d")).agg(sum(col("x") * col("s")).as("u"))
        .localCheckpoint(true)
      ckRdd(sRaw).foreach(_.unpersist(blocking = false))
      uRawPrev = ckRdd(uRaw)
      v = normalized(uRaw, "d", "u").withColumnRenamed("u", "v")
    }
    Fit(mn, xc, v, Seq(mn, xc).flatMap(ckRdd) ++ uRawPrev)
  }

  /** `(dim, mean_milli, loading_fp)` — one row per dimension of
    * `vecCol` (a float/double array column, 0-based dims): the
    * truncated-milli per-dimension mean and the fixed-point loading of
    * the top principal direction after `iterations` power-iteration
    * rounds from the all-ones vector. Rows with a null id or vector
    * drop; vectors must share one length and not be all identical
    * (a zero centered matrix has no direction — the normalization
    * divides by max |u| and ANSI mode raises). */
  def topComponent(df: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 4, scale: Long = 1000L): DataFrame = {
    val f = fit(df, idCol, vecCol, iterations, scale)
    val out = f.mn.join(f.v, Seq("d"))
      .select(col("d").as("dim"), col("m").as("mean_milli"),
        col("v").as("loading_fp"))
      .localCheckpoint(true) // dims-sized; releases need it realized
    f.release.foreach(_.unpersist(blocking = false))
    out
  }

  /** "All-but-the-top" application: fit the top direction, then for
    * every vector return its exact fixed-point projection
    * `proj_fp = Σ_d xc_d·v_d` and the EXACT Cauchy–Schwarz residual
    * `resid_sq_fp = (Σ xc²)·(Σ v²) − proj²` — zero iff the vector
    * lies ON the principal axis, and the scaled squared norm of the
    * component the whitening would keep. Pure integers (no square
    * root, no rounding), so the anisotropy profile is bit-exact
    * cross-engine. One extra join + id-keyed aggregate over the
    * already-materialized centered matrix; `Σ v²` rides a
    * dims-bounded scalar subquery. */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 4, scale: Long = 1000L): DataFrame = {
    val f = fit(df, idCol, vecCol, iterations, scale)
    val b = graft.plans.Scalars.of(
      f.v.agg(sum(col("v") * col("v")).as("b")))
    val out = f.xc.join(f.v, Seq("d"))
      .groupBy(col("id"))
      .agg(sum(col("x") * col("v")).as("proj"),
        sum(col("x") * col("x")).as("a2"))
      .select(col("id"), col("proj").as("proj_fp"),
        (col("a2") * b - col("proj") * col("proj")).as("resid_sq_fp"))
      .localCheckpoint(true) // n-sized slim longs; releases need it
    f.release.foreach(_.unpersist(blocking = false))
    out
  }
}
