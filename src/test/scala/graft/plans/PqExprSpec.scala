package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The PQ expression kernels: pq_encode must pick the L2-nearest
  * codeword per subspace (ties to the lowest index), pq_adc_table must
  * tabulate exactly the per-subspace dot products, and both must fail
  * LOUDLY on a dimension mismatch — a silently-truncated code would be
  * a confidently wrong neighbor list. */
class PqExprSpec extends SparkSpec {

  // 2 subspaces × 2 dims; codebooks chosen so nearest codewords are
  // unambiguous except where a tie is planted deliberately
  private val cbs: Array[Array[Array[Double]]] = Array(
    Array(Array(0.0, 0.0), Array(10.0, 10.0)),
    Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(5.0, 5.0)))

  test("pq_encode: per-subspace L2 argmin; ties to the lowest index") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.1, -0.2, 4.0, 4.9)), // sub0 → cw0; sub1 → cw2
      (2L, Seq(9.0, 11.0, 0.9, 0.1)), // sub0 → cw1; sub1 → cw0
      (3L, Seq(0.0, 0.0, 0.5, 0.5))) // sub1 equidistant cw0/cw1 → 0
      .toDF("id", "v")
    val out = df
      .select(col("id"),
        SketchExpressions.pqEncode(col("v"), cbs).as("code"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(1L) === Seq(0, 2))
    assert(out(2L) === Seq(1, 0))
    assert(out(3L) === Seq(0, 0))
  }

  test("pq_adc_table: entry [j*ksub + c] is exactly dot(q_j, cb[j][c]); " +
      "short codebooks zero-pad") {
    import spark.implicits._
    val q = Seq(2.0, 3.0, 1.0, -1.0)
    val out = Seq((1L, q)).toDF("id", "v")
      .select(SketchExpressions.pqAdcTable(col("v"), cbs).as("t"))
      .collect()(0).getSeq[Double](0)
    val ksub = 3 // max codebook size across subspaces
    assert(out.length === 2 * ksub)
    // subspace 0 (q0 = [2,3]): dots with cw0/cw1, then the PAD slot
    assert(out(0) === 0.0 && out(1) === 50.0 && out(2) === 0.0)
    // subspace 1 (q1 = [1,-1])
    assert(out(ksub + 0) === 1.0 && out(ksub + 1) === -1.0 &&
      out(ksub + 2) === 0.0)
  }

  test("dimension mismatch fails loudly in both kernels") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    for (exprCol <- Seq(
        SketchExpressions.pqEncode(col("v"), cbs),
        SketchExpressions.pqAdcTable(col("v"), cbs))) {
      val e = intercept[Exception] {
        bad.select(exprCol).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("codebook dim")), e.toString)
    }
  }
}
