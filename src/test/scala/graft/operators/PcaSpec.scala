package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Integer fixed-point power iteration (top principal direction +
  * whitening application). Ground truth is an in-test replay of the
  * exact arithmetic — truncated-milli quantization, exact integer
  * centering, long-sum half-steps, signed L∞ normalization by
  * truncating division — the same spelling the q162/q164 DuckDB
  * oracles unroll. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Exact in-memory replay of the operator's integer recurrence.
    * Returns (mean per dim, loading per dim, per-id (proj, residSq)). */
  private def brute(vecs: Seq[(Long, Array[Double])], iters: Int,
      scale: Long = 1000L)
      : (Array[Long], Array[Long], Map[Long, (Long, Long)]) = {
    val dims = vecs.head._2.length
    // the df() fixture stores floats: replay the same float rounding,
    // then the operator's double widening + truncating milli cast
    val x = vecs.map { case (id, v) =>
      id -> v.map(d => (d.toFloat.toDouble * 1000d).toLong) }
    val n = x.size
    val mean = Array.tabulate(dims)(d => x.map(_._2(d)).sum / n)
    val xc = x.map { case (id, v) =>
      id -> Array.tabulate(dims)(d => v(d) - mean(d)) }
    def norm(m: Seq[Long]): Seq[Long] = {
      val t = m.map(math.abs).max
      m.map(v => v * scale / t) // Java / truncates toward zero
    }
    var v = Array.fill(dims)(scale).toSeq
    for (_ <- 1 to iters) {
      val s = xc.map { case (_, r) =>
        (0 until dims).map(d => r(d) * v(d)).sum }
      val sn = norm(s)
      v = norm((0 until dims).map(d =>
        xc.indices.map(i => xc(i)._2(d) * sn(i)).sum))
    }
    val b = v.map(c => c * c).sum
    val w = xc.map { case (id, r) =>
      val proj = (0 until dims).map(d => r(d) * v(d)).sum
      val a2 = r.map(c => c * c).sum
      id -> (proj, a2 * b - proj * proj)
    }.toMap
    (mean, v.toArray, w)
  }

  private def df(vecs: Seq[(Long, Array[Double])]) =
    vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

  test("hand case: direction aligns with the dominant axis and " +
      "matches the integer replay bit for bit") {
    // spread 10x wider along dim 1 than dim 0
    val vecs = Seq[(Long, Array[Double])](
      1L -> Array(0.01, 0.50), 2L -> Array(-0.02, -0.48),
      3L -> Array(0.03, 0.33), 4L -> Array(-0.01, -0.35),
      5L -> Array(0.02, 0.11))
    val (mean, loading, _) = brute(vecs, iters = 3)
    val got = Pca.topComponent(df(vecs), "vec_id", "embedding",
      iterations = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === (0 until 2).map(d =>
      d.toLong -> (mean(d), loading(d))).toMap)
    // the dominant axis carries the L-infinity pin
    assert(math.abs(got(1L)._2) === 1000L)
    assert(math.abs(got(0L)._2) < 200L)
  }

  test("seeded random: operator equals the integer replay exactly " +
      "(signed values, 4 iterations)") {
    val rnd = new Random(42)
    val vecs = (1L to 60L).map { id =>
      // dominant direction (1, 1, 0, ...) + noise
      val t = rnd.nextGaussian()
      id -> Array.tabulate(8)(d =>
        (if (d < 2) t * 0.4 else 0.0) + rnd.nextGaussian() * 0.05)
    }
    val (mean, loading, wexp) = brute(vecs, iters = 4)
    val gotDir = Pca.topComponent(df(vecs), "vec_id", "embedding",
      iterations = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotDir === (0 until 8).map(d =>
      d.toLong -> (mean(d), loading(d))).toMap)
    val gotW = Pca.whiten(df(vecs), "vec_id", "embedding",
      iterations = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotW === wexp)
    // Cauchy-Schwarz: residuals are never negative
    assert(gotW.values.forall(_._2 >= 0L))
  }

  test("convergence sanity: 4 fixed-point rounds land within 2 deg of " +
      "the double-precision eigenvector on anisotropic data") {
    val rnd = new Random(7)
    val axis = Array(0.6, -0.8, 0.0, 0.0)
    val vecs = (1L to 200L).map { id =>
      val t = rnd.nextGaussian() * 0.5
      id -> Array.tabulate(4)(d => axis(d) * t + rnd.nextGaussian() * 0.02)
    }
    // double-precision reference: 50 power-iteration rounds, centered
    val n = vecs.size
    val mean = Array.tabulate(4)(d => vecs.map(_._2(d)).sum / n)
    val xc = vecs.map(v => Array.tabulate(4)(d => v._2(d) - mean(d)))
    var ref = Array.fill(4)(1.0)
    for (_ <- 1 to 50) {
      val s = xc.map(r => (0 until 4).map(d => r(d) * ref(d)).sum)
      val u = Array.tabulate(4)(d =>
        xc.indices.map(i => xc(i)(d) * s(i)).sum)
      val nrm = math.sqrt(u.map(c => c * c).sum)
      ref = u.map(_ / nrm)
    }
    val got = Pca.topComponent(df(vecs), "vec_id", "embedding",
      iterations = 4).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(2)).toMap
    val g = Array.tabulate(4)(d => got(d).toDouble)
    val cos = math.abs(
      (0 until 4).map(d => g(d) * ref(d)).sum /
        (math.sqrt(g.map(c => c * c).sum) *
         math.sqrt(ref.map(c => c * c).sum)))
    assert(cos > 0.9994, s"cosine to true eigenvector was $cos")
  }

  test("axis-aligned vector has zero residual; orthogonal vector " +
      "keeps its full norm") {
    // dominant axis = dim 0 exactly; ids 1-4 sit ON it, id 5 off-axis
    val vecs = Seq[(Long, Array[Double])](
      1L -> Array(0.4, 0.0), 2L -> Array(-0.4, 0.0),
      3L -> Array(0.2, 0.0), 4L -> Array(-0.2, 0.0),
      5L -> Array(0.0, 0.002))
    val got = Pca.whiten(df(vecs), "vec_id", "embedding",
      iterations = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // mean is (0, ~0): on-axis vectors project with zero residual
    assert(got(1L)._2 === 0L)
    assert(got(2L)._2 === 0L)
    // the off-axis vector's projection onto the dim-0 direction is 0
    assert(got(5L)._1 === 0L)
    assert(got(5L)._2 > 0L)
  }

  test("null ids and null vectors drop; floats quantize by truncation " +
      "toward zero") {
    val rows = Seq[(java.lang.Long, Array[java.lang.Float])](
      (1L, Array[java.lang.Float](0.0019f, 0.5f)),
      (2L, Array[java.lang.Float](-0.0019f, -0.5f)),
      (null, Array[java.lang.Float](9f, 9f)),
      (3L, null))
    val got = Pca.topComponent(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      iterations = 2).collect()
    // only ids 1 and 2 contribute: mean of (+1, -1) milli is 0 —
    // 0.0019 truncates to 1 milli on both signs' magnitudes
    assert(got.length === 2)
    val mean = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mean(0L) === 0L && mean(1L) === 0L)
  }
}
