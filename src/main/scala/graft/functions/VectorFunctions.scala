package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs
  * in the hot path, so whole-stage codegen spans the similarity kernels.
  *
  * Numerics: everything is computed as a sequential left fold in DOUBLE
  * (cast from float32), which is bit-reproducible across engines — the
  * DuckDB oracle computes the identical fold.
  */
object VectorFunctions {

  /** float32 array → double array (exact). */
  /** Cast to array<double> AND narrow element nullability (see
    * [[graft.plans.DenseDoubleArray]]): the one-per-row null scan here
    * is what lets DotProduct skip its per-PAIR null branch in every
    * candidate-join kernel downstream. */
  def toDouble(v: Column): Column =
    graft.plans.DenseDoubleArray(v.cast("array<double>"))

  /** Dot product as a left fold in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; NaN for zero vectors (filter upstream). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Symmetric per-vector int8 quantization: scale by 127/max|x|,
    * round half-away-from-zero. 4x storage reduction for embedding
    * columns; pair with [[dequantize]] (error bounded by
    * max|x|/254 per component). */
  def quantizeInt8(v: Column): Column = {
    val ma = array_max(transform(v, x => abs(x)))
    // tinyint, not int: values are bounded to [-127, 127] by the scale,
    // and 1-byte elements are the entire point (4x narrower than the
    // float32 source) — an int cast would store 4-byte "int8"
    transform(v, x => round(x * 127.0 / ma).cast("byte"))
  }

  /** Inverse of [[quantizeInt8]] given the original max|x| scale. */
  def dequantize(q: Column, maxAbs: Column): Column =
    transform(q, y => y.cast("double") * maxAbs / 127.0)

  /** Deterministic pseudo-random source for the hyperplane-LSH planes
    * (`graft.plans.HyperplaneBucket` generates components in-loop from
    * this, avoiding literal-array codegen blowup). */
  private[graft] object Planes {
    def splitmix64(s0: Long): Long = {
      var z = s0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }
}
