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
  def toDouble(v: Column): Column = v.cast("array<double>")

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

  /** Signed random-hyperplane bits for LSH: bit i = sign(dot(v, plane_i)).
    * Planes are deterministic pseudo-random (seeded splitmix64 per
    * (plane, dim)), materialized as literal arrays so the comparison
    * stays inside codegen.
    */
  def hyperplaneBits(v: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val planes = Planes.generate(dim, nBits, seed)
    array(planes.map { plane =>
      val planeCol = array(plane.map(lit): _*)
      (dot(v, planeCol) >= 0.0).cast("int")
    }: _*)
  }

  /** Pack hyperplane bits into a single long bucket id. */
  def bitsToBucket(bits: Column): Column =
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)

  private[graft] object Planes {
    /** Deterministic N(0,1)-ish plane components via splitmix64 →
      * uniform(-1,1); adequate for sign-LSH (only direction matters). */
    def generate(dim: Int, nBits: Int, seed: Long): Seq[Array[Double]] =
      (0 until nBits).map { p =>
        Array.tabulate(dim) { d =>
          val x = splitmix64(seed + p.toLong * 1000003L + d)
          // map to (-1, 1)
          (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
        }
      }

    def splitmix64(s0: Long): Long = {
      var z = s0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }
}
