package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash primitives for near-duplicate detection: banding/verify as
  * codegen'd Column expressions, signature as a tight Scala kernel
  * (shared by the plan-side `SimHash64Expr` and driver-side tests).
  * MinHash/LSH kernels live in `graft.plans.SketchExpressions`.
  */
object HashFunctions {

  /** Hamming distance between two 64-bit simhashes (codegen'd). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** 16-bit band of a simhash for candidate bucketing: any pair with
    * hamming distance ≤ 3 shares at least one of the 4 bands
    * (pigeonhole). */
  def simhashBand(sim: Column, band: Int): Column =
    shiftright(sim, 16 * band).bitwiseAND(lit(0xffffL))

  // ------------------------------------------------------------- scala side

  /** 64-bit SimHash over a token sequence (splitmix64 token hashes,
    * bit-vote accumulation). Deterministic, allocation-light.
    */
  def simhash64(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = hash64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Deterministic 64-bit string hash (FNV-1a folded through
    * splitmix64's finalizer for avalanche). */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    VectorFunctions.Planes.splitmix64(h)
  }
}
