package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch primitives for near-duplicate detection: MinHash
  * signatures + LSH banding (pure Column expressions, codegen'd) and
  * 64-bit SimHash (tight Scala kernel used via typed map — per-doc
  * O(tokens), no shuffle).
  */
object HashFunctions {

  /** k-permutation MinHash signature over a shingle array: element i is
    * min over shingles of xxhash64(i, shingle). Stays inside whole-stage
    * codegen (xxhash64/transform/array_min are built-ins).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band keys: hash of each r-row slice of the signature. Docs
    * sharing ANY band key are near-dup candidates. Returns
    * array<struct<band:int, key:bigint>> ready to explode + group. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(lit(b), concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, rowsPerBand),
            _.cast("string")))).as("key"))
    }: _*)

  /** Estimated Jaccard from two signatures: fraction of agreeing mins. */
  def signatureSimilarity(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => (x === y).cast("int")),
      v => v === 1)).cast("double") / size(a)

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
