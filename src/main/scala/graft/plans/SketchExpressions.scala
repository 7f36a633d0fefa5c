package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compact native kernels for the sketch operators.
  *
  * Why not higher-order-function Column trees: a k=32 MinHash written as
  * 32 × `array_min(transform(...))` (or an LSH bucket as nBits ×
  * literal-array dot products) generates thousands of lines of Java per
  * projection — Janino + C2 compilation then dominates wall-clock and
  * poisons the whole session's JIT code cache (measured: 30-150 s
  * per-query stalls at sf0.1). These expressions are deliberately
  * `CodegenFallback`: one small interpreted node whose eval is a tight
  * Scala loop — per-row cost is the loop itself, compilation cost is
  * zero. The surrounding plan still whole-stage-codegens.
  */

/** MinHash signature: for element hash h, the i-th permutation is
  * g_i = h1 + i·h2 (standard double-hashing construction); output is
  * the k per-permutation minima as array<long>.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // empty shingle sets have NO signature: returning the constant
  // all-MaxValue array would give every empty document identical band
  // keys — the degenerate all-pairs join MinHashBandKeys exists to
  // prevent. NULL drops them from candidate generation instead.
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var nonNull = 0
    var c = 0
    while (c < n) { if (!arr.isNullAt(c)) nonNull += 1; c += 1 }
    if (nonNull == 0) return null
    var j = 0
    while (j < n) {
      // null shingles contribute nothing (SQL callers can pass arrays
      // with null slots; dereferencing one would NPE)
      val s = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
      if (s != null) {
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 1L) | 1L
        var i = 0
        var g = h1
        while (i < k) {
          if (g < mins(i)) mins(i) = g
          g += h2
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** LSH band keys over a MinHash signature: the signature is cut into
  * `bands` equal slices; each slice is folded into one 64-bit key
  * (xxhash-chained), returned as array<long> indexed by band. Pairs
  * sharing any (band, key) are near-dup candidates.
  */
case class MinHashBandKeys(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(bands > 0, "bands must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // nullable ELEMENTS are accepted at analysis — array<bigint> read
    // back from parquet/DDL tables defaults to containsNull=true even
    // when the data has no nulls, and static rejection would lock those
    // stored signature columns out of the graft_* SQL surface. An
    // ACTUAL null slot still fails loudly per row below (same policy as
    // hyperplane_bucket): ArrayData.getLong would silently hash it as 0.
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys expects array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val mayHaveNullElements: Boolean =
    child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    }

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val n = sig.numElements()
    if (mayHaveNullElements) {
      var z = 0
      while (z < n) {
        if (sig.isNullAt(z))
          throw new IllegalArgumentException(
            s"minhash_band_keys: null signature slot at index $z")
        z += 1
      }
    }
    // silent truncation here would weaken the LSH (ignored signature
    // tail), and bands > n would make EVERY document's band keys a
    // constant — the downstream candidate join then degenerates to a
    // full corpus cross product
    if (n % bands != 0)
      throw new IllegalArgumentException(
        s"minhash_band_keys: bands=$bands must divide signature length=$n")
    val r = n / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashLong(b.toLong, 42L)
      var i = b * r
      val end = i + r
      while (i < end) {
        h = XXH64.hashLong(sig.getLong(i), h)
        i += 1
      }
      keys(b) = h
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression): MinHashBandKeys =
    copy(child = c)
  override def prettyName: String = "minhash_band_keys"
}

/** Random-hyperplane LSH bucket: sign bits of `nBits` dot products with
  * deterministic pseudo-random planes (splitmix64 per (seed, plane,
  * dim) — planes are generated in-loop, no literal arrays, no codegen
  * blowup), packed into a long.
  */
case class HyperplaneBucket(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  // nBits <= 0 would put EVERY vector in bucket 0 (the bucketed join
  // degenerates to a cross product); > 64 silently overflows the long
  require(nBits > 0 && nBits <= 64,
    s"hyperplane_bucket: nBits must be in 1..64, got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  private def planeComponent(p: Int, d: Int): Double = {
    val x = graft.functions.VectorFunctions.Planes
      .splitmix64(seed + p.toLong * 1000003L + d)
    (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var bucket = 0L
    // null components would silently read as 0 and bucket the vector
    // wrong — surface the data bug instead
    var d0 = 0
    while (d0 < dim) {
      if (v.isNullAt(d0))
        throw new IllegalArgumentException(
          s"hyperplane_bucket: null vector component at index $d0")
      d0 += 1
    }
    var p = 0
    while (p < nBits) {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += v.getDouble(d) * planeComponent(p, d)
        d += 1
      }
      bucket = bucket * 2 + (if (acc >= 0.0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
    copy(child = c)
  override def prettyName: String = "hyperplane_bucket"
}

/** Nearest-centroid probe list for IVF: cosine against each centroid
  * (the model rides inside the expression — nCells × dim doubles, tiny),
  * returning the `nProbe` cell ids ordered by similarity desc.
  */
case class NearestCells(
    child: Expression,
    centroids: Array[Array[Double]],
    nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    // loud guards (same policy as HyperplaneBucket): a dimension
    // mismatch against the centroid model or a null component would
    // otherwise score a silently-wrong partial cosine
    var g = 0
    while (g < dim) {
      if (v.isNullAt(g))
        throw new IllegalArgumentException(
          s"nearest_cells: null vector component at index $g")
      g += 1
    }
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length != dim)
        throw new IllegalArgumentException(
          s"nearest_cells: vector dim $dim != centroid dim ${cent.length}")
      var acc = 0.0
      var vn = 0.0
      var d = 0
      val n = dim
      while (d < n) {
        val x = v.getDouble(d)
        acc += x * cent(d)
        vn += x * x
        d += 1
      }
      sims(c) = if (vn == 0.0 || centroidNorms(c) == 0.0) -2.0
        else acc / (math.sqrt(vn) * centroidNorms(c))
      c += 1
    }
    val order = sims.zipWithIndex.sortBy { case (s, i) => (-s, i) }
      .take(math.min(nProbe, sims.length)).map(_._2)
    new GenericArrayData(order)
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
  override def prettyName: String = "nearest_cells"
}

/** BPE subword segmentation with a learned merge table: whitespace
  * tokens are split to code-point symbols and the merges replay in
  * rank order (the training-time loop, via the SHARED
  * `TextFunctions.bpeMergePair` primitive — encoder and trainer
  * cannot disagree). Output: the document's subword units in order;
  * concatenating a token's units always reproduces the token. The
  * merge table rides the expression as a literal model (same contract
  * as [[NearestCells]]/[[PqEncode]]).
  */
case class BpeEncodeExpr(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // the merge table is immutable for the expression's life; converting
  // it per TOKEN (it is consulted once per token of every row) showed up
  // as avoidable allocation on the hot eval path. @transient: rebuilt
  // lazily after task-side deserialization.
  @transient private lazy val mergeSeq: Seq[(String, String)] = merges.toSeq

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < toks.length) {
      graft.functions.TextFunctions.bpeSegmentToken(toks(i), mergeSeq)
        .foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
  override def prettyName: String = "bpe_encode"
}

/** Product-quantization encoder (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the vector is split
  * into `codebooks.length` contiguous subspaces and each subvector is
  * mapped to the index of its L2-NEAREST sub-centroid (ties to the
  * lowest index). Output is the m-byte-class code array — the 32×
  * compressed representation that shuffles and stores in place of the
  * raw vector at scale. The codebook rides the expression as a
  * literal model (m × ksub × dsub doubles — model-sized, same
  * contract as [[NearestCells]]'s centroids).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: empty codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val dim: Int = codebooks.map(_.head.length).sum

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim ${v.numElements()} != codebook dim $dim")
    val m = codebooks.length
    val codes = new Array[Any](m)
    var off = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val x = v.getDouble(off + d) - cent(d)
          d2 += x * x
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** ADC (asymmetric-distance) lookup table for one QUERY vector: entry
  * [j·ksub + c] is dot(q_j, codebooks[j][c]). Computed once per query
  * row — O(dim·ksub) — so scoring a candidate from its PQ code is an
  * O(m) table walk instead of an O(dim) dot product; this is the
  * classic IVFADC split of per-query and per-pair cost. */
case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_adc_table: empty codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val dim: Int = codebooks.map(_.head.length).sum
  @transient private lazy val ksub: Int = codebooks.map(_.length).max

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_adc_table: vector dim ${v.numElements()} != codebook dim $dim")
    val m = codebooks.length
    val out = new Array[Any](m * ksub)
    var off = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        if (c < cb.length) {
          val cent = cb(c)
          var d = 0
          while (d < dsub) { acc += v.getDouble(off + d) * cent(d); d += 1 }
        }
        out(j * ksub + c) = acc
        c += 1
      }
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqAdcTable =
    copy(child = c)
  override def prettyName: String = "pq_adc_table"
}

/** 64-bit SimHash of a document: whitespace-tokenize, per-token 64-bit
  * hash, per-bit majority vote. Delegates to the same Scala kernel the
  * specs use as ground truth (`HashFunctions.simhash64` over
  * `text.split(' ')`), so the plan-side and driver-side signatures are
  * bit-identical by construction.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    graft.functions.HashFunctions.simhash64(
      input.asInstanceOf[UTF8String].toString.split(' '))

  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm): hash every k-gram of the character stream
  * with a rolling hash, slide a window of `w` consecutive k-gram
  * hashes, and select each window's minimum (rightmost on ties).
  * Output: the distinct selected hashes as array<long>.
  *
  * Guarantee: any substring match of length >= w + k - 1 between two
  * documents yields at least one shared fingerprint, while the expected
  * density of selected hashes is 2/(w+1) — a tunable, position-
  * independent sketch for plagiarism/near-dup detection at corpus
  * scale (the downstream join is the same inverted-index equi-join as
  * the other dedup families).
  */
case class WinnowingFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // polynomial rolling hash over chars, finalized through splitmix64
    // so window minima are uniformly distributed
    val B = 1000003L
    var pow = 1L
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    val grams = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    grams(0) = graft.functions.VectorFunctions.Planes.splitmix64(h)
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      grams(i) = graft.functions.VectorFunctions.Planes.splitmix64(h)
      i += 1
    }
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    if (n <= w) {
      // shorter than one window: select the global min (rightmost tie)
      var best = 0
      var j = 1
      while (j < n) { if (grams(j) <= grams(best)) best = j; j += 1 }
      selected.add(grams(best))
    } else {
      // sliding-window minimum via monotonic deque: O(n) total. Each
      // index is pushed/popped at most once; popping `>=` from the back
      // makes the rightmost of tied minima win, matching the `<=` scan
      // this replaces.
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0
      var j = 0
      var start = 0
      while (start + w <= n) {
        val end = start + w
        while (j < end) {
          while (tail > head && grams(dq(tail - 1)) >= grams(j)) tail -= 1
          dq(tail) = j
          tail += 1
          j += 1
        }
        while (dq(head) < start) head += 1
        selected.add(grams(dq(head)))
        start += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowingFingerprint =
    copy(child = c)
  override def prettyName: String = "winnow_fingerprint"
}

object SketchExpressions {
  def minhashSig(shingles: Column, k: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(shingles), k))

  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(
      WinnowingFingerprint(GraftSqlBridge.expression(text), k, w))

  def simhash64(text: Column): Column =
    GraftSqlBridge.column(SimHash64Expr(GraftSqlBridge.expression(text)))

  def minhashBandKeys(sig: Column, bands: Int): Column =
    GraftSqlBridge.column(MinHashBandKeys(GraftSqlBridge.expression(sig), bands))

  def hyperplaneBucket(vec: Column, nBits: Int, seed: Long): Column =
    GraftSqlBridge.column(HyperplaneBucket(GraftSqlBridge.expression(vec), nBits, seed))

  def nearestCells(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    GraftSqlBridge.column(NearestCells(GraftSqlBridge.expression(vec), centroids, nProbe))

  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(vec), codebooks))

  def bpeEncode(text: Column, merges: Array[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncodeExpr(GraftSqlBridge.expression(text), merges))

  def pqAdcTable(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqAdcTable(GraftSqlBridge.expression(vec), codebooks))

  def wordShingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShinglesExpr(GraftSqlBridge.expression(text), n))

  def charShingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(CharShinglesExpr(GraftSqlBridge.expression(text), n))

  def wordNgrams(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordNgramsExpr(GraftSqlBridge.expression(text), n))

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def gumbelKey(id: Column, seed: Long): Column =
    GraftSqlBridge.column(GumbelKeyExpr(GraftSqlBridge.expression(id), seed))

  def misraGries(value: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGriesAgg(GraftSqlBridge.expression(value), k)
        .toAggregateExpression())
}

/** Distinct word n-gram shingles in first-occurrence order. The HOF
  * formulation (`transform(sequence(...), i => concat_ws(slice(split(
  * text), ...)))`) re-evaluates the full `split` for every element —
  * O(len²) interpreted eval per document, the dominant cost of the
  * dedup pipeline at sf0.1. Here: one split, one pass, one set.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    // match Spark's split(text, " ") semantics (regex split, limit -1)
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var idx = 0
      while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** ALL word n-grams in positional order, duplicates KEPT — the
  * multiset twin of [[WordShinglesExpr]], for operators where the
  * repetition structure IS the signal (Gopher-style repetition quality
  * scoring counts how often each n-gram recurs within a document; a
  * distinct set would erase exactly what it measures). Same single-
  * split single-pass shape, no set, O(len · n) per document.
  */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordNgramsExpr =
    copy(child = c)
  override def prettyName: String = "word_ngrams"
}

/** Distinct character n-gram shingles in first-occurrence order —
  * tokenization for unsegmented scripts (CJK etc.). The HOF
  * formulation (`transform(sequence(0, len-n), i => substr(i+1, n))`)
  * re-scans the string from byte 0 on EVERY `substr` call — UTF-8
  * character indexing is O(position) for non-ASCII text, so shingling
  * a CJK document that way is O(len²). Here: decode code points once,
  * slide a window, one set. Code-point windows match both Spark's
  * `substr` and the DuckDB oracle's `text[i+1:i+n]` slicing.
  */
case class CharShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val m = cps.length - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](m * 2)
      var i = 0
      while (i < m) {
        seen.add(new String(cps, i, n))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var idx = 0
      while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): CharShinglesExpr =
    copy(child = c)
  override def prettyName: String = "char_shingles"
}

/** |A ∩ B| for two ascending-sorted long arrays via a two-pointer
  * merge: O(|A| + |B|) with zero per-row allocation. The built-in
  * `size(array_intersect(a, b))` builds a hash set per evaluation —
  * on a verify stage scoring hundreds of thousands of candidate pairs
  * against per-doc sketch arrays, the merge is the difference between
  * the verify being compute-bound and allocation-bound. Inputs MUST be
  * sorted (callers build them with `sort_array(collect_list(...))`);
  * duplicate-free inputs make the count a true set intersection size.
  *
  * Unlike the sketch kernels above (CodegenFallback to keep Janino
  * away from k-scaled expression trees), this one has real codegen
  * (like [[DotProduct]]): it is the per-pair inner loop of EVERY dedup
  * verify stage, its generated form is a fixed ~15 lines regardless of
  * input size, and staying inside whole-stage codegen removes the last
  * interpreted hop from the hottest path.
  *
  * Nullable ELEMENT types are accepted (parquet/DDL `array<bigint>`
  * defaults to containsNull=true even for null-free data); an actual
  * null slot fails loudly per row — `getLong` would silently read it
  * as 0 and corrupt the count.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<bigint>, " +
          s"got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  // static per plan (lazy: don't re-derive per interpreted row): skip
  // the per-element null branch entirely when both input types
  // guarantee null-free elements (the internal dedup path —
  // collect_list never emits null slots)
  @transient private lazy val mayHaveNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (mayHaveNullElements) {
      // identical message to the generated guard in doGenCode — the
      // two paths must report the same defect the same way
      var z = 0
      while (z < nx) {
        if (x.isNullAt(z)) throw new IllegalArgumentException(
          s"sorted_intersect_count: null array element at index $z")
        z += 1
      }
      z = 0
      while (z < ny) {
        if (y.isNullAt(z)) throw new IllegalArgumentException(
          s"sorted_intersect_count: null array element at index $z")
        z += 1
      }
    }
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val z = ctx.freshName("z")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val err = "\"sorted_intersect_count: null array element at index \""
      val nullGuard = if (mayHaveNullElements) {
        s"""
           |for (int $z = 0; $z < $nx; $z++) {
           |  if ($a.isNullAt($z))
           |    throw new IllegalArgumentException($err + $z);
           |}
           |for (int $z = 0; $z < $ny; $z++) {
           |  if ($b.isNullAt($z))
           |    throw new IllegalArgumentException($err + $z);
           |}
         """.stripMargin
      } else ""
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |$nullGuard
         |int $i = 0;
         |int $j = 0;
         |long ${ev.value}_c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}_c++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = ${ev.value}_c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}

/** Efraimidis–Spirakis weighted-sampling key in pure hex string space —
  * the SQL twin of `operators.Sampling.weightedTake`'s per-row key:
  * min over j in 1..w of md5(key ':' j), where
  * w = clamp(round(weight), 1, maxWeight). The minimum of w iid
  * uniforms is Beta(1, w)-distributed, so `ORDER BY` this key
  * ascending `LIMIT k` IS the ES u^(1/w) weighted sample without
  * replacement — computed without float pow/ln whose last-ulp engine
  * differences could flip a rank. Fractional weights round half-up
  * (truncation would bias a 2.9 weight a full replica down); weights
  * above `maxWeight` saturate (bounded per-row work, documented
  * contract). Byte-identical to the Column spelling
  * `array_min(transform(sequence(1, w), j -> md5(concat(key, ':', j))))`
  * and to DuckDB's `list_min(list_transform(generate_series(...)))`
  * realization — all three hash the same UTF-8 bytes.
  */
case class SampleKeyExpr(key: Expression, weight: Expression, maxWeight: Int)
    extends BinaryExpression with CodegenFallback {
  require(maxWeight >= 1, "maxWeight must be at least 1")

  override def left: Expression = key
  override def right: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, weight.dataType) match {
      case (StringType, _: NumericType) => TypeCheckResult.TypeCheckSuccess
      case (k, w) => TypeCheckResult.TypeCheckFailure(
        s"graft_sample_key expects (string, numeric), got " +
          s"(${k.simpleString}, ${w.simpleString})")
    }

  override def dataType: DataType = StringType

  // Explicit null semantics matching the weightedTake Column
  // contract's INTENT (its scaladoc documents why null keys must
  // never be preferred): a NULL key has no content identity and
  // engines disagree on null sort position (Spark nulls-first would
  // ALWAYS select it, DuckDB nulls-last never) — so it maps to the
  // max-hex sentinel, sorting LAST on any engine. Not byte-identical
  // to weightedTake for null keys: weightedTake FILTERS them (k = n
  // still excludes them; LIMIT n here would include them last) — the
  // orderable-expression form cannot drop rows, least-preferred is
  // its closest realization. A NULL weight clamps to 1 replica,
  // exactly like the Column spelling's greatest(1, ...) null skip.
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = key.eval(input)
    if (k == null) return SampleKeyExpr.NullKeySentinel
    val w = weight.eval(input)
    nullSafeEval(k, if (w == null) java.lang.Double.valueOf(1.0) else w)
  }

  override def nullSafeEval(k: Any, w: Any): Any = {
    val keyStr = k.asInstanceOf[UTF8String].toString
    val wd = w match {
      case d: Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
    }
    val reps = math.min(maxWeight.toLong, math.max(1L, math.round(wd)))
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: String = null
    var j = 1L
    while (j <= reps) {
      md.reset()
      val hex = md.digest(s"$keyStr:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (best == null || hex < best) best = hex
      j += 1
    }
    UTF8String.fromString(best)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SampleKeyExpr =
    copy(key = newLeft, weight = newRight)
  override def prettyName: String = "graft_sample_key"
}

object SampleKeyExpr {
  /** Greater than every md5 hex string on any engine — the null-key
    * "never selected" realization. */
  private[plans] val NullKeySentinel: UTF8String =
    UTF8String.fromString("g" * 32)
}

/** Seeded standard-Gumbel noise keyed by a 64-bit row id — the
  * Gumbel-top-k sampling device (adding iid Gumbel(0,1) noise to
  * per-item log-weights and taking the top k draws a weighted sample
  * WITHOUT replacement with inclusion order distributed as the
  * softmax of the weights; Gumbel 1954 / the Gumbel-max trick,
  * public literature — the sampler DSIR-style importance resampling
  * prescribes over log importance weights).
  *
  * Derivation is a pure integer path up to the last two `ln`s, so the
  * draw is deterministic per (id, seed) and reproducible across
  * engines: h = splitmix64(id · 0x9e3779b97f4a7c15 + seed), then
  * u = ((h >>> 11) + 0.5) / 2^53 — strictly inside (0, 1), so neither
  * log can hit 0 or infinity — and g = −ln(−ln(u)). Engine-side float
  * `ln` may differ in the last ulp, which is why oracle-gated
  * consumers round the final (logw + g) key; see
  * [[graft.operators.Dsir.gumbelTopK]].
  */
case class GumbelKeyExpr(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gumbel_key expects bigint id, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val h = graft.functions.VectorFunctions.Planes
      .splitmix64(id * 0x9e3779b97f4a7c15L + seed)
    val u = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0
    -math.log(-math.log(u))
  }

  override protected def withNewChildInternal(c: Expression): GumbelKeyExpr =
    copy(child = c)
  override def prettyName: String = "gumbel_key"
}

/** Misra–Gries heavy-hitter summary as a NATIVE aggregate (Misra &
  * Gries 1982; merge rule from Agarwal et al. 2012's mergeable
  * summaries): `k` counters per partial buffer, O(k) memory no matter
  * how many distinct values stream past — the bounded-memory sketch
  * the [[graft.operators.TextStats.heavyHitters]] recount pass is
  * built on. Returns the surviving keys (sorted, deterministic) as
  * `array<string>`.
  *
  * Contract: the result is a SUPERSET of every value whose global
  * count exceeds N/(k+1). Each decrement event (update: k counters +
  * the discarded arrival; merge: the subtracted (k+1)-th largest
  * count) removes at least k+1 units of total mass, so a buffer's
  * total undercount is at most n/(k+1) of the mass it absorbed, and
  * undercounts ADD across merges — a qualifying value's merged
  * estimate stays positive. Counts are NOT reported: estimates are
  * sketch-lossy by design, and every consumer must recount exactly
  * (the lesson q198 pins: the sketch bounds candidates, the recount
  * answers).
  *
  * A typed-imperative aggregate, not mapPartitions: the map-side
  * partial buffer IS the per-partition summary, the final merge sees
  * #partitions model-sized buffers, and the kernel is reusable from
  * SQL as `graft_misra_gries(value, k)`. */
case class MisraGriesAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(k >= 1 && k <= 1000000, "k must be in [1, 10^6]")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MisraGriesAgg = copy(child = cs.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string value, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  type Buf = scala.collection.mutable.HashMap[String, Long]

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(
      buf: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1L
        case None if buf.size < k => buf(key) = 1L
        case None =>
          // decrement-all: one shared event for the k counters and the
          // discarded arrival; zeroed counters free their slots
          val dead = List.newBuilder[String]
          buf.keysIterator.foreach { key2 =>
            val c = buf(key2) - 1L
            if (c == 0L) dead += key2 else buf(key2) = c
          }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (key, c) =>
      buf(key) = buf.getOrElse(key, 0L) + c
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything; at most k
      // entries can exceed it, and the drop removes >= (k+1)·d mass —
      // the same amortized bound as update's decrement-all
      val d = buf.values.toArray.sortWith(_ > _).apply(k)
      val dead = List.newBuilder[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - d
        if (c <= 0L) dead += key else buf(key) = c
      }
      dead.result().foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted
        .map(UTF8String.fromString(_).asInstanceOf[Any]))

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      val key = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf(key) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "misra_gries"
}
