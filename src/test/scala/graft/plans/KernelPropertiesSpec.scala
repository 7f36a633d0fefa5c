package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck laws for the native Catalyst kernels, evaluated at the
  * EXPRESSION level (Literal in → eval out; no SparkSession, hundreds
  * of cases per law in milliseconds). Each law is the mathematical
  * property the kernel's downstream operator RELIES on — e.g. LSH
  * recall arguments assume the MinHash union law; candidate
  * deduplication assumes order/multiplicity invariance; the winnowing
  * guarantee (Schleimer 2003) is what makes fingerprint overlap imply
  * span overlap. */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private def strArr(xs: Seq[String]): Literal =
    Literal.create(xs, ArrayType(StringType))
  private def longsOf(a: Any): Seq[Long] =
    a.asInstanceOf[ArrayData].toLongArray().toSeq
  private def stringsOf(a: Any): Seq[String] = {
    val arr = a.asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  private val token: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val tokens: Gen[List[String]] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, token))

  test("MinHashSig: union law — sig(A ∪ B) = elementwise " +
      "min(sig(A), sig(B)) (the property LSH recall arguments assume)") {
    check(Prop.forAll(tokens, tokens) { (a, b) =>
      val k = 16
      val sa = longsOf(MinHashSig(strArr(a), k).eval())
      val sb = longsOf(MinHashSig(strArr(b), k).eval())
      val su = longsOf(MinHashSig(strArr(a ++ b), k).eval())
      su == sa.zip(sb).map { case (x, y) => math.min(x, y) }
    })
  }

  test("MinHashSig: order and multiplicity invariance — a signature " +
      "is a SET property") {
    check(Prop.forAll(tokens, Gen.long) { (a, seed) =>
      val k = 16
      val rnd = new scala.util.Random(seed)
      val noisy = rnd.shuffle(a ++ rnd.shuffle(a).take(rnd.nextInt(a.size + 1)))
      longsOf(MinHashSig(strArr(a), k).eval()) ==
        longsOf(MinHashSig(strArr(noisy), k).eval())
    })
  }

  test("MinHashBandKeys: `bands` keys out; equal signatures give " +
      "equal keys; a shared band slice gives a shared key") {
    check(Prop.forAll(tokens) { a =>
      val sig = MinHashSig(strArr(a), 16).eval()
      val lit = Literal.create(longsOf(sig), ArrayType(LongType))
      val k1 = longsOf(MinHashBandKeys(lit, 4).eval())
      val k2 = longsOf(MinHashBandKeys(lit, 4).eval())
      k1.length == 4 && k1 == k2
    })
  }

  test("SimHash64Expr: whitespace-token permutation invariance (the " +
      "bag-of-tokens contract banding relies on)") {
    check(Prop.forAll(tokens, Gen.long) { (a, seed) =>
      val t1 = a.mkString(" ")
      val t2 = new scala.util.Random(seed).shuffle(a).mkString(" ")
      SimHash64Expr(Literal.create(t1, StringType)).eval() ==
        SimHash64Expr(Literal.create(t2, StringType)).eval()
    })
  }

  test("SortedIntersectCount equals set-intersection cardinality on " +
      "sorted distinct arrays") {
    val longSet = Gen.listOf(Gen.choose(-1000L, 1000L)).map(_.distinct.sorted)
    check(Prop.forAll(longSet, longSet) { (a, b) =>
      val c = SortedIntersectCount(
        Literal.create(a, ArrayType(LongType, containsNull = false)),
        Literal.create(b, ArrayType(LongType, containsNull = false))).eval()
      c == a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("CharShinglesExpr == the distinct n-char sliding set; " +
      "WordShinglesExpr == the distinct n-word sliding set") {
    val text = Gen.choose(0, 40).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))))
    check(Prop.forAll(text, Gen.choose(1, 6)) { (s, n) =>
      stringsOf(CharShinglesExpr(Literal.create(s, StringType), n).eval())
        .toSet == s.sliding(n).filter(_.length == n).toSet &&
      stringsOf(CharShinglesExpr(Literal.create(s, StringType), n).eval())
        .distinct.size ==
        stringsOf(CharShinglesExpr(Literal.create(s, StringType), n)
          .eval()).size
    })
    check(Prop.forAll(tokens, Gen.choose(1, 4)) { (ws, n) =>
      val s = ws.mkString(" ")
      stringsOf(WordShinglesExpr(Literal.create(s, StringType), n).eval())
        .toSet ==
        ws.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    })
  }

  test("WinnowingFingerprint: the winnowing guarantee — every window " +
      "of w consecutive k-gram positions contributes a selected hash, " +
      "and every selected hash IS some k-gram's hash") {
    val text = Gen.choose(1, 60).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar))
    check(Prop.forAll(text, Gen.choose(1, 6), Gen.choose(1, 6)) {
      (s, k, w) =>
        // reference k-gram hashes: the kernel's rolling polynomial,
        // finalized with splitmix64 (same arithmetic, scalar spelling)
        val n = s.length - k + 1
        val sel = longsOf(
          WinnowingFingerprint(Literal.create(s, StringType), k, w)
            .eval()).toSet
        if (n <= 0) sel.isEmpty
        else {
          val B = 1000003L
          val grams = (0 until n).map { i =>
            var h = 0L
            var j = i
            while (j < i + k) { h = h * B + s.charAt(j); j += 1 }
            graft.functions.VectorFunctions.Planes.splitmix64(h)
          }
          val subset = sel.subsetOf(grams.toSet)
          val covered = (0 to math.max(0, n - w)).forall { start =>
            grams.slice(start, math.min(n, start + w))
              .exists(sel.contains)
          }
          subset && covered
        }
    })
  }

  test("HyperplaneBucket: bucket always lands in [0, 2^nBits); " +
      "deterministic per (vec, seed)") {
    val vec = Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-5.0, 5.0)))
    check(Prop.forAll(vec, Gen.choose(1, 12), Gen.long) { (v, nb, seed) =>
      val lit = Literal.create(v, ArrayType(DoubleType))
      val b1 = HyperplaneBucket(lit, nb, seed).eval().asInstanceOf[Long]
      val b2 = HyperplaneBucket(lit, nb, seed).eval().asInstanceOf[Long]
      b1 == b2 && b1 >= 0L && b1 < (1L << nb)
    })
  }

  test("GumbelKeyExpr: deterministic per (id, seed) and finite") {
    check(Prop.forAll(Gen.long, Gen.long) { (id, seed) =>
      val lit = Literal.create(id, LongType)
      val g1 = GumbelKeyExpr(lit, seed).eval().asInstanceOf[Double]
      val g2 = GumbelKeyExpr(lit, seed).eval().asInstanceOf[Double]
      g1 == g2 && !g1.isNaN && !g1.isInfinite
    })
  }

  // ---- model-space kernels (the golden-gated q29/q108 machinery):
  // mathematical identities gate what no DuckDB oracle can ----

  private val smallVec: Gen[List[Double]] =
    Gen.listOfN(8, Gen.choose(-3.0, 3.0))

  test("NearestCells: the first probe IS the exact cosine argmax over " +
      "the centroid model (index tie-break), probes are distinct and " +
      "in cosine order") {
    val centroidsGen =
      Gen.listOfN(6, Gen.listOfN(8, Gen.choose(-2.0, 2.0)))
    check(Prop.forAll(smallVec, centroidsGen, Gen.choose(1, 6)) {
      (v, cs, nProbe) =>
        val cents = cs.map(_.toArray).toArray
        val got = NearestCells(
          Literal.create(v, ArrayType(DoubleType)), cents, nProbe)
          .eval().asInstanceOf[ArrayData].toIntArray().toSeq
        def cos(a: Seq[Double], b: Array[Double]): Double = {
          val dot = a.zip(b).map { case (x, y) => x * y }.sum
          val na = math.sqrt(a.map(x => x * x).sum)
          val nb = math.sqrt(b.map(x => x * x).sum)
          if (na == 0.0 || nb == 0.0) -2.0 else dot / (na * nb)
        }
        val want = cents.indices
          .sortBy(i => (-cos(v, cents(i)), i)).take(nProbe)
        got == want && got.distinct.size == got.size
    })
  }

  test("PqEncode: each sub-code is the exact L2 argmin in its " +
      "codebook — quantize(centroid) returns the centroid's own code") {
    val cbGen = Gen.listOfN(4,
      Gen.listOfN(5, Gen.listOfN(2, Gen.choose(-2.0, 2.0))))
    check(Prop.forAll(smallVec, cbGen) { (v, cb) =>
      val books = cb.map(_.map(_.toArray).toArray).toArray
      val codes = PqEncode(
        Literal.create(v, ArrayType(DoubleType)), books)
        .eval().asInstanceOf[ArrayData].toIntArray()
      val exact = books.zipWithIndex.forall { case (book, j) =>
        val sub = v.slice(j * 2, j * 2 + 2)
        val d2 = book.map(c =>
          sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
        d2(codes(j)) == d2.min
      }
      // a vector assembled FROM centroids must quantize back to them
      val self = books.map(_.head).flatten.toList
      val selfCodes = PqEncode(
        Literal.create(self, ArrayType(DoubleType)), books)
        .eval().asInstanceOf[ArrayData].toIntArray()
      // head centroid may tie with another equal-distance centroid at
      // a LOWER index only if identical; require d2 == 0
      val selfExact = books.zipWithIndex.forall { case (book, j) =>
        val sub = self.slice(j * 2, j * 2 + 2)
        sub.zip(book(selfCodes(j))).map { case (x, y) =>
          (x - y) * (x - y) }.sum == 0.0
      }
      exact && selfExact
    })
  }

  test("PqAdcTable: ADC(code) table walk == exact dot(query, " +
      "reconstruction) — the identity IVFADC scoring relies on") {
    val cbGen = Gen.listOfN(4,
      Gen.listOfN(5, Gen.listOfN(2, Gen.choose(-2.0, 2.0))))
    check(Prop.forAll(smallVec, smallVec, cbGen) { (q, v, cb) =>
      val books = cb.map(_.map(_.toArray).toArray).toArray
      val codes = PqEncode(
        Literal.create(v, ArrayType(DoubleType)), books)
        .eval().asInstanceOf[ArrayData].toIntArray()
      val table = PqAdcTable(
        Literal.create(q, ArrayType(DoubleType)), books)
        .eval().asInstanceOf[ArrayData].toDoubleArray()
      val ksub = 5
      val walked = codes.zipWithIndex
        .map { case (c, j) => table(j * ksub + c) }.sum
      val recon = codes.zipWithIndex.flatMap { case (c, j) => books(j)(c) }
      val exact = q.zip(recon).map { case (x, y) => x * y }.sum
      math.abs(walked - exact) < 1e-9
    })
  }

  test("TextEntropyExpr: 0 <= H <= log2(#distinct); zero iff one " +
      "distinct token; top share in (0, 1]") {
    check(Prop.forAll(tokens) { ws =>
      val s = ws.mkString(" ")
      val row = TextEntropyExpr(Literal.create(s, StringType)).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val (wh, share) = (row.getDouble(0), row.getDouble(2))
      def log2(x: Double) = math.log(x) / math.log(2.0)
      val distinct = ws.distinct.size
      wh >= -1e-12 && wh <= log2(distinct.toDouble) + 1e-12 &&
        ((distinct == 1) == (math.abs(wh) < 1e-12)) &&
        share > 0.0 && share <= 1.0
    })
  }

  test("DotProduct equals the scalar reference sum") {
    check(Prop.forAll(smallVec, smallVec) { (a, b) =>
      val got = DotProduct(
        Literal.create(a, ArrayType(DoubleType)),
        Literal.create(b, ArrayType(DoubleType))).eval()
        .asInstanceOf[Double]
      val want = a.zip(b).map { case (x, y) => x * y }.sum
      math.abs(got - want) < 1e-12
    })
  }
}
