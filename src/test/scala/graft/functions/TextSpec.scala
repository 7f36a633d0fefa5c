package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {

  import TextFunctions._

  private def one(textVal: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(textVal).toDF("text").select(c).collect()(0).get(0)
  }

  test("token metrics on a known sentence") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(one(s, tokenCount(col("text"))) === 9L)
    assert(one(s, distinctTokenCount(col("text"))) === 8L) // 'the' twice
    // 35 non-space chars / 9 tokens, rounded to 4 decimals
    assert(one(s, avgTokenLen(col("text"))) === 3.8889)
  }

  test("word shingles: count, distinctness, short-doc guard") {
    val sh = one("a b c d e", wordShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh === Seq("a b c", "b c d", "c d e"))
    val empty = one("a b", wordShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(empty.isEmpty)
  }

  test("char shingles") {
    val sh = one("abcd", charShingles(col("text"), 2))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh === Seq("ab", "bc", "cd"))
  }

  test("char shingles: native kernel matches the HOF formulation (incl. CJK)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("abcab ", "我是一个学生的老师中国人", "日本語のテキストです")
    val docs = (1 to 60).map { i =>
      val alpha = alphabets(i % alphabets.length)
      val len = rnd.nextInt(40)
      (i, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val df = docs.toDF("id", "text")
    val n = 3
    // reference: the HOF substr formulation this kernel replaced
    val hof = when(length(col("text")) >= n,
      array_distinct(transform(
        sequence(lit(0), length(col("text")) - n),
        i => col("text").substr(i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(col("id"),
      charShingles(col("text"), n).as("native"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"doc ${r.getInt(0)}")
    }
  }

  test("fingerprint is case/punctuation-insensitive") {
    assert(one("Hello, World!", fingerprint(col("text")))
      === one("hello world", fingerprint(col("text"))))
    assert(one("hello world", fingerprint(col("text")))
      !== one("hello there", fingerprint(col("text"))))
  }

  test("langId on real-language samples") {
    assert(one("the cat is on the mat and the dog is here",
      langId(col("text"))) === "en")
    assert(one("le chat est dans la maison et je suis dans le jardin",
      langId(col("text"))) === "fr")
    assert(one("el perro es grande y los gatos son pequeños es verdad",
      langId(col("text"))) === "es")
    assert(one("der hund ist gross und die katze ist nicht klein",
      langId(col("text"))) === "de")
    assert(one("我是一个学生，我的老师是中国人。", langId(col("text"))) === "zh")
    assert(one("xyzzy plugh", langId(col("text"))) === "und")
  }

  test("simhash: similar token sets → small hamming distance") {
    val a = HashFunctions.simhash64("the quick brown fox jumps over the lazy dog tonight again".split(' '))
    val b = HashFunctions.simhash64("the quick brown fox jumps over the lazy cat tonight again".split(' '))
    val c = HashFunctions.simhash64("completely different words appear in this unrelated sentence here now".split(' '))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) < ham(a, c))
    assert(ham(a, a) === 0)
  }

  test("stopword ratio") {
    val r = one("the cat and the dog", stopwordRatio(col("text"), Seq("the", "and")))
    assert(r === 0.6)
  }

  test("entropy profile: known answers and brute-force equality") {
    import graft.plans.TextModelExpressions.textEntropy
    def profile(s: String): (Double, Double, Double) = {
      val r = one(s, textEntropy(col("text")))
        .asInstanceOf[org.apache.spark.sql.Row]
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    // degenerate repetition: one token type → word entropy exactly 0,
    // top share 1
    val (wh0, _, ts0) = profile("a a a a")
    assert(wh0 === 0.0 && ts0 === 1.0)
    // four equiprobable tokens → exactly 2 bits
    val (wh2, _, ts4) = profile("a b c d")
    assert(math.abs(wh2 - 2.0) < 1e-12 && ts4 === 0.25)
    // char side counts code points incl. spaces: "ab" = {a, b} → 1 bit
    val (_, ch1, _) = profile("ab")
    assert(math.abs(ch1 - 1.0) < 1e-12)
    // supplementary characters count as ONE code point: a surrogate
    // pair repeated twice has a 1-codepoint alphabet → 0 bits
    val (_, chSupp, _) = profile("😀😀")
    assert(chSupp === 0.0)
    // randomized brute-force equality against an in-test computation
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "bb", "c", "d", "é", "汉")
    def brute(s: String): (Double, Double, Double) = {
      def h[A](xs: Seq[A]): Double = {
        val n = xs.length.toDouble
        val byC = xs.groupBy(identity).values.map(_.length.toDouble)
        math.log(n) / math.log(2) -
          byC.map(c => c * math.log(c) / math.log(2)).sum / n
      }
      val toks = s.split(" ", -1).toSeq
      val cps = s.codePoints().toArray.toSeq
      val top = toks.groupBy(identity).values.map(_.length).max
      (h(toks), h(cps), top.toDouble / toks.length)
    }
    for (_ <- 1 to 20) {
      val s = Seq.fill(3 + rnd.nextInt(30))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val (gw, gc, gt) = profile(s)
      val (bw, bc, bt) = brute(s)
      assert(math.abs(gw - bw) < 1e-9 && math.abs(gc - bc) < 1e-9 &&
        math.abs(gt - bt) < 1e-12, s"text=$s")
    }
  }
}
