package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {

  test("repetitionProfile on controlled docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b"),          // 4 tokens, 2 distinct, top 'a' = 3
      (2L, "x y z w")).toDF("doc_id", "text")
    val got = TextStats.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 0.5, 0.75)))
    assert(got(2L) === ((4L, 0.0, 0.25)))
  }

  test("vocabEncode: deterministic vocab ids, OOV = -1, ordered sequences") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a c"),   // counts: b=3, a=2, c=1, d=1
      (2L, "b b d")).toDF("doc_id", "text")
    val got = TextStats.vocabEncode(df, "doc_id", "text", vocabSize = 2)
      .select("id", "n_tokens", "n_oov", "token_ids")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Int](3).toList))).toMap
    // vocab: b -> 0 (count 3), a -> 1 (count 2); c/d OOV
    assert(got(1L) === ((4L, 1L, List(1, 0, 1, -1))))
    assert(got(2L) === ((3L, 1L, List(0, 0, -1))))
  }

  test("hashedBowScore: exact integer fold over unigram+bigram features") {
    import spark.implicits._
    val dims = 8
    val w = Array.tabulate(dims)(i => (i.toLong * 7L) % 21L - 10L)
    val cases = Seq(1L -> "a b a", 2L -> "", 3L -> "solo")
    val df = cases.toDF("doc_id", "text")
    def brute(text: String): (Long, Long) = {
      val toks = text.split(' ')
      val feats = toks.toSeq ++
        toks.toSeq.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val milli = feats.map { f =>
        val h = graft.functions.HashFunctions.hash64(f)
        w((((h % dims) + dims) % dims).toInt)
      }.sum
      (feats.size.toLong, milli)
    }
    val got = TextStats.hashedBowScore(df, "doc_id", "text", w, biasMilli = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    cases.foreach { case (id, text) =>
      val (n, m) = brute(text)
      assert(got(id) === ((n, m + 5L, (m + 5L) / 1000.0, m + 5L > 0)),
        s"doc $id")
    }
  }

  test("hashedBowScore is a pure per-row projection: no shuffle, one scan") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val plan = TextStats
      .hashedBowScore(docs, "doc_id", "text", Array.fill(16)(1L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // the struct-producing scorer must be projected once, not inlined
    // into both field extractions (CollapseProject would double the
    // text pass) — one occurrence of the expression in the plan
    assert("hashed_bow_score".r.findAllIn(plan).size === 1, plan)
  }

  test("observed metrics ride the action (no second pass, exact counts)") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    val (out, obs) = Metrics.observed(df, "stats",
      count(lit(1)).as("rows"), sum(col("v")).as("total"))
    assert(out.filter(col("v") > 1).count() === 3) // action triggers metrics
    val m = obs.get
    assert(m("rows") === 4L)   // observed BEFORE the filter
    assert(m("total") === 10L)
  }

  test("topShingles counts document frequency, not occurrences") {
    import spark.implicits._
    val df = Seq(
      (1L, "p q r p q r"),   // shingle "p q r" twice in doc 1
      (2L, "p q r s"),
      (3L, "s t u v")).toDF("doc_id", "text")
    val got = TextStats.topShingles(df, "doc_id", "text", n = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "p q r" in 2 docs (counted once in doc 1); ties break by shingle
    assert(got.head === (("p q r", 2L)))
    assert(got.length === 2 && got(1)._2 === 1L)
  }

  test("chunkTokens: exact overlapping windows, trailing partial kept") {
    import spark.implicits._
    val toks = (0 until 95).map(i => s"t$i")
    val df = Seq((7L, toks.mkString(" ")), (8L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextStats.chunkTokens(df, "doc_id", "text",
      chunkSize = 50, stride = 40)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === Set((7L, 0), (7L, 1), (7L, 2), (8L, 0)))
    assert(got((7L, 0)) === ((50L, toks.slice(0, 50).mkString(" "))))
    assert(got((7L, 1)) === ((50L, toks.slice(40, 90).mkString(" "))))
    assert(got((7L, 2)) === ((15L, toks.slice(80, 95).mkString(" "))))
    assert(got((8L, 0)) === ((3L, "a b c")))
  }

  test("cdcChunks: chunks partition the document in order, and an " +
      "in-test replay of the cut rule agrees") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("spark", "scan", "join", "agg", "sort", "row",
      "key", "value", "batch", "merge")
    val toks = (0 until 400).map(_ => words(rnd.nextInt(words.size)))
    val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val got = TextStats.cdcChunks(df, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // replay: cut before i (i >= 4) iff md5 of the preceding 4-gram
    // leads with hex '0'
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cuts = (0 until toks.size).map(i =>
      i >= 4 && md5hex(toks.slice(i - 4, i).mkString(" ")).head == '0')
    val segs = cuts.scanLeft(0L)((a, c) => a + (if (c) 1 else 0)).tail
    val expect = toks.zip(segs).groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (seg, ts) =>
        seg -> ((ts.size.toLong, md5hex(ts.map(_._1).mkString(" ")))) }
    assert(got.toSeq === expect)
    assert(got.map(_._2._1).sum === 400L) // chunks partition the doc
    assert(got.map(_._1) === (0L until got.size).toArray) // dense segs
  }

  test("cdcChunks: cut points are LOCAL — prepending tokens preserves " +
      "every chunk after the first boundary (the reuse property " +
      "fixed-stride chunking lacks)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val base = (0 until 300).map(_ => words(rnd.nextInt(words.size)))
    val prepended = Seq("new", "crawl", "header", "tokens", "here") ++ base
    def fps(text: String): Seq[(Long, String)] =
      TextStats.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(1) -> r.getString(3))
        .sortBy(_._1).map(_._2).zipWithIndex.map(_.swap)
        .map { case (i, f) => (i.toLong, f) }
    val baseFps = fps(base.mkString(" ")).map(_._2)
    val prepFps = fps(prepended.mkString(" ")).map(_._2).toSet
    // every base chunk except the first (whose start shifted) must
    // reappear verbatim in the prepended version: cut decisions at
    // base position i >= 4 depend only on the 4 preceding original
    // tokens, which the prepend leaves intact
    assert(baseFps.size >= 10) // non-degenerate chunking
    val lost = baseFps.tail.filterNot(prepFps)
    assert(lost.isEmpty, s"lost ${lost.size} of ${baseFps.size}")
  }

  test("ngramRepetition: looped text saturates, distinct text scores low") {
    import spark.implicits._
    val df = Seq(
      // 9 tokens; bigrams a·b ×3, b·c ×3, c·a ×2 → top = 2·3/9; all 7
      // trigram occurrences belong to grams appearing ≥2 → 3·7/9 > 1
      // (overlap-ignoring coverage saturates on loops, by design)
      (1L, "a b c a b c a b c"),
      (2L, "one two three four five six"), // no repeated grams
      (3L, "x"))                           // shorter than any gram
      .toDF("doc_id", "text")
    val got = TextStats.ngramRepetition(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((9L, 0.6667, 2.3333)))
    assert(got(2L) === ((6L, 0.3333, 0.0)))
    assert(got(3L) === ((1L, 0.0, 0.0)))
  }

  test("ngramNovelty: corpus-unique trigram share") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e"),  // trigrams abc bcd cde; abc also in doc 2
      (2L, "a b c x y"),  // abc bcx cxy
      (3L, "p q r s t"),  // all unique
      (4L, "p q"))        // shorter than n → absent from output
      .toDF("doc_id", "text")
    val got = TextStats.ngramNovelty(df, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> ((3L, 0.6667)),
      2L -> ((3L, 0.6667)),
      3L -> ((3L, 1.0))))
  }

  test("stratifiedSample: exact ceil share per stratum, nested in frac") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val perLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang", 0.3)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(kept(lang) === math.ceil(0.3 * n).toLong, lang)
    }
    // rank-based selection nests: the 0.1 sample is inside the 0.3 one
    def ids(frac: Double): Set[Long] =
      Sampling.stratifiedSample(docs, "doc_id", "lang", frac)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(0.1).subsetOf(ids(0.3)))
  }

  test("bigramLmScore: add-one bigram NLL, hand-computed; short docs absent") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    // corpus: C(a b)=2, C(b a)=1; left contexts C(a ·)=2, C(b ·)=1;
    // V = |{a,b,x}| = 3. P(b|a) = 3/5 → 0.51083; P(a|b) = 2/4 → 0.69315
    val got = TextStats.bigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 0.6020)), // avg of the two bigram scores
      2L -> ((1L, 0.5108))))
    // doc 3 has no bigrams → absent, but its token still counted in V
    assert(!got.contains(3L))
  }

  test("corpusOverlap: exact pairwise Jaccard/containment on a fixture") {
    import spark.implicits._
    // bigram sets: A = {a b, b c}  B = {a b, b d}  C = {x y}
    val df = Seq(
      ("A", "a b c"), ("B", "a b"), ("B", "b d"), ("C", "x y"))
      .toDF("src", "text")
    val got = TextStats.corpusOverlap(df, "src", "text", n = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // A∩B = {a b}: jaccard 1/3, containment 1/2; C shares nothing
    assert(got === Map(("A", "B") -> ((1L, 0.3333, 0.5))))
  }

  test("bpeTrain: classic fixture learns the hand-computed merges in " +
      "order; deterministic") {
    import spark.implicits._
    // the Sennrich-style corpus: word frequencies
    //   low:5  lower:2  newest:6  widest:3
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ...
    // tie (e,s) vs (s,t) breaks lexicographically -> (e,s) first,
    // then (es,t)=9, then (l,o)=7 / (o,w)=7 -> (l,o) first
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TextStats.bpeTrain(df, "text", nMerges = 4, minCount = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(merges.toSeq === Seq(
      (0L, "e", "s", "es", 9L),
      (1L, "es", "t", "est", 9L),
      (2L, "l", "o", "lo", 7L),
      (3L, "lo", "w", "low", 7L)))
    val again = TextStats.bpeTrain(df, "text", nMerges = 4, minCount = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again === merges.map(m => m._1 -> m._4).toMap)
  }

  test("bpeEncode: segmentation replays training; concatenation " +
      "reproduces tokens; more merges never add symbols") {
    import spark.implicits._
    import graft.plans.{SketchExpressions => SK}
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val train = Seq((1L, text)).toDF("doc_id", "text")
    def mergesOf(n: Int): Array[(String, String)] =
      TextStats.bpeTrain(train, "text", nMerges = n, minCount = 1L)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2)))
    val m4 = mergesOf(4)
    val enc = Seq((1L, "lowest low")).toDF("id", "text")
      .select(SK.bpeEncode(col("text"), m4).as("units"))
      .collect()(0).getSeq[String](0)
    // "lowest" -> lo+w merged to "low"? replay: e s->es, es t->est,
    // l o->lo, lo w->low  =>  low + est ; "low" -> low
    assert(enc === Seq("low", "est", "low"))
    assert(enc.mkString("") === "lowestlow")
    // monotonicity: deeper merge tables can only coarsen
    val n2 = Seq((1L, "lowest low")).toDF("id", "text")
      .select(SK.bpeEncode(col("text"), mergesOf(2)).as("u"))
      .collect()(0).getSeq[String](0)
    assert(enc.length <= n2.length)
    // unicode safety: astral-plane code points stay whole symbols
    val uni = Seq((1L, "a😀b")).toDF("id", "text")
      .select(SK.bpeEncode(col("text"), Array.empty[(String, String)]).as("u"))
      .collect()(0).getSeq[String](0)
    assert(uni === Seq("a", "😀", "b"))
  }

  test("blocklistFilter: counts occurrences case-insensitively, null text -> nulls") {
    import spark.implicits._
    val df = Seq((1L, "Bad word bad BAD fine"), (2L, "all clean here"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextStats.blocklistFilter(df, "doc_id", "text",
      Seq("BAD", "absent"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(1L) === ((Some(3L), Some(false))))
    assert(got(2L) === ((Some(0L), Some(true))))
    assert(got(3L) === ((None, None)))
  }

  test("gopherQualityGate: each screen trips independently") {
    import spark.implicits._
    val pass = "the quick brown fox jumps over a lazy dog near the bank"
    val df = Seq(
      (1L, pass),                                   // all screens pass
      (2L, "too short"),                            // word-count floor
      (3L, Seq.fill(12)("the the word word").mkString(" ")
        .split(" ").take(12).mkString(" ")),        // placeholder, replaced below
      (4L, ("a b " * 10).trim),                     // mean word len < 3
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu"))                               // no stopwords
      .toDF("doc_id", "text")
    val got = TextStats.gopherQualityGate(df, "doc_id", "text",
      minWords = 10, maxWords = 100, minMeanWordLen = 3.0,
      maxMeanWordLen = 10.0, minStopwords = 2,
      stopwords = Seq("the", "a"), minAlphaFrac = 0.8,
      maxTopTokenShare = 0.4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"))
    assert(!got(2L).getAs[Boolean]("keep")
      && got(2L).getAs[Long]("n_words") === 2L)
    assert(!got(4L).getAs[Boolean]("keep")
      && got(4L).getAs[Double]("mean_word_len") === 1.0)
    assert(!got(5L).getAs[Boolean]("keep")
      && got(5L).getAs[Long]("n_stopwords") === 0L)
    // repetition screen: "the" dominates above the share bound
    val rep = TextStats.gopherQualityGate(
      Seq((9L, "the the the the the the the the a b")).toDF("doc_id", "text"),
      "doc_id", "text", minWords = 5, maxWords = 100,
      minMeanWordLen = 1.0, maxMeanWordLen = 10.0, minStopwords = 2,
      stopwords = Seq("the", "a"), minAlphaFrac = 0.8,
      maxTopTokenShare = 0.4).collect()(0)
    assert(rep.getAs[Double]("top_token_share") === 0.8)
    assert(!rep.getAs[Boolean]("keep"))
  }

  test("diversityProfile: exact counts on a hand-computed corpus") {
    import spark.implicits._
    val df = Seq(
      ("web", "a b a b a b"),     // 6 toks, 2 types; 4 3-grams, 2 distinct
      ("web", "a b c d"),         // 4 toks, 4 types; 2 3-grams, 2 distinct
      ("code", "x x x x x"))      // 5 toks, 1 type; 3 3-grams, 1 distinct
      .toDF("source", "text")
    val got = TextStats.diversityProfile(df, "source", "text", n = 3)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val web = got("web")
    assert(web.getAs[Long]("n_docs") === 2L)
    assert(web.getAs[Long]("n_tokens") === 10L)
    assert(web.getAs[Long]("n_types") === 4L)   // a b c d
    assert(web.getAs[Double]("ttr") === 0.4)
    assert(web.getAs[Long]("n_grams") === 6L)
    // "a b a", "b a b" (x2 each → distinct 2) + "a b c", "b c d"
    assert(web.getAs[Long]("n_distinct_grams") === 4L)
    val code = got("code")
    assert(code.getAs[Long]("n_types") === 1L)
    assert(code.getAs[Double]("ttr") === 0.2)
    assert(code.getAs[Long]("n_distinct_grams") === 1L)
    assert(code.getAs[Double]("gram_diversity") ===
      BigDecimal(1.0 / 3).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("diversityProfile: groups of only sub-n docs get zero gram counts") {
    import spark.implicits._
    val df = Seq(("tiny", "a b"), ("tiny", "c"))
      .toDF("source", "text")
    val r = TextStats.diversityProfile(df, "source", "text", n = 3)
      .collect()(0)
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("n_grams") === 0L)
    assert(r.isNullAt(r.fieldIndex("gram_diversity")))
  }

  test("unigramDrift equals a hand-rolled smoothed KL/TV; corpus-identical group drifts ~0") {
    import spark.implicits._
    val df = Seq(
      ("a", "x x y z"), ("a", "x y"),
      ("b", "z z z w"), ("b", "w w"))
      .toDF("source", "text")
    val toks = Map(
      "a" -> "x x y z x y".split(" ").toSeq,
      "b" -> "z z z w w w".split(" ").toSeq)
    val vocab = toks.values.flatten.toSeq.distinct
    val v = vocab.size
    val nTot = toks.values.map(_.size).sum
    val gCnt = toks.values.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = toks.map { case (g, ts) =>
      val cnt = ts.groupBy(identity).view.mapValues(_.size).toMap
      val ns = ts.size
      val kl = vocab.map { t =>
        val p = (cnt.getOrElse(t, 0) + 1).toDouble / (ns + v)
        val q = (gCnt(t) + 1).toDouble / (nTot + v)
        p * math.log(p / q)
      }.sum
      val tv = vocab.map { t =>
        val p = (cnt.getOrElse(t, 0) + 1).toDouble / (ns + v)
        val q = (gCnt(t) + 1).toDouble / (nTot + v)
        math.abs(p - q)
      }.sum / 2
      g -> ((ts.size.toLong, cnt.size.toLong, r4(kl), r4(tv)))
    }
    val got = TextStats.unigramDrift(df, "text", "source")
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("kl_vs_corpus"),
          r.getAs[Double]("tv_vs_corpus")))).toMap
    assert(got === want)
    got.values.foreach { case (_, _, kl, tv) =>
      assert(kl >= 0.0 && tv >= 0.0 && tv <= 1.0)
    }
    // one group that IS the corpus: drift exactly zero
    val solo = Seq(("only", "p q p r")).toDF("source", "text")
    val z = TextStats.unigramDrift(solo, "text", "source").collect()(0)
    assert(z.getAs[Double]("kl_vs_corpus") === 0.0)
    assert(z.getAs[Double]("tv_vs_corpus") === 0.0)
  }

  test("seqLenPlan: hand-computed truncate/pad/pack ledger") {
    import spark.implicits._
    // token lengths: 2, 4, 6 (total 12)
    val docs = Seq("a b", "a b c d", "a b c d e f").toDS().toDF("text")
    val got = TextStats.seqLenPlan(docs, "text", lengths = Seq(4, 8))
      .orderBy("max_len").collect()
    // L=4: fit 2/3, kept 2+4+4=10, loss 2/12, pad util 10/12,
    //      packed ⌈10/4⌉=3
    val l4 = got(0)
    assert(l4.getLong(0) === 4L && l4.getLong(1) === 2L)
    assert(l4.getDouble(2) === 0.6667 && l4.getDouble(3) === 0.1667)
    assert(l4.getDouble(4) === 0.8333 && l4.getLong(5) === 3L)
    // L=8: everything fits, kept 12, pad util 12/24, packed 2
    val l8 = got(1)
    assert(l8.getLong(0) === 8L && l8.getLong(1) === 3L)
    assert(l8.getDouble(2) === 1.0 && l8.getDouble(3) === 0.0)
    assert(l8.getDouble(4) === 0.5 && l8.getLong(5) === 2L)
  }

  test("vocabCoverage: hand-computed curve, boundary ties, K past the " +
      "vocabulary clamps to full coverage") {
    import spark.implicits._
    // counts: a:4 b:3 c:2 d:1 → total 10, vocab 4
    val docs = Seq("a a a a b", "b b c c d").toDS().toDF("text")
    val got = TextStats.vocabCoverage(docs, "text",
      ks = Seq(1L, 2L, 3L, 10L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((1L, 4L, 0.4)))
    assert(got(2L) === ((2L, 7L, 0.7)))
    assert(got(3L) === ((3L, 9L, 0.9)))
    assert(got(10L) === ((4L, 10L, 1.0))) // clamped to vocab
    // tie at the cut: a:2 b:2 c:1 — K=1 takes ONE of the count-2 types;
    // coverage is tie-independent because both carry the same count
    val tie = Seq("a a b b c").toDS().toDF("text")
    val k1 = TextStats.vocabCoverage(tie, "text", ks = Seq(1L))
      .collect()(0)
    assert(k1.getLong(2) === 2L && k1.getDouble(3) === 0.4)
  }

  test("collocations: hand-computed phrase scores — exact milli fixed " +
      "point, min-count gate, (score desc, a, b) order") {
    import spark.implicits._
    // tokens: doc1 = a b a b, doc2 = a b c → N = 7; unigrams a:3 b:3
    // c:1; bigrams (a,b):3 (b,a):1 (b,c):1 → only (a,b) meets
    // minCount 2; score = (3-1)*7*1000 div (3*3) = 1555
    val docs = Seq("a b a b", "a b c").toDS().toDF("text")
    val got = TextStats.collocations(docs, "text",
      minCount = 2L, delta = 1L, k = 10).collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === (("a", "b", 3L, 3L, 3L, 1555L)))
    // delta at the count zeroes the score; minCount 1 admits the
    // singletons, tie order is (score desc, a, b)
    val all = TextStats.collocations(docs, "text",
      minCount = 1L, delta = 1L, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    // (b,a): (1-1)*7000 div 9 = 0; (b,c): 0*7000 div 3 = 0
    assert(all.toSeq === Seq(("a", "b", 1555L), ("b", "a", 0L),
      ("b", "c", 0L)))
  }

  test("heavyHitters equals the exact groupBy spelling on skewed " +
      "randomized corpora (MG candidates are a lossless superset)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // Zipf-ish skew over a vocabulary much larger than k: a handful of
    // hot tokens plus a long tail of near-singletons — the regime the
    // sketch exists for (tail stays out of the shuffle), with the
    // qualifying set a strict subset of the vocabulary.
    for (k <- Seq(5, 20)) {
      val docs = (1L to 60L).map { id =>
        val words = (1 to 40).map { _ =>
          val r = rnd.nextInt(100)
          if (r < 55) s"hot${rnd.nextInt(3)}"
          else if (r < 80) s"warm${rnd.nextInt(15)}"
          else s"tail${rnd.nextInt(500)}"
        }
        id -> words.mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      val toks = docs.flatMap(_._2.split(" "))
      val n = toks.size.toLong
      val expected = toks.groupBy(identity).view
        .mapValues(_.size.toLong)
        .filter { case (_, c) => c * (k + 1) > n }
        .toMap
      val got = TextStats.heavyHitters(df, "text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected, s"k=$k")
      // output order contract: count desc, token asc
      val rows = TextStats.heavyHitters(df, "text", k)
        .collect().map(r => (r.getLong(1), r.getString(0)))
      assert(rows.sortBy { case (c, t) => (-c, t) }.toSeq === rows.toSeq)
    }
  }

  test("heavyHittersPerGroup equals per-group exact counts (grouped " +
      "MG summaries lose no qualifying token)") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val docs = (1L to 80L).map { id =>
      val grp = s"g${id % 3}"
      val words = (1 to 30).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 50) s"${grp}hot${rnd.nextInt(2)}"
        else if (r < 75) s"warm${rnd.nextInt(10)}"
        else s"tail${rnd.nextInt(400)}"
      }
      (id, grp, words.mkString(" "))
    }
    val k = 8
    val expected = docs.groupBy(_._2).flatMap { case (g, ds) =>
      val toks = ds.flatMap(_._3.split(" "))
      val n = toks.size.toLong
      toks.groupBy(identity).collect {
        case (t, os) if os.size.toLong * (k + 1) > n =>
          (g, t) -> os.size.toLong
      }
    }.toMap
    val got = TextStats.heavyHittersPerGroup(
        docs.toDF("id", "grp", "text"), "grp", "text", k)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === expected)
    // broadcast size contract: past the candidate-row cap the joins
    // fall back to plain shuffles — path changes, answer must not
    val shuffled = TextStats.heavyHittersPerGroup(
        docs.toDF("id", "grp", "text"), "grp", "text", k,
        broadcastMaxRows = 0L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(shuffled === expected)
  }

  test("heavyHittersPerGroup: a NULL group's heavy hitters surface " +
      "like any other group's (null-safe recount joins)") {
    import spark.implicits._
    // null group: 'boil' appears 6/8 tokens (> 8/3 with k=2);
    // labeled group g1: 'hot' 4/6 (> 2)
    val docs = Seq(
      (1L, None, "boil boil boil rare1"),
      (2L, None, "boil boil boil rare2"),
      (3L, Some("g1"), "hot hot ta tb"),
      (4L, Some("g1"), "hot hot"))
      .toDF("id", "grp", "text")
    val got = TextStats.heavyHittersPerGroup(docs, "grp", "text", k = 2)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      (None, "boil") -> 6L,
      (Some("g1"), "hot") -> 4L))
  }

  test("vocabGrowth equals a brute-force replay of the md5 walk on a " +
      "randomized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // vocabulary widens with the doc id so later prefixes genuinely
    // introduce new types under most permutations
    val docs = (1L to 50L).map { id =>
      id -> (1 to 12).map(_ => s"w${rnd.nextInt(4 * (1 + id.toInt / 10))}")
        .mkString(" ")
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val pos = docs.map { case (id, _) => id -> s"vg:$id" }
      .sortBy { case (_, sk) => (md5hex(sk), sk) }
      .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
    val n = docs.size.toLong
    val firstSeen = docs
      .flatMap { case (id, t) => t.split(" ").map(_ -> pos(id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val steps = 10
    val want = firstSeen.values
      .groupBy(fs => fs * steps / n + 1)
      .map { case (step, fss) => step -> fss.size.toLong }
    val wantRows = want.keys.toSeq.sorted.foldLeft(
      Seq.empty[(Long, Long, Long, Long)]) { case (acc, step) =>
      val cum = acc.lastOption.map(_._4).getOrElse(0L) + want(step)
      acc :+ ((step, step * n / steps, want(step), cum))
    }
    val got = TextStats.vocabGrowth(
        docs.toDF("doc_id", "text"), "doc_id", "text", seed = "vg")
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === wantRows)
  }

  /** In-test BM25 brute force mirroring bm25TopK's arithmetic
    * (k1 = 1.2, b = 0.75, Lucene-style non-negative idf, query-term
    * SET semantics). Returns (qid, doc) -> unrounded score. */
  private def bm25Brute(
      docs: Seq[(Long, String)], queries: Seq[(Long, String)],
      cap: Option[Long] = None): Map[(Long, Long), Double] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val lens = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val dfm = toks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = docs.size.toLong
    val avgdl = lens.values.sum.toDouble / n
    val out = scala.collection.mutable.Map[(Long, Long), Double]()
    for ((qid, qt) <- queries; tok <- qt.split(" ", -1).distinct;
         (did, ts) <- toks) {
      val tf = ts.count(_ == tok).toLong
      val df = dfm.getOrElse(tok, 0L)
      if (tf > 0 && df > 0 && cap.forall(df <= _)) {
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val w = idf * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * lens(did) / avgdl))
        out((qid, did)) = out.getOrElse((qid, did), 0.0) + w
      }
    }
    out.toMap
  }

  test("bm25TopK equals an independent brute force; ranks by rounded " +
      "score then doc id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark query engine fast"),
      (2L, "query query plan slow engine"),
      (3L, "vector index search"),
      (4L, "fast fast query"),
      (5L, "plan cache"))
    val qs = Seq((10L, "query engine"), (20L, "fast plan"),
      (30L, "missingtoken"))
    val got = TextStats.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", qs.toDF("qid", "qtext"), "qid", "qtext", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val brute = bm25Brute(docs, qs)
    // expected top-3 per query from the brute force, same tie rule
    val want = brute.toSeq.groupBy(_._1._1).flatMap { case (qid, xs) =>
      xs.map { case ((_, d), s) =>
        (d, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }.sortBy { case (d, s) => (-s, d) }.take(3).zipWithIndex
        .map { case ((d, s), i) => (qid, i + 1L, d, s) }
    }.toSet
    assert(got.toSet === want)
    assert(!got.exists(_._1 == 30L)) // no posting, no row
    // every (4 dp rounded) score equals the rounded brute force
    got.foreach { case (qid, _, d, s) =>
      assert(s === BigDecimal(brute((qid, d)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
  }

  test("bm25TopK: duplicate query terms score once (set semantics); " +
      "maxDocFreq drops saturated terms from the index") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the spark engine"), (2L, "the plan"), (3L, "the the cache"))
    val dfDocs = docs.toDF("doc_id", "text")
    val once = TextStats.bm25TopK(dfDocs, "doc_id", "text",
        Seq((1L, "spark engine")).toDF("qid", "qtext"), "qid", "qtext", 3)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    val dup = TextStats.bm25TopK(dfDocs, "doc_id", "text",
        Seq((1L, "spark spark engine")).toDF("qid", "qtext"),
        "qid", "qtext", 3)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(once === dup)
    // 'the' appears in all 3 docs; cap 2 removes it from every score
    val capped = TextStats.bm25TopK(dfDocs, "doc_id", "text",
        Seq((1L, "the spark")).toDF("qid", "qtext"), "qid", "qtext", 3,
        maxDocFreq = Some(2L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bruteCapped = bm25Brute(docs, Seq((1L, "the spark")), Some(2L))
    assert(capped.keySet === bruteCapped.keySet)
    capped.foreach { case (k, s) =>
      assert(s === BigDecimal(bruteCapped(k))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(capped.keySet === Set((1L, 1L))) // only the 'spark' posting
  }

  test("zipfFit equals an independent OLS on the ln-ln points; the " +
      "vocab cut ranks by (freq desc, token)") {
    import spark.implicits._
    // token "tNN" appears (21 - NN) times -> a known frequency ladder;
    // u and v both appear 3 times, an explicit tie the (freq desc,
    // token asc) rank rule must break deterministically
    val words = (1 to 20).flatMap(i => Seq.fill(21 - i)(f"t$i%02d")) ++
      Seq("u", "u", "u", "v", "v", "v")
    val docs = words.grouped(7).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
    def brute(v: Int): (Long, Double, Double) = {
      val cnt = words.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong }
      val top = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(v)
      val pts = top.zipWithIndex.map { case ((_, c), i) =>
        (math.log((i + 1).toDouble), math.log(c.toDouble)) }
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      def r6(d: Double) = BigDecimal(d)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (pts.size.toLong, r6(slope), r6((sy - slope * sx) / n))
    }
    for (v <- Seq(5, 22, 500)) {
      val got = TextStats.zipfFit(docs.toDF("doc_id", "text"), "text", v)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .head
      assert(got === brute(v), s"v=$v")
    }
    // n_types respects the cut and the corpus vocab (22 types total)
    assert(TextStats.zipfFit(docs.toDF("doc_id", "text"), "text", 500)
      .collect().head.getLong(0) === 22L)
  }

  test("zipfFit on a degenerate corpus (one distinct type) emits NULL " +
      "slope/icept, never NaN — v >= 2 bounds the parameter, not the " +
      "fitted type count") {
    import spark.implicits._
    val one = TextStats.zipfFit(
      Seq((1L, "a a a"), (2L, "a")).toDF("doc_id", "text"), "text", 500)
      .collect().head
    assert(one.getLong(0) === 1L)
    assert(one.isNullAt(1) && one.isNullAt(2))
    // two types is already a (trivially exact) two-point fit
    val two = TextStats.zipfFit(
      Seq((1L, "a a b")).toDF("doc_id", "text"), "text", 500)
      .collect().head
    assert(two.getLong(0) === 2L && !two.isNullAt(1) && !two.isNullAt(2))
  }

  test("bm25FromPostings observeCandidates reports the exact " +
      "candidate join volume (sum of df over query terms) as a " +
      "plan-level observed metric") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a d"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "a d")).toDF("qid", "qtext")
    val got = TextStats.bm25FromPostings(
      TextStats.postings(docs, "doc_id", "text"),
      qs, "qid", "qtext", k = 3,
      observeCandidates = Some("graft_bm25_uncapped"))
    var seen: Option[Long] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.get("graft_bm25_uncapped").foreach { row =>
          seen = Some(row.getAs[Long]("candidate_rows"))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      assert(got.count() === 3L) // all three docs match "a"; k=3
      // the listener bus is async — wait for the metric to arrive
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      // df(a)=3 + df(d)=1 candidate postings entered the ranking join
      assert(seen === Some(4L))
    } finally spark.listenerManager.unregister(listener)
  }

  test("bm25TopK equals the brute force on a seeded random corpus " +
      "(full rank/score agreement at every k)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val qs = (100L to 105L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(3))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (k <- Seq(1, 4)) {
      val got = TextStats.bm25TopK(docs.toDF("doc_id", "text"),
          "doc_id", "text", qs.toDF("qid", "qtext"), "qid", "qtext", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val brute = bm25Brute(docs, qs)
      val want = brute.toSeq.groupBy(_._1._1).flatMap { case (qid, xs) =>
        xs.map { case ((_, d), s) =>
          (d, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        }.sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
          .map { case ((d, s), i) => (qid, i + 1L, d, s) }
      }.toSet
      assert(got === want, s"k=$k")
    }
  }

  test("bm25TopK: NULL-text docs are unindexed — outside N/avgdl and " +
      "never retrieved; empty text indexes as one empty-string term") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val qs = Seq((10L, "alpha"), (20L, "")).toDF("qid", "qtext")
    val got = TextStats.bm25TopK(docs, "doc_id", "text", qs,
        "qid", "qtext", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // the model space is docs 1 and 3 only (N = 2, avgdl = 1.5)
    val brute = bm25Brute(Seq((1L, "alpha beta"), (3L, "")), Seq(
      (10L, "alpha"), (20L, "")))
    assert(got.keySet === brute.keySet)
    got.foreach { case (k, s) =>
      assert(s === BigDecimal(brute(k))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got.keySet === Set((10L, 1L), (20L, 3L)))
  }

  test("bm25TopK known-item: a query cut from a document retrieves it " +
      "first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val qs = Seq((2L, "epsilon zeta")).toDF("qid", "qtext")
    val top = TextStats.bm25TopK(docs, "doc_id", "text", qs,
        "qid", "qtext", k = 1).collect()
    assert(top.length === 1)
    assert((top(0).getLong(0), top(0).getLong(1), top(0).getLong(2))
      === ((2L, 1L, 2L)))
  }
}
