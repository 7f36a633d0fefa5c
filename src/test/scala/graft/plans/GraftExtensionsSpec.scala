package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HashFunctions

/** The graft_* SQL functions must be the SAME kernels as the Column
  * API — registered post-hoc or injected at session build — so SQL
  * users get bit-identical sketches. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("register: SQL kernels match the Column API bit-for-bit") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")

    val sql = spark.sql("""
      SELECT id,
             graft_simhash64(text) AS sh,
             graft_word_shingles(text, 3) AS ws,
             graft_word_ngrams(text, 3) AS wn,
             graft_minhash_sig(graft_word_shingles(text, 3), 16) AS sig,
             graft_minhash_band_keys(
               graft_minhash_sig(graft_word_shingles(text, 3), 16), 4) AS bk,
             graft_winnow_fingerprint(text, 8, 8) AS wf
      FROM ext_docs""")
    val api = df.select(col("id"),
      SketchExpressions.simhash64(col("text")).as("sh"),
      SketchExpressions.wordShingles(col("text"), 3).as("ws"),
      SketchExpressions.wordNgrams(col("text"), 3).as("wn"),
      SketchExpressions.minhashSig(
        SketchExpressions.wordShingles(col("text"), 3), 16).as("sig"),
      SketchExpressions.minhashBandKeys(
        SketchExpressions.minhashSig(
          SketchExpressions.wordShingles(col("text"), 3), 16), 4).as("bk"),
      SketchExpressions.winnowFingerprint(col("text"), 8, 8).as("wf"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("graft_sample_key: SQL weighted sampling matches Sampling.weightedTake") {
    GraftExtensions.register(spark)
    val df = (1L to 500L).map(i => (i, if (i % 2 == 0) 7.6 else 1.0))
      .toDF("id", "w")
    df.createOrReplaceTempView("sk_docs")
    // the Column-API recipe (round-half-up weights, saturation at 8)
    val api = graft.operators.Sampling
      .weightedTake(df, "id", col("w"), k = 50, maxWeight = 8)
      .select("id").as[Long].collect().toSet
    // the same recipe spelled in pure SQL via the expression
    val sql = spark.sql("""
      SELECT id FROM sk_docs
      ORDER BY graft_sample_key(CAST(id AS STRING), w, 8), id
      LIMIT 50""").as[Long].collect().toSet
    assert(sql === api)
    // weight 7.6 must round to 8 replicas, not truncate to 7
    val k8 = spark.sql(
      "SELECT graft_sample_key('x', 7.6D, 16) AS k").head().getString(0)
    val k8exact = spark.sql(
      "SELECT graft_sample_key('x', 8, 16) AS k").head().getString(0)
    assert(k8 === k8exact)
    // null semantics match weightedTake's contract on EVERY engine:
    // a null key sorts LAST (the max-hex sentinel — "never selected",
    // not Spark-nulls-first "always selected"); a null weight clamps
    // to one replica
    val nulls = spark.sql("""
      SELECT graft_sample_key(CAST(NULL AS STRING), 3, 8) AS nk,
             graft_sample_key('x', CAST(NULL AS DOUBLE), 8) AS nw,
             graft_sample_key('x', 1, 8) AS w1,
             graft_sample_key('y', 99, 8) AS anyk""").head()
    assert(nulls.getString(0) > nulls.getString(3)) // sentinel sorts last
    assert(nulls.getString(1) === nulls.getString(2)) // null w == w 1
  }

  test("register: scalar kernels evaluate correctly from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT graft_sorted_intersect_count(
               array(1L, 3L, 5L, 7L), array(3L, 4L, 5L, 9L)) AS ic,
             graft_dot_product(array(1.0D, 2.0D, 3.0D),
                               array(4.0D, 5.0D, 6.0D)) AS dp,
             graft_simhash64('a b c') AS sh""").head()
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === 32.0)
    assert(r.getLong(2) === HashFunctions.simhash64(Array("a", "b", "c")))
  }

  test("sketch parameters must be literals") {
    GraftExtensions.register(spark)
    Seq(1L).toDF("k").createOrReplaceTempView("ext_k")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array('a'), k) FROM ext_k").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("withExtensions: a freshly built session gets the functions injected") {
    val prev = spark // keep the shared fixture alive and restore after
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = s2.sql("SELECT graft_simhash64('x y z') AS sh").head().getLong(0)
      assert(got === HashFunctions.simhash64(Array("x", "y", "z")))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_bow_score: SQL matches the operator, model must be foldable") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, "x")).toDF("doc_id", "text")
    df.createOrReplaceTempView("bow_docs")
    val w = Array.tabulate(8)(i => (i.toLong * 7L) % 21L - 10L)
    val lit = w.mkString("array(", "L, ", "L)")
    val got = spark.sql(
      s"SELECT doc_id, graft_bow_score(text, $lit) AS s FROM bow_docs")
      .select($"doc_id", $"s.n_features", $"s.score_milli")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = graft.operators.TextStats
      .hashedBowScore(df, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_bow_score(text, array(doc_id)) FROM bow_docs").collect()
    }
    assert(e.getMessage.contains("foldable"))
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT graft_bow_score('a', CAST(NULL AS ARRAY<BIGINT>))").collect()
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("graft_gumbel_key: SQL matches the kernel, seed changes the draw") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("gk_ids")
    val got = spark.sql(
      "SELECT id, graft_gumbel_key(id, 7) AS g FROM gk_ids")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def kernel(id: Long, seed: Long): Double = {
      val h = graft.functions.VectorFunctions.Planes
        .splitmix64(id * 0x9e3779b97f4a7c15L + seed)
      val u = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0
      -math.log(-math.log(u))
    }
    for (id <- 1L to 3L) assert(got(id) === kernel(id, 7L))
    val other = spark.sql(
      "SELECT id, graft_gumbel_key(id, 8) AS g FROM gk_ids")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(other !== got)
  }

  test("LevenshteinBand: a fuzzy-match filter gains the implied " +
      "length-band prefilter; results unchanged; rule is idempotent") {
    GraftExtensions.register(spark) // adds the rule to the live session
    val df = Seq((1L, "kitten", "sitting"), (2L, "abc", "abd"),
      (3L, "short", "a much longer string than that"))
      .toDF("id", "a", "b")
    val q = df.filter(expr("levenshtein(a, b) <= 2")).select("id")
    assert(q.collect().map(_.getLong(0)).toSet === Set(2L))
    // threshold form: non-negativity means "within thr"
    val q2 = df.filter(expr("levenshtein(a, b, 2) >= 0")).select("id")
    assert(q2.collect().map(_.getLong(0)).toSet === Set(2L))
    // plan shape over a real scan (a local relation constant-folds
    // away before the band could be observed): the band conjunct is
    // present and precedes the DP predicate
    val docs = spark.read
      .parquet(sf("sf0.001") + "/documents.parquet")
    val qp = docs.filter(expr("levenshtein(text, source) <= 2"))
      .select("doc_id")
    val optimized = qp.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs(") && optimized.contains("length("),
      optimized)
    assert(optimized.indexOf("abs(") < optimized.indexOf("levenshtein("),
      optimized)
    // idempotence: re-applying the rule to an already-banded plan is
    // a no-op (no duplicate conjuncts under repeated batches)
    val once = LevenshteinBand(qp.queryExecution.optimizedPlan)
    assert(once.toString === LevenshteinBand(once).toString)
    // the band never flips a verdict: a pair INSIDE the band but past
    // the distance stays filtered, one outside the band never runs
    // the DP (same answer either way — semantic no-op)
    val brute = df.collect().filter { r =>
      val (x, y) = (r.getString(1), r.getString(2))
      // textbook DP
      val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length) <= 2
    }.map(_.getLong(0)).toSet
    assert(q.collect().map(_.getLong(0)).toSet === brute)
  }

  test("graft_text_entropy: SQL matches the operator") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "汉 字 汉"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("ent_docs")
    val got = spark.sql(
      "SELECT doc_id, graft_text_entropy(text) AS e FROM ent_docs")
      .select($"doc_id",
        round($"e.word_entropy", 4), round($"e.char_entropy", 4),
        round($"e.top_token_share", 4))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val want = graft.operators.TextStats
      .entropyProfile(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === want)
    assert(got(1L)._1 === 0.0 && got(1L)._3 === 1.0)
  }

  test("graft_misra_gries: candidates are a superset of every value " +
      "with count > N/(k+1), at any partition layout; k must be literal") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val toks = (1 to 4000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 50) s"hot${rnd.nextInt(3)}"
      else if (r < 75) s"warm${rnd.nextInt(20)}"
      else s"tail${rnd.nextInt(800)}"
    }
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toLong
    for (k <- Seq(4, 25); parts <- Seq(1, 13)) {
      val qualifying = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
      toks.toDF("tok").repartition(parts).createOrReplaceTempView("mg_toks")
      val cands = spark.sql(
        s"SELECT graft_misra_gries(tok, $k) AS c FROM mg_toks")
        .collect().head.getSeq[String](0).toSet
      assert(cands.size <= k, s"k=$k parts=$parts: summary exceeds k")
      assert(qualifying.subsetOf(cands),
        s"k=$k parts=$parts: lost ${qualifying.diff(cands)}")
    }
    val err = intercept[Exception] {
      spark.sql("SELECT graft_misra_gries(tok, doc_id) FROM " +
        "(SELECT tok, 1 AS doc_id FROM mg_toks)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("the README heavy-hitter SQL spelling (sketch -> recount) " +
      "matches TextStats.heavyHitters") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(41)
    val docs = (1L to 60L).map { id =>
      val words = (1 to 25).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 40) s"hot${rnd.nextInt(2)}"
        else if (r < 70) s"warm${rnd.nextInt(8)}"
        else s"tail${rnd.nextInt(300)}"
      }
      (id, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val k = 10
    df.select(explode(graft.functions.TextFunctions.tokens(col("text")))
      .as("tok")).createOrReplaceTempView("hh_toks")
    // the exact spelling README.md documents: one MG sketch pass, one
    // exact recount over candidates only, threshold count·(k+1) > N
    val sql = spark.sql(s"""
      WITH s AS (SELECT graft_misra_gries(tok, $k) cand, count(*) n
                 FROM hh_toks),
      c AS (SELECT explode(cand) tok FROM s)
      SELECT t.tok, count(*) cnt FROM hh_toks t JOIN c USING (tok)
      GROUP BY t.tok HAVING count(*) * ${k + 1} > (SELECT n FROM s)""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val api = graft.operators.TextStats.heavyHitters(df, "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sql === api && api.nonEmpty)
  }

  test("table functions: graft_postings / graft_bm25_topk / " +
      "graft_ndcg_at_k in the FROM clause match the operators " +
      "bit-for-bit, and non-literal or wrong-arity arguments refuse") {
    import graft.operators.{Eval, TextStats}
    GraftExtensions.register(spark)
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "alpha alpha zeta"), (4L, "gamma zeta eta"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tvf_docs")
    val qs = Seq((10L, "alpha beta"), (20L, "gamma zeta"))
      .toDF("qid", "qtext")
    qs.createOrReplaceTempView("tvf_qs")
    def bitEq(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    assert(bitEq(
      spark.sql("SELECT * FROM graft_postings('tvf_docs', 'doc_id', 'text')"),
      TextStats.postings(docs, "doc_id", "text")))
    val apiRanked = TextStats.bm25TopK(docs, "doc_id", "text",
      qs, "qid", "qtext", k = 3)
    assert(bitEq(
      spark.sql("""SELECT * FROM graft_bm25_topk('tvf_docs', 'doc_id',
        'text', 'tvf_qs', 'qid', 'qtext', 3)"""),
      apiRanked))
    // the 10-arg form: explicit k1/b plus a df cap — same kernel
    assert(bitEq(
      spark.sql("""SELECT * FROM graft_bm25_topk('tvf_docs', 'doc_id',
        'text', 'tvf_qs', 'qid', 'qtext', 3, 1500, 600, 2)"""),
      TextStats.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext",
        k = 3, k1Milli = 1500, bMilli = 600, maxDocFreq = Some(2L))))

    apiRanked.createOrReplaceTempView("tvf_ranked")
    val truth = Seq((10L, 1L, 3L), (10L, 2L, 1L), (20L, 4L, 2L))
      .toDF("qid", "doc", "rel")
    truth.createOrReplaceTempView("tvf_truth")
    assert(bitEq(
      spark.sql("""SELECT * FROM graft_ndcg_at_k('tvf_ranked', 'qid',
        'doc', 'rank', 'tvf_truth', 'qid', 'doc', 'rel', 3)"""),
      Eval.ndcgAtK(apiRanked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 3)))
    assert(bitEq(
      spark.sql("""SELECT * FROM graft_precision_recall_at_k(
        'tvf_ranked', 'qid', 'doc', 'rank', 'tvf_truth', 'qid',
        'doc', 'rel', 3)"""),
      Eval.precisionRecallAtK(apiRanked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 3)))
    assert(bitEq(
      spark.sql("""SELECT * FROM graft_avg_precision_at_k(
        'tvf_ranked', 'qid', 'doc', 'rank', 'tvf_truth', 'qid',
        'doc', 'rel', 3)"""),
      Eval.averagePrecisionAtK(apiRanked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 3)))

    val runB = TextStats.bm25TopK(docs, "doc_id", "text",
      qs, "qid", "qtext", k = 3, k1Milli = 1500, bMilli = 300)
    runB.createOrReplaceTempView("tvf_run_b")
    assert(bitEq(
      spark.sql("""SELECT * FROM graft_rrf_fuse('tvf_ranked',
        'tvf_run_b', 'qid', 'doc', 'rank', 2)"""),
      Eval.rrfFuse(Seq(apiRanked, runB), "qid", "doc", "rank", k = 2)))

    // refuse-loudly: wrong arity and a non-literal relation argument
    intercept[Exception](spark.sql(
      """SELECT * FROM graft_bm25_topk('tvf_docs', 'doc_id', 'text',
        'tvf_qs', 'qid', 'qtext', 3, 1200)""").collect())
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_postings(upper('tvf_docs'), 'doc_id', 'text')")
      .collect())
  }

  test("store-backed table functions: graft_bm25_from_index / " +
      "graft_ann_from_store query the streaming stores from SQL, " +
      "bit-identical to the Scala API, including the asOf form") {
    import graft.streaming.Streaming
    GraftExtensions.register(spark)
    def bitEq(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString

    val idxDir = tmp("graft-tvf-idx")
    Streaming.indexIngestBatch(
      Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
        (3L, "alpha zeta")).toDF("doc_id", "text"),
      0L, idxDir, "doc_id", "text", compactEvery = 0)
    Streaming.indexIngestBatch( // redact doc 3 in a live slice
      Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      1L, idxDir, "doc_id", "text", compactEvery = 0)
    Seq((10L, "alpha beta"), (20L, "gamma"))
      .toDF("qid", "qtext").createOrReplaceTempView("tvf_store_qs")
    // the API side carries a DISTINCT observed-metric name: bitEq
    // unions both plans into one action, and the SQL form pins the
    // default graft_bm25_uncapped name (documented in its usage)
    assert(bitEq(
      spark.sql(s"""SELECT * FROM graft_bm25_from_index('$idxDir',
        'tvf_store_qs', 'qid', 'qtext', 3, -1)"""),
      Streaming.bm25FromIndex(spark, idxDir,
        spark.table("tvf_store_qs"), "qid", "qtext", k = 3,
        maxDocFreq = None, uncappedMetricName = "tvf_check_live")))
    assert(bitEq( // asOf 0: the redaction is invisible in the snapshot
      spark.sql(s"""SELECT * FROM graft_bm25_from_index('$idxDir',
        'tvf_store_qs', 'qid', 'qtext', 3, -1, 0)"""),
      Streaming.bm25FromIndex(spark, idxDir,
        spark.table("tvf_store_qs"), "qid", "qtext", k = 3,
        maxDocFreq = None, asOf = Some(0L),
        uncappedMetricName = "tvf_check_asof")))

    val embDir = tmp("graft-tvf-emb")
    Streaming.embIngestBatch(
      Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
        (3L, Seq(0.7, 0.7))).toDF("vec_id", "embedding"),
      0L, embDir, "vec_id", "embedding", nCells = 2, compactEvery = 0)
    Seq((9L, Seq(0.9, 0.1)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("tvf_vq")
    assert(bitEq(
      spark.sql(s"""SELECT * FROM graft_ann_from_store('$embDir',
        'tvf_vq', 'vec_id', 'embedding', 2, 2)"""),
      Streaming.annFromStore(spark, embDir, spark.table("tvf_vq"),
        "vec_id", "embedding", k = 2, nProbe = 2)))
  }

  test("TVF composition: two uncapped graft_bm25_from_index calls " +
      "share one action (auto-unique metric names, no " +
      "DUPLICATED_METRICS_NAME), and the trailing-run graft_rrf_fuse " +
      "form fuses three runs identically to the Scala API") {
    import graft.operators.{Eval, TextStats}
    import graft.streaming.Streaming
    GraftExtensions.register(spark)
    def bitEq(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-tvf-dup").toString
    Streaming.indexIngestBatch(
      Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
        (3L, "alpha zeta")).toDF("doc_id", "text"),
      0L, idxDir, "doc_id", "text", compactEvery = 0)
    Seq((10L, "alpha beta"), (20L, "gamma"))
      .toDF("qid", "qtext").createOrReplaceTempView("tvf_dup_qs")
    // two UNCAPPED store retrievals in ONE action — the r10 fixed
    // default name threw DUPLICATED_METRICS_NAME on exactly this
    val both = spark.sql(
      s"""SELECT * FROM graft_bm25_from_index('$idxDir',
            'tvf_dup_qs', 'qid', 'qtext', 3, -1)
          UNION ALL
          SELECT * FROM graft_bm25_from_index('$idxDir',
            'tvf_dup_qs', 'qid', 'qtext', 3, -1)""").collect()
    assert(both.length % 2 === 0 && both.nonEmpty)

    // three-run fusion: runs beyond the first two trail AFTER kRrf
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "alpha alpha zeta"), (4L, "gamma zeta eta"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "alpha beta"), (20L, "gamma zeta"))
      .toDF("qid", "qtext")
    val runs = Seq((1200, 750), (1500, 300), (300, 900)).map {
      case (k1, b) => TextStats.bm25TopK(docs, "doc_id", "text",
        qs, "qid", "qtext", k = 3, k1Milli = k1, bMilli = b)
    }
    runs.zipWithIndex.foreach { case (r, i) =>
      r.createOrReplaceTempView(s"tvf_fuse_$i")
    }
    assert(bitEq(
      spark.sql("""SELECT * FROM graft_rrf_fuse('tvf_fuse_0',
        'tvf_fuse_1', 'qid', 'doc', 'rank', 2, 60, 'tvf_fuse_2')"""),
      Eval.rrfFuse(runs, "qid", "doc", "rank", k = 2)))
    // a non-literal trailing run name refuses like every relation arg
    intercept[Exception](spark.sql(
      """SELECT * FROM graft_rrf_fuse('tvf_fuse_0', 'tvf_fuse_1',
        'qid', 'doc', 'rank', 2, 60, upper('tvf_fuse_2'))""").collect())
  }

  test("graft_asof_horizon TVF: matches IngestStore.asOfHorizon on a " +
      "live store and returns zero rows when no snapshot is valid") {
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tvf-horizon").toString
    (0L to 3L).foreach { b =>
      graft.streaming.Streaming.writeBatch(
        Seq(b).toDF("v"), dir, "parquet", b)
    }
    val got = spark.sql(s"SELECT * FROM graft_asof_horizon('$dir')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === graft.streaming.IngestStore
      .asOfHorizon(spark, dir).toSeq)
    assert(got === Seq((0L, 3L)))
    val empty = java.nio.file.Files
      .createTempDirectory("graft-tvf-horizon-empty").toString
    assert(spark.sql(
      s"SELECT * FROM graft_asof_horizon('$empty')").count() === 0L)
  }
}
