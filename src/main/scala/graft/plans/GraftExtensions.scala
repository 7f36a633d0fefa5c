package graft.plans

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

/** SQL surface for the native sketch kernels: every graft expression
  * becomes a `graft_*` SQL function, so the whole dedup/similarity
  * toolbox is usable from `spark.sql(...)` — not just the Scala Column
  * API. Registered the idiomatic Spark way:
  *
  *   - fresh sessions: `spark.sql.extensions=graft.plans.GraftExtensions`
  *     (or `builder.withExtensions(new GraftExtensions)`), the same
  *     injection hook Delta/Iceberg use;
  *   - an existing session: `GraftExtensions.register(spark)`.
  *
  * Tuning parameters (k, bands, nBits, seed) must be literal arguments
  * — they parameterize the kernel itself, not per-row data, exactly
  * like the built-ins' `approx_percentile(col, 0.5)` accuracy argument.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.GraftExtensions", null, name, usage, ""),
        builder))
    }
    GraftExtensions.tableFunctions.foreach { case (name, usage, builder) =>
      e.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.GraftExtensions", null, name, usage, ""),
        builder))
    }
    e.injectOptimizerRule(_ => LevenshteinBand)
  }
}

object GraftExtensions {

  /** Monotonic suffix for [[tableFunctions]]' auto-derived
    * observed-metric names (`graft_bm25_from_index`'s uncapped path)
    * — process-unique is all a metric name needs, and the SQL TVF
    * surface has no parameter to let the caller pick one. */
  private val uncappedSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Builder for the ranked-vs-truth eval TVFs — nDCG, precision/
    * recall, AP share one 9-argument shape `(ranked, qidCol, docCol,
    * rankCol, truth, tQidCol, tDocCol, tRelCol, k)`; one spelling of
    * the plumbing so a signature change or argument-position fix
    * cannot drift between them. */
  private def rankedTruthEvalBuilder(fn: String,
      op: (org.apache.spark.sql.DataFrame, String, String, String,
        org.apache.spark.sql.DataFrame, String, String, String, Int)
        => org.apache.spark.sql.DataFrame)
      : Seq[Expression] => LogicalPlan =
    args => {
      arity(args, 9, fn)
      val s = SparkSession.active
      GraftSqlBridge.plan(op(
        s.table(strLit(args, 0, fn)), strLit(args, 1, fn),
        strLit(args, 2, fn), strLit(args, 3, fn),
        s.table(strLit(args, 4, fn)), strLit(args, 5, fn),
        strLit(args, 6, fn), strLit(args, 7, fn),
        intLit(args, 8, fn)))
    }

  private def intLit(args: Seq[Expression], pos: Int, fn: String): Int =
    args(pos) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }

  private def longLit(args: Seq[Expression], pos: Int, fn: String): Long =
    args(pos) match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  /** (name, usage, builder) for every exposed kernel. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_word_shingles",
      "graft_word_shingles(text, n) - distinct word n-gram shingles",
      args => { arity(args, 2, "graft_word_shingles")
        WordShinglesExpr(args.head, intLit(args, 1, "graft_word_shingles")) }),
    ("graft_word_ngrams",
      "graft_word_ngrams(text, n) - ALL word n-grams in position order " +
        "(multiset; the repetition/decontam/span-scrub kernel)",
      args => { arity(args, 2, "graft_word_ngrams")
        WordNgramsExpr(args.head, intLit(args, 1, "graft_word_ngrams")) }),
    ("graft_char_shingles",
      "graft_char_shingles(text, n) - distinct char n-gram shingles",
      args => { arity(args, 2, "graft_char_shingles")
        CharShinglesExpr(args.head, intLit(args, 1, "graft_char_shingles")) }),
    ("graft_minhash_sig",
      "graft_minhash_sig(shingles, k) - k-permutation MinHash signature",
      args => { arity(args, 2, "graft_minhash_sig")
        MinHashSig(args.head, intLit(args, 1, "graft_minhash_sig")) }),
    ("graft_minhash_band_keys",
      "graft_minhash_band_keys(sig, bands) - LSH band keys of a signature",
      args => { arity(args, 2, "graft_minhash_band_keys")
        MinHashBandKeys(args.head, intLit(args, 1, "graft_minhash_band_keys")) }),
    ("graft_simhash64",
      "graft_simhash64(text) - 64-bit SimHash of whitespace tokens",
      args => { arity(args, 1, "graft_simhash64")
        SimHash64Expr(args.head) }),
    ("graft_text_entropy",
      "graft_text_entropy(text) - Shannon-entropy quality profile: " +
        "struct(word_entropy, char_entropy, top_token_share) in one " +
        "per-row pass (bits; code points include spaces)",
      args => { arity(args, 1, "graft_text_entropy")
        TextEntropyExpr(args.head) }),
    ("graft_winnow_fingerprint",
      "graft_winnow_fingerprint(text, k, w) - winnowed k-gram fingerprints",
      args => { arity(args, 3, "graft_winnow_fingerprint")
        WinnowingFingerprint(args.head,
          intLit(args, 1, "graft_winnow_fingerprint"),
          intLit(args, 2, "graft_winnow_fingerprint")) }),
    ("graft_hyperplane_bucket",
      "graft_hyperplane_bucket(vec, nBits, seed) - signed-projection LSH bucket",
      args => { arity(args, 3, "graft_hyperplane_bucket")
        HyperplaneBucket(args.head,
          intLit(args, 1, "graft_hyperplane_bucket"),
          longLit(args, 2, "graft_hyperplane_bucket")) }),
    ("graft_sorted_intersect_count",
      "graft_sorted_intersect_count(a, b) - |A∩B| of two sorted long arrays",
      args => { arity(args, 2, "graft_sorted_intersect_count")
        SortedIntersectCount(args.head, args(1)) }),
    ("graft_sample_key",
      "graft_sample_key(key, weight, maxWeight) - Efraimidis-Spirakis " +
        "weighted sampling key (min of round(weight) md5 replica " +
        "subkeys, saturating at maxWeight); ORDER BY it ascending " +
        "LIMIT k = exact weighted sample without replacement",
      args => { arity(args, 3, "graft_sample_key")
        SampleKeyExpr(args(0), args(1),
          intLit(args, 2, "graft_sample_key")) }),
    ("graft_gumbel_key",
      "graft_gumbel_key(id, seed) - seeded standard-Gumbel noise for a " +
        "bigint id (Gumbel-top-k device: ORDER BY logw + " +
        "graft_gumbel_key(id, seed) DESC LIMIT k draws a softmax(logw) " +
        "weighted sample without replacement)",
      args => { arity(args, 2, "graft_gumbel_key")
        GumbelKeyExpr(args.head, longLit(args, 1, "graft_gumbel_key")) }),
    ("graft_dot_product",
      "graft_dot_product(a, b) - dot product of two double arrays",
      args => { arity(args, 2, "graft_dot_product")
        DotProduct(args.head, args(1)) }),
    ("graft_misra_gries",
      "graft_misra_gries(value, k) - Misra-Gries heavy-hitter summary " +
        "aggregate: the surviving candidate values (a superset of every " +
        "value with count > N/(k+1); recount exactly downstream)",
      args => { arity(args, 2, "graft_misra_gries")
        MisraGriesAgg(args.head, intLit(args, 1, "graft_misra_gries")) }),
    ("graft_bow_score",
      "graft_bow_score(text, weights_milli) - hashed bag-of-words " +
        "linear score over unigram+bigram features: " +
        "struct(n_features, score_milli). weights_milli is a foldable " +
        "BIGINT array — one milli-unit weight per hash bucket (the " +
        "model, like the tuning literals above: it parameterizes the " +
        "kernel, not per-row data)",
      args => { arity(args, 2, "graft_bow_score")
        val w = args(1) match {
          case e if e.foldable && e.dataType.isInstanceOf[ArrayType] =>
            val elem = e.dataType.asInstanceOf[ArrayType].elementType
            val ad = e.eval().asInstanceOf[ArrayData]
            // guard NULLs explicitly: a NULL model or a NULL weight
            // would otherwise surface as a bare NPE from toLongArray
            if (ad == null) throw new IllegalArgumentException(
              "graft_bow_score: weight table must not be NULL")
            if ((0 until ad.numElements()).exists(ad.isNullAt))
              throw new IllegalArgumentException(
                "graft_bow_score: weight table must not contain NULLs")
            elem match {
              case LongType => ad.toLongArray()
              case IntegerType => ad.toIntArray().map(_.toLong)
              case other => throw new IllegalArgumentException(
                s"graft_bow_score: weight array must be BIGINT/INT, " +
                  s"got array<${other.simpleString}>")
            }
          case other => throw new IllegalArgumentException(
            s"graft_bow_score: argument 2 must be a foldable integer " +
              s"array (the weight table), got $other")
        }
        HashedBowScoreExpr(args.head, w.length, w) }))

  private def strLit(args: Seq[Expression], pos: Int, fn: String): String =
    args(pos) match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a string literal (a " +
          s"table/view name or a column name), got $other")
    }

  /** (name, usage, builder) for every exposed TABLE-VALUED function —
    * the retrieval/eval kernels, which are whole-relation operators
    * (DataFrame → DataFrame), so they register through
    * `injectTableFunction` and appear in the FROM clause, the way the
    * built-in `range(...)` does. Relation arguments are string
    * LITERALS naming a table or temp view, resolved against the
    * active session at analysis time; column names and tuning
    * parameters are literals exactly like the scalar kernels'. */
  val tableFunctions: Seq[(String, String, Seq[Expression] => LogicalPlan)] =
    Seq(
      ("graft_postings",
        "graft_postings(docs, idCol, textCol) - BM25 postings: one " +
          "(doc, token, tf, len) row per distinct (document, term)",
        args => { arity(args, 3, "graft_postings")
          val s = SparkSession.active
          GraftSqlBridge.plan(graft.operators.TextStats.postings(
            s.table(strLit(args, 0, "graft_postings")),
            strLit(args, 1, "graft_postings"),
            strLit(args, 2, "graft_postings"))) }),
      ("graft_bm25_topk",
        "graft_bm25_topk(docs, idCol, textCol, queries, qidCol, " +
          "qtextCol, k[, k1Milli, bMilli[, maxDocFreq]]) - BM25 top-k " +
          "retrieval: (qid, rank, doc, score), rank 1..k per query",
        args => {
          val fn = "graft_bm25_topk"
          if (!Set(7, 9, 10).contains(args.length))
            throw new IllegalArgumentException(
              s"$fn expects 7, 9 or 10 arguments, got ${args.length}")
          val s = SparkSession.active
          GraftSqlBridge.plan(graft.operators.TextStats.bm25TopK(
            s.table(strLit(args, 0, fn)), strLit(args, 1, fn),
            strLit(args, 2, fn),
            s.table(strLit(args, 3, fn)), strLit(args, 4, fn),
            strLit(args, 5, fn),
            intLit(args, 6, fn),
            if (args.length >= 9) intLit(args, 7, fn) else 1200,
            if (args.length >= 9) intLit(args, 8, fn) else 750,
            if (args.length == 10) Some(longLit(args, 9, fn)) else None))
        }),
      ("graft_ndcg_at_k",
        "graft_ndcg_at_k(ranked, qidCol, docCol, rankCol, truth, " +
          "tQidCol, tDocCol, tRelCol, k) - graded-relevance nDCG@k " +
          "per truth query: (qid, dcg, idcg, ndcg)",
        rankedTruthEvalBuilder("graft_ndcg_at_k",
          graft.operators.Eval.ndcgAtK)),
      ("graft_precision_recall_at_k",
        "graft_precision_recall_at_k(ranked, qidCol, docCol, rankCol, " +
          "truth, tQidCol, tDocCol, tRelCol, k) - precision/recall@k " +
          "per truth query with >= 1 positive (rel > 0) judgment: " +
          "(qid, n_rel, hits, p_milli, r_milli), exact integer milli " +
          "units",
        rankedTruthEvalBuilder("graft_precision_recall_at_k",
          graft.operators.Eval.precisionRecallAtK)),
      ("graft_avg_precision_at_k",
        "graft_avg_precision_at_k(ranked, qidCol, docCol, rankCol, " +
          "truth, tQidCol, tDocCol, tRelCol, k) - average " +
          "precision@k (the MAP decomposition) per truth query with " +
          ">= 1 positive judgment: (qid, n_rel, hits, ap_micro), " +
          "exact integer micro units",
        rankedTruthEvalBuilder("graft_avg_precision_at_k",
          graft.operators.Eval.averagePrecisionAtK)),
      ("graft_rrf_fuse",
        "graft_rrf_fuse(runA, runB, qidCol, docCol, rankCol, k[, " +
          "kRrf[, runC, ...]]) - reciprocal-rank fusion of N >= 2 " +
          "retrieval runs (same column names on all): (qid, " +
          "fused_rank, doc, rrf_micro), exact integer micro units. " +
          "Runs beyond the first two are trailing table-name " +
          "literals AFTER kRrf (spell kRrf, default 60, to fuse " +
          "more than two)",
        args => {
          val fn = "graft_rrf_fuse"
          if (args.length < 6)
            throw new IllegalArgumentException(
              s"$fn expects at least 6 arguments, got ${args.length}")
          val s = SparkSession.active
          val extraRuns = args.drop(7).zipWithIndex.map { case (_, i) =>
            s.table(strLit(args, 7 + i, fn))
          }
          GraftSqlBridge.plan(graft.operators.Eval.rrfFuse(
            Seq(s.table(strLit(args, 0, fn)),
              s.table(strLit(args, 1, fn))) ++ extraRuns,
            strLit(args, 2, fn), strLit(args, 3, fn),
            strLit(args, 4, fn), intLit(args, 5, fn),
            if (args.length >= 7) intLit(args, 6, fn) else 60))
        }),
      ("graft_bm25_from_index",
        "graft_bm25_from_index(indexPath, queries, qidCol, qtextCol, " +
          "k, maxDocFreq[, asOf]) - BM25 top-k over an indexIngest " +
          "postings store: (qid, rank, doc, score). maxDocFreq is the " +
          "REQUIRED stop-list choice (the store API's contract); pass " +
          "-1 for uncapped exactness, which attaches a " +
          "candidate-volume observed metric named " +
          "graft_bm25_uncapped:<indexPath>#<n> (auto-unique per call, " +
          "so any number of uncapped retrievals compose in one " +
          "action; use the Scala API's uncappedMetricName to pick a " +
          "stable name a listener can await). asOf pins the snapshot " +
          "after that batch committed",
        args => {
          val fn = "graft_bm25_from_index"
          if (args.length != 6 && args.length != 7)
            throw new IllegalArgumentException(
              s"$fn expects 6 or 7 arguments, got ${args.length}")
          val s = SparkSession.active
          val cap = longLit(args, 5, fn)
          val path = strLit(args, 0, fn)
          GraftSqlBridge.plan(graft.streaming.Streaming.bm25FromIndex(
            s, path,
            s.table(strLit(args, 1, fn)), strLit(args, 2, fn),
            strLit(args, 3, fn), intLit(args, 4, fn),
            maxDocFreq = if (cap < 0) None else Some(cap),
            // observed-metric names must be unique within one action;
            // this SQL surface has no parameter for the name, so it
            // derives one per (store, call) — two uncapped retrievals
            // in one query must compose, not throw
            // DUPLICATED_METRICS_NAME
            uncappedMetricName =
              s"graft_bm25_uncapped:$path#${uncappedSeq.incrementAndGet()}",
            asOf = if (args.length == 7) Some(longLit(args, 6, fn))
              else None))
        }),
      ("graft_ann_from_store",
        "graft_ann_from_store(storePath, queries, qidCol, qvecCol, " +
          "k, nProbe[, asOf]) - ANN top-k over an embIngest IVF " +
          "store: (query_id, rank, neighbor_id, cosine). nProbe = " +
          "nCells probes every cell (exact within the store); asOf " +
          "pins the snapshot after that batch committed",
        args => {
          val fn = "graft_ann_from_store"
          if (args.length != 6 && args.length != 7)
            throw new IllegalArgumentException(
              s"$fn expects 6 or 7 arguments, got ${args.length}")
          val s = SparkSession.active
          GraftSqlBridge.plan(graft.streaming.Streaming.annFromStore(
            s, strLit(args, 0, fn),
            s.table(strLit(args, 1, fn)), strLit(args, 2, fn),
            strLit(args, 3, fn), intLit(args, 4, fn),
            nProbe = intLit(args, 5, fn),
            asOf = if (args.length == 7) Some(longLit(args, 6, fn))
              else None))
        }),
      ("graft_asof_horizon",
        "graft_asof_horizon(storePath) - the store's reconstructible " +
          "snapshot window as (oldest, newest) asOf batch ids (one " +
          "row; empty when no snapshot is valid yet) — the SQL form " +
          "of the alerting probe behind graft_bm25_from_index / " +
          "graft_ann_from_store's asOf argument. Advisory: the " +
          "answer can be stale by the time a query pins it",
        args => { arity(args, 1, "graft_asof_horizon")
          val fn = "graft_asof_horizon"
          val s = SparkSession.active
          import s.implicits._
          val win = graft.streaming.IngestStore
            .asOfHorizon(s, strLit(args, 0, fn))
          GraftSqlBridge.plan(
            win.toSeq.toDF("oldest", "newest"))
        }))

  /** Post-hoc registration into an existing session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, usage, builder) =>
      GraftSqlBridge.registerFunction(spark, name,
        new ExpressionInfo("graft.plans.GraftExtensions", null, name, usage, ""),
        builder)
    }
    tableFunctions.foreach { case (name, usage, builder) =>
      GraftSqlBridge.registerTableFunction(spark, name,
        new ExpressionInfo("graft.plans.GraftExtensions", null, name, usage, ""),
        builder)
    }
    // live sessions can't re-run the extensions hook; the experimental
    // post-optimization batch is the public equivalent for rules
    if (!spark.experimental.extraOptimizations.contains(LevenshteinBand))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinBand
  }
}
