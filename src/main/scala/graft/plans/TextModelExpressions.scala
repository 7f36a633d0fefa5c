package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed bag-of-words linear scorer — the fastText-shaped model-based
  * quality filter (Joulin et al. 2016; the classifier-filter stage of
  * GPT-3/LLaMA/FineWeb-style curation pipelines): every unigram and
  * word-bigram of the document is hashed into one of `dims` buckets
  * ([[graft.functions.HashFunctions.hash64]], FNV-1a + splitmix64,
  * floor-mod bucketing) and the document's raw score is the sum of the
  * bucket weights, one weight lookup per feature OCCURRENCE.
  *
  * Weights are integers in MILLI units (`weightsMilli(b)` = 1000·w_b),
  * so the fold is exact 64-bit integer arithmetic — no
  * float-summation-order dependence, which is what lets a DuckDB oracle
  * reproduce the score bit-for-bit (the driver gate's hash compare).
  * Callers divide by 1000 once at the end for the real-valued score.
  *
  * Output: struct<n_features: long, score_milli: long>. Consumers must
  * project the struct ONCE and extract fields from the projected
  * attribute in a later select — extracting both fields directly from
  * this expression would evaluate the text pass twice (Catalyst's
  * CollapseProject declines to inline it precisely because it is
  * non-cheap and multiply-referenced, which keeps the two-step spelling
  * safe).
  *
  * Scale contract: the weight table ships inside the serialized
  * expression — once per stage in the task binary, never per row. That
  * is the right shape up to ~2^22 dims (32 MB); a larger production
  * model should ride a `SparkContext.broadcast` consumed from
  * `mapPartitions` instead. Scoring is a per-row expression: no
  * shuffle, no explode, preserves the input partitioning.
  *
  * Reference analogue: the reference exposes per-row Map transforms
  * (`/root/reference/pipeline.go:84` Map) from which users build
  * scoring stages by hand; this is that stage as a first-class,
  * codegen-plan-compatible expression.
  */
case class HashedBowScoreExpr(
    child: Expression, dims: Int, weightsMilli: Array[Long])
    extends UnaryExpression with CodegenFallback {
  require(dims > 0 && weightsMilli.length == dims,
    s"hashed_bow_score: weight table must have exactly dims=$dims entries")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_bow_score expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("score_milli", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    var milli = 0L
    var n = 0L
    def add(f: String): Unit = {
      val h = graft.functions.HashFunctions.hash64(f)
      val b = ((h % dims) + dims) % dims
      milli += weightsMilli(b.toInt)
      n += 1L
    }
    var i = 0
    while (i < toks.length) {
      add(toks(i))
      if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericInternalRow(Array[Any](n, milli))
  }

  override protected def withNewChildInternal(c: Expression): HashedBowScoreExpr =
    copy(child = c)
  override def prettyName: String = "hashed_bow_score"
}

/** One-pass Shannon-entropy profile of a document — the
  * information-theoretic quality signals (Shannon 1948; the
  * low-entropy/gibberish heuristics of public curation stacks such as
  * RedPajama-v2's quality-signal set): degenerate repetitive text
  * scores near-zero word entropy, random-noise text scores near-max
  * character entropy, and a single token dominating the document shows
  * up as `top_token_share` → 1.
  *
  * Output: struct<word_entropy: double, char_entropy: double,
  * top_token_share: double>.
  *   - `word_entropy`   = H over whitespace-token frequencies, in bits,
  *     computed as log2(n) − Σ c·log2(c) / n (the algebraic form a SQL
  *     oracle reproduces from per-token group counts);
  *   - `char_entropy`   = the same H over Unicode CODE POINTS
  *     (including spaces — DuckDB's `string_split(text,'')` unit, so
  *     the oracle splits identically); 0.0 for an empty string;
  *   - `top_token_share` = max token count / n — the mass of the
  *     single most frequent token.
  *
  * Same consumer contract as [[HashedBowScoreExpr]]: project the
  * struct once, extract fields from the projected attribute.
  *
  * Scale contract: per-row expression — no shuffle, no explode, O(len)
  * time and O(distinct tokens) space per document, preserves input
  * partitioning. Reference analogue: a per-row Map transform
  * (`/root/reference/pipeline.go:84`).
  */
case class TextEntropyExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_entropy expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("word_entropy", DoubleType, nullable = false),
    StructField("char_entropy", DoubleType, nullable = false),
    StructField("top_token_share", DoubleType, nullable = false)))

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // words: split(" ", -1) — Spark's split() semantics (keeps empty
    // tokens), matching DuckDB string_split(text, ' ')
    val toks = s.split(" ", -1)
    val n = toks.length
    val wc = new java.util.HashMap[String, Int](n * 2)
    var i = 0
    while (i < n) { wc.merge(toks(i), 1, Integer.sum _); i += 1 }
    var wAcc = 0.0
    var maxC = 0
    val wIt = wc.values().iterator()
    while (wIt.hasNext) {
      val c = wIt.next()
      wAcc += c * log2(c.toDouble)
      if (c > maxC) maxC = c
    }
    val wordH = log2(n.toDouble) - wAcc / n
    // chars: Unicode code points, spaces included
    val cc = new java.util.HashMap[Integer, Int](math.min(s.length, 64) * 2)
    var m = 0
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      cc.merge(cp, 1, Integer.sum _)
      m += 1
      j += Character.charCount(cp)
    }
    var cAcc = 0.0
    val cIt = cc.values().iterator()
    while (cIt.hasNext) { val c = cIt.next(); cAcc += c * log2(c.toDouble) }
    val charH = if (m == 0) 0.0 else log2(m.toDouble) - cAcc / m
    new GenericInternalRow(Array[Any](
      wordH, charH, maxC.toDouble / n))
  }

  override protected def withNewChildInternal(c: Expression): TextEntropyExpr =
    copy(child = c)
  override def prettyName: String = "text_entropy"
}

/** The hashed feature STREAM of a document — every unigram and
  * word-bigram occurrence mapped to its bucket id in [0, dims) — as an
  * array<long>. The feature definition, tokenization (Java
  * `split(' ')`: trailing empties dropped, `""` yields one empty
  * token) and hash (FNV-1a + splitmix64, floor-mod bucketing) are
  * IDENTICAL to [[HashedBowScoreExpr]]'s, byte for byte: q120's
  * DuckDB oracle emulation
  * ([[graft.queries.PortableHashSql]]) therefore ports this expression
  * too. Split out from the scorer because distribution-estimating
  * consumers (DSIR importance weighting, [[graft.operators.Dsir]])
  * need the per-occurrence bucket stream to AGGREGATE over corpora,
  * not a per-doc weighted sum against a fixed table.
  *
  * Scale contract: per-row expression, O(len) time, output bounded by
  * 2·tokens−1 entries; the explode a consumer applies is the same
  * per-doc-bounded shape as the shingle indexes. Null text → null.
  */
case class HashedFeatureBucketsExpr(child: Expression, dims: Int)
    extends UnaryExpression with CodegenFallback {
  require(dims > 0, "hashed_feature_buckets: dims must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_feature_buckets expects string, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    val out = new Array[Any](math.max(0, 2 * toks.length - 1))
    var o = 0
    def add(f: String): Unit = {
      val h = graft.functions.HashFunctions.hash64(f)
      out(o) = ((h % dims) + dims) % dims
      o += 1
    }
    var i = 0
    while (i < toks.length) {
      add(toks(i))
      if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (o == out.length) out else out.take(o))
  }

  override protected def withNewChildInternal(
      c: Expression): HashedFeatureBucketsExpr = copy(child = c)
  override def prettyName: String = "hashed_feature_buckets"
}

object TextModelExpressions {
  def hashedBowScore(text: Column, dims: Int, weightsMilli: Array[Long]): Column =
    GraftSqlBridge.column(
      HashedBowScoreExpr(GraftSqlBridge.expression(text), dims, weightsMilli))

  def textEntropy(text: Column): Column =
    GraftSqlBridge.column(TextEntropyExpr(GraftSqlBridge.expression(text)))

  def hashedFeatureBuckets(text: Column, dims: Int): Column =
    GraftSqlBridge.column(
      HashedFeatureBucketsExpr(GraftSqlBridge.expression(text), dims))
}
