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

object TextModelExpressions {
  def hashedBowScore(text: Column, dims: Int, weightsMilli: Array[Long]): Column =
    GraftSqlBridge.column(
      HashedBowScoreExpr(GraftSqlBridge.expression(text), dims, weightsMilli))
}
