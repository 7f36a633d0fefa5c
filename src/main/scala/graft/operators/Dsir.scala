package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{SketchExpressions => SK, TextModelExpressions => TM}

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169 — public literature): estimate
  * hashed-n-gram feature distributions for a small TARGET corpus (the
  * domain you want more of) and the large RAW corpus, weight every raw
  * document by its log importance ratio under the two models, and
  * resample the raw corpus by those weights. The selection machinery
  * behind "make the web crawl look like Wikipedia".
  *
  * Feature space: every unigram and word-bigram occurrence hashed into
  * `dims` buckets — byte-identical tokenization and hash to the q120
  * quality classifier ([[graft.plans.HashedFeatureBucketsExpr]]), so
  * the DuckDB oracle toolkit that gates q120 ports this operator too.
  * Bucket models are add-alpha smoothed categoricals:
  * p̂(b) = (count(b) + α) / (N + α·dims); a document's log importance
  * weight is Σ_features [ln p̂_target(b) − ln p̂_raw(b)].
  *
  * Scale shape (the 100 TB contract):
  *   - both distribution estimates are ONE partial+final count per
  *     corpus on the bucket key, bounded by `dims` output rows — the
  *     raw corpus is never collected, sorted, or windowed;
  *   - the per-bucket log-ratio table is at most `dims` rows and joins
  *     the scoring stream under an explicit `broadcast()` hint (the
  *     same model-sized-broadcast contract as q120's weight table;
  *     `dims` ≤ ~2^22 keeps it executor-memory-trivial);
  *   - scoring is explode → broadcast-join → per-doc partial+final
  *     sum: one id-keyed exchange of (id, partial-sum) rows, no text
  *     in any shuffle;
  *   - the raw feature lineage is consumed twice (distribution count +
  *     scoring) — the repo's no-persist stance, same two-pass trade as
  *     [[Dedup.dupSpanScrub]]; a caller scoring one corpus against
  *     many targets should persist `featureStream(raw)` once.
  *
  * Float contract: per-bucket λ is four `ln` calls in a pinned
  * left-associative order, summed per doc and rounded to 4 decimals —
  * the established oracle-parity recipe of q69/q86 (summation-order
  * ulps are absorbed by the rounding).
  */
object Dsir {

  /** (id, b) per feature OCCURRENCE — null texts drop here (they
    * rejoin as null-scored rows in [[importanceWeights]]). */
  private[graft] def featureStream(
      df: DataFrame, idCol: String, textCol: String,
      dims: Int, spread: Boolean): DataFrame =
    Spread(df, spread).select(
      col(idCol).as("id"),
      explode(TM.hashedFeatureBuckets(col(textCol), dims)).as("b"))

  /** Per-bucket log importance ratio λ_b over the RAW corpus' buckets
    * (buckets absent from raw can never be scored — raw docs are the
    * only scoring subjects). The corpus totals N_raw/N_target ride an
    * UNPARTITIONED window over the full-outer-joined bucket aggregate —
    * a single task over at most 2·`dims` rows, bounded by the same
    * executor-memory contract the broadcast λ table already imposes —
    * instead of scalar subqueries, whose separate executions would
    * re-derive a full feature pass each (measured: the subquery
    * spelling doubled the query's corpus passes and tripled its job
    * count under a TakeOrdered consumer). The full-outer join keeps
    * target-only buckets IN the N_target sum (λ is then computed on
    * the raw-present rows only).
    */
  private def bucketLogRatios(
      rawFeats: DataFrame, targetFeats: DataFrame,
      dims: Int, alpha: Double): DataFrame = {
    val rc = rawFeats.groupBy("b").agg(count(lit(1)).as("cr"))
    val tc = targetFeats.groupBy("b").agg(count(lit(1)).as("ct"))
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    rc.join(tc, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
      .withColumn("nr", sum(col("cr")).over(wAll))
      .withColumn("nt", sum(col("ct")).over(wAll))
      .filter(col("cr") > 0)
      .select(col("b"),
        (log(col("ct").cast("double") + lit(alpha)) -
          log(col("nt").cast("double") + lit(alpha * dims)) -
          log(col("cr").cast("double") + lit(alpha)) +
          log(col("nr").cast("double") + lit(alpha * dims))).as("lam"))
  }

  /** Per-raw-document DSIR log importance weight. Output:
    * (id, n_features, logw) — `n_features` the occurrence count,
    * `logw` the rounded log weight; a zero-feature doc (all-space
    * text) scores (0, 0.0), a null text scores (null, null), matching
    * the q120 null contract. */
  def importanceWeights(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      dims: Int = 1 << 16, alpha: Double = 1.0,
      spread: Boolean = true): DataFrame = {
    require(dims > 0, "dims must be positive")
    require(alpha > 0.0, "alpha must be positive (add-alpha smoothing)")
    val rf = featureStream(raw, idCol, textCol, dims, spread)
    val tf = featureStream(target, idCol, textCol, dims, spread)
    val lam = bucketLogRatios(rf, tf, dims, alpha)
    val scored = rf.join(broadcast(lam), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("nf"), sum(col("lam")).as("s"))
    raw.select(col(idCol).as("id"), col(textCol).isNull.as("tnull"))
      .join(scored, Seq("id"), "left_outer")
      .select(col("id"),
        when(col("tnull"), lit(null))
          .otherwise(coalesce(col("nf"), lit(0L)))
          .cast("long").as("n_features"),
        when(col("tnull"), lit(null))
          .otherwise(round(coalesce(col("s"), lit(0.0)), 4))
          .cast("double").as("logw"))
  }

  /** Gumbel-top-k importance resampling over precomputed weights
    * (id, logw): add seeded per-id Gumbel(0,1) noise to the log
    * weights and keep the k largest keys — a weighted sample WITHOUT
    * replacement with P(doc first) = softmax(logw), i.e. exactly the
    * DSIR resampling step (the Gumbel-max trick). `seed = None` drops
    * the noise: deterministic top-k by weight (the "top-k variant"
    * the DSIR paper also evaluates).
    *
    * Selection is `orderBy(...).limit(k)` — Spark's distributed
    * TakeOrderedAndProject (per-partition top-k, k-sized merge), never
    * a corpus-wide single-partition window; ranks are assigned by a
    * window over the ALREADY k-bounded survivors. The key rounds to 3
    * decimals (on top of logw's 4) so engine-side last-ulp `ln`
    * differences in the Gumbel draw cannot flip a reported value;
    * ties break by id.
    */
  def gumbelTopK(
      weights: DataFrame, idCol: String, logwCol: String,
      k: Int, seed: Option[Long] = Some(42L)): DataFrame = {
    require(k > 0, "k must be positive")
    val keyed = weights.select(
      col(idCol).as("id"),
      col(logwCol).as("logw"),
      (seed match {
        case Some(s) =>
          round(col(logwCol) + SK.gumbelKey(col(idCol).cast("long"), s), 3)
        case None => col(logwCol)
      }).as("key"))
    keyed
      .orderBy(col("key").desc_nulls_last, col("id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("key").desc_nulls_last, col("id"))))
      .select(col("id"), col("rank").cast("long").as("rank"),
        col("key"), col("logw"))
  }
}
