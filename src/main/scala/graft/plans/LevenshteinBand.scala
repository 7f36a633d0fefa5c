package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: derive the implied LENGTH-BAND prefilter from an
  * edit-distance predicate. `levenshtein(a, b) <= k` implies
  * `abs(length(a) - length(b)) <= k` (every edit changes the
  * code-point length by at most 1, and both built-ins count code
  * points) — but Catalyst cannot infer it, so a user's fuzzy-match
  * SQL pays the O(|a|·k) banded DP on every row where the O(1) length
  * check already decides. The same move [[graft.queries.Relational]]'s
  * q105 makes by hand for TPC-H Q19's cross-side disjunction, and
  * [[graft.operators.Dedup.editDistancePairs]] makes by hand for its
  * verify join, promoted to an automatic rewrite.
  *
  * The derived conjunct is prepended, so conjunct evaluation
  * short-circuits on the cheap test first. Lossless: on non-null
  * inputs the band is true whenever the original predicate is; on null
  * inputs both are null, and `null AND null = null` filters identically.
  *
  * Recognized shapes (k a non-negative integer literal):
  *   - `levenshtein(a, b) <= k`  /  `levenshtein(a, b) < k`
  *   - `k >= levenshtein(a, b)`  /  `k > levenshtein(a, b)`
  *   - `levenshtein(a, b, thr) >= 0` (the threshold form returns -1
  *     past `thr`, so non-negativity means distance <= thr)
  *
  * Idempotent: a band that is already present (semantically) is not
  * re-added — safe under fixed-point rule batches and re-application.
  * Registered by [[GraftExtensions]] via `injectOptimizerRule` (fresh
  * sessions) or `spark.experimental.extraOptimizations` (live
  * sessions, the public post-optimization hook). */
object LevenshteinBand extends Rule[LogicalPlan] with PredicateHelper {

  private def band(a: Expression, b: Expression, k: Expression)
      : Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def bandOf(p: Expression): Option[Expression] = p match {
    case LessThanOrEqual(Levenshtein(a, b, None), l @ Literal(k: Int, IntegerType))
        if k >= 0 => Some(band(a, b, l))
    case LessThan(Levenshtein(a, b, None), l @ Literal(k: Int, IntegerType))
        if k >= 1 => Some(band(a, b, l))
    case GreaterThanOrEqual(l @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 => Some(band(a, b, l))
    case GreaterThan(l @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 1 => Some(band(a, b, l))
    case GreaterThanOrEqual(Levenshtein(a, b, Some(thr)), Literal(0, IntegerType)) =>
      Some(band(a, b, thr))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bands = conjuncts.flatMap(bandOf)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
        .distinct
      if (bands.isEmpty) f
      else Filter(bands.foldRight(cond)(And(_, _)), child)
  }
}
