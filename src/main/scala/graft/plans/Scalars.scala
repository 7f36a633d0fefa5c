package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery

/** One-row aggregates as in-plan scalar-subquery expressions: the
  * subquery runs as its own (tiny) stage and its single value feeds
  * the main plan as a runtime literal. Fully lazy — no driver-side
  * action at plan-build time — and no join appears in the plan (a
  * `crossJoin(broadcast(oneRowDf))` spelling plans as a
  * BroadcastNestedLoopJoin, which the dedup plan contracts forbid
  * outright, and a constant-key equi-join folds back to the same).
  * Used for corpus counts that parameterize df-caps, grid sizes and
  * IDF weights.
  */
object Scalars {
  def of(agg: DataFrame): Column =
    GraftSqlBridge.column(ScalarSubquery(agg.queryExecution.analyzed))
}
