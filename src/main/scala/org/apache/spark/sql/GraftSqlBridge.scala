package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters so
  * graft's native Catalyst expressions (graft.plans) can be exposed as
  * Columns. The one sanctioned pattern for Spark extensions that add
  * expressions without a full SessionExtensions round-trip.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
