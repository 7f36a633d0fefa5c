package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters so
  * graft's native Catalyst expressions (graft.plans) can be exposed as
  * Columns. The one sanctioned pattern for Spark extensions that add
  * expressions without a full SessionExtensions round-trip.
  *
  * VERSION CONTRACT: `org.apache.spark.sql.classic.*` is a
  * Spark-INTERNAL namespace introduced in the 4.0 Connect/classic
  * split and free to move between minor versions. Built and tested
  * against Spark 4.1.x (the `/opt/spark/jars` unmanaged classpath);
  * Spark 3.x lacks the namespace entirely (there,
  * `Column(expr)`/`column.expr` were public), and a future 4.x that
  * relocates `ExpressionUtils` will fail THIS file's compile first —
  * by design, the one file to re-pin. Everything else in the repo
  * reaches internals only through this object.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression into an EXISTING session's function
    * registry (the post-hoc path; fresh sessions get the same set via
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** The analyzed logical plan of a DataFrame — the shape a
    * TABLE-function builder must return (the FROM-clause form of
    * [[registerFunction]]'s expressions). */
  def plan(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** [[registerFunction]] for table-valued functions: post-hoc
    * registration into an existing session's TableFunctionRegistry
    * (fresh sessions get the same set via
    * `SparkSessionExtensions.injectTableFunction`). */
  def registerTableFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** Dev-tool hook ([[graft.Profile]]): block until queued listener
    * events have been delivered, so metrics accumulated by a custom
    * SparkListener are complete when read right after an action. */
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
