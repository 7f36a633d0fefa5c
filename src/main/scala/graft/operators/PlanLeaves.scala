package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** The one place that knows how a checkpointed Dataset surfaces in its
  * analyzed plan (a `LogicalRDD` leaf over the materialized RDD). Both
  * iterative operators ([[ConnectedComponents]]'s alternating-star
  * loop, [[Similarity.mmrSelect]]'s greedy rounds) release superseded
  * checkpoints through this extraction, so a Spark upgrade that
  * changes the leaf shape is fixed in one file instead of drifting
  * copies. */
private[graft] object PlanLeaves {

  /** The materialized RDD behind a (local- or reliably-) checkpointed
    * DataFrame, if its plan is the expected leaf shape. */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

  /** Alias kept for call-site readability where only local checkpoints
    * can occur. */
  def localCheckpointRdd(df: DataFrame): Option[RDD[_]] = checkpointRdd(df)
}
