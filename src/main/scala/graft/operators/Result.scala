package graft.operators

import org.apache.spark.sql.Dataset

/** R1 — attached-run result (reference driver/result.go): rows stream
  * back while the job runs (`outputs` = toLocalIterator, Spark's
  * incremental collect), metrics from the accumulator.
  */
final class Result private[operators] (
    ds: Dataset[KV],
    acc: MetricsAccumulator) {

  /** Streaming collect — partitions are fetched incrementally, so the
    * driver never holds the full result (reference Result.Outputs()). */
  def outputs: Iterator[KV] = {
    import scala.jdk.CollectionConverters._
    ds.toLocalIterator().asScala
  }

  /** Convenience for tests — full materialization. */
  def collect(): Seq[KV] = ds.collect().toSeq

  /** Job metrics; call after draining outputs (reference semantics:
    * Metrics() reflects completed tasks). */
  def metrics: Map[String, Long] = acc.value
}
