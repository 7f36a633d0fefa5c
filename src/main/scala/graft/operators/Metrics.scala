package graft.operators

import scala.collection.mutable

import org.apache.spark.util.AccumulatorV2

/** Named per-job counters. The reference keeps a per-task map merged by
  * summation on the driver (/root/reference/metric/metrics.go:13-17);
  * a single map-valued AccumulatorV2 gives the same merge semantics
  * without pre-declaring metric names.
  */
final class MetricsAccumulator
    extends AccumulatorV2[(String, Long), Map[String, Long]] {

  private val counts = mutable.HashMap.empty[String, Long]

  override def isZero: Boolean = synchronized(counts.isEmpty)

  override def copy(): MetricsAccumulator = synchronized {
    val c = new MetricsAccumulator
    c.counts ++= counts
    c
  }

  override def reset(): Unit = synchronized(counts.clear())

  override def add(v: (String, Long)): Unit = synchronized {
    counts.update(v._1, counts.getOrElse(v._1, 0L) + v._2)
  }

  override def merge(
      other: AccumulatorV2[(String, Long), Map[String, Long]]): Unit =
    other.value.foreach { case (k, v) => add((k, v)) }

  override def value: Map[String, Long] = synchronized(counts.toMap)
}

/** Plan-level observed metrics — the declarative complement to
  * [[MetricsAccumulator]] (which counts from inside user lambdas).
  * `observe` rides the existing job: metrics are aggregated by the
  * plan itself during the action, with NO second pass over the data
  * and exactly-once semantics per action (an accumulator counts task
  * retries twice; an observation does not) — the Spark-native form of
  * the reference's per-job worker metrics
  * (/root/reference/metric/worker_metrics.go:15-21).
  */
object Metrics {
  import org.apache.spark.sql.{Column, DataFrame, Observation}

  /** BATCH observation: attach named aggregate metrics; read them from
    * the returned Observation after the next action with `get`. (The
    * Observation helper rejects streaming Datasets by design — use
    * [[observedStream]] there.) */
  def observed(df: DataFrame, name: String, metrics: Column*)
      : (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observed needs at least one metric column")
    val obs = new Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** STREAMING observation: per-micro-batch metrics under `name`,
    * surfaced in every `StreamingQueryProgress.observedMetrics` (poll
    * `query.lastProgress` or attach a StreamingQueryListener). Also
    * valid on batch frames for symmetry. */
  def observedStream(df: DataFrame, name: String, metrics: Column*)
      : DataFrame = {
    require(metrics.nonEmpty, "observedStream needs at least one metric column")
    df.observe(name, metrics.head, metrics.tail: _*)
  }
}
