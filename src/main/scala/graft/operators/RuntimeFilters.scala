package graft.operators

import org.apache.spark.sql.SparkSession

/** Runtime bloom-filter join pruning — the knob surface over Spark's
  * `InjectRuntimeFilter` rule (public Spark: SPARK-32268), the
  * optimization that matters most for the selective-dim ⋈ giant-fact
  * joins a 100 TB corpus runs all day: a bloom filter aggregated from
  * the FILTERED dim keys is injected as a semi-join predicate on the
  * fact side BEFORE its shuffle, so fact rows that cannot match are
  * dropped at the scan instead of riding the exchange. Shuffle volume
  * falls by roughly the dim filter's selectivity at the cost of one
  * model-sized bloom build (an ObjectHashAggregate of
  * `bloom_filter_agg`, partial+final — never a driver collect).
  *
  * Spark 4.x enables the rule by default but guards it with
  * cluster-sized thresholds: the creation side must scan under
  * `creationSideThreshold` (default 10MB) and the application side
  * over `applicationSideScanSizeThreshold` (default 10GB) before the
  * filter is injected — on a mid-sized corpus the rule silently never
  * fires. [[tuneForScale]] widens exactly those two thresholds; the
  * injection semantics themselves are pinned by RuntimeFiltersSpec so
  * an upgrade that renames a conf or flips the default fails CI, not
  * a cluster run.
  *
  * These are runtime SQL confs (safe to set on a live session),
  * unlike the startup transport knobs in [[graft.Cluster.Options]].
  */
object RuntimeFilters {

  val EnabledKey = "spark.sql.optimizer.runtime.bloomFilter.enabled"
  val CreationSideKey =
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
  val ApplicationSideKey =
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"

  // getOption resolves the registered SQLConf DEFAULT (true on Spark
  // 4.x) — `conf.get(key, fallback)` would return the fallback for an
  // unset conf and misreport the rule as disabled
  def isEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(EnabledKey).exists(_.toBoolean)

  /** Widen the injection thresholds for a deployment's actual table
    * sizes: `creationSideThreshold` caps how large a (filtered) dim
    * side may be and still pay for a bloom build;
    * `applicationSideScanSizeThreshold` is the minimum fact-scan size
    * worth pruning. Spark's defaults (10MB / 10GB) are conservative
    * for clusters; pipelines whose dims run to hundreds of MB raise
    * the former, and local/mid-scale runs lower the latter. Values are
    * Spark byte-size strings ("100MB", "0"). */
  def tuneForScale(
      spark: SparkSession,
      creationSideThreshold: String = "100MB",
      applicationSideScanSizeThreshold: String = "1GB"): Unit = {
    spark.conf.set(EnabledKey, "true")
    spark.conf.set(CreationSideKey, creationSideThreshold)
    spark.conf.set(ApplicationSideKey, applicationSideScanSizeThreshold)
  }
}
