package graft

import org.apache.spark.SparkConf
import org.apache.spark.sql.SparkSession

/** Cluster-level option facade — the Spark mapping of the reference's
  * `cluster/options.go` knobs (reference cluster/options.go:11-33).
  * Each reference option is translated to the Spark conf that governs
  * the same behavior; nothing here invents semantics Spark doesn't
  * have:
  *
  *   - ConnectTimeout            → `spark.network.timeout`
  *   - ConnectRetryCount         → `spark.shuffle.io.maxRetries`
  *   - ConnectRetryDelay         → `spark.shuffle.io.retryWait`
  *   - MaxMessageSize (500mb)    → `spark.rpc.message.maxSize` (MiB)
  *   - LivenessProbeInterval     → `spark.executor.heartbeatInterval`
  *   - Compressor (options.go:39-41, lz4/gzip) →
  *     `spark.io.compression.codec` + `spark.shuffle.compress`. Spark
  *     ships lz4 (its own default), lzf, snappy and zstd; gzip is not a
  *     Spark block codec — callers wanting the reference's
  *     denser-but-slower gzip profile should pass "zstd", its closest
  *     Spark equivalent. Unknown codec names are rejected eagerly here
  *     instead of failing at first shuffle.
  *
  * These are STARTUP confs (they configure the transport and shuffle
  * machinery), so apply them before the SparkContext exists: to a
  * [[SparkSession.Builder]] in embedded use, or to a [[SparkConf]] for
  * spark-submit-style launch. Applying them to an already-running
  * session would be silently ignored by Spark — which is why there is
  * deliberately no `applyTo(SparkSession)` overload.
  */
object Cluster {

  /** Codecs Spark's `spark.io.compression.codec` accepts. */
  val SupportedCodecs: Set[String] = Set("lz4", "lzf", "snappy", "zstd")

  final case class Options(
      connectTimeout: String = "3s",
      connectRetryCount: Int = 10,
      connectRetryDelay: String = "200ms",
      maxMessageSizeMb: Int = 500,
      livenessProbeInterval: String = "10s",
      compressor: Option[String] = None) {
    require(connectRetryCount >= 0, "connectRetryCount must be >= 0")
    // Spark hard-caps spark.rpc.message.maxSize at 2047 MiB (RpcUtils);
    // reject here, not at SparkContext startup — eager failure is this
    // facade's contract
    require(maxMessageSizeMb > 0 && maxMessageSizeMb <= 2047,
      s"maxMessageSizeMb must be in 1..2047 (Spark's RPC cap), " +
        s"got $maxMessageSizeMb")
    require(compressor.forall(SupportedCodecs.contains),
      s"compressor must be one of ${SupportedCodecs.mkString(", ")}; " +
        s"got ${compressor.getOrElse("")} (the reference's gzip maps to zstd)")

    /** The Spark conf entries this option set denotes. */
    def toConf: Map[String, String] = Map(
      "spark.network.timeout" -> connectTimeout,
      "spark.shuffle.io.maxRetries" -> connectRetryCount.toString,
      "spark.shuffle.io.retryWait" -> connectRetryDelay,
      "spark.rpc.message.maxSize" -> maxMessageSizeMb.toString,
      "spark.executor.heartbeatInterval" -> livenessProbeInterval
    ) ++ compressor.map(c => Map(
      "spark.io.compression.codec" -> c,
      "spark.shuffle.compress" -> "true")).getOrElse(Map.empty)

    def applyTo(builder: SparkSession.Builder): SparkSession.Builder =
      toConf.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }

    def applyTo(conf: SparkConf): SparkConf = {
      toConf.foreach { case (k, v) => conf.set(k, v) }
      conf
    }
  }
}
