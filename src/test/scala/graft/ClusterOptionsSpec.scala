package graft

import org.apache.spark.SparkConf

/** The cluster-option facade: reference options must land on the Spark
  * confs that govern the same behavior, with defaults mirroring the
  * reference's (cluster/options.go:11-33). */
class ClusterOptionsSpec extends SparkSpec {

  test("defaults mirror the reference option defaults") {
    val c = Cluster.Options().toConf
    assert(c("spark.network.timeout") === "3s")
    assert(c("spark.shuffle.io.maxRetries") === "10")
    assert(c("spark.shuffle.io.retryWait") === "200ms")
    assert(c("spark.rpc.message.maxSize") === "500")
    assert(c("spark.executor.heartbeatInterval") === "10s")
    // no compressor requested → Spark's own codec default (lz4, same as
    // the reference's lz4 encoding) is left untouched
    assert(!c.contains("spark.io.compression.codec"))
  }

  test("compressor lands in the conf; unknown codecs rejected eagerly") {
    val conf = Cluster.Options(compressor = Some("zstd"))
      .applyTo(new SparkConf(loadDefaults = false))
    assert(conf.get("spark.io.compression.codec") === "zstd")
    assert(conf.get("spark.shuffle.compress") === "true")
    // gzip is a reference codec but not a Spark block codec: fail at
    // construction, not at first shuffle
    intercept[IllegalArgumentException] {
      Cluster.Options(compressor = Some("gzip"))
    }
  }

  test("every entry survives application to a SparkConf") {
    val opts = Cluster.Options(
      connectTimeout = "7s", connectRetryCount = 3,
      connectRetryDelay = "50ms", maxMessageSizeMb = 128,
      livenessProbeInterval = "5s", compressor = Some("lz4"))
    val conf = opts.applyTo(new SparkConf(loadDefaults = false))
    opts.toConf.foreach { case (k, v) => assert(conf.get(k) === v, k) }
  }
}
