package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-stable dataset splitting and sampling for
  * training pipelines. Assignment is a pure function of the key — no
  * RNG state, no partition dependence — so a row lands in the same
  * split on every engine, every run, and at any scale (the property
  * that makes held-out sets trustworthy across pipeline re-runs).
  *
  * Mechanics: the first 4 hex chars of md5(key) are compared as a
  * string against a threshold. Fixed-width lowercase hex compares
  * lexicographically in numeric order, and md5 is identical everywhere,
  * so the rule ports to any SQL engine verbatim (the oracle gate relies
  * on exactly this). Granularity: 1/65536.
  */
object Sampling {

  private def bucket(keyCol: Column): Column =
    substring(md5(keyCol.cast("string")), 1, 4)

  /** True for the ~`frac` of keys whose bucket falls below the
    * threshold. `frac` rounding to the full 65536 buckets means "all
    * rows": there is no 4-hex threshold above "ffff", so that case is
    * a literal true (a "ffff"-threshold compare would silently strip
    * the 1/65536 of keys whose bucket IS "ffff"). */
  private def selected(keyCol: Column, frac: Double): Column = {
    require(frac >= 0.0 && frac <= 1.0, "fraction must be in [0,1]")
    val t = math.round(frac * 65536).toInt
    if (t >= 65536) lit(true)
    else bucket(keyCol) < lit(f"$t%04x")
  }

  /** Adds a `split` column: "train" for ~`trainFrac` of rows (by
    * md5-bucket of `keyCol`), "test" for the rest. */
  def hashSplit(df: DataFrame, keyCol: String, trainFrac: Double): DataFrame =
    df.withColumn("split",
      when(selected(col(keyCol), trainFrac), "train").otherwise("test"))

  /** Deterministic ~`frac` sample of rows by md5-bucket of `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, frac: Double): DataFrame =
    df.filter(selected(col(keyCol), frac))
}
