package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the reference has no join
  * operator; SURVEY §2.2 "Joins"). When one join key carries a large
  * share of the rows, a plain hash join sends that whole key to one
  * reducer — the canonical straggler at 100 TB. AQE's skew-join
  * handling covers sort-merge joins after the fact; salting fixes the
  * partitioning itself and also composes with aggregation pushdown.
  *
  * Left rows get a deterministic salt in [0, salts) derived from a
  * caller-chosen column (NOT the join key — e.g. a unique id), and the
  * right side is replicated `salts` ways, so the join becomes an
  * equi-join on (key, salt): each hot key spreads over `salts`
  * partitions while every left row still meets its right-side match
  * exactly once. Shuffle cost: |L| + salts·|R| rows — use when R is
  * too big to broadcast but small enough to replicate.
  */
object SkewJoin {

  /** Inner equi-join on `key` with `salts`-way salting. `saltBy` must
    * be a left-side column expression; results are identical to
    * `left.join(right, key)` for any salts >= 1. */
  def salted(
      left: DataFrame, right: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
