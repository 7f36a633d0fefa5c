package graft

/** Guards the driver contract: `SparkEntry.entry` must return rows at
  * sf0.001 (the driver smoke-checks rows > 0), and every query name
  * must have either an oracle or an intentional rows-only note. */
class EntrySpec extends SparkSpec {

  test("entry (flagship corpus-cleaning pipeline) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and oracle coverage is intentional") {
    val rowsOnly = Set(
      "q25_dedup_simhash",   // simhash space not portable SQL
      "q28_sim_topk_lsh",    // hyperplane-LSH space not portable SQL
      "q29_sim_topk_ivf",    // IVF centroid space not portable SQL
      "q43_dedup_winnowing") // winnowing hash space not portable SQL
    val qs = SparkEntry.queries
    assert(qs.keySet.diff(SparkEntry.oracleSql.keySet) === rowsOnly)
    // every query must at least execute on the smallest scale factor
    qs.foreach { case (name, fn) =>
      fn(spark, sf("sf0.001")).count() // throws on any broken query
      ()
    }
  }
}
