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
      "q43_dedup_winnowing", // winnowing hash space not portable SQL
      "q85_dedup_semantic")  // k-means cell space not portable SQL
    val qs = SparkEntry.queries
    assert(qs.keySet.diff(SparkEntry.oracleSql.keySet) === rowsOnly)
    // every query must at least execute on the smallest scale factor
    qs.foreach { case (name, fn) =>
      fn(spark, sf("sf0.001")).count() // throws on any broken query
      ()
    }
  }

  test("rows-only queries pin golden row counts at the gate SF") {
    // q25/q28/q29/q43 have no DuckDB oracle (non-portable hash spaces),
    // so the driver only checks rows > 0 for them. Their hash spaces
    // are deterministic (fixed seeds), so exact counts at sf0.01 are
    // stable goldens: a silent behavior change can't hide behind
    // `no_oracle`. Recall/guarantee semantics are separately gated in
    // DedupSpec/SimilaritySpec.
    val golden = Map(
      "q25_dedup_simhash" -> 23L,
      "q28_sim_topk_lsh" -> 100L,
      "q29_sim_topk_ivf" -> 100L,
      "q43_dedup_winnowing" -> 30L,
      "q85_dedup_semantic" -> 13L)
    golden.foreach { case (name, want) =>
      val got = SparkEntry.queries(name)(spark, sf("sf0.01")).count()
      assert(got === want, name)
    }
  }
}
