package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Physical-plan contracts for the headline queries: the properties
  * that make them survive a 100x scale-up are asserted here so a
  * regression (lost pushdown, a join degrading to nested-loop, top-k
  * materializing a global sort) fails CI instead of a cluster.
  */
class PlanAuditSpec extends SparkSpec {

  private def run(name: String): DataFrame = {
    val df = Registry.allQueries(name).fn(spark, sf("sf0.001"))
    df.collect() // materialize so AQE settles on the final plan
    df
  }
  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  /** Collects across AQE boundaries: AdaptiveSparkPlanExec is a LEAF
    * node, so a plain `plan.collect` never sees the final physical
    * plan — a structural assertion made with it is vacuous. Every
    * WindowExec/operator-node contract below must use this. */
  private def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T])
      : Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case q: QueryStageExec => q.plan
    }.flatMap(deepCollect(_)(pf))
    here ++ nested
  }

  test("q02: predicates and projection reach the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p.take(1500))
    assert(p.contains("LessThan(l_quantity"), p.take(1500))
    // column pruning: the scan must not read money columns the query
    // never touches
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_extendedprice"), "scan reads unused columns")
  }

  test("q01: aggregation is partial (map-side) + final") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1500))
  }

  test("q03/q04: dimension joins broadcast; no cartesian anywhere") {
    val p3 = plan("q03_join_revenue_by_nation")
    assert(p3.contains("BroadcastHashJoin"), p3.take(1500))
    assert(!p3.contains("CartesianProduct") &&
      !p3.contains("BroadcastNestedLoopJoin"), p3.take(1500))
    val p4 = plan("q04_broadcast_join_segments")
    assert(p4.contains("BroadcastHashJoin"), p4.take(1500))
  }

  test("q08: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q08_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q36: as-of join is window-based — no range/nested-loop join") {
    val p = plan("q36_asof_join")
    assert(p.contains("Window"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(1500))
  }

  test("q60: corpus top-k mines with partial agg + TakeOrderedAndProject") {
    val p = plan("q60_boilerplate_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1500))
  }

  test("q23/q40: similarity + range joins stay equi-join shaped") {
    for (name <- Seq("q23_dedup_ngram_jaccard", "q40_range_join")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"$name: ${p.take(1500)}")
    }
  }

  test("q90/q92: TPC-H Q3/Q7 shapes — top-k never global-sorts, " +
      "2-row nation dims broadcast, no nested loop") {
    val p90 = plan("q90_tpch_shipping_priority")
    assert(p90.contains("TakeOrderedAndProject"), p90.take(2000))
    assert(!p90.contains("CartesianProduct") &&
      !p90.contains("BroadcastNestedLoopJoin"), p90.take(2000))
    // both date predicates must reach the parquet readers
    assert(p90.contains("PushedFilters: ["), p90.take(3000))
    val p92 = plan("q92_tpch_volume_shipping")
    assert(p92.contains("BroadcastHashJoin"), p92.take(2000))
    assert(!p92.contains("CartesianProduct") &&
      !p92.contains("BroadcastNestedLoopJoin"), p92.take(2000))
  }

  test("q77: six-table join — dims broadcast, filters pushed, no nested loop") {
    val p = plan("q77_tpch_local_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the region/date predicates must reach the parquet readers as
    // PushedFilters — a bare contains("o_orderdate") would also match
    // the scan's ReadSchema and green-light a lost pushdown
    assert(p.contains("EqualTo(r_name,ASIA)"), p.take(3000))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p.take(3000))
    assert(p.contains("LessThan(o_orderdate"), p.take(3000))
  }

  test("q78: returned-item top-20 plans as TakeOrderedAndProject") {
    val p = plan("q78_tpch_returned_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("EqualTo(l_returnflag,R)"), p.take(3000))
  }

  test("q99: EXISTS realizes as one hash LEFT-SEMI join (residual " +
      "non-equi rides the equi key), date window pushed to orders scan") {
    val p = plan("q99_tpch_order_priority")
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p.take(3000))
  }

  test("q100: fixed-size nation/region dims broadcast; region filter " +
      "pushed; growing dims stay shuffled equi-joins") {
    val p = plan("q100_tpch_market_share")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("EqualTo(r_name,ASIA)"), p.take(3000))
  }

  test("q101: zero-order customers survive the outer join; both aggs " +
      "are partial+final") {
    val p = plan("q101_tpch_custdist")
    assert(p.contains("LeftOuter"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(2000))
  }

  test("q102/q106: decorrelated scalar aggregates ride in-plan " +
      "subqueries — no unkeyed window, no 1-row join, no nested loop") {
    for (name <- Seq("q102_tpch_top_supplier", "q106_tpch_sales_opportunity")) {
      val p = plan(name)
      assert(p.contains("Subquery") || p.contains("scalar-subquery"),
        s"$name: ${p.take(2000)}")
      assert(!p.contains("Window"), s"$name: ${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"$name: ${p.take(2000)}")
    }
    assert(plan("q106_tpch_sales_opportunity").contains("LeftAnti"))
  }

  test("q104: agg-before-join top-100 plans as TakeOrderedAndProject") {
    val p = plan("q104_tpch_large_volume")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q105: the disjunction never degrades the part join below an " +
      "equi-join; the implied one-sided prefilters reach the scans") {
    val p = plan("q105_tpch_disjunctive_revenue")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("In(p_brand"), p.take(3000))
    assert(p.contains("GreaterThanOrEqual(l_quantity"), p.take(3000))
  }

  test("q110: decorrelated EXISTS/NOT-EXISTS pair stays aggregate+join " +
      "shaped — no nested loop, top-100 never global-sorts") {
    val p = plan("q110_tpch_waiting_suppliers")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q111: the supplier blocklist realizes as a LEFT ANTI join") {
    val p = plan("q111_tpch_supplier_diversity")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q112/q113: profit chain broadcasts only the fixed-size nation " +
      "dim; the Q11 global fraction rides a scalar subquery") {
    val p112 = plan("q112_tpch_product_profit")
    assert(p112.contains("BroadcastHashJoin"), p112.take(2000))
    assert(!p112.contains("CartesianProduct") &&
      !p112.contains("BroadcastNestedLoopJoin"), p112.take(2000))
    val p113 = plan("q113_tpch_important_parts")
    assert(p113.contains("Subquery") || p113.contains("scalar-subquery"),
      p113.take(2000))
    assert(!p113.contains("Window"), p113.take(2000))
    assert(!p113.contains("CartesianProduct") &&
      !p113.contains("BroadcastNestedLoopJoin"), p113.take(2000))
  }

  test("q115: per-part MIN decorrelates to an aggregate join-back; " +
      "fixed-size dims broadcast; no nested loop") {
    val p = plan("q115_tpch_best_supplier")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("EqualTo(r_name,ASIA)"), p.take(3000))
    assert(p.contains("EqualTo(p_size,10)"), p.take(3000))
  }

  test("q65: PII scrub is a pure scan-side projection — no join, no agg") {
    val p = plan("q65_pii_redact")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      p.take(1500))
  }

  test("q107/q108/q114: the new LLM ops stay keyed — no nested loop, " +
      "no cartesian, no corpus-wide window") {
    for (name <- Seq("q107_dup_span_scrub", "q108_sim_topk_ivfpq",
        "q114_cluster_balanced_sample")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"$name: ${p.take(2000)}")
    }
    // q107's only aggregations are gram- or doc-keyed; its excision is
    // array expressions — no window operator at all
    assert(!plan("q107_dup_span_scrub").contains("Window"))
    // q108's re-rank must broadcast the shortlist/query side — a
    // sort-merge there would shuffle the whole corpus on neighbor_id,
    // exactly the corpus-scale exchange IVF-PQ exists to avoid
    assert(plan("q108_sim_topk_ivfpq").contains("BroadcastHashJoin"))
  }

  test("q68: corpus size enters as a scalar subquery, never a 1-row join") {
    val p = plan("q68_tfidf_keywords")
    assert(p.contains("Subquery") || p.contains("scalar-subquery"),
      p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(1500))
  }

  test("q118: TPC-H Q6 is one scan — every predicate pushed, no join, " +
      "partial+final agg") {
    val p = plan("q118_tpch_forecast_revenue")
    // the PushedFilters list renders truncated in plan strings, so pin
    // its head plus the full (untruncated) Filter-node predicates for
    // the date window, discount band, and quantity cap
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains(">= 1996-01-01"), p.take(2000))
    assert(p.contains(">= 0.05)") && p.contains("<= 0.07)"), p.take(2000))
    assert(p.contains("< 24.0)"), p.take(2000))
    assert(!p.contains("Join"), "Q6 must not join")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    // pruning: the scan must not read columns Q6 never touches
    assert(!p.contains("l_tax"), "scan reads unused columns")
  }

  test("q144/q145: mining joins broadcast the model-sized side; " +
      "no cartesian, no windows in the main plan") {
    // q144 triplet mining: anchors broadcast (nested-loop against a
    // broadcast side is the cross-score shape, same as q27/q140 —
    // never a CartesianProduct), both argmaxes one partial+final agg
    val p144 = plan("q144_triplet_mining")
    assert(p144.contains("BroadcastNestedLoopJoin") ||
      p144.contains("BroadcastHashJoin"), p144.take(1500))
    assert(!p144.contains("CartesianProduct"), p144.take(1500))
    assert(!p144.contains("Window"), p144.take(1500))
    // struct maxes aren't hash-aggregable — the argmax plans as a
    // partial+final SortAggregate pair, still keyed and distributed
    assert("(Hash|Sort)Aggregate".r.findAllIn(p144).size >= 2,
      p144.take(1500))
    // q145 drift: dense sum never becomes a cartesian; no windows —
    // the whole reduction is keyed partial+final aggregation
    import org.apache.spark.sql.execution.window.WindowExec
    val exec145 = run("q145_unigram_drift").queryExecution.executedPlan
    assert(!exec145.toString.contains("CartesianProduct"))
    assert(deepCollect(exec145) { case w: WindowExec => w }.isEmpty)
  }

  test("q63: rank plan has ZERO single-partition windows (r6 contract — " +
      "the ledger rides a map scalar subquery) and the gate itself is a " +
      "pure filter (r6.2 — the corpus never shuffles for the rank)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = run("q63_quality_gate").queryExecution.executedPlan
    // windows may appear only inside the slim-projection subqueries,
    // and even there always bucket-partitioned
    val mainWindows = deepCollect(exec) { case w: WindowExec => w }
    assert(mainWindows.isEmpty, mainWindows.headOption.toString)
    val unpartitioned = exec.subqueriesAll.flatMap(deepCollect(_) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    })
    assert(unpartitioned.isEmpty, unpartitioned.headOption.toString)
  }

  test("q148/q149: co-purchase projection + triangle closure stay " +
      "equi-join shaped — no cartesian, no nested loop, no windows") {
    for (q <- Seq("q148_triangle_count", "q149_adamic_adar")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(800)}")
      assert(!p.contains("Window"), s"$q: ${p.take(800)}")
    }
  }

  test("q152: the seq-len ledger plans with NO join at all — literal " +
      "candidates explode map-side") {
    val p = plan("q152_seqlen_plan")
    assert(!p.contains("Join"), p.take(1200))
    assert("(Hash|Sort)Aggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("q153: the only window sits over the distinct-count ledger " +
      "(an aggregate child), never the corpus or the vocab") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val exec = run("q153_vocab_coverage").queryExecution.executedPlan
    val wins = deepCollect(exec) { case w: WindowExec => w }
    assert(wins.nonEmpty, "ledger window missing — plan restructured?")
    // every window's input subtree must bottom out in an aggregate
    // (the count→n_types ledger), never a raw corpus/vocab scan
    assert(wins.forall(w =>
      deepCollect(w.child) { case a: BaseAggregateExec => a }.nonEmpty),
      wins.head.toString.take(800))
    assert(!exec.toString.contains("CartesianProduct"))
  }

  test("q155: the per-anchor draw never serializes — zero " +
      "unpartitioned windows, no cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = run("q155_negative_sample").queryExecution.executedPlan
    val unpart = deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, unpart.headOption.toString)
    assert(!exec.toString.contains("CartesianProduct"))
  }

  test("q158: every window is user-partitioned; q159 mines with " +
      "equi-joins + TakeOrderedAndProject, zero windows") {
    import org.apache.spark.sql.execution.window.WindowExec
    val e158 = run("q158_temporal_split").queryExecution.executedPlan
    val unpart = deepCollect(e158) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, unpart.headOption.toString)
    val p159 = plan("q159_collocations")
    assert(!p159.contains("CartesianProduct") &&
      !p159.contains("BroadcastNestedLoopJoin"), p159.take(1200))
    assert(p159.contains("TakeOrderedAndProject"), p159.take(1200))
    assert(deepCollect(run("q159_collocations").queryExecution
      .executedPlan) { case w: WindowExec => w }.isEmpty)
  }

  test("q160: the only unpartitioned window orders the bucket LEDGER " +
      "(an aggregate child) — the corpus rank stays hash-bucketed") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val exec = run("q160_curriculum_order").queryExecution.executedPlan
    val wins = deepCollect(exec) { case w: WindowExec => w }
    val unpart = wins.filter(_.partitionSpec.isEmpty)
    assert(unpart.nonEmpty, "ledger window missing — plan restructured?")
    assert(unpart.forall(w =>
      deepCollect(w.child) { case a: BaseAggregateExec => a }.nonEmpty),
      unpart.head.toString.take(800))
    assert(!exec.toString.contains("CartesianProduct"))
  }

  // q162/q164's iteration plans are pinned operator-side (joins +
  // aggregates by construction, gated by PcaSpec's integer replay);
  // their returned frames are checkpointed leaves, so a plan audit
  // on them would inspect only the final scan.
  test("q163: rolling features ride user-partitioned windows only — " +
      "zero unpartitioned windows, no cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    val e163 = run("q163_rolling_features").queryExecution.executedPlan
    val unpart = deepCollect(e163) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, unpart.headOption.toString)
    assert(!e163.toString.contains("CartesianProduct"))
  }

  test("q161: the pairwise stage is label-sized — no unpartitioned " +
      "window, no cartesian; the nested-loop join is the documented " +
      "broadcast label-matrix self-join only") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = run("q161_label_confusion").queryExecution.executedPlan
    assert(deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty)
    assert(!exec.toString.contains("CartesianProduct"))
  }

  test("q194: the scan reads only (event_type, props) — the variant " +
      "parse does not widen the schema; one partial+final agg") {
    val p = plan("q194_variant_props")
    assert(p.contains("ReadSchema"), p.take(1500))
    assert(!p.contains("user_id") && !p.contains("value"),
      "scan reads unused columns")
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val aggs = deepCollect(
      run("q194_variant_props").queryExecution.executedPlan) {
      case a: BaseAggregateExec => a
    }
    assert(aggs.size >= 2, s"partial+final expected, got ${aggs.size}")
  }

  test("q186: trigram top-20 plans as TakeOrderedAndProject over a " +
      "partial+final count; windows are user-partitioned only") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = run("q186_event_trigrams").queryExecution.executedPlan
    assert(exec.toString.contains("TakeOrderedAndProject"),
      exec.toString.take(1500))
    assert(deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty)
  }

  test("q195: WITH TIES is a PURE FILTER — zero windows in the main " +
      "plan (the ledger rank lives in the threshold scalar subquery), " +
      "no global sort of corpus rows before the cut") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = run("q195_topk_with_ties").queryExecution.executedPlan
    assert(deepCollect(exec) { case w: WindowExec => w }.isEmpty,
      "main plan must not window-sort")
    val opt = run("q195_topk_with_ties").queryExecution
      .optimizedPlan.toString
    assert(opt.contains("scalar-subquery"), opt.take(1200))
    assert(!exec.toString.contains("CartesianProduct"))
  }

  test("q178/q181: every unpartitioned window orders an AGGREGATE " +
      "child (score/rank ledgers) — corpus rows never window-sort; " +
      "no cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    for (q <- Seq("q178_signal_auc", "q181_spearman_signals")) {
      val exec = run(q).queryExecution.executedPlan
      val unpart = deepCollect(exec) {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(unpart.nonEmpty, s"$q: ledger window missing — restructured?")
      assert(unpart.forall(w =>
        deepCollect(w.child) { case a: BaseAggregateExec => a }.nonEmpty),
        s"$q: " + unpart.head.toString.take(800))
      assert(!exec.toString.contains("CartesianProduct"), q)
    }
  }

  test("q180: median/MAD brackets ride stratum-partitioned ledger " +
      "windows only — zero unpartitioned windows, no cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = run("q180_robust_length_profile").queryExecution.executedPlan
    assert(deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty)
    assert(!exec.toString.contains("CartesianProduct"))
  }

  test("q217-q219: BM25 retrieval, modularity and the MRR eval stay " +
      "equi-join shaped — no cartesian/nested-loop, no unpartitioned " +
      "window; corpus scalars (N, avgdl, m) ride in-plan subqueries") {
    import org.apache.spark.sql.execution.window.WindowExec
    var bm25Plan = ""
    for (name <- Seq("q217_bm25_topk", "q218_modularity_by_nation",
        "q219_known_item_mrr")) {
      val exec = run(name).queryExecution.executedPlan
      val s = exec.toString
      if (name.startsWith("q217")) bm25Plan = s
      assert(!s.contains("CartesianProduct"), s"$name: ${s.take(1500)}")
      assert(!s.contains("BroadcastNestedLoopJoin"),
        s"$name: ${s.take(1500)}")
      // q217/q219's only window is the per-query candidate ranking;
      // q218's contract is ZERO window operators (not merely zero
      // unpartitioned ones)
      assert(deepCollect(exec) {
        case w: WindowExec if w.partitionSpec.isEmpty ||
          name.startsWith("q218") => w
      }.isEmpty, name)
    }
    assert(bm25Plan.contains("Subquery") ||
      bm25Plan.contains("scalar-subquery"), bm25Plan.take(1500))
  }

  test("q179: candidate generation is the prefix equi-join — no " +
      "cartesian/nested-loop pair enumeration; the only windows are " +
      "the per-doc prefix ranks") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = run("q179_dedup_edit_distance").queryExecution.executedPlan
    assert(deepCollect(exec) {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty)
    val s = exec.toString
    assert(!s.contains("CartesianProduct"))
    assert(!s.contains("BroadcastNestedLoopJoin"))
  }
}
