package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private lazy val docs = graft.Tables(spark, sf("sf0.001"), "documents")

  test("hashSplit: complete, disjoint, deterministic, ~fraction") {
    val split = Sampling.hashSplit(docs, "doc_id", trainFrac = 0.8)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.count()
    assert(counts.values.sum === total)               // complete
    val frac = counts("train").toDouble / total
    assert(frac > 0.7 && frac < 0.9, s"train frac $frac") // ~0.8 ± noise
    // deterministic: same assignment on a re-run
    val again = Sampling.hashSplit(docs, "doc_id", 0.8)
      .select("doc_id", "split").collect().toSet
    assert(split.select("doc_id", "split").collect().toSet === again)
  }

  test("hashSample is the train side of hashSplit at the same fraction") {
    val sampleIds = Sampling.hashSample(docs, "doc_id", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val trainIds = Sampling.hashSplit(docs, "doc_id", 0.8)
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampleIds === trainIds)
  }

  test("takeDeterministic: exact k, nested, TakeOrderedAndProject plan") {
    val s10 = Sampling.takeDeterministic(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s50 = Sampling.takeDeterministic(docs, "doc_id", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.size === 10 && s50.size === 50)
    assert(s10.subsetOf(s50)) // prefix of one global order
    val plan = Sampling.takeDeterministic(docs, "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1000))
  }

  test("dropBottomFraction: exactly the worst ceil(frac*n) rows go") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, i * 0.1)).toDF("id", "score")
    val kept = Sampling.dropBottomFraction(df, "score", "id", 0.25)
      .select("id").collect().map(_.getLong(0)).toSet
    // ceil(0.25 * 10) = 3 lowest scores dropped
    assert(kept === (4 to 10).map(_.toLong).toSet)
    // ties break on the tie column, not partition order
    val tied = (1 to 4).map(i => (i.toLong, 1.0)).toDF("id", "score")
    val keptTied = Sampling.dropBottomFraction(tied, "score", "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptTied === Set(3L, 4L))
  }

  test("dropBottomFraction: exact at scale shape — no corpus-sized " +
      "single-partition window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    // AQE off so executedPlan is a plain traversable tree
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // heavy ties (~10 rows per score value) exercise rows straddling
      // range-bucket boundaries; tie-break on id keeps the rank total
      val rows = (1 to 1000).map(i => (i.toLong, (i % 97) * 0.5))
      val df = rows.toDF("id", "score")
      val gated = Sampling.dropBottomFraction(df, "score", "id", 0.1)
      val expected = rows.sortBy { case (id, s) => (s, id) }
        .drop(math.ceil(0.1 * rows.size).toInt).map(_._1).toSet
      assert(gated.select("id").as[Long].collect().toSet === expected)
      // plan contract (tightened again in r6.2, threshold spelling):
      // the MAIN plan is a pure filter — no window, no exchange at
      // all; the full rows never shuffle. The rank machinery lives in
      // scalar subqueries over the slim (score, tie) projection, and
      // even there no window is unpartitioned (the per-bucket rank
      // window partitions on the range bucket).
      val plan = gated.queryExecution.executedPlan
      val mainWindows = plan.collect { case w: WindowExec => w }
      assert(mainWindows.isEmpty,
        s"main plan must be a pure filter, found:\n${mainWindows.headOption}")
      val mainExchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(mainExchanges.isEmpty,
        s"main plan must not shuffle the corpus:\n${mainExchanges.headOption}")
      val subPlans = plan.subqueriesAll
      val unpartitioned = subPlans.flatMap(_.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      })
      assert(unpartitioned.isEmpty,
        s"unexpected single-partition window:\n${unpartitioned.headOption}")
      val partitioned = subPlans.flatMap(_.collect {
        case w: WindowExec if w.partitionSpec.nonEmpty => w
      })
      assert(partitioned.nonEmpty,
        "expected the per-bucket rank window in the k-th subquery")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("mixSample: exact per-stratum shares, unlisted strata dropped") {
    import spark.implicits._
    val df = (1L to 300L).map(i =>
      (i, Seq("a", "b", "c")(((i - 1) % 3).toInt))).toDF("id", "src")
    // 100 rows per stratum; ceil semantics: a -> 7 (0.07*100, decimal
    // exact — the double spelling would keep 8), b -> 50, c dropped
    val got = Sampling.mixSample(df, "id", "src",
      fracs = Map("a" -> 0.07, "b" -> 0.5))
      .groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 7L, "b" -> 50L))
    // nested: raising a fraction only adds rows (content-stable order)
    val small = Sampling.mixSample(df, "id", "src", Map("b" -> 0.2))
      .select("id").as[Long].collect().toSet
    val big = Sampling.mixSample(df, "id", "src", Map("b" -> 0.5))
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedSample: giant stratum stays exact and parallel") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // one stratum 500x the other — the shape that used to serialize
      // into a single per-stratum sort task
      val rows = (1L to 5000L).map(i => (i, "big")) ++
        (5001L to 5010L).map(i => (i, "small"))
      val df = rows.toDF("id", "src")
      // a NULL stratum is a valid partition (matches the old window
      // semantics) — the ledger join must be null-safe, not silently
      // drop those rows
      val withNull = (rows ++ (5011L to 5020L).map(i => (i, null: String)))
        .toDF("id", "src")
      val nullKept = Sampling.stratifiedSample(withNull, "id", "src", 0.5)
        .filter(col("src").isNull).count()
      assert(nullKept === 5L) // ceil(0.5 * 10)
      val got = Sampling.stratifiedSample(df, "id", "src", 0.3)
      // expected: per stratum, first ceil(0.3*n) in (md5(id), id) order —
      // recomputed independently with JVM md5
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
        rs.sortBy { case (id, _) => (md5hex(id.toString), id) }
          .take(math.ceil(0.3 * rs.size).toInt)
      }.map(_._1).toSet
      assert(got.select("id").as[Long].collect().toSet === expected)
      assert(got.columns.toSeq === Seq("id", "src")) // column order kept
      // plan contract: any window partitioned by the stratum ALONE (the
      // old per-stratum serialization) must sit above the aggregated
      // ledger; corpus-sized windows carry (stratum, bucket)
      val plan = got.queryExecution.executedPlan
      plan.collect {
        case w: WindowExec if w.partitionSpec.size == 1 => w
      }.foreach { w =>
        assert(w.child.collect { case a: BaseAggregateExec => a }.nonEmpty,
          s"stratum-wide window over non-aggregated input:\n$w")
      }
      assert(plan.collect {
        case w: WindowExec if w.partitionSpec.size == 2 => w
      }.nonEmpty, "expected the (stratum, bucket) rank window")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("takePerStratum: exact counts, oversize takes all, unlisted drop") {
    import spark.implicits._
    val df = (1L to 90L).map(i =>
      (i, Seq("a", "b", "c")(((i - 1) % 3).toInt))).toDF("id", "src")
    // 30 rows per stratum: a -> exactly 7, b -> capped at stratum size,
    // c unlisted -> dropped
    val got = Sampling.takePerStratum(df, "id", "src",
      Map("a" -> 7L, "b" -> 100L))
      .groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 7L, "b" -> 30L))
    // the a-take is the 7-prefix of the same md5 order mixSample uses
    val viaMix = Sampling.mixSample(df, "id", "src", Map("a" -> 0.2334))
      .select("id").as[Long].collect().toSet // ceil(0.2334*30) = 8
    val take7 = Sampling.takePerStratum(df, "id", "src", Map("a" -> 7L))
      .select("id").as[Long].collect().toSet
    assert(take7.subsetOf(viaMix))
  }

  test("weightedTake: exact k, deterministic, weight-biased, top-k plan") {
    import spark.implicits._
    // 2000 rows, half weight 1, half weight 8 — the heavy half should
    // dominate the sample (E[share] = 8/9; binomial noise at n=200 puts
    // share > 0.75 at ~6 sigma)
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) 8 else 1))
      .toDF("id", "w")
    val take = Sampling.weightedTake(df, "id", col("w"), k = 200)
    val ids = take.select("id").as[Long].collect()
    assert(ids.length === 200 && ids.toSet.size === 200)
    val heavyShare = ids.count(_ % 2 == 0).toDouble / ids.length
    assert(heavyShare > 0.75, s"heavy share $heavyShare")
    // deterministic across runs
    val again = Sampling.weightedTake(df, "id", col("w"), k = 200)
      .select("id").as[Long].collect()
    assert(ids.toSet === again.toSet)
    // one content-stable total order: smaller k is a prefix of larger
    val k50 = Sampling.weightedTake(df, "id", col("w"), k = 50)
      .select("id").as[Long].collect().toSet
    assert(k50.subsetOf(ids.toSet))
    // saturation: weights above maxWeight clamp (same key as maxWeight)
    val capped = Sampling.weightedTake(df, "id", col("w") * 1000, k = 50,
      maxWeight = 8)
    val capped2 = Sampling.weightedTake(df, "id", lit(8), k = 50,
      maxWeight = 8)
    assert(capped.select("id").as[Long].collect().toSet ===
      capped2.select("id").as[Long].collect().toSet)
    // per-partition heap + driver merge, never a global sort
    val plan = take.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1000))
  }

  test("boundary fractions: 1.0 keeps everything, 0.0 keeps nothing") {
    val total = docs.count()
    // frac = 1.0 has no 4-hex threshold ("ffff" compare would drop the
    // 1/65536 of keys whose bucket IS ffff) — must be all rows
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() === total)
    val all = Sampling.hashSplit(docs, "doc_id", 1.0)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all === Map("train" -> total))
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() === 0L)
  }

  test("stratum rank excludes NULL-key rows uniformly: ranks and " +
      "counts cover exactly the rankable rows, nothing shorts") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), "a"), (Option(2L), "a"), (None, "a"), (None, "a"),
      (Option(3L), "b"), (None, "b"))
      .toDF("k", "s")
    // null keys have no content identity → excluded like weightedTake
    // (the module-wide policy); frac=1.0 returns every RANKABLE row.
    // The regression this pins: null-key rows used to occupy ledger
    // slots while being dropped by the join, silently shorting the
    // non-null sample below its exact share.
    val full = Sampling.stratifiedSample(df, "k", "s", 1.0)
      .collect().map(r => (r.get(0), r.getString(1)))
    assert(full.length === 3 && full.forall(_._1 != null))
    // exact-count takes are satisfied entirely from rankable rows
    val got = Sampling.takePerStratum(df, "k", "s",
      Map("a" -> 2L, "b" -> 1L))
      .collect().map(r => (r.get(0), r.getString(1)))
    assert(got.length === 3 && got.forall(_._1 != null))
    assert(got.count(_._2 == "a") === 2 && got.count(_._2 == "b") === 1)
  }

  test("dropBottomFraction rejects non-numeric score columns loudly") {
    import spark.implicits._
    val df = Seq((1L, "low"), (2L, "high")).toDF("id", "score")
    val e = intercept[IllegalArgumentException] {
      Sampling.dropBottomFraction(df, "score", "id", 0.5)
    }
    assert(e.getMessage.contains("NUMERIC"))
  }

  test("leakageSafeSplit: clusters move atomically, singletons kept") {
    import spark.implicits._
    val docs = Seq.tabulate(40)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L))
    val out = Sampling.leakageSafeSplit(docs, "doc_id",
      pairs.toDF("a_id", "b_id"), trainFrac = 0.5)
    assert(out.count() === 40) // every doc exactly once
    val sp = out.select("doc_id", "split", "cluster_rep").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // the defining guarantee: no near-dup pair straddles the split
    pairs.foreach { case (a, b) => assert(sp(a)._1 === sp(b)._1, s"($a,$b)") }
    // component rep = min id; singletons represent themselves
    assert(Seq(0L, 1L, 2L).map(sp(_)._2) === Seq(0L, 0L, 0L))
    assert(sp(11L)._2 === 10L && sp(5L)._2 === 5L)
    // cluster assignment matches the per-key hashSplit rule on the rep:
    // a doc's split equals what hashSplit would give its representative
    val repSplit = Sampling.hashSplit(
      docs.filter(col("doc_id").isin(0L, 5L, 10L, 20L)), "doc_id", 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(sp(2L)._1 === repSplit(0L) && sp(21L)._1 === repSplit(20L))
    assert(sp(5L)._1 === repSplit(5L))
  }

  test("leakageSafeSplit tolerates a pre-existing 'component' column") {
    import spark.implicits._
    val docs = Seq((1L, "x", 9L), (2L, "y", 9L))
      .toDF("doc_id", "text", "component")
    val out = Sampling.leakageSafeSplit(docs, "doc_id",
      Seq((1L, 2L)).toDF("a_id", "b_id"), trainFrac = 0.5)
    val rows = out.select("doc_id", "component", "cluster_rep", "split")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(1L)._1 === 9L && rows(2L)._1 === 9L) // caller column intact
    assert(rows(1L)._2 === 1L && rows(2L)._2 === 1L) // rep = min id
    assert(rows(1L)._3 === rows(2L)._3)              // pair stays together
  }

  test("topKPerStratum equals brute force; salted pass is lossless") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // heavy ties (scores from a 5-value space) + skew (stratum "big"
    // holds most rows) exercise both the tie contract and the reason
    // the salted two-pass exists
    val rows = (1 to 500).map { i =>
      val stratum = if (i % 10 == 0) s"s${i % 3}" else "big"
      (i.toLong, stratum, (rng.nextInt(5) * 0.25))
    }
    val df = rows.toDF("id", "stratum", "score")
    for (k <- Seq(0, 3, 17, 1000)) {
      val got = Sampling.topKPerStratum(df, "stratum", "score", "id", k)
        .select("id").as[Long].collect().toSet
      val want = rows.groupBy(_._2).values.flatMap(g =>
        g.sortBy { case (id, _, s) => (-s, id) }.take(k)).map(_._1).toSet
      assert(got === want, s"k=$k")
    }
  }

  test("topKPerStratum: null scores rank last, null tie keys drop") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Some(0.5)), (2L, "a", None), (3L, "a", Some(0.9)),
      (4L, "a", Some(0.1))).toDF("id", "stratum", "score")
      .union(Seq((Option.empty[Long], "a", Some(99.0)))
        .toDF("id", "stratum", "score"))
    val got = Sampling.topKPerStratum(df, "stratum", "score", "id", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    // null-id row is dropped even with the best score; the null-score
    // row is the WORST, so it loses the k=3 cut to the real scores
    assert(got === Set(3L, 1L, 4L))
  }

  test("shuffleOrder: seeded content-stable permutation, equals brute force") {
    import spark.implicits._
    val ids = (1L to 300L)
    val df = ids.map(i => (i, s"payload$i")).toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (seed <- Seq("", "ep1")) {
      val got = Sampling.shuffleOrder(df, "doc_id", seed)
        .select("doc_id", "shuffle_pos")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ids.map(i => i -> s"$seed:$i")
        .sortBy { case (_, sk) => (md5hex(sk), sk) }
        .zipWithIndex.map { case ((i, _), p) => i -> p.toLong }.toMap
      assert(got === want, s"seed=$seed")
      // a permutation of 0..n-1
      assert(got.values.toSet === (0L until 300L).toSet)
    }
    // different seeds give different orders (same corpus)
    val a = Sampling.shuffleOrder(df, "doc_id", "ep1")
      .select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.shuffleOrder(df, "doc_id", "ep2")
      .select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a !== b)
  }

  test("takeTokenBudget equals the global-window brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // rounded scores → heavy ties straddling range-bucket boundaries;
    // weights include zeros (must ride along at zero cost)
    val rows = (1 to 800).map { i =>
      (i.toLong, (rng.nextInt(20) * 0.05), rng.nextInt(40).toLong)
    }
    val df = rows.toDF("id", "score", "w")
    def brute(budget: Long): Set[Long] = {
      var acc = 0L
      rows.sortBy { case (id, s, _) => (-s, id) }.flatMap { case (id, _, w) =>
        acc += w; if (acc <= budget) Some(id) else None
      }.toSet
    }
    for (budget <- Seq(0L, 1L, 500L, 7000L, 1000000L)) {
      val got = Sampling.takeTokenBudget(df, "score", "id", col("w"), budget)
        .select("id").as[Long].collect().toSet
      assert(got === brute(budget), s"budget=$budget")
    }
  }

  test("takeTokenBudget: pure filter — full rows never shuffle or " +
      "window-sort") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1L to 500L).map(i => (i, i * 0.5, i % 7)).toDF("id", "s", "w")
      val plan = Sampling.takeTokenBudget(df, "s", "id", col("w"), 1000L)
        .queryExecution.executedPlan
      // threshold spelling (mirrors dropBottomFraction r6.2): the MAIN
      // plan is a pure filter — no window, no exchange; the weighted
      // prefix machinery lives in scalar subqueries over the slim
      // projection, where every window partitions on the range bucket
      val mainWindows = plan.collect { case w: WindowExec => w }
      assert(mainWindows.isEmpty,
        s"main plan must be a pure filter, found:\n${mainWindows.headOption}")
      val mainExchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(mainExchanges.isEmpty,
        s"main plan must not shuffle the corpus:\n${mainExchanges.headOption}")
      val subPlans = plan.subqueriesAll
      val unpartitioned = subPlans.flatMap(_.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      })
      assert(unpartitioned.isEmpty,
        s"unexpected single-partition window:\n${unpartitioned.headOption}")
      val partitioned = subPlans.flatMap(_.collect {
        case w: WindowExec if w.partitionSpec.nonEmpty => w
      })
      assert(partitioned.nonEmpty,
        "expected the per-bucket window in the threshold subquery")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("repetitionSchedule: main plan never shuffles the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1L to 500L).map(i => (i, i * 0.5, i % 7)).toDF("id", "s", "w")
      val plan = Sampling.repetitionScheduleEpochs(
          df, "s", "id", col("w"), epochs = 2.5)
        .queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "main plan must be a pure projection (no window)")
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, "main plan must not shuffle the corpus")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("repetitionSchedule equals the global-window brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    // tied scores straddle bucket boundaries; zero weights ride free
    val rows = (1 to 600).map { i =>
      (i.toLong, (rng.nextInt(12) * 0.1), rng.nextInt(30).toLong)
    }
    val df = rows.toDF("id", "score", "w")
    val total = rows.map(_._3).sum
    def brute(budget: Long): Map[Long, Long] = {
      val full = if (total > 0) budget / total else 0L
      val rem = if (total > 0) budget % total else budget
      var acc = 0L
      rows.sortBy { case (id, s, _) => (-s, id) }.map { case (id, _, w) =>
        acc += w
        id -> (full + (if (acc <= rem) 1L else 0L))
      }.toMap
    }
    // sub-corpus (degrades to takeTokenBudget membership), exact
    // multiple (rem = 0), 2.5 epochs, and far-over budgets
    for (budget <- Seq(0L, total / 3, total, total * 2,
        (total * 2.5).ceil.toLong, total * 7 + 123)) {
      val got = Sampling.repetitionSchedule(df, "score", "id", col("w"),
          lit(budget))
        .select("id", "repeats")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(budget), s"budget=$budget")
    }
    // the epochs spelling is the ceil(epochs × total) absolute budget
    val viaEpochs = Sampling.repetitionScheduleEpochs(
        df, "score", "id", col("w"), epochs = 2.5)
      .select("id", "repeats")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaEpochs === brute((total * 2.5).ceil.toLong))
    // sub-corpus budget: the extra-epoch set IS takeTokenBudget's set
    val b = total / 3
    val viaBudgetOp = Sampling.takeTokenBudget(df, "score", "id", col("w"), b)
      .select("id").as[Long].collect().toSet
    assert(brute(b).filter(_._2 == 1L).keySet === viaBudgetOp)
  }

  test("scoreRankPerStratum equals percent_rank brute force " +
      "(ties, skew, null score, null stratum)") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = (1 to 500).map { i =>
      val stratum = if (i % 8 == 0) Some(s"s${i % 3}")
        else if (i % 97 == 0) None else Some("big")
      val score = if (i % 11 == 0) None else Some(rng.nextInt(6) * 0.2)
      (i.toLong, stratum, score)
    }
    val df = rows.toDF("id", "stratum", "score")
    val got = Sampling.scoreRankPerStratum(df, "stratum", "score", "id",
        outCol = "pr")
      .select("id", "pr").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = rows.groupBy(_._2).values.flatMap { g =>
      val sorted = g.sortBy { case (id, _, s) =>
        (s.isEmpty, -s.getOrElse(0.0), id) }
      val n = sorted.size
      sorted.zipWithIndex.map { case ((id, _, _), idx) =>
        id -> (if (n > 1) idx.toDouble / (n - 1) else 0.0) }
    }.toMap
    assert(got === want)
    // null tie keys drop
    val withNullTie = Seq((Option.empty[Long], "a", 1.0), (Some(1L), "a", 0.5))
      .toDF("id", "stratum", "score")
    val kept = Sampling.scoreRankPerStratum(
      withNullTie, "stratum", "score", "id").select("id").collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("topFractionPerStratum equals brute force " +
      "(ties, skew, null score, null stratum, boundary fracs)") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val rows = (1 to 500).map { i =>
      val stratum = if (i % 8 == 0) Some(s"s${i % 3}")
        else if (i % 97 == 0) None else Some("big")
      val score = if (i % 11 == 0) None else Some(rng.nextInt(6) * 0.2)
      (i.toLong, stratum, score)
    }
    val df = rows.toDF("id", "stratum", "score")
    for (frac <- Seq(0.0, 0.07, 0.3, 1.0)) {
      val got = Sampling.topFractionPerStratum(
          df, "stratum", "score", "id", frac)
        .select("id").as[Long].collect().toSet
      val want = rows.groupBy(_._2).values.flatMap { g =>
        val sorted = g.sortBy { case (id, _, s) =>
          (s.isEmpty, -s.getOrElse(0.0), id) }
        sorted.take(math.ceil(frac * sorted.size).toInt).map(_._1)
      }.toSet
      assert(got === want, s"frac=$frac")
    }
    // null tie keys drop even at frac = 1.0
    val withNullTie = Seq((Option.empty[Long], "a", 1.0), (Some(1L), "a", 0.5))
      .toDF("id", "stratum", "score")
    val kept = Sampling.topFractionPerStratum(
      withNullTie, "stratum", "score", "id", 1.0).select("id").collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("topFractionPerStratum: pure filter — full rows never shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1L to 500L).map(i => (i, s"s${i % 3}", i * 0.5))
        .toDF("id", "stratum", "s")
      val plan = Sampling.topFractionPerStratum(df, "stratum", "s", "id", 0.3)
        .queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "main plan must be a pure filter (no window)")
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, "main plan must not shuffle the corpus")
      // inside the threshold subquery every window partitions on
      // (stratum, bucket)
      val unpartitioned = plan.subqueriesAll.flatMap(_.collect {
        case w: WindowExec if w.partitionSpec.size < 2 => w
      })
      assert(unpartitioned.isEmpty,
        s"sub-two-key window in the subquery:\n${unpartitioned.headOption}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("scoreRankPerStratum: no one-task-per-stratum window over raw rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1L to 500L).map(i => (i, s"s${i % 3}", i * 0.5))
        .toDF("id", "stratum", "s")
      val plan = Sampling.scoreRankPerStratum(df, "stratum", "s", "id")
        .queryExecution.executedPlan
      // raw corpus rows may only flow into the (stratum, bucket)
      // two-key window; any window keyed on fewer columns must be the
      // ledger (fed by an aggregate, so it is ledger-sized)
      plan.collect { case w: WindowExec if w.partitionSpec.size < 2 => w }
        .foreach { w =>
          val aggBelow = w.collectFirst {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
          }
          assert(aggBelow.nonEmpty,
            s"sub-two-key window not fed by an aggregate:\n$w")
        }
      val bucketed = plan.collect {
        case w: WindowExec if w.partitionSpec.size == 2 => w
      }
      assert(bucketed.nonEmpty, "expected the (stratum, bucket) window")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("takeTokenBudgetPerStratum equals the per-stratum window brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    // tied scores, zero weights, null scores, null stratum, a stratum
    // the budget map does not list, and budgets spanning 0 / partial /
    // over-corpus
    val rows = (1 to 500).map { i =>
      val st = if (i % 97 == 0) None else Some(s"s${i % 5}")
      val score = if (i % 13 == 0) None else Some(rng.nextInt(10) * 0.1)
      (i.toLong, st, score, rng.nextInt(20).toLong)
    }
    val df = rows.toDF("id", "st", "score", "w")
    val budgets = Map("s0" -> 0L, "s1" -> 300L, "s2" -> 1000000L,
      "s3" -> 777L) // s4 and the null stratum unlisted -> dropped
    val got = Sampling.takeTokenBudgetPerStratum(
        df, "st", "score", "id", col("w"), budgets)
      .select("id").as[Long].collect().toSet
    val want = rows.groupBy(_._2).collect {
      case (Some(st), g) if budgets.contains(st) =>
        var acc = 0L
        g.sortBy { case (id, _, s, _) => (s.isEmpty, -s.getOrElse(0.0), id) }
          .flatMap { case (id, _, _, w) =>
            acc += w
            if (acc <= budgets(st)) Some(id) else None
          }
    }.flatten.toSet
    assert(got === want && want.nonEmpty)
    // empty budget map keeps nothing (and keeps the schema)
    val none = Sampling.takeTokenBudgetPerStratum(
      df, "st", "score", "id", col("w"), Map.empty)
    assert(none.columns.toSeq === df.columns.toSeq && none.count() === 0)
  }

  test("takeTokenBudgetPerStratum: pure filter — full rows never shuffle " +
      "or window-sort") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1L to 500L).map(i => (i, s"s${i % 3}", i * 0.5, i % 7))
        .toDF("id", "st", "s", "w")
      val plan = Sampling.takeTokenBudgetPerStratum(df, "st", "s", "id",
          col("w"), Map("s0" -> 100L, "s1" -> 100L, "s2" -> 100L))
        .queryExecution.executedPlan
      val mainWindows = plan.collect { case w: WindowExec => w }
      assert(mainWindows.isEmpty,
        s"main plan must be a pure filter, found:\n${mainWindows.headOption}")
      val mainExchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(mainExchanges.isEmpty,
        s"main plan must not shuffle the corpus:\n${mainExchanges.headOption}")
      // every subquery window partitions on (stratum, bucket) — no
      // one-task-per-stratum (single-key) window over raw rows, no
      // unpartitioned window anywhere
      val subWindows = plan.subqueriesAll.flatMap(_.collect {
        case w: WindowExec => w
      })
      assert(subWindows.nonEmpty && subWindows.forall(_.partitionSpec.size == 2),
        s"expected only (stratum, bucket) windows:\n${subWindows.headOption}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("one NaN ordering across rank kernels: finite desc, then NaN, then null") {
    import spark.implicits._
    // the module contract: NaN scores rank after every finite score
    // and before nulls — in EVERY kernel (scoreRankPerStratum used to
    // rank NaN best via the raw `score DESC` window while the
    // qualityOrd family ranked it worst; they must agree)
    val df = Seq(
      (1L, 0.9), (2L, 0.5), (3L, Double.NaN), (4L, Double.NaN),
      (6L, 0.1))
      .toDF("id", "score")
      .unionByName(Seq(Tuple1(5L)).toDF("id")
        .withColumn("score", lit(null).cast("double")))
    // expected rank order: 0.9, 0.5, 0.1, NaN(3), NaN(4), null(5)
    val prs = Sampling.scoreRankPerStratum(
        df.withColumn("st", lit("a")), "st", "score", "id", outCol = "pr")
      .select("id", "pr").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(prs === Map(1L -> 0.0, 2L -> 0.2, 6L -> 0.4,
      3L -> 0.6, 4L -> 0.8, 5L -> 1.0))
    // takeTokenBudget agrees: budget 4 of unit weights keeps the three
    // finite scores plus the FIRST NaN (tie id asc), never the null
    val kept = Sampling.takeTokenBudget(df, "score", "id", lit(1L), 4L)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 6L, 3L))
    // topFractionPerStratum agrees: best 2/3 of the stratum
    val frac = Sampling.topFractionPerStratum(
        df.withColumn("st", lit("a")), "st", "score", "id", frac = 4.0 / 6)
      .select("id").as[Long].collect().toSet
    assert(frac === Set(1L, 2L, 6L, 3L))
  }

  test("repetitionSchedule: a negative budget clamps to zero repeats") {
    import spark.implicits._
    val df = Seq((1L, 0.9, 10L), (2L, 0.5, 20L)).toDF("id", "score", "w")
    val got = Sampling.repetitionSchedule(df, "score", "id", col("w"),
        lit(-5L))
      .select("id", "repeats").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("waterfillBudgets equals brute-force waterfilling; sums exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // brute force: scan θ upward until the allocation no longer fits,
    // then hand out the remainder to the first rem unfunded strata in
    // (cap, stratum) order
    def brute(caps: Map[String, Long], b: Long): Map[String, Long] = {
      def alloc(th: Long) = caps.values.map(math.min(_, th)).sum
      if (alloc(Long.MaxValue / (caps.size + 1)) <= b)
        return caps // everything funded
      val thMax = (0L to caps.values.max).findLast(alloc(_) <= b).get
      val rem = b - alloc(thMax)
      val unfunded = caps.toSeq.filter(_._2 > thMax)
        .sortBy { case (s, c) => (c, s) }.map(_._1)
      val plusOne = unfunded.take(rem.toInt).toSet
      caps.map { case (s, c) =>
        s -> (if (c <= thMax) c
              else thMax + (if (plusOne(s)) 1L else 0L))
      }
    }
    for (trial <- 1 to 4) {
      val caps = (1 to 8).map(i =>
        s"s$i" -> rnd.nextInt(200).toLong).toMap
      val b = rnd.nextInt(800).toLong
      val got = Sampling.waterfillBudgets(
        caps.toSeq.toDF("stratum", "cap"), "stratum", "cap", lit(b))
        .select("stratum", "budget_tokens")
        .as[(String, Long)].collect().toMap
      val want = brute(caps, b)
      assert(got === want, s"trial $trial caps=$caps b=$b")
      assert(got.values.sum === math.min(b, caps.values.sum),
        s"allocation must sum exactly (trial $trial)")
    }
  }

  test("waterfillBudgets edges: zero budget, over-corpus budget, null cap") {
    import spark.implicits._
    val df = Seq(("a", Some(10L)), ("b", None), ("c", Some(30L)))
      .toDF("stratum", "cap")
    val zero = Sampling.waterfillBudgets(df, "stratum", "cap", lit(0L))
      .select("stratum", "budget_tokens").as[(String, Long)].collect().toMap
    assert(zero === Map("a" -> 0L, "b" -> 0L, "c" -> 0L))
    val over = Sampling.waterfillBudgets(df, "stratum", "cap", lit(999L))
      .select("stratum", "budget_tokens").as[(String, Long)].collect().toMap
    // null capacity treats as 0; everything else fully funded
    assert(over === Map("a" -> 10L, "b" -> 0L, "c" -> 30L))
    val neg = intercept[Exception] {
      Sampling.waterfillBudgets(df, "stratum", "cap", lit(-1L))
        .collect()
    }
    assert(neg.getMessage.contains("negative budget") ||
      neg.getCause != null)
  }

  test("rankEnsemble equals the percent_rank-mean brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1L to 80L).map(i =>
      (i, rnd.nextInt(20).toDouble, rnd.nextInt(500).toLong))
    val df = rows.toDF("id", "s_a", "s_b")
    val got = Sampling.rankEnsemble(df, Seq("s_a", "s_b"), "id", "ens")
      .select("id", "__pr_s_a", "__pr_s_b", "ens")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    def pr(key: Long => (Double, Long)): Map[Long, Double] = {
      val order = rows.map(_._1).sortBy { id =>
        val (s, t) = key(id); (-s, t.toDouble, id)
      }
      val n = order.size
      order.zipWithIndex.map { case (id, i) =>
        id -> (if (n > 1) i.toDouble / (n - 1) else 0.0) }.toMap
    }
    val byId = rows.map(r => r._1 -> r).toMap
    val prA = pr(id => (byId(id)._2, id))
    val prB = pr(id => (byId(id)._3.toDouble, id))
    for (id <- rows.map(_._1)) {
      assert(got(id)._1 === prA(id), s"pr_a of $id")
      assert(got(id)._2 === prB(id), s"pr_b of $id")
      val want = BigDecimal((prA(id) + prB(id)) / 2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._3 === want, s"ensemble of $id")
    }
  }

  test("negativeSample: exact-k different-label draws, equal to the " +
      "md5-rank brute force, deterministic, re-seedable") {
    import spark.implicits._
    val items = (1L to 40L).map(i => (i, (i % 4).toInt))
      .toDF("vec_id", "label")
    val anchors = items.filter(col("vec_id") <= 3)
    def draw(seed: String): Map[Long, Seq[Long]] =
      Sampling.negativeSample(anchors, "vec_id", "label",
        items, "vec_id", "label", k = 5, seed = seed, salts = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val got = draw("s1")
    // brute force: per anchor, top-5 candidates by (md5 desc, id)
    def md5Hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (1L to 3L).map { a =>
      val albl = a % 4
      a -> (1L to 40L).filter(i => i % 4 != albl)
        .sortBy(i => (md5Hex(s"s1:$a:$i"), i))(
          Ordering.Tuple2(Ordering.String.reverse, Ordering.Long))
        .take(5).sorted
    }.toMap
    assert(got === expected)
    // same-label never sampled; exactly k per anchor
    assert(got.values.forall(_.size === 5))
    // deterministic across runs; a different seed draws differently
    assert(draw("s1") === got)
    assert(draw("s2") !== got)
  }

  test("leaveLastOut: eval is the (ts, tie)-max row, embargo is the " +
      "strict window before it, single-row keys are eval-only") {
    import spark.implicits._
    val ev = Seq(
      // user 1: train at 0, train at exactly last-embargo (7000 is NOT
      // > 10000-3000), embargo inside the window, eval at the max
      (1L, 0L, 10L), (1L, 7000L, 11L), (1L, 8000L, 12L),
      (1L, 10000L, 13L),
      // user 2: single event
      (2L, 500L, 20L),
      // user 3: two rows at the SAME max ts — tie id 31 wins eval, 30
      // lands in the embargo zone (its ms equals last.ms > last.ms - e)
      (3L, 9000L, 30L), (3L, 9000L, 31L))
      .toDF("user_id", "ms", "event_id")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = Sampling.leaveLastOut(ev, "user_id", "ts", "event_id",
        embargoMs = 3000L)
      .collect().map(r => r.getLong(2) -> r.getString(4)).toMap
    assert(got === Map(
      10L -> "train", 11L -> "train", 12L -> "embargo", 13L -> "eval",
      20L -> "eval", 30L -> "embargo", 31L -> "eval"))
  }

  test("leaveLastOut: null keys and timestamps are dropped; embargo 0 " +
      "keeps everything below the max as train") {
    import spark.implicits._
    val ev = Seq(
      (Some(1L), Some(0L), 1L), (Some(1L), Some(100L), 2L),
      (None, Some(5L), 3L), (Some(2L), None, 4L))
      .toDF("user_id", "ms", "event_id")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = Sampling.leaveLastOut(ev, "user_id", "ts", "event_id",
        embargoMs = 0L)
      .collect().map(r => r.getLong(2) -> r.getString(4)).toMap
    assert(got === Map(1L -> "train", 2L -> "eval"))
  }

  test("curriculumOrder: a permutation ordered by (bucket, md5) — " +
      "equal to the brute-force global sort, deterministic, " +
      "re-seedable, null rows dropped") {
    import spark.implicits._
    def md5Hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = (1L to 100L).map(i => (i, (i * 37) % 250))
    val df = rows.toDF("id", "w")
    def order(seed: String): Map[Long, Long] =
      Sampling.curriculumOrder(df, "w", bucketWidth = 64L, "id", seed)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = order("e1")
    val expected = rows
      .sortBy { case (i, w) => (w / 64, md5Hex(s"e1:$i"), s"e1:$i") }
      .zipWithIndex.map { case ((i, _), p) => i -> p.toLong }.toMap
    assert(got === expected)
    // permutation of 0..n-1
    assert(got.values.toSeq.sorted === (0L until 100L))
    // deterministic; a new seed reorders within buckets
    assert(order("e1") === got)
    assert(order("e2") !== got)
    // null weight/key rows are dropped, positions stay dense
    val withNulls = df.withColumn("w",
      when(col("id") === 5L, lit(null)).otherwise(col("w")))
    val n2 = Sampling.curriculumOrder(withNulls, "w", 64L, "id", "e1")
      .collect()
    assert(n2.length === 99)
    assert(n2.map(_.getLong(2)).sorted.toSeq === (0L until 99L))
  }

  test("topKWithTies: the cut never splits a tie group — hand case, " +
      "brute-force equality, k >= n keeps all, nulls never qualify") {
    import spark.implicits._
    // values 9,9,7,7,7,3 with k=3: rank of the 7s is 3 -> ALL three
    // 7s stay (plain limit(3) would drop one arbitrarily)
    val hand = Seq((1L, 9L), (2L, 9L), (3L, 7L), (4L, 7L), (5L, 7L),
      (6L, 3L)).toDF("id", "v")
    def ids(df: org.apache.spark.sql.DataFrame, k: Long): Set[Long] =
      Sampling.topKWithTies(df, col("v"), k)
        .collect().map(_.getLong(0)).toSet
    assert(ids(hand, 3) === Set(1L, 2L, 3L, 4L, 5L))
    assert(ids(hand, 2) === Set(1L, 2L))
    assert(ids(hand, 6) === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(ids(hand, 100) === Set(1L, 2L, 3L, 4L, 5L, 6L))
    val rnd = new scala.util.Random(43)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(25).toLong - 5L))
    val df = rows.toDF("id", "v")
    for (k <- Seq(1L, 7L, 50L, 299L)) {
      val want = {
        val sorted = rows.map(_._2).sorted(Ordering[Long].reverse)
        val cut = sorted(math.min(k, sorted.size).toInt - 1)
        rows.filter(_._2 >= cut).map(_._1).toSet
      }
      assert(ids(df, k) === want, s"k=$k")
    }
    // null values: never qualify, never poison the threshold
    val withNull =
      (rows.map { case (i, v) => (i, Some(v): Option[Long]) } :+
        ((301L, None: Option[Long]))).toDF("id", "v")
    assert(Sampling.topKWithTies(withNull, col("v"), 1)
      .collect().map(_.getLong(0)).toSet ===
      rows.filter(_._2 == rows.map(_._2).max).map(_._1).toSet)
  }

  test("stratifiedSplit: exact ceil shares per stratum, a true " +
      "partition, deterministic, re-seed moves membership not counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val langs = Vector("en", "de", "zh", "fr")
    val df = (1L to 237L).map(id => (id, langs(rnd.nextInt(4))))
      .toDF("id", "lang")
    def splits(seed: String) = Sampling.stratifiedSplit(
        df, "id", "lang", cutTrain = 0.8, cutVal = 0.9, seed = seed)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val a = splits("s1")
    // partition: every row present exactly once
    assert(a.map(_._1).sorted.toSeq === (1L to 237L))
    // exact ceil shares per stratum
    val perLang = a.groupBy(_._2)
    perLang.foreach { case (lang, rows) =>
      val n = rows.size
      val nTrain = rows.count(_._3 == "train")
      val nVal = rows.count(_._3 == "val")
      assert(nTrain === math.ceil(0.8 * n).toInt, s"$lang train")
      assert(nTrain + nVal === math.ceil(0.9 * n).toInt, s"$lang val")
    }
    // deterministic; a different seed keeps counts, moves members
    assert(splits("s1").toSeq === a.toSeq)
    val b = splits("s2")
    assert(b.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap ===
      a.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap)
    assert(b.toSet !== a.toSet)
  }

  test("interleaveOrder: every prefix of the order carries each " +
      "stratum within ±1 of proportional (plus key-tie slack)") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    // deliberately skewed strata: 120/40/8
    val rows = (1L to 120L).map(id => (id, "big")) ++
      (200L to 239L).map(id => (id, "mid")) ++
      (300L to 307L).map(id => (id, "small"))
    val df = rows.toDF("id", "lang")
    val got = Sampling.interleaveOrder(df, "id", "lang", seed = "t")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val n = rows.size.toLong
    val nOf = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // key formula replay
    got.foreach { case (_, lang, key, rk) =>
      assert(key === ((2 * rk - 1) * n) / (2 * nOf(lang)))
    }
    // proportionality: walk the total order; after any prefix of
    // length p, stratum s has between floor(p·n_s/N)−1 and
    // ceil(p·n_s/N)+1 members (±1 integral-grid slack, plus ties
    // resolved by the (key, stratum, rank) total order)
    val ordered = got.sortBy { case (_, lang, key, rk) => (key, lang, rk) }
    val seen = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    ordered.zipWithIndex.foreach { case ((_, lang, _, _), i) =>
      seen(lang) += 1
      val p = i + 1L
      nOf.foreach { case (s, ns) =>
        val expect = p.toDouble * ns / n
        assert(math.abs(seen(s) - expect) <= 2.0,
          s"prefix $p stratum $s: ${seen(s)} vs $expect")
      }
    }
  }
}
