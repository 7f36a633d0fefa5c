package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rank-metric evaluation ([[Eval]]): tie-aware AUC vs hand cases and
  * an all-pairs brute force, degenerate classes, and bucket-count
  * invariance (the two-phase prefix sum is an implementation detail —
  * the statistic must not see it). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  /** All-pairs reference: P(pos > neg) + P(pos == neg)/2. */
  private def bruteAuc(rows: Seq[(Long, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    num.toDouble / (2.0 * pos.size * neg.size)
  }

  private def runAuc(rows: Seq[(Long, Boolean)], buckets: Int = 256)
      : (Long, Long, Option[Double]) = {
    val r = Eval.auc(rows.toDF("s", "y"), col("s"), col("y"),
        buckets = buckets, decimals = 9)
      .collect().head
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  private def r9(x: Double) = BigDecimal(x)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("auc: hand cases — perfect separation, perfect inversion, " +
      "all-tied = 0.5") {
    val perfect = Seq((10L, true), (9L, true), (1L, false), (2L, false))
    assert(runAuc(perfect) === ((2L, 2L, Some(1.0))))
    val inverted = perfect.map { case (s, y) => (s, !y) }
    assert(runAuc(inverted) === ((2L, 2L, Some(0.0))))
    val tied = Seq((5L, true), (5L, false), (5L, true), (5L, false))
    assert(runAuc(tied) === ((2L, 2L, Some(0.5))))
  }

  test("auc: a degenerate class (no positives / no negatives / empty " +
      "input) reports null, not 0.5") {
    assert(runAuc(Seq((1L, true), (2L, true))) === ((2L, 0L, None)))
    assert(runAuc(Seq((1L, false), (2L, false))) === ((0L, 2L, None)))
    assert(runAuc(Seq.empty[(Long, Boolean)]) === ((0L, 0L, None)))
  }

  test("auc agrees with the all-pairs brute force on seeded random " +
      "data with heavy ties, at several bucket counts") {
    val rnd = new Random(19)
    // scores drawn from a small range so ties are common; labels
    // correlated with score so the AUC is informative, not 0.5
    val rows = (1 to 400).map { _ =>
      val s = rnd.nextInt(20).toLong
      (s, rnd.nextInt(20) < s + 3)
    }
    val want = r9(bruteAuc(rows))
    for (b <- Seq(1, 7, 256)) {
      val (np, nn, got) = runAuc(rows, buckets = b)
      assert(np === rows.count(_._2).toLong)
      assert(nn === rows.count(!_._2).toLong)
      assert(got === Some(want), s"buckets=$b")
    }
  }

  test("auc: negative scores and a single distinct score bucket edge") {
    val rows = Seq((-5L, false), (-1L, true), (0L, false), (3L, true))
    assert(runAuc(rows, buckets = 2)._3 === Some(r9(bruteAuc(rows))))
  }

  test("aucPerStratum: per-stratum AUCs equal the global kernel run " +
      "per slice; degenerate strata null; NULL stratum survives") {
    val rnd = new Random(29)
    val rows = for {
      s <- Seq("a", "b", null: String); i <- 1 to 120
    } yield {
      val sc = rnd.nextInt(15).toLong
      // stratum b gets an INVERTED signal — the Simpson's-reversal case
      val pos = if (s == "b") rnd.nextInt(20) >= sc + 3
        else rnd.nextInt(20) < sc + 3
      (s, sc, pos, i)
    }
    val df = rows.map(r => (r._1, r._2, r._3)).toDF("s", "sc", "y")
    val got = Eval.aucPerStratum(df, col("s"), col("sc"), col("y"),
        decimals = 9)
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    for (s <- Seq(Some("a"), Some("b"), None)) {
      val slice = rows.filter(r => Option(r._1) == s)
        .map(r => (r._2, r._3))
      val want = (slice.count(_._2).toLong, slice.count(!_._2).toLong,
        Some(r9(bruteAuc(slice))))
      assert(got(s) === want, s)
    }
    assert(got(Some("b"))._3.get < 0.5) // the inversion is visible
    // a single-class stratum reports null, others unaffected
    val deg = (rows :+ (("c", 5L, true, 0))).map(r => (r._1, r._2, r._3))
      .toDF("s", "sc", "y")
    val got2 = Eval.aucPerStratum(deg, col("s"), col("sc"), col("y"))
      .collect().map(r => Option(r.getString(0)) -> r.isNullAt(3)).toMap
    assert(got2(Some("c")))
    assert(!got2(Some("a")))
  }

  /** Tie-averaged ranks then textbook Pearson — the reference for
    * [[Eval.spearman]]. */
  private def bruteSpearman(rows: Seq[(Long, Long)]): Double = {
    def ranks(xs: Seq[Long]): Seq[Double] = {
      val below = xs.groupBy(identity).view.mapValues(_.size).toMap
      xs.map { v =>
        val b = xs.count(_ < v)
        b + (below(v) + 1) / 2.0
      }
    }
    val rx = ranks(rows.map(_._1))
    val ry = ranks(rows.map(_._2))
    val n = rows.size
    val sx = rx.sum; val sy = ry.sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val sxx = rx.map(a => a * a).sum
    val syy = ry.map(a => a * a).sum
    (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
  }

  private def runSpearman(rows: Seq[(Long, Long)], buckets: Int = 256)
      : (Long, Option[Double]) = {
    val r = Eval.spearman(rows.toDF("x", "y"), col("x"), col("y"),
        buckets = buckets, decimals = 9)
      .collect().head
    (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
  }

  private def r9d(x: Double) = BigDecimal(x)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("spearman: hand cases — monotone = 1 even when nonlinear, " +
      "reversed = -1, constant signal = null") {
    val mono = Seq((1L, 1L), (2L, 8L), (3L, 27L), (4L, 1000L))
    assert(runSpearman(mono) === ((4L, Some(1.0))))
    val rev = mono.map { case (a, b) => (a, -b) }
    assert(runSpearman(rev) === ((4L, Some(-1.0))))
    assert(runSpearman(Seq((1L, 5L), (2L, 5L), (3L, 5L)))._2 === None)
    assert(runSpearman(Seq((1L, 2L)))._2 === None) // n < 2
  }

  test("spearman agrees with tie-averaged brute force on seeded " +
      "random data with heavy ties, at several bucket counts") {
    val rnd = new Random(31)
    val rows = (1 to 300).map { _ =>
      val x = rnd.nextInt(15).toLong
      (x, x / 2 + rnd.nextInt(8).toLong) // correlated, tied, noisy
    }
    val want = r9d(bruteSpearman(rows))
    for (b <- Seq(1, 5, 256)) {
      assert(runSpearman(rows, buckets = b) === ((300L, Some(want))),
        s"buckets=$b")
    }
  }

  private def runTrend(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Option[Double], Option[Double])] =
    Eval.olsTrend(rows.toDF("g", "x", "y"), col("g"), col("x"), col("y"),
        decimals = 9)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap

  test("olsTrend: exact line recovered; constant-x and singleton " +
      "groups report null slope") {
    val line = (0L to 10L).map(x => ("a", x, 7L * x + 3L))
    val flat = Seq(("b", 5L, 1L), ("b", 5L, 9L)) // constant x
    val single = Seq(("c", 1L, 2L))
    val got = runTrend(line ++ flat ++ single)
    assert(got("a") === ((11L, Some(7.0), Some(3.0))))
    assert(got("b") === ((2L, None, None)))
    assert(got("c") === ((1L, None, None)))
  }

  test("olsTrend agrees with the closed-form reference on seeded " +
      "random noisy groups") {
    val rnd = new Random(37)
    val rows = for {
      g <- Seq("p", "q"); i <- 1 to 80
    } yield (g, i.toLong, 5L * i + rnd.nextInt(40).toLong - 20L)
    val got = runTrend(rows)
    for (g <- Seq("p", "q")) {
      val xs = rows.collect { case (`g`, x, _) => x }
      val ys = rows.collect { case (`g`, _, y) => y }
      val n = xs.size.toDouble
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxy = xs.zip(ys).map { case (a, b) => (a * b).toDouble }.sum
      val sxx = xs.map(a => (a * a).toDouble).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      def r9x(v: Double) = BigDecimal(v)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(g) === ((80L, Some(r9x(slope)), Some(r9x(icept)))), g)
    }
  }

  /** O(n²) dominance check — the reference for
    * [[Eval.paretoFrontier2D]]. */
  private def bruteSkyline(pts: Seq[(Long, Long, Long)])
      : Set[Long] =
    pts.filterNot { case (_, xb, yb) =>
      pts.exists { case (_, xa, ya) =>
        xa >= xb && ya >= yb && (xa > xb || ya > yb)
      }
    }.map(_._1).toSet

  private def runSkyline(pts: Seq[(Long, Long, Long)], buckets: Int = 256)
      : Set[Long] =
    Eval.paretoFrontier2D(pts.toDF("id", "x", "y"), col("x"), col("y"),
        buckets = buckets)
      .collect().map(_.getLong(0)).toSet

  test("paretoFrontier2D: hand staircase — dominated points fall, " +
      "duplicated frontier points ALL survive, null coords drop") {
    val pts = Seq(
      (1L, 10L, 1L), (2L, 5L, 5L), (3L, 1L, 10L), // the staircase
      (4L, 4L, 4L),  // dominated by (5,5)
      (5L, 5L, 5L),  // duplicate of id 2 — neither dominates
      (6L, 10L, 0L), // same x as 1, smaller y — dominated
      (7L, 0L, 10L)) // same y as 3, smaller x — dominated
    assert(runSkyline(pts) === Set(1L, 2L, 3L, 5L))
    val withNull = pts.map { case (i, x, y) => (i, Some(x), Some(y)) } :+
      ((8L, None: Option[Long], Some(99L)))
    val got = Eval.paretoFrontier2D(withNull.toDF("id", "x", "y"),
        col("x"), col("y"))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L, 5L))
  }

  test("paretoFrontier2D equals the O(n²) dominance check on seeded " +
      "random points with heavy ties, at several bucket counts") {
    val rnd = new Random(47)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val want = bruteSkyline(pts)
    for (b <- Seq(1, 5, 256))
      assert(runSkyline(pts, buckets = b) === want, s"buckets=$b")
  }

  /** Brute-force 2·median of a sorted-able long seq (bracket average). */
  private def med2Of(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = s.length
    s((n + 1) / 2 - 1) + s(n / 2 + 1 - 1)
  }

  private def runMedianMad(rows: Seq[(String, java.lang.Long)], k: Int = 3)
      : Map[String, (Long, Long, Long, Long)] =
    Eval.medianMad(rows.toDF("src", "v"), col("src"), col("v"), k)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("medianMad: hand case — odd and even counts, exact integer " +
      "med2/mad4, outlier counted by the 2·dev2 > k·mad4 predicate") {
    // src a: values 1,3,5,7,100 → med 5, deviations 4,2,0,2,95 →
    // MAD 2; outlier iff |x−5| > 3·2=6 → only 100
    val a = Seq(1L, 3L, 5L, 7L, 100L).map(v => ("a", Long.box(v)))
    // src b: even count 2,4,6,8 → med 5 (med2=10), devs 3,1,1,3 →
    // MAD 2 (mad4=8); no |x−5| > 6
    val b = Seq(2L, 4L, 6L, 8L).map(v => ("b", Long.box(v)))
    assert(runMedianMad(a ++ b) === Map(
      "a" -> ((5L, 10L, 8L, 1L)),
      "b" -> ((4L, 10L, 8L, 0L))))
  }

  test("medianMad: null values are excluded; a null stratum is its own " +
      "ledger row") {
    val rows = Seq(("a", Long.box(1L)), ("a", null: java.lang.Long),
      ("a", Long.box(3L)), (null: String, Long.box(9L)))
    val got = Eval.medianMad(rows.toDF("src", "v"), col("src"), col("v"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(Some("a")) === ((2L, 4L)))   // median of 1,3 = 2 → med2 4
    assert(got(None) === ((1L, 18L)))       // singleton stratum
  }

  test("medianMad agrees with brute force on seeded random strata " +
      "with heavy ties") {
    val rnd = new Random(23)
    val rows = for {
      s <- Seq("x", "y", "z")
      _ <- 1 to (50 + rnd.nextInt(51)) // odd or even per stratum
    } yield (s, Long.box(rnd.nextInt(12).toLong - 3))
    val got = runMedianMad(rows, k = 2)
    for (s <- Seq("x", "y", "z")) {
      val xs = rows.collect { case (`s`, v) => v.longValue }
      val med2 = med2Of(xs)
      val mad4 = med2Of(xs.map(x => math.abs(2 * x - med2)))
      val nOut = xs.count(x => 2 * math.abs(2 * x - med2) > 2 * mad4)
      assert(got(s) === ((xs.size.toLong, med2, mad4, nOut.toLong)), s)
    }
  }

  test("calibrationBins: hand-computed bins — exact truncating rates, " +
      "null scores dropped, empty bins absent") {
    import spark.implicits._
    val df = Seq(
      (Some(120L), true), (Some(130L), false), (Some(149L), true),
      (Some(150L), true),                       // bin 3 alone
      (Some(720L), false), (Some(700L), false), // bin 14, no positives
      (None, true)                              // null score: dropped
    ).toDF("s", "y")
    val got = Eval.calibrationBins(df, col("s"), col("y"), width = 50L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got === Map(
      // bin 2: scores 120,130,149; 2 of 3 positive -> 666; mean 133
      2L -> ((100L, 3L, 2L, 666L, 133L)),
      3L -> ((150L, 1L, 1L, 1000L, 150L)),
      14L -> ((700L, 2L, 0L, 0L, 710L))))
  }

  test("reciprocalRank: hits at their rank, top-k misses as explicit " +
      "zeros, exact integer millis") {
    import spark.implicits._
    val ranked = Seq(
      (10L, 7L, 1L), (10L, 8L, 2L), (10L, 9L, 3L),
      (20L, 7L, 1L), (20L, 21L, 2L),
      (30L, 5L, 1L)).toDF("qid", "doc", "rank")
    val truth = Seq((10L, 9L), (20L, 21L), (30L, 99L), (40L, 40L))
      .toDF("qid", "doc")
    val got = Eval.reciprocalRank(
        ranked, "qid", "doc", "rank", truth, "qid", "doc")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      10L -> ((3L, 333L)),   // 1000 div 3
      20L -> ((2L, 500L)),
      30L -> ((0L, 0L)),     // truth doc absent from the top-k
      40L -> ((0L, 0L))))    // query never retrieved anything
  }

  test("hardNegatives: positives drop, survivors re-rank densely, " +
      "untruthed queries keep all candidates") {
    import spark.implicits._
    val ranked = Seq(
      (10L, 7L, 1L), (10L, 9L, 2L), (10L, 8L, 3L), (10L, 6L, 4L),
      (20L, 20L, 1L), // only hit is the positive itself
      (30L, 1L, 1L), (30L, 2L, 2L)).toDF("qid", "doc", "rank")
    val truth = Seq((10L, 9L), (20L, 20L)).toDF("qid", "doc")
    val got = Eval.hardNegatives(
        ranked, "qid", "doc", "rank", truth, "qid", "doc", n = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (10L, 1L, 7L), (10L, 2L, 8L), // 9 dropped, 8 promoted to rank 2
      (30L, 1L, 1L), (30L, 2L, 2L)  // no truth row -> all kept
    )) // query 20: its whole top-k was the positive -> no rows
  }

  test("ndcgAtK equals a hand-computed reference: perfect ranking = 1, " +
      "inverted < 1, misses explicit zeros, zero-gain-only truth = " +
      "NULL, and the k cut applies to both dcg and idcg") {
    import spark.implicits._
    def dcgTerm(rel: Long, pos: Long): Double =
      (math.pow(2.0, rel.toDouble) - 1.0) /
        (math.log(pos.toDouble + 1.0) / math.log(2.0))
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ranked = Seq(
      // q10: ideal order (rel 3 at rank 1, rel 1 at rank 2) -> ndcg 1
      (10L, 7L, 1L), (10L, 8L, 2L), (10L, 9L, 3L),
      // q20: INVERTED (rel 1 first) -> ndcg < 1
      (20L, 8L, 1L), (20L, 7L, 2L),
      // q30: truth doc at rank 3, but k=2 cuts it -> dcg 0
      (30L, 1L, 1L), (30L, 2L, 2L), (30L, 9L, 3L),
      // q50: retrieved its zero-gain judgment only
      (50L, 5L, 1L)).toDF("qid", "doc", "rank")
    val truth = Seq(
      (10L, 7L, 3L), (10L, 8L, 1L),
      (20L, 7L, 3L), (20L, 8L, 1L),
      (30L, 9L, 2L),
      (40L, 4L, 3L),          // never retrieved -> explicit dcg 0
      (50L, 5L, 0L),          // zero-gain-only -> ndcg NULL
      // TREC-style judged-junk rel = -1 RETRIEVED at rank 1 (q30's
      // doc 1): zero gain, never negative dcg — q30's dcg stays 0.0
      // below, which fails without the rel > 0 clamp on the dcg side
      (30L, 1L, -1L)
    ).toDF("qid", "doc", "rel")
    val got = Eval.ndcgAtK(ranked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val ideal2 = r6(dcgTerm(3, 1) + dcgTerm(1, 2))
    assert(got(10L) === ((ideal2, ideal2, Some(1.0))))
    val inv = r6(dcgTerm(1, 1) + dcgTerm(3, 2))
    assert(got(20L) === ((inv, ideal2, Some(r6(inv / ideal2)))))
    assert(got(20L)._3.get < 1.0)
    assert(got(30L) === ((0.0, r6(dcgTerm(2, 1)), Some(0.0))))
    assert(got(40L) === ((0.0, r6(dcgTerm(3, 1)), Some(0.0))))
    assert(got(50L) === ((0.0, 0.0, None)))
    // the k cut also bounds the IDEAL: with 2 positives and k=1,
    // a perfect rank-1 hit is ndcg 1 (idcg counts one position)
    val got1 = Eval.ndcgAtK(ranked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 1)
      .filter(col("qid") === 10L).collect().head
    assert(got1.getDouble(1) === r6(dcgTerm(3, 1)))
    assert(got1.getDouble(2) === r6(dcgTerm(3, 1)))
    assert(got1.getDouble(3) === 1.0)
  }

  test("rrfFuse equals a hand-computed reference: exact integer micro " +
      "contributions, docs absent from a run contribute nothing, ties " +
      "break on doc id, the k cut applies after fusion") {
    import spark.implicits._
    val runA = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("qid", "doc", "rank")
    val runB = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("qid", "doc", "rank")
    def c(r: Long) = 1000000L / (60L + r)
    val got = Eval.rrfFuse(Seq(runA, runB), "qid", "doc", "rank",
        k = 3, kRrf = 60)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList.sortBy(_._1)
    // doc 11: ranks 2+1 -> 16129+16393=32522; doc 10: 16393;
    // doc 13: 16129; doc 12: 15873 (cut at k=3)
    assert(got === List(
      (1L, 11L, c(2) + c(1)),
      (2L, 10L, c(1)),
      (3L, 13L, c(2))))
    // a pure tie (same contributions) breaks on doc id ascending
    val tied = Eval.rrfFuse(
      Seq(Seq((1L, 5L, 1L), (1L, 4L, 2L)).toDF("qid", "doc", "rank"),
        Seq((1L, 4L, 1L), (1L, 5L, 2L)).toDF("qid", "doc", "rank")),
      "qid", "doc", "rank", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toList.sortBy(_._1)
    assert(tied === List((1L, 4L), (2L, 5L)))
  }

  test("precisionRecallAtK / averagePrecisionAtK equal hand-computed " +
      "references: exact integer milli/micro units, duplicate " +
      "judgments collapse, NULL docs drop, rel<=0 queries emit no " +
      "row, no-hit queries emit explicit zeros") {
    import spark.implicits._
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 60L, 1L))
      .toDF("qid", "doc", "rank")
    val truth = Seq(
      // q1: three positives (10 dup-collapses to max(2,0)=2; 99 never
      // retrieved), one NULL-doc judgment dropped
      (1L, Some(10L), 2L), (1L, Some(10L), 0L), (1L, Some(12L), 1L),
      (1L, Some(99L), 3L), (1L, None, 5L),
      // q2: one positive, zero hits -> explicit zero row
      (2L, Some(50L), 1L),
      // q3: only non-positive judgments -> no denominator, no row
      (3L, Some(70L), 0L))
      .toDF("qid", "doc", "rel")
    val pr = Eval.precisionRecallAtK(ranked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList.sortBy(_._1)
    // q1: hits {10@1, 12@3} = 2 of n_rel 3; p = 1000*2 div 3 = 666,
    // r = 1000*2 div 3 = 666
    assert(pr === List(
      (1L, 3L, 2L, 666L, 666L),
      (2L, 1L, 0L, 0L, 0L)))
    val ap = Eval.averagePrecisionAtK(ranked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList.sortBy(_._1)
    // q1: hit 1 at rank 1 -> 1000000*1 div 1 = 1000000; hit 2 at
    // rank 3 -> 1000000*2 div 3 = 666666; sum 1666666 div
    // min(3, 3) = 555555
    assert(ap === List(
      (1L, 3L, 2L, 555555L),
      (2L, 1L, 0L, 0L)))
    // the k cut bounds the ideal denominator: with n_rel 3 and k=1 a
    // perfect rank-1 hit is AP 1.0 (div by min(n_rel, k) = 1)
    val ap1 = Eval.averagePrecisionAtK(ranked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toList
      .sortBy(_._1)
    assert(ap1 === List((1L, 1000000L), (2L, 0L)))
  }

  test("rrfFuse refuses non-1-based ranks loudly: a rank-0 row (which " +
      "with kRrf=0 would NULL out of the sum under non-ANSI div while " +
      "an ANSI oracle errors) raises in-plan instead of silently " +
      "dropping its contribution") {
    import spark.implicits._
    val zeroBased = Seq((1L, 10L, 0L), (1L, 11L, 1L))
      .toDF("qid", "doc", "rank")
    val e = intercept[Exception] {
      Eval.rrfFuse(Seq(zeroBased), "qid", "doc", "rank",
        k = 2, kRrf = 0).collect()
    }
    assert(e.getMessage.contains("1-based rank"))
    // NULL ranks refuse identically (they would otherwise vanish the
    // same silent way at ANY kRrf)
    val withNull = Seq((1L, 10L, Some(1L)), (1L, 11L, None))
      .toDF("qid", "doc", "rank")
    val e2 = intercept[Exception] {
      Eval.rrfFuse(Seq(withNull), "qid", "doc", "rank", k = 2).collect()
    }
    assert(e2.getMessage.contains("1-based rank"))
  }

  test("precisionRecallAtK / averagePrecisionAtK refuse non-1-based " +
      "and NULL ranks loudly (a 0-based run would keep k+1 docs past " +
      "the <=k cut and NULL out of AP's integer division — the " +
      "rrfFuse guard applied to the set-overlap evals)") {
    import spark.implicits._
    val truth = Seq((1L, 10L, 1L)).toDF("qid", "doc", "rel")
    val zeroBased = Seq((1L, 10L, 0L), (1L, 11L, 1L))
      .toDF("qid", "doc", "rank")
    val withNull = Seq((1L, 10L, Some(1L)), (1L, 11L, None))
      .toDF("qid", "doc", "rank")
    for (bad <- Seq(zeroBased, withNull)) {
      val e1 = intercept[Exception] {
        Eval.precisionRecallAtK(bad, "qid", "doc", "rank",
          truth, "qid", "doc", "rel", k = 2).collect()
      }
      assert(e1.getMessage.contains("1-based rank"))
      val e2 = intercept[Exception] {
        Eval.averagePrecisionAtK(bad, "qid", "doc", "rank",
          truth, "qid", "doc", "rel", k = 2).collect()
      }
      assert(e2.getMessage.contains("1-based rank"))
    }
  }

  test("ndcgAtK judgment hygiene: duplicate (qid, doc) judgments " +
      "collapse to max rel (one dcg term, one ideal position) and " +
      "NULL-doc judgments are dropped, not idcg-inflating") {
    import spark.implicits._
    def dcgTerm(rel: Long, pos: Long): Double =
      (math.pow(2.0, rel.toDouble) - 1.0) /
        (math.log(pos.toDouble + 1.0) / math.log(2.0))
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ranked = Seq((10L, 7L, 1L), (20L, 7L, 1L))
      .toDF("qid", "doc", "rank")
    val truth = Seq(
      // q10: doc 7 judged THREE times (rel 1, 3, 2) -> one judgment
      // at rel 3: dcg = idcg = the single rel-3 term, ndcg = 1
      // (double-counting would emit 3 dcg terms against one rank and
      // give the doc three ideal positions)
      (10L, Some(7L), 1L), (10L, Some(7L), 3L), (10L, Some(7L), 2L),
      // q20: one real judgment plus a NULL-doc rel-3 judgment — the
      // null can never match a hit, so it must not claim the top
      // ideal position (which would cap q20's ndcg below 1 forever)
      (20L, Some(7L), 2L), (20L, None, 3L),
      // q30: ONLY a null-doc judgment -> no valid judgments, no row
      (30L, None, 3L)
    ).toDF("qid", "doc", "rel")
    val got = Eval.ndcgAtK(ranked, "qid", "doc", "rank",
        truth, "qid", "doc", "rel", k = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got.keySet === Set(10L, 20L))
    assert(got(10L) ===
      ((r6(dcgTerm(3, 1)), r6(dcgTerm(3, 1)), Some(1.0))))
    assert(got(20L) ===
      ((r6(dcgTerm(2, 1)), r6(dcgTerm(2, 1)), Some(1.0))))
  }
}
