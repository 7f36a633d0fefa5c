package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dedup operator semantics on controlled fixtures plus the planted
  * near-dup families in the synthetic documents table. */
class DedupSpec extends SparkSpec {

  private lazy val docs = graft.Tables(spark, sf("sf0.001"), "documents")

  // The synthetic corpus plants near-dup pairs at J≥0.95 (verified via
  // the DuckDB probe in tools/check.py development); exact n-gram
  // Jaccard is the ground truth the sketch variants must recover.
  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8,
      partitionCol = Some("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup: identical normalized text collapses") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),   // same after normalization
      (3L, "different doc")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").collect()
    assert(out.length === 2)
    val dupRow = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupRow.getAs[Long]("keep_id") === 1L)
  }

  test("ngram jaccard finds the planted near-dup families") {
    assert(exactPairs.nonEmpty, "synthetic corpus should contain near-dups")
    // all planted pairs are high-similarity: re-running at 0.5 must be
    // a superset of the 0.8 pairs
    val loose = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
      Some("lang")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.subsetOf(loose))
  }

  test("ngram jaccard equals in-test brute force on randomized corpora") {
    // end-to-end property: prefix filtering + sorted-intersect verify
    // must reproduce the exact pairwise Jaccard computation for ANY
    // corpus, not just the planted families. Small vocab forces heavy
    // shingle sharing (the regime where prefix pruning actually prunes).
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    for (trial <- 1 to 2; threshold <- Seq(0.3, 0.6)) {
      val corpus = (1L to 40L).map { id =>
        val len = 6 + rnd.nextInt(10)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val expected = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a < b
        sa = shingles(ta); sb = shingles(tb)
        inter = (sa & sb).size
        j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        if j >= threshold
      } yield (a, b, j)).toSet
      val got = Dedup.ngramJaccardPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"trial=$trial threshold=$threshold")
    }
  }

  test("jaccard candidate pruning survives extreme doc-size skew") {
    // regime where the PPJoin length filter actually FIRES (size
    // ratios far beyond t, so short-vs-long candidate pairs are pruned
    // in-join) and the positional bound prunes late-prefix collisions:
    // tiny docs, huge docs, and exact twins of both, at a high
    // threshold. Output must still equal brute force exactly.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val corpus = (1L to 30L).map { id =>
      // lengths span 5..120 words — ratio 24x, so at t=0.6 the length
      // filter prunes most cross-size candidates
      val len = if (id % 3 == 0) 5 + rnd.nextInt(4)
        else if (id % 3 == 1) 40 + rnd.nextInt(20)
        else 100 + rnd.nextInt(20)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } ++ Seq(  // exact twins (J = 1.0) at both extremes
      31L -> "a b c d e f g",
      32L -> "a b c d e f g")
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    for (threshold <- Seq(0.4, 0.6)) {
      val expected = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a < b
        sa = shingles(ta); sb = shingles(tb)
        inter = (sa & sb).size
        j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        if j >= threshold
      } yield (a, b, j)).toSet
      val got = Dedup.ngramJaccardPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"threshold=$threshold")
      assert(got.exists { case (a, b, _) => a == 31L && b == 32L },
        "exact twins must survive every pruning filter")
    }
  }

  test("incremental dedup equals full recompute filtered to new-touching pairs") {
    val isNew = col("doc_id") % 2 === 0
    val inc = Dedup.incrementalJaccardPairs(
      docs.filter(isNew), docs.filter(!isNew),
      "doc_id", "text", n = 3, threshold = 0.5,
      partitionCol = Some("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("jaccard"))).toSet
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
      Some("lang"))
      .filter(col("a_id") % 2 === 0 || col("b_id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("jaccard"))).toSet
    assert(inc === full)
    assert(inc.nonEmpty, "fixture should produce at least one pair")
  }

  test("incremental new×old length bound admits the exact boundary " +
      "pair (J == t with sz_old == sz_new/t)") {
    // the in-join length filter prunes by t·max(sz) <= min(sz); a pair
    // sitting EXACTLY on the bound (J = 0.5 via A ⊂ B, |B| = 2|A|)
    // must survive — the filter is evaluated at t − 0.001 precisely so
    // the admission band (round(J,3) >= t) can never be clipped
    import spark.implicits._
    val newDf = Seq((2L, "a b c")).toDF("doc_id", "text")
    val oldDf = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val got = Dedup.incrementalJaccardPairs(newDf, oldDf,
      "doc_id", "text", n = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 0.5)))
  }

  test("editDistancePairs: in-join length bound admits the exact " +
      "|len_a − len_b| == maxDist boundary pair") {
    // the length filter now prunes candidates INSIDE the key join
    // (before texts attach); a pair at exactly maxDist length
    // difference is still a legitimate output and must survive
    import spark.implicits._
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghijk")) // ed = 1
      .toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
      q = 2, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 2L, 1)))
  }

  test("char-level default df-cap preserves every uncapped true pair") {
    // charLevel with no explicit cap defaults to a RELATIVE df-cap
    // (15% of corpus docs); maxDocFreqRatio = 1.0 disables pruning.
    // The cap gates candidates only, so equality here proves no planted
    // zh pair is lost to it at the spec SF (and the driver's DuckDB
    // oracle proves the same at the gate SF).
    val zh = docs.filter(col("lang") === "zh")
    def run(ratio: Option[Double]): Set[(Long, Long, Double)] =
      Dedup.ngramJaccardPairs(zh, "doc_id", "text", n = 5, threshold = 0.25,
        charLevel = true, maxDocFreqRatio = ratio)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = run(None)            // default ratio kicks in
    val uncapped = run(Some(1.0))
    assert(uncapped.nonEmpty, "zh slice should contain near-dup pairs")
    assert(capped === uncapped)
  }

  test("minhash LSH recovers every exact near-dup pair") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.8, numHashes = 32, bands = 8, partitionCol = Some("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exactPairs) // verify step kills false positives,
                               // banding at J≥0.95 misses ~nothing
  }

  test("simhash equals brute-force hamming≤3 pair set (pigeonhole recall)") {
    import graft.functions.HashFunctions
    val sigs = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> HashFunctions.simhash64(r.getString(1).split(' ')))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val found = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === brute)
  }

  test("embedding cosine pairs: symmetric threshold behavior") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),  // cos ≈ 0.995
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 0.9)
      .collect()
    assert(out.length === 1)
    assert((out(0).getLong(0), out(0).getLong(1)) === (1L, 2L))
  }

  test("embedding cosine pairs: identical result at any grid size (incl. auto)") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    def run(groups: Option[Int]): Set[(Long, Long, Double)] =
      Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.45, groups)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val auto = run(None)
    assert(auto.nonEmpty)
    assert(run(Some(3)) === auto)
    assert(run(Some(7)) === auto)
  }

  test("semanticPairs: precise subset of exact grid, high recall, monotone probes") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    def toSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = toSet(
      Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.45))
    def sem(probes: Int): Set[(Long, Long, Double)] = toSet(
      Dedup.semanticPairs(emb, "vec_id", "embedding", 0.45,
        targetCellSize = 64, probes = probes))
    val p2 = sem(2)
    // precision 1 by construction: every reported pair is in the exact
    // set WITH the same rounded cosine (never a superset)
    assert(p2.subsetOf(exact), (p2 -- exact).take(5))
    // recall on the gate corpus (deterministic seed → stable measure;
    // q85 runs these exact settings)
    assert(p2.size >= math.ceil(0.85 * exact.size).toInt,
      s"recall ${p2.size}/${exact.size}")
    // single-probe pairs share nearest cells ⊆ 2-nearest cells
    val p1 = sem(1)
    assert(p1.subsetOf(p2))
    // deterministic across runs
    assert(sem(2) === p2)
  }

  test("embedding cosine pairs: pure equi-join plan (no nested-loop/cartesian)") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    val plan = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("minhash LSH plan has no driver-side materialization (no LogicalRDD scan)") {
    // round 1 cut lineage via collect()+parallelize, which surfaced as a
    // "Scan ExistingRDD" leaf; the collect-free rewrite must not.
    val plan = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.8, partitionCol = Some("lang"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan.take(2000))
  }

  test("crossContamination: containment of test shingles in train docs") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val test = Seq(
      // fully contained in train doc 1 (its shingles are a subset)
      (10L, "alpha beta gamma delta epsilon zeta"),
      // half-overlaps train doc 2: shingles 1-4 of 8 shared
      (11L, "one two three four five six unseen words entirely new"),
      // no overlap
      (12L, "totally disjoint content with zero shared phrases here"))
      .toDF("doc_id", "text")
    val out = Dedup.crossContamination(train, test, "doc_id", "text",
      n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.contains((1L, 10L, 1.0)))
    assert(!out.exists(_._2 == 12L))
    // directionality: train ids only on the left, test ids on the right
    assert(out.forall { case (tr, te, _) => tr <= 2L && te >= 10L })
  }

  test("exactNgramDecontam: any shared n-gram flags the pair, count exact") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four")).toDF("doc_id", "text")
    val test = Seq(
      // embeds train doc 1's full token run → shares all 3 of its
      // trigrams despite different framing
      (10L, "zz alpha beta gamma delta epsilon yy"),
      (11L, "totally different words here now")).toDF("doc_id", "text")
    val got = Dedup.exactNgramDecontam(train, test, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 10L, 3L)))
  }

  test("exactNgramDecontam: bloom prefilter is lossless (bit-identical) " +
      "and screens pre-shuffle") {
    val half = docs.filter(col("doc_id") % 2 === 0)
    val other = docs.filter(col("doc_id") % 2 =!= 0)
    val plain = Dedup.exactNgramDecontam(half, other, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomed = Dedup.exactNgramDecontam(half, other, "doc_id", "text",
      n = 5, bloomPrefilter = true)
    val got = bloomed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === plain) // no false negatives; FPs died in the join
    val p = bloomed.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(2000))
    // the test index is MATERIALIZED once (eager localCheckpoint) so
    // the bloom aggregate and the join probe read the same blocks —
    // both consumers must sit on an RDD-scan leaf, never re-shingle
    assert(p.contains("Scan ExistingRDD"), p.take(2000))
    assert(!p.split("might_contain")(0).contains("word_shingles"),
      "the bloom side re-shingles the test corpus:\n" + p.take(2000))
  }

  test("exactNgramDecontam equals brute-force distinct-shingle intersection") {
    // oracle-shaped property on the real corpus: pair set and shared
    // counts must equal the in-test brute force over distinct shingles
    val split = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String, n: Int): Set[String] =
      t.split(" ").sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    val (train, test) = split.partition(_._1 % 2 == 0)
    val expected = (for {
      (a, ta) <- train; (b, tb) <- test
      shared = (shingles(ta, 8) & shingles(tb, 8)).size
      if shared > 0
    } yield (a, b, shared.toLong)).toSet
    val got = Dedup.exactNgramDecontam(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("winnowing: shared run of >= w+k-1 chars yields a shared fingerprint") {
    import spark.implicits._
    import graft.plans.{SketchExpressions => SK}
    val (k, w) = (8, 8)
    val common = "the quick brown fox jumps over the lazy dog near the river bank"
    assert(common.length >= w + k - 1)
    val df = Seq(
      (1L, s"PREFIX AAAA $common SUFFIX BBBB"),
      (2L, s"zz different lead-in text $common and a different tail entirely"),
      (3L, "no overlap with the others whatsoever, totally distinct content"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      SK.winnowFingerprint(col("text"), k, w).as("fp"))
      .as[(Long, Seq[Long])].collect().map { case (id, f) => id -> f.toSet }
      .toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty, "winnowing guarantee violated")
    // density: far fewer fingerprints than k-grams (expected 2/(w+1))
    assert(fps(1L).size < (s"PREFIX AAAA $common SUFFIX BBBB".length - k + 1) / 2)
  }

  test("winnowing pairs: identical docs overlap 1.0, distinct docs absent") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "completely different content with no phrases in common here"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowingPairs(df, "doc_id", "text", k = 8, w = 8,
      minOverlap = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("spread=false skips the corpus repartition and preserves results") {
    // every legitimate Dedup shuffle is hash-partitioned (groupBy /
    // equi-join keys); the opt-in corpus spread is the ONLY round-robin
    // exchange, so its marker pins the flag's plan effect exactly
    def rr(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning")
    // the Jaccard path eagerly checkpoints its index, so the final
    // plan's leaves hide the scan — pin the flag on the index lineage
    // (where the spread exchange lives), and pin the END-TO-END plan's
    // round-robin absence for spread=false below
    val idxOn = Dedup.shingleIndex(docs, "doc_id", "text", 3, Some("lang"))
    val idxOff = Dedup.shingleIndex(docs, "doc_id", "text", 3, Some("lang"),
      spread = false)
    assert(rr(idxOn), "spread=true must round-robin the scan")
    assert(!rr(idxOff), "spread=false must not add any round-robin exchange")
    val off = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
      Some("lang"), spread = false)
    assert(!rr(off), "spread=false must not add any round-robin exchange")
    assert(!rr(Dedup.simhashPairs(docs, "doc_id", "text", spread = false)))
    assert(!rr(Dedup.winnowingPairs(docs, "doc_id", "text", spread = false)))
    // the flag is a physical-layout choice only: identical pair sets
    val pairsOff = off.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsOff === exactPairs)
  }

  test("maxDocFreq prunes hyper-frequent shingles from candidates") {
    import spark.implicits._
    // "common common common" shingle appears in every doc → with a cap
    // of 2 it generates no candidates; the near-identical pair is still
    // found through its rarer shingles
    val df = Seq(
      (1L, "common common common alpha beta gamma delta"),
      (2L, "common common common alpha beta gamma epsilon"),
      (3L, "common common common zeta eta theta iota"),
      (4L, "totally unrelated text about nothing at all"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.3,
      maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L)))
  }

  test("dupSpanScrub: cross-doc duplicated spans excised, unique text " +
      "kept, short docs pass through") {
    import spark.implicits._
    val shared = "a b c" // the duplicated 3-gram, planted in docs 1+2
    val df = Seq(
      (1L, s"u1 u2 $shared u3 u4"),
      (2L, s"v1 $shared v2 v3 v4"),
      (3L, "w1 w2 w3 w4 w5 w6 w7"), // fully unique → untouched
      (4L, "t1 t2"),                // shorter than n → no grams
      (5L, shared))                 // exactly the dup gram → scrubs to ""
      .toDF("doc_id", "text")
    val out = Dedup.dupSpanScrub(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((7L, 3L, "u1 u2 u3 u4")))
    assert(out(2L) === ((7L, 3L, "v1 v2 v3 v4")))
    assert(out(3L) === ((7L, 0L, "w1 w2 w3 w4 w5 w6 w7")))
    assert(out(4L) === ((2L, 0L, "t1 t2")))
    assert(out(5L) === ((3L, 3L, "")))
  }

  test("dupSpanScrub: overlapping duplicated grams merge their cover; " +
      "token accounting is consistent on the corpus") {
    // "x1 x2 x3 x4" in both docs duplicates BOTH 3-grams; their covers
    // overlap on x2 x3 and the whole 4-token run is excised once
    import spark.implicits._
    val df = Seq(
      (1L, "p1 x1 x2 x3 x4 p2"),
      (2L, "q1 q2 x1 x2 x3 x4"))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpanScrub(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((6L, 4L, "p1 p2")))
    assert(out(2L) === ((6L, 4L, "q1 q2")))
    // corpus-level invariant: kept tokens + dup tokens == all tokens
    val agg = Dedup.dupSpanScrub(docs, "doc_id", "text", n = 8)
      .select(
        sum(col("n_tokens")).as("all"),
        sum(col("n_dup_tokens")).as("dup"),
        sum(when(col("scrubbed") === "", 0)
          .otherwise(size(split(col("scrubbed"), " ")))).as("kept"))
      .collect().head
    assert(agg.getLong(0) === agg.getLong(1) + agg.getLong(2))
  }

  test("dupSpanScrub equals brute force on random small-vocab corpora") {
    import spark.implicits._
    // tiny vocabulary forces heavy cross-doc gram collisions — the
    // regime where cover merging and df counting can go subtly wrong
    val vocab = Array("a", "b", "c", "d", "e")
    val n = 3
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(1000 + trial)
      val corpus = (0L until 30L).map { id =>
        val len = rnd.nextInt(13)
        id -> Array.fill(len max 1)(vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      }
      // brute force: mark every position covered by a gram whose
      // DISTINCT-doc frequency is >= 2, excise, reassemble
      val grams = corpus.map { case (id, t) =>
        val tk = t.split(" ", -1)
        id -> ((tk, if (tk.length < n) Array.empty[String]
                else tk.sliding(n).map(_.mkString(" ")).toArray))
      }.toMap
      val df = grams.toSeq
        .flatMap { case (id, (_, gs)) => gs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet.size }
      val want = corpus.map { case (id, _) =>
        val (tk, gs) = grams(id)
        val dup = Array.fill(tk.length)(false)
        gs.zipWithIndex.foreach { case (g, i) =>
          if (df(g) >= 2) (i until i + n).foreach(dup(_) = true) }
        id -> ((tk.length.toLong, dup.count(identity).toLong,
          tk.zipWithIndex.collect { case (t, i) if !dup(i) => t }
            .mkString(" ")))
      }.toMap
      val got = Dedup.dupSpanScrub(
        corpus.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val got = Dedup.snapshotDiff(oldSnap, newSnap, "id", "text")
      .select("id", "status", "old_fp", "new_fp").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(got(1L) === (("removed", false, true)))
    assert(got(2L) === (("unchanged", false, false)))
    assert(got(3L) === (("changed", false, false)))
    assert(got(4L) === (("added", true, false)))
  }

  test("snapshotDiff: NULL<->non-NULL text reads as changed (null-safe fp)") {
    import spark.implicits._
    val oldSnap = Seq((1L, null: String), (2L, null: String))
      .toDF("id", "text")
    val newSnap = Seq((1L, "now set"), (2L, null: String)).toDF("id", "text")
    val got = Dedup.snapshotDiff(oldSnap, newSnap, "id", "text")
      .select("id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "changed")   // null -> value is a content change
    assert(got(2L) === "unchanged") // null on both sides is not
  }

  /** Character-level Levenshtein, the textbook O(n·m) DP. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs: hand case — k edits found at <= k, absent " +
      "past k; exact copies report 0") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val twoEdits = "the quick crown fox jumps over the lazy dog again and agaiX"
    val df = Seq((1L, base), (2L, twoEdits), (3L, base),
      (4L, "completely unrelated text about spark shuffle partitions ok"))
      .toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
        q = 4, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(got === Map((1L, 2L) -> 2, (1L, 3L) -> 0, (2L, 3L) -> 2))
    val strict = Dedup.editDistancePairs(df, "doc_id", "text",
        q = 4, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(strict === Map((1L, 3L) -> 0))
  }

  test("editDistancePairs equals brute force on randomized mutated " +
      "corpora (prefix filter is lossless above the length bound)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("spark", "join", "table", "scan", "merge", "sort",
      "batch", "row", "key", "agg")
    // 40 base docs of 20 words (>= 100 chars, so len-q+1 > k*q holds
    // for q=6, k=3), plus mutated copies at 1-6 char edits
    val bases = (1 to 40).map { i =>
      i.toLong -> (1 to 20).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val mutated = bases.take(15).zipWithIndex.map { case ((id, t), j) =>
      val nEdits = 1 + j % 6
      var s = t
      for (_ <- 1 to nEdits) {
        val p = 1 + rnd.nextInt(s.length - 2)
        s = s.substring(0, p) + ('A' + rnd.nextInt(26)).toChar +
          s.substring(p + 1) // substitution keeps length (band stays 0)
      }
      (100L + id) -> s
    }
    val all = bases ++ mutated
    val df = all.toDF("doc_id", "text")
    val want = (for {
      (ai, at) <- all; (bi, bt) <- all if ai < bi
      d = lev(at, bt) if d <= 3
    } yield (ai, bi) -> d).toMap
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
        q = 6, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(got === want)
  }

  test("containmentPairs equals brute force on randomized corpora " +
      "(asymmetric, both directions, src-prefix candidates lossless)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    for (threshold <- Seq(0.4, 0.7)) {
      // base docs plus true SUBSET docs (a slice of a base doc), the
      // regime where containment fires and Jaccard doesn't
      val bases = (1L to 30L).map { id =>
        val len = 10 + rnd.nextInt(30)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val subsets = bases.take(10).map { case (id, t) =>
        val w = t.split(" ")
        (100L + id) -> w.slice(0, 5 + rnd.nextInt(w.length - 5)).mkString(" ")
      }
      val all = bases ++ subsets
      def sh(t: String): Set[String] =
        t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val expected = (for {
        (a, ta) <- all; (b, tb) <- all if a != b
        sa = sh(ta); sb = sh(tb)
        c = BigDecimal((sa & sb).size.toDouble / sa.size)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        if c >= threshold
      } yield (a, b, c)).toSet
      val got = Dedup.containmentPairs(all.toDF("doc_id", "text"),
          "doc_id", "text", n = 3, threshold = threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"threshold=$threshold")
    }
  }

  test("containment finds the quoted-subset pairs Jaccard misses") {
    import spark.implicits._
    // doc 2 = doc 1's text embedded in 9x unrelated filler: J ~ 0.1,
    // C(1 -> 2) = 1.0. Distinct filler vocab keeps the planted overlap
    // the ONLY shared grams.
    val quoted = (1 to 12).map(i => s"q$i").mkString(" ")
    val filler = (1 to 108).map(i => s"f$i").mkString(" ")
    val df = Seq(
      (1L, quoted),
      (2L, s"$filler $quoted"),
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text",
        n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
    val jaccard = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 3, threshold = 0.9).count()
    assert(jaccard === 0L)
  }
}
