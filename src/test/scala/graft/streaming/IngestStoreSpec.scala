package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the ingest-store maintenance protocol ([[IngestStore]]):
  * bounded file growth under compaction, exact content preservation
  * (including original batch ids), replay idempotence ACROSS a
  * compaction, bloom-sidecar losslessness, and the legacy-store healing
  * paths. The long-run cases (≥20 batches) are the round-6 verdict
  * gate: per-batch cost must stop scaling with total corpus size. */
class IngestStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def storeDirs(path: String): Seq[String] = {
    val d = new java.io.File(path)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq.filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("batch_id="))
  }

  test("prepIngest over 25 batches with compaction: bounded store, " +
      "exact content, replay idempotent across a compaction") {
    val dir = tmp("graft-prep-25")
    // batch b carries docs (10b, 10b+1): 10b is always-new content,
    // 10b+1 duplicates batch (b-1)'s new content for odd b (cross-batch
    // dup → dropped), or is a within-batch dup of 10b for even b>0
    def text(seed: Long) = s"unique content piece $seed " +
      (1 to 10).map(i => s"w$i").mkString(" ")
    def batchDf(b: Long) = {
      val fresh = (10 * b, text(b))
      val second =
        if (b == 0) (1L, text(0)) // within-batch dup of doc 0 (higher id)
        else if (b % 2 == 1) (10 * b + 1, text(b - 1)) // cross-batch dup
        else (10 * b + 1, text(b)) // within-batch dup
      Seq(fresh, second).toDF("doc_id", "text")
    }
    (0L to 24L).foreach { b =>
      Streaming.prepIngestBatch(batchDf(b), b, dir, "doc_id", "text",
        minTokens = 5L, compactEvery = 8, bloomExpectedItems = 1L << 12)
    }
    def content(): Set[(Long, Long)] =
      IngestStore.readStore(spark, dir)
        .select(col("doc_id"), col("batch_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the first occurrence of each distinct content survives, with
    // its ORIGINAL batch id — compaction must not have rewritten history
    val expected = (0L to 24L).map(b => (10 * b, b)).toSet
    assert(content() === expected)
    // compaction at batches 8, 16, 24 → at most base + slices since the
    // last boundary (24) + the current slice; assert a hard bound far
    // below the 25+ dirs an uncompacted store would hold
    val dirs = storeDirs(dir)
    assert(dirs.size <= 4, s"store not bounded: $dirs")
    assert(dirs.contains("batch_id=-24"))
    // bloom sidecar: current + predecessor only
    val blooms = new java.io.File(dir, "_bloom").listFiles()
      .map(_.getName).filter(_.endsWith(".bin"))
    assert(blooms.length <= 2, blooms.mkString(","))
    // replay the last batch (post-failure restart) — content unchanged
    Streaming.prepIngestBatch(batchDf(24), 24L, dir, "doc_id", "text",
      minTokens = 5L, compactEvery = 8, bloomExpectedItems = 1L << 12)
    assert(content() === expected)
    // and replay ACROSS the compaction boundary: batch 24 triggered the
    // boundary move to 24; replaying it again must re-run the compaction
    // as a no-op GC retry, not double-absorb or lose slices
    Streaming.prepIngestBatch(batchDf(24), 24L, dir, "doc_id", "text",
      minTokens = 5L, compactEvery = 8, bloomExpectedItems = 1L << 12)
    assert(content() === expected)
  }

  test("prepIngest: bloom prefilter is lossless — content identical " +
      "with the sidecar deleted (exact-join fallback) and healed after") {
    val dirA = tmp("graft-prep-bloomless")
    val dirB = tmp("graft-prep-bloomful")
    def batchDf(b: Long) = Seq(
      (10 * b, s"batch $b fresh content " + (1 to 8).mkString(" ")),
      (10 * b + 1, s"batch 0 fresh content " + (1 to 8).mkString(" ")))
      .toDF("doc_id", "text")
    (0L to 5L).foreach { b =>
      Streaming.prepIngestBatch(batchDf(b), b, dirA, "doc_id", "text", 5L,
        bloomExpectedItems = 1L << 12)
      Streaming.prepIngestBatch(batchDf(b), b, dirB, "doc_id", "text", 5L,
        bloomExpectedItems = 1L << 12)
      // store A: delete the sidecar between batches → every cross-batch
      // check takes the exact-anti-join fallback, and the LAST batch
      // (no delete after it) re-seeds a complete sidecar from a full pass
      if (b < 5L) {
        val bloomDir = new java.io.File(dirA, "_bloom")
        if (bloomDir.exists()) bloomDir.listFiles().foreach(_.delete())
      }
    }
    def content(dir: String): Set[(Long, Long)] =
      IngestStore.readStore(spark, dir)
        .select(col("doc_id"), col("batch_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(content(dirA) === content(dirB))
    // doc 1 (batch 0's second doc) duplicates doc 0's content → only the
    // min id survived; later batches' +1 docs duplicate batch 0 content
    assert(content(dirB) ===
      ((1L to 5L).map(b => (10 * b, b)).toSet + ((0L, 0L))))
    // store A healed: a complete sidecar exists again after the last batch
    assert(IngestStore.latestBloom(spark, dirA, beforeBatch = 99L).nonEmpty)
  }

  test("prepIngest: exact duplicate rows within a batch write ONE copy") {
    val dir = tmp("graft-prep-duprows")
    val batch = Seq(
      (7L, "alpha beta gamma delta epsilon"),
      (7L, "alpha beta gamma delta epsilon"),
      (7L, "Alpha beta gamma delta epsilon!")) // normalization-equal
      .toDF("doc_id", "text")
    Streaming.prepIngestBatch(batch, 0L, dir, "doc_id", "text", 3L)
    val rows = IngestStore.readStore(spark, dir).collect()
    assert(rows.length === 1)
    // deterministic representative: min raw text among the id's variants
    assert(rows.head.getAs[String]("text") ===
      "Alpha beta gamma delta epsilon!")
  }

  test("dedupIngest over 20 batches with compaction: per-batch pairs " +
      "equal a full recompute, stores bounded, replay idempotent") {
    val corpusDir = tmp("graft-dedup20-corpus")
    val pairsDir = tmp("graft-dedup20-pairs")
    // doc b: shingles drift one word per batch → J(b, b+1) = high,
    // J(b, b+2) lower; distinctive tail keeps unrelated batches apart
    def text(b: Long) = (b to b + 9).map(i => s"tok$i").mkString(" ")
    (0L to 19L).foreach { b =>
      Streaming.ingestDedupBatch(
        Seq((b, text(b))).toDF("doc_id", "text"),
        b, corpusDir, pairsDir, "doc_id", "text",
        n = 3, threshold = 0.5, compactEvery = 8)
    }
    // union of per-batch pair slices == full-corpus recompute (every
    // pair surfaces exactly once, when its later doc arrives)
    val streamed = spark.read.option("basePath", pairsDir).parquet(pairsDir)
      .select("a_id", "b_id", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = graft.operators.Dedup.ngramJaccardPairs(
      (0L to 19L).map(b => (b, text(b))).toDF("doc_id", "text"),
      "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === full)
    assert(full.nonEmpty) // the fixture really does produce near-dups
    // bounded layout for corpus AND the index sidecar
    assert(storeDirs(corpusDir).size <= 6, storeDirs(corpusDir).toString)
    assert(storeDirs(s"$corpusDir/_shingle_index").size <= 6)
    // replay the last batch across the compaction boundary
    Streaming.ingestDedupBatch(
      Seq((19L, text(19))).toDF("doc_id", "text"),
      19L, corpusDir, pairsDir, "doc_id", "text",
      n = 3, threshold = 0.5, compactEvery = 8)
    val replayed = spark.read.option("basePath", pairsDir).parquet(pairsDir)
      .select("a_id", "b_id", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(replayed === full)
    assert(IngestStore.readStore(spark, corpusDir).count() === 20L)
  }

  test("dedupIngest: gram-level bloom sidecar is lossless — pairs " +
      "bit-identical with the sidecar present or suppressed") {
    // batches mix all-new content (the skip path: zero might-contain
    // hits → the old-index scan folds away), near-dups of earlier
    // batches (true collisions → normal path), and supersedes
    def text(seed: Long) = (seed to seed + 9).map(i => s"w$i").mkString(" ")
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, text(0)), (2L, text(100))),
      Seq((3L, text(1000))),          // disjoint from everything: skip path
      Seq((4L, text(2)), (5L, text(2000))), // 4 near-dups 1: collision path
      Seq((6L, text(3000))),          // disjoint again: skip path
      Seq((7L, text(102))))           // near-dups 2
    val withSc = (tmp("graft-idxbloom-c1"), tmp("graft-idxbloom-p1"))
    val noSc = (tmp("graft-idxbloom-c2"), tmp("graft-idxbloom-p2"))
    batches.zipWithIndex.foreach { case (rows, b) =>
      Streaming.ingestDedupBatch(rows.toDF("doc_id", "text"), b.toLong,
        withSc._1, withSc._2, "doc_id", "text", n = 3, threshold = 0.5)
      // suppress the sidecar on the control store before every batch:
      // forces the always-scan path (sidecar absent → covers = false)
      val bloomDir = new java.io.File(s"${noSc._1}/_shingle_index/_bloom")
      if (bloomDir.exists()) {
        bloomDir.listFiles().foreach(_.delete()); bloomDir.delete()
      }
      Streaming.ingestDedupBatch(rows.toDF("doc_id", "text"), b.toLong,
        noSc._1, noSc._2, "doc_id", "text", n = 3, threshold = 0.5)
    }
    def all(dir: String): Set[(Long, Long, Double, Long)] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("a_id"), col("b_id"), col("jaccard"),
          col("batch_id").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    assert(all(withSc._2) === all(noSc._2))
    assert(all(withSc._2).map(t => (t._1, t._2)) === Set((1L, 4L), (2L, 7L)))
    // the sidecar store really is maintaining generations
    assert(new java.io.File(s"${withSc._1}/_shingle_index/_bloom").exists)
  }

  test("dedupIngest oldMaxDocFreq: hot-gram candidates drop (documented " +
      "recall trade), rare-gram pairs and Jaccard exactness survive") {
    // 16 old docs share the hot prefix "a b c d e" (grams abc/bcd/cde
    // have old df = 16); doc 21 shares a RARE gram family with the new
    // batch. A new doc near-dupping the hot family relies ONLY on hot
    // grams; one near-dupping doc 21 relies on rare grams.
    val old = (1L to 16L).map(i => (i, s"a b c d e t$i u$i v$i")) :+
      (21L, "p q r s t z")
    val nw = Seq(
      (100L, "a b c d e w x y"), // J vs each hot doc = 3/9 ~ 0.333
      (101L, "p q r s t u"))     // J vs 21 = 3/5 = 0.6
    def run(cap: Option[Int]): Set[(Long, Long)] = {
      val (c, p) = (tmp("graft-cap-c"), tmp("graft-cap-p"))
      Streaming.ingestDedupBatch(old.toDF("doc_id", "text"), 0L,
        c, p, "doc_id", "text", n = 3, threshold = 0.3)
      Streaming.ingestDedupBatch(nw.toDF("doc_id", "text"), 1L,
        c, p, "doc_id", "text", n = 3, threshold = 0.3,
        oldMaxDocFreq = cap)
      spark.read.option("basePath", p).parquet(p)
        .filter(col("batch_id") === 1L).select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val uncapped = run(None)
    // lossless default: the hot-gram pairs and the rare pair all report
    assert((1L to 16L).forall(i => uncapped.contains((i, 100L))), uncapped)
    assert(uncapped.contains((21L, 101L)))
    val capped = run(Some(8))
    // cap 8 < df 16: candidates that exist ONLY through hot grams drop;
    // the rare-gram pair is untouched
    assert(capped === Set((21L, 101L)), capped)
    // and reported Jaccards are exact wherever a pair reports at all
    val (c2, p2) = (tmp("graft-cap-c2"), tmp("graft-cap-p2"))
    Streaming.ingestDedupBatch(old.toDF("doc_id", "text"), 0L,
      c2, p2, "doc_id", "text", n = 3, threshold = 0.3)
    Streaming.ingestDedupBatch(nw.toDF("doc_id", "text"), 1L,
      c2, p2, "doc_id", "text", n = 3, threshold = 0.3,
      oldMaxDocFreq = Some(8))
    val j = spark.read.option("basePath", p2).parquet(p2)
      .filter(col("a_id") === 21L && col("b_id") === 101L)
      .select("jaccard").head().getDouble(0)
    assert(j === 0.6)
  }

  test("dedupIngest: a later-batch re-ingest supersedes at compaction — " +
      "pairs verify against only the latest version") {
    val corpusDir = tmp("graft-supersede-corpus")
    val pairsDir = tmp("graft-supersede-pairs")
    def ingest(rows: Seq[(Long, String)], b: Long): Unit =
      Streaming.ingestDedupBatch(rows.toDF("doc_id", "text"), b,
        corpusDir, pairsDir, "doc_id", "text",
        n = 3, threshold = 0.5, compactEvery = 2)
    def pairsOf(b: Long): Set[(Long, Long)] =
      spark.read.option("basePath", pairsDir).parquet(pairsDir)
        .filter(col("batch_id") === b)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 0: doc 1 v0 + unrelated doc 2
    ingest(Seq((1L, "a b c d e f"), (2L, "x y z w q r")), 0L)
    assert(pairsOf(0L) === Set.empty)
    // batch 1 RE-INGESTS doc 1 with entirely different text (v1); the
    // current-batch anti-join already hides v0 from THIS batch's check
    ingest(Seq((1L, "p q r s t u")), 1L)
    assert(pairsOf(1L) === Set.empty)
    // batch 2 triggers compaction (compactEvery=2) which must DROP v0
    // from corpus and index. doc 3 near-dups v0 ONLY (J=3/5 vs v0,
    // 0 vs v1) → must NOT pair; doc 4 near-dups v1 (J=3/5) → must pair
    ingest(Seq((3L, "a b c d e g"), (4L, "p q r s t v")), 2L)
    assert(pairsOf(2L) === Set((1L, 4L)))
    // the corpus store holds only the latest version of doc 1
    val texts = IngestStore.readStore(spark, corpusDir)
      .filter(col("doc_id") === 1L).select("text")
      .collect().map(_.getString(0)).toSeq
    assert(texts === Seq("p q r s t u"))
    // and the index sidecar agrees with a fresh shingle of the corpus
    // (no orphaned v0 grams)
    val idxCount = IngestStore.readStore(spark, s"$corpusDir/_shingle_index")
      .count()
    val fresh = graft.operators.Dedup.shingleIndex(
      IngestStore.readStore(spark, corpusDir).select("doc_id", "text"),
      "doc_id", "text", 3, partitionCol = None).count()
    assert(idxCount === fresh)
  }

  test("dedupIngest: legacy corpus without an index sidecar is migrated " +
      "in place (catch-up seed), then served from the index") {
    val corpusDir = tmp("graft-dedup-legacy-corpus")
    val pairsDir = tmp("graft-dedup-legacy-pairs")
    // pre-sidecar layout: corpus slices only (what the round-5 code
    // wrote) — batches 0..2
    (0L to 2L).foreach { b =>
      Streaming.writeBatch(
        Seq((b, (b to b + 9).map(i => s"tok$i").mkString(" ")))
          .toDF("doc_id", "text"),
        corpusDir, "parquet", b)
    }
    assert(!new java.io.File(s"$corpusDir/_shingle_index").exists())
    // batch 3 sees the coverage gap, seeds the index base, and must
    // still report exactly the pairs touching doc 3
    Streaming.ingestDedupBatch(
      Seq((3L, (3L to 12L).map(i => s"tok$i").mkString(" ")))
        .toDF("doc_id", "text"),
      3L, corpusDir, pairsDir, "doc_id", "text", n = 3, threshold = 0.5)
    val pairs = spark.read.option("basePath", pairsDir).parquet(pairsDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = graft.operators.Dedup.incrementalJaccardPairs(
      Seq((3L, (3L to 12L).map(i => s"tok$i").mkString(" ")))
        .toDF("doc_id", "text"),
      (0L to 2L).map(b => (b, (b to b + 9).map(i => s"tok$i").mkString(" ")))
        .toDF("doc_id", "text"),
      "doc_id", "text", n = 3, threshold = 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === expected)
    // the index store now covers the corpus (base seeded over 0..2 plus
    // batch 3's slice)
    assert(IngestStore.coverage(spark, s"$corpusDir/_shingle_index",
      excludeBatch = Long.MinValue) ===
      IngestStore.coverage(spark, corpusDir,
        excludeBatch = Long.MinValue))
  }

  test("coverage: compacted and uncompacted layouts of the same history " +
      "compare equal (canonical form = set semantics)") {
    import spark.implicits._
    val a = tmp("graft-cov-a")
    val b = tmp("graft-cov-b")
    (0L to 3L).foreach { i =>
      Streaming.writeBatch(Seq(i).toDF("v"), a, "parquet", i)
      Streaming.writeBatch(Seq(i).toDF("v"), b, "parquet", i)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    IngestStore.compact(spark, b, schema, upTo = 3L)
    // same history, different physical layout — the equality the
    // corpus/index co-maintenance check depends on (excluding the
    // current in-flight batch, which by protocol is never in a base)
    assert(IngestStore.coverage(spark, a, excludeBatch = 3L) ===
      IngestStore.coverage(spark, b, excludeBatch = 3L))
    assert(IngestStore.coverage(spark, a, excludeBatch = Long.MinValue) ===
      IngestStore.coverage(spark, b, excludeBatch = Long.MinValue))
    val cov = IngestStore.coverage(spark, b, excludeBatch = Long.MinValue)
    assert(cov.contiguous && cov.prefix === 4L)
    assert(cov.allAtOrBelow(3L) && !cov.allAtOrBelow(2L))
  }

  test("IngestStore.compact: content and provenance preserved; " +
      "uncommitted base generations are invisible; GC is retried") {
    val dir = tmp("graft-store-unit")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    (0L to 4L).foreach { b =>
      Streaming.writeBatch(Seq(100 * b).toDF("v"), dir, "parquet", b)
    }
    // an UNCOMMITTED base attempt (crash before the marker commit) must
    // be invisible to readers
    Seq(-1L).toDF("v").write.parquet(s"$dir/batch_id=-3")
    val before = IngestStore.read(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before === (0L to 4L).map(b => (100 * b, b)).toSet)
    IngestStore.compact(spark, dir, schema, upTo = 4L)
    // absorbed slices 0..3 gone, stale base gone, slice 4 live
    assert(storeDirs(dir).toSet === Set("batch_id=-4", "batch_id=4"))
    val after = IngestStore.read(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before)
    // a stale absorbed slice resurfacing (partial GC crash) is ignored
    // by read and deleted by the next compaction
    Streaming.writeBatch(Seq(0L).toDF("v"), dir, "parquet", 2L)
    assert(IngestStore.read(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === before)
    IngestStore.compact(spark, dir, schema, upTo = 4L) // GC retry path
    assert(storeDirs(dir).toSet === Set("batch_id=-4", "batch_id=4"))
  }

  test("IngestStore.readAsOf: pins the corpus moment while ingest " +
      "appends; exact back to the compaction horizon, REFUSED beyond " +
      "it (never a silently wrong snapshot)") {
    val dir = tmp("graft-asof")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    (0L to 4L).foreach { b =>
      Streaming.writeBatch(Seq(100 * b).toDF("v"), dir, "parquet", b)
    }
    def asOf(n: Long): Set[Long] =
      IngestStore.readAsOf(spark, dir, schema, n)
        .collect().map(_.getLong(0)).toSet
    // the pinned moment is stable as later batches land
    assert(asOf(1L) === Set(0L, 100L))
    Streaming.writeBatch(Seq(500L).toDF("v"), dir, "parquet", 5L)
    assert(asOf(1L) === Set(0L, 100L))
    assert(asOf(5L) === Set(0L, 100L, 200L, 300L, 400L, 500L))
    // an asOf BEYOND the committed frontier refuses: the "snapshot"
    // would silently grow as the missing batches land
    val early = intercept[IllegalArgumentException] { asOf(7L) }
    assert(early.getMessage.contains("contiguous coverage"))
    // same for an asOf past an externally torn hole (batch 8 exists
    // but 6-7 do not — coverage stops at the hole)
    Streaming.writeBatch(Seq(800L).toDF("v"), dir, "parquet", 8L)
    intercept[IllegalArgumentException] { asOf(8L) }
    assert(asOf(5L) === Set(0L, 100L, 200L, 300L, 400L, 500L))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$dir/batch_id=8"))
    // compaction (physical fold, ids preserved) keeps every retained
    // moment reconstructible at/above boundary-1...
    IngestStore.compact(spark, dir, schema, upTo = 4L)
    assert(asOf(3L) === Set(0L, 100L, 200L, 300L))
    assert(asOf(4L) === Set(0L, 100L, 200L, 300L, 400L))
    // ...but a moment BEFORE the horizon refuses loudly: a supersede/
    // reduce compaction may have reclaimed versions, and this reader
    // cannot know which hooks past compactions ran
    val err = intercept[IllegalArgumentException] { asOf(2L) }
    assert(err.getMessage.contains("no longer reconstructible"))
    intercept[IllegalArgumentException] { asOf(-1L) }
  }

  test("IngestStore.asOfHorizon: the programmatic form of readAsOf's " +
      "two refusals — a platform can assert a pinned snapshot is " +
      "still reconstructible without provoking the refusal") {
    val dir = tmp("graft-asof-horizon")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    // empty store: no snapshot is valid yet
    assert(IngestStore.asOfHorizon(spark, dir).isEmpty)
    (0L to 4L).foreach { b =>
      Streaming.writeBatch(Seq(100 * b).toDF("v"), dir, "parquet", b)
    }
    // never compacted, contiguous through 4: every moment valid
    assert(IngestStore.asOfHorizon(spark, dir) === Some((0L, 4L)))
    // a torn tail (batch 6 without 5) does not extend the frontier
    Streaming.writeBatch(Seq(600L).toDF("v"), dir, "parquet", 6L)
    assert(IngestStore.asOfHorizon(spark, dir) === Some((0L, 4L)))
    // compaction erodes the retention side to boundary-1
    IngestStore.compact(spark, dir, schema, upTo = 4L)
    assert(IngestStore.asOfHorizon(spark, dir) === Some((3L, 4L)))
    // the endpoints ARE readable; one past either end refuses — the
    // horizon and the refusals can never disagree
    IngestStore.readAsOf(spark, dir, schema, 3L).collect()
    IngestStore.readAsOf(spark, dir, schema, 4L).collect()
    intercept[IllegalArgumentException] {
      IngestStore.readAsOf(spark, dir, schema, 2L)
    }
    intercept[IllegalArgumentException] {
      IngestStore.readAsOf(spark, dir, schema, 5L)
    }
  }

  test("pinnedListing / asOfHorizon: a compaction landing BETWEEN the " +
      "marker read and the re-check turns into a retry that reports " +
      "the post-fold window — never a stale-boundary/post-GC-listing " +
      "chimera") {
    val dir = tmp("graft-pinned-probe")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    (0L to 5L).foreach { b =>
      Streaming.writeBatch(Seq(100 * b).toDF("v"), dir, "parquet", b)
    }
    assert(IngestStore.asOfHorizon(spark, dir) === Some((0L, 5L)))
    // inject ONE compaction between the probe's listing and its
    // marker re-check (self-disabling: compact itself probes the
    // store through pinnedListing and must not re-fire the hook)
    var fired = false
    IngestStore.betweenProbesHookForTests = () =>
      if (!fired) {
        fired = true
        IngestStore.compact(spark, dir, schema, upTo = 4L); ()
      }
    try {
      // without the re-check this call would pair boundary 0 with the
      // post-GC listing {4, 5} — frontier 0, i.e. "no snapshot is
      // valid", a state that existed at NO instant (a false alarm for
      // exactly the alerting probe asOfHorizon exists to serve). The
      // re-check sees the marker move and retries: the answer is the
      // genuine post-fold window.
      assert(IngestStore.asOfHorizon(spark, dir) === Some((3L, 5L)))
      assert(fired)
    } finally IngestStore.betweenProbesHookForTests = () => ()
    // and the endpoints it names are actually readable
    assert(IngestStore.readAsOf(spark, dir, schema, 3L)
      .collect().map(_.getLong(0)).toSet === Set(0L, 100L, 200L, 300L))
    assert(IngestStore.readAsOf(spark, dir, schema, 5L)
      .collect().map(_.getLong(0)).toSet ===
      Set(0L, 100L, 200L, 300L, 400L, 500L))
  }

  test("pinnedListing refuses LOUDLY when the boundary moves on every " +
      "attempt (a store rewritten in a tight loop), instead of " +
      "spinning or returning a torn pair") {
    val dir = tmp("graft-pinned-spin")
    (0L to 2L).foreach { b =>
      Streaming.writeBatch(Seq(100 * b).toDF("v"), dir, "parquet", b)
    }
    var n = 10L
    IngestStore.betweenProbesHookForTests = () => {
      // move the marker under the reader on EVERY probe (raw file
      // write — this is the file protocol under test)
      val w = new java.io.PrintWriter(s"$dir/_graft_boundary")
      try w.print(n.toString) finally w.close()
      n += 1
    }
    try {
      val e = intercept[IllegalArgumentException] {
        IngestStore.asOfHorizon(spark, dir)
      }
      assert(e.getMessage.contains("boundary moved"))
    } finally IngestStore.betweenProbesHookForTests = () => ()
  }

  test("pinnedView race contract, both halves: a compaction racing the " +
      "frame's ACTION leaves the old view fully readable (lagging GC) " +
      "or fails LOUDLY (GC done) — never a silently mixed view") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    def seed(dir: String): Unit =
      (0L to 3L).foreach { b =>
        Streaming.writeBatch(Seq(100 * b).toDF("v"), dir, "parquet", b)
      }
    def cp(from: java.io.File, to: java.io.File): Unit = {
      if (from.isDirectory) {
        to.mkdirs()
        from.listFiles().foreach(f =>
          cp(f, new java.io.File(to, f.getName)))
      } else {
        java.nio.file.Files.copy(from.toPath, to.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
    // half 1 — lagging GC: capture the view, compact, then RESTORE
    // the absorbed slice dirs (simulating a fold whose GC has not
    // reached them yet). The captured frame must read exactly the
    // pre-fold content: its entries name the old dirs, and its
    // boundary filter (b=0) ignores the new base.
    val dirA = tmp("graft-pinned-lag")
    seed(dirA)
    val (bA, liveA, frameA) = IngestStore.pinnedView(spark, dirA, schema)
    assert(bA === 0L && liveA === Seq(0L, 1L, 2L, 3L))
    val backup = new java.io.File(tmp("graft-pinned-bak"))
    cp(new java.io.File(dirA), backup)
    IngestStore.compact(spark, dirA, schema, upTo = 3L)
    (0L to 2L).foreach { b =>
      cp(new java.io.File(backup, s"batch_id=$b"),
        new java.io.File(dirA, s"batch_id=$b"))
    }
    assert(frameA.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 0L), (100L, 1L), (200L, 2L), (300L, 3L)))
    // half 2 — GC complete: the captured frame references deleted
    // slice dirs and must fail the action loudly, never return a
    // mixed or partial view
    val dirB = tmp("graft-pinned-gcd")
    seed(dirB)
    val (bB, _, frameB) = IngestStore.pinnedView(spark, dirB, schema)
    assert(bB === 0L)
    IngestStore.compact(spark, dirB, schema, upTo = 3L)
    assert(storeDirs(dirB).toSet === Set("batch_id=-3", "batch_id=3"))
    intercept[Exception] { frameB.collect() }
  }

  test("compact purge: physically drops tombstones AFTER the " +
      "latest-per-key supersede (a re-ingested key survives, an " +
      "erased key leaves zero rows), keeps NULL-predicate rows, " +
      "replays byte-equivalently, and refuses purge without a " +
      "supersede mechanism") {
    val dir = tmp("graft-purge")
    val schema = Seq((0L, Option("x"))).toDF("id", "payload").schema
    // batch 0: three docs; batch 1: doc 1 redacted (null payload =
    // the tombstone shape), doc 2 re-ingested with new content;
    // batch 2: doc 3 redacted then batch 3 RE-INGESTS doc 3 (a
    // redact-then-re-add — the tombstone is superseded, not latest,
    // so nothing of doc 3 purges)
    Streaming.writeBatch(Seq((1L, Option("one")), (2L, Option("two")),
      (3L, Option("three"))).toDF("id", "payload"), dir, "parquet", 0L)
    Streaming.writeBatch(Seq((1L, Option.empty[String]),
      (2L, Option("two v2"))).toDF("id", "payload"), dir, "parquet", 1L)
    Streaming.writeBatch(Seq((3L, Option.empty[String]))
      .toDF("id", "payload"), dir, "parquet", 2L)
    Streaming.writeBatch(Seq((3L, Option("three again")))
      .toDF("id", "payload"), dir, "parquet", 3L)
    intercept[IllegalArgumentException] {
      IngestStore.compact(spark, dir, schema, upTo = 4L,
        purge = Some(col("payload").isNull))
    }
    assert(IngestStore.compact(spark, dir, schema, upTo = 4L,
      latestPerKey = Some("id"), purge = Some(col("payload").isNull)))
    // physical check: a raw scan over every file in the store (not
    // the boundary-aware read) — erasure means the BYTES are gone
    def raw(): Set[(Long, Option[String])] =
      spark.read.option("basePath", dir).parquet(dir)
        .select(col("id"), col("payload"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getString(1)))).toSet
    assert(raw() === Set((2L, Some("two v2")),
      (3L, Some("three again"))))
    // and the boundary-aware read restores TRUE batch ids: doc 1
    // erased outright, doc 2 its latest version, doc 3 the re-ingest
    def content(): Set[(Long, Option[String], Long)] =
      IngestStore.read(spark, dir, schema)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getString(1)),
          r.getLong(2))).toSet
    assert(content() === Set((2L, Some("two v2"), 1L),
      (3L, Some("three again"), 3L)))
    // replay of the same compaction is a GC no-op with identical bytes
    assert(!IngestStore.compact(spark, dir, schema, upTo = 4L,
      latestPerKey = Some("id"), purge = Some(col("payload").isNull)))
    assert(raw() === Set((2L, Some("two v2")),
      (3L, Some("three again"))))
    // NULL-predicate rows are NOT tombstones: a predicate over a
    // column that is null for a row must KEEP that row (erasure is
    // affirmative — !NULL would silently drop it)
    val dir2 = tmp("graft-purge-null")
    Streaming.writeBatch(Seq((1L, Option("keep me")),
      (2L, Option.empty[String])).toDF("id", "payload"),
      dir2, "parquet", 0L)
    assert(IngestStore.compact(spark, dir2, schema, upTo = 1L,
      latestPerKey = Some("id"),
      // NULL for doc 2 (its payload is null), false for doc 1
      purge = Some(length(col("payload")) > 1000)))
    val left = spark.read.option("basePath", dir2).parquet(dir2)
      .collect().map(_.getLong(0)).toSet
    assert(left === Set(1L, 2L))
  }

  test("snapshotStore: the export is a canonical single-base store " +
      "with TRUE batch ids and horizon (asOf, asOf); supersede+purge " +
      "apply (one version per key, tombstones gone); purge without " +
      "latestPerKey refuses; the source is untouched") {
    val src = tmp("graft-snapstore-src")
    val schema = Seq((0L, Option("x"))).toDF("id", "payload").schema
    Streaming.writeBatch(Seq((1L, Option("one")), (2L, Option("two")))
      .toDF("id", "payload"), src, "parquet", 0L)
    Streaming.writeBatch(Seq((1L, Option("one v2")),
      (3L, Option.empty[String])).toDF("id", "payload"),
      src, "parquet", 1L)
    Streaming.writeBatch(Seq((2L, Option("two v3")))
      .toDF("id", "payload"), src, "parquet", 2L)
    val dst = tmp("graft-snapstore-dst")
    intercept[IllegalArgumentException] {
      IngestStore.snapshotStore(spark, src, dst, schema, asOf = 1L,
        purge = Some(col("payload").isNull))
    }
    IngestStore.snapshotStore(spark, src, dst, schema, asOf = 1L,
      latestPerKey = Some("id"), purge = Some(col("payload").isNull))
    // batch 2 excluded; id 1 superseded to its v2 with TRUE batch id
    // 1; id 3's tombstone purged outright
    val content = IngestStore.read(spark, dst, schema)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)),
        r.getLong(2))).toSet
    assert(content === Set((1L, Some("one v2"), 1L),
      (2L, Some("two"), 0L)))
    assert(IngestStore.asOfHorizon(spark, dst) === Some((1L, 1L)))
    // the source never moved: all three slices, boundary 0
    assert(IngestStore.boundary(spark, src) === 0L)
    assert(IngestStore.sliceIds(spark, src).sorted === Seq(0L, 1L, 2L))
  }

  test("compact skips (not wedges) over a coverage hole; resumes when healed") {
    val dir = tmp("graft-hole")
    val schema = Seq((0L, "x")).toDF("id", "text").schema
    (0 to 3).foreach { b =>
      Streaming.writeBatch(
        Seq((b.toLong, s"doc $b")).toDF("id", "text"), dir, "parquet", b)
    }
    // external surgery: slice 1 vanishes
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$dir/batch_id=1"))
    // compact must not commit a boundary over the hole (laundering it
    // invisible) AND must not throw (the streaming callers run on a
    // fixed batch cadence — a throw replays into the same throw forever)
    assert(!IngestStore.compact(spark, dir, schema, upTo = 4))
    assert(IngestStore.boundary(spark, dir) === 0L)
    // the hole stays visible to the coverage compare
    assert(IngestStore.coverage(spark, dir, excludeBatch = Long.MinValue)
      === IngestStore.Coverage(1L, Set(2L, 3L)))
    // restoring the missing slice resumes compaction on the next cycle
    Streaming.writeBatch(
      Seq((1L, "doc 1")).toDF("id", "text"), dir, "parquet", 1L)
    assert(IngestStore.compact(spark, dir, schema, upTo = 4))
    assert(IngestStore.boundary(spark, dir) === 4L)
    assert(IngestStore.read(spark, dir, schema).count() === 4L)
  }

  test("foreign non-numeric batch_id directories are inert, not fatal") {
    val dir = tmp("graft-foreign")
    val schema = Seq((0L, "x")).toDF("id", "text").schema
    (0 to 2).foreach { b =>
      Streaming.writeBatch(
        Seq((b.toLong, s"doc $b")).toDF("id", "text"), dir, "parquet", b)
    }
    new java.io.File(s"$dir/batch_id=__HIVE_DEFAULT_PARTITION__").mkdirs()
    assert(IngestStore.sliceIds(spark, dir).sorted === Seq(0L, 1L, 2L))
    assert(IngestStore.coverage(spark, dir, excludeBatch = Long.MinValue)
      === IngestStore.Coverage(3L, Set.empty))
    // the READ path loads explicit slice dirs, so the foreign dir does
    // not reach parquet partition-value casting (the root-scan spelling
    // died here with a cast failure on every subsequent batch)
    assert(IngestStore.read(spark, dir, schema).count() === 3L)
    assert(IngestStore.readStore(spark, dir).count() === 3L)
    // compaction (read + GC) must neither parse nor delete the foreign
    // dir — it survives, inert, across the compact
    IngestStore.compact(spark, dir, schema, upTo = 3)
    assert(IngestStore.boundary(spark, dir) === 3L)
    assert(IngestStore.read(spark, dir, schema).count() === 3L)
    assert(new java.io.File(
      s"$dir/batch_id=__HIVE_DEFAULT_PARTITION__").exists())
  }

  test("foreign files in the bloom sidecar dir are inert, not fatal") {
    val dir = tmp("graft-foreignbloom")
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.03)
    bf.putLong(42L)
    IngestStore.writeBloom(spark, dir, upto = 2L, bf)
    // an external process drops junk into _bloom/ — neither the seeding
    // read nor the GC in the next write may NumberFormatException on it
    new java.io.File(s"$dir/_bloom/upto=backup.bin").createNewFile()
    new java.io.File(s"$dir/_bloom/notes.txt").createNewFile()
    val got = IngestStore.latestBloom(spark, dir, beforeBatch = 5L)
    assert(got.map(_._1) === Some(2L))
    assert(got.exists(_._2.mightContainLong(42L)))
    IngestStore.writeBloom(spark, dir, upto = 4L, bf)
    assert(IngestStore.latestBloom(spark, dir, beforeBatch = 5L)
      .map(_._1) === Some(4L))
  }

  test("compact with a reduce hook: absorbed rows are sum-merged, " +
      "later slices stay verbatim, replay is a no-op") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = tmp("graft-reduce-compact")
    val schema = StructType(Seq(
      StructField("tok", StringType, nullable = true),
      StructField("c", LongType, nullable = true)))
    // slices 0..3: token t{b%2} with count b+1 → absorbed [0,3):
    // t0 = 1+3 = 4, t1 = 2; slice 3 (t1, 4) stays live
    (0L to 3L).foreach { b =>
      Streaming.writeBatch(
        Seq((s"t${b % 2}", b + 1)).toDF("tok", "c"), dir, "parquet", b)
    }
    val reduce: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      rows => rows.groupBy(col("tok")).agg(sum(col("c")).as("c"))
        .withColumn("batch_id", lit(0L))
    assert(IngestStore.compact(spark, dir, schema, upTo = 3L,
      reduce = Some(reduce)))
    def content(): Set[(String, Long, Long)] =
      IngestStore.read(spark, dir, schema)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(content() === Set(("t0", 4L, 0L), ("t1", 2L, 0L), ("t1", 4L, 3L)))
    // the base holds exactly one row per token
    assert(storeDirs(dir).sorted === Seq("batch_id=-3", "batch_id=3"))
    // replay of the same compaction: boundary already committed → no-op
    assert(!IngestStore.compact(spark, dir, schema, upTo = 3L,
      reduce = Some(reduce)))
    assert(content() === Set(("t0", 4L, 0L), ("t1", 2L, 0L), ("t1", 4L, 3L)))
  }

  test("seedBase requires a true batch_id column") {
    val dir = tmp("graft-seedreq")
    val e = intercept[IllegalArgumentException] {
      IngestStore.seedBase(spark, dir,
        Seq((1L, "t")).toDF("id", "text"), upTo = 1)
    }
    assert(e.getMessage.contains("batch_id"))
  }
}
