package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

/** File protocol for the continuous-ingest stores ([[Streaming.dedupIngest]]
  * / [[Streaming.prepIngest]]): replay-idempotent per-batch slices plus the
  * two maintenance devices that keep per-batch cost from growing with the
  * accumulated corpus — periodic slice COMPACTION (bounds the file/partition
  * count) and a generational BLOOM sidecar (lets the cross-batch anti-join
  * probe a sketch before touching parquet).
  *
  * Layout of a store rooted at `path`:
  *
  *   - `batch_id=N/` (N >= 0) — one slice per micro-batch, written with
  *     overwrite semantics so a replayed batch REPLACES its own previous
  *     partial output (the [[Streaming.exactlyOnceFileSink]] recipe).
  *   - `batch_id=-B/` (B >= 1) — the compacted BASE: all rows of slices
  *     `< B`, consolidated into one partition. Each row keeps its original
  *     batch id in the data column [[IngestStore.SrcBatchCol]]; [[read]]
  *     coalesces it back so consumers always see true batch ids.
  *   - `_graft_boundary` — one-line text file holding B, committed via
  *     write-to-temp + atomic rename. Absent means B = 0 (no base). A base
  *     directory is VISIBLE only once this marker names it, which is what
  *     makes compaction crash-safe: a half-written base from a failed
  *     attempt is just an unreferenced directory that the retry overwrites.
  *   - `_bloom/upto=N.bin` — optional sidecar: a serialized
  *     [[org.apache.spark.util.sketch.BloomFilter]] over `xxhash64(key)`
  *     of every row in slices `<= N` (and the base). Generational:
  *     sidecar N = sidecar M (the latest predecessor) ∪ the batch-N keys,
  *     so rebuilding N on replay re-reads M — still on disk — and is
  *     idempotent (bloom merge is a bitwise OR).
  *
  * Underscore-prefixed names are invisible to Spark's file listing, so a
  * plain `spark.read.parquet(path)` over the store sees only data.
  *
  * Crash-safety relies on single-writer (Structured Streaming runs one
  * foreachBatch at a time per query) and on atomic rename for the marker
  * commit — true on local filesystems and HDFS; object stores without
  * atomic rename should point the marker at a consistent metadata layer.
  * External readers racing a compaction may observe a transient listing
  * of already-absorbed slices; [[read]] filters them out by boundary, but
  * a reader holding a pre-compaction listing can hit deleted files and
  * should retry — the standard caveat for file stores without snapshot
  * isolation.
  */
object IngestStore extends org.apache.spark.internal.Logging {

  /** Data column inside the compacted base preserving each row's original
    * batch id (the partition value of the base is the boundary, not the
    * row's provenance). */
  val SrcBatchCol = "graft_src_batch"

  private val BoundaryFile = "_graft_boundary"
  private val BloomDir = "_bloom"

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The compaction boundary B: slices `< B` have been absorbed into the
    * base `batch_id=-B`. 0 when the store has never been compacted (or
    * does not exist yet). */
  def boundary(spark: SparkSession, path: String): Long = {
    val (fs, root) = fsOf(spark, path)
    val marker = new Path(root, BoundaryFile)
    if (!fs.exists(marker)) 0L
    else {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def commitBoundary(fs: FileSystem, root: Path, b: Long): Unit = {
    val tmp = new Path(root, s".$BoundaryFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(b.toString.getBytes("UTF-8")) finally out.close()
    // OVERWRITING rename is the atomic commit. A delete-then-rename
    // spelling has a crash window in which NO marker exists — and a
    // missing marker reads as boundary 0, which hides every committed
    // base and would let the next compaction re-seed from incomplete
    // content and GC the real base (permanent loss). FileContext.rename
    // with Options.Rename.OVERWRITE is atomic on local filesystems and
    // HDFS, so the marker transitions old-value -> new-value with no
    // absent state.
    org.apache.hadoop.fs.FileContext.getFileContext(root.toUri,
      fs.getConf)
      .rename(tmp, new Path(root, BoundaryFile),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Live batch ids present as slice directories (`batch_id=N`, N >= 0),
    * whether or not absorbed-and-not-yet-deleted; callers filter by
    * [[boundary]]. Empty for a missing store. */
  /** `batch_id=<long>` directory names parsed defensively: a FOREIGN
    * directory under the store root (e.g. a stray
    * `batch_id=__HIVE_DEFAULT_PARTITION__` from an external writer)
    * must be inert like the underscore-prefixed sidecars, not a
    * NumberFormatException that kills every subsequent batch. */
  private def parseBatchDir(name: String): Option[Long] =
    if (!name.startsWith("batch_id=")) None
    else scala.util.Try(name.stripPrefix("batch_id=").toLong).toOption

  def sliceIds(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(st => parseBatchDir(st.getPath.getName))
      .filter(_ >= 0L)
  }

  /** Bound on [[pinnedListing]]'s marker-moved retries. One retry per
    * CONCURRENT COMPACTION COMMIT landing mid-listing — compactions
    * run on a `compactEvery` cadence from a single writer, so even
    * two in a row is pathological; a marker still moving after this
    * many attempts means something is rewriting the store in a tight
    * loop, and the reader refuses loudly (the protocol's documented
    * racing-reader caveat) rather than spin forever. */
  private val PinnedListingMaxAttempts = 5

  /** Deterministic race-injection point for the pinned-listing
    * protocol's specs: invoked between the (marker, listing) capture
    * and the marker RE-CHECK inside [[pinnedListing]]. Production
    * code never touches it (a no-op); IngestStoreSpec swaps in a
    * compaction to prove — deterministically, not by racing threads —
    * that a mid-probe fold turns into a retry that returns the
    * post-fold state, never a boundary/listing chimera. */
  @volatile private[graft] var betweenProbesHookForTests: () => Unit =
    () => ()

  /** The store's `(boundary, batch directories)` captured at a SINGLE
    * instant: one marker read, one listing, then a marker RE-CHECK —
    * retried (bounded) until the marker is unchanged across the
    * listing. The shared probe under [[pinnedView]], [[coverage]] and
    * [[asOfHorizon]], so no caller can pair a boundary with a listing
    * from a different instant.
    *
    * Why marker-unchanged is sufficient: the boundary commit is the
    * ONLY transition that changes what is VISIBLE under a given
    * boundary. With the marker at `b` on both sides of the listing,
    * the listing can still interleave with (a) the next compaction's
    * not-yet-committed base write — dir `-b'`, invisible under `b`'s
    * base-or-live filter; (b) lagging GC from the compaction that
    * committed `b` — deletes only slices `< b` and bases `!= -b`,
    * all invisible under `b`; (c) the single streaming writer landing
    * a NEW slice — listed or not, both are genuine instants of the
    * store (a listing is never atomic against appends, and appends
    * don't invalidate the pair). So every returned pair describes a
    * state the store actually passed through. Without the re-check, a
    * commit BETWEEN marker read and listing pairs a stale boundary
    * with a post-GC listing — a state that existed at no instant,
    * which e.g. reports an [[asOfHorizon]] whose oldest end was
    * already reclaimed. Entries are `(batchId, dirPath)`, bases
    * included (negative ids); foreign directories are inert
    * ([[parseBatchDir]]). A missing store is `(0, empty)`. */
  private[graft] def pinnedListing(
      spark: SparkSession, path: String): (Long, Seq[(Long, String)]) = {
    val (fs, root) = fsOf(spark, path)
    var attempt = 0
    var result: Option[(Long, Seq[(Long, String)])] = None
    while (result.isEmpty) {
      val b = boundary(spark, path)
      val entries =
        if (!fs.exists(root)) Seq.empty[(Long, String)]
        else fs.listStatus(root).toSeq
          .filter(_.isDirectory)
          .flatMap(st =>
            parseBatchDir(st.getPath.getName)
              .map(_ -> st.getPath.toString))
      betweenProbesHookForTests()
      if (boundary(spark, path) == b) result = Some((b, entries))
      else {
        attempt += 1
        require(attempt < PinnedListingMaxAttempts,
          s"pinnedListing($path): the compaction boundary moved on " +
            s"every one of $PinnedListingMaxAttempts listing attempts " +
            "— the store is being rewritten in a tight loop; retry " +
            "when compaction settles (racing-reader caveat)")
      }
    }
    result.get
  }

  /** The batch ids whose rows a store currently holds, in CANONICAL
    * COMPACT form: covered = `[0, prefix)` ∪ `rest`, where `prefix` is
    * the largest P with every batch below P covered and `rest` holds
    * the (non-contiguous) live slices at or above it. The form is
    * unique per covered set, so case-class equality IS set equality —
    * and it is O(#live-slices) to build and compare, never an
    * element-per-batch set (a million-batch stream would otherwise
    * allocate a million-entry set per micro-batch just to compare two
    * histories). */
  final case class Coverage(prefix: Long, rest: Set[Long]) {
    /** covered == [0, prefix) exactly — no holes, no tail */
    def contiguous: Boolean = rest.isEmpty
    /** every covered batch id is <= n */
    def allAtOrBelow(n: Long): Boolean =
      prefix <= n + 1 && rest.forall(_ <= n)
  }

  /** A store's [[Coverage]] (base `[0, B)` plus un-absorbed slices),
    * excluding `excludeBatch`. Used to check that two co-maintained
    * stores (corpus + index, store + bloom sidecar) cover the same
    * history before trusting a sidecar. */
  def coverage(
      spark: SparkSession, path: String, excludeBatch: Long): Coverage = {
    val (b, entries) = pinnedListing(spark, path)
    val live = entries.map(_._1)
      .filter(id => id >= b && id >= 0L).toSet - excludeBatch
    var p = b
    while (live.contains(p)) p += 1
    Coverage(p, live.filter(_ >= p))
  }

  /** Read the store's current content: base + live slices, minus
    * `excludeBatch` (a replaying batch excludes its own possibly
    * half-written slice). Supplies an EXPLICIT schema — inference inside a
    * stream's batch function is fragile (an existing-but-empty dir has
    * nothing to infer from and would kill batch 0) — and returns
    * `dataSchema`'s columns plus a true `batch_id` (base rows get their
    * preserved original id back). A missing store reads as zero rows. */
  def read(
      spark: SparkSession, path: String, dataSchema: StructType,
      excludeBatch: Long = Long.MinValue): DataFrame =
    pinnedView(spark, path, dataSchema, excludeBatch)._3

  /** [[read]] plus the `(boundary, liveSliceIds)` the frame was built
    * against — ONE [[pinnedListing]] probe (marker read + listing +
    * marker re-check) decides all three, so a multi-step reader (the
    * live-key supersede split, the BM25 stats-sidecar correction) can
    * derive EVERY decision from the same instant's view. Deriving
    * them from separate reads is how a racing compaction silently
    * corrupts a correction: a boundary read AFTER the fold paired
    * with a listing from BEFORE it classifies absorbed rows as base
    * rows (and a boundary read BEFORE the fold paired with a post-GC
    * listing silently loses the base — the case the re-check
    * retries). With the pinned view a compaction racing the frame's
    * ACTION either leaves the old view fully readable (lagging GC —
    * the answer is then exactly the pre-fold content, correct) or
    * deletes directories the frame references (the read fails LOUDLY
    * — the protocol's documented racing-reader retry caveat, never a
    * silently mixed view). Both halves are spec-pinned
    * deterministically (IngestStoreSpec). */
  def pinnedView(
      spark: SparkSession, path: String, dataSchema: StructType,
      excludeBatch: Long = Long.MinValue)
      : (Long, Seq[Long], DataFrame) = {
    val (fs, root) = fsOf(spark, path)
    val full = StructType(
      dataSchema.fields :+
        StructField(SrcBatchCol, LongType, nullable = true) :+
        StructField("batch_id", LongType, nullable = true))
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(dataSchema.fields :+
        StructField("batch_id", LongType, nullable = true)))
    if (!fs.exists(root)) (0L, Seq.empty, empty)
    else {
      // boundary + entries from the marker-rechecked single-instant
      // probe; entries are EXPLICIT slice/base directories, never the
      // bare root: a foreign `batch_id=<garbage>` dir dropped by an
      // external writer would fail parquet partition-value casting on
      // a root scan and kill every subsequent batch — the same failure
      // class [[parseBatchDir]] makes inert on the listing paths
      val (b, entries) = pinnedListing(spark, path)
      val live = entries.map(_._1)
        .filter(id => id >= b && id != excludeBatch).sorted
      val frame =
        if (entries.isEmpty) empty
        else spark.read.option("basePath", path).schema(full)
          .parquet(entries.map(_._2): _*)
          // partition-pruned: absorbed-but-not-yet-deleted slices and
          // uncommitted base attempts are never read
          .filter(col("batch_id") =!= lit(excludeBatch) &&
            baseOrLive(b))
          .withColumn("batch_id",
            coalesce(col(SrcBatchCol), col("batch_id")))
          .drop(SrcBatchCol)
      (b, live, frame)
    }
  }

  /** Directories under `root` that are actually slices or bases
    * (`batch_id=<long>`), as load paths — foreign dirs are inert. */
  private def validDirs(fs: FileSystem, root: Path): Seq[String] =
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .filter(st => parseBatchDir(st.getPath.getName).isDefined)
      .map(_.getPath.toString)

  /** The one definition of "currently visible": the committed base plus
    * slices at/above the boundary (shared by [[read]] and [[readStore]]
    * so the two readers cannot silently diverge). */
  private def baseOrLive(b: Long): Column =
    col("batch_id") === lit(-b) || col("batch_id") >= lit(b)

  /** Reader for downstream consumers: same base+slice resolution as
    * [[read]], with true batch ids restored. This is the API form of
    * the accepted-store contract — use it instead of a raw
    * `spark.read.parquet(path)`, which would surface the base's
    * synthetic `batch_id=-B` partition value.
    *
    * Pass `dataSchema` where available — it delegates to [[read]]'s
    * explicit-schema contract (a missing or empty store reads as zero
    * rows). Without it the schema is inferred with `mergeSchema` (the
    * base carries [[SrcBatchCol]] and slices do not; single-footer
    * inference would silently drop whichever side loses the footer
    * race), and a missing/empty store fails the same way any
    * inference-based read does — with a clear error naming the fix. */
  def readStore(
      spark: SparkSession, path: String,
      dataSchema: Option[StructType] = None): DataFrame =
    dataSchema match {
      case Some(s) => read(spark, path, s)
      case None =>
        val (fs, root) = fsOf(spark, path)
        require(fs.exists(root),
          s"ingest store $path does not exist; pass dataSchema to read " +
            "a not-yet-created store as zero rows")
        val b = boundary(spark, path)
        val dirs = validDirs(fs, root)
        require(dirs.nonEmpty,
          s"ingest store $path has no slices to infer a schema from; " +
            "pass dataSchema to read an empty store as zero rows")
        val df = spark.read
          .option("basePath", path).option("mergeSchema", "true")
          .parquet(dirs: _*)
          .filter(baseOrLive(b))
        val restored =
          if (df.columns.contains(SrcBatchCol))
            df.withColumn("batch_id",
              coalesce(col(SrcBatchCol), col("batch_id").cast(LongType)))
              .drop(SrcBatchCol)
          else df.withColumn("batch_id", col("batch_id").cast(LongType))
        restored
    }

  /** Read ONLY the given live slices (ids >= 0) — partition-pruned at
    * the file LISTING, so the scan's I/O is bounded by the slices
    * named, never the base: the delta-sized probe behind
    * [[graft.streaming.Streaming]]'s live-key supersede split (only
    * keys present in un-absorbed slices can hold two versions, so the
    * read-time latest-per-key window needs only THIS key set, not a
    * full-store shuffle). Slices carry their data columns verbatim
    * (no [[SrcBatchCol]]); `batch_id` comes back as the partition
    * value, which for a live slice IS the true batch id. A listed id
    * whose directory has vanished (racing compaction's GC) fails the
    * read — the standard retry caveat for file stores without
    * snapshot isolation. */
  def readSlices(
      spark: SparkSession, path: String, dataSchema: StructType,
      ids: Seq[Long]): DataFrame = {
    require(ids.nonEmpty, "readSlices needs at least one slice id")
    require(ids.forall(_ >= 0L),
      s"readSlices reads live slices only (ids >= 0), got $ids")
    val full = StructType(dataSchema.fields :+
      StructField("batch_id", LongType, nullable = true))
    spark.read.option("basePath", path).schema(full)
      .parquet(ids.map(i => s"$path/batch_id=$i"): _*)
  }

  /** Snapshot (as-of) read: the store's content as it stood after
    * batch `asOf` committed — rows whose true batch id is `<= asOf`.
    * The reproducibility primitive: a training run pins `asOf` once
    * and re-reads the identical corpus while ingest keeps appending
    * (later slices are invisible by the filter, and the slice
    * protocol makes batch content immutable once committed).
    *
    * Retention contract — exact only back to the compaction horizon:
    * a supersede/reduce compaction folds slices `< B` into the base
    * keeping only each key's NEWEST version (or merged counters), so
    * the store can no longer reconstruct a moment BEFORE that fold.
    * Every retained version's id is `<= B-1` after the fold, so
    * `asOf >= boundary - 1` is reconstructible exactly (each key's
    * surviving pre-boundary version is its newest, which the filter
    * keeps; live slices filter precisely); anything older REFUSES
    * loudly rather than returning a silently wrong snapshot. Size
    * `compactEvery` to the snapshot horizon the deployment needs —
    * the protocol's existing knob, now carrying a second meaning.
    * Physical-only compaction (`latestPerKey`/`reduce` both unset)
    * preserves all rows and ids, so pure-append stores (labels,
    * postings WITHOUT re-ingest) stay exactly reconstructible at any
    * `asOf` — but this function cannot know which hooks past
    * compactions ran, so it enforces the conservative bound. */
  def readAsOf(
      spark: SparkSession, path: String, dataSchema: StructType,
      asOf: Long): DataFrame = {
    // one marker read + one listing decide BOTH bounds of the valid
    // window (retention below, committed frontier above) AND the
    // frame — the pinned-view consistency contract
    val (b, live, frame) = pinnedView(spark, path, dataSchema)
    validateAsOf(path, b, live.toSet, asOf)
    frame.filter(col("batch_id") <= asOf)
  }

  /** [[readAsOf]]'s two refusals, against a CALLER-CAPTURED view (a
    * [[pinnedView]] boundary + live slice ids) — shared so multi-step
    * readers validate against the same instant their frame was built
    * from, never a fresher marker. */
  def validateAsOf(
      path: String, b: Long, live: Set[Long], asOf: Long): Unit = {
    require(asOf >= 0, s"asOf must be a committed batch id, got $asOf")
    require(asOf >= b - 1,
      s"ingest store $path has compacted batches < $b into its base; " +
        s"a snapshot as of batch $asOf is no longer reconstructible " +
        "(superseded versions were reclaimed) — retain snapshots by " +
        "sizing compactEvery to the horizon you need")
    // the snapshot is only a snapshot if every batch <= asOf has
    // already committed: an asOf beyond the ingest frontier (or over
    // an externally torn hole) would return a result that silently
    // GROWS as the missing batches land — the opposite of pinning
    var frontier = b
    while (live.contains(frontier)) frontier += 1
    require(frontier > asOf,
      s"ingest store $path has contiguous coverage only through " +
        s"batch ${frontier - 1}; a snapshot as of batch $asOf is not " +
        "yet (or no longer) fully committed and would change as " +
        "batches land — pin an asOf at or below the frontier")
  }

  /** The window of exactly-reconstructible snapshot ids, as
    * `Some((oldest, newest))` — the PROGRAMMATIC form of
    * [[readAsOf]]'s two refusals, so a training platform can assert
    * "snapshot X is still reconstructible" (and alert before a
    * compaction erodes a pinned snapshot) without provoking the
    * refusal: `oldest = max(boundary − 1, 0)` (the retention bound —
    * superseded versions below it were reclaimed) and `newest =
    * frontier − 1` (the committed-coverage bound — beyond it a
    * snapshot would grow as batches land). None when no snapshot is
    * valid yet (empty store, or a coverage hole at the boundary).
    * Boundary and live ids come from ONE [[pinnedListing]] probe (the
    * same single-instant capture [[pinnedView]] reads under), so the
    * advisory window always describes a state the store actually
    * passed through — a compaction racing the probe turns into a
    * retry that reports the post-fold window, never a stale boundary
    * paired with a post-GC listing (a window that existed at no
    * instant, whose oldest end was already reclaimed). The answer can
    * still be stale by the time the caller acts on it — pin
    * snapshots with margin, or pause compaction while pinned (size
    * `compactEvery` to the horizon, as documented there). */
  def asOfHorizon(
      spark: SparkSession, path: String): Option[(Long, Long)] = {
    val (b, entries) = pinnedListing(spark, path)
    val live = entries.map(_._1).filter(id => id >= b && id >= 0L).toSet
    var frontier = b
    while (live.contains(frontier)) frontier += 1
    val oldest = math.max(b - 1, 0L)
    if (frontier - 1 < oldest) None else Some((oldest, frontier - 1))
  }

  /** Absorb the base and every slice `< upTo` into a new base
    * `batch_id=-upTo`, commit the boundary, then garbage-collect the
    * absorbed directories. Physical-only by default: row content
    * (including original batch ids) is preserved exactly; only the
    * file layout changes. Idempotent under replay — a boundary already
    * at/past `upTo` reduces the call to a GC retry — and crash-safe at
    * every step: a failure before the commit leaves the old generation
    * fully intact (the half-written base is unreferenced); a failure
    * after the commit leaves only garbage directories that [[read]]
    * already ignores and the next call deletes. Returns true iff a base
    * was committed this call; false on replay/no-op and on the
    * coverage-hole skip (see body).
    *
    * `latestPerKey`: when set, the absorbed base keeps only each key's
    * LATEST-batch rows — the supersede step for stores whose semantic
    * contract is latest-version-wins (the ingest-dedup corpus + shingle
    * index: an id re-ingested in a later batch replaces its old
    * version here, so post-compaction batches verify against only the
    * latest text instead of the union of versions). The drop happens
    * during the full rewrite compaction performs anyway — one extra
    * window pass over the absorbed rows, zero extra per-batch cost —
    * and stays idempotent (replay recomputes the same base). Rows
    * sharing the key WITHIN the latest batch are all kept (slice
    * content is preserved verbatim); a NULL key is a valid key (window
    * partitioning groups nulls).
    *
    * `reduce`: when set, the absorbed rows are REWRITTEN through the
    * given aggregation before landing in the base — the supersede step
    * for stores whose semantic contract is mergeable-counter (a
    * unigram-counts store compacts `sum(c)`-per-token, so the base
    * stays vocabulary-sized instead of accreting one vocabulary-sized
    * row set per absorbed batch). The callback receives the absorbed
    * rows (data columns + true `batch_id`) and must return data
    * columns plus a `batch_id` column whose values are `< upTo` (a
    * merged base conventionally stamps `lit(0)`); determinism of the
    * callback is what keeps replayed compactions byte-equivalent.
    * Composes with `latestPerKey` (applied first).
    *
    * `sortBy`: when non-empty, the absorbed base's files are
    * clustered by these columns (a partition-local sort during the
    * rewrite compaction performs anyway — nothing shuffles), so
    * parquet row-group min/max stats make downstream static filters
    * on them (the ANN probed-cell pushdown, the BM25 query-term
    * pushdown) skip whole row groups.
    *
    * `purge`: when set, rows matching the predicate are PHYSICALLY
    * DROPPED from the absorbed base — the erasure completion for
    * tombstone stores (the index store's `token IS NULL` rows, the
    * embedding store's null-vector rows): [[latestPerKey]] already
    * made the tombstone each redacted key's only surviving version,
    * and the query side filters tombstones anyway, so after the purge
    * ZERO bytes about the redacted key remain in the base (the
    * right-to-erasure guarantee logical redaction alone cannot give —
    * q225 keeps the stale rows physically present until here). Sound
    * because (a) the predicate must match only rows whose absence is
    * read-equivalent to their filtered presence (tombstones by
    * construction), and (b) every still-readable as-of snapshot is
    * `>= upTo - 1`, at-or-after EVERY absorbed batch — so the
    * tombstone already wins at each of them and dropping it changes
    * no readable answer ([[readAsOf]]'s retention bound is what makes
    * this an equivalence, not an approximation). Requires a supersede
    * mechanism (`latestPerKey` or `reduce`): purging a tombstone
    * while the stale versions it supersedes survive would RESURRECT
    * the redacted rows — refused loudly. Applied after
    * `latestPerKey`/`reduce`, before `sortBy`; deterministic, so
    * replayed compactions stay byte-equivalent. */
  def compact(
      spark: SparkSession, path: String, dataSchema: StructType,
      upTo: Long, latestPerKey: Option[String] = None,
      reduce: Option[DataFrame => DataFrame] = None,
      sortBy: Seq[String] = Nil,
      purge: Option[Column] = None): Boolean = {
    require(upTo > 0, s"compaction boundary must be positive, got $upTo")
    require(purge.isEmpty || latestPerKey.isDefined || reduce.isDefined,
      s"compact($path): purge without a supersede mechanism " +
        "(latestPerKey/reduce) would resurrect the rows the purged " +
        "tombstones supersede")
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) return false
    val b0 = boundary(spark, path)
    val absorbable = b0 < upTo &&
      (b0 > 0 || sliceIds(spark, path).exists(n => n >= b0 && n < upTo))
    if (absorbable) {
      // a hole in [0, upTo) must STAY VISIBLE: committing a boundary
      // over it would collapse the coverage to a contiguous [0, upTo)
      // and launder the hole invisible — the corpus-vs-index coverage
      // compare that gates the ingest fallback paths depends on holes
      // being detectable. SKIP the absorb (warn, keep the slice layout
      // as-is) rather than throw: the production callers run this on a
      // fixed batchId % compactEvery cadence, so a throw would replay
      // into the same throw forever and wedge a stream whose
      // hole-tolerant fallback paths are otherwise still correct.
      // External slice deletion is surfaced by the warning and by the
      // coverage compare; compaction resumes on its own if the missing
      // slices are restored.
      val cov = coverage(spark, path, excludeBatch = Long.MinValue)
      if (cov.prefix < upTo) {
        logWarning(
          s"compact($path, upTo=$upTo): store covers only " +
            s"[0, ${cov.prefix}) contiguously (live tail ${cov.rest}) — " +
            "compacting would commit a boundary over a coverage hole; " +
            "skipping this compaction (restore the missing slices to " +
            "resume compaction)")
        false
      } else {
        val content =
          read(spark, path, dataSchema).filter(col("batch_id") < lit(upTo))
        seedBase(spark, path,
          canonicalize(content, latestPerKey, reduce, purge, sortBy),
          upTo) // commits boundary, GCs
        true
      }
    } else { gc(fs, root, b0); false } // replay/no-op: retry pending GC
  }

  /** The base-rewrite step shared by [[compact]] and [[snapshotStore]]:
    * latest-per-key supersede, optional `reduce` merge, tombstone
    * purge, then write-clustering — one spelling so a snapshot base
    * and a compacted base can never diverge in canonical form. */
  private def canonicalize(
      content: DataFrame, latestPerKey: Option[String],
      reduce: Option[DataFrame => DataFrame], purge: Option[Column],
      sortBy: Seq[String]): DataFrame = {
    val kept = latestPerKey match {
      case Some(key) =>
        import org.apache.spark.sql.expressions.Window
        content
          .withColumn("__graft_latest", max(col("batch_id"))
            .over(Window.partitionBy(col(key))))
          .filter(col("batch_id") === col("__graft_latest"))
          .drop("__graft_latest")
      case None => content
    }
    val merged = reduce.fold(kept)(f => f(kept))
    // NULL-predicate rows are NOT tombstones (erasure must be
    // affirmative): a bare `filter(!p)` would drop them too,
    // because !NULL is NULL and filter discards NULL
    val purged = purge.fold(merged)(p =>
      merged.filter(!coalesce(p, lit(false))))
    if (sortBy.isEmpty) purged
    else purged.sortWithinPartitions(sortBy.map(col): _*)
  }

  /** Freeze the exactly-reconstructible snapshot `asOf` of the store
    * at `srcPath` into a NEW, independent store at `dstPath` — the
    * training-set EXPORT: a frozen corpus a training run can cite and
    * replay while the source keeps ingesting and compacting past the
    * moment ([[asOfHorizon]] warns when a pinned asOf is about to
    * erode; this removes the store's own lifecycle from the equation
    * entirely). The destination is a canonical single-base store with
    * boundary `asOf + 1`: TRUE batch ids `<= asOf` are preserved
    * (its own [[asOfHorizon]] is exactly `(asOf, asOf)`), and the
    * same supersede/purge/clustering [[compact]] applies make it
    * indistinguishable from a store that ingested batches
    * `[0, asOf]` and fully compacted — REQUIRED, not cosmetic: a
    * seeded base must hold one version per key because the
    * fully-compacted read path skips the supersede window
    * ([[readAsOf]] itself returns all versions and relies on the
    * query layer to supersede, which a bare re-seed would break).
    *
    * Validity window and refusals are [[readAsOf]]'s
    * ([[validateAsOf]]); the destination must be EMPTY (a torn
    * snapshot cannot be resumed — delete it and re-run, the source
    * never moved: the migrateEmbStore crash contract). The source is
    * read-only throughout. Store-specific sidecars (BM25 stats,
    * centroid models) are the wrappers' job —
    * [[graft.streaming.Streaming.snapshotIndexStore]] /
    * [[graft.streaming.Streaming.snapshotEmbStore]].
    *
    * Pass the SAME `latestPerKey`/`reduce`/`purge`/`sortBy` hooks the
    * store's own compaction cadence uses — the identical contract a
    * direct [[compact]] call carries (the hooks ARE the store's
    * semantic contract; this API cannot infer them): omitting a
    * supersede hook the source compacts with seeds a multi-version
    * base that the fully-compacted read path (which rightly skips the
    * supersede window) would then double-read. The wrappers above
    * encode the right hooks for the two query stores. */
  def snapshotStore(
      spark: SparkSession, srcPath: String, dstPath: String,
      dataSchema: StructType, asOf: Long,
      latestPerKey: Option[String] = None,
      reduce: Option[DataFrame => DataFrame] = None,
      purge: Option[Column] = None,
      sortBy: Seq[String] = Nil): Unit = {
    require(purge.isEmpty || latestPerKey.isDefined || reduce.isDefined,
      s"snapshotStore($dstPath): purge without a supersede mechanism " +
        "(latestPerKey/reduce) would resurrect the rows the purged " +
        "tombstones supersede")
    require(
      sliceIds(spark, dstPath).isEmpty && boundary(spark, dstPath) == 0L,
      s"snapshotStore: target $dstPath is not empty — a torn " +
        "snapshot cannot be resumed; delete it and re-run (the " +
        "source store never moved)")
    val rows = readAsOf(spark, srcPath, dataSchema, asOf)
    seedBase(spark, dstPath,
      canonicalize(rows, latestPerKey, reduce, purge, sortBy),
      upTo = asOf + 1)
  }

  /** Write `rows` (data columns + a true `batch_id` column, all ids
    * `< upTo`) as the committed base `batch_id=-upTo` and GC everything it
    * supersedes. [[compact]] is this applied to the store's own content;
    * callers use it directly to SEED a derived store (e.g. a shingle-index
    * sidecar catching up to a corpus store that predates it) with a base
    * equivalent to slices `[0, upTo)` it never saw as batches. Crash-safe
    * by the same marker-commit argument as [[compact]]. */
  def seedBase(
      spark: SparkSession, path: String, rows: DataFrame,
      upTo: Long): Unit = {
    require(upTo > 0, s"base boundary must be positive, got $upTo")
    // the rename below is a silent no-op without the column, and the
    // base would then read back with SYNTHETIC batch ids (-upTo) —
    // enforce the documented contract instead
    require(rows.columns.contains("batch_id"),
      s"seedBase($path): rows must carry a true batch_id column")
    val (fs, root) = fsOf(spark, path)
    rows.withColumnRenamed("batch_id", SrcBatchCol)
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/batch_id=${-upTo}")
    commitBoundary(fs, root, upTo)
    gc(fs, root, upTo)
  }

  /** Delete directories superseded by the committed boundary: slices
    * `< b` and any base generation other than `-b`. Pure garbage
    * collection — every deleted directory's rows are already in the
    * committed base — so retries are harmless. */
  private def gc(fs: FileSystem, root: Path, b: Long): Unit =
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .filter { st =>
        parseBatchDir(st.getPath.getName).exists(v =>
          (v >= 0L && v < b) || (v < 0L && v != -b))
      }
      .foreach(st => fs.delete(st.getPath, true))

  // ------------------------------------------------------ bloom sidecar

  /** `upto=<long>.bin` sidecar names parsed with the same defensive
    * contract as [[parseBatchDir]] — a foreign file in `_bloom/` must
    * be inert, not a NumberFormatException on every subsequent batch. */
  private def parseBloomFile(name: String): Option[Long] =
    if (!(name.startsWith("upto=") && name.endsWith(".bin"))) None
    else scala.util.Try(
      name.stripPrefix("upto=").stripSuffix(".bin").toLong).toOption

  /** The latest bloom sidecar strictly older than `beforeBatch`
    * (a replaying batch must seed from its PREDECESSOR's sidecar, never
    * its own), as (coveredUpToBatchId, filter). */
  def latestBloom(
      spark: SparkSession, path: String,
      beforeBatch: Long): Option[(Long, BloomFilter)] = {
    val (fs, root) = fsOf(spark, path)
    val dir = new Path(root, BloomDir)
    if (!fs.exists(dir)) return None
    val ids = fs.listStatus(dir).toSeq
      .flatMap(st => parseBloomFile(st.getPath.getName))
      .filter(_ < beforeBatch)
    if (ids.isEmpty) None
    else {
      val id = ids.max
      val in = fs.open(new Path(dir, s"upto=$id.bin"))
      try Some((id, BloomFilter.readFrom(in))) finally in.close()
    }
  }

  /** Commit sidecar `upto=N` (write-to-temp + rename) and GC sidecars no
    * replay can need anymore (everything older than N's predecessor). */
  def writeBloom(
      spark: SparkSession, path: String, upto: Long,
      bf: BloomFilter): Unit = {
    val (fs, root) = fsOf(spark, path)
    val dir = new Path(root, BloomDir)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".upto=$upto.tmp")
    val out = fs.create(tmp, true)
    try bf.writeTo(out) finally out.close()
    // same atomic-overwrite commit as the boundary marker (a transient
    // missing sidecar only costs a bootstrap rebuild, but there is no
    // reason to have the window at all)
    org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, fs.getConf)
      .rename(tmp, new Path(dir, s"upto=$upto.bin"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    val ids = fs.listStatus(dir).toSeq
      .flatMap(st => parseBloomFile(st.getPath.getName))
    val keep = (ids.filter(_ < upto).sorted.lastOption.toSeq :+ upto).toSet
    ids.filterNot(keep).foreach(id =>
      fs.delete(new Path(dir, s"upto=$id.bin"), false))
  }

  /** Codegen'd sketch probe: `might_contain(bloom, xxhash64(value))` as a
    * Column. The serialized filter rides a ONE-ROW scalar subquery (the
    * other form the internal expression's analysis check accepts)
    * rather than a binary literal: a literal of sketch size (~1 MiB at
    * the default knobs) gets re-hashed and re-compared by every plan
    * transform the optimizer runs, which showed up as seconds of pure
    * driver-side planning per micro-batch. The filter must have been
    * built over `xxhash64(value)` longs — both sides then go through
    * the sketch's putLong/mightContainLong path, so no false negatives
    * are possible and the probe is lossless wherever an exact check
    * follows. */
  def mightContain(
      spark: SparkSession, bf: BloomFilter, value: Column): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    import spark.implicits._
    val oneRow = spark.createDataset(Seq(bos.toByteArray)).toDF("bf")
      .agg(first(col("bf")).as("bf"))
    GraftSqlBridge.column(BloomFilterMightContain(
      GraftSqlBridge.expression(graft.plans.Scalars.of(oneRow)),
      GraftSqlBridge.expression(xxhash64(value))))
  }

  /** Build a bloom over `xxhash64(value)` of `df`'s rows, sized by the
    * caller's (expectedItems, fpp) contract — the knobs must stay
    * CONSTANT over a store's life, because generational sidecars merge
    * (bitwise OR) and blooms only merge when identically sized. */
  def buildBloom(
      df: DataFrame, value: Column, expectedItems: Long,
      fpp: Double): BloomFilter =
    df.stat.bloomFilter(xxhash64(value), expectedItems, fpp)

  /** [[buildBloom]] as an AGGREGATE Column (binary, readable with
    * `BloomFilter.readFrom`), for callers that want to compute the
    * sketch alongside other aggregates in ONE pass over the input —
    * e.g. the ingest path's fused "build the batch bloom + probe the
    * predecessor sidecar" job. Sized identically to [[buildBloom]]
    * (`optimalNumOfBits(expectedItems, fpp)`), so the two forms'
    * outputs merge. Note Spark clamps the aggregate's item estimate at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (4M
    * default) — raise that conf in step with a larger knob. */
  def bloomAggCol(
      value: Column, expectedItems: Long, fpp: Double): Column = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    GraftSqlBridge.column(new BloomFilterAggregate(
      GraftSqlBridge.expression(xxhash64(value)),
      Literal(expectedItems),
      Literal(BloomFilter.optimalNumOfBits(expectedItems, fpp)))
      .toAggregateExpression())
  }
}
