package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the step that
  * turns near-dup PAIRS (any `Dedup.*Pairs` output) into dedup GROUPS,
  * so "keep one document per near-dup cluster" is transitive-closure
  * correct instead of pair-local. The reference has no graph surface;
  * this is part of the LLM-training-data layer built on top of it.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014 — public
  * literature; also the shape GraphFrames uses). Each round is two
  * shuffles over the EDGE set only:
  *
  *   - large-star: every node connects its strictly-larger neighbors
  *     to the minimum of its neighborhood (incl. itself);
  *   - small-star: every node connects its smaller-or-equal neighbors
  *     (and itself) to that minimum.
  *
  * Both steps are window-min + projection — no per-node adjacency list
  * is ever materialized (a `collect_list` would make one hot hub node a
  * single-task straggler; the window min is a partial-aggregated sort
  * within the same exchange). Convergence is O(log n) alternating
  * rounds on any graph (the paper's bound), NOT O(diameter) like naive
  * label propagation — the difference between 5 rounds and 10⁵ rounds
  * on a pathological chain of boilerplate docs. At fixpoint the edge
  * set is a collection of stars centered at each component's minimum
  * id.
  *
  * Scale shape: every round shuffles |E| rows twice, and |E| only ever
  * shrinks (toward one edge per non-root node). The driver loop holds
  * no data — per round it keeps one count + checksum (for the fixpoint
  * test) and checkpoints the new edge set to cut lineage, which
  * materializes edges on executors, never on the driver. Below an
  * absolute edge cap ([[DriverFinishMaxEdges]], checked against the
  * already-computed signature count so the test is free) a driver
  * union-find finishes the job instead: each loop iteration costs a
  * full driver round-trip, which is pure scheduling latency once the
  * graph fits in memory — the same enforced-cap bounded-model pattern
  * as the k-means training sample, deciding only the execution path,
  * never the answer. Once an
  * iteration's successor is materialized, the superseded edge set is
  * released (unpersisted, and its checkpoint files deleted in reliable
  * mode) — only the FINAL converged set stays resident, because the
  * returned DataFrame reads from it. Like every iterative dataflow
  * (GraphFrames/GraphX included) the loop RUNS Spark jobs while
  * building the result — callers get a plain, reusable DataFrame back.
  *
  * Fault tolerance: by default each iteration is `localCheckpoint`ed —
  * fastest (executor-local storage), but a local checkpoint dies with
  * its executor, so on a real cluster an executor loss mid-loop fails
  * the job with no recompute path. Pass `checkpointDir` (any
  * HDFS/object-store path all executors can reach) for RELIABLE
  * checkpoints on cluster runs: each iteration's edges are written to
  * shared storage and survive executor loss, at the cost of one extra
  * recomputation per iteration to write the files (standard
  * `RDD.checkpoint` behavior; the edge set is sketch-sized, so the
  * write is cheap relative to losing a 100 TB job at round 30).
  */
object ConnectedComponents {

  private val MaxRounds = 64

  /** Edge-count cap for the driver union-find finisher (2^18 edges ≈
    * a few MB of ids). The alternating-star loop costs one full
    * driver round-trip (two shuffles + a checkpoint + an aggregate)
    * per iteration — the right price for a billion-edge graph, pure
    * scheduling latency for a graph that fits in memory. Same
    * bounded-model pattern as Similarity.MaxTrainVectors: an absolute
    * cap decides the PATH, never the answer, and the distributed loop
    * remains the unconditional fallback above it. */
  private val DriverFinishMaxEdges = 1L << 18

  /** Raw checkpoint dir last set by THIS object, per application — see
    * the idempotency note in [[apply]]. One live SparkContext per JVM,
    * so the map holds at most one meaningful entry. */
  private val lastSetDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** (id, component) for every node appearing in `pairs`, component =
    * min node id of the connected component. Ids may be any orderable
    * numeric/string type; rows with null endpoints are dropped.
    * `checkpointDir`: see the class doc — None (default) keeps the
    * fast executor-local checkpoints; Some(sharedPath) survives
    * executor loss on cluster runs.
    */
  def apply(pairs: DataFrame, aCol: String, bCol: String,
      checkpointDir: Option[String] = None,
      driverFinishMaxEdges: Long = DriverFinishMaxEdges): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    // NB the checkpoint dir is CONTEXT-GLOBAL in Spark: passing
    // checkpointDir repoints it for the whole application (documented
    // trade — there is no per-job dir API). The raw-path memo makes
    // repeat calls idempotent: sc.getCheckpointDir returns a resolved
    // path with a UUID subdir appended, so comparing against it would
    // re-set (and re-mkdir a fresh UUID dir) on every call.
    checkpointDir.foreach { dir =>
      if (lastSetDir.get(sc.applicationId) != dir) {
        sc.setCheckpointDir(dir)
        lastSetDir.put(sc.applicationId, dir)
      }
    }
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
    // A checkpointed Dataset is a LogicalRDD leaf over the materialized
    // RDD; once its successor exists that RDD is dead weight — without
    // this, MaxRounds edge-set copies pile up in executor storage for
    // the session lifetime. Local checkpoints unpersist; reliable ones
    // also delete their files (the cleaner only does that under GC
    // pressure with cleanCheckpoints on, which an iterative loop can't
    // wait for).
    // unconditional core: unpersist + delete checkpoint files; the
    // guarded `release` wraps it, the finisher calls it directly
    def releaseNow(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
      rdd.unpersist(blocking = false)
      rdd.getCheckpointFile.foreach { f =>
        val p = new Path(f)
        p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
      }
    }
    def release(df: DataFrame, successor: DataFrame): Unit =
      PlanLeaves.checkpointRdd(df)
        .foreach { rdd =>
          // Deleting the predecessor's files is only safe once the
          // SUCCESSOR holds its own materialized checkpoint — a
          // lost-executor recompute would otherwise chase deleted
          // files. Enforced here, not by call order: if a refactor
          // ever makes the preceding signature() lazy or cached,
          // materialize the successor now; and if it still is not
          // checkpointed (unexpected plan shape), keep the files —
          // leaked checkpoint data beats a broken lineage.
          val succ = PlanLeaves.checkpointRdd(successor)
          succ.filterNot(_.isCheckpointed).foreach(_.count())
          if (succ.exists(_.isCheckpointed)) releaseNow(rdd)
          else rdd.unpersist(blocking = false)
        }
    // A fully-consumed checkpoint (its contents now live elsewhere —
    // the driver finisher's local result) is released unconditionally;
    // no successor-materialization guard applies because nothing will
    // ever re-read it.
    def releaseCollected(df: DataFrame): Unit =
      PlanLeaves.checkpointRdd(df).foreach(releaseNow)

    // Driver union-find finisher over a MATERIALIZED edge set whose
    // count is already known ≤ driverFinishMaxEdges. Mid-loop handoff
    // is sound because every star round preserves the node set and
    // its connectivity (Kiveris et al. §3: each non-min node always
    // keeps a path to its component min), so components of the
    // contracted graph equal components of the input. Representative
    // choice reproduces Spark's MIN ordering exactly: strings compare
    // as unsigned UTF-8 bytes (Spark's UTF8String binary order — NOT
    // java.lang.String's UTF-16 order, which diverges on
    // supplementary characters); everything else is a Comparable
    // whose natural order matches its Spark type (integral, decimal,
    // double incl. the NaN-greatest rule, date/timestamp).
    def finishOnDriver(e: DataFrame): DataFrame = {
      val rows = e.select(col("u"), col("v")).collect()
      releaseCollected(e)
      def cmp(a: AnyRef, b: AnyRef): Int = (a, b) match {
        case (x: String, y: String) =>
          val (xb, yb) = (x.getBytes("UTF-8"), y.getBytes("UTF-8"))
          java.util.Arrays.compareUnsigned(xb, yb)
        case (x, y) => x.asInstanceOf[Comparable[AnyRef]].compareTo(y)
      }
      val parent = new java.util.HashMap[AnyRef, AnyRef]()
      // two-pass find with full path compression (min-root union has
      // no rank balancing, so compression carries the near-linear
      // bound alone)
      def find(x: AnyRef): AnyRef = {
        var root = x
        while (parent.getOrDefault(root, root) != root)
          root = parent.get(root)
        var cur = x
        while (cur != root) {
          val next = parent.get(cur)
          parent.put(cur, root)
          cur = next
        }
        root
      }
      rows.foreach { r =>
        val (a, b) = (r.get(0).asInstanceOf[AnyRef],
          r.get(1).asInstanceOf[AnyRef])
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          val (root, child) = if (cmp(ra, rb) <= 0) (ra, rb) else (rb, ra)
          parent.put(child, root)
        }
        // register untouched endpoints so the node sweep below sees
        // every node (roots map to themselves)
        parent.putIfAbsent(a, find(a)); parent.putIfAbsent(b, find(b))
      }
      import scala.jdk.CollectionConverters._
      val out: java.util.List[org.apache.spark.sql.Row] =
        parent.keySet.asScala.toSeq
          .map(id => org.apache.spark.sql.Row(id, find(id))).asJava
      val idType = e.schema("u").dataType
      pairs.sparkSession.createDataFrame(out,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("component", idType))))
    }

    val e0 = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
      .select(
        greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .distinct()

    // Fixpoint detection: (count, order-independent checksum) of the
    // canonical edge set — XOR over distinct edges, immune to the ANSI
    // overflow a sum of 64-bit hashes would hit. Two aggregates per
    // round, no data to the driver beyond two longs.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h"))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    // Edges arrive directed big -> small (u > v) and both steps emit
    // (x, m) with m strictly below x, so orientation is an invariant.
    // Only the round's FINAL projection dedups: duplicate edges cannot
    // change a window minimum, so large-star skips its own distinct —
    // one exchange fewer per round (three instead of four).
    def largeStar(e: DataFrame): DataFrame = {
      val b = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val w = Window.partitionBy("u")
      b.withColumn("m", least(col("u"), min(col("v")).over(w)))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val w = Window.partitionBy("u")
      val m = e.withColumn("m", min(col("v")).over(w))
      m.select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // Lazy checkpoints: the signature aggregation is the action that
    // materializes each iteration's edge set — one Spark job per
    // iteration, not a separate eager-checkpoint job plus an
    // aggregate. Each iteration applies TWO alternating rounds before
    // checking: near-dup cluster graphs converge in a handful of
    // rounds, so halving the driver round-trips (the per-iteration
    // job-scheduling latency, not the data work, dominates at small
    // edge counts) costs at most one redundant pair of rounds on an
    // already-converged star set — a no-op by idempotence.
    // the finisher's JVM-side comparator covers exactly these types
    // (everything whose collected value is Comparable with an order
    // matching Spark's, plus the UTF-8-byte special case for
    // strings). Anything else — BinaryType collects as Array[Byte],
    // which is neither Comparable nor value-equal under HashMap —
    // stays on the distributed loop, which orders ALL orderable types
    // through Spark itself.
    val driverFinishable = {
      import org.apache.spark.sql.types._
      e0.schema("u").dataType match {
        case _: NumericType | StringType | BooleanType | DateType |
          TimestampType | TimestampNTZType => true
        case _ => false
      }
    }
    def capped(n: Long): Boolean =
      driverFinishable && n <= driverFinishMaxEdges
    var edges = cut(e0)
    var sig = signature(edges)
    // the signature count decides the path for free: small edge sets
    // (the common endgame — and, for near-dup clustering at any SF,
    // often the whole game) skip the iteration loop entirely; dense
    // inputs whose distinct edge set contracts under the cap hand off
    // mid-loop. Either way the collect reads the MATERIALIZED
    // checkpoint — the (expensive) pair-generation lineage never
    // recomputes.
    if (capped(sig._1)) return finishOnDriver(edges)
    var converged = false
    var round = 0
    while (!converged && round < MaxRounds) {
      val next = cut(smallStar(largeStar(smallStar(largeStar(edges)))))
      val nextSig = signature(next) // materializes `next`...
      release(edges, next)          // ...so its input is now droppable
      if (capped(nextSig._1)) return finishOnDriver(next)
      converged = nextSig == sig
      edges = next
      sig = nextSig
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $MaxRounds rounds")

    // Star fixpoint: every edge is (member, root); roots map to
    // themselves.
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Keeper ids after clustering: one document (the minimum id) per
    * near-dup component, plus every document not in any pair. The
    * cluster-aware version of q51's pair-local "drop the higher id"
    * rule — with transitive closure, A~B and B~C drops both B and C
    * even when A~C was never emitted as a pair. */
  def keepers(
      docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      checkpointDir: Option[String] = None,
      driverFinishMaxEdges: Long = DriverFinishMaxEdges): DataFrame = {
    val comp = apply(pairs, aCol, bCol, checkpointDir, driverFinishMaxEdges)
    val drops = comp.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** QUALITY-AWARE keepers: per near-dup component keep the member
    * with the MAXIMUM `scoreCol` (ties broken toward the minimum id),
    * plus every document not in any pair. What production dedup
    * actually wants — [[keepers]]'s min-id rule keeps an ARBITRARY
    * cluster member, which for crawl data is as likely the truncated
    * variant as the full one; scoring by length/quality keeps the best
    * copy (the keep-longest convention of public dedup pipelines, e.g.
    * Lee et al. 2021 §3.2's cluster-representative choice).
    *
    * Scale shape: no windows, no driver — one (component → max score)
    * partial+final aggregate over a slim (component, id, score)
    * projection, one join back to resolve ties by min id, one anti-join
    * to drop losers. Components are near-dup clusters (small by
    * construction), but nothing here degrades on a pathological giant
    * cluster: both aggregates are partial+final, not per-component
    * tasks.
    *
    * Conventions: null scores lose to any non-null score (agg max
    * ignores nulls); an all-null-score cluster falls back to the
    * min-id rule; NaN ranks greatest (Spark/DuckDB agree). Pair ids
    * absent from `docs` cannot win (they carry no score) but still
    * cluster — re-keying a cluster whose old winner was filtered
    * upstream is the caller's composition choice. */
  def keepBest(
      docs: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      checkpointDir: Option[String] = None,
      driverFinishMaxEdges: Long = DriverFinishMaxEdges): DataFrame = {
    val comp = apply(pairs, aCol, bCol, checkpointDir, driverFinishMaxEdges)
    val scored = docs.select(col(idCol), col(scoreCol))
      .join(comp, col(idCol) === col("id"))
      .select(col("component"), col(idCol).as("__kid"),
        col(scoreCol).as("__ks"))
    val mx = scored.groupBy(col("component"))
      .agg(max(col("__ks")).as("__mx"))
    val keepIds = scored.join(mx, "component")
      .filter(col("__ks") <=> col("__mx"))
      .groupBy(col("component")).agg(min(col("__kid")).as("__keep"))
      .select(col("__keep"))
    val drops = comp.join(keepIds, col("id") === col("__keep"), "left_anti")
      .select(col("id").as(idCol))
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** INCREMENTAL closure: fold a batch of new pairs into an existing
    * (id, component) labeling without re-clustering the old graph —
    * the delta-ingest asymmetry ([[graft.operators.Dedup
    * .incrementalJaccardPairs]]'s "never old×old", applied to the
    * closure step): a continuously-ingesting dedup pipeline gets new
    * pairs every batch, and re-running the alternating-star loop over
    * the ACCUMULATED pair set makes per-batch cost grow with corpus
    * history.
    *
    * Correctness rests on label CONTRACTION: because every old
    * component label is the component's min id, collapsing each old
    * component to its label loses no connectivity the new edges could
    * exploit — two old components merge iff some new edge path links
    * their labels. So: map each new endpoint through the old labeling
    * (unlabeled ids stay themselves), run the full closure on the
    * CONTRACTED edge set (bounded by the NEW batch's size, not the
    * corpus), and join the relabeling back. Min-id labels compose:
    * the min over a merged component is the min over its old labels
    * and fresh ids, which is exactly what the contracted closure
    * emits. Output: (id, component) for every id in `oldComp` or the
    * new pairs — the same shape [[apply]] emits, so batches chain.
    *
    * Scale shape: two slim label joins on the new pairs + the closure
    * on a contracted graph whose size is O(new pairs); the old
    * labeling is touched once, by one equi-join on its label column —
    * never re-shuffled per closure round. */
  def incremental(
      oldComp: DataFrame, newPairs: DataFrame,
      aCol: String, bCol: String,
      checkpointDir: Option[String] = None,
      driverFinishMaxEdges: Long = DriverFinishMaxEdges): DataFrame = {
    val delta = incrementalDelta(oldComp, newPairs, aCol, bCol,
      checkpointDir, driverFinishMaxEdges)
    oldComp
      .join(delta.select(col("id"), col("component").as("__nc")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__nc"), col("component")).as("component"))
      .unionByName(
        delta.join(oldComp.select(col("id")), Seq("id"), "left_anti"))
  }

  /** The DELTA of [[incremental]]: only the rows the new batch
    * changed — old members whose component label moved, plus newly
    * seen ids with their labels. This is what a continuously-
    * maintained label STORE writes per batch (the full labeling would
    * be a corpus-sized write every batch; the delta is bounded by the
    * components the batch touched): current labeling = for each id,
    * its LATEST delta row, absent ids are singletons.
    * `incremental = oldComp overridden by delta ∪ delta's new ids`. */
  def incrementalDelta(
      oldComp: DataFrame, newPairs: DataFrame,
      aCol: String, bCol: String,
      checkpointDir: Option[String] = None,
      driverFinishMaxEdges: Long = DriverFinishMaxEdges): DataFrame = {
    val old = oldComp.select(col("id").as("__oid"),
      col("component").as("__oc"))
    // endpoints through the old labeling; ids the old labeling has
    // never seen label themselves
    val mapped = newPairs
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .join(old.select(col("__oid").as("__a"), col("__oc").as("__la")),
        Seq("__a"), "left")
      .join(old.select(col("__oid").as("__b"), col("__oc").as("__lb")),
        Seq("__b"), "left")
      .select(coalesce(col("__la"), col("__a")).as("__ca"),
        coalesce(col("__lb"), col("__b")).as("__cb"))
      .filter(col("__ca") =!= col("__cb"))
    val relabel = apply(mapped, "__ca", "__cb",
      checkpointDir, driverFinishMaxEdges)
      .select(col("id").as("__from"), col("component").as("__to"))
    // old members follow their label's relabeling (only CHANGED labels
    // surface in the delta); untouched old components stay absent.
    // New ids surface labeled by the closure directly (their
    // contracted node IS themselves), or self-labeled when their every
    // contracted edge collapsed (a pair wholly inside one old
    // component, or a self-pair).
    val oldDelta = old
      .join(relabel.filter(col("__from") =!= col("__to"))
          .select(col("__from").as("__oc"), col("__to")),
        Seq("__oc"))
      .select(col("__oid").as("id"), col("__to").as("component"))
    // endpoints of FULLY non-null, NON-SELF pairs only — [[apply]]
    // drops null-endpoint rows AND self-pairs (a = b) wholesale, and
    // this must emit the node set apply() would (a pair (x, NULL) or
    // (x, x) contributes NO node there, so a per-endpoint null filter
    // or a kept self-pair here would leak x as a singleton and break
    // incremental-vs-full parity). Unreachable from the Dedup pair
    // generators (always a < b), but direct callers can feed either.
    val bothNonNull = newPairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
    val newIds = bothNonNull.select(col(aCol).as("__nid"))
      .unionAll(bothNonNull.select(col(bCol).as("__nid")))
      .distinct()
      .join(old.select(col("__oid").as("__nid")), Seq("__nid"), "left_anti")
    val newOut = newIds
      .join(relabel.select(col("__from").as("__nid"), col("__to")),
        Seq("__nid"), "left")
      .select(col("__nid").as("id"),
        coalesce(col("__to"), col("__nid")).as("component"))
    oldDelta.unionByName(newOut)
  }
}
