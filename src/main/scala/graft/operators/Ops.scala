package graft.operators

/** User-function contracts — the reference's five operator kinds plus the
  * declared-but-unwired Filter, realized (SURVEY.md §2.1 T1–T7).
  * All are shipped inside Spark task closures, hence Serializable.
  */

/** Per-task context: broadcast access, named metrics, partition info —
  * the reference's `transformation.Context`
  * (/root/reference/transformation/context.go, executor/task_context.go).
  */
trait Context {
  /** Value registered with `Pipeline.broadcast(key, _)`. */
  def broadcast(key: String): Any
  /** Add to a named per-job counter (summed across tasks, like the
    * reference's AddMetric; accumulator-backed here). */
  def addMetric(name: String, delta: Long): Unit
  def partitionId: Int
  /** Inside a Reduce: the key currently being folded
    * (reference `PartitionKey()`, transformations.go:280-294). */
  def partitionKey: String
}

/** T1 — elementwise transform over a batch. Batch boundaries carry no
  * semantics (they're physical, as in the reference's `chan []Row`). */
trait Mapper extends Serializable {
  def map(ctx: Context, rows: Seq[KV]): Seq[KV]
}

/** T2 — 1-batch→N-rows. */
trait FlatMapper extends Serializable {
  def flatMap(ctx: Context, rows: Seq[KV]): Seq[KV]
}

/** T6 — the reference declares this interface but never wires it
  * (/root/reference/transformations.go:68-70); realized here. */
trait RowFilter extends Serializable {
  def accept(row: KV): Boolean
}

/** T3 — per-key streaming fold WITHIN the task's partition: fresh state
  * per key, one output row per key at end-of-input. Matches the
  * reference's prototype-clone-per-key semantics
  * (/root/reference/transformations.go:215-278). Partition first
  * (`groupByKey()`) for one global row per key; without a partitioner
  * you get partial per-partition results — parity trap #1 (SURVEY §2.3).
  */
trait Reducer extends Serializable {
  /** Called once per (partition, key) before any rows. */
  def init(ctx: Context): Unit = ()
  /** Fold one row into internal state. */
  def reduce(ctx: Context, row: KV): Unit
  /** Emit the final row for this key (None = emit nothing). */
  def complete(ctx: Context): Option[KV]
}

/** Factory cloned per key — the Spark-idiomatic form of the reference's
  * `reflect.New` + field-copy per key (transformations.go:258-265). */
trait ReducerFactory extends Serializable {
  def create(key: String): Reducer
}

/** T7 — the Combiner contract: associative map-side combine so the
  * shuffle carries one accumulator per (task, key) instead of one row
  * per input (reference /root/reference/transformations.go:209-213:
  * MapValueToAccumulator / MergeValue / MergeAccumulator). Compiled to
  * a typed Spark `Aggregator`, so Spark runs it as partial (map-side) +
  * final hash aggregation with spilling — at 100 TB this is the
  * difference between shuffling bytes-per-row and bytes-per-key.
  *
  * `B` can be any class serializable by Spark's closure/kryo machinery
  * (a case class is ideal). Unlike [[Reducer]], accumulators must merge
  * associatively; emission order is not defined.
  */
trait Combiner[B] extends Serializable {
  /** Lift the first row of a (task, key) group into an accumulator
    * (reference MapValueToAccumulator). */
  def createAccumulator(ctx: Context, row: KV): B
  /** Fold one more row into the accumulator (reference MergeValue). */
  def mergeValue(ctx: Context, acc: B, row: KV): B
  /** Merge two partial accumulators of the same key, e.g. across tasks
    * (reference MergeAccumulator). */
  def mergeAccumulators(a: B, b: B): B
  /** Emit the final row for the key (runs after the final merge). */
  def complete(ctx: Context, key: String, acc: B): KV
}

/** T4 — stage-local (partition-local!) full sort with a user comparator.
  * NOT a global sort: matches /root/reference/transformations.go:156-207;
  * Spark adds spill on top (ExternalSorter) — strict superset. */
trait Sorter extends Serializable {
  def isLessThan(a: KV, b: KV): Boolean
}

/** T5 — raw stage: iterator in, iterator out (the reference's
  * `Transformer.Transform(ctx, in chan, emit)` contract,
  * /root/reference/transformations.go:23-66). */
trait Transformer extends Serializable {
  def transform(ctx: Context, rows: Iterator[KV]): Iterator[KV]
}
