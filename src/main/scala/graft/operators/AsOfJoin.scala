package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row (by time)
  * with the same key and right.ts ≤ left.ts.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder — the semantics decompose exactly): tag and union both
  * sides, one window pass per key ordered by time carries the latest
  * right-side payload forward, then keep left rows. ONE shuffle on the
  * key — compare a naive range join (key equi-join + per-left max
  * over matches), which shuffles both sides AND re-scans matches
  * quadratically within skewed keys.
  *
  * Times are compared at millisecond epoch granularity so the same
  * row wins regardless of the source's ns/µs precision.
  */
object AsOfJoin {

  /** @param left        rows to enrich
    * @param right       rows providing the as-of payload
    * @param keyCol      equi-key present in both sides
    * @param leftTsCol   event-time column of `left`
    * @param rightTsCol  event-time column of `right`
    * @param payloadCols right-side columns to carry (emitted as
    *                    `asof_<name>`, null when no right row matches)
    * @param direction   "backward" (default): most recent right row
    *                    with right.ts <= left.ts; "forward": earliest
    *                    right row with right.ts >= left.ts
    * @param toleranceMs optional maximum |left.ts - right.ts| in ms —
    *                    matches further away are nulled out
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      payloadCols: Seq[String],
      direction: String = "backward",
      toleranceMs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns
    val l = left
      .withColumn("__t", unix_millis(col(leftTsCol)))
      .withColumn("__side", lit(1))
    val r = right.select(
      (col(keyCol) +: col(rightTsCol) +: payloadCols.map(col)): _*)
      .withColumn("__t", unix_millis(col(rightTsCol)))
      .withColumn("__side", lit(0))

    // align schemas for the union: left payload slots are null on the
    // right side and vice versa
    val lAligned = l.select(
      col(keyCol).as("__k") +: col("__t") +: col("__side") +:
        leftCols.filter(_ != keyCol).map(col) ++:
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val rAligned = r.select(
      col(keyCol).as("__k") +: col("__t") +: col("__side") +:
        leftCols.filter(_ != keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)

    // traversal order: time asc for backward, desc for forward; right
    // rows sort before left rows at equal ms so ties (right.ts ==
    // left.ts) are visible to the left row — ASOF `<=`/`>=` semantics
    val timeOrder =
      if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(col("__k"))
      .orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the matched right ROW carries forward as one atomic struct: a
    // per-payload `last(payload, ignoreNulls)` would skip a matching
    // right row whose payload value is legitimately NULL and resurrect
    // a STALE payload from an older row (disagreeing with __asof_t);
    // the struct is null exactly when the row is not a right row, so
    // ignoreNulls selects the latest right ROW and null payloads on it
    // stay null
    val rowStruct = when(col("__side") === 0, struct(
      (col("__t").as("__at") +: payloadCols.map(c => col(s"__p_$c"))): _*))
    val withRow = lAligned.union(rAligned)
      .withColumn("__asof_row", last(rowStruct, ignoreNulls = true).over(w))
    val carried0 = payloadCols.foldLeft(withRow) { (df, c) =>
      df.withColumn(s"asof_$c", col("__asof_row").getField(s"__p_$c"))
    }
    val carried = carried0.withColumn("__asof_t",
      col("__asof_row").getField("__at"))
    val gated = toleranceMs match {
      case Some(tol) =>
        payloadCols.foldLeft(carried) { (df, c) =>
          df.withColumn(s"asof_$c",
            when(abs(col("__t") - col("__asof_t")) <= tol, col(s"asof_$c")))
        }
      case None => carried
    }
    gated
      .filter(col("__side") === 1)
      .select(
        col("__k").as(keyCol) +:
          leftCols.filter(_ != keyCol).map(col) ++:
          payloadCols.map(c => col(s"asof_$c")): _*)
  }
}
