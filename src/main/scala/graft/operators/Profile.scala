package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column profiling — the "stats pass" an ingestion pipeline runs
  * before trusting a new table (the capability Deequ/TFDV expose as
  * analyzers; public tooling): per column, non-null count, null
  * count, EXACT distinct count, min/max (as engine-portable strings)
  * and, for numeric columns, the mean.
  *
  * Shape: ONE distributed aggregation over the table computes every
  * statistic (the multiple exact `countDistinct`s plan through
  * Spark's Expand — one corpus pass whose shuffle carries
  * #distinct-columns replicas of the grouping row, the standard
  * multi-distinct trade); the single result row is then unpivoted
  * driver-free into #columns output rows — model-sized by
  * construction. For very wide profiles or columns whose
  * cardinality approaches the corpus (where Expand's replication
  * hurts), swap `countDistinct` for `approx_count_distinct` and
  * accept the HLL error — exactness is this operator's default
  * because profile counts feed data-quality GATES, where a 2%
  * phantom distinct-drift would fire false alarms.
  *
  * min/max surface as strings so one schema covers heterogeneous
  * columns; integral and string columns round-trip exactly (the
  * oracle-parity contract). Profiling float columns works but their
  * string forms are engine-specific — gate those on the numeric
  * `mean` instead.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val isNum: Map[String, Boolean] = cols.map { c =>
      c -> df.schema(c).dataType.isInstanceOf[NumericType]
    }.toMap
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__d"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        (if (isNum(c)) round(avg(col(c)), 4)
         else lit(null).cast("double")).as(s"${c}__avg"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"${c}__n").as("n"),
      (col("__total") - col(s"${c}__n")).as("n_null"),
      col(s"${c}__d").as("n_distinct"),
      col(s"${c}__min").as("min_s"),
      col(s"${c}__max").as("max_s"),
      col(s"${c}__avg").as("mean"))): _*)
    row.select(explode(entries).as("p")).select("p.*")
  }
}
