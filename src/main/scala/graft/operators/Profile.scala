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

  /** Join-key skew profile — the diagnostic read before choosing a
    * shuffle strategy for a key (plain hash join vs [[SkewJoin]]
    * salting vs AQE skew splitting): per-key frequency extremes and
    * discrete percentiles, the max/avg skew ratio, and the salt
    * factor that would level the heaviest key to the average.
    *
    * Shape: one (key → freq) aggregate, then everything else runs on
    * the DISTINCT-FREQUENCY ledger (freq → n_keys) — the q153
    * device: Σ freq ≥ V(V+1)/2 over distinct freq values bounds the
    * ledger at √(2·n_rows) rows, so its cumulative window is safe at
    * any corpus size while a keys-wide rank would not be. Percentiles
    * are discrete-lower over KEYS (smallest freq with cumulative key
    * count ≥ ⌈q·n_keys⌉), spelled in exact integer arithmetic.
    * Ratios are fixed-point milli integers (`div`) — no doubles
    * anywhere, so engines agree exactly. */
  def skewProfile(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.Scalars
    val freqs = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("f"))
    val led = freqs.groupBy(col("f")).agg(count(lit(1)).as("nk"))
      .withColumn("ck", sum(col("nk")).over(Window.orderBy(col("f"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint(true) // consumed by 5 scalar aggregates
    val rows = Scalars.of(led.agg(sum(col("f") * col("nk")).as("v")))
    val keys = Scalars.of(led.agg(sum(col("nk")).as("v")))
    val maxF = Scalars.of(led.agg(max(col("f")).as("v")))
    def pctFreq(p: Int) = Scalars.of(
      led.filter(col("ck") * 100 >= lit(p.toLong) * keys)
        .agg(min(col("f")).as("v")))
    df.sparkSession.range(1)
      .select(rows.as("n_rows"), keys.as("n_keys"),
        maxF.as("max_freq"), pctFreq(50).as("p50_freq"),
        pctFreq(99).as("p99_freq"))
      .select(col("n_rows"), col("n_keys"), col("max_freq"),
        expr("(`n_rows` * 1000) div `n_keys`").as("avg_freq_milli"),
        col("p50_freq"), col("p99_freq"))
      .select(col("*"),
        expr("(`max_freq` * 1000000) div `avg_freq_milli`")
          .as("skew_ratio_milli"),
        expr("(`max_freq` * 1000 + `avg_freq_milli` - 1) " +
          "div `avg_freq_milli`").as("suggested_salt"))
  }
}
