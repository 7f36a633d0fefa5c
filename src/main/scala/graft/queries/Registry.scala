package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *   - every output column is explicitly aliased, with the SAME name on
  *     both sides;
  *   - floating aggregates are `round(...)`-ed identically on both sides;
  *   - a total ORDER BY over a unique prefix is present on both sides;
  *   - integer-typed scalars are cast so Spark and DuckDB agree (DuckDB
  *     scalar ints are BIGINT; Spark's are often INT).
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** A scratch path unique per (data dir, Spark application) for
    * queries that write-then-read (the sink roundtrips): two
    * concurrent runs over the same data dir (bench + verify, parallel
    * CI) must never race on one overwrite-then-read directory. The
    * one place this concurrency rule is encoded. */
  def scratchPath(spark: SparkSession, dir: String, prefix: String): String =
    s"${System.getProperty("java.io.tmpdir")}/${prefix}_" +
      s"${Integer.toHexString(dir.hashCode)}_${spark.sparkContext.applicationId}"
}

object Registry {
  /** All query groups, merged for SparkEntry. */
  def allQueries: Map[String, Q] =
    Relational.defs ++ Pipelines.defs ++ LlmOps.defs ++ LlmOps.defs2 ++
      Advanced.defs ++ GraphQueries.defs ++ CurationQueries.defs ++
      EmbeddingQueries.defs
}
