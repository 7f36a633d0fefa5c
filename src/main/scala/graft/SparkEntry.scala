package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The cluster-closed corpus-cleaning pipeline chains the
    * library's quality, exact-dedup, near-dup-pair and
    * connected-component operators in one program. */
  def entry(spark: SparkSession): DataFrame =
    queries("q67_clean_corpus_clustered")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.allQueries.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.allQueries.collect {
      case (name, q) if q.oracle.isDefined => name -> q.oracle.get.trim
    }
}
