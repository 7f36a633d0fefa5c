package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Corpus-composition planning: budget allocation and mixture design
  * over per-stratum ledgers (the step BEFORE the row-level samplers in
  * [[graft.operators.Sampling]] apply the plan to the corpus). */
object CurationQueries {

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // UniMax budget allocation (Chung et al. 2023): total budget = 2
    // average epochs, per-language epoch cap = 3 (chosen so the cap BINDS on this
    // corpus: the smallest language is fully funded at its cap while
    // the rest split the remainder at the water level — both branches
    // of the allocation are exercised by the gate). Low-resource
    // languages are fully funded to their cap; the big ones split the
    // remainder at the water level. Exact integer waterfilling — the
    // allocation sums EXACTLY to the budget and both engines agree
    // bit-for-bit (no float anywhere).
    // ------------------------------------------------------------------
    "q143_unimax_budget" -> Q(
      fn = (s, dir) => {
        val sizes = Tables(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(sum(size(split(col("text"), " ")).cast("long"))
            .as("n_tokens"))
          .withColumn("capacity", col("n_tokens") * 3)
        val total = graft.plans.Scalars.of(
          sizes.agg((sum(col("n_tokens")) * 2).as("b")))
        Sampling.waterfillBudgets(sizes, "lang", "capacity", total)
          .select(col("lang"), col("n_tokens"), col("capacity"),
            col("budget_tokens"),
            expr("(`budget_tokens` * 1000) div `n_tokens`")
              .as("epochs_milli"))
          .orderBy("lang")
      },
      oracle = Some("""
        WITH t AS (
          SELECT lang,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens
          FROM documents GROUP BY lang),
        tot AS (SELECT CAST(2 * sum(n_tokens) AS BIGINT) AS b FROM t),
        led AS (
          SELECT lang, n_tokens, 3 * n_tokens AS capacity,
                 row_number() OVER (ORDER BY 3 * n_tokens, lang) AS i,
                 COALESCE(sum(3 * n_tokens) OVER (
                   ORDER BY 3 * n_tokens, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS pe,
                 count(*) OVER () AS n
          FROM t),
        f AS (
          SELECT led.*, tot.b,
                 (pe + capacity * (n - i + 1) <= tot.b) AS funded
          FROM led CROSS JOIN tot),
        agg AS (
          SELECT count(*) FILTER (WHERE funded) AS fcnt,
                 COALESCE(sum(capacity) FILTER (WHERE funded), 0) AS pf
          FROM f),
        o AS (
          SELECT f.lang, f.n_tokens, f.capacity,
                 CASE WHEN f.funded THEN f.capacity
                      ELSE ((f.b - a.pf) // (f.n - a.fcnt)) +
                           (CASE WHEN f.i - a.fcnt <=
                                   ((f.b - a.pf) % (f.n - a.fcnt))
                                 THEN 1 ELSE 0 END)
                 END AS budget_tokens
          FROM f CROSS JOIN agg a)
        SELECT lang, n_tokens, capacity,
               CAST(budget_tokens AS BIGINT) AS budget_tokens,
               CAST((budget_tokens * 1000) // n_tokens AS BIGINT)
                 AS epochs_milli
        FROM o ORDER BY lang"""))
  )
}
