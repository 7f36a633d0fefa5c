package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Pca

/** Embedding-space structure analytics: the fixed-point PCA family
  * (direction fit + whitening application). The trained-model ANN /
  * clustering kernels live in [[graft.operators.Similarity]]; these
  * are the deterministic-protocol complements that gate with full
  * DuckDB oracles. */
object EmbeddingQueries {

  /** Truncating signed division in DuckDB (`//` floors; Spark `div`
    * truncates toward zero — they differ on negative numerators). */
  private def tdiv(a: String, b: String): String =
    s"CASE WHEN $a >= 0 THEN ($a) // ($b) ELSE -((-($a)) // ($b)) END"

  /** Shared fit prefix: milli quantization (trunc — a bare DuckDB CAST
    * rounds), exact integer centering, all-ones start vector. Exactly
    * [[graft.operators.Pca]]'s arithmetic. */
  private val fitSql: String = s"""
        e AS MATERIALIZED (SELECT vec_id AS id, embedding::DOUBLE[] AS v
              FROM embeddings),
        x0 AS MATERIALIZED (SELECT id, generate_subscripts(v, 1) - 1 AS d,
                      CAST(trunc(unnest(v) * 1000) AS BIGINT) AS x
               FROM e),
        mn AS MATERIALIZED (SELECT d, CAST(${tdiv("CAST(sum(x) AS BIGINT)", "count(*)")}
                         AS BIGINT) AS m
               FROM x0 GROUP BY d),
        xc AS MATERIALIZED (SELECT id, x0.d, x0.x - mn.m AS x
               FROM x0 JOIN mn USING (d)),
        v0 AS MATERIALIZED (SELECT d, CAST(1000 AS BIGINT) AS v FROM mn)"""

  /** One unrolled power-iteration round: scores s = Xc·v normalized to
    * L∞ = 1000, direction u = Xcᵀ·s likewise — long sums + sign-split
    * truncating division, bit-exact vs the operator. */
  private def pcaIter(i: Int): String = s"""
        s$i AS MATERIALIZED (SELECT id, CAST(sum(x * v) AS BIGINT) AS s
                FROM xc JOIN v${i - 1} USING (d) GROUP BY id),
        sn$i AS MATERIALIZED (SELECT id, CAST(${tdiv("s * 1000",
                   s"(SELECT max(abs(s)) FROM s$i)")} AS BIGINT) AS s
                 FROM s$i),
        u$i AS MATERIALIZED (SELECT d, CAST(sum(x * s) AS BIGINT) AS u
                FROM xc JOIN sn$i USING (id) GROUP BY d),
        v$i AS MATERIALIZED (SELECT d, CAST(${tdiv("u * 1000",
                   s"(SELECT max(abs(u)) FROM u$i)")} AS BIGINT) AS v
                FROM u$i)"""

  val defs: Map[String, Q] = Map(

    // ------------------------------------------------------------------
    // Top principal direction of the embedding corpus — the anisotropy
    // axis an "all-but-the-top" whitening prep (Mu 2018) subtracts,
    // and the snapshot-drift diagnostic (compare loadings across
    // crawls). Integer fixed-point power iteration on the centered
    // milli-quantized matrix: 4 rounds, each ONE |n·dims|-row
    // equi-join + keyed long sum per half-step, L∞-normalized through
    // truncating division — bit-exact cross-engine, no rounding gate.
    // ------------------------------------------------------------------
    "q162_principal_component" -> Q(
      fn = (s, dir) => {
        Pca.topComponent(Tables(s, dir, "embeddings"),
            "vec_id", "embedding", iterations = 4)
          .orderBy("dim")
      },
      oracle = Some(s"""
        WITH $fitSql,
        ${(1 to 4).map(pcaIter).mkString(",")}
        SELECT CAST(mn.d AS BIGINT) AS dim,
               CAST(mn.m AS BIGINT) AS mean_milli,
               CAST(v4.v AS BIGINT) AS loading_fp
        FROM mn JOIN v4 USING (d) ORDER BY dim""")),

    // ------------------------------------------------------------------
    // Whitening application over the fitted axis: per-vector exact
    // projection onto the top component and the exact Cauchy–Schwarz
    // residual (Σxc²)(Σv²) − proj² — the anisotropy profile that
    // decides which vectors the top-component removal actually moves.
    // Pure integers end to end: no sqrt, no rounding, bit-exact.
    // ------------------------------------------------------------------
    "q164_embedding_whiten" -> Q(
      fn = (s, dir) => {
        Pca.whiten(Tables(s, dir, "embeddings"),
            "vec_id", "embedding", iterations = 4)
          .select(col("id").as("vec_id"), col("proj_fp"),
            col("resid_sq_fp"))
          .orderBy("vec_id")
      },
      oracle = Some(s"""
        WITH $fitSql,
        ${(1 to 4).map(pcaIter).mkString(",")},
        b AS MATERIALIZED (SELECT CAST(sum(v * v) AS BIGINT) AS b FROM v4),
        pr AS MATERIALIZED (SELECT id, CAST(sum(x * v) AS BIGINT) AS proj,
                      CAST(sum(x * x) AS BIGINT) AS a2
               FROM xc JOIN v4 USING (d) GROUP BY id)
        SELECT id AS vec_id, proj AS proj_fp,
               CAST(a2 * (SELECT b FROM b) - proj * proj AS BIGINT)
                 AS resid_sq_fp
        FROM pr ORDER BY vec_id""")),

    // ------------------------------------------------------------------
    // Maximal Marginal Relevance diverse top-k: greedily pick k=8
    // vectors maximizing 0.7·rel − 0.3·max-sim-to-selected against the
    // vec_id-0 query — the retrieval-for-context / diverse-few-shot
    // selection a plain top-k fails (it returns near-copies of the
    // best hit). Integer-milli similarities make the greedy argmax a
    // pure function of gate-compared integers; the oracle unrolls the
    // 8 greedy steps (the PCA fixed-point discipline applied to a
    // greedy loop).
    // ------------------------------------------------------------------
    "q212_mmr_select" -> Q(
      fn = (s, dir) => {
        import graft.operators.Similarity
        import graft.functions.{VectorFunctions => V}
        val emb = Tables(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") === 0L)
          .select(V.toDouble(col("embedding"))).head.getSeq[Double](0)
        Similarity.mmrSelect(emb.filter(col("vec_id") =!= 0L),
            "vec_id", "embedding", q.toArray, k = 8, lambdaMilli = 700L)
          .withColumnRenamed("id", "vec_id")
          .orderBy("rank")
      },
      oracle = Some(mmrOracleSql(k = 8, lam = 700L))),

    // ------------------------------------------------------------------
    // The 100 TB MMR spelling: candidates pre-cut to the top-50 by
    // relevance (rel desc, id asc — a deterministic total order on
    // integer milli), the 8 greedy rounds scan 50 rows instead of the
    // corpus. λ=400 is diversity-heavy, so the shortlist genuinely
    // constrains the selection — the oracle applies the SAME top-N cut
    // before its unrolled greedy replay, gating the knob's documented
    // semantics (not just the covering-shortlist identity the spec
    // pins).
    // ------------------------------------------------------------------
    "q215_mmr_shortlist" -> Q(
      fn = (s, dir) => {
        import graft.operators.Similarity
        import graft.functions.{VectorFunctions => V}
        val emb = Tables(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") === 0L)
          .select(V.toDouble(col("embedding"))).head.getSeq[Double](0)
        Similarity.mmrSelect(emb.filter(col("vec_id") =!= 0L),
            "vec_id", "embedding", q.toArray, k = 8, lambdaMilli = 400L,
            shortlist = Some(50))
          .withColumnRenamed("id", "vec_id")
          .orderBy("rank")
      },
      oracle = Some(mmrOracleSql(k = 8, lam = 400L, shortlist = Some(50))))
  )

  /** The unrolled greedy MMR replay — generated so the step count, λ
    * and shortlist cut can never drift from the operator call above. */
  private def mmrOracleSql(
      k: Int, lam: Long, shortlist: Option[Int] = None): String = {
    val lamC = 1000L - lam
    def sim(s: String): String =
      s"CAST(round(1000 * list_dot_product(v, (SELECT v FROM $s)) / " +
        s"(vn * (SELECT vn FROM $s))) AS BIGINT)"
    // the candidate base the greedy rounds scan: the full scored frame,
    // or its top-N relevance cut (the same total order the operator
    // documents: rel desc, id asc)
    val base = if (shortlist.isDefined) "rs" else "r"
    val cut = shortlist.map(n => s""",
        rs AS MATERIALIZED (
          SELECT * FROM r ORDER BY rel DESC, id LIMIT $n)""").getOrElse("")
    val steps = new StringBuilder
    steps ++= s"""
        s1 AS MATERIALIZED (
          SELECT id, v, vn, rel, CAST(0 AS BIGINT) AS div
          FROM $base ORDER BY $lam * rel DESC, id LIMIT 1)"""
    for (i <- 2 to k) {
      val prev = (1 until i).map(j => s"s$j")
      val divExpr =
        if (prev.size == 1) sim(prev.head)
        else prev.map(sim).mkString("greatest(", ", ", ")")
      val notin = prev.map(p => s"SELECT id FROM $p")
        .mkString(" UNION ALL ")
      steps ++= s""",
        s$i AS MATERIALIZED (
          SELECT id, v, vn, rel, div FROM (
            SELECT id, v, vn, rel, $divExpr AS div
            FROM $base WHERE id NOT IN ($notin))
          ORDER BY $lam * rel - $lamC * div DESC, id LIMIT 1)"""
    }
    val union = (1 to k).map(i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, id AS vec_id,
               rel AS rel_milli, div AS div_milli,
               CAST($lam * rel - $lamC * div AS BIGINT) AS score_milli
        FROM s$i""").mkString("\n        UNION ALL\n        ")
    s"""
        WITH c AS MATERIALIZED (
          SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS vn
          FROM embeddings WHERE vec_id <> 0
            AND sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[])) > 0),
        q AS MATERIALIZED (
          SELECT embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS vn
          FROM embeddings WHERE vec_id = 0),
        r AS MATERIALIZED (
          SELECT id, v, vn, ${sim("q")} AS rel
          FROM c)$cut,$steps
        $union
        ORDER BY rank"""
  }
}
