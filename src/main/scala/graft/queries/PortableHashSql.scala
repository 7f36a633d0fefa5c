package graft.queries

/** DuckDB spellings of the repo's custom 64-bit hash kernels, for the
  * oracle gates of the sketch-based dedup queries (q25 SimHash, q43
  * winnowing). The kernels are wrap-around `Long` arithmetic
  * (FNV-1a / polynomial rolling hash, both finalized through
  * splitmix64 — see [[graft.functions.HashFunctions.hash64]] and
  * [[graft.plans.WinnowingFingerprint]]); DuckDB has no wrapping
  * 64-bit integer type (BIGINT multiplication ERRORS on overflow), so
  * every step is emulated in HUGEINT (128-bit) with explicit mod-2^64
  * reduction, and bitwise ops detour through two's-complement BIGNT
  * conversion (`xor` is signed-only). The generated SQL is verbose;
  * THIS generator is the readable definition, and the DuckDB output of
  * each builder is pinned against the Spark kernels by the driver's
  * oracle gate itself.
  *
  * Portability contract: the Scala kernels iterate UTF-16 code units
  * (`charAt`), the SQL iterates code points (`ord`) — identical for
  * BMP text (verified for the synthetic corpus: zero astral-plane
  * characters); a corpus with astral characters would diverge and
  * needs a rows-only gate instead.
  */
private[queries] object PortableHashSql {

  private val U64 = "18446744073709551616" // 2^64
  private val U32 = "4294967296" // 2^32

  /** unsigned-u64-in-HUGEINT -> two's-complement signed BIGINT */
  private def u2s(e: String): String =
    s"(CASE WHEN ($e) >= 9223372036854775808 " +
      s"THEN CAST(($e) - $U64 AS BIGINT) ELSE CAST(($e) AS BIGINT) END)"

  /** signed BIGINT -> unsigned u64 in HUGEINT */
  private def s2u(e: String): String =
    s"(CASE WHEN ($e) < 0 THEN CAST(($e) AS HUGEINT) + $U64 " +
      s"ELSE CAST(($e) AS HUGEINT) END)"

  /** (a*b) mod 2^64 for unsigned a,b < 2^64: split a at 2^32 so every
    * intermediate fits signed 128-bit (a full 64×64 product would not). */
  private def mulmod(a: String, b: String): String =
    s"(((($a) % $U32) * ($b) + " +
      s"((($a) // $U32) * ($b) % $U32) * $U32) % $U64)"

  /** z ^ (z >>> k) for unsigned z < 2^64, k >= 27 (the shifted value
    * then fits a positive BIGINT directly). */
  private def xshr(z: String, k: Int): String =
    s2u(s"xor(${u2s(z)}, CAST(($z) // ${1L << k} AS BIGINT))")

  /** splitmix64 finalizer as three chained SELECT stages over a column
    * `raw` (unsigned u64), yielding signed-BIGINT `h` — spelled as the
    * FROM-nest the callers splice in. `keys` are the carried grouping
    * columns. */
  private def splitmixStages(keys: String, from: String): String = {
    val z1 = s"((raw + 11400714819323198485) % $U64)" // + 0x9e3779b97f4a7c15
    val z2 = mulmod(xshr("z1", 30), "13787848793156543929") // 0xbf58476d1ce4e5b9
    val z3 = mulmod(xshr("z2", 27), "10723151780598845931") // 0x94d049bb133111eb
    val z4 = u2s(xshr("z3", 31))
    s"""SELECT $keys, $z4 AS h FROM (
       |  SELECT $keys, $z3 AS z3 FROM (
       |    SELECT $keys, $z2 AS z2 FROM (
       |      SELECT $keys, $z1 AS z1 FROM $from)))""".stripMargin
  }

  /** q25 oracle: brute-force SimHash pairs at hamming <= 3. Lossless
    * stand-in for the banded Spark plan because 4×16-bit banding is
    * recall-COMPLETE at hamming <= 3 (pigeonhole) — banding affects
    * cost, never the result. Token hash = FNV-1a (offset
    * 0xcbf29ce484222325, prime 0x100000001b3) + splitmix64; `rtrim`
    * before the split mirrors Java `split(' ')` dropping trailing
    * empties (interior empties are kept by both). */
  def simhashPairsSql: String = {
    val fnvStep = mulmod(s2u(s"xor(${u2s("acc")}, ${u2s("x")})"),
      "1099511628211") // 0x100000001b3
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(rtrim(text, ' '), ' ')) AS tok
       |  FROM documents),
       |dt AS (SELECT DISTINCT tok FROM toks),
       |fnvd AS (
       |  SELECT tok,
       |         list_reduce(list_prepend(
       |             CAST(14695981039346656037 AS HUGEINT),
       |             [CAST(ord(c) AS HUGEINT)
       |              for c in regexp_extract_all(tok, '(?s).')]),
       |           (acc, x) -> $fnvStep) AS raw
       |  FROM dt),
       |hd AS (${splitmixStages("tok", "fnvd")}),
       |votes AS (
       |  SELECT t.doc_id, i.i,
       |         sum(CASE WHEN (${s2u("h.h")} // power(2, i.i)::HUGEINT)
       |                       % 2 = 1
       |                  THEN 1 ELSE -1 END) AS v
       |  FROM toks t JOIN hd h USING (tok), range(64) AS i(i)
       |  GROUP BY t.doc_id, i.i),
       |sigs AS (
       |  SELECT doc_id,
       |         ${u2s("sum(CASE WHEN v > 0 THEN power(2, i)::HUGEINT " +
                        "ELSE 0 END)")} AS sim
       |  FROM votes GROUP BY doc_id)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |       CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** q43 oracle: winnowing-fingerprint pairs. Gram hash is the DIRECT
    * polynomial sum_t c_{j+t} * B^(k-1-t) mod 2^64 (B = 1000003) —
    * algebraically identical to the kernel's rolling recurrence in
    * wrapping arithmetic — finalized through splitmix64; per window of
    * w the minimum hash is chosen with RIGHTMOST tie-break (order by
    * h, pos DESC), windows only where complete. The candidate df-cap
    * (<= 64 docs per shared fingerprint) is mirrored too: it gates
    * recall in the Spark plan, so a brute-force oracle without it
    * would over-report. */
  def winnowingPairsSql(k: Int = 8, w: Int = 8, maxDocFreq: Int = 64,
      minOverlap: Double = 0.5): String = {
    // B^t mod 2^64 as literals (B^7 would overflow even HUGEINT live)
    val pows = Iterator.iterate(BigInt(1))(p =>
      (p * 1000003) % (BigInt(1) << 64)).take(k).toArray
    val poly = (0 until k)
      .map(t => s"cs[j+$t] * ${pows(k - 1 - t)}").mkString(" + ")
    s"""WITH cs AS (
       |  SELECT doc_id, [CAST(ord(c) AS HUGEINT)
       |                  for c in regexp_extract_all(text, '(?s).')] AS cs
       |  FROM documents),
       |raws AS (
       |  SELECT doc_id, j, ($poly) % $U64 AS raw
       |  FROM (SELECT doc_id, cs, unnest(range(1, len(cs) - $k + 2)) AS j
       |        FROM cs WHERE len(cs) >= $k)),
       |grams AS (
       |  SELECT doc_id, j AS pos, h
       |  FROM (${splitmixStages("doc_id, j", "raws")})),
       |ns AS (SELECT doc_id, max(pos) AS n FROM grams GROUP BY doc_id),
       |chosen AS (
       |  SELECT DISTINCT doc_id, h FROM (
       |    SELECT g.doc_id, win, pos, h,
       |           row_number() OVER (PARTITION BY g.doc_id, win
       |                              ORDER BY h, pos DESC) AS rn
       |    FROM (SELECT doc_id, pos, h,
       |                 unnest(range(greatest(1, pos - $w + 1), pos + 1))
       |                   AS win
       |          FROM grams) g JOIN ns USING (doc_id)
       |    WHERE win <= ns.n - $w + 1)
       |  WHERE rn = 1),
       |sets AS (
       |  SELECT doc_id, list_sort(list(h)) AS ks, count(*) AS sz
       |  FROM chosen GROUP BY doc_id),
       |kdf AS (SELECT h, count(*) AS kdf FROM chosen GROUP BY h),
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM chosen a JOIN chosen b USING (h) JOIN kdf USING (h)
       |  WHERE a.doc_id < b.doc_id AND kdf.kdf <= $maxDocFreq),
       |scored AS (
       |  SELECT a_id, b_id,
       |         round(len(list_intersect(sa.ks, sb.ks))::DOUBLE /
       |               least(sa.sz, sb.sz), 3) AS overlap
       |  FROM cands JOIN sets sa ON sa.doc_id = a_id
       |             JOIN sets sb ON sb.doc_id = b_id)
       |SELECT a_id, b_id, overlap FROM scored
       |WHERE overlap >= $minOverlap
       |ORDER BY a_id, b_id""".stripMargin
  }
}
