package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization,
  * shingling, quality metrics, fingerprinting, language-ID. All pure
  * Column expressions (codegen'd built-ins) — portable to a DuckDB
  * oracle and UDF-free at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization (documents are single-space joined). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Type-token ratio — vocabulary richness quality signal. */
  def typeTokenRatio(text: Column, decimals: Int = 4): Column =
    round(distinctTokenCount(text).cast("double") / tokenCount(text), decimals)

  /** Mean token length, derived without a second pass: for single-space
    * joined text, non-space chars = length - (tokens - 1). */
  def avgTokenLen(text: Column, decimals: Int = 4): Column =
    round((length(text) - (tokenCount(text) - 1)).cast("double")
      / tokenCount(text), decimals)

  /** Ratio of punctuation chars (quality signal; 0 for clean corpora). */
  def punctRatio(text: Column, decimals: Int = 4): Column =
    round((length(text) - length(translate(text, ".,!?;:'\"()-", "")))
      .cast("double") / length(text), decimals)

  /** BPE-style subword-ish tokenization: letter runs, digit runs, and
    * punctuation runs as separate tokens (the pre-tokenization split
    * every BPE vocabulary applies before merges — so this count tracks
    * real tokenizer budgets far better than whitespace counting on
    * punctuation-heavy or code-mixed text). The pattern is plain
    * character classes, portable across regex engines (oracle uses the
    * identical string). */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  def bpeishTokenCount(text: Column): Column =
    size(bpeishTokens(text)).cast("long")

  /** Ratio of tokens drawn from a stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String], decimals: Int = 4)
      : Column = {
    val hits = size(filter(tokens(text),
      t => t.isInCollection(stopwords))).cast("double")
    round(hits / tokenCount(text), decimals)
  }

  /** Word n-gram shingles, distinct, space-joined — the unit for
    * Jaccard/MinHash dedup. Empty array when the doc is shorter than n.
    * Native single-pass kernel (graft.plans.WordShinglesExpr): the HOF
    * formulation (`transform(sequence, i => concat_ws(slice(split(text),
    * ...)))`) re-evaluates the full split per element — O(len²) per doc
    * of interpreted eval, which dominated the dedup benchmarks. */
  def wordShingles(text: Column, n: Int): Column =
    graft.plans.SketchExpressions.wordShingles(text, n)

  /** Character n-gram shingles (language-agnostic; for CJK etc.).
    * Native kernel — the HOF `substr` formulation is O(len²) on
    * multi-byte text (see [[graft.plans.CharShinglesExpr]]). */
  def charShingles(text: Column, n: Int): Column =
    graft.plans.SketchExpressions.charShingles(text, n)

  /** ALL word n-grams with duplicates kept — the multiset twin of
    * [[wordShingles]] for repetition analysis, where how often a gram
    * recurs inside the document is the signal (see
    * [[graft.plans.WordNgramsExpr]]). */
  def wordNgrams(text: Column, n: Int): Column =
    graft.plans.SketchExpressions.wordNgrams(text, n)

  /** Document fingerprint: md5 of unicode-normalized text (lowercase,
    * punctuation/symbols stripped, LETTERS AND DIGITS OF ANY SCRIPT
    * kept). An ascii-only class here would map every pure-CJK document
    * to md5("") and exact-dedup would merge unrelated documents into
    * one group. \p{L}\p{N} has identical semantics in Java regex and
    * DuckDB's RE2 (verified fingerprint-identical across engines). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^\\p{L}\\p{N} ]", ""))

  // -------------------------------------------------------------- langid

  /** Marker terms per language: high-frequency function words (latin
    * scripts, matched with word boundaries) or characters (CJK, matched
    * as substrings). Public linguistic knowledge, deliberately small so
    * the scoring expression stays portable SQL.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to "),
    "de" -> Seq(" der ", " die ", " und ", " ist ", " nicht "),
    "es" -> Seq(" el ", " los ", " que ", " es ", " y "),
    "fr" -> Seq(" le ", " les ", " est ", " dans ", " je "),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Occurrences of `pat` in text (substring count via the replace
    * trick — literal replace, no regex engine differences). */
  private def occurrences(padded: Column, pat: String): Column =
    ((length(padded) - length(replace(padded, lit(pat), lit(""))))
      / pat.length).cast("long")

  /** Marker-count score for one language. */
  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers.toMap.apply(lang)
      .map(m => occurrences(padded, m))
      .reduce(_ + _)
  }

  /** N-gram-heuristic language ID: argmax of marker scores with a fixed
    * tie-break (list order, 'en' first); "und" (undetermined) when no
    * marker hits at all. */
  def langId(text: Column): Column = {
    // array_max over struct(score, priority, lang) compares fieldwise →
    // highest score, then earliest list position.
    val scored = array(langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      struct(
        langScore(text, lang).as("score"),
        lit(langMarkers.size - i).as("prio"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  // ------------------------------------------------------------- BPE

  /** Code-point symbols of a word — the BPE base alphabet. Code points
    * (not chars) so astral-plane text can never split a surrogate
    * pair into two half-symbols. */
  private[graft] def bpeSymbols(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One merge applied to a symbol sequence: a single left-to-right
    * pass replacing non-overlapping adjacent (l, r) with l+r — the
    * SAME primitive drives training (graft.operators.TextStats
    * .bpeTrain) and encoding ([[bpeSegmentToken]]), so the two can
    * never disagree on segmentation. */
  private[graft] def bpeMergePair(
      syms: Array[String], l: String, r: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** A token segmented by an ordered merge list (applied in learned
    * rank order — exactly the training-time replay, Sennrich et al.
    * 2016). Concatenating the result always reproduces the token. */
  private[graft] def bpeSegmentToken(
      token: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = bpeSymbols(token)
    merges.foreach { case (l, r) => syms = bpeMergePair(syms, l, r) }
    syms
  }
}
