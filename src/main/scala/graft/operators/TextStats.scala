package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus-scale text statistics for training-data curation. Each
  * operator is a token- or shingle-level explode followed by keyed
  * aggregation — corpus-linear row counts, hash-partitioned shuffles,
  * map-side partial aggregation — so the shapes hold at 100 TB (no
  * per-document quadratic work, no driver materialization).
  */
object TextStats {

  /** Per-document token-repetition profile — the repetition quality
    * signals large-corpus curation pipelines filter on (the
    * Gopher/MassiveText family of repetition heuristics, Rae et al.
    * 2021, arXiv:2112.11446): `dup_frac` is the fraction of tokens
    * that repeat an earlier token, `top_tok_frac` the share of the
    * single most frequent token. Two aggregations, both keyed by doc
    * (+token) — the (id, tok) pre-aggregation keeps the per-doc state
    * bounded by the doc's distinct vocabulary, not its length.
    */
  def repetitionProfile(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
      .select(col("id"),
        col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("dup_frac"),
        round(col("top_c").cast("double") / col("n_tokens"), 4)
          .as("top_tok_frac"))

  /** Per-document N-GRAM repetition signals — the n-gram tier of the
    * Gopher/MassiveText repetition filters (Rae et al. 2021,
    * arXiv:2112.11446 Table A1: "fraction of characters in the most
    * frequent 2-gram" / "fraction of characters in duplicated
    * 3-grams"), expressed in token fractions over whitespace tokens:
    *
    *   - `top_ngram_frac`  = topN · (occurrences of the single most
    *     frequent topN-gram) / n_tokens
    *   - `dup_ngram_frac`  = dupN · (total occurrences of dupN-grams
    *     appearing ≥ 2 times) / n_tokens
    *
    * Both are overlap-ignoring coverage estimates (dup_ngram_frac can
    * exceed 1.0 on pathologically repetitive text — by design: the
    * signal saturates exactly where the filter fires hardest).
    * Complements [[repetitionProfile]]'s token-level signals: a doc
    * that loops a 50-token paragraph has unremarkable token stats but
    * a dup_ngram_frac near its loop fraction.
    *
    * Scale shape: two explode → (id, gram) partial+final aggregations
    * → doc-keyed joins. Per-doc state is bounded by the doc's distinct
    * gram vocabulary; nothing is corpus-keyed, nothing driver-side.
    */
  def ngramRepetition(
      df: DataFrame, idCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 3): DataFrame = {
    require(topN > 0 && dupN > 0, "n-gram orders must be positive")
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    def gramCounts(n: Int) = base.select(col("id"),
      explode(T.wordNgrams(col("text"), n)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
    val top = gramCounts(topN).groupBy("id").agg(max(col("c")).as("top_c"))
    val dup = gramCounts(dupN).filter(col("c") >= 2)
      .groupBy("id").agg(sum(col("c")).as("dup_occ"))
    base.select(col("id"), T.tokenCount(col("text")).as("n_tokens"))
      .join(top, Seq("id"), "left")
      .join(dup, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        round(lit(topN) * coalesce(col("top_c"), lit(0L)).cast("double") /
          col("n_tokens"), 4).as("top_ngram_frac"),
        round(lit(dupN) * coalesce(col("dup_occ"), lit(0L)).cast("double") /
          col("n_tokens"), 4).as("dup_ngram_frac"))
  }

  /** Per-document n-gram novelty: the fraction of a doc's DISTINCT
    * word n-grams that appear in no other document (corpus document
    * frequency 1). The inverse view of [[topShingles]]' boilerplate
    * mining — low novelty flags template/duplicated content that
    * near-dup thresholds miss, high novelty marks unique material
    * worth keeping in a curation pass. Documents shorter than n tokens
    * have no n-grams and are absent from the output (they have no
    * defined novelty). One gram-keyed df aggregation + one join back +
    * one doc-keyed aggregation — corpus-linear.
    */
  def ngramNovelty(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(T.wordShingles(col(textCol), n)).as("gram"))
    val dfreq = grams.groupBy("gram").agg(count(lit(1)).as("gdf"))
    grams.join(dfreq, "gram")
      .groupBy("id").agg(
        count(lit(1)).as("n_grams"),
        round(sum(when(col("gdf") === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4).as("novel_frac"))
  }

  /** Corpus-level boilerplate mining: the `k` word-`n`-gram shingles
    * present in the most documents (shingles are distinct per doc, so
    * the count IS document frequency). Partial-aggregated counts into
    * a TakeOrderedAndProject top-k — never a full sort of the shingle
    * space. This is the measurement behind the dedup family's df-cap
    * defaults: its output is exactly the keys a candidate stage must
    * not self-join on.
    */
  def topShingles(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(T.wordShingles(col(textCol), n)).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("shingle"))
      .limit(k)

  /** Pairwise corpus-overlap matrix between labeled sub-corpora (the
    * `partCol` groups — sources, crawls, dumps): EXACT distinct
    * word-`n`-gram Jaccard and containment per unordered pair, the
    * corpus-level contamination estimate run before any doc-level
    * decontamination (q52/q75 answer "which documents"; this answers
    * "how much, between which corpora").
    *
    * Shape: one (part, gram) distinct projection, then a gram-keyed
    * self-equi-join — never doc×doc. Per-gram fan-out is bounded by
    * #parts² (parts are corpus LABELS, a handful by construction —
    * this is the operator's documented contract, not a tuning knob),
    * so the join output is ≤ #parts²·|distinct grams|, linear in the
    * gram space at fixed label count. Set sizes ride a broadcast to
    * the pair aggregate. Returns (part_a < part_b, n_common, jaccard,
    * containment); pairs with zero shared grams are absent.
    */
  def corpusOverlap(
      df: DataFrame, partCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = df.select(col(partCol).as("part"),
      explode(T.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    val sizes = grams.groupBy("part").agg(count(lit(1)).as("sz"))
    grams.withColumnRenamed("part", "part_a")
      .join(grams.withColumnRenamed("part", "part_b"), Seq("gram"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("part").as("part_a"),
        col("sz").as("sz_a"))), Seq("part_a"))
      .join(broadcast(sizes.select(col("part").as("part_b"),
        col("sz").as("sz_b"))), Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")), 4).as("jaccard"),
        round(col("n_common").cast("double") /
          least(col("sz_a"), col("sz_b")), 4).as("containment"))
  }

  /** Per-document top-`k` TF-IDF keywords. Term frequencies and
    * document frequencies are two keyed aggregations over the same
    * token explosion; the corpus size enters as an in-plan scalar
    * subquery (no count() action, no 1-row BNLJ join); ranking is a
    * per-doc window over the doc's own vocabulary. All shuffles are
    * keyed by token or doc — corpus-linear at any scale.
    */
  def tfidfTopK(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tk = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("token"))
    val tf = tk.groupBy("id", "token").agg(count(lit(1)).as("c"))
    val dfreq = tk.groupBy("token").agg(countDistinct(col("id")).as("d"))
    val n = graft.plans.Scalars.of(df.agg(count(lit(1)).as("n")))
    import org.apache.spark.sql.expressions.Window
    tf.join(dfreq, "token")
      .withColumn("score",
        round(col("c") * log(n.cast("double") / col("d")), 4))
      .withColumn("rank", row_number().over(Window.partitionBy("id")
        .orderBy(col("score").desc, col("token"))))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank").cast("long").as("rank"),
        col("token"), col("score"))
  }

  /** Per-document unigram surprisal — the cheap statistical stand-in
    * for LM-perplexity quality filtering (the CCNet-style signal:
    * low surprisal = common/boilerplate text, high = rare/noisy).
    * p(token) is the corpus unigram distribution; a doc's score is the
    * mean of -ln p over its tokens. One token-keyed aggregation builds
    * the model, one join + doc-keyed aggregation scores — the model
    * never leaves the cluster (vocabularies outgrow driver broadcast
    * at corpus scale, so this is a plain shuffled join by design).
    */
  def unigramSurprisal(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("token"))
    val cnt = tk.groupBy("token").agg(count(lit(1)).as("c"))
    val tot = graft.plans.Scalars.of(tk.agg(count(lit(1)).as("t")))
    tk.join(cnt, "token")
      .withColumn("s", -log(col("c").cast("double") / tot.cast("double")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("s")), 4).as("surprisal"))
  }

  /** Bigram-LM document scoring — the corpus-self-trained flavor of
    * CCNet-style perplexity quality filtering (Wenzek et al., "CCNet:
    * Extracting high quality monolingual datasets from web crawl
    * data", LREC 2020 — public literature; CCNet scores against a
    * pretrained KenLM, this trains the distributed-friendly special
    * case, an add-one-smoothed bigram model, on the corpus itself):
    * each document's mean negative log-probability under
    * P(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + V), with C(w1 w2) the
    * corpus bigram count, C(w1 ·) the count of w1 as a left context
    * and V the unigram vocabulary size. Low nll = predictable,
    * in-distribution text; high = noise/outliers (or novelty — the
    * score ranks, a gate like [[graft.operators.Sampling.dropBottomFraction]] cuts).
    *
    * Shape: one multiset-bigram explode ([[T.wordNgrams]] — O(len)
    * native kernel), bigram- and left-token-keyed count aggs
    * (partial+final), V as an in-plan scalar subquery, and a per-doc
    * mean — every shuffle keyed by bigram, token or doc, never a
    * global window. Docs with fewer than 2 tokens have no bigrams and
    * are absent from the output (no defined score), matching the SQL
    * oracle's inner-join semantics.
    */
  def bigramLmScore(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = df.select(col(idCol).as("id"),
      explode(T.wordNgrams(col(textCol), 2)).as("bigram"))
    val cb = bg.groupBy("bigram").agg(count(lit(1)).as("cb"))
    val cl = bg.groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("cl"))
    val v = graft.plans.Scalars.of(
      df.select(explode(split(col(textCol), " ")).as("tok"))
        .agg(countDistinct(col("tok")).as("v")))
    bg.join(cb, "bigram")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(cl, "w1")
      .withColumn("s", -log((col("cb") + 1).cast("double") /
        (col("cl") + v.cast("long")).cast("double")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("s")), 4).as("nll"))
  }

  /** Frequency vocabulary + document encoding — the distributed core
    * of corpus tokenization: build the top-`vocabSize` token table
    * (corpus frequency desc, token asc tiebreak; dense ids from 0) and
    * re-express every document as its token-id sequence, OOV → -1.
    *
    * Scale shape: the vocab is selected with a TakeOrderedAndProject
    * (distributed heap, never a global sort of the token space), gets
    * ids from a window over AT MOST `vocabSize` rows (model-sized by
    * contract — that's what a vocabulary is), and joins back to the
    * token stream as a broadcast. Reassembly is the same per-(doc)
    * sorted aggregation as [[chunkTokens]]. Output keeps the encoded
    * sequence as both an array and a portable md5 of its '-'-joined
    * form (the array for downstream ops, the hash for engine-neutral
    * equality).
    */
  def vocabEncode(
      df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .withColumn("tid",
        (row_number().over(Window.orderBy(col("c").desc, col("tok"))) - 1)
          .cast("int"))
      .select("tok", "tid")
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .withColumn("tid", coalesce(col("tid"), lit(-1)))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === -1, 1L).otherwise(0L)).as("n_oov"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          e => e.getField("tid")).as("token_ids"))
      .withColumn("enc_md5",
        md5(concat_ws("-", transform(col("token_ids"),
          i => i.cast("string")))))
  }

  /** Token-window chunking for context-length packing: overlapping
    * windows of `chunkSize` tokens starting every `stride` tokens —
    * how a training pipeline turns documents into fixed-budget
    * samples. Tokens become (doc, pos, tok) rows, each token explodes
    * to the <= ceil(chunkSize/stride) chunks whose window covers it,
    * and chunks reassemble with a per-(doc, chunk) sorted aggregation.
    * All distributed by (doc, chunk) keys; a long document costs
    * O(len · chunkSize/stride) rows, never O(len²) substring work.
    */
  def chunkTokens(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    // chunk c covers token positions [c*stride, c*stride + chunkSize)
    val cLo = greatest(lit(0),
      ceil((col("pos") - chunkSize + 1) / lit(stride.toDouble)).cast("int"))
    val cHi = floor(col("pos") / lit(stride.toDouble)).cast("int")
    toks.withColumn("chunk", explode(sequence(cLo, cHi)))
      .groupBy("id", "chunk")
      .agg(
        count(lit(1)).as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok"))).as("chunk_text"))
  }

  /** Content-defined chunking (Muthitacharoen 2001's LBFS cut-point
    * discipline at word granularity): a chunk boundary opens BEFORE
    * token `i` whenever the rolling window of the `gram` preceding
    * tokens hashes into the cut set — here, md5 first hex nibble `0`,
    * a 1/16 cut rate giving ~`16 + gram`-token expected chunks. Cut
    * points depend only on LOCAL content, so an edit re-chunks ONLY
    * the chunks it touches — every chunk after the edit's
    * boundary-resync keeps its fingerprint, which is what makes
    * chunk-level reuse across corpus snapshots possible where
    * fixed-stride chunking (chunkTokens) shifts every downstream
    * chunk. Returns `(id, seg, n_tokens, chunk_md5)` — `seg` 0-based
    * in document order.
    *
    * Scale shape: boundary flags are per-row expressions over the
    * token ARRAY (a `gram`-token slice + md5 each — local, no joins);
    * segment ids ride ONE document-keyed running-sum window (a doc's
    * length is the state bound, the q156 discipline); chunks
    * reassemble with one (doc, seg)-keyed sorted aggregation. Nothing
    * corpus-wide, nothing collected. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      gram: Int = 4): DataFrame = {
    require(gram >= 1 && gram <= 64, "gram must be in [1, 64]")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
        split(col(textCol), " ").as("__toks"))
      .select(col("id"), col("__toks"),
        posexplode(col("__toks")).as(Seq("pos", "tok")))
      // boundary BEFORE pos i: the gram window tokens[i-g..i-1]
      // (1-based slice start i-g+1) cuts when its md5 leads with '0'
      .select(col("id"), col("pos"), col("tok"),
        when(col("pos") >= gram,
          substring(md5(concat_ws(" ",
            slice(col("__toks"), col("pos") - gram + lit(1), lit(gram)))
            .cast("binary")), 1, 1) === "0")
          .otherwise(lit(false)).as("__cut"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("seg", sum(col("__cut").cast("long")).over(w))
      .groupBy(col("id"), col("seg"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok"))).cast("binary")).as("chunk_md5"))
  }

  /** BPE merge learning (Sennrich et al., ACL 2016): learns `nMerges`
    * byte-pair merges and returns the ordered merge table
    * (rank, left, right, merged, pair_count).
    *
    * The scale split is the one every production BPE trainer uses:
    * pair statistics are NOT computed on the token stream but on the
    * aggregated WORD-FREQUENCY table — one distributed partial+final
    * count over the corpus, `minCount` pruning the long tail, then
    * the top `maxWords` by (count, word) collected to the driver
    * (TakeOrderedAndProject; the collect is maxWords·|word| bytes —
    * the same bounded-model contract as the centroid sample, stated
    * here because vocabularies, unlike corpora, are cappable by
    * contract). The merge loop itself is driver-local over that
    * table — each round re-counts adjacent pairs weighted by word
    * frequency and merges the max-(count, then lexicographically
    * first) pair, so the result is fully deterministic.
    *
    * The merge primitive is shared with the encode path
    * ([[graft.functions.TextFunctions.bpeMergePair]]) — training
    * replay and encoding can never disagree on segmentation.
    */
  def bpeTrain(
      df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxWords: Int = 65536): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    require(maxWords > 0, "maxWords must be positive")
    val spark = df.sparkSession
    val words: Array[(String, Long)] = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, c) => (T.bpeSymbols(w), c) }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rank.toLong, l, r, c))
        seqs = seqs.map { case (syms, wc) => (T.bpeMergePair(syms, l, r), wc) }
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq
      .map { case (rk, l, r, c) => (rk, l, r, l + r, c) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Model-based quality scoring: a hashed bag-of-words linear
    * classifier (fastText-shaped, Joulin et al. 2016) over unigram +
    * word-bigram features — the trained-filter stage of GPT-3/LLaMA/
    * FineWeb-style curation, as opposed to the rule-based heuristics
    * above. `weightsMilli` is the model: 1000·weight per hash bucket,
    * integer so the per-document fold is exact (see
    * [[graft.plans.HashedBowScoreExpr]] for the portability and
    * scale contracts — per-row expression, no shuffle, model ships
    * once per stage).
    *
    * Output per document: `n_features` (feature occurrences),
    * `score_milli` (integer raw score incl. `biasMilli`), `score`
    * (real-valued, = score_milli/1000), `keep` (score > 0).
    */
  def hashedBowScore(
      df: DataFrame, idCol: String, textCol: String,
      weightsMilli: Array[Long], biasMilli: Long = 0L): DataFrame = {
    import graft.plans.TextModelExpressions
    df.select(col(idCol),
        TextModelExpressions.hashedBowScore(
          col(textCol), weightsMilli.length, weightsMilli).as("s"))
      .select(col(idCol), col("s.n_features").as("n_features"),
        (col("s.score_milli") + lit(biasMilli)).as("score_milli"))
      .withColumn("score", col("score_milli").cast("double") / 1000.0)
      .withColumn("keep", col("score_milli") > 0L)
  }

  /** C4-style blocklist filtering (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning…" — the "bad words" screen of the C4
    * pipeline; public methodology): per document, the number of
    * whitespace-token occurrences (case-insensitive) found in the
    * caller's blocklist, and a keep flag for zero hits.
    *
    * Scale shape: ONE per-row array expression — lower → split →
    * filter-HOF → size; no explode, no shuffle, no UDF. The blocklist
    * ships inside the plan as an array literal (real-world lists are
    * O(100) entries; `array_contains` is O(|list|) per token — a list
    * large enough to hurt should become a broadcast join on the token
    * stream instead, which [[Dedup.exactNgramDecontam]] already
    * provides at gram granularity). Null text → null count and flag
    * (the q120 null contract).
    */
  def blocklistFilter(
      df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    val bl = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    df.select(col(idCol).as("id"),
        size(filter(split(lower(col(textCol)), " "),
          t => array_contains(bl, t))).cast("long").as("n_blocked"))
      .withColumn("keep", col("n_blocked") === 0L)
  }

  /** Gopher-style heuristic quality gate (Rae et al. 2021, "Scaling
    * Language Models: … Gopher", arXiv:2112.11446 Appendix A — public
    * methodology): one pass computing the classic document-level
    * screens and a keep flag that requires ALL of them —
    *   - word count within [minWords, maxWords];
    *   - mean word length within [minMeanWordLen, maxMeanWordLen]
    *     (exact: the length sum is integer arithmetic in double, so
    *     both engines agree bit-for-bit before the display rounding);
    *   - at least `minStopwords` stopword occurrences (the "is this
    *     prose" test; ASCII/English-targeted like the original);
    *   - at least `minAlphaFrac` of words containing an ASCII letter
    *     (the symbol/garbage screen, [A-Za-z] scope documented);
    *   - most-frequent-token mass ≤ maxTopTokenShare (the repetition
    *     screen — the [[graft.plans.TextEntropyExpr]] `top_token_share`
    *     signal, compared on the ROUNDED value so the flag is a pure
    *     function of gate-compared numbers).
    *
    * All signals are per-row expressions — no shuffle, no explode in
    * the plan; thresholds compare rounded/integer values only, so
    * keep is engine-deterministic. Null text → null signals + flag.
    */
  def gopherQualityGate(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minStopwords: Int = 2,
      stopwords: Seq[String] = Seq("the", "a", "of", "to", "and"),
      minAlphaFrac: Double = 0.8,
      maxTopTokenShare: Double = 0.2): DataFrame = {
    import graft.plans.TextModelExpressions
    val sw = array(stopwords.map(w => lit(w.toLowerCase)): _*)
    val withSignals = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("tk", split(col("text"), " "))
      .withColumn("e", TextModelExpressions.textEntropy(col("text")))
      .select(col("id"),
        size(col("tk")).cast("long").as("n_words"),
        round(aggregate(col("tk"), lit(0.0),
          (acc, x) => acc + length(x).cast("double")) / size(col("tk")), 4)
          .as("mean_word_len"),
        size(filter(col("tk"), t => array_contains(sw, lower(t))))
          .cast("long").as("n_stopwords"),
        round(size(filter(col("tk"), t => t.rlike("[A-Za-z]")))
          .cast("double") / size(col("tk")), 4).as("alpha_frac"),
        round(col("e.top_token_share"), 4).as("top_token_share"))
    withSignals.withColumn("keep",
      col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen &&
        col("n_stopwords") >= minStopwords &&
        col("alpha_frac") >= minAlphaFrac &&
        col("top_token_share") <= maxTopTokenShare)
  }

  /** Corpus diversity profile per group (source, language, domain …) —
    * the lexical-diversity report curation stacks run before fixing a
    * training mixture (Gopher's repetition analyses at corpus grain;
    * type-token ratio is the classic lexical-diversity statistic):
    * per group, document/token/type counts, type-token ratio, and
    * distinct-vs-total word n-gram diversity (a low gram ratio = the
    * source keeps repeating the same phrases — boilerplate-heavy or
    * template-generated).
    *
    * Scale shape: three partial+final aggregations on the group key
    * (docs; tokens with a distinct-count; n-grams with a
    * distinct-count), joined on the tiny per-group result. The
    * distinct counts are Spark's two-phase distinct aggregate — keyed
    * by (group, value) first, so no group becomes a single-task
    * hotspot. Text never shuffles; the exploded streams collapse
    * map-side into per-key counts. Output is one row per group.
    */
  def diversityProfile(
      df: DataFrame, groupCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, "n must be at least 1")
    val base = df.select(col(groupCol).as("grp"), col(textCol).as("text"))
    val docs = base.groupBy("grp").agg(count(lit(1)).as("n_docs"))
    val tk = base.select(col("grp"),
      explode(split(col("text"), " ")).as("t"))
    val tokAgg = tk.groupBy("grp").agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("t")).as("n_types"))
    val gr = base.select(col("grp"),
      explode(graft.plans.SketchExpressions.wordNgrams(col("text"), n)).as("g"))
    val gramAgg = gr.groupBy("grp").agg(
      count(lit(1)).as("n_grams"),
      countDistinct(col("g")).as("n_distinct_grams"))
    docs
      .join(tokAgg, Seq("grp"), "left_outer")
      .join(gramAgg, Seq("grp"), "left_outer")
      .select(col("grp"),
        col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 4)
          .as("ttr"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_distinct_grams"), lit(0L)).as("n_distinct_grams"),
        round(col("n_distinct_grams").cast("double") / col("n_grams"), 4)
          .as("gram_diversity"))
  }

  /** Per-document Shannon-entropy quality profile (word entropy, code-
    * point entropy, top-token mass) — see
    * [[graft.plans.TextEntropyExpr]] for the kernel and its contracts.
    * One per-row pass, no shuffle; the struct is projected once and
    * fields extracted from the projected attribute (the
    * [[graft.plans.HashedBowScoreExpr]] consumer rule). */
  def entropyProfile(
      df: DataFrame, idCol: String, textCol: String,
      decimals: Int = 4): DataFrame = {
    import graft.plans.TextModelExpressions
    df.select(col(idCol),
        TextModelExpressions.textEntropy(col(textCol)).as("e"))
      .select(col(idCol),
        round(col("e.word_entropy"), decimals).as("word_entropy"),
        round(col("e.char_entropy"), decimals).as("char_entropy"),
        round(col("e.top_token_share"), decimals).as("top_token_share"))
  }

  /** Per-group unigram-distribution drift against the whole corpus —
    * the distribution-shift monitor a multi-source (or multi-snapshot)
    * pipeline runs before blending: for each group, the add-one-
    * smoothed unigram distribution P_g over the CORPUS vocabulary is
    * compared to the corpus distribution Q via KL(P_g‖Q) and total-
    * variation distance (the CCNet/Dolma-style per-dump drift check;
    * cf. Wenzek 2019's per-shard LM-perplexity monitoring, public).
    * A source whose KL spikes between snapshots changed its content
    * mix — the signal curation wants BEFORE mixing weights are chosen.
    *
    * Smoothing: P_g(t) = (c_gt + 1) / (N_g + V), Q(t) = (C_t + 1) /
    * (N + V), both summed over the FULL corpus vocabulary (missing
    * tokens contribute their smoothed floor — KL needs the dense sum
    * to be a true divergence, ≥ 0 up to summation ulps).
    *
    * Scale shape: ONE explode pass over the corpus feeds a (group,
    * token) partial+final count; everything after runs on that
    * aggregate — the global counts and per-group totals derive from it
    * (no second corpus pass), and the dense sum is a groups × vocab
    * equi-join of AGGREGATE rows, never corpus rows. The (group,
    * token) aggregate is materialized once (eager localCheckpoint —
    * the [[graft.operators.Sampling.rankEnsemble]] exception pattern:
    * three internal consumers would otherwise re-run the corpus
    * explode three times). Corpus totals ride scalar subqueries.
    * Output: group, n_tokens, n_distinct, kl_vs_corpus,
    * tv_vs_corpus (both rounded to `decimals`). */
  /** Context-length planning ledger: for each candidate maximum
    * sequence length, what a truncate-at-L (or pad-to-L, or
    * pack-to-L) regime costs on this corpus — the profile read before
    * committing a training run's `max_seq_len`:
    *
    *   - `n_docs_fit` / `pct_docs_fit` — documents at or under L;
    *   - `trunc_loss_pct` — fraction of corpus tokens LOST by
    *     truncating every document at L;
    *   - `pad_utilization` — non-pad fraction of a pad-to-L batch
    *     with one (truncated) document per row, the no-packing cost;
    *   - `packed_seqs` — ⌈kept tokens / L⌉, the sequence count a
    *     perfect packer ([[Packing]]) would emit.
    *
    * One corpus pass: a slim per-document token-count projection
    * fans out by `explode` over the LITERAL candidate array (|L|
    * small by contract — it rides the plan as a literal, no join),
    * then one partial+final aggregate keyed by L. Ratios are exact
    * long arithmetic until the final rounded division. */
  def seqLenPlan(
      df: DataFrame, textCol: String, lengths: Seq[Int],
      decimals: Int = 4): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ > 0),
      "candidate lengths must be positive")
    import graft.functions.{TextFunctions => T}
    df.select(T.tokenCount(col(textCol)).as("__len"))
      .select(col("__len"),
        explode(array(lengths.map(l => lit(l.toLong)): _*)).as("max_len"))
      .groupBy(col("max_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__len") <= col("max_len"), 1L).otherwise(0L))
          .as("n_docs_fit"),
        sum(col("__len")).as("__tot"),
        sum(least(col("__len"), col("max_len"))).as("__kept"))
      .select(
        col("max_len"),
        col("n_docs_fit"),
        round(col("n_docs_fit").cast("double") / col("n_docs"), decimals)
          .as("pct_docs_fit"),
        round(lit(1.0) - col("__kept").cast("double") / col("__tot"),
          decimals).as("trunc_loss_pct"),
        round(col("__kept").cast("double") / (col("n_docs") * col("max_len")),
          decimals).as("pad_utilization"),
        expr("(`__kept` + `max_len` - 1) div `max_len`").as("packed_seqs"))
  }

  /** Vocabulary coverage curve (the Zipf profile behind tokenizer
    * vocab sizing): for each candidate vocabulary size K, what
    * fraction of corpus TOKENS the K most frequent types cover —
    * "does a 32k vocab suffice for this corpus".
    *
    * Rank ties never matter: types are ranked by (count desc, type)
    * but every type at the cut boundary carries the SAME count, so
    * coverage(K) = tokens_above_boundary + (K − types_above) ·
    * boundary_count regardless of which boundary types are taken —
    * which is why the whole computation runs on the DISTINCT-COUNT
    * ledger, never a vocab-wide rank: one (type, count) aggregate, one
    * (count → n_types) aggregate, a cumulative window over that
    * ledger, and one boundary lookup per K (the literal K array
    * explodes against the ledger; exactly one row satisfies the
    * boundary predicate after clamping K to the vocab size).
    *
    * The ledger window is single-partition but BOUNDED: distinct count
    * values satisfy Σc ≥ V(V+1)/2, so the ledger is ≤ √(2·n_tokens)
    * rows (~6M at 10^13 tokens — window-safe), vs the vocab itself
    * which is not. Output per K: k, n_types_used (= min(K, vocab)),
    * coverage_tokens, coverage_pct. Exact long arithmetic until the
    * final rounded division. */
  def vocabCoverage(
      df: DataFrame, textCol: String, ks: Seq[Long],
      decimals: Int = 4): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0),
      "candidate vocab sizes must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // consumed by ledger + two scalars
    // one struct-valued scalar for (Σ tokens, vocab size) — one
    // subquery job and one ledger pass instead of two (q201 finding)
    val tots = graft.plans.Scalars.of(
      counts.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
        .select(struct(col("n"), col("v")).as("s")))
    val nTot = tots.getField("n")
    val vTot = tots.getField("v")
    val w = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val led = counts.groupBy(col("c"))
      .agg(count(lit(1)).as("n_types"))
      .withColumn("toks", col("c") * col("n_types"))
      .withColumn("ctb", coalesce(sum(col("n_types")).over(w), lit(0L)))
      .withColumn("ckb", coalesce(sum(col("toks")).over(w), lit(0L)))
    led.select(col("c"), col("n_types"), col("ctb"), col("ckb"),
        explode(array(ks.map(lit): _*)).as("k"))
      .withColumn("k0", least(col("k"), vTot))
      .filter(col("ctb") < col("k0") &&
        col("k0") <= col("ctb") + col("n_types"))
      .select(col("k"),
        col("k0").as("n_types_used"),
        (col("ckb") + (col("k0") - col("ctb")) * col("c"))
          .as("coverage_tokens"),
        round((col("ckb") + (col("k0") - col("ctb")) * col("c"))
          .cast("double") / nTot, decimals).as("coverage_pct"))
  }

  def unigramDrift(
      df: DataFrame, textCol: String, groupCol: String,
      decimals: Int = 4): DataFrame = {
    val sc = df
      .select(col(groupCol).as("g"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("g"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // gc/ns/sc all derive from the same checkpointed aggregate —
    // re-aliased grouping keys give the three-way join unambiguous
    // attribute ids (the standard self-join discipline)
    val gc = sc.groupBy(col("tok")).agg(sum(col("c")).as("gC"))
      .select(col("tok").as("__t"), col("gC"))
    val ns = sc.groupBy(col("g")).agg(sum(col("c")).as("Ns"),
      count(lit(1)).as("nd"))
      .select(col("g").as("__g"), col("Ns"), col("nd"))
    val nTot = graft.plans.Scalars.of(sc.agg(sum(col("c")).as("n")))
    val vTot = graft.plans.Scalars.of(
      gc.agg(count(lit(1)).as("v")))
    // groups ledger is model-sized (sources/languages/snapshots) —
    // pinned broadcast so the dense frame is vocab-partitioned, never
    // a nested-loop over the vocab; null-safe on the group key (a null
    // group is a valid group)
    val dense = gc.crossJoin(broadcast(ns))
      .join(sc,
        col("__g") <=> col("g") && col("__t") === col("tok"), "left")
      .withColumn("cg", coalesce(col("c"), lit(0L)))
      .withColumn("p",
        (col("cg") + 1).cast("double") / (col("Ns") + vTot))
      .withColumn("q",
        (col("gC") + 1).cast("double") / (nTot + vTot))
    dense.groupBy(col("__g"))
      .agg(
        first(col("Ns")).as("n_tokens"),
        first(col("nd")).as("n_distinct"),
        round(sum(col("p") * log(col("p") / col("q"))), decimals)
          .as("kl_vs_corpus"),
        round(sum(abs(col("p") - col("q"))) / 2, decimals)
          .as("tv_vs_corpus"))
      .select(col("__g").as(groupCol), col("n_tokens"),
        col("n_distinct"), col("kl_vs_corpus"), col("tv_vs_corpus"))
  }

  /** Collocation (phrase) mining over adjacent token bigrams — the
    * phrase-detection pass of word2vec-style preprocessing (Mikolov
    * et al. 2013 §4, arXiv:1310.4546, public): score(a,b) =
    * (count(ab) − delta) · N / (count(a) · count(b)), where N is the
    * corpus token count and `delta` discounts rare accidents. Pairs
    * scoring high co-occur far more than their unigram frequencies
    * predict — the "New York" detector. Returns the `k` top-scoring
    * bigrams with count ≥ `minCount`, score in exact MILLI fixed
    * point (pure rational arithmetic over exact long counts — no
    * logs, no doubles — so every engine agrees bit-for-bit).
    *
    * Scale shape: one token explode → unigram counts; one in-doc
    * bigram explode (an index-transform expression, no self-join) →
    * bigram counts; two vocabulary-keyed equi-joins attach unigram
    * counts to bigram rows (the unigram side stays distributed — a
    * 100 TB vocabulary never broadcasts); N rides a scalar subquery;
    * top-k plans as TakeOrderedAndProject. Overflow contract:
    * (count(ab) − delta) · N · 1000 must fit a long — at
    * trillion-token corpora compute the score per million
    * (drop the ·1000) or move to DECIMAL. */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
      delta: Long, k: Int): DataFrame = {
    require(minCount >= 1L && delta >= 0L && k >= 1)
    val toks = df.select(split(col(textCol), " ").as("arr"))
    val uni = toks.select(explode(col("arr")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = graft.plans.Scalars.of(
      toks.agg(sum(size(col("arr"))).cast("long").as("n")))
    val big = toks
      .select(explode(expr(
        "transform(sequence(1, size(`arr`) - 1), " +
          "i -> struct(`arr`[i-1] as a, `arr`[i] as b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= lit(minCount))
    big
      .join(uni.select(col("w").as("a"), col("c").as("ca")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("c").as("cb")), Seq("b"))
      .withColumn("__n", n)
      .select(col("a"), col("b"), col("cab"), col("ca"), col("cb"),
        expr(s"((`cab` - ${delta}L) * `__n` * 1000L) div (`ca` * `cb`)")
          .as("score_milli"))
      .orderBy(col("score_milli").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Exact heavy hitters over the corpus token stream WITHOUT a
    * full-vocabulary shuffle: every token whose global count strictly
    * exceeds `N / (k+1)` (N = total tokens), with its exact count.
    *
    * The plain spelling — `groupBy(token).count()` then filter — is
    * correct but its map-side partial-agg hash tables grow with the
    * per-partition DISTINCT vocabulary; at web scale (billions of
    * types: URLs, hashes, code identifiers) they spill and the shuffle
    * carries the whole long-tail vocabulary just to discard it. This
    * operator is the two-pass sketch-then-recount:
    *
    *   1. ONE aggregate summarizes the token stream with a
    *      MISRA–GRIES summary of `k` counters (Misra & Gries 1982 —
    *      O(k) memory, one pass, no sort): the map-side partial
    *      buffer is each partition's summary, partials merge by the
    *      mergeable-summaries rule, and the final summary holds at
    *      most `k` candidate tokens;
    *   2. that model-sized candidate set is broadcast back as a
    *      semi-join filter, and ONE exact count aggregation runs over
    *      just the candidate tokens.
    *
    * The candidate set is provably a SUPERSET of every qualifying
    * token (zero false negatives): a Misra–Gries buffer's total
    * undercount is at most 1/(k+1) of the mass it absorbed (each
    * decrement event retires >= k+1 units), and undercounts ADD
    * across merges, so a token with global count > N/(k+1) keeps a
    * positive estimate in the merged summary and survives. False
    * positives cost only recount work and are filtered by the exact
    * threshold — reported counts are always exact. Output:
    * (`tok`, `cnt`), count-desc.
    *
    * The sketch is [[graft.plans.MisraGriesAgg]], a native
    * TypedImperativeAggregate — the map-side partial buffer IS the
    * per-partition summary (one pass, O(k) memory), the final merge
    * sees #partitions model-sized buffers, and the same kernel is a
    * SQL function (`graft_misra_gries`). No mapPartitions, no second
    * candidate-dedup stage. */
  def heavyHitters(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val toks = df.select(explode(T.tokens(col(textCol))).as("tok"))
    // ONE fused sketch pass computes BOTH the candidate summary and
    // the total token count (the ingestDedupBatch fused bloom+probe
    // device) — a separate total aggregate would tokenize the corpus
    // a third time
    val fused = toks.agg(
      graft.plans.SketchExpressions.misraGries(col("tok"), k).as("__c"),
      count(lit(1)).as("__n")).localCheckpoint(true)
    val candidates = fused.select(explode(col("__c")).as("tok"))
    val total = graft.plans.Scalars.of(fused.select(col("__n")))
    toks.join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("__n", total)
      .filter(col("cnt") * lit(k + 1).cast("long") > col("__n"))
      .select(col("tok"), col("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** Candidate-frame caps for [[heavyHittersPerGroup]]'s broadcast
    * joins: the candidate set holds up to groups·k rows, and with k
    * near its useful ceiling (10^5-10^6) over many groups that is no
    * longer a model-sized broadcast. At or under BOTH caps (≈ 2M rows
    * AND 64 MB of row payload — token bytes PLUS the group key's JSON
    * bytes; rows alone would pass a frame of multi-KB "tokens" from
    * unsegmented text, or multi-KB group values from per-URL grouping,
    * straight into a driver OOM) the recount semi-join and the totals
    * join broadcast;
    * above either, both fall back to plain shuffle joins — same
    * answer, the standard decide-the-path-never-the-answer contract
    * ([[graft.operators.Similarity]]'s broadcast-grid discipline). */
  private[operators] val GroupHHBroadcastMaxRows = 1L << 21
  private[operators] val GroupHHBroadcastMaxBytes = 64L << 20

  /** [[heavyHitters]] stratified: every (group, token) with count
    * strictly > n_group/(k+1) — the Misra–Gries aggregate is a true
    * aggregate function, so per-group summaries are just `groupBy` +
    * the same fused sketch/count pass, and the recount semi-joins on
    * (group, token). The per-source/per-language hot-token read
    * (which boilerplate dominates WHICH crawl) at the same bounded
    * memory per group. Output: (`group`, `tok`, `cnt`).
    *
    * A NULL group is a group like any other (unsourced docs are
    * exactly the slice whose boilerplate needs reading): the join keys
    * ride struct-wrapped so complex-type equality keeps null groups
    * null-safe — the repo's medianMad/withStratumRank discipline. The
    * candidate frame broadcasts only while it is provably model-sized
    * (≤ [[GroupHHBroadcastMaxRows]] rows, measured on the checkpointed
    * summaries, never assumed); past the cap the joins run as ordinary
    * shuffles. */
  def heavyHittersPerGroup(
      df: DataFrame, groupCol: String, textCol: String, k: Int,
      broadcastMaxRows: Long = GroupHHBroadcastMaxRows): DataFrame = {
    require(k >= 1, "k must be positive")
    val toks = df.select(struct(col(groupCol).as("g")).as("__g"),
      explode(T.tokens(col(textCol))).as("tok"))
    val fused = toks.groupBy(col("__g")).agg(
      graft.plans.SketchExpressions.misraGries(col("tok"), k).as("__c"),
      count(lit(1)).as("__n")).localCheckpoint(true)
    val cands = fused.select(col("__g"), explode(col("__c")).as("tok"))
    // the size test is ONE aggregate over the checkpointed model-sized
    // summaries (≤ groups rows scanned), not a corpus action — and it
    // measures rows AND the full row payload (token bytes PLUS the
    // group key each broadcast row carries, via its JSON spelling — a
    // safe overestimate), so neither pathological multi-KB "tokens"
    // nor multi-KB group values (per-URL grouping) can ride a low row
    // count into a driver-sized broadcast
    val sz = cands.agg(count(lit(1)).as("n"),
      coalesce(sum(octet_length(col("tok")) +
        octet_length(to_json(col("__g")))), lit(0L)).as("b")).head()
    val small = sz.getLong(0) <= broadcastMaxRows &&
      sz.getLong(1) <= GroupHHBroadcastMaxBytes
    def maybeBroadcast(d: DataFrame): DataFrame =
      if (small) broadcast(d) else d
    toks.join(maybeBroadcast(cands), Seq("__g", "tok"), "left_semi")
      .groupBy(col("__g"), col("tok")).agg(count(lit(1)).as("cnt"))
      .join(maybeBroadcast(fused.select(col("__g"), col("__n"))),
        Seq("__g"))
      .filter(col("cnt") * lit(k + 1).cast("long") > col("__n"))
      .select(col("__g.g").as("group"), col("tok"), col("cnt"))
      .orderBy(col("group"), col("cnt").desc, col("tok"))
  }

  /** Vocabulary growth curve (the empirical Heaps'-law read behind
    * "will more data still grow the vocabulary"): walk the corpus in
    * the content-stable [[Sampling.shuffleOrder]] permutation (seeded,
    * engine-reproducible — NOT file order, which correlates with
    * source and biases the curve) and report, at each of `steps`
    * checkpoints, how many token TYPES the prefix has introduced.
    * Output: `(step, cum_docs, new_types, cum_types)`, one row per
    * step that introduced anything.
    *
    * The "first time each type appears" is one (token → min
    * shuffle_pos) aggregate — corpus-linear, map-side combining, no
    * per-prefix rescan (the naive spelling re-tokenizes the corpus
    * once per checkpoint); the step ledger is model-sized and the
    * only window runs over its <= `steps` rows. Checkpoint arithmetic
    * is integral (`fs·steps div n + 1`, `(step·n) div steps`) so both
    * engines agree exactly. `n` > 1 counts word n-gram types instead
    * of unigram types — the right curve for phrase-aware vocabularies
    * (and the one with a visible tail on small-vocab corpora). */
  def vocabGrowth(
      df: DataFrame, idCol: String, textCol: String,
      seed: String, steps: Int = 10, n: Int = 1): DataFrame = {
    require(steps >= 1 && steps <= 1000, "steps must be in [1, 1000]")
    require(n >= 1, "gram size must be positive")
    import org.apache.spark.sql.expressions.Window
    val nDocs = graft.plans.Scalars.of(df.agg(count(lit(1)).as("n")))
    val ordered = Sampling.shuffleOrder(
      df.select(col(idCol), col(textCol)), idCol, seed)
    val grams = if (n == 1) T.tokens(col(textCol))
      else T.wordNgrams(col(textCol), n)
    val first = ordered
      .select(col("shuffle_pos"), explode(grams).as("tok"))
      .groupBy("tok").agg(min(col("shuffle_pos")).as("fs"))
    first
      .withColumn("__n", nDocs)
      .withColumn("step", expr(s"`fs` * ${steps}L div `__n` + 1"))
      .groupBy(col("step"))
      .agg(count(lit(1)).as("new_types"), max(col("__n")).as("__n"))
      .withColumn("cum_docs", expr(s"(`step` * `__n`) div ${steps}L"))
      .withColumn("cum_types", sum(col("new_types")).over(
        Window.orderBy("step")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("step", "cum_docs", "new_types", "cum_types")
  }

  /** Zipf rank-frequency fit over the top-`v` vocabulary: OLS of
    * ln(freq) on ln(rank); a Zipfian corpus sits near slope −1
    * (Zipf 1949; Piantadosi 2014, "Zipf's word frequency law in
    * natural language" — public literature). Returns ONE row
    * `(n_types, slope, icept)` (`n_types` ≤ v — the actual fitted
    * vocabulary), both coefficients rounded to 6 dp. The deviation
    * from −1 is a cheap corpus-health read: template/boilerplate
    * corpora flatten the head, OCR noise fattens the tail.
    *
    * Scale shape: the vocabulary cut is a TakeOrderedAndProject
    * (freq desc, token asc — a distributed heap, never a global sort
    * of the token space); ranks come from a window over AT MOST `v`
    * rows (model-sized by contract, the [[vocabEncode]] discipline);
    * the fit is one aggregate over those `v` points. The corpus-sized
    * work is exactly one token-keyed count. */
  def zipfFit(
      df: DataFrame, textCol: String, v: Int = 1000): DataFrame = {
    require(v >= 2 && v <= 1000000, "v must be in [2, 1000000]")
    import org.apache.spark.sql.expressions.Window
    val top = df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(v)
    val pts = top
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("token"))))
      .select(log(col("r").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val s = pts.agg(count(lit(1)).as("n_types"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nD = col("n_types").cast("double")
    val slope = (nD * col("sxy") - col("sx") * col("sy")) /
      (nD * col("sxx") - col("sx") * col("sx"))
    // degenerate fit: with fewer than two fitted TYPES (v >= 2 bounds
    // only the parameter) the denominator is 0 and the slope 0/0 —
    // emit NULL, which both engines agree on, instead of NaN
    val ok = col("n_types") >= 2
    s.select(col("n_types"),
      when(ok, round(slope, 6)).as("slope"),
      when(ok, round((col("sy") - slope * col("sx")) / nD, 6)).as("icept"))
  }

  /** BM25 top-`k` retrieval (Robertson & Zaragoza 2009, "The
    * Probabilistic Relevance Framework: BM25 and Beyond" — public
    * literature; the idf uses the non-negative ln(1 + (N-df+0.5)/(df+0.5))
    * spelling popularized by Lucene). Query terms are SET-semantic
    * (duplicates in a query contribute once). Parameters arrive in
    * exact milli units so both engines derive bit-identical doubles
    * (k1 = k1Milli/1000.0 — the division, not a decimal literal, is
    * what both sides evaluate).
    *
    * Scale shape — the inverted-index join, not a scan per query:
    * per-doc term frequencies, doc lengths and document frequencies
    * are token-/doc-keyed aggregations over ONE corpus tokenization;
    * scoring joins the (model-sized per token) query-term table to the
    * tf postings BY TOKEN, so each query pays Σ_t df(t) candidate rows
    * — the classic postings-traversal cost — never |corpus| per query.
    * N and avgdl enter as in-plan scalar subqueries. The per-query
    * ranking window runs over that candidate set; `maxDocFreq` is the
    * stop-list contract for boilerplate terms (a term in more than
    * `cap` docs leaves the index — recall contract identical to the
    * dedup family's df-cap): at web scale an uncapped "the" would
    * drag the whole corpus into one query's window.
    *
    * Output: (qid, rank, doc, score) — rank 1..k per query, ranked by
    * ROUNDED score (4 dp) then doc id, so float last-ulp differences
    * can't reorder ranks across engines.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1Milli: Int = 1200, bMilli: Int = 750,
      maxDocFreq: Option[Long] = None): DataFrame =
    bm25FromPostings(postings(docs, idCol, textCol),
      queries, qidCol, qtextCol, k, k1Milli, bMilli, maxDocFreq)

  /** BM25 postings build — one `(doc, token, tf, len)` row per
    * distinct (document, term), `len` the document's token count.
    * The tokenize-once half of [[bm25TopK]], shared with the streaming
    * index ([[graft.streaming.Streaming.indexIngestBatch]] appends
    * exactly this frame as a store slice). One explode + two keyed
    * aggregations — corpus-linear.
    *
    * NULL-text documents produce NO posting rows (`explode` of a null
    * split drops the row) — they are unindexed, invisible to
    * retrieval, and excluded from N/avgdl ([[bm25FromPostings]]
    * derives both from the postings). EMPTY text is indexed: `split`
    * on "" yields [""], one empty-string term. */
  def postings(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = docs.select(col(idCol).as("doc"),
      explode(split(col(textCol), " ")).as("token"))
    val lens = tk.groupBy("doc").agg(count(lit(1)).as("len"))
    tk.groupBy("doc", "token").agg(count(lit(1)).as("tf"))
      .join(lens, "doc")
      .select(col("doc"), col("token"), col("tf"), col("len"))
  }

  /** Shared scalar-parameter validation — called by every entry point
    * BEFORE any corpus-sized work (tokenize, checkpoint, store scan),
    * so an invalid k refuses for free, and re-checked by [[bm25Score]]
    * as the last line of defense. */
  private[graft] def validateBm25Params(
      k: Int, k1Milli: Int, bMilli: Int): Unit = {
    require(k >= 1, "k must be positive")
    require(k1Milli >= 0 && k1Milli <= 1000000 &&
      bMilli >= 0 && bMilli <= 1000,
      "k1Milli must be in [0, 1000000] and bMilli in [0, 1000]")
  }

  /** THE query tokenizer — the ONE spelling of "a query text's terms"
    * (whitespace split, the exact tokenization [[postings]] applies to
    * documents), shared by [[bm25Score]]'s scoring join and every
    * pushdown/prefilter term set derived from a query frame
    * ([[graft.streaming.Streaming.bm25FromIndex]]'s static query-term
    * scan filter and its vocabulary-sidecar semi-join). One
    * definition, because the call sites must agree EXACTLY: a term
    * set tokenized differently from the scoring join would push away
    * postings rows the join still expects — silently zeroing those
    * terms' contributions — rather than fail. Callers alias the
    * exploded column themselves. */
  private[graft] def queryTokenCol(qtextCol: String): Column =
    explode(split(col(qtextCol), " "))

  /** [[bm25TopK]] scoring over a pre-built postings frame (the
    * [[postings]] shape) — N, df and avgdl all derive from the
    * postings alone, so a store-accumulated index scores without the
    * original texts. N is the INDEXED document count (docs with at
    * least one posting row): a NULL-text doc is unindexed and outside
    * the model — the oracle must count `len` rows, not raw corpus
    * rows, when the corpus can carry nulls.
    * Assumes one posting set per doc id — the streaming store path
    * guarantees it by superseding stale versions AT READ
    * ([[graft.streaming.Streaming.bm25FromIndex]]); a caller handing
    * this a frame with duplicate doc versions inflates df/len.
    *
    * `observeCandidates`: when set, the pre-ranking candidate frame
    * (the qt ⨝ df ⨝ tf join output — exactly Σ_t∈queries df(t) rows)
    * carries a named observed metric `candidate_rows`, aggregated by
    * the plan during the action at zero extra passes
    * ([[graft.operators.Metrics]]'s observe discipline) — the
    * store-backed uncapped path uses it to make the stop-list
    * decision's cost visible.
    *
    * The incoming frame is eagerly checkpointed: scoring consumes it
    * through FOUR distinct subtrees (the tf join, the df aggregate,
    * and the N/avgdl scalar subqueries over the doc-length ledger) —
    * without the materialization each one re-runs the full upstream
    * lineage (for [[bm25TopK]], a corpus re-tokenization apiece). */
  def bm25FromPostings(
      postings: DataFrame,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1Milli: Int = 1200, bMilli: Int = 750,
      maxDocFreq: Option[Long] = None,
      observeCandidates: Option[String] = None): DataFrame = {
    validateBm25Params(k, k1Milli, bMilli)
    // token IS NULL rows are the streaming store's null-text
    // TOMBSTONES (see Streaming.indexIngestBatch) — never postings
    val tf = postings.select(
      col("doc"), col("token"), col("tf"), col("len"))
      .filter(col("token").isNotNull)
      .localCheckpoint(true)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val lens = tf.groupBy("doc").agg(max(col("len")).as("len"))
    // ONE struct-valued scalar subquery for (N, avgdl) instead of two:
    // each Scalars.of is its own subquery job and its own pass over
    // the length ledger — folding them halves that serial latency on
    // every retrieval query (the q201 quartile-scalar finding)
    val stats = graft.plans.Scalars.of(
      lens.agg(count(lit(1)).as("n"), avg(col("len")).as("a"))
        .select(struct(col("n"), col("a")).as("s")))
    bm25Score(tf, dfreq, stats.getField("n"), stats.getField("a"),
      queries, qidCol, qtextCol,
      k, k1Milli, bMilli, maxDocFreq, observeCandidates)
  }

  /** The BM25 scoring tail shared by [[bm25FromPostings]] (which
    * derives df/N/avgdl from the postings, above) and the streaming
    * store's sidecar-backed query path
    * ([[graft.streaming.Streaming.bm25FromIndex]], which supplies
    * them precomputed and supersede-consistent so query cost is
    * candidate-bounded): join the query terms to the df table, then
    * to the tf postings BY TOKEN, score, rank.
    *
    * Contracts: `tf` must be tombstone-free-or-filterable (a
    * `token IS NOT NULL` guard is applied here) with ONE version per
    * doc; `dfreq` is `(token, df)` UNCAPPED (the `maxDocFreq` cut is
    * applied here so the cap semantics can never diverge between
    * callers); `n`/`avgdl` are scalar Columns (in-plan scalar
    * subqueries or literals). `tf` is consumed EXACTLY ONCE (the
    * candidate join) — single-consumer, so the CALLER decides the
    * materialization policy: [[bm25FromPostings]] checkpoints because
    * its derivation consumes the input through four subtrees; the
    * sidecar path must NOT checkpoint a corpus-sized store scan per
    * query. */
  private[graft] def bm25Score(
      tf: DataFrame, dfreq: DataFrame, n: Column, avgdl: Column,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1Milli: Int, bMilli: Int,
      maxDocFreq: Option[Long],
      observeCandidates: Option[String]): DataFrame = {
    validateBm25Params(k, k1Milli, bMilli)
    import org.apache.spark.sql.expressions.Window
    val k1 = lit(k1Milli).cast("double") / lit(1000.0)
    val k1p1 = lit(k1Milli + 1000).cast("double") / lit(1000.0)
    val oneMinusB = lit(1000 - bMilli).cast("double") / lit(1000.0)
    val b = lit(bMilli).cast("double") / lit(1000.0)
    val dfCapped =
      maxDocFreq.fold(dfreq)(c => dfreq.filter(col("df") <= c))
    val qt = queries.select(col(qidCol).as("qid"),
      queryTokenCol(qtextCol).as("token")).distinct()
    val idf = log(lit(1.0) +
      (n.cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + k1 *
      (oneMinusB + b * col("len").cast("double") / avgdl.cast("double"))
    // df BEFORE postings: the vocabulary-sized (and stop-list-capped)
    // df table cuts a capped stopword's candidates before its
    // corpus-dense posting rows ever enter a join — the other order
    // shuffles them per query just to drop them at the df join
    val cand0 = qt.join(dfCapped, "token")
      .join(tf.filter(col("token").isNotNull), "token")
    val cand = observeCandidates.fold(cand0)(name =>
      cand0.observe(name, count(lit(1)).as("candidate_rows")))
    cand
      .select(col("qid"), col("doc"),
        (idf * (col("tf") * k1p1) / norm).as("w"))
      .groupBy("qid", "doc")
      .agg(round(sum(col("w")), 4).as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("qid")
        .orderBy(col("score").desc, col("doc"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("doc"), col("score"))
  }
}
