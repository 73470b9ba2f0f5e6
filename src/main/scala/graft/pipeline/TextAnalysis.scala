package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure Column expressions over built-ins — no UDFs, fully codegen'd,
  * embarrassingly parallel (no shuffle): the per-row cost is what you pay at
  * 100 TB and nothing else.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword proxy: letter runs, digit runs, and single punctuation
    * marks each count as one token (a deterministic stand-in for a trained
    * BPE vocab; the plumbing and cost profile are identical). */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]"), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  def charCount(c: Column): Column = length(c)

  /** Share of characters that are punctuation. */
  def punctRatio(c: Column): Column = {
    val n = length(c)
    when(n === 0, lit(0.0)).otherwise(
      (n - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double") / n)
  }

  /** Share of tokens found in `words` (lowercased match). */
  def wordHitRatio(c: Column, words: Seq[String]): Column = {
    val t = tokens(lower(c))
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, x => x.isin(words: _*))).cast("double") / size(t))
  }

  def meanTokenLen(c: Column): Column = {
    val nt = tokenCount(c)
    when(nt === 0, lit(0.0)).otherwise(
      length(regexp_replace(trim(c), "\\s+", "")).cast("double") / nt)
  }

  /** English-ish stopwords for quality scoring. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "or", "is",
    "are", "in", "on", "to", "for", "with", "as", "by", "at", "it", "this", "that")

  /** Demo subword vocab for greedy longest-match segmentation
    * ([[graft.functions.SegmentExprs.greedyPieces]]): frequent English
    * bigrams/trigrams/affixes — a deterministic stand-in for a learned
    * WordPiece/BPE vocab (single characters need no entries; the kernel's
    * char fallback covers them losslessly). */
  val PieceVocab: Seq[String] = Seq(
    "the", "ing", "and", "ion", "tion", "ent", "ati", "for", "her", "ter",
    "ers", "est", "ght", "oun", "ould", "ight",
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur")

  /** Heuristic document quality in [0,1]: length saturation, punctuation
    * moderation, stopword presence, sane mean word length. Deterministic and
    * SQL-mirrorable (each term is arithmetic over the metrics above). */
  def qualityScore(c: Column): Column =
    // one native text pass ([[graft.functions.TextQualityScore]]) instead
    // of the composed ~6 passes per row (three regex splits, two full-text
    // regexp_replace, one interpreted filter+isin over every token —
    // measured as the dominant cost of the q25/q53/q67 tier). The kernel
    // returns the unrounded score with the composed form's exact IEEE
    // arithmetic shape (spec-pinned equal to [[qualityScoreComposed]]);
    // Spark's round keeps the final HALF_UP identical.
    round(graft.functions.SketchExprs.textQualityScore(c, Stopwords), 6)

  /** Composed built-in form of [[qualityScore]] — reference semantics,
    * kept as the spec-pinned equivalence oracle for the native kernel
    * (the [[langIdComposed]] discipline). */
  def qualityScoreComposed(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / 50.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    val stopScore = least(wordHitRatio(c, Stopwords) * 5.0, lit(1.0))
    val mtl = meanTokenLen(c)
    val wordScore = when(mtl >= 2.5 && mtl <= 12.0, lit(1.0)).otherwise(lit(0.0))
    round(lenScore * 0.3 + punctScore * 0.2 + stopScore * 0.3 + wordScore * 0.2, 6)
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Extend freely; ties resolve alphabetically. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "für"),
    "en" -> Seq("the", "a", "of", "and", "is", "in", "to", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "有", "我", "不", "这", "他", "们"))

  /** Language ID: argmax of per-language stopword hits; "und" (undetermined)
    * when no profile matches; ties break to the alphabetically first code.
    * Native single tokenize-and-tally pass ([[graft.functions.LangIdArgmax]])
    * — the composed form below ran one interpreted `filter`/`isin` array
    * pass per profile per row. Same semantics, spec-pinned equal. */
  def langId(c: Column, profiles: Seq[(String, Seq[String])] = LangProfiles): Column =
    graft.functions.SketchExprs.langIdArgmax(c, profiles)

  /** Composed built-in form of [[langId]] (sort_array on (-hits, lang)
    * structs) — reference semantics, kept as the spec-pinned equivalence
    * oracle for the native kernel. */
  def langIdComposed(c: Column, profiles: Seq[(String, Seq[String])] = LangProfiles): Column = {
    val t = tokens(lower(c))
    val scored = array(profiles.map { case (lang, words) =>
      struct(
        (-size(filter(t, x => x.isin(words: _*)))).as("neg_hits"),
        lit(lang).as("lang"))
    }: _*)
    val best = sort_array(scored).getItem(0)
    when(best.getField("neg_hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Canonical whitespace/case-normalized form used by fingerprints. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact-dedup document fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Shannon entropy (nats) of the character distribution of the
    * normalized text — a cheap perplexity proxy: natural prose scores
    * high, degenerate repetition scores low (a complement to the token-
    * level repetition filters in [[Curation]]). Row-local, zero shuffle:
    * sort the char array once, then ONE run-length fold accumulating
    * Σ n·ln n via the telescoping identity m·ln m − (m−1)·ln(m−1), so
    * H = ln N − (Σ n·ln n)/N without materializing per-char counts.
    * Rounded to 6 dp — ln can differ in the last ulp across libm
    * implementations, and 1e-6 is far above that. Empty text scores 0. */
  def charEntropy(c: Column): Column = {
    val chars = array_sort(filter(split(normalized(c), ""), ch => ch =!= ""))
    val n = size(chars)
    val folded = aggregate(chars,
      struct(lit("").as("cur"), lit(0L).as("m"), lit(0.0).as("acc")),
      (st, ch) => {
        val m = when(ch === st.getField("cur"), st.getField("m") + 1L)
          .otherwise(lit(1L))
        val delta = when(m > 1L,
          m.cast("double") * log(m.cast("double")) -
            (m - 1L).cast("double") * log((m - 1L).cast("double")))
          .otherwise(lit(0.0))
        struct(ch.as("cur"), m.as("m"), (st.getField("acc") + delta).as("acc"))
      },
      st => st.getField("acc"))
    when(n === 0, lit(0.0))
      .otherwise(round(log(n.cast("double")) - folded / n, 6))
  }

  /** Corpus-relative term relevance: the top-`k` terms of each document by
    * tf·idf, where idf is the RATIONAL inverse document frequency
    * `(N+1)/(df+1)` — deliberately log-free, so every score is a product
    * of exactly-representable integers and one IEEE division: bit-identical
    * in any engine (a log-based idf can differ by an ulp between libm
    * implementations and flip the ordering at the top-k boundary). Ties
    * break to the lexicographically smaller term.
    *
    * 100 TB shape: one explode feeding a map-side-combinable (doc, term)
    * count; the document-frequency aggregate is VOCABULARY-sized and
    * re-joins the tf relation on the term key (Catalyst broadcasts it when
    * small; at web scale it's a co-keyed shuffle join on term — never on
    * text); the corpus count crossJoins as a broadcast scalar. Document
    * text never shuffles — only (doc_id, term, tf). */
  /** BM25 retrieval scoring against a FIXED query-term list (Robertson/
    * Spärck Jones; k1/b the standard Okapi defaults) — the ranking function
    * a corpus-curation "find me documents about X" pass actually uses,
    * where q60's raw TF-IDF over-rewards long repetitive documents.
    *
    * Determinism/scale contract: per-term tf is a row-local
    * `size(filter(tokens))` projection (terms are a FIXED small list — no
    * (doc, term) explode, no term-keyed shuffle); N/avgdl/df come from one
    * scalar aggregate broadcast back (df per term rides the same aggregate
    * as conditional sums); the score is a fixed-shape IEEE sum over the
    * term list IN LIST ORDER, so both engines add identical doubles in
    * identical order. Output: (id, score 6dp), top `k` by
    * (score desc, id). */
  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 16, "1..16 query terms")
    require(k > 0)
    val toks = tokens(lower(col(textCol)))
    val base = docs.select(col(idCol), toks.as("__t"))
      .withColumn("__dl", size(col("__t")))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(col("__t"), x => x === t)).as(s"__tf$i")
    }
    val withTf = base.select(Seq(col(idCol), col("__dl")) ++ tfCols: _*)
    val statAggs = Seq(count(lit(1)).as("__n"),
      (sum(col("__dl").cast("decimal(18,0)")).cast("double") /
        count(lit(1)).cast("double")).as("__avgdl")) ++
      queryTerms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = queryTerms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val idf = log(lit(1.0) + (col("__n").cast("double") -
        col(s"__df$i").cast("double") + lit(0.5)) /
        (col(s"__df$i").cast("double") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) / (tf + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("__dl").cast("double") / col("__avgdl")))
    }.reduce(_ + _)
    scored.select(col(idCol), score.as("__s"))
      .orderBy(col("__s").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("__s"), 6).as("score"))
  }

  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k > 0)
    // deliberate two-aggregate shape: the doc-frequency side re-aggregates
    // a PRUNED (keys-only) copy of the (doc, term) relation — Catalyst's
    // column pruning makes the recompute cheaper than the full tf pass, and
    // both aggregates partial-combine map-side. The tempting single-pass
    // alternative (count().over(Window.partitionBy(term))) is a skew trap:
    // a stopword's window partition at web scale is billions of rows in ONE
    // task, where the aggregate form combines before the wire.
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score"))
  }

  /** Corpus-relative threshold filter: keep rows whose `valueCol` is at or
    * above the corpus's exact interpolated `p`-quantile (adaptive quality
    * gating — "drop the worst quartile" instead of a hand-picked constant).
    * The quantile is ONE global aggregate (Spark's exact `percentile`,
    * ≡ DuckDB `quantile_cont`, both R-7 interpolation) that crossJoins back
    * as a broadcast scalar — no sort of the corpus, no window; the filter
    * itself is row-local. The threshold rides along as `thresholdCol`.
    *
    * MEMORY CONTRACT — bounded DISTINCT-value cardinality, not row count:
    * Spark's exact `percentile` buffers a value→count map that merges into
    * the one final aggregation task, so its state scales with the number
    * of distinct `valueCol` values, never with rows. Feed it quantized
    * scores (a 6-dp-rounded quality in [0,1] is ≤ 1e6 entries ≈ a few MB
    * — fine at any corpus size); raw unbounded doubles at 100 TB would
    * concentrate billions of map entries in that single task. For
    * unquantized values use [[approxAboveQuantile]]. */
  def aboveQuantile(df: DataFrame, valueCol: String, p: Double,
                    thresholdCol: String = "threshold"): DataFrame = {
    require(p > 0.0 && p < 1.0)
    val thr = df.agg(expr(s"percentile($valueCol, $p)").as(thresholdCol))
    df.crossJoin(broadcast(thr))
      .filter(col(valueCol) >= col(thresholdCol))
  }

  /** [[aboveQuantile]] with a BOUNDED-MEMORY sketch threshold: the
    * Greenwald-Khanna `percentile_approx` summary holds O(accuracy)
    * entries regardless of value cardinality, so this is the variant for
    * unquantized scores (log-perplexities, raw model outputs) at corpus
    * scale. The threshold is an actual data value whose rank differs from
    * the true `p`-quantile by at most `n / accuracy` rows (the gate keeps
    * at most that many rows more or fewer than the exact variant); the
    * sketch's merge order varies run to run, so unlike the exact variant
    * the kept SET near the boundary is tolerance-stable, not bit-stable —
    * oracle-check it q43-style (each engine's sketch against its own exact
    * value), never by row hash. */
  def approxAboveQuantile(df: DataFrame, valueCol: String, p: Double,
                          accuracy: Int = 10000,
                          thresholdCol: String = "threshold"): DataFrame = {
    require(p > 0.0 && p < 1.0)
    require(accuracy > 0)
    val thr = df.agg(
      percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(thresholdCol))
    df.crossJoin(broadcast(thr))
      .filter(col(valueCol) >= col(thresholdCol))
  }

  /** Sentences of a text column: split on terminal punctuation runs
    * followed by whitespace, trailing punctuation trimmed, blanks dropped.
    * Deliberately RE2-compatible (no lookbehind — the pattern that would
    * keep the punctuation attached needs one), so the DuckDB oracle splits
    * identically; the terminal mark is normalized away on BOTH sides,
    * which is what sentence-level dedup wants anyway (same sentence, "!"
    * vs "." — one identity). Row-local.
    *
    * CCNet-style sentence-level corpus dedup is the composition: explode
    * these, hash, count across the corpus, strip frequent ones — exactly
    * [[Curation.dedupLines]] with sentences in place of lines. */
  def sentences(c: Column): Column =
    filter(transform(split(c, "[.!?]+\\s+"),
      s => trim(regexp_replace(s, "[.!?]+\\s*$", ""))), s => s =!= "")

  /** Corpus vocabulary with coverage: the `topV` most frequent lowercased
    * whitespace tokens, each with its count and the CUMULATIVE fraction of
    * all corpus token occurrences covered through that rank — the curve a
    * tokenizer-training pipeline reads to pick a vocab size ("64k tokens
    * cover 99.2%"). Ordering is total and deterministic: count DESC, token
    * ASC, both in the top-V cutoff and in the rank window.
    *
    * 100 TB shape: the token count is one map-side-combinable aggregate
    * (the only full-corpus shuffle, keyed on the token) and the corpus
    * scans ONCE — the total-occurrence denominator aggregates the same
    * count relation, so Catalyst reuses the token-keyed exchange instead
    * of re-scanning the corpus (an earlier row-local `sum(size(tokens))`
    * total was semantically identical but cost a second full scan); the
    * top-V cutoff is TakeOrdered (no global sort); and the cumulative
    * window runs over EXACTLY topV rows — a bounded parameter, so its
    * single partition is by construction small, never vocab-sized. */
  def vocabulary(docs: DataFrame, textCol: String, topV: Int,
                 minCount: Long = 1L): DataFrame = {
    require(topV > 0 && minCount >= 1)
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    val counts = docs.select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    val top = counts.filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("token").asc).limit(topV)
    val w = Window.orderBy(col("n").desc, col("token").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("coverage",
        round(sum(col("n")).over(w) / col("__total"), 6))
      .select(col("rank"), col("token"), col("n"), col("coverage"))
  }

  /** TextRank keywords: damped PageRank over the token co-occurrence
    * graph (Mihalcea & Tarau '04) — the graph-centrality keyword extractor
    * complementing frequency ([[vocabulary]]), tf-idf, and RAKE. Edges are
    * the DISTINCT ±`window` skip-gram pairs ([[skipGramPairs]] — already
    * symmetric by construction, self-loops dropped), ranks come verbatim
    * from [[Graph.pageRank]]'s integer micro-unit fixed point — so the
    * whole composition inherits both components' determinism AND their
    * scale contracts (vocab²-bounded edge relation, |V|-row rank state,
    * checkpointed rounds). Returns top-k (token, rank_micro, rank), ties
    * to the lexicographically first token. */
  def textRankKeywords(docs: DataFrame, textCol: String, window: Int = 2,
                       iters: Int = 3, k: Int = 15): DataFrame = {
    require(k >= 1)
    val edges = skipGramPairs(docs, textCol, window)
      .filter(col("center") =!= col("context"))
      .select(col("center").as("src"), col("context").as("dst"))
    Graph.pageRank(edges, "src", "dst", iters)
      .orderBy(col("rank_micro").desc, col("node").asc).limit(k)
      .select(col("node").as("token"), col("rank_micro"), col("rank"))
  }

  /** Per-group top-k vocabulary — [[vocabulary]] at group grain (the
    * per-source/per-language term signature; its diff across groups is the
    * mixture-drift view [[jsDivergence]] scores as one number). One
    * combinable (group, token) count — tokens shuffle once — then a
    * group-partitioned rank window over the per-group vocabulary relation
    * (the q118 discipline: vocab-sized, never the corpus). Ties break
    * (count DESC, token ASC), a total order. Returns
    * (groupCol, rank, token, n). */
  def vocabularyByGroup(docs: DataFrame, groupCol: String, textCol: String,
                        topK: Int): DataFrame = {
    require(topK > 0)
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    val counts = docs
      .select(col(groupCol).as("__g"), explode(toks).as("token"))
      .groupBy("__g", "token").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("n").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("__g").as(groupCol), col("rank"), col("token"), col("n"))
  }

  /** Zipf's-law fit over the top-`topV` vocabulary: the OLS line of
    * ln(count) against ln(rank) — slope ≈ −1 is the healthy-corpus
    * signature; flatter tails flag templated/duplicated text. Composes
    * [[vocabulary]] (token-keyed aggregate + TakeOrdered cutoff) with
    * [[Stats.linearFit]] over the topV-bounded rank relation — the
    * regression input never exceeds `topV` rows whatever the corpus size.
    * The ln calls are the q95 PMI precedent: sub-ulp libm differences
    * vanish under the 6dp round. Returns one row: (n, slope, intercept,
    * r2). */
  def zipfFit(docs: DataFrame, textCol: String, topV: Int): DataFrame =
    Stats.linearFit(vocabulary(docs, textCol, topV), Seq.empty,
      log(col("rank").cast("double")), log(col("n").cast("double")))

  /** Bigram collocations by pointwise mutual information: for every adjacent
    * token pair (w1, w2) occurring at least `minCount` times,
    * pmi = ln p(w1,w2) − ln p(w1) − ln p(w2), with p(w1,w2) over the bigram
    * total and p(w) over the unigram total. The classic collocation score
    * (Church & Hanks 1990) — the corpus-statistics companion to
    * [[vocabulary]], used to mine multi-word expressions before tokenizer
    * training.
    *
    * Counts are exact integers; the score is the fixed ln-sum shape
    * `ln c_xy + 2·ln N_uni − ln N_bi − ln c_x − ln c_y` rounded to 6dp (the
    * q61 libm discipline). Plan shape: one explode+groupBy per relation
    * (map-side partial aggs), then two joins of the (already minCount-
    * filtered) bigram relation to the unigram counts on the word — co-keyed
    * hash joins that broadcast when the vocabulary is small; the scalar
    * totals broadcast always. No windows, no driver loops — survives a
    * trillion-token corpus where the vocab, not the corpus, bounds state.
    */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long = 5L): DataFrame = {
    require(minCount >= 1)
    val toks = tokens(col(textCol))
    val uni = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("__c"))
    val totals = uni.agg(sum(col("__c")).as("__nu"))
    val pairs = docs.select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val nb = pairs.agg(count(lit(1)).as("__nb"))
    bi.filter(col("c_xy") >= minCount)
      .join(uni.select(col("w").as("w1"), col("__c").as("c_x")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("__c").as("c_y")), Seq("w2"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c_xy"),
        round(log(col("c_xy").cast("double"))
          + lit(2.0) * log(col("__nu").cast("double"))
          - log(col("__nb").cast("double"))
          - log(col("c_x").cast("double"))
          - log(col("c_y").cast("double")), 6).as("pmi"))
  }

  /** Adjacent character-pair counts over the lowercased corpus — the first
    * BPE merge-candidate table of tokenizer training. Pairs materialize
    * row-locally (substr over an index sequence), cross-word pairs (any
    * containing a space) are dropped, and the result is the k heaviest
    * pairs with a pair-text tiebreak (TakeOrdered cutoff, no global sort).
    * State bounds at the alphabet², never the corpus.
    */
  def bytePairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0)
    // materialize the lowercased string BEFORE the per-index transform:
    // higher-order functions are not codegen'd, so an inline lower(text)
    // would re-evaluate once per index — O(len²) per document
    val s = col("__s")
    val pairs = when(length(s) >= 2,
      transform(sequence(lit(1), length(s) - 1), i => s.substr(i, lit(2))))
      .otherwise(array())
    // fan the projected text out before the O(len) per-row transform —
    // a single-row-group scan plans one task (guide §2.5; r15, see
    // Ops.fanoutScan); the pair aggregate reduces to alphabet² AFTER the
    // heavy map work, so the early exchange ships only the text column
    graft.operators.Ops.fanoutScan(docs.select(lower(col(textCol)).as("__s")))
      .select(explode(pairs).as("pair"))
      .filter(!col("pair").contains(" ") && length(col("pair")) === 2)
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc).limit(k)
  }

  /** Skip-gram (center, context) pair counts within ±`window` token
    * positions — word2vec-style training-pair extraction. The pair list
    * materializes ROW-LOCALLY (nested transform + bounds filter), so only
    * (center, context) structs ever explode; the token array is never
    * duplicated across the fan-out. One pair-keyed combinable aggregate;
    * state bounds at the vocab², not the corpus.
    */
  def skipGramPairs(docs: DataFrame, textCol: String, window: Int = 2,
                    minCount: Long = 1L): DataFrame = {
    require(window >= 1 && minCount >= 1)
    // materialize the token array BEFORE the positional transform: HOF
    // lambdas are not codegen'd, so an inline tokens(text) would re-split
    // the document once per element_at — O(n²·len) per document
    val toks = col("__t")
    val offs = array((-window to window).filter(_ != 0).map(o => lit(o)): _*)
    val n = size(toks)
    val pairs = flatten(transform(sequence(lit(1), n), i =>
      filter(transform(offs, o =>
        when((i + o) >= 1 && (i + o) <= n,
          struct(element_at(toks, i).as("center"),
            element_at(toks, i + o).as("context")))),
        p => p.isNotNull)))
    // fanout before the O(n·window) interpreted pair transform (r15, see
    // bytePairCounts note)
    graft.operators.Ops.fanoutScan(docs.select(tokens(col(textCol)).as("__t")))
      .select(explode(pairs).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
      .groupBy("center", "context").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }


  /** Pairwise vocabulary Jaccard between groups (sources, shards, crawls):
    * the distinct (group, token) relation self-joins co-keyed on the token,
    * group sizes join back, jaccard = |∩| / (|A| + |B| − |∩|) rounded 6dp.
    * State bounds at groups × vocab; token text is the join key only after
    * the distinct collapse, so the corpus shuffles once at (group, token)
    * grain. */
  def vocabOverlap(docs: DataFrame, groupCol: String,
                   textCol: String): DataFrame = {
    val b = docs.select(col(groupCol).as("__g"),
        explode(tokens(lower(col(textCol)))).as("__w")).distinct()
    val sizes = b.groupBy("__g").agg(count(lit(1)).as("__n"))
    val pairs = b.join(b.select(col("__g").as("__g2"), col("__w")), Seq("__w"))
      .filter(col("__g") < col("__g2"))
      .groupBy(col("__g").as("src_a"), col("__g2").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("__g").as("src_a"), col("__n").as("__na")), Seq("src_a"))
      .join(sizes.select(col("__g").as("src_b"), col("__n").as("__nb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        round(col("n_common") /
          (col("__na") + col("__nb") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Rolling-hash content fingerprint: minimum 64-bit hash over character
    * `k`-shingles of the normalized text (winnowing-style min-sampling; two
    * docs sharing it are near-dup candidates). */
  def rollingFingerprint(c: Column, k: Int = 16): Column = {
    val s = normalized(c)
    val n = length(s)
    val starts = sequence(lit(1), greatest(n - (k - 1), lit(1)))
    array_min(transform(starts, i => xxhash64(s.substr(i, lit(k)))))
  }

  // ------------------------------------------------------------- readability
  /** Syllable proxy: vowel-group count ([aeiouy]+ runs in the lowercased
    * text) — the standard cheap estimator readability formulas run on when
    * no dictionary is at hand. Pure regex tally, identical RE2-safe pattern
    * in any engine. */
  def syllableCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[aeiouy]+"), lit(0)))

  /** Sentence-terminator runs ([.!?]+), floored at 1 so un-punctuated text
    * counts as one sentence (the Flesch convention for fragments). */
  def sentenceCount(c: Column): Column =
    greatest(size(regexp_extract_all(c, lit("[.!?]+"), lit(0))), lit(1))

  /** Flesch reading ease over the whitespace-token / vowel-group / terminal-
    * punctuation proxies: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words). Row-local, zero shuffle — the score is the
    * classic curation gate ("drop reading-ease < 0" catches boilerplate and
    * token salad). Empty text scores NULL. Fixed-shape IEEE arithmetic on
    * exact integer tallies, rounded 6dp — engine-independent. */
  def fleschReadingEase(c: Column): Column = {
    val w = tokenCount(c).cast("double")
    val s = sentenceCount(c).cast("double")
    val sy = syllableCount(c).cast("double")
    when(tokenCount(c) === 0, lit(null))
      .otherwise(round(lit(206.835) - lit(1.015) * (w / s) -
        lit(84.6) * (sy / w), 6))
  }

  /** Flesch–Kincaid grade level on the same proxies:
    * 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59. */
  def fleschKincaidGrade(c: Column): Column = {
    val w = tokenCount(c).cast("double")
    val s = sentenceCount(c).cast("double")
    val sy = syllableCount(c).cast("double")
    when(tokenCount(c) === 0, lit(null))
      .otherwise(round(lit(0.39) * (w / s) + lit(11.8) * (sy / w) -
        lit(15.59), 6))
  }

  /** Letter tally ([A-Za-z]) — Coleman–Liau's character proxy. */
  def letterCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]"), lit(0)))

  /** Complex-word tally: whitespace tokens with ≥ 3 vowel groups (the
    * polysyllable proxy Gunning fog and SMOG run on). Row-local
    * higher-order filter over the token array — identical RE2-safe
    * pattern in any engine. */
  def complexWordCount(c: Column): Column =
    size(filter(tokens(lower(c)), t =>
      size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))) >= 3))

  /** Coleman–Liau index on character proxies (Coleman & Liau 1975):
    * 0.0588·L − 0.296·S − 15.8 with L = letters and S = sentences per
    * 100 words — the readability formula that needs no syllable guess
    * at all. Empty text scores NULL; fixed IEEE on integer tallies,
    * 6dp. */
  def colemanLiau(c: Column): Column = {
    val w = tokenCount(c).cast("double")
    when(tokenCount(c) === 0, lit(null))
      .otherwise(round(
        lit(0.0588) * (letterCount(c).cast("double") * 100.0 / w) -
          lit(0.296) * (sentenceCount(c).cast("double") * 100.0 / w) -
          lit(15.8), 6))
  }

  /** Gunning fog index (Gunning 1952):
    * 0.4·(words/sentences + 100·complex/words). */
  def gunningFog(c: Column): Column = {
    val w = tokenCount(c).cast("double")
    val s = sentenceCount(c).cast("double")
    when(tokenCount(c) === 0, lit(null))
      .otherwise(round(lit(0.4) * (w / s +
        lit(100.0) * complexWordCount(c).cast("double") / w), 6))
  }

  /** SMOG grade (McLaughlin 1969):
    * 1.0430·√(complex·30/sentences) + 3.1291. */
  def smogIndex(c: Column): Column = {
    when(tokenCount(c) === 0, lit(null))
      .otherwise(round(lit(1.0430) *
        sqrt(complexWordCount(c).cast("double") * 30.0 /
          sentenceCount(c).cast("double")) + lit(3.1291), 6))
  }

  // ---------------------------------------------------------- inverted index
  /** Capped inverted index: one row per term with its document frequency and
    * the first `k` posting doc ids (ascending, comma-joined) — the retrieval
    * /-debugging side table a corpus pipeline publishes next to the corpus
    * ("which docs say X"). Terms above `maxDf` are dropped as stopword-grade
    * (and it is `maxDf` that BOUNDS the per-term aggregation state — without
    * the cap a stopword's posting set would be the corpus); singletons stay.
    *
    * One distinct over (term, doc) grain, one term-keyed aggregate whose
    * collect_set is bounded by `maxDf` (enforced by counting FIRST and
    * semi-filtering, so oversized sets never materialize), postings sorted
    * and sliced inside the row. Document text never shuffles — only
    * (term, id) pairs. Returns (term, df, postings). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxDf: Int, k: Int): DataFrame = {
    require(maxDf >= 1 && k >= 1, s"bad bounds: maxDf=$maxDf k=$k")
    val pairs = docs.select(col(idCol).as("__id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "").distinct()
    val dfs = pairs.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    pairs.join(dfs, Seq("term"))
      .groupBy("term").agg(first(col("df")).as("df"),
        array_join(transform(slice(array_sort(collect_set(col("__id"))), 1, k),
          _.cast("string")), ",").as("postings"))
  }

  // ------------------------------------------------------- keyword extraction
  /** RAKE keyword scores (Rose et al. 2010) over the corpus: candidate
    * phrases are the maximal stopword-free word runs (text lowercased,
    * non-letters collapsed to spaces, stopwords acting as delimiters); for
    * each word, freq = occurrences across phrases, degree = Σ |phrase| over
    * its phrases (co-occurrence counting itself), score = degree / freq —
    * the word-level relation phrase scoring sums over. Degree and freq are
    * exact integers; the score is ONE IEEE division, 6dp-rounded.
    *
    * 100 TB shape: phrase segmentation is row-local string work — ONE
    * word-boundary alternation pass `\b(sw1|sw2|…)\b` over the cleaned
    * text (the `\b…\b` anchors make exactly one alternative viable per
    * word, so Java and RE2 agree on every match span; a per-stopword
    * replace chain would re-scan the text |stopwords| times); the only
    * shuffle is the word-keyed aggregate.
    * Returns (word, freq, degree, score). */
  def rakeKeywords(docs: DataFrame, textCol: String,
                   stopwords: Seq[String] = RakeStopwords): DataFrame = {
    require(stopwords.nonEmpty && stopwords.forall(_.matches("[a-z]+")),
      "stopwords must be lowercase ascii words")
    val cleaned = regexp_replace(lower(col(textCol)), "[^a-z]+", " ")
    val delim = regexp_replace(cleaned,
      s"\\b(${stopwords.mkString("|")})\\b", "|")
    val phrases = docs
      .select(explode(split(delim, "[|]+")).as("__p"))
      .select(split(trim(col("__p")), " +").as("__ws"))
      .filter(size(col("__ws")) >= 1 && col("__ws").getItem(0) =!= "")
    phrases
      .select(size(col("__ws")).as("__len"), explode(col("__ws")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"), sum(col("__len")).as("degree"))
      .select(col("word"), col("freq"), col("degree"),
        round(col("degree").cast("double") / col("freq").cast("double"), 6)
          .as("score"))
  }

  /** The fixed default stopword list [[rakeKeywords]] delimits on — small
    * on purpose (the oracle mirrors it literally). */
  val RakeStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "from", "that", "this", "it",
    "be", "not")

  // ------------------------------------------- LM-perplexity quality score
  /** CCNet-style perplexity filtering, self-trained: score every document
    * by the average negative log-likelihood of its word bigrams under an
    * add-one-smoothed bigram LM fit on THE CORPUS ITSELF —
    * p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V). High avg-NLL = improbable
    * word sequences (gibberish, boilerplate soup); the filter drops the
    * tail. (CCNet uses a pretrained KenLM; the counts-based model here is
    * the same mechanism with a corpus-derived table, which also makes it
    * fully oracle-checkable.)
    *
    * Scale: the bigram-count relation is vocab²-bounded and joins
    * co-keyed on the bigram; the first-token totals derive from the SAME
    * relation (one more aggregate, vocab-bounded); V is one scalar
    * broadcast. DETERMINISM: each ln term is cast DECIMAL(28,12) at the
    * source (the q194 discipline), so the per-doc sum is exact and
    * shuffle-order-independent; the one IEEE division comes last, 6dp.
    * Docs with fewer than two tokens report null. Returns
    * (idCol, n_bigrams, avg_nll). */
  def lmPerplexityScore(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val base = docs.select(col(idCol).as("__id"), toks.as("__tk"))
    val uni = base.select(explode(col("__tk")).as("__w"))
    val vocab = uni.agg(countDistinct(col("__w")).as("__V"))
    val bi = base.filter(size(col("__tk")) >= 2)
      .select(col("__id"), explode(zip_with(
        slice(col("__tk"), lit(1), size(col("__tk")) - 1),
        slice(col("__tk"), lit(2), size(col("__tk")) - 1),
        (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("bg"))))
        .as("__p"))
      .select(col("__id"), col("__p.w1").as("__w1"), col("__p.bg").as("__bg"))
    val c2 = bi.groupBy(col("__bg")).agg(count(lit(1)).as("__c2"))
    val c1 = c2.select(split(col("__bg"), " ").getItem(0).as("__w1"),
        col("__c2"))
      .groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1"))
    val term = ln((col("__c2") + 1).cast("double") /
        (col("__c1") + col("__V")).cast("double"))
      .cast(DecimalType(28, 12))
    bi.join(c2, "__bg").join(c1, "__w1").crossJoin(broadcast(vocab))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round((-sum(term)).cast("double") / count(lit(1)), 6).as("avg_nll"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
  }

  // ------------------------------------- Jensen–Shannon corpus divergence
  /** Jensen–Shannon divergence between the token distributions of two
    * slices of a corpus (two sources, two crawl snapshots, train vs eval) —
    * the symmetric, bounded (≤ ln 2) distribution-shift score used for
    * mixture monitoring. JSD(P,Q) = ½ΣP ln(P/M) + ½ΣQ ln(Q/M) with
    * M = (P+Q)/2; a token absent from one side contributes only the other
    * side's term (its own is zero by limit), so no smoothing is needed —
    * unlike KL, JSD is finite by construction.
    *
    * Determinism: counts are exact integers from one combinable
    * (token × side) aggregate (bounded by the vocabulary — the corpus
    * shuffles its TOKENS once, never its rows); P, Q, M are fixed-shape
    * IEEE ratios of those counts; each ln term casts DECIMAL(28,12) at the
    * source (q228 discipline) so the vocabulary-sized sum is exact under
    * any merge order; one 6dp round finishes. Returns one row:
    * (n_tokens_a, n_tokens_b, jsd). */
  def jsDivergence(docs: DataFrame, groupCol: String, textCol: String,
                   a: String, b: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = docs.filter(col(groupCol).isin(a, b))
      .select(col(groupCol).as("__g"),
        explode(tokens(lower(col(textCol)))).as("__w"))
      .groupBy("__w")
      .agg(sum(when(col("__g") === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__g") === b, 1L).otherwise(0L)).as("__cb"))
    val tot = cells.agg(sum(col("__ca")).as("n_tokens_a"),
      sum(col("__cb")).as("n_tokens_b"))
    val p = col("__ca").cast("double") / col("n_tokens_a").cast("double")
    val q = col("__cb").cast("double") / col("n_tokens_b").cast("double")
    val m = (p + q) / 2.0
    def side(cnt: Column, prob: Column) =
      when(cnt > 0L, (prob * log(prob / m)).cast(DecimalType(28, 12)))
    cells.crossJoin(broadcast(tot))
      .select(col("n_tokens_a"), col("n_tokens_b"),
        side(col("__ca"), p).as("__ta"), side(col("__cb"), q).as("__tb"))
      .groupBy("n_tokens_a", "n_tokens_b")
      // ×0.5 on the cast-back doubles (exact: exponent shift), one add:
      // fixed IEEE shape, identical in any engine
      .agg(round(sum(col("__ta")).cast("double") * 0.5 +
        sum(col("__tb")).cast("double") * 0.5, 6).as("jsd"))
  }

  // ----------------------------------------------------------- dataset card
  /** One-row corpus datasheet — the summary block of a dataset card for a
    * training corpus: doc/char/token totals, language count and entropy,
    * exact-duplicate rate (md5 distinct), and short-doc share. One corpus
    * scan for the doc-grain moments + one language rollup; entropy terms
    * follow the PSI/JSD DECIMAL(28,12) discipline; every rate is a single
    * IEEE division, 6dp. Returns (n_docs, n_langs, total_chars,
    * total_tokens, dup_rate, short_rate, lang_entropy). */
  def datasetCard(docs: DataFrame, textCol: String, langCol: Column,
                  shortChars: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = docs.select(length(col(textCol)).as("__ch"),
      size(filter(tokens(lower(col(textCol))), t => t =!= "")).as("__tk"),
      md5(col(textCol)).as("__h"), langCol.as("__lang"))
    val s = d.agg(count(lit(1)).as("n_docs"),
      countDistinct(col("__lang")).as("n_langs"),
      sum(col("__ch").cast(DecimalType(38, 0))).cast("long").as("total_chars"),
      sum(col("__tk").cast(DecimalType(38, 0))).cast("long")
        .as("total_tokens"),
      countDistinct(col("__h")).as("__nd"),
      sum(when(col("__ch") < shortChars, 1L).otherwise(0L)).as("__nshort"))
    val n = d.agg(count(lit(1)).cast("double").as("__n"))
    val p = col("__c").cast("double") / col("__n")
    val ent = d.groupBy(col("__lang")).agg(count(lit(1)).as("__c"))
      .crossJoin(broadcast(n))
      .agg(sum((-p * log(p)).cast(DecimalType(28, 12))).cast("double")
        .as("__ent"))
    s.crossJoin(broadcast(ent))
      .select(col("n_docs"), col("n_langs"), col("total_chars"),
        col("total_tokens"),
        round(lit(1.0) - col("__nd").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"),
        round(col("__nshort").cast("double") /
          col("n_docs").cast("double"), 6).as("short_rate"),
        round(col("__ent"), 6).as("lang_entropy"))
  }

  // ------------------------------------------------------ lexical diversity
  /** Per-document lexical-diversity profile: type-token ratio and hapax
    * (once-only types) ratio over the [[tokens]] whitespace tokenization —
    * the vocabulary-health companion to [[textQuality]] (a low TTR flags
    * repetitive/generated text; a high hapax share flags noise). Two keyed
    * aggregates — (doc, token) then doc — all-integer counts, one IEEE
    * division per ratio, 6dp. Documents with zero tokens drop out (no
    * denominator). Returns (idCol, n_tokens, n_types, n_hapax, ttr,
    * hapax_ratio). */
  def lexicalDiversity(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    docs.select(col(idCol), explode(toks).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(idCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") /
          col("n_tokens").cast("double"), 6).as("ttr"),
        round(col("n_hapax").cast("double") /
          col("n_types").cast("double"), 6).as("hapax_ratio"))
  }

  // ------------------------------------------------- fightin' words
  /** Monroe/Colaresi/Quinn "Fightin' Words" log-odds-with-Dirichlet-prior
    * comparison of two sub-corpora (Monroe et al. 2008) — the principled
    * replacement for raw frequency-ratio "distinctive terms" lists (which
    * overweight rare words): with y the token counts, N the corpus sizes,
    * V the joint vocabulary and a symmetric add-half prior,
    * δ_w = ln((y_Aw+½)/(N_A+V/2−y_Aw−½)) − ln(same for B),
    * σ²_w = 1/(y_Aw+½) + 1/(y_Bw+½), z = δ/σ. Returns the `k` most
    * A-associated tokens among those with y_A+y_B ≥ `minCount`.
    *
    * DETERMINISM: counts are exact integers off one (token)-grain rollup;
    * δ and z are ONE fixed-shape IEEE expression each, rounded 6dp BEFORE
    * the ranking so the top-k cutoff compares identical doubles in any
    * engine (rounded-z ties break on the token). Scale: one token-explode
    * shuffle to the vocabulary-bounded relation; the rank window runs on
    * the filtered vocabulary, never the corpus. Returns
    * (token, n_a, n_b, delta, z). */
  def fightinWords(docs: DataFrame, textCol: String, groupACol: Column,
                   minCount: Long = 5L, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    val counts = docs.select(groupACol.as("__a"), explode(toks).as("token"))
      .groupBy("token")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    val tot = counts.agg(sum(col("n_a")).as("__NA"),
      sum(col("n_b")).as("__NB"), count(lit(1)).as("__V"))
    def lo(y: Column, n: Column, v: Column): Column =
      log((y.cast("double") + lit(0.5)) /
        (n.cast("double") + v.cast("double") / lit(2.0) -
          y.cast("double") - lit(0.5)))
    val delta = lo(col("n_a"), col("__NA"), col("__V")) -
      lo(col("n_b"), col("__NB"), col("__V"))
    val sigma2 = lit(1.0) / (col("n_a").cast("double") + lit(0.5)) +
      lit(1.0) / (col("n_b").cast("double") + lit(0.5))
    val scored = counts.filter(col("n_a") + col("n_b") >= minCount)
      .crossJoin(broadcast(tot))
      .select(col("token"), col("n_a"), col("n_b"),
        round(delta, 6).as("delta"),
        round(delta / sqrt(sigma2), 6).as("z"))
    scored.withColumn("__r", row_number().over(
        Window.orderBy(col("z").desc, col("token").asc)))
      .filter(col("__r") <= k).drop("__r")
  }

  // ------------------------------------------------- vocabulary richness
  /** Per-group vocabulary-richness estimators over the [[tokens]]
    * whitespace tokenization: bias-corrected Chao1 species richness
    * S_obs + f1·(f1−1)/(2·(f2+1)) (Chao 1984 — how many types the corpus
    * would show at infinite sampling) and the Good-Turing unseen-mass
    * estimate f1/N (the probability the NEXT token is a new type; Good
    * 1953) — the coverage questions a training-data pipeline asks before
    * deciding whether more crawl is worth tokenizing.
    *
    * All inputs are exact integers off a (group, token)-grain rollup
    * followed by a frequency-of-frequency rollup per group; the two
    * estimators are one fixed-shape IEEE expression each, 6dp —
    * engine-identical. Scale: two key-bounded shuffles (the second is
    * vocabulary-sized per group); no windows, no collect. Returns per
    * group: (groupCols…, n_tokens, n_types, f1, f2, chao1, p_unseen). */
  def vocabularyRichness(docs: DataFrame, groupCols: Seq[String],
                         textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val gs = groupCols.map(col)
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    docs.select(gs :+ explode(toks).as("__t"): _*)
      .groupBy(gs :+ col("__t"): _*).agg(count(lit(1)).as("__c"))
      .groupBy(gs: _*)
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(gs ++ Seq(col("n_tokens"), col("n_types"), col("f1"), col("f2"),
        round(col("n_types").cast("double") +
          (col("f1") * (col("f1") - lit(1L))).cast("double") /
            (lit(2L) * (col("f2") + lit(1L))).cast("double"), 6).as("chao1"),
        round(col("f1").cast("double") /
          col("n_tokens").cast("double"), 6).as("p_unseen")): _*)
  }

  // -------------------------------------------------------------- Yule's K
  /** Yule's characteristic K (Yule 1944) per group — the second-order
    * vocabulary-richness constant next to [[vocabularyRichness]]'s Chao1:
    * K = 10⁴·(Σ_m m²·V_m − N)/N² over the frequency-of-frequencies V_m
    * (repeat-heavy text scores high; K is ~length-invariant where raw
    * TTR is not).
    *
    * DETERMINISM AND SCALE: one (group, token) rollup, one
    * (group, frequency) rollup (both key-bounded), one group aggregate;
    * Σ m²·V_m accumulates as DECIMAL(38,0) (m² of a 10-digit frequency
    * overflows a long — cast before multiplying); the finish is one
    * fixed IEEE shape, 6dp. Returns per group:
    * (groupCols…, n_tokens, n_types, yules_k). */
  def yulesK(docs: DataFrame, groupCols: Seq[String],
             textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(groupCols.nonEmpty, "at least one group column")
    val gs = groupCols.map(col)
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    val freq = docs.select(gs :+ explode(toks).as("__t"): _*)
      .groupBy(gs :+ col("__t"): _*).agg(count(lit(1)).as("__m"))
    val fof = freq.groupBy(gs :+ col("__m"): _*)
      .agg(count(lit(1)).as("__vm"))
    fof.groupBy(gs: _*)
      .agg(sum(col("__m").cast(DecimalType(38, 0)) * col("__vm")).as("__n"),
        sum(col("__vm")).as("n_types"),
        sum(col("__m").cast(DecimalType(38, 0)) * col("__m") * col("__vm"))
          .as("__m2v"))
      .select(gs ++ Seq(col("__n").cast("long").as("n_tokens"),
        col("n_types"),
        round(lit(1e4) * (col("__m2v").cast("double") -
          col("__n").cast("double")) /
          (col("__n").cast("double") * col("__n").cast("double")), 6)
          .as("yules_k")): _*)
  }

  // ------------------------------------------------------ Burrows' Delta
  /** Burrows' Delta stylometric distance (Burrows 2002) between document
    * groups: over the corpus's `topV` most frequent tokens, each group's
    * relative frequency z-scores against the across-group mean/σ, and
    * Delta(g₁,g₂) = mean |z₁ − z₂| — the authorship/register distance
    * that [[fightinWords]]'s per-token z complements with a per-PAIR
    * number.
    *
    * DETERMINISM: frequencies round 12dp before anything reads them;
    * across-group moments are DECIMAL(28,12)-exact over the
    * group-bounded relation; z rounds 6dp (σ = 0 tokens carry z = 0 — no
    * signal, deterministic); Delta is a DECIMAL mean of 6dp z
    * differences. SCALE: one (group, token) rollup; the top-V cutoff is
    * a TakeOrdered (total DESC, token ASC), never a global sort; the
    * completion grid and the pair join are (groups × topV)-bounded.
    * Contract: the GROUP vocabulary is bounded (sources, authors).
    * Returns (group_a, group_b, delta) per unordered pair. */
  def burrowsDelta(docs: DataFrame, groupCol: Column, textCol: String,
                   topV: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(topV >= 1, s"topV must be >= 1: $topV")
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    val gt = docs.select(groupCol.as("__g"), explode(toks).as("__t"))
      .groupBy("__g", "__t").agg(count(lit(1)).as("__c"))
    val top = gt.groupBy("__t").agg(sum(col("__c")).as("__tot"))
      .orderBy(col("__tot").desc, col("__t").asc).limit(topV)
      .select(col("__t"))
    val totals = gt.groupBy("__g").agg(sum(col("__c")).as("__n"))
    val grid = totals.select(col("__g"), col("__n"))
      .crossJoin(broadcast(top)) // groups x topV, bounded
      .join(gt, Seq("__g", "__t"), "left")
      .select(col("__g"), col("__t"),
        round(coalesce(col("__c"), lit(0L)).cast("double") /
          col("__n").cast("double"), 12).as("__f"))
    val stats = grid.groupBy("__t")
      .agg(count(lit(1)).as("__ng"),
        sum(col("__f").cast(DecimalType(28, 12))).as("__sf"),
        sum((col("__f") * col("__f")).cast(DecimalType(28, 12))).as("__sff"))
    val ngD = col("__ng").cast("double")
    val mean = col("__sf").cast("double") / ngD
    val sd = sqrt((ngD * col("__sff").cast("double") -
      col("__sf").cast("double") * col("__sf").cast("double")) / (ngD * ngD))
    val z = grid.join(broadcast(stats), Seq("__t"))
      .select(col("__g"), col("__t"),
        round(when(sd > 0.0, (col("__f") - mean) / sd).otherwise(lit(0.0)), 6)
          .as("__z"))
    z.as("l").join(z.as("r"),
        col("l.__t") === col("r.__t") && col("l.__g") < col("r.__g"))
      .groupBy(col("l.__g").as("group_a"), col("r.__g").as("group_b"))
      .agg(count(lit(1)).as("__v"),
        sum(abs(col("l.__z") - col("r.__z")).cast(DecimalType(28, 12)))
          .as("__sz"))
      .select(col("group_a"), col("group_b"),
        round(col("__sz").cast("double") / col("__v").cast("double"), 6)
          .as("delta"))
  }

  // ---------------------------------------------------------- Heaps' law
  /** Heaps'-law vocabulary-growth fit (Heaps 1978): V(N) ≈ K·N^β from
    * `checkpoints` evenly-spaced corpus prefixes in doc-id order — the
    * "how fast does vocabulary saturate" planning number behind token
    * budgets and dedup thresholds (β ≈ 0.5 for natural text; ≈ 1 means
    * near-unique content, ≈ 0 boilerplate).
    *
    * DETERMINISM AND SCALE: a token's first occurrence is min(doc_id) —
    * one token-keyed rollup, never a prefix-distinct; checkpoint
    * assignment is pure integer arithmetic off the broadcast max id;
    * prefix totals are running sums over the `checkpoints`-row grid; the
    * log-log OLS runs on 12dp-rounded lns in DECIMAL. Empty prefixes
    * drop (no log 0). Returns one row:
    * (n_checkpoints, total_tokens, vocabulary, beta, k_coef). */
  def heapsLaw(docs: DataFrame, idCol: String, textCol: String,
               checkpoints: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(checkpoints >= 2, s"checkpoints must be >= 2: $checkpoints")
    val k = checkpoints
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    val dt = docs.select(col(idCol).as("__id"), explode(toks).as("__t"))
    val mx = dt.agg(max(col("__id")).as("__mx"))
    // ceil((id+1)·k/(mx+1)) ∈ [1,k] as integer arithmetic; ids are
    // non-negative so the double-division truncation IS floor (the
    // brownForsythe precedent for Column./ being double division)
    def bucket(c: Column): Column =
      (((c + 1L) * k + col("__mx")) / (col("__mx") + 1L)).cast("long")
    val perBucketTokens = dt.select(col("__id"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket(col("__id")).as("__b")).agg(count(lit(1)).as("__nt"))
    val perBucketTypes = dt.groupBy(col("__t")).agg(min(col("__id")).as("__fid"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket(col("__fid")).as("__b")).agg(count(lit(1)).as("__nv"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spine = mx.select(explode(sequence(lit(1), lit(k))).as("__b"))
    val pts = spine
      .join(perBucketTokens, Seq("__b"), "left")
      .join(perBucketTypes, Seq("__b"), "left")
      .withColumn("__N", sum(coalesce(col("__nt"), lit(0L))).over(w))
      .withColumn("__V", sum(coalesce(col("__nv"), lit(0L))).over(w))
      .filter(col("__N") > 0L && col("__V") > 0L)
      .select(round(log(col("__N").cast("double")), 12).as("__x"),
        round(log(col("__V").cast("double")), 12).as("__y"),
        col("__N"), col("__V"))
    val dd = DecimalType(28, 12)
    val m = pts.agg(count(lit(1)).as("n_checkpoints"),
      max(col("__N")).as("total_tokens"), max(col("__V")).as("vocabulary"),
      sum(col("__x").cast(dd)).as("__sx"), sum(col("__y").cast(dd)).as("__sy"),
      sum((col("__x") * col("__y")).cast(dd)).as("__sxy"),
      sum((col("__x") * col("__x")).cast(dd)).as("__sxx"))
    val nD = col("n_checkpoints").cast("double")
    val varx = nD * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val beta = (nD * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")) / varx
    m.select(col("n_checkpoints"), col("total_tokens"), col("vocabulary"),
      round(when(varx =!= 0.0, beta), 6).as("beta"),
      round(when(varx =!= 0.0,
        exp(col("__sy").cast("double") / nD -
          beta * col("__sx").cast("double") / nD)), 6).as("k_coef"))
  }

  /** The shared (group…, token, count) rollup every diversity operator
    * below starts from: lowercased whitespace tokens, empties dropped. */
  private def tokenCounts(docs: DataFrame, groupCols: Seq[String],
                          textCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    docs.select(gs :+ explode(toks).as("__t"): _*)
      .groupBy(gs :+ col("__t"): _*).agg(count(lit(1)).as("__c"))
  }

  // ------------------------------------------------------- Hill numbers
  /** Hill diversity numbers per group (Hill 1973) — the effective-
    * species ladder over the token distribution: ⁰D = richness (type
    * count), ¹D = e^H (Shannon), ²D = 1/Σp² (inverse Simpson), plus
    * Pielou's evenness J = H/ln(⁰D) — "how many equally-common token
    * types would look like this corpus", at three tail sensitivities.
    * The [[vocabularyRichness]] sibling for diversity rather than
    * unseen-mass.
    *
    * DETERMINISM AND SCALE: two key-bounded rollups ((group, token) then
    * group); ²D is an EXACT integer rational N²/Σc² (one division); H
    * sums fixed IEEE cells −p·ln p as DECIMAL(28,12). A single-type
    * group has H = 0, ¹D = 1, J null (ln 1 = 0 denominator, documented).
    * Returns per group: (group…, n_tokens, richness, hill1, hill2,
    * pielou_j) 6dp. */
  def hillNumbers(docs: DataFrame, groupCols: Seq[String],
                  textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(groupCols.nonEmpty, "at least one group column")
    val gs = groupCols.map(col)
    val dt0 = DecimalType(38, 0)
    val counts = tokenCounts(docs, groupCols, textCol)
    val tot = counts.groupBy(gs: _*)
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("richness"),
        sum(col("__c").cast(dt0) * col("__c")).as("__s2"))
    val p = col("__c").cast("double") / col("n_tokens").cast("double")
    val h = counts.join(broadcast(tot), groupCols)
      .groupBy(gs: _*)
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("richness")).as("richness"),
        first(col("__s2")).as("__s2"),
        sum((-p * log(p)).cast(DecimalType(28, 12))).cast("double")
          .as("__h"))
    h.select(gs ++ Seq(col("n_tokens"), col("richness"),
      round(exp(col("__h")), 6).as("hill1"),
      round(when(col("__s2") > lit(0).cast(dt0),
        (col("n_tokens").cast(dt0) * col("n_tokens")).cast("double") /
          col("__s2").cast("double")), 6).as("hill2"),
      round(when(col("richness") >= 2L,
        col("__h") / log(col("richness").cast("double"))), 6)
        .as("pielou_j")): _*)
  }

  // ------------------------------------------- Berger–Parker dominance
  /** Berger–Parker dominance per group (Berger & Parker 1970): the share
    * of the single most common token type, d = max c / N — the bluntest
    * diversity number (1/d is the [[hillNumbers]] ladder's q→∞ end), and
    * a quick boilerplate-dominance screen for a corpus slice.
    *
    * DETERMINISM AND SCALE: group-grain max + total off the one token
    * rollup; the top token elects by (count desc, token asc) — the max
    * count filters, then MIN(token) breaks ties, all exact. The share is
    * one integer rational. Returns per group:
    * (group…, n_tokens, top_token, top_n, berger_parker) 6dp. */
  def bergerParker(docs: DataFrame, groupCols: Seq[String],
                   textCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val gs = groupCols.map(col)
    val counts = tokenCounts(docs, groupCols, textCol)
    val tot = counts.groupBy(gs: _*)
      .agg(sum(col("__c")).as("n_tokens"), max(col("__c")).as("top_n"))
    val top = counts.join(broadcast(tot), groupCols)
      .filter(col("__c") === col("top_n"))
      .groupBy(gs: _*)
      .agg(min(col("__t")).as("top_token"))
    tot.join(top, groupCols)
      .select(gs ++ Seq(col("n_tokens"), col("top_token"), col("top_n"),
        round(col("top_n").cast("double") /
          col("n_tokens").cast("double"), 6).as("berger_parker")): _*)
  }

  // ------------------------------------------ Good–Turing smoothing row
  /** Good–Turing frequency-of-frequency smoothing table per group (Good
    * 1953): for r = 1..maxR, the adjusted count r* = (r+1)·f_{r+1}/f_r —
    * the correction that reallocates probability mass from the
    * once-seen toward the unseen ([[vocabularyRichness]] reports the
    * r = 0 endpoint f₁/N; this is the rest of the ladder a smoothed LM
    * needs).
    *
    * DETERMINISM AND SCALE: the f_r row comes from ONE conditional
    * aggregate over the token rollup (the [[Stats.meanExcess]] stack
    * shape — the grid is the bounded 1..maxR+1 vocabulary); r* is one
    * exact-integer-ratio division per row. f_r = 0 nulls r* loudly.
    * Returns per group and r: (group, r, f_r, f_r_plus_1, r_star) 6dp. */
  def goodTuringSmooth(docs: DataFrame, groupCol: String, textCol: String,
                       maxR: Int = 4): DataFrame = {
    require(maxR >= 1 && maxR <= 50, s"maxR in [1,50]: $maxR")
    val counts = tokenCounts(docs, Seq(groupCol), textCol)
    val aggs = (1 to maxR + 1).map(i =>
      sum(when(col("__c") === i.toLong, 1L).otherwise(0L)).as(s"__f$i"))
    val one = counts.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val stacked = (1 to maxR).map(r =>
      s"CAST($r AS BIGINT), __f$r, __f${r + 1}").mkString(", ")
    one.selectExpr(groupCol,
        s"stack($maxR, $stacked) AS (r, f_r, f_r_plus_1)")
      .select(col(groupCol), col("r"), col("f_r"), col("f_r_plus_1"),
        round(when(col("f_r") > 0L,
          ((col("r") + lit(1L)) * col("f_r_plus_1")).cast("double") /
            col("f_r").cast("double")), 6).as("r_star"))
  }

  // -------------------------------------------------- Dunning G² keyness
  /** Dunning log-likelihood keyness (Dunning 1993): per term shared by
    * two corpora, G² = 2·Σᵢ Oᵢ·ln(Oᵢ/Eᵢ) over the term's 2×2 table
    * against the corpus totals — THE keyword-extraction statistic that
    * stays honest at small counts where χ² breaks, and the
    * signed-direction sibling of [[fightinWords]]' smoothed log-odds.
    *
    * DETERMINISM AND SCALE: one (group, token) rollup pivots to exact
    * (o_a, o_b) integers; E and the G² cells are fixed IEEE shapes on
    * those integers (an absent side contributes exactly 0 by the
    * o·ln(o/E) → 0 limit, taken explicitly); the direction flag is the
    * exact integer cross-compare o_a·N_b > o_b·N_a; the top-N election
    * orders by (g2 desc, term asc) on identical doubles. Returns the
    * top-N terms: (term, n_a, n_b, g2, over_a) 6dp. */
  def keynessG2(docs: DataFrame, textCol: String, groupCol: Column,
                a: String, b: String, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(topN >= 1, s"topN must be positive: $topN")
    val g = groupCol.cast("string")
    val toks = filter(tokens(lower(col(textCol))), t => t =!= "")
    val counts = docs.filter(g.isin(a, b))
      .select(g.as("__g"), explode(toks).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .agg(sum(when(col("__g") === a, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__g") === b, 1L).otherwise(0L)).as("n_b"))
    val tot = counts.agg(sum(col("n_a")).as("__na"),
      sum(col("n_b")).as("__nb"))
    val j = counts.crossJoin(broadcast(tot))
    val naD = col("__na").cast("double"); val nbD = col("__nb").cast("double")
    val rowTot = (col("n_a") + col("n_b")).cast("double")
    val e1 = rowTot * naD / (naD + nbD)
    val e2 = rowTot * nbD / (naD + nbD)
    val t1 = when(col("n_a") > 0L,
      col("n_a").cast("double") * log(col("n_a").cast("double") / e1))
      .otherwise(lit(0.0))
    val t2 = when(col("n_b") > 0L,
      col("n_b").cast("double") * log(col("n_b").cast("double") / e2))
      .otherwise(lit(0.0))
    j.select(col("term"), col("n_a"), col("n_b"),
        round(lit(2.0) * (t1 + t2), 6).as("g2"),
        (col("n_a") * col("__nb") > col("n_b") * col("__na")).as("over_a"))
      .orderBy(col("g2").desc, col("term").asc)
      .limit(topN)
  }

  // ---------------------------------------------------- token coverage
  /** Corpus coverage of the top-k token types per group, for a grid of
    * k: what fraction of all tokens would a k-entry vocabulary cover?
    * THE curve a tokenizer/vocab-size decision reads ([[zipfFit]] gives
    * its slope; this gives the actual cumulative shares).
    *
    * DETERMINISM AND SCALE: the per-group top-max(k) tokens come from
    * [[Curation.topKPerGroup]]'s broadcast-cutoff prune (never a window
    * over the full vocabulary); the row_number + conditional sums then
    * run on that BOUNDED ≤ max(k)-row-per-group relation. The election
    * order (count desc, token asc) is total; coverage is an exact
    * integer rational per (group, k). Returns per (group, k):
    * (group, k, covered, n_tokens, coverage) 6dp. */
  def tokenCoverage(docs: DataFrame, groupCol: String, textCol: String,
                    ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.head >= 1,
      s"ks must be ascending positive: $ks")
    // topKPerGroup uses __t internally for its threshold — rename the
    // token column to keep the namespaces apart
    val counts = tokenCounts(docs, Seq(groupCol), textCol)
      .withColumnRenamed("__t", "__tok")
    val tot = counts.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_tokens"))
    val top = graft.pipeline.Curation.topKPerGroup(counts, groupCol,
      "__c", "__tok", k = ks.max)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__c").desc, col("__tok").asc)
    val ranked = top.withColumn("__rn", row_number().over(w))
    val aggs = ks.map(k =>
      sum(when(col("__rn") <= k, col("__c")).otherwise(0L)).as(s"__cum$k"))
    val one = ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val stacked = ks.map(k => s"CAST($k AS INTEGER), __cum$k")
      .mkString(", ")
    one.join(broadcast(tot), groupCol)
      .selectExpr(groupCol, s"stack(${ks.size}, $stacked) AS (k, covered)",
        "n_tokens")
      .select(col(groupCol), col("k"), col("covered"), col("n_tokens"),
        round(col("covered").cast("double") /
          col("n_tokens").cast("double"), 6).as("coverage"))
  }
}
