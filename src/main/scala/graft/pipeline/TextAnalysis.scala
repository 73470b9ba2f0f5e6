package graft.pipeline

import org.apache.spark.sql.Column
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

  /** Heuristic document quality in [0,1]: length saturation, punctuation
    * moderation, stopword presence, sane mean word length. Deterministic and
    * SQL-mirrorable (each term is arithmetic over the metrics above). */
  def qualityScore(c: Column): Column = {
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

  /** Rolling-hash content fingerprint: minimum 64-bit hash over character
    * `k`-shingles of the normalized text (winnowing-style min-sampling; two
    * docs sharing it are near-dup candidates). */
  def rollingFingerprint(c: Column, k: Int = 16): Column = {
    val s = normalized(c)
    val n = length(s)
    val starts = sequence(lit(1), greatest(n - (k - 1), lit(1)))
    array_min(transform(starts, i => xxhash64(s.substr(i, lit(k)))))
  }
}
