package graft.sources

import java.text.Normalizer

/** Header sanitation: slugified, deduped, synthesized column names
  * (reference: fntools.underscorify fntools.py:267-285, dedupe
  * fntools.py:325-344, `column_1..n` naming convert.py:559-612).
  */
object Headers {

  /** Slugify one header: ascii-fold, lowercase, non-alnum runs -> '_'. */
  def underscorify(name: String): String = {
    val folded = Normalizer.normalize(name, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}", "")
    val slug = folded.toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    if (slug.isEmpty) "field" else slug
  }

  /** Suffix repeats with _2, _3, ... (first occurrence unchanged). */
  def dedupe(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map[String, Int]()
    names.map { n =>
      val c = seen.getOrElse(n, 0) + 1
      seen(n) = c
      if (c == 1) n else s"${n}_$c"
    }
  }

  def sanitize(names: Seq[String]): Seq[String] = dedupe(names.map(underscorify))

  /** Headerless files: column_1..column_n. */
  def synthetic(n: Int): Seq[String] = (1 to n).map(i => s"column_$i")
}
