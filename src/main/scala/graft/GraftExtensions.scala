package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT lenient_date(c) ...")` works alongside the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * No custom Rule/Strategy is needed for this engine (SURVEY §4: the
  * reference gives Catalyst nothing to beat) — extensions carry only the
  * expression registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == n, s"$name expects $n argument(s), got ${exprs.length}")
      f(exprs)
    }

  /** Evaluate a builder-time argument that must be a literal integer (e.g. a
    * shingle width). Non-foldable or NULL arguments surface as a clear
    * AnalysisException at plan time instead of an NPE/ClassCastException.
    */
  private def foldableInt(name: String, argName: String, argPos: Int, expr: Expression): Int = {
    def fail(got: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        Map(
          "sqlExpr" -> s"$name(...)",
          "inputName" -> s"`$argName` (argument ${argPos + 1})",
          "inputType" -> "\"INT\"",
          "inputExpr" -> got))
    if (!expr.foldable) fail(expr.sql)
    expr.eval() match {
      case n: Number => n.intValue()
      case null      => fail("NULL")
      case other     => fail(other.toString)
    }
  }

  /** Like [[foldableInt]] for literal string arguments (e.g. a normalization
    * form name). */
  private def foldableString(name: String, argName: String, argPos: Int,
                             expr: Expression): String = {
    def fail(got: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        Map(
          "sqlExpr" -> s"$name(...)",
          "inputName" -> s"`$argName` (argument ${argPos + 1})",
          "inputType" -> "\"STRING\"",
          "inputExpr" -> got))
    if (!expr.foldable) fail(expr.sql)
    expr.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case null => fail("NULL")
      case other => fail(other.toString)
    }
  }

  /** The full function registry as (identifier, info, builder) triples —
    * consumed by BOTH registration paths: session-builder extensions
    * ([[apply]]) and live-session registration
    * ([[GraftExtensions.registerAll]]). */
  private[graft] def entries: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(

    (FunctionIdentifier("lenient_timestamp"),
      info("lenient_timestamp", "lenient_timestamp(str) - fuzzy multi-format parse with impossible-day repair; 9999-12-31 sentinel"),
      arity("lenient_timestamp", 1)(exprs => LenientTimestamp(exprs.head))),
    (FunctionIdentifier("lenient_date"),
      info("lenient_date", "lenient_date(str) - lenient date parse"),
      arity("lenient_date", 1)(exprs => LenientDate(exprs.head))),
    (FunctionIdentifier("lenient_time"),
      info("lenient_time", "lenient_time(str) - lenient time-of-day parse as HH:mm:ss"),
      arity("lenient_time", 1)(exprs => LenientTime(exprs.head))),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<double>, array<double>) - codegen'd cosine similarity"),
      arity("cosine_sim", 2)(exprs => CosineSimilarity(exprs(0), exprs(1)))),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(array<double>, array<double>)"),
      arity("dot_product", 2)(exprs => DotProduct(exprs(0), exprs(1)))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<long>) - 64-bit SimHash of token hashes"),
      arity("simhash64", 1)(exprs => SimHash64(exprs.head))),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(str, n) - distinct lowercase word n-gram shingles (n foldable)"),
      arity("word_shingles", 2)(exprs =>
        WordShingles(exprs(0), foldableInt("word_shingles", "n", 1, exprs(1))))),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(array<struct<h1:long,h2:long>>, numHashes) - banded MinHash signature (numHashes foldable)"),
      arity("minhash_signature", 2)(exprs =>
        MinHashSignature(exprs(0), foldableInt("minhash_signature", "numHashes", 1, exprs(1))))),
    (FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize", "unicode_normalize(str, form) - Unicode normalization to NFC/NFD/NFKC/NFKD (form a foldable string)"),
      arity("unicode_normalize", 2)(exprs =>
        graft.functions.UnicodeNormalize(exprs(0),
          foldableString("unicode_normalize", "form", 1, exprs(1))))),
    (FunctionIdentifier("strip_accents"),
      info("strip_accents", "strip_accents(str) - fold accents/diacritics (NFD - marks - NFC)"),
      arity("strip_accents", 1)(exprs => graft.functions.StripAccents(exprs.head))),
    (FunctionIdentifier("langid"),
      info("langid", "langid(str) - stopword-profile language id over the built-in profiles; 'und' when nothing matches"),
      arity("langid", 1)(exprs =>
        LangIdArgmax(exprs.head, graft.pipeline.TextAnalysis.LangProfiles))))

  override def apply(e: SparkSessionExtensions): Unit =
    entries.foreach { case (id, fi, b) => e.injectFunction((id, fi, b)) }
}

object GraftExtensions {
  /** Register every graft SQL function into an ALREADY-RUNNING session's
    * function registry — the path a driver query uses when the session was
    * built without `.withExtensions` (Verify/Bench). Idempotent:
    * re-registration overwrites with identical builders. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    new GraftExtensions().entries.foreach { case (id, fi, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, b)
    }
}
