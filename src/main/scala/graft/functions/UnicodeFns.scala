package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernels — the normalization pass a multilingual
  * curation pipeline runs before tokenizing/fingerprinting (CCNet/mC4-style:
  * NFC for storage-form stability, NFKC to fold compatibility forms like
  * ligatures and fullwidth letters, accent stripping for folded matching).
  * Spark has no built-in normalizer, so these are native codegen'd
  * expressions over `java.text.Normalizer`; already-normalized input
  * (all ASCII included) takes an allocation-free fast path, so the cost on
  * a mostly-ASCII corpus is one `isNormalized` scan per row.
  *
  * Semantics are the Unicode standard forms, engine-checked against
  * DuckDB's nfc_normalize/strip_accents in q83.
  */
object UnicodeKernels {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** NFD-decompose, drop combining marks, NFC-recompose the remainder —
    * 'café' -> 'cafe', 'Å' -> 'A'. Input without any marks under NFD
    * (ASCII, Hangul, CJK, ligatures) is returned unchanged: this folds
    * accents, it does not re-normalize. */
  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val m = Marks.matcher(nfd)
    if (!m.find()) s
    else UTF8String.fromString(
      Normalizer.normalize(m.replaceAll(""), Normalizer.Form.NFC))
  }
}

case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_normalize form must be NFC/NFD/NFKC/NFKD, got '$form'")
  // resolved once; nullSafeEval runs per row in the interpreted path
  @transient private lazy val resolvedForm = Normalizer.Form.valueOf(form)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UnicodeKernels.normalize(v.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeKernels.normalize($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize = copy(child = c)
  override def prettyName: String = "unicode_normalize"
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UnicodeKernels.stripAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.stripAccents($c)")

  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
  override def prettyName: String = "strip_accents"
}

object UnicodeFns {
  /** Unicode-normalize a string column to `form` (NFC/NFD/NFKC/NFKD). */
  def unicodeNormalize(text: Column, form: String): Column =
    column(UnicodeNormalize(expression(text), form))

  /** Accent/diacritic stripping: NFD - marks - NFC. */
  def stripAccents(text: Column): Column =
    column(StripAccents(expression(text)))
}
