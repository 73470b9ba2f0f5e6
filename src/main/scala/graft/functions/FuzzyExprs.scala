package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-neighborhood kernel for the fuzzy (edit-distance) join's short-
  * string regime (FastSS, Bocek et al. 2007; see Ops.fuzzyJoin). The
  * composed SQL form — nested `transform`/`flatten`/`array_distinct` over
  * `sequence` — runs ~n^2/2 interpreted lambda evals per row and measured
  * ~150 us/row on 18-char strings (the q87 bench hotspot); this is one
  * imperative pass with a hash set.
  *
  * Variants are built over CODE POINTS, matching Spark's `length`/
  * `levenshtein` character semantics — deleting UTF-16 units would split
  * surrogate pairs and an astral-character substitution could then slip
  * past the candidate join (an incompleteness, not just a cosmetic bug).
  */
object FuzzyKernels {
  /** All distinct strings obtainable by deleting at most k (<= 2) code
    * points, the original included; deterministic first-seen order. */
  def deletionVariants(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    val out = new java.util.LinkedHashSet[String](1 + n + n * n / 2)
    def add(skip1: Int, skip2: Int): Unit = {
      val sb = new java.lang.StringBuilder(str.length)
      var i = 0
      while (i < n) {
        if (i != skip1 && i != skip2) sb.appendCodePoint(cps(i))
        i += 1
      }
      out.add(sb.toString)
    }
    out.add(str)
    var i = 0
    while (i < n) { add(i, -1); i += 1 }
    if (k >= 2) {
      i = 0
      while (i < n - 1) {
        var j = i + 1
        while (j < n) { add(i, j); j += 1 }
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(arr)
  }
}

case class DeletionVariants(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 2, s"deletion neighborhood supports k in {1,2}, got $k")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deletion_variants expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    FuzzyKernels.deletionVariants(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FuzzyKernels.deletionVariants($c, $k)")

  override protected def withNewChildInternal(c: Expression): DeletionVariants =
    copy(child = c)
  override def prettyName: String = "deletion_variants"
}

object FuzzyExprs {
  def deletionVariants(c: Column, k: Int): Column =
    column(DeletionVariants(expression(c), k))
}
