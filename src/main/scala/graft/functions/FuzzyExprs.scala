package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Jaro and Jaro–Winkler similarity, the record-linkage scorer the deletion
  * join's edit-distance metric can't express (it rewards shared prefixes and
  * tolerates transpositions instead of counting edits). Implemented as one
  * imperative two-pass kernel over CODE POINTS (the FuzzyKernels character
  * discipline) with the standard parameterization — match window
  * max(|a|,|b|)/2 − 1, half-counted transpositions, Winkler boost
  * 0.1·prefix(≤4)·(1−jaro) applied when jaro > 0.7, and 0.0 when either
  * side is empty — which is bit-identical to DuckDB's
  * `jaro_winkler_similarity` (verified on a 3k random-pair matrix), so
  * cross-engine oracles can compare UNROUNDED doubles.
  */
object JaroKernels {
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString.codePoints().toArray
    val s2 = b.toString.codePoints().toArray
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + window + 1)
      var j = math.max(0, i - window)
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - half) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1(p) == s2(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    }
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroKernels.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.JaroKernels.jaroWinkler($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

object FuzzyExprs {
  def deletionVariants(c: Column, k: Int): Column =
    column(DeletionVariants(expression(c), k))
  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))
}
