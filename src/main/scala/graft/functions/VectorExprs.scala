package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels. The `zip_with`/`aggregate` higher-order
  * functions evaluate interpreted lambdas per row (CodegenFallback), which
  * dominated the brute-force similarity benchmarks; these emit a tight
  * primitive loop inside whole-stage codegen instead (SURVEY §2.10
  * preference order: native Expression > UDF).
  *
  * Children must be ArrayType(DoubleType) — callers cast once
  * (Similarity.toDouble).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(DoubleType, true) || left.dataType == ArrayType(DoubleType, false))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // same association as the composed form: dot / (sqrt(na) * sqrt(nb))
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $dot;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** nPlanes-bit random-hyperplane LSH signature in ONE vector traversal:
  * bit p = sign of <v, plane_p>. Replaces the composed
  * `aggregate(zip_with(...))` form, whose interpreted lambdas ran
  * nTables × nPlanes array-folds per row (the round-1 q34 hot spot).
  * Accepts array<float> or array<double> (float widens exactly), so the hot
  * path never needs an interpreted elementwise cast.
  *
  * Same accumulation order as the composed form (index-ascending `acc + x`),
  * so signatures are bit-identical; mismatched lengths use the shorter
  * prefix (embeddings are fixed-dim; the composed form null-poisoned there).
  */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.size <= 64, "1..64 planes per signature")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signature expects array<float|double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val flt = isFloat
    var sig = 0L
    var p = 0
    while (p < planeArr.length) {
      val plane = planeArr(p)
      val n = math.min(arr.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (flt) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planesRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
      val get = if (isFloat) s"(double) $arr.getFloat" else s"$arr.getDouble"
      val p = ctx.freshName("p"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val pl = ctx.freshName("pl"); val dot = ctx.freshName("dot"); val sig = ctx.freshName("sig")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < ${planeArr.length}; $p++) {
         |  double[] $pl = $planesRef[$p];
         |  int $n = java.lang.Math.min($arr.numElements(), $pl.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $dot += $get($i) * $pl[$i]; }
         |  if ($dot >= 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneSignature =
    copy(child = c)
  override def prettyName: String = "hyperplane_signature"
}

/** All-tables LSH signatures in ONE vector traversal: element t of the
  * output is the hyperplane signature of `tables(t)` (same bit convention
  * as [[HyperplaneSignature]]). The corpus side of multi-table ANN computes
  * its nTables signatures through this single expression, so the exploded
  * signature relation carries only (id, table, sig) — never the vector.
  */
case class TableSignatures(child: Expression, tables: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(tables.nonEmpty && tables.forall(t => t.nonEmpty && t.size <= 64))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"table_signatures expects array<float|double>, got $other")
    }
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // flattened [table][plane][dim]
  @transient private lazy val tblArr: Array[Array[Array[Double]]] =
    tables.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val flt = isFloat
    val out = new Array[Long](tblArr.length)
    var t = 0
    while (t < tblArr.length) {
      val planes = tblArr(t)
      var sig = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        val n = math.min(arr.numElements(), plane.length)
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = if (flt) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += x * plane(i)
          i += 1
        }
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("tables", tblArr, "double[][][]")
      val get = if (isFloat) s"(double) $arr.getFloat" else s"$arr.getDouble"
      val t = ctx.freshName("t"); val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val pls = ctx.freshName("pls"); val pl = ctx.freshName("pl")
      val dot = ctx.freshName("dot"); val sig = ctx.freshName("sig"); val out = ctx.freshName("out")
      s"""
         |long[] $out = new long[${tblArr.length}];
         |for (int $t = 0; $t < ${tblArr.length}; $t++) {
         |  double[][] $pls = $ref[$t];
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $pls.length; $p++) {
         |    double[] $pl = $pls[$p];
         |    int $n = java.lang.Math.min($arr.numElements(), $pl.length);
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $dot += $get($i) * $pl[$i]; }
         |    if ($dot >= 0) $sig |= (1L << $p);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TableSignatures =
    copy(child = c)
  override def prettyName: String = "table_signatures"
}

/** Query-directed multiprobe (Lv et al., VLDB'07 shape): per table, emit the
  * base signature plus every flip-subset of the `mProbe` planes with the
  * smallest |projection| — exactly the bits most likely to differ for a true
  * near neighbor. Output: per-table array of 2^mProbe probe signatures.
  * Query-side only (queries are small and broadcast), so interpreted eval
  * (CodegenFallback) is deliberate — no doGenCode needed.
  */
case class MultiprobeTableSignatures(child: Expression,
                                     tables: Seq[Seq[Seq[Double]]], mProbe: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(tables.nonEmpty, "at least one plane table required")
  require(mProbe >= 0 && tables.forall(t => mProbe <= t.size && t.size <= 64))
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multiprobe_signatures expects array<float|double>, got $other")
    }
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val tblArr: Array[Array[Array[Double]]] =
    tables.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val flt = isFloat
    val perTable = new Array[ArrayData](tblArr.length)
    var t = 0
    while (t < tblArr.length) {
      val planes = tblArr(t)
      val nP = planes.length
      val proj = new Array[Double](nP)
      var sig = 0L
      var p = 0
      while (p < nP) {
        val plane = planes(p)
        val n = math.min(arr.numElements(), plane.length)
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = if (flt) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += x * plane(i)
          i += 1
        }
        proj(p) = dot
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      // indices of the mProbe smallest |proj| (selection over nP <= 64)
      val order = (0 until nP).sortBy(i => math.abs(proj(i))).take(mProbe).toArray
      val nProbes = 1 << mProbe
      val probes = new Array[Long](nProbes)
      var mask = 0
      while (mask < nProbes) {
        var s = sig
        var b = 0
        while (b < mProbe) {
          if ((mask & (1 << b)) != 0) s ^= (1L << order(b))
          b += 1
        }
        probes(mask) = s
        mask += 1
      }
      perTable(t) = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(probes)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(perTable.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): MultiprobeTableSignatures =
    copy(child = c)
  override def prettyName: String = "multiprobe_signatures"
}

object VectorExprs {
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def hyperplaneSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    column(HyperplaneSignature(expression(vec), planes))
  def tableSignatures(vec: Column, tables: Seq[Seq[Seq[Double]]]): Column =
    column(TableSignatures(expression(vec), tables))
  def multiprobeTableSignatures(vec: Column, tables: Seq[Seq[Seq[Double]]], mProbe: Int): Column =
    column(MultiprobeTableSignatures(expression(vec), tables, mProbe))
}
