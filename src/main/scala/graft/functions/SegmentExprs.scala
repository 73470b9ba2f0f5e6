package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation (the WordPiece/BPE-vocab
  * inference pass, minus the learned vocab): each whitespace token of the
  * lowercased text is consumed left to right, at every position taking the
  * LONGEST vocab entry that matches there, falling back to the single
  * character when nothing does (characters pass through instead of an
  * <unk> sink, so segmentation is lossless and the piece stream
  * concatenates back to the word). Deterministic: at a given position only
  * one vocab string of a given length can match, so "longest" is a total
  * rule.
  *
  * This is per-row imperative string work — exactly what a composed
  * Column form can't express without a recursive plan — so it's a single
  * custom kernel (one eval per row, one hash-set probe per candidate
  * length) following the [[SketchExprs]] pattern. Scale: stateless
  * projection, zero shuffle; the vocab rides inside the expression
  * (broadcast with the plan).
  */
case class GreedyPieces(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(vocab.nonEmpty, "vocab required")

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(v => s.add(v))
    s
  }
  @transient private lazy val maxLen: Int = vocab.map(_.length).max

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = SketchExprs.sparkTokens(v.toString)
    val out = new java.util.ArrayList[Any]()
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var pos = 0
      while (pos < w.length) {
        var len = math.min(maxLen, w.length - pos)
        var piece: String = null
        while (piece == null && len > 1) {
          val cand = w.substring(pos, pos + len)
          if (vocabSet.contains(cand)) piece = cand else len -= 1
        }
        if (piece == null) piece = w.substring(pos, pos + 1)
        out.add(UTF8String.fromString(piece))
        pos += piece.length
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): GreedyPieces =
    copy(child = c)
  override def prettyName: String = "greedy_pieces"
}

object SegmentExprs {
  /** text: string → array of subword pieces across all tokens, in order. */
  def greedyPieces(text: Column, vocab: Seq[String]): Column =
    column(GreedyPieces(expression(text), vocab))
}
