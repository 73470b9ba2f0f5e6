package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-window hashing kernel for chunking / duplicated-passage detection
  * (Curation.chunkByTokens). The composed form — per-window `slice` +
  * `concat_ws` + `md5` — copies the window's tokens and rebuilds the joined
  * string for EVERY position; at stride 1 that is O(window) fresh bytes per
  * token of the corpus (~650k windows at sf0.1 dominated q80). This kernel
  * space-joins each document's tokens into ONE byte buffer and md5s byte
  * RANGES of it per window: the only per-window work is the digest itself.
  *
  * Output is byte-identical to `md5(concat_ws(" ", slice(toks, start,
  * window)))` for null-free token arrays (the `split`-produced arrays
  * chunkByTokens feeds it; `concat_ws` SKIPS nulls, so a null-bearing
  * array would diverge — precondition, not a reachable case).
  */
object ChunkKernels {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".toCharArray

  /** One struct per chunk: chunk i covers tokens [i*stride+1, i*stride+
    * window] 1-based; chunk count = 1 + ceil(max(0, n-window)/stride). */
  def windowHashes(arr: ArrayData, window: Int, stride: Int): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var totalLen = math.max(n - 1, 0)
    var i = 0
    while (i < n) {
      toks(i) = arr.getUTF8String(i).getBytes
      totalLen += toks(i).length
      i += 1
    }
    val buf = new Array[Byte](totalLen)
    val off = new Array[Int](n)
    var p = 0
    i = 0
    while (i < n) {
      if (i > 0) { buf(p) = ' '; p += 1 }
      off(i) = p
      System.arraycopy(toks(i), 0, buf, p, toks(i).length)
      p += toks(i).length
      i += 1
    }
    val nChunks = 1 +
      math.max(0, math.ceil(math.max(0, n - window).toDouble / stride).toInt)
    val rows = new Array[Any](nChunks)
    val digest = md.get()
    var c = 0
    while (c < nChunks) {
      val s = c * stride
      val e = math.min(s + window, n)
      val nt = math.max(0, e - s)
      digest.reset()
      if (nt > 0)
        digest.update(buf, off(s), off(e - 1) + toks(e - 1).length - off(s))
      val h = digest.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = Hex((h(b) >> 4) & 0xF)
        hex(2 * b + 1) = Hex(h(b) & 0xF)
        b += 1
      }
      rows(c) = new GenericInternalRow(Array[Any](
        c, s + 1, nt, UTF8String.fromString(new String(hex))))
      c += 1
    }
    new GenericArrayData(rows)
  }
}

case class TokenWindowHashes(child: Expression, window: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(window > 0 && stride > 0 && stride <= window,
    "need 0 < stride <= window")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes expects ARRAY<STRING>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("tok_start", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("chunk_hash", StringType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ChunkKernels.windowHashes(v.asInstanceOf[ArrayData], window, stride)

  override protected def withNewChildInternal(c: Expression): TokenWindowHashes =
    copy(child = c)
  override def prettyName: String = "token_window_hashes"
}

object ChunkExprs {
  def tokenWindowHashes(c: Column, window: Int, stride: Int): Column =
    column(TokenWindowHashes(expression(c), window, stride))
}
