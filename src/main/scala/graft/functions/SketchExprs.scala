package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Native codegen'd sketch kernels (same motivation as VectorExprs: the
  * `transform`/`aggregate` higher-order forms run interpreted lambdas —
  * numHashes × |shingles| interpreted evals per row dominated the dedup
  * benchmarks).
  *
  * Hash family identical to the composed forms in graft.pipeline.Dedup:
  * minhash_i = min over shingles of h1 XOR rotl(h2, i);
  * simhash bit b = sign of Σ tokens (bit b of hash ? +1 : -1).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 512)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getStruct(j, 2)
      val h1 = s.getLong(0); val h2 = s.getLong(1)
      var i = 0
      while (i < numHashes) {
        val h = h1 ^ java.lang.Long.rotateLeft(h2, i)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2"); val h = ctx.freshName("h")
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $s = $arr.getStruct($j, 2);
         |  long $h1 = $s.getLong(0); long $h2 = $s.getLong(1);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $h = $h1 ^ java.lang.Long.rotateLeft($h2, $i);
         |    if ($h < $out[$i]) $out[$i] = $h;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j"); val b = ctx.freshName("b")
      val counts = ctx.freshName("counts"); val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($counts[$b] > 0) $sig |= (1L << $b); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** md5-seeded MinHash signature in ONE eval — the oracle-replayable q30
  * path's kernel (round-15 optimization): sig_i = min over shingles g of
  * the first 60 bits of md5("mh{i}|" ++ g). Byte-exact mirror of the
  * composed form `array((0 until n).map(i => array_min(transform(sh, g =>
  * conv(substring(md5(concat(lit("mh{i}|"), g)), 1, 15), 16, 10)
  * .cast(long)))))` — the first 15 hex nibbles of an md5 are the
  * big-endian first 8 digest bytes shifted right 4 — which ran
  * numHashes interpreted `transform` lambdas per row, each re-evaluating
  * concat + hex rendering + string base-16 parse per element (measured:
  * the whole cost of q30). One MessageDigest instance serves every
  * (shingle, seed) pair; salts are prebuilt bytes. Empty input arrays
  * yield all-null signatures exactly like array_min over an empty array.
  * Kernel/composed equality is fuzz-pinned in SketchExprsSpec. */
case class Md5MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(numHashes > 0 && numHashes <= 512)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i =>
      s"mh$i|".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](numHashes)) // array_min(empty) = null, per hash
    val out = Array.fill(numHashes)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    var j = 0
    while (j < n) {
      val bytes = arr.getUTF8String(j).getBytes
      var i = 0
      while (i < numHashes) {
        md.update(salts(i))
        md.update(bytes)
        md.digest(dig, 0, 16)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xFFL); b += 1 }
        h >>>= 4 // first 15 hex nibbles = top 60 bits
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(c: Expression): Md5MinHashSignature =
    copy(child = c)
  override def prettyName: String = "md5_minhash_signature"
}

/** First-60-bits-of-md5 per array element in ONE eval — the kernel behind
  * every per-token `transform(arr, t => md5h60(t))` (q29's simhash tokens,
  * rolling fingerprints): byte-exact mirror of
  * `conv(substring(md5(t), 1, 15), 16, 10).cast(long)` element-wise, with
  * null elements passing through as null (md5(null) = null). One
  * MessageDigest instance per eval instead of an interpreted
  * concat/hex/parse chain per element. Fuzz-pinned in SketchExprsSpec. */
case class Md5H60Array(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        md.update(arr.getUTF8String(j).getBytes)
        md.digest(dig, 0, 16)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xFFL); b += 1 }
        out(j) = h >>> 4
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Md5H60Array =
    copy(child = c)
  override def prettyName: String = "md5_h60_array"
}

/** Distinct word n-gram shingles in one pass (tokenize, lowercase, slide,
  * dedupe). The composed form (`split` + `transform`/`slice`/`concat_ws` +
  * `array_distinct`) builds hundreds of interpreted expression nodes per
  * row; this is a single eval with a hash set. Set-equal output (order may
  * differ — all consumers are set operations: jaccard, array_min, minhash).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = SketchExprs.sparkTokens(v.toString)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length < n) out.add(toks.mkString(" "))
    else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** Language-ID argmax in one tokenize-and-tally pass: tokens (whitespace
  * split of the trimmed, lowercased text) are looked up in a prebuilt
  * token -> profile-indexes map; the answer is the profile with the most
  * hits, ties to the first (profiles are sorted by code on construction, so
  * ties break alphabetically), "und" when nothing matches. Replaces one
  * interpreted `filter`/`isin` array pass PER PROFILE (the composed form in
  * TextAnalysis.langIdComposed, spec-pinned equal) with a single eval.
  */
case class LangIdArgmax(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(profiles.nonEmpty, "at least one language profile required")

  private val sorted = profiles.sortBy(_._1)
  @transient private lazy val langs: Array[org.apache.spark.unsafe.types.UTF8String] =
    sorted.map(p => org.apache.spark.unsafe.types.UTF8String.fromString(p._1)).toArray
  @transient private lazy val und = org.apache.spark.unsafe.types.UTF8String.fromString("und")
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    sorted.zipWithIndex.foreach { case ((_, words), i) =>
      // distinct: the composed isin form scores set membership, so a word
      // repeated within one profile must still count a token only once
      words.distinct.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val toks = SketchExprs.sparkTokens(v.toString)
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val hit = lookup.get(toks(i))
      if (hit != null) { var j = 0; while (j < hit.length) { counts(hit(j)) += 1; j += 1 } }
      i += 1
    }
    var best = 0; var bi = -1; var k = 0
    while (k < counts.length) { if (counts(k) > best) { best = counts(k); bi = k }; k += 1 }
    if (bi < 0) und else langs(bi)
  }

  override protected def withNewChildInternal(c: Expression): LangIdArgmax = copy(child = c)
  override def prettyName: String = "langid_argmax"
}

/** One-pass text scan stats for quality scoring — the counts behind
  * TextAnalysis.qualityScore's composed form, which ran ~6 passes per row
  * (three regex splits, two full-text regexp_replace, one interpreted
  * `filter`+`isin` over every token). Byte-exact contracts mirrored
  * (spec-pinned against the composed expressions in SketchExprsSpec):
  *
  *   - n_tokens = size(split(trim(c), "\\s+")): Spark trim strips ' '
  *     only; Java split with limit -1 keeps a leading empty token when the
  *     trimmed string starts with non-space whitespace and a trailing one
  *     when it ends with it; "" splits to [""] (count 1).
  *   - n_chars = length(c) in CODE POINTS (UTF8String.numChars).
  *   - punct = code points removed by regexp_replace(c, "[\\p{Punct}]", "")
  *     (Java \p{Punct} = the 32 ASCII punctuation chars).
  *   - hits = size(filter(split(trim(lower(c)), "\\s+"), isin(words))):
  *     token membership after lowercasing. Tokenwise toLowerCase(ROOT)
  *     equals whole-string lowering restricted to tokens (case mappings
  *     never produce whitespace; Greek final-sigma context is a non-letter
  *     at a token boundary either way). Tokens longer (in UTF-16 units)
  *     than the longest target word are skipped — lowering never shrinks
  *     a string, so they cannot match.
  *   - non_ws = length(regexp_replace(trim(c), "\\s+", "")) — code points
  *     outside Java regex \s = [ \t\n\x0B\f\r].
  */
case class TextQualityScore(child: Expression, words: Seq[String])
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // Returns the UNROUNDED score double (the caller applies Spark's
  // round(_, 6), keeping the final HALF_UP identical to the composed
  // form). Returning the score — not a counts struct — matters: struct
  // getField consumers expand to one kernel call per field reference
  // (eight per row in q25's plan, no common-subexpression factoring for
  // a CodegenFallback inside the projection), where one call per row is
  // the whole point.
  override def dataType: DataType = DoubleType

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }
  @transient private lazy val maxWordLen: Int =
    if (words.isEmpty) 0 else words.map(_.length).max

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def isPunct(cp: Int): Boolean =
    (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
      (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')

  // Composed-form null semantics, preserved exactly: on a NULL text the
  // composed expression yields 0.6, not NULL — `least` SKIPS null
  // operands, so lenScore and stopScore collapse to 1.0 while the
  // punct/word terms' `when` chains fall to their 0.0 otherwise-branches
  // (1.0·0.3 + 0.0·0.2 + 1.0·0.3 + 0.0·0.2). Spec-pinned in the fuzz set.
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0.6 else nullSafeEval(v)
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val len = s.length
    // whole-string counts (code points)
    var nChars = 0; var punct = 0; var nonWs = 0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (isPunct(cp)) punct += 1
      if (!isWs(cp)) nonWs += 1
      i += Character.charCount(cp)
    }
    // token walk over the space-trimmed slice (Spark trim strips ' ' only)
    var st = 0; var en = len
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    var nTokens = 0; var hits = 0
    if (st == en) nTokens = 1 // "" splits to [""]
    else {
      if (isWs(s.charAt(st))) nTokens += 1 // leading empty token
      var p = st
      while (p < en) {
        if (isWs(s.charAt(p))) p += 1
        else {
          val t0 = p
          while (p < en && !isWs(s.charAt(p))) p += 1
          nTokens += 1
          if (p - t0 <= maxWordLen &&
              wordSet.contains(s.substring(t0, p)
                .toLowerCase(java.util.Locale.ROOT))) hits += 1
        }
      }
      if (isWs(s.charAt(en - 1))) nTokens += 1 // trailing empty token
    }
    // the composed form's exact IEEE shape, left-associative:
    // lenScore*0.3 + punctScore*0.2 + stopScore*0.3 + wordScore*0.2
    val lenScore = math.min(nTokens.toDouble / 50.0, 1.0)
    val pr = if (nChars == 0) 0.0 else punct.toDouble / nChars
    val punctScore = 1.0 - math.min(pr * 5.0, 1.0)
    val hr = if (nTokens == 0) 0.0 else hits.toDouble / nTokens
    val stopScore = math.min(hr * 5.0, 1.0)
    val mtl = if (nTokens == 0) 0.0 else nonWs.toDouble / nTokens
    val wordScore = if (mtl >= 2.5 && mtl <= 12.0) 1.0 else 0.0
    lenScore * 0.3 + punctScore * 0.2 + stopScore * 0.3 + wordScore * 0.2
  }

  override protected def withNewChildInternal(c: Expression): TextQualityScore =
    copy(child = c)
  override def prettyName: String = "text_quality_score"
}

object SketchExprs {

  /** Byte-exact mirror of the composed `split(trim(lower(c)), "\\s+")`
    * tokenization the kernels replace: lowercase (ROOT), strip SPACES only
    * (Spark's `trim` touches only ' ', not tabs/controls), and Java-regex
    * split KEEPING trailing empty tokens (Spark's split uses limit -1).
    * Kernel/composed equality is fuzz-pinned in SketchExprsSpec.
    * Locale note: Spark's lower() falls back to default-locale lowercasing
    * for non-ASCII strings, so exact equality assumes a ROOT-like JVM
    * default locale (C/POSIX here); under e.g. a Turkish default locale
    * both forms change and only dotted/dotless-i inputs could diverge. */
  private[functions] def sparkTokens(raw: String): Array[String] = {
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    var st = 0
    var en = lower.length
    while (st < en && lower.charAt(st) == ' ') st += 1
    while (en > st && lower.charAt(en - 1) == ' ') en -= 1
    lower.substring(st, en).split("\\s+", -1)
  }

  def wordShingles(text: Column, n: Int): Column =
    column(WordShingles(expression(text), n))

  /** pairs: array<struct<h1:long, h2:long>> (Dedup.shingleHashPairs). */
  def minhashSignature(pairs: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(pairs), numHashes))

  /** shingles: array<string>; md5-seeded oracle-replayable signature. */
  def md5MinhashSignature(shingles: Column, numHashes: Int): Column =
    column(Md5MinHashSignature(expression(shingles), numHashes))

  /** tokens: array<string> -> array<long> of 60-bit md5 prefixes. */
  def md5H60Array(tokens: Column): Column =
    column(Md5H60Array(expression(tokens)))

  /** tokenHashes: array<long>. */
  def simhash64(tokenHashes: Column): Column =
    column(SimHash64(expression(tokenHashes)))

  /** text: string; profiles: (langCode, stopwords). */
  def langIdArgmax(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    column(LangIdArgmax(expression(text), profiles))

  /** text: string -> unrounded quality score (one pass; see the kernel). */
  def textQualityScore(text: Column, words: Seq[String]): Column =
    column(TextQualityScore(expression(text), words))
}
