package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, TextAnalysis => TA}

/** Invariant sweeps for the round-5 curation operators: each test runs the
  * Spark expression over a generated input family and checks it against a
  * plain-Scala reference implementation or an analytic bound — the
  * property-test complement to the hand-picked cases in PipelineSpec.
  */
class PipelineInvariantsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens sweep: equals the per-row reference for every (window, stride) shape") {
    // doc n has exactly n tokens (n=0 is the empty-text edge: tokens("") =
    // [""]); unicode tokens + double-space separators pin the kernel's
    // byte-level md5 against the reference (UTF-8 ranges, not char counts)
    def tok(i: Int) = s"wé$i"
    val docs = (0 to 15).map(n => (n.toLong, (1 to n).map(tok).mkString("  ")))
      .toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (w <- Seq(1, 3, 5); s <- Seq(1, math.max(w / 2, 1), w).distinct) {
      val got = Curation.chunkByTokens(docs, "doc_id", "text", w, s)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4))).toSet
      val want = (0 to 15).flatMap { n =>
        val toks = if (n == 0) Seq("") else (1 to n).map(tok)
        val nTok = toks.length
        val nChunks = 1 + math.max(0, math.ceil((nTok - w).toDouble / s).toInt)
        (0 until nChunks).map { c =>
          val start = c * s + 1
          (n.toLong, c, start, math.min(w, nTok - start + 1),
            md5hex(toks.slice(start - 1, start - 1 + w).mkString(" ")))
        }
      }.toSet
      assert(got == want, s"window=$w stride=$s")
    }
  }

  test("charEntropy: in [0, ln(distinct chars)], permutation-invariant") {
    val rnd = new scala.util.Random(42)
    val strs = Seq.tabulate(100) { _ =>
      Seq.fill(1 + rnd.nextInt(40))(('a' + rnd.nextInt(5)).toChar).mkString
    }
    val got = strs.toDF("text")
      .select(col("text"), TA.charEntropy(col("text")).as("h"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    got.foreach { case (s, h) =>
      val k = s.toSet.size
      assert(h >= -1e-6 && h <= math.log(math.max(k, 1)) + 1e-6,
        s"H=$h out of [0, ln($k)] for '$s'")
    }
    // permutation invariance: the sorted string has the same distribution
    val pairs = strs.map(s => (s, s.sorted.mkString)).toDF("a", "b")
      .select(TA.charEntropy(col("a")) - TA.charEntropy(col("b")))
      .as[Double].collect()
    assert(pairs.forall(d => math.abs(d) < 1e-9))
  }

  test("capPerGroup equals the naive rank for random skew at every oversample") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // zipf-ish skew: group g_i holds ~1000/(i+1) rows
    val rows = (0 until 8).flatMap { g =>
      Seq.fill(1000 / (g + 1))((s"g$g", rnd.nextLong()))
    }
    val df = rows.toDF("g", "id")
    val h = substring(md5(concat(lit("s9"), col("id").cast("string"))), 1, 8)
    val want = df.withColumn("h", h)
      .withColumn("r", row_number().over(Window.partitionBy("g").orderBy(col("h"), col("id"))))
      .filter(col("r") <= 3).select("g", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (os <- Seq(1, 2, 8)) {
      val got = Curation.capPerGroup(df, "g", "id", "s9", k = 3, oversample = os)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"oversample=$os")
    }
  }

  test("topKPerGroup equals the naive rank for random scores, skew, ties, and rescue") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    // skewed groups, deliberately collision-heavy scores to exercise ties
    val rows = (0 until 6).flatMap { g =>
      Seq.fill(800 / (g + 1))((s"g$g", rnd.nextLong(), (rnd.nextInt(20) / 4).toDouble))
    } ++ Seq.fill(5)((null: String, rnd.nextLong(), 1.0))
    val df = rows.toDF("g", "id", "score")
    val want = df
      .withColumn("r", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .filter(col("r") <= 4).select("g", "id")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    for (os <- Seq(1, 8)) {
      val got = graft.pipeline.Curation.topKPerGroup(df, "g", "score", "id",
          k = 4, oversample = os)
        .select("g", "id")
        .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
      assert(got == want, s"oversample=$os")
    }
  }

  test("rangeJoin equals the naive inequality join on random intervals") {
    val rnd = new scala.util.Random(11)
    val keys = Seq.fill(300)(rnd.nextInt(1000).toLong).toDF("k")
    val iv = Seq.tabulate(40) { i =>
      val lo = rnd.nextInt(950).toLong
      (s"i$i", lo, lo + 1 + rnd.nextInt(120).toLong)
    }.toDF("iv_id", "lo", "hi")
    val naive = keys.crossJoin(iv)
      .filter(col("k") >= col("lo") && col("k") <= col("hi"))
      .select("k", "iv_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    for (w <- Seq(7L, 64L, 2048L)) {
      val got = graft.operators.Ops.rangeJoin(keys, "k", iv, "lo", "hi", w)
        .select("k", "iv_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == naive, s"bucketWidth=$w")
    }
  }
}
