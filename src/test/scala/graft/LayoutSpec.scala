package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Classifier, Dedup, Similarity}
import graft.plans.Layout

/** Layout tier (Z-order, compaction) + the round's scale operators
  * (classifier scoring, SemDeDup, prefix set-sim join). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- zorderKey
  test("zorderKey: interleaves bits exactly (hand-computed cases)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("x", "y")
      .select(Layout.zorderKey(Seq(col("x"), col("y")), bits = 3).as("z"))
      .as[Long].collect().toSeq
    // bit b of x -> 2b, of y -> 2b+1
    // (1,0)->1; (0,1)->2; (3,3)->15; (5,2)=(101,010)->x bits 0,2 / y bit 1
    //   -> 1<<0 | 1<<4 | 1<<3 = 25
    assert(out == Seq(0L, 1L, 2L, 15L, 25L))
  }

  test("zorderSummary: per-file spans beat a single-column sort on the second dimension") {
    val df = Tables.lineitem(spark, sf001).select("l_partkey", "l_suppkey")
    val files = Layout.zorderSummary(df, Seq("l_partkey", "l_suppkey"),
      bits = 8, nFiles = 64).collect()
    assert(files.map(_.getAs[Long]("n_rows")).sum == df.count())
    val Seq(loS, hiS) = df.agg(min("l_suppkey"), max("l_suppkey")).collect()
      .head.toSeq.map(_.asInstanceOf[Long]): @unchecked
    val globalSpan = (hiS - loS + 1).toDouble
    val meanSpan = files.map(r => r.getAs[Long]("max_l_suppkey") -
      r.getAs[Long]("min_l_suppkey") + 1).sum.toDouble / files.length
    // a partkey-only sort leaves suppkey spans ~global; Z-order must cut the
    // SECONDARY dimension's mean span well below half the global span
    assert(meanSpan < globalSpan / 2,
      s"mean suppkey span $meanSpan vs global $globalSpan")
  }

  test("zorderKey: rejects widths that overflow the contract") {
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq(col("x"), col("y")), bits = 26)
    }
  }

  // -------------------------------------------------------- compactionPlan
  test("compactionPlan: bins close at the target; oversized files land alone") {
    val files = Seq(
      ("p1", "a", 60L), ("p1", "b", 60L), ("p1", "c", 60L), // 60+60 cross at b
      ("p1", "d", 500L),                                    // oversized
      ("p2", "a", 10L), ("p2", "b", 10L), ("p2", "c", 10L)
    ).toDF("part", "file", "bytes")
    val plan = Layout.compactionPlan(files, "part", "file", "bytes", 100L)
      .select("part", "file", "bin").as[(String, String, Long)]
      .collect().map { case (p, f, b) => (p, f) -> b }.toMap
    assert(plan(("p1", "a")) == 0 && plan(("p1", "b")) == 0)
    assert(plan(("p1", "c")) == 1) // prefix 120 crossed the target
    assert(plan(("p1", "d")) == 1) // joins c's bin start, then closes it
    assert(plan(("p2", "a")) == 0 && plan(("p2", "c")) == 0) // tiny: one bin
  }

  test("compactionPlan: bin_bytes/bin_files aggregate per (part, bin)") {
    val files = Seq(("p", "a", 70L), ("p", "b", 70L), ("p", "c", 70L))
      .toDF("part", "file", "bytes")
    val rows = Layout.compactionPlan(files, "part", "file", "bytes", 100L)
      .select("file", "bin", "bin_bytes", "bin_files")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows(0) == (("a", 0L, 140L, 2L)))
    assert(rows(1) == (("b", 0L, 140L, 2L)))
    assert(rows(2) == (("c", 1L, 70L, 1L)))
  }

  // ------------------------------------------------------------ classifier
  test("classifier: scoring is a zero-exchange row-local projection") {
    // the r15 starved-scan fanout (Tables.documents) adds a RoundRobin
    // exchange at the loader — row-local by construction, allowed; the
    // SCORING itself must still introduce no keyed shuffle
    val plan = Classifier.scoreDocuments(Tables.documents(spark, sf001),
      "text", nClasses = 4).queryExecution.executedPlan.toString
    val keyed = plan.linesIterator.filter(_.contains("Exchange"))
      .filterNot(_.contains("RoundRobinPartitioning")).toSeq
    assert(keyed.isEmpty, s"unexpected shuffle in:\n$plan")
  }

  test("classifier: argmax ties break to the lowest class id") {
    // single empty-ish token doc: all classes see the same single bucket;
    // weights differ by class, so check the argmax rule on a real tie via
    // identical constructed scores instead: two docs, assert pred is the
    // argmax and within [0, nClasses)
    val out = Classifier.scoreDocuments(
      Seq((1L, "alpha beta gamma"), (2L, "x")).toDF("doc_id", "text"),
      "text", nClasses = 4).collect()
    out.foreach { r =>
      val scores = (0 until 4).map(k => r.getAs[Long](s"score_$k"))
      val best = scores.zipWithIndex.filter(_._1 == scores.max).map(_._2).min
      assert(r.getAs[Int]("pred_class") == best)
    }
  }

  test("classifier: identical text scores identically (pure function of text)") {
    val out = Classifier.scoreDocuments(
      Seq((1L, "same words here"), (2L, "same words here")).toDF("doc_id", "text"),
      "text", nClasses = 3).collect()
    val a = (0 until 3).map(k => out(0).getAs[Long](s"score_$k"))
    val b = (0 until 3).map(k => out(1).getAs[Long](s"score_$k"))
    assert(a == b)
  }

  // ------------------------------------------------------ setSimJoinPrefix
  test("setSimJoinPrefix: matches the naive exact join on a known corpus (losslessness)") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),          // J=1 with 1
      (3L, "a b c d x y z w"),          // J(1,3) = 4/12 = 1/3
      (4L, "a b c d e f q r"),          // J(1,4) = 6/10 = 0.6
      (5L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val tk = split(col("text"), " ")
    val got = Dedup.setSimJoinPrefix(docs, "doc_id", tk, tauNum = 1, tauDen = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("setSimJoinPrefix: threshold boundary is exact (integer gate, no float)") {
    // |A|=|B|=3, inter=2, union=4 -> J=1/2 exactly: must appear at tau=1/2
    // and vanish at tau=51/100
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val tk = split(col("text"), " ")
    assert(Dedup.setSimJoinPrefix(docs, "doc_id", tk, 1, 2).count() == 1)
    assert(Dedup.setSimJoinPrefix(docs, "doc_id", tk, 51, 100).count() == 0)
  }

  // ---------------------------------------------------------- semanticDedup
  test("semanticDedup: drops the larger id of a planted near-identical pair") {
    val cents = Similarity.pseudoCentroids(4, 8)
    // hash-mixed pseudo-random components: high-dim pairwise cosines stay
    // far from 1 (a smooth generator like sin(i*8+d) collapses every
    // vector into one 2-D subspace and everything near-duplicates)
    val base = (0 until 20).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (((i * 31 + d) * 2654435761L % 1000) / 1000.0 - 0.5).toFloat).toArray)
    }
    // plant an exact copy of vec 3 at id 103
    val emb = (base :+ (103L, base(3)._2)).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(emb, cents, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(3L) && !kept.contains(103L))
    assert(kept.size == 20)
  }

  // ------------------------------------------------------------ trimToBudget
  test("trimToBudget: keeps best-first while the exclusive shard sum is under budget") {
    // one shard: weights 10 each, scores descending by id inverse
    val docs = Seq((0L, 10L, 5.0), (8L, 10L, 4.0), (16L, 10L, 3.0), (24L, 10L, 2.0))
      .toDF("doc_id", "w", "s")
    val kept = graft.pipeline.Curation.trimToBudget(docs, "doc_id",
        col("w"), col("s"), budget = 25L, numShards = 1)
      .select("id").as[Long].collect().toSet
    // exclusive sums 0,10,20,30 vs budget 25: the 30 one drops
    assert(kept == Set(0L, 8L, 16L))
  }

  test("trimToBudget: score ties break to the smaller id; shards are independent") {
    val docs = Seq((1L, 10L, 1.0), (3L, 10L, 1.0), (5L, 10L, 1.0), // shard 1
                   (2L, 10L, 1.0))                                 // shard 0
      .toDF("doc_id", "w", "s")
    val kept = graft.pipeline.Curation.trimToBudget(docs, "doc_id",
        col("w"), col("s"), budget = 40L, numShards = 2)
      .select("id").as[Long].collect().toSet
    // per-shard budget 20: shard 1 keeps ids 1,3 (tie order by id); shard 0 keeps 2
    assert(kept == Set(1L, 3L, 2L))
  }

  // --------------------------------------------------- curriculumInterleave
  test("curriculumInterleave: per-source quality ranks; (rank, source) order round-robins") {
    val docs = Seq((1L, "a", 0.9), (2L, "a", 0.5), (3L, "b", 0.7), (4L, "b", 0.8))
      .toDF("doc_id", "src", "q")
    val out = graft.pipeline.Curation.curriculumInterleave(docs, "doc_id", "src",
        col("q"))
      .orderBy("rank_in_source", "source")
      .select("id").as[Long].collect().toSeq
    // rank 1: a->1 (0.9), b->4 (0.8); rank 2: a->2, b->3
    assert(out == Seq(1L, 4L, 2L, 3L))
  }

  // -------------------------------------------------- data-skipping proof
  test("z-ordered layout skips files on the SECONDARY dimension; single-column sort cannot") {
    val df = Tables.lineitem(spark, sf001).select("l_partkey", "l_suppkey")
    val Seq(lo1, hi1, lo2, hi2) = df.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect().head.toSeq
      .map(_.asInstanceOf[Long]): @unchecked
    val zkey = Layout.zorderKey(Seq(
      Layout.quantize(col("l_partkey"), lit(lo1), lit(hi1), 8),
      Layout.quantize(col("l_suppkey"), lit(lo2), lit(hi2), 8)), 8)
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    df.withColumn("__z", zkey).repartitionByRange(32, col("__z"))
      .drop("__z").write.mode("overwrite").parquet(s"$tmp/zorder")
    df.repartitionByRange(32, col("l_partkey"))
      .write.mode("overwrite").parquet(s"$tmp/bypart")
    // files CONTAINING matching rows = what min/max footer stats let a
    // reader skip; a suppkey-band filter is the case a partkey sort can't
    // help with
    val band = col("l_suppkey") >= lo2 && col("l_suppkey") <= lo2 + (hi2 - lo2) / 8
    def touched(path: String): Long = spark.read.parquet(path).filter(band)
      .select(input_file_name()).distinct().count()
    val byPart = touched(s"$tmp/bypart")
    val byZ = touched(s"$tmp/zorder")
    assert(byPart >= 30, s"partkey sort should leave the band in ~every file, got $byPart")
    assert(byZ <= byPart / 2,
      s"z-order must cluster the secondary dimension: $byZ vs $byPart files")
  }

  // ------------------------------------------------------------ mineTriplets
  test("mineTriplets: planted positive pairs mine with a deterministic cross-cell negative") {
    val cents = Similarity.pseudoCentroids(4, 8)
    val base = (0 until 24).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (((i * 37 + d) * 2654435761L % 1000) / 1000.0 - 0.5).toFloat).toArray)
    }
    val emb = (base :+ (103L, base(3)._2)).toDF("vec_id", "embedding")
    val out = Similarity.mineTriplets(emb, cents, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the planted copy is the only pair at cos >= 0.999
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((3L, 103L)))
    val neg = out.head._3
    // negative exists, differs from both, and is a cell minimum
    assert(neg != 3L && neg != 103L)
    val cellMins = Similarity.ivfAssign(emb, cents)
      .groupBy("centroid").agg(min(col("vec_id")).as("m"))
      .select("m").as[Long].collect().toSet
    assert(cellMins.contains(neg))
  }

  // --------------------------------------------------------- allocateEvalSet
  test("allocateEvalSet: largest-remainder seats, exact total, deterministic ties") {
    import graft.pipeline.Curation
    // counts 5/3/2 over k=7: quotas 35/21/14 of N=10 -> base 3/2/1 (sum 6),
    // remainders 5/1/4 -> the 1 leftover seat goes to "a" (rem 5)
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("source")
    val out = Curation.allocateEvalSet(df, "source", k = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(out.values.sum == 7L)
  }

  // ----------------------------------------------------- columnChunkProfile
  test("columnChunkProfile: footer value counts and byte totals match the " +
    "written table across multiple files") {
    import graft.plans.Layout
    val dir = java.nio.file.Files.createTempDirectory("chunkprof").toString
    spark.range(10000)
      .select(col("id"), (col("id") % 7).cast("string").as("s"))
      .repartition(3).write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size == 3)
    val prof = Layout.columnChunkProfile(spark, files)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("id", "s"))
    Seq("id", "s").foreach { c =>
      assert(prof(c).getAs[Long]("n_values") == 10000L,
        s"footer value count for $c")
      assert(prof(c).getAs[Long]("n_chunks") >= 3L)
      assert(prof(c).getAs[Long]("compressed_bytes") > 0L &&
        prof(c).getAs[Double]("ratio") > 0.0)
    }
  }
}
