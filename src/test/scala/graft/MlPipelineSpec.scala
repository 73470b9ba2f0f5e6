package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Ops
import graft.pipeline.{EventAnalytics, Graph, Similarity, Stats,
  TextAnalysis => TA}

/** Unit specs for the ML-pipeline wave (q184–q192) on adversarial
  * micro-fixtures: argmin/election tie-breaks, the clamped-level closed form
  * vs the sequential recurrence, bounded-round SSSP semantics, empty-side
  * drift guards.
  */
class MlPipelineSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- qiniDeciles ±0.0 pin
  test("qiniDeciles: a tiny-negative uplift rounds to POSITIVE zero (the q321 -0.0 class)") {
    // hand-built so bin 1's closed form is 29 - 7·(29/7) = -3.55e-15 — a
    // true tiny NEGATIVE whose 6dp round is zero. Spark's BigDecimal round
    // cannot emit -0.0; this pins that bit-level contract (the driver's
    // hash is byte-sensitive, and DuckDB's float round DOES preserve the
    // sign — which is why Registry.normalizeNegativeZero exists on the
    // oracle side). Bits must be exactly +0.0, not just == 0.0.
    val rows =
      (1 to 29).map(i => (i.toLong, 1000L - i, true, true)) ++   // bin1 treated conv
      (30 to 36).map(i => (i.toLong, 1000L - i, false, true)) ++ // bin1 ctrl conv
      (37 to 72).map(i => (i.toLong, 1000L - i, false, false))   // bin2 ctrl non-conv
    val df = rows.toDF("id", "score", "t", "c")
    val got = Stats.qiniDeciles(df, col("id"), col("score"), col("t"),
        col("c"), nBins = 2)
      .orderBy("decile").collect()
    val u1 = got(0).getAs[Double]("uplift")
    assert(u1 == 0.0, s"bin-1 uplift should round to zero: $u1")
    assert(java.lang.Double.doubleToRawLongBits(u1) == 0L,
      "emitted zero must be +0.0 — a -0.0 here hash-diverges from the oracle")
    // sanity on the fixture: the PRE-round closed form really is negative
    val pre = 29.0 - 7.0 * (29.0 / 7.0)
    assert(pre < 0.0 && math.abs(pre) < 1e-9, s"fixture drifted: $pre")
  }

  // ------------------------------------------------------------ pqEncode
  test("pqEncode: every code is the true per-subspace argmin; one row per (id, subspace)") {
    val emb = Tables.embeddings(spark, sf0001).limit(20).cache()
    val out = Similarity.pqEncode(emb, nSub = 4, subDim = 16, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val cb = Similarity.pqCodebooks(4, 16, 8)
      .groupBy(_._1).map { case (m, rs) => m -> rs.sortBy(_._2).map(_._3) }
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
    assert(out.size == vecs.length * 4)
    vecs.foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble)
      for (m <- 0 until 4) {
        val sub = v.slice(m * 16, (m + 1) * 16)
        val best = (0 until 8).map { c =>
          val d2 = sub.zip(cb(m)(c)).foldLeft(0.0) { case (a, (x, y)) =>
            a + (x - y) * (x - y) }
          (d2, c)
        }.min._2
        assert(out((id, m)) == best, s"vec $id subspace $m")
      }
    }
  }

  test("pqEncode: exact centroid match wins with distance 0; centroid-id tie-break") {
    // a vector equal to codebook centroid 3 of every subspace must encode as 3
    val cb = Similarity.pqCodebooks(2, 4, 4)
      .groupBy(_._1).map { case (m, rs) => m -> rs.sortBy(_._2).map(_._3) }
    val v = (cb(0)(3) ++ cb(1)(3)).map(_.toFloat)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(df, nSub = 2, subDim = 4, k = 4)
      .orderBy("subspace").select("code").as[Int].collect()
    assert(codes.toSeq == Seq(3, 3))
  }

  // ------------------------------------------------------- recommendTopK
  test("recommendTopK: scores sum pruned-neighbor cosines; owned items excluded") {
    // users 1..3 share items: u1{a,b} u2{a,b} u3{b,c}
    val b = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "b"), (3L, "c"))
      .toDF("u", "i")
    val out = EventAnalytics.recommendTopK(b, "u", "i", k = 2, minUsers = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    // cosines: (a,b): 2/sqrt(2*3)=0.816497  (b,c): 1/sqrt(3*1)=0.57735
    // (a,c): 0 users together -> no pair row at all
    // u1 candidates: c via b: 0.577350; u3 candidates: a via b: 0.816497
    assert(out((1L, "c"))._1 == 0.57735 && out((1L, "c"))._2 == 1)
    assert(out((3L, "a"))._1 == 0.816497 && out((3L, "a"))._2 == 1)
    // owned items never recommended
    assert(!out.contains((1L, "a")) && !out.contains((1L, "b")))
  }

  test("recommendTopK: minSim prunes weak similarity edges before the " +
    "neighbor rank; default 0 keeps them") {
    // same fixture as above: sim(a,b) = 0.816497, sim(b,c) = 0.577350;
    // a 0.7 floor kills the (b,c) edge, so u1 loses its only candidate
    // while u3's a-via-b recommendation (0.816497) survives untouched
    val b = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "b"), (3L, "c"))
      .toDF("u", "i")
    val out = EventAnalytics.recommendTopK(b, "u", "i", k = 2, minUsers = 1L,
        minSim = 0.7)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    assert(out == Map((3L, "a") -> (0.816497, 1)), s"minSim output: $out")
  }

  test("recommendTopK: maxNeighbors prunes the similarity fan-out") {
    // star: item z co-occurs with a,b,c; with maxNeighbors=1 only the
    // strongest neighbor of each owned item can be recommended
    val b = Seq((1L, "z"), (1L, "a"), (2L, "z"), (2L, "a"), (3L, "z"), (3L, "b"),
      (4L, "z"), (4L, "c"), (9L, "z"))
      .toDF("u", "i")
    val out = EventAnalytics.recommendTopK(b, "u", "i", k = 5, minUsers = 1L,
        maxNeighbors = 1)
      .filter(col("user") === 9L).select("item").as[String].collect().toSet
    // z's top neighbor is a (2 shared users); b and c rank below and are cut
    assert(out == Set("a"))
  }

  test("recommendTopK: maxBasket caps the pair stage; scoring and exclusion keep the full basket") {
    // user-salted md5("cc|u|X") order (independently computed): u1 keeps
    // {A, B}, u2 keeps {A, C} — per-basket independent draws, so different
    // items are dropped per user. u1/u2 own all three; u3 owns only B.
    val b = Seq((1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "C"), (3L, "B")).toDF("u", "i")
    val out = EventAnalytics.recommendTopK(b, "u", "i", k = 3, minUsers = 1L,
        maxNeighbors = 5, maxBasket = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    // surviving pairs: (A,B) from u1, (A,C) from u2; capped marginals
    // A=2, B=2 (u3's singleton basket is under the cap), C=1 ->
    // sim(A,B) = 1/sqrt(4) = 0.5. u3 owns B, gets A via sim(A,B).
    assert(out == Map((3L, "A") -> (0.5, 1)),
      s"capped recommender output: $out")
    // the exclusion anti join ran on the FULL basket: u1/u2 own all of
    // A/B/C (including items the cap dropped from the pair stage) —
    // neither is recommended anything
    assert(!out.keys.exists(_._1 <= 2L))
  }

  // ------------------------------------------------------ ssspDistances
  test("ssspDistances: min-plus relaxation finds the cheaper two-hop path") {
    //   1 -(5)- 2 -(1)- 3   and 1 -(10)- 3: dist(3) must be 6, not 10
    val e = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L)).toDF("s", "d", "w")
    val seeds = Seq(Tuple1(1L)).toDF("n")
    val out = Graph.ssspDistances(e, "s", "d", "w", seeds, "n", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 5L, 3L -> 6L))
  }

  test("ssspDistances: bounded rounds expose only <= r-edge paths; parallel edges keep the min weight") {
    val e = Seq((1L, 2L, 7L), (1L, 2L, 3L), (2L, 3L, 3L), (3L, 4L, 3L))
      .toDF("s", "d", "w")
    val seeds = Seq(Tuple1(1L)).toDF("n")
    val r1 = Graph.ssspDistances(e, "s", "d", "w", seeds, "n", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 0L, 2L -> 3L), s"unexpected: $r1") // node 3 unreached
    val r3 = Graph.ssspDistances(e, "s", "d", "w", seeds, "n", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3(4L) == 9L && r3(3L) == 6L)
  }

  // ----------------------------------------------------- rakeKeywords
  test("rakeKeywords: degree counts phrase co-occurrence, freq counts occurrences") {
    val docs = Seq("The red panda and the red fox!").toDF("text")
    // phrases: "red panda", "red fox" -> red: freq 2, degree 4, score 2.0
    val out = TA.rakeKeywords(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out("red") == ((2L, 4L, 2.0)))
    assert(out("panda") == ((1L, 2L, 2.0)))
    assert(out("fox") == ((1L, 2L, 2.0)))
    assert(!out.contains("the") && !out.contains("and"))
  }

  test("rakeKeywords: punctuation splits nothing by itself — only stopwords delimit") {
    // RAKE's classic property via our simplification: non-letters collapse
    // to spaces, so "machine-learning systems" is ONE 3-word phrase
    val docs = Seq(Tuple1("machine-learning systems")).toDF("text")
    val out = TA.rakeKeywords(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("machine") == 3L && out("learning") == 3L && out("systems") == 3L)
  }

  // ------------------------------------------------- clampedRunningLevel
  test("clampedRunningLevel: closed form equals the sequential recurrence") {
    val deltas = Seq(5L, -10L, 3L, -1L, 8L, -100L, 4L)
    val df = deltas.zipWithIndex.map { case (d, i) => ("k", i, d) }
      .toDF("key", "ord", "d")
    val out = Stats.clampedRunningLevel(df, "key", col("d"), Seq(col("ord")))
      .collect().head
    // sequential: 5,0,3,2,10,0,4 -> final 4, peak 10
    assert(out.getAs[Long]("final_level") == 4L)
    assert(out.getAs[Long]("peak_level") == 10L)
    assert(out.getAs[Long]("n_moves") == deltas.size.toLong)
  }

  test("clampedRunningLevel: keys are independent; all-negative stays floored at zero") {
    val df = Seq(("a", 1, -5L), ("a", 2, -5L), ("b", 1, 7L), ("b", 2, -3L))
      .toDF("key", "ord", "d")
    val out = Stats.clampedRunningLevel(df, "key", col("d"), Seq(col("ord")))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("final_level"), r.getAs[Long]("peak_level"))).toMap
    assert(out("a") == ((0L, 0L)))
    assert(out("b") == ((4L, 7L)))
  }

  // ------------------------------------------------------- survivorship
  test("survivorship: mode elections break count ties on the smaller value; nulls never win") {
    val df = Seq(
      ("c1", "en", 1L, 10L), ("c1", "en", 2L, 20L), ("c1", "fr", 3L, 30L),
      ("c2", "de", 4L, 40L), ("c2", "es", 5L, 50L), // tie -> de (asc)
      ("c3", null, 6L, 60L), ("c3", "it", 7L, 70L)  // null loses
    ).toDF("cluster", "lang", "id", "n")
    val out = Stats.survivorship(df, "cluster", Seq("lang"), Seq("id"), Seq("n"))
      .collect().map(r => r.getString(0) -> (r.getAs[String]("mode_lang"),
        r.getAs[Long]("min_id"), r.getAs[Long]("max_n"),
        r.getAs[Long]("n_members"))).toMap
    assert(out("c1") == (("en", 1L, 30L, 3L)))
    assert(out("c2") == (("de", 4L, 50L, 2L)))
    assert(out("c3") == (("it", 6L, 70L, 2L)))
  }

  test("survivorship: an all-null mode column yields a null election, not a dropped cluster") {
    val df = Seq(("c1", Option.empty[String], 1L)).toDF("cluster", "lang", "id")
    val out = Stats.survivorship(df, "cluster", Seq("lang"), Seq("id"), Nil)
      .collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("mode_lang")))
  }

  // ------------------------------------------------------- profileDrift
  test("profileDrift: null-rate and distinct movement; empty side reports null ratios") {
    val before = Seq(("a", Some(1)), ("b", Some(2)), ("c", None))
      .toDF("s", "v")
    val after = Seq(("a", Some(1)), ("a", None), ("a", None), ("a", Some(9)))
      .toDF("s", "v")
    val out = Ops.profileDrift(before, after, Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("v").getDouble(1) == 0.333333) // 1/3 nulls before
    assert(out("v").getDouble(2) == 0.5)
    assert(out("s").getLong(3) == 3L && out("s").getLong(4) == 1L)
    assert(out("s").getDouble(5) == 0.333333)
    val empty = before.filter(lit(false))
    val guarded = Ops.profileDrift(empty, after, Seq("s")).collect().head
    assert(guarded.isNullAt(1) && guarded.isNullAt(5))
  }

  // ----------------------------------------------- seasonalNaiveBacktest
  test("seasonalNaiveBacktest: pred(d) = actual(d - season) over the zero-filled spine") {
    // days 0..9, one event per day except day 8 (two events, day 3 zero)
    val days = Seq(0, 1, 2, 4, 5, 6, 7, 8, 8, 9)
    val df = days.map(d => Tuple1(new java.sql.Timestamp(d * 86400000L)))
      .toDF("ts")
    val out = EventAnalytics.seasonalNaiveBacktest(df, "ts", season = 7,
        horizon = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(7L) == ((1L, 1L, 0L))) // pred = day 0
    assert(out(8L) == ((2L, 1L, 1L))) // pred = day 1
    assert(out(9L) == ((1L, 1L, 0L))) // pred = day 2
  }

  // -------------------------------------------------- dailyUniqueReport
  test("dailyUniqueReport: exact counts with an in-tolerance sketch flag") {
    val df = (1 to 50).map(i => (i.toLong % 7,
      new java.sql.Timestamp(86400000L + i))).toDF("u", "ts")
    val out = EventAnalytics.dailyUniqueReport(df, "u", "ts").collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 50L && out.head.getLong(2) == 7L)
    assert(out.head.getBoolean(3))
  }

  // ----------------------------------------------------------- scdLookup
  test("scdLookup: facts land in their containing version; pre-history facts drop") {
    val dim = Seq(
      (1L, "bronze", 100L, Some(200L), 1L),
      (1L, "gold", 200L, None, 2L)
    ).toDF("k", "state", "valid_from", "valid_to", "version")
    val facts = Seq((10L, 1L, 50L), (11L, 1L, 100L), (12L, 1L, 199L),
      (13L, 1L, 200L), (14L, 1L, 999L), (15L, 2L, 500L))
      .toDF("fid", "fk", "fus")
    val out = EventAnalytics.scdLookup(facts, "fk", col("fus"), dim, "k")
      .select("fid", "state", "version")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(
      11L -> (("bronze", 1L)), 12L -> (("bronze", 1L)), // [from, to)
      13L -> (("gold", 2L)), 14L -> (("gold", 2L))))    // open current
    assert(!out.contains(10L) && !out.contains(15L))
  }

  // --------------------------------------------------------- pqSearchTopK
  test("pqSearchTopK: ADC ranks match a driver-side recompute over the same codes") {
    val emb = Tables.embeddings(spark, sf0001).limit(60).cache()
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Similarity.pqSearchTopK(emb, queries, nSub = 4, subDim = 16,
        k = 8, topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val cb = Similarity.pqCodebooks(4, 16, 8)
      .groupBy(_._1).map { case (m, rs) => m -> rs.sortBy(_._2).map(_._3) }
    val codes = Similarity.pqEncode(emb, 4, 16, 8)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => r.getInt(1) -> r.getInt(2)).toMap }
    val qv = emb.filter(col("vec_id") < 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    qv.foreach { case (q, v) =>
      val byId = codes.toSeq.filter(_._1 != q).map { case (id, cs) =>
        val d = (0 until 4).map { m =>
          val vm = v.slice(m * 16, (m + 1) * 16)
          val c = cb(m)(cs(m))
          val dot = vm.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
          val vv = vm.foldLeft(0.0)((a, x) => a + x * x)
          val cc = c.map(x => x * x).sum
          BigDecimal(vv - 2.0 * dot + cc).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        (d, id)
      }.sorted.take(3).map(_._2)
      byId.zipWithIndex.foreach { case (id, i) =>
        assert(got((q, i + 1)) == id, s"query $q rank ${i + 1}")
      }
    }
  }

  // ---------------------------------------------------- dailySnapshotFfill
  test("dailySnapshotFfill: silence carries the last state; same-day ties pick the later event") {
    def ts(day: Long, ms: Long) = new java.sql.Timestamp(day * 86400000L + ms)
    val df = Seq(
      (1L, 100L, ts(0, 1000), 5.0), (1L, 101L, ts(0, 1000), 7.0), // tie -> id 101
      (1L, 102L, ts(3, 0), 9.0),
      (2L, 200L, ts(2, 0), 1.0)
    ).toDF("u", "eid", "ts", "v")
    val out = EventAnalytics.dailySnapshotFfill(df, "u", "eid", "ts", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 0L)) == 7.0) // same-µs tie broken by event id
    assert(out((1L, 1L)) == 7.0 && out((1L, 2L)) == 7.0) // carried
    assert(out((1L, 3L)) == 9.0)
    assert(out((2L, 2L)) == 1.0 && out((2L, 3L)) == 1.0) // to corpus max day
    assert(!out.contains((2L, 1L))) // before key's first day: no row
  }

  // --------------------------------------------------------- activityGaps
  test("activityGaps: gaps below the floor drop; boundaries are the silent days") {
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val df = Seq((1L, ts(0)), (1L, ts(2)), (1L, ts(6)), // gaps of 1 and 3 days
      (2L, ts(10)), (2L, ts(11))) // gap of 0
      .toDF("u", "ts")
    val out = EventAnalytics.activityGaps(df, "u", "ts", minGapDays = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 5L, 3L)))
  }

  // -------------------------------------------------------- markovBacktest
  test("markovBacktest: modal successor with tie-break; unseen antecedents drop") {
    def ts(i: Long) = new java.sql.Timestamp(i * 1000L)
    // user 1 trains a->b, a->b, a->c (model: a->b); user 2 tests a->b, a->c
    val split = 100L * 1000000L // = micros of ts(100)
    val df = Seq(
      (1L, 1L, ts(1), "a"), (1L, 2L, ts(2), "b"), (1L, 3L, ts(3), "a"),
      (1L, 4L, ts(4), "b"), (1L, 5L, ts(5), "a"), (1L, 6L, ts(6), "c"),
      (2L, 7L, ts(200), "a"), (2L, 8L, ts(201), "b"),
      (2L, 9L, ts(202), "a"), (2L, 10L, ts(203), "c"),
      (3L, 11L, ts(204), "z"), (3L, 12L, ts(205), "b") // z unseen in train
    ).toDF("u", "eid", "ts", "ty")
    val out = EventAnalytics.markovBacktest(df, "u", "eid", "ts", "ty", split)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("a") == (("b", 2L, 1L, 0.5)))
    assert(!out.contains("z"))
  }

  // ----------------------------------------------------- linearAttribution
  test("linearAttribution: value splits equally across the pre-purchase segment; trailing touches get nothing") {
    def ts(i: Long) = new java.sql.Timestamp(i * 1000L)
    val df = Seq(
      (1L, 1L, ts(1), "view", 0.0), (1L, 2L, ts(2), "click", 0.0),
      (1L, 3L, ts(3), "purchase", 10.0),
      (1L, 4L, ts(4), "view", 0.0), (1L, 5L, ts(5), "purchase", 6.0),
      (1L, 6L, ts(6), "view", 0.0) // after the last purchase: no credit
    ).toDF("u", "eid", "ts", "ty", "v")
    val out = EventAnalytics.linearAttribution(df, "u", "eid", "ts", "ty",
        "purchase", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // purchase 3 (10.0) splits across view+click (5 each); purchase 5 (6.0)
    // goes wholly to the view at ts 4
    assert(out("view") == ((2L, 11.0)))
    assert(out("click") == ((1L, 5.0)))
  }

  // ------------------------------------------- partial aggregates / merge
  test("mergePartialAggregates: any sharding merges to the direct aggregate; nulls don't count") {
    val df = Seq(("a", Some(1.5)), ("a", Some(2.5)), ("a", None),
      ("b", Some(-1.0)), ("b", Some(4.0)), ("a", Some(0.25)))
      .toDF("k", "v")
    val direct = Ops.partialAggregate(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    for (nShards <- Seq(2, 3)) {
      val shards = (0 until nShards).map(i => Ops.partialAggregate(
        df.withColumn("__r", monotonically_increasing_id())
          .filter(pmod(col("__r"), lit(nShards)) === i).drop("__r"),
        Seq("k"), "v"))
      val merged = Ops.mergePartialAggregates(shards, Seq("k"))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(merged == direct, s"$nShards-way sharding diverged")
    }
    assert(direct("a").head == 3L) // the null never counted
  }

  // ------------------------------------------------------------- cdcApply
  test("cdcApply: latest instruction wins; deletes drop; re-insert after delete revives") {
    val base = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "x2", 11.0, 1L, "U"), (1L, "x3", 12.0, 2L, "U"), // latest U wins
      (2L, "y", 20.0, 1L, "D"),                              // deleted
      (3L, "z", 30.0, 1L, "D"), (3L, "z9", 99.0, 2L, "U")    // revived
    ).toDF("k", "name", "bal", "version", "op")
    val out = Ops.cdcApply(base, changes, "k", "version", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(1L -> (("x3", 12.0)), 3L -> (("z9", 99.0))))
  }

  test("cdcApply: untouched base rows pass through; U beats D at an equal version") {
    val base = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val changes = Seq((2L, 7.0, 3L, "D"), (2L, 7.0, 3L, "U"))
      .toDF("k", "v", "version", "op")
    val out = Ops.cdcApply(base, changes, "k", "version", "op")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 5.0, 2L -> 7.0))
  }

  test("cdcApply: a change at the base's own version still beats the base deterministically") {
    // contract violation (change version == baseVersion): the change-over-
    // base tie-break resolves it to the change, never arbitrarily
    val base = Seq((1L, 5.0)).toDF("k", "v")
    val upd = Seq((1L, 9.0, 0L, "U")).toDF("k", "v", "version", "op")
    assert(Ops.cdcApply(base, upd, "k", "version", "op")
      .collect().map(r => r.getDouble(1)).toSeq == Seq(9.0))
    val del = Seq((1L, 5.0, 0L, "D")).toDF("k", "v", "version", "op")
    // D at the tied version loses to the base's implicit U by op order —
    // documented: only versions ABOVE base reliably delete
    assert(Ops.cdcApply(base, del, "k", "version", "op").count() == 1L)
  }

  // -------------------------------------------------------- ratioToParent
  test("ratioToParent: shares are exact ratios of decimal sums; parent shares repeat per child") {
    val df = Seq(("P1", "c1", 1.0), ("P1", "c1", 2.0), ("P1", "c2", 1.0),
      ("P2", "c3", 4.0)).toDF("p", "c", "v")
    val out = Stats.ratioToParent(df, Seq("p"), Seq("c"), "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(("P1", "c1")) == ((3.0, 0.75, 0.5)))
    assert(out(("P1", "c2")) == ((1.0, 0.25, 0.5)))
    assert(out(("P2", "c3")) == ((4.0, 1.0, 0.5)))
  }

  // -------------------------------------------------- weightedLowerMedian
  test("weightedLowerMedian: crossing row at ceil((W+1)/2); duplicate values pool weights") {
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 2.0, 1L), ("g", 9.0, 1L),
      ("h", 5.0, 10L), ("h", 6.0, 1L))
      .toDF("grp", "v", "w")
    val out = Stats.weightedLowerMedian(df, Seq("grp"), "v", "w")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2))).toMap
    // g: W=4, threshold ceil(5/2)=3 -> cum 1,3,4: value 2.0 crosses
    assert(out("g") == ((2.0, 4L)))
    // h: W=11, threshold 6 -> value 5.0 (weight 10) crosses immediately
    assert(out("h") == ((5.0, 11L)))
  }

  // ------------------------------------------------------ forecastAccuracy
  test("forecastAccuracy: integer MAEs and MASE over the backtest tail") {
    // 14 days, counts = 1 except day 10 has 3: within horizon 7 (days
    // 7..13, all with both lags), seasonal errors |n(d)-n(d-7)| hit the
    // spike once (d=10: 2) -> sum 2; naive-1 errors hit it entering AND
    // leaving (d=10 and d=11: 2 each) -> sum 4; MASE = 2/4
    val days = (0 until 14).flatMap(d => Seq.fill(if (d == 10) 3 else 1)(d))
    val df = days.map(d => Tuple1(new java.sql.Timestamp(d * 86400000L)))
      .toDF("ts")
    val r = EventAnalytics.forecastAccuracy(df, "ts", season = 7,
      horizon = 7).collect()(0)
    assert(r.getLong(0) == 7)
    assert(r.getDouble(1) == 0.285714 && r.getDouble(2) == 0.571429)
    assert(r.getDouble(3) == 0.5)
  }

  // ---------------------------------------------------- seasonalityStrength
  test("seasonalityStrength: pure weekly pattern = 1, flat series nulls") {
    // 28 days with counts = weekday index + 1 (exactly weekly periodic)
    val days = (0 until 28).flatMap(d => Seq.fill(((d + 3) % 7) + 1)(d))
    val df = days.map(d => Tuple1(new java.sql.Timestamp(d * 86400000L)))
      .toDF("ts")
    val r = EventAnalytics.seasonalityStrength(df, "ts").collect()(0)
    assert(r.getLong(0) == 28)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 1.0)
    // constant series: var_daily = 0 -> strength null
    val flat = (0 until 14).map(d =>
      Tuple1(new java.sql.Timestamp(d * 86400000L))).toDF("ts")
    val f = EventAnalytics.seasonalityStrength(flat, "ts").collect()(0)
    assert(f.getDouble(1) == 0.0 && f.isNullAt(3))
  }

  // ------------------------------------------------------ joinSizeEstimate
  test("joinSizeEstimate: exact on uniform keys, underestimates under skew") {
    import graft.operators.Ops
    // uniform: 100 fact rows over 10 keys x 10-row dim -> est == actual
    val fact = (1 to 100).map(i => i % 10).toDF("k")
    val dim = (0 until 10).map(identity).toDF("j")
    val u = Ops.joinSizeEstimate(fact, col("k"), dim, col("j")).collect()(0)
    assert(u.getLong(5) == 100 && u.getDouble(4) == 100.0)
    assert(u.getDouble(6) == 1.0)
    // skew: one hot key in both sides -> actual blows past the estimate
    val ha = (Seq.fill(50)(1) ++ (2 to 11)).toDF("k")
    val hb = (Seq.fill(50)(1) ++ (2 to 11)).toDF("j")
    val sk = Ops.joinSizeEstimate(ha, col("k"), hb, col("j")).collect()(0)
    assert(sk.getLong(5) == 2510 && sk.getDouble(6) < 0.2,
      s"skew not flagged: ${sk.toSeq}")
  }

  // ---------------------------------------------------------- histogram2d
  test("histogram2d: full zero-filled grid, clamped edges") {
    val df = Seq((-5.0, 0L), (450.0, 3600000000L), (10.0, 3600000000L))
      .map { case (v, us) => (v, new java.sql.Timestamp(us / 1000L)) }
      .toDF("v", "ts")
    val got = EventAnalytics.histogram2d(df, "v", "ts", 0.0, 400.0, 20)
    assert(got.count() == 480)
    val m = got.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((0L, 0L)) == 1)   // -5 clamps into bin 0, hour 0
    assert(m((19L, 1L)) == 1)  // 450 clamps into bin 19, hour 1
    assert(m((0L, 1L)) == 1)   // 10.0 -> bin 0, hour 1
    assert(m.values.sum == 3)
  }

  // ------------------------------------------------- positionAttribution
  test("positionAttribution: 40/20/40 credits; n=1 and n=2 degenerate splits") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // u1: three touches (view, click, view) then a 10.0 purchase ->
    //   first view 4.0, middle click 2.0, last view 4.0
    // u2: one click then a 5.0 purchase -> click gets 5.0
    // u3: two views then a 8.0 purchase -> 4.0 each
    val df = Seq(
      ("u1", 1L, "view", ts(0), 0.0), ("u1", 2L, "click", ts(1), 0.0),
      ("u1", 3L, "view", ts(2), 0.0), ("u1", 4L, "purchase", ts(3), 10.0),
      ("u2", 5L, "click", ts(0), 0.0), ("u2", 6L, "purchase", ts(1), 5.0),
      ("u3", 7L, "view", ts(0), 0.0), ("u3", 8L, "view", ts(1), 0.0),
      ("u3", 9L, "purchase", ts(2), 8.0)
    ).toDF("u", "id", "et", "ts", "v")
    val got = EventAnalytics.positionAttribution(df, "u", "id", "ts", "et",
        "purchase", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got("view") == ((4L, 16.0)))  // 4 + 4 + 4 + 4
    assert(got("click") == ((2L, 7.0))) // 2 + 5
  }

  // --------------------------------------------------------- windowFunnel
  test("windowFunnel: a stage landing outside the anchor window is lost") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // u1 converts within the hour; u2's click comes 2h after its first
    // view (counted by the plain funnel, dropped by the windowed one)
    val df = Seq(
      ("u1", "view", ts(0)), ("u1", "click", ts(30)),
      ("u2", "view", ts(0)), ("u2", "click", ts(120))
    ).toDF("u", "et", "ts")
    val win = EventAnalytics.windowFunnel(df, "u", "et", "ts",
        Seq("view", "click"), windowUs = 3600000000L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(win(0) == 2 && win(1) == 1)
    val plain = EventAnalytics.funnel(df, "u", "et", "ts",
        Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(plain(1) == 2)
    // the bound is anchored at stage 0, not the previous stage: a 3-stage
    // chain where each hop is 45 min apart converts stage 1 but not stage 2
    val df3 = Seq(("u3", "view", ts(0)), ("u3", "click", ts(45)),
      ("u3", "purchase", ts(90))).toDF("u", "et", "ts")
    val w3 = EventAnalytics.windowFunnel(df3, "u", "et", "ts",
        Seq("view", "click", "purchase"), windowUs = 3600000000L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(w3(1) == 1 && w3(2) == 0)
  }
}
