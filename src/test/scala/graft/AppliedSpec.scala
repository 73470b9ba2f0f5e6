package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{EventAnalytics, Graph, Linkage, Spatial, Stats,
  TextAnalysis => TA, Web}
import graft.plans.BloomPrune

/** Semantic unit tests for the applied-analytics wave (q154-q166 operators):
  * hand-computed expectations on adversarial micro-fixtures — run collapse
  * with nulls, equal-streak tiebreaks, peel convergence, cell-boundary
  * neighbors, bloom false-positive rescue, unequal-group ranks.
  */
class AppliedSpec extends SparkSpec {
  import spark.implicits._

  test("scdHistory: consecutive runs collapse; nulls form runs; intervals chain") {
    val us = (d: Long) => d * 86400000000L
    val log = Seq(
      // user 1: a,a | b | null,null | a  -> 4 runs
      (1L, 1L, us(1), Some("a")), (1L, 2L, us(2), Some("a")),
      (1L, 3L, us(3), Some("b")),
      (1L, 4L, us(4), None), (1L, 5L, us(5), None),
      (1L, 6L, us(6), Some("a")),
      // user 2: single row, immediately current
      (2L, 7L, us(9), Some("z")))
      .toDF("user_id", "event_id", "usec", "state")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(usec)").as("ts"), col("state"))
    val h = EventAnalytics.scdHistory(log, "user_id", "event_id", "ts", "state")
      .orderBy("user_id", "version")
      .collect()
    assert(h.length == 5)
    val u1 = h.filter(_.getLong(0) == 1L)
    assert(u1.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("a"), Some("b"), None, Some("a")))
    assert(u1.map(_.getLong(2)).toSeq == Seq(us(1), us(3), us(4), us(6)))
    // valid_to = next run's start; last run open + current
    assert(u1.map(r => if (r.isNullAt(3)) -1L else r.getLong(3)).toSeq ==
      Seq(us(3), us(4), us(6), -1L))
    assert(u1.map(_.getBoolean(5)).toSeq == Seq(false, false, false, true))
    assert(u1.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L, 4L))
    val u2 = h.filter(_.getLong(0) == 2L).head
    assert(u2.getBoolean(5) && u2.getLong(4) == 1L)
  }

  test("longestStreaks: islands split on gaps; equal lengths take the earliest") {
    val ev = Seq(
      // user 1: two 3-day islands -> earliest (10..12) wins the tie
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 20L), (1L, 21L), (1L, 22L),
      // user 2: one day, twice (distinct grain)
      (2L, 5L), (2L, 5L))
      .toDF("user_id", "day")
      .select(col("user_id"),
        expr("timestamp_micros(day * 86400000000)").as("ts"))
    val s = EventAnalytics.longestStreaks(ev, "user_id", "ts")
      .orderBy("user_id").collect()
    assert(s.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq((1L, 3L, 10L, 12L), (2L, 1L, 5L, 5L)))
  }

  test("kCore: peel drops the tail; final degrees reflect the surviving graph") {
    // triangle {1,2,3} + path 3-4-5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    // one round: 5 (deg 1) peels; 4 keeps its edge but lands at deg 1, so
    // the final >= k filter already hides it
    val r1 = Graph.kCore(edges, "src", "dst", k = 2, rounds = 1)
      .orderBy("node").collect()
    assert(r1.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 3L)))
    // converged: the 3-4 edge is gone too, 3 drops to deg 2
    val r3 = Graph.kCore(edges, "src", "dst", k = 2, rounds = 3)
      .orderBy("node").collect()
    assert(r3.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("bfsHops: min hops within the bound; unreached absent; off-graph seeds at 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("node")
    val h = Graph.bfsHops(edges, "src", "dst", seeds, "node", maxHops = 3)
      .orderBy("node").collect()
    assert(h.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3), (99L, 0)))
  }

  test("timeWeightedAvg: interval weights; zero-span and single-obs keys drop") {
    val obs = Seq(
      ("A", 1L, 0L, 10.0), ("A", 2L, 2L, 20.0), ("A", 3L, 3L, 40.0),
      ("B", 4L, 0L, 99.0), // single observation: no interval
      ("C", 5L, 0L, 1.0), ("C", 6L, 0L, 2.0)) // same-day pair: span 0
      .toDF("k", "id", "day", "price")
      .select(col("k"), col("id"),
        expr("timestamp_micros(day * 86400000000)").as("ts"), col("price"))
    val t = EventAnalytics.timeWeightedAvg(obs, "k", "id", "ts", "price")
      .collect()
    assert(t.length == 1)
    val a = t.head
    // (1000c*2d + 2000c*1d) / 3d / 100 = 13.333333
    assert(a.getString(0) == "A" && a.getLong(1) == 2 && a.getLong(2) == 3)
    assert(a.getDouble(3) == 13.333333)
  }

  test("longestSuffixMatch: deeper rules win; exact apex matches; misses stay null") {
    val docs = Seq(
      (1L, "https://a.b.example.com/x"),
      (2L, "https://example.com/"),
      (3L, "https://foo.org/"))
      .toDF("id", "url")
    val rules = Seq(("example.com", "r1"), ("b.example.com", "r2"))
      .toDF("dom", "cat")
    val m = Web.longestSuffixMatch(docs, "url", rules, "dom", "cat")
      .orderBy("id")
      .select("id", "matched_domain", "cat").collect()
    assert(m.map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSeq == Seq(
        (1L, Some("b.example.com"), Some("r2")),
        (2L, Some("example.com"), Some("r1")),
        (3L, None, None)))
  }

  test("radiusSelfJoin: inclusive boundary, cross-cell neighbors, each pair once") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 3L, 4L),   // dist 5 = radius, same cell
      (5L, 4L, 4L), (6L, 6L, 4L),   // dist 2, adjacent cells (0,0)/(1,0)
      (3L, 100L, 100L))             // isolated
      .toDF("id", "x", "y")
    val pairs = Spatial.radiusSelfJoin(pts, "id", "x", "y", radius = 5)
      .orderBy("id_a", "id_b").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 25L), (2L, 5L, 1L), (2L, 6L, 9L), (5L, 6L, 4L)))
  }

  test("bloomPrunedSemiJoin: exact semi-join semantics; empty build matches nothing") {
    val probe = spark.range(1, 101).select(col("id").as("k"), (col("id") * 10).as("v"))
    val build = spark.range(1, 101).filter(col("id") % 2 === 0)
      .select(col("id").as("bk"))
    val got = BloomPrune.bloomPrunedSemiJoin(probe, "k", build, "bk", 1000L)
      .orderBy("k").collect()
    assert(got.length == 50 && got.forall(_.getLong(0) % 2 == 0))
    assert(got.map(_.getLong(0)).toSeq == (2L to 100L by 2).toSeq)
    val none = BloomPrune.bloomPrunedSemiJoin(probe, "k",
      build.filter(col("bk") < 0), "bk", 1000L)
    assert(none.count() == 0)
  }

  test("quantileNormalize: per-rank cross-group means; short groups just stop") {
    val df = Seq(("g1", 1L, 1.0), ("g1", 2L, 3.0), ("g1", 3L, 5.0),
      ("g2", 4L, 2.0), ("g2", 5L, 4.0))
      .toDF("g", "id", "v")
    val n = Stats.quantileNormalize(df, "g", "id", "v")
      .orderBy("id").select("id", "rank", "norm_value").collect()
    assert(n.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 1L, 1.5), (2L, 2L, 3.5), (3L, 3L, 5.0),
        (4L, 1L, 1.5), (5L, 2L, 3.5)))
  }

  test("liftTable: top-decile rate/lift/capture on a planted 20%-positive score") {
    val df = spark.range(1, 101).select(col("id").cast("double").as("s"),
      (col("id") > 80).cast("int").as("y"))
    val lt = Stats.liftTable(df, "s", "y", nBuckets = 10)
      .orderBy(col("bucket").desc).collect()
    assert(lt.length == 10)
    val b10 = lt.head
    // scores 91..100: all positive, lift 1.0/0.2 = 5, capture 10/20
    assert(b10.getInt(0) == 10 && b10.getLong(1) == 10 && b10.getLong(2) == 10)
    assert(b10.getDouble(3) == 1.0 && b10.getDouble(4) == 5.0 &&
      b10.getDouble(5) == 0.5)
    val b9 = lt(1) // 81..90 all positive -> cumulative capture complete
    assert(b9.getDouble(5) == 1.0)
    val b8 = lt(2) // 71..80: no positives
    assert(b8.getLong(2) == 0 && b8.getDouble(4) == 0.0)
    assert(lt.map(_.getLong(1)).sum == 100)
  }

  test("readability: hand-counted Flesch on a two-sentence text") {
    val df = Seq("The cat sat. The dog ran.").toDF("text")
    val r = df.select(TA.tokenCount(col("text")).as("w"),
      TA.sentenceCount(col("text")).as("s"),
      TA.syllableCount(col("text")).as("sy"),
      TA.fleschReadingEase(col("text")).as("f"),
      TA.fleschKincaidGrade(col("text")).as("g")).collect().head
    assert(r.getInt(0) == 6 && r.getInt(1) == 2 && r.getInt(2) == 6)
    // 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert(r.getDouble(3) == 119.19)
    // 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert(r.getDouble(4) == -2.62)
  }

  test("invertedIndex: maxDf drops stopword-grade terms; postings cap and sort") {
    val docs = Seq((3L, "x y"), (1L, "x z y"), (2L, "x"))
      .toDF("doc_id", "text")
    val idx = TA.invertedIndex(docs, "doc_id", "text", maxDf = 2, k = 1)
      .orderBy("term").collect()
    // x has df 3 > maxDf -> dropped; y df 2 caps postings at the first id
    assert(idx.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("y", 2L, "1"), ("z", 1L, "1")))
  }

  test("lastTouchAttribution: latest prior touch wins; no-touch goes to (none)") {
    val ev = Seq(
      // user 1: view, click, PURCHASE(10) -> click; PURCHASE(5) right after
      // another purchase still credits click (purchases are not touches)
      (1L, 1L, 10L, "view", 0.0), (1L, 2L, 20L, "click", 0.0),
      (1L, 3L, 30L, "purchase", 10.0), (1L, 4L, 40L, "purchase", 5.0),
      // user 2: cold purchase -> (none)
      (2L, 5L, 10L, "purchase", 7.0))
      .toDF("user_id", "event_id", "usec", "event_type", "value")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(usec)").as("ts"), col("event_type"), col("value"))
    val a = EventAnalytics.lastTouchAttribution(ev, "user_id", "event_id",
        "ts", "event_type", "purchase", "value")
      .orderBy("touch_type").collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("(none)", 1L, 7.0), ("click", 2L, 15.0)))
  }

  test("adoptionCurve: spine fills quiet days; cumulative reaches 1.0") {
    val ev = Seq((1L, 0L), (1L, 3L), (2L, 0L), (3L, 2L))
      .toDF("user_id", "day")
      .select(col("user_id"),
        expr("timestamp_micros(day * 86400000000)").as("ts"))
    val c = EventAnalytics.adoptionCurve(ev, "user_id", "ts")
      .orderBy("day").collect()
    // first days: u1,u2 -> 0; u3 -> 2; day 1 quiet
    assert(c.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq == Seq((0L, 2L, 2L, 0.666667), (1L, 0L, 2L, 0.666667),
        (2L, 1L, 3L, 1.0)))
  }

  test("pitTrailingCounts: strictly-prior window excludes the anchor instant") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 1L, 0L, "view"), (1L, 2L, 3 * day, "click"),
      (1L, 3L, 8 * day, "view"),           // falls OUT of a day-10 7d window
      (1L, 4L, 10 * day, "purchase"),      // counts click@3d? no - 7d back = day 3 boundary
      (1L, 5L, 10 * day, "view"),          // same instant as anchor: excluded
      (1L, 6L, 12 * day, "purchase"))
      .toDF("user_id", "event_id", "usec", "event_type")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(usec)").as("ts"), col("event_type"))
    val f = EventAnalytics.pitTrailingCounts(ev, "user_id", "event_id", "ts",
        "event_type", "purchase", Seq("view", "click"), windowSec = 7 * 86400L)
      .orderBy("event_id").collect()
    // anchor day 10: window (day 3, day 10) -> view@8d only (click@3d is on
    // the open boundary, view@10d shares the anchor instant)
    // anchor day 12: window (day 5, day 12) -> view@8d + view@10d
    assert(f.map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((4L, 1L, 0L), (6L, 2L, 0L)))
  }

  test("stageLatency: first-from to first-after-to, lower-median per cohort") {
    val ev = Seq(
      (1L, 0L, "signup"), (1L, 100L, "purchase"), (1L, 50L, "purchase"),
      (2L, 10L, "signup"), (2L, 310L, "purchase"),
      (3L, 20L, "purchase"), (3L, 30L, "signup"), // purchase BEFORE signup: no completion
      (4L, 0L, "signup")) // never completes
      .toDF("user_id", "sec", "event_type")
      .select(col("user_id"),
        expr("timestamp_micros(sec * 1000000)").as("ts"), col("event_type"))
    val l = EventAnalytics.stageLatency(ev, "user_id", "event_type", "ts",
        "signup", "purchase").collect()
    assert(l.length == 1)
    // cohort week 0: users 1 (lat 50s) and 2 (lat 300s) -> lower median 50
    assert(l.head.getLong(1) == 2L && l.head.getLong(2) == 50L)
  }

  test("cohortLtv: offsets accumulate decimal-exact revenue per cohort") {
    val wk = 7L * 86400000000L
    val tx = Seq(
      (1L, 0L, 10.0), (1L, 1L, 20.0), (2L, 0L, 5.0), (2L, 2L, 40.0),
      (3L, 1L, 100.0)) // cohort week 1
      .toDF("k", "week", "amt")
      .select(col("k"), expr(s"timestamp_micros(week * $wk + 3 * 86400000000)")
        .as("ts"), col("amt")) // +3d keeps the micros inside the Monday week
    val c = EventAnalytics.cohortLtv(tx, "k", "ts", "amt")
      .orderBy("cohort_week", "week_offset").collect()
    assert(c.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq == Seq(
        (0L, 0L, 15.0, 15.0), (0L, 1L, 20.0, 35.0), (0L, 2L, 40.0, 75.0),
        (1L, 0L, 100.0, 100.0)))
  }

  test("nearestNeighborJoin: argmin with id tiebreak; out-of-range left rows drop") {
    val left = Seq((1L, 0L, 0L), (2L, 50L, 50L)).toDF("id", "x", "y")
    val right = Seq((10L, 3L, 0L), (11L, 0L, 3L), (12L, 200L, 200L))
      .toDF("id", "x", "y")
    val nn = Spatial.nearestNeighborJoin(left, right, "id", "x", "y", radius = 5)
      .collect()
    // 10 and 11 tie at dist2 9 -> lower id wins; point 2 matches nothing
    assert(nn.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 10L, 9L)))
  }

  test("referentialAudit: planted orphans and null keys count; clean edges report 0") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val rep = Stats.referentialAudit(Seq(
      ("dirty", child, "fk", parent, "pk"),
      ("clean", parent, "pk", parent, "pk")))
      .orderBy("edge").collect()
    assert(rep.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("clean", 3L, 0L), ("dirty", 4L, 2L)))
  }

  test("linkage: blocked pair generation and the continuous score formula") {
    val recs = Seq(("b1", 1L, "AUTOMOBILE", 100.0), ("b1", 2L, "AUTOMOBILE", 350.0),
      ("b1", 3L, "HOUSEHOLD", 100.0), ("b2", 4L, "AUTOMOBILE", 100.0))
      .toDF("blk", "id", "seg", "bal")
    val pairs = Linkage.blockedPairs(recs, "blk", "id")
    assert(pairs.count() == 3) // C(3,2) in b1, b2 alone
    val scored = Linkage.scorePairs(pairs, Seq(
      Linkage.Field(Linkage.equalityAgreement(col("seg_a"), col("seg_b")), 2.0, -1.0),
      Linkage.Field(Linkage.numericCloseness(col("bal_a"), col("bal_b"), 500.0), 1.0, 0.0)))
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "score").collect()
    // (1,2): seg agree (+2), closeness 1-250/500=0.5 -> 2 + 0.5 = 2.5
    // (1,3): seg differ (-1), closeness 1.0 -> -1 + 1 = 0.0
    // (2,3): seg differ (-1), closeness 0.5 -> -1 + 0.5 = -0.5
    assert(scored.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2L, 2.5), (1L, 3L, 0.0), (2L, 3L, -0.5)))
  }

  test("radiusClusters: chains merge transitively; singletons keep their id") {
    import spark.implicits._
    // 1-2-3 chain (each link within r=5, ends 8 apart), 4 isolated
    val pts = Seq((1L, 0L, 0L), (2L, 4L, 0L), (3L, 8L, 0L), (4L, 50L, 50L))
      .toDF("id", "x", "y")
    val got = Spatial.radiusClusters(pts, "id", "x", "y", radius = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L,
      "transitive chain shares the min id")
    assert(got(4L) == 4L, "isolated point clusters alone")
  }

  test("geohash: public test vector; prefix = coarser cell; edges clamp") {
    import spark.implicits._
    val df = Seq(
      (57.64911, 10.40744),   // geohash.org canonical example -> u4pruy...
      (0.0, 0.0), (-90.0, -180.0), (90.0, 180.0), (37.7749, -122.4194))
      .toDF("lat", "lon")
    val got = df.select(
      Spatial.geohash(col("lat"), col("lon"), 6).as("g6"),
      Spatial.geohash(col("lat"), col("lon"), 4).as("g4"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0)._1 == "u4pruy", "known vector (Jutland)")
    assert(got(4)._1.startsWith("9q8yy"), "known vector (San Francisco)")
    got.foreach { case (g6, g4) =>
      assert(g6.startsWith(g4), "4-char hash is the containing cell")
    }
    // +90/+180 sit on the open upper edge: clamp into the last cell, not
    // overflow into garbage
    assert(got(3)._1 == "zzzzzz")
  }

  test("pointInPolygon: unit-square membership, convexity not assumed") {
    import spark.implicits._
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val pts = Seq((1L, 5.0, 5.0), (2L, 15.0, 5.0), (3L, -1.0, 5.0),
      (4L, 5.0, 11.0), (5L, 9.99, 9.99)).toDF("id", "x", "y")
    val got = pts.select(col("id"),
        Spatial.pointInPolygon(col("x"), col("y"), square).as("in"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L) && got(5L) && !got(2L) && !got(3L) && !got(4L))
    // non-convex chevron: the notch at (5,5) is OUTSIDE
    val chevron = Seq((0.0, 0.0), (10.0, 0.0), (5.0, 4.0))
    val probe = Seq((1L, 5.0, 1.0), (2L, 5.0, 5.0)).toDF("id", "x", "y")
    val g2 = probe.select(col("id"),
        Spatial.pointInPolygon(col("x"), col("y"), chevron).as("in"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(g2(1L) && !g2(2L))
  }

  test("shuffleAdvisor: integer width model and ceiling recommendation") {
    import graft.operators.Ops
    import spark.implicits._
    val df = Seq((1L, 1, "ab"), (2L, 2, "cdef")).toDF("l", "i", "s")
    // widths: long 8 + int 4 = 12 fixed; strings 2 + 4 = 6 measured
    val r = Ops.shuffleAdvisor(df, targetBytes = 10L).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 12 && r.getLong(2) == 6)
    assert(r.getLong(3) == 30)          // 2*12 + 6
    assert(r.getLong(4) == 3)           // ceil(30/10)
    // tiny table never recommends zero partitions
    val one = Seq(Tuple1(1L)).toDF("l")
    assert(Ops.shuffleAdvisor(one, targetBytes = 1L << 30)
      .collect()(0).getLong(4) == 1)
  }

  test("seasonalResidualOutliers: planted spike flags; flat series is silent") {
    // 28 days alternating 9/11 events (every weekday mean 10, |resid| = 1,
    // MAD = 1) with day 13 spiked to 100: spike weekday mean 32.25 ->
    // flagged days are the spike (+67.75) and its 3 depressed peers
    def ev(counts: Map[Long, Int]) = counts.toSeq
      .flatMap { case (d, n) => Seq.fill(n)(d) }
      .toDF("day")
      .select(expr("timestamp_micros(day * 86400000000)").as("ts"))
    val base = (0L to 27L).map(d =>
      d -> (if (d == 13L) 100 else if (d % 2 == 1) 11 else 9)).toMap
    val r = EventAnalytics.seasonalResidualOutliers(ev(base), "ts", k = 3.0)
      .orderBy("day").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(6L, 13L, 20L, 27L))
    val spike = r.find(_.getLong(0) == 13L).get
    assert(spike.getDouble(3) == 67.75 && spike.getDouble(4) == 67.75)
    assert(r.filter(_.getLong(0) != 13L).forall(_.getDouble(4) < 0))
    // constant series: every residual 0, MAD 0 -> nothing flags
    val flat = (0L to 13L).map(_ -> 5).toMap
    assert(EventAnalytics.seasonalResidualOutliers(ev(flat), "ts").isEmpty)
  }

  test("hotspotCells: floor bucketing is exact at the BIGINT edge and on " +
    "negative quadrants (no ANSI overflow)") {
    import graft.pipeline.Spatial
    // the earlier (x - pmod(x, s)) div s form underflowed BIGINT under
    // ANSI for x within s-1 of Long.MinValue; the truncate-then-step-down
    // form must bucket the same floor cells without ever leaving BIGINT
    val lo = Long.MinValue
    val pts = Seq((lo, 0L), (lo + 1L, 0L), (-1L, -10L), (1L, 10L))
      .toDF("x", "y")
    val got = Spatial.hotspotCells(pts, col("x"), col("y"), cellSize = 10L,
        k = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // floor(MinValue/10) = floor(MinValue+1/10) = -922337203685477581
    assert(got((-922337203685477581L, 0L)) == 2L, got.toString)
    assert(got((-1L, -1L)) == 1L && got((0L, 1L)) == 1L, got.toString)
  }

  test("hotspotCells: z from all-cell moments; integer top-k order") {
    import graft.pipeline.Spatial
    // cells (0,0):6, (1,0):2, (2,0):1 at cellSize 10 -> mean 3,
    // popvar 42/9, z_top = 3/sqrt(42/9)
    val pts = (Seq.fill(6)((1L, 2L)) ++ Seq.fill(2)((11L, 3L)) ++
      Seq((25L, 9L))).toDF("x", "y")
    val r = Spatial.hotspotCells(pts, col("x"), col("y"), cellSize = 10L,
      k = 2).collect()
    assert(r.length == 2)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2)) ==
      ((0L, 0L, 6L)))
    val zExp = math.round(3.0 / math.sqrt(42.0 / 9.0) * 1e6) / 1e6
    assert(r(0).getDouble(3) == zExp)
    assert((r(1).getLong(0), r(1).getLong(2)) == ((1L, 2L)))
  }

  test("stickiness: per-period distinct grains and ratios") {
    // period 0: u1 on days 0,1 (twice on day 0 - collapses), u2 on day 1
    // -> dau (1,2), n_days 2, pau 2, mean_dau 1.5, stickiness 0.75;
    // period 1: u3 on day 30 -> 1.0
    val df = Seq((1L, 0L), (1L, 0L), (1L, 1L), (2L, 1L), (3L, 30L))
      .toDF("user_id", "day")
      .select(col("user_id"),
        expr("timestamp_micros(day * 86400000000)").as("ts"))
    val r = EventAnalytics.stickiness(df, "user_id", "ts", periodDays = 30)
      .orderBy("period").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getDouble(3), x.getDouble(4))).toSeq ==
      Seq((0L, 2L, 2L, 1.5, 0.75), (1L, 1L, 1L, 1.0, 1.0)))
  }

  test("shapleyAttribution: equal split within touch sets; strict pre-conversion") {
    // u1: click (+ off-channel error) then buys -> {click}, credit 1
    // u2: click+view then buys -> 1/2 each
    // u3: view only AFTER buying -> no credit; u4: never buys -> no credit
    val df = Seq(
      (1L, 0L, "click"), (1L, 1L, "error"), (1L, 2L, "purchase"),
      (2L, 0L, "click"), (2L, 1L, "view"), (2L, 2L, "purchase"),
      (3L, 5L, "purchase"), (3L, 6L, "view"),
      (4L, 0L, "click"))
      .toDF("user_id", "sec", "event_type")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_micros(sec * 1000000)").as("ts"))
    val r = EventAnalytics.shapleyAttribution(df, "user_id", "ts",
        "event_type", "purchase", Seq("click", "view"))
      .orderBy("channel").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getDouble(2),
      x.getDouble(3))).toSeq ==
      Seq(("click", 2L, 1.5, 0.75), ("view", 1L, 0.5, 0.25)))
  }

  test("classicalDecomposition: linear ramp — MA trend exact, zero seasonal/resid") {
    // n(day) = day+1 on days 0..7: full windows at days 3,4 where the
    // centered MA reproduces n exactly -> detrended 0 everywhere
    val df = (0L to 7L).flatMap(d => Seq.fill(d.toInt + 1)(d)).toDF("day")
      .select(expr("timestamp_micros(day * 86400000000)").as("ts"))
    val r = EventAnalytics.classicalDecomposition(df, "ts")
      .orderBy("day").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    assert(r.map(_.getDouble(2)).toSeq == Seq(4.0, 5.0))
    assert(r.forall(x => x.getDouble(3) == 0.0 && x.getDouble(4) == 0.0))
  }

  test("leadLagMatrix: a perfectly leads b by one day -> corr 1.0") {
    val mk = (t: String, d: Long, n: Int) => Seq.fill(n)((t, d))
    val rows = mk("a", 0L, 1) ++ mk("a", 1L, 2) ++ mk("a", 2L, 3) ++
      mk("a", 3L, 4) ++ mk("b", 1L, 1) ++ mk("b", 2L, 2) ++
      mk("b", 3L, 3) ++ mk("b", 4L, 4)
    val df = rows.toDF("event_type", "day")
      .select(col("event_type"),
        expr("timestamp_micros(day * 86400000000)").as("ts"))
    val r = EventAnalytics.leadLagMatrix(df, "ts", "event_type", lagDays = 1)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), if (x.isNullAt(3)) Double.NaN else x.getDouble(3)))
      .toMap
    assert(r.size == 4) // full 2x2 ordered-pair matrix
    assert(r(("a", "b")) == ((4L, 1.0)))
    assert(r(("a", "a"))._1 == 4L && r(("a", "a"))._2 < 1.0)
  }

  test("interpolateLinear: unequal spacing, boundary nulls, pass-through") {
    val df = Seq(
      (1L, 10L, 0L, Some(1.0)), (1L, 11L, 1L, None), (1L, 12L, 4L, Some(3.0)),
      (2L, 20L, 0L, None), (2L, 21L, 1L, Some(5.0)), (2L, 22L, 2L, None))
      .toDF("k", "id", "sec", "v")
      .select(col("k"), col("id"),
        expr("timestamp_micros(sec * 1000000)").as("ts"), col("v"))
    val r = EventAnalytics.interpolateLinear(df, "k", "ts", "id", col("v"))
      .orderBy("id").collect()
      .map(x => (x.getLong(1), if (x.isNullAt(2)) None else Some(x.getDouble(2)),
        x.getBoolean(3)))
    assert(r.toSeq == Seq(
      (10L, Some(1.0), false),
      (11L, Some(1.5), true),   // 1 + 2·(1/4)
      (12L, Some(3.0), false),
      (20L, None, false),        // leading null: no left neighbor
      (21L, Some(5.0), false),
      (22L, None, false)))       // trailing null: no right neighbor
  }

  test("joinOrderAdvisor: hand-computed chain costs pick the cheaper order") {
    // A: ka=1,1; B: (1,10),(1,20); C: kc=10,10,20 ->
    // eab = 2·2/1 = 4, ebc = 2·3/2 = 3, efin = 4·3/2 = 6;
    // costs 10 vs 9 -> BC_then_A chosen; actuals 4/3 mid, 6 final
    val a = Seq(1L, 1L).toDF("ka")
    val b = Seq((1L, 10L), (1L, 20L)).toDF("kb1", "kb2")
    val c = Seq(10L, 10L, 20L).toDF("kc")
    val r = graft.operators.Ops.joinOrderAdvisor(a, col("ka"), b,
        col("kb1"), col("kb2"), c, col("kc"))
      .orderBy("join_order").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2),
        x.getDouble(3), x.getLong(4), x.getLong(5), x.getBoolean(6)))
    assert(r.toSeq == Seq(
      ("AB_then_C", 4.0, 6.0, 10.0, 4L, 6L, false),
      ("BC_then_A", 3.0, 6.0, 9.0, 3L, 6L, true)))
  }

  test("trajectoryLengths: equatorial legs match the analytic great circle") {
    import graft.pipeline.Spatial
    // (0,0) -> (0,1) -> (0,2): each leg is one degree along the equator
    val df = Seq((1L, 10L, 0.0, 0.0), (1L, 11L, 0.0, 1.0),
      (1L, 12L, 0.0, 2.0), (2L, 20L, 10.0, 10.0))
      .toDF("k", "id", "lat", "lon")
    val r = Spatial.trajectoryLengths(df, "k", col("id").cast("long"),
      "id", col("lat"), col("lon")).orderBy("k").collect()
    val oneDeg = math.round(12742000.0 *
      math.asin(math.sqrt(math.pow(math.sin(math.toRadians(1.0) / 2), 2))))
    assert(r.length == 1) // single-point key 2 has no legs
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 2 * oneDeg)
    assert(math.abs(oneDeg - 111195L) <= 1) // ~111.195 km per degree
  }

  test("blockingQuality: rollup pair counts; captured vs missed labels") {
    // blocks {1,2}, {3}, {4}: 1 candidate of C(4,2)=6 pairs;
    // truth (1,2) captured, (1,3) missed
    val recs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z"))
      .toDF("id", "blk")
    val truth = Seq((1L, 2L), (1L, 3L)).toDF("ia", "ib")
    val r = Linkage.blockingQuality(recs, "blk", "id", truth).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 6L, 1L, 2L, 1L)))
    assert(r.getDouble(5) == math.round((1.0 - 1.0 / 6.0) * 1e6) / 1e6)
    assert(r.getDouble(6) == 0.5)
  }
  test("kaplanMeier: censoring shrinks risk without an event; absorbing zero") {
    import spark.implicits._
    // (1,E) (2,C) (3,E) (3,E) (4,E): S = .8 at t1, unchanged through the
    // censor at t2, .8·(1/3) at t3, absorbing 0 when the last subject dies
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, true)).toDF("t", "ev")
    val r = EventAnalytics.kaplanMeier(df, col("t"), col("ev"))
      .orderBy("duration").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    assert(r(0) == ((1L, 5L, 1L, 0L, 0.8)))
    assert(r(1) == ((2L, 4L, 0L, 1L, 0.8)))
    assert(r(2) == ((3L, 3L, 2L, 0L, 0.266667)))
    assert(r(3) == ((4L, 1L, 1L, 0L, 0.0)))
  }

  test("survival family: duration-cell cardinality gate raises loudly " +
    "above 10^5 distinct durations") {
    // a raw micro-grain duration column (100001 distinct values) must
    // REFUSE before the keyless cumulative window single-partition-sorts
    // an unbounded cell relation — the round-15 enforcement of the
    // "bucket durations first" contract (the gateValueCells sibling)
    def deep(t: Throwable): String =
      if (t == null) "" else t.toString + "|" + deep(t.getCause)
    val wide = spark.range(100001L).select(col("id").as("t"),
      (pmod(col("id"), lit(2L)) === 0L).as("ev"))
    val wideK = spark.range(100001L).select(col("id").as("t"),
      (pmod(col("id"), lit(3L))).as("k"))
    val cases: Seq[(String, () => Any)] = Seq(
      ("kaplanMeier",
        () => EventAnalytics.kaplanMeier(wide, col("t"), col("ev")).collect()),
      ("nelsonAalen",
        () => EventAnalytics.nelsonAalen(wide, col("t"), col("ev")).collect()),
      ("kmGreenwood",
        () => EventAnalytics.kmGreenwood(wide, col("t"), col("ev")).collect()),
      ("cumulativeIncidence",
        () => EventAnalytics.cumulativeIncidence(wideK, col("t"), col("k"))
          .collect()),
      ("logRank",
        () => EventAnalytics.logRank(wide, col("t"), col("ev"),
          pmod(col("t"), lit(2L)) === 0L).collect()),
      ("weightedLogRank",
        () => EventAnalytics.weightedLogRank(wide, col("t"), col("ev"),
          pmod(col("t"), lit(2L)) === 0L).collect()),
      // the derived curves inherit the gate through kaplanMeier/kmGreenwood
      ("kaplanMeier",
        () => EventAnalytics.restrictedMeanSurvival(wide, col("t"), col("ev"),
          tau = 1000L).collect()),
      ("kmGreenwood",
        () => EventAnalytics.kmMedianSurvival(wide, col("t"), col("ev"))
          .collect()))
    for ((op, run) <- cases) {
      val ex = intercept[Exception] { run() }
      val msg = deep(ex)
      assert(msg.contains("distinct durations exceed") && msg.contains(op),
        s"$op: expected the duration-cardinality raise, got: $msg")
    }
  }

  test("nelsonAalen: additive hazard accumulates d/n; censoring shrinks risk only") {
    import spark.implicits._
    // (1,E) (1,C) (2,E) (3,C): t1 term 1/4 (var 1/16), t2 at-risk 2 term
    // 1/2 (var 1/4), t3 pure censor term 0 — hand decimal-rounded sums
    val df = Seq((1L, true), (1L, false), (2L, true), (3L, false))
      .toDF("t", "ev")
    val r = EventAnalytics.nelsonAalen(df, col("t"), col("ev"))
      .orderBy("duration").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getDouble(5)))
    assert(r(0) == ((1L, 4L, 1L, 1L, 0.25, 0.0625)))
    assert(r(1) == ((2L, 2L, 1L, 0L, 0.75, 0.3125)))
    assert(r(2) == ((3L, 1L, 0L, 1L, 0.75, 0.3125)))
  }

  test("logRank: O/E/V from risk sets, single-subject times add no variance") {
    import spark.implicits._
    // A: 1(E), 2(E); B: 2(E), 3(E) — hand: E_A = 0.5 + 2/3, V = 1/4 + 2/9,
    // chi2 = (2 - 1.166667)^2 / 0.472222 = 1.470588; t3 has nt=1 -> V += 0
    val df = Seq((1L, true, true), (2L, true, true),
      (2L, true, false), (3L, true, false)).toDF("t", "ev", "a")
    val r = EventAnalytics.logRank(df, col("t"), col("ev"), col("a"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)) ==
      ((2L, 2L, 2L, 2L)))
    assert(r.getDouble(3) == 1.166667 && r.getDouble(5) == 2.833333)
    assert(r.getDouble(6) == 1.470588, s"chi2: ${r.getDouble(6)}")
    // identical groups -> O = E exactly, chi2 0
    val same = Seq((1L, true, true), (1L, true, false),
      (2L, true, true), (2L, true, false)).toDF("t", "ev", "a")
    val s0 = EventAnalytics.logRank(same, col("t"), col("ev"), col("a"))
      .collect()(0)
    assert(s0.getDouble(6) == 0.0 && s0.getLong(2) == 2L &&
      s0.getDouble(3) == 2.0) // E_A: t1 2·2/4 + t2 2·1/2 = 2 = O_A
  }

  test("allanDeviationDaily: exact rational ADEV on a hand spine") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,3,2,6: tau=1 -> sqrt(21/6); tau=2 -> sqrt(16/8)
    val counts = Seq(1, 3, 2, 6)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(t(d + 5)) }
    val r = EventAnalytics.allanDeviationDaily(rows.toDF("ts"), "ts",
      taus = Seq(1, 2)).collect()
    assert((r(0).getLong(0), r(0).getLong(1)) == ((1L, 4L)))
    assert(r(0).getDouble(2) == 1.870829, s"t1: ${r(0)}")
    assert((r(1).getLong(0), r(1).getLong(1)) == ((2L, 2L)))
    assert(r(1).getDouble(2) == 1.414214, s"t2: ${r(1)}")
    // duplicated taus refuse loudly: a duplicate would duplicate block
    // rows and make the adjacent-diff order key non-total
    intercept[IllegalArgumentException] {
      EventAnalytics.allanDeviationDaily(rows.toDF("ts"), "ts",
        taus = Seq(1, 2, 2))
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.dfaDaily(rows.toDF("ts"), "ts", sizes = Seq(4, 4, 8))
    }
  }

  test("dfaDaily: per-block detrended fluctuation and ln-ln slope") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,3,2,6,4,0,5,3 (day 5 zero-fills): F(4)=1.012423,
    // F(8)=1.080123, alpha=.093384 (python replay incl. the
    // DECIMAL(38,6) SSR cast)
    val counts = Seq(1, 3, 2, 6, 4, 0, 5, 3)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(t(d + 5)) }
    val r = EventAnalytics.dfaDaily(rows.toDF("ts"), "ts",
      sizes = Seq(4, 8)).collect()
    assert((r(0).getLong(0), r(0).getLong(1)) == ((4L, 2L)))
    assert(r(0).getDouble(2) == 1.012423, s"f4: ${r(0)}")
    assert((r(1).getLong(0), r(1).getLong(1)) == ((8L, 1L)))
    assert(r(1).getDouble(2) == 1.080123, s"f8: ${r(1)}")
    assert(r(0).getDouble(3) == 0.093384 && r(1).getDouble(3) == 0.093384,
      s"alpha: ${r(0)}")
  }

  test("bassDiffusionFit: 2-regressor recovery of m/p/q") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // new adopters 10,18,25,22,15,10: m=101.447974, p=.115056,
    // q=.704826 (python replay of the normal-equation shapes)
    val counts = Seq(10, 18, 25, 22, 15, 10)
    var uid = 0
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map { _ => uid += 1; (uid.toLong, t(d + 2)) } }
    val df = rows.toDF("user_id", "ts")
    val r = EventAnalytics.bassDiffusionFit(df, "user_id", "ts")
      .collect()(0)
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == 11.672206 && r.getDouble(2) == 0.58977 &&
      r.getDouble(3) == -0.006948, s"coef: $r")
    assert(r.getDouble(4) == 101.447974 && r.getDouble(5) == 0.115056 &&
      r.getDouble(6) == 0.704826, s"mpq: $r")
  }

  test("holtLinearBacktest: hand recursion at alpha = beta = 1/2") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 4,6,5,9: forecasts 6, 8, 7.75; errors 0, -3, 1.25
    val counts = Seq(4, 6, 5, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(t(d + 3)) }
    val r = EventAnalytics.holtLinearBacktest(rows.toDF("ts"), "ts")
      .orderBy("t").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 6L), (2L, 5L), (3L, 9L)))
    assert(r.map(_.getDouble(2)).toSeq == Seq(6.0, 8.0, 7.75))
    assert(r.map(_.getDouble(3)).toSeq == Seq(0.0, -3.0, 1.25),
      s"holt: ${r.toSeq}")
  }

  test("weightedLogRank: Gehan n_t weights on a hand risk table") {
    import spark.implicits._
    // A: 1(E), 2(E); B: 1(E), 3(censored):
    // t1 w=4 diff 0; t2 w=2 diff .5 -> num 1, var 16/3 + 1 = 6.333333
    val df = Seq((1L, true, true), (2L, true, true),
      (1L, true, false), (3L, false, false)).toDF("t", "ev", "a")
    val r = EventAnalytics.weightedLogRank(df, col("t"), col("ev"),
      col("a"), weighting = "gehan").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 2L, 1L)))
    assert(r.getDouble(4) == 0.39736 && r.getDouble(5) == 0.157895,
      s"wlr: $r")
    // tarone-ware on the same table: w = sqrt(nt/N) -> num = sqrt(.5)*.5,
    // var = 1/3 + .5*.25 -> z = .522233, chi2 = 3/11
    val tw = EventAnalytics.weightedLogRank(df, col("t"), col("ev"),
      col("a"), weighting = "tarone-ware").collect()(0)
    assert(tw.getDouble(4) == 0.522233 && tw.getDouble(5) == 0.272727,
      s"tarone-ware: $tw")
  }

  test("multipleTesting: Bonferroni caps at 1, Holm stops at first failure, BH rejects through the largest passing rank") {
    import spark.implicits._
    // m=5, alpha=.05: Holm thresholds .01/.0125/... fail at rank 2;
    // BH thresholds .01/.02/.03/.04/.05 pass through rank 3 (step-up:
    // rank 3's pass rescues nothing above it but everything below)
    val df = Seq(("A", 0.01), ("B", 0.02), ("C", 0.03), ("D", 0.2),
      ("E", 0.9)).toDF("id", "pv")
    val r = Stats.multipleTesting(df, "id", col("pv"), alpha = 0.05)
      .orderBy("rank").collect()
      .map(x => (x.getString(0), x.getDouble(3), x.getBoolean(4),
        x.getBoolean(5)))
    assert(r(0) == (("A", 0.05, true, true)))
    assert(r(1) == (("B", 0.1, false, true)))
    assert(r(2) == (("C", 0.15, false, true)))
    assert(r(3) == (("D", 1.0, false, false)))
    assert(r(4) == (("E", 1.0, false, false)))
    // a NULL p-value fails loudly — dropping it would shrink m and
    // loosen every other test's threshold
    val withNull = Seq(("A", Some(0.01)), ("B", None: Option[Double]))
      .toDF("id", "pv")
    val ex = intercept[Exception] {
      Stats.multipleTesting(withNull, "id", col("pv")).collect()
    }
    assert(ex.toString.contains("null p-value") ||
      Option(ex.getCause).exists(_.toString.contains("null p-value")),
      s"expected the null-p raise, got: $ex")
  }

  test("rake: symmetric table is a fixed point; col targets met exactly after the final col scaling") {
    import spark.implicits._
    val cells = Seq(("a1", "b1", 1L), ("a1", "b2", 3L),
      ("a2", "b1", 2L), ("a2", "b2", 2L)).toDF("a", "b", "n")
    val rt = Seq(("a1", 4.0), ("a2", 4.0)).toDF("a", "target")
    val ct = Seq(("b1", 4.0), ("b2", 4.0)).toDF("b", "target")
    val w = Stats.rake(cells, "a", "b", "n", rt, ct, rounds = 3)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        x.getDouble(3)).toMap
    // the LAST scaling is columns: col sums hit their targets to 6dp
    assert(math.abs(w(("a1", "b1")) + w(("a2", "b1")) - 4.0) < 2e-6)
    assert(math.abs(w(("a1", "b2")) + w(("a2", "b2")) - 4.0) < 2e-6)
    // rows converge geometrically: within 1% after 3 rounds
    assert(math.abs(w(("a1", "b1")) + w(("a1", "b2")) - 4.0) < 0.04)
    // a table already matching its targets never moves (scalings are /1)
    val sym = Seq(("a1", "b1", 1L), ("a1", "b2", 1L),
      ("a2", "b1", 1L), ("a2", "b2", 1L)).toDF("a", "b", "n")
    val rt1 = Seq(("a1", 2.0), ("a2", 2.0)).toDF("a", "target")
    val ct1 = Seq(("b1", 2.0), ("b2", 2.0)).toDF("b", "target")
    val w1 = Stats.rake(sym, "a", "b", "n", rt1, ct1, rounds = 5)
      .collect().map(_.getDouble(3))
    assert(w1.forall(_ == 1.0), s"fixed point drifted: ${w1.toSeq}")
    // a category with no target fails loudly — an inner join would
    // silently drop its cells and the raked table would lose mass
    val missing = Seq(("a1", 2.0)).toDF("a", "target") // a2 absent
    val ex = intercept[Exception] {
      Stats.rake(sym, "a", "b", "n", missing, ct1, rounds = 1).collect()
    }
    assert(ex.toString.contains("no target") ||
      Option(ex.getCause).exists(_.toString.contains("no target")),
      s"expected the missing-target raise, got: $ex")
  }

  test("stratifiedAte: within-stratum diffs from decimal means; one-sided stratum yields null diff") {
    import spark.implicits._
    val df = Seq((1L, 4L, true, 10.0), (2L, 3L, false, 20.0),
      (3L, 2L, true, 30.0), (4L, 1L, false, 40.0))
      .toDF("id", "score", "t", "y")
    val r = Stats.stratifiedAte(df, col("id"), col("score"), col("t"),
        col("y"), nStrata = 2)
      .orderBy("stratum").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getDouble(6)))
    assert(r.toSeq == Seq((1L, 1L, 1L, -10.0), (2L, 1L, 1L, -10.0)))
    // a stratum with no controls reports null diff, not a fake zero
    val oneSided = Seq((1L, 4L, true, 10.0), (2L, 3L, true, 20.0),
      (3L, 2L, true, 30.0), (4L, 1L, false, 40.0))
      .toDF("id", "score", "t", "y")
    val s = Stats.stratifiedAte(oneSided, col("id"), col("score"),
        col("t"), col("y"), nStrata = 2)
      .orderBy("stratum").collect()
    assert(s(0).isNullAt(6), "stratum 1 has no controls: diff must be null")
    assert(!s(1).isNullAt(6))
  }

  test("fightinWords: hand log-odds, z ranking, minCount gate") {
    import spark.implicits._
    // A: "x x y"; B: "y y z" — NA=NB=3, V=3; hand z: x 1.486312,
    // z-token -0.848928, y -0.887195 (rare-but-exclusive z ranks ABOVE
    // the shared y — exactly the variance correction raw ratios miss)
    val docs = Seq((true, "x x y"), (false, "y y z")).toDF("a", "text")
    val r = TA.fightinWords(docs, "text", col("a"), minCount = 1L, k = 10)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r.toSeq == Seq(("x", 2L, 0L, 2.302585, 1.486312),
      ("z", 0L, 1L, -1.386294, -0.848928),
      ("y", 1L, 2L, -0.916291, -0.887195)), s"got: ${r.toSeq}")
    // the count floor drops singletons entirely
    val gated = TA.fightinWords(docs, "text", col("a"), minCount = 3L, k = 10)
      .collect().map(_.getString(0))
    assert(gated.toSeq == Seq("y"))
  }

  test("vocabularyRichness: Chao1 bias-corrected form and Good-Turing unseen mass") {
    import spark.implicits._
    // en: tokens a a b c | c d -> N=6 S=4 f1=2 f2=2 -> chao1 = 4 + 2·1/6,
    // fr: singleton vocab -> chao1 = S (f1·(f1-1) = 0), p_unseen = 1
    val docs = Seq(("en", "a a b c"), ("en", "c d"), ("fr", "x"))
      .toDF("lang", "text")
    val r = TA.vocabularyRichness(docs, Seq("lang"), "text")
      .orderBy("lang").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5), x.getDouble(6)))
    assert(r(0) == (("en", 6L, 4L, 2L, 2L, 4.333333, 0.333333)))
    assert(r(1) == (("fr", 1L, 1L, 1L, 0L, 1.0, 1.0)))
  }

  test("cusumAlarms: reflection identity reproduces the reset-at-zero recursion") {
    import spark.implicits._
    // x = 3,1,0,5,5 with k=2: S = 1,0,0,3,6 (resets at the zero floor);
    // h=4 alarms only at the last point
    val df = Seq((1L, 3L), (2L, 1L), (3L, 0L), (4L, 5L), (5L, 5L))
      .toDF("o", "x")
    val r = EventAnalytics.cusumAlarms(df, col("o"), col("x"),
        lit(2L), lit(4L))
      .orderBy("ord").collect()
      .map(x => (x.getLong(2), x.getBoolean(3)))
    assert(r.toSeq == Seq((1L, false), (0L, false), (0L, false),
      (3L, false), (6L, true)), s"cusum: ${r.toSeq}")
  }

  test("partialCorr: perfect correlation survives partialling; degenerate control nulls") {
    import spark.implicits._
    // y = x exactly -> r_xy = 1; z correlates r = 2/sqrt(5) with both ->
    // partial = (1 - r^2)/(1 - r^2) = 1
    val df = Seq((1.0, 1.0, 1.0), (2.0, 2.0, 1.0), (3.0, 3.0, 2.0),
      (4.0, 4.0, 2.0)).toDF("x", "y", "z")
    val r = Stats.partialCorr(df, "x", "y", "z").collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.894427 &&
      r.getDouble(3) == 1.0, s"partial: $r")
    // z == x: |r_xz| = 1 -> denominator 0 -> null, never a 0/0
    val deg = Seq((1.0, 2.0, 1.0), (2.0, 1.0, 2.0), (3.0, 4.0, 3.0),
      (4.0, 3.0, 4.0)).toDF("x", "y", "z")
    assert(Stats.partialCorr(deg, "x", "y", "z").collect()(0).isNullAt(3))
  }

  test("hosmerLemeshow: per-decile (O-E)^2 terms and the replicated family total") {
    import spark.implicits._
    // bin1: p .9/.8 y T/F -> E1 1.7, term 1.921569;
    // bin2: p .3/.2 y F/F -> E1 0.5, term 0.666667; HL 2.588235
    val df = Seq((1L, 0.9, true), (2L, 0.8, false), (3L, 0.3, false),
      (4L, 0.2, false)).toDF("id", "p", "y")
    val r = Stats.hosmerLemeshow(df, col("id"), col("p"), col("y"),
        nBins = 2)
      .orderBy("decile").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5)))
    assert(r(0) == ((1L, 2L, 1L, 1.7, 1.921569, 2.588235)), s"hl: ${r(0)}")
    assert(r(1) == ((2L, 2L, 0L, 0.5, 0.666667, 2.588235)), s"hl: ${r(1)}")
  }

  test("yuenTTest: trimmed means, winsorized variance, Welch-style dof") {
    import spark.implicits._
    // A = 1..10, B = 2..11 (k=2, h=6): trimmed means 5.5 vs 6.5, shared
    // winsorized variance -> t = -0.594089, dof exactly 10
    val df = ((1 to 10).map(v => (true, v.toDouble)) ++
      (2 to 11).map(v => (false, v.toDouble))).toDF("a", "x")
    val r = Stats.yuenTTest(df, col("a"), col("x"), trim = 0.2).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 10L, 6L, 6L)))
    assert(r.getDouble(4) == 5.5 && r.getDouble(5) == 6.5, s"yuen: $r")
    assert(r.getDouble(6) == -0.594089 && r.getDouble(7) == 10.0,
      s"yuen t/dof: $r")
    // a singleton group has h = 1 -> null t, never a 0/0
    val tiny = Seq((true, 1.0), (true, 2.0), (true, 3.0), (false, 5.0))
      .toDF("a", "x")
    assert(Stats.yuenTTest(tiny, col("a"), col("x"), trim = 0.2)
      .collect()(0).isNullAt(6))
  }

  test("harmonicCentrality: path-graph hop sums, round bound, unreachable seeds absent") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val seeds = Seq(1L, 9L).toDF("n") // 9 is isolated
    val r3 = Graph.harmonicCentrality(e, "s", "d", seeds, "n", rounds = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    // 1 -> 2(d1) 3(d2) 4(d3): 1 + 1/2 + 1/3 (decimal-rounded) = 1.833333
    assert(r3 == Map(1L -> ((3L, 1.833333))), s"harmonic: $r3")
    val r1 = Graph.harmonicCentrality(e, "s", "d", seeds, "n", rounds = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r1 == Map(1L -> 1.0))
  }

  test("decisionStump: Gini gain argmax with threshold tiebreak") {
    import spark.implicits._
    // x=1: 0/2 pos, x=2: 1/2, x=3: 2/2 — splits at t=1 and t=2 BOTH gain
    // 0.25 (root 0.5 -> weighted 0.25); threshold ASC elects t=1
    val df = Seq((1.0, false), (1.0, false), (2.0, true), (2.0, false),
      (3.0, true), (3.0, true)).toDF("x", "y")
    val r = Stats.decisionStump(df, col("x"), col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((6L, 3L)))
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.25, s"stump: $r")
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((2L, 0L, 4L, 3L)))
  }

  test("decisionStump: a single distinct value still returns ONE row — totals with null threshold/gain") {
    import spark.implicits._
    val df = Seq((5.0, true), (5.0, false), (5.0, true)).toDF("x", "y")
    val r = Stats.decisionStump(df, col("x"), col("y")).collect()
    assert(r.length == 1, s"expected the documented one-row degenerate: ${r.toSeq}")
    assert((r(0).getLong(0), r(0).getLong(1)) == ((3L, 2L)))
    assert(r(0).isNullAt(2) && r(0).isNullAt(3) && r(0).isNullAt(4),
      s"no valid split must report null threshold/gain: ${r(0)}")
  }

  test("stratifiedAte: a null outcome fails the job loudly") {
    import spark.implicits._
    val df = Seq((1L, 4L, true, Some(10.0)), (2L, 3L, false, None),
      (3L, 2L, true, Some(30.0)), (4L, 1L, false, Some(40.0)))
      .toDF("id", "score", "t", "y")
    val ex = intercept[Exception] {
      Stats.stratifiedAte(df, col("id"), col("score"), col("t"),
        col("y"), nStrata = 2).collect()
    }
    assert(ex.toString.contains("null outcome") ||
      Option(ex.getCause).exists(_.toString.contains("null outcome")),
      s"expected the null-outcome raise, got: $ex")
  }

  test("mannKendallDaily: strictly increasing counts give S = n(n-1)/2, hand z") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // daily counts 1,2,3 -> S = 3, no value ties -> Var = 3*2*11/18
    val rows = (10 to 12).flatMap(d => Seq.fill(d - 9)(t(d)))
    val r = EventAnalytics.mannKendallDaily(rows.toDF("ts"), "ts").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 3.666667, s"var: $r")
    // z = (3-1)/sqrt(11/3)
    assert(r.getDouble(3) == 1.044466, s"z: $r")
  }

  test("runsTestDaily: alternating series maximizes runs; hand z") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,5,1,5,1 -> median 1, flags F,T,F,T,F -> R=5, n1=2, n2=3
    val counts = Seq(1, 5, 1, 5, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, d) => Seq.fill(c)(t(d + 10)) }
    val r = EventAnalytics.runsTestDaily(rows.toDF("ts"), "ts").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 2L, 3L, 5L)))
    // E = 1 + 12/5 = 3.4, Var = 0.84 -> z = 1.6/sqrt(0.84)
    assert(r.getDouble(4) == 1.745743, s"z: $r")
  }

  test("readability panel: Coleman-Liau, fog, SMOG on a hand sentence") {
    import spark.implicits._
    // "The cat sat. A dog ran away happily today.": 9 tokens,
    // 2 sentences, 32 letters, 1 complex word (happily: a/i/y groups)
    val df = Seq("The cat sat. A dog ran away happily today.").toDF("t")
    val r = df.select(TA.colemanLiau(col("t")).as("cli"),
      TA.gunningFog(col("t")).as("fog"),
      TA.smogIndex(col("t")).as("smog"),
      TA.complexWordCount(col("t")).as("cx"),
      TA.letterCount(col("t")).as("lc")).collect()(0)
    assert(r.getInt(3) == 1 && r.getInt(4) == 32, s"tallies: $r")
    assert(r.getDouble(0) == -1.471111, s"cli: $r")
    assert(r.getDouble(1) == 6.244444, s"fog: $r")
    assert(r.getDouble(2) == 7.168622, s"smog: $r")
    // blank text degenerates to the one-empty-token convention (the
    // tokens() split contract): zero letters, zero complex words
    val e = Seq("  ").toDF("t").select(TA.letterCount(col("t")),
      TA.complexWordCount(col("t"))).collect()(0)
    assert(e.getInt(0) == 0 && e.getInt(1) == 0)
  }

  test("turningPointsDaily: strict extrema only; flats don't count") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,3,2,2,5: day1 is a strict peak; day2's right diff is 0 and
    // day3's left diff is 0 -> neither counts. T=1, n=5:
    // E = 2, Var = 51/90, z = -1/sqrt(51/90)
    val counts = Seq(1, 3, 2, 2, 5)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(t(d + 10)) }
    val r = EventAnalytics.turningPointsDaily(rows.toDF("ts"), "ts")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((5L, 1L)))
    assert(r.getDouble(2) == -1.328422, s"z: $r")
  }

  test("coxStuartDaily: odd length drops the middle day; hand z") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,2,3,1,5: m=2, middle (3) dropped; pairs (1,1) tie, (2,5) up
    // -> s_plus=1, s_minus=0, n'=1, z = (1 - 0.5)/sqrt(0.25) = 1
    val counts = Seq(1, 2, 3, 1, 5)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(t(d + 10)) }
    val r = EventAnalytics.coxStuartDaily(rows.toDF("ts"), "ts")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 2L, 1L, 0L)))
    assert(r.getDouble(4) == 1.0, s"z: $r")
  }

  test("hurstDaily: alternating series -> R/S = 1 at every size, H = 0; " +
    "incomplete tail blocks drop") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,2 repeated over 8 days + a 9th day (incomplete at both
    // sizes): every complete block has R = 0.5, S = 0.5 -> R/S = 1,
    // so ln(mean_rs) = 0 at both sizes and the slope H = 0
    val counts = Seq(1, 2, 1, 2, 1, 2, 1, 2, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(t(d + 10)) }
    val r = EventAnalytics.hurstDaily(rows.toDF("ts"), "ts", Seq(2, 4))
      .collect()
    assert(r.length == 2)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2)) ==
      ((2L, 4L, 1.0)))
    assert((r(1).getLong(0), r(1).getLong(1), r(1).getDouble(2)) ==
      ((4L, 2L, 1.0)))
    assert(r(0).getDouble(3) == 0.0, s"h: ${r(0)}")
  }

  test("periodogramDaily: alternating 4-day series spikes at period 2") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,2,1,2: k=1 cancels (power 0); k=2 has c = -2 exactly
    // (cos at multiples of pi), power 4/36
    val counts = Seq(1, 2, 1, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(t(d + 10)) }
    val r = EventAnalytics.periodogramDaily(rows.toDF("ts"), "ts", maxK = 2)
      .collect()
    assert(r.length == 2)
    assert((r(0).getLong(0), r(0).getDouble(1), r(0).getDouble(2)) ==
      ((1L, 4.0, 0.0)))
    assert((r(1).getLong(0), r(1).getDouble(1), r(1).getDouble(2)) ==
      ((2L, 2.0, 0.111111)))
  }

  test("varianceRatioDaily: alternating counts -> hand VR(5)") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,2,1,2,... over 10 days: var1 = 80/81, var5 = 24/25
    val rows = (0 until 10).flatMap(d => Seq.fill(if (d % 2 == 0) 1 else 2)(t(d + 10)))
    val r = EventAnalytics.varianceRatioDaily(rows.toDF("ts"), "ts", k = 5)
      .collect()(0)
    assert(r.getLong(0) == 9L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.987654 && r.getDouble(3) == 0.96)
    assert(r.getDouble(4) == 0.1944, s"vr: $r")
  }

  test("peakConcurrency: within-day overlap, cross-day carry, [s,e) tie policy") {
    val day = 86400000000L
    val iv = Seq((10L, 20L), (15L, 30L), (100L, day + 50L),
      (day + 5L, day + 8L)).toDF("s", "e")
    val r = EventAnalytics.peakConcurrency(iv, col("s"), col("e"))
      .orderBy("day").collect()
    // day 0: running 1,2,1,0,1 -> peak 2; day 1: carry 1 (the spanner) +
    // within-day max 1 -> 2
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((0L, 0L, 2L), (1L, 1L, 2L)))
    // back-to-back [0,10) + [10,20): the -1 processes first at ts=10
    val bb = Seq((0L, 10L), (10L, 20L)).toDF("s", "e")
    val p = EventAnalytics.peakConcurrency(bb, col("s"), col("e")).collect()
    assert(p.length == 1 && p(0).getLong(2) == 1L,
      s"adjacent intervals must never overlap: ${p.toSeq}")
    // end exactly at midnight: [day-100, day) never occupies day 1 —
    // no day-1 row, no phantom carry
    val m = EventAnalytics.peakConcurrency(
      Seq((day - 100L, day)).toDF("s", "e"), col("s"), col("e"))
      .orderBy("day").collect()
    assert(m.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((0L, 0L, 1L)), s"midnight-exact end leaked a day: ${m.toSeq}")
    // boundary-exact end's dropped -1 must not deflate the next bucket:
    // A=[0,h) ends ON the hour-bucket edge; B/C overlap inside bucket 1
    val hour = day / 24
    val bx = Seq((0L, hour), (hour, hour + 10L), (hour + 2L, hour + 8L))
      .toDF("s", "e")
    val q = EventAnalytics.peakConcurrency(bx, col("s"), col("e")).collect()
    assert(q.length == 1 && q(0).getLong(2) == 2L,
      s"bucket-boundary end deflated the next bucket: ${q.toSeq}")
    // zero-length [a,a): emits its day, contributes no concurrency
    val z = EventAnalytics.peakConcurrency(
      Seq((5L, 5L)).toDF("s", "e"), col("s"), col("e")).collect()
    assert(z.map(x => (x.getLong(0), x.getLong(2))).toSeq == Seq((0L, 0L)),
      s"zero-length interval: ${z.toSeq}")
  }

  test("transitionEntropy: hand -ln p weighting over a two-user chain") {
    import java.sql.Timestamp
    def ev(u: Long, i: Long, tp: String) =
      (u, i, new Timestamp(1000L * i), tp)
    // user1: A>B>A>B; user2: A>A>C — transitions A>B x2, B>A, A>A, A>C
    val df = (Seq(ev(1, 1, "A"), ev(1, 2, "B"), ev(1, 3, "A"), ev(1, 4, "B"),
      ev(2, 5, "A"), ev(2, 6, "A"), ev(2, 7, "C")))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = EventAnalytics.transitionEntropy(df, "user_id", "event_id",
      "ts", "event_type").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L)
    // H = (2 ln2 + 1 ln4 + 1 ln4 + 0)/5
    assert(r.getDouble(2) == 0.831777, s"H: $r")
    assert(math.abs(r.getDouble(3) - math.exp(0.8317766166)) < 2e-6,
      s"perplexity: $r")
  }

  test("kmGreenwood: hand survival + Greenwood SE; censored row carries both forward") {
    import spark.implicits._
    val df = Seq((1L, true), (2L, true), (3L, false)).toDF("t", "e")
    val r = EventAnalytics.kmGreenwood(df, col("t"), col("e"))
      .orderBy("duration").collect()
    assert(r.map(_.getDouble(4)).toSeq == Seq(0.666667, 0.333333, 0.333333))
    // SE(1) = (2/3)sqrt(1/6); SE(2) = (1/3)sqrt(1/6 + 1/2) — equal by hand
    assert(r.map(_.getDouble(5)).toSeq ==
      Seq(0.272166, 0.272166, 0.272166), s"se: ${r.toSeq}")
  }

  test("cumulativeIncidence: hand Aalen-Johansen increments over two causes") {
    import spark.implicits._
    // t=1: n=4, one cause-1 + one cause-2 event; t=2: n=2, one cause-1,
    // one censored -> CIF1 = 0.25 then 0.25 + 0.5*0.5 = 0.5
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 0L)).toDF("t", "k")
    val r = EventAnalytics.cumulativeIncidence(df, col("t"), col("k"))
      .orderBy("cause", "duration").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    assert(r.toSeq == Seq((1L, 1L, 4L, 1L, 0.25), (2L, 1L, 2L, 1L, 0.5),
      (1L, 2L, 4L, 1L, 0.25)), s"cif: ${r.toSeq}")
  }

  test("ljungBox: hand Q over an alternating series; empty lags drop") {
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // counts 1,2,1,2,1,2: rho_k = -5/6, 2/3, -1/2, 1/3, -1/6; lags 6,7
    // have no pairs -> 5 lag terms; Q = 6*8*(sum rho^2/(n-k)) = 20
    val rows = (0 until 6).flatMap(d => Seq.fill(if (d % 2 == 0) 1 else 2)(t(d + 10)))
    val r = EventAnalytics.ljungBox(rows.toDF("ts"), "ts", maxLag = 7)
      .collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 20.0, s"Q: $r")
  }

  test("hosmerLemeshow: a null label on a scored row fails the job loudly") {
    import spark.implicits._
    val df = Seq((1L, 0.9, Some(true)), (2L, 0.8, None),
      (3L, 0.3, Some(false)), (4L, 0.2, Some(false)))
      .toDF("id", "p", "y")
    val ex = intercept[Exception] {
      Stats.hosmerLemeshow(df, col("id"), col("p"), col("y"),
        nBins = 2).collect()
    }
    assert(ex.toString.contains("null label") ||
      Option(ex.getCause).exists(_.toString.contains("null label")),
      s"expected the null-label raise, got: $ex")
  }

  test("oneWayAnova: hand SSB/SSW/F; degenerate single group nulls F") {
    import spark.implicits._
    // a: 1,2,3 | b: 4,5,6 -> SG = 12+75, SSB = 87-73.5, SSW = 91-87
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "x")
    val r = Stats.oneWayAnova(df, col("g"), col("x")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 6L)))
    assert(r.getDouble(2) == 13.5 && r.getDouble(3) == 4.0 &&
      r.getDouble(4) == 13.5, s"anova: $r")
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "x")
    assert(Stats.oneWayAnova(one, col("g"), col("x")).collect()(0).isNullAt(4))
  }

  test("kruskalWallis: dyadic average ranks, tie correction") {
    import spark.implicits._
    // a: 1,2 | b: 2,3 -> avg ranks 1, 2.5, 4; H = 1.35; C = 1 - 6/60;
    // H_adj = 1.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val r = Stats.kruskalWallis(df, col("g"), col("v")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 4L)))
    assert(r.getDouble(2) == 1.35 && r.getDouble(3) == 1.5, s"kw: $r")
    // every value tied -> C = 0 -> null adjusted H
    val flat = Seq(("a", 1.0), ("b", 1.0)).toDF("g", "v")
    assert(Stats.kruskalWallis(flat, col("g"), col("v"))
      .collect()(0).isNullAt(3))
  }

  test("brownForsythe: deviations from the LOWER-MEDIAN data element") {
    import spark.implicits._
    // a: 1,2,9 (med 2 -> z 1,0,7) | b: 4,4,4 (z all 0):
    // SSB 10.666667, SSW 28.666667, F 1.488372
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 9.0),
      ("b", 4.0), ("b", 4.0), ("b", 4.0)).toDF("g", "x")
    val r = Stats.brownForsythe(df, col("g"), col("x")).collect()(0)
    assert(r.getDouble(2) == 10.666667 && r.getDouble(3) == 28.666667 &&
      r.getDouble(4) == 1.488372, s"bf: $r")
  }

  test("mcnemar: only discordant cells count; continuity correction") {
    import spark.implicits._
    val df = (Seq.fill(2)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(4)((false, false)))
      .toDF("bef", "aft")
    val r = Stats.mcnemar(df, col("bef"), col("aft")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 1L, 3L)))
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 0.25, s"mcnemar: $r")
    // no discordance -> null chi2, never 0/0
    val conc = Seq((true, true), (false, false)).toDF("bef", "aft")
    assert(Stats.mcnemar(conc, col("bef"), col("aft"))
      .collect()(0).isNullAt(3))
  }

  test("mantelHaenszel: pooled OR across hand strata") {
    import spark.implicits._
    // s1 cells a2 b1 c1 d2; s2 balanced a1 b1 c1 d1 -> OR_MH = 2.2
    def rows(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val df = (rows("s1", 2, 1, 1, 2) ++ rows("s2", 1, 1, 1, 1))
      .toDF("s", "x", "y")
    val r = Stats.mantelHaenszel(df, col("s"), col("x"), col("y"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 10L)))
    assert(r.getDouble(2) == 0.916667 && r.getDouble(3) == 0.416667 &&
      r.getDouble(4) == 2.2, s"mh: $r")
  }

  test("oaxacaBlinder: explained + unexplained = gap on hand OLS lines") {
    import spark.implicits._
    // A: y = 10x (alpha 0); B: y = 10x + 10 — gap -15 splits into
    // explained beta_B·(x̄A − x̄B) = -5 and unexplained -10 (intercepts)
    val df = Seq((true, 1.0, 10.0), (true, 2.0, 20.0),
      (false, 1.0, 20.0), (false, 3.0, 40.0)).toDF("a", "x", "y")
    val r = Stats.oaxacaBlinder(df, col("a"), col("x"), col("y"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == -15.0 && r.getDouble(3) == -5.0 &&
      r.getDouble(4) == -10.0, s"decomposition: $r")
    // zero x-variance in a group -> null decomposition, never a div0
    val flat = Seq((true, 1.0, 10.0), (true, 1.0, 20.0),
      (false, 1.0, 20.0), (false, 3.0, 40.0)).toDF("a", "x", "y")
    val f = Stats.oaxacaBlinder(flat, col("a"), col("x"), col("y"))
      .collect()(0)
    assert(!f.isNullAt(2) && f.isNullAt(4), "flat-x group must null the split")
  }

  test("cochranArmitage: hand trend T=2 V=1 z2=4; flat proportions give z2 ~ 0") {
    import spark.implicits._
    val df = Seq((1L, false), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, true)).toDF("s", "y")
    val r = Stats.cochranArmitage(df, col("s"), col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 6L, 3L)))
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 1.0 &&
      r.getDouble(5) == 4.0, s"trend: $r")
    // all-success family: pbar = 1 -> var 0 -> null z2
    val deg = Seq((1L, true), (2L, true)).toDF("s", "y")
    assert(Stats.cochranArmitage(deg, col("s"), col("y"))
      .collect()(0).isNullAt(5))
  }

  test("fleissKappa: hand 2x2 family; unequal rater counts null out") {
    import spark.implicits._
    // item1 aa, item2 ab: P̄ = .5, p_e = (9+1)/16 -> kappa = -1/3
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
      .toDF("item", "cat")
    val r = Stats.fleissKappa(df, col("item"), col("cat")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.625 &&
      r.getDouble(4) == -0.333333, s"kappa: $r")
    // a 3-rating item next to 2-rating items: surfaced, not mis-estimated
    val uneq = df.union(Seq((2L, "b")).toDF("item", "cat"))
    assert(Stats.fleissKappa(uneq, col("item"), col("cat"))
      .collect()(0).isNullAt(4))
  }

  test("kishDesignEffect: ess/deff from decimal sums; non-positive weights excluded") {
    import spark.implicits._
    val df = Seq(("g", Some(1.0)), ("g", Some(1.0)), ("g", Some(2.0)),
      ("g", Some(-5.0)), ("g", None)).toDF("grp", "w")
    val r = Stats.kishDesignEffect(df, Seq("grp"), col("w")).collect()(0)
    assert((r.getLong(1), r.getLong(2)) == ((3L, 2L)))
    assert(r.getDouble(3) == 4.0 && r.getDouble(4) == 2.666667 &&
      r.getDouble(5) == 1.125, s"kish: $r")
    // equal weights carry no design effect
    val eq = Seq(("h", 2.0), ("h", 2.0)).toDF("grp", "w")
    assert(Stats.kishDesignEffect(eq, Seq("grp"), col("w"))
      .collect()(0).getDouble(5) == 1.0)
  }

  test("negativeSample: positives excluded, slot-order ranks, under-fill") {
    import spark.implicits._
    val universe5 = (0L to 4L).toDF("id")
    // query 0, positives {0,1}: draws land on docs 3,1,4,2 by slot —
    // doc 1 is a positive, so ranks ship (3, 4)
    val pos = Seq((0L, 0L), (0L, 1L)).toDF("q", "d")
    val r = graft.pipeline.Curation.negativeSample(pos, "q", "d",
        universe5, k = 2)
      .orderBy("rank").collect()
      .map(x => (x.getLong(2), x.getInt(3)))
    assert(r.toSeq == Seq((3L, 1), (4L, 2)))
    // 2-doc universe: 4 draws collapse to {0,1}; positive {0} leaves ONE
    // survivor -> documented under-fill below k
    val tiny = graft.pipeline.Curation.negativeSample(
      Seq((1L, 0L)).toDF("q", "d"), "q", "d", (0L to 1L).toDF("id"), k = 2)
      .collect().map(x => (x.getLong(2), x.getInt(3)))
    assert(tiny.toSeq == Seq((1L, 1)))
  }
  test("sortedNeighborhood: window pairs, id tiebreak, block isolation") {
    import spark.implicits._
    val df = Seq((1L, "a", "X"), (2L, "b", "X"), (3L, "c", "X"),
      (4L, "d", "X"), (9L, "a", "Y")).toDF("id", "k", "blk")
    val r = Linkage.sortedNeighborhood(df, "id", "k", col("blk"), window = 2)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getInt(5))).sorted
    assert(r.toSeq == Seq((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 1),
      (2L, 4L, 2), (3L, 4L, 1)))  // Y is alone: no cross-block pair with 1
  }

  test("fellegiSunterWeights: smoothed m/u counts, ln-ratio weights, null agreement = disagree") {
    import spark.implicits._
    // 4 labeled pairs: 2 matches (nation agrees on both; phone on one),
    // 2 non-matches (nation agrees on one — the confusable case; phone never)
    val pairs = Seq(
      (true, Some(true), Some(true)),
      (true, Some(true), Some(false)),
      (false, Some(true), Some(false)),
      (false, Option.empty[Boolean], Some(false))  // null -> disagree
    ).toDF("lbl", "nation_eq", "phone_eq")
    val w = Linkage.fellegiSunterWeights(pairs, col("lbl"),
        Seq("nation" -> col("nation_eq"), "phone" -> col("phone_eq")))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = w("nation")
    assert(n.getLong(1) == 2L && n.getLong(2) == 2L)   // n_match / n_nonmatch
    assert(n.getLong(3) == 2L && n.getLong(4) == 1L)   // agree counts
    // m = 2.5/3, u = 1.5/3; w_agree = ln(m) - ln(u) = ln(5/3)
    assert(n.getDouble(5) == 0.833333 && n.getDouble(6) == 0.5)
    assert(n.getDouble(7) == 0.510826)   // ln(m/u) = ln(5/3), HALF_UP 6dp
    val p = w("phone")
    assert(p.getLong(3) == 1L && p.getLong(4) == 0L)
    // u smoothed to 0.5/3 — finite weights even with zero agreements
    assert(p.getDouble(6) == 0.166667)
    // field order preserved
    val order = Linkage.fellegiSunterWeights(pairs, col("lbl"),
      Seq("phone" -> col("phone_eq"), "nation" -> col("nation_eq")))
      .collect().map(_.getString(0)).toSeq
    assert(order == Seq("phone", "nation"))
    // empty pair relation: zero counts (not nulls), smoothed m = u = 0.5,
    // weights exactly 0 — never a null-poisoned report
    val empty = Linkage.fellegiSunterWeights(pairs.filter(lit(false)),
      col("lbl"), Seq("nation" -> col("nation_eq"))).collect()(0)
    assert(empty.getLong(1) == 0L && empty.getLong(3) == 0L)
    assert(empty.getDouble(5) == 0.5 && empty.getDouble(7) == 0.0)
  }

  test("businessDaysBetween: Thursday epoch anchor, weekends, signed span") {
    import spark.implicits._
    val df = Seq((0L, 1L), (0L, 7L), (2L, 4L), (4L, 11L), (7L, 0L))
      .toDF("s", "e")
    val r = df.select(EventAnalytics.businessDaysBetween(col("s"), col("e")))
      .collect().map(_.getLong(0))
    assert(r.toSeq == Seq(1L, 5L, 0L, 5L, -5L))
  }
  test("markovAttribution: hand chain, removal effects, normalization") {
    import spark.implicits._
    // u1: A -> buy; u2: A -> B -> buy; u3: B -> (no conversion)
    // exact absorption: P(conv) = 2/3; removing A -> 1/6 (re .75),
    // removing B -> 1/3 (re .5); attribution .6 / .4
    val ev = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 11L, "buy"),
      (2L, 1L, 20L, "A"), (2L, 2L, 21L, "B"), (2L, 3L, 22L, "buy"),
      (3L, 1L, 30L, "B"))
      .toDF("u", "sec", "eid", "et")
      .select(col("u"), expr("timestamp_micros(sec * 1000000)").as("ts"),
        col("eid"), col("et"))
    val r = EventAnalytics.markovAttribution(ev, "u", "ts", "eid", "et",
        "buy", rounds = 8)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))
      .toMap
    assert(r("A") == ((0.666667, 0.166667, 0.75, 0.6)))
    assert(r("B") == ((0.666667, 0.333333, 0.5, 0.4)))
  }
  test("restrictedMeanSurvival: KM step integral, tau clamp, tail plateau") {
    import spark.implicits._
    // q332 spec curve: S = 1, .8, .8, .266667, 0 on segments
    // [0,1) [1,2) [2,3) [3,4) [4,tau)
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (5L, true)).toDF("t", "ev")
    val r10 = EventAnalytics.restrictedMeanSurvival(df, col("t"), col("ev"),
      tau = 10L).collect().head
    // widths: 1, 1, 1, 2 (to t=5), then 0-survival tail
    val exp = 1.0 + 0.8 + 0.8 + 0.266667 * 2
    assert(r10.getLong(0) == 10L && r10.getLong(1) == 5L)
    assert(r10.getDouble(2) == math.round(exp * 1e6) / 1e6)
    // tau = 2 clamps everything after the second segment
    val r2 = EventAnalytics.restrictedMeanSurvival(df, col("t"), col("ev"),
      tau = 2L).collect().head
    assert(r2.getDouble(2) == 1.8)
  }
  test("frequentSequences: user support not occurrences; n-gram window") {
    import spark.implicits._
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"), (1L, 4L, "B"),
      (1L, 5L, "C"), (2L, 1L, "B"), (2L, 2L, "C"), (2L, 3L, "B"),
      (3L, 1L, "A"), (3L, 2L, "B"))
      .toDF("u", "sec", "t")
      .select(col("u"), expr("timestamp_micros(sec * 1000000)").as("ts"),
        col("sec").as("eid"), col("t"))
    val bi = EventAnalytics.frequentSequences(ev, "u", "ts", "eid", "t",
        n = 2, minSupport = 2L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(bi == Map("A>B" -> 2L, "B>C" -> 2L, "C>B" -> 2L))
    val tri = EventAnalytics.frequentSequences(ev, "u", "ts", "eid", "t",
        n = 3, minSupport = 2L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(tri == Map("B>C>B" -> 2L))  // u1's repeat counts once
  }

  test("polygonArea: shoelace with wraparound; orientation flag") {
    import spark.implicits._
    val v = Seq(("sq", 1L, 0L, 0L), ("sq", 2L, 1L, 0L), ("sq", 3L, 1L, 1L),
      ("sq", 4L, 0L, 1L),
      ("cw", 1L, 0L, 0L), ("cw", 2L, 0L, 1L), ("cw", 3L, 1L, 1L),
      ("cw", 4L, 1L, 0L),
      ("tri", 1L, 0L, 0L), ("tri", 2L, 2L, 0L), ("tri", 3L, 0L, 2L))
      .toDF("p", "s", "x", "y")
    val r = graft.pipeline.Spatial.polygonArea(v, "p", col("s"), col("x"),
        col("y"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4))).toMap
    assert(r("sq") == ((4L, 2L, 1.0, true)))
    assert(r("cw") == ((4L, 2L, 1.0, false)))
    assert(r("tri") == ((3L, 4L, 2.0, true)))
  }

  test("keynessG2: Dunning LLR with the exact direction cross-compare") {
    import spark.implicits._
    // a = 'x x y', b = 'x y y y': g2(x) = .689338 over_a,
    // g2(y) = .553609 over_b
    val docs = Seq(("a", "x x y"), ("b", "x y y y")).toDF("g", "text")
    val r = TA.keynessG2(docs, "text", col("g"), "a", "b", topN = 10)
      .collect()
    assert(r.length == 2)
    assert(r(0).getString(0) == "x" && r(0).getDouble(3) == 0.689338 &&
      r(0).getBoolean(4), s"x: ${r(0)}")
    assert(r(1).getString(0) == "y" && r(1).getDouble(3) == 0.553609 &&
      !r(1).getBoolean(4), s"y: ${r(1)}")
  }

  test("hillNumbers: effective-type ladder on a hand distribution") {
    import spark.implicits._
    // a a a b b c: N=6, 0D=3, 1D=e^H=2.749459, 2D=36/14=2.571429,
    // J = H/ln3 = .92062; single-type group: H=0, 1D=1, J null
    val docs = Seq(("en", "a a a b b c"), ("fr", "x x"))
      .toDF("lang", "text")
    val r = TA.hillNumbers(docs, Seq("lang"), "text").orderBy("lang")
      .collect()
    assert(r(0).getLong(1) == 6L && r(0).getLong(2) == 3L)
    assert(r(0).getDouble(3) == 2.749459 && r(0).getDouble(4) == 2.571429)
    assert(r(0).getDouble(5) == 0.92062, s"en: ${r(0)}")
    assert(r(1).getDouble(3) == 1.0 && r(1).getDouble(4) == 1.0 &&
      r(1).isNullAt(5), s"fr: ${r(1)}")
  }

  test("bergerParker: dominance share with lexicographic tie-break") {
    import spark.implicits._
    // b b a a c: tie at 2 -> top token 'a' (min), share 2/5
    val docs = Seq(("en", "b b a a c")).toDF("lang", "text")
    val r = TA.bergerParker(docs, Seq("lang"), "text").collect()(0)
    assert(r.getLong(1) == 5L && r.getString(2) == "a" &&
      r.getLong(3) == 2L && r.getDouble(4) == 0.4, s"bp: $r")
  }

  test("goodTuringSmooth: hand r* ladder; f_r = 0 nulls") {
    import spark.implicits._
    // counts a=3 b=2 c=1 d=1: f1=2 f2=1 f3=1 f4=0
    // r=1: 2*1/2=1; r=2: 3*1/1=3; r=3: 4*0/1=0; r=4: f4=0 -> null
    val docs = Seq(("en", "a a a b b c d")).toDF("lang", "text")
    val r = TA.goodTuringSmooth(docs, "lang", "text", maxR = 4)
      .orderBy("r").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(r(0).getLong(2) == 2L && r(0).getDouble(4) == 1.0)
    assert(r(1).getDouble(4) == 3.0 && r(2).getDouble(4) == 0.0)
    assert(r(3).getLong(2) == 0L && r(3).isNullAt(4), s"gt: ${r(3)}")
  }

  // shared 2x2 lattice for the spatial autocorrelation family:
  // counts (0,0)=1, (0,1)=2, (1,0)=3, (1,1)=6 at cellSize 1
  private def latticePts = {
    val rows = Seq.fill(1)((0L, 0L)) ++ Seq.fill(2)((0L, 1L)) ++
      Seq.fill(3)((1L, 0L)) ++ Seq.fill(6)((1L, 1L))
    rows.toDF("x", "y")
  }

  test("moransI: exact rational on the 2x2 lattice") {
    import spark.implicits._
    // scaled devs -8,-4,0,12; num = -32, den = 224, W = 8:
    // I = 4*(-32)/(8*224) = -.071429, E[I] = -1/3
    val r = Spatial.moransI(latticePts, col("x"), col("y"), cellSize = 1L)
      .collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 8L)
    assert(r.getDouble(2) == -0.071429 && r.getDouble(3) == -0.333333,
      s"mi: $r")
  }

  test("cell bucketing is floor division: Moran's I is translation-" +
    "invariant across the negative quadrant") {
    import spark.implicits._
    // truncate-toward-zero bucketing would collapse x in -(s-1)..(s-1)
    // into one double-width cell 0 and break this invariance
    val pts = Seq((-3L, -5L), (-3L, -4L), (-2L, -5L), (-1L, -1L),
      (0L, 0L), (0L, 1L), (1L, 0L), (2L, 3L), (3L, 3L), (3L, 2L),
      (-3L, 3L), (2L, -4L))
    val neg = pts.toDF("x", "y")
    val pos = pts.map { case (x, y) => (x + 100L, y + 100L) }.toDF("x", "y")
    val a = Spatial.moransI(neg, col("x"), col("y"), cellSize = 2L)
      .collect()(0)
    val b = Spatial.moransI(pos, col("x"), col("y"), cellSize = 2L)
      .collect()(0)
    assert(a == b, s"translation broke the lattice: $a vs $b")
    assert(a.getLong(0) > 1L, s"degenerate lattice: $a")
  }

  test("gearysC: local-gradient rational on the 2x2 lattice") {
    import spark.implicits._
    // num2 = 60: C = 3*16*60/(16*224) = .803571
    val r = Spatial.gearysC(latticePts, col("x"), col("y"), cellSize = 1L)
      .collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 8L)
    assert(r.getDouble(2) == 0.803571, s"gc: $r")
  }

  test("joinCountStats: BB/WW/BW and nonfree expectation") {
    import spark.implicits._
    // black = {6}: bb=0 ww=2 bw=2, E[BW] = 4*2*1*3/(4*3) = 2
    val r = Spatial.joinCountStats(latticePts, col("x"), col("y"),
      cellSize = 1L).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((0L, 2L, 2L)))
    assert(r.getDouble(5) == 2.0, s"jc: $r")
  }

  test("generalG: high-value clustering rational") {
    import spark.implicits._
    // num = 70, den = 144-50 = 94 -> .744681; E[G] = 8/12
    val r = Spatial.generalG(latticePts, col("x"), col("y"), cellSize = 1L)
      .collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 8L)
    assert(r.getDouble(2) == 0.744681 && r.getDouble(3) == 0.666667,
      s"gg: $r")
  }

  test("tokenCoverage: cumulative shares at the k grid") {
    import spark.implicits._
    // counts a=3 b=2 c=1: top-1 covers 3/6, top-2 covers 5/6
    val docs = Seq(("en", "a a a b b c")).toDF("lang", "text")
    val r = TA.tokenCoverage(docs, "lang", "text", ks = Seq(1, 2))
      .orderBy("k").collect()
    assert(r(0).getInt(1) == 1 && r(0).getLong(2) == 3L &&
      r(0).getDouble(4) == 0.5, s"k1: ${r(0)}")
    assert(r(1).getInt(1) == 2 && r(1).getLong(2) == 5L &&
      r(1).getDouble(4) == 0.833333, s"k2: ${r(1)}")
  }
}
