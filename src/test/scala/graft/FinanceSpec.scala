package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{EventAnalytics, Finance}

/** Semantic unit tests for the finance/commerce kernels (q292-q295):
  * hand-computed drawdowns with tie elections, exact ABC boundary
  * straddles, aging bucket edges, and rapid-repeat window inclusivity.
  */
class FinanceSpec extends SparkSpec {
  import spark.implicits._

  private val us = (d: Long) => d * 86400000000L
  private def tsDf(rows: Seq[(Long, Double)]) = rows
    .toDF("day", "amount")
    .select(expr("timestamp_micros(day * 86400000000)").as("ts"),
      col("amount"))

  test("drawdownReport: running-peak drawdown; dd ties take the earliest day") {
    // daily revenue: 100, 40, 90, 120, 60, 60  (two days tie at dd=60)
    val df = tsDf(Seq(1L -> 100.0, 2L -> 40.0, 3L -> 90.0, 4L -> 120.0,
      5L -> 60.0, 6L -> 60.0))
    val r = Finance.drawdownReport(df, "ts", col("amount")).collect().head
    assert(r.getLong(0) == 6L)          // n_days
    assert(r.getLong(1) == 2L)          // trough_day: dd=60 first at day 2
    assert(r.getDouble(2) == 100.0)     // peak at that time (not 120)
    assert(r.getDouble(3) == 40.0)
    assert(r.getDouble(4) == 60.0)
    assert(r.getDouble(5) == 0.6)
  }

  test("drawdownReport: monotone series has zero drawdown") {
    val df = tsDf(Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    val r = Finance.drawdownReport(df, "ts", col("amount")).collect().head
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
    assert(r.getLong(1) == 1L) // dd=0 everywhere -> earliest day elected
  }

  test("abcClassification: exact boundary — cum == aPct% lands in A") {
    // revenues 80, 15, 5 (micro units): cum(80)*100 == tot(100)*80 -> A;
    // cum(95)*100 == tot*95 -> B; the tail -> C
    val df = Seq(("k1", 80L), ("k2", 15L), ("k3", 5L)).toDF("k", "rev")
    val r = Finance.abcClassification(df, "k", col("rev"))
      .orderBy("abc_class").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L))
    assert(r.map(_.getDouble(3)).toSeq == Seq(0.8, 0.15, 0.05))
  }

  test("abcClassification: equal revenues rank by key ascending") {
    // four equal keys, 25% each: k1 (cum 25) + k2 (50) + k3 (75) are A at
    // aPct=75; k4 closes at 100 -> C with bPct=90
    val df = Seq(("k4", 10L), ("k2", 10L), ("k3", 10L), ("k1", 10L))
      .toDF("k", "rev")
    val r = Finance.abcClassification(df, "k", col("rev"), aPct = 75,
        bPct = 90)
      .orderBy("abc_class").collect()
    assert(r.map(r0 => (r0.getString(0), r0.getLong(1))).toSeq ==
      Seq(("A", 3L), ("C", 1L)))
  }

  test("agingBuckets: inclusive edges; closed rows anchor but don't count") {
    // as-of = day 100 (carried by a CLOSED row); open ages 0,30,31,90,91
    val df = Seq(
      (100L, 50.0, false), // closed: sets the anchor only
      (100L, 1.0, true), (70L, 2.0, true), (69L, 4.0, true),
      (10L, 8.0, true), (9L, 16.0, true))
      .toDF("day", "amount", "is_open")
      .select(expr("timestamp_micros(day * 86400000000)").as("ts"),
        col("amount"), col("is_open"))
    val r = Finance.agingBuckets(df, "ts", col("amount"), col("is_open"))
      .orderBy("bucket").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      ("0-30", 2L, 3.0, 70L),    // ages 0 and 30
      ("31-60", 1L, 4.0, 69L),   // age 31
      ("61-90", 1L, 8.0, 10L),   // age 90
      ("90+", 1L, 16.0, 9L)))    // age 91
  }

  test("rapidRepeats: window is inclusive; chains emit every adjacent pair; keys isolate") {
    val df = Seq(
      // user 1 / a: 0s, 3600s (inclusive hit), 7201s (3601s gap - miss)
      (1L, "a", 0L, 10L), (1L, "a", 3600L, 11L), (1L, "a", 7201L, 12L),
      // user 1 / b: isolated from the a-chain
      (1L, "b", 1L, 13L),
      // user 2 / a: a triple burst -> two pairs
      (2L, "a", 0L, 20L), (2L, "a", 5L, 21L), (2L, "a", 9L, 22L))
      .toDF("user_id", "event_type", "sec", "event_id")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_micros(sec * 1000000)").as("ts"), col("event_id"))
    val r = EventAnalytics.rapidRepeats(df, Seq("user_id", "event_type"),
        "ts", "event_id", 3600L)
      .orderBy("event_id").collect()
      .map(x => (x.getLong(3), x.getLong(2), x.getDouble(4)))
    assert(r.toSeq == Seq((11L, 10L, 3600.0), (21L, 20L, 5.0),
      (22L, 21L, 4.0)))
  }

  test("rollingDailyCorr: hand-computed 3-day windows; degenerate den -> null") {
    // days 1-4: (x,y-cents) = (1,100),(2,200),(3,300),(1,500):
    // window@3 = perfect corr 1.0; window@4 = -600/sqrt(840000)
    val rows = Seq((1L, 1.0), (2L, 1.0), (2L, 1.0), (3L, 1.0), (3L, 1.0),
      (3L, 1.0), (4L, 5.0))
    val df = rows.toDF("day", "v")
      .select(expr("timestamp_micros(day * 86400000000)").as("ts"), col("v"))
    val r = EventAnalytics.rollingDailyCorr(df, "ts", col("v"), 3)
      .orderBy("day").collect()
    assert(r.length == 2)
    assert(r(0).getLong(0) == 3L && r(0).getDouble(2) == 1.0)
    val exp = math.round(-600.0 / math.sqrt(840000.0) * 1e6) / 1e6
    assert(r(1).getLong(0) == 4L && r(1).getDouble(2) == exp)
    // constant x across the window -> den = 0 -> null corr
    val const = Seq((1L, 1.0), (2L, 2.0), (3L, 9.0)).toDF("day", "v")
      .select(expr("timestamp_micros(day * 86400000000)").as("ts"), col("v"))
    val c = EventAnalytics.rollingDailyCorr(const, "ts", col("v"), 3)
      .collect()
    assert(c.length == 1 && c(0).isNullAt(2))
  }

  test("priceIndex: both-period items only; exact base denominator") {
    // A: base p=5 (q2, $10), cur p=6 (q4, $24) -> term 6*2 = 12$,
    // index 12/10 = 1.2; B base-only and C current-only are excluded
    val df = Seq(
      ("A", false, 1L, 4.0), ("A", false, 1L, 6.0),  // base qty 2, $10
      ("A", true, 4L, 24.0),
      ("B", false, 3L, 9.0), ("C", true, 2L, 10.0))
      .toDF("k", "p", "qty", "amt")
    val r = Finance.priceIndex(df, "k", col("p"), col("qty"), col("amt"))
      .collect()(0)
    assert(r.getLong(0) == 1L)
    assert(r.getDouble(1) == 10.0 && r.getDouble(2) == 1.2)
  }

  test("revenueRecognition: pro-rata period splits; micro-cent truncation") {
    // $3 over days 0..59 -> $1.50 per 30-day period;
    // $1 over days 29..31 -> 1/3 : 2/3 with one truncated micro-cent
    val df = Seq((0L, 59L, 3.0), (29L, 31L, 1.0)).toDF("s", "e", "amt")
    val r = Finance.revenueRecognition(df, col("s"), col("e"), col("amt"))
      .orderBy("period").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq ==
      Seq((0L, 2L, 1.5 + 0.333333), (1L, 2L, 1.5 + 0.666666)))
    // degenerate span (e < s) drops
    val bad = Seq((5L, 4L, 9.0)).toDF("s", "e", "amt")
    assert(Finance.revenueRecognition(bad, col("s"), col("e"), col("amt"))
      .isEmpty)
  }

  test("priceVolumeBridge: exact micro-cent identity incl. truncation dust") {
    // A both-periods exact: rate $4 + vol $10 = delta $14, zero dust
    // B base-only -> discontinued $9;  C current-only -> new $10
    // D shrinks 3->1 units on a $10 base: rate -0.333333, vol -6.666666,
    //   delta -7 -> one micro-cent of truncation dust (residual -0.000001)
    // E zero-qty current period row counts as discontinued (q>0 gate)
    val df = Seq(
      ("A", false, 1L, 4.0), ("A", false, 1L, 6.0), ("A", true, 4L, 24.0),
      ("B", false, 3L, 9.0), ("C", true, 2L, 10.0),
      ("D", false, 3L, 10.0), ("D", true, 1L, 3.0),
      ("E", false, 1L, 2.0), ("E", true, 0L, 0.0))
      .toDF("k", "p", "qty", "amt")
    val r = Finance.priceVolumeBridge(df, "k", col("p"), col("qty"),
      col("amt")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 2L)))
    assert(r.getDouble(3) == 6.0)         // delta: 14 - 9 + 10 - 7 - 2
    assert(r.getDouble(4) == 3.666667)    // rate: 4 - 0.333333
    assert(r.getDouble(5) == 3.333334)    // vol: 10 - 6.666666
    assert(r.getDouble(6) == 10.0 && r.getDouble(7) == 11.0)
    // identity: delta == rate + vol + new - disc + residual, exactly
    assert(r.getDouble(8) == -0.000001)
    assert(r.getDouble(3) == math.round((r.getDouble(4) + r.getDouble(5) +
      r.getDouble(6) - r.getDouble(7) + r.getDouble(8)) * 1e6) / 1e6)
  }

  test("datasetCard: dup/short rates, language entropy, token totals") {
    import graft.pipeline.{TextAnalysis => TA}
    val df = Seq((1L, "hello world", "en"), (2L, "hello world", "en"),
      (3L, "x", "fr")).toDF("doc_id", "text", "lang")
    val r = TA.datasetCard(df, "text", col("lang"), shortChars = 5)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert(r.getLong(2) == 23L && r.getLong(3) == 5L)
    assert(r.getDouble(4) == 0.333333 && r.getDouble(5) == 0.333333)
    // H = -(2/3)ln(2/3) - (1/3)ln(1/3) = ln3 - (2/3)ln2
    val exp = math.log(3) - 2.0 / 3 * math.log(2)
    assert(math.abs(r.getDouble(6) - exp) < 1e-6)
  }

  test("hhiConcentration: monopoly 10000; equal-split n; zero-rev firm drops") {
    val df = Seq(
      ("X", "f1", 60.0), ("X", "f2", 40.0), ("X", "f3", 0.0),
      ("Y", "g1", 5.0),
      ("Z", "h1", 25.0), ("Z", "h2", 25.0), ("Z", "h3", 25.0), ("Z", "h4", 25.0))
      .toDF("mkt", "firm", "amt")
    val r = Finance.hhiConcentration(df, "mkt", "firm", col("amt"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(3), x.getString(4))).toMap
    assert(r("X") == ((2L, 5200.0, "high")))       // 0.6² + 0.4²
    assert(r("Y") == ((1L, 10000.0, "high")))
    assert(r("Z") == ((4L, 2500.0, "moderate")))   // boundary: <= 2500
  }

  test("dailyBars: (ts, tie) election — time dominates tie; exact VWAP") {
    // open is the EARLIEST trade even with a larger tie; close takes the
    // larger tie among the same-timestamp pair
    val df = Seq((1L, 9L, 10.0, 2L), (2L, 1L, 12.5, 1L), (2L, 5L, 9.0, 3L))
      .toDF("sec", "tie", "price", "qty")
      .select(lit("k").as("ticker"),
        expr("timestamp_micros(sec * 1000000)").as("ts"),
        col("tie"), col("price"), col("qty"))
    val r = Finance.dailyBars(df, "ticker", "ts", col("tie"), col("price"),
      col("qty")).collect().head
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)) == ((10.0, 12.5, 9.0, 9.0)))
    assert(r.getLong(6) == 6L)
    assert(r.getDouble(7) == math.round(5950.0 / 600.0 * 1e6) / 1e6)
  }

  test("lexicalDiversity: case folding, whitespace runs, hapax counting") {
    import graft.pipeline.{TextAnalysis => TA}
    val df = Seq((1L, "A a  b\tc"), (2L, "x x x"), (3L, "   "))
      .toDF("doc_id", "text")
    val r = TA.lexicalDiversity(df, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(r.length == 2) // doc 3 has no tokens and drops out
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) ==
      ((4L, 3L, 2L)))
    assert(r(0).getDouble(4) == 0.75 &&
      r(0).getDouble(5) == math.round(2.0 / 3.0 * 1e6) / 1e6)
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) ==
      ((3L, 1L, 0L)))
  }

  test("dailyRiskRatios: hand diffs off the zero-filled cent spine") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(d: Int) = new Timestamp(86400000L * d)
    // daily cents 100, 300, 200 -> diffs 200, -100: mean 50, sd 150,
    // downside sd sqrt(10000/2)
    val df = Seq((t(10), 1.0), (t(11), 3.0), (t(12), 2.0)).toDF("ts", "v")
    val r = Finance.dailyRiskRatios(df, "ts", col("v")).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 50.0 && r.getDouble(2) == 150.0)
    assert(r.getDouble(3) == 70.710678)
    assert(r.getDouble(4) == 0.333333 && r.getDouble(5) == 0.707107, s"rr: $r")
  }

  test("cutlersRsi: hand gains/losses over a 3-bar window; complete only") {
    // closes 1.00,1.02,1.01,1.05,1.04 -> diffs +2,-1,+4,-1; windows of 3
    // complete at day 3 (G=6,L=1 -> 600/7) and day 4 (G=4,L=2 -> 200/3)
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 1.02), (1L, 2L, 1.01),
      (1L, 3L, 1.05), (1L, 4L, 1.04)).toDF("key", "day", "close")
    val r = Finance.cutlersRsi(bars, "key", "day", col("close"), window = 3)
      .orderBy("day").collect()
    assert(r.length == 2)
    assert((r(0).getLong(1), r(0).getDouble(2)) ==
      ((3L, math.round(600.0 / 7.0 * 1e6) / 1e6)))
    assert((r(1).getLong(1), r(1).getDouble(2)) == ((4L, 66.666667)))
  }

  test("bollingerBreaches: strict band breaches; sigma-zero windows safe") {
    // closes 1.00,1.00,1.00,1.30,0.70 with window 3, k=1:
    // row3 sigma=0 (no breach), row4 upper=1.2414 < 1.30 (up),
    // row5 lower=0.7551 > 0.70 (down)
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 1.00), (1L, 2L, 1.00),
      (1L, 3L, 1.30), (1L, 4L, 0.70)).toDF("key", "day", "close")
    val r = Finance.bollingerBreaches(bars, "key", "day", col("close"),
      window = 3, k = 1.0).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 3L, 1L, 1L)))
  }

  test("historicalVar: ceil-rank tail element and exact tail mean") {
    // closes 1.00,0.90,0.95,0.87,0.86,1.16 -> diffs -10,+5,-8,-1,+30;
    // alpha=.25 -> idx=ceil(1.25)=2 -> tail {-10,-8}: var=-0.08, cvar=-0.09
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 0.90), (1L, 2L, 0.95),
      (1L, 3L, 0.87), (1L, 4L, 0.86), (1L, 5L, 1.16))
      .toDF("key", "day", "close")
    val r = Finance.historicalVar(bars, "key", "day", col("close"),
      alpha = 0.25).collect()(0)
    assert((r.getLong(1), r.getLong(2)) == ((5L, 2L)))
    assert(r.getDouble(3) == -0.08 && r.getDouble(4) == -0.09, s"var: $r")
  }

  test("kupiecPof: out-of-time split; exact-rate LR = 0 and x = 0 limit") {
    // key 1: train diffs {-10,5,-2,3} -> var -0.10; test {-16,17,1,1}
    // -> x=1 of 4 = alpha exactly -> LR = 0
    // key 2: same train; test all +1 -> x=0 -> LR = -8 ln(.75)
    val k1 = Seq(100, 90, 95, 93, 96, 80, 97, 98, 99)
    val k2 = Seq(100, 90, 95, 93, 96, 97, 98, 99, 100)
    val bars = (k1.zipWithIndex.map { case (c, d) =>
      (1L, d.toLong, c / 100.0) } ++
      k2.zipWithIndex.map { case (c, d) => (2L, d.toLong, c / 100.0) })
      .toDF("key", "day", "close")
    val r = Finance.kupiecPof(bars, "key", "day", col("close"),
      alpha = 0.25).orderBy("key").collect()
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(4)) ==
      ((4L, 4L, 1L)))
    assert(r(0).getDouble(3) == -0.1 && r(0).getDouble(5) == 0.0,
      s"k1: ${r(0)}")
    assert(r(1).getLong(4) == 0L && r(1).getDouble(5) == 2.301457,
      s"k2: ${r(1)}")
  }

  test("rollSpread: bouncing price implies a spread; hand autocovariance") {
    // closes 1,3,1,3,1: diffs +-200 cents -> cov = -320000/9 cents^2
    // = -3.56 $^2 (2dp; see the ulp note) -> spread = 2*sqrt(-cov)/100
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 3.00), (1L, 2L, 1.00),
      (1L, 3L, 3.00), (1L, 4L, 1.00)).toDF("key", "day", "close")
    val r = Finance.rollSpread(bars, "key", "day", col("close"))
      .collect()(0)
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == -3.56 && r.getDouble(3) == 3.771236,
      s"roll: $r")
    // trending price: positive autocov -> null spread, loudly
    val up = Seq((2L, 0L, 1.00), (2L, 1L, 1.02), (2L, 2L, 1.04),
      (2L, 3L, 1.06)).toDF("key", "day", "close")
    assert(Finance.rollSpread(up, "key", "day", col("close"))
      .collect()(0).isNullAt(3))
  }

  test("minVariancePair: zero-variance leg takes all the weight") {
    // A diffs (2,2,2) var 0; B diffs (1,3,1) var 4/3; cov 0
    // -> w_a = 1, var_min = 0
    val bars = Seq(("A", 0L, 1.00), ("A", 1L, 1.02), ("A", 2L, 1.04),
      ("A", 3L, 1.06), ("B", 0L, 1.00), ("B", 1L, 1.01),
      ("B", 2L, 1.04), ("B", 3L, 1.05)).toDF("key", "day", "close")
    val r = Finance.minVariancePair(bars, "key", "day", col("close"),
      "A", "B").collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.0, s"mv: $r")
  }

  test("ulcerIndex: RMS drawdown below the running peak") {
    // closes 1.00,1.10,0.99,1.10: peaks 100,110,110,110 -> dd 0,0,10,0
    // -> max 10, ulcer = sqrt(100/4) = 5
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 1.10), (1L, 2L, 0.99),
      (1L, 3L, 1.10)).toDF("key", "day", "close")
    val r = Finance.ulcerIndex(bars, "key", "day", col("close"))
      .collect()(0)
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 5.0, s"ui: $r")
  }

  test("ohlcVolatility: hand Parkinson/GK/RS on two bars") {
    // cents (o,h,l,c) = (100,200,100,200), (200,400,100,100):
    // park = .658192, gk = .644182, rs = .693147 (python replay of the
    // identical IEEE shapes)
    val bars = Seq((1L, 0L, 1.00, 2.00, 1.00, 2.00),
      (1L, 1L, 2.00, 4.00, 1.00, 1.00))
      .toDF("key", "day", "open", "high", "low", "close")
    val r = Finance.ohlcVolatility(bars, "key", "day", col("open"),
      col("high"), col("low"), col("close")).collect()(0)
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.658192, s"park: $r")
    assert(r.getDouble(3) == 0.644182, s"gk: $r")
    assert(r.getDouble(4) == 0.693147, s"rs: $r")
  }

  test("corwinSchultz: hand spread on one adjacent pair") {
    // pair (h0,l0)=(200,100), (h1,l1)=(400,100): S = .389979
    val bars = Seq((1L, 0L, 2.00, 1.00), (1L, 1L, 4.00, 1.00))
      .toDF("key", "day", "high", "low")
    val r = Finance.corwinSchultz(bars, "key", "day", col("high"),
      col("low")).collect()(0)
    assert(r.getLong(1) == 1L && r.getDouble(2) == 0.389979, s"cs: $r")
  }

  test("amihudIlliquidity: hand |r|/DV; zero dollar volume raises") {
    // day2: r = .1, DV = 1.05*20 = 21 -> 1e6*.1/21 = 4761.904762
    val bars = Seq((1L, 0L, 1.00, 10L, 1.0), (1L, 1L, 1.10, 20L, 1.05))
      .toDF("key", "day", "close", "volume", "vwap")
    val r = Finance.amihudIlliquidity(bars, "key", "day", col("close"),
      col("volume"), col("vwap")).collect()(0)
    assert(r.getLong(1) == 1L && r.getDouble(2) == 4761.904762, s"am: $r")
    val bad = Seq((1L, 0L, 1.00, 10L, 1.0), (1L, 1L, 1.10, 0L, 1.05))
      .toDF("key", "day", "close", "volume", "vwap")
    intercept[Exception] {
      Finance.amihudIlliquidity(bad, "key", "day", col("close"),
        col("volume"), col("vwap")).collect()
    }
  }

  test("omegaRatio: exact integer gain/loss rational") {
    // closes 1.00,2.00,1.50,2.50: diffs +100,-50,+100 -> omega 4
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 2.00), (1L, 2L, 1.50),
      (1L, 3L, 2.50)).toDF("key", "day", "close")
    val r = Finance.omegaRatio(bars, "key", "day", col("close"))
      .collect()(0)
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 200L && r.getLong(3) == 50L)
    assert(r.getDouble(4) == 4.0, s"om: $r")
    // all-gain: omega null loudly
    val up = Seq((1L, 0L, 1.00), (1L, 1L, 2.00)).toDF("key", "day", "close")
    val r2 = Finance.omegaRatio(up, "key", "day", col("close"))
      .collect()(0)
    assert(r2.isNullAt(4), s"om-up: $r2")
  }

  test("dickeyFuller: hand OLS t on an oscillating series") {
    // closes 1.00,2.00,1.50,2.50: rho = -1.5, t = -1.732051
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 2.00), (1L, 2L, 1.50),
      (1L, 3L, 2.50)).toDF("key", "day", "close")
    val r = Finance.dickeyFuller(bars, "key", "day", col("close"))
      .collect()(0)
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == -1.5 && r.getDouble(3) == -1.732051, s"df: $r")
  }

  test("kpssLevel: exact integer rational eta; constant series null") {
    // closes 1.00,2.00,1.50,2.50: D1 = 220000, D2 = 800000 -> .275
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 2.00), (1L, 2L, 1.50),
      (1L, 3L, 2.50)).toDF("key", "day", "close")
    val r = Finance.kpssLevel(bars, "key", "day", col("close"))
      .collect()(0)
    assert(r.getLong(1) == 4L && r.getDouble(2) == 0.275, s"kpss: $r")
    val flat = Seq((1L, 0L, 1.00), (1L, 1L, 1.00)).toDF("key", "day", "close")
    val r2 = Finance.kpssLevel(flat, "key", "day", col("close"))
      .collect()(0)
    assert(r2.isNullAt(2), s"kpss-flat: $r2")
  }

  test("ar1HalfLife: hand phi and half-life; negative phi nulls") {
    // closes 1.00,1.50,1.75,1.87: phi = .494286, hl = .983688
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 1.50), (1L, 2L, 1.75),
      (1L, 3L, 1.87)).toDF("key", "day", "close")
    val r = Finance.ar1HalfLife(bars, "key", "day", col("close"))
      .collect()(0)
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.494286 && r.getDouble(3) == 0.983688,
      s"ar1: $r")
    // oscillating: phi < 0 -> half-life null
    val osc = Seq((1L, 0L, 1.00), (1L, 1L, 2.00), (1L, 2L, 1.50),
      (1L, 3L, 2.50)).toDF("key", "day", "close")
    val r2 = Finance.ar1HalfLife(osc, "key", "day", col("close"))
      .collect()(0)
    assert(r2.getDouble(2) == -0.5 && r2.isNullAt(3), s"ar1-osc: $r2")
  }

  test("kyleLambda: tick-rule signed-flow OLS slope") {
    // diffs +10,-5,+20 on vols 20,30,40 -> sv 20,-30,40 -> .346154
    val bars = Seq((1L, 0L, 1.00, 10L), (1L, 1L, 1.10, 20L),
      (1L, 2L, 1.05, 30L), (1L, 3L, 1.25, 40L))
      .toDF("key", "day", "close", "volume")
    val r = Finance.kyleLambda(bars, "key", "day", col("close"),
      col("volume")).collect()(0)
    assert(r.getLong(1) == 3L && r.getDouble(2) == 0.346154, s"kl: $r")
  }

  test("capmBeta: two-ticker market, exact integer moments") {
    // market diffs [0, 35]; A dc [10,-5] -> beta -.428571, alpha 10,
    // r2 1 (2 points); B mirrors
    val bars = Seq(("A", 0L, 1.00), ("A", 1L, 1.10), ("A", 2L, 1.05),
      ("B", 0L, 2.00), ("B", 1L, 1.90), ("B", 2L, 2.30))
      .toDF("key", "day", "close")
    val r = Finance.capmBeta(bars, "key", "day", col("close"))
      .orderBy("key").collect()
    assert(r(0).getLong(1) == 2L)
    assert(r(0).getDouble(2) == -0.428571 && r(0).getDouble(3) == 10.0 &&
      r(0).getDouble(4) == 1.0, s"A: ${r(0)}")
    assert(r(1).getDouble(2) == 1.428571 && r(1).getDouble(3) == -10.0,
      s"B: ${r(1)}")
  }

  test("drawdownDuration: longest underwater island in trading days") {
    // closes 1.00,.90,.95,1.10,1.05,1.00,1.20: under at bars 2,3,5,6
    // -> n_under 4, max_run 2
    val bars = Seq((1L, 0L, 1.00), (1L, 1L, 0.90), (1L, 2L, 0.95),
      (1L, 3L, 1.10), (1L, 4L, 1.05), (1L, 5L, 1.00), (1L, 6L, 1.20))
      .toDF("key", "day", "close")
    val r = Finance.drawdownDuration(bars, "key", "day", col("close"))
      .collect()(0)
    assert(r.getLong(1) == 7L && r.getLong(2) == 4L &&
      r.getLong(3) == 2L, s"ddur: $r")
    // monotone up: no underwater bars at all
    val up = Seq((1L, 0L, 1.00), (1L, 1L, 2.00)).toDF("key", "day", "close")
    val r2 = Finance.drawdownDuration(up, "key", "day", col("close"))
      .collect()(0)
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L, s"up: $r2")
  }

  test("momentumBacktest: 4-ticker k=1 lookback=1 hand spread") {
    val rows = Seq(
      ("A", Seq(1.00, 1.10, 1.20, 1.30)), ("B", Seq(1.00, 1.00, 1.00, 1.00)),
      ("C", Seq(1.00, 0.95, 0.90, 0.85)), ("D", Seq(1.00, 1.02, 1.04, 1.10))
    ).flatMap { case (k, cs) =>
      cs.zipWithIndex.map { case (c, d) => (k, d.toLong, c) } }
    val bars = rows.toDF("key", "day", "close")
    val r = Finance.momentumBacktest(bars, "key", "day", col("close"),
      lookback = 1, k = 1).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 0.141215 && r.getDouble(2) == 60.714284,
      s"mom: $r")
  }

  test("grangerPair: hand 2-regressor F on a 5-day pair spine") {
    // a=[100..180], b=[110..170] cents: F = 6.744382, dr2 = .709935
    val bars = Seq(("A", 0L, 1.00), ("A", 1L, 2.00), ("A", 2L, 1.50),
      ("A", 3L, 2.50), ("A", 4L, 1.80),
      ("B", 0L, 1.10), ("B", 1L, 1.90), ("B", 2L, 1.60),
      ("B", 3L, 2.40), ("B", 4L, 1.70)).toDF("key", "day", "close")
    val r = Finance.grangerPair(bars, "key", "day", col("close"), "A", "B")
      .collect()(0)
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 6.744382 && r.getDouble(2) == 0.709935,
      s"gr: $r")
  }
}
