package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Commerce/finance report kernels: drawdown, ABC classification, and
  * receivables aging. All money arithmetic is integer (cents or
  * micro-cents) until the one final division per output column — the q281
  * lesson: a 6dp double intermediate diverges between engines, an integer
  * one cannot.
  *
  * Scale notes: every kernel first collapses the raw relation to a
  * dimension-sized rollup (days, keys, buckets) with one keyed aggregate;
  * the single-partition windows below run ONLY on those rollups (a daily
  * series is |calendar| rows, an ABC ranking |SKUs| rows), never on the
  * raw fact table.
  */
object Finance {

  /** Peak-to-trough drawdown of a daily revenue series: the day whose
    * revenue sits furthest below the historical running peak. Daily cents
    * are exact BIGINT sums; the running max and the argmax election are
    * integer; the one IEEE division (drawdown/peak) reports 6dp. Ties on
    * the drawdown take the EARLIEST day. Returns one row
    * (n_days, trough_day, peak, trough, drawdown, drawdown_pct). */
  def drawdownReport(df: DataFrame, tsCol: String, amountCol: Column): DataFrame = {
    val daily = df
      .select(EventAnalytics.dayIndex(col(tsCol)).as("day"),
        round(amountCol * 100, 0).cast("long").as("__cents"))
      .groupBy("day")
      .agg(sum(col("__cents")).as("rc"))
    // the window runs on the daily rollup (|calendar| rows), not the facts
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("__peak", max(col("rc")).over(w))
      .withColumn("__dd", col("__peak") - col("rc"))
      .agg(count(lit(1)).as("n_days"),
        max_by(struct(col("day"), col("__peak"), col("rc"), col("__dd")),
          // deepest drawdown wins; among equals the EARLIEST day
          struct(col("__dd"), (-col("day")).as("d"))).as("__best"))
      .select(col("n_days"), col("__best.day").as("trough_day"),
        round(col("__best.__peak") / 100.0, 2).as("peak"),
        round(col("__best.rc") / 100.0, 2).as("trough"),
        round(col("__best.__dd") / 100.0, 2).as("drawdown"),
        round(col("__best.__dd").cast("double") /
          col("__best.__peak").cast("double"), 6).as("drawdown_pct"))
  }

  /** ABC (Pareto) classification: keys ranked by revenue share; A = keys
    * inside the first `aPct`% of cumulative revenue, B inside `bPct`%,
    * C the tail. The class boundary test is EXACT — `cum·100 ≤ total·pct`
    * in DECIMAL(38,0), never a double share compare — so a key straddling
    * 80.000…% lands identically in both engines. Rank order is
    * (revenue DESC, key ASC). `revenueMicro` must be an integral
    * micro-cent expression (exact under summation).
    *
    * Scale: cumulative-revenue-at-rank comes from
    * [[graft.pipeline.Stats.distributedRank]]'s cell-partitioned windows
    * — the key-grain rollup grows with the business, so it NEVER sorts in
    * one unpartitioned window; a uniform-revenue catalog (one giant tie
    * cell) subdivides on the numeric key grid. Per-key totals sum
    * DECIMAL-exact, then cast to BIGINT micro-units for the running sum —
    * ANSI-loud on overflow (bound: total revenue ≤ ~$9.2e12; re-grain to
    * cents beyond). Returns one row per class:
    * (abc_class, n_keys, revenue, share). */
  def abcClassification(df: DataFrame, keyCol: String, revenueMicro: Column,
                        aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(0 < aPct && aPct < bPct && bPct <= 100, "need 0 < aPct < bPct <= 100")
    val dt = DecimalType(38, 0)
    // column order (__rev, __k) matches distributedRank's slim projection,
    // so its checkpointed scan is reused for the final pass
    val perKey = df.groupBy(col(keyCol).as("__k"))
      .agg(sum(revenueMicro.cast(dt)).as("__revD"))
      .select(col("__revD").cast("long").as("__rev"), col("__k"))
    val ranked = Stats.distributedRank(perKey, Seq.empty, "__rev",
      desc = true, tieCols = Seq("__k"), weightCol = Some("__rev"),
      rnOut = "__rn", cumOut = Some("__cum"))
    val tot = perKey.agg(sum(col("__rev")).as("__tot"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when(col("__cum").cast(dt) * 100 <= col("__tot").cast(dt) * aPct, "A")
          .when(col("__cum").cast(dt) * 100 <= col("__tot").cast(dt) * bPct, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_keys"),
        round(sum(col("__rev")).cast("double") / 1000000.0, 6).as("revenue"),
        round(sum(col("__rev")).cast("double") /
          first(col("__tot")).cast("double"), 6).as("share"))
  }

  /** Receivables aging: open items bucketed by age against the ledger's
    * own as-of day (the max day across ALL rows, open or closed — a
    * deterministic anchor that needs no wall clock). `bounds` are
    * inclusive upper edges in days; e.g. Seq(30, 60, 90) yields
    * 0-30 / 31-60 / 61-90 / 90+. Amounts are exact BIGINT cents until the
    * final /100. Returns (bucket, n_open, amount, oldest_day), one row per
    * nonempty bucket. */
  def agingBuckets(df: DataFrame, dateCol: String, amountCol: Column,
                   openCol: Column, bounds: Seq[Int] = Seq(30, 60, 90)): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.distinct == bounds,
      "bounds must be ascending and distinct")
    val base = df.select(EventAnalytics.dayIndex(col(dateCol)).as("__day"),
      round(amountCol * 100, 0).cast("long").as("__cents"),
      openCol.as("__open"))
    val asOf = base.agg(max(col("__day")).as("__asof"))
    val withAge = base.filter(col("__open"))
      .crossJoin(broadcast(asOf))
      .withColumn("__age", col("__asof") - col("__day"))
    val labeled = bounds.zip(0 +: bounds.init.map(_ + 1))
      .foldLeft(lit(null).cast("string")) { case (acc, (hi, lo)) =>
        when(col("__age") <= hi, coalesce(acc, lit(s"$lo-$hi"))).otherwise(acc)
      }
    withAge
      .withColumn("bucket", coalesce(labeled, lit(s"${bounds.last}+")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_open"),
        round(sum(col("__cents")) / 100.0, 2).as("amount"),
        min(col("__day")).as("oldest_day"))
  }

  // ----------------------------------------------- revenue recognition
  /** Calendarized revenue recognition: each row's amount spreads pro-rata
    * over its [startDay, endDay] inclusive day interval, rolled up into
    * `periodDays`-day periods. Per (row, period) the recognized share is
    * round(cents · overlap_days / span_days, 6) — integer cents × integer
    * day counts, one division, rounded per term then DECIMAL-summed (the
    * q289 discipline). The period explode is bounded by each row's span.
    * Rows with span ≤ 0 are dropped. Returns per period:
    * (period, n_rows, revenue). */
  def revenueRecognition(df: DataFrame, startDay: Column, endDay: Column,
                         amountCol: Column, periodDays: Int = 30): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(periodDays >= 1, s"periodDays must be >= 1: $periodDays")
    val p = periodDays.toLong
    val base = df.select(startDay.as("__s"), endDay.as("__e"),
        round(amountCol * 100, 0).cast("long").as("__c"))
      .filter(col("__e") >= col("__s"))
      .withColumn("__span", col("__e") - col("__s") + 1)
    base
      .select(col("__s"), col("__e"), col("__c"), col("__span"),
        explode(sequence(expr(s"__s div $p"), expr(s"__e div $p")))
          .as("period"))
      .withColumn("__days",
        least(col("__e"), (col("period") + 1) * p - 1) -
          greatest(col("__s"), col("period") * p) + 1)
      // micro-cent INTEGER share per term: (cents·10⁴·days) div span —
      // truncated once per term, exact under any summation order and in
      // any engine (the q281 FIFO lesson: a 6dp double term puts round()'s
      // engine differences on the hash gate; an integer term cannot)
      .select(col("period"),
        expr("(__c * 10000 * __days) div __span")
          .cast(DecimalType(38, 0)).as("__micro"))
      .groupBy("period")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("__micro")).cast("double") / 1000000.0, 6)
          .as("revenue"))
  }

  // ------------------------------------------------ price-volume bridge
  /** Rate/volume revenue bridge between two periods (the FP&A waterfall):
    * for items sold in both periods, ΔRev splits into
    * rate = rev₁ − rev₀·q₁/q₀ and volume = (q₁−q₀)·rev₀/q₀; items only in
    * one period land in new/discontinued buckets. All effects are INTEGER
    * micro-cents — the rational terms use a single truncated div each
    * (the q281 rule) and the truncation dust is surfaced as an explicit
    * `residual` column, so delta ≡ rate + volume + new − discontinued +
    * residual EXACTLY. One (key, period) rollup; everything after is
    * key-cardinality. `periodCol`: false = base, true = current. Returns
    * one row: (n_both, n_new, n_discontinued, delta, rate_effect,
    * volume_effect, new_effect, discontinued_effect, residual). */
  def priceVolumeBridge(df: DataFrame, keyCol: String, periodCol: Column,
                        qtyCol: Column, amountCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val per = df.groupBy(col(keyCol).as("__k"), periodCol.as("__p"))
      .agg(sum(qtyCol.cast("long")).as("__q"),
        sum(round(amountCol * 100, 0).cast("long")).as("__r"))
    val base = per.filter(!col("__p") && col("__q") > 0)
      .select(col("__k"), col("__q").as("__q0"), col("__r").as("__r0"))
    val cur = per.filter(col("__p") && col("__q") > 0)
      .select(col("__k"), col("__q").as("__q1"), col("__r").as("__r1"))
    val joined = base.join(cur, Seq("__k"), "full")
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val both = col("__q0").isNotNull && col("__q1").isNotNull
    val stats = joined.agg(
      sum(when(both, 1L).otherwise(0L)).as("n_both"),
      sum(when(col("__q0").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("__q1").isNull, 1L).otherwise(0L)).as("n_discontinued"),
      sum(dec(coalesce(col("__r1"), lit(0L)) - coalesce(col("__r0"), lit(0L)))
        * 10000).as("__delta"),
      sum(when(both,
        dec(col("__r1") * 10000L -
          expr("(__r0 * 10000 * __q1) div __q0")))).as("__rate"),
      // sign-explicit: Spark `div` truncates toward zero while DuckDB //
      // floors — a negative dividend would diverge, so divide |Δq| only
      sum(when(both,
        dec(expr("CASE WHEN __q1 >= __q0 THEN " +
          "((__q1 - __q0) * __r0 * 10000) div __q0 ELSE " +
          "-(((__q0 - __q1) * __r0 * 10000) div __q0) END")))).as("__vol"),
      sum(when(col("__q0").isNull, dec(col("__r1") * 10000L))).as("__new"),
      sum(when(col("__q1").isNull, dec(col("__r0") * 10000L))).as("__disc"))
    def money(c: Column) =
      round(coalesce(c, lit(0L)).cast("double") / 1000000.0, 6)
    stats.select(col("n_both"), col("n_new"), col("n_discontinued"),
      money(col("__delta")).as("delta"),
      money(col("__rate")).as("rate_effect"),
      money(col("__vol")).as("volume_effect"),
      money(col("__new")).as("new_effect"),
      money(col("__disc")).as("discontinued_effect"),
      money(coalesce(col("__delta"), lit(0L)) -
        coalesce(col("__rate"), lit(0L)) - coalesce(col("__vol"), lit(0L)) -
        coalesce(col("__new"), lit(0L)) +
        coalesce(col("__disc"), lit(0L))).as("residual"))
  }

  // ------------------------------------------------- Laspeyres price index
  /** Laspeyres price index between two periods: Σᵢ p_C,i·q_B,i / Σᵢ
    * p_B,i·q_B,i over items sold in BOTH periods, with p = unit revenue
    * (period revenue / period quantity). The denominator is EXACTLY the
    * base-period revenue (integer cents); each numerator term is the one
    * unavoidable rational p_C·q_B, rounded to 6dp per item and summed in
    * DECIMAL (order-independent — the q289 rounded-term discipline).
    * `periodCol` must be a boolean column: false = base, true = current.
    * Returns one row: (n_items, base_rev, index). */
  def priceIndex(df: DataFrame, keyCol: String, periodCol: Column,
                 qtyCol: Column, amountCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val per = df.groupBy(col(keyCol).as("__k"), periodCol.as("__p"))
      .agg(sum(qtyCol.cast("long")).as("__q"),
        sum(round(amountCol * 100, 0).cast("long")).as("__r"))
    val base = per.filter(!col("__p") && col("__q") > 0)
      .select(col("__k"), col("__q").as("__qb"), col("__r").as("__rb"))
    val cur = per.filter(col("__p") && col("__q") > 0)
      .select(col("__k"), col("__q").as("__qc"), col("__r").as("__rc"))
    base.join(cur, Seq("__k"))
      .select(col("__k"), col("__rb"),
        round(col("__rc").cast("double") / col("__qc").cast("double") *
          col("__qb").cast("double"), 6).cast(DecimalType(28, 6))
          .as("__term"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("__rb")) / 100.0, 2).as("base_rev"),
        round(sum(col("__term")).cast("double") /
          sum(col("__rb")).cast("double"), 6).as("price_index"))
  }
  // ------------------------------------------------- market concentration
  /** Herfindahl–Hirschman market-concentration index per market: with firm
    * revenue shares s_i = r_i / R, HHI = 10000 · Σ s_i² — the antitrust
    * scale where 10000 is a monopoly, plus the DOJ/FTC 2023 bands
    * (<1500 unconcentrated, 1500–2500 moderate, >2500 high).
    *
    * DETERMINISM: revenues aggregate to integer cents; HHI is the single
    * rational 10000·Σ r_i² / R² — numerator and denominator exact
    * DECIMAL(38,0) integers (r_i² passes 2^63 at whale-firm scale), ONE
    * IEEE division, 6dp. One (market, firm) rollup, then firm-cardinality
    * aggregation. Returns (market, n_firms, total_rev, hhi, band). */
  def hhiConcentration(df: DataFrame, marketCol: String, firmCol: String,
                       amountCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val firm = df.groupBy(col(marketCol).as("market"), col(firmCol).as("__f"))
      .agg(sum(round(amountCol * 100, 0).cast("long")).as("__r"))
      .filter(col("__r") > 0)
    firm.groupBy(col("market"))
      .agg(count(lit(1)).as("n_firms"),
        sum(col("__r")).as("__tot"),
        sum((col("__r").cast(DecimalType(38, 0)) * col("__r"))).as("__sq"))
      .select(col("market"), col("n_firms"),
        round(col("__tot") / 100.0, 2).as("total_rev"),
        round(lit(10000.0) * col("__sq").cast("double") /
          (col("__tot").cast("double") * col("__tot").cast("double")), 6)
          .as("hhi"))
      .withColumn("band",
        when(col("hhi") < 1500, "unconcentrated")
          .when(col("hhi") <= 2500, "moderate")
          .otherwise("high"))
  }
  // ------------------------------------------------------- daily bars
  /** OHLC + VWAP daily bars per key — the market-data rollup (and the
    * general "first/last/extreme/weighted-mean per bucket" pattern):
    * open/close elect by (event time, tie) min_by/max_by — the tie column
    * must be unique within a bucket so same-timestamp trades can't leak
    * shuffle order — high/low/volume are plain extremes, and VWAP is the
    * exact rational Σ(cents·qty)/Σqty carried to micro-dollars by an
    * INTEGER half-up division — never a float round.
    * One (key, day) rollup, no windows. Returns
    * (key, day, open, high, low, close, volume, vwap) with prices in
    * 2dp dollars, vwap 6dp. */
  def dailyBars(df: DataFrame, keyCol: String, tsCol: String, tieCol: Column,
                priceCol: Column, qtyCol: Column): DataFrame = {
    val base = df.select(col(keyCol).as("key"),
      EventAnalytics.dayIndex(col(tsCol)).as("day"),
      unix_micros(col(tsCol)).as("__us"), tieCol.as("__tie"),
      round(priceCol * 100, 0).cast("long").as("__c"),
      qtyCol.cast("long").as("__q"))
    // Fan out a starved single-split scan before the rollup (guide §2.5
    // "one huge unsplittable file"): the (key, day) partial aggregate is
    // the heavy map work of every bars consumer, and on a single-file
    // trade table it serializes on one core (measured ~1.7 s of the
    // finance tier's per-query cost at sf0.1). KEYED on the rollup's own
    // grouping columns: the exchange replaces the groupBy's own shuffle
    // (EnsureRequirements sees the partitioning satisfied) and, unlike a
    // round-robin fanout, pays no sort-before-repartition (SPARK-23207 —
    // the round-robin variant measured a 0.7 s LOSS on this tier). A
    // real multi-split table passes through untouched.
    graft.operators.Ops.fanoutScanBy(base, col("key"), col("day"))
      .groupBy("key", "day")
      .agg(min_by(col("__c"), struct(col("__us"), col("__tie"))).as("__o"),
        max(col("__c")).as("__h"), min(col("__c")).as("__l"),
        max_by(col("__c"), struct(col("__us"), col("__tie"))).as("__cl"),
        sum(col("__q")).as("volume"),
        sum((col("__c") * col("__q")).cast(DecimalType(38, 0)))
          .as("__notional"))
      .select(col("key"), col("day"),
        round(col("__o") / 100.0, 2).as("open"),
        round(col("__h") / 100.0, 2).as("high"),
        round(col("__l") / 100.0, 2).as("low"),
        round(col("__cl") / 100.0, 2).as("close"),
        col("volume"),
        // micro-dollar INTEGER half-up division (the q281 lesson: the
        // VWAP rational lands on exact .5·10⁻⁶ boundaries — e.g. any
        // volume divisible by 32 — where the engines' float round()
        // implementations split); (2a + b) div (2b) is exact everywhere
        (expr("(2 * __notional * 10000 + volume) div (2 * volume)")
          .cast("double") / 1000000.0).as("vwap"))
  }

  // ---------------------------------------------- daily risk ratios
  /** Sharpe- and Sortino-style risk ratios of the DAILY integer-cent flow
    * series: day-over-day differences d_t of the zero-filled daily cent
    * totals, mean/σ (population) and downside σ (√(Σ min(d,0)²/n)),
    * sharpe = mean/σ, sortino = mean/σ_down — at DAY grain, unannualized
    * (annualization is a caller multiply by √252-style constants, not a
    * data question).
    *
    * DETERMINISM: cents are exact longs ([[dailyBars]] quantization), the
    * day spine zero-fills (the [[EventAnalytics.resampleDaily]] shape),
    * diffs are integer windows over the calendar-bounded spine, and all
    * moments are DECIMAL(38,0) sums of integer squares — fixed IEEE
    * finish, 6dp. No diffs or zero variance → null ratios. Returns one
    * row: (n_days, mean_diff, sd_diff, downside_sd, sharpe, sortino). */
  def dailyRiskRatios(df: DataFrame, tsCol: String,
                      amountCol: Column): DataFrame = {
    val daily = df.select(EventAnalytics.dayIndex(col(tsCol)).as("day"),
        round(amountCol * 100, 0).cast("long").as("__c"))
      .groupBy("day").agg(sum(col("__c")).as("__s"))
    val spine = daily.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val filled = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("__s"), lit(0L)).as("__s"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val dt = DecimalType(38, 0)
    val m = filled
      .select((col("__s") - lag(col("__s"), 1).over(w)).as("__d"))
      .filter(col("__d").isNotNull)
      .agg(count(lit(1)).as("n_days"),
        sum(col("__d").cast(dt)).as("__sd"),
        sum(col("__d").cast(dt) * col("__d")).as("__sdd"),
        sum(when(col("__d") < 0L, col("__d").cast(dt) * col("__d"))
          .otherwise(lit(0).cast(dt))).as("__sdn"))
    val nD = col("n_days").cast("double")
    val mean = col("__sd").cast("double") / nD
    val sd = sqrt((nD * col("__sdd").cast("double") -
      col("__sd").cast("double") * col("__sd").cast("double")) / (nD * nD))
    val dsd = sqrt(col("__sdn").cast("double") / nD)
    m.select(col("n_days"),
      round(mean, 6).as("mean_diff"), round(sd, 6).as("sd_diff"),
      round(dsd, 6).as("downside_sd"),
      round(when(sd > 0.0, mean / sd), 6).as("sharpe"),
      round(when(dsd > 0.0, mean / dsd), 6).as("sortino"))
  }

  /** The (key, day, close-cents) projection every indicator below starts
    * from: `closeCol` is a 2dp price (e.g. [[dailyBars]]'s `close`), so
    * ·100 + half-up round recovers the exact integer cents on any engine. */
  private def closeCents(df: DataFrame, keyCol: String, dayCol: String,
                         closeCol: Column): DataFrame =
    df.select(col(keyCol).as("key"), col(dayCol).cast("long").as("day"),
      round(closeCol * 100, 0).cast("long").as("__c"))

  // --------------------------------------------------------- Cutler's RSI
  /** Relative Strength Index, Cutler's simple-moving-average variant
    * (Cutler 1987 — the arithmetic form; Wilder's 1978 original smooths
    * recursively, which no fixed-shape window can reproduce):
    * RSI_t = 100·ΣG/(ΣG+ΣL) over the trailing `window` close-to-close
    * diffs at TRADING-day grain (gap days collapse — bars carry the
    * series, not the calendar). Only complete windows emit.
    *
    * DETERMINISM AND SCALE: diffs, gains, and losses are exact integer
    * cents in windows PARTITIONED BY KEY (a ticker's history is
    * calendar-bounded — the [[dailyBars]] grain); RSI is one exact
    * rational → one IEEE division, 6dp. An all-flat window (ΣG+ΣL = 0)
    * reports null. Returns (key, day, rsi). */
  def cutlersRsi(df: DataFrame, keyCol: String, dayCol: String,
                 closeCol: Column, window: Int = 14): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    val wLag = Window.partitionBy(col("key")).orderBy(col("day"))
    val wRoll = wLag.rowsBetween(-(window - 1), 0)
    val diffs = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__d", col("__c") - lag(col("__c"), 1).over(wLag))
      .filter(col("__d").isNotNull)
    val rolled = diffs
      .withColumn("__g",
        sum(when(col("__d") > 0L, col("__d")).otherwise(0L)).over(wRoll))
      .withColumn("__l",
        sum(when(col("__d") < 0L, -col("__d")).otherwise(0L)).over(wRoll))
      .withColumn("__k", count(lit(1)).over(wRoll))
      .filter(col("__k") === window)
    rolled.select(col("key"), col("day"),
      round(when(col("__g") + col("__l") > 0L,
        lit(100.0) * col("__g").cast("double") /
          (col("__g") + col("__l")).cast("double")), 6).as("rsi"))
  }

  // ----------------------------------------------------- Bollinger bands
  /** Bollinger-band breach summary per key: a 20-bar rolling mean ± k·σ
    * envelope on the close, then per-key counts of closes strictly above
    * the upper and below the lower band (Bollinger 1980s; population σ,
    * the convention). Only complete windows gate.
    *
    * DETERMINISM AND SCALE: rolling Σc and Σc² are exact integer/decimal
    * cents in key-partitioned windows; σ² comes from the moment closed
    * form; the breach compares close against the UNROUNDED band — the
    * same fixed IEEE shape on identical integer inputs on every engine,
    * so the flag (and the counts) carry no rounding step at all.
    * Returns per key: (key, n_bars, n_windows, n_breach_up,
    * n_breach_down). */
  def bollingerBreaches(df: DataFrame, keyCol: String, dayCol: String,
                        closeCol: Column, window: Int = 20,
                        k: Double = 2.0): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    val dt = DecimalType(38, 0)
    val wRoll = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(-(window - 1), 0)
    val rolled = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__s", sum(col("__c")).over(wRoll))
      .withColumn("__ss", sum(col("__c").cast(dt) * col("__c")).over(wRoll))
      .withColumn("__k", count(lit(1)).over(wRoll))
    val wD = lit(window.toDouble)
    val mean = col("__s").cast("double") / wD
    val sigma = sqrt((wD * col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double")) / (wD * wD))
    val cD = col("__c").cast("double")
    val complete = col("__k") === window
    rolled.groupBy("key")
      .agg(count(lit(1)).as("n_bars"),
        sum(when(complete, 1L).otherwise(0L)).as("n_windows"),
        sum(when(complete && cD > mean + lit(k) * sigma, 1L).otherwise(0L))
          .as("n_breach_up"),
        sum(when(complete && cD < mean - lit(k) * sigma, 1L).otherwise(0L))
          .as("n_breach_down"))
  }

  // ------------------------------------------------ historical VaR/CVaR
  /** Historical value-at-risk and conditional VaR of the per-key daily
    * close-to-close cent moves: VaR_α is the ⌈α·n⌉-th SMALLEST diff (an
    * order-statistic DATA ELEMENT — the repo's quantile discipline, never
    * interpolated) and CVaR averages exactly those ⌈α·n⌉ tail diffs
    * (rank-based, so cent ties split deterministically by day).
    *
    * DETERMINISM AND SCALE: diffs are integer cents; the rank window
    * partitions by key (ticker histories are calendar-bounded); the tail
    * mean is an exact decimal sum over ⌈α·n⌉ integers with ONE division.
    * Returns per key: (key, n_diffs, n_tail, var_amt, cvar_amt) in
    * currency units (cents/100), 6dp. */
  def historicalVar(df: DataFrame, keyCol: String, dayCol: String,
                    closeCol: Column, alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0, 0.5): $alpha")
    val dt = DecimalType(38, 0)
    val wLag = Window.partitionBy(col("key")).orderBy(col("day"))
    val wRank = Window.partitionBy(col("key"))
      .orderBy(col("__d").asc, col("day").asc)
    val wAll = Window.partitionBy(col("key"))
    val diffs = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__d", col("__c") - lag(col("__c"), 1).over(wLag))
      .filter(col("__d").isNotNull)
    val ranked = diffs
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__idx", ceil(col("__n").cast("double") * alpha)
        .cast("long"))
    ranked.filter(col("__rn") <= col("__idx"))
      .groupBy("key")
      .agg(first(col("__n")).as("n_diffs"), count(lit(1)).as("n_tail"),
        max(col("__d")).as("__var"),
        sum(col("__d").cast(dt)).as("__tailsum"))
      .select(col("key"), col("n_diffs"), col("n_tail"),
        round(col("__var").cast("double") / 100.0, 6).as("var_amt"),
        round(col("__tailsum").cast("double") /
          (col("n_tail").cast("double") * 100.0), 6).as("cvar_amt"))
  }

  // ---------------------------------------------- Kupiec POF backtest
  /** Kupiec proportion-of-failures VaR backtest (Kupiec 1995), split
    * out-of-time per key: the α-quantile move VaR estimates on each
    * key's FIRST calendar half (days ≤ the lower-median day), violations
    * count on the second half, and
    * LR = −2[(n−x)ln(1−α) + x·ln α − (n−x)ln(1−x/n) − x·ln(x/n)]
    * ~ χ²(1) asks "is the violation rate consistent with α?" — the
    * honesty check behind [[historicalVar]]'s estimate.
    *
    * DETERMINISM AND SCALE: the split day is a lower-median DATA
    * ELEMENT per key ([[graft.pipeline.Stats.groupLowerMedian]]); the
    * VaR element is the ceil-rank order statistic over TRAIN diffs
    * (key-partitioned windows throughout); x counts exact integer-cent
    * comparisons; x = 0 and x = n take their 0·ln0 = 0 limits
    * explicitly. Returns per key: (key, n_train, n_test, var_amt, x,
    * lr) 6dp. */
  def kupiecPof(df: DataFrame, keyCol: String, dayCol: String,
                closeCol: Column, alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0,0.5): $alpha")
    val wLag = Window.partitionBy(col("key")).orderBy(col("day"))
    val diffs = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__d", col("__c") - lag(col("__c"), 1).over(wLag))
      .filter(col("__d").isNotNull)
    val medDay = graft.pipeline.Stats.groupLowerMedian(
      diffs.select(col("key"), col("day").cast("double").as("__dd")),
      Seq("key"), "__dd", "__med")
    val split = diffs.join(medDay, "key")
      .select(col("key"), col("day"), col("__d"),
        (col("day").cast("double") <= col("__med")).as("__train"))
    val wRank = Window.partitionBy(col("key"))
      .orderBy(col("__d").asc, col("day").asc)
    val train = split.filter(col("__train"))
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("key"))))
      .withColumn("__idx",
        ceil(col("__n").cast("double") * alpha).cast("long"))
    val varByKey = train.filter(col("__rn") === col("__idx"))
      .select(col("key"), col("__d").as("__var"),
        col("__n").as("n_train"))
    val test = split.filter(!col("__train"))
      .join(varByKey, "key")
      .groupBy("key")
      .agg(first(col("n_train")).as("n_train"),
        count(lit(1)).as("n_test"),
        first(col("__var")).as("__v"),
        sum(when(col("__d") < col("__var"), 1L).otherwise(0L)).as("x"))
    val nD = col("n_test").cast("double")
    val xD = col("x").cast("double")
    val lnNull = (nD - xD) * math.log(1.0 - alpha) + xD * math.log(alpha)
    val lnAlt = when(col("x") === 0L, lit(0.0))
      .when(col("x") === col("n_test"), lit(0.0))
      .otherwise((nD - xD) * log(lit(1.0) - xD / nD) +
        xD * log(xD / nD))
    test.select(col("key"), col("n_train"), col("n_test"),
      round(col("__v").cast("double") / 100.0, 6).as("var_amt"),
      col("x"),
      round(when(col("n_test") > 0L, lit(-2.0) * (lnNull - lnAlt)), 6)
        .as("lr"))
  }

  // ------------------------------------------------ Roll spread estimator
  /** Roll's implied bid-ask spread (Roll 1984): consecutive price moves
    * of a security bouncing between bid and ask are negatively
    * autocorrelated, and s = 2·√(−cov(Δp_t, Δp_{t−1})) recovers the
    * effective spread from trade prices alone. Positive autocovariance
    * (trending, no bounce) reports null — the estimator's documented
    * blind spot, never clamped silently.
    *
    * DETERMINISM AND SCALE: integer-cent diffs from key-partitioned lag
    * windows; Σd·d_lag products are exact DECIMAL(38,0); the population
    * autocovariance is one fixed IEEE shape per key row, 6dp. Returns
    * per key: (key, n_pairs, autocov, roll_spread) (spread in currency
    * units). */
  def rollSpread(df: DataFrame, keyCol: String, dayCol: String,
                 closeCol: Column): DataFrame = {
    val dt = DecimalType(38, 0)
    val wLag = Window.partitionBy(col("key")).orderBy(col("day"))
    val pairs = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__d", col("__c") - lag(col("__c"), 1).over(wLag))
      .withColumn("__dl", lag(col("__d"), 1).over(wLag))
      .filter(col("__d").isNotNull && col("__dl").isNotNull)
    val agg = pairs.groupBy("key")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__d").cast(dt)).as("__sd"),
        sum(col("__dl").cast(dt)).as("__sdl"),
        sum(col("__d").cast(dt) * col("__dl")).as("__sp"))
    val m = col("n_pairs").cast("double")
    val cov = col("__sp").cast("double") / m -
      col("__sd").cast("double") / m * (col("__sdl").cast("double") / m)
    // autocov can reach ~1e9 dollars-squared: a 6dp round there sits at
    // the double's own ulp (16 significant digits) and flips between
    // engines — 2dp keeps ~9 digits of margin
    agg.select(col("key"), col("n_pairs"),
      round(cov / 10000.0, 2).as("autocov"),
      round(when(col("n_pairs") >= 2L && cov < 0.0,
        lit(2.0) * sqrt(-cov) / 100.0), 6).as("roll_spread"))
  }

  // ------------------------------------------ minimum-variance pair
  /** Markowitz minimum-variance weights for a two-asset pair
    * (Markowitz 1952): over the days both tickers trade,
    * w_a = (σ_b² − σ_ab)/(σ_a² + σ_b² − 2σ_ab) minimizes the portfolio
    * variance of daily cent moves — the hedging counterpart to
    * [[rollSpread]]'s microstructure view.
    *
    * DETERMINISM AND SCALE: the two diff series inner-join on the
    * integer day (key-partitioned lag windows first); all moments are
    * exact DECIMAL(38,0) integer-cent sums; w is one fixed IEEE shape.
    * var_min reports at 2dp (the [[rollSpread]] magnitude lesson:
    * cents²-scale values overflow a 6dp round's precision). Identical
    * series (zero denominator) null loudly. Returns one row:
    * (n_days, w_a, w_b, var_min). */
  def minVariancePair(df: DataFrame, keyCol: String, dayCol: String,
                      closeCol: Column, keyA: String,
                      keyB: String): DataFrame = {
    val dt = DecimalType(38, 0)
    val wLag = Window.partitionBy(col("key")).orderBy(col("day"))
    val diffs = closeCents(df, keyCol, dayCol, closeCol)
      .filter(col("key").cast("string").isin(keyA, keyB))
      .withColumn("__d", col("__c") - lag(col("__c"), 1).over(wLag))
      .filter(col("__d").isNotNull)
    val a = diffs.filter(col("key").cast("string") === keyA)
      .select(col("day"), col("__d").as("__da"))
    val b = diffs.filter(col("key").cast("string") === keyB)
      .select(col("day"), col("__d").as("__db"))
    val m = a.join(b, "day")
      .agg(count(lit(1)).as("n_days"),
        sum(col("__da").cast(dt)).as("__sa"),
        sum(col("__db").cast(dt)).as("__sb"),
        sum(col("__da").cast(dt) * col("__da")).as("__saa"),
        sum(col("__db").cast(dt) * col("__db")).as("__sbb"),
        sum(col("__da").cast(dt) * col("__db")).as("__sab"))
    val nD = col("n_days").cast("double")
    def v(ss: String, s1: String, s2: String) =
      (col(ss).cast("double") -
        col(s1).cast("double") * col(s2).cast("double") / nD) / (nD - 1.0)
    val va = v("__saa", "__sa", "__sa")
    val vb = v("__sbb", "__sb", "__sb")
    val cab = v("__sab", "__sa", "__sb")
    val den = va + vb - lit(2.0) * cab
    val wA = when(col("n_days") >= 2L && den > 0.0, (vb - cab) / den)
    val varMin = (wA * wA * va + (lit(1.0) - wA) * (lit(1.0) - wA) * vb +
      lit(2.0) * wA * (lit(1.0) - wA) * cab) / 10000.0
    m.select(col("n_days"), round(wA, 6).as("w_a"),
      round(lit(1.0) - wA, 6).as("w_b"),
      round(varMin, 2).as("var_min"))
  }

  // --------------------------------------------------------- Ulcer index
  /** Ulcer index per key (Martin & McCann 1989): the RMS percentage
    * drawdown of the close below its own running peak —
    * UI = √(Σ dd_t²/n) with dd_t = 100·(peak_t − close_t)/peak_t — the
    * chronic-pain complement to [[drawdownReport]]'s single worst trough.
    *
    * DETERMINISM AND SCALE: the running peak is an exact integer-cent
    * cumulative max in a key-partitioned window; each dd is one fixed
    * IEEE shape on identical integers; Σdd² is the only order-sensitive
    * float sum (per key, magnitudes ≤ 100² — noise ~1e−10 under the 6dp
    * round). Returns per key: (key, n_bars, max_dd_pct, ulcer). */
  def ulcerIndex(df: DataFrame, keyCol: String, dayCol: String,
                 closeCol: Column): DataFrame = {
    val wRun = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPeak = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__peak", max(col("__c")).over(wRun))
    val dd = lit(100.0) * (col("__peak") - col("__c")).cast("double") /
      col("__peak").cast("double")
    withPeak.filter(col("__peak") > 0L)
      .withColumn("__dd", dd)
      .groupBy("key")
      .agg(count(lit(1)).as("n_bars"),
        round(max(col("__dd")), 6).as("max_dd_pct"),
        round(sqrt(sum(col("__dd") * col("__dd")) /
          count(lit(1)).cast("double")), 6).as("ulcer"))
  }

  /** Exact integer cents for a full OHLC bar row (the [[closeCents]]
    * discipline, all four legs): the /100 cancels in every log-ratio the
    * range estimators take, so the doubles that reach `ln` are ratios of
    * exact integers on any engine. */
  private def ohlcCents(df: DataFrame, keyCol: String, dayCol: String,
                        openCol: Column, highCol: Column, lowCol: Column,
                        closeCol: Column): DataFrame =
    df.select(col(keyCol).as("key"), col(dayCol).cast("long").as("day"),
      round(openCol * 100, 0).cast("long").as("__o"),
      round(highCol * 100, 0).cast("long").as("__h"),
      round(lowCol * 100, 0).cast("long").as("__l"),
      round(closeCol * 100, 0).cast("long").as("__c"))

  // --------------------------------------- OHLC range volatility panel
  /** Daily-range volatility estimators per key, from OHLC bars — the
    * classic panel that squeezes ~5–7× more efficiency out of a bar than
    * close-to-close variance by using the intraday range:
    *  - Parkinson 1980:       σ²_P  = mean(ln(H/L)²) / (4·ln 2)
    *  - Garman–Klass 1980:    σ²_GK = mean(½·ln(H/L)² − (2ln2−1)·ln(C/O)²)
    *  - Rogers–Satchell 1991: σ²_RS = mean(ln(H/C)·ln(H/O) +
    *                                       ln(L/C)·ln(L/O))  (drift-free)
    *
    * DETERMINISM AND SCALE: ONE key-grain groupBy — no windows, no
    * shuffling beyond the 25-key rollup; every per-day term is a fixed
    * IEEE shape on ratios of exact integer cents (ln applied to ONE
    * division, never ln(h)−ln(l)), cast DECIMAL(28,12) before the
    * order-free sum; the ln-constants are inlined literals so both
    * engines parse the identical double. GK and RS day-terms can go
    * negative; a negative MEAN nulls that column loudly (√ of it is not
    * a volatility). Returns per key: (key, n_days, parkinson,
    * garman_klass, rogers_satchell) 6dp. */
  def ohlcVolatility(df: DataFrame, keyCol: String, dayCol: String,
                     openCol: Column, highCol: Column, lowCol: Column,
                     closeCol: Column): DataFrame = {
    val dt = DecimalType(28, 12)
    val base = ohlcCents(df, keyCol, dayCol, openCol, highCol, lowCol,
      closeCol).filter(col("__l") > 0L && col("__o") > 0L &&
        col("__c") > 0L)
    def lr(a: Column, b: Column): Column =
      log(a.cast("double") / b.cast("double"))
    val hl = lr(col("__h"), col("__l"))
    val co = lr(col("__c"), col("__o"))
    val hc = lr(col("__h"), col("__c")); val ho = lr(col("__h"), col("__o"))
    val lc = lr(col("__l"), col("__c")); val lo = lr(col("__l"), col("__o"))
    val g = base.groupBy("key")
      .agg(count(lit(1)).as("n_days"),
        sum((hl * hl).cast(dt)).cast("double").as("__p"),
        sum((lit(0.5) * hl * hl -
          lit(0.3862943611198906) * co * co).cast(dt)).cast("double")
          .as("__gk"),
        sum((hc * ho + lc * lo).cast(dt)).cast("double").as("__rs"))
    val nD = col("n_days").cast("double")
    def vol(s: Column): Column =
      when(s >= 0.0, sqrt(s / nD))
    g.select(col("key"), col("n_days"),
      round(vol(col("__p") / lit(2.772588722239781)), 6).as("parkinson"),
      round(vol(col("__gk")), 6).as("garman_klass"),
      round(vol(col("__rs")), 6).as("rogers_satchell"))
  }

  // ------------------------------------------- Corwin–Schultz spread
  /** Corwin–Schultz bid-ask spread estimator (Corwin & Schultz 2012):
    * from each ADJACENT trading-day pair's highs/lows,
    * β = ln(H₀/L₀)² + ln(H₁/L₁)², γ = ln(max(H)/min(L))²,
    * α = (√(2β) − √β)/(3−2√2) − √(γ/(3−2√2)),
    * S = 2(e^α − 1)/(1 + e^α), negative pair-spreads floored to 0 (the
    * paper's convention), averaged per key — a spread proxy that needs
    * no quote data, the high-low sibling of [[rollSpread]]'s
    * autocovariance proxy.
    *
    * DETERMINISM AND SCALE: adjacency is one lag in a key-partitioned
    * window over the calendar-bounded bar series; each pair's S is a
    * fixed IEEE shape on exact integer-cent ratios (3−2√2 inlined as the
    * literal 0.1715728752538097); ΣS casts DECIMAL(28,12). Returns per
    * key: (key, n_pairs, cs_spread) 6dp. */
  def corwinSchultz(df: DataFrame, keyCol: String, dayCol: String,
                    highCol: Column, lowCol: Column): DataFrame = {
    val dt = DecimalType(28, 12)
    val k = 0.1715728752538097
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val base = df.select(col(keyCol).as("key"),
        col(dayCol).cast("long").as("day"),
        round(highCol * 100, 0).cast("long").as("__h"),
        round(lowCol * 100, 0).cast("long").as("__l"))
      .filter(col("__l") > 0L)
      .withColumn("__h0", lag(col("__h"), 1).over(w))
      .withColumn("__l0", lag(col("__l"), 1).over(w))
      .filter(col("__h0").isNotNull)
    def lr(a: Column, b: Column): Column =
      log(a.cast("double") / b.cast("double"))
    val b0 = lr(col("__h0"), col("__l0")); val b1 = lr(col("__h"), col("__l"))
    val beta = b0 * b0 + b1 * b1
    val gRange = lr(greatest(col("__h0"), col("__h")),
      least(col("__l0"), col("__l")))
    val gamma = gRange * gRange
    val alpha = (sqrt(lit(2.0) * beta) - sqrt(beta)) / lit(k) -
      sqrt(gamma / lit(k))
    val s = lit(2.0) * (exp(alpha) - 1.0) / (exp(alpha) + 1.0)
    base.withColumn("__s", greatest(s, lit(0.0)))
      .groupBy("key")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("__s").cast(dt)).cast("double") /
          count(lit(1)).cast("double"), 6).as("cs_spread"))
  }

  // --------------------------------------------- Amihud illiquidity
  /** Amihud (2002) illiquidity per key: ILLIQ = 10⁶ ·
    * mean(|r_t| / DV_t) over trading days with a prior close, where r_t
    * is the close-to-close simple return and DV_t the day's dollar
    * volume — price impact per dollar traded, THE standard low-frequency
    * liquidity proxy.
    *
    * DETERMINISM AND SCALE: returns are one IEEE division of exact
    * integer cents ((c−c₀)/c₀); dollar volume re-integerizes the exact
    * micro-dollar VWAP (round(vwap·10⁶) recovers [[dailyBars]]' integer
    * division exactly) times the integer volume; each day's ratio is one
    * fixed shape, summed as DECIMAL(38,18) (ratios are ~1e−9). Zero
    * dollar-volume days RAISE (a bar with volume 0 should not exist —
    * fail loudly, don't skip). Returns per key: (key, n_days, illiq)
    * 6dp. */
  def amihudIlliquidity(df: DataFrame, keyCol: String, dayCol: String,
                        closeCol: Column, volumeCol: Column,
                        vwapCol: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val base = df.select(col(keyCol).as("key"),
        col(dayCol).cast("long").as("day"),
        round(closeCol * 100, 0).cast("long").as("__c"),
        volumeCol.cast("long").as("__v"),
        round(vwapCol * 1000000, 0).cast("long").as("__vw"))
      .withColumn("__c0", lag(col("__c"), 1).over(w))
      .filter(col("__c0").isNotNull && col("__c0") > 0L)
    val dv = when(col("__v") <= 0L || col("__vw") <= 0L,
      raise_error(concat(lit("amihudIlliquidity: non-positive dollar "),
        lit("volume for key "), col("key").cast("string"))))
      .otherwise(col("__vw").cast("double") / 1000000.0 *
        col("__v").cast("double"))
    val r = (col("__c") - col("__c0")).cast("double") /
      col("__c0").cast("double")
    base.withColumn("__t", abs(r) / dv)
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"),
        round(lit(1000000.0) *
          sum(col("__t").cast(DecimalType(38, 18))).cast("double") /
          count(lit(1)).cast("double"), 6).as("illiq"))
  }

  // -------------------------------------------------------- omega ratio
  /** Omega ratio at threshold 0 of the daily close-to-close cent diffs
    * per key (Keating & Shadwick 2002): Ω = Σ max(d,0) / Σ max(−d,0) —
    * the gain/loss probability-mass ratio that uses the WHOLE
    * distribution where [[dailyRiskRatios]]' Sharpe collapses it to two
    * moments.
    *
    * DETERMINISM AND SCALE: diffs, gains, and losses are exact BIGINT
    * cents (no float until the single final division); one lag + one
    * key-grain groupBy. An all-gain series (Σloss = 0) nulls Ω loudly.
    * Returns per key: (key, n_diffs, up_cents, down_cents, omega) 6dp. */
  def omegaRatio(df: DataFrame, keyCol: String, dayCol: String,
                 closeCol: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val diffs = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__d", col("__c") - lag(col("__c"), 1).over(w))
      .filter(col("__d").isNotNull)
    diffs.groupBy("key")
      .agg(count(lit(1)).as("n_diffs"),
        sum(when(col("__d") > 0L, col("__d")).otherwise(0L)).as("up_cents"),
        sum(when(col("__d") < 0L, -col("__d")).otherwise(0L))
          .as("down_cents"))
      .withColumn("omega", round(when(col("down_cents") > 0L,
        col("up_cents").cast("double") /
          col("down_cents").cast("double")), 6))
  }

  // ------------------------------------------------ Dickey–Fuller test
  /** Dickey–Fuller unit-root regression per key (Dickey & Fuller 1979,
    * lag 0, with constant): Δy_t = α + ρ·y_{t−1} + ε on the integer-cent
    * close series; ρ̂ near 0 ⇒ random walk (unit root), strongly
    * negative t = ρ̂/se(ρ̂) ⇒ mean reversion. Compare t against the DF
    * (not Student) critical values, documented — the stat itself is the
    * data question.
    *
    * DETERMINISM AND SCALE: one lag in a key-partitioned window over the
    * calendar-bounded bar series; ALL five regression moments are exact
    * DECIMAL(38,0) integer-cent sums; ρ̂, SSR and t are fixed IEEE
    * shapes. n < 3, zero lag-variance, or zero SSR null loudly. Returns
    * per key: (key, n_pairs, rho, df_stat) 6dp. */
  def dickeyFuller(df: DataFrame, keyCol: String, dayCol: String,
                   closeCol: Column): DataFrame = {
    val dt = DecimalType(38, 0)
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val pairs = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__y1", lag(col("__c"), 1).over(w))
      .filter(col("__y1").isNotNull)
      .withColumn("__dy", col("__c") - col("__y1"))
    val m = pairs.groupBy("key")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__y1").cast(dt)).as("__sx"),
        sum(col("__dy").cast(dt)).as("__sy"),
        sum(col("__y1").cast(dt) * col("__y1")).as("__sxx"),
        sum(col("__dy").cast(dt) * col("__dy")).as("__syy"),
        sum(col("__y1").cast(dt) * col("__dy")).as("__sxy"))
    val nD = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = d("__sxy") - d("__sx") * d("__sy") / nD
    val den = d("__sxx") - d("__sx") * d("__sx") / nD
    val vy = d("__syy") - d("__sy") * d("__sy") / nD
    val rho = when(col("n_pairs") >= 3L && den > 0.0, num / den)
    val ssr = vy - rho * num
    m.select(col("key"), col("n_pairs"),
      round(rho, 6).as("rho"),
      round(when(ssr > 0.0,
        rho / sqrt(ssr / (nD - 2.0) / den)), 6).as("df_stat"))
  }

  // ------------------------------------------------- KPSS level test
  /** KPSS level-stationarity statistic per key (Kwiatkowski, Phillips,
    * Schmidt & Shin 1992; lag-0 short-run variance — the deterministic
    * bandwidth, documented): η = Σ_t S_t² / (n²·σ̂²) with S_t the
    * partial sums of demeaned closes — the null here is STATIONARITY,
    * the mirror image of [[dickeyFuller]]'s unit-root null (large η
    * rejects level-stationarity).
    *
    * DETERMINISM AND SCALE: the whole statistic is ONE exact integer
    * rational — n·S_t = n·C_t − t·T on cumulative integer cents and
    * η = Σ(n·S_t)² / (n²·(n·Σc² − T²)) — so both engines divide the
    * same two integers once (the [[omegaRatio]] discipline; squares
    * ≲ 1e24 sit comfortably in DECIMAL(38,0)/HUGEINT). A constant
    * series (zero variance) nulls loudly. Returns per key:
    * (key, n_days, kpss_eta) 6dp. */
  def kpssLevel(df: DataFrame, keyCol: String, dayCol: String,
                closeCol: Column): DataFrame = {
    val dt = DecimalType(38, 0)
    val base = closeCents(df, keyCol, dayCol, closeCol)
    val tot = base.groupBy("key")
      .agg(count(lit(1)).as("__n"), sum(col("__c").cast(dt)).as("__t"),
        sum(col("__c").cast(dt) * col("__c")).as("__s2"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRn = Window.partitionBy(col("key")).orderBy(col("day"))
    val cums = base
      .withColumn("__cum", sum(col("__c").cast(dt)).over(w))
      .withColumn("__rn", row_number().over(wRn).cast("long"))
      .join(broadcast(tot), "key")
    val nS = col("__n").cast(dt) * col("__cum") -
      col("__rn").cast(dt) * col("__t")
    val agg = cums.groupBy("key")
      .agg(first(col("__n")).as("n_days"), first(col("__t")).as("__t"),
        first(col("__s2")).as("__s2"), sum(nS * nS).as("__d1"))
    val d2 = col("n_days").cast(dt) * col("n_days").cast(dt) *
      (col("n_days").cast(dt) * col("__s2") - col("__t") * col("__t"))
    agg.select(col("key"), col("n_days"),
      round(when(d2 > lit(0).cast(dt),
        col("__d1").cast("double") / d2.cast("double")), 6).as("kpss_eta"))
  }

  // ------------------------------------------------- AR(1) half-life
  /** AR(1) persistence and mean-reversion half-life per key: OLS
    * φ = cov(y_t, y_{t−1})/var(y_{t−1}) on integer-cent closes;
    * half-life = ln 2 / (−ln φ) for φ ∈ (0,1) — "how many trading days
    * until a shock decays halfway", the tradeable companion to
    * [[dickeyFuller]]'s hypothesis test.
    *
    * DETERMINISM AND SCALE: the [[dickeyFuller]] scaffold exactly —
    * key-partitioned lag, DECIMAL(38,0) moments, fixed IEEE finish with
    * the inlined ln 2 literal. φ outside (0,1) (anti-persistent or
    * explosive) nulls the half-life loudly, never extrapolates. Returns
    * per key: (key, n_pairs, phi, half_life) 6dp. */
  def ar1HalfLife(df: DataFrame, keyCol: String, dayCol: String,
                  closeCol: Column): DataFrame = {
    val dt = DecimalType(38, 0)
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val pairs = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__y1", lag(col("__c"), 1).over(w))
      .filter(col("__y1").isNotNull)
    val m = pairs.groupBy("key")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__y1").cast(dt)).as("__sx"),
        sum(col("__c").cast(dt)).as("__sy"),
        sum(col("__y1").cast(dt) * col("__y1")).as("__sxx"),
        sum(col("__y1").cast(dt) * col("__c")).as("__sxy"))
    val nD = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = d("__sxy") - d("__sx") * d("__sy") / nD
    val den = d("__sxx") - d("__sx") * d("__sx") / nD
    val phi = when(col("n_pairs") >= 2L && den > 0.0, num / den)
    m.select(col("key"), col("n_pairs"),
      round(phi, 6).as("phi"),
      round(when(phi > 0.0 && phi < 1.0,
        lit(0.6931471805599453) / -log(phi)), 6).as("half_life"))
  }

  // --------------------------------------------- Granger causality
  /** Lag-1 Granger causality from ticker A to ticker B (Granger 1969):
    * on the joined both-trade day spine, does yesterday's A close help
    * predict today's B close beyond yesterday's B?
    * F = (SSR_r − SSR_u) / (SSR_u/(n−3)) comparing the restricted
    * (b_t ~ b_{t−1}) to the unrestricted (b_t ~ b_{t−1} + a_{t−1})
    * regression — the hypothesis-test companion to the descriptive
    * lead-lag correlation.
    *
    * DETERMINISM AND SCALE: the pair spine is calendar-bounded (the
    * [[minVariancePair]] join), so its single window is a bounded
    * relation; all 2-regressor normal-equation moments are exact
    * DECIMAL(38,0) integer-cent sums and the 2×2 solve is inlined IEEE.
    * delta_r2 = (SSR_r − SSR_u)/S_yy reports effect size beside F (raw
    * SSRs are cents²-scale — unreportable at 6dp, per the rollSpread
    * magnitude lesson). Degenerate designs (n < 4, singular normal
    * matrix, zero SSR_u) null loudly. Returns one row:
    * (n_days, f_stat, delta_r2) 6dp. */
  def grangerPair(df: DataFrame, keyCol: String, dayCol: String,
                  closeCol: Column, keyA: String,
                  keyB: String): DataFrame = {
    val dt = DecimalType(38, 0)
    val cents = closeCents(df, keyCol, dayCol, closeCol)
      .filter(col("key").cast("string").isin(keyA, keyB))
    val a = cents.filter(col("key").cast("string") === keyA)
      .select(col("day"), col("__c").as("__a"))
    val b = cents.filter(col("key").cast("string") === keyB)
      .select(col("day"), col("__c").as("__b"))
    val spine = a.join(b, "day")
    val w = Window.orderBy(col("day"))
    val rows = spine
      .withColumn("__a1", lag(col("__a"), 1).over(w))
      .withColumn("__b1", lag(col("__b"), 1).over(w))
      .filter(col("__a1").isNotNull)
    val m = rows.agg(count(lit(1)).as("n_days"),
      sum(col("__b").cast(dt)).as("__sw"),
      sum(col("__b1").cast(dt)).as("__s1"),
      sum(col("__a1").cast(dt)).as("__s2"),
      sum(col("__b1").cast(dt) * col("__b1")).as("__s11"),
      sum(col("__a1").cast(dt) * col("__a1")).as("__s22"),
      sum(col("__b1").cast(dt) * col("__a1")).as("__s12"),
      sum(col("__b1").cast(dt) * col("__b")).as("__s1w"),
      sum(col("__a1").cast(dt) * col("__b")).as("__s2w"),
      sum(col("__b").cast(dt) * col("__b")).as("__sww"))
    val nD = col("n_days").cast("double")
    def d(c: String) = col(c).cast("double")
    val s11 = d("__s11") - d("__s1") * d("__s1") / nD
    val s22 = d("__s22") - d("__s2") * d("__s2") / nD
    val s12 = d("__s12") - d("__s1") * d("__s2") / nD
    val s1w = d("__s1w") - d("__s1") * d("__sw") / nD
    val s2w = d("__s2w") - d("__s2") * d("__sw") / nD
    val sww = d("__sww") - d("__sw") * d("__sw") / nD
    val det = s11 * s22 - s12 * s12
    val ok = col("n_days") >= 4L && det > 0.0 && s11 > 0.0 && sww > 0.0
    val bb = when(ok, (s1w * s22 - s2w * s12) / det)
    val cc = when(ok, (s2w * s11 - s1w * s12) / det)
    val ssrU = sww - bb * s1w - cc * s2w
    val ssrR = sww - when(ok, s1w * s1w / s11)
    m.select(col("n_days"),
      round(when(ssrU > 0.0,
        (ssrR - ssrU) / (ssrU / (nD - 3.0))), 6).as("f_stat"),
      round(when(ok, (ssrR - ssrU) / sww), 6).as("delta_r2"))
  }

  // ----------------------------------------------------- Kyle's lambda
  /** Kyle's lambda per key (Kyle 1985, the tick-rule estimate): OLS
    * slope of the daily cent move Δc on the SIGNED volume
    * sign(Δc)·volume — price impact per share of net order flow, the
    * regression sibling of [[amihudIlliquidity]]'s ratio.
    *
    * DETERMINISM AND SCALE: Δc and the signed volume are exact integers
    * off one key-partitioned lag; all OLS moments are DECIMAL(38,0)
    * sums ([[dickeyFuller]]'s discipline). Zero flow variance nulls
    * loudly. Returns per key: (key, n_pairs, kyle_lambda) 6dp. */
  def kyleLambda(df: DataFrame, keyCol: String, dayCol: String,
                 closeCol: Column, volumeCol: Column): DataFrame = {
    val dt = DecimalType(38, 0)
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val base = df.select(col(keyCol).as("key"),
        col(dayCol).cast("long").as("day"),
        round(closeCol * 100, 0).cast("long").as("__c"),
        volumeCol.cast("long").as("__v"))
      .withColumn("__d", col("__c") - lag(col("__c"), 1).over(w))
      .filter(col("__d").isNotNull)
      .withColumn("__sv",
        signum(col("__d").cast("double")).cast("long") * col("__v"))
    val m = base.groupBy("key")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__sv").cast(dt)).as("__sx"),
        sum(col("__d").cast(dt)).as("__sy"),
        sum(col("__sv").cast(dt) * col("__sv")).as("__sxx"),
        sum(col("__sv").cast(dt) * col("__d")).as("__sxy"))
    val nD = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = d("__sxy") - d("__sx") * d("__sy") / nD
    val den = d("__sxx") - d("__sx") * d("__sx") / nD
    m.select(col("key"), col("n_pairs"),
      round(when(col("n_pairs") >= 2L && den > 0.0, num / den), 6)
        .as("kyle_lambda"))
  }

  // -------------------------------------------------------- CAPM beta
  /** CAPM beta panel: each ticker's daily cent move regressed on the
    * equal-weight MARKET move (the sum of participating tickers' closes
    * over BROAD days — days whose participant count reaches ≥ 80 % of
    * the OBSERVED maximum, the exact integer gate 5·cnt ≥ 4·max(cnt); a
    * fixed-fraction-of-k gate starves at sparse scale factors where no
    * day is near-complete), β = cov/var with α and R² alongside — the
    * systematic-
    * vs-idiosyncratic split [[minVariancePair]] does for one pair,
    * marketwide.
    *
    * DETERMINISM AND SCALE: the market series is one day-grain rollup
    * gated on the exact participant count; both diff series are exact
    * integer cents; per-key moments are DECIMAL(38,0) sums. Returns per
    * key: (key, n_days, beta, alpha, r2) 6dp. */
  def capmBeta(df: DataFrame, keyCol: String, dayCol: String,
               closeCol: Column): DataFrame = {
    val dt = DecimalType(38, 0)
    // NOT cut: `cents` feeds four plan consumers whose pruned subtrees
    // don't all reuse one exchange, but the duplicated subtrees are
    // small 1-task stages that the scheduler runs CONCURRENTLY inside
    // the one job — an eager localCheckpoint serialized that work and
    // measured WORSE (q524 2.03 -> 2.41 s A/B, r16).
    val cents = closeCents(df, keyCol, dayCol, closeCol)
    val perDay = cents.groupBy("day")
      .agg(count(lit(1)).as("__cnt"), sum(col("__c")).as("__mc"))
    val maxCnt = perDay.agg(max(col("__cnt")).as("__mx"))
    val market = perDay
      .crossJoin(broadcast(maxCnt))
      .filter(col("__cnt") * 5L >= col("__mx") * 4L)
      .select(col("day"), col("__mc"))
    val wM = Window.orderBy(col("day"))
    val mDiff = market
      .withColumn("__dm", col("__mc") - lag(col("__mc"), 1).over(wM))
      .filter(col("__dm").isNotNull)
      .select(col("day"), col("__dm"))
    val wK = Window.partitionBy(col("key")).orderBy(col("day"))
    val tDiff = cents.join(market.select(col("day")), Seq("day"))
      .withColumn("__dc", col("__c") - lag(col("__c"), 1).over(wK))
      .filter(col("__dc").isNotNull)
      .select(col("key"), col("day"), col("__dc"))
    val m = tDiff.join(mDiff, Seq("day"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"),
        sum(col("__dm").cast(dt)).as("__sx"),
        sum(col("__dc").cast(dt)).as("__sy"),
        sum(col("__dm").cast(dt) * col("__dm")).as("__sxx"),
        sum(col("__dm").cast(dt) * col("__dc")).as("__sxy"),
        sum(col("__dc").cast(dt) * col("__dc")).as("__syy"))
    val nD = col("n_days").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = d("__sxy") - d("__sx") * d("__sy") / nD
    val den = d("__sxx") - d("__sx") * d("__sx") / nD
    val vy = d("__syy") - d("__sy") * d("__sy") / nD
    val beta = when(col("n_days") >= 2L && den > 0.0, num / den)
    m.select(col("key"), col("n_days"),
      round(beta, 6).as("beta"),
      round(d("__sy") / nD - beta * (d("__sx") / nD), 6).as("alpha"),
      round(when(den > 0.0 && vy > 0.0, num * num / (den * vy)), 6)
        .as("r2"))
  }

  // --------------------------------------------- drawdown duration
  /** Time-under-water census per key: with the running integer-cent
    * peak, a bar is UNDERWATER when close < peak; reports how many bars
    * are underwater and the longest consecutive run (in TRADING days —
    * the bar series carries the time axis, the [[cutlersRsi]] grain) —
    * the duration complement to [[ulcerIndex]]'s depth.
    *
    * DETERMINISM AND SCALE: the flag is an exact integer compare; runs
    * come from the gaps-and-islands row_number difference inside
    * key-partitioned windows over the calendar-bounded bar series.
    * Returns per key: (key, n_bars, n_underwater, max_run). */
  def drawdownDuration(df: DataFrame, keyCol: String, dayCol: String,
                       closeCol: Column): DataFrame = {
    val wRun = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPos = Window.partitionBy(col("key")).orderBy(col("day"))
    val flagged = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__peak", max(col("__c")).over(wRun))
      .withColumn("__under", col("__c") < col("__peak"))
      .withColumn("__rn", row_number().over(wPos))
    val under = flagged.filter(col("__under"))
      .withColumn("__grp", col("__rn") - row_number().over(wPos))
    val runs = under.groupBy("key", "__grp")
      .agg(count(lit(1)).as("__len"))
      .groupBy("key")
      .agg(sum(col("__len")).as("n_underwater"),
        max(col("__len")).as("max_run"))
    flagged.groupBy("key").agg(count(lit(1)).as("n_bars"))
      .join(runs, Seq("key"), "left")
      .select(col("key"), col("n_bars"),
        coalesce(col("n_underwater"), lit(0L)).as("n_underwater"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  // --------------------------------------------- momentum backtest
  /** Cross-sectional momentum backtest: each day rank tickers by the
    * trailing `lookback`-day return (through YESTERDAY — no look-ahead),
    * hold the top `k` long and the bottom `k` short for one day; report
    * the mean and t-stat of the daily long-short spread — the canonical
    * "does the signal pay" one-number answer.
    *
    * DETERMINISM AND SCALE: signals and next-day returns are exact-
    * integer-cent ratios (identical doubles both engines), ranked per
    * day by (signal desc, key asc) in day-partitioned windows over the
    * bar relation; only days with ≥ 2k + 1 ranked tickers trade; spread
    * means/vars come from DECIMAL(28,12) sums. Returns one row:
    * (n_days, mean_spread, t_stat) 6dp. */
  def momentumBacktest(df: DataFrame, keyCol: String, dayCol: String,
                       closeCol: Column, lookback: Int = 5,
                       k: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dd = DecimalType(28, 12)
    require(lookback >= 1 && k >= 1, s"lookback/k positive")
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
    val base = closeCents(df, keyCol, dayCol, closeCol)
      .withColumn("__c1", lag(col("__c"), 1).over(w))
      .withColumn("__cL", lag(col("__c"), lookback + 1).over(w))
      .filter(col("__c1").isNotNull && col("__cL").isNotNull &&
        col("__cL") > 0L && col("__c1") > 0L)
      .withColumn("__sig", (col("__c1") - col("__cL")).cast("double") /
        col("__cL").cast("double"))
      .withColumn("__ret", (col("__c") - col("__c1")).cast("double") /
        col("__c1").cast("double"))
    val wDay = Window.partitionBy(col("day"))
      .orderBy(col("__sig").desc, col("key").asc)
    val ranked = base
      .withColumn("__rk", row_number().over(wDay))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(col("day"))))
      .filter(col("__m") >= (2 * k + 1).toLong)
    val daily = ranked.groupBy("day")
      .agg((sum(when(col("__rk") <= k, col("__ret").cast(dd)))
          .cast("double") / lit(k.toDouble) -
        sum(when(col("__rk") > col("__m") - k, col("__ret").cast(dd)))
          .cast("double") / lit(k.toDouble)).as("__spread"))
    val m = daily.agg(count(lit(1)).as("n_days"),
      sum(col("__spread").cast(dd)).cast("double").as("__s"),
      sum((col("__spread") * col("__spread")).cast(dd)).cast("double")
        .as("__ss"))
    val nD = col("n_days").cast("double")
    val mean = col("__s") / nD
    val v = (col("__ss") - col("__s") * col("__s") / nD) / (nD - 1.0)
    m.select(col("n_days"), round(mean, 6).as("mean_spread"),
      round(when(col("n_days") >= 2L && v > 0.0,
        mean / sqrt(v / nD)), 6).as("t_stat"))
  }
}
