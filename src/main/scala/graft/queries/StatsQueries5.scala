package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{EventAnalytics, Finance, Graph, Similarity, Spatial,
  Stats, TextAnalysis => TA}

/** Round-12 drivers: market-microstructure estimators over the synthetic
  * ticker bars (OHLC range volatility, Corwin–Schultz spread, Amihud
  * illiquidity, omega ratio), then the round's later batches. Every
  * oracle mirrors the Spark expression SHAPES exactly (same
  * associativity, same divide placement, inlined ln-constant literals)
  * per the dual-engine determinism discipline.
  */
object StatsQueries5 {

  /** The shared synthetic-ticker bar CTE: 25 tickers from l_suppkey,
    * trading-day OHLCV with the unique-tie election (l_shipdate is a pure
    * DATE, so arg_min/arg_max on the tie alone matches [[Finance.dailyBars]]'
    * (ts, tie) struct election). */
  private val barsCte: String =
    "WITH t AS (SELECT l_suppkey % 25 AS key, " +
      "epoch_us(l_shipdate) // 86400000000 AS day, " +
      "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey AS tie, " +
      "CAST(round(l_extendedprice * 100) AS BIGINT) AS c, " +
      "CAST(l_quantity AS BIGINT) AS q FROM lineitem), " +
      "b AS (SELECT key, day, arg_min(c, tie) AS o, max(c) AS h, " +
      "min(c) AS l, arg_max(c, tie) AS cl, CAST(sum(q) AS BIGINT) " +
      "AS volume, sum(CAST(c AS HUGEINT) * q) AS notional " +
      "FROM t GROUP BY 1, 2)"

  /** The shared per-language token rollup CTE (mirrors
    * TextAnalysis.tokenCounts: lowercased whitespace tokens, empties
    * dropped). */
  private val tokCte: String =
    "WITH tok AS (SELECT lang, unnest(regexp_split_to_array(" +
      "trim(lower(text)), '\\s+')) AS t FROM documents), " +
      "tc AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM tok " +
      "WHERE t <> '' GROUP BY 1, 2), "

  /** The cluster-quality queries' fixed centroid list and its oracle
    * scaffolding: the 16 pseudo-random unit centroids ship INTO the SQL
    * as a VALUES list (the q35 discipline — pure arithmetic on both
    * sides), and `dis` is the per-(vector, centroid) cosine distance
    * with the exact ivfAssign score shape d = 1 + (−dot/(|v|·|c|)). */
  private val cqCentroids = Similarity.pseudoCentroids(16, 64)
  private val cqDisCte: String = {
    val values = cqCentroids.map { case (cid, v) =>
      s"($cid, [${v.mkString(", ")}], ${math.sqrt(v.map(x => x * x).sum)})"
    }.mkString(", ")
    val vd = "list_transform(e.embedding, x -> CAST(x AS DOUBLE))"
    s"WITH c(cid, cv, cnorm) AS (VALUES $values), " +
      s"dis AS (SELECT e.vec_id, c.cid, 1.0 + (-list_dot_product($vd, " +
      s"c.cv) / (sqrt(list_dot_product($vd, $vd)) * c.cnorm)) AS d " +
      "FROM embeddings e CROSS JOIN c), "
  }

  private def allBars(s: org.apache.spark.sql.SparkSession, dir: String) =
    Finance.dailyBars(
      Tables.lineitem(s, dir)
        .withColumn("ticker", pmod(col("l_suppkey"), lit(25L))),
      "ticker", "l_shipdate",
      col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
        col("l_suppkey"),
      col("l_extendedprice"), col("l_quantity"))

  val qs: Seq[Q] = Seq(

    // ---- OHLC range-volatility panel per ticker: Parkinson, Garman-
    // Klass, Rogers-Satchell from exact integer-cent ratios; the /100
    // cancels inside every log-ratio, so ln sees identical doubles on
    // both engines.
    Q("q479_ohlc_vol",
      Some(barsCte + ", " +
        "r AS (SELECT key, " +
        "ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)) AS hl, " +
        "ln(CAST(cl AS DOUBLE) / CAST(o AS DOUBLE)) AS co, " +
        "ln(CAST(h AS DOUBLE) / CAST(cl AS DOUBLE)) AS hc, " +
        "ln(CAST(h AS DOUBLE) / CAST(o AS DOUBLE)) AS ho, " +
        "ln(CAST(l AS DOUBLE) / CAST(cl AS DOUBLE)) AS lc, " +
        "ln(CAST(l AS DOUBLE) / CAST(o AS DOUBLE)) AS lo " +
        "FROM b WHERE l > 0 AND o > 0 AND cl > 0), " +
        "m AS (SELECT key, CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(CAST(hl * hl AS DECIMAL(28,12))) AS DOUBLE) AS p, " +
        "CAST(sum(CAST(0.5 * hl * hl - 0.3862943611198906 * co * co " +
        "AS DECIMAL(28,12))) AS DOUBLE) AS gk, " +
        "CAST(sum(CAST(hc * ho + lc * lo AS DECIMAL(28,12))) AS DOUBLE) " +
        "AS rs FROM r GROUP BY 1) " +
        "SELECT key, n_days, " +
        "round(CASE WHEN p / 2.772588722239781 >= 0 THEN " +
        "sqrt(p / 2.772588722239781 / CAST(n_days AS DOUBLE)) END, 6) " +
        "AS parkinson, " +
        "round(CASE WHEN gk >= 0 THEN " +
        "sqrt(gk / CAST(n_days AS DOUBLE)) END, 6) AS garman_klass, " +
        "round(CASE WHEN rs >= 0 THEN " +
        "sqrt(rs / CAST(n_days AS DOUBLE)) END, 6) AS rogers_satchell " +
        "FROM m ORDER BY key"),
      (s, dir) => Finance.ohlcVolatility(allBars(s, dir), "key", "day",
        col("open"), col("high"), col("low"), col("close"))
        .orderBy("key")),

    // ---- Corwin-Schultz high-low spread per ticker over adjacent
    // trading-day pairs; negative pair spreads floor to 0 (the paper's
    // convention), 3-2*sqrt(2) inlined as a shared literal.
    Q("q480_corwin_schultz",
      Some(barsCte + ", " +
        "p AS (SELECT key, day, h, l, " +
        "lag(h) OVER (PARTITION BY key ORDER BY day) AS h0, " +
        "lag(l) OVER (PARTITION BY key ORDER BY day) AS l0 " +
        "FROM b WHERE l > 0), " +
        "r AS (SELECT key, " +
        "ln(CAST(h0 AS DOUBLE) / CAST(l0 AS DOUBLE)) AS b0, " +
        "ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)) AS b1, " +
        "ln(CAST(greatest(h0, h) AS DOUBLE) / " +
        "CAST(least(l0, l) AS DOUBLE)) AS gr FROM p " +
        "WHERE h0 IS NOT NULL), " +
        "a AS (SELECT key, (sqrt(2.0 * (b0 * b0 + b1 * b1)) - " +
        "sqrt(b0 * b0 + b1 * b1)) / 0.1715728752538097 - " +
        "sqrt(gr * gr / 0.1715728752538097) AS alpha FROM r), " +
        "w AS (SELECT key, greatest(2.0 * (exp(alpha) - 1.0) / " +
        "(exp(alpha) + 1.0), 0.0) AS sv FROM a) " +
        "SELECT key, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "round(CAST(sum(CAST(sv AS DECIMAL(28,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS cs_spread " +
        "FROM w GROUP BY 1 ORDER BY key"),
      (s, dir) => Finance.corwinSchultz(allBars(s, dir), "key", "day",
        col("high"), col("low"))
        .orderBy("key")),

    // ---- Amihud illiquidity per ticker: |close-to-close return| per
    // dollar traded; the dollar volume re-integerizes dailyBars' exact
    // micro-dollar VWAP so both engines multiply identical doubles.
    Q("q481_amihud",
      Some(barsCte + ", " +
        "v AS (SELECT key, day, cl, volume, " +
        "CAST((2 * notional * 10000 + volume) // (2 * volume) AS BIGINT) " +
        "AS vw FROM b), " +
        "p AS (SELECT key, day, cl, volume, vw, " +
        "lag(cl) OVER (PARTITION BY key ORDER BY day) AS cl0 FROM v), " +
        "r AS (SELECT key, abs(CAST(cl - cl0 AS DOUBLE) / " +
        "CAST(cl0 AS DOUBLE)) / (CAST(vw AS DOUBLE) / 1000000.0 * " +
        "CAST(volume AS DOUBLE)) AS tt FROM p " +
        "WHERE cl0 IS NOT NULL AND cl0 > 0) " +
        "SELECT key, CAST(count(*) AS BIGINT) AS n_days, " +
        "round(1000000.0 * CAST(sum(CAST(tt AS DECIMAL(38,18))) " +
        "AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS illiq " +
        "FROM r GROUP BY 1 ORDER BY key"),
      (s, dir) => Finance.amihudIlliquidity(allBars(s, dir), "key", "day",
        col("close"), col("volume"), col("vwap"))
        .orderBy("key")),

    // ---- Omega ratio at threshold 0 per ticker: the gain/loss cent-sum
    // rational -- integers end to end, ONE final division.
    Q("q482_omega",
      Some(barsCte + ", " +
        "d AS (SELECT key, cl - lag(cl) OVER (PARTITION BY key " +
        "ORDER BY day) AS dd FROM b), " +
        "f AS (SELECT key, dd FROM d WHERE dd IS NOT NULL), " +
        "g AS (SELECT key, CAST(count(*) AS BIGINT) AS n_diffs, " +
        "CAST(sum(CASE WHEN dd > 0 THEN dd ELSE 0 END) AS BIGINT) " +
        "AS up_cents, " +
        "CAST(sum(CASE WHEN dd < 0 THEN -dd ELSE 0 END) AS BIGINT) " +
        "AS down_cents FROM f GROUP BY 1) " +
        "SELECT key, n_diffs, up_cents, down_cents, " +
        "round(CASE WHEN down_cents > 0 THEN CAST(up_cents AS DOUBLE) / " +
        "CAST(down_cents AS DOUBLE) END, 6) AS omega " +
        "FROM g ORDER BY key"),
      (s, dir) => Finance.omegaRatio(allBars(s, dir), "key", "day",
        col("close"))
        .orderBy("key")),

    // ---- Hill tail-index over the top-100 order totals: TakeOrdered on
    // the total (value desc, unique orderkey) order; the x_(k+1) row's
    // ln(1) = 0 makes the all-rows decimal sum the exact k-term sum.
    Q("q483_hill",
      Some("WITH top AS (SELECT CAST(o_totalprice AS DOUBLE) AS v, " +
        "o_orderkey AS tie FROM orders WHERE o_totalprice IS NOT NULL " +
        "ORDER BY v DESC, tie LIMIT 101), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, min(v) AS thr " +
        "FROM top), " +
        "s AS (SELECT any_value(m.n_rows) AS n_rows, " +
        "any_value(m.thr) AS thr, " +
        "CAST(sum(CAST(ln(top.v / m.thr) AS DECIMAL(28,12))) AS DOUBLE) " +
        "AS sl FROM top, m) " +
        "SELECT n_rows, round(thr, 6) AS threshold, " +
        "round(CASE WHEN n_rows = 101 THEN sl / 100.0 END, 6) AS hill_xi, " +
        "round(CASE WHEN n_rows = 101 AND sl > 0 THEN " +
        "1.0 / (sl / 100.0) END, 6) AS hill_alpha FROM s"),
      (s, dir) => Stats.hillEstimator(Tables.orders(s, dir),
        col("o_totalprice"), col("o_orderkey"), k = 100)),

    // ---- Pickands GPD-shape from the 50/100/200-th largest order
    // totals: sign-free where Hill assumes a heavy tail; the row_number
    // window runs only on the bounded post-limit 200 rows.
    Q("q484_pickands",
      Some("WITH top AS (SELECT CAST(o_totalprice AS DOUBLE) AS v, " +
        "o_orderkey AS tie FROM orders WHERE o_totalprice IS NOT NULL " +
        "ORDER BY v DESC, tie LIMIT 200), " +
        "r AS (SELECT v, row_number() OVER (ORDER BY v DESC, tie) AS rn " +
        "FROM top), " +
        "p AS (SELECT max(CASE WHEN rn = 50 THEN v END) AS x1, " +
        "max(CASE WHEN rn = 100 THEN v END) AS x2, " +
        "max(CASE WHEN rn = 200 THEN v END) AS x4 FROM r) " +
        "SELECT round(x1, 6) AS x_k, round(x2, 6) AS x_2k, " +
        "round(x4, 6) AS x_4k, " +
        "round(CASE WHEN x2 - x4 > 0 AND x1 - x2 > 0 THEN " +
        "ln((x1 - x2) / (x2 - x4)) / 0.6931471805599453 END, 6) " +
        "AS pickands_xi FROM p"),
      (s, dir) => Stats.pickandsEstimator(Tables.orders(s, dir),
        col("o_totalprice"), col("o_orderkey"), k = 50)),

    // ---- Weibull median-rank regression over every extended price:
    // global ranks via distributedRank (cell-partitioned), Bernard's
    // plotting positions, decimal OLS moments.
    Q("q485_weibull_fit",
      Some("WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey " +
        "AS tie FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
        "r AS (SELECT v, row_number() OVER (ORDER BY v, tie) AS rn " +
        "FROM b), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b), " +
        "c AS (SELECT v, rn, t.n, CAST(t.n AS DOUBLE) AS nd FROM r, t), " +
        "e AS (SELECT n, ln(v) AS x, ln(-ln(1.0 - " +
        "(CAST(rn AS DOUBLE) - 0.3) / (nd + 0.4))) AS y FROM c), " +
        "m AS (SELECT any_value(n) AS n, " +
        "CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(y * y AS DECIMAL(28,12))) AS DOUBLE) AS syy, " +
        "CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy " +
        "FROM e), " +
        "f AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, " +
        "sxy - sx * sy / CAST(n AS DOUBLE) AS num, " +
        "sxx - sx * sx / CAST(n AS DOUBLE) AS den, " +
        "syy - sy * sy / CAST(n AS DOUBLE) AS vy FROM m), " +
        "g AS (SELECT n, nd, sx, sy, num, den, vy, " +
        "CASE WHEN den > 0 THEN num / den END AS slope FROM f) " +
        "SELECT n, round(slope, 6) AS shape, " +
        "round(CASE WHEN slope > 0 THEN " +
        "exp(-((sy / nd - slope * (sx / nd)) / slope)) END, 6) AS scale, " +
        "round(CASE WHEN den > 0 AND vy > 0 THEN " +
        "num / sqrt(den * vy) END, 6) AS r FROM g"),
      (s, dir) => Stats.weibullPlotFit(Tables.lineitem(s, dir),
        col("l_extendedprice"),
        col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
          col("l_suppkey"))),

    // ---- PPCC of the inter-arrival gaps against exponential plotting
    // quantiles (Blom positions): the QQ-straightness companion to
    // q476's KS distance, on the same gap relation.
    Q("q486_ppcc_exp",
      Some("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us " +
        "FROM events), " +
        "g AS (SELECT event_id, (us - lag(us) OVER (PARTITION BY " +
        "user_id ORDER BY us, event_id)) // 1000000 AS gap_s FROM e), " +
        "f AS (SELECT CAST(gap_s AS DOUBLE) AS v, event_id AS tie " +
        "FROM g WHERE gap_s IS NOT NULL), " +
        "r AS (SELECT v, row_number() OVER (ORDER BY v, tie) AS rn " +
        "FROM f), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f), " +
        "c AS (SELECT v, rn, t.n, CAST(t.n AS DOUBLE) AS nd FROM r, t), " +
        "e2 AS (SELECT n, v, -ln(1.0 - " +
        "(CAST(rn AS DOUBLE) - 0.375) / (nd + 0.25)) AS q FROM c), " +
        "m AS (SELECT any_value(n) AS n, " +
        "CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(q AS DECIMAL(28,12))) AS DOUBLE) AS sq, " +
        "CAST(sum(CAST(v * v AS DECIMAL(28,12))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(q * q AS DECIMAL(28,12))) AS DOUBLE) AS sqq, " +
        "CAST(sum(CAST(v * q AS DECIMAL(28,12))) AS DOUBLE) AS sxq " +
        "FROM e2) " +
        "SELECT n, round(CASE WHEN " +
        "sxx - sx * sx / CAST(n AS DOUBLE) > 0 AND " +
        "sqq - sq * sq / CAST(n AS DOUBLE) > 0 THEN " +
        "(sxq - sx * sq / CAST(n AS DOUBLE)) / " +
        "sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) * " +
        "(sqq - sq * sq / CAST(n AS DOUBLE))) END, 6) AS ppcc FROM m"),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("__us"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("__us"),
            col("event_id"))
          .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
          .filter(col("__gap").isNotNull)
          .select(expr("__gap div 1000000").as("gap_s"), col("event_id"))
        Stats.ppccExponential(gaps, col("gap_s"), col("event_id"))
      }),

    // ---- Dickey-Fuller unit-root t per ticker: exact HUGEINT/decimal
    // regression moments of (dy on y1), one IEEE finish.
    Q("q487_dickey_fuller",
      Some(barsCte + ", " +
        "p AS (SELECT key, day, cl, lag(cl) OVER (PARTITION BY key " +
        "ORDER BY day) AS y1 FROM b), " +
        "f AS (SELECT key, cl - y1 AS dy, y1 FROM p " +
        "WHERE y1 IS NOT NULL), " +
        "m AS (SELECT key, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CAST(y1 AS HUGEINT)) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(dy AS HUGEINT)) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(y1 AS HUGEINT) * y1) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(dy AS HUGEINT) * dy) AS DOUBLE) AS syy, " +
        "CAST(sum(CAST(y1 AS HUGEINT) * dy) AS DOUBLE) AS sxy " +
        "FROM f GROUP BY 1), " +
        "c AS (SELECT key, n_pairs, CAST(n_pairs AS DOUBLE) AS nd, " +
        "sxy - sx * sy / CAST(n_pairs AS DOUBLE) AS num, " +
        "sxx - sx * sx / CAST(n_pairs AS DOUBLE) AS den, " +
        "syy - sy * sy / CAST(n_pairs AS DOUBLE) AS vy FROM m), " +
        "g AS (SELECT key, n_pairs, nd, num, den, vy, " +
        "CASE WHEN n_pairs >= 3 AND den > 0 THEN num / den END AS rho " +
        "FROM c) " +
        "SELECT key, n_pairs, round(rho, 6) AS rho, " +
        "round(CASE WHEN vy - rho * num > 0 THEN rho / " +
        "sqrt((vy - rho * num) / (nd - 2.0) / den) END, 6) AS df_stat " +
        "FROM g ORDER BY key"),
      (s, dir) => Finance.dickeyFuller(allBars(s, dir), "key", "day",
        col("close"))
        .orderBy("key")),

    // ---- KPSS level-stationarity per ticker: the whole statistic is
    // ONE exact integer rational (partial sums via n*C_t - t*T), so
    // both engines divide the same two integers once.
    Q("q488_kpss",
      Some(barsCte + ", " +
        "tk AS (SELECT key, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(cl) AS HUGEINT) AS tt, " +
        "CAST(sum(CAST(cl AS HUGEINT) * cl) AS HUGEINT) AS s2 " +
        "FROM b GROUP BY 1), " +
        "c AS (SELECT b.key, sum(CAST(b.cl AS HUGEINT)) OVER " +
        "(PARTITION BY b.key ORDER BY b.day ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS cum, " +
        "CAST(row_number() OVER (PARTITION BY b.key ORDER BY b.day) " +
        "AS BIGINT) AS rn, tk.n, tk.tt, tk.s2 " +
        "FROM b JOIN tk ON b.key = tk.key), " +
        "d AS (SELECT key, any_value(n) AS n_days, any_value(tt) AS tt, " +
        "any_value(s2) AS s2, " +
        "sum((CAST(n AS HUGEINT) * cum - CAST(rn AS HUGEINT) * tt) * " +
        "(CAST(n AS HUGEINT) * cum - CAST(rn AS HUGEINT) * tt)) AS d1 " +
        "FROM c GROUP BY 1) " +
        "SELECT key, n_days, " +
        "round(CASE WHEN CAST(n_days AS HUGEINT) * n_days * " +
        "(CAST(n_days AS HUGEINT) * s2 - tt * tt) > 0 THEN " +
        "CAST(d1 AS DOUBLE) / CAST(CAST(n_days AS HUGEINT) * n_days * " +
        "(CAST(n_days AS HUGEINT) * s2 - tt * tt) AS DOUBLE) END, 6) " +
        "AS kpss_eta FROM d ORDER BY key"),
      (s, dir) => Finance.kpssLevel(allBars(s, dir), "key", "day",
        col("close"))
        .orderBy("key")),

    // ---- AR(1) persistence and half-life per ticker: same scaffold as
    // q487 with (y on y1); phi outside (0,1) nulls the half-life.
    Q("q489_ar1_half_life",
      Some(barsCte + ", " +
        "p AS (SELECT key, day, cl, lag(cl) OVER (PARTITION BY key " +
        "ORDER BY day) AS y1 FROM b), " +
        "f AS (SELECT key, cl, y1 FROM p WHERE y1 IS NOT NULL), " +
        "m AS (SELECT key, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CAST(y1 AS HUGEINT)) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(cl AS HUGEINT)) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(y1 AS HUGEINT) * y1) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(y1 AS HUGEINT) * cl) AS DOUBLE) AS sxy " +
        "FROM f GROUP BY 1), " +
        "c AS (SELECT key, n_pairs, " +
        "sxy - sx * sy / CAST(n_pairs AS DOUBLE) AS num, " +
        "sxx - sx * sx / CAST(n_pairs AS DOUBLE) AS den FROM m), " +
        "g AS (SELECT key, n_pairs, " +
        "CASE WHEN n_pairs >= 2 AND den > 0 THEN num / den END AS phi " +
        "FROM c) " +
        "SELECT key, n_pairs, round(phi, 6) AS phi, " +
        "round(CASE WHEN phi > 0 AND phi < 1 THEN " +
        "0.6931471805599453 / (-ln(phi)) END, 6) AS half_life " +
        "FROM g ORDER BY key"),
      (s, dir) => Finance.ar1HalfLife(allBars(s, dir), "key", "day",
        col("close"))
        .orderBy("key")),

    // ---- lag-1 Granger causality from ticker 3 to ticker 7 on the
    // joined both-trade spine: 2-regressor normal equations on exact
    // integer moments, F and delta-R2 (raw SSRs are cents^2-scale).
    Q("q490_granger",
      Some(barsCte + ", " +
        "aa AS (SELECT day, cl AS ca FROM b WHERE key = 3), " +
        "bb AS (SELECT day, cl AS cb FROM b WHERE key = 7), " +
        "j AS (SELECT aa.day, ca, cb FROM aa JOIN bb " +
        "ON aa.day = bb.day), " +
        "p AS (SELECT cb AS wv, lag(cb) OVER (ORDER BY day) AS z1, " +
        "lag(ca) OVER (ORDER BY day) AS z2 FROM j), " +
        "f AS (SELECT wv, z1, z2 FROM p WHERE z2 IS NOT NULL), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(CAST(wv AS HUGEINT)) AS DOUBLE) AS sw, " +
        "CAST(sum(CAST(z1 AS HUGEINT)) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(z2 AS HUGEINT)) AS DOUBLE) AS s2, " +
        "CAST(sum(CAST(z1 AS HUGEINT) * z1) AS DOUBLE) AS s11, " +
        "CAST(sum(CAST(z2 AS HUGEINT) * z2) AS DOUBLE) AS s22, " +
        "CAST(sum(CAST(z1 AS HUGEINT) * z2) AS DOUBLE) AS s12, " +
        "CAST(sum(CAST(z1 AS HUGEINT) * wv) AS DOUBLE) AS s1w, " +
        "CAST(sum(CAST(z2 AS HUGEINT) * wv) AS DOUBLE) AS s2w, " +
        "CAST(sum(CAST(wv AS HUGEINT) * wv) AS DOUBLE) AS sww FROM f), " +
        "c AS (SELECT n_days, CAST(n_days AS DOUBLE) AS nd, " +
        "s11 - s1 * s1 / CAST(n_days AS DOUBLE) AS c11, " +
        "s22 - s2 * s2 / CAST(n_days AS DOUBLE) AS c22, " +
        "s12 - s1 * s2 / CAST(n_days AS DOUBLE) AS c12, " +
        "s1w - s1 * sw / CAST(n_days AS DOUBLE) AS c1w, " +
        "s2w - s2 * sw / CAST(n_days AS DOUBLE) AS c2w, " +
        "sww - sw * sw / CAST(n_days AS DOUBLE) AS cww FROM m), " +
        "g AS (SELECT n_days, nd, c11, c1w, c2w, cww, " +
        "CASE WHEN n_days >= 4 AND c11 * c22 - c12 * c12 > 0 AND " +
        "c11 > 0 AND cww > 0 THEN (c1w * c22 - c2w * c12) / " +
        "(c11 * c22 - c12 * c12) END AS bb2, " +
        "CASE WHEN n_days >= 4 AND c11 * c22 - c12 * c12 > 0 AND " +
        "c11 > 0 AND cww > 0 THEN (c2w * c11 - c1w * c12) / " +
        "(c11 * c22 - c12 * c12) END AS cc2 FROM c), " +
        "h AS (SELECT n_days, nd, cww, " +
        "cww - bb2 * c1w - cc2 * c2w AS ssru, " +
        "cww - CASE WHEN n_days >= 4 AND c11 > 0 AND cww > 0 AND " +
        "bb2 IS NOT NULL THEN c1w * c1w / c11 END AS ssrr FROM g) " +
        "SELECT n_days, round(CASE WHEN ssru > 0 THEN " +
        "(ssrr - ssru) / (ssru / (nd - 3.0)) END, 6) AS f_stat, " +
        "round(CASE WHEN ssru IS NOT NULL THEN " +
        "(ssrr - ssru) / cww END, 6) AS delta_r2 FROM h"),
      (s, dir) => Finance.grangerPair(allBars(s, dir), "key", "day",
        col("close"), "3", "7")),

    // ---- Hill diversity ladder per language: richness, e^H, the exact
    // integer rational N^2/sum(c^2), and Pielou evenness.
    Q("q491_hill_numbers",
      Some(tokCte +
        "g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, " +
        "CAST(count(*) AS BIGINT) AS richness, " +
        "CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2 " +
        "FROM tc GROUP BY 1), " +
        "h AS (SELECT tc.lang AS lang, any_value(g.n_tokens) AS n_tokens, " +
        "any_value(g.richness) AS richness, any_value(g.s2) AS s2, " +
        "CAST(sum(CAST(-(CAST(tc.c AS DOUBLE) / " +
        "CAST(g.n_tokens AS DOUBLE)) * ln(CAST(tc.c AS DOUBLE) / " +
        "CAST(g.n_tokens AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) " +
        "AS hh FROM tc JOIN g ON tc.lang = g.lang GROUP BY 1) " +
        "SELECT lang, n_tokens, richness, round(exp(hh), 6) AS hill1, " +
        "round(CASE WHEN s2 > 0 THEN " +
        "CAST(CAST(n_tokens AS HUGEINT) * n_tokens AS DOUBLE) / " +
        "CAST(s2 AS DOUBLE) END, 6) AS hill2, " +
        "round(CASE WHEN richness >= 2 THEN " +
        "hh / ln(CAST(richness AS DOUBLE)) END, 6) AS pielou_j " +
        "FROM h ORDER BY lang"),
      (s, dir) => TA.hillNumbers(Tables.documents(s, dir), Seq("lang"),
        "text").orderBy("lang")),

    // ---- Berger-Parker dominance per language: max-count filter then
    // MIN(token) tie-break -- an exact election, one integer rational.
    Q("q492_berger_parker",
      Some(tokCte +
        "g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, " +
        "CAST(max(c) AS BIGINT) AS top_n FROM tc GROUP BY 1), " +
        "tp AS (SELECT tc.lang AS lang, min(tc.t) AS top_token FROM tc " +
        "JOIN g ON tc.lang = g.lang AND tc.c = g.top_n GROUP BY 1) " +
        "SELECT g.lang AS lang, n_tokens, top_token, top_n, " +
        "round(CAST(top_n AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) " +
        "AS berger_parker FROM g JOIN tp ON g.lang = tp.lang " +
        "ORDER BY lang"),
      (s, dir) => TA.bergerParker(Tables.documents(s, dir), Seq("lang"),
        "text").orderBy("lang")),

    // ---- Good-Turing r* ladder per language (r = 1..4): the
    // frequency-of-frequency smoothing the unseen-mass estimate (q364)
    // is the r = 0 endpoint of.
    Q("q493_good_turing",
      Some(tokCte +
        "o AS (SELECT lang, " +
        "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1, " +
        "CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2, " +
        "CAST(sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS f3, " +
        "CAST(sum(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS BIGINT) AS f4, " +
        "CAST(sum(CASE WHEN c = 5 THEN 1 ELSE 0 END) AS BIGINT) AS f5 " +
        "FROM tc GROUP BY 1), " +
        "u AS (SELECT lang, CAST(x.r AS BIGINT) AS r, " +
        "CASE x.r WHEN 1 THEN f1 WHEN 2 THEN f2 WHEN 3 THEN f3 " +
        "ELSE f4 END AS f_r, " +
        "CASE x.r WHEN 1 THEN f2 WHEN 2 THEN f3 WHEN 3 THEN f4 " +
        "ELSE f5 END AS f_r_plus_1 " +
        "FROM o CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS r) x) " +
        "SELECT lang, r, f_r, f_r_plus_1, " +
        "round(CASE WHEN f_r > 0 THEN " +
        "CAST((r + 1) * f_r_plus_1 AS DOUBLE) / CAST(f_r AS DOUBLE) " +
        "END, 6) AS r_star FROM u ORDER BY lang, r"),
      (s, dir) => TA.goodTuringSmooth(Tables.documents(s, dir), "lang",
        "text", maxR = 4).orderBy("lang", "r")),

    // ---- top-k vocabulary coverage per language at k = 10/100/1000:
    // the tokenizer-vocab-size curve; Spark takes the top max(k) via the
    // broadcast-cutoff prune, never a full-vocabulary window.
    Q("q494_token_coverage",
      Some(tokCte +
        "g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens FROM tc " +
        "GROUP BY 1), " +
        "r AS (SELECT lang, c, row_number() OVER (PARTITION BY lang " +
        "ORDER BY c DESC, t ASC) AS rn FROM tc), " +
        "o AS (SELECT lang, " +
        "CAST(sum(CASE WHEN rn <= 10 THEN c ELSE 0 END) AS BIGINT) " +
        "AS c10, " +
        "CAST(sum(CASE WHEN rn <= 100 THEN c ELSE 0 END) AS BIGINT) " +
        "AS c100, " +
        "CAST(sum(CASE WHEN rn <= 1000 THEN c ELSE 0 END) AS BIGINT) " +
        "AS c1000 FROM r GROUP BY 1), " +
        "u AS (SELECT lang, CAST(x.k AS INTEGER) AS k, " +
        "CASE x.k WHEN 10 THEN c10 WHEN 100 THEN c100 ELSE c1000 END " +
        "AS covered FROM o CROSS JOIN " +
        "(SELECT unnest([10, 100, 1000]) AS k) x) " +
        "SELECT u.lang AS lang, k, covered, n_tokens, " +
        "round(CAST(covered AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) " +
        "AS coverage FROM u JOIN g ON u.lang = g.lang ORDER BY lang, k"),
      (s, dir) => TA.tokenCoverage(Tables.documents(s, dir), "lang",
        "text", ks = Seq(10, 100, 1000)).orderBy("lang", "k"))
  ) ++ Seq(

    // ---- common-neighbor link-prediction panel on the co-purchase
    // graph: Jaccard (exact integer rational on full degrees) +
    // resource-allocation, q336's wedge contract, top-20 by RA.
    Q("q495_link_prediction",
      Some("WITH " + AppliedQueries.copurchaseEdgesSql + ", " +
        "deg AS (SELECT node, count(*) AS deg FROM (SELECT a AS node " +
        "FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1), " +
        "adj AS (SELECT a AS z, b AS x FROM e0 " +
        "UNION ALL SELECT b, a FROM e0), " +
        "az AS (SELECT adj.z, adj.x, deg FROM adj JOIN deg " +
        "ON adj.z = deg.node WHERE deg >= 2 AND deg <= 1000), " +
        "p AS (SELECT l.x AS a, r.x AS b, l.deg FROM az l JOIN az r " +
        "ON l.z = r.z AND l.x < r.x), " +
        "sc AS (SELECT a, b, CAST(count(*) AS BIGINT) " +
        "AS common_neighbors, " +
        "CAST(sum(CAST(1.0 / CAST(deg AS DOUBLE) AS DECIMAL(28,12))) " +
        "AS DOUBLE) AS ra FROM p GROUP BY 1, 2), " +
        "f AS (SELECT sc.* FROM sc WHERE NOT EXISTS (SELECT 1 FROM e0 " +
        "WHERE e0.a = sc.a AND e0.b = sc.b)), " +
        "j AS (SELECT f.a, f.b, f.common_neighbors, f.ra, " +
        "da.deg AS dda, db.deg AS ddb FROM f " +
        "JOIN deg da ON f.a = da.node JOIN deg db ON f.b = db.node) " +
        "SELECT a, b, common_neighbors, " +
        "round(CAST(common_neighbors AS DOUBLE) / " +
        "CAST(dda + ddb - common_neighbors AS DOUBLE), 6) AS jaccard, " +
        "round(ra, 6) AS ra_score FROM j " +
        "ORDER BY ra_score DESC, a, b LIMIT 20"),
      (s, dir) => Graph.linkPredictionPanel(
          AppliedQueries.copurchaseEdges(s, dir), "src", "dst",
          maxDegree = 1000)
        .orderBy(col("ra_score").desc, col("a").asc, col("b").asc)
        .limit(20)),

    // ---- reciprocity of the event-type transition digraph: binary and
    // Squartini min-flow rates, integer weights to the two divisions.
    Q("q496_reciprocity",
      Some("WITH e AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(ts) AS us FROM events), " +
        "t AS (SELECT user_id, event_type, lag(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e), " +
        "g AS (SELECT prev AS u, event_type AS v, " +
        "CAST(count(*) AS BIGINT) AS w FROM t WHERE prev IS NOT NULL " +
        "AND prev <> event_type GROUP BY 1, 2), " +
        "j AS (SELECT g.u, g.v, g.w, r.w AS wr FROM g " +
        "LEFT JOIN g r ON g.u = r.v AND g.v = r.u) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_edges, " +
        "CAST(sum(CASE WHEN wr IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_recip, " +
        "CAST(sum(w) AS BIGINT) AS w_total, " +
        "CAST(sum(least(w, coalesce(wr, 0))) AS BIGINT) AS w_recip, " +
        "round(CASE WHEN count(*) > 0 THEN " +
        "CAST(sum(CASE WHEN wr IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / CAST(count(*) AS DOUBLE) END, 6) AS reciprocity, " +
        "round(CASE WHEN sum(w) > 0 THEN " +
        "CAST(sum(least(w, coalesce(wr, 0))) AS DOUBLE) / " +
        "CAST(sum(w) AS DOUBLE) END, 6) AS w_reciprocity FROM j"),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("__us"), col("event_id"))
        val trans = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("__us"),
            col("event_id"), col("event_type"))
          .withColumn("__prev", lag(col("event_type"), 1).over(w))
          .filter(col("__prev").isNotNull &&
            col("__prev") =!= col("event_type"))
          .groupBy(col("__prev").as("src"), col("event_type").as("dst"))
          .agg(count(lit(1)).as("w"))
        Graph.weightedReciprocity(trans, "src", "dst", col("w"))
      }),

    // ---- brand mixing of the co-purchase graph: Newman categorical
    // assortativity as ONE exact integer rational on stub counts.
    Q("q497_attr_mixing",
      Some("WITH " + AppliedQueries.copurchaseEdgesSql + ", " +
        "s AS (SELECT e0.a, e0.b, pa.p_brand AS ba, pb.p_brand AS bb " +
        "FROM e0 JOIN part pa ON e0.a = pa.p_partkey " +
        "JOIN part pb ON e0.b = pb.p_partkey), " +
        "st AS (SELECT ba AS ai, bb AS aj FROM s " +
        "UNION ALL SELECT bb, ba FROM s), " +
        "pa2 AS (SELECT ai, CAST(count(*) AS BIGINT) AS c FROM st " +
        "GROUP BY 1), " +
        "c2 AS (SELECT CAST(sum(c) AS BIGINT) AS n_stubs, " +
        "CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS cc FROM pa2), " +
        "d AS (SELECT CAST(sum(CASE WHEN ai = aj THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS diag_stubs FROM st) " +
        "SELECT n_stubs // 2 AS n_edges, n_stubs, diag_stubs, " +
        "round(CASE WHEN CAST(n_stubs AS HUGEINT) * n_stubs <> cc THEN " +
        "CAST(CAST(diag_stubs AS HUGEINT) * n_stubs - cc AS DOUBLE) / " +
        "CAST(CAST(n_stubs AS HUGEINT) * n_stubs - cc AS DOUBLE) " +
        "END, 6) AS assort_r FROM c2, d"),
      (s, dir) => Graph.attributeMixing(
        AppliedQueries.copurchaseEdges(s, dir), "src", "dst",
        Tables.part(s, dir).select(col("p_partkey"), col("p_brand")),
        "p_partkey", "p_brand")),

    // ---- Gehan-weighted log-rank over the q362 censored lifetimes:
    // w_t = n_t risk-set weights, early differences dominate; Z and chi2
    // from decimal-summed fixed-shape terms.
    Q("q498_gehan",
      Some("WITH u AS (SELECT user_id, " +
        "min(epoch_us(ts) // 86400000000) AS f, " +
        "max(epoch_us(ts) // 86400000000) AS l FROM events GROUP BY 1), " +
        "mx AS (SELECT max(l) AS mx FROM u), " +
        "d AS (SELECT l - f AS duration, l < mx - 7 AS ev, " +
        "user_id % 2 = 0 AS a FROM u, mx), " +
        "pt AS (SELECT duration, " +
        "CAST(sum(CASE WHEN a AND ev THEN 1 ELSE 0 END) AS BIGINT) AS da, " +
        "CAST(sum(CASE WHEN NOT a AND ev THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS db, " +
        "CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ta, " +
        "CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS tb " +
        "FROM d GROUP BY 1), " +
        "tt AS (SELECT CAST(sum(ta) AS BIGINT) AS na0, " +
        "CAST(sum(tb) AS BIGINT) AS nb0 FROM pt), " +
        "r AS (SELECT *, na0 - coalesce(CAST(sum(ta) OVER wp AS BIGINT), " +
        "0) AS na, nb0 - coalesce(CAST(sum(tb) OVER wp AS BIGINT), 0) " +
        "AS nb FROM pt, tt WINDOW wp AS (ORDER BY duration ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
        "k AS (SELECT na0, nb0, da, db, na, nb, na + nb AS nt, " +
        "da + db AS dt FROM r), " +
        // weights normalized by the total risk set N (w = nt/N) — the
        // Spark shape mirrored term for term, so the Gehan variance can
        // never overflow DECIMAL(28,12)'s integer digits at scale
        "terms AS (SELECT na0, nb0, da, db, " +
        "CAST(CAST(nt AS DOUBLE) / CAST(na0 + nb0 AS DOUBLE) * " +
        "(CAST(da AS DOUBLE) - " +
        "CAST(dt AS DOUBLE) * CAST(na AS DOUBLE) / CAST(nt AS DOUBLE)) " +
        "AS DECIMAL(28,12)) AS numt, " +
        "CAST(CAST(nt AS DOUBLE) / CAST(na0 + nb0 AS DOUBLE) * " +
        "(CAST(nt AS DOUBLE) / CAST(na0 + nb0 AS DOUBLE)) * " +
        "(CASE WHEN nt > 1 THEN CAST(dt AS DOUBLE) * " +
        "(CAST(na AS DOUBLE) / CAST(nt AS DOUBLE)) * " +
        "(CAST(nb AS DOUBLE) / CAST(nt AS DOUBLE)) * " +
        "(CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE)) " +
        "ELSE 0.0 END) AS DECIMAL(28,12)) AS vart FROM k), " +
        "agg AS (SELECT max(na0) AS n_a, max(nb0) AS n_b, " +
        "CAST(sum(da) AS BIGINT) AS o_a, CAST(sum(db) AS BIGINT) AS o_b, " +
        "sum(numt) AS num, sum(vart) AS v FROM terms) " +
        "SELECT n_a, n_b, o_a, o_b, " +
        "round(CASE WHEN CAST(v AS DOUBLE) > 0 THEN " +
        "CAST(num AS DOUBLE) / sqrt(CAST(v AS DOUBLE)) END, 6) " +
        "AS z_stat, " +
        "round(CASE WHEN CAST(v AS DOUBLE) > 0 THEN " +
        "CAST(num AS DOUBLE) * CAST(num AS DOUBLE) / CAST(v AS DOUBLE) " +
        "END, 6) AS chi2 FROM agg"),
      (s, dir) => {
        val u = Tables.events(s, dir)
          .select(col("user_id"),
            EventAnalytics.dayIndex(col("ts")).as("d"))
          .groupBy("user_id")
          .agg(min(col("d")).as("f"), max(col("d")).as("l"))
        val mx = u.agg(max(col("l")).as("mx"))
        EventAnalytics.weightedLogRank(u.crossJoin(broadcast(mx)),
          col("l") - col("f"), col("l") < col("mx") - 7,
          pmod(col("user_id"), lit(2L)) === 0, weighting = "gehan")
      }),

    // ---- simplified silhouette of the pseudo-centroid assignment:
    // row-local (d, cid) election, (b-a)/max(a,b) means.
    Q("q499_silhouette",
      Some(cqDisCte +
        "r AS (SELECT vec_id, d, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY d ASC, cid ASC) AS rn FROM dis), " +
        "p AS (SELECT vec_id, max(CASE WHEN rn = 1 THEN d END) AS a, " +
        "max(CASE WHEN rn = 2 THEN d END) AS b FROM r WHERE rn <= 2 " +
        "GROUP BY 1), " +
        "s AS (SELECT CASE WHEN greatest(a, b) > 0 THEN " +
        "(b - a) / greatest(a, b) ELSE 0.0 END AS sv FROM p) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_vectors, " +
        "CAST(16 AS INTEGER) AS n_clusters, " +
        "round(CAST(sum(CAST(sv AS DECIMAL(28,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS silhouette FROM s"),
      (s, dir) => Similarity.simplifiedSilhouette(
        Tables.embeddings(s, dir), cqCentroids)),

    // ---- Davies-Bouldin of the same assignment: per-cluster mean
    // distances + the bounded k^2 literal centroid-pair relation.
    Q("q500_davies_bouldin",
      Some(cqDisCte +
        "a1 AS (SELECT vec_id, cid, d, row_number() OVER (PARTITION BY " +
        "vec_id ORDER BY d ASC, cid ASC) AS rn FROM dis), " +
        "own AS (SELECT cid, d FROM a1 WHERE rn = 1), " +
        "pc AS (SELECT cid, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(d AS DECIMAL(28,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS s FROM own GROUP BY 1), " +
        "pm AS (SELECT i.cid AS ci, j.cid AS cj, 1.0 + " +
        "(-list_dot_product(i.cv, j.cv) / (i.cnorm * j.cnorm)) AS m " +
        "FROM c i CROSS JOIN c j WHERE i.cid <> j.cid), " +
        "rt AS (SELECT pm.ci, max(CASE WHEN pm.m > 0 THEN " +
        "(si.s + sj.s) / pm.m END) AS r FROM pm " +
        "JOIN pc si ON pm.ci = si.cid JOIN pc sj ON pm.cj = sj.cid " +
        "GROUP BY 1), " +
        "fin AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters_used, " +
        "CAST(sum(CAST(r AS DECIMAL(28,12))) AS DOUBLE) AS sr FROM rt), " +
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors " +
        "FROM embeddings) " +
        "SELECT n_vectors, n_clusters_used, " +
        "round(sr / CAST(n_clusters_used AS DOUBLE), 6) AS db_index " +
        "FROM fin, tot"),
      (s, dir) => Similarity.daviesBouldin(
        Tables.embeddings(s, dir), cqCentroids)),

    // ---- Xie-Beni: compactness per unit of worst-case separation
    // (spherical 2(1-cos) squared distances).
    Q("q501_xie_beni",
      Some(cqDisCte +
        "w AS (SELECT vec_id, 2.0 * min(d) AS wv FROM dis GROUP BY 1), " +
        "ws AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors, " +
        "sum(CAST(wv AS DECIMAL(28,12))) AS sw FROM w), " +
        "ms AS (SELECT min(2.0 * (1.0 + (-list_dot_product(i.cv, j.cv) " +
        "/ (i.cnorm * j.cnorm)))) AS msep FROM c i CROSS JOIN c j " +
        "WHERE i.cid <> j.cid) " +
        "SELECT n_vectors, round(msep, 6) AS min_separation, " +
        "round(CASE WHEN msep > 0 THEN CAST(sw AS DOUBLE) / " +
        "(CAST(n_vectors AS DOUBLE) * msep) END, 6) AS xie_beni " +
        "FROM ws, ms"),
      (s, dir) => Similarity.xieBeni(Tables.embeddings(s, dir),
        cqCentroids)),

    // ---- assignment balance: the IVF partition-skew gate (sizes, max
    // share, normalized entropy).
    Q("q502_cluster_balance",
      Some(cqDisCte +
        "a1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY " +
        "vec_id ORDER BY d ASC, cid ASC) AS rn FROM dis), " +
        "sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM a1 " +
        "WHERE rn = 1 GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_vectors FROM sizes), " +
        "fin AS (SELECT any_value(t.n_vectors) AS n_vectors, " +
        "CAST(count(*) AS BIGINT) AS n_clusters_used, " +
        "CAST(max(s.n) AS BIGINT) AS mx, " +
        "CAST(sum(CAST(-(CAST(s.n AS DOUBLE) / " +
        "CAST(t.n_vectors AS DOUBLE)) * ln(CAST(s.n AS DOUBLE) / " +
        "CAST(t.n_vectors AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) " +
        "AS h FROM sizes s, tot t) " +
        "SELECT n_vectors, n_clusters_used, " +
        "round(CAST(mx AS DOUBLE) / CAST(n_vectors AS DOUBLE), 6) " +
        "AS max_share, " +
        "round(CASE WHEN n_clusters_used >= 2 THEN " +
        "h / ln(CAST(n_clusters_used AS DOUBLE)) END, 6) " +
        "AS balance_entropy FROM fin"),
      (s, dir) => Similarity.clusterBalance(Tables.embeddings(s, dir),
        cqCentroids))
  ) ++ {
    // shared spatial-autocorrelation scaffolding: the q305 hash grid,
    // occupied 100x100-cell counts, and the DIRECTED rook-pair relation
    // (Spark builds it as four shifted equi-joins; the |dx|+|dy| = 1
    // theta join below is the same SET)
    val gridCte =
      "WITH p AS (SELECT c_custkey % 1000 AS x, " +
        "(c_custkey * 7919) % 1000 AS y FROM customer), " +
        "g AS (SELECT x // 100 AS cell_x, y // 100 AS cell_y, " +
        "CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS nc, " +
        "CAST(sum(n) AS HUGEINT) AS s FROM g), " +
        "e AS (SELECT i.n AS ni, j.n AS nj FROM g i JOIN g j ON " +
        "abs(i.cell_x - j.cell_x) + abs(i.cell_y - j.cell_y) = 1), "
    def grid(s: org.apache.spark.sql.SparkSession, dir: String) =
      Tables.customer(s, dir)
    val gx = pmod(col("c_custkey"), lit(1000L))
    val gy = pmod(col("c_custkey") * 7919L, lit(1000L))

    Seq(
      // ---- Moran's I on the occupied-cell lattice: ONE exact integer
      // rational via N-scaled deviations.
      Q("q503_morans_i",
        Some(gridCte +
          "d AS (SELECT any_value(t.nc) AS n_cells, " +
          "CAST(sum((CAST(t.nc AS HUGEINT) * g.n - t.s) * " +
          "(CAST(t.nc AS HUGEINT) * g.n - t.s)) AS HUGEINT) AS den " +
          "FROM g, t), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS w_pairs, " +
          "CAST(sum((CAST(t.nc AS HUGEINT) * e.ni - t.s) * " +
          "(CAST(t.nc AS HUGEINT) * e.nj - t.s)) AS HUGEINT) AS num " +
          "FROM e, t) " +
          "SELECT n_cells, w_pairs, " +
          "round(CASE WHEN den > 0 AND w_pairs > 0 THEN " +
          "CAST(CAST(n_cells AS HUGEINT) * num AS DOUBLE) / " +
          "CAST(CAST(w_pairs AS HUGEINT) * den AS DOUBLE) END, 6) " +
          "AS morans_i, " +
          "round(CASE WHEN n_cells > 1 THEN " +
          "-1.0 / CAST(n_cells - 1 AS DOUBLE) END, 6) AS expected_i " +
          "FROM d, m"),
        (s, dir) => Spatial.moransI(grid(s, dir), gx, gy, cellSize = 100L)),

      // ---- Geary's C: the local-gradient mirror, same exact-rational
      // discipline.
      Q("q504_gearys_c",
        Some(gridCte +
          "d AS (SELECT any_value(t.nc) AS n_cells, " +
          "CAST(sum((CAST(t.nc AS HUGEINT) * g.n - t.s) * " +
          "(CAST(t.nc AS HUGEINT) * g.n - t.s)) AS HUGEINT) AS den " +
          "FROM g, t), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS w_pairs, " +
          "CAST(sum(CAST((ni - nj) * (ni - nj) AS HUGEINT)) AS HUGEINT) " +
          "AS num2 FROM e) " +
          "SELECT n_cells, w_pairs, " +
          "round(CASE WHEN den > 0 AND w_pairs > 0 THEN " +
          "CAST(CAST(n_cells - 1 AS HUGEINT) * n_cells * n_cells * num2 " +
          "AS DOUBLE) / CAST(2 * CAST(w_pairs AS HUGEINT) * den " +
          "AS DOUBLE) END, 6) AS gearys_c FROM d, m"),
        (s, dir) => Spatial.gearysC(grid(s, dir), gx, gy, cellSize = 100L)),

      // ---- binary join counts (Black = above-mean cell, an exact
      // integer compare) with the nonfree-sampling E[BW].
      Q("q505_join_counts",
        Some(gridCte +
          "mk AS (SELECT any_value(t.nc) AS n_cells, " +
          "CAST(sum(CASE WHEN CAST(t.nc AS HUGEINT) * g.n > t.s " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS n_black FROM g, t), " +
          "jn AS (SELECT CAST(count(*) AS BIGINT) AS wd, " +
          "CAST(sum(CASE WHEN CAST(t.nc AS HUGEINT) * e.ni > t.s AND " +
          "CAST(t.nc AS HUGEINT) * e.nj > t.s THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS bb, " +
          "CAST(sum(CASE WHEN NOT (CAST(t.nc AS HUGEINT) * e.ni > t.s) " +
          "AND NOT (CAST(t.nc AS HUGEINT) * e.nj > t.s) THEN 1 ELSE 0 " +
          "END) AS BIGINT) AS ww FROM e, t) " +
          "SELECT n_cells, n_black, bb // 2 AS joins_bb, " +
          "ww // 2 AS joins_ww, (wd - bb - ww) // 2 AS joins_bw, " +
          "round(CASE WHEN n_cells > 1 THEN " +
          "(CAST(wd // 2 AS DOUBLE) * 2.0 * CAST(n_black AS DOUBLE) * " +
          "CAST(n_cells - n_black AS DOUBLE)) / " +
          "(CAST(n_cells AS DOUBLE) * CAST(n_cells - 1 AS DOUBLE)) " +
          "END, 6) AS expected_bw FROM mk, jn"),
        (s, dir) => Spatial.joinCountStats(grid(s, dir), gx, gy,
          cellSize = 100L)),

      // ---- Getis-Ord General G: high-with-high clustering as one
      // integer rational over directed rook products.
      Q("q506_general_g",
        Some(gridCte +
          "t2 AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, " +
          "CAST(sum(CAST(n AS HUGEINT)) AS HUGEINT) AS s, " +
          "CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2 FROM g), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS w_pairs, " +
          "CAST(sum(CAST(ni AS HUGEINT) * nj) AS HUGEINT) AS num " +
          "FROM e) " +
          "SELECT n_cells, w_pairs, " +
          "round(CASE WHEN s * s - s2 > 0 THEN CAST(num AS DOUBLE) / " +
          "CAST(s * s - s2 AS DOUBLE) END, 6) AS general_g, " +
          "round(CASE WHEN n_cells > 1 THEN CAST(w_pairs AS DOUBLE) / " +
          "(CAST(n_cells AS DOUBLE) * CAST(n_cells - 1 AS DOUBLE)) " +
          "END, 6) AS expected_g FROM t2, m"),
        (s, dir) => Spatial.generalG(grid(s, dir), gx, gy,
          cellSize = 100L))
    )
  } ++ {
    // shared rank-scale oracle scaffolding: value cells with group
    // counts, doubled midranks 2R = 2F - t + 1, broadcast totals, and
    // the permutation-moment z finish (exact under ties)
    def rankCte(table: String, groupExpr: String, valueExpr: String,
                a: String, b: String): String =
      s"WITH base AS (SELECT CAST($groupExpr AS VARCHAR) AS g, " +
        s"CAST($valueExpr AS DOUBLE) AS v FROM $table " +
        s"WHERE $groupExpr IN ('$a', '$b') AND $valueExpr IS NOT NULL), " +
        "cells AS (SELECT v, CAST(sum(CASE WHEN g = '" + a +
        "' THEN 1 ELSE 0 END) AS BIGINT) AS ca, " +
        "CAST(sum(CASE WHEN g = '" + b +
        "' THEN 1 ELSE 0 END) AS BIGINT) AS cb FROM base GROUP BY 1), " +
        "t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, " +
        "CAST(sum(cb) AS BIGINT) AS nb FROM cells), " +
        "r AS (SELECT ca, cb, CAST(sum(ca + cb) OVER (ORDER BY v ROWS " +
        "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) * 2 - " +
        "(ca + cb) + 1 AS r2, t.na, t.nb FROM cells, t), "
    val zFinish =
      "f AS (SELECT n_a, n_b, CAST(n_a AS DOUBLE) AS nad, " +
        "CAST(n_b AS DOUBLE) AS nbd, " +
        "CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nd, " +
        "CAST(tt AS DOUBLE) AS td, CAST(ss AS DOUBLE) AS sd, " +
        "CAST(ss2 AS DOUBLE) AS s2d FROM m), " +
        "g AS (SELECT *, nad * nbd / (nd * (nd - 1.0)) * " +
        "(s2d - sd * sd / nd) AS vart FROM f) "
    Seq(
      // ---- Ansari-Bradley scale test between the two top order
      // priorities on total price: doubled tent scores stay integer.
      Q("q507_ansari_bradley",
        Some(rankCte("orders", "o_orderpriority", "o_totalprice",
            "1-URGENT", "2-HIGH") +
          "sc AS (SELECT ca, cb, na, nb, " +
          "least(r2, (na + nb + 1) * 2 - r2) AS s FROM r), " +
          "m AS (SELECT any_value(na) AS n_a, any_value(nb) AS n_b, " +
          "CAST(sum(CAST(ca AS HUGEINT) * s) AS HUGEINT) AS tt, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * s) AS HUGEINT) AS ss, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * s * s) AS HUGEINT) " +
          "AS ss2 FROM sc), " + zFinish +
          "SELECT n_a, n_b, round(td / 2.0, 6) AS t_stat, " +
          "round(CASE WHEN n_a > 0 AND n_b > 0 AND vart > 0 THEN " +
          "(td - nad * sd / nd) / sqrt(vart) END, 6) AS z FROM g"),
        (s, dir) => Stats.ansariBradley(Tables.orders(s, dir),
          col("o_orderpriority"), col("o_totalprice"),
          "1-URGENT", "2-HIGH")),

      // ---- Mood scale test on quantities, returned vs. un-returned
      // lines: quadrupled centered-square scores, massive-tie exercise.
      Q("q508_mood_scale",
        Some(rankCte("lineitem", "l_returnflag", "l_quantity", "R", "N") +
          "sc AS (SELECT ca, cb, na, nb, " +
          "(r2 - (na + nb + 1)) * (r2 - (na + nb + 1)) AS s FROM r), " +
          "m AS (SELECT any_value(na) AS n_a, any_value(nb) AS n_b, " +
          "CAST(sum(CAST(ca AS HUGEINT) * s) AS HUGEINT) AS tt, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * s) AS HUGEINT) AS ss, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * s * s) AS HUGEINT) " +
          "AS ss2 FROM sc), " + zFinish +
          "SELECT n_a, n_b, round(td / 4.0, 6) AS t_stat, " +
          "round(CASE WHEN n_a > 0 AND n_b > 0 AND vart > 0 THEN " +
          "(td - nad * sd / nd) / sqrt(vart) END, 6) AS z FROM g"),
        (s, dir) => Stats.moodScaleTest(Tables.lineitem(s, dir),
          col("l_returnflag"), col("l_quantity"), "R", "N")),

      // ---- Lepage omnibus (Wilcoxon + Ansari-Bradley) on extended
      // price, returned vs accepted: both z's off the SAME cells. The
      // value is bucketed to exact decadollar cells (integer cents div
      // 1000 — floor division, engine-identical) BEFORE ranking: raw 2dp
      // prices are ~392k distinct cells at sf0.1, which the round-13
      // gateValueCells cardinality gate rightly refuses — this driver
      // demonstrates the documented remedy (bound the value grain).
      Q("q509_lepage",
        Some(rankCte("lineitem", "l_returnflag",
            "CAST(round(l_extendedprice * 100) AS BIGINT) // 1000",
            "R", "A") +
          "sc AS (SELECT ca, cb, na, nb, r2 AS sw, " +
          "least(r2, (na + nb + 1) * 2 - r2) AS sa FROM r), " +
          "m AS (SELECT any_value(na) AS n_a, any_value(nb) AS n_b, " +
          "CAST(sum(CAST(ca AS HUGEINT) * sw) AS HUGEINT) AS tw, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * sw) AS HUGEINT) AS sws, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * sw * sw) AS HUGEINT) " +
          "AS sws2, " +
          "CAST(sum(CAST(ca AS HUGEINT) * sa) AS HUGEINT) AS ta, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * sa) AS HUGEINT) AS sas, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * sa * sa) AS HUGEINT) " +
          "AS sas2 FROM sc), " +
          "f AS (SELECT n_a, n_b, CAST(n_a AS DOUBLE) AS nad, " +
          "CAST(n_b AS DOUBLE) AS nbd, " +
          "CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nd, " +
          "CAST(tw AS DOUBLE) AS twd, CAST(sws AS DOUBLE) AS swsd, " +
          "CAST(sws2 AS DOUBLE) AS sws2d, CAST(ta AS DOUBLE) AS tad, " +
          "CAST(sas AS DOUBLE) AS sasd, CAST(sas2 AS DOUBLE) AS sas2d " +
          "FROM m), " +
          "g AS (SELECT *, nad * nbd / (nd * (nd - 1.0)) * " +
          "(sws2d - swsd * swsd / nd) AS varw, " +
          "nad * nbd / (nd * (nd - 1.0)) * " +
          "(sas2d - sasd * sasd / nd) AS vara FROM f), " +
          "h AS (SELECT n_a, n_b, " +
          "CASE WHEN n_a > 0 AND n_b > 0 AND varw > 0 THEN " +
          "(twd - nad * swsd / nd) / sqrt(varw) END AS zw, " +
          "CASE WHEN n_a > 0 AND n_b > 0 AND vara > 0 THEN " +
          "(tad - nad * sasd / nd) / sqrt(vara) END AS zab FROM g) " +
          "SELECT n_a, n_b, round(zw, 6) AS z_w, round(zab, 6) AS z_ab, " +
          "round(zw * zw + zab * zab, 6) AS lepage FROM h"),
        (s, dir) => Stats.lepageTest(Tables.lineitem(s, dir),
          col("l_returnflag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 1000"),
          "R", "A")),

      // ---- Cucconi location-scale quadratic on total price, fulfilled
      // vs open orders: squared ranks AND antiranks with their exact
      // permutation correlation.
      Q("q510_cucconi",
        Some(rankCte("orders", "o_orderstatus", "o_totalprice",
            "F", "O") +
          "sc AS (SELECT ca, cb, na, nb, r2 * r2 AS f4, " +
          "((na + nb + 1) * 2 - r2) * ((na + nb + 1) * 2 - r2) AS g4 " +
          "FROM r), " +
          "m AS (SELECT any_value(na) AS n_a, any_value(nb) AS n_b, " +
          "CAST(sum(CAST(ca AS HUGEINT) * f4) AS HUGEINT) AS tf, " +
          "CAST(sum(CAST(ca AS HUGEINT) * g4) AS HUGEINT) AS tg, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * f4) AS HUGEINT) AS sf, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * g4) AS HUGEINT) AS sg, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * f4 * f4) AS HUGEINT) " +
          "AS sf2, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * g4 * g4) AS HUGEINT) " +
          "AS sg2, " +
          "CAST(sum(CAST(ca + cb AS HUGEINT) * f4 * g4) AS HUGEINT) " +
          "AS sfg FROM sc), " +
          "f AS (SELECT n_a, n_b, CAST(n_a AS DOUBLE) AS nad, " +
          "CAST(n_b AS DOUBLE) AS nbd, " +
          "CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nd, " +
          "CAST(tf AS DOUBLE) AS tfd, CAST(tg AS DOUBLE) AS tgd, " +
          "CAST(sf AS DOUBLE) AS sfd, CAST(sg AS DOUBLE) AS sgd, " +
          "CAST(sf2 AS DOUBLE) AS sf2d, CAST(sg2 AS DOUBLE) AS sg2d, " +
          "CAST(sfg AS DOUBLE) AS sfgd FROM m), " +
          "g AS (SELECT *, nad * nbd / (nd * (nd - 1.0)) * " +
          "(sf2d - sfd * sfd / nd) AS varf, " +
          "nad * nbd / (nd * (nd - 1.0)) * " +
          "(sg2d - sgd * sgd / nd) AS varg, " +
          "nad * nbd / (nd * (nd - 1.0)) * " +
          "(sfgd - sfd * sgd / nd) AS covfg FROM f), " +
          "h AS (SELECT n_a, n_b, " +
          "CASE WHEN n_a > 0 AND n_b > 0 AND varf > 0 AND varg > 0 " +
          "THEN (tfd - nad * sfd / nd) / sqrt(varf) END AS us, " +
          "CASE WHEN n_a > 0 AND n_b > 0 AND varf > 0 AND varg > 0 " +
          "THEN (tgd - nad * sgd / nd) / sqrt(varg) END AS vs, " +
          "CASE WHEN n_a > 0 AND n_b > 0 AND varf > 0 AND varg > 0 " +
          "THEN covfg / sqrt(varf * varg) END AS rho FROM g) " +
          "SELECT n_a, n_b, round(us, 6) AS u_std, round(vs, 6) " +
          "AS v_std, round(rho, 6) AS rho, " +
          "round(CASE WHEN 1.0 - rho * rho > 0 THEN " +
          "(us * us + vs * vs - 2.0 * rho * us * vs) / " +
          "(2.0 * (1.0 - rho * rho)) END, 6) AS cucconi FROM h"),
        (s, dir) => Stats.cucconiTest(Tables.orders(s, dir),
          col("o_orderstatus"), col("o_totalprice"), "F", "O"))
    )
  } ++ {
    // shared daily zero-filled spine CTE (the q435 scaffold) and the
    // q363 Chebyshev p-value battery (Spark + SQL) for the FDR queries
    val spineCte =
      "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "s AS (SELECT r.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n " +
        "FROM r LEFT JOIN c USING (day)), " +
        "d0 AS (SELECT min(day) AS d0 FROM s), " +
        "t AS (SELECT day - d0 AS t, n FROM s, d0), "
    val pBatteryCte =
      "WITH g AS (SELECT event_type, " +
        "CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN NOT (user_id % 2 = 0) THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_b, " +
        "CAST(sum(CASE WHEN user_id % 2 = 0 THEN " +
        "CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS sa, " +
        "CAST(sum(CASE WHEN user_id % 2 = 0 THEN " +
        "CAST(value * value AS DECIMAL(38,6)) END) AS DOUBLE) AS pa, " +
        "CAST(sum(CASE WHEN NOT (user_id % 2 = 0) THEN " +
        "CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS sb, " +
        "CAST(sum(CASE WHEN NOT (user_id % 2 = 0) THEN " +
        "CAST(value * value AS DECIMAL(38,6)) END) AS DOUBLE) AS pb " +
        "FROM events WHERE value IS NOT NULL GROUP BY 1), " +
        "m AS (SELECT event_type, CAST(n_a AS DOUBLE) AS na, " +
        "CAST(n_b AS DOUBLE) AS nb, sa, sb, pa, pb FROM g " +
        "WHERE n_a > 1 AND n_b > 1), " +
        "v AS (SELECT event_type, sa / na AS ma, sb / nb AS mb, " +
        "((na * pa - sa * sa) / (na * (na - 1.0))) / na AS s2a, " +
        "((nb * pb - sb * sb) / (nb * (nb - 1.0))) / nb AS s2b FROM m), " +
        "tst AS (SELECT event_type, round(power((ma - mb) / " +
        "sqrt(s2a + s2b), 2), 6) AS t2 FROM v), " +
        "p AS (SELECT event_type, round(least(1.0, CASE WHEN t2 > 0 " +
        "THEN 1.0 / t2 ELSE 1.0 END), 6) AS p FROM tst), "
    def pBattery(s: org.apache.spark.sql.SparkSession, dir: String) = {
      import org.apache.spark.sql.types.DecimalType
      val a = pmod(col("user_id"), lit(2L)) === 0
      val g = Tables.events(s, dir).filter(col("value").isNotNull)
        .groupBy("event_type")
        .agg(sum(when(a, 1L).otherwise(0L)).as("n_a"),
          sum(when(!a, 1L).otherwise(0L)).as("n_b"),
          sum(when(a, col("value").cast(DecimalType(38, 6)))).as("__sa"),
          sum(when(a, (col("value") * col("value"))
            .cast(DecimalType(38, 6)))).as("__pa"),
          sum(when(!a, col("value").cast(DecimalType(38, 6)))).as("__sb"),
          sum(when(!a, (col("value") * col("value"))
            .cast(DecimalType(38, 6)))).as("__pb"))
        .filter(col("n_a") > 1 && col("n_b") > 1)
      val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
      val sa = col("__sa").cast("double"); val sb = col("__sb").cast("double")
      val pa = col("__pa").cast("double"); val pb = col("__pb").cast("double")
      val s2a = ((na * pa - sa * sa) / (na * (na - 1.0))) / na
      val s2b = ((nb * pb - sb * sb) / (nb * (nb - 1.0))) / nb
      val t2 = round(pow((sa / na - sb / nb) / sqrt(s2a + s2b), 2), 6)
      g.withColumn("__t2", t2)
        .withColumn("p", round(least(lit(1.0),
          when(col("__t2") > 0, lit(1.0) / col("__t2"))
            .otherwise(lit(1.0))), 6))
    }

    Seq(
      // ---- Allan deviation ladder of the daily event-count series:
      // exact integer rational per tau, one sqrt.
      Q("q511_allan_dev",
        Some(spineCte +
          "tz AS (SELECT unnest([1, 2, 4, 8]) AS tz), " +
          "b AS (SELECT CAST(tz AS BIGINT) AS tau, t // tz AS blk, n " +
          "FROM t, tz), " +
          "gb AS (SELECT tau, blk, CAST(count(*) AS BIGINT) AS cnt, " +
          "CAST(sum(n) AS BIGINT) AS s FROM b GROUP BY 1, 2), " +
          "fb AS (SELECT tau, blk, s FROM gb WHERE cnt = tau), " +
          "d AS (SELECT tau, s - lag(s) OVER (PARTITION BY tau " +
          "ORDER BY blk) AS dd FROM fb), " +
          "a AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_blocks, " +
          "CAST(sum(CAST(dd AS HUGEINT) * dd) AS HUGEINT) AS sdd " +
          "FROM d GROUP BY 1) " +
          "SELECT tau, n_blocks, round(CASE WHEN n_blocks >= 2 THEN " +
          "sqrt(CAST(sdd AS DOUBLE) / (CAST(tau AS DOUBLE) * " +
          "CAST(tau AS DOUBLE) * 2.0 * CAST(n_blocks - 1 AS DOUBLE))) " +
          "END, 6) AS adev FROM a ORDER BY tau"),
        (s, dir) => EventAnalytics.allanDeviationDaily(
          Tables.events(s, dir), "ts", taus = Seq(1, 2, 4, 8))),

      // ---- DFA of the same spine: N-scaled integer profile, per-block
      // OLS detrend, 3-point ln-ln slope alpha riding every row.
      Q("q512_dfa",
        Some(spineCte +
          "tot AS (SELECT CAST(count(*) AS BIGINT) AS nd, " +
          "CAST(sum(n) AS BIGINT) AS tt FROM s), " +
          "pr AS (SELECT t, CAST(sum(n) OVER (ORDER BY t ROWS BETWEEN " +
          "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum " +
          "FROM t), " +
          "pp AS (SELECT pr.t, CAST(tot.nd AS HUGEINT) * pr.cum - " +
          "CAST(pr.t + 1 AS HUGEINT) * tot.tt AS p, tot.nd " +
          "FROM pr, tot), " +
          "sz AS (SELECT unnest([4, 8, 16]) AS bs), " +
          "b AS (SELECT CAST(bs AS BIGINT) AS block_size, t // bs " +
          "AS blk, t % bs + 1 AS x, p, nd FROM pp, sz), " +
          "mm AS (SELECT block_size, blk, CAST(count(*) AS BIGINT) " +
          "AS cnt, any_value(nd) AS nd, CAST(sum(x) AS BIGINT) AS sx, " +
          "CAST(sum(x * x) AS BIGINT) AS sxx, " +
          "CAST(sum(p) AS HUGEINT) AS sy, " +
          "CAST(sum(CAST(x AS HUGEINT) * p) AS HUGEINT) AS sxy, " +
          "CAST(sum(p * p) AS HUGEINT) AS syy FROM b GROUP BY 1, 2), " +
          "q AS (SELECT block_size, nd, " +
          "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * " +
          "CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE) AS sxxc, " +
          "CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * " +
          "CAST(sy AS DOUBLE) / CAST(cnt AS DOUBLE) AS sxyc, " +
          "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * " +
          "CAST(sy AS DOUBLE) / CAST(cnt AS DOUBLE) AS syyc " +
          "FROM mm WHERE cnt = block_size), " +
          "w2 AS (SELECT block_size, nd, CASE WHEN sxxc > 0 THEN " +
          "syyc - sxyc * sxyc / sxxc END AS ssr FROM q), " +
          "ps AS (SELECT block_size, CAST(count(*) AS BIGINT) " +
          "AS n_blocks, any_value(nd) AS nd, " +
          "CAST(sum(CAST(ssr AS DECIMAL(38,6))) AS DOUBLE) AS sssr " +
          "FROM w2 GROUP BY 1), " +
          "pf AS (SELECT block_size, n_blocks, " +
          "sqrt(sssr / CAST(n_blocks AS DOUBLE) / " +
          "CAST(block_size AS DOUBLE)) / CAST(nd AS DOUBLE) AS f " +
          "FROM ps), " +
          "fit AS (SELECT CAST(count(*) AS BIGINT) AS k, " +
          "CAST(sum(CAST(lx AS DECIMAL(28,12))) AS DOUBLE) AS slx, " +
          "CAST(sum(CAST(ly AS DECIMAL(28,12))) AS DOUBLE) AS sly, " +
          "CAST(sum(CAST(lx * lx AS DECIMAL(28,12))) AS DOUBLE) " +
          "AS slxx, " +
          "CAST(sum(CAST(lx * ly AS DECIMAL(28,12))) AS DOUBLE) " +
          "AS slxy FROM (SELECT ln(CAST(block_size AS DOUBLE)) AS lx, " +
          "ln(f) AS ly FROM pf WHERE f > 0)) " +
          "SELECT block_size, n_blocks, round(f, 6) AS fluct, " +
          "round(CASE WHEN k >= 2 AND slxx - slx * slx / " +
          "CAST(k AS DOUBLE) > 0 THEN (slxy - slx * sly / " +
          "CAST(k AS DOUBLE)) / (slxx - slx * slx / " +
          "CAST(k AS DOUBLE)) END, 6) AS alpha FROM pf, fit " +
          "ORDER BY block_size"),
        (s, dir) => EventAnalytics.dfaDaily(Tables.events(s, dir), "ts",
          sizes = Seq(4, 8, 16))),

      // ---- Benjamini-Yekutieli over the q363 battery: the harmonic
      // c(m) factor buys validity under arbitrary dependence.
      Q("q513_by_fdr",
        Some(pBatteryCte +
          "fam AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p), " +
          "rk AS (SELECT event_type AS id, p AS p_value, " +
          "CAST(row_number() OVER (ORDER BY p, event_type) AS INTEGER) " +
          "AS rank, m FROM p, fam), " +
          "cm AS (SELECT CAST(sum(CAST(1.0 / CAST(rank AS DOUBLE) " +
          "AS DECIMAL(28,12))) AS DOUBLE) AS c FROM rk), " +
          "ok AS (SELECT id, p_value, rank, m, c, " +
          "p_value * CAST(m AS DOUBLE) * 10 * c <= " +
          "1.0 * CAST(rank AS DOUBLE) AS okf FROM rk, cm), " +
          "kk AS (SELECT max(CASE WHEN okf THEN rank END) AS k FROM ok) " +
          "SELECT id, p_value, rank, " +
          "round(1.0 * CAST(rank AS DOUBLE) / (10.0 * " +
          "CAST(m AS DOUBLE) * c), 6) AS threshold, " +
          "coalesce(rank <= k, FALSE) AS discovery FROM ok, kk " +
          "ORDER BY rank"),
        (s, dir) => Stats.byFdr(pBattery(s, dir), "event_type", col("p"),
          qNum = 1, qDen = 10).orderBy("rank")),

      // ---- Storey q-values over the same battery at lambda = .5:
      // per-test FDR price tags via the suffix min.
      Q("q514_storey_q",
        Some(pBatteryCte +
          "ov AS (SELECT CAST(count(*) AS BIGINT) AS m, " +
          "CAST(sum(CASE WHEN p > 0.5 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS nover FROM p), " +
          "rk AS (SELECT event_type AS id, p, CAST(row_number() OVER " +
          "(ORDER BY p, event_type) AS INTEGER) AS rank, m, nover " +
          "FROM p, ov), " +
          "s2 AS (SELECT id, p, rank, m, least(1.0, " +
          "CAST(nover AS DOUBLE) / (0.5 * CAST(m AS DOUBLE))) AS pi0 " +
          "FROM rk), " +
          "r2 AS (SELECT id, p, rank, pi0, " +
          "pi0 * CAST(m AS DOUBLE) * p / CAST(rank AS DOUBLE) AS raw " +
          "FROM s2) " +
          "SELECT id, round(p, 6) AS p_value, rank, " +
          "round(pi0, 6) AS pi0, " +
          "round(least(1.0, min(raw) OVER (ORDER BY p, id ROWS BETWEEN " +
          "CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS q_value " +
          "FROM r2 ORDER BY rank"),
        (s, dir) => Stats.storeyQ(pBattery(s, dir), "event_type",
          col("p"), lambda = 0.5).orderBy("rank"))
    )
  } ++ {
    // regression-diagnostics batch: shared lineitem (x=quantity,
    // y=extendedprice) base and the daily spine for the Chow split
    val liBase =
      "b AS (SELECT CAST(l_quantity AS DOUBLE) AS x, " +
        "CAST(l_extendedprice AS DOUBLE) AS y, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey " +
        "AS tie FROM lineitem WHERE l_quantity IS NOT NULL AND " +
        "l_extendedprice IS NOT NULL), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy " +
        "FROM b), " +
        "f AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, " +
        "sxx - sx * sx / CAST(n AS DOUBLE) AS sxxc, " +
        "sxy - sx * sy / CAST(n AS DOUBLE) AS sxyc, " +
        "syy - sy * sy / CAST(n AS DOUBLE) AS syyc FROM m), "
    val spineCte2 =
      "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "s AS (SELECT r.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n " +
        "FROM r LEFT JOIN c USING (day)), " +
        "d0 AS (SELECT min(day) AS d0 FROM s), " +
        "t AS (SELECT day - d0 AS t, n FROM s, d0), "

    Seq(
      // ---- D'Agostino-Pearson K2 normality omnibus on order totals:
      // the published small-sample transforms, cbrt-based, mirrored
      // stage by stage.
      Q("q515_dagostino",
        Some("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s1, " +
          "CAST(sum(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS s2, " +
          "CAST(sum(CAST(v * v * v AS DECIMAL(38,6))) AS DOUBLE) AS s3, " +
          "CAST(sum(CAST(v * v * v * v AS DECIMAL(38,6))) AS DOUBLE) " +
          "AS s4 FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v " +
          "FROM orders WHERE o_totalprice IS NOT NULL)), " +
          "c AS (SELECT n, CAST(n AS DOUBLE) AS nd, s1, s2, s3, s4 " +
          "FROM m), " +
          "cm AS (SELECT n, nd, (s2 - s1 * s1 / nd) / nd AS m2, " +
          "(s3 - 3.0 * s1 * s2 / nd + 2.0 * s1 * s1 * s1 / (nd * nd)) " +
          "/ nd AS m3, " +
          "(s4 - 4.0 * s1 * s3 / nd + 6.0 * s1 * s1 * s2 / (nd * nd) - " +
          "3.0 * s1 * s1 * s1 * s1 / (nd * nd * nd)) / nd AS m4 " +
          "FROM c), " +
          "g AS (SELECT n, nd, CASE WHEN m2 > 0 THEN " +
          "m3 / sqrt(m2 * m2 * m2) END AS g1, " +
          "CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END AS g2 " +
          "FROM cm), " +
          "sk AS (SELECT *, g1 * sqrt((nd + 1.0) * (nd + 3.0) / " +
          "(6.0 * (nd - 2.0))) AS y, " +
          "3.0 * (nd * nd + 27.0 * nd - 70.0) * (nd + 1.0) * " +
          "(nd + 3.0) / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * " +
          "(nd + 9.0)) AS b2 FROM g), " +
          "sk2 AS (SELECT *, sqrt(2.0 * (b2 - 1.0)) - 1.0 AS w2 " +
          "FROM sk), " +
          "sk3 AS (SELECT *, 1.0 / sqrt(ln(sqrt(w2))) AS dl, " +
          "sqrt(2.0 / (w2 - 1.0)) AS al FROM sk2), " +
          "z1t AS (SELECT *, CASE WHEN n >= 20 AND g1 IS NOT NULL THEN " +
          "dl * ln(y / al + sqrt(y / al * (y / al) + 1.0)) END AS z1 " +
          "FROM sk3), " +
          "ku AS (SELECT *, -6.0 / (nd + 1.0) AS eg, " +
          "24.0 * nd * (nd - 2.0) * (nd - 3.0) / ((nd + 1.0) * " +
          "(nd + 1.0) * (nd + 3.0) * (nd + 5.0)) AS vg, " +
          "6.0 * (nd * nd - 5.0 * nd + 2.0) / ((nd + 7.0) * " +
          "(nd + 9.0)) * sqrt(6.0 * (nd + 3.0) * (nd + 5.0) / " +
          "(nd * (nd - 2.0) * (nd - 3.0))) AS sb FROM z1t), " +
          "ku2 AS (SELECT *, (g2 - eg) / sqrt(vg) AS xs, " +
          "6.0 + 8.0 / sb * (2.0 / sb + sqrt(1.0 + 4.0 / (sb * sb))) " +
          "AS aa FROM ku), " +
          "z2t AS (SELECT *, CASE WHEN n >= 20 AND g2 IS NOT NULL THEN " +
          "((1.0 - 2.0 / (9.0 * aa)) - cbrt((1.0 - 2.0 / aa) / " +
          "(1.0 + xs * sqrt(2.0 / (aa - 4.0))))) / " +
          "sqrt(2.0 / (9.0 * aa)) END AS z2 FROM ku2) " +
          "SELECT n, round(g1, 6) AS skew, round(g2, 6) AS kurt_excess, " +
          "round(z1, 6) AS z_skew, round(z2, 6) AS z_kurt, " +
          "round(z1 * z1 + z2 * z2, 6) AS k2 FROM z2t"),
        (s, dir) => Stats.dagostinoK2(Tables.orders(s, dir),
          col("o_totalprice"))),

      // ---- Chow break test on the daily event-count series at the
      // spine midpoint (day 15 of the 30-day spine, a PRE-declared
      // breakpoint): one conditional aggregate, three OLS blocks.
      Q("q516_chow",
        Some(spineCte2 +
          "bb AS (SELECT CAST(t AS DOUBLE) AS x, CAST(n AS DOUBLE) AS y " +
          "FROM t), " +
          "m AS (SELECT " +
          "CAST(sum(CASE WHEN TRUE THEN 1 ELSE 0 END) AS BIGINT) AS np, " +
          "CAST(sum(CASE WHEN TRUE THEN CAST(x AS DECIMAL(38,6)) END) " +
          "AS DOUBLE) AS sxp, " +
          "CAST(sum(CASE WHEN TRUE THEN CAST(y AS DECIMAL(38,6)) END) " +
          "AS DOUBLE) AS syp, " +
          "CAST(sum(CASE WHEN TRUE THEN CAST(x * x AS DECIMAL(38,6)) " +
          "END) AS DOUBLE) AS sxxp, " +
          "CAST(sum(CASE WHEN TRUE THEN CAST(x * y AS DECIMAL(38,6)) " +
          "END) AS DOUBLE) AS sxyp, " +
          "CAST(sum(CASE WHEN TRUE THEN CAST(y * y AS DECIMAL(38,6)) " +
          "END) AS DOUBLE) AS syyp, " +
          "CAST(sum(CASE WHEN x < 15.0 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS nl, " +
          "CAST(sum(CASE WHEN x < 15.0 THEN CAST(x AS DECIMAL(38,6)) " +
          "END) AS DOUBLE) AS sxl, " +
          "CAST(sum(CASE WHEN x < 15.0 THEN CAST(y AS DECIMAL(38,6)) " +
          "END) AS DOUBLE) AS syl, " +
          "CAST(sum(CASE WHEN x < 15.0 THEN CAST(x * x " +
          "AS DECIMAL(38,6)) END) AS DOUBLE) AS sxxl, " +
          "CAST(sum(CASE WHEN x < 15.0 THEN CAST(x * y " +
          "AS DECIMAL(38,6)) END) AS DOUBLE) AS sxyl, " +
          "CAST(sum(CASE WHEN x < 15.0 THEN CAST(y * y " +
          "AS DECIMAL(38,6)) END) AS DOUBLE) AS syyl, " +
          "CAST(sum(CASE WHEN NOT (x < 15.0) THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS nr, " +
          "CAST(sum(CASE WHEN NOT (x < 15.0) THEN CAST(x " +
          "AS DECIMAL(38,6)) END) AS DOUBLE) AS sxr, " +
          "CAST(sum(CASE WHEN NOT (x < 15.0) THEN CAST(y " +
          "AS DECIMAL(38,6)) END) AS DOUBLE) AS syr, " +
          "CAST(sum(CASE WHEN NOT (x < 15.0) THEN CAST(x * x " +
          "AS DECIMAL(38,6)) END) AS DOUBLE) AS sxxr, " +
          "CAST(sum(CASE WHEN NOT (x < 15.0) THEN CAST(x * y " +
          "AS DECIMAL(38,6)) END) AS DOUBLE) AS sxyr, " +
          "CAST(sum(CASE WHEN NOT (x < 15.0) THEN CAST(y * y " +
          "AS DECIMAL(38,6)) END) AS DOUBLE) AS syyr FROM bb), " +
          "q AS (SELECT np, nl, nr, CAST(np AS DOUBLE) AS nd, " +
          "CASE WHEN sxxp - sxp * sxp / CAST(np AS DOUBLE) > 0 THEN " +
          "syyp - syp * syp / CAST(np AS DOUBLE) - " +
          "(sxyp - sxp * syp / CAST(np AS DOUBLE)) * " +
          "(sxyp - sxp * syp / CAST(np AS DOUBLE)) / " +
          "(sxxp - sxp * sxp / CAST(np AS DOUBLE)) END AS sp, " +
          "CASE WHEN sxxl - sxl * sxl / CAST(nl AS DOUBLE) > 0 THEN " +
          "syyl - syl * syl / CAST(nl AS DOUBLE) - " +
          "(sxyl - sxl * syl / CAST(nl AS DOUBLE)) * " +
          "(sxyl - sxl * syl / CAST(nl AS DOUBLE)) / " +
          "(sxxl - sxl * sxl / CAST(nl AS DOUBLE)) END AS sl, " +
          "CASE WHEN sxxr - sxr * sxr / CAST(nr AS DOUBLE) > 0 THEN " +
          "syyr - syr * syr / CAST(nr AS DOUBLE) - " +
          "(sxyr - sxr * syr / CAST(nr AS DOUBLE)) * " +
          "(sxyr - sxr * syr / CAST(nr AS DOUBLE)) / " +
          "(sxxr - sxr * sxr / CAST(nr AS DOUBLE)) END AS sr FROM m) " +
          "SELECT np AS n, nl AS n_left, nr AS n_right, " +
          "round(CASE WHEN nl >= 3 AND nr >= 3 AND sl + sr > 0 THEN " +
          "((sp - sl - sr) / 2.0) / ((sl + sr) / (nd - 4.0)) END, 6) " +
          "AS f_stat FROM q"),
        (s, dir) => {
          val daily = EventAnalytics.resampleDaily(Tables.events(s, dir),
            "ts")
          val t = daily.crossJoin(broadcast(
              daily.agg(min(col("day")).as("__d0"))))
            .select((col("day") - col("__d0")).as("t"), col("n"))
          Stats.chowTest(t, col("t"), col("n"), breakX = 15.0)
        }),

      // ---- Cook's distance census of extendedprice ~ quantity: the
      // influence screen with an exact-equality max election.
      Q("q517_cooks",
        Some("WITH " + liBase +
          "g AS (SELECT n, nd, sx, sy, sxxc, " +
          "CASE WHEN n >= 4 AND sxxc > 0 THEN sxyc / sxxc END AS bb, " +
          "CASE WHEN n >= 4 AND sxxc > 0 THEN " +
          "(syyc - sxyc * sxyc / sxxc) / (nd - 2.0) END AS s2 FROM f), " +
          "d AS (SELECT b.tie, g.n, g.nd, g.s2, " +
          "1.0 / g.nd + (b.x - g.sx / g.nd) * (b.x - g.sx / g.nd) / " +
          "g.sxxc AS h, " +
          "b.y - (g.sy / g.nd - g.bb * (g.sx / g.nd) + g.bb * b.x) " +
          "AS e FROM b, g), " +
          "dd AS (SELECT tie, n, nd, CASE WHEN s2 > 0 AND h < 1 THEN " +
          "e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) END AS d " +
          "FROM d), " +
          "agg AS (SELECT any_value(n) AS n, " +
          "CAST(sum(CASE WHEN d > 4.0 / nd THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS n_influential, max(d) AS mx FROM dd), " +
          "top AS (SELECT min(dd.tie) AS top_tie FROM dd, agg " +
          "WHERE dd.d = agg.mx) " +
          "SELECT n, n_influential, round(mx, 6) AS max_cooks, " +
          "top_tie FROM agg, top"),
        (s, dir) => Stats.cooksDistanceCensus(Tables.lineitem(s, dir),
          col("l_quantity"), col("l_extendedprice"),
          col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
            col("l_suppkey"))),

      // ---- Breusch-Pagan LM on the same regression: n*R2 of squared
      // residuals on quantity, a two-pass broadcast-fit scan.
      Q("q518_breusch_pagan",
        Some("WITH " + liBase +
          "g AS (SELECT n, nd, sx, sy, " +
          "CASE WHEN n >= 3 AND sxxc > 0 THEN sxyc / sxxc END AS bb " +
          "FROM f), " +
          "e0 AS (SELECT b.x, g.n, " +
          "b.y - (g.sy / g.nd - g.bb * (g.sx / g.nd) + g.bb * b.x) " +
          "AS e FROM b, g), " +
          "e1 AS (SELECT x, n, e * e AS z FROM e0), " +
          "aux AS (SELECT any_value(n) AS n, " +
          "CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS ax, " +
          "CAST(sum(CAST(z AS DECIMAL(38,6))) AS DOUBLE) AS az, " +
          "CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS axx, " +
          "CAST(sum(CAST(x * z AS DECIMAL(38,6))) AS DOUBLE) AS axz, " +
          "CAST(sum(CAST(z * z AS DECIMAL(38,6))) AS DOUBLE) AS azz " +
          "FROM e1), " +
          "fin AS (SELECT n, CAST(n AS DOUBLE) AS n3, " +
          "axx - ax * ax / CAST(n AS DOUBLE) AS vxx, " +
          "axz - ax * az / CAST(n AS DOUBLE) AS vxz, " +
          "azz - az * az / CAST(n AS DOUBLE) AS vzz FROM aux), " +
          "sl AS (SELECT CASE WHEN n >= 3 AND sxxc > 0 THEN " +
          "sxyc / sxxc END AS slope FROM f) " +
          "SELECT n, round(slope, 6) AS slope, " +
          "round(CASE WHEN vxx > 0 AND vzz > 0 THEN " +
          "n3 * (vxz * vxz / (vxx * vzz)) END, 6) AS bp_stat " +
          "FROM fin, sl"),
        (s, dir) => Stats.breuschPagan(Tables.lineitem(s, dir),
          col("l_quantity"), col("l_extendedprice")))
    )
  } ++ Seq(

    // ---- Cochran C / Hartley Fmax variance screens of event values
    // across types, with the max-variance group elected exactly.
    Q("q519_variance_panel",
      Some("WITH g AS (SELECT CAST(event_type AS VARCHAR) AS gg, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s, " +
        "CAST(sum(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS ss " +
        "FROM (SELECT event_type, CAST(value AS DOUBLE) AS v " +
        "FROM events WHERE value IS NOT NULL AND event_type IS NOT " +
        "NULL) GROUP BY 1 HAVING count(*) >= 2), " +
        "v AS (SELECT gg, n, (ss - s * s / CAST(n AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) - 1.0) AS vv FROM g), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n_groups, " +
        "CAST(sum(n) AS BIGINT) AS n, " +
        "CAST(sum(CAST(vv AS DECIMAL(28,12))) AS DOUBLE) AS sv, " +
        "max(vv) AS mx, min(vv) AS mn FROM v), " +
        "tp AS (SELECT min(v.gg) AS max_group FROM v, t " +
        "WHERE v.vv = t.mx) " +
        "SELECT n_groups, n, max_group, " +
        "round(CASE WHEN sv > 0 THEN mx / sv END, 6) AS cochran_c, " +
        "round(CASE WHEN mn > 0 THEN mx / mn END, 6) AS hartley_fmax " +
        "FROM t, tp"),
      (s, dir) => Stats.variancePanel(Tables.events(s, dir),
        col("event_type"), col("value"))),

    // ---- classic mean-centered Levene on the same grouping: group
    // means broadcast, q373's ANOVA shape on |x - mean|.
    Q("q520_levene",
      Some("WITH b AS (SELECT event_type AS g, " +
        "CAST(value AS DOUBLE) AS x FROM events WHERE value IS NOT " +
        "NULL AND event_type IS NOT NULL), " +
        "mn AS (SELECT g, CAST(sum(CAST(x AS DECIMAL(38,6))) " +
        "AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean FROM b " +
        "GROUP BY 1), " +
        "z AS (SELECT b.g, abs(b.x - mn.mean) AS x FROM b " +
        "JOIN mn ON b.g = mn.g), " +
        "gg AS (SELECT g AS grp, CAST(count(*) AS BIGINT) AS ng, " +
        "sum(CAST(x AS DECIMAL(38,6))) AS s, " +
        "sum(CAST(x * x AS DECIMAL(38,6))) AS ss FROM z GROUP BY 1), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n_groups, " +
        "CAST(sum(ng) AS BIGINT) AS n, sum(s) AS st, sum(ss) AS sst, " +
        "sum(CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / " +
        "CAST(ng AS DOUBLE) AS DECIMAL(38,6))) AS sg FROM gg), " +
        "f AS (SELECT n_groups, n, " +
        "CAST(sg AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) " +
        "/ CAST(n AS DOUBLE) AS ssb, " +
        "CAST(sst AS DOUBLE) - CAST(sg AS DOUBLE) AS ssw FROM a) " +
        "SELECT n_groups, n, round(ssb, 6) AS ss_between, " +
        "round(ssw, 6) AS ss_within, " +
        "round(CASE WHEN n_groups > 1 AND n > n_groups AND ssw > 0 " +
        "THEN (ssb / (CAST(n_groups AS DOUBLE) - 1.0)) / " +
        "(ssw / (CAST(n AS DOUBLE) - CAST(n_groups AS DOUBLE))) " +
        "END, 6) AS f_stat FROM f"),
      (s, dir) => Stats.leveneTest(Tables.events(s, dir),
        col("event_type"), col("value"))),

    // ---- Stuart-Maxwell marginal homogeneity of each user's first- vs
    // last-event value tercile (fixed 50/200 cuts): ONE exact integer
    // rational chi2 on pair counts.
    Q("q521_stuart_maxwell",
      Some("WITH e AS (SELECT user_id, event_id, " +
        "CAST(value AS DOUBLE) AS v, epoch_us(ts) AS us FROM events " +
        "WHERE value IS NOT NULL), " +
        "w AS (SELECT user_id, v, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY us, " +
        "event_id) AS rf, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY us DESC, " +
        "event_id DESC) AS rl FROM e), " +
        "fp AS (SELECT user_id, CASE WHEN v < 50.0 THEN 'l' WHEN " +
        "v < 200.0 THEN 'm' ELSE 'h' END AS r FROM w WHERE rf = 1), " +
        "lp AS (SELECT user_id, CASE WHEN v < 50.0 THEN 'l' WHEN " +
        "v < 200.0 THEN 'm' ELSE 'h' END AS c FROM w WHERE rl = 1), " +
        "pr AS (SELECT r, c FROM fp JOIN lp USING (user_id)), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN r = 'l' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS r1, " +
        "CAST(sum(CASE WHEN r = 'm' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS r2, " +
        "CAST(sum(CASE WHEN r = 'h' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS r3, " +
        "CAST(sum(CASE WHEN c = 'l' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS c1, " +
        "CAST(sum(CASE WHEN c = 'm' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS c2, " +
        "CAST(sum(CASE WHEN c = 'h' THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS c3, " +
        "CAST(sum(CASE WHEN (r = 'l' AND c = 'm') OR (r = 'm' AND " +
        "c = 'l') THEN 1 ELSE 0 END) AS BIGINT) AS m12, " +
        "CAST(sum(CASE WHEN (r = 'l' AND c = 'h') OR (r = 'h' AND " +
        "c = 'l') THEN 1 ELSE 0 END) AS BIGINT) AS m13, " +
        "CAST(sum(CASE WHEN (r = 'm' AND c = 'h') OR (r = 'h' AND " +
        "c = 'm') THEN 1 ELSE 0 END) AS BIGINT) AS m23 FROM pr) " +
        "SELECT n, r1 - c1 AS d1, r2 - c2 AS d2, r3 - c3 AS d3, " +
        "round(CASE WHEN CAST(m12 AS HUGEINT) * m13 + " +
        "CAST(m12 AS HUGEINT) * m23 + CAST(m13 AS HUGEINT) * m23 > 0 " +
        "THEN CAST(CAST(m23 AS HUGEINT) * (r1 - c1) * (r1 - c1) + " +
        "CAST(m13 AS HUGEINT) * (r2 - c2) * (r2 - c2) + " +
        "CAST(m12 AS HUGEINT) * (r3 - c3) * (r3 - c3) AS DOUBLE) / " +
        "CAST(CAST(m12 AS HUGEINT) * m13 + CAST(m12 AS HUGEINT) * m23 " +
        "+ CAST(m13 AS HUGEINT) * m23 AS DOUBLE) END, 6) AS chi2, " +
        "CAST(2 AS BIGINT) AS dof FROM m"),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("user_id"), col("event_id"),
            col("value").cast("double").as("v"),
            unix_micros(col("ts")).as("__us"))
        val wF = Window.partitionBy(col("user_id"))
          .orderBy(col("__us"), col("event_id"))
        val wL = Window.partitionBy(col("user_id"))
          .orderBy(col("__us").desc, col("event_id").desc)
        val both = e.withColumn("__rf", row_number().over(wF))
          .withColumn("__rl", row_number().over(wL))
        def bucket(c: org.apache.spark.sql.Column) =
          when(c < 50.0, "l").when(c < 200.0, "m").otherwise("h")
        val first = both.filter(col("__rf") === 1)
          .select(col("user_id"), col("v").as("__vf"))
        val last = both.filter(col("__rl") === 1)
          .select(col("user_id"), col("v").as("__vl"))
        Stats.stuartMaxwell3(first.join(last, "user_id"),
          bucket(col("__vf")), bucket(col("__vl")), Seq("l", "m", "h"))
      }),

    // ---- Holt linear one-step backtest of the daily count series,
    // alpha = beta = 1/2: the sequential recursion runs driver-local on
    // the bounded spine; the oracle unrolls the SAME recursion with a
    // recursive CTE -- identical IEEE step shapes.
    Q("q522_holt_backtest",
      Some("WITH RECURSIVE c AS (SELECT epoch_us(ts) // 86400000000 " +
        "AS day, count(*) AS n FROM events GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "s AS (SELECT r.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n " +
        "FROM r LEFT JOIN c USING (day)), " +
        "d0 AS (SELECT min(day) AS d0 FROM s), " +
        "t AS (SELECT day - d0 AS t, n, CAST(n AS DOUBLE) AS y " +
        "FROM s, d0), " +
        "mx AS (SELECT max(t) AS tmax FROM t), " +
        "rec(t, l, b) AS (" +
        "SELECT CAST(0 AS BIGINT), (SELECT y FROM t WHERE t = 0), " +
        "(SELECT y FROM t WHERE t = 1) - (SELECT y FROM t WHERE t = 0) " +
        "UNION ALL " +
        "SELECT rec.t + 1, 0.5 * tt.y + 0.5 * (rec.l + rec.b), " +
        "0.5 * ((0.5 * tt.y + 0.5 * (rec.l + rec.b)) - rec.l) + " +
        "0.5 * rec.b FROM rec JOIN t tt ON tt.t = rec.t + 1 " +
        "WHERE rec.t + 1 <= (SELECT tmax FROM mx)) " +
        "SELECT tt.t AS t, tt.n, " +
        "round(rec.l + rec.b, 6) AS forecast, " +
        "round(tt.y - (rec.l + rec.b), 6) AS error " +
        "FROM rec JOIN t tt ON tt.t = rec.t + 1 ORDER BY t"),
      (s, dir) => EventAnalytics.holtLinearBacktest(
        Tables.events(s, dir), "ts").orderBy("t"))
  ) ++ Seq(

    // ---- Kyle's lambda per ticker: price impact per unit of tick-rule
    // signed flow, exact integer OLS moments.
    Q("q523_kyle_lambda",
      Some(barsCte + ", " +
        "p AS (SELECT key, day, cl, volume, lag(cl) OVER (PARTITION BY " +
        "key ORDER BY day) AS cl0 FROM b), " +
        "f AS (SELECT key, cl - cl0 AS dd, volume FROM p " +
        "WHERE cl0 IS NOT NULL), " +
        "g AS (SELECT key, CAST(sign(CAST(dd AS DOUBLE)) AS BIGINT) * " +
        "volume AS sv, dd FROM f), " +
        "m AS (SELECT key, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CAST(sv AS HUGEINT)) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(dd AS HUGEINT)) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(sv AS HUGEINT) * sv) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(sv AS HUGEINT) * dd) AS DOUBLE) AS sxy " +
        "FROM g GROUP BY 1) " +
        "SELECT key, n_pairs, round(CASE WHEN n_pairs >= 2 AND " +
        "sxx - sx * sx / CAST(n_pairs AS DOUBLE) > 0 THEN " +
        "(sxy - sx * sy / CAST(n_pairs AS DOUBLE)) / " +
        "(sxx - sx * sx / CAST(n_pairs AS DOUBLE)) END, 6) " +
        "AS kyle_lambda FROM m ORDER BY key"),
      (s, dir) => Finance.kyleLambda(allBars(s, dir), "key", "day",
        col("close"), col("volume")).orderBy("key")),

    // ---- CAPM beta panel against the equal-weight complete-day market:
    // balanced-panel gate on the exact participant count.
    Q("q524_capm_beta",
      Some(barsCte + ", " +
        "ct AS (SELECT key, day, cl FROM b), " +
        "mk AS (SELECT day, count(*) AS cnt, CAST(sum(cl) AS BIGINT) " +
        "AS mc FROM ct GROUP BY 1), " +
        "nk AS (SELECT max(cnt) AS mx FROM mk), " +
        "mf AS (SELECT day, mc FROM mk, nk WHERE cnt * 5 >= mx * 4), " +
        "md AS (SELECT day, mc - lag(mc) OVER (ORDER BY day) AS dm " +
        "FROM mf), " +
        "mdf AS (SELECT day, dm FROM md WHERE dm IS NOT NULL), " +
        "td AS (SELECT ct.key, ct.day, ct.cl - lag(ct.cl) OVER " +
        "(PARTITION BY ct.key ORDER BY ct.day) AS dc FROM ct " +
        "JOIN (SELECT day FROM mf) fd ON ct.day = fd.day), " +
        "tdf AS (SELECT key, day, dc FROM td WHERE dc IS NOT NULL), " +
        "j AS (SELECT key, dc, dm FROM tdf JOIN mdf USING (day)), " +
        "m AS (SELECT key, CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(CAST(dm AS HUGEINT)) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(dc AS HUGEINT)) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(dm AS HUGEINT) * dm) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(dm AS HUGEINT) * dc) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(dc AS HUGEINT) * dc) AS DOUBLE) AS syy " +
        "FROM j GROUP BY 1), " +
        "c AS (SELECT key, n_days, CAST(n_days AS DOUBLE) AS nd, sx, " +
        "sy, sxy - sx * sy / CAST(n_days AS DOUBLE) AS num, " +
        "sxx - sx * sx / CAST(n_days AS DOUBLE) AS den, " +
        "syy - sy * sy / CAST(n_days AS DOUBLE) AS vy FROM m), " +
        "g AS (SELECT key, n_days, nd, sx, sy, num, den, vy, " +
        "CASE WHEN n_days >= 2 AND den > 0 THEN num / den END AS beta " +
        "FROM c) " +
        "SELECT key, n_days, round(beta, 6) AS beta, " +
        "round(sy / nd - beta * (sx / nd), 6) AS alpha, " +
        "round(CASE WHEN den > 0 AND vy > 0 THEN " +
        "num * num / (den * vy) END, 6) AS r2 FROM g ORDER BY key"),
      (s, dir) => Finance.capmBeta(allBars(s, dir), "key", "day",
        col("close")).orderBy("key")),

    // ---- time-under-water census per ticker: gaps-and-islands runs on
    // the exact integer underwater flag.
    Q("q525_drawdown_duration",
      Some(barsCte + ", " +
        "pk AS (SELECT key, day, cl, max(cl) OVER (PARTITION BY key " +
        "ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT " +
        "ROW) AS peak, row_number() OVER (PARTITION BY key " +
        "ORDER BY day) AS rn FROM b), " +
        "un AS (SELECT key, rn - row_number() OVER (PARTITION BY key " +
        "ORDER BY day) AS grp FROM pk WHERE cl < peak), " +
        "rn2 AS (SELECT key, CAST(count(*) AS BIGINT) AS len FROM un " +
        "GROUP BY key, grp), " +
        "rr AS (SELECT key, CAST(sum(len) AS BIGINT) AS n_underwater, " +
        "CAST(max(len) AS BIGINT) AS max_run FROM rn2 GROUP BY 1), " +
        "nb AS (SELECT key, CAST(count(*) AS BIGINT) AS n_bars FROM pk " +
        "GROUP BY 1) " +
        "SELECT nb.key AS key, n_bars, " +
        "CAST(coalesce(n_underwater, 0) AS BIGINT) AS n_underwater, " +
        "CAST(coalesce(max_run, 0) AS BIGINT) AS max_run " +
        "FROM nb LEFT JOIN rr ON nb.key = rr.key ORDER BY key"),
      (s, dir) => Finance.drawdownDuration(allBars(s, dir), "key", "day",
        col("close")).orderBy("key")),

    // ---- cross-sectional momentum backtest: trailing-5-day signal
    // through yesterday, top-5/bottom-5 daily long-short spread.
    Q("q526_momentum",
      Some(barsCte + ", " +
        "p AS (SELECT key, day, cl, lag(cl, 1) OVER w AS c1, " +
        "lag(cl, 6) OVER w AS cl6 FROM b WINDOW w AS " +
        "(PARTITION BY key ORDER BY day)), " +
        "f AS (SELECT key, day, CAST(c1 - cl6 AS DOUBLE) / " +
        "CAST(cl6 AS DOUBLE) AS sig, CAST(cl - c1 AS DOUBLE) / " +
        "CAST(c1 AS DOUBLE) AS ret FROM p WHERE c1 IS NOT NULL AND " +
        "cl6 IS NOT NULL AND cl6 > 0 AND c1 > 0), " +
        "r AS (SELECT day, ret, row_number() OVER (PARTITION BY day " +
        "ORDER BY sig DESC, key ASC) AS rk, " +
        "count(*) OVER (PARTITION BY day) AS m FROM f), " +
        "d AS (SELECT day, CAST(sum(CASE WHEN rk <= 5 THEN " +
        "CAST(ret AS DECIMAL(28,12)) END) AS DOUBLE) / 5.0 - " +
        "CAST(sum(CASE WHEN rk > m - 5 THEN " +
        "CAST(ret AS DECIMAL(28,12)) END) AS DOUBLE) / 5.0 AS spread " +
        "FROM r WHERE m >= 11 GROUP BY 1), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(CAST(spread AS DECIMAL(28,12))) AS DOUBLE) AS s, " +
        "CAST(sum(CAST(spread * spread AS DECIMAL(28,12))) AS DOUBLE) " +
        "AS ss FROM d) " +
        "SELECT n_days, round(s / CAST(n_days AS DOUBLE), 6) " +
        "AS mean_spread, " +
        "round(CASE WHEN n_days >= 2 AND (ss - s * s / " +
        "CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0) > 0 " +
        "THEN (s / CAST(n_days AS DOUBLE)) / sqrt((ss - s * s / " +
        "CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0) / " +
        "CAST(n_days AS DOUBLE)) END, 6) AS t_stat FROM a"),
      (s, dir) => Finance.momentumBacktest(allBars(s, dir), "key", "day",
        col("close"), lookback = 5, k = 5))
  ) ++ Seq(

    // ---- Bass diffusion fit of user adoption: daily new users on the
    // zero-filled spine, 2-regressor normal equations on (N, N^2), and
    // the m/p/q recovery from the quadratic's positive root.
    Q("q527_bass_diffusion",
      Some("WITH fd AS (SELECT user_id, " +
        "min(epoch_us(ts) // 86400000000) AS d FROM events GROUP BY 1), " +
        "pd AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS nn FROM fd " +
        "GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM pd), " +
        "(SELECT max(day) FROM pd) + 1)) AS day), " +
        "s AS (SELECT r.day, CAST(coalesce(pd.nn, 0) AS BIGINT) AS y " +
        "FROM r LEFT JOIN pd USING (day)), " +
        "cu AS (SELECT day, y, CAST(sum(y) OVER (ORDER BY day ROWS " +
        "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS cum FROM s), " +
        "z AS (SELECT y, cum - y AS z1, (cum - y) * (cum - y) AS z2 " +
        "FROM cu), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sw, " +
        "CAST(sum(CAST(z1 AS HUGEINT)) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(z2 AS HUGEINT)) AS DOUBLE) AS s2, " +
        "CAST(sum(CAST(z1 AS HUGEINT) * z1) AS DOUBLE) AS s11, " +
        "CAST(sum(CAST(z2 AS HUGEINT) * z2) AS DOUBLE) AS s22, " +
        "CAST(sum(CAST(z1 AS HUGEINT) * z2) AS DOUBLE) AS s12, " +
        "CAST(sum(CAST(z1 AS HUGEINT) * y) AS DOUBLE) AS s1w, " +
        "CAST(sum(CAST(z2 AS HUGEINT) * y) AS DOUBLE) AS s2w FROM z), " +
        "c AS (SELECT n_days, CAST(n_days AS DOUBLE) AS nd, sw, s1, s2, " +
        "s11 - s1 * s1 / CAST(n_days AS DOUBLE) AS c11, " +
        "s22 - s2 * s2 / CAST(n_days AS DOUBLE) AS c22, " +
        "s12 - s1 * s2 / CAST(n_days AS DOUBLE) AS c12, " +
        "s1w - s1 * sw / CAST(n_days AS DOUBLE) AS c1w, " +
        "s2w - s2 * sw / CAST(n_days AS DOUBLE) AS c2w FROM m), " +
        "g AS (SELECT n_days, nd, sw, s1, s2, " +
        "CASE WHEN n_days >= 4 AND c11 * c22 - c12 * c12 > 0 THEN " +
        "(c1w * c22 - c2w * c12) / (c11 * c22 - c12 * c12) END AS bb, " +
        "CASE WHEN n_days >= 4 AND c11 * c22 - c12 * c12 > 0 THEN " +
        "(c2w * c11 - c1w * c12) / (c11 * c22 - c12 * c12) END AS cc " +
        "FROM c), " +
        "h AS (SELECT n_days, bb, cc, " +
        "sw / nd - bb * (s1 / nd) - cc * (s2 / nd) AS aa FROM g), " +
        "i AS (SELECT n_days, aa, bb, cc, " +
        "CASE WHEN cc < 0 AND bb * bb - 4.0 * cc * aa >= 0 THEN " +
        "(-bb - sqrt(bb * bb - 4.0 * cc * aa)) / (2.0 * cc) END " +
        "AS mhat FROM h), " +
        "j AS (SELECT n_days, aa, bb, cc, mhat, " +
        "CASE WHEN mhat > 0 THEN aa / mhat END AS phat FROM i) " +
        "SELECT n_days, round(aa, 6) AS coef_a, round(bb, 6) AS coef_b, " +
        "round(cc, 6) AS coef_c, " +
        "round(CASE WHEN mhat > 0 THEN mhat END, 6) AS m_hat, " +
        "round(phat, 6) AS p_hat, round(phat + bb, 6) AS q_hat FROM j"),
      (s, dir) => EventAnalytics.bassDiffusionFit(Tables.events(s, dir),
        "user_id", "ts")),

    // ---- negative-binomial MoM fit of per-(type, user) event counts:
    // how overdispersed each event type's usage is, in NB units.
    Q("q528_negbin_fit",
      Some("WITH u AS (SELECT event_type, user_id, " +
        "CAST(count(*) AS DOUBLE) AS v FROM events GROUP BY 1, 2), " +
        "g AS (SELECT event_type AS \"group\", " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s, " +
        "CAST(sum(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS ss " +
        "FROM u GROUP BY 1 HAVING count(*) >= 2), " +
        "v2 AS (SELECT \"group\", n, s / CAST(n AS DOUBLE) AS mean, " +
        "(ss - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) " +
        "AS vr FROM g) " +
        "SELECT \"group\", n, round(mean, 6) AS mean, " +
        "round(vr, 6) AS variance, " +
        "round(CASE WHEN vr > mean THEN mean * mean / (vr - mean) " +
        "END, 6) AS nb_r, " +
        "round(CASE WHEN vr > mean THEN mean / vr END, 6) AS nb_p " +
        "FROM v2 ORDER BY \"group\""),
      (s, dir) => Stats.negBinomFit(
        Tables.events(s, dir).groupBy("event_type", "user_id")
          .agg(count(lit(1)).cast("double").as("v")),
        col("event_type"), col("v")).orderBy("group")),

    // ---- Hoaglin Poissonness plot of per-(user, day) event counts:
    // the ln k! grid ships as driver-computed literals (the q35
    // discipline); slope recovers ln(lambda).
    Q("q529_poissonness", {
      val lf = Stats.lnFactGrid(20)
        .map { case (k, v) => s"($k, $v)" }.mkString(", ")
      Some("WITH u AS (SELECT user_id, epoch_us(ts) // 86400000000 " +
        "AS d, CAST(count(*) AS BIGINT) AS y FROM events GROUP BY " +
        "1, 2), " +
        "ck AS (SELECT y AS k, CAST(count(*) AS BIGINT) AS nk FROM u " +
        "GROUP BY 1), " +
        "t AS (SELECT CAST(sum(nk) AS BIGINT) AS n_total, " +
        "CAST(sum(CASE WHEN k > 20 THEN nk ELSE 0 END) AS BIGINT) " +
        "AS n_over FROM ck), " +
        s"lf(k, lnf) AS (VALUES $lf), " +
        "p AS (SELECT CAST(ck.k AS DOUBLE) AS x, lf.lnf + " +
        "ln(CAST(ck.nk AS DOUBLE)) - ln(CAST(t.n_total AS DOUBLE)) " +
        "AS phi FROM ck JOIN lf ON ck.k = lf.k, t), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_points, " +
        "CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(phi AS DECIMAL(28,12))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(x * phi AS DECIMAL(28,12))) AS DOUBLE) AS sxy " +
        "FROM p), " +
        "f AS (SELECT n_points, CAST(n_points AS DOUBLE) AS kd, sx, " +
        "sy, sxy - sx * sy / CAST(n_points AS DOUBLE) AS num, " +
        "sxx - sx * sx / CAST(n_points AS DOUBLE) AS den FROM m), " +
        "g AS (SELECT n_points, kd, sx, sy, CASE WHEN n_points >= 2 " +
        "AND den > 0 THEN num / den END AS slope FROM f) " +
        "SELECT t.n_total, t.n_over, g.n_points, " +
        "round(g.slope, 6) AS slope, " +
        "round(exp(g.slope), 6) AS lambda_hat, " +
        "round(g.sy / g.kd - g.slope * (g.sx / g.kd), 6) AS intercept " +
        "FROM g, t")
    },
      (s, dir) => Stats.poissonnessPlot(
        Tables.events(s, dir)
          .groupBy(col("user_id"),
            EventAnalytics.dayIndex(col("ts")).as("d"))
          .agg(count(lit(1)).as("y")),
        col("y"), maxK = 20)),

    // ---- Cameron-Trivedi overdispersion score on the same counts: the
    // one-number Poisson plausibility gate.
    Q("q530_cameron_trivedi",
      Some("WITH u AS (SELECT user_id, epoch_us(ts) // 86400000000 " +
        "AS d, CAST(count(*) AS DOUBLE) AS v FROM events GROUP BY " +
        "1, 2), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s, " +
        "CAST(sum(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS ss " +
        "FROM u) " +
        "SELECT n, round(s / CAST(n AS DOUBLE), 6) AS mean, " +
        "round(CASE WHEN n >= 2 AND sqrt(2.0 * CAST(n AS DOUBLE) * " +
        "(s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) > 0 THEN " +
        "((ss - s * s / CAST(n AS DOUBLE)) - s) / " +
        "sqrt(2.0 * CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE)) * " +
        "(s / CAST(n AS DOUBLE))) END, 6) AS t_stat FROM m"),
      (s, dir) => Stats.cameronTrivedi(
        Tables.events(s, dir)
          .groupBy(col("user_id"),
            EventAnalytics.dayIndex(col("ts")).as("d"))
          .agg(count(lit(1)).cast("double").as("v")),
        col("v")))
  ) ++ Seq(

    // ---- Horvitz-Thompson revenue total from the stratified md5 draw
    // (the q57 sampling discipline made inferential): the estimator,
    // the TRUE total, and the relative error. Totals at 2dp (the
    // magnitude lesson), rel_err 6dp.
    Q("q531_horvitz_thompson",
      Some("WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS y, " +
        "least(greatest(CASE l_returnflag WHEN 'A' THEN 0.3 WHEN 'N' " +
        "THEN 0.2 WHEN 'R' THEN 0.5 ELSE 0.1 END, 0.0), 1.0) AS r, " +
        "substring(md5('ht-v1' || CAST(l_orderkey * 10000000 + " +
        "l_linenumber * 1000000 + l_suppkey AS VARCHAR)), 1, 8) AS h " +
        "FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
        "k AS (SELECT y, r, r >= 1.0 OR h < printf('%08x', " +
        "CAST(least(floor(r * 4294967296.0), 4294967295.0) AS BIGINT)) " +
        "AS kept FROM b), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_pop, " +
        "CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS tt, " +
        "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_sampled, " +
        "CAST(sum(CASE WHEN kept THEN CAST(y / r AS DECIMAL(28,12)) " +
        "END) AS DOUBLE) AS ht FROM k) " +
        "SELECT n_pop, n_sampled, round(tt, 2) AS true_total, " +
        "round(ht, 2) AS ht_total, " +
        "round(CASE WHEN tt <> 0 THEN (ht - tt) / tt END, 6) " +
        "AS rel_err FROM m"),
      (s, dir) => Stats.horvitzThompson(Tables.lineitem(s, dir),
        col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
          col("l_suppkey"), "ht-v1", col("l_returnflag"),
        Seq("A" -> 0.3, "N" -> 0.2, "R" -> 0.5), defaultRate = 0.1,
        col("l_extendedprice"))),

    // ---- delete-one jackknife SE of price-per-unit: the resampling-
    // free cross-check of the q472 delta method.
    Q("q532_jackknife_ratio",
      Some("WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x, " +
        "CAST(l_quantity AS DOUBLE) AS y FROM lineitem WHERE " +
        "l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy FROM b), " +
        "p AS (SELECT (t.sx - b.x) / (t.sy - b.y) - t.sx / t.sy AS dc " +
        "FROM b, t), " +
        "m AS (SELECT CAST(sum(CAST(dc AS DECIMAL(28,12))) AS DOUBLE) " +
        "AS sd, CAST(sum(CAST(dc * dc AS DECIMAL(28,12))) AS DOUBLE) " +
        "AS sdd FROM p) " +
        "SELECT t.n AS n, round(CASE WHEN t.sy <> 0 THEN t.sx / t.sy " +
        "END, 6) AS ratio, " +
        "round(CASE WHEN t.n >= 2 AND (CAST(t.n AS DOUBLE) - 1.0) / " +
        "CAST(t.n AS DOUBLE) * (m.sdd - m.sd * m.sd / " +
        "CAST(t.n AS DOUBLE)) >= 0 THEN " +
        "sqrt((CAST(t.n AS DOUBLE) - 1.0) / CAST(t.n AS DOUBLE) * " +
        "(m.sdd - m.sd * m.sd / CAST(t.n AS DOUBLE))) END, 6) " +
        "AS se_jack FROM m, t"),
      (s, dir) => Stats.jackknifeRatio(Tables.lineitem(s, dir),
        col("l_extendedprice"), col("l_quantity"))),

    // ---- Dunning G2 keyness between src0 and src1 vocabularies: the
    // top-20 keywords with the exact integer direction cross-compare.
    Q("q533_keyness_g2",
      Some("WITH tk AS (SELECT source, unnest(regexp_split_to_array(" +
        "trim(lower(text)), '\\s+')) AS term FROM documents " +
        "WHERE source IN ('src0', 'src1')), " +
        "c AS (SELECT term, CAST(sum(CASE WHEN source = 'src0' THEN 1 " +
        "ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_b FROM tk WHERE term <> '' GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n_a) AS BIGINT) AS na, " +
        "CAST(sum(n_b) AS BIGINT) AS nb FROM c), " +
        "g AS (SELECT term, n_a, n_b, round(2.0 * " +
        "((CASE WHEN n_a > 0 THEN CAST(n_a AS DOUBLE) * " +
        "ln(CAST(n_a AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * " +
        "CAST(na AS DOUBLE) / (CAST(na AS DOUBLE) + " +
        "CAST(nb AS DOUBLE)))) ELSE 0.0 END) + " +
        "(CASE WHEN n_b > 0 THEN CAST(n_b AS DOUBLE) * " +
        "ln(CAST(n_b AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * " +
        "CAST(nb AS DOUBLE) / (CAST(na AS DOUBLE) + " +
        "CAST(nb AS DOUBLE)))) ELSE 0.0 END)), 6) AS g2, " +
        "n_a * nb > n_b * na AS over_a FROM c, t) " +
        "SELECT term, n_a, n_b, g2, over_a FROM g " +
        "ORDER BY g2 DESC, term LIMIT 20"),
      (s, dir) => TA.keynessG2(Tables.documents(s, dir), "text",
        col("source"), "src0", "src1", topN = 20)),

    // ---- information-gain feature panel on orders: priority, a price
    // decade bucket, and the order date's day-of-week against the
    // status label -- one union, one cell rollup, MI + gain ratio.
    Q("q534_info_gain",
      Some("WITH f AS (" +
        "SELECT 'o_orderpriority' AS feature, " +
        "CAST(o_orderpriority AS VARCHAR) AS a, " +
        "CAST(o_orderstatus AS VARCHAR) AS b FROM orders " +
        "WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT " +
        "NULL " +
        "UNION ALL SELECT 'price_bucket', " +
        "CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) " +
        "AS VARCHAR), CAST(o_orderstatus AS VARCHAR) FROM orders " +
        "WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL " +
        "UNION ALL SELECT 'date_dow', " +
        "CAST((epoch_us(o_orderdate) // 86400000000) % 7 AS VARCHAR), " +
        "CAST(o_orderstatus AS VARCHAR) FROM orders " +
        "WHERE o_orderstatus IS NOT NULL AND o_orderdate IS NOT " +
        "NULL), " +
        "cells AS (SELECT feature, a, b, CAST(count(*) AS BIGINT) AS c " +
        "FROM f GROUP BY 1, 2, 3), " +
        "ma AS (SELECT feature, a, CAST(sum(c) AS BIGINT) AS ca " +
        "FROM cells GROUP BY 1, 2), " +
        "mb AS (SELECT feature, b, CAST(sum(c) AS BIGINT) AS cb " +
        "FROM cells GROUP BY 1, 2), " +
        "t AS (SELECT feature, CAST(sum(c) AS BIGINT) AS n FROM cells " +
        "GROUP BY 1), " +
        "mi AS (SELECT cells.feature AS feature, any_value(t.n) AS n, " +
        "CAST(sum(CAST(CAST(cells.c AS DOUBLE) / CAST(t.n AS DOUBLE) * " +
        "ln(CAST(t.n AS DOUBLE) * CAST(cells.c AS DOUBLE) / " +
        "(CAST(ma.ca AS DOUBLE) * CAST(mb.cb AS DOUBLE))) " +
        "AS DECIMAL(28,12))) AS DOUBLE) AS miv " +
        "FROM cells JOIN ma ON cells.feature = ma.feature AND " +
        "cells.a = ma.a JOIN mb ON cells.feature = mb.feature AND " +
        "cells.b = mb.b JOIN t ON cells.feature = t.feature " +
        "GROUP BY 1), " +
        "hf AS (SELECT ma.feature AS feature, " +
        "CAST(sum(CAST(-(CAST(ma.ca AS DOUBLE) / CAST(t.n AS DOUBLE)) " +
        "* ln(CAST(ma.ca AS DOUBLE) / CAST(t.n AS DOUBLE)) " +
        "AS DECIMAL(28,12))) AS DOUBLE) AS hfv FROM ma " +
        "JOIN t ON ma.feature = t.feature GROUP BY 1) " +
        "SELECT mi.feature AS feature, mi.n, round(mi.miv, 6) AS mi, " +
        "round(hf.hfv, 6) AS h_feature, " +
        "round(CASE WHEN hf.hfv > 0 THEN mi.miv / hf.hfv END, 6) " +
        "AS gain_ratio FROM mi JOIN hf ON mi.feature = hf.feature " +
        "ORDER BY feature"),
      (s, dir) => Stats.infoGainPanel(
        Tables.orders(s, dir)
          .withColumn("price_bucket",
            expr("CAST(floor(o_totalprice / 50000.0) AS BIGINT)"))
          .withColumn("date_dow",
            expr("(unix_micros(o_orderdate) div 86400000000) % 7")),
        col("o_orderstatus"),
        Seq("o_orderpriority", "price_bucket", "date_dow"))
        .orderBy("feature")),

    // ---- Sobel mediation z on the events (dow -> hour -> value)
    // triple: all nine cross-moments in ONE decimal aggregate, both
    // regressions inlined. Small-magnitude variables keep every
    // decimal cast far under the conversion bound.
    Q("q535_sobel",
      Some("WITH b AS (SELECT " +
        "CAST((epoch_us(ts) // 86400000000) % 7 AS DOUBLE) AS x, " +
        "CAST((epoch_us(ts) // 3600000000) % 24 AS DOUBLE) AS m, " +
        "CAST(value AS DOUBLE) AS y FROM events " +
        "WHERE value IS NOT NULL), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(m AS DECIMAL(38,6))) AS DOUBLE) AS sm, " +
        "CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(m * m AS DECIMAL(38,6))) AS DOUBLE) AS smm, " +
        "CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy, " +
        "CAST(sum(CAST(x * m AS DECIMAL(38,6))) AS DOUBLE) AS sxm, " +
        "CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(m * y AS DECIMAL(38,6))) AS DOUBLE) AS smy " +
        "FROM b), " +
        "cc AS (SELECT n, CAST(n AS DOUBLE) AS nd, " +
        "sxx - sx * sx / CAST(n AS DOUBLE) AS cxx, " +
        "smm - sm * sm / CAST(n AS DOUBLE) AS cmm, " +
        "syy - sy * sy / CAST(n AS DOUBLE) AS cyy, " +
        "sxm - sx * sm / CAST(n AS DOUBLE) AS cxm, " +
        "sxy - sx * sy / CAST(n AS DOUBLE) AS cxy, " +
        "smy - sm * sy / CAST(n AS DOUBLE) AS cmy FROM a), " +
        "p1 AS (SELECT *, CASE WHEN n >= 4 AND cxx > 0 THEN cxm / cxx " +
        "END AS apath FROM cc), " +
        "p2 AS (SELECT *, cmm - apath * cxm AS ssra, " +
        "cmm * cxx - cxm * cxm AS det FROM p1), " +
        "p3 AS (SELECT *, CASE WHEN ssra > 0 THEN ssra / (nd - 2.0) / " +
        "cxx END AS sea2, " +
        "CASE WHEN n >= 4 AND det > 0 THEN " +
        "(cmy * cxx - cxy * cxm) / det END AS bpath, " +
        "CASE WHEN n >= 4 AND det > 0 THEN " +
        "(cxy * cmm - cmy * cxm) / det END AS cprime FROM p2), " +
        "p4 AS (SELECT *, cyy - bpath * cmy - cprime * cxy AS ssrb " +
        "FROM p3), " +
        "p5 AS (SELECT *, CASE WHEN ssrb > 0 THEN ssrb / (nd - 3.0) * " +
        "(cxx / det) END AS seb2 FROM p4) " +
        "SELECT n, round(apath, 6) AS a_path, round(bpath, 6) " +
        "AS b_path, round(apath * bpath, 6) AS indirect, " +
        "round(CASE WHEN sea2 > 0 AND seb2 > 0 THEN apath * bpath / " +
        "sqrt(apath * apath * seb2 + bpath * bpath * sea2) END, 6) " +
        "AS sobel_z FROM p5"),
      (s, dir) => Stats.sobelMediation(
        Tables.events(s, dir).filter(col("value").isNotNull),
        expr("(unix_micros(ts) div 86400000000) % 7").cast("double"),
        expr("(unix_micros(ts) div 3600000000) % 24").cast("double"),
        col("value"))),

    // ---- E-value for the urgent-priority -> fulfilled-status risk
    // ratio: the minimum confounding strength that explains it away.
    Q("q536_evalue",
      Some("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' AND " +
        "o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' AND NOT " +
        "(o_orderstatus = 'F') THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN NOT (o_orderpriority = '1-URGENT') AND " +
        "o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN NOT (o_orderpriority = '1-URGENT') AND " +
        "NOT (o_orderstatus = 'F') THEN 1 ELSE 0 END) AS BIGINT) AS d " +
        "FROM orders WHERE o_orderpriority IS NOT NULL AND " +
        "o_orderstatus IS NOT NULL), " +
        "r AS (SELECT n, CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) " +
        "AS p1, CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE) AS p0, " +
        "a, b, c, d FROM m), " +
        "r2 AS (SELECT n, p1, p0, a, b, c, d, " +
        "CASE WHEN a + b > 0 AND c + d > 0 AND c > 0 AND a > 0 THEN " +
        "p1 / p0 END AS rr FROM r), " +
        "r3 AS (SELECT *, greatest(rr, 1.0 / rr) AS rrs FROM r2) " +
        "SELECT n, round(CASE WHEN a + b > 0 THEN p1 END, 6) " +
        "AS p_exposed, " +
        "round(CASE WHEN c + d > 0 THEN p0 END, 6) AS p_unexposed, " +
        "round(rr, 6) AS rr, " +
        "round(rrs + sqrt(rrs * (rrs - 1.0)), 6) AS e_value FROM r3"),
      (s, dir) => Stats.eValueRR(Tables.orders(s, dir),
        col("o_orderpriority") === "1-URGENT",
        col("o_orderstatus") === "F")),

    // ---- indirectly standardized delinquency (negative balance) per
    // market segment, stratified by nation: SMR = O/E with exact O and
    // decimal-summed stratum-rate expectations.
    Q("q537_smr",
      Some("WITH cells AS (SELECT c_mktsegment AS \"group\", " +
        "c_nationkey AS s, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS e FROM customer WHERE c_mktsegment IS NOT NULL " +
        "AND c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL " +
        "GROUP BY 1, 2), " +
        "st AS (SELECT s, CAST(sum(n) AS BIGINT) AS ns, " +
        "CAST(sum(e) AS BIGINT) AS es FROM cells GROUP BY 1), " +
        "j AS (SELECT cells.\"group\" AS \"group\", cells.n, cells.e, " +
        "CAST(CAST(cells.n AS DOUBLE) * CAST(st.es AS DOUBLE) / " +
        "CAST(st.ns AS DOUBLE) AS DECIMAL(28,12)) AS term " +
        "FROM cells JOIN st ON cells.s = st.s), " +
        "g AS (SELECT \"group\", CAST(sum(n) AS BIGINT) AS n, " +
        "CAST(sum(e) AS BIGINT) AS observed, " +
        "CAST(sum(term) AS DOUBLE) AS expd FROM j GROUP BY 1) " +
        "SELECT \"group\", n, observed, round(expd, 6) AS expected, " +
        "round(CASE WHEN expd > 0 THEN CAST(observed AS DOUBLE) / " +
        "expd END, 6) AS smr FROM g ORDER BY \"group\""),
      (s, dir) => Stats.smrIndirect(Tables.customer(s, dir),
        col("c_mktsegment"), col("c_nationkey"),
        col("c_acctbal") < 0).orderBy("group")),

    // ---- risk difference + Levin PAF for deep-discount exposure vs
    // the returned flag: exact integer rationals end to end.
    Q("q538_attributable_risk",
      Some("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN l_discount > 0.05 AND l_returnflag = 'R' " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN l_discount > 0.05 AND NOT " +
        "(l_returnflag = 'R') THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN NOT (l_discount > 0.05) AND " +
        "l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN NOT (l_discount > 0.05) AND NOT " +
        "(l_returnflag = 'R') THEN 1 ELSE 0 END) AS BIGINT) AS d " +
        "FROM lineitem WHERE l_discount IS NOT NULL AND " +
        "l_returnflag IS NOT NULL), " +
        "r AS (SELECT n, a, b, c, d, " +
        "CASE WHEN a + b > 0 THEN CAST(a AS DOUBLE) / " +
        "CAST(a + b AS DOUBLE) END AS p1, " +
        "CASE WHEN c + d > 0 THEN CAST(c AS DOUBLE) / " +
        "CAST(c + d AS DOUBLE) END AS p0, " +
        "CAST(a + c AS DOUBLE) / CAST(n AS DOUBLE) AS pt FROM m) " +
        "SELECT n, round(p1, 6) AS p_exposed, " +
        "round(p0, 6) AS p_unexposed, round(p1 - p0, 6) AS risk_diff, " +
        "round(CASE WHEN n > 0 AND pt > 0 THEN (pt - p0) / pt END, 6) " +
        "AS paf FROM r"),
      (s, dir) => Stats.attributableRisk(Tables.lineitem(s, dir),
        col("l_discount") > 0.05, col("l_returnflag") === "R"))
  )
}
