package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{EventAnalytics, Finance, Stats}

/** Round-11 hypothesis-test drivers: variance-homogeneity (Bartlett,
  * Conover squared ranks), single-outlier screening (Grubbs), and the
  * ordinal association family (gamma / Somers' D / tau-c). Each entry
  * names the library operator it exercises; every one is oracle-checked
  * with the exact dual-engine arithmetic discipline (decimal moment sums,
  * data-element medians, integer doubled midranks).
  */
object StatsQueries4 {

  val qs: Seq[Q] = Seq(

    // ---- Bartlett variance-homogeneity across order priorities: one
    // decimal-moment groupBy + a 5-row finish — no second scan, no window.
    Q("q429_bartlett",
      Some("WITH g AS (SELECT o_orderpriority, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sv, " +
        "CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS pv FROM orders WHERE o_orderpriority IS NOT NULL " +
        "AND o_totalprice IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 2), " +
        "s AS (SELECT n, (pv - sv * sv / n) / (n - 1.0) AS s2 FROM g), " +
        "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, " +
        "CAST(SUM(n) AS BIGINT) AS n, " +
        "SUM((n - 1.0) * ln(CASE WHEN s2 > 0 THEN s2 END)) AS sln, " +
        "SUM((n - 1.0) * s2) AS ssw, SUM(1.0 / (n - 1.0)) AS sinv, " +
        "MIN(s2) AS minv FROM s) " +
        "SELECT n_groups, n, n_groups - 1 AS df, " +
        "round(CASE WHEN n_groups >= 2 AND minv > 0 THEN " +
        "((n - n_groups) * ln(ssw / (n - n_groups)) - sln) / " +
        "(1.0 + (sinv - 1.0 / (n - n_groups)) / (3.0 * (n_groups - 1.0))) " +
        "END, 6) AS t_stat FROM a"),
      (s, dir) => Stats.bartlettTest(Tables.orders(s, dir),
        col("o_orderpriority"), col("o_totalprice"))),

    // ---- Grubbs single-outlier screen on event values: two scans (decimal
    // moments, then max |gap|), deterministic min-value pick on the exact
    // IEEE tie set.
    Q("q430_grubbs",
      Some("WITH b AS (SELECT value AS v FROM events " +
        "WHERE value IS NOT NULL), " +
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sv, " +
        "CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS pv FROM b), " +
        "s AS (SELECT n, sv / n AS mean, " +
        "sqrt((pv - sv * sv / n) / (n - 1.0)) AS sd FROM m), " +
        "g AS (SELECT s.n, s.mean, s.sd, max(abs(b.v - s.mean)) AS gmax " +
        "FROM b, s GROUP BY 1, 2, 3), " +
        "p AS (SELECT min(b.v) AS outlier_value FROM b, g " +
        "WHERE abs(b.v - g.mean) = g.gmax) " +
        "SELECT g.n, round(g.mean, 6) AS mean, round(g.sd, 6) AS sd, " +
        "round(CASE WHEN g.n >= 3 AND g.sd > 0 THEN g.gmax / g.sd END, 6) " +
        "AS g_stat, p.outlier_value FROM g, p"),
      (s, dir) => Stats.grubbsTest(Tables.events(s, dir), col("value"))),

    // ---- ordinal association: does quantity trend with line number?
    // 7x50 cells self-join broadcast (the kendallTau shape); gamma ignores
    // ties, Somers' D penalizes the dependent's, tau-c rates the rectangle.
    Q("q431_ordinal_assoc",
      Some("WITH cells AS (SELECT CAST(l_linenumber AS DOUBLE) AS x, " +
        "CAST(l_quantity AS DOUBLE) AS y, CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM lineitem WHERE l_linenumber IS NOT NULL AND " +
        "l_quantity IS NOT NULL GROUP BY 1, 2), " +
        "cd AS (SELECT CAST(coalesce(sum(CASE WHEN b.y > a.y THEN " +
        "CAST(a.cnt AS HUGEINT) * b.cnt END), 0) AS DOUBLE) AS conc, " +
        "CAST(coalesce(sum(CASE WHEN b.y < a.y THEN " +
        "CAST(a.cnt AS HUGEINT) * b.cnt END), 0) AS DOUBLE) AS disc, " +
        "CAST(coalesce(sum(CASE WHEN b.y = a.y THEN " +
        "CAST(a.cnt AS HUGEINT) * b.cnt END), 0) AS DOUBLE) AS ty_only " +
        "FROM cells a JOIN cells b ON a.x < b.x), " +
        "tx AS (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS DOUBLE) " +
        "AS tx2, CAST(COUNT(*) AS BIGINT) AS r FROM (SELECT x, " +
        "CAST(SUM(cnt) AS BIGINT) AS t FROM cells GROUP BY 1)), " +
        "ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (SELECT y " +
        "FROM cells GROUP BY 1)), " +
        "cs AS (SELECT CAST(sum(CAST(cnt AS HUGEINT) * (cnt - 1)) " +
        "AS DOUBLE) AS cell2, CAST(SUM(cnt) AS BIGINT) AS n FROM cells) " +
        "SELECT n, r, c, conc, disc, " +
        "round(CASE WHEN conc + disc > 0 THEN (conc - disc) / " +
        "(conc + disc) END, 6) AS gamma, " +
        "round(CASE WHEN conc + disc + ty_only > 0 THEN (conc - disc) / " +
        "(conc + disc + ty_only) END, 6) AS somers_d_yx, " +
        "round(CASE WHEN conc + disc + (tx2 - cell2) / 2.0 > 0 THEN " +
        "(conc - disc) / (conc + disc + (tx2 - cell2) / 2.0) END, 6) " +
        "AS somers_d_xy, " +
        "round(CASE WHEN n > 1 AND least(r, c) > 1 THEN " +
        "2.0 * CAST(least(r, c) AS DOUBLE) * (conc - disc) / " +
        "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * " +
        "(CAST(least(r, c) AS DOUBLE) - 1.0)) END, 6) AS tau_c " +
        "FROM cd, tx, ty, cs"),
      (s, dir) => Stats.ordinalAssociation(Tables.lineitem(s, dir),
        col("l_linenumber"), col("l_quantity"))),

    // ---- Conover squared-ranks variance test: returned-vs-kept line
    // quantities. Deviations from each group's lower-median ELEMENT,
    // doubled integer midranks, exact decimal S2/S4 -> one z finish.
    Q("q432_conover_ranks",
      Some("WITH base AS (SELECT l_returnflag AS g, " +
        "CAST(l_quantity AS DOUBLE) AS v FROM lineitem " +
        "WHERE l_returnflag IN ('A', 'N') AND l_quantity IS NOT NULL), " +
        "r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) " +
        "AS rn, count(*) OVER (PARTITION BY g) AS n FROM base), " +
        "med AS (SELECT g, v AS med FROM r WHERE rn = (n + 1) // 2), " +
        "dev AS (SELECT base.g, abs(base.v - med.med) AS u " +
        "FROM base JOIN med USING (g)), " +
        "cells AS (SELECT u, CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS ca, CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS cb FROM dev GROUP BY 1), " +
        "cum AS (SELECT ca, cb, CAST(sum(ca + cb) OVER (ORDER BY u " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS f FROM cells), " +
        "w AS (SELECT ca, cb, CAST(f * 2 - (ca + cb) + 1 AS HUGEINT) " +
        "AS r2 FROM cum), " +
        "a AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, " +
        "CAST(sum(cb) AS BIGINT) AS n_b, " +
        "CAST(sum(CAST(ca AS HUGEINT) * r2 * r2) AS DOUBLE) / 4.0 AS t, " +
        "CAST(sum((ca + cb) * r2 * r2) AS DOUBLE) / 4.0 AS s2, " +
        "CAST(sum((ca + cb) * r2 * r2 * r2 * r2) AS DOUBLE) / 16.0 AS s4 " +
        "FROM w), " +
        "z AS (SELECT n_a, n_b, t, s2, s4, CAST(n_a AS DOUBLE) AS na, " +
        "CAST(n_b AS DOUBLE) AS nb, CAST(n_a + n_b AS DOUBLE) AS nd " +
        "FROM a) " +
        "SELECT n_a, n_b, round(t, 6) AS t_stat, " +
        "round(CASE WHEN n_a > 0 AND n_b > 0 AND " +
        "na * nb / (nd * (nd - 1.0)) * (s4 - s2 * s2 / nd) > 0 THEN " +
        "(t - na * s2 / nd) / sqrt(na * nb / (nd * (nd - 1.0)) * " +
        "(s4 - s2 * s2 / nd)) END, 6) AS z FROM z"),
      (s, dir) => Stats.conoverSquaredRanks(Tables.lineitem(s, dir),
        "l_returnflag", "l_quantity", "A", "N")),

    // ---- turning-points randomness of the zero-filled daily count series:
    // strict local extrema from two integer lag windows over the
    // calendar-bounded spine (the q389 family).
    Q("q433_turning_points",
      Some("WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "s AS (SELECT r.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n " +
        "FROM r LEFT JOIN c USING (day)), " +
        "f AS (SELECT n - lag(n) OVER (ORDER BY day) AS d1, " +
        "lead(n) OVER (ORDER BY day) - n AS d2 FROM s), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(CASE WHEN (d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS turning_points FROM f) " +
        "SELECT n_days, turning_points, " +
        "round(CASE WHEN n_days >= 3 AND " +
        "(16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0 > 0 THEN " +
        "(CAST(turning_points AS DOUBLE) - " +
        "2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0) / " +
        "sqrt((16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0) END, 6) AS z " +
        "FROM a"),
      (s, dir) => EventAnalytics.turningPointsDaily(
        Tables.events(s, dir), "ts")),

    // ---- Cox-Stuart sign test for trend: first-half days pair with
    // second-half days on one integer equi-join (no window at all), the
    // middle day drops when the spine is odd.
    Q("q434_cox_stuart",
      Some("WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "s AS (SELECT r.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n " +
        "FROM r LEFT JOIN c USING (day)), " +
        "meta AS (SELECT CAST(count(*) AS BIGINT) AS nd, " +
        "min(day) AS d0 FROM s), " +
        "h AS (SELECT n, nd, nd // 2 AS m, day - d0 AS i FROM s, meta), " +
        "e AS (SELECT i AS k, n AS n1, nd FROM h WHERE i < m), " +
        "l AS (SELECT i - (nd - m) AS k, n AS n2 FROM h " +
        "WHERE i >= nd - m), " +
        "a AS (SELECT any_value(e.nd) AS n_days, " +
        "CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CASE WHEN n2 > n1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS s_plus, " +
        "CAST(sum(CASE WHEN n2 < n1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS s_minus FROM e JOIN l USING (k)) " +
        "SELECT n_days, n_pairs, s_plus, s_minus, " +
        "round(CASE WHEN s_plus + s_minus > 0 THEN " +
        "(CAST(s_plus AS DOUBLE) - " +
        "CAST(s_plus + s_minus AS DOUBLE) / 2.0) / " +
        "sqrt(CAST(s_plus + s_minus AS DOUBLE) / 4.0) END, 6) AS z " +
        "FROM a"),
      (s, dir) => EventAnalytics.coxStuartDaily(Tables.events(s, dir),
        "ts")),

    // ---- Hurst exponent by rescaled range: complete div-s blocks keyed by
    // (size, block) — every window partitions by block; integer-exact
    // sums/cumsums; ln-ln OLS over the size grid (4/8/16 here: the events
    // spine is 30 days, so larger blocks would leave <2 fit points).
    Q("q435_hurst",
      Some("WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "s AS (SELECT r.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n " +
        "FROM r LEFT JOIN c USING (day)), " +
        "d0 AS (SELECT min(day) AS d0 FROM s), " +
        "t AS (SELECT day - d0 AS t, n FROM s, d0), " +
        "sz AS (SELECT unnest([4, 8, 16]) AS bs), " +
        "b AS (SELECT CAST(bs AS BIGINT) AS block_size, t // bs AS blk, " +
        "t % bs AS i, n FROM t, sz), " +
        "w AS (SELECT block_size, blk, i, " +
        "sum(n) OVER (PARTITION BY block_size, blk ORDER BY i " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs, " +
        "sum(n) OVER (PARTITION BY block_size, blk) AS tot, " +
        "sum(CAST(n AS HUGEINT) * n) OVER (PARTITION BY block_size, blk) " +
        "AS ss, count(*) OVER (PARTITION BY block_size, blk) AS cnt " +
        "FROM b), " +
        "cd AS (SELECT block_size, blk, CAST(cs AS DOUBLE) - " +
        "CAST(i + 1 AS DOUBLE) * (CAST(tot AS DOUBLE) / " +
        "CAST(block_size AS DOUBLE)) AS cdv, " +
        "(CAST(ss AS DOUBLE) - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) " +
        "/ CAST(block_size AS DOUBLE)) / CAST(block_size AS DOUBLE) AS s2 " +
        "FROM w WHERE cnt = block_size), " +
        "pb AS (SELECT block_size, blk, (greatest(max(cdv), 0.0) - " +
        "least(min(cdv), 0.0)) / sqrt(any_value(s2)) AS rs FROM cd " +
        "GROUP BY 1, 2 HAVING any_value(s2) > 0), " +
        "ps AS (SELECT block_size, CAST(count(*) AS BIGINT) AS n_blocks, " +
        "avg(rs) AS mrs FROM pb GROUP BY 1), " +
        "fit AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(x) AS sx, " +
        "sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy FROM " +
        "(SELECT ln(CAST(block_size AS DOUBLE)) AS x, ln(mrs) AS y " +
        "FROM ps)) " +
        "SELECT block_size, n_blocks, round(mrs, 6) AS mean_rs, " +
        "round(CASE WHEN k >= 2 THEN (CAST(k AS DOUBLE) * sxy - sx * sy) " +
        "/ (CAST(k AS DOUBLE) * sxx - sx * sx) END, 6) AS h " +
        "FROM ps, fit ORDER BY block_size"),
      (s, dir) => EventAnalytics.hurstDaily(Tables.events(s, dir), "ts",
        sizes = Seq(4, 8, 16))),

    // ---- periodogram of daily counts at k = 1..30: the spine cross-joins
    // a broadcast frequency grid into ONE groupBy — no window; power
    // normalized by (n*ybar)^2 so the 6dp round sits 6 orders above
    // cross-engine trig/summation noise. The weekly cycle spikes near
    // period 7.
    Q("q436_periodogram",
      Some("WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "s AS (SELECT r.day, CAST(coalesce(c.n, 0) AS BIGINT) AS n " +
        "FROM r LEFT JOIN c USING (day)), " +
        "meta AS (SELECT min(day) AS d0, CAST(count(*) AS BIGINT) AS nd, " +
        "CAST(sum(n) AS BIGINT) AS tot FROM s), " +
        "t AS (SELECT day - d0 AS t, n, nd, tot FROM s, meta), " +
        "kk AS (SELECT unnest(range(1, 31)) AS k), " +
        "a AS (SELECT k, any_value(nd) AS nd, any_value(tot) AS tot, " +
        "sum(CAST(n AS DOUBLE) * cos(2.0 * pi() * CAST(k AS DOUBLE) * " +
        "CAST(t AS DOUBLE) / CAST(nd AS DOUBLE))) AS cc, " +
        "sum(CAST(n AS DOUBLE) * sin(2.0 * pi() * CAST(k AS DOUBLE) * " +
        "CAST(t AS DOUBLE) / CAST(nd AS DOUBLE))) AS ss " +
        "FROM t, kk GROUP BY k) " +
        "SELECT k, round(CAST(nd AS DOUBLE) / CAST(k AS DOUBLE), 2) " +
        "AS period, round(CASE WHEN tot > 0 THEN (cc * cc + ss * ss) / " +
        "(CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) END, 6) " +
        "AS norm_power FROM a ORDER BY k"),
      (s, dir) => EventAnalytics.periodogramDaily(Tables.events(s, dir),
        "ts", maxK = 30)),

    // ---- Cutler RSI over three synthetic tickers' daily close series
    // (the q355 bars): exact integer gain/loss sums in key-partitioned
    // 14-bar windows, one division per row. Ticker filter pushes to the
    // bar build on both engines.
    Q("q437_rsi",
      Some("WITH t AS (SELECT l_suppkey % 25 AS key, " +
        "epoch_us(l_shipdate) // 86400000000 AS day, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey AS tie, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem " +
        "WHERE l_suppkey % 25 IN (3, 7, 11)), " +
        "b AS (SELECT key, day, arg_max(c, tie) AS cl FROM t " +
        "GROUP BY 1, 2), " +
        "d AS (SELECT key, day, cl - lag(cl) OVER " +
        "(PARTITION BY key ORDER BY day) AS dd FROM b), " +
        "f AS (SELECT key, day, dd FROM d WHERE dd IS NOT NULL), " +
        "r AS (SELECT key, day, " +
        "sum(CASE WHEN dd > 0 THEN dd ELSE 0 END) OVER w AS g, " +
        "sum(CASE WHEN dd < 0 THEN -dd ELSE 0 END) OVER w AS l, " +
        "count(*) OVER w AS k FROM f WINDOW w AS " +
        "(PARTITION BY key ORDER BY day " +
        "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) " +
        "SELECT key, day, round(CASE WHEN g + l > 0 THEN " +
        "100.0 * CAST(g AS DOUBLE) / CAST(g + l AS DOUBLE) END, 6) AS rsi " +
        "FROM r WHERE k = 14 ORDER BY key, day"),
      (s, dir) => Finance.cutlersRsi(
        Finance.dailyBars(
          Tables.lineitem(s, dir)
            .withColumn("ticker", pmod(col("l_suppkey"), lit(25L)))
            .filter(col("ticker").isin(3L, 7L, 11L)),
          "ticker", "l_shipdate",
          col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
            col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity")),
        "key", "day", col("close"), window = 14)
        .orderBy("key", "day")),

    // ---- Bollinger breach census per ticker: 20-bar mean +/- 2 sigma
    // envelopes from exact integer window moments; the breach compares
    // UNROUNDED IEEE bands, so the counts carry no rounding step.
    Q("q438_bollinger",
      Some("WITH t AS (SELECT l_suppkey % 25 AS key, " +
        "epoch_us(l_shipdate) // 86400000000 AS day, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey AS tie, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem), " +
        "b AS (SELECT key, day, arg_max(c, tie) AS cl FROM t " +
        "GROUP BY 1, 2), " +
        "r AS (SELECT key, cl, sum(cl) OVER w AS s, " +
        "sum(CAST(cl AS HUGEINT) * cl) OVER w AS ss, count(*) OVER w AS k " +
        "FROM b WINDOW w AS (PARTITION BY key ORDER BY day " +
        "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)), " +
        "m AS (SELECT key, cl, k, CAST(s AS DOUBLE) / 20.0 AS mean, " +
        "sqrt((20.0 * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * " +
        "CAST(s AS DOUBLE)) / (20.0 * 20.0)) AS sig FROM r) " +
        "SELECT key, CAST(count(*) AS BIGINT) AS n_bars, " +
        "CAST(sum(CASE WHEN k = 20 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_windows, " +
        "CAST(sum(CASE WHEN k = 20 AND CAST(cl AS DOUBLE) > " +
        "mean + 2.0 * sig THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_up, " +
        "CAST(sum(CASE WHEN k = 20 AND CAST(cl AS DOUBLE) < " +
        "mean - 2.0 * sig THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_down " +
        "FROM m GROUP BY key ORDER BY key"),
      (s, dir) => Finance.bollingerBreaches(
        Finance.dailyBars(
          Tables.lineitem(s, dir)
            .withColumn("ticker", pmod(col("l_suppkey"), lit(25L))),
          "ticker", "l_shipdate",
          col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
            col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity")),
        "key", "day", col("close"), window = 20, k = 2.0)
        .orderBy("key")),

    // ---- historical VaR/CVaR of per-ticker daily close moves: the tail
    // cut is an order-statistic DATA ELEMENT (ceil-rank, day tiebreak),
    // the tail mean an exact decimal sum — no interpolation anywhere.
    Q("q439_hist_var",
      Some("WITH t AS (SELECT l_suppkey % 25 AS key, " +
        "epoch_us(l_shipdate) // 86400000000 AS day, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey AS tie, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem), " +
        "b AS (SELECT key, day, arg_max(c, tie) AS cl FROM t " +
        "GROUP BY 1, 2), " +
        "d AS (SELECT key, day, cl - lag(cl) OVER " +
        "(PARTITION BY key ORDER BY day) AS dd FROM b), " +
        "f AS (SELECT key, day, dd FROM d WHERE dd IS NOT NULL), " +
        "r AS (SELECT key, day, dd, row_number() OVER " +
        "(PARTITION BY key ORDER BY dd, day) AS rn, " +
        "count(*) OVER (PARTITION BY key) AS n FROM f), " +
        "s AS (SELECT key, dd, rn, n, " +
        "CAST(ceil(CAST(n AS DOUBLE) * 0.05) AS BIGINT) AS idx FROM r) " +
        "SELECT key, any_value(n) AS n_diffs, " +
        "CAST(count(*) AS BIGINT) AS n_tail, " +
        "round(CAST(max(dd) AS DOUBLE) / 100.0, 6) AS var_amt, " +
        "round(CAST(sum(CAST(dd AS HUGEINT)) AS DOUBLE) / " +
        "(CAST(count(*) AS DOUBLE) * 100.0), 6) AS cvar_amt " +
        "FROM s WHERE rn <= idx GROUP BY key ORDER BY key"),
      (s, dir) => Finance.historicalVar(
        Finance.dailyBars(
          Tables.lineitem(s, dir)
            .withColumn("ticker", pmod(col("l_suppkey"), lit(25L))),
          "ticker", "l_shipdate",
          col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
            col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity")),
        "key", "day", col("close"), alpha = 0.05)
        .orderBy("key")),

    // ---- ulcer index per ticker: RMS percentage drawdown below the
    // integer-cent running peak — the chronic-pain complement to q293's
    // single worst trough.
    Q("q440_ulcer",
      Some("WITH t AS (SELECT l_suppkey % 25 AS key, " +
        "epoch_us(l_shipdate) // 86400000000 AS day, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey AS tie, " +
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem), " +
        "b AS (SELECT key, day, arg_max(c, tie) AS cl FROM t " +
        "GROUP BY 1, 2), " +
        "r AS (SELECT key, cl, max(cl) OVER (PARTITION BY key " +
        "ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS pk FROM b), " +
        "d AS (SELECT key, 100.0 * CAST(pk - cl AS DOUBLE) / " +
        "CAST(pk AS DOUBLE) AS dd FROM r WHERE pk > 0) " +
        "SELECT key, CAST(count(*) AS BIGINT) AS n_bars, " +
        "round(max(dd), 6) AS max_dd_pct, " +
        "round(sqrt(sum(dd * dd) / CAST(count(*) AS DOUBLE)), 6) AS ulcer " +
        "FROM d GROUP BY key ORDER BY key"),
      (s, dir) => Finance.ulcerIndex(
        Finance.dailyBars(
          Tables.lineitem(s, dir)
            .withColumn("ticker", pmod(col("l_suppkey"), lit(25L))),
          "ticker", "l_shipdate",
          col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
            col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity")),
        "key", "day", col("close"))
        .orderBy("key")),

    // ---- Fisher's exact test: does a positive balance associate with the
    // BUILDING segment? Unnormalized hypergeometric log-weights over the
    // exploded support, one sequential cumulative window, max-shifted
    // exp sums — no factorial ever materializes.
    Q("q441_fisher_exact",
      Some("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS r1, " +
        "CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS c1, " +
        "CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal > 0 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS a_obs FROM customer), " +
        "sup AS (SELECT n, r1, c1, a_obs, " +
        "unnest(range(greatest(0, r1 + c1 - n), least(r1, c1) + 1)) AS x " +
        "FROM m), " +
        "t AS (SELECT *, CASE WHEN x = greatest(0, r1 + c1 - n) THEN 0.0 " +
        "ELSE ln(CAST((r1 - (x - 1)) * (c1 - (x - 1)) AS DOUBLE)) - " +
        "ln(CAST(x * (n - r1 - c1 + x) AS DOUBLE)) END AS term FROM sup), " +
        "w AS (SELECT *, sum(term) OVER (ORDER BY x ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS lnw FROM t), " +
        "obs AS (SELECT lnw AS lnobs FROM w WHERE x = a_obs), " +
        "mx AS (SELECT max(lnw) AS m FROM w), " +
        "s AS (SELECT any_value(n) AS n, any_value(r1) AS r1, " +
        "any_value(c1) AS c1, any_value(a_obs) AS a_obs, " +
        "sum(exp(lnw - mx.m)) AS tot, " +
        "sum(CASE WHEN lnw <= obs.lnobs + 1e-7 THEN exp(lnw - mx.m) " +
        "ELSE 0.0 END) AS sel FROM w, obs, mx) " +
        "SELECT n, r1, c1, a_obs, " +
        "round(CASE WHEN (r1 - a_obs) * (c1 - a_obs) > 0 THEN " +
        "CAST(a_obs * (n - r1 - c1 + a_obs) AS DOUBLE) / " +
        "CAST((r1 - a_obs) * (c1 - a_obs) AS DOUBLE) END, 6) " +
        "AS or_sample, round(sel / tot, 6) AS p_two FROM s"),
      (s, dir) => Stats.fisherExact(Tables.customer(s, dir),
        col("c_mktsegment") === "BUILDING", col("c_acctbal") > 0)),

    // ---- Krippendorff's alpha: do an order's lines agree on the return
    // flag? Units = orders (singletons drop as unpairable), nominal
    // categories = flags; rational disagreement terms sum as
    // DECIMAL(28,12) — order-independent on both engines.
    Q("q442_krippendorff",
      Some("WITH cells AS (SELECT l_orderkey AS u, l_returnflag AS c, " +
        "CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2), " +
        "units AS (SELECT u, CAST(sum(n) AS BIGINT) AS mu FROM cells " +
        "GROUP BY 1 HAVING sum(n) >= 2), " +
        "p AS (SELECT cells.u, cells.c, cells.n, units.mu FROM cells " +
        "JOIN units USING (u)), " +
        "ua AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_units, " +
        "sum(CAST(CAST(n * (mu - n) AS DOUBLE) / CAST(mu - 1 AS DOUBLE) " +
        "AS DECIMAL(28,12))) AS dosum FROM p), " +
        "cats AS (SELECT c, CAST(sum(n) AS BIGINT) AS nc FROM p " +
        "GROUP BY 1), " +
        "ca AS (SELECT CAST(count(*) AS BIGINT) AS n_categories, " +
        "CAST(sum(nc) AS BIGINT) AS n_ratings, " +
        "sum(CAST(nc AS HUGEINT) * nc) AS sqc FROM cats), " +
        "f AS (SELECT n_units, n_ratings, n_categories, " +
        "CAST(dosum AS DOUBLE) / CAST(n_ratings AS DOUBLE) AS dov, " +
        "(CAST(n_ratings AS DOUBLE) * CAST(n_ratings AS DOUBLE) - " +
        "CAST(sqc AS DOUBLE)) / (CAST(n_ratings AS DOUBLE) * " +
        "(CAST(n_ratings AS DOUBLE) - 1.0)) AS dev FROM ua, ca) " +
        "SELECT n_units, n_ratings, n_categories, round(dov, 6) AS d_o, " +
        "round(dev, 6) AS d_e, round(CASE WHEN n_ratings > 1 AND dev > 0 " +
        "THEN 1.0 - dov / dev END, 6) AS alpha FROM f"),
      (s, dir) => Stats.krippendorffAlpha(Tables.lineitem(s, dir),
        col("l_orderkey"), col("l_returnflag"))),

    // ---- Breslow-Day homogeneity of the deep-discount -> bulk-quantity
    // odds ratio across line numbers: the quadratic expected-cell root at
    // the MH common OR, strata summed over the bounded vocabulary.
    Q("q443_breslow_day",
      Some("WITH g AS (SELECT l_linenumber AS s, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN l_discount > 0.05 AND l_quantity > 25 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN l_discount > 0.05 AND NOT l_quantity > 25 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN NOT l_discount > 0.05 AND l_quantity > 25 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN NOT l_discount > 0.05 AND " +
        "NOT l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS d " +
        "FROM lineitem GROUP BY 1), " +
        "ps AS (SELECT sum(CAST(CAST(a * d AS DOUBLE) / " +
        "CAST(n AS DOUBLE) AS DECIMAL(28,12))) AS ad, " +
        "sum(CAST(CAST(b * c AS DOUBLE) / CAST(n AS DOUBLE) " +
        "AS DECIMAL(28,12))) AS bc FROM g), " +
        "w AS (SELECT g.*, CASE WHEN bc > 0 THEN CAST(ad AS DOUBLE) / " +
        "CAST(bc AS DOUBLE) END AS psi FROM g, ps), " +
        "e AS (SELECT *, CAST(a + b AS DOUBLE) AS r1, " +
        "CAST(a + c AS DOUBLE) AS c1, CAST(n AS DOUBLE) AS nd FROM w), " +
        "q AS (SELECT *, 1.0 - psi AS qa, (nd - r1 - c1) + " +
        "psi * (r1 + c1) AS qb, -psi * r1 * c1 AS qc FROM e), " +
        "r AS (SELECT *, qb * qb - 4.0 * qa * qc AS disc, " +
        "greatest(0.0, r1 + c1 - nd) AS lob, least(r1, c1) AS hib " +
        "FROM q), " +
        "rt AS (SELECT *, CASE WHEN abs(qa) < 1e-12 THEN -qc / qb " +
        "WHEN disc >= 0 AND (-qb + sqrt(disc)) / (2.0 * qa) > lob AND " +
        "(-qb + sqrt(disc)) / (2.0 * qa) < hib THEN " +
        "(-qb + sqrt(disc)) / (2.0 * qa) " +
        "WHEN disc >= 0 AND (-qb - sqrt(disc)) / (2.0 * qa) > lob AND " +
        "(-qb - sqrt(disc)) / (2.0 * qa) < hib THEN " +
        "(-qb - sqrt(disc)) / (2.0 * qa) END AS at FROM r), " +
        "ct AS (SELECT *, r1 - at AS bt, c1 - at AS ctt, " +
        "nd - r1 - c1 + at AS dt2 FROM rt), " +
        "cb AS (SELECT *, CASE WHEN at IS NOT NULL AND at > 0 AND " +
        "bt > 0 AND ctt > 0 AND dt2 > 0 THEN " +
        "(CAST(a AS DOUBLE) - at) * (CAST(a AS DOUBLE) - at) * " +
        "(1.0 / at + 1.0 / bt + 1.0 / ctt + 1.0 / dt2) END AS contrib " +
        "FROM ct) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_strata, " +
        "CAST(sum(n) AS BIGINT) AS n, round(any_value(psi), 6) AS or_mh, " +
        "round(CASE WHEN sum(CASE WHEN contrib IS NULL THEN 1 ELSE 0 END) " +
        "= 0 THEN sum(contrib) END, 6) AS x2, " +
        "CAST(count(*) - 1 AS BIGINT) AS df FROM cb"),
      (s, dir) => Stats.breslowDay(Tables.lineitem(s, dir),
        col("l_linenumber"), col("l_discount") > 0.05,
        col("l_quantity") > 25)),

    // ---- Quade range-weighted repeated measures on the q409 design
    // (per-user view/click/purchase counts): within-unit doubled midranks
    // x doubled range midranks keep 4S integer — ONE division at the end.
    Q("q444_quade", {
      val uCte = "u AS (SELECT user_id, " +
        "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c_view, " +
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) " +
        "AS c_click, " +
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS c_purchase FROM events GROUP BY 1), " +
        "l AS (SELECT user_id, 'view' AS c, CAST(c_view AS DOUBLE) AS v " +
        "FROM u UNION ALL SELECT user_id, 'click', " +
        "CAST(c_click AS DOUBLE) FROM u UNION ALL SELECT user_id, " +
        "'purchase', CAST(c_purchase AS DOUBLE) FROM u)"
      Some(s"WITH $uCte, " +
        "vals AS (SELECT user_id, v, CAST(count(*) AS BIGINT) AS t " +
        "FROM l GROUP BY 1, 2), " +
        "rk AS (SELECT user_id, v, 2 * CAST(sum(t) OVER (PARTITION BY " +
        "user_id ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) AS BIGINT) - t + 1 AS r2 FROM vals), " +
        "rg AS (SELECT user_id, max(v) - min(v) AS rng FROM l " +
        "GROUP BY 1), " +
        "rc AS (SELECT rng, CAST(count(*) AS BIGINT) AS t FROM rg " +
        "GROUP BY 1), " +
        "qq AS (SELECT rng, 2 * CAST(sum(t) OVER (ORDER BY rng " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "- t + 1 AS q2 FROM rc), " +
        "uq AS (SELECT user_id, q2 FROM rg JOIN qq USING (rng)), " +
        "kk AS (SELECT CAST(count(DISTINCT c) AS BIGINT) AS k FROM l), " +
        "j AS (SELECT l.c, CAST(uq.q2 AS HUGEINT) * (rk.r2 - kk.k - 1) " +
        "AS s4 FROM l JOIN rk ON l.user_id = rk.user_id AND l.v = rk.v " +
        "JOIN uq ON l.user_id = uq.user_id, kk), " +
        "bc AS (SELECT c, sum(s4) AS sj4, CAST(count(*) AS BIGINT) AS n " +
        "FROM j GROUP BY 1), " +
        "a16 AS (SELECT sum(s4 * s4) AS a16 FROM j), " +
        "nk AS (SELECT CAST(count(*) AS BIGINT) AS kcond, " +
        "CAST(max(n) AS BIGINT) AS b FROM bc), " +
        "b16 AS (SELECT sum(sj4 * sj4) AS b16b FROM bc) " +
        "SELECT b AS n_units, kcond AS n_conditions, " +
        "round(CASE WHEN CAST(b AS HUGEINT) * a16 - b16b > 0 THEN " +
        "CAST(CAST(b - 1 AS HUGEINT) * b16b AS DOUBLE) / " +
        "CAST(CAST(b AS HUGEINT) * a16 - b16b AS DOUBLE) END, 6) " +
        "AS f_stat FROM nk, a16, b16")
    },
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id").agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("c_view"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("c_click"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c_purchase"))
        val long = u.selectExpr("user_id",
          "stack(3, 'view', CAST(c_view AS DOUBLE), " +
            "'click', CAST(c_click AS DOUBLE), " +
            "'purchase', CAST(c_purchase AS DOUBLE)) AS (c, v)")
        Stats.quadeTest(long, col("user_id"), col("c"), col("v"))
      }),

    // ---- Welch heteroscedastic ANOVA on the q429 design (order prices by
    // priority): the variance-robust F for exactly the case where
    // Bartlett rejects; one decimal-moment groupBy, two k-row finishes.
    Q("q445_welch_anova",
      Some("WITH g AS (SELECT o_orderpriority, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sv, " +
        "CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS pv FROM orders WHERE o_orderpriority IS NOT NULL " +
        "AND o_totalprice IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 2), " +
        "s AS (SELECT n, sv / CAST(n AS DOUBLE) AS mean, " +
        "(pv - sv * sv / n) / (n - 1.0) AS s2 FROM g), " +
        "s2 AS (SELECT *, CASE WHEN s2 > 0 THEN CAST(n AS DOUBLE) / s2 " +
        "END AS w FROM s), " +
        "a1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, " +
        "CAST(SUM(n) AS BIGINT) AS ntot, SUM(w) AS ww, " +
        "SUM(w * mean) AS wm, MIN(s2) AS minv FROM s2), " +
        "a2 AS (SELECT any_value(n_groups) AS n_groups, " +
        "any_value(ntot) AS ntot, any_value(minv) AS minv, " +
        "SUM(w * (mean - wm / ww) * (mean - wm / ww)) AS anum, " +
        "SUM((1.0 - w / ww) * (1.0 - w / ww) / (n - 1.0)) AS lam " +
        "FROM s2, a1), " +
        "f AS (SELECT n_groups, ntot, minv, anum, lam, " +
        "CAST(n_groups AS DOUBLE) AS k FROM a2) " +
        "SELECT n_groups, ntot AS n, " +
        "round(CASE WHEN n_groups >= 2 AND minv > 0 THEN " +
        "anum / (k - 1.0) / (1.0 + 2.0 * (k - 2.0) * lam / " +
        "(k * k - 1.0)) END, 6) AS f_stat, " +
        "round(CASE WHEN n_groups >= 2 AND minv > 0 AND lam > 0 THEN " +
        "(k * k - 1.0) / (3.0 * lam) END, 6) AS df2 FROM f"),
      (s, dir) => Stats.welchAnova(Tables.orders(s, dir),
        col("o_orderpriority"), col("o_totalprice"))),

    // ---- Brunner-Munzel click-vs-purchase value comparison: the
    // variance-robust companion to q428's CvM and q120's KS — doubled
    // pooled/within midranks from the value-cell rollup, rank-gap
    // variance terms summed as DECIMAL(38,6).
    Q("q446_brunner_munzel",
      Some("WITH c AS (SELECT value AS v, " +
        "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS ca, " +
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS cb FROM events " +
        "WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL " +
        "GROUP BY 1), " +
        "w AS (SELECT v, ca, cb, " +
        "2 * CAST(sum(ca + cb) OVER o AS BIGINT) - (ca + cb) + 1 AS r2, " +
        "2 * CAST(sum(ca) OVER o AS BIGINT) - ca + 1 AS ra2, " +
        "2 * CAST(sum(cb) OVER o AS BIGINT) - cb + 1 AS rb2 FROM c " +
        "WINDOW o AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW)), " +
        "sz AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, " +
        "CAST(sum(cb) AS BIGINT) AS n_b FROM c), " +
        "mr AS (SELECT CAST(sum(CAST(ca AS HUGEINT) * r2) AS DOUBLE) " +
        "AS sra2, CAST(sum(CAST(cb AS HUGEINT) * r2) AS DOUBLE) AS srb2 " +
        "FROM w), " +
        "d AS (SELECT w.*, sz.n_a, sz.n_b, " +
        "sra2 / CAST(n_a AS DOUBLE) AS rba2, " +
        "srb2 / CAST(n_b AS DOUBLE) AS rbb2, " +
        "CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb " +
        "FROM w, sz, mr), " +
        "q AS (SELECT any_value(n_a) AS n_a, any_value(n_b) AS n_b, " +
        "any_value(rba2) AS rba2, any_value(rbb2) AS rbb2, " +
        "any_value(na) AS na, any_value(nb) AS nb, " +
        "sum(CAST(CAST(ca AS DOUBLE) * " +
        "(CAST(r2 - ra2 AS DOUBLE) - rba2 + (na + 1.0)) * " +
        "(CAST(r2 - ra2 AS DOUBLE) - rba2 + (na + 1.0)) " +
        "AS DECIMAL(38,6))) AS qa, " +
        "sum(CAST(CAST(cb AS DOUBLE) * " +
        "(CAST(r2 - rb2 AS DOUBLE) - rbb2 + (nb + 1.0)) * " +
        "(CAST(r2 - rb2 AS DOUBLE) - rbb2 + (nb + 1.0)) " +
        "AS DECIMAL(38,6))) AS qb FROM d), " +
        "v AS (SELECT *, " +
        "CAST(qa AS DOUBLE) / 4.0 / (na - 1.0) / " +
        "(na * (na + nb - na) * (na + nb - na)) AS va, " +
        "CAST(qb AS DOUBLE) / 4.0 / (nb - 1.0) / " +
        "(nb * (na + nb - nb) * (na + nb - nb)) AS vb FROM q) " +
        "SELECT n_a, n_b, " +
        "round(CASE WHEN n_a > 0 AND n_b > 0 THEN " +
        "(rbb2 / 2.0 - (nb + 1.0) / 2.0) / na END, 6) AS p_hat, " +
        "round(CASE WHEN n_a > 1 AND n_b > 1 AND va + vb > 0 THEN " +
        "(rbb2 - rba2) / 2.0 / ((na + nb) * sqrt(va + vb)) END, 6) " +
        "AS t_stat, " +
        "round(CASE WHEN n_a > 1 AND n_b > 1 AND " +
        "va * va + vb * vb > 0 THEN (va + vb) * (va + vb) / " +
        "(va * va / (na - 1.0) + vb * vb / (nb - 1.0)) END, 6) AS df " +
        "FROM v"),
      (s, dir) => Stats.brunnerMunzel(Tables.events(s, dir),
        "event_type", "value", "click", "purchase")),

    // ---- CMH conditional-independence chi-square on the q443 strata:
    // the significance test beside the MH OR estimate and the
    // Breslow-Day homogeneity gate (no continuity correction).
    Q("q447_cmh",
      Some("WITH g AS (SELECT l_linenumber AS s, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN l_discount > 0.05 AND l_quantity > 25 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN l_discount > 0.05 AND NOT l_quantity > 25 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN NOT l_discount > 0.05 AND l_quantity > 25 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN NOT l_discount > 0.05 AND " +
        "NOT l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS d " +
        "FROM lineitem GROUP BY 1), " +
        "e AS (SELECT n, a, " +
        "CAST(a + b AS DOUBLE) AS r1, CAST(c + d AS DOUBLE) AS r2, " +
        "CAST(a + c AS DOUBLE) AS c1, CAST(b + d AS DOUBLE) AS c2, " +
        "CAST(n AS DOUBLE) AS nd FROM g WHERE n >= 2), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_strata, " +
        "CAST(sum(n) AS BIGINT) AS n, " +
        "sum(CAST(CAST(a AS DOUBLE) - r1 * c1 / nd AS DECIMAL(28,12))) " +
        "AS dev, " +
        "sum(CAST(r1 * r2 * c1 * c2 / (nd * nd * (nd - 1.0)) " +
        "AS DECIMAL(28,12))) AS vv FROM e) " +
        "SELECT n_strata, n, round(CAST(dev AS DOUBLE), 6) AS sum_dev, " +
        "round(CASE WHEN CAST(vv AS DOUBLE) > 0 THEN " +
        "CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE) / CAST(vv AS DOUBLE) " +
        "END, 6) AS x2, CAST(1 AS BIGINT) AS df FROM m"),
      (s, dir) => Stats.cmhTest(Tables.lineitem(s, dir),
        col("l_linenumber"), col("l_discount") > 0.05,
        col("l_quantity") > 25)),

    // ---- Wilson score interval of the high-value share per event type:
    // boundary-safe proportion CIs from one exact-count groupBy.
    Q("q448_wilson",
      Some("WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS k FROM events GROUP BY 1), " +
        "f AS (SELECT event_type, n, k, " +
        "CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p, " +
        "CAST(n AS DOUBLE) AS nd FROM g) " +
        "SELECT event_type, n, k, round(p, 6) AS p_hat, " +
        "round(CASE WHEN n > 0 THEN (p + 1.96 * 1.96 / (2.0 * nd)) / " +
        "(1.0 + 1.96 * 1.96 / nd) - 1.96 * sqrt(p * (1.0 - p) / nd + " +
        "1.96 * 1.96 / (4.0 * nd * nd)) / (1.0 + 1.96 * 1.96 / nd) " +
        "END, 6) AS lo, " +
        "round(CASE WHEN n > 0 THEN (p + 1.96 * 1.96 / (2.0 * nd)) / " +
        "(1.0 + 1.96 * 1.96 / nd) + 1.96 * sqrt(p * (1.0 - p) / nd + " +
        "1.96 * 1.96 / (4.0 * nd * nd)) / (1.0 + 1.96 * 1.96 / nd) " +
        "END, 6) AS hi FROM f ORDER BY event_type"),
      (s, dir) => Stats.wilsonCi(Tables.events(s, dir),
        Seq("event_type"), col("value") > 100).orderBy("event_type")),

    // ---- rank-biased overlap between the revenue and quantity top-10
    // brand rankings: ranks come from the 25-row brand rollup (vocabulary
    // windows), weights from the k-row depth spine — items never sort
    // globally.
    Q("q449_rbo",
      Some("WITH b AS (SELECT p_brand, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) " +
        "AS rev, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) " +
        "AS qty FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY 1), " +
        "rk AS (SELECT p_brand, " +
        "row_number() OVER (ORDER BY rev DESC, p_brand) AS ra, " +
        "row_number() OVER (ORDER BY qty DESC, p_brand) AS rb FROM b), " +
        "it AS (SELECT greatest(ra, rb) AS m FROM rk " +
        "WHERE greatest(ra, rb) <= 10 AND least(ra, rb) >= 1), " +
        "sp AS (SELECT d, pow(0.9, CAST(d AS DOUBLE) - 1.0) / " +
        "CAST(d AS DOUBLE) AS t FROM (SELECT unnest(range(1, 11)) AS d)), " +
        "w AS (SELECT d AS m, sum(t) OVER (ORDER BY d DESC ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS w FROM sp) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_common, " +
        "round(sum(w.w) / ((1.0 - pow(0.9, 10)) / (1.0 - 0.9)), 6) " +
        "AS rbo FROM it JOIN w USING (m)"),
      (s, dir) => {
        val b = Tables.lineitem(s, dir)
          .join(Tables.part(s, dir),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(sum(col("l_extendedprice").cast("decimal(38,6)"))
            .cast("double").as("rev"),
            sum(col("l_quantity").cast("decimal(38,6)"))
              .cast("double").as("qty"))
        import org.apache.spark.sql.expressions.Window
        val rk = b.select(col("p_brand"),
          row_number().over(Window.orderBy(col("rev").desc,
            col("p_brand"))).as("ra"),
          row_number().over(Window.orderBy(col("qty").desc,
            col("p_brand"))).as("rb"))
        Stats.rankBiasedOverlap(rk, Seq.empty, col("ra"), col("rb"),
          k = 10, p = 0.9)
      }),

    // ---- column drift between pre- and post-1997 shipments: one
    // combinable aggregate per snapshot carries every column's moments,
    // melted to column-grain rows. The quick screen in front of q145's
    // PSI.
    Q("q450_column_drift", {
      def side(name: String, pred: String) =
        s"$name AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          Seq("l_quantity" -> "q", "l_extendedprice" -> "e",
            "l_discount" -> "d").map { case (c, a) =>
            s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) " +
              s"AS BIGINT) AS nul_$a, " +
              s"CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE) AS s_$a, " +
              s"CAST(SUM(CAST($c * $c AS DECIMAL(38,6))) AS DOUBLE) " +
              s"AS p_$a"
          }.mkString(", ") +
          s" FROM lineitem WHERE $pred)"
      val unions = Seq("l_quantity" -> "q", "l_extendedprice" -> "e",
        "l_discount" -> "d").map { case (c, a) =>
        s"SELECT '$c' AS col_name, r.n AS n_ref, c.n AS n_cur, " +
          s"r.nul_$a AS nul_r, c.nul_$a AS nul_c, r.s_$a AS s_r, " +
          s"c.s_$a AS s_c, r.p_$a AS p_r, c.p_$a AS p_c FROM r, c"
      }.mkString(" UNION ALL ")
      Some("WITH " +
        side("r", "l_shipdate < TIMESTAMP '1997-01-01'") + ", " +
        side("c", "l_shipdate >= TIMESTAMP '1997-01-01'") + ", " +
        s"m AS ($unions), " +
        "f AS (SELECT col_name, n_ref, n_cur, nul_r, nul_c, " +
        "CAST(n_ref AS DOUBLE) AS nr, CAST(n_cur AS DOUBLE) AS nc, " +
        "CAST(n_ref AS DOUBLE) - CAST(nul_r AS DOUBLE) AS nnr, " +
        "CAST(n_cur AS DOUBLE) - CAST(nul_c AS DOUBLE) AS nnc, " +
        "s_r, s_c, p_r, p_c FROM m), " +
        "g AS (SELECT col_name, n_ref, n_cur, " +
        "CASE WHEN nr > 0 THEN CAST(nul_r AS DOUBLE) / nr END AS nulrr, " +
        "CASE WHEN nc > 0 THEN CAST(nul_c AS DOUBLE) / nc END AS nulrc, " +
        "CASE WHEN nnr > 0 THEN s_r / nnr END AS mean_r, " +
        "CASE WHEN nnc > 0 THEN s_c / nnc END AS mean_c, " +
        "CASE WHEN nnr > 1 THEN sqrt((p_r - s_r * s_r / nnr) / " +
        "(nnr - 1.0)) END AS sd_r, " +
        "CASE WHEN nnc > 1 THEN sqrt((p_c - s_c * s_c / nnc) / " +
        "(nnc - 1.0)) END AS sd_c FROM f) " +
        "SELECT col_name, n_ref, n_cur, round(nulrr, 6) " +
        "AS null_rate_ref, round(nulrc, 6) AS null_rate_cur, " +
        "round(mean_r, 6) AS mean_ref, round(mean_c, 6) AS mean_cur, " +
        "round(sd_r, 6) AS sd_ref, round(sd_c, 6) AS sd_cur, " +
        "round(CASE WHEN sd_r > 0 THEN (mean_c - mean_r) / sd_r END, 6) " +
        "AS std_shift FROM g ORDER BY col_name")
    },
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val cut = lit("1997-01-01").cast("timestamp")
        Stats.columnDriftReport(
          li.filter(col("l_shipdate") < cut),
          li.filter(col("l_shipdate") >= cut),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
      }),

    // ---- Games-Howell pairwise post-hoc on the q445 design: the k-row
    // moment rollup self-joins broadcast into 10 priority pairs; t, Welch
    // df, and the studentized-range q per pair.
    Q("q451_games_howell",
      Some("WITH g AS (SELECT o_orderpriority AS gk, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sv, " +
        "CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS pv FROM orders WHERE o_orderpriority IS NOT NULL " +
        "AND o_totalprice IS NOT NULL GROUP BY 1), " +
        "p AS (SELECT a.gk AS g1, b.gk AS g2, a.n AS n1, b.n AS n2, " +
        "a.sv AS sv1, a.pv AS pv1, b.sv AS sv2, b.pv AS pv2 " +
        "FROM g a JOIN g b ON a.gk < b.gk), " +
        "s AS (SELECT g1, g2, n1, n2, CAST(n1 AS DOUBLE) AS nd1, " +
        "CAST(n2 AS DOUBLE) AS nd2, sv1 / CAST(n1 AS DOUBLE) AS m1, " +
        "sv2 / CAST(n2 AS DOUBLE) AS m2, " +
        "(pv1 - sv1 * sv1 / CAST(n1 AS DOUBLE)) / " +
        "(CAST(n1 AS DOUBLE) - 1.0) AS s21, " +
        "(pv2 - sv2 * sv2 / CAST(n2 AS DOUBLE)) / " +
        "(CAST(n2 AS DOUBLE) - 1.0) AS s22 FROM p), " +
        "v AS (SELECT g1, g2, n1, n2, nd1, nd2, m2 - m1 AS diff, " +
        "s21 / nd1 AS v1, s22 / nd2 AS v2 FROM s) " +
        "SELECT g1, g2, n1, n2, round(diff, 6) AS mean_diff, " +
        "round(CASE WHEN n1 >= 2 AND n2 >= 2 AND v1 + v2 > 0 THEN " +
        "diff / sqrt(v1 + v2) END, 6) AS t, " +
        "round(CASE WHEN n1 >= 2 AND n2 >= 2 AND v1 + v2 > 0 THEN " +
        "(v1 + v2) * (v1 + v2) / (v1 * v1 / (nd1 - 1.0) + " +
        "v2 * v2 / (nd2 - 1.0)) END, 6) AS df, " +
        "round(CASE WHEN n1 >= 2 AND n2 >= 2 AND v1 + v2 > 0 THEN " +
        "abs(diff) / sqrt((v1 + v2) / 2.0) END, 6) AS q " +
        "FROM v ORDER BY g1, g2"),
      (s, dir) => Stats.gamesHowell(Tables.orders(s, dir),
        col("o_orderpriority"), col("o_totalprice"))
        .orderBy("g1", "g2")),

    // ---- Bowker symmetry of each user's first vs last event type (the
    // q142 deterministic (ts, event_id) election): did journeys change
    // direction? Canonicalized off-diagonal cells, no self-join.
    Q("q452_bowker",
      Some("WITH e AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(ts) AS us FROM events), " +
        "r AS (SELECT user_id, event_type, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY us, event_id) AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS cnt FROM e), " +
        "p AS (SELECT user_id, max(CASE WHEN rn = 1 THEN event_type END) " +
        "AS a, max(CASE WHEN rn = cnt THEN event_type END) AS b FROM r " +
        "GROUP BY 1), " +
        "cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM p " +
        "GROUP BY 1, 2), " +
        "off AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi, " +
        "CAST(sum(CASE WHEN a < b THEN n ELSE 0 END) AS BIGINT) AS nij, " +
        "CAST(sum(CASE WHEN a > b THEN n ELSE 0 END) AS BIGINT) AS nji " +
        "FROM cells WHERE a <> b GROUP BY 1, 2), " +
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS n_units FROM cells), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS df, " +
        "sum(CAST(CAST((nij - nji) * (nij - nji) AS DOUBLE) / " +
        "CAST(nij + nji AS DOUBLE) AS DECIMAL(28,12))) AS chi2, " +
        "CAST(sum(nij + nji) AS BIGINT) AS n_pairs_obs FROM off " +
        "WHERE nij + nji > 0) " +
        "SELECT n_pairs_obs, n_units, df, " +
        "round(CAST(chi2 AS DOUBLE), 6) AS chi2 FROM m, t"),
      (s, dir) => {
        val e = Tables.events(s, dir)
        val fl = e.groupBy("user_id").agg(
          min_by(col("event_type"),
            struct(unix_micros(col("ts")), col("event_id")))
            .as("first_type"),
          max_by(col("event_type"),
            struct(unix_micros(col("ts")), col("event_id")))
            .as("last_type"))
        Stats.mcnemarBowker(fl, col("first_type"), col("last_type"))
      }),

    // ---- Lin's concordance between quantity and price-in-hundreds: the
    // agreement score that penalizes scale/location shift where Pearson
    // wouldn't; one decimal-moment aggregate.
    Q("q453_lin_ccc",
      Some("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(l_extendedprice * 0.01 AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST((l_extendedprice * 0.01) * " +
        "(l_extendedprice * 0.01) AS DECIMAL(38,6))) AS DOUBLE) AS syy, " +
        "CAST(SUM(CAST(l_quantity * (l_extendedprice * 0.01) " +
        "AS DECIMAL(38,6))) AS DOUBLE) AS sxy FROM lineitem " +
        "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL), " +
        "f AS (SELECT n, sx / CAST(n AS DOUBLE) AS mx, " +
        "sy / CAST(n AS DOUBLE) AS my, " +
        "sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * " +
        "(sx / CAST(n AS DOUBLE)) AS vx, " +
        "syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * " +
        "(sy / CAST(n AS DOUBLE)) AS vy, " +
        "sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * " +
        "(sy / CAST(n AS DOUBLE)) AS cxy FROM m) " +
        "SELECT n, round(mx, 6) AS mean_x, round(my, 6) AS mean_y, " +
        "round(CASE WHEN vx > 0 AND vy > 0 THEN cxy / sqrt(vx * vy) " +
        "END, 6) AS pearson_r, " +
        "round(CASE WHEN vx + vy + (mx - my) * (mx - my) > 0 THEN " +
        "2.0 * cxy / (vx + vy + (mx - my) * (mx - my)) END, 6) AS ccc " +
        "FROM f"),
      (s, dir) => Stats.linCcc(Tables.lineitem(s, dir),
        col("l_quantity"), col("l_extendedprice") * lit(0.01))),

    // ---- Deming (orthogonal) regression on the same pair: the
    // errors-in-both-variables calibration line, closed-form root off
    // the identical moment aggregate.
    Q("q454_deming",
      Some("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(l_extendedprice * 0.01 AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST((l_extendedprice * 0.01) * " +
        "(l_extendedprice * 0.01) AS DECIMAL(38,6))) AS DOUBLE) AS syy, " +
        "CAST(SUM(CAST(l_quantity * (l_extendedprice * 0.01) " +
        "AS DECIMAL(38,6))) AS DOUBLE) AS sxy FROM lineitem " +
        "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL), " +
        "f AS (SELECT n, sx / CAST(n AS DOUBLE) AS mx, " +
        "sy / CAST(n AS DOUBLE) AS my, " +
        "sxx / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * " +
        "(sx / CAST(n AS DOUBLE)) AS vx, " +
        "syy / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * " +
        "(sy / CAST(n AS DOUBLE)) AS vy, " +
        "sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * " +
        "(sy / CAST(n AS DOUBLE)) AS cxy FROM m), " +
        "d AS (SELECT n, mx, my, cxy, vy - 1.0 * vx AS dd FROM f) " +
        "SELECT n, round(CASE WHEN n >= 2 AND cxy <> 0 THEN " +
        "(dd + sqrt(dd * dd + 4.0 * cxy * cxy)) / (2.0 * cxy) END, 6) " +
        "AS slope, round(CASE WHEN n >= 2 AND cxy <> 0 THEN my - " +
        "(dd + sqrt(dd * dd + 4.0 * cxy * cxy)) / (2.0 * cxy) * mx " +
        "END, 6) AS intercept FROM d"),
      (s, dir) => Stats.demingRegression(Tables.lineitem(s, dir),
        col("l_quantity"), col("l_extendedprice") * lit(0.01),
        lambda = 1.0)),

    // ---- Dunn pairwise rank post-hoc on the q427 design (quantity by
    // line number): pooled midranks off the 50-value cell rollup, the
    // shared tie-corrected variance, 21 pair rows.
    Q("q455_dunn",
      Some("WITH base AS (SELECT CAST(l_linenumber AS VARCHAR) AS g, " +
        "CAST(l_quantity AS DOUBLE) AS v FROM lineitem " +
        "WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL), " +
        "cells AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM base " +
        "GROUP BY 1), " +
        "rk AS (SELECT v, 2 * CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - t + 1 AS r2 " +
        "FROM cells), " +
        "pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n, " +
        "sum(CAST(r2 AS HUGEINT)) AS sr2 FROM base JOIN rk USING (v) " +
        "GROUP BY 1), " +
        "ties AS (SELECT CAST(sum(t) AS BIGINT) AS nn, " +
        "sum(CAST(t AS HUGEINT) * t * t - t) AS tm FROM cells), " +
        "p AS (SELECT a.g AS g1, b.g AS g2, a.n AS n1, b.n AS n2, " +
        "a.sr2 AS sr21, b.sr2 AS sr22, nn, tm FROM pg a " +
        "JOIN pg b ON a.g < b.g, ties), " +
        "f AS (SELECT g1, g2, n1, n2, " +
        "CAST(sr21 AS DOUBLE) / (CAST(n1 AS DOUBLE) * 2.0) AS rb1, " +
        "CAST(sr22 AS DOUBLE) / (CAST(n2 AS DOUBLE) * 2.0) AS rb2, " +
        "(CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0) / 12.0 - " +
        "CAST(tm AS DOUBLE) / (12.0 * (CAST(nn AS DOUBLE) - 1.0))) * " +
        "(1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)) AS sig2 " +
        "FROM p) " +
        "SELECT g1, g2, n1, n2, round(rb1, 6) AS mean_rank_1, " +
        "round(rb2, 6) AS mean_rank_2, " +
        "round(CASE WHEN n1 > 0 AND n2 > 0 AND sig2 > 0 THEN " +
        "(rb1 - rb2) / sqrt(sig2) END, 6) AS z FROM f ORDER BY g1, g2"),
      (s, dir) => Stats.dunnPosthoc(Tables.lineitem(s, dir),
        col("l_linenumber"), col("l_quantity")).orderBy("g1", "g2")),

    // ---- seasonal Mann-Kendall with day-of-week seasons: within-season
    // day pairs only, so the weekly cycle can't masquerade as drift the
    // way it can in q388's unconditional pairs.
    Q("q456_seasonal_mk",
      Some("WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
        "count(*) AS n FROM events GROUP BY 1), " +
        "r AS (SELECT unnest(range((SELECT min(day) FROM c), " +
        "(SELECT max(day) FROM c) + 1)) AS day), " +
        "s AS (SELECT r.day, r.day % 7 AS w, " +
        "CAST(coalesce(c.n, 0) AS BIGINT) AS n FROM r LEFT JOIN c " +
        "USING (day)), " +
        "ss AS (SELECT CAST(sum(CASE WHEN b.n > a.n THEN 1 " +
        "WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS st " +
        "FROM s a JOIN s b ON a.w = b.w AND a.day < b.day), " +
        "ps AS (SELECT w, CAST(sum(t) AS BIGINT) AS nd, " +
        "sum(CAST(t AS HUGEINT) * (t - 1) * (t * 2 + 5)) AS tsum FROM " +
        "(SELECT w, n, CAST(count(*) AS BIGINT) AS t FROM s " +
        "GROUP BY 1, 2) GROUP BY 1), " +
        "v AS (SELECT CAST(sum(nd) AS BIGINT) AS n_days, " +
        "sum(CAST((CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) - 1.0) * " +
        "(2.0 * CAST(nd AS DOUBLE) + 5.0) - CAST(tsum AS DOUBLE)) / " +
        "18.0 AS DECIMAL(28,12))) AS vv FROM ps) " +
        "SELECT n_days, st AS s_stat, " +
        "round(CAST(vv AS DOUBLE), 6) AS var_s, " +
        "round(CASE WHEN CAST(vv AS DOUBLE) > 0 THEN CASE WHEN st > 0 " +
        "THEN (CAST(st AS DOUBLE) - 1.0) / sqrt(CAST(vv AS DOUBLE)) " +
        "WHEN st < 0 THEN (CAST(st AS DOUBLE) + 1.0) / " +
        "sqrt(CAST(vv AS DOUBLE)) ELSE 0.0 END END, 6) AS z " +
        "FROM ss, v"),
      (s, dir) => Stats.seasonalMannKendall(Tables.events(s, dir), "ts",
        period = 7)),

    // ---- Hodges-Lehmann pseudo-median of quantity: Walsh averages over
    // the 50-value cell relation (1275 cells, never rows); the estimate
    // is the weighted lower-median ELEMENT — doubled integer cumcounts,
    // no division anywhere.
    Q("q457_hodges_lehmann",
      Some("WITH cells AS (SELECT CAST(l_quantity AS DOUBLE) AS v, " +
        "CAST(count(*) AS BIGINT) AS c FROM lineitem " +
        "WHERE l_quantity IS NOT NULL GROUP BY 1), " +
        "w AS (SELECT (a.v + b.v) / 2.0 AS wv, CASE WHEN a.v < b.v THEN " +
        "CAST(a.c AS HUGEINT) * b.c * 2 ELSE CAST(a.c AS HUGEINT) * " +
        "(a.c + 1) END AS m2 FROM cells a JOIN cells b ON a.v <= b.v), " +
        "g AS (SELECT wv, sum(m2) AS m2 FROM w GROUP BY 1), " +
        "cum AS (SELECT wv, sum(m2) OVER (ORDER BY wv ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2 FROM g), " +
        "t AS (SELECT sum(m2) AS mt2, CAST(count(*) AS BIGINT) " +
        "AS n_walsh_values FROM g), " +
        "nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells) " +
        "SELECT nn.n, t.n_walsh_values, " +
        "CAST(t.mt2 AS DOUBLE) / 2.0 AS n_pairs, " +
        "(SELECT min(wv) FROM cum, t WHERE cum2 * 2 >= t.mt2) AS hl " +
        "FROM nn, t"),
      (s, dir) => Stats.hodgesLehmann(Tables.lineitem(s, dir),
        col("l_quantity"))),

    // ---- weighted kappa between each user's first and last event-value
    // quintile bucket (fixed thresholds, the q142 deterministic
    // election): ordinal agreement where q406-family nominal kappas
    // treat near-misses as total misses.
    Q("q458_weighted_kappa",
      Some("WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) " +
        "AS us FROM events WHERE value IS NOT NULL), " +
        "r AS (SELECT user_id, value, row_number() OVER (PARTITION BY " +
        "user_id ORDER BY us, event_id) AS rn, count(*) OVER " +
        "(PARTITION BY user_id) AS cnt FROM e), " +
        "p AS (SELECT user_id, max(CASE WHEN rn = 1 THEN value END) " +
        "AS fv, max(CASE WHEN rn = cnt THEN value END) AS lv FROM r " +
        "GROUP BY 1), " +
        "bkt AS (SELECT CASE WHEN fv < 20 THEN 0 WHEN fv < 40 THEN 1 " +
        "WHEN fv < 60 THEN 2 WHEN fv < 80 THEN 3 ELSE 4 END AS a, " +
        "CASE WHEN lv < 20 THEN 0 WHEN lv < 40 THEN 1 WHEN lv < 60 " +
        "THEN 2 WHEN lv < 80 THEN 3 ELSE 4 END AS b FROM p), " +
        "cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM bkt " +
        "GROUP BY 1, 2), " +
        "rm AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells " +
        "GROUP BY 1), " +
        "cm AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells " +
        "GROUP BY 1), " +
        "j AS (SELECT rm.a, cm.b, rm.r, cm.c, " +
        "CAST(coalesce(cells.o, 0) AS BIGINT) AS o FROM rm CROSS JOIN " +
        "cm LEFT JOIN cells ON rm.a = cells.a AND cm.b = cells.b), " +
        "m AS (SELECT CAST(sum(o) AS BIGINT) AS n, " +
        "sum(CAST(abs(a - b) AS HUGEINT) * o) AS ol, " +
        "sum(CAST((a - b) * (a - b) AS HUGEINT) * o) AS oq, " +
        "sum(CAST(abs(a - b) AS HUGEINT) * r * c) AS el, " +
        "sum(CAST((a - b) * (a - b) AS HUGEINT) * r * c) AS eqq " +
        "FROM j) " +
        "SELECT n, round(CASE WHEN el > 0 THEN 1.0 - " +
        "CAST(n AS DOUBLE) * CAST(ol AS DOUBLE) / CAST(el AS DOUBLE) " +
        "END, 6) AS kappa_linear, " +
        "round(CASE WHEN eqq > 0 THEN 1.0 - CAST(n AS DOUBLE) * " +
        "CAST(oq AS DOUBLE) / CAST(eqq AS DOUBLE) END, 6) " +
        "AS kappa_quadratic FROM m"),
      (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
        val fl = e.groupBy("user_id").agg(
          min_by(col("value"),
            struct(unix_micros(col("ts")), col("event_id"))).as("fv"),
          max_by(col("value"),
            struct(unix_micros(col("ts")), col("event_id"))).as("lv"))
        def bkt(c: org.apache.spark.sql.Column) =
          when(c < 20, 0L).when(c < 40, 1L)
            .when(c < 60, 2L).when(c < 80, 3L).otherwise(4L)
        Stats.weightedKappa(fl, bkt(col("fv")), bkt(col("lv")))
      }),

    // ---- expected reciprocal rank over each event type's top-10 users
    // by spend (activity-count grades): the cascade metric beside q251's
    // nDCG; the scale-safe topKPerGroup cutoff feeds a <=10-row rank
    // window per query.
    Q("q459_err",
      Some("WITH s AS (SELECT event_type, user_id, " +
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS score, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM events " +
        "WHERE value IS NOT NULL GROUP BY 1, 2), " +
        "rk AS (SELECT event_type AS query, row_number() OVER " +
        "(PARTITION BY event_type ORDER BY score DESC, user_id) AS r, " +
        "least(3, cnt // 20) AS g FROM s), " +
        "f AS (SELECT query, r, (pow(2.0, CAST(least(g, 3) AS DOUBLE)) " +
        "- 1.0) / 8.0 AS rel FROM rk WHERE r <= 10), " +
        "w AS (SELECT query, r, rel, exp(coalesce(sum(ln(1.0 - rel)) " +
        "OVER (PARTITION BY query ORDER BY r ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND 1 PRECEDING), 0.0)) AS stop FROM f) " +
        "SELECT query, CAST(count(*) AS BIGINT) AS n_ranked, " +
        "round(sum(rel / CAST(r AS DOUBLE) * stop), 6) AS err FROM w " +
        "GROUP BY 1 ORDER BY query"),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .groupBy("event_type", "user_id")
          .agg(sum(col("value").cast("decimal(38,6)")).cast("double")
            .as("score"), count(lit(1)).as("cnt"))
        val top = graft.pipeline.Curation.topKPerGroup(scored,
          "event_type", "score", "user_id", k = 10)
        val ranked = top.withColumn("r", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("score").desc, col("user_id").asc)))
        Stats.errAtK(ranked, "event_type", col("r"),
          least(lit(3L), expr("cnt div 20")), k = 10, gmax = 3)
          .orderBy("query")
      }),

    // ---- Kupiec POF backtest of the q439 VaR: estimate on each
    // ticker's first calendar half, count violations on the second,
    // LR ~ chi2(1). Split day and VaR cut are both DATA ELEMENTS.
    Q("q460_kupiec",
      Some("WITH t AS (SELECT l_suppkey % 25 AS key, " +
        "epoch_us(l_shipdate) // 86400000000 AS day, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey " +
        "AS tie, CAST(round(l_extendedprice * 100) AS BIGINT) AS c " +
        "FROM lineitem), " +
        "b AS (SELECT key, day, arg_max(c, tie) AS cl FROM t " +
        "GROUP BY 1, 2), " +
        "d AS (SELECT key, day, cl - lag(cl) OVER (PARTITION BY key " +
        "ORDER BY day) AS dd FROM b), " +
        "f AS (SELECT key, day, dd FROM d WHERE dd IS NOT NULL), " +
        "md AS (SELECT key, dd2 AS med FROM (SELECT key, " +
        "CAST(day AS DOUBLE) AS dd2, row_number() OVER (PARTITION BY " +
        "key ORDER BY CAST(day AS DOUBLE)) AS rn, count(*) OVER " +
        "(PARTITION BY key) AS n FROM f) WHERE rn = (n + 1) // 2), " +
        "sp AS (SELECT f.key, f.day, f.dd, " +
        "CAST(f.day AS DOUBLE) <= md.med AS train FROM f " +
        "JOIN md ON f.key = md.key), " +
        "tr AS (SELECT key, dd, row_number() OVER (PARTITION BY key " +
        "ORDER BY dd, day) AS rn, count(*) OVER (PARTITION BY key) " +
        "AS n FROM sp WHERE train), " +
        "vk AS (SELECT key, dd AS v, n AS n_train FROM tr " +
        "WHERE rn = CAST(ceil(CAST(n AS DOUBLE) * 0.05) AS BIGINT)), " +
        "te AS (SELECT sp.key, any_value(vk.n_train) AS n_train, " +
        "CAST(count(*) AS BIGINT) AS n_test, any_value(vk.v) AS v, " +
        "CAST(sum(CASE WHEN sp.dd < vk.v THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS x FROM sp JOIN vk ON sp.key = vk.key WHERE NOT sp.train " +
        "GROUP BY 1), " +
        "g AS (SELECT key, n_train, n_test, v, x, " +
        "CAST(n_test AS DOUBLE) AS nd, CAST(x AS DOUBLE) AS xd FROM te) " +
        "SELECT key, n_train, n_test, " +
        "round(CAST(v AS DOUBLE) / 100.0, 6) AS var_amt, x, " +
        "round(CASE WHEN n_test > 0 THEN -2.0 * (((nd - xd) * ln(0.95) " +
        "+ xd * ln(0.05)) - (CASE WHEN x = 0 THEN 0.0 WHEN x = n_test " +
        "THEN 0.0 ELSE (nd - xd) * ln(1.0 - xd / nd) + " +
        "xd * ln(xd / nd) END)) END, 6) AS lr FROM g ORDER BY key"),
      (s, dir) => Finance.kupiecPof(
        Finance.dailyBars(
          Tables.lineitem(s, dir)
            .withColumn("ticker", pmod(col("l_suppkey"), lit(25L))),
          "ticker", "l_shipdate",
          col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
            col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity")),
        "key", "day", col("close"), alpha = 0.05)
        .orderBy("key")),

    // ---- Roll implied spread per ticker: bouncing close-to-close moves
    // are negatively autocorrelated; exact decimal diff products, one
    // IEEE finish; trending tickers report null, never a clamp.
    Q("q461_roll_spread",
      Some("WITH t AS (SELECT l_suppkey % 25 AS key, " +
        "epoch_us(l_shipdate) // 86400000000 AS day, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey " +
        "AS tie, CAST(round(l_extendedprice * 100) AS BIGINT) AS c " +
        "FROM lineitem), " +
        "b AS (SELECT key, day, arg_max(c, tie) AS cl FROM t " +
        "GROUP BY 1, 2), " +
        "d AS (SELECT key, day, cl - lag(cl) OVER (PARTITION BY key " +
        "ORDER BY day) AS dd FROM b), " +
        "p AS (SELECT key, dd, lag(dd) OVER (PARTITION BY key " +
        "ORDER BY day) AS dl FROM d WHERE dd IS NOT NULL), " +
        "q AS (SELECT key, dd, dl FROM p WHERE dl IS NOT NULL), " +
        "a AS (SELECT key, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CAST(dd AS HUGEINT)) AS DOUBLE) AS sd, " +
        "CAST(sum(CAST(dl AS HUGEINT)) AS DOUBLE) AS sdl, " +
        "CAST(sum(CAST(dd AS HUGEINT) * dl) AS DOUBLE) AS sp " +
        "FROM q GROUP BY 1), " +
        "f AS (SELECT key, n_pairs, sp / CAST(n_pairs AS DOUBLE) - " +
        "sd / CAST(n_pairs AS DOUBLE) * (sdl / CAST(n_pairs AS DOUBLE)) " +
        "AS cov FROM a) " +
        "SELECT key, n_pairs, round(cov / 10000.0, 2) AS autocov, " +
        "round(CASE WHEN n_pairs >= 2 AND cov < 0 THEN " +
        "2.0 * sqrt(-cov) / 100.0 END, 6) AS roll_spread FROM f " +
        "ORDER BY key"),
      (s, dir) => Finance.rollSpread(
        Finance.dailyBars(
          Tables.lineitem(s, dir)
            .withColumn("ticker", pmod(col("l_suppkey"), lit(25L))),
          "ticker", "l_shipdate",
          col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
            col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity")),
        "key", "day", col("close"))
        .orderBy("key")),

    // ---- bivariate Mahalanobis census on (quantity, price/100): the
    // joint-ellipse outlier count the per-axis MAD rule can't see; the
    // census compares identical IEEE doubles — no rounding in the count.
    Q("q462_mahalanobis",
      Some("WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x, " +
        "l_extendedprice * 0.01 AS y FROM lineitem " +
        "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy, " +
        "CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy " +
        "FROM b), " +
        "s AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx, sy, sxx, syy, " +
        "sxy FROM m), " +
        "st AS (SELECT n, sx / nd AS mx, sy / nd AS my, " +
        "sxx / nd - sx / nd * (sx / nd) AS vx, " +
        "syy / nd - sy / nd * (sy / nd) AS vy, " +
        "sxy / nd - sx / nd * (sy / nd) AS cxy FROM s), " +
        "r AS (SELECT st.n, vx * vy - cxy * cxy AS det, " +
        "(vy * (x - mx) * (x - mx) - 2.0 * cxy * (x - mx) * (y - my) + " +
        "vx * (y - my) * (y - my)) / (vx * vy - cxy * cxy) AS d2 " +
        "FROM b, st), " +
        "a AS (SELECT any_value(n) AS n, " +
        "CAST(sum(CASE WHEN det > 0 AND d2 > 9.21034 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS nout, max(CASE WHEN det > 0 THEN d2 END) AS mx2, " +
        "max(det) AS det FROM r) " +
        "SELECT n, CASE WHEN det > 0 THEN nout END AS n_outliers, " +
        "round(CASE WHEN det > 0 THEN mx2 END, 6) AS max_d2 FROM a"),
      (s, dir) => Stats.mahalanobis2d(Tables.lineitem(s, dir),
        col("l_quantity"), col("l_extendedprice") * lit(0.01))),

    // ---- readability panel per documentation source: Coleman-Liau (no
    // syllable guess), Gunning fog, and SMOG on the established
    // token/sentence/vowel-group proxies; per-doc scores average as
    // DECIMAL(28,12).
    Q("q463_readability_panel", {
      val toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
      val w = s"CAST(len(regexp_split_to_array(trim(text), '\\s+')) " +
        "AS DOUBLE)"
      val sCnt = "CAST(greatest(len(regexp_extract_all(text, " +
        "'[.!?]+')), 1) AS DOUBLE)"
      val lCnt = "CAST(len(regexp_extract_all(text, '[A-Za-z]')) " +
        "AS DOUBLE)"
      val cx = s"CAST(len(list_filter($toks, t -> " +
        "len(regexp_extract_all(t, '[aeiouy]+')) >= 3)) AS DOUBLE)"
      Some("WITH d AS (SELECT source, " +
        s"round(0.0588 * ($lCnt * 100.0 / $w) - " +
        s"0.296 * ($sCnt * 100.0 / $w) - 15.8, 6) AS cli, " +
        s"round(0.4 * ($w / $sCnt + 100.0 * $cx / $w), 6) AS fog, " +
        s"round(1.0430 * sqrt($cx * 30.0 / $sCnt) + 3.1291, 6) AS smog " +
        "FROM documents) " +
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "round(CAST(sum(CAST(cli AS DECIMAL(28,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS avg_cli, " +
        "round(CAST(sum(CAST(fog AS DECIMAL(28,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS avg_fog, " +
        "round(CAST(sum(CAST(smog AS DECIMAL(28,12))) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 6) AS avg_smog " +
        "FROM d GROUP BY 1 ORDER BY source")
    },
      (s, dir) => {
        import graft.pipeline.{TextAnalysis => TA}
        Tables.documents(s, dir)
          .select(col("source"),
            TA.colemanLiau(col("text")).cast("decimal(28,12)").as("cli"),
            TA.gunningFog(col("text")).cast("decimal(28,12)").as("fog"),
            TA.smogIndex(col("text")).cast("decimal(28,12)").as("smog"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("cli")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_cli"),
            round(sum(col("fog")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_fog"),
            round(sum(col("smog")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_smog"))
          .orderBy("source")
      }),

    // ---- rich-club coefficient of the co-purchase graph: do the hub
    // parts wire to each other? Degree-vocabulary cells x a 5-threshold
    // grid — never edge-grain work past the two degree joins.
    Q("q464_rich_club",
      Some("WITH " + AppliedQueries.copurchaseEdgesSql + ", " +
        "deg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) " +
        "AS deg FROM (SELECT a AS node FROM e0 UNION ALL " +
        "SELECT b AS node FROM e0) GROUP BY 1), " +
        "wd AS (SELECT least(da.deg, db.deg) AS m FROM e0 " +
        "JOIN deg da ON e0.a = da.node JOIN deg db ON e0.b = db.node), " +
        "ec AS (SELECT m, CAST(count(*) AS BIGINT) AS e FROM wd " +
        "GROUP BY 1), " +
        "nc AS (SELECT deg AS m, CAST(count(*) AS BIGINT) AS n " +
        "FROM deg GROUP BY 1), " +
        "g AS (SELECT CAST(unnest([1, 2, 4, 8, 16]) AS BIGINT) AS k), " +
        "ek AS (SELECT k, CAST(sum(CASE WHEN m > k THEN e ELSE 0 END) " +
        "AS BIGINT) AS n_edges FROM g, ec GROUP BY 1), " +
        "nk AS (SELECT k, CAST(sum(CASE WHEN m > k THEN n ELSE 0 END) " +
        "AS BIGINT) AS n_nodes FROM g, nc GROUP BY 1) " +
        "SELECT ek.k, n_nodes, n_edges, " +
        "round(CASE WHEN n_nodes >= 2 THEN 2.0 * " +
        "CAST(n_edges AS DOUBLE) / (CAST(n_nodes AS DOUBLE) * " +
        "(CAST(n_nodes AS DOUBLE) - 1.0)) END, 6) AS phi " +
        "FROM ek JOIN nk USING (k) ORDER BY k"),
      (s, dir) => graft.pipeline.Graph.richClub(
        AppliedQueries.copurchaseEdges(s, dir), "src", "dst")),

    // ---- average neighbor degree curve knn(k) of the co-purchase
    // graph: assortativity's full shape; per-node neighbor-degree means
    // cast DECIMAL(28,12) before the per-degree rollup.
    Q("q465_knn_degree",
      Some("WITH " + AppliedQueries.copurchaseEdgesSql + ", " +
        "deg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) " +
        "AS deg FROM (SELECT a AS node FROM e0 UNION ALL " +
        "SELECT b AS node FROM e0) GROUP BY 1), " +
        "adj AS (SELECT a AS z, b AS x FROM e0 UNION ALL " +
        "SELECT b AS z, a AS x FROM e0), " +
        "pn AS (SELECT z, CAST(count(*) AS BIGINT) AS dz, " +
        "CAST(CAST(sum(deg) AS DOUBLE) / CAST(count(*) AS DOUBLE) " +
        "AS DECIMAL(28,12)) AS mnd FROM adj JOIN deg " +
        "ON adj.x = deg.node GROUP BY 1) " +
        "SELECT dz AS deg, CAST(count(*) AS BIGINT) AS n_nodes, " +
        "round(CAST(sum(mnd) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) " +
        "AS knn FROM pn GROUP BY 1 ORDER BY deg"),
      (s, dir) => graft.pipeline.Graph.avgNeighborDegree(
        AppliedQueries.copurchaseEdges(s, dir), "src", "dst")),

    // ---- Rousseeuw-Croux Qn robust scale of quantity: the k-th pairwise
    // gap over the 50-value cell relation, doubled integer cumcounts —
    // 50% breakdown with none of the MAD's efficiency loss.
    Q("q466_qn_scale",
      Some("WITH cells AS (SELECT CAST(l_quantity AS DOUBLE) AS v, " +
        "CAST(count(*) AS BIGINT) AS c FROM lineitem " +
        "WHERE l_quantity IS NOT NULL GROUP BY 1), " +
        "g AS (SELECT b.v - a.v AS gap, CASE WHEN a.v < b.v THEN " +
        "CAST(a.c AS HUGEINT) * b.c * 2 ELSE CAST(a.c AS HUGEINT) * " +
        "(a.c - 1) END AS m2 FROM cells a JOIN cells b ON a.v <= b.v), " +
        "g2 AS (SELECT gap, sum(m2) AS m2 FROM g WHERE m2 > 0 " +
        "GROUP BY 1), " +
        "cum AS (SELECT gap, sum(m2) OVER (ORDER BY gap ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2 FROM g2), " +
        "t AS (SELECT CAST(sum(c) AS BIGINT) AS n, " +
        "CAST(sum(c) AS BIGINT) // 2 + 1 AS h FROM cells), " +
        "t2 AS (SELECT n, h * (h - 1) AS k2, (h * (h - 1)) // 2 AS k " +
        "FROM t) " +
        "SELECT any_value(n) AS n, any_value(k) AS k_index, " +
        "round(min(gap), 6) AS gap, round(2.2219 * min(gap), 6) AS qn " +
        "FROM cum, t2 WHERE cum2 >= k2"),
      (s, dir) => Stats.qnScale(Tables.lineitem(s, dir),
        col("l_quantity"))),

    // ---- Gini mean difference of the discount column: linear-gap
    // dispersion over the 11-value cell relation at exact integer cents.
    Q("q467_gmd",
      Some("WITH cells AS (SELECT CAST(round(CAST(l_discount AS DOUBLE) " +
        "* 100) AS BIGINT) AS c100, CAST(count(*) AS BIGINT) AS c " +
        "FROM lineitem WHERE l_discount IS NOT NULL GROUP BY 1), " +
        "s AS (SELECT sum(CAST(a.c AS HUGEINT) * b.c * " +
        "(b.c100 - a.c100)) AS s FROM cells a JOIN cells b " +
        "ON a.c100 < b.c100), " +
        "t AS (SELECT CAST(sum(c) AS BIGINT) AS n, " +
        "sum(CAST(c AS HUGEINT) * c100) AS sc FROM cells) " +
        "SELECT n, round(CASE WHEN n >= 2 THEN CAST(s AS DOUBLE) * 2.0 " +
        "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * 100.0) " +
        "END, 6) AS gmd, " +
        "round(CASE WHEN n >= 2 AND sc > 0 THEN CAST(s AS DOUBLE) * " +
        "2.0 / (CAST(n AS DOUBLE) - 1.0) / CAST(sc AS DOUBLE) END, 6) " +
        "AS relative_gmd FROM s, t"),
      (s, dir) => Stats.giniMeanDifference(Tables.lineitem(s, dir),
        col("l_discount"))),

    // ---- Neyman-allocated stratified sample of orders by priority: a
    // 1000-row budget splits proportional to N_h*S_h (DECIMAL-summed
    // denominator so both engines agree on every md5 draw boundary).
    Q("q468_neyman",
      Some("WITH g AS (SELECT o_orderpriority AS s, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sv, " +
        "CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS pv FROM orders WHERE o_totalprice IS NOT NULL " +
        "GROUP BY 1), " +
        "w AS (SELECT s, n, CASE WHEN n >= 2 THEN sqrt(greatest(" +
        "(pv - sv * sv / n) / (CAST(n AS DOUBLE) - 1.0), 0.0)) " +
        "ELSE 0.0 END AS sd FROM g), " +
        "w2 AS (SELECT *, CAST(CAST(n AS DOUBLE) * sd " +
        "AS DECIMAL(28,12)) AS wgt FROM w), " +
        "d AS (SELECT sum(wgt) AS wsum FROM w2), " +
        "r AS (SELECT s, n, sd, CASE WHEN wsum > 0 THEN least(1.0, " +
        "1000.0 * CAST(wgt AS DOUBLE) / CAST(wsum AS DOUBLE) / " +
        "CAST(n AS DOUBLE)) ELSE 0.0 END AS rate FROM w2, d), " +
        "k AS (SELECT o.o_orderpriority AS s, count(*) AS ns " +
        "FROM orders o JOIN r ON o.o_orderpriority = r.s " +
        "WHERE o.o_totalprice IS NOT NULL AND (r.rate >= 1.0 OR " +
        "substring(md5('ney-v1:' || CAST(o.o_orderkey AS VARCHAR)), " +
        "1, 8) < printf('%08x', CAST(least(floor(r.rate * " +
        "4294967296.0), 4294967295.0) AS BIGINT))) GROUP BY 1) " +
        "SELECT r.s AS stratum, CAST(r.n AS BIGINT) AS n_pop, " +
        "round(r.sd, 6) AS sd, round(r.rate, 9) AS rate, " +
        "CAST(coalesce(k.ns, 0) AS BIGINT) AS n_sampled FROM r " +
        "LEFT JOIN k ON r.s = k.s ORDER BY stratum"),
      (s, dir) => Stats.neymanAllocation(Tables.orders(s, dir),
        "o_orderpriority", col("o_totalprice"), col("o_orderkey"),
        totalN = 1000.0, salt = "ney-v1").orderBy("stratum")),

    // ---- Taylor's power law across event types' daily counts: does
    // variance scale as a power of the mean (b > 1 = bursty)? One
    // moment rollup to 5 group rows, ln-ln OLS.
    Q("q469_taylors_law",
      Some("WITH dcount AS (SELECT event_type, " +
        "epoch_us(ts) // 86400000000 AS day, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), " +
        "g AS (SELECT event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(cnt AS DECIMAL(38,6))) AS DOUBLE) AS sv, " +
        "CAST(SUM(CAST(cnt * cnt AS DECIMAL(38,6))) AS DOUBLE) AS pv " +
        "FROM dcount GROUP BY 1), " +
        "s AS (SELECT n, sv / n AS mean, " +
        "(pv - sv * sv / n) / (n - 1.0) AS s2 FROM g), " +
        "p AS (SELECT CASE WHEN n >= 2 AND mean > 0 AND s2 > 0 THEN " +
        "ln(mean) END AS x, CASE WHEN n >= 2 AND mean > 0 AND s2 > 0 " +
        "THEN ln(s2) END AS y FROM s), " +
        "a AS (SELECT CAST(sum(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_groups, CAST(sum(CASE WHEN x IS NULL " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded, sum(x) AS sx, " +
        "sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy, " +
        "sum(x * y) AS sxy FROM p), " +
        "f AS (SELECT *, CAST(n_groups AS DOUBLE) AS k, " +
        "CAST(n_groups AS DOUBLE) * sxy - sx * sy AS covn, " +
        "CAST(n_groups AS DOUBLE) * sxx - sx * sx AS varx, " +
        "CAST(n_groups AS DOUBLE) * syy - sy * sy AS vary FROM a) " +
        "SELECT n_groups, n_excluded, " +
        "round(CASE WHEN n_groups >= 2 AND varx > 0 THEN covn / varx " +
        "END, 6) AS slope, " +
        "round(CASE WHEN n_groups >= 2 AND varx > 0 THEN " +
        "(sy - covn / varx * sx) / k END, 6) AS intercept, " +
        "round(CASE WHEN n_groups >= 2 AND varx > 0 AND vary > 0 THEN " +
        "covn / sqrt(varx * vary) END, 6) AS r FROM f"),
      (s, dir) => Stats.taylorsLaw(
        Tables.events(s, dir)
          .groupBy(col("event_type"),
            EventAnalytics.dayIndex(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        col("event_type"), col("cnt"))),

    // ---- per-type dispersion index of the daily counts: VMR ~ 1 is
    // Poisson, the chi2 = (n-1)*VMR screen per group row.
    Q("q470_dispersion",
      Some("WITH dcount AS (SELECT event_type, " +
        "epoch_us(ts) // 86400000000 AS day, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), " +
        "g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(cnt AS DECIMAL(38,6))) AS DOUBLE) AS sv, " +
        "CAST(SUM(CAST(cnt * cnt AS DECIMAL(38,6))) AS DOUBLE) AS pv " +
        "FROM dcount GROUP BY 1), " +
        "f AS (SELECT event_type, n, sv / n AS mean, " +
        "CASE WHEN n >= 2 AND sv / n > 0 THEN " +
        "((pv - sv * sv / n) / (CAST(n AS DOUBLE) - 1.0)) / (sv / n) " +
        "END AS vmr FROM g) " +
        "SELECT event_type, n, round(mean, 6) AS mean, " +
        "round(vmr, 6) AS vmr, " +
        "round((CAST(n AS DOUBLE) - 1.0) * vmr, 6) AS chi2 FROM f " +
        "ORDER BY event_type"),
      (s, dir) => Stats.dispersionIndex(
        Tables.events(s, dir)
          .groupBy(col("event_type"),
            EventAnalytics.dayIndex(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "event_type", col("cnt")).orderBy("event_type")),

    // ---- TVD + Hellinger between returned and kept quantity
    // distributions: exact decimal-integer TVD numerator, DECIMAL(28,12)
    // Bhattacharyya terms — the bounded-metric pair beside q137's JS.
    Q("q471_dist_distance",
      Some("WITH cells AS (SELECT CAST(l_quantity AS DOUBLE) AS c, " +
        "CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS ca, " +
        "CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS cb FROM lineitem " +
        "WHERE l_returnflag IN ('A', 'N') AND l_quantity IS NOT NULL " +
        "GROUP BY 1), " +
        "t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, " +
        "CAST(sum(cb) AS BIGINT) AS n_b, " +
        "CAST(count(*) AS BIGINT) AS n_categories FROM cells), " +
        "a AS (SELECT any_value(n_a) AS n_a, any_value(n_b) AS n_b, " +
        "any_value(n_categories) AS n_categories, " +
        "sum(abs(CAST(ca AS HUGEINT) * n_b - CAST(cb AS HUGEINT) * " +
        "n_a)) AS tvd2, " +
        "sum(CAST(sqrt(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE) * " +
        "(CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE))) " +
        "AS DECIMAL(28,12))) AS bc FROM cells, t) " +
        "SELECT n_a, n_b, n_categories, " +
        "round(CASE WHEN n_a > 0 AND n_b > 0 THEN " +
        "CAST(tvd2 AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE) * " +
        "CAST(n_b AS DOUBLE)) END, 6) AS tvd, " +
        "round(CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(bc AS DOUBLE) " +
        "END, 6) AS bhattacharyya, " +
        "round(CASE WHEN n_a > 0 AND n_b > 0 THEN " +
        "sqrt(greatest(1.0 - CAST(bc AS DOUBLE), 0.0)) END, 6) " +
        "AS hellinger FROM a"),
      (s, dir) => Stats.distributionDistance(Tables.lineitem(s, dir),
        "l_returnflag", col("l_quantity"), "A", "N")),

    // ---- delta-method CI for purchase-value-per-event: the ratio-metric
    // shape naive per-unit-ratio averaging gets wrong; per-user numerator
    // sums decimal-exact before the one moment aggregate.
    Q("q472_ratio_ci",
      Some("WITH u AS (SELECT user_id, " +
        "CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN " +
        "coalesce(value, 0.0) ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) " +
        "AS x, CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy, " +
        "CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy " +
        "FROM u), " +
        "f AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx / sy AS r, " +
        "sy / CAST(n AS DOUBLE) AS my, " +
        "(sxx - sx * sx / n) / (CAST(n AS DOUBLE) - 1.0) AS vx, " +
        "(syy - sy * sy / n) / (CAST(n AS DOUBLE) - 1.0) AS vy, " +
        "(sxy - sx * sy / n) / (CAST(n AS DOUBLE) - 1.0) AS cxy, " +
        "sy AS sytot FROM m), " +
        "g AS (SELECT n, r, CASE WHEN n >= 2 AND sytot > 0 THEN " +
        "sqrt(greatest(vx + r * r * vy - 2.0 * r * cxy, 0.0) / " +
        "(nd * my * my)) END AS se, n >= 2 AND sytot > 0 AS ok FROM f) " +
        "SELECT n, round(CASE WHEN ok THEN r END, 6) AS ratio, " +
        "round(se, 6) AS se, " +
        "round(CASE WHEN ok THEN r - 1.96 * se END, 6) AS lo, " +
        "round(CASE WHEN ok THEN r + 1.96 * se END, 6) AS hi FROM g"),
      (s, dir) => Stats.ratioMetricCi(
        Tables.events(s, dir).groupBy("user_id").agg(
          sum(when(col("event_type") === "purchase",
            coalesce(col("value"), lit(0.0))).otherwise(0.0)
            .cast("decimal(38,6)")).cast("double").as("x"),
          count(lit(1)).as("y")),
        col("x"), col("y"))),

    // ---- Spiegelhalter calibration Z of the length-based English score
    // (p = clamp(n_chars/600)): the binning-free companion to q382's
    // Hosmer-Lemeshow; out-of-range p raises, never clamps silently.
    Q("q473_spiegelhalter",
      Some("WITH b AS (SELECT least(0.99, greatest(0.01, " +
        "CAST(n_chars AS DOUBLE) / 600.0)) AS p, " +
        "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y " +
        "FROM documents), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "sum(CAST((y - p) * (1.0 - 2.0 * p) AS DECIMAL(28,12))) AS num, " +
        "sum(CAST((1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p * (1.0 - p) " +
        "AS DECIMAL(28,12))) AS den FROM b) " +
        "SELECT n, round(CASE WHEN CAST(den AS DOUBLE) > 0 THEN " +
        "CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)) END, 6) " +
        "AS z_stat FROM m"),
      (s, dir) => Stats.spiegelhalterZ(Tables.documents(s, dir),
        least(lit(0.99), greatest(lit(0.01),
          col("n_chars").cast("double") / 600.0)),
        col("lang") === "en")),

    // ---- Murphy decomposition of the same score's Brier: how much of
    // the loss is miscalibration (REL) vs missing discrimination
    // (UNC - RES)? Ten fixed-width bins, decimal-exact rollups.
    Q("q474_brier_decomp",
      Some("WITH b AS (SELECT least(0.99, greatest(0.01, " +
        "CAST(n_chars AS DOUBLE) / 600.0)) AS p, " +
        "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y " +
        "FROM documents), " +
        "bb AS (SELECT p, y, least(9, CAST(floor(p * 10) AS BIGINT)) " +
        "AS bin FROM b), " +
        "pb AS (SELECT bin, CAST(count(*) AS BIGINT) AS nk, " +
        "sum(CAST(p AS DECIMAL(28,12))) AS sp, " +
        "sum(CAST(y AS DECIMAL(28,12))) AS sy, " +
        "sum(CAST((p - y) * (p - y) AS DECIMAL(28,12))) AS bs FROM bb " +
        "GROUP BY 1), " +
        "t AS (SELECT CAST(sum(nk) AS BIGINT) AS n, sum(sy) AS syall, " +
        "sum(bs) AS bsall FROM pb), " +
        "a AS (SELECT any_value(t.n) AS n, " +
        "any_value(CAST(syall AS DOUBLE) / CAST(t.n AS DOUBLE)) AS yb, " +
        "any_value(bsall) AS bsa, " +
        "sum(CAST(CAST(nk AS DOUBLE) * (CAST(sp AS DOUBLE) / " +
        "CAST(nk AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(nk AS DOUBLE)) " +
        "* (CAST(sp AS DOUBLE) / CAST(nk AS DOUBLE) - " +
        "CAST(sy AS DOUBLE) / CAST(nk AS DOUBLE)) AS DECIMAL(28,12))) " +
        "AS rel, " +
        "sum(CAST(CAST(nk AS DOUBLE) * (CAST(sy AS DOUBLE) / " +
        "CAST(nk AS DOUBLE) - CAST(syall AS DOUBLE) / " +
        "CAST(t.n AS DOUBLE)) * (CAST(sy AS DOUBLE) / " +
        "CAST(nk AS DOUBLE) - CAST(syall AS DOUBLE) / " +
        "CAST(t.n AS DOUBLE)) AS DECIMAL(28,12))) AS res FROM pb, t) " +
        "SELECT n, round(CAST(bsa AS DOUBLE) / CAST(n AS DOUBLE), 6) " +
        "AS brier, round(CAST(rel AS DOUBLE) / CAST(n AS DOUBLE), 6) " +
        "AS reliability, round(CAST(res AS DOUBLE) / " +
        "CAST(n AS DOUBLE), 6) AS resolution, " +
        "round(yb * (1.0 - yb), 6) AS uncertainty FROM a"),
      (s, dir) => Stats.brierDecomposition(Tables.documents(s, dir),
        least(lit(0.99), greatest(lit(0.01),
          col("n_chars").cast("double") / 600.0)),
        col("lang") === "en", bins = 10)),

    // ---- Theil's uncertainty coefficient between return flag and line
    // status: the DIRECTIONAL categorical association q137's nmi and
    // q415's Cramer's V can't express.
    Q("q475_uncertainty",
      Some("WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b, " +
        "CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1, 2), " +
        "ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM cells " +
        "GROUP BY 1), " +
        "mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cells " +
        "GROUP BY 1), " +
        "t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells), " +
        "mi AS (SELECT any_value(n) AS n, CAST(sum(CAST(" +
        "CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE) * " +
        "CAST(c AS DOUBLE) / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) " +
        "AS DECIMAL(28,12))) AS DOUBLE) AS mi FROM cells " +
        "JOIN ma USING (a) JOIN mb USING (b), t), " +
        "ha AS (SELECT CAST(sum(CAST(-(CAST(ca AS DOUBLE) / " +
        "CAST(n AS DOUBLE)) * ln(CAST(ca AS DOUBLE) / " +
        "CAST(n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS h " +
        "FROM ma, t), " +
        "hb AS (SELECT CAST(sum(CAST(-(CAST(cb AS DOUBLE) / " +
        "CAST(n AS DOUBLE)) * ln(CAST(cb AS DOUBLE) / " +
        "CAST(n AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) AS h " +
        "FROM mb, t) " +
        "SELECT n, round(mi, 6) AS mi, " +
        "round(CASE WHEN hb.h > 0 THEN mi / hb.h END, 6) " +
        "AS u_b_given_a, " +
        "round(CASE WHEN ha.h > 0 THEN mi / ha.h END, 6) " +
        "AS u_a_given_b, " +
        "round(CASE WHEN ha.h + hb.h > 0 THEN 2.0 * mi / " +
        "(ha.h + hb.h) END, 6) AS u_symmetric FROM mi, ha, hb"),
      (s, dir) => Stats.uncertaintyCoefficient(Tables.lineitem(s, dir),
        col("l_returnflag"), col("l_linestatus"))),

    // ---- KS against the exponential over per-user inter-event gaps
    // (whole seconds — the cardinality contract for the cell rollup):
    // are arrivals memoryless?
    Q("q476_ks_exponential",
      Some("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us " +
        "FROM events), " +
        "g AS (SELECT (us - lag(us) OVER (PARTITION BY user_id " +
        "ORDER BY us, event_id)) // 1000000 AS gap_s FROM e), " +
        "f AS (SELECT CAST(gap_s AS DOUBLE) AS v FROM g " +
        "WHERE gap_s IS NOT NULL AND gap_s >= 0), " +
        "cells AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM f " +
        "GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(t) AS BIGINT) AS n, " +
        "CAST(sum(CAST(v * CAST(t AS DOUBLE) AS DECIMAL(38,6))) " +
        "AS DOUBLE) AS sv FROM cells), " +
        "c2 AS (SELECT v, t, CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fc, " +
        "tot.n, tot.sv FROM cells, tot), " +
        "d AS (SELECT n, CAST(n AS DOUBLE) / sv AS lam, " +
        "greatest(abs(CAST(fc AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(1.0 - exp(-(CAST(n AS DOUBLE) / sv) * v))), " +
        "abs(CAST(fc - t AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(1.0 - exp(-(CAST(n AS DOUBLE) / sv) * v)))) AS dd FROM c2) " +
        "SELECT any_value(n) AS n, round(any_value(lam), 6) AS rate, " +
        "round(CASE WHEN any_value(n) > 0 THEN max(dd) END, 6) " +
        "AS d_stat FROM d"),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("__us"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("__us"),
            col("event_id"))
          .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
          .filter(col("__gap").isNotNull)
          .select(expr("__gap div 1000000").as("gap_s"))
        Stats.ksExponential(gaps, col("gap_s"))
      }),

    // ---- mean-excess tail diagnostic of event values over a fixed
    // threshold grid: growing e(u) flags a generalized-Pareto tail the
    // fixed-quantile VaR view can't see.
    Q("q477_mean_excess", {
      val us = Seq(50.0, 100.0, 200.0, 400.0)
      val rows = us.map(u =>
        s"SELECT $u AS threshold, CAST(sum(CASE WHEN value > $u THEN 1 " +
          s"ELSE 0 END) AS BIGINT) AS n_exceed, " +
          s"CAST(sum(CASE WHEN value > $u THEN CAST(value - $u " +
          s"AS DECIMAL(38,6)) END) AS DOUBLE) AS s FROM events " +
          "WHERE value IS NOT NULL").mkString(" UNION ALL ")
      Some(s"WITH m AS ($rows) SELECT threshold, n_exceed, " +
        "round(CASE WHEN n_exceed > 0 THEN s / " +
        "CAST(n_exceed AS DOUBLE) END, 6) AS mean_excess FROM m " +
        "ORDER BY threshold")
    },
      (s, dir) => Stats.meanExcess(Tables.events(s, dir), col("value"),
        Seq(50.0, 100.0, 200.0, 400.0))),

    // ---- Markowitz minimum-variance weights for tickers 3 and 7:
    // exact integer-cent diff moments over the co-traded days; var_min
    // at 2dp (the q461 magnitude lesson).
    Q("q478_min_variance",
      Some("WITH t AS (SELECT l_suppkey % 25 AS key, " +
        "epoch_us(l_shipdate) // 86400000000 AS day, " +
        "l_orderkey * 10000000 + l_linenumber * 1000000 + l_suppkey " +
        "AS tie, CAST(round(l_extendedprice * 100) AS BIGINT) AS c " +
        "FROM lineitem WHERE l_suppkey % 25 IN (3, 7)), " +
        "b AS (SELECT key, day, arg_max(c, tie) AS cl FROM t " +
        "GROUP BY 1, 2), " +
        "d AS (SELECT key, day, cl - lag(cl) OVER (PARTITION BY key " +
        "ORDER BY day) AS dd FROM b), " +
        "f AS (SELECT key, day, dd FROM d WHERE dd IS NOT NULL), " +
        "j AS (SELECT a.dd AS da, bb.dd AS db FROM f a JOIN f bb " +
        "ON a.day = bb.day AND a.key = 3 AND bb.key = 7), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_days, " +
        "CAST(sum(CAST(da AS HUGEINT)) AS DOUBLE) AS sa, " +
        "CAST(sum(CAST(db AS HUGEINT)) AS DOUBLE) AS sb, " +
        "CAST(sum(CAST(da AS HUGEINT) * da) AS DOUBLE) AS saa, " +
        "CAST(sum(CAST(db AS HUGEINT) * db) AS DOUBLE) AS sbb, " +
        "CAST(sum(CAST(da AS HUGEINT) * db) AS DOUBLE) AS sab FROM j), " +
        "v AS (SELECT n_days, CAST(n_days AS DOUBLE) AS nd, " +
        "(saa - sa * sa / CAST(n_days AS DOUBLE)) / " +
        "(CAST(n_days AS DOUBLE) - 1.0) AS va, " +
        "(sbb - sb * sb / CAST(n_days AS DOUBLE)) / " +
        "(CAST(n_days AS DOUBLE) - 1.0) AS vb, " +
        "(sab - sa * sb / CAST(n_days AS DOUBLE)) / " +
        "(CAST(n_days AS DOUBLE) - 1.0) AS cab FROM m), " +
        "w AS (SELECT n_days, va, vb, cab, CASE WHEN n_days >= 2 AND " +
        "va + vb - 2.0 * cab > 0 THEN (vb - cab) / " +
        "(va + vb - 2.0 * cab) END AS wa FROM v) " +
        "SELECT n_days, round(wa, 6) AS w_a, " +
        "round(1.0 - wa, 6) AS w_b, " +
        "round((wa * wa * va + (1.0 - wa) * (1.0 - wa) * vb + " +
        "2.0 * wa * (1.0 - wa) * cab) / 10000.0, 2) AS var_min FROM w"),
      (s, dir) => Finance.minVariancePair(
        Finance.dailyBars(
          Tables.lineitem(s, dir)
            .withColumn("ticker", pmod(col("l_suppkey"), lit(25L)))
            .filter(col("ticker").isin(3L, 7L)),
          "ticker", "l_shipdate",
          col("l_orderkey") * 10000000 + col("l_linenumber") * 1000000 +
            col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity")),
        "key", "day", col("close"), "3", "7"))
  )
}
