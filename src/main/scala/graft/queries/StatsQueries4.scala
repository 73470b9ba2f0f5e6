package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Stats

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
        "l_returnflag", "l_quantity", "A", "N"))
  )
}
