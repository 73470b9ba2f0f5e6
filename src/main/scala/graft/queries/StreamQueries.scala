package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.Streams

/** Event-stream queries (batch form of the streaming transforms — same code
  * path as `readStream`, oracle-checked here; streaming execution covered by
  * StreamsSpec with a memory sink).
  */
object StreamQueries {

  /** q91's column set — 2dp decimals whose pairwise products are exact at
    * scale 6 (the corrMatrix bit-determinism envelope). */
  private val CorrCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val qs: Seq[Q] = Seq(

    // ---- tumbling-window aggregation (epoch-aligned in both engines).
    Q("q37_window_agg",
      Some("SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type, " +
        "COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY window_start, event_type ORDER BY window_start, event_type"),
      (s, dir) => Streams.tumblingCounts(Tables.events(s, dir))
        .orderBy("window_start", "event_type")),

    // ---- trailing 1-hour per-user window features: RANGE frame on epoch
    // seconds (Spark unix_timestamp ≡ DuckDB epoch_ns // 1e9, both floor),
    // decimal-summed values, ties share a frame in both engines.
    Q("q84_trailing_window",
      Some("SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS epoch_s, " +
        "count(*) OVER w AS n_trail, " +
        "CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE) AS sum_trail " +
        "FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000 " +
        "RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),
      (s, dir) => graft.operators.Ops.trailingWindowAgg(
          Tables.events(s, dir), Seq("user_id"), "ts", "value",
          trailingSeconds = 3600)
        .select(col("user_id"), col("event_id"), col("epoch_s"),
          col("n_trail"), col("sum_trail"))
        .orderBy("user_id", "event_id")),

    // ---- rate-anomaly alerts over the tumbling-count series: the integer
    // rule den*k*n > num*sum(prev k) on the zero-filled hour spine — no
    // float mean near the decision; cold-start windows never alert.
    Q("q204_rate_alert",
      Some("WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour, " +
        "count(*) AS n FROM events GROUP BY 1, 2), " +
        "sp AS (SELECT ty.event_type, h.hour FROM " +
        "(SELECT DISTINCT event_type FROM c) ty, " +
        "(SELECT unnest(range((SELECT min(hour) FROM c), " +
        "(SELECT max(hour) FROM c) + 1)) AS hour) h), " +
        "f AS (SELECT sp.event_type, sp.hour, coalesce(c.n, 0) AS n FROM sp " +
        "LEFT JOIN c USING (event_type, hour)), " +
        "r AS (SELECT event_type, hour, n, " +
        "row_number() OVER w AS rn, " +
        "CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hour " +
        "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS ps " +
        "FROM f WINDOW w AS (PARTITION BY event_type ORDER BY hour)) " +
        "SELECT event_type, hour, n, CASE WHEN rn > 3 THEN ps END AS prev_sum, " +
        "rn > 3 AND n * 6 > ps * 3 AS alert FROM r ORDER BY event_type, hour"),
      (s, dir) => graft.streaming.Streams.rateAlertBatch(Tables.events(s, dir))
        .orderBy("event_type", "hour")),

    // ---- first-event-per-key dedupe (batch equivalent of the watermarked
    // streaming dropDuplicates).
    Q("q38_stream_dedupe",
      Some("SELECT user_id, event_type, MIN(event_id) AS first_event " +
        "FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type"),
      (s, dir) => Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("first_event"))
        .orderBy("user_id", "event_type")),

    // ---- gap-based sessionization via window functions (30-min gap).
    Q("q39_sessionize",
      Some("WITH flags AS (SELECT user_id, event_id, ts, " +
        "CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_session FROM events), " +
        "sess AS (SELECT user_id, ts, CAST(SUM(new_session) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq " +
        "FROM flags) " +
        "SELECT user_id, session_seq, COUNT(*) AS n_events, " +
        // CAST to plain TIMESTAMP: on DuckDB builds that read the events
        // parquet as TIMESTAMP_NS, date_trunc preserves the ns type and the
        // driver's value-hash sees ns-rendered strings vs Spark's µs.
        "CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP) AS session_start, " +
        "CAST(date_trunc('second', MAX(ts)) AS TIMESTAMP) AS session_end " +
        "FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq"),
      (s, dir) => Streams.sessionizeBatch(Tables.events(s, dir))
        .orderBy("user_id", "session_seq")),

    // ---- as-of join: each purchase matched to the user's most recent view
    // (composed union+window in Spark; native ASOF JOIN in the oracle).
    Q("q41_asof_join",
      Some("SELECT p.event_id, p.user_id, v.event_id AS last_view_id " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v " +
        "ON p.user_id = v.user_id AND p.ts >= v.ts " +
        "ORDER BY p.event_id"),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.operators.Ops.asofJoin(purchases, views, key = "user_id",
          leftTime = "ts", rightTime = "ts", rightPayload = Seq("event_id"))
          .select(col("event_id"), col("user_id"),
            col("__match.event_id").as("last_view_id"))
          .orderBy("event_id")
      }),

    // ---- nearest-direction as-of: each purchase to its closest view in
    // time, either side; exact-distance ties resolve backward in BOTH
    // engines (the CASE's <= mirrors the operator's pickB). Times compare
    // at microsecond resolution — epoch_ns//1000 ≡ Spark's nanos->micros
    // truncation, and the corpus is micro-aligned anyway.
    Q("q85_asof_nearest",
      Some("WITH p AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tu " +
        "FROM events WHERE event_type = 'purchase'), " +
        "v AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tu " +
        "FROM events WHERE event_type = 'view'), " +
        "b AS (SELECT p.event_id, v.event_id AS bid, v.tu AS btu " +
        "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.tu >= v.tu), " +
        "f AS (SELECT p.event_id, v.event_id AS fid, v.tu AS ftu " +
        "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.tu <= v.tu) " +
        "SELECT p.event_id, p.user_id, " +
        "CASE WHEN fid IS NULL OR (bid IS NOT NULL AND (p.tu - btu) <= (ftu - p.tu)) " +
        "THEN bid ELSE fid END AS nearest_view_id " +
        "FROM p JOIN b USING (event_id) JOIN f USING (event_id) " +
        "WHERE bid IS NOT NULL OR fid IS NOT NULL " +
        "ORDER BY p.event_id"),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.operators.Ops.asofJoin(purchases, views, key = "user_id",
          leftTime = "ts", rightTime = "ts", rightPayload = Seq("event_id"),
          direction = "nearest")
          .select(col("event_id"), col("user_id"),
            col("__match.event_id").as("nearest_view_id"))
          .orderBy("event_id")
      }),

    // ---- rollup (free Catalyst uplift over the reference's flat groupBy).
    Q("q42_rollup",
      Some("SELECT r_name, n_name, COUNT(*) AS n_cust, " +
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS sum_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP(r_name, n_name) ORDER BY r_name, n_name"),
      (s, dir) => {
        // via spark.sql: the Dataset-API rollup trips a DetectAmbiguousSelfJoin
        // false positive on Expand's duplicated grouping attrs; the SQL path
        // analyzes cleanly and also exercises the SQL surface
        Tables.customer(s, dir).createOrReplaceTempView("g_customer")
        Tables.nation(s, dir).createOrReplaceTempView("g_nation")
        Tables.region(s, dir).createOrReplaceTempView("g_region")
        s.sql("SELECT r_name, n_name, COUNT(*) AS n_cust, " +
          "CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS sum_bal " +
          "FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey " +
          "JOIN g_region ON n_regionkey = r_regionkey " +
          "GROUP BY ROLLUP(r_name, n_name) ORDER BY r_name, n_name")
      }),

    // ---- skew-safe two-phase aggregation: event_type has 5 hot keys over
    // the whole table — the salted plan must produce byte-identical results
    // to the plain GROUP BY the oracle runs.
    Q("q44_salted_group",
      Some("SELECT event_type, COUNT(value) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS total, " +
        "MAX(value) AS mx FROM events GROUP BY event_type ORDER BY event_type"),
      (s, dir) => graft.operators.Ops.saltedGroupAgg(
        Tables.events(s, dir), Seq("event_type"),
        Seq("n" -> ("count", "value"), "total" -> ("dsum", "value"),
          "mx" -> ("max", "value")), saltBuckets = 16)
        .orderBy("event_type")),

    // ---- approximate aggregates, oracle-checked: sketch INTERNALS are
    // engine-specific (Spark HLL++ vs DuckDB HLL; quantile sketches differ
    // too), so the sketches are checked as WITHIN-TOLERANCE booleans — each
    // engine runs its OWN sketch against its own exact value, and both must
    // land inside the documented error envelope (10% for HLL at default
    // rsd 0.05; 5% for the rank-1000 quantile sketch) for the row to
    // hash-match. exact_parts and the exact median match value-for-value.
    // The exact median is the LOWER median (the ceil(n/2)-th smallest
    // element), NOT the interpolated midpoint: prices carry 2 decimals, so
    // an even-count midpoint lands exactly on a half-cent where a 1-ulp
    // engine difference flips round(..., 2) — observed at sf0.001
    // (52724.245 -> .24 vs .25). An order statistic IS a data element:
    // arithmetic-free, byte-identical in both engines at every scale.
    Q("q43_approx_stats",
      Some("WITH r AS (SELECT l_returnflag, l_extendedprice, " +
        "row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn, " +
        "count(*) OVER (PARTITION BY l_returnflag) AS n FROM lineitem), " +
        "med AS (SELECT l_returnflag, l_extendedprice AS p50_price FROM r WHERE rn = (n + 1) // 2), " +
        "agg AS (SELECT l_returnflag, " +
        "COUNT(DISTINCT l_partkey) AS exact_parts, " +
        "abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey)) " +
        "  <= 0.10 * COUNT(DISTINCT l_partkey) AS hll_within_10pct, " +
        "abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5)) " +
        "  <= 0.05 * quantile_cont(l_extendedprice, 0.5) AS p50_within_5pct " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT agg.l_returnflag, exact_parts, hll_within_10pct, p50_price, p50_within_5pct " +
        "FROM agg JOIN med USING (l_returnflag) ORDER BY l_returnflag"),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, dir)
        val med = li.select(col("l_returnflag"), col("l_extendedprice"),
            row_number().over(Window.partitionBy("l_returnflag")
              .orderBy("l_extendedprice")).as("rn"),
            count(lit(1)).over(Window.partitionBy("l_returnflag")).as("n"))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("l_returnflag"), col("l_extendedprice").as("p50_price"))
        li.groupBy("l_returnflag").agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            (abs(approx_count_distinct(col("l_partkey")) - countDistinct(col("l_partkey")))
              <= lit(0.10) * countDistinct(col("l_partkey"))).as("hll_within_10pct"),
            (abs(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
              - expr("percentile(l_extendedprice, 0.5)"))
              <= lit(0.05) * expr("percentile(l_extendedprice, 0.5)")).as("p50_within_5pct"))
          .join(med, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_parts"), col("hll_within_10pct"),
            col("p50_price"), col("p50_within_5pct"))
          .orderBy("l_returnflag")
      }),

    // ---- fuzzy (edit-distance <= 2) join: misspelled customer names
    // (deterministic char-drop + substitution variants keyed on custkey)
    // resolved back to the catalog. The oracle is the naive length-banded
    // cross join — exact ground truth; the Spark side must produce the
    // identical pair set through segment blocking.
    Q("q87_fuzzy_join",
      Some("WITH variants AS (" +
        "SELECT CASE WHEN c_custkey % 2 = 0 " +
        "THEN substr(c_name, 1, CAST(c_custkey % 7 AS INT) + 3) || substr(c_name, CAST(c_custkey % 7 AS INT) + 5) " +
        "ELSE substr(c_name, 1, CAST(c_custkey % 9 AS INT) + 2) || 'X' || substr(c_name, CAST(c_custkey % 9 AS INT) + 4) END AS lval " +
        "FROM customer WHERE c_custkey % 31 = 0), " +
        "pairs AS (SELECT DISTINCT lval, c_name AS rval, levenshtein(lval, c_name) AS dist " +
        "FROM variants, customer WHERE abs(length(lval) - length(c_name)) <= 2 " +
        "AND levenshtein(lval, c_name) <= 2) " +
        // CAST to INTEGER: DuckDB levenshtein is BIGINT, Spark's is int —
        // the driver hash is dtype-sensitive
        "SELECT lval, rval, CAST(dist AS INTEGER) AS dist FROM pairs ORDER BY lval, rval"),
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val variants = cust.filter(pmod(col("c_custkey"), lit(31)) === 0)
          .select(when(pmod(col("c_custkey"), lit(2)) === 0,
              concat(expr("substr(c_name, 1, CAST(c_custkey % 7 AS INT) + 3)"),
                expr("substr(c_name, CAST(c_custkey % 7 AS INT) + 5)")))
            .otherwise(
              concat(expr("substr(c_name, 1, CAST(c_custkey % 9 AS INT) + 2)"), lit("X"),
                expr("substr(c_name, CAST(c_custkey % 9 AS INT) + 4)")))
            .as("name_typo"))
        graft.operators.Ops.fuzzyJoin(variants, cust, "name_typo", "c_name", maxDist = 2)
          .orderBy("lval", "rval")
      }),

    // ---- per-column profile report: completeness/cardinality/range in
    // one aggregation pass (numeric stats as double min/max + decimal-
    // summed total; string/date columns carry NULL numerics by contract).
    Q("q86_profile",
      Some(Seq(
        ("l_quantity", true), ("l_extendedprice", true),
        ("l_returnflag", false), ("l_linestatus", false))
        .map { case (c, isNum) =>
          val (mn, mx, sm) =
            if (isNum) (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
              s"CAST(SUM(CAST($c AS DECIMAL(28,6))) AS DOUBLE)")
            else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
          s"SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull, " +
            s"COUNT(DISTINCT $c) AS n_distinct, $mn AS min_num, $mx AS max_num, " +
            s"$sm AS sum_num FROM lineitem"
        }.mkString(" UNION ALL ") + " ORDER BY col_name"),
      (s, dir) => graft.operators.Ops.profile(Tables.lineitem(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"))
        .orderBy("col_name")),

    // ---- correlation matrix: every numeric pair in one aggregation pass,
    // decimal-exact sums (order-independent) -> IEEE closed form -> 6dp
    // round. Products of the 2dp lineitem decimals are exact at scale 6,
    // so both engines sum identical rationals.
    Q("q91_correlation", {
      val cs = CorrCols
      val sums = cs.map(c =>
        s"CAST(SUM(CAST(CAST($c AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS s_$c")
      val prods = for (i <- cs.indices; j <- i until cs.size) yield
        s"CAST(SUM(CAST(CAST(${cs(i)} AS DOUBLE) * CAST(${cs(j)} AS DOUBLE) " +
          s"AS DECIMAL(38,6))) AS DOUBLE) AS p_${i}_$j"
      val notNull = cs.map(c => s"$c IS NOT NULL").mkString(" AND ")
      val pairsSel = (for (i <- cs.indices; j <- i + 1 until cs.size) yield {
        val num = s"(CAST(n AS DOUBLE) * p_${i}_$j - s_${cs(i)} * s_${cs(j)})"
        def varTerm(k: Int) =
          s"(CAST(n AS DOUBLE) * p_${k}_$k - s_${cs(k)} * s_${cs(k)})"
        val den = s"(sqrt(${varTerm(i)}) * sqrt(${varTerm(j)}))"
        s"SELECT '${cs(i)}' AS col_x, '${cs(j)}' AS col_y, " +
          s"CASE WHEN $den = 0 THEN NULL ELSE round($num / $den, 6) END AS corr FROM a"
      }).mkString(" UNION ALL ")
      Some(s"WITH a AS (SELECT count(*) AS n, ${(sums ++ prods).mkString(", ")} " +
        s"FROM lineitem WHERE $notNull) $pairsSel ORDER BY col_x, col_y")
    },
      (s, dir) => graft.operators.Ops.corrMatrix(Tables.lineitem(s, dir), CorrCols)
        .orderBy("col_x", "col_y")),

    // ---- equal-width histogram: the distribution report after q86's
    // profile. Binning is pure IEEE arithmetic (subtract/divide/floor) so
    // both engines bin identically; hi is closed into the last bin (numpy
    // convention) and the aggregate carries <= nBins keys.
    Q("q89_histogram",
      Some("WITH x AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem), " +
        "b AS (SELECT CASE WHEN v = 105000.0 THEN 19 " +
        "ELSE CAST(FLOOR((v - 900.0) / ((105000.0 - 900.0) / 20)) AS INT) END AS bin_id " +
        "FROM x WHERE v IS NOT NULL AND v >= 900.0 AND v <= 105000.0) " +
        "SELECT bin_id, 900.0 + bin_id * ((105000.0 - 900.0) / 20) AS bin_lo, " +
        "900.0 + (bin_id + 1) * ((105000.0 - 900.0) / 20) AS bin_hi, " +
        "count(*) AS n FROM b GROUP BY bin_id ORDER BY bin_id"),
      (s, dir) => graft.operators.Ops.histogram(
          Tables.lineitem(s, dir), "l_extendedprice", 20, 900.0, 105000.0)
        .orderBy("bin_id")),

    // ---- semi-structured props: JSON field extraction + aggregation
    // (process.json_recode territory, at scale).
    Q("q40_json_props",
      Some("SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket, " +
        "COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY k_bucket ORDER BY k_bucket"),
      (s, dir) => Tables.events(s, dir)
        .select((get_json_object(col("props"), "$.k").cast("long") % 10).as("k_bucket"),
          col("user_id"))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("k_bucket")),

    // ---- bucketized range join: events matched to the overlapping 6-hour
    // maintenance windows (4-hour step => events near a boundary land in
    // TWO windows) containing them. The naive inequality join is a
    // BroadcastNestedLoopJoin scan; Ops.rangeJoin buckets the epoch-second
    // key so the plan is a hash equi join + residual filter (PlanSpec pins
    // the absence of BNLJ). The oracle runs the naive BETWEEN join — hash
    // equality proves the bucketed plan exact, overlaps included.
    Q("q64_range_join",
      Some("WITH iv AS (SELECT range AS interval_id, 1704067200 + range * 14400 AS w_start, " +
        "1704067200 + range * 14400 + 21600 AS w_end FROM range(0, 180)), " +
        "e AS (SELECT epoch_ns(ts) // 1000000000 AS es, user_id, value FROM events), " +
        "j AS (SELECT iv.interval_id, e.user_id, e.value FROM e JOIN iv " +
        "ON e.es >= iv.w_start AND e.es <= iv.w_end) " +
        "SELECT interval_id, count(*) AS n, count(DISTINCT user_id) AS n_users, " +
        "CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS total_value " +
        "FROM j GROUP BY 1 ORDER BY interval_id"),
      (s, dir) => {
        val base = 1704067200L // 2024-01-01 00:00:00 UTC, the corpus epoch
        val iv = s.range(180).select(col("id").as("interval_id"),
          (lit(base) + col("id") * 14400L).as("w_start"),
          (lit(base) + col("id") * 14400L + 21600L).as("w_end"))
        val ev = Tables.events(s, dir)
          .select(unix_timestamp(col("ts")).as("es"), col("user_id"), col("value"))
        graft.operators.Ops.rangeJoin(ev, "es", iv, "w_start", "w_end",
            bucketWidth = 21600L)
          .groupBy("interval_id")
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
            sum(col("value").cast("decimal(24,6)")).cast("double").as("total_value"))
          .orderBy("interval_id")
      }),

    // ---- bucketized interval-overlap join: order-activity intervals
    // (deterministic 5-24-day spans from o_orderkey) overlapping 120
    // fortnight windows, in epoch-day space. Both sides explode into
    // covering buckets; the canonical-bucket rule emits each overlapping
    // pair exactly once. Oracle = the naive overlap inequality join.
    Q("q66_interval_join",
      Some("WITH oi AS (SELECT o_orderkey, o_totalprice, " +
        "CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS lo, " +
        "CAST(o_orderdate AS DATE) - DATE '1970-01-01' + (o_orderkey % 20) + 5 AS hi FROM orders), " +
        "w AS (SELECT range AS window_id, 9131 + range * 20 AS w_lo, " +
        "9131 + range * 20 + 13 AS w_hi FROM range(0, 120)), " +
        "j AS (SELECT w.window_id, oi.o_totalprice FROM oi JOIN w " +
        "ON oi.lo <= w.w_hi AND w.w_lo <= oi.hi) " +
        "SELECT window_id, count(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total_price " +
        "FROM j GROUP BY 1 ORDER BY window_id"),
      (s, dir) => {
        val oi = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"),
            datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01"))).as("lo"))
          .withColumn("hi", col("lo") + pmod(col("o_orderkey"), lit(20)) + 5)
        val w = s.range(120).select(col("id").as("window_id"),
          (lit(9131L) + col("id") * 20).as("w_lo"),
          (lit(9131L) + col("id") * 20 + 13).as("w_hi"))
        graft.operators.Ops.intervalJoin(oi, "lo", "hi", w, "w_lo", "w_hi",
            bucketWidth = 32L)
          .groupBy("window_id")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(24,6)")).cast("double").as("total_price"))
          .orderBy("window_id")
      }),

    // ---- stateful streaming near-dup (batch form — same code path as the
    // MemoryStream execution in StreamsSpec): banded SimHash buckets with
    // bounded per-bucket state; capacity exceeds every bucket at test SFs,
    // so the pair set is deterministic. Engine-specific hashes — rows-only.
    Q("q49_neardup_stream_op", None,
      (s, dir) => Streams.nearDupStream(Tables.documents(s, dir),
          maxHamming = 8, capacity = 4096)
        .toDF()
        .select(col("id_a"), col("id_b"), col("hamming"))
        .distinct()
        .orderBy("id_a", "id_b")),

    // ---- watermarked stream-stream attribution join, BATCH FACE: every
    // purchase pairs with the same user's views from the preceding hour -
    // the click-impression attribution shape. The operator is the SAME
    // code the streaming path runs (enrichStream: watermarks + bounded
    // event-time gap, so stream state evicts - StreamsSpec pins
    // batch/stream parity); the oracle is the plain bounded interval join
    // in SQL. Raw timestamps never ship (nanos-vs-micros), only ids.
    Q("q218_stream_attribution",
      Some("SELECT p.event_id AS purchase_id, v.event_id AS view_id " +
        "FROM events p JOIN events v ON p.user_id = v.user_id " +
        "AND p.event_type = 'purchase' AND v.event_type = 'view' " +
        "AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000 " +
        "AND epoch_us(v.ts) <= epoch_us(p.ts) " +
        "ORDER BY purchase_id, view_id"),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("ts"), col("user_id"))
        Streams.enrichStream(purchases, views, "user_id", joinWindowSec = 3600L)
          .select(col("event_id").as("purchase_id"),
            col("l_event_id").as("view_id"))
          .orderBy("purchase_id", "view_id")
      }),

    // ---- NATIVE session-window aggregation (the state-store-backed
    // streaming operator, batch face): session_window(ts, 30 min) merges
    // an event into the open session iff it lands strictly before
    // last_ts + gap, i.e. a new session starts when diff >= gap - mirrored
    // in the oracle's lag rule (q39's lag form uses strict >; the two
    // agree except at an exact-1800s gap, which the oracle here models
    // with >= to match the native operator). Window end = last_ts + gap.
    Q("q224_session_window",
      Some("WITH flags AS (SELECT user_id, ts, CASE WHEN epoch_us(ts) - " +
        "epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000 " +
        "THEN 1 ELSE 0 END AS new_session FROM events), " +
        "sess AS (SELECT user_id, ts, CAST(SUM(new_session) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seq " +
        "FROM flags) " +
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, " +
        "date_trunc('second', min(ts)) AS session_start, " +
        "date_trunc('second', max(ts) + INTERVAL 30 MINUTE) AS session_end " +
        "FROM sess GROUP BY user_id, seq ORDER BY user_id, session_start"),
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          date_trunc("second", col("session_window.start")).as("session_start"),
          date_trunc("second", col("session_window.end")).as("session_end"))
        .orderBy("user_id", "session_start")),

    // ---- per-user interval-union coverage (gaps-and-islands merge):
    // interval = [ts, ts + value*1000 ms] in integer us; overlapping
    // intervals merge into islands via the running-max-of-ends rule, and
    // coverage is the exact integer sum of island lengths - never an
    // interval self-join.
    Q("q225_interval_union",
      Some("WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s, " +
        "epoch_us(ts) + CAST(floor(value * 1000) AS BIGINT) * 1000 AS e FROM events), " +
        "f AS (SELECT user_id, event_id, s, e, CASE WHEN max(e) OVER " +
        "(PARTITION BY user_id ORDER BY s, e, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL " +
        "OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) " +
        "THEN 1 ELSE 0 END AS nw FROM iv), " +
        "g AS (SELECT user_id, s, e, CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island FROM f), " +
        "isl AS (SELECT user_id, island, count(*) AS n, min(s) AS is_, max(e) AS ie FROM g GROUP BY 1, 2) " +
        "SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals, " +
        "CAST(count(*) AS BIGINT) AS n_islands, " +
        "CAST(sum(ie - is_) AS BIGINT) AS covered_us " +
        "FROM isl GROUP BY user_id ORDER BY user_id"),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        graft.pipeline.EventAnalytics.intervalUnion(ev, "user_id",
            unix_micros(col("ts")),
            unix_micros(col("ts")) +
              floor(col("value") * 1000).cast("long") * 1000L,
            "event_id")
          .orderBy("user_id")
      }),

    // ---- top-3 event types per tumbling hour (the trending board):
    // counts are the stream-able stage, rank is the |windows|x|types|-cell
    // sink stage — the batch face of that split.
    Q("q255_windowed_topk",
      Some("WITH c AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type, " +
        "count(*) AS n FROM events GROUP BY 1, 2), " +
        "r AS (SELECT hour, event_type, n, CAST(row_number() OVER " +
        "(PARTITION BY hour ORDER BY n DESC, event_type ASC) AS INT) AS rank FROM c) " +
        "SELECT hour, rank, event_type, n FROM r WHERE rank <= 3 " +
        "ORDER BY hour, rank"),
      (s, dir) => Streams.windowedTopKBatch(Tables.events(s, dir), k = 3)
        .orderBy("hour", "rank")),

    // ---- keep-latest state view (the CDC "current table"): one keyed
    // (ts, event_id)-max election; the streaming face maintains the same
    // state via mapGroupsWithState (batch ≡ stream spec-pinned).
    Q("q322_latest_state",
      Some("WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us " +
        "FROM events), " +
        "r AS (SELECT user_id, event_id, value, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn " +
        "FROM e) " +
        "SELECT user_id, event_id AS last_event_id, value AS last_value " +
        "FROM r WHERE rn = 1 ORDER BY user_id"),
      (s, dir) => Streams.latestStateBatch(Tables.events(s, dir))
        .orderBy("user_id")),

    // ---- sliding-window counts (6h window / 3h slide — §2.9's missing
    // overlap form): each event lands in exactly width/slide = 2
    // windows, so the oracle replays the assignment by exploding every
    // event into its two epoch-aligned starts (floor-to-slide and one
    // slide earlier) — exact integer µs on both engines.
    Q("q539_sliding_window",
      Some("WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events), " +
        "x AS (SELECT event_type, unnest([" +
        "(us // 10800000000) * 10800000000 - 10800000000, " +
        "(us // 10800000000) * 10800000000]) AS ws FROM e) " +
        "SELECT ws AS window_start_us, event_type, " +
        "CAST(count(*) AS BIGINT) AS n FROM x GROUP BY 1, 2 " +
        "ORDER BY window_start_us, event_type"),
      (s, dir) => Streams.slidingCounts(Tables.events(s, dir))
        .orderBy("window_start_us", "event_type")),

    // ---- chained window-of-window aggregation (Spark 3.4+ multi-
    // stateful-operator surface, batch face): hourly tumbling counts
    // tier into the per-day peak hour via window_time; the election is
    // (n DESC, hour ASC) — the oracle ranks the same hourly rollup.
    // Exact integers end to end (epoch-µs window starts, counts).
    Q("q540_chained_window_peak",
      Some("WITH h AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000 " +
        "AS hs, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1), " +
        "d AS (SELECT (hs // 86400000000) * 86400000000 AS ds, hs, n " +
        "FROM h), " +
        "r AS (SELECT ds, hs, n, row_number() OVER (PARTITION BY ds " +
        "ORDER BY n DESC, hs ASC) AS rk FROM d) " +
        "SELECT ds AS day_start_us, hs AS peak_hour_us, n AS peak_n " +
        "FROM r WHERE rk = 1 ORDER BY day_start_us"),
      (s, dir) => Streams.hourlyPeakPerDay(Tables.events(s, dir))
        .orderBy("day_start_us")),

    // ---- LEFT OUTER attribution (q218's missing half): purchases keep
    // their unmatched rows as organic conversions — the batch face of
    // the outer stream-stream join's watermark-eviction semantics.
    // view_id coalesces to -1 so the sort key is never NULL (Spark
    // orders nulls first ASC, DuckDB last — the fillempty lesson).
    Q("q541_outer_attribution",
      Some("SELECT p.event_id AS purchase_id, " +
        "coalesce(v.event_id, -1) AS view_id, " +
        "v.event_id IS NULL AS organic " +
        "FROM events p LEFT JOIN events v ON p.user_id = v.user_id " +
        "AND v.event_type = 'view' " +
        "AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000 " +
        "AND epoch_us(v.ts) <= epoch_us(p.ts) " +
        "WHERE p.event_type = 'purchase' " +
        "ORDER BY purchase_id, view_id"),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("ts"), col("user_id"))
        Streams.enrichStream(purchases, views, "user_id",
            joinWindowSec = 3600L, joinType = "left_outer")
          .select(col("event_id").as("purchase_id"),
            coalesce(col("l_event_id"), lit(-1L)).as("view_id"),
            col("l_event_id").isNull.as("organic"))
          .orderBy("purchase_id", "view_id")
      })
  )
}
