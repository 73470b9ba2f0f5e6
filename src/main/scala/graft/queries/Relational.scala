package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Ops

/** Relational-operator queries (SURVEY.md §2.3–§2.7) over the TPC-H-ish
  * tables, each paired with DuckDB oracle SQL.
  *
  * Float-determinism policy: double sums are only oracle-compared when the
  * addends are exact (integer-valued doubles) — otherwise the sum is computed
  * in DECIMAL (exact, order-independent under shuffle) and cast back to
  * double in BOTH engines. Averages are sum/count in the same style, never
  * the engines' own avg() (whose internal types differ).
  */
object Relational {

  /** Exact, shuffle-order-independent sum of a double column. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast(DoubleType)
  private def dsumSql(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(24,6))) AS DOUBLE)"

  val qs: Seq[Q] = Seq(

    // ---- Flagship: read → filter → group → agg → sort (E1 pipeline shape,
    // TPC-H Q1-shaped; exercises P2 tfilter, P1 cut, A3 group, O1 sort).
    Q("q01_pricing_summary",
      Some("SELECT l_returnflag, l_linestatus, " +
        "SUM(l_quantity) AS sum_qty, " +
        dsumSql("l_extendedprice") + " AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge, " +
        "SUM(l_quantity) / COUNT(*) AS avg_qty, " +
        dsumSql("l_extendedprice") + " / COUNT(*) AS avg_price, " +
        dsumSql("l_discount") + " / COUNT(*) AS avg_disc, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
      (s, dir) => {
        val li = Ops.tfilter(Tables.lineitem(s, dir), "l_shipdate",
          _ <= lit("2000-09-02").cast(TimestampType))
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

    // ---- P1 cut: projection (+ exclude variant is the same plan shape).
    Q("q02_cut",
      Some("SELECT p_partkey, p_name, p_retailprice FROM part ORDER BY p_partkey"),
      (s, dir) => Ops.cut(Tables.part(s, dir), Seq("p_partkey", "p_name", "p_retailprice"))
        .orderBy("p_partkey")),

    // ---- P2 tfilter: single-field predicate.
    Q("q03_tfilter",
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey"),
      (s, dir) => Ops.cut(
        Ops.tfilter(Tables.customer(s, dir), "c_mktsegment", _ === "BUILDING"),
        Seq("c_custkey", "c_name", "c_acctbal")).orderBy("c_custkey")),

    // ---- P3 grep: OR of regex + substring rules.
    Q("q04_grep_any",
      Some("SELECT p_partkey, p_name, p_type FROM part " +
        "WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)') OR contains(p_name, 'widget') " +
        "ORDER BY p_partkey"),
      (s, dir) => Ops.cut(
        Ops.grep(Tables.part(s, dir), Seq(
          Ops.Regex("^(PROMO|ECONOMY)", Seq("p_type")),
          Ops.Substr("widget", Seq("p_name"))), anyMatch = true),
        Seq("p_partkey", "p_name", "p_type")).orderBy("p_partkey")),

    // ---- P3 grep: AND + inverse.
    Q("q05_grep_inverse",
      Some("SELECT p_partkey, p_name, p_type FROM part " +
        "WHERE NOT (regexp_matches(p_type, '^STANDARD') AND contains(p_name, 'bolt')) " +
        "ORDER BY p_partkey"),
      (s, dir) => Ops.cut(
        Ops.grep(Tables.part(s, dir), Seq(
          Ops.Regex("^STANDARD", Seq("p_type")),
          Ops.Substr("bolt", Seq("p_name"))), anyMatch = false, inverse = true),
        Seq("p_partkey", "p_name", "p_type")).orderBy("p_partkey")),

    // ---- P4 unique: exact distributed dedupe on a field subset.
    Q("q06_unique",
      Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders " +
        "ORDER BY o_orderstatus, o_orderpriority"),
      (s, dir) => Ops.unique(
        Ops.cut(Tables.orders(s, dir), Seq("o_orderstatus", "o_orderpriority")))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // ---- P5 hash: md5 / sha2 digest columns.
    Q("q07_hash",
      Some("SELECT c_custkey, md5(c_name) AS c_name, sha256(c_mktsegment) AS c_mktsegment " +
        "FROM customer ORDER BY c_custkey"),
      (s, dir) => {
        val base = Ops.cut(Tables.customer(s, dir), Seq("c_custkey", "c_name", "c_mktsegment"))
        Ops.hashFields(Ops.hashFields(base, Seq("c_name"), "md5"),
          Seq("c_mktsegment"), "sha256").orderBy("c_custkey")
      }),

    // ---- P6 fillempty: constant fill (nulls synthesized via NULLIF).
    Q("q08_fill_constant",
      Some("SELECT o_orderkey, COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'UNSPECIFIED') AS prio " +
        "FROM orders ORDER BY o_orderkey"),
      (s, dir) => {
        val o = Tables.orders(s, dir).select(
          col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")).as("prio"))
        Ops.fillConstant(o, "UNSPECIFIED", Seq("prio")).orderBy("o_orderkey")
      }),

    // ---- P6 fillempty: forward fill within partitions over explicit order.
    Q("q09_fill_forward",
      Some("SELECT o_orderkey, o_custkey, last_value(v IGNORE NULLS) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v " +
        "FROM (SELECT o_orderkey, o_custkey, " +
        "CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS v FROM orders) " +
        "ORDER BY o_orderkey"),
      (s, dir) => {
        val o = Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_custkey"),
          when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_totalprice")).as("v"))
        Ops.fillDirectional(o, Seq("v"), ord = Seq("o_orderkey"),
          partitionBy = Seq("o_custkey")).orderBy("o_orderkey")
      }),

    // ---- O1 + O2: multi-key desc sort with limit (top-k → TakeOrdered plan).
    Q("q10_sort_limit",
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
      (s, dir) => Ops.cut(Tables.orders(s, dir), Seq("o_orderkey", "o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(100)),

    // ---- S13 concat: ragged union-all (missing column → null).
    Q("q11_concat",
      Some("SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal FROM customer " +
        "UNION ALL SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) FROM supplier " +
        "ORDER BY name"),
      (s, dir) => {
        val c = Tables.customer(s, dir).select(
          col("c_custkey").as("id"), col("c_name").as("name"), col("c_acctbal").as("acctbal"))
        val sup = Tables.supplier(s, dir).select(
          col("s_suppkey").as("id"), col("s_name").as("name"))
        Ops.concat(Seq(c, sup)).orderBy("name")
      }),

    // ---- J1: the reference's cartesian-product join.
    Q("q12_product_join",
      Some("SELECT n_nationkey, n_name, n_regionkey, r_regionkey, r_name " +
        "FROM nation CROSS JOIN region ORDER BY n_nationkey, r_regionkey"),
      (s, dir) => Ops.productJoin(Tables.nation(s, dir), Tables.region(s, dir))
        .orderBy("n_nationkey", "r_regionkey")),

    // ---- J-uplift: broadcast equi-join chain + group aggregate.
    Q("q13_equi_join",
      Some("SELECT r_name, COUNT(*) AS n_cust, " + dsumSql("c_acctbal") + " AS sum_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name"),
      (s, dir) => {
        val joined = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        joined.groupBy("r_name")
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy("r_name")
      }),

    // ---- J-uplift: left-semi (EXISTS).
    Q("q14_semi_join",
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey IN " +
        "(SELECT l_orderkey FROM lineitem WHERE l_quantity > 45) ORDER BY o_orderkey"),
      (s, dir) => {
        val big = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
          .select(col("l_orderkey").as("o_orderkey"))
        Ops.equiJoin(Ops.cut(Tables.orders(s, dir), Seq("o_orderkey", "o_totalprice")),
          big, Seq("o_orderkey"), "left_semi").orderBy("o_orderkey")
      }),

    // ---- J-uplift: left-anti (NOT EXISTS).
    Q("q15_anti_join",
      Some("SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN " +
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') ORDER BY c_custkey"),
      (s, dir) => {
        val cust = Ops.cut(Tables.customer(s, dir), Seq("c_custkey", "c_name"))
        val withOrders = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("c_custkey"))
        Ops.equiJoin(cust, withOrders, Seq("c_custkey"), "left_anti").orderBy("c_custkey")
      }),

    // ---- A1/A2: whole-stream aggregate / per-column merge-agg.
    Q("q16_aggregate_global",
      Some("SELECT SUM(l_quantity) AS sum_qty, " +
        dsumSql("l_extendedprice") + " AS sum_price, " +
        dsumSql("l_discount") + " / COUNT(l_discount) AS mean_disc, " +
        "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price, " +
        "COUNT(*) AS n FROM lineitem"),
      (s, dir) => Tables.lineitem(s, dir).agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        (dsum(col("l_discount")) / count(col("l_discount"))).as("mean_disc"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("n"))),

    // ---- A3 group: groupBy + multi-agg (hash agg w/ map-side partials).
    Q("q17_group",
      Some("SELECT o_custkey, COUNT(*) AS n_orders, " + dsumSql("o_totalprice") +
        " AS total_spent, MAX(o_orderdate) AS last_order " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
      (s, dir) => Ops.groupAgg(Tables.orders(s, dir), Seq("o_custkey"), Seq(
        "n_orders" -> ("count", "o_orderkey"),
        "total_spent" -> ("dsum", "o_totalprice"),
        "last_order" -> ("max", "o_orderdate"))).orderBy("o_custkey")),

    // ---- A4 pivot: explicit value list (no distinct pre-scan; stable schema).
    Q("q18_pivot",
      Some("SELECT n_name, " +
        "COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS AUTOMOBILE, " +
        "COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS BUILDING, " +
        "COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS FURNITURE, " +
        "COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS HOUSEHOLD, " +
        "COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS MACHINERY " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
      (s, dir) => {
        val joined = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        Ops.pivot(joined, rows = Seq("n_name"), column = "c_mktsegment",
          data = "c_custkey", op = "count",
          values = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
          fillValue = Some(0L)).orderBy("n_name")
      }),

    // ---- A5 normalize (melt / unpivot).
    Q("q19_normalize",
      Some("SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part " +
        "UNION ALL SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part " +
        "ORDER BY p_partkey, metric"),
      (s, dir) => Ops.normalize(Tables.part(s, dir),
        fields = Seq("p_retailprice", "p_size"), column = "metric", data = "val",
        keep = Seq("p_partkey"), castTo = Some(DoubleType))
        .orderBy("p_partkey", "metric")),

    // ---- O4 everseen: running extrema (cummax) per partition.
    Q("q20_everseen",
      Some("SELECT o_orderkey, o_custkey, o_totalprice, " +
        "MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o_totalprice_running " +
        "FROM orders ORDER BY o_orderkey"),
      (s, dir) => Ops.everseen(
        Ops.cut(Tables.orders(s, dir), Seq("o_orderkey", "o_custkey", "o_totalprice")),
        field = "o_totalprice", ord = Seq("o_orderkey"),
        partitionBy = Seq("o_custkey"), op = "max", pad = true)
        .orderBy("o_orderkey")),

    // ---- keep-latest upsert (corpus refresh / SCD-1): a deterministic
    // update batch (re-priced orders for keys % 7 == 0 at version 2, plus
    // brand-new keys for keys % 13 == 0) merges into the base; highest
    // version wins per key, ties to the incoming batch. The oracle runs
    // the same union + rank.
    Q("q68_upsert",
      Some("WITH base AS (SELECT o_orderkey, 1 AS v, o_totalprice FROM orders), " +
        "upd AS (SELECT o_orderkey, 2 AS v, o_totalprice + 1000.0 AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 7 = 0 " +
        "UNION ALL SELECT o_orderkey + 10000000 AS o_orderkey, 1 AS v, 42.5 AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 13 = 0), " +
        "u AS (SELECT *, 0 AS src FROM base UNION ALL SELECT *, 1 AS src FROM upd), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC, src DESC) AS rnk FROM u) " +
        "SELECT o_orderkey, v, o_totalprice FROM r WHERE rnk = 1 ORDER BY o_orderkey"),
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val base = orders.select(col("o_orderkey"), lit(1).as("v"), col("o_totalprice"))
        val upd = orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .select(col("o_orderkey"), lit(2).as("v"),
            (col("o_totalprice") + 1000.0).as("o_totalprice"))
          .unionByName(orders.filter(pmod(col("o_orderkey"), lit(13)) === 0)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              lit(1).as("v"), lit(42.5).as("o_totalprice")))
        Ops.upsert(base, upd, "o_orderkey", "v").orderBy("o_orderkey")
      }),

    // ---- TPC-H Q5-shaped six-table revenue rollup: the multi-join
    // flagship. Dims (region→nation→customer/supplier) broadcast; the
    // only fact-table exchanges are orders⋈lineitem on the orderkey and
    // the final n_name aggregate. Revenue = extendedprice·(1−discount)
    // per row (2dp×2dp = 4dp, exact at DECIMAL(28,6)), decimal-summed.
    Q("q115_revenue_rollup",
      Some("SELECT n_name, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_items FROM customer " +
        "JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name ORDER BY n_name"),
      (s, dir) => {
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(28, 6))
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA" &&
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy("n_name")
          .agg(sum(rev).cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")
      }),

    // ---- TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    // half-year window — nation broadcasts, the two fact keys shuffle,
    // decimal-exact revenue, TakeOrdered cutoff (never a global sort),
    // custkey tiebreak pins the LIMIT boundary.
    Q("q135_top_customers",
      Some("SELECT c_custkey, c_name, n_name, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_items FROM customer " +
        "JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1996-07-01' " +
        "GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20"),
      (s, dir) => {
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(28, 6))
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .filter(col("l_returnflag") === "R" &&
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(sum(rev).cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      })
  )
}
