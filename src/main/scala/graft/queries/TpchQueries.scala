package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.pipeline.EventAnalytics

/** TPC-H-shaped relational drivers over the synthetic star schema — the
  * classic warehouse plans a user of the reference would hand-roll from its
  * join/aggregate primitives (`meza/process.py:join/aggregate/group`),
  * re-expressed as single declarative Spark plans so Catalyst supplies the
  * join order, broadcasts, and partial aggregation the reference lacks.
  *
  * Present shapes (adapted to the driver schema, which has no partsupp and
  * no l_shipmode/l_commitdate): Q6 (selective scan aggregate), Q4 (semi-join
  * EXISTS), Q7 (two-nation volume matrix), Q8 (market share ratio), Q14
  * (promo revenue share), Q18 (large-order top-k), Q2 (min-cost supplier per
  * part), Q22 (inactive high-balance customers), Q12 (priority x linestatus
  * matrix). Q1/Q3/Q5/Q10 live in earlier waves (q01, q174, q115, q135).
  *
  * Float discipline (= Relational's): money sums accumulate in DECIMAL —
  * exact and shuffle-order-independent — and cast to double once in BOTH
  * engines; ratios are ONE IEEE division of two such sums; calendar years
  * come from `year(ts)` (proleptic Gregorian on a UTC session in both
  * engines — deterministic integer, unlike float date arithmetic).
  */
object TpchQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(24, 6))
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  private val revSql = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) " +
    "AS DECIMAL(24,6))) AS DOUBLE)"
  private def rev: Column = dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
  private def ts(d: String): Column = lit(d).cast("timestamp")

  val qs: Seq[Q] = Seq(

    // ---- Q6 forecast-revenue: the pure pushdown showcase — every predicate
    // reaches the parquet scan, one partial+final aggregate, zero joins.
    Q("q175_tpch_q6",
      Some("SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))) " +
        "AS DOUBLE) AS revenue, count(*) AS n_items FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))),

    // ---- Q4 order-priority checking, EXISTS as a LEFT SEMI join (the only
    // scale-sane EXISTS plan): the quarter filter prunes orders at the scan,
    // the returnflag filter prunes lineitem before its one shuffle.
    Q("q176_tpch_q4",
      Some("SELECT o_orderpriority, count(*) AS order_count FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-07-01' " +
        "AND o_orderdate < TIMESTAMP '1996-10-01' " +
        "AND o_orderkey IN (SELECT l_orderkey FROM lineitem " +
        "WHERE l_returnflag = 'R') " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"), "semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // ---- Q7 volume shipping between two nations: both nation-tagged dims
    // broadcast (supplier and customer shrink to the two-nation slice), the
    // fact joins orders co-keyed; revenue per (supp_nation, cust_nation,
    // ship year) cell.
    Q("q177_tpch_q7",
      Some("WITH sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE n_name IN ('NATION_3', 'NATION_7')), " +
        "cn AS (SELECT c_custkey, n_name AS cust_nation FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE n_name IN ('NATION_3', 'NATION_7')) " +
        "SELECT supp_nation, cust_nation, year(l_shipdate) AS l_year, " +
        revSql + " AS revenue, count(*) AS n_items " +
        "FROM lineitem JOIN sn ON l_suppkey = s_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN cn ON c_custkey = o_custkey " +
        "WHERE supp_nation <> cust_nation " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
      (s, dir) => {
        val nat = Tables.nation(s, dir)
          .filter(col("n_name").isin("NATION_3", "NATION_7"))
        val sn = Tables.supplier(s, dir)
          .join(nat, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation"))
        val cn = Tables.customer(s, dir)
          .join(nat, col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey").as("o_custkey"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1998-01-01"))
          .join(broadcast(sn), Seq("l_suppkey"))
          .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cn), Seq("o_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(rev.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }),

    // ---- Q8 market share: NATION_9's slice of ASIA-customer LARGE-part
    // revenue per order year — the ratio is ONE IEEE division of two
    // decimal-exact sums, rounded 6dp.
    Q("q178_tpch_q8",
      Some("WITH sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier " +
        "JOIN nation ON s_nationkey = n_nationkey), " +
        "rc AS (SELECT c_custkey FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'), " +
        "base AS (SELECT year(o_orderdate) AS o_year, " +
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) AS vol, " +
        "supp_nation FROM lineitem " +
        "JOIN part ON p_partkey = l_partkey AND p_type = 'LARGE' " +
        "JOIN sn ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN rc ON c_custkey = o_custkey " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01') " +
        "SELECT o_year, round(CAST(SUM(CASE WHEN supp_nation = 'NATION_9' " +
        "THEN vol ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE) / " +
        "CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share, " +
        "CAST(SUM(vol) AS DOUBLE) AS total_vol " +
        "FROM base GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val sn = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation"))
        val rc = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey").as("o_custkey"))
        val vol = dec(col("l_extendedprice") * (lit(1) - col("l_discount")))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "LARGE")
            .select(col("p_partkey").as("l_partkey"))), Seq("l_partkey"))
          .join(broadcast(sn), Seq("l_suppkey"))
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1998-01-01"))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(rc, Seq("o_custkey"), "semi")
          .select(year(col("o_orderdate")).cast("long").as("o_year"),
            vol.as("vol"), col("supp_nation"))
          .groupBy("o_year")
          .agg(round(
            sum(when(col("supp_nation") === "NATION_9", col("vol"))
              .otherwise(dec(lit(0)))).cast(DoubleType) /
              sum(col("vol")).cast(DoubleType), 6).as("mkt_share"),
            sum(col("vol")).cast(DoubleType).as("total_vol"))
          .orderBy("o_year")
      }),

    // ---- Q14 promo revenue share for one ship month: part dim broadcast,
    // the percentage is one division of two decimal-exact sums.
    Q("q179_tpch_q14",
      Some("SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' " +
        "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) " +
        "ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE) / " +
        revSql + ", 6) AS promo_pct, " + revSql + " AS total_revenue " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-09-01' " +
        "AND l_shipdate < TIMESTAMP '1996-10-01'"),
      (s, dir) => {
        val vol = dec(col("l_extendedprice") * (lit(1) - col("l_discount")))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= ts("1996-09-01") &&
            col("l_shipdate") < ts("1996-10-01"))
          .join(broadcast(Tables.part(s, dir)
            .select(col("p_partkey").as("l_partkey"), col("p_type"))),
            Seq("l_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", vol).otherwise(dec(lit(0))))
              .cast(DoubleType) / sum(vol).cast(DoubleType), 6).as("promo_pct"),
            sum(vol).cast(DoubleType).as("total_revenue"))
      }),

    // ---- Q18 large-volume orders: the HAVING aggregate runs on lineitem's
    // one orderkey shuffle BEFORE any dim joins touch it (the survivors are
    // a tiny fraction), then a TakeOrdered top-10 cutoff.
    Q("q180_tpch_q18",
      Some("WITH big AS (SELECT l_orderkey AS o_orderkey, " +
        "sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1 " +
        "HAVING sum(l_quantity) > 300) " +
        "SELECT c_custkey, c_name, o_orderkey, " +
        "epoch_us(o_orderdate) // 86400000000 AS o_day, o_totalprice, sum_qty " +
        "FROM big JOIN orders USING (o_orderkey) " +
        "JOIN customer ON c_custkey = o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300)
        big.join(Tables.orders(s, dir), Seq("o_orderkey"))
          .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            EventAnalytics.dayIndex(col("o_orderdate")).as("o_day"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(10)
      }),

    // ---- Q2-shape min-cost supplier per part (no partsupp table: unit cost
    // derives from lineitem as min(extendedprice / quantity) — each a single
    // IEEE division of two parquet doubles, so min() selects a data element).
    // The per-part argmin is ONE aggregate of a (cost, suppkey) struct —
    // never a window — and the part filter prunes before the final join.
    Q("q181_tpch_q2",
      Some("WITH cost AS (SELECT l_partkey AS pk, l_suppkey AS sk, " +
        "min(l_extendedprice / l_quantity) AS unit_cost FROM lineitem " +
        "GROUP BY 1, 2), " +
        "best AS (SELECT pk, sk, unit_cost, row_number() OVER " +
        "(PARTITION BY pk ORDER BY unit_cost, sk) AS rn FROM cost) " +
        "SELECT p_partkey, p_brand, s_name, n_name AS supp_nation, unit_cost " +
        "FROM best JOIN part ON p_partkey = pk " +
        "AND p_size BETWEEN 20 AND 30 " +
        "JOIN supplier ON s_suppkey = sk " +
        "JOIN nation ON n_nationkey = s_nationkey " +
        "WHERE rn = 1 ORDER BY unit_cost DESC, p_partkey LIMIT 100"),
      (s, dir) => {
        val cost = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
        val best = cost.groupBy("pk")
          .agg(min(struct(col("unit_cost"), col("sk"))).as("m"))
          .select(col("pk"), col("m.sk").as("sk"), col("m.unit_cost").as("unit_cost"))
        best
          .join(broadcast(Tables.part(s, dir).filter(col("p_size").between(20, 30))
            .select(col("p_partkey"), col("p_brand"))),
            col("pk") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, dir)
            .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("s_name"), col("n_name"))),
            col("sk") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_brand"), col("s_name"),
            col("n_name").as("supp_nation"), col("unit_cost"))
          .orderBy(col("unit_cost").desc, col("p_partkey").asc).limit(100)
      }),

    // ---- Q22 lapsed high-balance customers: the scalar threshold (one
    // IEEE division of a decimal-exact sum by a count) broadcasts back, the
    // "no recent order" test is a LEFT ANTI join against the distinct
    // recent-buyer set — NOT IN at scale without the null-semantics trap.
    // (The literal "never ordered" form is empty on this synthetic data —
    // every customer has orders — so the cutoff supplies real survivors.)
    Q("q182_tpch_q22",
      Some("WITH t AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) " +
        "AS DOUBLE) / count(*) AS thr FROM customer WHERE c_acctbal > 0.0) " +
        "SELECT c_nationkey AS cntrycode, count(*) AS numcust, " +
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS totacctbal " +
        "FROM customer, t WHERE c_acctbal > thr " +
        "AND c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '2000-01-01') " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val thr = cust.filter(col("c_acctbal") > 0.0)
          .agg((dsum(col("c_acctbal")) / count(lit(1))).as("thr"))
        cust.crossJoin(broadcast(thr))
          .filter(col("c_acctbal") > col("thr"))
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= ts("2000-01-01"))
            .select(col("o_custkey").as("c_custkey")).distinct(),
            Seq("c_custkey"), "anti")
          .groupBy(col("c_nationkey").cast("int").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy("cntrycode")
      }),

    // ---- Q12-shape priority x linestatus matrix (schema has no shipmode;
    // linestatus plays its role): one co-keyed fact join, conditional counts.
    Q("q183_tpch_q12",
      Some("SELECT l_linestatus, " +
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_count, " +
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_count " +
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
          .join(Tables.lineitem(s, dir)
            .filter(col("l_shipdate") >= ts("1997-01-01") &&
              col("l_shipdate") < ts("1998-01-01"))
            .select(col("l_orderkey").as("o_orderkey"), col("l_linestatus")),
            Seq("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_count"),
            sum(when(hi, 0L).otherwise(1L)).as("low_count"))
          .orderBy("l_linestatus")
      }),

    // ---- Q13 customer order-count distribution: LEFT join keeps
    // zero-order customers, count(o_orderkey) ignores the null padding,
    // then the double grouping — the classic histogram-of-counts shape.
    Q("q198_tpch_q13",
      Some("WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "AND o_orderpriority <> '5-LOW' GROUP BY 1) " +
        "SELECT c_count, count(*) AS custdist FROM co GROUP BY 1 " +
        "ORDER BY custdist DESC, c_count DESC"),
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") =!= "5-LOW"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // ---- Q15 top supplier(s) of a quarter: the scalar max broadcasts back
    // and equality selects the winner(s) — total_revenue is a decimal-exact
    // sum cast once, so the equality compares identical doubles.
    Q("q199_tpch_q15",
      Some("WITH rev AS (SELECT l_suppkey, " + revSql + " AS total_revenue " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) " +
        "SELECT s_suppkey, s_name, total_revenue FROM supplier " +
        "JOIN rev ON s_suppkey = l_suppkey " +
        "WHERE total_revenue = (SELECT max(total_revenue) FROM rev) " +
        "ORDER BY s_suppkey"),
      (s, dir) => {
        val suppRev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1996-04-01"))
          .groupBy("l_suppkey").agg(rev.as("total_revenue"))
        val mx = suppRev.agg(max(col("total_revenue")).as("__mx"))
        suppRev.crossJoin(broadcast(mx))
          .filter(col("total_revenue") === col("__mx"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      }),

    // ---- Q17 small-quantity revenue: the per-part average-quantity gate
    // runs as the INTEGER inequality 5·qty·cnt < Σqty (never a float avg),
    // and the per-part stats join the brand slice co-keyed.
    Q("q200_tpch_q17",
      Some("WITH pa AS (SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sq, " +
        "count(*) AS cnt FROM lineitem GROUP BY 1) " +
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / 7.0 " +
        "AS avg_yearly, count(*) AS n_items FROM lineitem " +
        "JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#13' " +
        "JOIN pa USING (l_partkey) " +
        "WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sq"),
      (s, dir) => {
        val pa = Tables.lineitem(s, dir).groupBy("l_partkey")
          .agg(sum(col("l_quantity").cast("long")).as("sq"),
            count(lit(1)).as("cnt"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).filter(col("p_brand") === "Brand#13")
            .select(col("p_partkey").as("l_partkey"))), Seq("l_partkey"))
          .join(pa, Seq("l_partkey"))
          .filter(col("l_quantity").cast("long") * 5 * col("cnt") < col("sq"))
          .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
            count(lit(1)).as("n_items"))
      }),

    // ---- Q19 discounted-revenue with OR-of-ANDs predicates: the classic
    // disjunctive filter — part attributes broadcast, the disjunction
    // evaluates row-local after the one hash join.
    Q("q208_tpch_q19",
      Some("SELECT " + revSql + " AS revenue, count(*) AS n_items " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey WHERE " +
        "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 " +
        "AND l_quantity BETWEEN 1 AND 21) OR " +
        "(p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 " +
        "AND l_quantity BETWEEN 10 AND 30) OR " +
        "(p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 " +
        "AND l_quantity BETWEEN 20 AND 40)"),
      (s, dir) => {
        def arm(brand: String, szHi: Int, qLo: Int, qHi: Int) =
          col("p_brand") === brand && col("p_size").between(1, szHi) &&
            col("l_quantity").between(qLo, qHi)
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .select(col("p_partkey").as("l_partkey"), col("p_brand"), col("p_size"))),
            Seq("l_partkey"))
          .filter(arm("Brand#12", 15, 1, 21) || arm("Brand#23", 20, 10, 30) ||
            arm("Brand#3", 25, 20, 40))
          .agg(rev.as("revenue"), count(lit(1)).as("n_items"))
      }),

    // ---- Q21 waiting-supplier shape (schema has no commit/receipt dates:
    // "late" = shipped > 90 days after order date): suppliers late on a
    // finished multi-supplier order where EVERY other supplier was on time
    // — the classic EXISTS/NOT-EXISTS pair as one semi + one anti join on
    // the orderkey with a supplier-inequality residual.
    Q("q209_tpch_q21",
      Some("WITH lo AS (SELECT l_orderkey, l_suppkey, " +
        "epoch_us(l_shipdate) // 86400000000 - " +
        "epoch_us(o_orderdate) // 86400000000 > 90 AS late " +
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey " +
        "WHERE o_orderstatus = 'F'), " +
        "l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late) " +
        "SELECT s_name, count(*) AS numwait FROM l1 " +
        "JOIN supplier ON s_suppkey = l1.l_suppkey " +
        "WHERE EXISTS (SELECT 1 FROM lo l2 WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lo l3 WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.late) " +
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20"),
      (s, dir) => {
        val lo = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (EventAnalytics.dayIndex(col("l_shipdate")) -
              EventAnalytics.dayIndex(col("o_orderdate")) > 90).as("late"))
        val l1 = lo.filter(col("late"))
          .select("l_orderkey", "l_suppkey").distinct()
        l1.join(lo.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("s2")),
            col("ok2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"),
            "semi")
          .join(lo.filter(col("late"))
            .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("s3")),
            col("ok3") === col("l_orderkey") && col("s3") =!= col("l_suppkey"),
            "anti")
          .join(broadcast(Tables.supplier(s, dir)),
            col("s_suppkey") === col("l_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name").asc).limit(20)
      }),

    // ---- Q9 product-profit shape (no partsupp: cost basis = retailprice/2
    // per unit — exact in double, 0.5 is a power of two): profit by
    // supplier nation x order year over the widget product line.
    Q("q210_tpch_q9",
      Some("SELECT n_name, year(o_orderdate) AS o_year, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) - " +
        "CAST(p_retailprice * l_quantity * 0.5 AS DECIMAL(24,6))) AS DOUBLE) " +
        "AS profit FROM lineitem " +
        "JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%' " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN nation ON n_nationkey = s_nationkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_name").like("%widget%"))
          .select(col("p_partkey").as("l_partkey"), col("p_retailprice"))),
          Seq("l_partkey"))
        .join(broadcast(Tables.supplier(s, dir)
          .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey").as("l_suppkey"), col("n_name"))),
          Seq("l_suppkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))) -
          dec(col("p_retailprice") * col("l_quantity") * 0.5))
          .cast(DoubleType).as("profit"))
        .orderBy("n_name", "o_year")),

    // ---- Q16 supplier-variety shape: distinct suppliers per (brand, type,
    // size) over the observed supplier-part pairs, excluding low-balance
    // suppliers via the classic NOT IN (planned as an anti join).
    Q("q211_tpch_q16",
      Some("SELECT p_brand, p_type, p_size, " +
        "count(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps " +
        "JOIN part ON p_partkey = l_partkey " +
        "WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 9, 16, 25, 36, 49) " +
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier " +
        "WHERE s_acctbal < 1000) " +
        "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
      (s, dir) => Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#5" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select(col("p_partkey").as("l_partkey"), col("p_brand"),
            col("p_type"), col("p_size"))), Seq("l_partkey"))
        .join(Tables.supplier(s, dir).filter(col("s_acctbal") < 1000)
          .select(col("s_suppkey").as("l_suppkey")), Seq("l_suppkey"), "anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)),

    // ---- Q11 important-stock shape (no partsupp: part value = revenue via
    // one region's suppliers): parts whose value exceeds 0.1% of the total
    // — the threshold compares value*1000 > total in EXACT decimals, no
    // float fraction near the cut.
    Q("q212_tpch_q11",
      Some("WITH v AS (SELECT l_partkey, " +
        "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS val " +
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN nation ON n_nationkey = s_nationkey " +
        "WHERE n_regionkey = 2 GROUP BY 1), " +
        "t AS (SELECT SUM(val) AS total FROM v) " +
        "SELECT l_partkey, CAST(val AS DOUBLE) AS value FROM v, t " +
        "WHERE val * 1000 > total ORDER BY value DESC, l_partkey"),
      (s, dir) => {
        val v = Tables.lineitem(s, dir)
          .join(broadcast(Tables.supplier(s, dir)
            .join(Tables.nation(s, dir).filter(col("n_regionkey") === 2),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey").as("l_suppkey"))), Seq("l_suppkey"))
          .groupBy("l_partkey")
          .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("val"))
        val t = v.agg(sum(col("val")).as("total"))
        v.crossJoin(broadcast(t))
          .filter(col("val") * 1000 > col("total"))
          .select(col("l_partkey"), col("val").cast(DoubleType).as("value"))
          .orderBy(col("value").desc, col("l_partkey").asc)
      }),

    // ---- Q20 potential-promotion shape (no partsupp: "excess availability"
    // becomes DOMINANT SUPPLY — a supplier whose 1997 shipped quantity of
    // some small-line part exceeds half that part's total 1997 volume).
    // Completes the 22-query TPC-H sweep. The (supp, part) aggregate is
    // computed ONCE and reused for the per-part totals (sum of sums — an
    // AQE-broadcast second aggregate over the already-keyed relation, never
    // a second scan of the fact); the dominance threshold compares
    // qty·2 > tot in EXACT decimals, no 0.5 float near the cut; the
    // supplier filter is the classic nested IN planned as a semi join.
    Q("q231_tpch_q20",
      Some("WITH sp AS (SELECT l_suppkey, l_partkey, " +
        "SUM(CAST(l_quantity AS DECIMAL(24,6))) AS qty FROM lineitem " +
        "JOIN part ON p_partkey = l_partkey AND p_name LIKE 'small%' " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01' GROUP BY 1, 2), " +
        "pt AS (SELECT l_partkey, SUM(qty) AS tot FROM sp GROUP BY 1) " +
        "SELECT s_name, s_acctbal FROM supplier " +
        "JOIN nation ON n_nationkey = s_nationkey AND n_regionkey = 2 " +
        "WHERE s_suppkey IN (SELECT l_suppkey FROM sp " +
        "JOIN pt USING (l_partkey) WHERE qty * 2 > tot) ORDER BY s_name"),
      (s, dir) => {
        val sp = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= ts("1997-01-01") &&
            col("l_shipdate") < ts("1998-01-01"))
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_name").like("small%"))
            .select(col("p_partkey").as("l_partkey"))), Seq("l_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(dec(col("l_quantity"))).as("qty"))
        val pt = sp.groupBy("l_partkey").agg(sum(col("qty")).as("tot"))
        val dominant = sp.join(pt, Seq("l_partkey"))
          .filter(col("qty") * 2 > col("tot"))
          .select(col("l_suppkey").as("s_suppkey")).distinct()
        Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .filter(col("n_regionkey") === 2)
            .select(col("n_nationkey").as("s_nationkey"))), Seq("s_nationkey"))
          .join(dominant, Seq("s_suppkey"), "semi")
          .select(col("s_name"), col("s_acctbal"))
          .orderBy("s_name")
      })
  )
}
