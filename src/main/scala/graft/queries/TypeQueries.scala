package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.{Lenient, LenientDatetimeExpr}
import graft.types.DetectTypes

/** The q23 oracle: DetectTypes.detect replayed in DuckDB SQL. Kept in its
  * own object — it is by far the longest oracle and reads as one program.
  */
private object DetectOracleSql {

  private val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")
  private val orderBy = cols.mkString(", ")
  // stripped form: currency symbols + thousands separators removed (the
  // lenient-numeric preprocessing of typetools' guess chain)
  private val st = "replace(translate(val, '$£€', ''), ',', '')"

  val q23: String =
    s"WITH ord AS (SELECT row_number() OVER (ORDER BY $orderBy) AS rn, * " +
      s"FROM lineitem ORDER BY $orderBy LIMIT 100), " +
      "str AS (SELECT rn, " +
      cols.map(c => s"CAST($c AS VARCHAR) AS $c").mkString(", ") + " FROM ord), " +
      s"vals AS (UNPIVOT str ON $orderBy INTO NAME field VALUE val), " +
      // guessByValue: null -> bool -> int/float (with currency strip and the
      // leading-zero rule) -> datetime -> date -> text
      "g AS (SELECT rn, field, CASE " +
      "WHEN val IS NULL OR trim(val) = '' OR lower(val) IN ('na', 'n/a', 'none', 'null', '.') THEN 'null' " +
      "WHEN lower(val) IN ('yes', 'y', 'true', 't', 'no', 'n', 'false', 'f') THEN 'bool' " +
      s"WHEN try_cast($st AS DOUBLE) IS NOT NULL " +
      s"AND NOT (regexp_matches($st, '^0[0-9]') AND try_cast($st AS DOUBLE) != 0.0) " +
      s"THEN CASE WHEN try_cast($st AS DOUBLE) = floor(try_cast($st AS DOUBLE)) " +
      "THEN 'int' ELSE 'float' END " +
      "WHEN regexp_matches(val, '^\\d{4}-\\d{1,2}-\\d{1,2} \\d{1,2}:\\d{2}(:\\d{2})?$') THEN 'datetime' " +
      "WHEN regexp_matches(val, '^\\d{4}-\\d{1,2}-\\d{1,2}$') THEN 'date' " +
      "ELSE 'text' END AS guess FROM vals), " +
      // cumulative votes per (field, guess) at every prefix length n
      "ns AS (SELECT unnest(range(1, 1 + (SELECT max(rn) FROM str))) AS n), " +
      "votes AS (SELECT g.field, g.guess, ns.n, count(*) AS v " +
      "FROM g JOIN ns ON g.rn <= ns.n GROUP BY 1, 2, 3), " +
      // MezaType.merge over the prefix's distinct guess set
      "merged AS (SELECT field, n, CASE " +
      "WHEN len(nn) = 0 THEN 'null' WHEN len(nn) = 1 THEN nn[1] " +
      "WHEN len(list_filter(nn, x -> x NOT IN ('float', 'int'))) = 0 THEN 'float' " +
      "WHEN len(list_filter(nn, x -> x NOT IN ('date', 'time', 'datetime'))) = 0 THEN 'datetime' " +
      "WHEN len(list_filter(nn, x -> x NOT IN ('bool', 'int'))) = 0 THEN 'int' " +
      "ELSE 'text' END AS mt FROM (SELECT field, n, " +
      "list_filter(list_sort(list(guess)), x -> x != 'null') AS nn " +
      "FROM votes GROUP BY field, n)), " +
      // confidence of the merged type's OWN votes (0 when the merge target
      // was never voted), rounded to 2dp like the reference
      "conf AS (SELECT m.field, m.n, m.mt, " +
      "round(6.0 * ln(1 + coalesce(v.v, 0)) / (1 + 6.0 * ln(1 + coalesce(v.v, 0))), 2) AS c " +
      "FROM merged m LEFT JOIN votes v ON v.field = m.field AND v.n = m.n AND v.guess = m.mt), " +
      "minc AS (SELECT n, min(c) AS mc FROM conf GROUP BY n), " +
      // earliest converged prefix; the full sample if none converges
      "stopn AS (SELECT coalesce((SELECT min(n) FROM minc WHERE mc >= 0.95), " +
      "(SELECT max(rn) FROM str)) AS n) " +
      "SELECT c.field, c.mt AS meza_type, " +
      "(SELECT mc FROM minc, stopn WHERE minc.n = stopn.n) AS confidence, " +
      "CAST(stopn.n AS INTEGER) AS rows_consumed " +
      "FROM conf c, stopn WHERE c.n = stopn.n ORDER BY c.field"
}

/** Type-system queries (SURVEY.md §1.2, §2.8): lenient casts and schema
  * inference exercised through the driver's DuckDB gate. Messy strings are
  * derived from table data so both engines parse identical inputs.
  */
object TypeQueries {

  val qs: Seq[Q] = Seq(

    // ---- F1/F3: currency + thousand-separator lenient numeric parse.
    // Build "$2,042.42"-style strings from o_totalprice in BOTH engines,
    // then parse back with graft's lenient casts vs plain SQL string ops.
    // (prices are exact 2-decimal values, so format() never rounds and the
    // engines' rounding modes can't diverge)
    Q("q21_lenient_numeric",
      Some("WITH messy AS (SELECT o_orderkey, '$' || format('{:,}', CAST(trunc(o_totalprice) AS BIGINT)) " +
        "|| '.' || lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS s " +
        "FROM orders) " +
        "SELECT o_orderkey, s, " +
        "CAST(trunc(TRY_CAST(replace(replace(s, '$', ''), ',', '') AS DOUBLE)) AS BIGINT) AS as_int, " +
        "TRY_CAST(replace(replace(s, '$', ''), ',', '') AS DOUBLE) AS as_float " +
        "FROM messy ORDER BY o_orderkey"),
      (s, dir) => {
        val messy = Tables.orders(s, dir).select(
          col("o_orderkey"),
          concat(lit("$"), format_number(col("o_totalprice"), 2)).as("s"))
        messy.select(
          col("o_orderkey"), col("s"),
          Lenient.toInt(col("s")).as("as_int"),
          Lenient.toFloat(col("s")).as("as_float"))
          .orderBy("o_orderkey")
      }),

    // ---- F2: lenient date round-trip through strings.
    Q("q22_lenient_date",
      Some("SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, " +
        "o_orderstatus = 'P' AS is_pending FROM orders ORDER BY o_orderkey"),
      (s, dir) => {
        val o = Tables.orders(s, dir).select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("dstr"),
          when(col("o_orderstatus") === "P", lit("y")).otherwise(lit("n")).as("bstr"))
        o.select(
          col("o_orderkey"),
          LenientDatetimeExpr.lenientDate(col("dstr")).as("d"),
          Lenient.toBool(col("bstr")).as("is_pending"))
          .orderBy("o_orderkey")
      }),

    // ---- E1 end-to-end: stringify orders, infer types from a sample,
    // lenient-cast back (toInt/toFloat/LenientTimestamp distributed over the
    // whole table), aggregate — must reproduce the ORIGINAL table's answer
    // exactly (the oracle aggregates the untouched parquet). Proves the
    // lenient pipeline is lossless for round-trippable data.
    Q("q45_typecast_roundtrip",
      Some("SELECT o_orderpriority, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total, " +
        // CAST: DuckDB SUM(int) yields HUGEINT, which the driver's pandas
        // bridge renders as float64 ("...0") and hash-mismatches Spark BIGINT.
        "CAST(SUM(o_custkey) AS BIGINT) AS custkey_sum, " +
        "MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val str = o.select(o.columns.map(c => col(c).cast(StringType).as(c)).toSeq: _*)
        val (typed, _) = DetectTypes.inferAndCast(str)
        typed.groupBy("o_orderpriority").agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(24, 6)))
            .cast("double").as("total"),
          sum(col("o_custkey")).as("custkey_sum"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"))
          .orderBy("o_orderpriority")
      }),

    // ---- A6: detect_types over an all-string projection of lineitem,
    // ORACLE-CHECKED: the inference is deterministic arithmetic over the
    // first <=100 rows of a deterministic total order (all 11 columns — the
    // rows are unique, so the sort has no ties for limit() to break
    // arbitrarily), and the oracle replays the whole loop in SQL — the
    // value-level guess chain (null/bool/int/float/datetime/date markers,
    // currency strip, the leading-zero rule), the per-prefix vote tallies,
    // the compatible-type merge lattice ({int,float}->float,
    // {bool,int}->int, date/time/datetime->datetime, else text, nulls
    // ignored unless alone), the a*ln(1+votes)/(1+a*ln(1+votes)) confidence
    // rounded to 2dp (HALF_UP == DuckDB round for positives), and the
    // earliest prefix where the weakest column clears 0.95. Same rounding
    // discipline as q61's entropy: 2dp sits far above any libm ulp.
    Q("q23_detect_types",
      Some(DetectOracleSql.q23),
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        val ordered = li.orderBy(li.columns.map(col).toSeq: _*)
        val allString = ordered.select(
          li.columns.map(c => col(c).cast(StringType).as(c)).toSeq: _*)
        val r = DetectTypes.detect(allString, minConf = 0.95, hweight = 6, maxIter = 100)
        r.types.map(t => (t.id, t.mezaType, r.confidence, r.count))
          .toDF("field", "meza_type", "confidence", "rows_consumed")
          .orderBy("field")
      })
  )
}
