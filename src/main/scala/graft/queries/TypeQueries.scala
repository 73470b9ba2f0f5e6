package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.{Lenient, LenientDatetimeExpr}
import graft.types.DetectTypes

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

    // ---- A6: detect_types over an all-string projection of lineitem
    // (driver-side sampled inference; result surfaced as rows — no SQL oracle).
    Q("q23_detect_types", None,
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        val allString = li.select(li.columns.map(c => col(c).cast(StringType).as(c)).toSeq: _*)
        val r = DetectTypes.detect(allString, minConf = 0.95, hweight = 6, maxIter = 100)
        r.types.map(t => (t.id, t.mezaType, r.confidence, r.count))
          .toDF("field", "meza_type", "confidence", "rows_consumed")
      })
  )
}
