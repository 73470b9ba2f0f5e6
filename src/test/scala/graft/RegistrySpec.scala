package graft

import graft.queries.Registry

/** Smoke: every registered query builds and returns rows at sf0.001, and the
  * oracle map stays consistent with the query map (driver contract).
  */
class RegistrySpec extends SparkSpec {

  test("oracle keys are a subset of query keys") {
    val unknown = Registry.oracles.keySet -- Registry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  // --- negative-zero canonicalization (the q321 class) -------------------
  // DuckDB's float round() preserves -0.0; Spark's BigDecimal round cannot
  // emit it, and the driver's hash gate is byte-sensitive. The registry
  // therefore rewrites every round(...) in oracle SQL to (round(...) + 0.0)
  // at assembly. Full cross-engine dtype/signbit parity replay necessarily
  // stays in scripts/check.py (STRICT_DTYPE=1): DuckDB is driver-side
  // Python only — the zero-egress sbt build has no DuckDB JDBC jar to
  // replay oracles in-process. These specs pin the transformation itself.
  test("normalizeNegativeZero wraps every round() with the +0.0 IEEE no-op") {
    import Registry.normalizeNegativeZero
    assert(normalizeNegativeZero("SELECT round(x - y, 6) AS d FROM t") ==
      "SELECT (round(x - y, 6) + 0.0) AS d FROM t")
    // nested rounds and nested parens both wrap
    assert(normalizeNegativeZero("round(round(a / (b + c), 2), 6)") ==
      "(round((round(a / (b + c), 2) + 0.0), 6) + 0.0)")
    // token boundary: identifiers merely ending in "round(" are untouched
    assert(normalizeNegativeZero("SELECT wraparound(x) FROM t") ==
      "SELECT wraparound(x) FROM t")
    // unscaled integer-context rounds stay exact: doc of the 2^53 bound
    assert(normalizeNegativeZero("CAST(round(p * 100) AS BIGINT)") ==
      "CAST((round(p * 100) + 0.0) AS BIGINT)")
    // case-insensitive: ROUND( normalizes too, original spelling kept
    assert(normalizeNegativeZero("SELECT ROUND(x, 6) AS d FROM t") ==
      "SELECT (ROUND(x, 6) + 0.0) AS d FROM t")
    assert(normalizeNegativeZero("SELECT Round(ROUND(x, 2), 6) FROM t") ==
      "SELECT (Round((ROUND(x, 2) + 0.0), 6) + 0.0) FROM t")
    // a string literal containing "round(" passes through UNTOUCHED
    assert(normalizeNegativeZero("SELECT 'contains round(x)' AS s FROM t") ==
      "SELECT 'contains round(x)' AS s FROM t")
    // a paren inside a literal within round()'s args must not miscount
    // depth — the close paren that ends round( is the bare one
    assert(normalizeNegativeZero("round(replace(s, ')', ''), 6)") ==
      "(round(replace(s, ')', ''), 6) + 0.0)")
    // the '' escape keeps the literal span closed where it should be
    assert(normalizeNegativeZero("SELECT 'it''s round(' || round(x, 2) FROM t") ==
      "SELECT 'it''s round(' || (round(x, 2) + 0.0) FROM t")
  }

  test("every assembled oracle has its rounds normalized (no bare round( survives, any case, outside literals)") {
    // by construction every token-boundary "round(" outside a string
    // literal in Registry.oracles is immediately preceded by "(" and
    // followed (after its balanced close) by " + 0.0)"
    for ((name, sql) <- Registry.oracles) {
      val lower = sql.toLowerCase(java.util.Locale.ROOT)
      val inLit = Registry.insideLiteral(sql)
      var i = lower.indexOf("round(")
      while (i >= 0) {
        val tokenStart = !inLit(i) &&
          (i == 0 || (!sql(i - 1).isLetterOrDigit && sql(i - 1) != '_'))
        if (tokenStart)
          assert(i > 0 && sql(i - 1) == '(',
            s"$name: un-normalized round( at index $i")
        i = lower.indexOf("round(", i + 1)
      }
    }
  }

  // --- decimal conversion-bound lint (the q375 class) --------------------
  // SCALE.md round 14: DuckDB's double→DECIMAL cast goes through a float
  // multiply by 10^s and is off by one decimal ulp once |value|·10^s
  // reaches ~4e15, and its DECIMAL→double read double-rounds above 2^63.
  // Scale 12 at unit magnitude (the PSI/JSD per-term discipline) keeps
  // ~4000× headroom; scale 12 at magnitude 10^3 is already at the edge.
  // This sweep makes the bound STRUCTURAL for new oracles: any DECIMAL
  // cast with scale > 12 needs an entry in the allowlist below carrying a
  // written magnitude argument (the oneWayAnova precedent for scale 0).
  private val decimalScaleAllowlist: Map[String, String] = Map(
    // name -> magnitude argument, e.g.:
    // "qNNN_x" -> "per-term |v| < 10 so |v|*10^15 < 4e15 measured"
    "q481_amihud" -> ("per-term |r|/DV measured max 7.9e-5 at sf0.1 " +
      "(daily bars cap |r| while DV >= hundreds of dollars), so " +
      "|v|*10^18 <= 7.9e13 < 4e15 with 50x headroom; the MIN term is " +
      "4.3e-13, which scale 12 would quantize to garbage — 18 is the " +
      "smallest scale that keeps the tiny terms honest")
  )

  private[graft] def overScaleCasts(sql: String): Seq[String] = {
    val re = "(?i)DECIMAL\\(\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)".r
    re.findAllMatchIn(sql).collect {
      case m if m.group(2).toInt > 12 => m.matched
    }.toSeq
  }

  test("no oracle DECIMAL cast exceeds scale 12 without an allowlisted magnitude argument") {
    // the lint itself must catch a planted q375-style violation
    assert(overScaleCasts("sum(CAST(x AS DECIMAL(38,15)))") ==
      Seq("DECIMAL(38,15)"))
    assert(overScaleCasts("sum(CAST(x AS DECIMAL(28,12)))").isEmpty)
    for ((name, sql) <- Registry.oracles if !decimalScaleAllowlist.contains(name)) {
      val bad = overScaleCasts(sql)
      assert(bad.isEmpty,
        s"$name: DECIMAL scale > 12 (${bad.mkString(", ")}) — quantize to " +
          "scale <= 12 or allowlist with a written magnitude argument " +
          "(SCALE.md: the DuckDB decimal-conversion bound)")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Registry.all) {
    test(s"${q.name} builds and executes at sf0.001") {
      val df = q.build(spark, sf0001)
      assert(df.columns.nonEmpty)
      // count executes the whole plan; >0 keeps queries non-degenerate
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
