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
  }

  test("every assembled oracle has its rounds normalized (no bare round( survives)") {
    // by construction every "round(" in Registry.oracles is immediately
    // preceded by "(" and followed (after its balanced close) by " + 0.0)"
    for ((name, sql) <- Registry.oracles) {
      var i = sql.indexOf("round(")
      while (i >= 0) {
        val tokenStart = i == 0 || (!sql(i - 1).isLetterOrDigit && sql(i - 1) != '_')
        if (tokenStart)
          assert(i > 0 && sql(i - 1) == '(',
            s"$name: un-normalized round( at index $i")
        i = sql.indexOf("round(", i + 1)
      }
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
