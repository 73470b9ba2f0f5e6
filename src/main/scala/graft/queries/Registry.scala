package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named driver query: the Spark plan builder and (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. Column
  * names/aliases MUST match between the two — the driver sorts columns by
  * name and hash-compares values.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

object Registry {
  lazy val all: Seq[Q] = {
    val qs = Relational.qs ++ TypeQueries.qs ++ TextQueries.qs ++
      CurationQueries.qs ++ SimilarityQueries.qs ++ SimilarityQueries2.qs ++
      StreamQueries.qs ++ StatsQueries.qs ++ StatsQueries2.qs ++
      StatsQueries3.qs ++ StatsQueries4.qs ++ StatsQueries5.qs ++
      AppliedQueries.qs ++
      TpchQueries.qs ++ MlPipelineQueries.qs ++ LayoutQueries.qs
    // a duplicate name would silently shadow a query in the toMap below and
    // the driver's gate would "pass" while never running the shadowed one
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    qs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> normalizeNegativeZero(_))).toMap

  /** Rewrites every `round(<args>)` in oracle SQL to `(round(<args>) + 0.0)`.
    *
    * Why: DuckDB's float `round` preserves the IEEE sign of zero — a tiny
    * negative (≈ −1e−13) rounds to −0.0 — while Spark's BigDecimal-based
    * round can only produce +0.0. The values compare == equal, but the
    * driver's hash gate is byte-sensitive, so every oracle column that
    * rounds an IEEE difference is a latent deterministic hash-fail (q321
    * was the first to trip; the r08 sweep found ~35 more negative-capable
    * rounded columns). `x + 0.0` is an exact IEEE no-op for every double
    * except −0.0 → +0.0, and integer-valued rounds stay exact under 2^53,
    * so the rewrite is universally safe — verified empirically: all 355
    * oracles produce byte-identical dtypes and values after the rewrite
    * except the intended −0.0 normalizations. Applying it HERE (not by
    * hand at each site) makes the class structural: future queries are
    * protected at assembly, like the duplicate-name gate above.
    * NaN is unaffected (NaN + 0.0 = NaN).
    *
    * The scan is case-insensitive (ROUND( normalizes too, preserving the
    * original spelling) and skips single-quoted SQL string literals ('' is
    * the escape) both when matching the token and when depth-counting
    * parens — a literal containing "round(" or an unbalanced paren passes
    * through untouched. Dollar-quoted strings are unsupported (none in
    * the registry; a dollar-quoted "round(" would be rewritten and fail
    * LOUDLY in DuckDB, never silently). */
  private[graft] def normalizeNegativeZero(sql: String): String = {
    val lower = sql.toLowerCase(java.util.Locale.ROOT)
    val inLit = insideLiteral(sql)
    val b = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val j = lower.indexOf("round(", i)
      if (j < 0) { b.append(sql.substring(i)); i = sql.length }
      else {
        val atToken = !inLit(j) &&
          (j == 0 || (!sql(j - 1).isLetterOrDigit && sql(j - 1) != '_'))
        if (!atToken) { b.append(sql.substring(i, j + 6)); i = j + 6 }
        else {
          var depth = 0
          var k = j + 5 // the '(' of round(
          var end = -1
          while (k < sql.length && end < 0) {
            if (!inLit(k)) sql(k) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = k
              case _ =>
            }
            k += 1
          }
          require(end > 0, s"unbalanced round( in oracle SQL: $sql")
          val inner = normalizeNegativeZero(sql.substring(j + 6, end))
          b.append(sql.substring(i, j)).append("(")
            .append(sql.substring(j, j + 6)) // original spelling
            .append(inner).append(") + 0.0)")
          i = end + 1
        }
      }
    }
    b.toString
  }

  /** Per-character mask of single-quoted SQL literal spans (quote chars
    * included). The '' escape falls out of plain toggling: it reads as
    * close-then-reopen, and both quote chars are themselves marked. */
  private[graft] def insideLiteral(sql: String): Array[Boolean] = {
    val m = new Array[Boolean](sql.length)
    var q = false
    var i = 0
    while (i < sql.length) {
      if (sql(i) == '\'') { m(i) = true; q = !q } else m(i) = q
      i += 1
    }
    m
  }
}
