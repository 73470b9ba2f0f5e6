package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-validation rules → one violation report (the
  * dbt-test / expectation-suite surface a production pipeline gates
  * loads on). Each rule names what it checks; the report is one row per
  * rule: (rule, column, n_checked, n_violations, pass).
  *
  * Scale shape: every ROW-LOCAL rule (not-null, range, regex) compiles to
  * one conditional-count pair inside a SINGLE combinable aggregate pass —
  * checking 50 rules costs one corpus scan, not 50. Key-uniqueness rules
  * need their own grouped pass each (a count at key grain), unioned in.
  * Violations COUNT rather than sample — pair with
  * [[Ops.grep]]/[[Ops.tfilter]] to pull offending rows once a rule trips.
  *
  * Null semantics: range and regex rules check only non-null values (null
  * presence is `NotNull`'s job, missingness `Ops.profile`'s) — n_checked
  * says how many rows each rule actually judged.
  */
object Validate {

  sealed trait Rule {
    def ruleName: String
    def columnLabel: String
  }
  /** `column` must not be null. */
  final case class NotNull(column: String) extends Rule {
    val ruleName = "not_null"; val columnLabel = column
  }
  /** Non-null `column` must lie in [lo, hi] (inclusive). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule {
    val ruleName = "in_range"; val columnLabel = column
  }
  /** Non-null `column` must match `regex` entirely (RE2-compatible
    * patterns recommended — the PII-redaction discipline). */
  final case class Matches(column: String, regex: String) extends Rule {
    val ruleName = "matches"; val columnLabel = column
  }
  /** The column combination must be unique across rows (a key audit —
    * [[Ops.fdViolations]] is the functional-dependency generalization).
    * Null keys participate (two null-keyed rows collide). */
  final case class Unique(columns: Seq[String]) extends Rule {
    val ruleName = "unique"; val columnLabel = columns.mkString(",")
  }

  /** Run every rule; returns (rule, column, n_checked, n_violations,
    * pass) ordered by (rule, column). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val rowLocal = rules.collect {
      case r: NotNull =>
        (r, count(lit(1)), sum(when(col(r.column).isNull, 1L).otherwise(0L)))
      case r: InRange =>
        val v = col(r.column).cast("double")
        (r: Rule, count(when(v.isNotNull, 1)),
          sum(when(v.isNotNull && (v < r.lo || v > r.hi), 1L).otherwise(0L)))
      case r: Matches =>
        val v = col(r.column).cast("string")
        (r: Rule, count(when(v.isNotNull, 1)),
          sum(when(v.isNotNull && !v.rlike(r.regex), 1L).otherwise(0L)))
    }
    val scalarReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.zipWithIndex.flatMap { case ((_, chk, vio), i) =>
          Seq(chk.as(s"__c$i"), vio.as(s"__v$i"))
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val melted = explode(array(rowLocal.zipWithIndex.map {
          case ((r, _, _), i) => struct(
            lit(r.ruleName).as("rule"), lit(r.columnLabel).as("column"),
            col(s"__c$i").as("n_checked"), col(s"__v$i").as("n_violations"))
        }: _*))
        Some(one.select(melted.as("kv")).select(col("kv.*")))
      }
    val uniqueReports = rules.collect { case r: Unique =>
      df.groupBy(r.columns.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n")), lit(0L)).as("n_checked"),
          coalesce(sum(when(col("__n") > 1L, col("__n"))), lit(0L))
            .as("n_violations"))
        .select(lit(r.ruleName).as("rule"), lit(r.columnLabel).as("column"),
          col("n_checked"), col("n_violations"))
    }
    (scalarReport.toSeq ++ uniqueReports)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule", "column")
  }
}
