package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE bounded-domain gate mechanism, shared by
  * [[graft.pipeline.Stats]]'s value-cell gate (hodgesLehmann / qnScale /
  * giniMeanDifference / twoSampleRankCells / tCloseness / the
  * linear-rank + ECDF family), [[graft.pipeline.EventAnalytics]]'s
  * duration-cell gate (the survival family) and [[Ops.skyline]]'s
  * x-domain gate: one cheap combinable count over the guarded rollup,
  * broadcast back, and the raise fused in TWO places —
  *
  *  - a `raise_error` in EVERY column's projection, so the raise fires
  *    while the guarded relation materializes (BEFORE any downstream
  *    pair explode or keyless window) for any consumer that references
  *    at least one column;
  *  - a `raise_error`-bearing FILTER on the broadcast count, which a
  *    COLUMN-FREE consumer (`gated.count()`, `count(lit(1))`) cannot
  *    prune away: ColumnPruning may drop every guarded projection, but
  *    a filter changes the row count, so it survives any projection —
  *    present or future.
  *
  * The gate stays a LAZY plan on purpose: a consumer that references the
  * gated relation k times re-evaluates the cheap rollup k+1 times — the
  * deliberate trade against checkpointing, which would MATERIALIZE a
  * possibly-unbounded offender relation before the raise fires.
  * `msg` builds the error text from the offending-count column; keep the
  * message naming the operator and the bucket/round remedy (the
  * kaplanMeier duration-grain discipline). */
private[graft] object DomainGate {
  def apply(rel: DataFrame, limit: Long, msg: Column => Column): DataFrame =
    apply(rel, rel.agg(count(lit(1)).as("__nv")), limit, msg)

  /** Variant with a caller-supplied ONE-ROW count relation carrying the
    * offending measure as `__nv` — e.g. the LARGEST single group's cell
    * count for group-keyed cumulative windows, where the bound that
    * matters is per-partition concentration, not the total. */
  def apply(rel: DataFrame, nv: DataFrame, limit: Long,
            msg: Column => Column): DataFrame = {
    val guard: String => Column = c => when(col("__nv") > limit,
      raise_error(msg(col("__nv")))).otherwise(col(c)).as(c)
    rel.crossJoin(broadcast(nv))
      // the column-free-consumer leg: raise_error coerces to a null
      // boolean inside the condition, so rows pass untouched below the
      // limit and the raise fires (per row, but the comparison is against
      // ONE broadcast value) above it
      .filter(when(col("__nv") > limit,
        raise_error(msg(col("__nv"))).cast("boolean")).otherwise(lit(true)))
      .select(rel.columns.map(guard).toSeq: _*)
  }
}
