package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ONE bounded-domain gate mechanism, shared by
  * [[graft.pipeline.Stats]]'s value-cell gate (hodgesLehmann / qnScale /
  * giniMeanDifference / twoSampleRankCells / tCloseness) and
  * [[Ops.skyline]]'s x-domain gate: one cheap combinable count over the
  * guarded rollup, broadcast back, and a `raise_error` fused into EVERY
  * column's projection — so the raise fires while the guarded relation
  * materializes (BEFORE any downstream pair explode or keyless window)
  * and no consumer projection, present or future, can prune the gate
  * away.
  *
  * The gate stays a LAZY plan on purpose: a consumer that references the
  * gated relation k times re-evaluates the cheap rollup k+1 times — the
  * deliberate trade against checkpointing, which would MATERIALIZE a
  * possibly-unbounded offender relation before the raise fires.
  * `msg` builds the error text from the offending-count column; keep the
  * message naming the operator and the bucket/round remedy (the
  * kaplanMeier duration-grain discipline). */
private[graft] object DomainGate {
  def apply(rel: DataFrame, limit: Long, msg: Column => Column): DataFrame = {
    val nv = rel.agg(count(lit(1)).as("__nv"))
    val guard: String => Column = c => when(col("__nv") > limit,
      raise_error(msg(col("__nv")))).otherwise(col(c)).as(c)
    rel.crossJoin(broadcast(nv))
      .select(rel.columns.map(guard).toSeq: _*)
  }
}
