package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter shape): generate candidate
  * pairs inside blocking keys, score each pair as a weighted sum of
  * per-field agreement evidence, and gate on the score — the entity-
  * resolution workhorse (customer 360, supplier master data, dedupe across
  * sources) that [[Dedup]]'s content hashing can't cover because the records
  * DIFFER on purpose (typos, moved accounts, renamed segments).
  *
  * Scale discipline (the q28/q140 rule): candidate generation REQUIRES a
  * blocking key — whole-corpus O(n²) is unexpressible. Scoring is row-local
  * arithmetic over codegen'd kernels ([[graft.functions.FuzzyExprs]]'
  * Jaro–Winkler is bit-identical to DuckDB's), with a FIXED field order so
  * the floating-point sum has one shape in every engine.
  */
object Linkage {

  /** Candidate pairs within each blocking key: a self equi join on
    * `blockCol` keeping `idCol_a < idCol_b` (each unordered pair once, no
    * self-pairs). Every non-id payload column comes back twice with `_a` /
    * `_b` suffixes for the field comparators. Block sizes bound the
    * quadratic locally — the caller's blocking design is the scale knob
    * (same contract as [[Dedup.ngramJaccard]]). */
  def blockedPairs(df: DataFrame, blockCol: String, idCol: String): DataFrame = {
    val payload = df.columns.filterNot(_ == blockCol)
    def side(sfx: String) = df.select(col(blockCol) +:
      payload.map(c => col(c).as(s"${c}_$sfx")): _*)
    side("a").join(side("b"), Seq(blockCol))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
  }

  /** One linkage field: `agreement` must evaluate to [0,1] (1 = fields
    * agree), `wAgree`/`wDisagree` are the log-likelihood-ratio style weights
    * credited at full agreement / full disagreement; partial agreement
    * interpolates linearly (the continuous Fellegi–Sunter variant used with
    * string-similarity comparators). */
  final case class Field(agreement: Column, wAgree: Double, wDisagree: Double)

  /** Total match score Σ_f [ w_a·a_f + w_d·(1−a_f) ] appended as `scoreCol`,
    * rounded 6dp. Fields fold in the given order — fixed expression shape,
    * deterministic across engines given deterministic comparators. */
  def scorePairs(pairs: DataFrame, fields: Seq[Field],
                 scoreCol: String = "score"): DataFrame = {
    require(fields.nonEmpty, "linkage needs at least one field")
    val total = fields.map { f =>
      lit(f.wAgree) * f.agreement + lit(f.wDisagree) * (lit(1.0) - f.agreement)
    }.reduce(_ + _)
    pairs.withColumn(scoreCol, round(total, 6))
  }

  /** Numeric closeness comparator: 1 − min(1, |a−b|/span) — full credit at
    * equality, zero beyond `span`. */
  def numericCloseness(a: Column, b: Column, span: Double): Column =
    lit(1.0) - least(abs(a - b) / lit(span), lit(1.0))

  /** Exact-equality comparator (null-safe: NULL vs anything = 0). */
  def equalityAgreement(a: Column, b: Column): Column =
    when(a <=> b && a.isNotNull, lit(1.0)).otherwise(lit(0.0))

  /** Blocking-design quality report against labeled duplicate pairs: the
    * two numbers every blocking scheme is judged by — REDUCTION RATIO
    * (1 − candidate pairs / all C(n,2) pairs: how much quadratic work the
    * blocks save) and PAIRS COMPLETENESS (share of true duplicate pairs
    * that land in the same block — recall an overly aggressive block
    * sacrifices). All pair counts are exact integers (Σ C(block,2) from
    * the block-size rollup, never materialized pairs); the two ratios are
    * single IEEE divisions, 6dp. `truePairs` carries (id_a, id_b) labels.
    * Returns one row: (n_records, full_pairs, candidate_pairs, n_true,
    * n_captured, reduction_ratio, completeness). */
  def blockingQuality(df: DataFrame, blockCol: String, idCol: String,
                      truePairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val Seq(ia, ib) = truePairs.columns.take(2).toSeq
    val keyed = df.select(col(idCol).as("__id"), col(blockCol).as("__blk"))
    val nRec = keyed.agg(count(lit(1)).as("n_records"))
    val cand = keyed.groupBy("__blk").agg(count(lit(1)).as("__b"))
      .agg(sum(expr("(__b * (__b - 1)) div 2").cast(DecimalType(38, 0)))
        .as("__cand"))
    val nTrue = truePairs.agg(count(lit(1)).as("n_true"))
    val captured = truePairs
      .join(keyed.select(col("__id").as(ia), col("__blk").as("__ba")), Seq(ia))
      .join(keyed.select(col("__id").as(ib), col("__blk").as("__bb")), Seq(ib))
      .filter(col("__ba") === col("__bb"))
      .agg(count(lit(1)).as("n_captured"))
    nRec.crossJoin(cand).crossJoin(nTrue).crossJoin(captured)
      .select(col("n_records"),
        expr("(n_records * (n_records - 1)) div 2").as("full_pairs"),
        col("__cand").cast("long").as("candidate_pairs"),
        col("n_true"), col("n_captured"),
        round(lit(1.0) - col("__cand").cast("double") /
          expr("(n_records * (n_records - 1)) div 2").cast("double"), 6)
          .as("reduction_ratio"),
        round(col("n_captured").cast("double") /
          col("n_true").cast("double"), 6).as("completeness"))
  }
  // ------------------------------------- Fellegi–Sunter weight estimation
  /** Supervised Fellegi–Sunter m/u estimation over LABELED candidate
    * pairs — the step [[scorePairs]] assumes already happened: for each
    * boolean agreement field, m = P(agree | match) and u = P(agree |
    * non-match), add-half smoothed (m = (n_agree_match + ½)/(n_match + 1))
    * so a field that always or never agrees still yields finite weights.
    * Weights are natural-log likelihood ratios (nats, not the classic
    * log₂ — one ln() call per side keeps the float shape identical in any
    * engine; scale by 1/ln 2 outside if bits are wanted):
    * w_agree = ln(m) − ln(u), w_disagree = ln(1−m) − ln(1−u), 6dp.
    *
    * Scale shape: ONE map-side-combinable aggregate over the pair relation
    * computes every count (2 + 2·|fields| exact integer sums — no
    * per-field pass, no shuffle beyond the single agg), then |fields|
    * one-row projections union into the report. Null agreements count as
    * disagreement (null never agrees — the equalityAgreement convention).
    * Returns one row per field, field order preserved:
    * (field, n_match, n_nonmatch, n_agree_match, n_agree_nonmatch,
    * m, u, w_agree, w_disagree). */
  def fellegiSunterWeights(pairs: DataFrame, labelCol: Column,
                           fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "Fellegi–Sunter needs at least one field")
    val lbl = coalesce(labelCol, lit(false))
    // coalesce(·, 0): sum over an EMPTY pair relation is null, and a null
    // count would null every downstream probability instead of reporting
    // the (smoothed, weight-0) n=0 row
    val aggs =
      Seq(coalesce(sum(when(lbl, 1L).otherwise(0L)), lit(0L)).as("__nm"),
        coalesce(sum(when(!lbl, 1L).otherwise(0L)), lit(0L)).as("__nu")) ++
      fields.zipWithIndex.flatMap { case ((_, a), i) =>
        val agree = coalesce(a, lit(false))
        Seq(coalesce(sum(when(lbl && agree, 1L).otherwise(0L)), lit(0L))
            .as(s"__am$i"),
          coalesce(sum(when(!lbl && agree, 1L).otherwise(0L)), lit(0L))
            .as(s"__au$i"))
      }
    val stats = pairs.agg(aggs.head, aggs.tail: _*)
    // |fields| report rows explode out of the ONE stats row — a union of
    // per-field selects over `stats` would leave the optimizer free to
    // recompute the pair aggregate once per field when exchange reuse
    // doesn't kick in; the explode guarantees a single aggregation pass
    val rows = fields.zipWithIndex.map { case ((name, _), i) =>
      // one fixed expression shape for every field and engine: smoothed
      // rational → one IEEE division per probability → ln difference
      val m = (col(s"__am$i").cast("double") + lit(0.5)) /
        (col("__nm").cast("double") + lit(1.0))
      val u = (col(s"__au$i").cast("double") + lit(0.5)) /
        (col("__nu").cast("double") + lit(1.0))
      struct(lit(name).as("field"),
        col("__nm").as("n_match"), col("__nu").as("n_nonmatch"),
        col(s"__am$i").as("n_agree_match"),
        col(s"__au$i").as("n_agree_nonmatch"),
        round(m, 6).as("m"), round(u, 6).as("u"),
        round(log(m) - log(u), 6).as("w_agree"),
        round(log(lit(1.0) - m) - log(lit(1.0) - u), 6).as("w_disagree"))
    }
    stats.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  // -------------------------------------------- sorted-neighborhood pairs
  /** Sorted-neighborhood candidate generation (Hernández & Stolfo 1995):
    * within each coarse block, records sort by `keyCol` and every record
    * pairs with its next `window` successors — the classic ER compromise
    * between full blocking (misses near-boundary lookalikes) and the O(n²)
    * cross product. Pairs NEVER cross blocks; run again with a second
    * sort key to recover boundary misses (the standard multi-pass SNM,
    * caller-composed).
    *
    * 100 TB shape: the only window is rank-within-block (the
    * packSequences discipline — the block vocabulary bounds the largest
    * sort), and the pair join is co-keyed on (block, rank+offset) with
    * offset fan-out exactly `window`. Ties in the sort key break by id,
    * so the pair set is deterministic. Returns
    * (block, id_a, id_b, key_a, key_b, dist ∈ [1, window]). */
  def sortedNeighborhood(df: DataFrame, idCol: String, keyCol: String,
                         blockCol: Column, window: Int): DataFrame = {
    require(window >= 1 && window <= 100, s"window out of range: $window")
    val base = df.select(blockCol.as("block"), col(idCol).as("__id"),
      col(keyCol).as("__key"))
    val w = Window.partitionBy(col("block"))
      .orderBy(col("__key").asc, col("__id").asc)
    val ranked = base.withColumn("__rn", row_number().over(w))
    val right = ranked.select(col("block"), col("__rn").as("__rnb"),
      col("__id").as("id_b"), col("__key").as("key_b"))
    ranked
      .select(col("block"), col("__rn"), col("__id").as("id_a"),
        col("__key").as("key_a"),
        explode(sequence(lit(1), lit(window))).as("dist"))
      .withColumn("__rnb", col("__rn") + col("dist"))
      .join(right, Seq("block", "__rnb"))
      .select(col("block"), col("id_a"), col("id_b"),
        col("key_a"), col("key_b"), col("dist"))
  }
}
