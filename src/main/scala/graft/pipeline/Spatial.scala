package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar spatial joins on integer coordinates — the grid-bucketed
  * neighbor-search primitive (store/depot proximity, sensor clustering,
  * collocation mining). Works on projected integer coordinates (meters,
  * centi-degrees, …): all distance math is INTEGER (dx² + dy² as BIGINT
  * against r²), so results are bit-identical in any engine — no trig, no
  * floating-point boundary cases.
  *
  * Scale shape: the classic fixed-grid spatial join (the εgrid / GeoSpark
  * partitioning idea). Cell side = radius, so every qualifying pair sits in
  * the same or an adjacent cell: the probe side fans out to its 3×3 cell
  * neighborhood (a bounded 9× explode of (id, x, y) triples — never the
  * payload), ONE equi join on the cell key does the candidate generation,
  * and the exact integer distance test finishes locally. No cross join, no
  * non-equi join (a BETWEEN-join would be a nested loop at scale).
  *
  * Density contract: per-cell population is bounded by physical packing —
  * a cell holds points within one radius of each other, so a hot cell means
  * the DATA is a clique at that radius and any exact algorithm emits the
  * quadratic output. The grid never makes it worse than the answer size.
  */
object Spatial {

  /** All pairs (id_a < id_b) within `radius` (Euclidean, inclusive) plus
    * their exact squared distance. Coordinates must be integral (cast
    * upstream — the meter/centi-degree projection is the caller's CRS
    * decision). Each qualifying pair is emitted EXACTLY once: for a fixed
    * pair the probe row's 9 neighbor cells are distinct, so at most one
    * matches the build row's cell, and the `id_a < id_b` gate keeps one
    * orientation. Returns (id_a, id_b, dist2). */
  def radiusSelfJoin(df: DataFrame, idCol: String, xCol: String,
                     yCol: String, radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1: $radius")
    val pts = df.select(col(idCol).as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    def cellOf(c: String, v: String) =
      floor(col(v).cast("double") / radius).cast("long").as(c)
    val build = pts.select(col("__id").as("id_b"), col("__x").as("__xb"),
      col("__y").as("__yb"), cellOf("__cx", "__x"), cellOf("__cy", "__y"))
    // probe fan-out: 9 (cx+dx, cy+dy) neighbor keys per point, packed into
    // one composite cell key so the candidate join is a single equi join
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val probe = pts
      .select(col("__id").as("id_a"), col("__x").as("__xa"),
        col("__y").as("__ya"), explode(offsets).as("__o"))
      .select(col("id_a"), col("__xa"), col("__ya"),
        (floor(col("__xa").cast("double") / radius).cast("long") +
          col("__o.dx")).as("__cx"),
        (floor(col("__ya").cast("double") / radius).cast("long") +
          col("__o.dy")).as("__cy"))
    val dx = col("__xa") - col("__xb")
    val dy = col("__ya") - col("__yb")
    probe.join(build, Seq("__cx", "__cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }

  /** Nearest neighbor within `radius`: for each left point, the single
    * closest right point at Euclidean distance ≤ radius (squared-distance
    * then id as the deterministic tiebreak), or no row when none is in
    * range. Same grid shape as [[radiusSelfJoin]] — the left side fans out
    * to its 3×3 neighborhood, one cell equi join generates candidates, and
    * a per-left-id min_by argmin replaces the pair filter. The depot /
    * store-assignment primitive. Returns (id_a, id_b, dist2). */
  def nearestNeighborJoin(left: DataFrame, right: DataFrame, idCol: String,
                          xCol: String, yCol: String, radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1: $radius")
    def pts(df: DataFrame, sfx: String) = df.select(
      col(idCol).as(s"id_$sfx"), col(xCol).cast("long").as(s"__x$sfx"),
      col(yCol).cast("long").as(s"__y$sfx"))
    val build = pts(right, "b")
      .select(col("id_b"), col("__xb"), col("__yb"),
        floor(col("__xb").cast("double") / radius).cast("long").as("__cx"),
        floor(col("__yb").cast("double") / radius).cast("long").as("__cy"))
    val offsets = array((for (ox <- -1 to 1; oy <- -1 to 1)
      yield struct(lit(ox).as("dx"), lit(oy).as("dy"))): _*)
    val probe = pts(left, "a")
      .select(col("id_a"), col("__xa"), col("__ya"), explode(offsets).as("__o"))
      .select(col("id_a"), col("__xa"), col("__ya"),
        (floor(col("__xa").cast("double") / radius).cast("long") +
          col("__o.dx")).as("__cx"),
        (floor(col("__ya").cast("double") / radius).cast("long") +
          col("__o.dy")).as("__cy"))
    val dx = col("__xa") - col("__xb")
    val dy = col("__ya") - col("__yb")
    probe.join(build, Seq("__cx", "__cy"))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .groupBy("id_a")
      .agg(min_by(struct(col("id_b"), col("dist2")),
        struct(col("dist2"), col("id_b"))).as("__nn"))
      .select(col("id_a"), col("__nn.id_b").as("id_b"),
        col("__nn.dist2").as("dist2"))
  }
}
