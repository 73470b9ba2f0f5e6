package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Density-connected spatial clusters (DBSCAN with minPts=2, i.e.
    * single-linkage at `radius`): [[radiusSelfJoin]]'s grid-bucketed pair
    * relation resolved by [[Dedup.connectedComponents]]' pointer jumping —
    * the Spatial × Graph composition (store catchments, sensor groups,
    * co-location blobs). Points with no in-radius neighbor form their own
    * cluster keyed by their id (the leakageSafeSplit convention — cluster
    * labels and ids share a domain: min reachable id). Cost = the pair
    * relation + O(log diameter) label rounds; the density contract is
    * radiusSelfJoin's (a hot cell means the DATA is a clique at that
    * radius). Returns (id, cluster). */
  def radiusClusters(df: DataFrame, idCol: String, xCol: String,
                     yCol: String, radius: Long): DataFrame = {
    val edges = radiusSelfJoin(df, idCol, xCol, yCol, radius)
      .select(col("id_a"), col("id_b"))
    val lab = Dedup.connectedComponents(edges)
      .select(col("id"), col("cluster").as("__cl"))
    df.select(col(idCol).as("id")).join(lab, Seq("id"), "left")
      .select(col("id"), coalesce(col("__cl"), col("id")).as("cluster"))
  }

  /** Base-32 alphabet of the public geohash scheme (no a/i/l/o). */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash cell id of (lat, lon) degrees at `chars` precision —
    * the prefix-hierarchical spatial bucketing key (cell density maps,
    * coarse geo-partitioning, prefix-join colocation: a k-char prefix IS
    * the containing coarser cell, so one `substring` regroups to any
    * coarser grid without re-encoding). chars must be EVEN (odd geohash
    * lengths split bits asymmetrically; the even grid keeps lat/lon
    * resolution equal and the arithmetic transparent): total bits =
    * 5·chars, half to each axis.
    *
    * The whole encode is one row-local codegen'd projection in pure
    * INTEGER arithmetic after two fixed-shape IEEE quantizations
    * (⌊(deg−lo)/span·2ᵇ⌋, clamped) — bit interleave (lon takes the even
    * bits from the MSB, per the standard) and alphabet lookup are
    * shift/mask/substring chains any engine reproduces bit-identically
    * (the q213 Morton discipline; geohash IS Morton + base-32). No UDF,
    * no shuffle. */
  def geohash(lat: Column, lon: Column, chars: Int): Column = {
    require(chars >= 2 && chars % 2 == 0 && chars <= 12,
      s"chars must be even, in [2,12]: $chars")
    val bitsPerAxis = 5 * chars / 2
    def quant(deg: Column, lo: Double, span: Double) = {
      val cells = math.pow(2.0, bitsPerAxis)
      least(greatest(floor((deg.cast("double") - lo) / span * cells),
        lit(0.0)), lit(cells - 1.0)).cast("long")
    }
    val lonQ = quant(lon, -180.0, 360.0)
    val latQ = quant(lat, -90.0, 180.0)
    // interleave: bit j (from MSB, 0-based) of the 5·chars-bit code comes
    // from lon when j is even, lat when odd — fold into one long
    val total = 5 * chars
    val code = (0 until total).map { j =>
      val src = if (j % 2 == 0) lonQ else latQ
      val srcBit = bitsPerAxis - 1 - j / 2
      shiftleft(shiftright(src, srcBit).bitwiseAND(1L), total - 1 - j)
    }.reduce(_.bitwiseOR(_))
    concat((0 until chars).map { c =>
      val idx = shiftright(code, 5 * (chars - 1 - c)).bitwiseAND(31L)
      lit(GeohashAlphabet).substr(idx.cast("int") + 1, lit(1))
    }: _*)
  }

  /** Ray-casting point-in-polygon against a FIXED (broadcast-literal)
    * polygon: one crossing test per edge — the edge deltas are Scala-
    * computed double literals shared verbatim with the SQL oracle, so
    * every comparison is the same IEEE arithmetic in both engines — and
    * membership is crossing-count parity. Pure codegen projection, zero
    * shuffle, edge count fixed at plan time (a real geofence table would
    * broadcast-join candidate cells first — the q159 grid discipline —
    * then run this test per candidate). Points exactly on an edge follow
    * the half-open ray convention (deterministic, documented). */
  def pointInPolygon(x: Column, y: Column,
                     poly: Seq[(Double, Double)]): Column = {
    require(poly.size >= 3, "a polygon needs at least 3 vertices")
    val crossings = poly.indices.map { i =>
      val (xi, yi) = poly(i)
      val (xj, yj) = poly((i + 1) % poly.size)
      val straddles = (lit(yi) > y) =!= (lit(yj) > y)
      val xCross = lit(xj - xi) * (y - lit(yi)) / lit(yj - yi) + lit(xi)
      when(straddles && x < xCross, 1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  // --------------------------------------------------- haversine distance
  /** Great-circle distance in meters (haversine, R = 6 371 000):
    * 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))). One fixed-shape
    * libm expression — sub-ulp engine noise dies in the caller's 6dp
    * round (the q95/q127 discipline). */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column,
                      lon2: Column): Column = {
    val r = 6371000.0
    def rad(c: Column) = radians(c)
    val sdLat = sin((rad(lat2) - rad(lat1)) / 2)
    val sdLon = sin((rad(lon2) - rad(lon1)) / 2)
    val h = sdLat * sdLat + cos(rad(lat1)) * cos(rad(lat2)) * sdLon * sdLon
    lit(2 * r) * asin(sqrt(h))
  }

  /** Per-key trajectory report: consecutive points in (order, id) order
    * become great-circle legs; each leg rounds to INTEGER METERS and
    * per-key totals are exact BIGINT sums. Whole-meter grain is the
    * determinism contract: at ~10⁷ m magnitudes a 1-ulp libm difference
    * between engines is ~2·10⁻⁹ m, so a finer (say 6dp) grain puts ~0.1%
    * of legs on a rounding boundary — measured, not hypothetical — while
    * the 1 m grain shrinks the flip window to ~4·10⁻⁹ per leg. One key
    * exchange + one lag window. Returns (key, n_legs, total_m). */
  def trajectoryLengths(df: DataFrame, keyCol: String, orderCol: Column,
                        idCol: String, latCol: Column,
                        lonCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__o").asc,
      col(idCol).asc)
    df.select(col(keyCol), col(idCol), orderCol.as("__o"),
        latCol.as("__la"), lonCol.as("__lo"))
      .withColumn("__pla", lag(col("__la"), 1).over(w))
      .withColumn("__plo", lag(col("__lo"), 1).over(w))
      .filter(col("__pla").isNotNull)
      .select(col(keyCol), round(haversineMeters(col("__pla"), col("__plo"),
        col("__la"), col("__lo")), 0).cast("long").as("__leg"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_legs"), sum(col("__leg")).as("total_m"))
  }

  // -------------------------------------------------------- hotspot cells
  /** Getis-Ord-style hotspot screen on a `cellSize` grid: cell counts,
    * then each cell's z-score against the all-cell mean/σ (population).
    * The z is monotone in the integer count, so the top-k election orders
    * by (n DESC, cx, cy) — pure integers, no double-ranking hazard; the
    * z itself is one closed form over DECIMAL count moments, 6dp.
    * One grid-keyed aggregate + a broadcast 1-row stats join. `xCol`/
    * `yCol` must be integral. Returns the top `k` cells:
    * (cell_x, cell_y, n, z). */
  def hotspotCells(df: DataFrame, xCol: Column, yCol: Column,
                   cellSize: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(cellSize >= 1 && k >= 1, "cellSize and k must be positive")
    // FLOOR-division bucketing (the cellCounts rule): exact on integral
    // coordinates, matches DuckDB `//` on negative quadrants too
    val cells = df
      .select(xCol.as("__x"), yCol.as("__y"))
      .groupBy(
        expr(s"(__x div $cellSize) - (CASE WHEN __x % $cellSize < 0 THEN 1 ELSE 0 END)").as("cell_x"),
        expr(s"(__y div $cellSize) - (CASE WHEN __y % $cellSize < 0 THEN 1 ELSE 0 END)").as("cell_y"))
      .agg(count(lit(1)).as("n"))
    val stats = cells.agg(count(lit(1)).as("__c"),
      sum(col("n").cast(DecimalType(38, 0))).as("__sn"),
      sum((col("n") * col("n")).cast(DecimalType(38, 0))).as("__snn"))
    val cd = col("__c").cast("double")
    val (snd, snnd) = (col("__sn").cast("double"), col("__snn").cast("double"))
    cells.crossJoin(broadcast(stats))
      .select(col("cell_x"), col("cell_y"), col("n"),
        round((col("n").cast("double") - snd / cd) /
          sqrt((cd * snnd - snd * snd) / (cd * cd)), 6).as("z"))
      .orderBy(col("n").desc, col("cell_x").asc, col("cell_y").asc)
      .limit(k)
  }
  // ------------------------------------------------------- shoelace area
  /** Polygon area by the shoelace formula over a (polygon, vertex-order,
    * x, y) relation with INTEGER coordinates: 2A = Σ (xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ)
    * with wraparound — the doubled area is an exact BIGINT, so the /2 is
    * the only float step and the ccw orientation flag is a pure integer
    * sign test. Vertices must describe a simple (non-self-intersecting)
    * ring in `seqCol` order — for anything else the shoelace value is
    * still deterministic but is the algebraic area (contract). One
    * per-polygon window. Returns (polygon, n_vertices, area2, area, ccw).
    */
  def polygonArea(df: DataFrame, polyCol: String, seqCol: Column,
                  xCol: Column, yCol: Column): DataFrame = {
    val w = Window.partitionBy(col("__p")).orderBy(col("__s").asc)
    val wAll = Window.partitionBy(col("__p"))
      .orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(col(polyCol).as("__p"), seqCol.as("__s"),
        xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .withColumn("__xn", coalesce(lead(col("__x"), 1).over(w),
        first(col("__x")).over(wAll)))
      .withColumn("__yn", coalesce(lead(col("__y"), 1).over(w),
        first(col("__y")).over(wAll)))
      .groupBy(col("__p").as("polygon"))
      .agg(count(lit(1)).as("n_vertices"),
        sum(col("__x") * col("__yn") - col("__xn") * col("__y")).as("__a2"))
      .select(col("polygon"), col("n_vertices"),
        abs(col("__a2")).as("area2"),
        (abs(col("__a2")).cast("double") / 2.0).as("area"),
        (col("__a2") > 0).as("ccw"))
  }

  /** The shared lattice for the autocorrelation family below: NONEMPTY
    * grid cells with their integer point counts (the [[hotspotCells]]
    * grid; empty cells are absent by contract — the lattice IS the
    * occupied-cell relation). Bucketing is FLOOR division —
    * `(x div s) − (x % s < 0 ? 1 : 0)`, exact integer arithmetic — not
    * Spark's truncate-toward-zero `div` alone: truncation would collapse
    * coordinates −(s−1)..(s−1) into one double-width cell 0 and disagree
    * with DuckDB's `//` on negative coordinates (the lattice is
    * translation-invariant now, negative quadrants included). This form
    * (truncate, then step down on a negative remainder) never leaves
    * BIGINT — the earlier `(x − pmod(x, s)) div s` underflowed under ANSI
    * for x within s−1 of Long.MinValue. */
  private def cellCounts(df: DataFrame, xCol: Column, yCol: Column,
                         cellSize: Long): DataFrame =
    df.select(xCol.as("__x"), yCol.as("__y"))
      .groupBy(
        expr(s"(__x div $cellSize) - (CASE WHEN __x % $cellSize < 0 THEN 1 ELSE 0 END)").as("cell_x"),
        expr(s"(__y div $cellSize) - (CASE WHEN __y % $cellSize < 0 THEN 1 ELSE 0 END)").as("cell_y"))
      .agg(count(lit(1)).as("n"))

  /** DIRECTED rook-adjacent cell pairs ((i), (j) with |Δx|+|Δy| = 1),
    * as four shifted equi-joins — co-partitioned hash joins, never a
    * cross join. Each unordered neighbor pair appears exactly twice
    * (once per direction). */
  private def rookPairs(cells: DataFrame): DataFrame = {
    val j = cells.select(col("cell_x").as("jx"), col("cell_y").as("jy"),
      col("n").as("nj"))
    Seq((1, 0), (-1, 0), (0, 1), (0, -1)).map { case (dx, dy) =>
      cells.join(j, (col("cell_x") + dx) === col("jx") &&
        (col("cell_y") + dy) === col("jy"))
    }.reduce(_ unionByName _)
      .select(col("cell_x"), col("cell_y"), col("n").as("ni"), col("nj"))
  }

  // -------------------------------------------------------- Moran's I
  /** Global Moran's I over the occupied-cell counts with binary rook
    * weights (Moran 1950): I = (N/W)·Σw_ij·d_i·d_j / Σd_i² with
    * d = n − n̄ — positive I ⇒ hot cells cluster next to hot cells, the
    * inferential upgrade of [[hotspotCells]]' marginal z-screen.
    * Reports E[I] = −1/(N−1) alongside.
    *
    * DETERMINISM AND SCALE: deviations scale by N (N·d_i = N·n_i − S,
    * exact integers), so I = N·Σ(Nd_i)(Nd_j) / (W·Σ(Nd_i)²) is ONE
    * exact integer rational; adjacency is four shifted equi-joins.
    * A constant lattice (zero variance) nulls loudly. Returns one row:
    * (n_cells, w_pairs, morans_i, expected_i) 6dp. */
  def moransI(df: DataFrame, xCol: Column, yCol: Column,
              cellSize: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dt0 = DecimalType(38, 0)
    val cells = cellCounts(df, xCol, yCol, cellSize)
    val tot = cells.agg(count(lit(1)).as("__nc"), sum(col("n")).as("__s"))
    def dev(nCol: Column) =
      col("__nc").cast(dt0) * nCol - col("__s").cast(dt0)
    val den = cells.crossJoin(broadcast(tot))
      .agg(first(col("__nc")).as("n_cells"), first(col("__s")).as("__s"),
        sum(dev(col("n")) * dev(col("n"))).as("__den"))
    val num = rookPairs(cells).crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("w_pairs"),
        sum(dev(col("ni")) * dev(col("nj"))).as("__num"))
    den.crossJoin(num)
      .select(col("n_cells"), col("w_pairs"),
        round(when(col("__den") > lit(0).cast(dt0) && col("w_pairs") > 0L,
          (col("n_cells").cast(dt0) * col("__num")).cast("double") /
            (col("w_pairs").cast(dt0) * col("__den")).cast("double")), 6)
          .as("morans_i"),
        round(when(col("n_cells") > 1L,
          lit(-1.0) / (col("n_cells") - 1L).cast("double")), 6)
          .as("expected_i"))
  }

  // -------------------------------------------------------- Geary's C
  /** Global Geary's C with binary rook weights (Geary 1954):
    * C = (N−1)·Σw_ij(n_i−n_j)² / (2W·Σ(n_i−n̄)²) — the local-gradient
    * mirror of [[moransI]] (C < 1 clustered, > 1 dispersed; C is more
    * sensitive to local spikes than I's global covariance).
    *
    * DETERMINISM AND SCALE: Σ(n_i−n_j)² is already exact integer; the
    * variance term scales by N² as in [[moransI]], so
    * C = (N−1)·N²·Σw(Δn)² / (2W·Σ(Nd)²) is ONE exact integer rational.
    * Returns one row: (n_cells, w_pairs, gearys_c) 6dp. */
  def gearysC(df: DataFrame, xCol: Column, yCol: Column,
              cellSize: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dt0 = DecimalType(38, 0)
    val cells = cellCounts(df, xCol, yCol, cellSize)
    val tot = cells.agg(count(lit(1)).as("__nc"), sum(col("n")).as("__s"))
    def dev(nCol: Column) =
      col("__nc").cast(dt0) * nCol - col("__s").cast(dt0)
    val den = cells.crossJoin(broadcast(tot))
      .agg(first(col("__nc")).as("n_cells"),
        sum(dev(col("n")) * dev(col("n"))).as("__den"))
    val num = rookPairs(cells)
      .agg(count(lit(1)).as("w_pairs"),
        sum(((col("ni") - col("nj")) * (col("ni") - col("nj")))
          .cast(dt0)).as("__num2"))
    den.crossJoin(num)
      .select(col("n_cells"), col("w_pairs"),
        round(when(col("__den") > lit(0).cast(dt0) && col("w_pairs") > 0L,
          ((col("n_cells") - 1L).cast(dt0) * col("n_cells").cast(dt0) *
            col("n_cells").cast(dt0) * col("__num2")).cast("double") /
          (lit(2L).cast(dt0) * col("w_pairs").cast(dt0) * col("__den"))
            .cast("double")), 6).as("gearys_c"))
  }

  // ------------------------------------------------- join-count stats
  /** Binary join-count statistics (Moran 1948): cells mark Black when
    * their count exceeds the lattice mean (N·n > S, an exact integer
    * compare); BB / WW / BW counts over the undirected rook joins, plus
    * the nonfree-sampling expectation E[BW] = 2W·n_B·n_W/(N(N−1)) — the
    * categorical autocorrelation screen where [[moransI]] needs a
    * numeric value.
    *
    * DETERMINISM AND SCALE: marks, joins, and the expectation are all
    * exact integers/rationals (directed pair counts halve exactly).
    * Returns one row: (n_cells, n_black, joins_bb, joins_ww, joins_bw,
    * expected_bw) 6dp. */
  def joinCountStats(df: DataFrame, xCol: Column, yCol: Column,
                     cellSize: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dt0 = DecimalType(38, 0)
    val cells = cellCounts(df, xCol, yCol, cellSize)
    val tot = cells.agg(count(lit(1)).as("__nc"), sum(col("n")).as("__s"))
    def black(nCol: Column) =
      col("__nc").cast(dt0) * nCol > col("__s").cast(dt0)
    val marks = cells.crossJoin(broadcast(tot))
      .agg(first(col("__nc")).as("n_cells"),
        sum(when(black(col("n")), 1L).otherwise(0L)).as("n_black"))
    val joins = rookPairs(cells).crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("__wd"),
        sum(when(black(col("ni")) && black(col("nj")), 1L).otherwise(0L))
          .as("__bb"),
        sum(when(!black(col("ni")) && !black(col("nj")), 1L).otherwise(0L))
          .as("__ww"))
    marks.crossJoin(joins)
      .select(col("n_cells"), col("n_black"),
        expr("__bb div 2").as("joins_bb"), expr("__ww div 2").as("joins_ww"),
        expr("(__wd - __bb - __ww) div 2").as("joins_bw"),
        round(when(col("n_cells") > 1L,
          (expr("__wd div 2").cast("double") * lit(2.0) *
            col("n_black").cast("double") *
            (col("n_cells") - col("n_black")).cast("double")) /
          (col("n_cells").cast("double") *
            (col("n_cells") - 1L).cast("double"))), 6).as("expected_bw"))
  }

  // --------------------------------------------------- General G index
  /** Getis–Ord General G with binary rook weights (Getis & Ord 1992):
    * G = Σw_ij·n_i·n_j / Σ_{i≠j} n_i·n_j — do HIGH values sit next to
    * each other specifically (G > E[G] = W/(N(N−1))), where [[moransI]]
    * cannot tell high-clusters-with-high from low-with-low.
    *
    * DETERMINISM AND SCALE: numerator over the directed rook pairs and
    * denominator S² − Σn² are both exact integers — ONE rational.
    * Returns one row: (n_cells, w_pairs, general_g, expected_g) 6dp. */
  def generalG(df: DataFrame, xCol: Column, yCol: Column,
               cellSize: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dt0 = DecimalType(38, 0)
    val cells = cellCounts(df, xCol, yCol, cellSize)
    val tot = cells.agg(count(lit(1)).as("n_cells"),
      sum(col("n").cast(dt0)).as("__s"),
      sum(col("n").cast(dt0) * col("n")).as("__s2"))
    val num = rookPairs(cells)
      .agg(count(lit(1)).as("w_pairs"),
        sum(col("ni").cast(dt0) * col("nj")).as("__num"))
    num.crossJoin(broadcast(tot))
      .select(col("n_cells"), col("w_pairs"),
        round(when(col("__s") * col("__s") - col("__s2") >
            lit(0).cast(dt0),
          col("__num").cast("double") /
            (col("__s") * col("__s") - col("__s2")).cast("double")), 6)
          .as("general_g"),
        round(when(col("n_cells") > 1L,
          col("w_pairs").cast("double") /
            (col("n_cells").cast("double") *
              (col("n_cells") - 1L).cast("double"))), 6).as("expected_g"))
  }
}
