package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial statistics over the engine's cell lattice — the analytics layer
  * above the tiling spine (cell assignment → per-cell aggregation →
  * lattice statistics). First member: global Moran's I spatial
  * autocorrelation of a per-cell value under rook adjacency, the standard
  * "is this variable spatially clustered?" diagnostic (hot-cell detection
  * before salting, crawl-coverage bias, per-tile quality drift).
  *
  * Exactness: with x̄ = S/N rational, both Moran numerator and denominator
  * scale by N² when deviations are taken as integers dev_i = N·v_i − S, and
  * the N² factors cancel in the ratio — so the whole statistic reduces to
  * integer sums and products (DECIMAL(38,0) internally), order-independent
  * and bit-identical at any parallelism and in SQL. The exported ppm is one
  * truncating division at the end, sign handled explicitly so truncation
  * direction can't differ between engines.
  */
object SpatialStats {

  private val Dec = "decimal(38,0)"

  /** cells: (x long, y long, v long) — one row per OBSERVED lattice cell
    * (adjacency is among observed cells; absent cells are outside the
    * study frame, not zeros — the right frame for sparse web corpora).
    * Returns one row: (n_cells, sum_v, w_pairs, num2, den, moran_ppm)
    * where w_pairs = directed rook-adjacent pair count, num2 = Σ_directed
    * dev_i·dev_j, den = Σ dev_i², and
    * moran_ppm = sign · ⌊|num2| · N · 10⁶ / (W · den)⌋ (0 when W or den
    * is 0). num2/den are exported as BIGINT certificates (exact for any
    * corpus whose scaled deviations fit 63 bits; internal arithmetic is
    * 38-digit decimal).
    *
    * Scale shape: the value frame is already one row per cell (the heavy
    * page→cell aggregation happens upstream with map-side combine); here
    * are two equi-joins on (x, y) neighbor keys and three scalar
    * aggregates — no theta joins, no windows.
    */
  /** Skew report over the cell-load distribution — the planning
    * diagnostic that decides whether a tiling job needs salting before
    * it runs: hot-cell mass, and the exact Gini coefficient of per-cell
    * loads as integer ppm (Gini = Σ(2i−n−1)·v_(i) / (n·S) over loads
    * sorted ascending with (v, cell) rank ties — every term integer,
    * deterministic at any parallelism). Returns ONE row: (n_cells,
    * total, v_max, top_cell, top_share_ppm, gini_ppm).
    *
    * Scale shape: input is the per-cell load frame (bounded by 4^level
    * cells regardless of corpus size), so the rank window and the scalar
    * fold are tiny; the heavy page→cell agg happens upstream with
    * map-side combine.
    */
  /** Spherical haversine distance in meters as a pure COLUMN expression
    * (same formula as geo.Proj.haversineMeters, WGS84 semi-major axis) —
    * codegen'd functions end to end, no UDF, so it rides whole-stage
    * codegen and mirrors term-for-term in SQL.
    */
  def haversineCol(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / lit(2.0)), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / lit(2.0)), 2)
    lit(2.0) * lit(graft.geo.Proj.EarthRadius) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Nearest-anchor labeling (reverse geocode to the closest of a small
    * reference set — cities, datacenters, ground stations): every point
    * gets its closest anchor by great-circle distance, ties to the
    * lowest anchor_id, distance reported in ROUND-9 meters (the trig
    * recipe — JVM and libm trig are 1 ulp apart).
    *
    * Scale shape: the anchor set is BROADCAST (it is small by
    * definition); the argmin is ONE map-side-combined min(struct) per
    * point — no window, no shuffle wider than doc_id. K anchors cost a
    * K-fold map-side expansion, nothing more.
    *
    * The reported distance is WHOLE METERS as a BIGINT: at 10^7-meter
    * magnitudes a double's ulp is ~2e-9 m, so ROUND(·, 9) would be a
    * no-op and JVM-vs-libm trig ulp noise would leak; a 1-meter grid
    * makes a boundary flip a ~1e-8-per-row event.
    */
  /** Spherical destination point (the direct geodesic on a sphere —
    * PostGIS ST_Project semantics, spherical model): from each point,
    * travel `distCol` meters on initial bearing `bearingCol` degrees.
    * Standard formulas lat2 = asin(sin φ cos δ + cos φ sin δ cos θ),
    * lon2 = λ + atan2(sin θ sin δ cos φ, cos δ − sin φ sin φ₂), with
    * δ = d/R. Map-only, codegen'd; ROUND-9 degrees absorbs JVM-vs-libm
    * trig ulp (the established trig recipe).
    */
  def destinationPoint(points: DataFrame, bearingCol: String,
                       distCol: String, radiusM: Double = 6378137.0): DataFrame = {
    val la1 = radians(col("lat")); val lo1 = radians(col("lon"))
    val th = radians(col(bearingCol))
    val dl = col(distCol) / radiusM
    val sl2 = sin(la1) * cos(dl) + cos(la1) * sin(dl) * cos(th)
    points.select(col("doc_id"),
      round(degrees(asin(sl2)), 9).as("dest_lat"),
      round(degrees(lo1 + atan2(sin(th) * sin(dl) * cos(la1),
        cos(dl) - sin(la1) * sl2)), 9).as("dest_lon"))
  }

  def nearestAnchor(points: DataFrame, anchors: DataFrame): DataFrame =
    points.crossJoin(broadcast(anchors))
      .select(col("doc_id"),
        struct(
          haversineCol(col("lon"), col("lat"), col("a_lon"), col("a_lat"))
            .as("dist_m"),
          col("anchor_id")).as("cand"))
      .groupBy("doc_id").agg(min(col("cand")).as("best"))
      .select(col("doc_id"), col("best.anchor_id").as("anchor_id"),
        round(col("best.dist_m"), 0).cast("long").as("dist_m"))

  def cellSkew(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = cells.select(col("cell").cast("long").as("cell"),
      col("v").cast("long").as("v"))
    val w = Window.orderBy(col("v"), col("cell"))
    val ranked = base.withColumn("i", row_number().over(w))
    ranked
      .agg(count(lit(1)).as("n_cells"), sum("v").as("total"),
        max("v").as("v_max"),
        max(struct(col("v").as("v"), (-col("cell")).as("negcell"))).as("top"),
        sum((col("i") * 2).cast(Dec) * col("v")).cast(Dec).as("ri2"))
      .select(col("n_cells"), col("total"), col("v_max"),
        (-col("top.negcell")).as("top_cell"),
        expr("CAST(v_max * 1000000 DIV total AS BIGINT)").as("top_share_ppm"),
        (col("ri2") - (col("n_cells") + 1).cast(Dec) * col("total").cast(Dec))
          .cast(Dec).as("gnum"),
        (col("n_cells").cast(Dec) * col("total").cast(Dec)).cast(Dec).as("gden"))
      .select(col("n_cells"), col("total"), col("v_max"), col("top_cell"),
        col("top_share_ppm"),
        expr(s"CAST(CAST(gnum * 1000000 AS $Dec) DIV gden AS BIGINT)").as("gini_ppm"))
  }

  /** Local hotspot scores (the Getis-Ord Gi* recipe in exact integers):
    * for each observed cell, the rook-stencil neighborhood sum (self +
    * up to 4 neighbors present in the frame) compared against the global
    * mean density — excess_ppm = sign · ⌊|N·G_i − m_i·S| · 10⁶ /
    * (m_i·S)⌋, i.e. the neighborhood's percentage-above-average density
    * in signed ppm (0 ppm = exactly average, 10⁶ = double the average).
    * All integer certificates; decimal(38,0) internally.
    *
    * Scale shape: the stencil is an EXPLODE of each cell's 5 positions
    * (map-only) + one map-side-combined aggregation + one equi-join back
    * to the observed frame — the convolution pattern, never a window or
    * theta join. Input is the per-cell value frame (the page→cell agg
    * happens upstream).
    */
  def hotspots(cells: DataFrame): DataFrame = {
    val base = cells.select(col("x").cast("long").as("x"),
      col("y").cast("long").as("y"), col("v").cast("long").as("v"))
    val stats = base.agg(count(lit(1)).as("n"), sum("v").as("s"))
    val stencil = Seq((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))
    val contrib = base
      .select(explode(array(stencil.map { case (dx, dy) =>
        struct((col("x") + dx).as("nx"), (col("y") + dy).as("ny"))
      }: _*)).as("p"), col("v"))
      .select(col("p.nx").as("x"), col("p.ny").as("y"), col("v"))
      .groupBy("x", "y")
      .agg(sum("v").as("nbr_sum"), count(lit(1)).as("nbr_n"))
    base.join(contrib, Seq("x", "y"))
      .crossJoin(broadcast(stats))
      .select(col("x"), col("y"), col("v"), col("nbr_n"), col("nbr_sum"),
        (col("n") * col("nbr_sum") - col("nbr_n") * col("s")).cast(Dec).as("exc"),
        (col("nbr_n") * col("s")).cast(Dec).as("base_mass"))
      .select(col("x"), col("y"), col("v"), col("nbr_n"), col("nbr_sum"),
        (when(col("exc") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr(s"CAST(CAST(abs(exc) * 1000000 AS $Dec) DIV base_mass AS BIGINT)"))
          .as("excess_ppm"))
  }

  def moranI(cells: DataFrame): DataFrame = {
    val base = cells.select(col("x").cast("long").as("x"),
      col("y").cast("long").as("y"), col("v").cast("long").as("v"))
    val stats = base.agg(count(lit(1)).as("n"), sum("v").as("s"))
    val dev = base.crossJoin(broadcast(stats))
      .select(col("x"), col("y"),
        (col("n") * col("v") - col("s")).cast(Dec).as("dev"))
    val right = dev.select(col("x").as("xr"), col("y").as("yr"),
      col("dev").as("dev2"))
    val ew = dev.join(right, col("xr") === col("x") + 1 && col("yr") === col("y"))
    val ns = dev.join(right, col("xr") === col("x") && col("yr") === col("y") + 1)
    val prods = ew.unionByName(ns)
      .select((col("dev") * col("dev2")).cast(Dec).as("p"))
    val numF = prods.agg(
      coalesce(sum("p"), lit(0).cast(Dec)).cast(Dec).as("num_u"),
      count(lit(1)).as("u_pairs"))
    val denF = dev.agg(sum(col("dev") * col("dev")).cast(Dec).as("den"))
    stats.crossJoin(broadcast(numF)).crossJoin(broadcast(denF))
      .select(
        col("n").as("n_cells"), col("s").as("sum_v"),
        (col("u_pairs") * 2).as("w_pairs"),
        (col("num_u") * 2).cast(Dec).as("num2d"),
        col("den"))
      .select(col("n_cells"), col("sum_v"), col("w_pairs"),
        col("num2d").cast("long").as("num2"), col("den").cast("long").as("den"),
        when(col("w_pairs") === 0 || col("den") === lit(0).cast(Dec), lit(0L))
          .otherwise(
            when(col("num2d") < 0, lit(-1L)).otherwise(lit(1L)) *
              expr(s"CAST(CAST(abs(num2d) * n_cells * 1000000 AS $Dec) " +
                s"DIV CAST(w_pairs * den AS $Dec) AS BIGINT)"))
          .as("moran_ppm"))
  }

  /** Rhumb-line (loxodrome) distance and bearing to each anchor — the
    * constant-bearing navigation complement to the great-circle pair
    * (haversineCol / destinationPoint): distance in WHOLE METERS
    * (ulp-safe grid), bearing in ROUND-5 degrees [0, 360) (≈1 m of
    * across-track at Earth scale; coarse enough that the StrictMath-vs-
    * libm 1-ulp gap in log/atan2 — ~1e-14 deg — cannot straddle a
    * boundary at any realistic row count). Same-latitude legs take the
    * exact q = cos φ branch (both engines branch on the identical raw
    * doubles); Δλ wraps through the antimeridian via the +540 pmod.
    * Map-only behind the anchor broadcast, codegen'd end to end.
    */
  def rhumbToAnchors(points: DataFrame, anchors: DataFrame,
                     radiusM: Double = 6378137.0): DataFrame = {
    val phi1 = radians(col("lat")); val phi2 = radians(col("a_lat"))
    val dphi = phi2 - phi1
    val dlam = radians(
      pmod(col("a_lon") - col("lon") + lit(540.0), lit(360.0)) - lit(180.0))
    val dpsi = log(
      tan(lit(math.Pi / 4.0) + phi2 / lit(2.0)) /
        tan(lit(math.Pi / 4.0) + phi1 / lit(2.0)))
    val q = when(col("lat") === col("a_lat"), cos(phi1)).otherwise(dphi / dpsi)
    val dist = sqrt(dphi * dphi + q * q * dlam * dlam) * lit(radiusM)
    val theta = degrees(atan2(dlam, dpsi))
    points.crossJoin(broadcast(anchors))
      .select(col("doc_id"), col("anchor_id"),
        round(dist, 0).cast("long").as("rhumb_m"),
        round(pmod(theta + lit(360.0), lit(360.0)), 5).as("bearing_deg"))
  }
}
