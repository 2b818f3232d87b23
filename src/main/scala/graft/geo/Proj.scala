package graft.geo

/** Closed-form map projections (no PROJ dependency).
  *
  * Implements the projections the reference reaches through osr/PROJ
  * (reference: buteo/utils/utils_projection.py): WGS84 geographic
  * (EPSG:4326), spherical Web Mercator (EPSG:3857), and WGS84/UTM zones
  * (EPSG:326xx/327xx) via Snyder's ellipsoidal transverse-Mercator series
  * (USGS PP 1395, eqs 8-9..8-17 — public formulas).
  */
object Proj {
  val EarthRadius = 6378137.0          // WGS84 semi-major axis (a)
  val Flattening = 1.0 / 298.257223563 // WGS84 f
  val E2: Double = Flattening * (2.0 - Flattening) // first eccentricity^2
  private val E4 = E2 * E2
  private val E6 = E4 * E2
  private val Ep2 = E2 / (1.0 - E2)    // second eccentricity^2

  /** UTM zone number for a longitude.
    * Reference: buteo/utils/utils_projection.py:808 —
    * `zone = floor((lng+180)/6)+1`.
    */
  def utmZone(lng: Double): Int = math.floor((lng + 180.0) / 6.0 + 1.0).toInt

  /** UTM EPSG code: 32/6|7/zone.
    * Reference: buteo/utils/utils_projection.py:808-811 (hemisphere digit 6
    * for lat >= 0, 7 for lat < 0).
    */
  def utmEpsg(lat: Double, lng: Double): Int = {
    val zone = utmZone(lng)
    val hemi = if (lat < 0) 700 else 600
    32000 + hemi + zone
  }

  def utmCentralMeridian(zone: Int): Double = zone * 6.0 - 183.0

  // --- Web Mercator (spherical, EPSG:3857) ---

  def lonLatToMercator(lon: Double, lat: Double): (Double, Double) = {
    val x = EarthRadius * math.toRadians(lon)
    val y = EarthRadius * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0))
    (x, y)
  }

  def mercatorToLonLat(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / EarthRadius)
    val lat = math.toDegrees(2.0 * math.atan(math.exp(y / EarthRadius)) - math.Pi / 2.0)
    (lon, lat)
  }

  // --- Ellipsoidal transverse Mercator (UTM), Snyder series ---

  private val K0 = 0.9996
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

  /** Meridional arc length M(phi) — Snyder eq. 3-21. */
  private def meridionalArc(phi: Double): Double =
    EarthRadius * (
      (1 - E2 / 4 - 3 * E4 / 64 - 5 * E6 / 256) * phi
        - (3 * E2 / 8 + 3 * E4 / 32 + 45 * E6 / 1024) * math.sin(2 * phi)
        + (15 * E4 / 256 + 45 * E6 / 1024) * math.sin(4 * phi)
        - (35 * E6 / 3072) * math.sin(6 * phi))

  /** Forward: (lon, lat) degrees → UTM (easting, northing) meters in `zone`.
    * `south` selects the 10,000 km false northing.
    */
  def lonLatToUtm(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon)
    val lam0 = math.toRadians(utmCentralMeridian(zone))
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = EarthRadius / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = Ep2 * cosP * cosP
    val a = cosP * (lam - lam0)
    val m = meridionalArc(phi)
    val a2 = a * a; val a3 = a2 * a; val a4 = a3 * a; val a5 = a4 * a; val a6 = a5 * a
    val x = K0 * n * (a + (1 - t + c) * a3 / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * a5 / 120) + FalseEasting
    val y0 = K0 * (m + n * tanP * (a2 / 2 + (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * a6 / 720))
    val y = if (south) y0 + FalseNorthingSouth else y0
    (x, y)
  }

  /** Inverse: UTM (easting, northing) in `zone` → (lon, lat) degrees. */
  def utmToLonLat(easting: Double, northing: Double, zone: Int, south: Boolean): (Double, Double) = {
    val x = easting - FalseEasting
    val y = if (south) northing - FalseNorthingSouth else northing
    val m = y / K0
    val mu = m / (EarthRadius * (1 - E2 / 4 - 3 * E4 / 64 - 5 * E6 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val e12 = e1 * e1; val e13 = e12 * e1; val e14 = e13 * e1
    val phi1 = mu + (3 * e1 / 2 - 27 * e13 / 32) * math.sin(2 * mu) +
      (21 * e12 / 16 - 55 * e14 / 32) * math.sin(4 * mu) +
      (151 * e13 / 96) * math.sin(6 * mu) +
      (1097 * e14 / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = Ep2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = EarthRadius / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = EarthRadius * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = x / (n1 * K0)
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tanP / r1) * (d2 / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * d4 / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep2 - 3 * c1 * c1) * d6 / 720)
    val lam = (d - (1 + 2 * t1 + c1) * d3 / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep2 + 24 * t1 * t1) * d5 / 120) / cosP
    (math.toDegrees(lam) + utmCentralMeridian(zone), math.toDegrees(phi))
  }

  /** Point reprojection between the EPSG codes the engine supports:
    * 4326 (lon/lat degrees), 3857 (spherical mercator meters),
    * 326xx / 327xx (UTM meters). Routed through lon/lat.
    * Reference API analog: buteo/utils/utils_projection.py:701-766.
    */
  def reprojectPoint(x: Double, y: Double, srcEpsg: Int, dstEpsg: Int): (Double, Double) = {
    if (srcEpsg == dstEpsg) return (x, y)
    val (lon, lat) = srcEpsg match {
      case 4326 => (x, y)
      case 3857 => mercatorToLonLat(x, y)
      case e if e >= 32601 && e <= 32660 => utmToLonLat(x, y, e - 32600, south = false)
      case e if e >= 32701 && e <= 32760 => utmToLonLat(x, y, e - 32700, south = true)
      case e => throw new IllegalArgumentException(s"Unsupported source EPSG: $e")
    }
    dstEpsg match {
      case 4326 => (lon, lat)
      case 3857 => lonLatToMercator(lon, lat)
      case e if e >= 32601 && e <= 32660 => lonLatToUtm(lon, lat, e - 32600, south = false)
      case e if e >= 32701 && e <= 32760 => lonLatToUtm(lon, lat, e - 32700, south = true)
      case e => throw new IllegalArgumentException(s"Unsupported target EPSG: $e")
    }
  }

  /** 4-corner bbox reprojection (hull of the reprojected corners).
    * Reference: buteo/utils/utils_projection.py:593-698 (:647-691).
    */
  def reprojectBBox(b: BBox, srcEpsg: Int, dstEpsg: Int): BBox = {
    val corners = Array((b.xMin, b.yMin), (b.xMin, b.yMax), (b.xMax, b.yMin), (b.xMax, b.yMax))
      .map { case (x, y) => reprojectPoint(x, y, srcEpsg, dstEpsg) }
    BBox(corners.map(_._1).min, corners.map(_._1).max,
         corners.map(_._2).min, corners.map(_._2).max)
  }

  /** Great-circle distance in meters (spherical haversine). */
  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadius * math.asin(math.min(1.0, math.sqrt(a)))
  }
}
