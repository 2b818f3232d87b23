package graft.geo

/** Minimal WKT reader/writer for POLYGON / MULTIPOLYGON (with holes) —
  * the engine's analog of the reference's geometry constructors
  * (reference: buteo/bbox/conversion.py:23-214,
  * buteo/core_vector/core_vector_write.py:354-583).
  */
object Wkt {

  /** Parse POLYGON((...)) or MULTIPOLYGON(((...))) into polygons with
    * flat rings (first ring = shell).
    */
  def parsePolygons(wkt: String): Array[Polygon] = {
    val s = wkt.trim
    val upper = s.toUpperCase
    if (upper.startsWith("POLYGON")) Array(parsePolygonBody(body(s)))
    else if (upper.startsWith("MULTIPOLYGON")) {
      // each depth-0 piece is a parenthesized polygon body: ((shell),(hole))
      splitTop(body(s)).map { p =>
        val t = p.trim
        require(t.startsWith("(") && t.endsWith(")"), s"malformed polygon part: ${t.take(20)}")
        parsePolygonBody(t.substring(1, t.length - 1))
      }.toArray
    } else throw new IllegalArgumentException(s"unsupported WKT: ${s.take(30)}")
  }

  def parsePolygon(wkt: String): Polygon = parsePolygons(wkt)(0)

  private def body(s: String): String = {
    val i = s.indexOf('(')
    val j = s.lastIndexOf(')')
    require(i >= 0 && j > i, s"malformed WKT: ${s.take(30)}")
    s.substring(i + 1, j)
  }

  /** Split a parenthesized list at depth 0 commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.map(_.trim).toSeq
  }

  private def parsePolygonBody(bodyStr: String): Polygon = {
    val rings = splitTop(bodyStr).map { ringStr =>
      val inner = ringStr.trim.stripPrefix("(").stripSuffix(")")
      val coords = inner.split(",").map(_.trim).filter(_.nonEmpty)
      val flat = new Array[Double](coords.length * 2)
      var i = 0
      while (i < coords.length) {
        val parts = coords(i).split("\\s+")
        flat(2 * i) = parts(0).toDouble
        flat(2 * i + 1) = parts(1).toDouble
        i += 1
      }
      flat
    }
    Polygon(rings.toArray)
  }

  /** Polygon area = |shell| − Σ|holes| (shoelace absolute values). */
  def area(p: Polygon): Double = {
    val shell = math.abs(PIP.signedArea(p.rings(0)))
    val holes = p.rings.drop(1).map(r => math.abs(PIP.signedArea(r))).sum
    shell - holes
  }

  def toWkt(p: Polygon): String = {
    val rings = p.rings.map { r =>
      val open = r.grouped(2).map(a => s"${a(0)} ${a(1)}").toSeq
      // close the ring exactly once (inputs may already carry the dup)
      val pts = if (open.length > 1 && open.head == open.last) open
                else open :+ s"${r(0)} ${r(1)}"
      pts.mkString("(", ", ", ")")
    }
    rings.mkString("POLYGON (", ", ", ")")
  }

  /** GeoJSON Polygon geometry emit (closed rings) — the reference's
    * GeoJSON conversions (reference: buteo/bbox/conversion.py:214,
    * core_vector_write.py:496).
    */
  def toGeoJson(p: Polygon): String = {
    val rings = p.rings.map { r =>
      val pts = (r.grouped(2).map(a => s"[${a(0)},${a(1)}]").toSeq :+ s"[${r(0)},${r(1)}]")
      pts.mkString("[", ",", "]")
    }
    rings.mkString("""{"type":"Polygon","coordinates":[""", ",", "]}")
  }

  /** Minimal GeoJSON Polygon parser (inverse of toGeoJson; exterior +
    * holes). Accepts the geometry object form only.
    */
  def fromGeoJson(json: String): Polygon = {
    val coordsIdx = json.indexOf("\"coordinates\"")
    require(coordsIdx >= 0, "not a GeoJSON geometry: missing coordinates")
    val start = json.indexOf('[', coordsIdx)
    val end = json.lastIndexOf(']')
    val body = json.substring(start + 1, end)
    // split at depth-0 commas, bracket-aware
    def splitBrackets(s: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var depth = 0; var st = 0
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1
          case ',' if depth == 0 => out += s.substring(st, i); st = i + 1
          case _ =>
        }
        i += 1
      }
      out += s.substring(st)
      out.map(_.trim).toSeq
    }
    val rings = splitBrackets(body).map { ringStr =>
      val t = ringStr.trim.stripPrefix("[").stripSuffix("]")
      val pts = splitBrackets(t).map { pair =>
        val pq = pair.trim.stripPrefix("[").stripSuffix("]").split(",")
        (pq(0).trim.toDouble, pq(1).trim.toDouble)
      }
      val flat = new Array[Double](pts.length * 2)
      pts.zipWithIndex.foreach { case ((x, y), i) =>
        flat(2 * i) = x; flat(2 * i + 1) = y
      }
      flat
    }
    Polygon(rings.toArray)
  }
}
