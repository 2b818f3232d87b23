package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{BBox, Polygon, RTree, Wkt}

/** Vector-layer operators over DataFrames with a WKT geometry column —
  * the Spark re-expression of the reference's vector toolbox
  * (reference: the buteo core_vector and vector packages).
  */
object VectorOps {

  /** wkt → (area, xMin, xMax, yMin, yMax) via the engine's WKT parser.
    * Scala UDF (geometry parse is object code; not a hot scan path).
    */
  private val geomInfo = udf { (wkt: String) =>
    val p = Wkt.parsePolygon(wkt)
    val b = p.bbox
    (Wkt.area(p), b.xMin, b.xMax, b.yMin, b.yMax)
  }

  def withGeomInfo(df: DataFrame, wktCol: String): DataFrame =
    df.withColumn("__g", geomInfo(col(wktCol)))
      .withColumn("area", col("__g._1"))
      .withColumn("x_min", col("__g._2")).withColumn("x_max", col("__g._3"))
      .withColumn("y_min", col("__g._4")).withColumn("y_max", col("__g._5"))
      .drop("__g")

  /** SELECT * WHERE attr IN (...) — reference:
    * buteo/vector/extract_by_attribute.py:23-129.
    */
  def extractByAttribute(df: DataFrame, attrCol: String, values: Seq[String]): DataFrame =
    df.filter(col(attrCol).isin(values: _*))

  /** Dissolve by attribute: per class, bbox hull + feature count + total
    * area (reference: buteo/vector/dissolve.py:26-132 — the v1 engine
    * dissolves extents/metrics; exact ring union is staged).
    */
  def dissolveByAttribute(df: DataFrame, attrCol: String, wktCol: String): DataFrame =
    withGeomInfo(df, wktCol)
      .groupBy(attrCol)
      .agg(count(lit(1)).as("n_features"),
        min("x_min").as("x_min"), max("x_max").as("x_max"),
        min("y_min").as("y_min"), max("y_max").as("y_max"),
        sum("area").as("total_area"))

  /** Exact geometric dissolve — ST_Union(geom) GROUP BY attr (reference:
    * buteo/vector/dissolve.py:101-116). Per-group union runs locally via
    * RectUnion (exact for rectilinear polygons; same per-group shape as
    * the reference's SQLite ST_Union); groups distribute across the
    * cluster. Returns per class: feature count, exact union area
    * (shoelace over the assembled rings — any ring-tracing bug shows up
    * against the slab-sweep oracle), ring/vertex counts, bbox, and the
    * union MULTIPOLYGON WKT.
    */
  def dissolveUnion(df: DataFrame, attrCol: String, wktCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(attrCol).cast("string"), col(wktCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroups { (k: String, it: Iterator[(String, String)]) =>
        val polys = it.map(p => Wkt.parsePolygon(p._2)).toSeq
        // exact integer-grid slab sweep when every edge is axis-parallel;
        // the general noding+trace union (PolyUnion) otherwise
        val rectilinear = polys.forall(_.rings.forall { r =>
          val n = r.length / 2
          (0 until n).forall { i =>
            val j = (i + 1) % n
            r(2 * i) == r(2 * j) || r(2 * i + 1) == r(2 * j + 1)
          }
        })
        val u =
          if (rectilinear) graft.geo.RectUnion.union(polys)
          else graft.geo.PolyUnion.union(polys)
        var x0 = Double.MaxValue; var x1 = Double.MinValue
        var y0 = Double.MaxValue; var y1 = Double.MinValue
        u.rings.foreach { r =>
          var i = 0
          while (i < r.length) {
            if (r(i) < x0) x0 = r(i); if (r(i) > x1) x1 = r(i)
            if (r(i + 1) < y0) y0 = r(i + 1); if (r(i + 1) > y1) y1 = r(i + 1)
            i += 2
          }
        }
        val wkt = u.rings.map { r =>
          val pts = (0 until r.length by 2).map(i => s"${r(i)} ${r(i + 1)}")
          "((" + (pts :+ pts.head).mkString(", ") + "))"
        }.mkString("MULTIPOLYGON(", ", ", ")")
        (k, polys.size.toLong, u.area, u.nRings.toLong, u.nVertices.toLong,
          x0, x1, y0, y1, wkt)
      }
      .toDF("klass", "n_features", "union_area", "n_rings", "n_vertices",
        "x_min", "x_max", "y_min", "y_max", "union_wkt")
  }

  /** Merge layers (reference: core_vector_merge.py:24-123). */
  def mergeLayers(layers: Seq[DataFrame]): DataFrame =
    layers.reduce(_ unionByName _)

  /** Vector-vector intersects join: broadcast R-tree of layer B's
    * envelopes, refine with exact ring predicates
    * (reference: buteo/vector/intersect.py:27-84 — SQLite R-tree +
    * ST_INTERSECTS). For polygon pairs the refine tests shell-vertex
    * containment both ways plus bbox overlap (exact for convex shells;
    * v1 semantics documented).
    */
  def intersectJoin(big: DataFrame, small: DataFrame, wktCol: String,
                    idColBig: String, idColSmall: String): DataFrame = {
    val spark = big.sparkSession
    val smallFeats = small.select(col(idColSmall).cast("long"), col(wktCol))
      .collect().map(r => (r.getLong(0), Wkt.parsePolygon(r.getString(1))))
    val tree = RTree.build(smallFeats.map(_._2.bbox))
    val bc = spark.sparkContext.broadcast((smallFeats, tree))
    val matches = udf { (wkt: String) =>
      val (feats, t) = bc.value
      val p = Wkt.parsePolygon(wkt)
      val b = p.bbox
      t.query(b.xMin, b.xMax, b.yMin, b.yMax).filter { i =>
        val q = feats(i)._2
        polygonsIntersect(p, q)
      }.map(i => feats(i)._1)
    }
    big.withColumn("__m", matches(col(wktCol)))
      .withColumn("match_fid", explode(col("__m")))
      .drop("__m")
  }

  /** General exact ST_Intersects for valid polygons (concave shells
    * included — reference SQLite ST_INTERSECTS semantics,
    * buteo/vector/intersect.py:63-65): any shell-edge pair intersecting
    * (proper crossings, T-touches, AND collinear overlaps), or any vertex
    * of one inside/on the other (hole-aware containment covers the
    * fully-contained case: with no edge intersections, one vertex inside
    * implies the whole polygon inside, by the Jordan curve theorem).
    */
  private[ops] def polygonsIntersect(a: Polygon, b: Polygon): Boolean = {
    if (!a.bbox.intersects(b.bbox)) return false
    val ra = a.rings(0); val rb = b.rings(0)
    var i = 0
    while (i < ra.length) {
      if (b.contains(ra(i), ra(i + 1))) return true
      i += 2
    }
    i = 0
    while (i < rb.length) {
      if (a.contains(rb(i), rb(i + 1))) return true
      i += 2
    }
    // edge intersections (covers overlap without vertex containment)
    segmentsCross(ra, rb)
  }

  private def segmentsCross(ra: Array[Double], rb: Array[Double]): Boolean = {
    val na = ra.length / 2; val nb = rb.length / 2
    var i = 0
    while (i < na) {
      val j = (i + 1) % na
      val ax1 = ra(2 * i); val ay1 = ra(2 * i + 1)
      val ax2 = ra(2 * j); val ay2 = ra(2 * j + 1)
      var k = 0
      while (k < nb) {
        val l = (k + 1) % nb
        if (segInt(ax1, ay1, ax2, ay2, rb(2 * k), rb(2 * k + 1), rb(2 * l), rb(2 * l + 1)))
          return true
        k += 1
      }
      i += 1
    }
    false
  }

  /** Segment intersection INCLUDING touches and collinear overlap
    * (classic orientation + on-segment tests).
    */
  private def segInt(x1: Double, y1: Double, x2: Double, y2: Double,
                     x3: Double, y3: Double, x4: Double, y4: Double): Boolean = {
    def d(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double) =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    def on(ax: Double, ay: Double, bx: Double, by: Double, px: Double, py: Double) =
      px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
        py >= math.min(ay, by) && py <= math.max(ay, by)
    val d1 = d(x3, y3, x4, y4, x1, y1)
    val d2 = d(x3, y3, x4, y4, x2, y2)
    val d3 = d(x1, y1, x2, y2, x3, y3)
    val d4 = d(x1, y1, x2, y2, x4, y4)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    (d1 == 0 && on(x3, y3, x4, y4, x1, y1)) ||
      (d2 == 0 && on(x3, y3, x4, y4, x2, y2)) ||
      (d3 == 0 && on(x1, y1, x2, y2, x3, y3)) ||
      (d4 == 0 && on(x1, y1, x2, y2, x4, y4))
  }

  /** Ring repair — the engine's MakeValid analog (reference:
    * buteo/core_vector/core_vector_fixgeometry.py:16-141, which applies
    * OGR MakeValid per feature and drops unfixable rows): per ring, strip
    * the closing duplicate, drop consecutive duplicate vertices, drop
    * degenerate (<3 distinct points) rings, and re-orient (shell CCW,
    * holes CW). Self-crossing shells are beyond v1 repair (dropped, like
    * the reference's unfixable rows). Returns per feature:
    * (id, was_valid, n_rings, n_pts, area, fixed_wkt); features whose
    * shell degenerates are dropped.
    */
  def fixGeometry(df: DataFrame, idCol: String, wktCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wktCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (fid, wkt) =>
        val poly = Wkt.parsePolygon(wkt)
        var valid = true
        val fixedRings = poly.rings.zipWithIndex.flatMap { case (ring, idx) =>
          val pts = (0 until ring.length by 2).map(i => (ring(i), ring(i + 1)))
          val closed = pts.length > 1 && pts.head == pts.last
          if (!closed) valid = false // WKT rings must repeat the first point
          val open = if (closed) pts.dropRight(1) else pts
          // drop consecutive duplicates (wrap-around included)
          val dedup = collection.mutable.ArrayBuffer.empty[(Double, Double)]
          open.foreach { p => if (dedup.isEmpty || dedup.last != p) dedup += p }
          if (dedup.length > 1 && dedup.head == dedup.last) dedup.remove(dedup.length - 1)
          if (dedup.length != open.length) valid = false
          if (dedup.length < 3) { valid = false; None }
          else {
            val flat = new Array[Double](dedup.length * 2)
            dedup.zipWithIndex.foreach { case ((x, y), o) =>
              flat(2 * o) = x; flat(2 * o + 1) = y
            }
            val sa = graft.geo.PIP.signedArea(flat)
            val wantCcw = idx == 0
            if ((sa > 0) != wantCcw) {
              valid = false
              val rev = new Array[Double](flat.length)
              var i = 0
              while (i < flat.length) {
                rev(i) = flat(flat.length - 2 - i); rev(i + 1) = flat(flat.length - 1 - i)
                i += 2
              }
              Some(rev)
            } else Some(flat)
          }
        }
        if (fixedRings.isEmpty) Iterator.empty
        else {
          val fixed = Polygon(fixedRings)
          Iterator.single((fid, valid, fixedRings.length.toLong,
            fixedRings.map(_.length / 2).sum.toLong, Wkt.area(fixed), Wkt.toWkt(fixed)))
        }
      }
      .toDF("fid", "was_valid", "n_rings", "n_pts", "area", "fixed_wkt")
  }

  /** One output per attribute value — vector_split_by_attribute
    * (reference: buteo/core_vector/core_vector_split.py:133): Spark's
    * partitioned write IS the split (one directory per value; scales to
    * any layer size, no driver loop).
    */
  def splitByAttribute(df: DataFrame, attrCol: String, outRoot: String): Unit =
    // REBALANCE on the partition column before the dynamic-partition
    // write (guide §6): without it every upstream task opens a file per
    // value it touches — tasks×values tiny files and their commit
    // overhead dominated the op; AQE's rebalance also splits a skewed
    // hot value instead of serializing it onto one writer
    df.hint("rebalance", attrCol)
      .write.mode("overwrite").partitionBy(attrCol).parquet(outRoot)

  /** One output per feature — vector_split_by_feature (core_vector_split
    * .py:19): partition by the feature id.
    */
  def splitByFeature(df: DataFrame, idCol: String, outRoot: String): Unit =
    splitByAttribute(df, idCol, outRoot)

  /** Singlepart → multipart per feature group: collect each id's parts
    * into one MULTIPOLYGON row — the inverse of multipartToSingle and
    * the "promote to multi" arm of vector_change_multitype (reference:
    * buteo/core_vector/conversion/multitype.py:69, multipart.py:169-).
    */
  def singleToMultipart(df: DataFrame, wktCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wktCol).cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroups { (fid: Long, it: Iterator[(Long, String)]) =>
        val parts = it.map(_._2).toSeq.sorted.flatMap(Wkt.parsePolygons(_))
        val wkt = parts.map { p =>
          p.rings.map { r =>
            val pts = (0 until r.length by 2).map(i => s"${r(i)} ${r(i + 1)}")
            val closed = if (pts.head == pts.last) pts else pts :+ pts.head
            closed.mkString("(", ", ", ")")
          }.mkString("(", ", ", ")")
        }.mkString("MULTIPOLYGON(", ", ", ")")
        (fid, parts.length.toLong, wkt)
      }
      .toDF("fid", "n_parts", "multi_wkt")
  }

  // ---- attribute-table ops (reference: core_vector_attributes.py) ----

  /** OGR field-type keyword → Spark type — the reference's keyword table
    * (core_vector_attributes.py:181-199: int/integer→OFTInteger,
    * float/double→OFTReal, string→OFTString, date/datetime/time→
    * OFTDateTime, binary→OFTBinary, *list→OFT*List).
    */
  private def fieldType(t: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    t match {
      case "int" | "integer"        => IntegerType
      case "float" | "double"       => DoubleType
      case "string"                 => StringType
      case "date" | "datetime" | "time" => TimestampType
      case "binary"                 => BinaryType
      case "intlist" | "integerlist" => ArrayType(IntegerType)
      case "floatlist" | "doublelist" => ArrayType(DoubleType)
      case "stringlist"             => ArrayType(StringType)
      case other => throw new IllegalArgumentException(s"Invalid field_type: $other")
    }
  }

  /** Add a (null-valued) field of the given OGR type keyword —
    * reference: vector_add_field (core_vector_attributes.py:154-223).
    */
  def addField(df: DataFrame, name: String, fieldTypeName: String): DataFrame =
    df.withColumn(name, lit(null).cast(fieldType(fieldTypeName)))

  /** Delete fields — reference: vector_delete_fields
    * (core_vector_attributes.py:318-380). OGR raises on unknown fields;
    * mirrored here instead of Spark drop's silent ignore.
    */
  def deleteFields(df: DataFrame, fields: Seq[String]): DataFrame = {
    val missing = fields.filterNot(df.columns.contains)
    require(missing.isEmpty, s"fields not in layer: ${missing.mkString(", ")}")
    df.drop(fields: _*)
  }

  /** Update attributes from a small in-memory table matched on `matchCol`
    * — reference: vector_set_attribute_table
    * (core_vector_attributes.py:226-316). Reference semantics kept:
    * missing header fields are created as STRING; the match column and
    * `fid` are never overwritten; features absent from the table keep
    * their values. Scale shape: the attribute table is the SMALL side —
    * broadcast left join against the feature table, coalesce per field;
    * the 10^12-row feature side is never shuffled.
    */
  def setAttributeTable(df: DataFrame, header: Seq[String],
                        rows: Seq[Seq[Any]],
                        matchCol: String = "fid"): DataFrame = {
    require(rows.forall(_.length == header.length),
      "header and attribute_table must have the same number of columns")
    require(header.contains(matchCol), "match must be in header")
    val spark = df.sparkSession
    val updCols = header.filterNot(h => h == matchCol || h == "fid")
    val upd = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql.Row(
        r.map(v => if (v == null) null else v.toString): _*)), 1),
      org.apache.spark.sql.types.StructType(header.map(h =>
        org.apache.spark.sql.types.StructField(s"__u_$h",
          org.apache.spark.sql.types.StringType))))
    val joined = df.join(broadcast(upd),
      col(matchCol).cast("string") === col(s"__u_$matchCol"), "left")
    val updated = updCols.foldLeft(joined) { (acc, h) =>
      if (df.columns.contains(h))
        // try_cast: a value that fails coercion leaves the old attribute
        // in place (OGR's update_feature swallows the TypeError —
        // core_vector_attributes.py:291-293); ANSI cast would abort the job
        acc.withColumn(h, coalesce(
          col(s"__u_$h").try_cast(df.schema(h).dataType), col(h)))
      else acc.withColumn(h, col(s"__u_$h")) // created as STRING, like OGR
    }
    updated.drop(header.map(h => s"__u_$h"): _*)
  }

  /** Shape characteristics per feature — area, perimeter, isoperimetric
    * quotient, convex-hull area/perimeter/ratio, compactness, centroid —
    * the reference's vector_add_shapes_in_place
    * (buteo/core_vector/core_vector_characteristics.py:152-275, GDAL
    * semantics: GetArea / Boundary().Length() / Centroid() / ConvexHull();
    * ipq = 4πA/P², hull_ratio = A/A_hull, compactness = √(hull_ratio·ipq)).
    *
    * Map-only per-row geometry (no shuffle); joins back nothing. Shell
    * CCW / holes CW orientation is taken as given (run fixGeometry first
    * on untrusted input).
    */
  def addShapes(df: DataFrame, idCol: String, wktCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wktCol).cast("string"))
      .as[(Long, String)]
      .map { case (fid, wkt) =>
        val poly = Wkt.parsePolygon(wkt)
        // signed shoelace over all rings: shell CCW positive, holes CW
        // negative — area and centroid fall out of one pass
        var a2 = 0.0  // 2·signed area
        var cx6 = 0.0 // 6A·Cx
        var cy6 = 0.0 // 6A·Cy
        var perimeter = 0.0
        poly.rings.foreach { r =>
          val n = r.length / 2
          var i = 0
          while (i < n) {
            val j = if (i == n - 1) 0 else i + 1
            val cross = r(2 * i) * r(2 * j + 1) - r(2 * j) * r(2 * i + 1)
            a2 += cross
            cx6 += (r(2 * i) + r(2 * j)) * cross
            cy6 += (r(2 * i + 1) + r(2 * j + 1)) * cross
            i += 1
          }
          perimeter += graft.geo.Hull.ringLength(r)
        }
        val area = a2 / 2.0
        val hull = graft.geo.Hull.convexHull(poly.rings.flatten.toArray)
        val hullArea = math.abs(graft.geo.PIP.signedArea(hull))
        val hullPeri = graft.geo.Hull.ringLength(hull)
        val ipq = if (perimeter != 0.0) 4.0 * math.Pi * area / (perimeter * perimeter) else 0.0
        val hullRatio = area / hullArea
        val compactness = math.sqrt(hullRatio * ipq)
        (fid, area, perimeter, ipq, hullArea, hullPeri, hullRatio, compactness,
          cx6 / (3.0 * a2), cy6 / (3.0 * a2))
      }
      .toDF("fid", "area", "perimeter", "ipq", "hull_area", "hull_peri",
        "hull_ratio", "compactness", "centroid_x", "centroid_y")
  }

  /** Multipart → singlepart: explode MULTIPOLYGON into per-part rows
    * (reference: buteo/core_vector/conversion/multipart.py:58-166).
    */
  def multipartToSingle(df: DataFrame, wktCol: String, idCol: String): DataFrame = {
    val parts = udf { (wkt: String) => Wkt.parsePolygons(wkt).map(Wkt.toWkt) }
    df.withColumn("part_wkt", explode(parts(col(wktCol))))
      .withColumn("part_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy("part_wkt")) - 1)
  }

  /** vector_to_extent (reference: core_vector_extent.py:19-85): the
    * layer's extent as ONE polygon feature. A single map-side-combined
    * min/max aggregate over per-feature bboxes — at 10^12 features this
    * is a column scan, never a geometry collect.
    */
  def toExtent(df: DataFrame, wktCol: String): DataFrame = {
    val bx = udf { (wkt: String) =>
      val ps = Wkt.parsePolygons(wkt)
      require(ps.nonEmpty, s"no polygon geometry in WKT '${wkt.take(64)}'")
      val b = ps.map(_.bbox)
        .reduce((a, c) => BBox(math.min(a.xMin, c.xMin), math.max(a.xMax, c.xMax),
          math.min(a.yMin, c.yMin), math.max(a.yMax, c.yMax)))
      (b.xMin, b.xMax, b.yMin, b.yMax)
    }
    df.select(bx(col(wktCol)).as("b"))
      .agg(min("b._1").as("x_min"), max("b._2").as("x_max"),
        min("b._3").as("y_min"), max("b._4").as("y_max"))
      .withColumn("area",
        (col("x_max") - col("x_min")) * (col("y_max") - col("y_min")))
  }

  /** vector_reset_fids (reference: core_vector_fids.py:19-120): renumber
    * features 0,1,2,... in a deterministic order, and
    * vector_create_attribute_from_fid (:121-281): keep the assigned fid
    * as a regular attribute. One global row_number — acceptable because
    * fid assignment is inherently a total order; at scale prefer
    * zipWithIndex-style per-partition offsets (the reference itself is
    * single-node OGR, the order is its iteration order).
    */
  def resetFids(df: DataFrame, orderCol: String): DataFrame =
    df.withColumn("fid",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col(orderCol))) - 1)
      .withColumn("fid_attr", col("fid"))

  /** vector_convert_geometry multitype flag (reference:
    * core_vector/conversion/combined.py:30-170): promote every geometry
    * to its multi-type (POLYGON → single-member MULTIPOLYGON) or demote
    * single-member multis back (the reference's multitype=False). Parts
    * and attributes are untouched — this is the type-lattice move only.
    */
  def convertGeometryMultitype(df: DataFrame, wktCol: String,
                               multitype: Boolean): DataFrame = {
    val conv = udf { (wkt: String) =>
      val ps = Wkt.parsePolygons(wkt)
      if (multitype) {
        val bodies = ps.map(p => Wkt.toWkt(p).stripPrefix("POLYGON "))
        bodies.mkString("MULTIPOLYGON (", ", ", ")")
      } else if (ps.length == 1) Wkt.toWkt(ps(0))
      else wkt // multi-member stays multi under multitype=false
    }
    df.withColumn("conv_wkt", conv(col(wktCol)))
      .withColumn("geom_type",
        when(col("conv_wkt").startsWith("MULTIPOLYGON"), "MULTIPOLYGON")
          .otherwise("POLYGON"))
  }

  /** Douglas–Peucker simplification per feature — LINESTRING and
    * POLYGON (holes included). Rings use [[graft.geo.Simplify.ring]]'s
    * two-anchor arc split; a ring collapsing below 3 vertices is
    * dropped (a collapsed SHELL drops the feature, like fixGeometry's
    * degenerate rows). Returns (fid, n_in, n_out, wkt) with vertex
    * counts over all rings (closing duplicates not counted).
    *
    * Scale shape: a pure per-row function over a typed Dataset — no
    * shuffle, no state; geometry size bounds per-task memory, feature
    * count bounds nothing (map-only at 10^12 rows).
    */
  def simplify(df: DataFrame, idCol: String, wktCol: String,
               eps: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wktCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (fid, wkt) =>
        val u = wkt.trim.toUpperCase
        if (u.startsWith("LINESTRING")) {
          val i = wkt.indexOf('('); val j = wkt.lastIndexOf(')')
          val pts = wkt.substring(i + 1, j).split(",").map(_.trim)
            .filter(_.nonEmpty).flatMap { p =>
              val xy = p.split("\\s+"); Array(xy(0).toDouble, xy(1).toDouble)
            }
          val out = graft.geo.Simplify.polyline(pts, eps)
          val line = out.grouped(2).map(a => s"${a(0)} ${a(1)}")
            .mkString("LINESTRING (", ", ", ")")
          Some((fid, pts.length / 2, out.length / 2, line))
        } else {
          val poly = Wkt.parsePolygon(wkt)
          val opened = poly.rings.map { r =>
            if (r.length >= 4 && r(0) == r(r.length - 2) && r(1) == r(r.length - 1))
              r.dropRight(2)
            else r
          }
          val nIn = opened.map(_.length / 2).sum
          val simplified = opened.map(graft.geo.Simplify.ring(_, eps))
          if (simplified(0).isEmpty) None // shell collapsed
          else {
            val rings = simplified.filter(_.nonEmpty)
            val nOut = rings.map(_.length / 2).sum
            Some((fid, nIn, nOut, Wkt.toWkt(Polygon(rings))))
          }
        }
      }.toDF("fid", "n_in", "n_out", "wkt")
  }
}
