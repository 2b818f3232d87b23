package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Polygon, PolyUnion, RectUnion, Wkt}
import graft.ops.{VectorOps, VectorOps2}

/** vector_clip / vector_erase / vector_buffer / vector_reproject
  * (reference: buteo/vector/clip.py, buffer.py, reproject.py;
  * tests: tests/tests_vector/test_vector_buffer.py).
  */
class VectorOps2Spec extends AnyFunSuite {

  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def rectWkt(x0: Double, y0: Double, w: Double, h: Double): String =
    s"POLYGON(($x0 $y0, ${x0 + w} $y0, ${x0 + w} ${y0 + h}, $x0 ${y0 + h}, $x0 $y0))"

  private def df1(wkt: String) = {
    val s = spark
    import s.implicits._
    Seq((1L, wkt)).toDF("fid", "wkt")
  }

  test("clip: rect ∩ rect = exact sub-rect") {
    val clips = Seq((7L, Polygon.box(graft.geo.BBox(2.0, 6.0, 1.0, 5.0))))
    val r = VectorOps2.clip(df1(rectWkt(0, 0, 4, 3)), clips, "wkt", "fid").collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Double]("clip_area") == 4.0)
    assert(row.getAs[Double]("x_min") == 2.0 && row.getAs[Double]("x_max") == 4.0)
    assert(row.getAs[Double]("y_min") == 1.0 && row.getAs[Double]("y_max") == 3.0)
    assert(row.getAs[Long]("n_pts") == 4L)
  }

  test("clip: disjoint pair emits nothing; contained feature passes whole") {
    val clips = Seq((1L, Polygon.box(graft.geo.BBox(100.0, 110.0, 100.0, 110.0))),
      (2L, Polygon.box(graft.geo.BBox(-10.0, 50.0, -10.0, 50.0))))
    val r = VectorOps2.clip(df1(rectWkt(0, 0, 4, 3)), clips, "wkt", "fid").collect()
    assert(r.length == 1) // only clip 2 overlaps
    assert(r(0).getAs[Long]("clip_id") == 2L)
    assert(r(0).getAs[Double]("clip_area") == 12.0)
  }

  test("clip: triangle ∩ square (general kernel) has the exact area") {
    // right triangle (0,0)-(8,0)-(0,8) clipped by square [0,6]x[0,6]:
    // area = 36 - 4*4/2 = 28  (square minus the corner cut by x+y=8)
    val tri = "POLYGON((0 0, 8 0, 0 8, 0 0))"
    val clips = Seq((1L, Polygon.box(graft.geo.BBox(0.0, 6.0, 0.0, 6.0))))
    val r = VectorOps2.clip(df1(tri), clips, "wkt", "fid").collect()
    assert(r.length == 1)
    assert(math.abs(r(0).getAs[Double]("clip_area") - 28.0) < 1e-9)
  }

  test("erase: rect minus rect = L-shape area") {
    val clips = Seq((7L, Polygon.box(graft.geo.BBox(2.0, 6.0, 1.0, 5.0))))
    val r = VectorOps2.erase(df1(rectWkt(0, 0, 4, 3)), clips, "wkt", "fid").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("erase_area") == 8.0)
  }

  test("erase: untouched feature passes through with original area") {
    val clips = Seq((7L, Polygon.box(graft.geo.BBox(50.0, 60.0, 50.0, 60.0))))
    val r = VectorOps2.erase(df1(rectWkt(0, 0, 4, 3)), clips, "wkt", "fid").collect()
    assert(r(0).getAs[Double]("erase_area") == 12.0)
  }

  test("buffer square joins on rect = exact grown rect (buteo test_vector_buffer parity)") {
    val r = VectorOps2.buffer(df1(rectWkt(0, 0, 4, 3)), "wkt", "fid", lit(2.0),
      joinStyle = "square").collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Double]("buf_area") == 56.0) // (4+4)*(3+4)
    assert(row.getAs[Double]("x_min") == -2.0 && row.getAs[Double]("x_max") == 6.0)
    assert(row.getAs[Double]("y_min") == -2.0 && row.getAs[Double]("y_max") == 5.0)
    assert(row.getAs[Long]("n_pts") == 4L)
  }

  test("buffer round joins: area = rect + perimeter*d + inscribed-4q-gon disc") {
    val q = 8; val d = 2.0
    val r = VectorOps2.buffer(df1(rectWkt(0, 0, 4, 3)), "wkt", "fid", lit(d),
      joinStyle = "round", quadSegs = q).collect()
    val expected = 12.0 + 14.0 * d + 2 * q * d * d * math.sin(math.Pi / (2 * q))
    assert(math.abs(r(0).getAs[Double]("buf_area") - expected) < 1e-6,
      s"got ${r(0).getAs[Double]("buf_area")} want $expected")
    // corners carry arc vertices: strictly more than the 4 rect corners
    assert(r(0).getAs[Long]("n_pts") > 4L)
  }

  test("buffer mitre joins: exact closed form on square and diamond") {
    // axis-aligned rect, mitre ≡ square joins: (w+2d)(h+2d)
    val r = VectorOps2.buffer(df1(rectWkt(0, 0, 4, 3)), "wkt", "fid", lit(2.0),
      joinStyle = "mitre").collect()
    assert(math.abs(r(0).getAs[Double]("buf_area") - 56.0) < 1e-9)
    // diamond (45°-rotated square, r=3, side 3√2): mitre buffer area =
    // A + P·d + 4·d²·tan(45°) = 18 + 12√2·d + 4d²
    val diamond = "POLYGON((3 0, 6 3, 3 6, 0 3, 3 0))"
    val d = 1.0
    val rd = VectorOps2.buffer(df1(diamond), "wkt", "fid", lit(d),
      joinStyle = "mitre").collect()
    val expected = 18.0 + 12.0 * math.sqrt(2.0) * d + 4.0 * d * d
    assert(math.abs(rd(0).getAs[Double]("buf_area") - expected) < 1e-9,
      s"got ${rd(0).getAs[Double]("buf_area")} want $expected")
    // mitre offset of a convex polygon keeps the vertex count: the
    // corner path a→mitre→b is collinear with the adjacent offset edges,
    // so only the 4 mitre points survive the trace
    assert(rd(0).getAs[Long]("n_pts") == 4L)
  }

  test("buffer mitre joins: reflex corner on NON-rectilinear input, exact closed form") {
    // VERDICT r4 #7: chevron (0,0),(6,0),(6,6),(3,3),(0,6) — a 90° reflex
    // notch at (3,3) whose edges run at 45° (non-rectilinear, so neither
    // the RectUnion fast path nor square-join equivalence applies). The
    // mitre-offset area closed form: A' = A + P·d + d²·Σ tan(θ_i/2) over
    // signed exterior turning angles — here 2×90° convex (tan 45° = 1),
    // 2×135° convex (tan 67.5° = 1+√2), one −90° reflex (tan −45° = −1):
    // Σ = 3 + 2√2. All mitre lengths ≤ √2·d ≤ limit.
    val chevron = "POLYGON((0 0, 6 0, 6 6, 3 3, 0 6, 0 0))"
    val d = 0.5
    val a = 27.0
    val p = 18.0 + 6.0 * math.sqrt(2.0)
    val expected = a + p * d + d * d * (3.0 + 2.0 * math.sqrt(2.0))
    val r = VectorOps2.buffer(df1(chevron), "wkt", "fid", lit(d),
      joinStyle = "mitre").collect()
    assert(math.abs(r(0).getAs[Double]("buf_area") - expected) < 1e-9,
      s"got ${r(0).getAs[Double]("buf_area")} want $expected")
    // the mitre offset of a simple polygon keeps the vertex count: convex
    // corners trace a→mitre→b collinearly, the reflex corner is the bare
    // offset-line intersection
    assert(r(0).getAs[Long]("n_pts") == 5L)
  }

  test("buffer mitre joins: deep double-reflex (W-notch), exact closed form") {
    // two reflex corners, edges at mixed angles: (0,0),(8,0),(8,4),(6,2),
    // (4,4),(2,2),(0,4). Exterior turns: (0,0)+90°, (8,0)+90°, (8,4)+135°,
    // (6,2) −90° reflex, (4,4)+135°, (2,2) −90° reflex, (0,4)+90°
    // (Σ = 360° ✓); Σ tan(θ/2) = 3·1 + 2·(1+√2) − 2·1 = 3 + 2√2.
    val w = "POLYGON((0 0, 8 0, 8 4, 6 2, 4 4, 2 2, 0 4, 0 0))"
    val d = 0.25 // small enough that the two notch offsets stay disjoint
    val a = 24.0 // shoelace
    val p = 8.0 + 4.0 + 8.0 * math.sqrt(2.0) + 4.0
    val expected = a + p * d + d * d * (3.0 + 2.0 * math.sqrt(2.0))
    val r = VectorOps2.buffer(df1(w), "wkt", "fid", lit(d),
      joinStyle = "mitre").collect()
    assert(math.abs(r(0).getAs[Double]("buf_area") - expected) < 1e-9,
      s"got ${r(0).getAs[Double]("buf_area")} want $expected")
  }

  test("buffer negative distance erodes") {
    val r = VectorOps2.buffer(df1(rectWkt(0, 0, 4, 3)), "wkt", "fid", lit(-1.0),
      joinStyle = "square").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("buf_area") == 2.0) // (4-2)*(3-2)
    assert(r(0).getAs[Double]("x_min") == 1.0 && r(0).getAs[Double]("x_max") == 3.0)
  }

  test("buffer negative distance that consumes the polygon drops the row") {
    val r = VectorOps2.buffer(df1(rectWkt(0, 0, 4, 3)), "wkt", "fid", lit(-2.0),
      joinStyle = "square").collect()
    assert(r.isEmpty)
  }

  test("buffer distance from attribute column") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, rectWkt(0, 0, 4, 3), 1.0), (2L, rectWkt(10, 10, 2, 2), 3.0))
      .toDF("fid", "wkt", "d")
    val r = VectorOps2.buffer(df, "wkt", "fid", col("d"), joinStyle = "square")
      .orderBy("fid").collect()
    assert(r(0).getAs[Double]("buf_area") == 30.0) // 6*5
    assert(r(1).getAs[Double]("buf_area") == 64.0) // 8*8
  }

  test("buffer of POINT and LINESTRING (reference test_vector_buffer.py:66,116)") {
    // point, square cap d=2 → 4x4 square, area 16
    val pt = VectorOps2.buffer(df1("POINT(3 5)"), "wkt", "fid", lit(2.0),
      joinStyle = "square").collect()
    assert(pt(0).getAs[Double]("buf_area") == 16.0)
    assert(pt(0).getAs[Double]("x_min") == 1.0 && pt(0).getAs[Double]("y_max") == 7.0)
    // point, round cap q=8 → inscribed 32-gon area = 2q d² sin(π/2q)
    val ptr = VectorOps2.buffer(df1("POINT(0 0)"), "wkt", "fid", lit(3.0),
      joinStyle = "round", quadSegs = 8).collect()
    val circle = 2 * 8 * 9.0 * math.sin(math.Pi / 16)
    assert(math.abs(ptr(0).getAs[Double]("buf_area") - circle) < 1e-9)
    // straight segment (0,0)-(6,0), square caps d=1: 2dL + 4d² = 12 + 4
    val ln = VectorOps2.buffer(df1("LINESTRING(0 0, 6 0)"), "wkt", "fid", lit(1.0),
      joinStyle = "square").collect()
    assert(ln(0).getAs[Double]("buf_area") == 16.0)
    // L-shaped polyline (0,0)-(4,0)-(4,3), square caps d=1:
    // union area via inclusion-exclusion = strips (8 + 6) + end caps add
    // 2 + 2, corner cap adds 1x2=2 beyond the strips minus... verify by
    // independent pixel sampling instead
    val l2 = VectorOps2.buffer(df1("LINESTRING(0 0, 4 0, 4 3)"), "wkt", "fid",
      lit(1.0), joinStyle = "square").collect()
    val area = l2(0).getAs[Double]("buf_area")
    var covered = 0
    val step = 0.05
    var y = -2.0 + step / 2
    while (y < 5.0) {
      var x = -2.0 + step / 2
      while (x < 6.0) {
        val onSeg1 = x >= -1 && x <= 5 && y >= -1 && y <= 1
        val onSeg2 = x >= 3 && x <= 5 && y >= -1 && y <= 4
        if (onSeg1 || onSeg2) covered += 1
        x += step
      }
      y += step
    }
    assert(math.abs(area - covered * step * step) < 0.2, s"area $area")
    // negative distance on a line drops the row (dim rule)
    assert(VectorOps2.buffer(df1("LINESTRING(0 0, 6 0)"), "wkt", "fid",
      lit(-1.0), joinStyle = "square").collect().isEmpty)
  }

  test("buffer of polygon with hole: hole shrinks by d") {
    // shell [0,10]^2 with hole [4,6]^2; buffer d=1 square joins:
    // shell grows to 12x12, hole erodes to nothing? hole 2x2 shrinks by 1
    // on each side -> gone. area = 144.
    val wkt = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    val r = VectorOps2.buffer(df1(wkt), "wkt", "fid", lit(1.0),
      joinStyle = "square").collect()
    assert(r(0).getAs[Double]("buf_area") == 144.0)
    // d=0.5: hole survives as 1x1 -> area 121 - 1 = 120
    val r2 = VectorOps2.buffer(df1(wkt), "wkt", "fid", lit(0.5),
      joinStyle = "square").collect()
    assert(r2(0).getAs[Double]("buf_area") == 120.0)
    assert(r2(0).getAs[Long]("n_rings") == 2L)
  }

  test("reprojectLayer 4326→3857: x is linear in lon; roundtrip ≈ identity") {
    val r = VectorOps2.reprojectLayer(df1(rectWkt(10, 40, 2, 3)), "wkt", "fid",
      4326, 3857).collect()
    val k = 20037508.342789244 / 180.0
    assert(math.abs(r(0).getAs[Double]("x_min") - 10.0 * k) < 1e-6)
    assert(math.abs(r(0).getAs[Double]("x_max") - 12.0 * k) < 1e-6)
    val back = VectorOps2.reprojectLayer(
      VectorOps2.reprojectLayer(df1(rectWkt(10, 40, 2, 3)), "wkt", "fid", 4326, 3857)
        .withColumnRenamed("wkt", "w2"), "w2", "fid", 3857, 4326).collect()
    assert(math.abs(back(0).getAs[Double]("x_min") - 10.0) < 1e-9)
    assert(math.abs(back(0).getAs[Double]("y_max") - 43.0) < 1e-9)
  }

  test("singleToMultipart inverts multipartToSingle") {
    val s = spark
    import s.implicits._
    val multi = Seq((1L,
      "MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 0, 6 0, 6 1, 5 1, 5 0)))"))
      .toDF("fid", "wkt")
    val single = graft.ops.VectorOps.multipartToSingle(multi, "wkt", "fid")
    assert(single.count() == 2)
    val back = graft.ops.VectorOps.singleToMultipart(single, "part_wkt", "fid").collect()
    assert(back.length == 1 && back(0).getAs[Long]("n_parts") == 2L)
    val w = back(0).getAs[String]("multi_wkt")
    assert(w.startsWith("MULTIPOLYGON(") && w.contains("5.0 0.0"))
    // rings closed exactly once
    assert(!w.contains("0.0 0.0, 0.0 0.0"))
  }

  test("hexGrid: row per hexagon, centers inside extent, hex area tiles") {
    val g = graft.ops.VectorOps2.hexGrid(spark, 0.0, 30.0, 0.0, 20.0, 2.0).collect()
    assert(g.length == 66) // 11 columns x 6 rows
    g.foreach { r =>
      val cx = r.getAs[Double]("cx"); val cy = r.getAs[Double]("cy")
      assert(cx >= 0 && cx <= 30 && cy >= 0 && cy <= 20)
      val p = Wkt.parsePolygon(r.getAs[String]("wkt"))
      // regular flat-top hexagon area = (3√3/2)·size²
      assert(math.abs(Wkt.area(p) - 1.5 * math.sqrt(3.0) * 4.0) < 1e-9)
      assert(p.contains(cx, cy))
    }
  }

  test("DE-9IM predicates: contains/within/touches/overlaps/crosses") {
    import graft.ops.VectorOps2.predicateHolds
    val big = Polygon.box(graft.geo.BBox(0.0, 10.0, 0.0, 10.0))
    val small = Polygon.box(graft.geo.BBox(2.0, 4.0, 2.0, 4.0))
    val edgeTouch = Polygon.box(graft.geo.BBox(10.0, 14.0, 0.0, 4.0))
    val cornerTouch = Polygon.box(graft.geo.BBox(10.0, 12.0, 10.0, 12.0))
    val partial = Polygon.box(graft.geo.BBox(8.0, 14.0, 8.0, 14.0))
    assert(predicateHolds("contains", big, small))
    assert(!predicateHolds("contains", small, big))
    assert(predicateHolds("within", small, big))
    assert(predicateHolds("touches", big, edgeTouch))
    assert(predicateHolds("touches", big, cornerTouch))
    assert(!predicateHolds("touches", big, partial)) // interiors intersect
    assert(predicateHolds("overlaps", big, partial))
    assert(!predicateHolds("overlaps", big, small)) // containment, not overlap
    assert(!predicateHolds("crosses", big, partial)) // area/area never cross
    // hole-aware: donut does NOT contain a rect inside its hole
    val donut = Polygon(Array(
      Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0),
      Array(3.0, 3.0, 3.0, 7.0, 7.0, 7.0, 7.0, 3.0)))
    val inHole = Polygon.box(graft.geo.BBox(4.0, 6.0, 4.0, 6.0))
    assert(!predicateHolds("contains", donut, inHole))
    assert(predicateHolds("touches", donut, inHole) ==
      false) // fully inside the hole, no boundary contact either
    // rect spanning ring AND hole: overlaps, not contained
    val spanning = Polygon.box(graft.geo.BBox(1.0, 5.0, 4.0, 6.0))
    assert(predicateHolds("overlaps", donut, spanning))
    assert(!predicateHolds("contains", donut, spanning))
  }

  test("PolyUnion.overlay intersection of two overlapping squares (general)") {
    // rotated-ish: use a diamond ∩ square
    val diamond = Polygon(Array(Array(2.0, 0.0, 4.0, 2.0, 2.0, 4.0, 0.0, 2.0)))
    val square = Polygon.box(graft.geo.BBox(0.0, 2.0, 0.0, 2.0))
    val u = PolyUnion.overlay(Seq(diamond), Seq(square), _ && _)
    // intersection = triangle (2,0)-(2,2)-(0,2) .. area 2
    assert(math.abs(u.area - 2.0) < 1e-9)
    val ur = RectUnion.overlay(Seq(Polygon.box(graft.geo.BBox(0.0, 4.0, 0.0, 4.0))),
      Seq(Polygon.box(graft.geo.BBox(2.0, 6.0, 2.0, 6.0))), _ && _)
    assert(ur.area == 4.0)
  }

  test("attribute-table ops: add/set/delete field semantics from the reference") {
    import graft.ops.VectorOps
    val s = spark
    import s.implicits._
    val df = Seq((0L, "a", 1), (1L, "b", 2), (2L, "c", 3)).toDF("fid", "klass", "n")

    // add_field: null column of the mapped OGR type
    val added = VectorOps.addField(df, "score", "double")
    assert(added.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(added.select("score").collect().forall(_.isNullAt(0)))
    intercept[IllegalArgumentException](VectorOps.addField(df, "x", "bogus"))

    // set_attribute_table: match on fid; match/fid columns never updated;
    // unmatched features keep their values; bad numeric strings fall back
    val set = VectorOps.setAttributeTable(added,
      Seq("fid", "klass", "n", "note"),
      Seq(Seq[Any](0L, "Z", "9", "hello"), Seq[Any](1L, "Y", "oops", null)))
    val rows = set.orderBy("fid").collect()
    assert(rows(0).getAs[String]("klass") == "Z" && rows(0).getAs[Int]("n") == 9)
    assert(rows(0).getAs[String]("note") == "hello")
    assert(rows(1).getAs[String]("klass") == "Y")
    assert(rows(1).getAs[Int]("n") == 2) // "oops" fails the int cast → kept
    assert(rows(2).getAs[String]("klass") == "c" && rows(2).getAs[Int]("n") == 3)
    intercept[IllegalArgumentException](
      VectorOps.setAttributeTable(df, Seq("klass"), Seq(Seq[Any]("x"))))

    // delete_fields: drops, and errors on unknown fields like OGR
    assert(VectorOps.deleteFields(df, Seq("n")).columns.toSeq == Seq("fid", "klass"))
    intercept[IllegalArgumentException](VectorOps.deleteFields(df, Seq("nope")))
  }

  test("addShapes: unit square and 2x1 rect closed forms (reference formulas)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, rectWkt(0, 0, 1, 1)), (2L, rectWkt(3, 4, 2, 1)))
      .toDF("fid", "wkt")
    val rows = VectorOps.addShapes(df, "fid", "wkt").orderBy("fid").collect()
    val sq = rows(0)
    assert(sq.getDouble(1) == 1.0)                      // area
    assert(sq.getDouble(2) == 4.0)                      // perimeter
    assert(sq.getDouble(3) == math.Pi / 4.0)            // ipq = 4πA/P² = π/4
    assert(sq.getDouble(4) == 1.0)                      // hull_area (convex)
    assert(sq.getDouble(5) == 4.0)                      // hull_peri
    assert(sq.getDouble(6) == 1.0)                      // hull_ratio
    assert(sq.getDouble(7) == math.sqrt(math.Pi / 4.0)) // compactness
    assert(sq.getDouble(8) == 0.5 && sq.getDouble(9) == 0.5)
    val r = rows(1)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 6.0)
    assert(r.getDouble(3) == 8.0 * math.Pi / 36.0)
    assert(r.getDouble(8) == 4.0 && r.getDouble(9) == 4.5)
  }

  test("addShapes: L-shape hand case — non-convex hull, decomposed centroid") {
    // 4x3 rect at origin minus 2x1 top-right notch:
    // CCW (0,0)(4,0)(4,2)(2,2)(2,3)(0,3)
    val wkt = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 3, 0 3, 0 0))"
    val row = VectorOps.addShapes(df1(wkt), "fid", "wkt").collect()(0)
    assert(row.getDouble(1) == 10.0)                    // 12 - 2
    assert(row.getDouble(2) == 14.0)                    // 2(4+3)
    assert(row.getDouble(4) == 11.0)                    // 12 - 2*1/2
    assert(row.getDouble(5) == 4.0 + 2.0 + math.sqrt(5.0) + 2.0 + 3.0) // ring order
    assert(row.getDouble(6) == 10.0 / 11.0)
    // centroid: (12*(2,1.5) - 2*(3,2.5)) / 10
    assert(row.getDouble(8) == (12.0 * 2.0 - 2.0 * 3.0) / 10.0)
    assert(row.getDouble(9) == (12.0 * 1.5 - 2.0 * 2.5) / 10.0)
  }

  test("addShapes: hole subtracts from area/centroid, adds to perimeter (GDAL boundary)") {
    // 4x4 shell CCW with 1x1 hole CW at (1,1)
    val wkt = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"
    val row = VectorOps.addShapes(df1(wkt), "fid", "wkt").collect()(0)
    assert(row.getDouble(1) == 15.0)
    assert(row.getDouble(2) == 20.0)  // 16 + 4: Boundary().Length() sums rings
    assert(row.getDouble(4) == 16.0)  // hull ignores the hole
    // centroid: (16*(2,2) - 1*(1.5,1.5)) / 15
    assert(row.getDouble(8) == (16.0 * 2.0 - 1.5) / 15.0)
    assert(row.getDouble(9) == (16.0 * 2.0 - 1.5) / 15.0)
  }
}
