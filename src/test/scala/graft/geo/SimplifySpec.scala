package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Douglas–Peucker vs an independent recursive reference (sqrt-based
  * distances, structural recursion) on seeded random polylines, plus
  * pinned hand cases for rings, collapses, ties, and eps = 0.
  */
class SimplifySpec extends AnyFunSuite {

  private def refDp(pts: Vector[(Double, Double)], eps: Double): Vector[(Double, Double)] = {
    if (pts.length <= 2) pts
    else {
      val a = pts.head; val b = pts.last
      def dist(p: (Double, Double)): Double = {
        val vx = b._1 - a._1; val vy = b._2 - a._2
        val l = math.hypot(vx, vy)
        if (l == 0) math.hypot(p._1 - a._1, p._2 - a._2)
        else math.abs(vx * (p._2 - a._2) - vy * (p._1 - a._1)) / l
      }
      val interior = pts.zipWithIndex.slice(1, pts.length - 1)
      val (dm, im) = interior.map { case (p, i) => (dist(p), i) }
        .maxBy(_._1) // first index on ties (maxBy keeps the first max)
      if (dm > eps)
        refDp(pts.take(im + 1), eps) ++ refDp(pts.drop(im), eps).tail
      else Vector(a, b)
    }
  }

  private def flat(pts: Seq[(Double, Double)]): Array[Double] =
    pts.flatMap { case (x, y) => Seq(x, y) }.toArray
  private def pairs(a: Array[Double]): Vector[(Double, Double)] =
    a.grouped(2).map(g => (g(0), g(1))).toVector

  test("matches the recursive reference on 200 seeded random polylines") {
    val rnd = new scala.util.Random(42)
    for (c <- 0 until 200) {
      val n = 2 + rnd.nextInt(29)
      val pts = Vector.fill(n)((rnd.nextInt(21).toDouble, rnd.nextInt(21).toDouble))
      val eps = Seq(0.0, 0.5, 1.0, 2.5)(c % 4)
      val got = pairs(Simplify.polyline(flat(pts), eps))
      assert(got === refDp(pts, eps), s"case $c n=$n eps=$eps pts=$pts")
    }
  }

  test("eps = 0 drops exactly the collinear interior vertices") {
    val pts = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 2.0), (4.0, 2.0))
    assert(pairs(Simplify.polyline(flat(pts), 0.0)) ===
      Vector((0.0, 0.0), (2.0, 2.0), (4.0, 2.0)))
  }

  test("endpoints always survive; n <= 2 passes through") {
    assert(pairs(Simplify.polyline(flat(Seq((0.0, 0.0), (9.0, 0.0))), 5.0)) ===
      Vector((0.0, 0.0), (9.0, 0.0)))
    val spike = Seq((0.0, 0.0), (1.0, 100.0), (2.0, 0.0))
    assert(pairs(Simplify.polyline(flat(spike), 5.0)) === spike.toVector)
  }

  test("closed chord (identical endpoints) falls back to point distance") {
    // loop out and back: chord degenerate at (0,0); farthest point kept
    val loop = Seq((0.0, 0.0), (3.0, 4.0), (0.0, 0.0))
    assert(pairs(Simplify.polyline(flat(loop), 1.0)) === loop.toVector)
    assert(pairs(Simplify.polyline(flat(loop), 5.0)) ===
      Vector((0.0, 0.0), (0.0, 0.0)))
  }

  test("ring: notch beyond eps survives, notch within eps smooths away") {
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (5.0, 10.4), (0.0, 10.0))
    val smoothed = pairs(Simplify.ring(flat(square), 1.0))
    assert(smoothed === Vector((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)))
    val kept = pairs(Simplify.ring(flat(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (5.0, 13.0), (0.0, 10.0))), 1.0))
    assert(kept.length === 5)
  }

  test("ring collapse returns empty") {
    // sliver: all vertices within eps of one chord
    val sliver = Seq((0.0, 0.0), (5.0, 0.2), (10.0, 0.0), (5.0, -0.2))
    assert(Simplify.ring(flat(sliver), 1.0).isEmpty)
    assert(Simplify.ring(Array(0.0, 0.0, 1.0, 1.0), 0.5).isEmpty) // n < 3
  }

  test("dataset op: linestring + polygon with hole, shell collapse drops the row") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("simplify-spec").getOrCreate()
    import spark.implicits._
    val rows = Seq(
      (1L, "LINESTRING (0 0, 1 0.5, 2 0, 3 0.5, 4 0)"),
      (2L, "POLYGON ((0 0, 10 0, 10 10, 5 10.4, 0 10, 0 0), (2 2, 6 2, 6 6, 4 6.2, 2 6, 2 2))"),
      (3L, "POLYGON ((0 0, 5 0.2, 10 0, 5 -0.2, 0 0))")) // sliver shell: dropped
      .toDF("fid", "wkt")
    val got = graft.ops.VectorOps.simplify(rows, "fid", "wkt", 1.0)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === ((5, 2, "LINESTRING (0.0 0.0, 4.0 0.0)")))
    // shell notch smoothed to the square; the hole keeps its square but
    // loses the within-eps dent at (4, 6.2)
    val (nIn2, nOut2, wkt2) = got(2L)
    assert(nIn2 === 10 && nOut2 === 8)
    assert(wkt2.startsWith("POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0)"))
  }
}
