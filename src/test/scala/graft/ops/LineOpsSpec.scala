package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LineOps on irregular (non-Pythagorean) lines vs a driver-side fold —
  * the gate queries pin the exact-arithmetic fixture; this spec covers
  * the general path: WKT parsing, densify's spacing contract, and
  * interpolation against a sequential reference within FP tolerance.
  */
class LineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture = {
    val wkts = Seq(
      (0L, "LINESTRING (0 0, 1 1, 3 0, 7 2, 7 -3)"),
      (1L, "LINESTRING (-2 5, 4 5, 4 9)"),
      (2L, "LINESTRING (10 10, 11 13)"))
    spark.createDataFrame(wkts).toDF("fid", "wkt")
  }

  private def pts(fid: Long): Array[(Double, Double)] =
    LineOps.linePoints(fixture, "fid", "wkt").collect()
      .filter(_.getLong(0) == fid).sortBy(_.getInt(1))
      .map(r => (r.getDouble(2), r.getDouble(3)))

  test("linePoints parses vertices in order") {
    assert(pts(1L).toSeq === Seq((-2.0, 5.0), (4.0, 5.0), (4.0, 9.0)))
  }

  test("densify: piece lengths never exceed maxLen, endpoints preserved") {
    val p = LineOps.linePoints(fixture, "fid", "wkt")
    val dn = LineOps.densify(p, maxLen = 0.9).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2, t._3))
    for (fid <- Seq(0L, 1L, 2L)) {
      val line = dn.filter(_._1 == fid).map(t => (t._4, t._5))
      val orig = pts(fid)
      assert(line.head === orig.head); assert(line.last === orig.last)
      line.sliding(2).foreach { case Array((x0, y0), (x1, y1)) =>
        val d = math.hypot(x1 - x0, y1 - y0)
        assert(d <= 0.9 + 1e-12, s"fid=$fid piece $d")
      }
      // original vertices all survive
      orig.foreach(v => assert(line.contains(v), s"fid=$fid lost vertex $v"))
    }
  }

  test("interpolate matches a sequential walk on irregular lengths") {
    val p = LineOps.linePoints(fixture, "fid", "wkt")
    val got = LineOps.interpolate(p, Seq(0.3, 0.62)).collect()
      .map(r => (r.getLong(0), r.getDouble(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    for (fid <- Seq(0L, 1L, 2L); f <- Seq(0.3, 0.62)) {
      val vs = pts(fid)
      val lens = vs.sliding(2).map { case Array(a, b) =>
        math.sqrt((b._1 - a._1) * (b._1 - a._1) + (b._2 - a._2) * (b._2 - a._2))
      }.toArray
      val total = lens.sum
      var target = f * total; var i = 0
      while (i < lens.length - 1 && target >= lens(i)) { target -= lens(i); i += 1 }
      val t = target / lens(i)
      val want = (vs(i)._1 + t * (vs(i + 1)._1 - vs(i)._1),
        vs(i)._2 + t * (vs(i + 1)._2 - vs(i)._2))
      val (gx, gy) = got((fid, f))
      assert(math.abs(gx - want._1) < 1e-9 && math.abs(gy - want._2) < 1e-9,
        s"fid=$fid f=$f got ($gx,$gy) want $want")
    }
  }

  test("chaikin: one round matches the closed form; endpoints fixed") {
    val p = LineOps.linePoints(fixture, "fid", "wkt")
    val got = LineOps.chaikin(p, iters = 1).collect()
      .filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
      .map(r => (r.getDouble(2), r.getDouble(3)))
    // line 1: (-2,5) (4,5) (4,9) → endpoints + 2 cuts per segment
    val want = Array((-2.0, 5.0),
      (0.75 * -2 + 0.25 * 4, 5.0), (0.25 * -2 + 0.75 * 4, 5.0),
      (4.0, 0.75 * 5 + 0.25 * 9), (4.0, 0.25 * 5 + 0.75 * 9),
      (4.0, 9.0))
    assert(got.toSeq === want.toSeq)
    // vertex count law: n -> 2(n-1) interior cuts + 2 endpoints
    val all = LineOps.chaikin(p, iters = 1).groupBy("fid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all(0L) === 2L * 4 + 2) // 5 vertices → 10
    assert(all(2L) === 4L)         // 2 vertices → 4? one segment: P0,Q,R,P1
    // smoothing reduces total turning: iterated rounds converge toward
    // a smooth curve — check max corner angle drops
    val got2 = LineOps.chaikin(p, iters = 3).collect()
      .filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
      .map(r => (r.getDouble(2), r.getDouble(3)))
    def maxTurn(vs: Array[(Double, Double)]): Double =
      (1 until vs.length - 1).map { i =>
        val a = math.atan2(vs(i)._2 - vs(i - 1)._2, vs(i)._1 - vs(i - 1)._1)
        val b = math.atan2(vs(i + 1)._2 - vs(i)._2, vs(i + 1)._1 - vs(i)._1)
        math.abs(math.atan2(math.sin(b - a), math.cos(b - a)))
      }.max
    assert(maxTurn(got2) < maxTurn(pts(0L)))
  }

  test("segment metrics: cardinal and diagonal azimuths") {
    val p = LineOps.linePoints(fixture, "fid", "wkt")
    val m = LineOps.segmentMetrics(p).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(m((1L, 0)) === ((6.0, 90.0)))  // due east
    assert(m((1L, 1)) === ((4.0, 0.0)))   // due north
    val (len, az) = m((0L, 0))            // (0,0)->(1,1): NE diagonal
    assert(math.abs(len - math.sqrt(2.0)) < 1e-12 && az === 45.0)
    assert(m((0L, 3))._2 === 180.0)       // (7,2)->(7,-3): due south
  }
}
