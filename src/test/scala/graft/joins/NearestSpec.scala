package graft.joins

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NearestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def refNearest(pts: Seq[(Long, Double, Double)],
                         rects: Seq[(Long, Double, Double, Double, Double)]): Map[Long, (Long, Double)] =
    pts.map { case (id, lon, lat) =>
      val best = rects.map { case (rid, x0, x1, y0, y1) =>
        val dx = math.max(math.max(x0 - lon, lon - x1), 0.0)
        val dy = math.max(math.max(y0 - lat, lat - y1), 0.0)
        (dx * dx + dy * dy, rid)
      }.min
      id -> (best._2, best._1)
    }.toMap

  private def run(pts: Seq[(Long, Double, Double)],
                  rects: Seq[(Long, Double, Double, Double, Double)]): Map[Long, (Long, Double)] = {
    import spark.implicits._
    SpatialJoins.nearestRectJoin(
        pts.toDF("doc_id", "lon", "lat"),
        rects.toDF("poly_id", "x_min", "x_max", "y_min", "y_max"),
        "doc_id", "lon", "lat")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  private val rects = Seq(
    (1L, 0.0, 10.0, 0.0, 10.0), (2L, 20.0, 30.0, 0.0, 10.0),
    (3L, 0.0, 10.0, 20.0, 30.0), (4L, -5.0, 5.0, -5.0, 5.0))

  test("inside a box means dist2 = 0 with the lowest covering id winning ties") {
    val got = run(Seq((1L, 2.0, 2.0), (2L, 25.0, 5.0)), rects)
    assert(got(1L) == (1L, 0.0)) // inside rects 1 and 4 -> id 1 wins
    assert(got(2L) == (2L, 0.0))
  }

  test("outside points pick the geometrically closest box edge/corner") {
    val got = run(Seq((1L, 15.0, 5.0), (2L, 12.0, 16.0)), rects)
    assert(got(1L) == (1L, 25.0))      // 5 from rect 1's right edge, 5 from rect 2 -> tie, id 1
    assert(got(2L) == (3L, 4.0 + 16.0)) // corner distance to rect 3 (dx=2, dy=4)
  }

  test("random points match the brute-force reference exactly") {
    val rnd = new scala.util.Random(77)
    val pts = (1 to 400).map(i =>
      (i.toLong, rnd.nextDouble() * 80 - 40, rnd.nextDouble() * 80 - 40))
    assert(run(pts, rects) == refNearest(pts, rects))
  }
}
