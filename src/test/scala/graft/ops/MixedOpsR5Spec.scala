package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tiles.{RasterSpec, TileOps, TileOps2}

/** Invariant specs for the round-5 scalar additions: overview pyramid
  * (mass conservation + level geometry), readability (hand-computed
  * fixtures incl. the sentence floor), destination point (cardinal
  * bearings against closed forms).
  */
class MixedOpsR5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("overview pyramid: level k has (W/2^k)^2 pixels and conserves mean") {
    val spec = RasterSpec(0.0, 64.0, 0.25, -0.25, 64, 64, 16, 1)
    val base = TileOps.createRaster(spark, spec)((x, y, _) => (x * 7 + y * 13 % 5).toDouble)
    val pyr = TileOps2.overviewPyramid(base, 16, levels = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(4)))
    val baseMean = TileOps.toPixels(base, 16).agg(avg("v")).head.getDouble(0)
    for (k <- 1 to 3) {
      val lvl = pyr.filter(_._1 == k)
      val n = 64 >> k
      assert(lvl.length === n * n, s"level $k count")
      assert(lvl.map(t => (t._2, t._3)).distinct.length === n * n)
      val mean = lvl.map(_._4).sum / lvl.length
      assert(math.abs(mean - baseMean) < 1e-9, s"level $k mean drift")
    }
  }

  test("readability: hand-computed Flesch/ARI on fixed sentences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat. the dog ran!"),      // 6 words, 2 sents, 6 syll runs
      (2L, "word")                             // no terminator: floor S=1
    ).toDF("doc_id", "text")
    val r = TextOps.readability(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    val (w1, s1, y1, c1, f1, a1) = r(1L)
    assert((w1, s1, y1) === ((6L, 2L, 6L)))
    assert(c1 === 20L) // 25 chars minus 5 spaces (punct is non-space)
    assert(f1 === 206835000L - (1015000L * 6) / 2 - (84600000L * 6) / 6)
    assert(a1 === (4710000L * 20) / 6 + (500000L * 6) / 2 - 21430000L)
    val (w2, s2, y2, _, _, _) = r(2L)
    assert((w2, s2, y2) === ((1L, 1L, 1L)))
  }

  test("decay scores: dyadic weights on hand-placed event ages") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-10 12:00:00")
    def at(hoursAgo: Double) = new java.sql.Timestamp(
      base.getTime - (hoursAgo * 3600 * 1000).toLong)
    val ev = Seq(
      (1L, at(0)), (1L, at(0.5)), (1L, at(2)),   // k = 0, 0, 2
      (2L, at(31)), (2L, at(100)),               // both floored to k = 30
      (3L, at(29.99))                            // k = 29
    ).toDF("user_id", "ts")
    val got = Events.decayScores(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val u = 1L << 30
    assert(got(1L) === ((u + u + (u >> 2), 3L)))
    assert(got(2L) === ((2L, 2L)))
    assert(got(3L) === ((2L, 1L)))
  }

  test("reclassify: half-open bins, NaN passthrough") {
    import graft.tiles.Tile
    val spec = RasterSpec(0.0, 64.0, 0.25, -0.25, 8, 8, 8, 1)
    val vals = Array(0.0, 19.99, 20.0, 39.0, 40.0, 79.99, 80.0, 96.0)
    val r = TileOps.createRaster(spark, spec)((x, y, _) => vals((x + y) % 8))
    val out = TileOps.toPixels(TileOps2.reclassify(r,
      Array(20.0, 40.0, 60.0, 80.0), Array(1, 2, 3, 4, 5)), 8)
      .collect().map(row => (row.getInt(0), row.getInt(1)) -> row.getDouble(3)).toMap
    val wantFor = Map(0.0 -> 1.0, 19.99 -> 1.0, 20.0 -> 2.0, 39.0 -> 2.0,
      40.0 -> 3.0, 79.99 -> 4.0, 80.0 -> 5.0, 96.0 -> 5.0)
    for (x <- 0 until 8; y <- 0 until 8)
      assert(out((x, y)) === wantFor(vals((x + y) % 8)), s"($x,$y)")
    // NaN nodata passes through
    import spark.implicits._
    val nan = spark.createDataset(Seq(Tile(0, 0, 0, 2, 1, 0.0, 0.0, 1.0, -1.0,
      Array(Double.NaN, 50.0), Double.NaN, 4326)))
    val rec = TileOps2.reclassify(nan, Array(20.0), Array(1, 2)).collect()(0)
    assert(rec.pixels(0).isNaN && rec.pixels(1) === 2.0)
  }

  test("spherical area: 1-degree equator quad closed form and hole subtraction") {
    import spark.implicits._
    val feats = Seq(
      (0L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      (3L, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 5 2, 5 5, 2 5, 2 2))"))
      .toDF("fid", "wkt")
    val got = VectorOps2.sphericalArea(feats, "fid", "wkt").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val R = 6378137.0
    val d = math.toRadians(1.0)
    val want0 = R * R * d * math.sin(d) / 1.0 // trapezoid formula closed form
    assert(math.abs(got(0L) - want0) / want0 < 1e-12)
    // ~111.3 km square sanity band
    assert(got(0L) > 1.2e10 && got(0L) < 1.25e10)
    // hole subtracts: area strictly between (64 - 9) and 64 "square degrees"
    assert(got(3L) > 50 * want0 && got(3L) < 56 * want0)
  }

  test("destination point: cardinal bearings match closed forms") {
    import spark.implicits._
    val R = 6378137.0
    val pts = Seq((1L, 10.0, 45.0, 0.0, 111000.0),   // due north
      (2L, 10.0, 0.0, 90.0, 111000.0))               // due east on equator
      .toDF("doc_id", "lon", "lat", "brg", "dist_m")
    val got = SpatialStats.destinationPoint(pts, "brg", "dist_m").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // north: lat increases by exactly degrees(d/R), lon unchanged
    val (nl, nn) = got(1L)
    assert(math.abs(nl - (45.0 + math.toDegrees(111000.0 / R))) < 1e-8)
    assert(math.abs(nn - 10.0) < 1e-8)
    // east on the equator: lon increases by degrees(d/R), lat stays 0
    val (el, en) = got(2L)
    assert(math.abs(el) < 1e-8)
    assert(math.abs(en - (10.0 + math.toDegrees(111000.0 / R))) < 1e-8)
  }
}
