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
