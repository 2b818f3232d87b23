package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object FolkiSpec {
  // smooth textured pattern with gradients in both axes (standalone so
  // Spark closures don't capture the suite)
  def tex(x: Int, y: Int): Double =
    10.0 * math.sin(x * 0.21) + 8.0 * math.cos(y * 0.17) +
      5.0 * math.sin((x + 2 * y) * 0.11) + 0.01 * x * y
}

class FolkiSpec extends AnyFunSuite {
  import FolkiSpec.tex

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rank filter counts strictly-greater neighbors with zero-padded shifts") {
    // 3×3 image, rad 1: center of a strictly increasing ramp
    val img = Array[Double](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val r = Folki.rankFilterSup(img, 3, 3, 1)
    assert(r(4) === 4.0) // neighbors 6,7,8,9 exceed 5
    assert(r(0) === 3.0) // in-bounds 2,4,5 exceed 1; zero-padding never counts
    assert(r(8) === 0.0) // 9 is the maximum
  }

  test("efolki kernel recovers a constant integer shift") {
    val w = 96; val h = 96
    val i0 = Array.tabulate(w * h)(k => tex(k % w, k / w))
    // I1(x,y) = I0(x−2, y−1)  →  expected flow u=2, v=1
    val i1 = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      tex(x - 2, y - 1)
    }
    val (u, v) = Folki.efolki(i0, i1, w, h, iteration = 8, radii = Seq(8, 4), rank = 4)
    // interior: ignore a 20-px boundary band
    var n = 0; var su = 0.0; var sv = 0.0
    for (y <- 20 until h - 20; x <- 20 until w - 20) {
      su += u(y * w + x); sv += v(y * w + x); n += 1
    }
    val mu = su / n; val mv = sv / n
    assert(math.abs(mu - 2.0) < 0.15, s"mean u $mu")
    assert(math.abs(mv - 1.0) < 0.15, s"mean v $mv")
  }

  test("pyramid efolki recovers a shift beyond the window radius") {
    val w = 128; val h = 128
    val i0 = Array.tabulate(w * h)(k => tex(k % w, k / w))
    // 12-px shift: beyond radius 8, needs the coarse-to-fine pyramid
    val i1 = Array.tabulate(w * h) { k => tex(k % w - 12, k / w - 5) }
    val (u, v) = Folki.efolkiPyramid(i0, i1, w, h, levels = 2, iteration = 8)
    var n = 0; var su = 0.0; var sv = 0.0
    for (y <- 30 until h - 30; x <- 30 until w - 30) {
      su += u(y * w + x); sv += v(y * w + x); n += 1
    }
    val mu = su / n; val mv = sv / n
    assert(math.abs(mu - 12.0) < 0.5, s"mean u $mu")
    assert(math.abs(mv - 5.0) < 0.5, s"mean v $mv")
    // plain efolki at the same radius must NOT get there (sanity that the
    // pyramid is doing the work)
    val (u0, _) = Folki.efolki(i0, i1, w, h, iteration = 8)
    val mu0 = (for (y <- 30 until h - 30; x <- 30 until w - 30)
      yield u0(y * w + x)).sum / n
    assert(math.abs(mu0 - 12.0) > 1.0, s"plain efolki unexpectedly converged: $mu0")
  }

  test("CLAHE chain matches the (write-back-fixed) reference numpy run") {
    // pinned from the reference's own _clahe/clip/map/interpolate code
    // (gefolki.py:27-347) with the one-line view-copy fix applied, run
    // under numpy on the same 96×96 min-max-normalized texture
    val w = 96; val h = 96
    val raw = Array.tabulate(w * h)(k => tex(k % w, k / w))
    var mn = Double.MaxValue; var mx = Double.MinValue
    raw.foreach { x => if (x < mn) mn = x; if (x > mx) mx = x }
    val img = raw.map(x => (x - mn) / (mx - mn))
    val eq = Clahe.equalizeChain(img, w, h)
    assert(math.abs(eq.sum - 4790.319203577703) < 1e-5, s"sum ${eq.sum}")
    val pinned = Seq(
      (0, 0, 0.15570305), (10, 17, 0.31692988), (48, 48, 0.24812695),
      (95, 95, 1.0), (3, 90, 0.5534142), (70, 5, 0.71850157))
    pinned.foreach { case (yy, xx, exp) =>
      assert(math.abs(eq(yy * w + xx) - exp) < 1e-6,
        s"H[$yy][$xx] = ${eq(yy * w + xx)}, expected $exp")
    }
  }

  test("gefolki recovers a shift under inverted contrast where efolki fails") {
    val w = 96; val h = 96
    val raw = Array.tabulate(w * h)(k => tex(k % w, k / w))
    var mn = Double.MaxValue; var mx = Double.MinValue
    raw.foreach { x => if (x < mn) mn = x; if (x > mx) mx = x }
    val i0 = raw.map(x => (x - mn) / (mx - mn))
    // target: shifted AND contrast-inverted (the SAR↔optical analog)
    val i1 = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      1.0 - (tex(x - 2, y - 1) - mn) / (mx - mn)
    }
    def interiorMean(f: Array[Double]): Double = {
      var n = 0; var s = 0.0
      for (y <- 20 until h - 20; x <- 20 until w - 20) { s += f(y * w + x); n += 1 }
      s / n
    }
    val (gu, gv) = Folki.gefolki(i0, i1, w, h, iteration = 8)
    assert(math.abs(interiorMean(gu) - 2.0) < 0.3, s"gefolki mean u ${interiorMean(gu)}")
    assert(math.abs(interiorMean(gv) - 1.0) < 0.3, s"gefolki mean v ${interiorMean(gv)}")
    // plain efolki on the inverted pair must NOT find the shift
    val (eu, _) = Folki.efolki(i0, i1, w, h, iteration = 8)
    assert(math.abs(interiorMean(eu) - 2.0) > 0.5,
      s"efolki unexpectedly solved inverted contrast: ${interiorMean(eu)}")
  }

  test("gefolki on a NON-multiple-of-16 plane (resize-to-multiple CLAHE branch)") {
    // 100×84: neither dimension a CLAHE-tile multiple — exercises the
    // reference's resize-up/equalize/resize-back/renormalize branch
    // (gefolki.py:441-482), previously avoided by construction
    val w = 100; val h = 84
    val raw = Array.tabulate(w * h)(k => tex(k % w, k / w))
    var mn = Double.MaxValue; var mx = Double.MinValue
    raw.foreach { x => if (x < mn) mn = x; if (x > mx) mx = x }
    val i0 = raw.map(x => (x - mn) / (mx - mn))
    val i1 = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      1.0 - (tex(x - 2, y - 1) - mn) / (mx - mn)
    }
    def interiorMean(f: Array[Double]): Double = {
      var n = 0; var s = 0.0
      for (y <- 20 until h - 20; x <- 20 until w - 20) { s += f(y * w + x); n += 1 }
      s / n
    }
    val (gu, gv) = Folki.gefolki(i0, i1, w, h, iteration = 8)
    assert(math.abs(interiorMean(gu) - 2.0) < 0.3, s"gefolki mean u ${interiorMean(gu)}")
    assert(math.abs(interiorMean(gv) - 1.0) < 0.3, s"gefolki mean v ${interiorMean(gv)}")
  }

  test("distributed coregister matches the shift on tile interiors") {
    val spec = RasterSpec(0.0, 128.0, 1.0, -1.0, 128, 128, 32, 1)
    val ref = TileOps.createRaster(spark, spec)((x, y, _) => tex(x, y))
    val tgt = TileOps.createRaster(spark, spec)((x, y, _) => tex(x - 2, y - 1))
    val flow = Folki.coregister(ref, tgt, spec, halo = 32, iteration = 8)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(flow.size === 128 * 128)
    val interior = for (y <- 24 until 104; x <- 24 until 104) yield flow((x, y))
    val mu = interior.map(_._1).sum / interior.size
    val mv = interior.map(_._2).sum / interior.size
    assert(math.abs(mu - 2.0) < 0.2, s"mean u $mu")
    assert(math.abs(mv - 1.0) < 0.2, s"mean v $mv")
  }
}
