package graft.tiles

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** AI augmentation + masking parity with the reference formulas
  * (reference: the buteo ai.augmentation and ai.masking modules).
  */
object AugmentSpecFixture extends Serializable {
  val spec = RasterSpec(0.0, 16.0, 1.0, -1.0, 8, 8, 4, 2)
  def gen(x: Int, y: Int, b: Int): Double = (x * 7 + y * 13 + b * 5) % 97
}

class AugmentSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import AugmentSpecFixture.{spec, gen}
  private def raster() = TileOps.createRaster(spark, spec)(AugmentSpecFixture.gen)

  private def pixelMap(ds: org.apache.spark.sql.Dataset[Tile], sp: RasterSpec): Map[(Int, Int, Int), Double] =
    TileOps.toPixels(ds, sp.tileSize).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3))).toMap

  test("u01 stays in [0,1) for negative and 2^32-scale inputs (review fix)") {
    for (seed <- Seq(-1L, -12345L, Long.MinValue / 2, 0x7fedcba987654321L);
         coord <- Seq(0L, -7L, 1L << 33)) {
      val u = Augment.u01(seed, coord, coord + 1, 5)
      assert(u >= 0.0 && u < 1.0, s"u01($seed,$coord) = $u")
    }
    // in-range values unchanged vs the pre-normalization formula
    val M = 2147483647L
    def legacy(seed: Long, a: Long, b: Long, c: Long): Double = {
      var h = (seed * 1103515245L + a * 12345L + b * 2654435761L + c * 97531L) % (M - 1) + 1
      h = h * 48271L % M; h = h * 48271L % M
      h.toDouble / M
    }
    for (s <- Seq(0L, 7L, 42L); a <- Seq(0L, 95L); b <- Seq(0L, 31L))
      assert(Augment.u01(s, a, b, 1000) == legacy(s, a, b, 1000))
  }

  test("rot90 k=1 matches np.rot90 (out[r,c] = in[c, W-1-r]) across tiles") {
    val out = pixelMap(Augment.rot90(raster(), spec, 1), spec)
    for (r <- 0 until 8; c <- 0 until 8; b <- 0 until 2)
      assert(out((c, r, b)) == gen(7 - r, c, b), s"($c,$r,$b)")
  }

  test("rot90 k composition: k=1 four times is identity; k=2 twice is identity") {
    val base = pixelMap(raster(), spec)
    var ds = raster()
    for (_ <- 0 until 4) ds = Augment.rot90(ds, spec, 1)
    assert(pixelMap(ds, spec) == base)
    val r2 = Augment.rot90(Augment.rot90(raster(), spec, 2), spec, 2)
    assert(pixelMap(r2, spec) == base)
  }

  test("mirror semantics and involution") {
    val base = pixelMap(raster(), spec)
    val h = pixelMap(Augment.mirror(raster(), spec, 1), spec)
    for (r <- 0 until 8; c <- 0 until 8) assert(h((c, r, 0)) == gen(7 - c, r, 0))
    val v = pixelMap(Augment.mirror(raster(), spec, 2), spec)
    for (r <- 0 until 8; c <- 0 until 8) assert(v((c, r, 1)) == gen(c, 7 - r, 1))
    assert(pixelMap(Augment.mirror(Augment.mirror(raster(), spec, 3), spec, 3), spec) == base)
  }

  test("rotationPatch: same k for every band of a patch; local rot90 semantics") {
    val out = Augment.rotationPatch(raster(), seed = 7).collect()
      .map(t => ((t.cellX, t.cellY, t.band), t)).toMap
    val in = raster().collect().map(t => ((t.cellX, t.cellY, t.band), t)).toMap
    for (cx <- 0 until 2; cy <- 0 until 2) {
      val k = 1 + math.min((Augment.u01(7, cx, cy, 0) * 3).toInt, 2)
      for (b <- 0 until 2) {
        val o = out((cx, cy, b)); val i = in((cx, cy, b))
        // spot-check one pixel: local (r,c)=(1,2)
        val (pr, pc) = k match {
          case 1 => (4 - 1 - 2, 1)
          case 2 => (4 - 1 - 1, 4 - 1 - 2)
          case 3 => (2, 4 - 1 - 1)
        }
        assert(o.pixels(pr * 4 + pc) == i.pixels(1 * 4 + 2))
      }
    }
  }

  test("channelScale additive: constant per-band delta within [-amount, amount]") {
    val in = pixelMap(raster(), spec)
    val out = pixelMap(Augment.channelScale(raster(), 0.5, additive = true, seed = 3), spec)
    for (b <- 0 until 2) {
      val deltas = (for (r <- 0 until 4; c <- 0 until 4)
        yield out((c, r, b)) - in((c, r, b))).toSeq
      assert(deltas.forall(d => math.abs(d - deltas.head) < 1e-12))
      assert(math.abs(deltas.head) <= 0.5)
    }
  }

  test("contrast preserves the patch mean") {
    val in = raster().collect().head
    val out = Augment.contrast(raster(), 0.3, seed = 5).collect()
      .find(t => t.cellX == in.cellX && t.cellY == in.cellY && t.band == in.band).get
    assert(math.abs(in.pixels.sum / in.pixels.length -
      out.pixels.sum / out.pixels.length) < 1e-9)
    assert(!(in.pixels sameElements out.pixels))
  }

  test("noiseUniform: bounded per-patch amount; 2D form identical across bands") {
    val in = pixelMap(raster(), spec)
    val out = pixelMap(Augment.noiseUniform(raster(), spec.tileSize, 0.4,
      additive = true, perChannel = false, seed = 11), spec)
    for (r <- 0 until 8; c <- 0 until 8) {
      val amount = Augment.u01(11, c / 4, r / 4, 0) * 0.4 // per-patch draw
      val d0 = out((c, r, 0)) - in((c, r, 0))
      val d1 = out((c, r, 1)) - in((c, r, 1))
      assert(math.abs(d0 - d1) < 1e-12) // same field on both channels
      assert(math.abs(d0) <= amount + 1e-12)
    }
    // 3D form differs across bands somewhere
    val out3 = pixelMap(Augment.noiseUniform(raster(), spec.tileSize, 0.4,
      additive = true, perChannel = true, seed = 11), spec)
    assert((0 until 8).exists(r => (0 until 8).exists(c =>
      math.abs((out3((c, r, 0)) - in((c, r, 0))) - (out3((c, r, 1)) - in((c, r, 1)))) > 1e-9)))
  }

  test("noiseNormal additive: per-patch sample moments ~ N(0, amount)") {
    val bigSpec = spec.copy(width = 64, height = 64, tileSize = 32, bands = 1)
    val in = TileOps.createRaster(spark, bigSpec)((_, _, _) => 0.0)
    val tilesOut = Augment.noiseNormal(in, bigSpec.tileSize, 0.5,
      additive = true, perChannel = true, seed = 13).collect()
    tilesOut.foreach { t =>
      val amount = Augment.u01(13, t.cellX, t.cellY, 0) * 0.5
      val vals = t.pixels
      val mean = vals.sum / vals.length
      val std = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.length)
      assert(math.abs(mean) < 0.04, s"tile (${t.cellX},${t.cellY}) mean $mean")
      assert(math.abs(std - amount) < 0.04,
        s"tile (${t.cellX},${t.cellY}) std $std vs $amount")
    }
  }

  test("labelSmoothFlat fixed amount: exact formula") {
    val out = Augment.labelSmoothFlat(raster(), 0.2, fixedAmount = true, seed = 1)
      .collect().head
    val in = raster().collect()
      .find(t => t.cellX == out.cellX && t.cellY == out.cellY && t.band == out.band).get
    val mean = in.pixels.sum / in.pixels.length
    in.pixels.zip(out.pixels).foreach { case (v, o) =>
      assert(math.abs(o - (0.8 * v + 0.2 * mean)) < 1e-12)
    }
  }

  test("mixup: linear blend with per-patch lambda in [min, max+0.001]") {
    val t = raster()
    val s = TileOps.createRaster(spark, spec)((x, y, b) => (x * 3 + y * 11 + b) % 89)
    val out = Augment.mixup(t, s, 0.333, 0.666, seed = 21).collect()
    out.foreach { o =>
      val lam = math.min(0.333 + Augment.u01(21, o.cellX, o.cellY, 0) * (0.667 + 0.0001 * 10 - 0.333), 1.0)
      // recompute directly (same formula as the op):
      val lam2 = math.min(0.333 + Augment.u01(21, o.cellX, o.cellY, 0) * (0.666 + 0.001 - 0.333), 1.0)
      assert(lam2 >= 0.333 && lam2 <= 0.667 + 1e-9)
      val tv = gen(o.cellX * 4 + 1, o.cellY * 4 + 1, o.band)
      val sv = ((o.cellX * 4 + 1) * 3 + (o.cellY * 4 + 1) * 11 + o.band) % 89
      assert(math.abs(o.pixels(1 * 4 + 1) - (tv * lam2 + sv * (1 - lam2))) < 1e-12)
    }
  }

  test("cutmix: box comes from source, rest from target, box fraction bounded") {
    val t = raster()
    val s = TileOps.createRaster(spark, spec)((_, _, _) => -1.0)
    val out = Augment.cutmix(t, s, 0.333, 0.666, seed = 33).collect()
    out.foreach { o =>
      val n = o.pixels.count(_ == -1.0)
      assert(n >= 1 && n < o.pixels.length) // some box, not everything
    }
    // deterministic: same seed twice = same output
    val out2 = Augment.cutmix(raster(), TileOps.createRaster(spark, spec)((_, _, _) => -1.0),
      0.333, 0.666, seed = 33).collect()
    val m1 = out.map(t2 => ((t2.cellX, t2.cellY, t2.band), t2.pixels.toSeq)).toMap
    val m2 = out2.map(t2 => ((t2.cellX, t2.cellY, t2.band), t2.pixels.toSeq)).toMap
    assert(m1 == m2)
  }

  test("maskPixels2d: same mask every band; fraction ≈ 1-p; only 0/1") {
    val bigSpec = spec.copy(width = 64, height = 64, tileSize = 32)
    val m = pixelMap(Augment.maskPixels2d(
      TileOps.createRaster(spark, bigSpec)(AugmentSpecFixture.gen), bigSpec.tileSize,
      p = 0.2, seed = 9), bigSpec)
    assert(m.values.forall(v => v == 0.0 || v == 1.0))
    for (r <- 0 until 64; c <- 0 until 64) assert(m((c, r, 0)) == m((c, r, 1)))
    val keep = m.count(_._2 == 1.0).toDouble / m.size
    assert(math.abs(keep - 0.8) < 0.03, s"keep $keep")
  }

  test("maskRectangle p=1: one zero box within size bounds, all channels") {
    val m = Augment.maskRectangle(raster(), p = 1.0, seed = 17).collect()
    m.foreach { t =>
      val zeros = t.pixels.count(_ == 0.0)
      assert(zeros >= 1 && zeros <= (0.5 * 4).toInt * (0.5 * 4).toInt + 4)
    }
    // same box on both bands of a cell
    val byCell = m.groupBy(t => (t.cellX, t.cellY))
    byCell.values.foreach { ts =>
      assert(ts.map(_.pixels.toSeq).distinct.size == 1)
    }
  }

  test("maskEllipse p=1 zeroes an elliptical region; maskLines zeroes full spans") {
    val bigSpec = spec.copy(width = 32, height = 32, tileSize = 32, bands = 1)
    val big = TileOps.createRaster(spark, bigSpec)(AugmentSpecFixture.gen)
    val e = Augment.maskEllipse(big, p = 1.0, seed = 29).collect().head
    val zeros = e.pixels.count(_ == 0.0)
    assert(zeros > 0 && zeros < e.pixels.length)
    val l = Augment.maskLines(big, bigSpec.tileSize, p = 0.15, seed = 31).collect().head
    assert(l.pixels.exists(_ == 0.0) && l.pixels.exists(_ == 1.0))
  }

  test("blur smooths, sharpen amplifies contrast, misalign shifts a ramp") {
    val bigSpec = spec.copy(width = 16, height = 16, tileSize = 8, bands = 1)
    // checkerboard: blur must shrink the deviation from the mean
    val checker = TileOps.createRaster(spark, bigSpec)((x, y, _) => ((x + y) % 2) * 10.0)
    val blurred = pixelMap(Augment.blur(checker), bigSpec)
    val devIn = 5.0 // checker deviates ±5 from mean 5
    val interior = for (r <- 2 until 14; c <- 2 until 14) yield math.abs(blurred((c, r, 0)) - 5.0)
    assert(interior.max < devIn, s"blur max dev ${interior.max}")
    val sharp = pixelMap(Augment.sharpen(checker), bigSpec)
    val sInterior = for (r <- 2 until 14; c <- 2 until 14) yield math.abs(sharp((c, r, 0)) - 5.0)
    assert(sInterior.min > devIn, s"sharpen min dev ${sInterior.min}")
    // x-ramp: misalign by (fx, fy) adds fx (slope 1 in x, 0 in y)
    val ramp = TileOps.createRaster(spark, bigSpec)((x, _, _) => x.toDouble)
    val fx = math.min(Augment.u01(7, 1, 0, 0), 0.5)
    val shifted = pixelMap(Augment.misalign(ramp, 0.5, seed = 7), bigSpec)
    for (r <- 2 until 14; c <- 2 until 13)
      assert(math.abs(shifted((c, r, 0)) - (c + fx)) < 1e-9,
        s"($c,$r): ${shifted((c, r, 0))} want ${c + fx}")
  }

  test("applyMaskNoise: masked pixels drawn in [min,max]; binary form two-valued") {
    val data = raster()
    val mask = Augment.maskRectangle(raster(), p = 1.0, seed = 17)
    val masks = mask.collect().map(t => ((t.cellX, t.cellY, t.band), t.pixels)).toMap
    val cont = Augment.applyMaskNoise(data, mask, spec.tileSize, 10.0, 20.0, binary = false, seed = 5)
      .collect()
    cont.foreach { t =>
      val m = masks((t.cellX, t.cellY, t.band))
      t.pixels.zip(m).foreach { case (v, mv) =>
        if (mv == 0.0) assert(v >= 10.0 && v <= 20.0)
      }
    }
    val bin = Augment.applyMaskNoise(raster(), mask, spec.tileSize, -1.0, 99.0, binary = true, seed = 5)
      .collect()
    bin.foreach { t =>
      val m = masks((t.cellX, t.cellY, t.band))
      t.pixels.zip(m).foreach { case (v, mv) =>
        if (mv == 0.0) assert(v == -1.0 || v == 99.0)
      }
    }
    // 2D form: same replacement noise on both bands of a cell
    val byCell = cont.groupBy(t => (t.cellX, t.cellY))
    byCell.foreach { case (k, ts) =>
      val m = masks((k._1, k._2, 0))
      val p0 = ts.find(_.band == 0).get.pixels
      val p1 = ts.find(_.band == 1).get.pixels
      m.zipWithIndex.foreach { case (mv, i) => if (mv == 0.0) assert(p0(i) == p1(i)) }
    }
  }

  test("applyMask fills masked pixels") {
    val data = raster()
    val mask = Augment.maskRectangle(raster(), p = 1.0, seed = 17)
    val out = Augment.applyMask(data, mask, fill = -5.0).collect()
    val masks = mask.collect().map(t => ((t.cellX, t.cellY, t.band), t.pixels)).toMap
    out.foreach { t =>
      val m = masks((t.cellX, t.cellY, t.band))
      t.pixels.zip(m).foreach { case (v, mv) => if (mv == 0.0) assert(v == -5.0) }
    }
  }
}
