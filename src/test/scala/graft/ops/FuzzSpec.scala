package graft.ops

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{BBox, Polygon, PolyUnion, RectUnion}

/** Seeded fuzz campaign over the round-3 surfaces: JPEG decode vs the
  * JDK codec on random images, MP4 sample-table roundtrips on random
  * configurations, and buffer/clip differentials against closed forms
  * on random rectangles. Deterministic Gens (fixed seeds) so failures
  * reproduce.
  */
class FuzzSpec extends AnyFunSuite {

  private def cases[A](gen: Gen[A], n: Int, seed: Long)(body: A => Unit): Unit = {
    var s = Seed(seed)
    var i = 0
    while (i < n) {
      body(gen.pureApply(Gen.Parameters.default, s))
      s = s.next
      i += 1
    }
  }

  test("JPEG fuzz: 40 random grayscale images match ImageIO within IDCT rounding") {
    val gen = for {
      w <- Gen.choose(8, 90)
      h <- Gen.choose(8, 70)
      a <- Gen.choose(1, 17)
      b <- Gen.choose(1, 23)
    } yield (w, h, a, b)
    cases(gen, 40, seed = 101L) { case (w, h, a, b) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * a + y * b) % 256)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      val ours = Jpeg.decode(bos.toByteArray)
      assert(ours.width == w && ours.height == h && ours.channels == 1)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDiff = math.max(maxDiff,
          math.abs(ref.getRaster.getSample(x, y, 0) - (ours.pixels(y * w + x) & 0xff)))
      assert(maxDiff <= 2, s"($w x $h, $a, $b): max diff $maxDiff")
    }
  }

  test("MP4 fuzz: 60 random sample configurations roundtrip byte-exactly") {
    val gen = for {
      n <- Gen.choose(1, 30)
      base <- Gen.choose(1, 200)
      stepMod <- Gen.choose(1, 50)
      ts <- Gen.choose(100, 100000)
    } yield (n, base, stepMod, ts)
    cases(gen, 60, seed = 202L) { case (n, base, stepMod, ts) =>
      val samples = (0 until n).map(i =>
        Array.tabulate[Byte](base + (i % stepMod))(j => ((i * 31 + j * 7) & 0xff).toByte))
      val m = Mp4.decode(Mp4.encode(640, 480, ts, 100, samples))
      assert(m.samples.length == n && m.timescale == ts)
      m.samples.zip(samples).foreach { case (got, want) =>
        assert(java.util.Arrays.equals(got, want))
      }
    }
  }

  test("buffer fuzz: 500 random rects — square joins exact, round joins match closed form") {
    val gen = for {
      x0 <- Gen.choose(-40, 40); y0 <- Gen.choose(-40, 40)
      w <- Gen.choose(1, 20); h <- Gen.choose(1, 20)
      d <- Gen.choose(1, 8)
      q <- Gen.choose(1, 6)
    } yield (x0.toDouble, y0.toDouble, w.toDouble, h.toDouble, d.toDouble, q)
    cases(gen, 500, seed = 303L) { case (x0, y0, w, h, d, q) =>
      val rect = Polygon(Array(Array(x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h)))
      // square joins on the exact rectilinear kernel
      val sq = RectUnion.overlay(Seq(rect),
        VectorOps2.bufferPiecesForTest(rect, d, "square", q), _ || _)
      assert(sq.area == (w + 2 * d) * (h + 2 * d), s"square ($x0,$y0,$w,$h,$d)")
      // round joins vs A + P·d + 2q·d²·sin(π/2q)
      val rd = PolyUnion.overlay(Seq(rect),
        VectorOps2.bufferPiecesForTest(rect, d, "round", q), _ || _)
      val expected = w * h + 2 * d * (w + h) + 2 * q * d * d * math.sin(math.Pi / (2 * q))
      assert(math.abs(rd.area - expected) < 1e-6,
        s"round ($x0,$y0,$w,$h,$d,$q): ${rd.area} vs $expected")
    }
  }

  test("clip fuzz: 1000 random rect pairs — intersection area matches closed form") {
    val gen = for {
      ax <- Gen.choose(-30, 30); ay <- Gen.choose(-30, 30)
      aw <- Gen.choose(1, 25); ah <- Gen.choose(1, 25)
      bx <- Gen.choose(-30, 30); by <- Gen.choose(-30, 30)
      bw <- Gen.choose(1, 25); bh <- Gen.choose(1, 25)
    } yield (ax, ay, aw, ah, bx, by, bw, bh)
    cases(gen, 1000, seed = 404L) { case (ax, ay, aw, ah, bx, by, bw, bh) =>
      val a = Polygon.box(BBox(ax, ax + aw, ay, ay + ah))
      val b = Polygon.box(BBox(bx, bx + bw, by, by + bh))
      val iw = math.max(0, math.min(ax + aw, bx + bw) - math.max(ax, bx))
      val ih = math.max(0, math.min(ay + ah, by + bh) - math.max(ay, by))
      val expected = iw.toDouble * ih
      val u = RectUnion.overlay(Seq(a), Seq(b), _ && _)
      assert(u.area == expected, s"rect ∩ rect: ${u.area} vs $expected")
      val g = PolyUnion.overlay(Seq(a), Seq(b), _ && _)
      assert(math.abs(g.area - expected) < 1e-9, s"general: ${g.area} vs $expected")
    }
  }
}
