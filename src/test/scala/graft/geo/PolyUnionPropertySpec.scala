package graft.geo

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Robustness property suite for the general noding+trace union kernel
  * (VERDICT r2 next-round item 7): differential-test PolyUnion against
  * the INDEPENDENT exact slab-sweep kernel (RectUnion) on thousands of
  * jittered rectilinear inputs — shared edges, corner touches, nesting,
  * duplicates and near-degenerate slivers all arise naturally — plus a
  * grid-sampled coverage oracle for non-rectilinear (diamond) inputs.
  * Coordinates are exact binary fractions (k/8) so expected areas carry
  * no FP noise of their own. ScalaCheck Gens driven by a fixed seed
  * (no scalatestplus bridge in the offline cache).
  */
class PolyUnionPropertySpec extends AnyFunSuite {

  private def cases[A](gen: Gen[A], n: Int, seed: Long)(body: A => Unit): Unit = {
    var s = Seed(seed)
    var i = 0
    while (i < n) {
      body(gen.pureApply(Gen.Parameters.default, s))
      s = s.next
      i += 1
    }
  }

  private def rectPoly(x0: Double, y0: Double, w: Double, h: Double): Polygon =
    Polygon(Array(Array(x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h)))

  private val coord = Gen.choose(0, 64).map(_ / 8.0)   // 0 .. 8 step 1/8
  private val side = Gen.choose(1, 32).map(_ / 8.0)    // 1/8 .. 4

  private val rectGen = for {
    x0 <- coord; y0 <- coord; w <- side; h <- side
  } yield rectPoly(x0, y0, w, h)

  private val rectSetGen = for {
    n <- Gen.choose(2, 6)
    rs <- Gen.listOfN(n, rectGen)
  } yield rs

  test("differential: PolyUnion == RectUnion on 10k jittered rectilinear sets") {
    cases(rectSetGen, 10000, seed = 42L) { rs =>
      val exact = RectUnion.union(rs)
      val general = PolyUnion.union(rs)
      assert(math.abs(general.area - exact.area) < 1e-9,
        s"area ${general.area} vs ${exact.area} for ${rs.map(_.bbox)}")
      assert(general.nRings == exact.nRings,
        s"rings ${general.nRings} vs ${exact.nRings} for ${rs.map(_.bbox)}")
    }
  }

  test("differential: PolyUnion intersection == RectUnion intersection (2k sets)") {
    cases(Gen.zip(rectGen, rectSetGen), 2000, seed = 7L) { case (a, bs) =>
      val exact = RectUnion.overlay(Seq(a), bs, _ && _)
      val general = PolyUnion.overlay(Seq(a), bs, _ && _)
      assert(math.abs(general.area - exact.area) < 1e-9,
        s"area ${general.area} vs ${exact.area}")
    }
  }

  test("diamond sets: union area matches grid-sampled coverage (500 sets)") {
    def diamond(cx: Double, cy: Double, r: Double): Polygon =
      Polygon(Array(Array(cx - r, cy, cx, cy - r, cx + r, cy, cx, cy + r)))
    val dGen = for {
      cx <- Gen.choose(8, 56).map(_ / 8.0)
      cy <- Gen.choose(8, 56).map(_ / 8.0)
      r <- Gen.choose(4, 24).map(_ / 8.0)
    } yield diamond(cx, cy, r)
    val setGen = Gen.choose(2, 5).flatMap(n => Gen.listOfN(n, dGen))
    cases(setGen, 500, seed = 11L) { ds =>
      val u = PolyUnion.union(ds)
      // coverage sampled at cell centers of a 1/16 grid over [-4, 12]^2
      val step = 1.0 / 16.0
      var covered = 0
      var i = 0
      while (i < 256) {
        var j = 0
        while (j < 256) {
          val x = -4.0 + (i + 0.5) * step
          val y = -4.0 + (j + 0.5) * step
          if (ds.exists(_.contains(x, y))) covered += 1
          j += 1
        }
        i += 1
      }
      val sampled = covered * step * step
      // grid-sampling error bound: boundary length * step
      val perim = ds.map { d =>
        val r = (d.bbox.xMax - d.bbox.xMin) / 2
        4 * r * math.sqrt(2.0)
      }.sum
      assert(math.abs(u.area - sampled) <= perim * step + 1e-9,
        s"area ${u.area} vs sampled $sampled (tol ${perim * step})")
    }
  }

  test("thin slivers classify exactly (snap-rounded exact kernel)") {
    // dyadic width 2^-24 ≈ 6e-8 on a span-6 canvas: far below the old
    // base sampling offset; with the exact kernel the area is EXACT
    val w = math.pow(2.0, -24)
    val sliver = rectPoly(1.0, 0.0, w, 6.0)
    val u1 = PolyUnion.union(Seq(sliver))
    assert(u1.area == 6 * w, s"lone sliver area ${u1.area}")
    val mixed = PolyUnion.union(Seq(sliver, rectPoly(4.0, 0.0, 2.0, 2.0)))
    assert(mixed.area == 6 * w + 4.0, s"mixed ${mixed.area}")
    assert(mixed.nRings == 2)
    // intersection of the sliver with a crossing band keeps the sliver cut
    val inter = PolyUnion.overlay(Seq(sliver), Seq(rectPoly(0.0, 2.0, 8.0, 1.0)), _ && _)
    assert(inter.area == w, s"sliver ∩ band ${inter.area}")
    // non-dyadic width snaps to the grid: error bounded by perimeter·g
    val odd = rectPoly(1.0, 0.0, 5e-8, 6.0)
    val uo = PolyUnion.union(Seq(odd))
    assert(math.abs(uo.area - 6 * 5e-8) < 14.0 * (6.0 / math.pow(2.0, 39)),
      s"snapped sliver area ${uo.area}")
  }

  test("sub-quantum features: 10k jittered-lattice differentials at/below 1e-9·span") {
    // Rect sets mixing a span-setting unit square with features whose
    // sizes sit at or far below the OLD noding quantum (1e-9·span):
    // coordinates on the 2^-33 lattice (1.2e-10), sizes 2^-33..2^-26.
    // All inputs are dyadic above the snap grid (span 8 → g = 2^-39),
    // so the exact kernel must agree with the independent RectUnion
    // slab sweep EXACTLY — the old kernel dropped or misclassified
    // these (sub-segments under its quantum were discarded wholesale).
    val tinyCoord = Gen.choose(0L, 1L << 30).map(_ / math.pow(2.0, 33))
    val tinySide = Gen.choose(1L, 128L).map(_ / math.pow(2.0, 33))
    val tinyRect = for {
      x0 <- tinyCoord; y0 <- tinyCoord; w <- tinySide; h <- tinySide
    } yield rectPoly(x0, y0, w, h)
    val setGen = for {
      n <- Gen.choose(1, 4)
      rs <- Gen.listOfN(n, tinyRect)
      withAnchor <- Gen.oneOf(true, false)
    } yield if (withAnchor) rectPoly(4.0, 4.0, 4.0, 4.0) :: rs else rs
    cases(setGen, 10000, seed = 1337L) { rs =>
      val exact = RectUnion.union(rs)
      val general = PolyUnion.union(rs)
      assert(general.area == exact.area,
        s"area ${general.area} vs ${exact.area} for ${rs.map(_.bbox)}")
      assert(general.nRings == exact.nRings,
        s"rings ${general.nRings} vs ${exact.nRings} for ${rs.map(_.bbox)}")
    }
  }

  test("sub-quantum overlays: intersection/difference at 1e-9·span scale") {
    // a sub-quantum sliver crossed by sub-quantum bands, anchored by a
    // unit square that sets the span — exercises noding + both-set
    // classification entirely below the old quantum
    val g33 = math.pow(2.0, -33)
    val anchor = rectPoly(2.0, 2.0, 2.0, 2.0)
    val sliver = rectPoly(64 * g33, 0.0, 8 * g33, 1024 * g33)
    val band = rectPoly(0.0, 256 * g33, 1024 * g33, 64 * g33)
    val inter = PolyUnion.overlay(Seq(sliver, anchor), Seq(band), _ && _)
    assert(inter.area == 8 * g33 * 64 * g33, s"∩ ${inter.area}")
    val diff = PolyUnion.overlay(Seq(sliver), Seq(band, anchor), _ && !_)
    assert(diff.area == 8 * g33 * (1024 - 64) * g33, s"− ${diff.area}")
    val uni = PolyUnion.union(Seq(sliver, band, anchor))
    assert(uni.area == (8 * 1024 + 1024 * 64 - 8 * 64) * g33 * g33 + 4.0,
      s"∪ ${uni.area}")
  }

  test("needle-star arrangements: noding passes stay ≤ 8 (termination guard evidence)") {
    // VERDICT r4 #8 / PROOF.md "Noding termination": the adversarial case
    // for iterated hot-pixel rounding is many segments crossing near ONE
    // point at irrational-ish angles — every pairwise intersection rounds
    // into the same few lattice cells, maximizing the chance a rounded
    // split creates a fresh crossing for the next pass. Needle triangles
    // through a jittered common center (non-dyadic coords, so snapping is
    // real) must still node in a handful of passes, and the union area
    // must stay within the snap-grid perturbation bound.
    val needleStar = for {
      n <- Gen.choose(6, 16)
      cx <- Gen.choose(0, 1000000).map(3.0 + _ * 1e-9)
      cy <- Gen.choose(0, 1000000).map(3.0 + _ * 1e-9)
      angles <- Gen.listOfN(n, Gen.choose(0, 999999).map(_ * math.Pi / 1000000.0))
    } yield angles.map { a =>
      val (dx, dy) = (math.cos(a), math.sin(a))
      val (px, py) = (-dy * 1e-7, dx * 1e-7) // needle half-width 1e-7
      Polygon(Array(Array(
        cx - 3 * dx + px, cy - 3 * dy + py,
        cx + 3 * dx + px, cy + 3 * dy + py,
        cx + 3 * dx - px, cy + 3 * dy - py,
        cx - 3 * dx - px, cy - 3 * dy - py)))
    }
    var maxPasses = 0
    cases(needleStar, 300, seed = 20260818L) { needles =>
      val u = PolyUnion.union(needles)
      val passes = PolyUnion.lastNodingPasses.get()
      maxPasses = math.max(maxPasses, passes)
      assert(passes <= 8, s"noding took $passes passes on ${needles.length} needles")
      // sanity: union area ≈ sum of needle areas minus tiny overlaps;
      // each needle is 6 × 2e-7, overlaps are ~(2e-7)² per pair
      val singles = needles.length * 6.0 * 2e-7
      assert(u.area <= singles + 1e-9 && u.area >= singles * 0.5,
        s"area ${u.area} vs singles $singles")
    }
    assert(maxPasses >= 2, s"fixture never exercised iterated noding (max $maxPasses)")
  }

  test("union is monotone and bounded: max single ≤ union ≤ sum (2k sets)") {
    cases(rectSetGen, 2000, seed = 3L) { rs =>
      val u = PolyUnion.union(rs).area
      val singles = rs.map(r => (r.bbox.xMax - r.bbox.xMin) * (r.bbox.yMax - r.bbox.yMin))
      assert(u <= singles.sum + 1e-9)
      assert(u >= singles.max - 1e-9)
    }
  }
}
