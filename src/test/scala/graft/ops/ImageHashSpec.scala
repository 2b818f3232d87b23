package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** pHash definitional invariances + lossless pigeonhole join, all
  * differential against driver-side brute force.
  */
class ImageHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rgb(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Codecs.Image = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      val o = (y * w + x) * 3
      px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
    }
    Codecs.Image(w, h, 3, px)
  }

  private def pattern(fam: Int)(x: Int, y: Int): (Int, Int, Int) = {
    // family-specific spatial frequency so families land far apart
    val v = (128 + 100 * math.sin((x * (fam + 1)) * 0.2) *
      math.cos((y * (fam + 2)) * 0.15)).toInt.max(0).min(255)
    (v, (v * 3 / 4) & 0xff, (255 - v) & 0xff)
  }

  private def popcount(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("identical images hash identically; distinct patterns land far apart") {
    val imgs = (0 until 6).map(f => ImageHash.phash(rgb(48, 32)(pattern(f))))
    assert(ImageHash.phash(rgb(48, 32)(pattern(0))) == imgs(0))
    for (i <- imgs.indices; j <- imgs.indices if i < j)
      assert(popcount(imgs(i), imgs(j)) > 3,
        s"families $i,$j too close: ${popcount(imgs(i), imgs(j))}")
  }

  test("brightness shift and positive contrast scaling leave the hash unchanged") {
    val base = rgb(40, 40)(pattern(2))
    def shifted(d: Int, scale: Double): Codecs.Image = {
      val px = base.pixels.map(b => ((((b & 0xff) * scale).toInt + d).max(0).min(255)).toByte)
      base.copy(pixels = px)
    }
    // +20 brightness: only the (excluded) DC coefficients move
    assert(ImageHash.phash(shifted(20, 1.0)) == ImageHash.phash(base))
    // 0.8x contrast: all block coefficients AND the median scale together
    assert(ImageHash.phash(shifted(0, 0.8)) == ImageHash.phash(base))
  }

  test("small pixel noise moves the hash by at most a few bits") {
    val base = rgb(48, 32)(pattern(3))
    val noisy = {
      val px = base.pixels.clone()
      // deterministic sparse perturbation: 20 pixels nudged by ±6
      var k = 0
      while (k < 20) {
        val i = (k * 211) % (px.length / 3) * 3
        px(i) = (((px(i) & 0xff) + (if (k % 2 == 0) 6 else -6)).max(0).min(255)).toByte
        k += 1
      }
      base.copy(pixels = px)
    }
    assert(popcount(ImageHash.phash(base), ImageHash.phash(noisy)) <= 3)
  }

  test("hammingPairs equals brute force exactly at maxDist 3 (pigeonhole lossless)") {
    import spark.implicits._
    // 12 families x 5 variants; variants differ by sparse noise
    val imgs = for (fam <- 0 until 12; v <- 0 until 5) yield {
      val base = rgb(48, 32)(pattern(fam))
      val px = base.pixels.clone()
      var k = 0
      while (k < v * 6) {
        val i = (k * 197 + v * 13) % (px.length / 3) * 3
        px(i) = (((px(i) & 0xff) + 5).min(255)).toByte
        k += 1
      }
      (fam * 5L + v, Codecs.encodePng(48, 32, 3, px))
    }
    val docs = imgs.toDF("doc_id", "img")
    val hashes = ImageHash.phashTable(docs, "doc_id", "img")
    val got = ImageHash.hammingPairs(hashes, "doc_id", maxDist = 3)
      .select("doc_a", "doc_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the collected hashes
    val hs = hashes.as[(Long, Long)].collect().toMap
    val expect = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = popcount(hs(a), hs(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "fixture planted no near-dups")
    // the planted variants are found: at least one within-family pair
    // (some family PAIRS can also legitimately collide — e.g. patterns 4
    // and 6 alias after the 32-grid resample — the differential above is
    // the real check)
    assert(expect.exists { case (a, b, _) => a / 5 == b / 5 },
      "no within-family near-dup found")
  }

  test("phashClusters: planted 10^4-member identical-hash bucket contracts, not enumerates") {
    import spark.implicits._
    // VERDICT r4 #1/#6: a web corpus's boilerplate images collapse onto
    // one hash. 10^4 identical hashes would mean 5x10^7 pairs under pair
    // enumeration; the cluster form must finish with LINEAR output, and
    // a tiny capPerBucket must not break exactness because identical
    // hashes contract to one representative BEFORE the band join.
    val boiler = 0x5a5a_1234_dead_beefL
    val near = boiler ^ 0x7L        // dist 3 from boiler -> same cluster
    val far = ~boiler               // dist 64 -> separate
    val rows =
      (0L until 10000L).map(i => (i, boiler)) ++
        Seq((20000L, near), (20001L, near ^ (1L << 17)), (30000L, far))
    val hashes = rows.toDF("doc_id", "phash")
    val got = ImageHash.phashClusters(hashes, "doc_id", maxDist = 3, capPerBucket = 4)
      .as[(Long, Long)].collect().toMap
    assert(got.size == rows.size)                      // linear output
    assert((0L until 10000L).forall(got(_) == 0L))     // boilerplate cluster
    assert(got(20000L) == 0L && got(20001L) == 0L)     // near hashes joined via rep pair
    assert(got(30000L) == 30000L)                      // far hash is a singleton
  }

  test("hammingPairs cap bounds hot-bucket output deterministically; uncapped stays lossless") {
    import spark.implicits._
    // 200 identical hashes: uncapped pair count is 200*199/2; with
    // capPerBucket = 8 every pair must touch one of the 8 lowest ids per
    // bucket (the 4 bands share the bucket membership here), so the
    // output is exactly pairs with min endpoint < 8.
    val rows = (0L until 200L).map(i => (i, 0x0f0f_f0f0_1111_2222L))
    val hashes = rows.toDF("doc_id", "phash")
    val capped = ImageHash.hammingPairs(hashes, "doc_id", maxDist = 3, capPerBucket = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expect = (for { a <- 0L until 8L; b <- 0L until 200L if a < b } yield (a, b)).toSet
    assert(capped == expect)
    val full = ImageHash.hammingPairs(hashes.filter(col("doc_id") < 30),
      "doc_id", maxDist = 3, capPerBucket = -1).count()
    assert(full == 30L * 29 / 2)
  }

  test("phashTable is deterministic across parallelism and drops undecodable rows") {
    import spark.implicits._
    val good = (0L until 8L).map(i => (i, Codecs.encodePng(32, 32, 3,
      rgb(32, 32)(pattern(i.toInt % 4)).pixels)))
    val docs = (good :+ (99L -> Array[Byte](1, 2, 3))).toDF("doc_id", "img")
    val a = ImageHash.phashTable(docs.repartition(1), "doc_id", "img")
      .as[(Long, Long)].collect().toMap
    val b = ImageHash.phashTable(docs.repartition(7), "doc_id", "img")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.keySet == (0L until 8L).toSet) // 99 dropped, not crashed
  }
}
