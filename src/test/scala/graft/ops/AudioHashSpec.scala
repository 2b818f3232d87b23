package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AudioHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Broadband clip: 6 harmonics with 1/k rolloff over a deterministic
    * pseudo-noise bed (−26 dB) — the spectral richness of real audio;
    * a pure 2-tone signal leaves ~98% of the spectrogram at the floor,
    * where median thresholding is legitimately tie-unstable.
    */
  private def tone(freqs: Seq[Double], n: Int = 8192, amp: Double = 8000.0): Array[Short] =
    Array.tabulate(n) { i =>
      val t = i / 8000.0
      val tones = freqs.map { f0 =>
        (1 to 6).map(k => math.sin(2 * math.Pi * f0 * k * t) / k).sum
      }.sum * amp / (2.0 * freqs.length)
      val bed = ((i * 2654435761L >>> 9) % 2001 - 1000) * amp / 20000.0
      (tones + bed).toInt.max(Short.MinValue).min(Short.MaxValue).toShort
    }

  private def popcount(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("identical clips hash identically; distinct tone stacks land far apart") {
    val clips = Seq(
      tone(Seq(220.0, 660.0)), tone(Seq(440.0, 1320.0)),
      tone(Seq(330.0, 990.0, 1500.0)), tone(Seq(523.0)))
    val hs = clips.map(AudioHash.ahash)
    assert(AudioHash.ahash(tone(Seq(220.0, 660.0))) == hs(0))
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(popcount(hs(i), hs(j)) > 3, s"clips $i,$j too close: ${popcount(hs(i), hs(j))}")
  }

  test("short clips (frameLen < Bands) hash without error and match a direct DFT") {
    // 800 samples → frameLen = 25 < Bands = 32: the bin stride k exceeds
    // the frame length, so the twiddle index must wrap by k mod frameLen
    // (a single conditional subtract escaped the table and threw AIOOBE)
    def refSpectrogram(samples: Array[Short]): Array[Double] = {
      // direct per-sample trig with the SAME angle reduction the twiddle
      // table uses (angle of (k·i) mod L) → bit-identical sums
      val L = samples.length / AudioHash.Frames
      val mags = new Array[Double](AudioHash.Frames * AudioHash.Bands)
      var peak = 0.0
      for (f <- 0 until AudioHash.Frames; k <- 1 to AudioHash.Bands) {
        var re = 0.0; var im = 0.0
        for (i <- 0 until L) {
          val ang = 2.0 * math.Pi * ((k.toLong * i) % L) / L
          val v = samples(f * L + i).toDouble
          re += v * math.cos(ang); im -= v * math.sin(ang)
        }
        val m = math.hypot(re, im)
        mags(f * AudioHash.Bands + (k - 1)) = m
        if (m > peak) peak = m
      }
      val floor = math.max(peak * AudioHash.FloorRatio, Double.MinPositiveValue)
      mags.map(m => math.log(math.max(m, floor) / floor))
    }
    for (n <- Seq(800, 64, 4096)) { // frameLen 25, 2 (extreme wrap), 128
      val clip = tone(Seq(440.0), n = n)
      assert(AudioHash.spectrogram(clip).sameElements(refSpectrogram(clip)),
        s"spectrogram mismatch at n=$n")
    }
  }

  test("uniform gain change leaves the hash unchanged (log + DC-excluded DCT)") {
    val base = tone(Seq(440.0, 880.0), amp = 8000.0)
    val quieter = base.map(s => (s * 0.5).toInt.toShort)
    // log1p makes gain ~additive per bin; the DCT block excludes the DC
    // row/col that absorbs an additive constant
    assert(popcount(AudioHash.ahash(base), AudioHash.ahash(quieter)) <= 2)
  }

  test("re-encode-level noise moves the hash by at most a few bits") {
    // low-level uniform dither on every sample (~ -38 dB vs the tone),
    // the quantization-noise shape a lossy re-encode leaves behind;
    // impulse spikes are broadband and legitimately move more bits
    val base = tone(Seq(440.0, 880.0))
    val noisy = base.indices.map { i =>
      (base(i) + ((i * 40503L >>> 3) % 41 - 20)).toShort
    }.toArray
    assert(popcount(AudioHash.ahash(base), AudioHash.ahash(noisy)) <= 3)
  }

  test("ahashTable + hammingPairs find planted near-dups, differential vs brute force") {
    import spark.implicits._
    val clips = for (fam <- 0 until 8; v <- 0 until 3) yield {
      val base = tone(Seq(200.0 + fam * 97.0, 700.0 + fam * 151.0))
      val s = base.clone()
      var k = 0
      while (k < v * 15) { // sparse per-variant perturbation
        val i = (k * 197 + v * 13) % s.length
        s(i) = (s(i) + 250).min(Short.MaxValue).toShort
        k += 1
      }
      (fam * 3L + v, Codecs.encodeWavPcm16(s, 8000))
    }
    val docs = clips.toDF("doc_id", "wav")
    val hashes = AudioHash.ahashTable(docs, "doc_id", "wav")
    val got = AudioHash.hammingPairs(hashes, "doc_id", maxDist = 3)
      .select("doc_a", "doc_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = hashes.as[(Long, Long)].collect().toMap
    assert(hs.size == 24)
    val expect = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = popcount(hs(a), hs(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == expect)
    assert(expect.exists { case (a, b, _) => a / 3 == b / 3 },
      "no within-family near-dup found")
  }
}
