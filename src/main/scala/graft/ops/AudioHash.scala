package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual audio fingerprinting — the audio twin of [[ImageHash]]:
  * a clip's log-magnitude spectrogram on a 32×32 (band × frame) grid is
  * hashed by exactly the pHash recipe (2-D DCT-II → low-frequency block
  * → median threshold → 64-bit code), and near-dups reuse the pigeonhole
  * hamming join (banding lossless at ≤3 bits; hot buckets capped — see
  * ImageHash.hammingPairs for the recall contract). The spectrogram is a 32-bin DFT per frame
  * (naive Goertzel-style sums — 32 frames × 32 bins × frame length,
  * trivial next to codec work), log-compressed so level differences
  * become additive and the DC-excluded DCT absorbs them: the hash is
  * invariant to uniform gain, the audio analog of brightness.
  *
  * Scale shape: hashing is a zero-shuffle partition map; pairing is the
  * banded equi-join. Published-recipe lineage: spectrogram-peak /
  * Haitsma-Kalker-style subfingerprints share the same spectral-hash
  * idea; this whole-clip form is the corpus-dedup variant.
  */
object AudioHash {

  final val Frames = ImageHash.Grid // 32 time frames
  final val Bands = ImageHash.Grid  // 32 frequency bins

  /** Per-clip dynamic-range floor: bins more than this factor below the
    * clip's peak bin are clamped to the floor (−40 dB). Near-silent bins
    * are where a log spectrogram is unstable — any noise floor swings
    * them by tens of dB and flips hash bits; clamping makes the hash a
    * function of the clip's STRUCTURE, not its silence.
    */
  final val FloorRatio = 1e-2

  /** 32×32 floored log-magnitude spectrogram of the clip: the clip is
    * split into `Frames` equal windows; each window contributes `Bands`
    * DFT magnitude bins at k = 1..Bands (k=0 — the frame mean — is
    * skipped). Values are log(mag / floor) clamped at 0 with
    * floor = peak·FloorRatio — NORMALIZED, so a uniform gain change
    * rescales peak and floor together and the grid is bit-identical
    * (exact gain invariance, the audio analog of pHash's brightness
    * invariance).
    */
  def spectrogram(samples: Array[Short]): Array[Double] = {
    require(samples.length >= Frames, s"clip too short: ${samples.length} samples")
    val mags = new Array[Double](Frames * Bands)
    val frameLen = samples.length / Frames
    // Twiddle table keyed by frameLen, built once per clip and shared by
    // every (frame, bin): the DFT angle 2π·k·i/L only depends on k·i mod L,
    // so 2·L trig calls replace 2·Frames·Bands·L (~0.5M for an 8k-sample
    // clip — the DFT dominated the per-clip cost, not the codec; ADVICE r4).
    val cosTw = new Array[Double](frameLen)
    val sinTw = new Array[Double](frameLen)
    var j = 0
    while (j < frameLen) {
      val ang = 2.0 * math.Pi * j / frameLen
      cosTw(j) = math.cos(ang); sinTw(j) = math.sin(ang)
      j += 1
    }
    var peak = 0.0
    var f = 0
    while (f < Frames) {
      val base = f * frameLen
      var k = 1
      while (k <= Bands) {
        // advance (k·i) mod frameLen by k each step — but k can EXCEED
        // frameLen on short clips (< Frames·Bands samples), where one
        // conditional subtract is not enough to re-wrap; reduce the stride
        // mod frameLen first (identical angles: they only depend on
        // k·i mod frameLen).
        val step = k % frameLen
        var re = 0.0; var im = 0.0
        var i = 0
        var idx = 0
        while (i < frameLen) {
          val v = samples(base + i).toDouble
          re += v * cosTw(idx); im -= v * sinTw(idx)
          idx += step; if (idx >= frameLen) idx -= frameLen
          i += 1
        }
        val m = math.hypot(re, im)
        mags(f * Bands + (k - 1)) = m
        if (m > peak) peak = m
        k += 1
      }
      f += 1
    }
    val floor = math.max(peak * FloorRatio, Double.MinPositiveValue)
    mags.map(m => math.log(math.max(m, floor) / floor))
  }

  /** 64-bit spectral hash: pHash over the spectrogram grid. */
  def ahash(samples: Array[Short]): Long =
    ImageHash.blockHash(ImageHash.dct2(spectrogram(samples)))

  /** (id, ahash) from a binary WAV column — zero-shuffle partition map;
    * undecodable rows are dropped.
    */
  def ahashTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          scala.util.Try(Codecs.decodeWavPcm16(bytes)).toOption
            .filter(_.samples.length >= Frames)
            .map(a => (id, ahash(a.samples)))
        }
      }
      .toDF(idCol, "phash") // column name matches hammingPairs' contract
  }

  /** Near-dup audio pairs — delegates to the shared pigeonhole hamming
    * join (banding lossless at ≤3 bits; hot buckets capped per bucket —
    * recall contract in ImageHash.hammingPairs).
    */
  def hammingPairs(hashes: DataFrame, idCol: String = "doc_id",
                   maxDist: Int = 3, capPerBucket: Int = 1024): DataFrame =
    ImageHash.hammingPairs(hashes, idCol, maxDist, capPerBucket)

  /** Near-dup audio clusters — the scale form; delegates to
    * ImageHash.phashClusters (identical-hash star contraction + capped
    * band join over distinct hashes + connected components).
    */
  def clusters(hashes: DataFrame, idCol: String = "doc_id",
               maxDist: Int = 3, capPerBucket: Int = 1024): DataFrame =
    ImageHash.phashClusters(hashes, idCol, maxDist, capPerBucket)
}
