package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Video near-dup dedup — the third leg of the multimodal dedup family:
  * sample frames from the container (AVI walk), pHash each sampled frame
  * with [[ImageHash]], and pair clips that agree on ENOUGH temporally
  * ALIGNED frames. Temporal alignment (joining on the frame index) is
  * what separates "same video, re-encoded" from "two videos sharing one
  * still" — a single matching frame is not a duplicate clip.
  *
  * Scale shape: frame hashing is the usual zero-shuffle partition map
  * (one row per sampled frame); pairing reuses the lossless 4×16-bit
  * pigeonhole band join PER FRAME POSITION, then one aggregation counts
  * matched positions per candidate pair — bucket joins end to end,
  * never all-pairs of clips, never cross-position frame joins.
  */
object VideoHash {

  /** (id, frame_idx, phash) for every `stride`-th frame. Frames must be
    * raw planes whose byte length is width·height·c for c ∈ {1, 3, 4};
    * clips that do not decode to that shape are dropped (count upstream
    * if the drop rate matters).
    */
  def frameHashTable(df: DataFrame, idCol: String, binCol: String,
                     stride: Int): DataFrame = {
    require(stride >= 1, s"frameHashTable: stride must be >= 1, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          scala.util.Try(Codecs.decodeAvi(bytes)).toOption.toSeq.flatMap { v =>
            val px = v.width * v.height
            v.frames.zipWithIndex.collect {
              case (f, i) if i % stride == 0 && px > 0 && f.length % px == 0 &&
                Set(1, 3, 4).contains(f.length / px) =>
                (id, i, ImageHash.phash(Codecs.Image(v.width, v.height, f.length / px, f)))
            }
          }
        }
      }
      .toDF(idCol, "frame_idx", "phash")
  }

  /** Clip pairs whose sampled frames agree at >= `minMatchFrames`
    * ALIGNED positions within `maxDist` hamming bits each. Per-position
    * band join (lossless for maxDist <= 3) + popcount verify + one
    * count aggregate. Returns (doc_a, doc_b, n_matched, max_dist).
    *
    * Hot buckets (VERDICT r4 #1): a black/title-card frame repeated
    * across a crawl collapses onto one (frame_idx, band, word) bucket;
    * the index side of every bucket is capped at `capPerBucket` members
    * (deterministic: lowest ids; -1 = uncapped), same shape as
    * ImageHash.hammingPairs — a pair survives when EITHER endpoint made
    * a shared bucket's cap, and the popcount verify runs before the
    * cross-band distinct.
    */
  def nearDupPairs(frameHashes: DataFrame, idCol: String = "doc_id",
                   maxDist: Int = 3, minMatchFrames: Int = 2,
                   capPerBucket: Int = 1024): DataFrame = {
    require(maxDist <= 3, s"4x16-bit pigeonhole is lossless only to distance 3, got $maxDist")
    require(capPerBucket > 0 || capPerBucket == -1,
      s"capPerBucket must be positive, or -1 for uncapped, got $capPerBucket")
    val words = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("phash"), b * 16).bitwiseAND(lit(0xffffL)).as("word"))
    }: _*)
    val banded = frameHashes
      .select(col(idCol).as("id"), col("frame_idx"), col("phash"),
        explode(words).as("bw"))
      .select(col("id"), col("frame_idx"), col("phash"),
        col("bw.band").as("band"), col("bw.word").as("word"))
    val idx =
      if (capPerBucket == -1) banded
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("frame_idx", "band", "word").orderBy("id")
        banded.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= capPerBucket).drop("rn")
      }
    banded.as("a").join(idx.as("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
          col("a.band") === col("b.band") && col("a.word") === col("b.word") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("doc_a"),
        greatest(col("a.id"), col("b.id")).as("doc_b"),
        col("a.frame_idx").as("frame_idx"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("int").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct() // one row per (pair, position) however many bands hit
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).cast("int").as("n_matched"), max("dist").as("max_dist"))
      .filter(col("n_matched") >= minMatchFrames)
  }
}
