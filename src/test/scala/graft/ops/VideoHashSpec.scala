package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class VideoHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val W = 48; private val H = 32

  /** Gray frame fi of family fam — pattern drifts with fi so a clip has
    * temporal structure; `bump` perturbs sparse pixels (a near-dup).
    */
  private def frame(fam: Int, fi: Int, bump: Int): Array[Byte] =
    Array.tabulate[Byte](W * H) { j =>
      val x = j % W; val y = j / W
      val v = (128 + 100 * math.sin((x + fi * 3) * (fam + 1) * 0.2) *
        math.cos(y * (fam + 2) * 0.15)).toInt.max(0).min(255)
      val d = if (bump > 0 && j % 197 < bump) 5 else 0
      ((v + d).min(255) & 0xff).toByte
    }

  private def avi(fam: Int, bump: Int, nFrames: Int = 9): Array[Byte] =
    Codecs.encodeAvi(W, H, 33333, (0 until nFrames).map(fi => frame(fam, fi, bump)))

  test("frameHashTable: one hash per sampled aligned frame, deterministic") {
    import spark.implicits._
    val docs = Seq((1L, avi(0, 0)), (2L, avi(1, 0))).toDF("doc_id", "avi")
    val a = VideoHash.frameHashTable(docs.repartition(1), "doc_id", "avi", stride = 3)
      .as[(Long, Int, Long)].collect().toSet
    val b = VideoHash.frameHashTable(docs.repartition(5), "doc_id", "avi", stride = 3)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    assert(a.map(_._2) == Set(0, 3, 6)) // every 3rd of 9 frames
    assert(a.count(_._1 == 1L) == 3)
  }

  test("frameHashTable rejects stride < 1 at plan build, not inside executor tasks") {
    import spark.implicits._
    val docs = Seq((1L, avi(0, 0))).toDF("doc_id", "avi")
    intercept[IllegalArgumentException] {
      VideoHash.frameHashTable(docs, "doc_id", "avi", stride = 0)
    }
    intercept[IllegalArgumentException] {
      VideoHash.frameHashTable(docs, "doc_id", "avi", stride = -2)
    }
  }

  test("nearDupPairs equals brute force; alignment separates clip dups from shared stills") {
    import spark.implicits._
    // 5 families x 3 variants (bump 0/1/2) + one clip that REUSES family
    // 0's first frame but then diverges (a shared still, not a dup clip)
    val clips = (for (fam <- 0 until 5; v <- 0 until 3)
      yield (fam * 3L + v, avi(fam, v))) :+
      (90L, Codecs.encodeAvi(W, H, 33333,
        frame(0, 0, 0) +: (1 until 9).map(fi => frame(4, fi + 3, 0))))
    val docs = clips.toDF("doc_id", "avi")
    val fh = VideoHash.frameHashTable(docs, "doc_id", "avi", stride = 3)
    val got = VideoHash.nearDupPairs(fh, "doc_id", maxDist = 3, minMatchFrames = 2)
      .select("doc_a", "doc_b", "n_matched")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

    // brute force from the collected frame hashes
    val hs = fh.as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val ids = hs.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices; j <- ids.indices if i < j
      a = ids(i); b = ids(j)
      n = hs(a).keySet.intersect(hs(b).keySet)
        .count(k => java.lang.Long.bitCount(hs(a)(k) ^ hs(b)(k)) <= 3)
      if n >= 2
    } yield (a, b) -> n).toMap
    assert(got == expect)
    // planted same-family variants are found
    assert(expect.exists { case ((a, b), _) => a / 3 == b / 3 && a != 90L && b != 90L })
    // the shared-still clip matches family 0 on at most one position, so
    // it never pairs with 0..2 at minMatchFrames=2
    got.keys.foreach { case (a, b) =>
      assert(!(b == 90L && a <= 2L), s"shared-still clip paired as dup with $a")
    }
  }
}
