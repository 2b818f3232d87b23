package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // deterministic clustered embeddings: 8 well-separated centers in R^16,
  // 40 points each with small structured offsets
  private def fixture() = {
    import spark.implicits._
    (0L until 320L).map { id =>
      val c = (id % 8).toInt
      val emb = Array.tabulate(16) { d =>
        val center = if (d % 8 == c) 10.0f else 0.0f
        center + ((id * 31 + d * 7) % 5).toFloat * 0.1f
      }
      (id, emb.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("nprobe = nlist reproduces exact brute-force top-k") {
    val e = fixture()
    val exact = Similarity.annTopK(e, probeMaxId = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(e, probeMaxId = 20, k = 5,
      nlist = 8, nprobe = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf === exact)
  }

  test("partial probing keeps high recall on clustered data") {
    val e = fixture()
    val exact = Similarity.annTopK(e, probeMaxId = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, probeMaxId = 20, k = 5,
      nlist = 8, nprobe = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("centroid training is deterministic across runs") {
    val e = fixture()
    val a = Similarity.ivfCentroids(e, nlist = 8, iters = 2, seed = 41)
    val b = Similarity.ivfCentroids(e, nlist = 8, iters = 2, seed = 41)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("cosineDupPairs finds planted near-dups, verified >= threshold") {
    import spark.implicits._
    // clustered fixture: same-cluster pairs have cosine ~= 1 (tiny
    // structured offsets on a strong center), cross-cluster ~ 0
    val e = fixture()
    val got = Similarity.cosineDupPairs(e, threshold = 0.9,
        numPlanes = 16, bands = 2, capPerBucket = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.nonEmpty)
    // every emitted pair is same-cluster and really >= threshold
    got.foreach { case (a, b, c) =>
      assert(a < b && a % 8 == b % 8, s"cross-cluster pair ($a,$b)")
      assert(c >= 0.9 && c <= 1.0 + 1e-12)
    }
    // LSH with a generous cap must recover the bulk of same-cluster
    // pairs: same-cluster buckets collide on most bands
    assert(got.length >= 1000, s"only ${got.length} of 8*C(40,2)=6240 pairs")
  }
}
