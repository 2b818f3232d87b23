package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup end-to-end composition: cosine near-dup pairs → star
  * contraction → per-vector cluster labels, checked against a
  * union-find reference built from the engine's own verified pair set
  * (pair correctness itself is pinned by the emb_dup_pairs oracle and
  * the LSH/verify specs).
  */
class EmbClustersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def embeddings(n: Int, dim: Int, groups: Int) = {
    import spark.implicits._
    // planted family structure: vector i is its group's centroid plus a
    // small deterministic per-vector perturbation — in-group cosines are
    // high, cross-group cosines low
    (0 until n).map { i =>
      val g = i % groups
      val rnd = new scala.util.Random(g * 7919)
      val centroid = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val jig = new scala.util.Random(i * 104729 + 13)
      val v = centroid.map(x => (x + jig.nextDouble() * 0.05).toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def unionFind(n: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("cluster labels equal union-find over the engine's verified pairs") {
    val emb = embeddings(120, 16, 6)
    val pairDf = Similarity.cosineDupPairs(emb, threshold = 0.9,
      numPlanes = 16, bands = 2, capPerBucket = 128)
    val pairs = pairDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.size > 100, s"planted groups should pair densely: ${pairs.size}")
    val want = unionFind(120, pairs)

    val cc = Dedup.connectedComponents(
      pairDf.select(col("vec_a").as("src"), col("vec_b").as("dst")))
    val got = emb.select(col("vec_id"))
      .join(cc, col("vec_id") === col("node"), "left")
      .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // the planted structure itself: ≤ groups distinct clusters among
    // paired vectors, and in-group vectors co-cluster
    assert(got.values.toSet.size <= 120)
    assert(got(0L) == got(6L) || !pairs.contains((0L, 6L)))
  }

  test("threshold 1.0+ leaves every vector a singleton") {
    val emb = embeddings(40, 8, 4)
    val pairDf = Similarity.cosineDupPairs(emb, threshold = 1.01,
      numPlanes = 16, bands = 2, capPerBucket = 128)
    assert(pairDf.count() == 0)
    val cc = Dedup.connectedComponents(
      pairDf.select(col("vec_a").as("src"), col("vec_b").as("dst")))
    val got = emb.select(col("vec_id"))
      .join(cc, col("vec_id") === col("node"), "left")
      .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.forall { case (id, cl) => id == cl })
  }
}
