package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact-rational Lloyd k-means: blob recovery vs a plain double
  * reference, parallelism determinism, and the tie contract.
  */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vecs(rows: Seq[(Long, Double, Double)]) = {
    import spark.implicits._
    rows.map { case (id, a, b) =>
      (id, Array.tabulate(64)(d => if (d == 0) a.toFloat
        else if (d == 1) b.toFloat else 0.0f))
    }.toDF("vec_id", "embedding")
  }

  test("two well-separated blobs recover exactly, any partitioning") {
    // blob A near (0,0), blob B near (10,10) — k=2, seeds are id 1 and
    // the farthest point (in B), margins enormous
    val rows = Seq((1L, 0.0, 0.1), (2L, 0.2, 0.0), (3L, 0.1, 0.2),
      (4L, 10.0, 10.1), (5L, 10.2, 9.9), (6L, 9.9, 10.0))
    val df = vecs(rows)
    val got = Similarity.kMeans(df, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(1L, 2L, 3L).map(got) === Set(got(1L)))
    assert(Set(4L, 5L, 6L).map(got) === Set(got(4L)))
    assert(got(1L) !== got(4L))
    val re = Similarity.kMeans(df.repartition(7), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(re === got)
  }

  test("assignment matches a double reference when margins are wide") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 40L).map { id =>
      val cx = if (id % 3 == 0) 0.0 else if (id % 3 == 1) 8.0 else -7.0
      val cy = if (id % 3 == 0) 5.0 else if (id % 3 == 1) -4.0 else 0.0
      (id, cx + rnd.nextDouble() * 0.5, cy + rnd.nextDouble() * 0.5)
    }
    val got = Similarity.kMeans(vecs(rows), k = 3, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference Lloyd in doubles over the quantized ints, same seeds
    def q(x: Double) = math.round(x * 1000).toDouble
    val pts = rows.map { case (id, a, b) => id -> Array(q(a), q(b)) }.toMap
    // Gonzalez seeds: start at min id, then farthest (ties lowest id)
    var seeds = List(1L)
    while (seeds.size < 3) {
      val far = pts.keys.toSeq.sortBy(identity).maxBy { id =>
        seeds.map(s => math.pow(pts(id)(0) - pts(s)(0), 2)
          + math.pow(pts(id)(1) - pts(s)(1), 2)).min
      }
      seeds = seeds :+ far
    }
    var cent = seeds.map(s => pts(s)).toArray
    var asg: Map[Long, Int] = Map.empty
    for (t <- 1 to 3) {
      asg = pts.map { case (id, p) =>
        id -> cent.indices.minBy(c =>
          (math.pow(p(0) - cent(c)(0), 2) + math.pow(p(1) - cent(c)(1), 2), c))
      }
      if (t < 3) cent = cent.indices.map { c =>
        val mem = pts.filter(kv => asg(kv._1) == c).values.toSeq
        if (mem.isEmpty) cent(c)
        else Array(mem.map(_(0)).sum / mem.size, mem.map(_(1)).sum / mem.size)
      }.toArray
    }
    assert(got === asg)
  }

  test("equidistant point takes the lower center index") {
    // k=2: seeds 1 (pos 0) and 2 (pos 10); point 3 at exactly 5 —
    // d² equal → cluster 0 by the fold contract (iters=1: no update)
    val rows = Seq((1L, 0.0, 0.0), (2L, 10.0, 0.0), (3L, 5.0, 0.0))
    val got = Similarity.kMeans(vecs(rows), k = 2, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(3L) === 0)
    assert(got(1L) === 0 && got(2L) === 1)
  }
}
