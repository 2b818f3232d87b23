package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Degree-ordered triangle counting pinned on closed-form graphs (K3+
  * pendant, K4, triangle-free star/path) plus a brute-force differential
  * on a deterministic pseudo-random graph and input-hygiene cases
  * (direction, duplicates, self-loops must not matter).
  */
class TriangleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("triangle-spec").getOrCreate()

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    WebOps.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  /** All-triples reference counter over the canonical undirected graph. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val deg = nodes.map(n => n -> und.count(e => e._1 == n || e._2 == n).toLong).toMap
    val tri = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      Seq(x, y, z) <- nodes.combinations(3)
      if und((x, y)) && und((x, z)) && und((y, z))
      n <- Seq(x, y, z)
    } tri(n) += 1
    nodes.map(n => n -> ((deg(n), tri(n)))).toMap
  }

  test("K3 with a pendant: the triangle nodes count 1, the pendant 0") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(got === Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)),
      3L -> ((3L, 1L)), 4L -> ((1L, 0L))))
  }

  test("K4: every node sits in 3 of the 4 triangles") {
    val edges = for {
      i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (i, j)
    val got = run(edges)
    assert(got === (1L to 4L).map(n => n -> ((3L, 3L))).toMap)
  }

  test("triangle-free graphs count zero everywhere (star, path)") {
    val star = run(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert(star.values.forall(_._2 == 0L) && star(0L)._1 == 4L)
    val path = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(path.values.forall(_._2 == 0L))
  }

  test("direction, duplicates, and self-loops do not matter") {
    val base = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val messy = run(Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 1L),
      (1L, 1L), (2L, 2L)))
    assert(messy === base)
  }

  test("brute-force differential on a deterministic pseudo-random graph") {
    // quadratic mixing over 40 nodes -> 32 distinct edges, 16 triangles,
    // repeated degree values (the orientation tie-break goes live)
    val edges = (0 until 160).map { i =>
      val a = (i.toLong * i * 31 + i * 7 + 3) % 40L
      val b = (i.toLong * i * 17 + i * 5 + 11) % 40L
      (a, b)
    }.filter(e => e._1 != e._2)
    val got = run(edges)
    val want = brute(edges)
    assert(got === want)
    assert(want.values.map(_._2).sum > 0L, "fixture must contain triangles")
  }
}
