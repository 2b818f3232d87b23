package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Link reciprocity pinned on hand fixtures plus a brute differential. */
class ReciprocitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("reciprocity-spec").getOrCreate()

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    WebOps.reciprocity(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  private def brute(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2).toSet
    e.groupBy(_._1).map { case (h, out) =>
      h -> ((out.size.toLong, out.count(p => e((p._2, p._1))).toLong))
    }
  }

  test("mutual pair counts both sides; one-way counts neither") {
    val got = run(Seq((1L, 2L), (2L, 1L), (1L, 3L)))
    assert(got === Map(1L -> ((2L, 1L)), 2L -> ((1L, 1L))))
  }

  test("duplicates and self-loops are ignored") {
    val got = run(Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 1L)))
    assert(got === Map(1L -> ((1L, 1L)), 2L -> ((1L, 1L))))
  }

  test("sink-only hosts emit no row; brute differential") {
    val organic = (0 until 120).map { i =>
      (((i * i * 29 + i * 5 + 1) % 23).toLong,
        ((i * i * 13 + i * 11 + 4) % 23).toLong)
    }.filter(p => p._1 != p._2)
    // plant reverses of every 5th edge so reciprocity is live
    val edges = organic ++ organic.zipWithIndex.collect {
      case (p, i) if i % 5 == 0 => (p._2, p._1)
    }
    val got = run(edges)
    val want = brute(edges)
    assert(got === want)
    assert(want.values.map(_._2).sum > 0, "fixture needs live reciprocity")
  }
}
