package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LpaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Synchronous LPA reference: argmax by (count, min label) per round. */
  private def ref(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var labels = nbrs.keys.map(n => n -> n).toMap
    (1 to rounds).foreach { _ =>
      labels = nbrs.map { case (n, ns) =>
        val counts = ns.map(labels).groupBy(identity).toSeq
          .map { case (l, o) => (o.size, l) }
        // max count, tie -> min label
        n -> counts.sortBy { case (c, l) => (-c, l) }.head._2
      }
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    WebOps.lpaCommunities(edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two cliques with one bridge resolve into two communities") {
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val edges = cliqueA ++ cliqueB ++ Seq((3L, 10L))
    val got = run(edges, 3)
    assert(got == ref(edges, 3))
    // each clique converges onto one label, and they differ
    val la = (0L to 3L).map(got).toSet
    val lb = (10L to 13L).map(got).toSet
    assert(la.size == 1 && lb.size == 1 && la != lb, s"labels: $got")
  }

  test("random graphs match the synchronous reference exactly, rounds 1..4") {
    val rnd = new scala.util.Random(19)
    (1 to 3).foreach { _ =>
      val edges = (0 until 120).map(_ =>
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      (1 to 4).foreach { r =>
        assert(run(edges, r) == ref(edges, r), s"rounds=$r")
      }
    }
  }

  test("a star adopts the hub's label (hub keeps the min neighbor label)") {
    val edges = (1L to 6L).map(l => (0L, l))
    val got = run(edges, 3)
    assert(got == ref(edges, 3))
    assert((1L to 6L).forall(l => got(l) == got(1L)), s"leaves split: $got")
  }
}
