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

  private def modRow(edges: Seq[(Long, Long)], labels: Map[Long, Long]) = {
    import spark.implicits._
    WebOps.modularity(edges.toDF("src", "dst"),
      labels.toSeq.toDF("host", "community")).collect()(0)
  }

  test("modularity: whole-graph partition is exactly 0") {
    val edges = for (a <- 0L to 5L; b <- 0L to 5L if a < b && (a + b) % 3 != 0) yield (a, b)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val r = modRow(edges, nodes.map(_ -> 0L).toMap)
    assert(r.getLong(r.fieldIndex("q_num")) === 0L)
    assert(r.getLong(r.fieldIndex("q_ppm")) === 0L)
  }

  test("modularity: two disconnected cliques at own labels score 1/2") {
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val labels = ((0L to 3L).map(_ -> 0L) ++ (10L to 13L).map(_ -> 1L)).toMap
    val r = modRow(cliqueA ++ cliqueB, labels)
    // e2_sum = 2m (all intra), d2_sum = 2·(m)² where per-clique degree
    // sum = m = two_m/2 → Qnum = two_m²/2 → Q = 1/2 exactly
    assert(r.getLong(r.fieldIndex("q_ppm")) === 500000L)
    assert(r.getLong(r.fieldIndex("n_communities")) === 2L)
  }

  test("modularity: BigInt reference on a seeded random partition") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 150).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).distinct
    val sym = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    val nodes = sym.map(_._1).distinct
    val labels = nodes.map(n => n -> (n % 5)).toMap
    val r = modRow(edges, labels)
    val twoM = BigInt(sym.size)
    val e2 = BigInt(sym.count { case (u, v) => labels(u) == labels(v) })
    val d2 = nodes.groupBy(labels).values
      .map(ns => BigInt(ns.map(n => sym.count(_._1 == n)).sum).pow(2)).sum
    val qnum = twoM * e2 - d2
    assert(BigInt(r.getLong(r.fieldIndex("q_num"))) === qnum)
    val den = twoM * twoM
    val want = if (qnum >= 0) qnum * 1000000 / den else -((-qnum) * 1000000 / den)
    assert(BigInt(r.getLong(r.fieldIndex("q_ppm"))) === want)
  }
}
