package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Redirect resolution by pointer doubling: chain lengths and finals vs a
  * sequential-walk reference, planted cycles (pure and tail-into-cycle),
  * the maxHops budget, functional-graph dedup, and log-round coverage of
  * long chains.
  */
class RedirectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("redirect-spec").getOrCreate()

  private def run(edges: Seq[(String, String)], maxHops: Int = 32)
      : Map[String, (Option[String], Option[Long], String)] = {
    import spark.implicits._
    WebOps.resolveRedirects(edges.toDF("src", "dst"), maxHops)
      .collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3))))
      .toMap
  }

  /** Sequential walk reference over the min-dst functional graph. */
  private def brute(edges: Seq[(String, String)], maxHops: Int)
      : Map[String, (Option[String], Option[Long], String)] = {
    val nxt = edges.filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).min }
    nxt.keys.map { s =>
      var cur = s; var hops = 0L; var ok = false
      while (!ok && hops <= maxHops * 2L + 2 && nxt.contains(cur)) {
        cur = nxt(cur); hops += 1
        ok = !nxt.contains(cur)
      }
      if (ok && hops <= maxHops * 2L + 2)
        s -> ((Some(cur), Some(hops), "resolved"))
      else s -> ((None, None, "cycle_or_long"))
    }.toMap
  }

  test("straight chains resolve with exact hop counts") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    val got = run(edges)
    assert(got("a") === ((Some("d"), Some(3L), "resolved")))
    assert(got("b") === ((Some("d"), Some(2L), "resolved")))
    assert(got("c") === ((Some("d"), Some(1L), "resolved")))
  }

  test("pure cycles and tails into cycles are flagged, not resolved") {
    val edges = Seq("x" -> "y", "y" -> "z", "z" -> "x", // 3-cycle
      "t" -> "x", // tail into the cycle
      "a" -> "b") // healthy chain alongside
    val got = run(edges)
    for (s <- Seq("x", "y", "z", "t"))
      assert(got(s) === ((None, None, "cycle_or_long")), s)
    assert(got("a") === ((Some("b"), Some(1L), "resolved")))
  }

  test("a 100-hop chain resolves inside the log-round budget") {
    val edges = (0 until 100).map(i => s"u$i" -> s"u${i + 1}")
    val got = run(edges, maxHops = 128)
    assert(got("u0") === ((Some("u100"), Some(100L), "resolved")))
    assert(got("u99") === ((Some("u100"), Some(1L), "resolved")))
  }

  test("multiple outgoing redirects collapse deterministically to min dst") {
    val got = run(Seq("a" -> "c", "a" -> "b", "b" -> "d"))
    // a -> b (min) -> d
    assert(got("a") === ((Some("d"), Some(2L), "resolved")))
  }

  test("brute differential over a mixed deterministic graph") {
    val edges = (0 until 150).map { i =>
      val s = (i * i * 7 + i * 3 + 1) % 60
      val d = (i * i * 11 + i * 5 + 2) % 60
      (s"n$s", s"n$d")
    }.filter(e => e._1 != e._2)
    assert(run(edges, 64) === brute(edges, 64))
  }
}
