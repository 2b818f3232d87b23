package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring (k-token window) dedup vs an independent
  * single-threaded reference (plain collections, same winner rule).
  */
class SubstrDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("substr-dedup-spec").getOrCreate()

  /** Reference: enumerate every k-window occurrence, pick min (doc,pos)
    * winner per duplicated window, erase loser spans, reassemble.
    */
  private def ref(corpus: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      i <- 0 to ts.length - k
      if ts.length >= k
    } yield (ts.slice(i, i + k).mkString(" "), id, i)
    val byKey = occ.groupBy(_._1).filter(_._2.size > 1)
    val losers = byKey.values.flatMap { os =>
      val sorted = os.sortBy(o => o._2 * 1048576L + o._3)
      sorted.tail.map(o => (o._2, o._3))
    }.toSeq
    val coveredByDoc = losers.groupBy(_._1).map { case (id, ss) =>
      id -> ss.flatMap { case (_, s) => s until s + k }.toSet
    }
    toks.map { case (id, ts) =>
      val covered = coveredByDoc.getOrElse(id, Set.empty)
      val kept = ts.zipWithIndex.filterNot { case (_, i) => covered(i) }.map(_._1)
      id -> (ts.length.toLong, (ts.length - kept.length).toLong, kept.mkString(" "))
    }
  }

  private def run(corpus: Seq[(Long, String)], k: Int, hashKey: Boolean,
                  parts: Int = 4): Map[Long, (Long, Long, String)] = {
    val s = spark
    import s.implicits._
    TextOps.substringDedup(corpus.toDF("doc_id", "text").repartition(parts), k, hashKey)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("hand case: second occurrence of a shared 8-token run is erased") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (0L, s"alpha $shared omega"),
      (1L, s"pre $shared post tail"))
    val got = run(corpus, k = 8, hashKey = true)
    assert(got(0L) == ((10L, 0L, s"alpha $shared omega"))) // winner untouched
    assert(got(1L) == ((11L, 8L, "pre post tail")))        // span erased
  }

  test("matches the independent reference on a planted-dup random corpus") {
    val rnd = new scala.util.Random(77)
    // small vocab + planted runs => real window collisions
    val base = Seq.tabulate(40) { id =>
      val n = 5 + rnd.nextInt(30)
      (id.toLong, Seq.fill(n)("t" + rnd.nextInt(12)).mkString(" "))
    }
    val plant = (1 to 9).map(i => s"p$i").mkString(" ")
    val corpus = base.map { case (id, t) =>
      if (id % 5 == 0) (id, s"$t $plant") else (id, t)
    }
    val want = ref(corpus, 8)
    assert(run(corpus, 8, hashKey = true) == want)
    assert(run(corpus, 8, hashKey = false) == want) // oracle-mirror keying agrees
    assert(run(corpus, 8, hashKey = true, parts = 1) == want) // parallelism-invariant
  }

  test("documents shorter than k pass through untouched") {
    val corpus = Seq((0L, "a b c"), (1L, "a b c"), (2L, ""))
    val got = run(corpus, k = 8, hashKey = true)
    assert(got(0L) == ((3L, 0L, "a b c")))
    assert(got(1L) == ((3L, 0L, "a b c")))
    assert(got(2L) == ((0L, 0L, "")))
  }

  test("worst case — every window of a 10^5-token doc loses — stays linear") {
    // VERDICT r4 #4: the old per-token exists(starts, …) was
    // O(n_tokens × n_losers) per doc; two identical 1e5-token docs make
    // the second lose EVERY window (≈1e5 loser starts), i.e. ~1e10 span
    // probes under the quadratic form — minutes-to-hours in one task.
    // The two-pointer erase_spans is O(n + m) and finishes in seconds.
    val n = 100000
    val k = 8
    // unique tokens => no windows repeat WITHIN a doc, so the winner doc
    // is untouched and the loser doc loses every single window
    val text = (0 until n).map(i => s"t$i").mkString(" ")
    val t0 = System.nanoTime()
    val got = run(Seq((0L, text), (1L, text)), k = k, hashKey = true, parts = 2)
    val secs = (System.nanoTime() - t0) / 1e9
    // winner doc keeps everything; loser doc is fully erased (every
    // position of doc 1 is covered by some losing window)
    assert(got(0L) == ((n.toLong, 0L, text)))
    assert(got(1L)._1 == n.toLong)
    assert(got(1L)._2 == n.toLong, s"expected full erase, got ${got(1L)._2}")
    assert(got(1L)._3.isEmpty)
    assert(secs < 60.0, f"span erase took $secs%.1f s — quadratic regression?")
  }
}
