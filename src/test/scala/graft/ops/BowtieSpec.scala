package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BowtieSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def classesOf(edges: Seq[(Long, Long)], seeds: Seq[Long],
                        maxHops: Int = 8): Map[Long, String] = {
    import spark.implicits._
    WebOps.bowtie(edges.toDF("src", "dst"), seeds.toDF("host"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
  }

  // core cycle 0->1->2->0, in-chain 10->0, out-chain 2->20,
  // tendril 10->30 (hangs off IN), disconnected pair 40<->41
  private val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 0L), (2L, 20L),
    (10L, 30L), (40L, 41L), (41L, 40L))

  test("core / in / out / tendril / disconnected classify per Broder") {
    val got = classesOf(g, Seq(0L))
    assert(got == Map(0L -> "core", 1L -> "core", 2L -> "core",
      10L -> "in", 20L -> "out", 30L -> "other",
      40L -> "other", 41L -> "other"))
  }

  test("hop budget 0 collapses everything but the seed to other") {
    val got = classesOf(g, Seq(0L), maxHops = 0)
    assert(got(0L) == "core")
    assert(got.filterNot(_._1 == 0L).values.forall(_ == "other"))
  }

  test("hop distances are min-hop and null exactly off-class") {
    import spark.implicits._
    val rows = WebOps.bowtie(g.toDF("src", "dst"), Seq(0L).toDF("host"), 8)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)),
         if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(rows(0L) == (Some(0), Some(0)))
    assert(rows(1L) == (Some(1), Some(2))) // back to 0 via 2
    assert(rows(10L) == (None, Some(1)))   // in: reaches 0, never reached
    assert(rows(20L) == (Some(3), None))   // out: 0->1->2->20
    assert(rows(30L) == (None, None))
  }
}
