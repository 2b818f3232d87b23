package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Mixture rebalancing semantics: largest-achievable corpus, binding
  * class kept whole, absent classes dropped, and the deterministic hash
  * draw reproduced bit-for-bit against a JVM md5 reference.
  */
class SelectionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def u01(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
  }

  test("sampleToMix: binding class whole, others thinned by exact hash draw") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, if (i < 24) "a" else if (i < 36) "b" else "c"))
    val df = rows.toDF("doc_id", "lang")
    // counts: a=24, b=12, c=4; targets a:.5, b:.5 -> M = min(48, 24) = 24
    // p_a = 24*.5/24 = .5, p_b = 24*.5/12 = 1.0; c dropped entirely
    val got = Selection.sampleToMix(df, "doc_id", "lang", Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(_._1 != "c"))
    val (bs, as) = got.partition(_._1 == "b")
    assert(bs.map(_._2).toSet == (24L until 36L).toSet) // binding class kept whole
    assert(bs.forall(_._3 == 1.0) && as.forall(_._3 == 0.5))
    val expectA = (0L until 24L).filter(u01(_) < 0.5).toSet
    assert(as.map(_._2).toSet == expectA)
  }

  test("sampleToMix requires a present target class") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      Selection.sampleToMix(df, "doc_id", "lang", Map("zz" -> 1.0))
    }
  }
}
