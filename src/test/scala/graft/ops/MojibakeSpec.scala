package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mojibake repair (fixEncoding) pinned against JVM-computed ground
  * truth: the reference corruption is built here with the real
  * charset codecs (new String(s.getBytes(UTF_8), ISO_8859_1)), so the
  * expected repairs are independent of the Spark expressions.
  */
class MojibakeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("mojibake-spec").getOrCreate()

  import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
  private def corrupt(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)

  private def fix(inputs: Seq[String], passes: Int = 2): Seq[String] = {
    import spark.implicits._
    inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
      .select(col("id"), TextOps.fixEncoding(col("s"), passes).as("f"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
  }

  test("repairs single mojibake of accents, CJK, em-dash, NBSP artifact") {
    val originals = Seq("café au lait", "漢字テスト", "a — dash", "non breaking")
    assert(fix(originals.map(corrupt)) === originals)
  }

  test("repairs double mojibake with two passes, not one") {
    val orig = "naïve résumé"
    val twice = corrupt(corrupt(orig))
    assert(fix(Seq(twice), passes = 2) === Seq(orig))
    assert(fix(Seq(twice), passes = 1) === Seq(corrupt(orig)))
  }

  test("leaves clean text alone: ASCII, real Latin-1, real Unicode, repaired output") {
    val keep = Seq(
      "plain ascii only",
      "café genuine latin-1", // é bytes are invalid UTF-8 -> untouched
      "already fixed — café 漢",   // > U+00FF chars: not latin1able
      "")
    assert(fix(keep) === keep)
  }

  test("idempotent: fixing a fixed string changes nothing") {
    val originals = Seq("café", "漢字", "ünïcödé mix")
    val fixedOnce = fix(originals.map(corrupt))
    assert(fix(fixedOnce) === fixedOnce)
  }

  test("truncated multi-byte corruption is rejected, not half-repaired") {
    // cut the corrupted bytes mid-sequence: Latin-1 re-encode is no
    // longer valid UTF-8, so the certificate must refuse
    val broken = corrupt("café").dropRight(1)
    assert(fix(Seq(broken)) === Seq(broken))
  }

  test("rejects passes < 1") {
    intercept[IllegalArgumentException](TextOps.fixEncoding(col("x"), 0))
  }
}
