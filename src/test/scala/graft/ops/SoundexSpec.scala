package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Soundex: the NARA published test vectors, the H/W-vs-vowel
  * separation rule, Knuth's equivalence families, and the blocking
  * join's candidate structure.
  */
class SoundexSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("SoundexSpec").getOrCreate()

  private def keysOf(names: Seq[String]): Map[String, String] = {
    import spark.implicits._
    TextOps.soundexKey(names.toDF("name"), "name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("NARA published vectors") {
    val expected = Map(
      "Washington" -> "W252", "Lee" -> "L000", "Gutierrez" -> "G362",
      "Pfister" -> "P236", "Jackson" -> "J250", "Tymczak" -> "T522",
      "Ashcraft" -> "A261", "VanDeusen" -> "V532", "Deusen" -> "D250")
    val got = keysOf(expected.keys.toSeq)
    for ((n, k) <- expected) assert(got(n) == k, s"$n: got ${got(n)} want $k")
  }

  test("H/W separation codes once, vowel separation codes twice") {
    // S-C in Ashcraft are split by H (same code 2 -> coded once: A261);
    // in 'Asecraft' a vowel splits them -> coded twice (A226)
    val got = keysOf(Seq("Ashcraft", "Asecraft", "Honeyman", "White", "Hall"))
    assert(got("Ashcraft") == "A261")
    assert(got("Asecraft") == "A226")
    assert(got("Honeyman") == "H555")
    // H/W as the SAVED first letter still heads the key
    assert(got("White") == "W300")
    assert(got("Hall") == "H400")
  }

  test("Knuth equivalence families block together; distinct families apart") {
    val fams = Seq(
      Seq("Euler", "Ellery"), Seq("Gauss", "Ghosh"),
      Seq("Hilbert", "Heilbronn"), Seq("Knuth", "Kant"),
      Seq("Lukasiewicz", "Lissajous"), Seq("Robert", "Rupert"),
      Seq("Smith", "Smyth", "Schmidt"))
    val got = keysOf(fams.flatten)
    for (f <- fams)
      assert(f.map(got).toSet.size == 1, s"family $f split: ${f.map(got)}")
    assert(fams.map(f => got(f.head)).toSet.size == fams.size, "families collided")
    assert(got("Smith") == "S530" && got("Robert") == "R163")
  }

  test("case-insensitive and stable on short names") {
    val got = keysOf(Seq("lee", "LEE", "A", "Ng"))
    assert(got("lee") == "L000" && got("LEE") == "L000")
    assert(got("A") == "A000")
    assert(got("Ng") == "N200")
  }

  test("blocked pairs are exactly the within-key id-ordered pairs") {
    import spark.implicits._
    val df = Seq((0L, "Smith"), (1L, "Smyth"), (2L, "Schmidt"), (3L, "Lee"))
      .toDF("name_id", "name")
    val pairs = TextOps.soundexPairs(df, "name_id", "name")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }
}
