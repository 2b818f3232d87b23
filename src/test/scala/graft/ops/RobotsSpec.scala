package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt parsing + RFC 9309 longest-match decisions pinned on hand
  * fixtures: group selection (star vs named agents, multi-UA groups),
  * longest-match override, allow-wins-ties, empty Disallow, missing
  * robots.txt, and directive case-insensitivity.
  */
class RobotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("robots-spec").getOrCreate()

  private def rulesOf(host: String, txt: String): Set[(String, Boolean)] = {
    import spark.implicits._
    WebOps.parseRobots(Seq((host, txt)).toDF("host", "robots_txt"))
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSet
  }

  test("parse: only star groups contribute; multi-UA groups count") {
    val txt =
      """User-Agent: megabot
        |Disallow: /mega
        |
        |User-Agent: otherbot
        |User-Agent: *
        |Disallow: /a
        |Allow: /a/b
        |
        |User-Agent: thirdbot
        |Disallow: /third""".stripMargin
    assert(rulesOf("h", txt) === Set(("/a", false), ("/a/b", true)))
  }

  test("parse: directive names case-insensitive, empty Disallow dropped") {
    val txt = "USER-AGENT: *\nDISALLOW: /X\nallow: /Xy\nDisallow:\nnoise line"
    assert(rulesOf("h", txt) === Set(("/X", false), ("/Xy", true)))
  }

  test("crawl-delay: star group only, max wins, invalid drops, fractional") {
    import spark.implicits._
    val txt =
      """User-Agent: megabot
        |Crawl-delay: 99
        |
        |User-Agent: *
        |Disallow: /a
        |Crawl-Delay: 2
        |crawl-delay: 3.5
        |Crawl-delay: soon""".stripMargin
    val got = WebOps.crawlDelays(Seq(("h", txt)).toDF("host", "robots_txt"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === Map("h" -> ((3.5, 2L))))
  }

  test("crawl-delay: hosts without a star-group directive emit no row") {
    import spark.implicits._
    val rows = Seq(
      ("named", "User-Agent: megabot\nCrawl-delay: 10"),
      ("none", "User-Agent: *\nDisallow: /x"))
    val got = WebOps.crawlDelays(rows.toDF("host", "robots_txt")).collect()
    assert(got.isEmpty)
  }

  test("decisions: longest match wins, allow wins length ties, default allow") {
    import spark.implicits._
    val rules = Seq(
      ("h", "/priv", false), ("h", "/priv/ok", true), // longer allow carve-out
      ("h", "/tie", false), ("h", "/tie", true),      // tie -> allow
      ("h", "/blocked", false))
      .toDF("host", "prefix", "allow")
    val pages = Seq(
      (1L, "https://h/priv/x"), (2L, "https://h/priv/ok/x"),
      (3L, "https://h/tie"), (4L, "https://h/free"),
      (5L, "https://h/blocked"), (6L, "https://nobots.example/anything"))
      .toDF("doc_id", "url")
    val got = WebOps.robotsFilter(pages, rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true,
      4L -> true, 5L -> false, 6L -> true))
  }

  test("paths: root url maps to '/', prefix match is case-sensitive") {
    import spark.implicits._
    val rules = Seq(("h", "/", false), ("h", "/CaseSensitive", true))
      .toDF("host", "prefix", "allow")
    val pages = Seq(
      (1L, "https://h"), (2L, "https://h/"),
      (3L, "https://h/CaseSensitive/x"), (4L, "https://h/casesensitive/x"))
      .toDF("doc_id", "url")
    val got = WebOps.robotsFilter(pages, rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // '/' disallow blocks everything except the longer allow carve-out
    assert(got === Map(1L -> false, 2L -> false, 3L -> true, 4L -> false))
  }

  test("end-to-end: parse then filter on a two-host corpus") {
    import spark.implicits._
    val robots = Seq(
      ("a.example", "User-Agent: *\nDisallow: /no"),
      ("b.example", "User-Agent: onlybot\nDisallow: /")) // no star group
      .toDF("host", "robots_txt")
    val pages = Seq(
      (1L, "https://a.example/no/1"), (2L, "https://a.example/yes/1"),
      (3L, "https://b.example/no/1"))
      .toDF("doc_id", "url")
    val got = WebOps.robotsFilter(pages, WebOps.parseRobots(robots))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("sitemaps are harvested group-independently, in document order") {
    import spark.implicits._
    val robots = Seq(
      ("a.example",
        "Sitemap: https://a.example/top.xml\n" +   // before any group
        "User-Agent: onlybot\nDisallow: /\n" +
        "SITEMAP: https://a.example/in-named-group.xml\n" + // inside a NAMED group — still applies
        "User-Agent: *\nDisallow: /x\n" +
        "sitemap:https://a.example/nospace.xml\n" +  // no space after colon
        "sitemapfoo: junk\n" +                       // lookalike directive
        "Sitemap:\n" +                               // empty value
        "Sitemap: https://a.example/last.xml"),
      ("b.example", "User-Agent: *\nDisallow: /"))   // no sitemaps at all
      .toDF("host", "robots_txt")
    val got = WebOps.sitemaps(robots)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .sortBy(_._3)
    assert(got.forall(_._1 == "a.example"))
    assert(got.map(_._2).toSeq === Seq(
      "https://a.example/top.xml",
      "https://a.example/in-named-group.xml",
      "https://a.example/nospace.xml",
      "https://a.example/last.xml"))
    assert(got.map(_._3).toSeq === got.map(_._3).toSeq.sorted,
      "ordinals must preserve document order")
  }
}
