package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Registered-domain (eTLD+1) extraction: publicsuffix.org semantics on
  * handcrafted hosts, case handling, and the map-only plan contract
  * (broadcast joins only — a shuffle on the page side would break the
  * op's composability at crawl scale).
  */
class RegDomainSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def suffixes = {
    import spark.implicits._
    Seq("com", "org", "uk", "co.uk", "gov.uk", "sch.uk", "pvt.k12.ma.us")
      .toDF("suffix")
  }

  private def run(hosts: String*): Map[String, Option[String]] = {
    import spark.implicits._
    WebOps.registeredDomain(hosts.toDF("host"), suffixes)
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap
  }

  test("publicsuffix.org semantics on handcrafted hosts") {
    val got = run(
      "www.example.co.uk",   // multi-label suffix
      "example.co.uk",       // exactly eTLD+1
      "co.uk",               // host IS a suffix -> none
      "uk",                  // 1-label suffix -> none
      "a.b.c.example.com",   // deep subdomain
      "example.com",
      "com",                 // suffix -> none
      "something.example",   // unknown TLD: implicit 1-label rule
      "example",             // bare unknown label -> none
      "x.y.pvt.k12.ma.us",   // 4-label suffix, longest match
      "school.sch.uk")       // gov/sch longest-match over uk
    assert(got("www.example.co.uk") === Some("example.co.uk"))
    assert(got("example.co.uk") === Some("example.co.uk"))
    assert(got("co.uk") === None)
    assert(got("uk") === None)
    assert(got("a.b.c.example.com") === Some("example.com"))
    assert(got("example.com") === Some("example.com"))
    assert(got("com") === None)
    assert(got("something.example") === Some("something.example"))
    assert(got("example") === None)
    assert(got("x.y.pvt.k12.ma.us") === Some("y.pvt.k12.ma.us"))
    assert(got("school.sch.uk") === Some("school.sch.uk"))
  }

  test("hosts and suffix table are matched case-insensitively; empty host -> null") {
    import spark.implicits._
    val got = WebOps.registeredDomain(
        Seq("WWW.Example.CO.UK", "").toDF("host"),
        Seq("CO.UK").toDF("suffix"))
      .collect().map(r => Option(r.getString(0)).getOrElse("") -> Option(r.getString(1))).toMap
    assert(got("WWW.Example.CO.UK") === Some("example.co.uk"))
    assert(got("") === None)
  }

  test("row count is preserved (no fan-out from the suffix joins)") {
    import spark.implicits._
    val hosts = (0 until 1000).map(i => s"sub$i.site${i % 7}.co.uk")
    val out = WebOps.registeredDomain(hosts.toDF("host"), suffixes)
    assert(out.count() === 1000L)
    assert(out.filter(col("reg_domain").isNull).count() === 0L)
  }

  test("the plan is map-only on the page side: broadcast joins, zero shuffles") {
    import spark.implicits._
    val out = WebOps.registeredDomain(
      (0 until 64).map(i => s"a.b$i.co.uk").toDF("host"), suffixes)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "suffix probes are not broadcast joins:\n" + plan.take(1500))
    assert(!plan.contains("Exchange hashpartitioning"),
      "registeredDomain shuffled the page side:\n" + plan.take(1500))
  }
}
