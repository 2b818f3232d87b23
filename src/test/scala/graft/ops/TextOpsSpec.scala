package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** C4-style corpus-wide segment dedup and the Gopher quality rules: the
  * oracle queries check engine-vs-DuckDB parity on the synthetic corpus;
  * this spec pins the SEMANTICS on handcrafted fixtures — first
  * occurrence in (doc_id, pos) order wins globally, losers are removed,
  * surviving segments keep their original order.
  */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("segmentDedup keeps exactly the first occurrence corpus-wide") {
    val df = docs(
      0L -> "alpha beta gamma",
      1L -> "beta delta alpha delta",
      2L -> "gamma gamma epsilon")
    val out = TextOps.segmentDedup(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // doc 0 owns alpha/beta/gamma (first in doc order)
    assert(out(0L) == ((3L, 3L, "alpha beta gamma")))
    // doc 1: beta+alpha lost to doc 0; first delta survives, second is an
    // intra-corpus duplicate of it
    assert(out(1L) == ((4L, 1L, "delta")))
    // doc 2: gamma lost to doc 0 (both copies), epsilon survives
    assert(out(2L) == ((3L, 1L, "epsilon")))
  }

  test("segmentDedup: duplicate-free corpus is the identity") {
    val df = docs(0L -> "a b c", 1L -> "d e f")
    val out = TextOps.segmentDedup(df).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(0L -> "a b c", 1L -> "d e f"))
  }

  test("segmentDedup: fully duplicated doc comes back empty, not dropped") {
    val df = docs(0L -> "x y", 5L -> "y x")
    val out = TextOps.segmentDedup(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((2L, "x y")))
    assert(out(5L) == ((0L, "")))
  }

  test("segmentDedup is deterministic across parallelism levels") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, s"tok${i % 7} tok${i % 13} tok${i % 3} filler$i"))
    val a = TextOps.segmentDedup(rows.toDF("doc_id", "text").repartition(1))
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.segmentDedup(rows.toDF("doc_id", "text").repartition(16))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("gopherRules metrics and composite on a handcrafted doc") {
    val good = (1 to 10).map(i => s"the token$i words of text").mkString(" ")
    val df = docs(0L -> good, 1L -> "a b", 2L -> "the quick brown fox 123 456 789 000")
    val out = TextOps.gopherRules(df, minTokens = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(5)))).toMap
    val (nTok, meanLen, nStop, passes) = out(0L)
    assert(nTok == 50L)
    assert(nStop == 20L) // 'the' + 'of' per repeat
    assert(math.abs(meanLen - (good.replace(" ", "").length / 50.0)) < 1e-12)
    assert(passes)
    assert(!out(1L)._4)            // too short
    assert(out(2L)._3 == 1L)       // only one stopword -> fails the >=2 rule
    assert(!out(2L)._4)
  }

  test("repetitionMetrics word/bigram repetition on handcrafted docs") {
    val df = docs(
      0L -> "a b a b a c",           // 6 toks, 3 distinct; "a b" and "b a" tie at 2
      1L -> "x y z",                 // no repeats at all
      2L -> "w w w w")               // single token repeated
    val out = TextOps.repetitionMetrics(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getString(4), r.getLong(5), r.getDouble(6)))).toMap
    val (n0, dupTok0, dupChar0, gram0, cnt0, gcf0) = out(0L)
    assert(n0 == 6L)
    assert(dupTok0 == 3.0 / 6.0)     // 3 occurrences beyond first-of-kind
    assert(dupChar0 == 5.0 / 6.0)    // a(3)+b(2) of 6 token chars
    assert(gram0 == "b a" && cnt0 == 2L) // tie at 2 -> lexicographically last
    assert(gcf0 == 2.0 * 3 / 11.0)   // 2 occurrences x 3 chars over 11 text chars
    assert(out(1L)._2 == 0.0 && out(1L)._3 == 0.0 && out(1L)._5 == 1L)
    val (n2, dupTok2, dupChar2, gram2, cnt2, _) = out(2L)
    assert(n2 == 4L && dupTok2 == 0.75 && dupChar2 == 1.0)
    assert(gram2 == "w w" && cnt2 == 3L)
  }

  test("repetitionMetrics bigram argmax tie-break is count desc then gram desc") {
    val df = docs(0L -> "a b a b c d c d") // "a b" and "c d" both x2 (plus x1 bridges)
    val r = TextOps.repetitionMetrics(df).collect().head
    assert(r.getString(4) == "c d" && r.getLong(5) == 2L)
  }

  test("tfidf: smoothed idf, exact scores, rank by (score desc, tok asc)") {
    val df = docs(0L -> "a a b", 1L -> "a c")
    val out = TextOps.tfidf(df, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val idfRare = math.log(3.0 / 2.0) + 1.0 // N=2, df=1
    assert(out((0L, "a")) == ((2L, 2L, 2.0)))       // idf(a)=ln(3/3)+1=1
    assert(out((0L, "b")) == ((1L, 1L, idfRare)))
    assert(out((1L, "a")) == ((1L, 2L, 1.0)))
    assert(out((1L, "c")) == ((1L, 1L, idfRare)))
    // top-1 per doc: highest score wins; doc 1's rare token outranks 'a'
    val top1 = TextOps.tfidf(df, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top1 == Map(0L -> "a", 1L -> "c"))
  }

  test("urlDedupLatest keeps max warc_sec per norm_url, full-row tie-break") {
    import spark.implicits._
    val crawl = Seq(
      (1L, "https://www.a.com/x/", 100L),
      (2L, "http://a.com/x", 200L),
      (3L, "a.com/x#f", 200L), // warc tie with doc 2 -> higher doc_id wins
      (4L, "b.com/only", 50L)).toDF("doc_id", "url", "warc_sec")
    val out = WebOps.urlDedupLatest(crawl).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(out == Map(
      "a.com/x" -> ((3L, "a.com/x#f", 200L)),
      "b.com/only" -> ((4L, "b.com/only", 50L))))
  }

  test("htmlWrap -> extractText is byte-identical and drops head chrome") {
    import spark.implicits._
    val r = Seq(("www.Ex.com/p", "hello world spark", "en")).toDF("url", "text", "lang")
      .select(WebOps.htmlWrap($"url", $"text", $"lang").as("html"))
      .select(WebOps.extractText($"html").as("got"), $"html")
      .collect().head
    assert(r.getString(0) == "hello world spark") // no title/url leakage
    assert(r.getString(1).startsWith("<!DOCTYPE html><html lang=\"en\"><head><title>www.Ex.com/p"))
  }

  test("curate: gopher fail, dup-frac fail, exact-dup loser all rejected") {
    val good = (Seq("the", "and") ++ (0 until 18).map(i => s"word${('a' + i).toChar}")).mkString(" ")
    val df = docs(
      1L -> good,                                        // survives
      2L -> "the and cat",                               // gopher: <20 tokens
      3L -> (Seq("the", "and") ++ Seq.fill(18)("word")).mkString(" "), // dup 0.85
      10L -> good,                                       // dup of 1 -> loses to min
      11L -> (Seq("the", "and") ++ (0 until 18).map(i => s"vord${('a' + i).toChar}")).mkString(" "))
    val out = TextOps.curate(df, maxDupFrac = 0.6).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 11L))
    assert(out(1L) == ((20L, 0.0)))
  }

  test("capPerHost keeps exactly n per host, ordered by (md5(url), url)") {
    import spark.implicits._
    val urls = (0 until 5).map(i => s"https://big.com/p$i") :+ "https://small.com/only"
    val pages = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url")
    val out = WebOps.capPerHost(pages, n = 2, salts = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    assert(out.count(_._1 == "big.com") == 2)
    assert(out.count(_._1 == "small.com") == 1)
    // expected winners: the two big.com urls with smallest md5(url)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (0 until 5).map(i => (h(s"https://big.com/p$i"), i.toLong))
      .sorted.take(2).map(_._2).toSet
    assert(out.filter(_._1 == "big.com").map(_._2).toSet == expect)
    assert(out.forall(_._3 <= 2))
  }

  test("packSequences: bucketed prefix sum equals the hand cumsum; window spans right") {
    val df = docs(
      0L -> "a b c",          // 3 toks  [0,3)   win 0
      1L -> "d e",            // 2 toks  [3,5)   win 0 (max=4: spans 0..1)
      2L -> "",               // dropped
      5L -> "f g h i j k")    // 6 toks  [5,11)  win 1..2
    val out = TextOps.packSequences(df, maxTokens = 4, bucket = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == Map(
      0L -> ((0L, 0L, 0L, 1L)),
      1L -> ((3L, 0L, 1L, 2L)),   // crosses the 4-token boundary
      5L -> ((5L, 1L, 2L, 2L))))
  }

  test("piiSignals counts and scrubs emails, ipv4, long digit runs") {
    val df = docs(
      0L -> "mail me at jo.doe+x@sub.site.org or 10.0.0.1 acct 123456789 end",
      1L -> "no pii here just words 1234")
    val rows = TextOps.piiSignals(df).collect()
    val out = rows
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))))
      .toMap
    assert(out(0L) == ((1L, 1L, 1L, true)))
    assert(out(1L) == ((0L, 0L, 0L, true)))
    // scrubbed text keeps surrounding words, replaces spans with tags
    val scrub = rows.find(_.getLong(0) == 0L).get.getString(4)
    val md = java.security.MessageDigest.getInstance("MD5")
    val direct = md.digest("mail me at <email> or <ip> acct <num> end".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(scrub == direct)
  }

  test("normalizeWs maps control whitespace to spaces, collapses, trims") {
    import spark.implicits._
    val out = Seq("  a\t\tb\n c \r\n", "x", " ", "ab\fc")
      .toDF("t").select(TextOps.normalizeWs($"t")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("a b c", "x", "", "a b c"))
  }

  test("filterHosts drops blocked hosts via broadcast anti join") {
    import spark.implicits._
    val pages = Seq(
      (1L, "https://www.bad.com/x"), (2L, "http://good.com/y"),
      (3L, "bad.com/z"), (4L, "sub.bad.com/w")).toDF("doc_id", "url")
    val blocked = Seq("bad.com").toDF("host")
    val got = WebOps.filterHosts(pages, blocked).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 4L)) // sub.bad.com is a different registrable host here
  }

  test("normalizeUrl strips scheme/www/query/fragment/slash and lowercases") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://WWW.Example.COM/Path/?q=1#frag",
      "http://example.com/path/",
      "example.com/path",
      "https://sub.example.com:8080/x?a=b",
      "ftp://www.files.net/")
    val out = urls.toDF("url")
      .select(WebOps.normalizeUrl($"url").as("n"),
        WebOps.hostOf(WebOps.normalizeUrl($"url")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0) == (("example.com/path", "example.com")))
    assert(out(1) == (("example.com/path", "example.com")))
    assert(out(2) == (("example.com/path", "example.com")))
    assert(out(3) == (("sub.example.com:8080/x", "sub.example.com")))
    assert(out(4) == (("files.net", "files.net")))
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    import org.apache.spark.sql.functions.col
    val df = docs(
      0L -> "a b c d e",       // benchmark doc
      1L -> "x a b c d e y",   // contains bench 3-grams
      2L -> "a b x c d",       // shares no 3-gram
      3L -> "p q")             // too short for any 3-gram
    val bench = df.filter(col("doc_id") === 0L)
    val out = TextOps.decontaminate(df, bench, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(0L) == ((3L, 3L, true)))  // bench doc matches itself
    assert(out(1L) == ((5L, 3L, true)))  // "a b c","b c d","c d e"
    assert(out(2L) == ((3L, 0L, false)))
    assert(out(3L) == ((0L, 0L, false))) // zero grams, still present
  }

  test("classifierScore: integer mean of fixed bucket weights, both families") {
    val df = docs(0L -> "a a b", 1L -> "b")
    for (family <- Seq("md5prefix", "xxhash64")) {
      val rows = TextOps.classifierScore(df, buckets = 16, family = family)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
      val (s0, n0, sc0, _) = rows(0L)
      val (s1, n1, sc1, l1) = rows(1L)
      assert(n0 == 3L && n1 == 1L)
      // doc 0 = 2*w(a) + w(b); doc 1 = w(b): weights are per-token and
      // additive, so the difference is exactly 2*w(a) — always even
      assert((s0 - s1) % 2 == 0)
      assert(sc0 == s0.toDouble / (3000.0) && sc1 == s1.toDouble / 1000.0)
      assert(l1 == (s1 > 0))
      // bucket weights stay inside the advertised band per occurrence
      assert(math.abs(s1) <= 1000 && math.abs(s0) <= 3000)
    }
  }

  test("classifierScore is deterministic across parallelism levels") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => (i, s"tok${i % 7} tok${i % 13} w$i"))
    val a = TextOps.classifierScore(rows.toDF("doc_id", "text").repartition(1))
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.classifierScore(rows.toDF("doc_id", "text").repartition(16))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("charLmScore: hand-checked bigram NLL on a two-char alphabet") {
    import org.apache.spark.sql.functions.col
    // train doc "abab": bigrams ab,ba,ab -> cnt(ab)=2, cnt(ba)=1,
    // ctx(a)=2, ctx(b)=1, V=2 (chars a,b)
    val df = docs(0L -> "abab", 1L -> "aa")
    val out = TextOps.charLmScore(df, col("doc_id") === 0L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val llAb = math.round(math.log(3.0 / 4.0) * 1e6) // (2+1)/(2+2)
    val llBa = math.round(math.log(2.0 / 3.0) * 1e6) // (1+1)/(1+2)
    val llAa = math.round(math.log(1.0 / 4.0) * 1e6) // unseen: (0+1)/(2+2)
    assert(out(0L)._1 == 3L && out(0L)._2 == 2 * llAb + llBa)
    assert(out(1L)._1 == 1L && out(1L)._2 == llAa)
    assert(out(1L)._3 == -llAa.toDouble / 1e6)
  }

  test("dsirWeights: target-domain docs outscore off-domain docs; weights additive") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // target domain: "alpha beta"-style bigrams; off-domain: disjoint vocab
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "alpha beta gamma alpha beta", "en")
      else (i, "unrelated words entirely different corpus", "de")
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val out = TextOps.dsirWeights(df, col("lang") === "en").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    val (tgtW, offW) = (out(0L)._2, out(1L)._2)
    assert(tgtW > offW, s"target $tgtW should outscore off-domain $offW")
    assert(out(0L)._3 && !out(1L)._3)
    // all even docs identical text -> identical weight; same for odd
    (0L until 40L by 2).foreach(i => assert(out(i) == out(0L)))
    (1L until 40L by 2).foreach(i => assert(out(i) == out(1L)))
  }

  test("dsirWeights is deterministic across parallelism levels") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = (0L until 100L).map(i =>
      (i, s"tok${i % 7} tok${i % 13} tok${i % 5} tok${i % 3}", if (i % 4 == 0) "en" else "de"))
    def run(parts: Int) =
      TextOps.dsirWeights(rows.toDF("doc_id", "text", "lang").repartition(parts),
        col("lang") === "en").orderBy("doc_id").collect().toSeq
    assert(run(1) == run(16))
  }

  test("charLmScore is deterministic across parallelism levels") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = (0L until 120L).map(i => (i, ("abcde" * (1 + (i % 9).toInt)) + "xyz"))
    def run(parts: Int) =
      TextOps.charLmScore(rows.toDF("doc_id", "text").repartition(parts),
        col("doc_id") % 3 === 0).orderBy("doc_id").collect().toSeq
    assert(run(1) == run(16))
  }

  test("invertedIndex: ascending postings, exact df beyond the cap, minDf") {
    val df = docs(
      5L -> "beta common",
      1L -> "alpha common common", // within-doc dup counted once
      3L -> "common hapax",
      2L -> "alpha common",
      4L -> "common")
    val out = TextOps.invertedIndex(df, minDf = 2L, maxPostings = 3)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Long](2).toList)).toSeq.sortBy(_._1)
    // hapax (df 1) and beta (df 1) pruned by minDf; common df stays the
    // EXACT 5 while its postings truncate to the 3 lowest doc ids
    assert(out === Seq(
      ("alpha", 2L, List(1L, 2L)),
      ("common", 5L, List(1L, 2L, 3L))))
  }

  test("invertedIndex postings are parallelism-independent") {
    val rows = (0L until 97L).map(i =>
      (i, s"w${i % 7} w${(i * 3) % 7} filler$i"))
    def run(parts: Int) = {
      import spark.implicits._
      TextOps.invertedIndex(rows.toDF("doc_id", "text").repartition(parts),
        minDf = 2L, maxPostings = 5)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getSeq[Long](2).toList)).toSeq.sortBy(_._1)
    }
    assert(run(1) == run(16))
  }

  test("scriptProfile counts per-block chars and picks the dominant script") {
    import spark.implicits._
    val rows = Seq(
      (0L, "hello world"),                 // latin 10
      (1L, "привет мир"),                  // cyrillic 9
      (2L, "ab мир"),                      // latin 2, cyrillic 3 -> cyrillic
      (3L, "abc мир"),                     // 3 vs 3 tie -> latin (block order)
      (4L, "你好世界 γεια"),                // cjk 4, greek 4 -> greek (order)
      (5L, "123 .,!?"),                    // no script chars -> none
      (6L, "مرحبا देवनागरी 한글"))          // arabic 5, deva 8, hangul 2 -> deva
    val got = TextOps.scriptProfile(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getString(8))).toMap
    assert(got(0L) === ((10L, 0L, 0L, "latin")))
    assert(got(1L) === ((0L, 9L, 0L, "cyrillic")))
    assert(got(2L)._4 === "cyrillic")
    assert(got(3L)._4 === "latin", "ties must break by block order")
    assert(got(4L)._4 === "greek")
    assert(got(5L)._4 === "none")
    assert(got(6L)._4 === "devanagari")
    assert(got(6L)._3 === 0L) // n_cjk stays zero on the arabic/deva/hangul row
    assert(got(4L)._3 === 4L) // n_cjk counted on the cjk+greek row
  }

  test("scriptProfile is a pure projection: zero exchanges in the plan") {
    import spark.implicits._
    val plan = TextOps.scriptProfile(Seq((1L, "abc")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "scriptProfile shuffled:\n" + plan.take(1200))
  }

  test("RAKE keyphrases: hand-computed deg/freq scores and ranking") {
    import spark.implicits._
    val doc = Seq((1L, "deep learning of deep graph models and fast graph scan"))
      .toDF("doc_id", "text")
    // phrases: [deep learning][deep graph models][fast graph scan]
    // deg/freq: deep 5/2, learning 2/1, graph 6/2, models 3/1, fast 3/1, scan 3/1
    val got = TextOps.keyphrases(doc, topK = 3).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == Set(
      ("fast graph scan", 9000000L, 1),
      ("deep graph models", 8500000L, 2),
      ("deep learning", 4500000L, 3)))
  }

  test("RAKE keyphrases: duplicate phrases score once; all-stop docs vanish") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big scan of big scan"),
      (2L, "the of and a to in is"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextOps.keyphrases(docs, topK = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // big: freq 2, deg 4 -> 2e6; scan same -> phrase score 4e6, ONE row
    assert(got == Set((1L, "big scan", 4000000L)))
  }

  test("hashing trick: signed counts are linear; families share structure") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a b a a b a")).toDF("doc_id", "text")
    for (fam <- Seq("xxhash64", "md5prefix")) {
      val v = TextOps.hashingTrick(docs, dims = 8, family = fam).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // doc 2 = doc 1 doubled → every bucket value exactly doubles
      val d1 = v.collect { case ((1L, j), x) => j -> x }
      d1.foreach { case (j, x) => assert(v((2L, j)) === 2 * x, s"fam=$fam j=$j") }
      // total mass: |values| sums bounded by token count
      assert(d1.values.map(math.abs).sum <= 3)
    }
  }

  test("compression ratio: redundancy orders, doubling shrinks the ratio") {
    import spark.implicits._
    val docs = Seq(
      (1L, "all work and no play makes jack a dull boy " * 10),
      (2L, "the five boxing wizards jump quickly over lazy dogs tonight"),
      (3L, "")).toDF("doc_id", "text")
    val r = TextOps.compressionRatio(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L)._3 < r(2L)._3, "repetitive text must compress harder")
    assert(r(3L) === ((0L, 2L, 0L)))   // empty: 2-byte empty deflate block, ratio 0
    // doubling a repetitive doc lowers (or keeps) the ratio
    val rr = TextOps.compressionRatio(
      Seq((9L, "all work and no play makes jack a dull boy " * 20)).toDF("doc_id", "text"))
      .collect()(0).getLong(3)
    assert(rr <= r(1L)._3)
  }
}
