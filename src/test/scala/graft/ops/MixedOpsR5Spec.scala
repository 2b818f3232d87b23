package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tiles.{RasterSpec, TileOps, TileOps2}

/** Invariant specs for the round-5 scalar additions: overview pyramid
  * (mass conservation + level geometry), readability (hand-computed
  * fixtures incl. the sentence floor), destination point (cardinal
  * bearings against closed forms).
  */
class MixedOpsR5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("overview pyramid: level k has (W/2^k)^2 pixels and conserves mean") {
    val spec = RasterSpec(0.0, 64.0, 0.25, -0.25, 64, 64, 16, 1)
    val base = TileOps.createRaster(spark, spec)((x, y, _) => (x * 7 + y * 13 % 5).toDouble)
    val pyr = TileOps2.overviewPyramid(base, 16, levels = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(4)))
    val baseMean = TileOps.toPixels(base, 16).agg(avg("v")).head.getDouble(0)
    for (k <- 1 to 3) {
      val lvl = pyr.filter(_._1 == k)
      val n = 64 >> k
      assert(lvl.length === n * n, s"level $k count")
      assert(lvl.map(t => (t._2, t._3)).distinct.length === n * n)
      val mean = lvl.map(_._4).sum / lvl.length
      assert(math.abs(mean - baseMean) < 1e-9, s"level $k mean drift")
    }
  }

  test("demTerrain: hand 3x3 fold, edge convention, tile-size invariance") {
    // 4x4 plane, values row-major 0..15 (v = x + 4y): interior pixel
    // (1,1)=5 has neighbors 0,4,8,1,9,2,6,10 -> TRI = (5+1+3+4+4+3+1+5)/8
    val spec = RasterSpec(0.0, 4.0, 1.0, -1.0, 4, 4, 2, 1)
    val dem = TileOps.createRaster(spark, spec)((x, y, _) => (x + 4 * y).toDouble)
    def grid(metric: String, tile: Int): Map[(Int, Int), Double] = {
      val sp = RasterSpec(0.0, 4.0, 1.0, -1.0, 4, 4, tile, 1)
      val d = TileOps.createRaster(spark, sp)((x, y, _) => (x + 4 * y).toDouble)
      TileOps.toPixels(TileOps2.demTerrain(d, metric), tile)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    }
    val tri = grid("tri", 2)
    assert(tri((1, 1)) === 26.0 / 8.0)
    // corner (0,0)=0: out-of-raster neighbors take the center (0), real
    // neighbors 1, 4, 5 -> TRI = (1+4+5)/8
    assert(tri((0, 0)) === 10.0 / 8.0)
    val tpi = grid("tpi", 2)
    assert(tpi((1, 1)) === 0.0) // neighbors sum 0+1+2+4+6+8+9+10 = 40 = 8·ctr
    assert(tpi((0, 0)) === 0.0 - 10.0 / 8.0) // 5 ghost zeros + 1 + 4 + 5
    val rough = grid("roughness", 2)
    assert(rough((1, 1)) === 10.0 - 0.0)
    assert(rough((0, 0)) === 5.0) // max 5, min = center 0
    // cross-tile halo: same grid at tile 2 and tile 4 must agree exactly
    for (m <- Seq("tri", "tpi", "roughness"))
      assert(grid(m, 2) === grid(m, 4), m)
  }

  test("viewshed: flat plane, wall shadow, radius cut, tile invariance") {
    import graft.tiles.TileOps3
    def run(tile: Int, f: (Int, Int) => Double): Map[(Int, Int), Double] = {
      val sp = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, tile, 1)
      val d = TileOps.createRaster(spark, sp)((x, y, _) => f(x, y))
      TileOps.toPixels(TileOps3.viewshed(d, tile, ox = 8, oy = 8,
          obsHeight = 2.0, maxDist = 6), tile)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    }
    // flat terrain: everything within Chebyshev 6 visible, beyond = 0
    val flat = run(8, (_, _) => 0.0)
    assert(flat((8, 8)) === 1.0 && flat((14, 8)) === 1.0 && flat((2, 2)) === 1.0)
    assert(flat((15, 8)) === 0.0 && flat((0, 0)) === 0.0)
    // a tall wall at x=10 (y anywhere): ground cells behind it on the +x
    // axis are shadowed, the wall itself is visible
    val wall = run(8, (x, _) => if (x == 10) 9.0 else 0.0)
    assert(wall((10, 8)) === 1.0)
    assert(wall((11, 8)) === 0.0 && wall((12, 8)) === 0.0)
    assert(wall((9, 8)) === 1.0) // in front of the wall
    assert(wall((8, 12)) === 1.0) // perpendicular, unobstructed
    // halo correctness: same answer at tile 8 and tile 16
    assert(run(8, (x, _) => if (x == 10) 9.0 else 0.0) ===
      run(16, (x, _) => if (x == 10) 9.0 else 0.0))
  }

  test("labelGeometry: hand plane, square compactness, tile invariance") {
    // 8x8 plane: left 4 columns label 1, right 4 columns label 2 —
    // two 4x8 rectangles: area 32, perimeter 24 each (border + seam)
    def run(tile: Int): Map[Long, (Long, Long, Long, Long, Long, Long, Long)] = {
      val sp = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, tile, 1)
      val d = TileOps.createRaster(spark, sp)((x, _, _) => if (x < 4) 1.0 else 2.0)
      TileOps2.labelGeometry(d, tile).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    }
    val g = run(4)
    assert(g(1L) === ((32L, 24L, 0L, 3L, 0L, 7L, 32L * 16000000L / (24L * 24L))))
    assert(g(2L) === ((32L, 24L, 4L, 7L, 0L, 7L, 32L * 16000000L / (24L * 24L))))
    assert(run(4) === run(8)) // halo across the seam
    // a lone 4x4 square: compactness exactly 10^6
    val sq = {
      val sp = RasterSpec(0.0, 8.0, 1.0, -1.0, 8, 8, 8, 1)
      val d = TileOps.createRaster(spark, sp)(
        (x, y, _) => if (x >= 2 && x < 6 && y >= 2 && y < 6) 1.0 else 0.0)
      TileOps2.labelGeometry(d, 8).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(7))).toMap
    }
    assert(sq(1L) === ((16L, 16L, 1000000L)))
    // NaN (nodata) centers belong to NO label; as neighbors they count
    // as boundary like off-raster
    val nn = {
      val sp = RasterSpec(0.0, 4.0, 1.0, -1.0, 4, 4, 4, 1)
      val d = TileOps.createRaster(spark, sp)(
        (x, y, _) => if (x == 0 && y == 0) Double.NaN else 1.0)
      TileOps2.labelGeometry(d, 4).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    assert(nn.keySet === Set(1L))
    // outer border contributes 14 edges (the NaN corner owns none),
    // plus 2 edges of label-1 pixels facing the NaN hole
    assert(nn(1L) === ((15L, 16L)))
  }

  test("scd2: duplicate collapse, interval chain, one current per key") {
    import spark.implicits._
    val log = Seq(
      (1L, 100L, "A", 1L), (1L, 200L, "A", 2L), (1L, 300L, "B", 3L),
      (1L, 400L, "B", 4L), (1L, 500L, "A", 5L),
      (2L, 100L, "X", 6L))
      .map { case (u, s, v, id) => (u, new java.sql.Timestamp(s * 1000L), v, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Events.scd2(log, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime / 1000L,
        Option(r.getTimestamp(3)).map(_.getTime / 1000L), r.getLong(4),
        r.getBoolean(5)))
    val u1 = out.filter(_._1 == 1L).sortBy(_._5)
    assert(u1.map(x => (x._2, x._3, x._4)).toSeq ===
      Seq(("A", 100L, Some(300L)), ("B", 300L, Some(500L)), ("A", 500L, None)))
    // A->A duplicate at 200/400 collapsed; chain tiles the timeline
    u1.sliding(2).foreach { case Array(a, b) => assert(a._4 === Some(b._3)) }
    assert(out.count(x => x._1 == 1L && x._6) === 1)
    assert(out.filter(_._1 == 2L).toSeq.map(x => (x._2, x._6)) === Seq(("X", true)))
  }

  test("rollup grains are consistent") {
    import spark.implicits._
    val ev = Seq((1L, "a", 2.5), (2L, "a", 1.0), (3L, "b", 4.0)).map {
      case (id, ty, v) => (id, new java.sql.Timestamp(id * 3600L * 1000L), ty, v)
    }.toDF("event_id", "ts", "event_type", "value")
    val out = Events.hourTypeRollup(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(("ALL", -1)) === ((3L, 75000L)))
    assert(out(("a", -1)) === ((2L, 35000L)))
    assert(out(("b", 3)) === ((1L, 40000L)))
    // grand total equals the sum of the per-type subtotals
    assert(out(("a", -1))._1 + out(("b", -1))._1 === out(("ALL", -1))._1)
  }

  test("hashSample: bottom-k property, group bound, partition stability") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val got = Selection.hashSample(df, "doc_id", Seq("lang"), k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(got.count(_._1 == "a") === 5 && got.count(_._1 == "b") === 5)
    // the sample IS the 5 smallest hashes per group
    val hashed = Sketches.hash60(org.apache.spark.sql.functions.col("doc_id"),
      "xxhash64")
    val all = df.withColumn("h", hashed).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    for (g <- Seq("a", "b")) {
      val want = all.filter(_._1 == g).sortBy(x => (x._3, x._2)).take(5)
        .map(_._2).toSet
      assert(got.filter(_._1 == g).map(_._2).toSet === want, g)
    }
    val again = Selection.hashSample(df.repartition(13), "doc_id",
      Seq("lang"), k = 5).collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(again === got.toSet)
    // tiny group: returned whole
    val tiny = Seq((1L, "z")).toDF("doc_id", "lang")
    assert(Selection.hashSample(tiny, "doc_id", Seq("lang"), 5).count() === 1)
  }

  test("editDistancePairs: typo recall, blocking contract, block cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "the quick brown fox jumps over at"),  // 1 edit inside key
      (3L, "thX quick brown fox jumps over it"),  // 1 edit at char 3
      (4L, "Xhe quick brown fox jumps over it"),  // first-char typo: other block
      (5L, "completely different text here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)))
    // the blocking CONTRACT: a first-character typo never pairs
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // planted identical block of 100: cap 8 bounds pairs to C(8,2)
    val block = (0L until 100L).map(i => (i, "same same same prefix " + i))
      .toDF("doc_id", "text")
    val capped = Dedup.editDistancePairs(block, maxDist = 2, capPerBlock = 8)
    assert(capped.count() <= 28)
    val ids = capped.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids.forall(_ < 8L)) // deterministic lowest-id cap
  }

  test("centerScaled: per-dimension centered sums are exactly zero") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(0.1f, 0.5f, -0.2f), 0),
      (2L, Array(0.3f, -0.1f, 0.4f), 0),
      (3L, Array(-0.4f, 0.2f, 0.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centerScaled(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.forall(_._4 == 3L))
    // Σ_v centered_n(v, pos) = Σ q·n − n·Σq = 0 exactly, per pos
    out.groupBy(_._2).foreach { case (pos, rows) =>
      assert(rows.map(_._3).sum === 0L, s"pos $pos")
    }
    // hand value: pos 0 sums to 0 (100+300-400); centered_n(1,0) = 100·3 − 0
    assert(out.find(r => r._1 == 1L && r._2 == 0).get._3 === 300L)
  }

  test("chi2Features: perfect discriminator ranks first, all-docs token excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "alpha shared filler one"),
      (2L, "en", "alpha shared filler two"),
      (3L, "en", "alpha shared other words"),
      (4L, "de", "beta shared filler one"),
      (5L, "de", "beta shared filler two"),
      (6L, "de", "beta shared other words"))
      .toDF("doc_id", "lang", "text")
    val out = TextOps.chi2Features(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4), r.getLong(5)))
    // 'shared' appears in every doc -> excluded entirely
    assert(!out.exists(_._2 == "shared"))
    // the perfect discriminators rank #1 for their class with the max
    // score: a=3,b=0,c=0,d=3 -> chi2 = N = 6 -> 6,000,000 ppm
    val en1 = out.find(x => x._1 == "en" && x._4 == 1L).get
    val de1 = out.find(x => x._1 == "de" && x._4 == 1L).get
    assert(en1._2 === "alpha" && en1._3 === 6000000L)
    assert(de1._2 === "beta" && de1._3 === 6000000L)
    // class-independent tokens score 0: 'filler' is in 2 of each class
    val filler = out.filter(_._2 == "filler")
    assert(filler.forall(_._3 === 0L))
  }

  test("botCadence: metronome user regular, bursty user not, short skipped") {
    import spark.implicits._
    val rows =
      (0 until 10).map(i => (1L, 1000L + i * 60L, i.toLong)) ++   // exact 60s
      Seq(2L -> 0L, 2L -> 5L, 2L -> 400L, 2L -> 401L, 2L -> 2000L, 2L -> 2004L)
        .zipWithIndex.map { case ((u, s), i) => (u, 5000L + s, 100L + i) } ++
      (0 until 3).map(i => (3L, 9000L + i * 10L, 200L + i))       // too short
    val df = rows.map { case (u, s, id) =>
      (u, new java.sql.Timestamp(s * 1000L), id) }
      .toDF("user_id", "ts", "event_id")
    val out = Events.botCadence(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L) === ((0L, true)))  // identical gaps -> VMR exactly 0
    assert(!out(2L)._2 && out(2L)._1 > 200L)
    assert(!out.contains(3L))
  }

  test("centroidOutliers: planted far vector ranks first, score exact") {
    import spark.implicits._
    val base = (1L to 9L).map(i => (i, Array.fill(3)(0.1f), 0))
    val far = Seq((10L, Array(5.0f, -5.0f, 5.0f), 0))
    val out = Similarity.centroidOutliers((base ++ far)
        .toDF("vec_id", "embedding", "label"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(3)))
    assert(out.head._1 === 10L && out.head._3 === 1L)
    // exact score: centered_n for the far vector, dims (5000-100 grid):
    // sums = 9*100 + 5000 = 5900 (dims 0,2), 9*100 - 5000 = -4100 (dim 1)
    // centered = 5000*10 - 5900 = 44100 ; -5000*10 + 4100 = -45900
    val want = BigInt(44100) * 44100 * 2 + BigInt(45900) * 45900
    assert(BigInt(out.head._2.toBigInteger) === want)
  }

  test("abTest chi-square certificate matches the FP formula and verdicts") {
    import spark.implicits._
    // variant 0: 30 users, 12 convert; variant 1: 30 users, 3 convert
    val rows = (0L until 60L).flatMap { u =>
      val conv = if (u % 2 == 0) (u / 2) % 30 < 12 else (u / 2) % 30 < 3
      Seq((u, "view", 1000L + u)) ++
        (if (conv) Seq((u, "purchase", 2000L + u)) else Seq.empty)
    }.map { case (u, ty, s) => (u, ty, new java.sql.Timestamp(s * 1000L)) }
    val r = Events.abTest(rows.toDF("user_id", "event_type", "ts")).head
    val (ua, ca, ub, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert((ua, ca, ub, cb) === ((30L, 12L, 30L, 3L)))
    val num = r.getDecimal(4).toBigInteger; val den = r.getDecimal(5).toBigInteger
    val chi2 = new java.math.BigDecimal(num).divide(
      new java.math.BigDecimal(den), 10, java.math.RoundingMode.HALF_UP)
    // textbook chi2 for (12/30 vs 3/30): N(ad-bc)^2/prod = 7.2
    assert(math.abs(chi2.doubleValue - 7.2) < 1e-9)
    assert(r.getBoolean(6)) // 7.2 >= 3.841459
    // balanced conversions -> not significant
    val rows2 = (0L until 60L).flatMap { u =>
      Seq((u, "view", 1000L + u)) ++
        (if ((u / 2) % 30 < 10) Seq((u, "purchase", 2000L + u)) else Seq.empty)
    }.map { case (u, ty, s) => (u, ty, new java.sql.Timestamp(s * 1000L)) }
    val r2 = Events.abTest(rows2.toDF("user_id", "event_type", "ts")).head
    assert(!r2.getBoolean(6))
    assert(r2.getDecimal(4).toBigInteger.signum === 0) // ad = bc exactly
  }

  test("cusum window form equals the sequential recursion") {
    import spark.implicits._
    // one type, hand counts per hour: spike at hours 5-6
    val counts = Seq(1L, 2L, 0L, 1L, 1L, 6L, 7L, 1L, 0L, 2L)
    val rows = counts.zipWithIndex.flatMap { case (n, h) =>
      (0L until n).map(i => (h.toLong * 3600L + i, "t"))
    }.map { case (sec, ty) =>
      (new java.sql.Timestamp(sec * 1000L), ty)
    }
    val df = rows.toDF("ts", "event_type")
    val got = Events.cusum(df, k = 1, h = 4).collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getBoolean(4))).toMap
    // sequential reference S_t = max(0, S + n - k) over PRESENT hours
    var s = 0L
    val present = counts.zipWithIndex.filter(_._1 > 0)
    present.foreach { case (n, h) =>
      s = math.max(0L, s + n - 1)
      assert(got(h.toLong) === ((s, s >= 4)), s"hour $h")
    }
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("transect: endpoints, step count, cardinal/diagonal walks, tiles") {
    import graft.tiles.TileOps3
    def run(tile: Int, pts: (Int, Int, Int, Int)): Seq[(Long, Int, Int, Double)] = {
      val sp = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, tile, 1)
      val d = TileOps.createRaster(spark, sp)((x, y, _) => (x * 16 + y).toDouble)
      TileOps3.transect(d, tile, pts._1, pts._2, pts._3, pts._4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(4)))
        .sortBy(_._1).toSeq
    }
    val horiz = run(8, (2, 5, 9, 5))
    assert(horiz.map(p => (p._2, p._3)) === (2 to 9).map(x => (x, 5)))
    assert(horiz.map(_._4) === (2 to 9).map(x => (x * 16 + 5).toDouble))
    val diag = run(8, (1, 1, 6, 6))
    assert(diag.map(p => (p._2, p._3)) === (1 to 6).map(i => (i, i)))
    // single point
    assert(run(8, (4, 4, 4, 4)).map(p => (p._2, p._3)) === Seq((4, 4)))
    // tile invariance across the seam
    assert(run(8, (2, 3, 14, 11)) === run(16, (2, 3, 14, 11)))
  }

  test("readability: hand-computed Flesch/ARI on fixed sentences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat. the dog ran!"),      // 6 words, 2 sents, 6 syll runs
      (2L, "word")                             // no terminator: floor S=1
    ).toDF("doc_id", "text")
    val r = TextOps.readability(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    val (w1, s1, y1, c1, f1, a1) = r(1L)
    assert((w1, s1, y1) === ((6L, 2L, 6L)))
    assert(c1 === 20L) // 25 chars minus 5 spaces (punct is non-space)
    assert(f1 === 206835000L - (1015000L * 6) / 2 - (84600000L * 6) / 6)
    assert(a1 === (4710000L * 20) / 6 + (500000L * 6) / 2 - 21430000L)
    val (w2, s2, y2, _, _, _) = r(2L)
    assert((w2, s2, y2) === ((1L, 1L, 1L)))
  }

  test("decay scores: dyadic weights on hand-placed event ages") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-10 12:00:00")
    def at(hoursAgo: Double) = new java.sql.Timestamp(
      base.getTime - (hoursAgo * 3600 * 1000).toLong)
    val ev = Seq(
      (1L, at(0)), (1L, at(0.5)), (1L, at(2)),   // k = 0, 0, 2
      (2L, at(31)), (2L, at(100)),               // both floored to k = 30
      (3L, at(29.99))                            // k = 29
    ).toDF("user_id", "ts")
    val got = Events.decayScores(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val u = 1L << 30
    assert(got(1L) === ((u + u + (u >> 2), 3L)))
    assert(got(2L) === ((2L, 2L)))
    assert(got(3L) === ((2L, 1L)))
  }

  test("reclassify: half-open bins, NaN passthrough") {
    import graft.tiles.Tile
    val spec = RasterSpec(0.0, 64.0, 0.25, -0.25, 8, 8, 8, 1)
    val vals = Array(0.0, 19.99, 20.0, 39.0, 40.0, 79.99, 80.0, 96.0)
    val r = TileOps.createRaster(spark, spec)((x, y, _) => vals((x + y) % 8))
    val out = TileOps.toPixels(TileOps2.reclassify(r,
      Array(20.0, 40.0, 60.0, 80.0), Array(1, 2, 3, 4, 5)), 8)
      .collect().map(row => (row.getInt(0), row.getInt(1)) -> row.getDouble(3)).toMap
    val wantFor = Map(0.0 -> 1.0, 19.99 -> 1.0, 20.0 -> 2.0, 39.0 -> 2.0,
      40.0 -> 3.0, 79.99 -> 4.0, 80.0 -> 5.0, 96.0 -> 5.0)
    for (x <- 0 until 8; y <- 0 until 8)
      assert(out((x, y)) === wantFor(vals((x + y) % 8)), s"($x,$y)")
    // NaN nodata passes through
    import spark.implicits._
    val nan = spark.createDataset(Seq(Tile(0, 0, 0, 2, 1, 0.0, 0.0, 1.0, -1.0,
      Array(Double.NaN, 50.0), Double.NaN, 4326)))
    val rec = TileOps2.reclassify(nan, Array(20.0), Array(1, 2)).collect()(0)
    assert(rec.pixels(0).isNaN && rec.pixels(1) === 2.0)
  }

  test("spherical area: 1-degree equator quad closed form and hole subtraction") {
    import spark.implicits._
    val feats = Seq(
      (0L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      (3L, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 5 2, 5 5, 2 5, 2 2))"))
      .toDF("fid", "wkt")
    val got = VectorOps2.sphericalArea(feats, "fid", "wkt").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val R = 6378137.0
    val d = math.toRadians(1.0)
    val want0 = R * R * d * math.sin(d) / 1.0 // trapezoid formula closed form
    assert(math.abs(got(0L) - want0) / want0 < 1e-12)
    // ~111.3 km square sanity band
    assert(got(0L) > 1.2e10 && got(0L) < 1.25e10)
    // hole subtracts: area strictly between (64 - 9) and 64 "square degrees"
    assert(got(3L) > 50 * want0 && got(3L) < 56 * want0)
  }

  test("zonal weighted: hand-computed boundary fractions and nodata skip") {
    import graft.geo.{BBox, Polygon}
    // 4×4 px raster, 1.0 pixels, origin (0,4): v = x + 4y
    val spec = RasterSpec(0.0, 4.0, 1.0, -1.0, 4, 4, 2, 1)
    val r = TileOps.createRaster(spark, spec)((x, y, _) => (x + 4 * y).toDouble)
    // zone = [0.5, 2.5] × [2.5, 3.5] in geo coords: covers the y=0 px row
    // half-height and y=1 row half-height; x fractions 0.5, 1, 0.5
    val z = Seq((7L, Polygon.box(BBox(0.5, 2.5, 2.5, 3.5))))
    val got = graft.tiles.Zonal.zonalWeighted(r, z).collect()
    assert(got.length === 1)
    val row = got(0)
    assert(row.getLong(row.fieldIndex("n_cells")) === 6L)
    assert(row.getDouble(row.fieldIndex("cov_px")) === 2.0)
    // top row (y=0): v = 0,1,2 w/ fracs .25,.5,.25 ; row y=1: v = 4,5,6
    val wsum = 0.25 * 0 + 0.5 * 1 + 0.25 * 2 + 0.25 * 4 + 0.5 * 5 + 0.25 * 6
    assert(row.getDouble(row.fieldIndex("wsum")) === wsum)
    assert(row.getDouble(row.fieldIndex("wmean")) === wsum / 2.0)
    // weighted ≠ center-in: center test would count 2 cells (centers at
    // y=3.5 row, x=1.5/2.5? centers (0.5..3.5)) — distinct semantics pinned
    // by the exact fractions above
  }

  test("zonal weighted: shard merge ≡ whole (partial-sum exactness)") {
    import graft.geo.{BBox, Polygon}
    val spec = RasterSpec(0.0, 64.0, 0.25, -0.25, 64, 64, 8, 1)
    val r = TileOps.createRaster(spark, spec)((x, y, _) => ((x * 7 + y * 13) % 97).toDouble)
    val z = Seq((1L, Polygon.box(BBox(0.0625, 15.8125, 48.1875, 63.9375))))
    val whole = graft.tiles.Zonal.zonalWeighted(r, z).collect()(0)
    val re = graft.tiles.Zonal.zonalWeighted(r.repartition(13), z).collect()(0)
    for (f <- Seq("n_cells", "cov_px", "wsum", "wmean"))
      assert(whole.get(whole.fieldIndex(f)) === re.get(re.fieldIndex(f)), f)
  }

  test("clipToGrid: spanning rect tiles exactly, areas partition") {
    import spark.implicits._
    val feats = Seq((5L, "POLYGON ((1.25 0.5, 9.75 0.5, 9.75 6.5, 1.25 6.5, 1.25 0.5))"))
      .toDF("fid", "wkt")
    val parts = VectorOps2.clipToGrid(feats, "fid", "wkt", 4.0).collect()
    // bbox spans tx 0..2, ty 0..1 → 6 parts
    assert(parts.length === 6)
    val total = parts.map(_.getDouble(3)).sum
    assert(total === 8.5 * 6.0)
    // the fully-interior tile (1,0)... tile [4,8]×[0,4] clipped: full width
    val p10 = parts.find(r => r.getInt(1) == 1 && r.getInt(2) == 0).get
    assert(p10.getString(4) ===
      "POLYGON ((4.0 0.5, 8.0 0.5, 8.0 4.0, 4.0 4.0, 4.0 0.5))")
  }

  test("clipToGrid: holes clip per-tile; hole-swallowed tile drops") {
    import spark.implicits._
    // shell [0,8]², hole [3,5]² centered on the 4-grid cross point: every
    // tile keeps a quarter of the hole
    val feats = Seq((1L,
      "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (3 3, 5 3, 5 5, 3 5, 3 3))"))
      .toDF("fid", "wkt")
    val parts = VectorOps2.clipToGrid(feats, "fid", "wkt", 4.0).collect()
    assert(parts.length === 4)
    assert(parts.map(_.getDouble(3)).sum === 64.0 - 4.0)
    // hole-swallows-tile: shell [0,8]², hole [3.5,8.5]×[3.5,8.5] — covers
    // nothing fully, but hole [4,8]² would; plant that
    val feats2 = Seq((2L,
      "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (4 4, 8 4, 8 8, 4 8, 4 4))"))
      .toDF("fid", "wkt")
    val p2 = VectorOps2.clipToGrid(feats2, "fid", "wkt", 4.0).collect()
    assert(p2.length === 3, p2.mkString(";")) // tile (1,1) is all hole → dropped
  }

  test("trajectory summary: hop order by (ts, seq), whole-meter sums") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-10 12:00:00")
    def at(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // user 1: equator walk 0→1→3 deg lon (two hops, second twice the first);
    // same-ts tiebreak by seq pins the 0→1→3 order, not 0→3→1
    val pts = Seq(
      (1L, at(0), 1L, 0.0, 0.0), (1L, at(1), 2L, 1.0, 0.0), (1L, at(1), 3L, 3.0, 0.0),
      (2L, at(0), 4L, 10.0, 20.0) // single point: no hops → absent
    ).toDF("user_id", "ts", "seq", "lon", "lat")
    val got = Events.trajectorySummary(pts).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!got.contains(2L))
    val oneDeg = math.round(graft.geo.Proj.haversineMeters(0.0, 0.0, 1.0, 0.0))
    val twoDeg = math.round(graft.geo.Proj.haversineMeters(1.0, 0.0, 3.0, 0.0))
    assert(got(1L) === ((2L, oneDeg + twoDeg, twoDeg)))
  }

  test("pansharpen: band ratios preserved, zero-mean and nodata conventions") {
    import graft.tiles.Tile
    import spark.implicits._
    val mk = (band: Int, px: Array[Double]) => Tile(0, 0, band, 2, 2,
      0.0, 0.0, 1.0, -1.0, px, -9999.0, 4326)
    val ms = spark.createDataset(Seq(
      mk(0, Array(10.0, 0.0, 6.0, -9999.0)),
      mk(1, Array(30.0, 0.0, 2.0, 8.0))))
    val pan = spark.createDataset(Seq(mk(0, Array(40.0, 7.0, 4.0, 4.0))))
    val out = TileOps2.pansharpen(ms, pan, 2).collect().sortBy(_.band)
    // pixel 0: mean 20, out0 = 10*40/20 = 20, out1 = 30*40/20 = 60 —
    // ratio 1:3 preserved, intensity replaced by pan
    assert(out(0).pixels(0) === 20.0 && out(1).pixels(0) === 60.0)
    // pixel 1: zero spectral mean → 0 by convention
    assert(out(0).pixels(1) === 0.0 && out(1).pixels(1) === 0.0)
    // pixel 2: mean 4, pan 4 → unchanged values
    assert(out(0).pixels(2) === 6.0 && out(1).pixels(2) === 2.0)
    // pixel 3: band0 nodata passes through; band1 computed against the
    // nodata-poisoned mean is still emitted from its own value
    assert(out(0).pixels(3) === -9999.0)
  }

  test("random projection: linearity + exact sign-sum on a hand vector") {
    import spark.implicits._
    // one-hot on dim 5 (value 1.0 → qv 1000): proj_j = ±1000 by sign(5, j)
    val emb = Seq((1L, Array.tabulate(64)(d => if (d == 5) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(emb, 4).collect()(0)
      .getSeq[Long](1)
    def sign(d: Long, j: Long): Long =
      if (math.floor((d * 2654435761L + j * 40503L + 11L) / 65536.0).toLong % 2 == 0) 1L else -1L
    for (j <- 0 until 4) assert(got(j) === sign(5, j) * 1000L, s"j=$j")
    // linearity: proj(a + b) = proj(a) + proj(b) on exact integer inputs
    val a = Array.tabulate(64)(d => (d % 7 - 3).toFloat)
    val b = Array.tabulate(64)(d => ((d * 3) % 5 - 2).toFloat)
    val ab = Array.tabulate(64)(d => a(d) + b(d))
    val three = Seq((1L, a), (2L, b), (3L, ab)).toDF("vec_id", "embedding")
    val m = Similarity.randomProjection(three, 6).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (j <- 0 until 6) assert(m(3L)(j) === m(1L)(j) + m(2L)(j), s"j=$j")
  }

  test("allocation: nearest-source ids, pinned tie order, empty-range zero") {
    import graft.tiles.TileOps3
    // 16×16, tile 8: sources at (2,2)→id 3 and (10,2)→id 11 (values x+1
    // on row y=2); pixel (6,2) is equidistant (d²=16) → tie goes to the
    // (d², dy, dx) order: dy=0 both, dx=-4 < +4 → source at x=2 wins
    val spec = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, 8, 1)
    val r = TileOps.createRaster(spark, spec)((x, y, _) =>
      if (y == 2 && (x == 2 || x == 10)) (x + 1).toDouble else 0.0)
    val out = TileOps.toPixels(TileOps3.allocation(r, maxDist = 5), 8)
      .collect().map(row => (row.getInt(0), row.getInt(1)) -> row.getDouble(3)).toMap
    assert(out((2, 2)) === 3.0 && out((10, 2)) === 11.0) // sources keep own id
    assert(out((6, 2)) === 3.0)                          // tie → lower dx
    assert(out((5, 2)) === 3.0 && out((7, 2)) === 11.0)  // clear nearest
    assert(out((2, 6)) === 3.0)                          // cross-tile? vertical d=4
    assert(out((15, 15)) === 0.0)                        // nothing within 5
  }

  test("k-centers: farthest-point traversal on a hand line, radius monotone") {
    import spark.implicits._
    // 1-D embeddings on a line: ids 1..5 at positions 0, 1, 4, 9, 10
    // (dim 0; the rest zero). Traversal: c0 = id1(0). farthest = id5(10).
    // then id4(9)? min-dist after {0,10}: id2:1, id3:4, id4:1 → id3 (pos 4,
    // d²=16·10⁶). then id2 (pos1: min(1,9,...)… recompute) etc.
    val emb = Seq((1L, 0.0f), (2L, 1.0f), (3L, 4.0f), (4L, 9.0f), (5L, 10.0f))
      .map { case (id, p) => (id, Array.tabulate(64)(d => if (d == 0) p else 0.0f)) }
      .toDF("vec_id", "embedding")
    val got = Selection.kCenters(emb, 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    def q(x: Double) = math.round(x * 1000)
    def d2(a: Double, b: Double) = (q(a) - q(b)) * (q(a) - q(b))
    assert(got(0) === ((0, 1L, 0L)))
    assert(got(1) === ((1, 5L, d2(0, 10))))   // farthest from 0
    assert(got(2) === ((2, 3L, d2(4, 0))))    // min-dists: 1,4,1 → id3
    // round 3: remaining 2 (mind 1e6), 4 (mind 1e6) → tie by lowest id → 2
    assert(got(3) === ((3, 2L, d2(1, 0))))
    // covering radius nonincreasing
    assert(got.map(_._3).drop(1).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("histogram match: identity on itself, monotone, hits the reference set") {
    import graft.tiles.TileOps3
    val spec = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, 8, 1)
    val a = TileOps.createRaster(spark, spec)((x, y, _) => ((x + 2 * y) % 11).toDouble)
    val b = TileOps.createRaster(spark, spec)((x, y, _) => ((3 * x + y) % 5 * 10).toDouble)
    // identity: matching a raster to its own histogram is a no-op
    val self = TileOps.toPixels(TileOps3.histogramMatch(a, a), 8).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    for (x <- 0 until 16; y <- 0 until 16)
      assert(self((x, y)) === ((x + 2 * y) % 11).toDouble, s"($x,$y)")
    // cross-match: every output value comes from the reference's domain,
    // and the value mapping is monotone in the source value
    val m = TileOps.toPixels(TileOps3.histogramMatch(a, b), 8).collect()
      .map(r => ((r.getInt(0) + 2 * r.getInt(1)) % 11).toDouble -> r.getDouble(3))
      .distinct.sortBy(_._1)
    assert(m.map(_._2).forall(v => v % 10 == 0 && v >= 0 && v <= 40))
    assert(m.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      s"mapping not monotone: $m")
  }

  test("histogram match: continuous-valued rasters take the bounded binned path") {
    import graft.tiles.TileOps3
    val spec = RasterSpec(0.0, 16.0, 1.0, -1.0, 16, 16, 8, 1)
    // 256 distinct continuous source values; reference on a 10-step grid
    val a = TileOps.createRaster(spark, spec)((x, y, _) => x + y / 16.0 + 0.125)
    val b = TileOps.createRaster(spark, spec)((x, y, _) => ((3 * x + y) % 5 * 10).toDouble)
    // maxBins below the source cardinality forces the binned CDF path:
    // driver state is bounded at 2*maxBins rows by construction
    val m = TileOps.toPixels(TileOps3.histogramMatch(a, b, maxBins = 16), 8).collect()
      .map(r => (r.getInt(0) + r.getInt(1) / 16.0 + 0.125) -> r.getDouble(3))
      .distinct.sortBy(_._1)
    // every output is an actual reference value, and the mapping is
    // monotone in the source value (CDF matching at bin granularity)
    assert(m.map(_._2).forall(v => v % 10 == 0 && v >= 0 && v <= 40), s"$m")
    assert(m.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      s"binned mapping not monotone: $m")
    // the bounded-cardinality exact path is untouched by the knob when
    // cardinality fits (same output as the default)
    val exact = TileOps.toPixels(TileOps3.histogramMatch(a, b), 8).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val exact2 = TileOps.toPixels(TileOps3.histogramMatch(a, b, maxBins = 1 << 20), 8)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(exact == exact2)
  }

  test("ann recall: exact-vs-exact is 10^6; lsh recall bounded and sane") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Similarity.recallEval(emb, probeMaxId = 20, numPlanes = 16, k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.nonEmpty && r.forall { case (_, h, ppm) =>
      h >= 0 && h <= 5 && ppm >= 0 && ppm <= 1000000 && ppm == h * 1000000 / 5 })
    // degenerate check: recall of the exact path against itself = 1.0
    val exact = Similarity.annTopK(emb, probeMaxId = 10, k = 3)
      .select(col("query_id"), col("neighbor_id"))
    val self = exact.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").count().collect()
    assert(self.forall(_.getLong(1) === 3L))
  }

  test("destination point: cardinal bearings match closed forms") {
    import spark.implicits._
    val R = 6378137.0
    val pts = Seq((1L, 10.0, 45.0, 0.0, 111000.0),   // due north
      (2L, 10.0, 0.0, 90.0, 111000.0))               // due east on equator
      .toDF("doc_id", "lon", "lat", "brg", "dist_m")
    val got = SpatialStats.destinationPoint(pts, "brg", "dist_m").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // north: lat increases by exactly degrees(d/R), lon unchanged
    val (nl, nn) = got(1L)
    assert(math.abs(nl - (45.0 + math.toDegrees(111000.0 / R))) < 1e-8)
    assert(math.abs(nn - 10.0) < 1e-8)
    // east on the equator: lon increases by degrees(d/R), lat stays 0
    val (el, en) = got(2L)
    assert(math.abs(el) < 1e-8)
    assert(math.abs(en - (10.0 + math.toDegrees(111000.0 / R))) < 1e-8)
  }
}
