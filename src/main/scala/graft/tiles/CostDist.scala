package graft.tiles

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multi-source, obstacle-aware octile distance over the tile grid — the
  * cost-distance transform (ESRI CostDistance / GRASS r.cost with uniform
  * unit cost and 8-connectivity; companion to the chamfer/Euclidean
  * transforms in TileOps3). Impassable cells (mask pixel <= 0) block paths;
  * diagonal moves cost √2, straight moves 1.
  *
  * Exactness contract: a path's cost is s + d·√2 for integer move counts
  * (s, d). √2 is irrational, so distinct (s, d) pairs have distinct real
  * costs and the per-cell minimum is a UNIQUE pair — the whole relaxation
  * runs in integer arithmetic (compare via sign of Δs + Δd·√2, resolved
  * exactly by comparing Δs² with 2Δd² in Long), and floating point enters
  * ONLY in the final output expression s + d * sqrt(2.0), the same single
  * rounding the SQL oracle performs. No FP accumulation order anywhere.
  *
  * Scale shape (the flowAccumulation playbook, but for a relaxation that
  * can re-enter tiles): each round is one 9-way halo exchange + a
  * tile-LOCAL Dijkstra seeded from the neighbors' current border values;
  * a round settles every path segment that stays inside one tile, so the
  * round count is the optimal paths' tile-crossing diameter (pixel
  * diameter / tileSize), not the pixel diameter — and per-cell values
  * only ever decrease, so the loop provably converges. Rounds where no
  * tile improves terminate the loop with one boolean aggregate.
  */
object CostDist {

  /** Distance state per tile: s/d = straight/diagonal move counts of the
    * current best path, -1 = unreached; mask 1 = passable.
    */
  final case class DistTile(cellX: Int, cellY: Int, w: Int, h: Int,
                            mask: Array[Byte], s: Array[Int], d: Array[Int])

  private implicit val distEnc: Encoder[DistTile] = Encoders.product[DistTile]
  private implicit val keyedEnc: Encoder[((Int, Int), DistTile)] =
    Encoders.product[((Int, Int), DistTile)]
  private implicit val flaggedEnc: Encoder[(DistTile, Boolean)] =
    Encoders.product[(DistTile, Boolean)]

  /** Exact: s1 + d1·√2 < s2 + d2·√2, with -1 meaning +∞. */
  private[tiles] def less(s1: Int, d1: Int, s2: Int, d2: Int): Boolean = {
    if (s2 < 0) s1 >= 0
    else if (s1 < 0) false
    else {
      val ds = (s1 - s2).toLong; val dd = (d1 - d2).toLong
      if (ds >= 0 && dd >= 0) false
      else if (ds <= 0 && dd <= 0) true
      else if (ds > 0) ds * ds < 2L * dd * dd // sign of ds - |dd|√2
      else ds * ds > 2L * dd * dd             // sign of -(|ds|) + dd√2
    }
  }

  private val Moves: Array[(Int, Int, Boolean)] = Array(
    (1, 0, false), (-1, 0, false), (0, 1, false), (0, -1, false),
    (1, 1, true), (1, -1, true), (-1, 1, true), (-1, -1, true))

  /** Octile distance from any of `sources` to every reachable passable
    * cell. `mask` pixels > 0 are passable. Output: (x, y, s, d, dist)
    * for reachable cells only, dist = s + d * sqrt(2.0) as one multiply
    * and one add.
    */
  def octileDistance(mask: org.apache.spark.sql.Dataset[Tile],
                     sources: Seq[(Int, Int)], tileSize: Int, width: Int,
                     maxRounds: Int = 1024): DataFrame = {
    val spark = mask.sparkSession
    import spark.implicits._
    require(sources.nonEmpty, "octileDistance: at least one source")
    val srcSet = sources.toSet
    var cur: org.apache.spark.sql.Dataset[DistTile] = mask.map { t =>
      val n = t.w * t.h
      val m = new Array[Byte](n); val s = new Array[Int](n)
      val d = new Array[Int](n)
      val baseX = t.cellX * tileSize; val baseY = t.cellY * tileSize
      var i = 0
      while (i < n) {
        m(i) = if (t.pixels(i) > 0) 1 else 0
        val gx = baseX + i % t.w; val gy = baseY + i / t.w
        if (m(i) == 1 && srcSet.contains((gx, gy))) { s(i) = 0; d(i) = 0 }
        else { s(i) = -1; d(i) = -1 }
        i += 1
      }
      DistTile(t.cellX, t.cellY, t.w, t.h, m, s, d)
    }.localCheckpoint(eager = true)

    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val ex = cur.flatMap { t =>
        for (dx <- -1 to 1; dy <- -1 to 1)
          yield ((t.cellX + dx, t.cellY + dy), t)
      }.groupByKey(_._1).flatMapGroups { (key, it) =>
        val (cx, cy) = key
        val pieces = it.map(_._2).toArray
        pieces.find(t => t.cellX == cx && t.cellY == cy) match {
          case None => Iterator.empty
          case Some(ct) =>
            val pw = ct.w + 2; val ph = ct.h + 2
            val ps = Array.fill(pw * ph)(-1); val pd = Array.fill(pw * ph)(-1)
            val pm = new Array[Byte](pw * ph)
            pieces.foreach { p =>
              val ox = if (p.cellX < cx) -p.w else if (p.cellX > cx) ct.w else 0
              val oy = if (p.cellY < cy) -p.h else if (p.cellY > cy) ct.h else 0
              var r = 0
              while (r < p.h) {
                val pr = r + oy + 1
                if (pr >= 0 && pr < ph) {
                  var c = 0
                  while (c < p.w) {
                    val pc = c + ox + 1
                    if (pc >= 0 && pc < pw) {
                      val j = pr * pw + pc; val i = r * p.w + c
                      ps(j) = p.s(i); pd(j) = p.d(i); pm(j) = p.mask(i)
                    }
                    c += 1
                  }
                }
                r += 1
              }
            }
            // tile-local Dijkstra: halo cells are settled constants, center
            // cells relax; exact-integer comparator, lazy-deletion PQ
            val pq = new java.util.PriorityQueue[Int](16,
              (a: Int, b: Int) =>
                if (less(ps(a), pd(a), ps(b), pd(b))) -1
                else if (less(ps(b), pd(b), ps(a), pd(a))) 1
                else 0)
            var j = 0
            while (j < pw * ph) {
              if (ps(j) >= 0) pq.add(j)
              j += 1
            }
            val popped = new Array[Boolean](pw * ph)
            while (!pq.isEmpty) {
              val u = pq.poll()
              if (!popped(u)) {
                popped(u) = true
                val ur = u / pw; val uc = u % pw
                var k = 0
                while (k < 8) {
                  val (dx, dy, diag) = Moves(k)
                  val vr = ur + dy; val vc = uc + dx
                  // relax only INTO center cells (halo rows are constants)
                  if (vr >= 1 && vr <= ct.h && vc >= 1 && vc <= ct.w) {
                    val v = vr * pw + vc
                    if (pm(v) == 1) {
                      val ns = if (diag) ps(u) else ps(u) + 1
                      val nd = if (diag) pd(u) + 1 else pd(u)
                      if (less(ns, nd, ps(v), pd(v))) {
                        ps(v) = ns; pd(v) = nd; pq.add(v)
                      }
                    }
                  }
                  k += 1
                }
              }
            }
            val ns = new Array[Int](ct.w * ct.h)
            val nd = new Array[Int](ct.w * ct.h)
            var improved = false
            var r = 0
            while (r < ct.h) {
              var c = 0
              while (c < ct.w) {
                val i = r * ct.w + c; val j2 = (r + 1) * pw + (c + 1)
                ns(i) = ps(j2); nd(i) = pd(j2)
                if (less(ns(i), nd(i), ct.s(i), ct.d(i))) improved = true
                c += 1
              }
              r += 1
            }
            Iterator.single((ct.copy(s = ns, d = nd), improved))
        }
      }.localCheckpoint(eager = false)
      // the convergence probe is the round's single job: it materializes
      // the lazy checkpoint, whose cached blocks the next round's halo
      // exchange then reads through the cheap map below — the former
      // eager checkpoint + separate cur re-checkpoint cost two more full
      // passes per round for the same lineage truncation
      changed = !ex.filter(_._2).isEmpty
      cur = ex.map(_._1)
      round += 1
    }
    require(!changed, s"octileDistance: not converged after $maxRounds rounds")

    val sqrt2 = math.sqrt(2.0)
    val w = width // avoid capturing `this`
    emitDist(cur, tileSize, sqrt2)
  }

  private def emitDist(cur: org.apache.spark.sql.Dataset[DistTile],
                       tileSize: Int, sqrt2: Double): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    cur.flatMap { t =>
      val baseX = t.cellX * tileSize; val baseY = t.cellY * tileSize
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int, Double)]
      var i = 0
      while (i < t.w * t.h) {
        if (t.s(i) >= 0) {
          val gx = baseX + i % t.w; val gy = baseY + i / t.w
          out += ((gx, gy, t.s(i), t.d(i), t.s(i) + t.d(i) * sqrt2))
        }
        i += 1
      }
      out
    }.toDF("x", "y", "s", "d", "dist")
  }

  /** Backlink raster (ESRI CostBackLink analog): for every reachable
    * non-source cell, the D8 code of its best predecessor — the neighbor
    * u whose state satisfies dist(v) = dist(u) + step EXACTLY in the
    * integer (s, d) algebra ((s+1, d) straight, (s, d+1) diagonal);
    * greedy-descending these codes from any cell traces a least-cost
    * path to its source. Sources (and only sources) emit code 0.
    *
    * Takes the `octileDistance` output table. One broadcast 8-row move
    * explode + one coordinate equi-join + one min agg — the same cost
    * class as a stencil op, no iteration (all path information is
    * already in the distance field).
    */
  def costBacklink(dist: DataFrame): DataFrame = {
    val spark = dist.sparkSession
    // ESRI D8 codes, diag marks the √2 moves
    val mv = spark.createDataFrame(Seq(
      (1, 1, 0, false), (2, 1, 1, true), (4, 0, 1, false), (8, -1, 1, true),
      (16, -1, 0, false), (32, -1, -1, true), (64, 0, -1, false),
      (128, 1, -1, true))).toDF("code", "dx", "dy", "diag")
    val v = dist.select(col("x"), col("y"), col("s"), col("d"))
    val u = dist.select(col("x").as("nx"), col("y").as("ny"),
      col("s").as("ns"), col("d").as("nd"))
    val bk = v.crossJoin(broadcast(mv))
      .select(col("x"), col("y"), col("s"), col("d"), col("code"),
        (col("x") + col("dx")).as("nx"), (col("y") + col("dy")).as("ny"),
        col("diag"))
      .join(u, Seq("nx", "ny"))
      .filter((!col("diag") && col("ns") + 1 === col("s") && col("nd") === col("d")) ||
        (col("diag") && col("ns") === col("s") && col("nd") + 1 === col("d")))
      .groupBy("x", "y").agg(min("code").as("code"))
    dist.select(col("x"), col("y"))
      .join(bk, Seq("x", "y"), "left")
      .select(col("x"), col("y"), coalesce(col("code"), lit(0)).as("code"))
  }
}
