package graft.tiles

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Hydrology on the tile grid: D8 flow direction and watershed (flow-sink)
  * resolution — the DEM-family ops downstream of slope/aspect/hillshade
  * (reference DEM surface: buteo/raster/dem.py; the reference stops at
  * terrain shading — flow routing is the natural next member, O'Callaghan
  * & Mark 1984 "The extraction of drainage networks from digital elevation
  * data").
  *
  * Scale shape: flow direction is ONE radius-1 halo exchange (the shared
  * convolvePad machinery) followed by a pure per-pixel argmax — map-only
  * after the halo groupByKey, no driver state. Sink resolution is
  * pointer-doubling over the (pixel → downhill neighbor) function, i.e.
  * exactly the redirect-chain problem (WebOps.resolveRedirects): log₂(L)
  * rounds for the longest flow path L instead of L supersteps, each round
  * one self-equi-join. D8 paths are provably acyclic (every hop strictly
  * decreases elevation), so the cycle branch of the resolver is dead here
  * and every pixel resolves to a pit.
  */
object Flow {
  import TileOps.tileEnc

  /** ESRI D8 direction codes in tie-break order (lowest code wins a
    * drop tie): E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128 —
    * (dx, dy) with y growing downward (pixel rows), diagonal distance
    * √2 in cell units (square-pixel contract, so pixel size cancels
    * out of the drop comparison).
    */
  private val Sqrt2 = math.sqrt(2.0)
  private[tiles] val D8: Array[(Int, Int, Int, Double)] = Array(
    (1, 1, 0, 1.0), (2, 1, 1, Sqrt2), (4, 0, 1, 1.0), (8, -1, 1, Sqrt2),
    (16, -1, 0, 1.0), (32, -1, -1, Sqrt2), (64, 0, -1, 1.0), (128, 1, -1, Sqrt2))

  /** D8 flow direction: per pixel, the direction code of the steepest
    * positive drop (zc − zn)/dist over the 8 in-bounds neighbors;
    * ties break to the LOWEST code; no positive drop (pit / flat) → 0.
    * Out-of-raster neighbors (NaN in the halo pad) are excluded, so
    * border pixels can only drain inward or pit — the closed-basin
    * convention (off-grid drainage is a caller-side reclass of border
    * pits if wanted).
    */
  def flowDir(tiles: Dataset[Tile]): Dataset[Tile] = {
    TileOps.convolvePad(tiles, 1).map { case (t, pad, pw, _) =>
      val out = new Array[Double](t.w * t.h)
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          val zc = pad((r + 1) * pw + (c + 1))
          var best = 0.0
          var bestCode = 0
          var k = 0
          while (k < 8) {
            val (code, dx, dy, dist) = D8(k)
            val zn = pad((r + 1 + dy) * pw + (c + 1 + dx))
            if (!zn.isNaN) {
              val drop = (zc - zn) / dist
              if (drop > best) { best = drop; bestCode = code }
            }
            k += 1
          }
          out(r * t.w + c) = bestCode.toDouble
          c += 1
        }
        r += 1
      }
      t.copy(pixels = out)
    }(tileEnc)
  }

  private def d8Delta(code: Int): (Int, Int) = code match {
    case 1 => (1, 0);   case 2 => (1, 1);    case 4 => (0, 1)
    case 8 => (-1, 1);  case 16 => (-1, 0);  case 32 => (-1, -1)
    case 64 => (0, -1); case 128 => (1, -1); case _ => (0, 0)
  }

  /** Per-tile emission rows for flowAccumulation — one unified shape so
    * the whole local analysis is ONE halo exchange + flatMap:
    * kind 0 cell base (a=cellId, n=within-tile upstream count);
    * kind 1 boundary-crossing edge (a=srcId, b=dstEntryId, n=units);
    * kind 2 entry-path membership (a=entryId, b=cellId on its path);
    * kind 3 entry forward target (a=entryId, b=nextEntryId in the
    * downstream tile; absent when the path pits inside the tile).
    */
  private[tiles] final case class AccEmit(kind: Int, a: Long, b: Long, n: Long)

  /** D8 flow accumulation: per pixel, the number of upstream pixels whose
    * flow path passes through it (ESRI convention — self excluded).
    *
    * Two-level tile condensation (the parallel-flow-accumulation design of
    * Wallis, Tarboton et al., TauDEM, HIC 2009 — NOT per-pixel delta
    * rounds, which would need longest-flow-path supersteps):
    *  1. ONE radius-1 halo exchange over the CODE raster; inside each tile
    *     a sequential Kahn pass computes every cell's within-tile upstream
    *     count, plus the tile's boundary-crossing edges (with the unit
    *     counts they carry) and, per entry cell, its within-tile
    *     continuation path and the entry it forwards to in the next tile.
    *  2. Cross-tile propagation runs on the CONDENSED functional graph
    *     whose nodes are entry cells only (perimeter-bounded, tileSize×
    *     smaller than the pixel graph): deliveries at an entry forward
    *     unamplified to its unique next entry, so rounds = tile-crossing
    *     diameter ≈ pixel diameter / tileSize, each round shuffling only
    *     boundary cells. D8 descent is strict, so the condensed graph is
    *     acyclic and the frontier provably drains.
    *  3. Final join: cell acc = local count + Σ totals of the entries
    *     whose continuation path covers the cell.
    */
  def flowAccumulation(codeTiles: Dataset[Tile], tileSize: Int, width: Int,
                       maxRounds: Int = 256): DataFrame = {
    val spark = codeTiles.sparkSession
    import spark.implicits._
    val w = width.toLong
    val emits = TileOps.convolvePad(codeTiles, 1).flatMap { case (t, pad, pw, _) =>
      val baseX = t.cellX * tileSize; val baseY = t.cellY * tileSize
      val n = t.w * t.h
      // code at LOCAL (r, c), halo range r,c ∈ [-1, t.h/t.w]; -1 = off-raster
      def codeAt(r: Int, c: Int): Int = {
        val v = pad((r + 1) * pw + (c + 1)); if (v.isNaN) -1 else v.toInt
      }
      def gid(r: Int, c: Int): Long = (baseY + r).toLong * w + (baseX + c)
      val parentIdx = new Array[Int](n) // local idx, -1 pit, -2 exits tile
      val indeg = new Array[Int](n)
      var r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          val i = r * t.w + c
          val cd = codeAt(r, c)
          if (cd > 0) {
            val (dx, dy) = d8Delta(cd)
            val nr = r + dy; val nc = c + dx
            if (nr >= 0 && nr < t.h && nc >= 0 && nc < t.w) {
              parentIdx(i) = nr * t.w + nc; indeg(nr * t.w + nc) += 1
            } else parentIdx(i) = -2
          } else parentIdx(i) = -1
          c += 1
        }
        r += 1
      }
      // Kahn over within-tile edges: acc(i) = # within-tile upstream cells
      val acc = new Array[Long](n)
      val stack = new Array[Int](n); var sp = 0
      var i = 0
      while (i < n) { if (indeg(i) == 0) { stack(sp) = i; sp += 1 }; i += 1 }
      while (sp > 0) {
        sp -= 1; val u = stack(sp); val p = parentIdx(u)
        if (p >= 0) {
          acc(p) += acc(u) + 1; indeg(p) -= 1
          if (indeg(p) == 0) { stack(sp) = p; sp += 1 }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[AccEmit]
      r = 0
      while (r < t.h) {
        var c = 0
        while (c < t.w) {
          val i = r * t.w + c
          out += AccEmit(0, gid(r, c), 0L, acc(i))
          if (parentIdx(i) == -2) { // boundary-crossing edge
            val (dx, dy) = d8Delta(codeAt(r, c))
            out += AccEmit(1, gid(r, c), gid(r + dy, c + dx), acc(i) + 1)
          }
          // entry cell: some OUT-OF-TILE halo neighbor drains into (r, c)
          var isEntry = false
          var k = 0
          while (k < 8 && !isEntry) {
            val (_, dx, dy, _) = D8(k)
            val nr = r + dy; val nc = c + dx
            if (nr < 0 || nr >= t.h || nc < 0 || nc >= t.w) {
              val cn = codeAt(nr, nc)
              if (cn > 0) {
                val (bx, by) = d8Delta(cn)
                if (bx == -dx && by == -dy) isEntry = true
              }
            }
            k += 1
          }
          if (isEntry) { // walk the continuation path to pit or tile exit
            val e = gid(r, c)
            var j = i
            var walking = true
            while (walking) {
              out += AccEmit(2, e, gid(j / t.w, j % t.w), 0L)
              parentIdx(j) match {
                case -1 => walking = false
                case -2 =>
                  val jr = j / t.w; val jc = j % t.w
                  val (dx, dy) = d8Delta(codeAt(jr, jc))
                  out += AccEmit(3, e, gid(jr + dy, jc + dx), 0L)
                  walking = false
                case p => j = p
              }
            }
          }
          c += 1
        }
        r += 1
      }
      out
    }.coalesce(graft.ops.Adapt.cachePartitions(codeTiles.toDF())).persist()
    val cells = emits.filter(col("kind") === 0)
      .select(col("a").as("id"), col("n").as("local"))
    val paths = emits.filter(col("kind") === 2)
      .select(col("a").as("entry"), col("b").as("cell"))
    // cached/checkpointed loop state coalesces to the adaptive cache
    // width: the entry-transition table and per-round frontiers pinned
    // the full conf-partition width otherwise (near-empty tasks per
    // round; see Adapt.cachePartitions)
    val pF = emits.rdd.getNumPartitions
    val nextE = emits.filter(col("kind") === 3)
      .select(col("a").as("entry"), col("b").as("next_entry"))
      .coalesce(pF).persist()
    var frontier = emits.filter(col("kind") === 1)
      .groupBy(col("b").as("entry")).agg(sum("n").as("amt"))
      .select(col("entry"), col("amt"))
      .coalesce(pF)
      // lazy: the loop's isEmpty probe (the real per-round decision)
      // materializes each round's checkpoint; the eager form paid an
      // extra full pass per round for the same lineage truncation
      .localCheckpoint(eager = false)
    val totals = scala.collection.mutable.ListBuffer(frontier)
    var round = 0
    while (round < maxRounds && !frontier.isEmpty) {
      frontier = frontier.join(nextE, "entry")
        .groupBy(col("next_entry").as("entry")).agg(sum("amt").as("amt"))
        .coalesce(pF)
        .localCheckpoint(eager = false)
      totals += frontier
      round += 1
    }
    require(round < maxRounds,
      s"flowAccumulation: frontier not drained after $maxRounds rounds")
    val entryTotals = totals.reduce(_ union _)
      .groupBy("entry").agg(sum("amt").as("tot"))
    val inflow = paths.join(entryTotals, "entry")
      .groupBy("cell").agg(sum("tot").as("inflow"))
    cells.join(inflow, cells("id") === inflow("cell"), "left")
      .select((col("id") % w).cast("int").as("x"),
        (col("id") / w).cast("int").as("y"),
        (col("local") + coalesce(col("inflow"), lit(0L))).as("acc"))
  }

  /** Watershed assignment from a flow-direction PIXEL table
    * (`(x, y, band, v=code)`, the toPixels shape): every pixel resolves
    * to its terminal pit (`sink_x`, `sink_y`) with the hop count of the
    * flow path. Pixels that are themselves pits (code 0) resolve to
    * themselves at 0 hops. `width` packs (x, y) into one Long key for
    * the doubling joins; `maxHops` bounds the longest flow path (the
    * resolver runs ⌈log₂ maxHops⌉ + 1 rounds — elevation strictly
    * decreases per hop, so L is bounded by the DEM's value range).
    */
  def flowSinks(flowPx: DataFrame, width: Int, maxHops: Int = 64): DataFrame = {
    require(width >= 1, s"flowSinks: width >= 1, got $width")
    val w = lit(width.toLong)
    val code = col("v").cast("int")
    val dxExpr = D8.foldLeft(lit(0)) { case (acc, (c, dx, _, _)) =>
      when(code === c, lit(dx)).otherwise(acc) }
    val dyExpr = D8.foldLeft(lit(0)) { case (acc, (c, _, dy, _)) =>
      when(code === c, lit(dy)).otherwise(acc) }
    val ids = flowPx
      .select(col("x"), col("y"), code.as("code"),
        (col("y").cast("long") * w + col("x").cast("long")).as("id"),
        ((col("y") + dyExpr).cast("long") * w +
          (col("x") + dxExpr).cast("long")).as("next_id"))
    val edges = ids.filter(col("code") =!= 0)
      .select(col("id").as("src"), col("next_id").as("dst"))
    val resolved = graft.ops.WebOps.resolveRedirects(edges, maxHops)
    ids.select(col("x"), col("y"), col("id"), col("code"))
      .join(resolved, col("id") === col("src"), "left")
      .select(col("x"), col("y"),
        coalesce(col("final"), col("id")).as("sink_id"),
        coalesce(col("hops"), lit(0L)).as("hops"))
      .select(col("x"), col("y"),
        (col("sink_id") % w).cast("int").as("sink_x"),
        (col("sink_id") / w).cast("int").as("sink_y"),
        col("hops"))
  }
}
