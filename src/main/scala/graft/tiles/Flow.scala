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
