package graft.tiles

import org.apache.spark.sql.Dataset

/** Third tranche: distance transform and iterative nodata fill — the
  * reference's bounded-radius neighborhood searches
  * (reference: buteo/array/distance.py:15-132, buteo/array/fill.py:18-225,
  * buteo/raster/proximity.py:25-195).
  *
  * Both are expressed as repeated halo exchanges (Pregel-style
  * supersteps): each pass extends information by the halo radius; the
  * driver loops until the bound is reached or a fixpoint is hit. At scale
  * each superstep is one stencil shuffle — no driver data movement.
  */
object TileOps3 {
  import TileOps.tileEnc

  /** Chebyshev distance transform to the nearest target pixel
    * (predicate: v == target), bounded by `maxDist` pixels. Output pixel
    * value = distance (0 for targets), `maxDist + 1` when nothing within
    * the bound — deterministic, metric-exact for the Chebyshev ring
    * expansion the reference's sorted-offset scan performs
    * (distance.py:109-128) specialized to the L∞ ball.
    */
  def distanceTransform(tiles: Dataset[Tile], target: Double, maxDist: Int): Dataset[Tile] = {
    // seed: 0 where target, +inf otherwise
    var cur = tiles.map { t =>
      val out = new Array[Double](t.pixels.length)
      var i = 0
      while (i < out.length) {
        out(i) = if (t.pixels(i) == target) 0.0 else maxDist + 1.0
        i += 1
      }
      t.copy(pixels = out)
    }
    // each superstep: d(p) = min(d(p), min over 3x3 hood of d(q) + 1)
    // radius-1 halo, repeated maxDist times (distance grows by 1 per pass)
    var step = 0
    while (step < maxDist) {
      val prev = cur
      cur = TileOps.convolve(prev, 1, "min").as("m").joinWith(prev.as("p"),
        org.apache.spark.sql.functions.expr(
          "m.cellX = p.cellX AND m.cellY = p.cellY AND m.band = p.band"))
        .map { case (minT, selfT) =>
          val out = new Array[Double](selfT.pixels.length)
          var i = 0
          while (i < out.length) {
            val viaHood = minT.pixels(i) + 1.0
            out(i) = math.min(selfT.pixels(i), math.min(viaHood, maxDist + 1.0))
            i += 1
          }
          selfT.copy(pixels = out)
        }
      if (step > 0 && step % 4 == 0) cur = cur.localCheckpoint() // cut lineage
      step += 1
    }
    cur
  }

  /** Iterative inverse-distance nodata fill until fixpoint or maxIters:
    * nodata pixels take the MEAN of valid 3×3 neighbors each pass
    * (reference: buteo/array/fill.py:78-116). Valid pixels never change.
    */
  def fillNearest(tiles: Dataset[Tile], maxIters: Int): Dataset[Tile] = {
    var cur = tiles
    var it = 0
    var remaining = 1L
    while (it < maxIters && remaining > 0) {
      val prev = cur
      cur = TileOps.convolve(prev, 1, "mean").as("m").joinWith(prev.as("p"),
        org.apache.spark.sql.functions.expr(
          "m.cellX = p.cellX AND m.cellY = p.cellY AND m.band = p.band"))
        .map { case (meanT, selfT) =>
          val out = new Array[Double](selfT.pixels.length)
          var i = 0
          while (i < out.length) {
            out(i) =
              if (selfT.pixels(i) != selfT.nodata) selfT.pixels(i)
              else meanT.pixels(i) // mean of valid hood, or nodata if none
            i += 1
          }
          selfT.copy(pixels = out)
        }
      cur = cur.localCheckpoint()
      remaining = cur.map(t => t.pixels.count(_ == t.nodata).toLong)(
        org.apache.spark.sql.Encoders.scalaLong)
        .reduce((a: Long, b: Long) => a + b)
      it += 1
    }
    cur
  }
}
