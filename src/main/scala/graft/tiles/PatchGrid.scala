package graft.tiles

/** Patch-grid planning utilities — ports of the reference's raster
  * read-offset planners (buteo/core_raster/core_raster_offsets.py).
  * Pure integer/float math, used driver-side to plan reads; the driver
  * queries distribute the combos so the oracle pins every branch.
  */
object PatchGrid {

  /** Split an image into `numPatches` with minimal
    * aspect-ratio-difference + wasted-coverage score — port of
    * _find_optimal_patch_factors (core_raster_offsets.py:11-73).
    * Returns (hPatches, wPatches); ties keep the smallest hPatches
    * (the reference's strict `<` keeps the first best).
    */
  def findOptimalPatchFactors(numPatches: Int, width: Int, height: Int): (Int, Int) = {
    require(numPatches >= 1, "numPatches must be >= 1")
    if (numPatches == 1) return (1, 1)
    var best = (1, 1)
    var minScore = Double.PositiveInfinity
    val targetAspect = width.toDouble / height
    var i = 1
    while (i <= numPatches) {
      if (numPatches % i == 0) {
        val hP = i; val wP = numPatches / i
        val pw = width.toDouble / wP
        val ph = height.toDouble / hP
        val aspectDiff = math.abs(pw / ph - targetAspect)
        val total = width.toDouble * height
        val covered = (pw.toInt * wP).toDouble * (ph.toInt * hP)
        val score = aspectDiff + (total - covered) / total
        if (score < minScore) { minScore = score; best = (hP, wP) }
      }
      i += 1
    }
    best
  }

  /** Patch read-windows (x, y, sizeX, sizeY) covering the image, with
    * optional symmetric overlap — port of _get_patch_offsets
    * (core_raster_offsets.py:74-141): base grid from the optimal
    * factors, last row/col absorbs the remainder, overlap grows each
    * window by ceil(overlap/2) clamped to the image.
    */
  def patchOffsets(width: Int, height: Int, numPatches: Int,
                   overlap: Int = 0): Seq[(Int, Int, Int, Int)] = {
    require(overlap >= 0, "overlap must be non-negative")
    val (hP, wP) = findOptimalPatchFactors(numPatches, width, height)
    val base = for (h <- 0 until hP; w <- 0 until wP) yield {
      val hs = h * (height / hP); val ws = w * (width / wP)
      val he = if (h == hP - 1) height else (h + 1) * (height / hP)
      val we = if (w == wP - 1) width else (w + 1) * (width / wP)
      (ws, hs, we - ws, he - hs)
    }
    if (overlap == 0) base
    else {
      val half = (overlap + 1) / 2 // ceil(overlap/2)
      base.map { case (x, y, sx, sy) =>
        val nx = math.max(0, x - half)
        val ny = math.max(0, y - half)
        (nx, ny, math.min(sx + half, width - nx), math.min(sy + half, height - ny))
      }
    }
  }
}
