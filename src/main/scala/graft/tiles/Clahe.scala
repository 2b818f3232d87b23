package graft.tiles

/** Contrast-Limited Adaptive Histogram Equalization — port of the
  * reference's vendored scikit-image CLAHE (gefolki.py:27-347: _clahe,
  * clip_histogram, map_histogram, interpolate) used by GEFolki's
  * multi-sensor preprocessing.
  *
  * NOTE — reference bug, fixed here: the vendored `interpolate`
  * (gefolki.py:301-347) rebinds `view` to an `np.rint(...).astype(int)`
  * COPY before writing the interpolated block back, so as shipped the
  * whole equalization is a no-op on the image (the function mutates the
  * copy). The original scikit-image code this was vendored from writes
  * through the live view; we port THAT semantics (one-line fix) and pin
  * the output against the fixed reference run in FolkiSpec.
  */
object Clahe {

  /** _clahe on an integer image (values 0..nrOfGrey−1), in place on a
    * copy. Region sizes must be even (the edge interpolation blocks are
    * half-regions; fractional steps never arise in GEFolki's 8×8 use).
    */
  def clahe(imageIn: Array[Int], w: Int, h: Int, ntilesXIn: Int, ntilesYIn: Int,
            clipLimitScaled: Double, nbins: Int,
            nrOfGrey: Int = 16384): Array[Int] = {
    // reference quirk preserved: ntiles_y is overwritten from ntiles_x
    val ntilesX0 = math.min(ntilesXIn, 16)
    val ntilesY = math.max(ntilesX0, 2)
    val ntilesX = math.max(ntilesY, 2)
    val image = imageIn.clone()
    if (clipLimitScaled == 1.0) return image

    val yRes = h - h % ntilesY
    val xRes = w - w % ntilesX
    val xSize = xRes / ntilesX
    val ySize = yRes / ntilesY
    require(xSize % 2 == 0 && ySize % 2 == 0,
      s"CLAHE region sizes must be even (got $xSize x $ySize)")
    val nPixels = xSize * ySize
    val clipLimit =
      if (clipLimitScaled > 0.0) math.max(1, (clipLimitScaled * nPixels / nbins).toInt)
      else nrOfGrey

    val binSize = 1.0 + nrOfGrey.toDouble / nbins
    val aLUT = Array.tabulate(nrOfGrey)(g => math.floor(g / binSize).toInt)

    // per-region clipped + equalized LUTs
    val mapArray = Array.ofDim[Int](ntilesY, ntilesX, nbins)
    var ty = 0
    while (ty < ntilesY) {
      var tx = 0
      while (tx < ntilesX) {
        val hist = new Array[Long](nbins)
        var r = 0
        while (r < ySize) {
          var c = 0
          while (c < xSize) {
            hist(aLUT(image((ty * ySize + r) * w + tx * xSize + c))) += 1
            c += 1
          }
          r += 1
        }
        clipHistogram(hist, clipLimit)
        mapArray(ty)(tx) = mapHistogram(hist, 0, nrOfGrey - 1, nPixels)
        tx += 1
      }
      ty += 1
    }

    // bilinear interpolation between the four surrounding region LUTs
    var yStart = 0
    var yB = 0
    var y = 0
    while (y <= ntilesY) {
      var xStart = 0
      val (yStep, yU) =
        if (y == 0) { yB = 0; (ySize / 2, 0) }
        else if (y == ntilesY) (ySize / 2, ntilesY - 1)
        else { yB += 1; (ySize, y - 1) }
      val yBot = if (y == ntilesY) ntilesY - 1 else yB
      var x = 0
      while (x <= ntilesX) {
        val (xStep, xL) =
          if (x == 0) (xSize / 2, 0)
          else if (x == ntilesX) (xSize / 2, ntilesX - 1)
          else (xSize, x - 1)
        val xR = if (x == 0) 0 else if (x == ntilesX) xL else xL + 1
        val mapLU = mapArray(yU)(xL); val mapRU = mapArray(yU)(xR)
        val mapLB = mapArray(yBot)(xL); val mapRB = mapArray(yBot)(xR)
        val norm = xStep.toDouble * yStep
        var yi = 0
        while (yi < yStep) {
          val yc = yi.toDouble; val yInv = (yStep - yi).toDouble
          var xi = 0
          while (xi < xStep) {
            val px = (yStart + yi) * w + (xStart + xi)
            if (yStart + yi < yRes && xStart + xi < xRes) {
              val b = aLUT(image(px))
              val xc = xi.toDouble; val xInv = (xStep - xi).toDouble
              val nv = (yInv * (xInv * mapLU(b) + xc * mapRU(b)) +
                yc * (xInv * mapLB(b) + xc * mapRB(b))) / norm
              image(px) = nv.toInt // float→int truncation, numpy astype
            }
            xi += 1
          }
          yi += 1
        }
        xStart += xStep
        x += 1
      }
      yStart += yStep
      y += 1
    }
    image
  }

  /** clip_histogram (gefolki.py:217-269): clip bins at the limit and
    * redistribute the excess; the trailing while-loop's stepped scan is
    * ported with in-bounds index semantics (the reference's boolean-mask
    * reindex is unreachable in GEFolki's configuration).
    */
  def clipHistogram(hist: Array[Long], clipLimit: Long): Unit = {
    var nExcess = 0L
    var i = 0
    while (i < hist.length) {
      if (hist(i) > clipLimit) nExcess += hist(i) - clipLimit
      i += 1
    }
    if (nExcess == 0) return
    val binIncr = nExcess / hist.length
    val upper = clipLimit - binIncr
    i = 0
    while (i < hist.length) {
      if (hist(i) > clipLimit) hist(i) = clipLimit
      i += 1
    }
    i = 0
    while (i < hist.length) {
      if (hist(i) < upper) { nExcess -= binIncr; hist(i) += binIncr }
      else if (hist(i) < clipLimit) { nExcess -= clipLimit - hist(i); hist(i) = clipLimit }
      i += 1
    }
    while (nExcess > 0) {
      var index = 0
      while (nExcess > 0 && index < hist.length) {
        var under = 0
        var j = 0
        while (j < hist.length) { if (hist(j) < clipLimit) under += 1; j += 1 }
        val stepSize = math.max(1L, under / nExcess)
        var k = index
        while (k < hist.length) {
          if (hist(k) < clipLimit && nExcess > 0) { hist(k) += 1; nExcess -= 1 }
          k += stepSize.toInt
        }
        index += 1
      }
    }
  }

  /** map_histogram (gefolki.py:271-299): scaled cumulative histogram,
    * clamped, truncated to int.
    */
  def mapHistogram(hist: Array[Long], minVal: Int, maxVal: Int,
                   nPixels: Int): Array[Int] = {
    val out = new Array[Int](hist.length)
    val scale = (maxVal - minVal).toDouble / nPixels
    var cum = 0.0
    var i = 0
    while (i < hist.length) {
      cum += hist(i)
      val v = cum * scale + minVal
      out(i) = (if (v > maxVal) maxVal.toDouble else v).toInt
      i += 1
    }
    out
  }

  /** GEFolki's grayscale preprocessing chain (gefolki.py:440-460):
    * [0,1] float → ×255 uint8 → ×257 uint16 → rescale to 0..16383 →
    * _clahe(8×8, clip 256, 256 bins) → rescale to dtype range → /max.
    * Width/height must be multiples of 16 (8 tiles × even region size);
    * GEFolki pads via resize otherwise — callers here size planes to fit.
    */
  def equalizeChain(img: Array[Double], w: Int, h: Int): Array[Double] = {
    val u16 = img.map(v => (v * 255).toInt * 257)
    var mn = Int.MaxValue; var mx = Int.MinValue
    u16.foreach { v => if (v < mn) mn = v; if (v > mx) mx = v }
    val span = math.max(1, mx - mn)
    val scaled = u16.map(v => ((v - mn).toDouble / span * 16383).toInt)
    val out = clahe(scaled, w, h, 8, 8, 256.0, 256)
    var mn2 = Int.MaxValue; var mx2 = Int.MinValue
    out.foreach { v => if (v < mn2) mn2 = v; if (v > mx2) mx2 = v }
    val span2 = math.max(1, mx2 - mn2)
    val res = out.map(v => ((v - mn2).toDouble / span2 * 65535).toInt)
    var top = 0
    res.foreach(v => if (v > top) top = v)
    val topF = if (top > 0) top.toDouble else 1.0
    // the reference casts through float32 before /max; mirror that
    res.map(v => (v.toFloat / topF.toFloat).toDouble)
  }
}
