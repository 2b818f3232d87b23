package graft.tiles

/** Neighborhood ("hood") statistics — the full 19-method enum of the
  * reference's convolution kernels (reference:
  * buteo/array/convolution/funcs.py:12-391, dispatch at :286-391;
  * method list buteo/array/convolution/base.py:443-462).
  *
  * Two forms:
  *  - `uniform*`: the all-ones-kernel fast path used by the DuckDB-oracled
  *    queries. Formulas are factored so every result is reached through
  *    the same IEEE operations the oracle SQL performs (integer-exact
  *    accumulators, one final division) — no per-element weight
  *    multiplication. Moment methods (variance/std/zscore/sigma-lee)
  *    follow the reference's normalized-kernel contract (kernel weights
  *    sum to 1), which for a uniform kernel is the ordinary population
  *    statistic.
  *  - `weighted*`: the faithful per-element weighted formulas for
  *    arbitrary kernels (values and weights tracked SEPARATELY — never
  *    pre-multiplied), including the reference's weighted-quantile
  *    interpolation (funcs.py:115-130) and edge renormalization
  *    (base.py:153-156).
  */
object Hood {

  // method ids follow the reference enum (base.py:443-462)
  final val Sum = 1; final val Max = 2; final val Min = 3; final val Mean = 4
  final val Median = 5; final val Variance = 6; final val Std = 7
  final val Contrast = 8; final val Mode = 9; final val Mad = 10
  final val ZScore = 11; final val ZScoreMad = 12; final val SigmaLee = 13
  final val Quantile = 14; final val Occurrences = 15; final val Feather = 16
  final val Roughness = 17; final val Tri = 18; final val Tpi = 19
  /** Our extension: occurrences of the CENTER value (not func_value). */
  final val OccurrencesCenter = 20

  /** Method name → (id, quantile override). "quantile25" is the legacy
    * alias for quantile with q=0.25.
    */
  def methodId(method: String): (Int, Double) = method match {
    case "sum" => (Sum, Double.NaN)
    case "max" => (Max, Double.NaN)
    case "min" => (Min, Double.NaN)
    case "mean" => (Mean, Double.NaN)
    case "median" => (Median, Double.NaN)
    case "variance" => (Variance, Double.NaN)
    case "std" => (Std, Double.NaN)
    case "contrast" => (Contrast, Double.NaN)
    case "mode" => (Mode, Double.NaN)
    case "mad" => (Mad, Double.NaN)
    case "zscore" => (ZScore, Double.NaN)
    case "zscore_mad" => (ZScoreMad, Double.NaN)
    case "sigma_lee" => (SigmaLee, Double.NaN)
    case "quantile" => (Quantile, Double.NaN)
    case "quantile25" => (Quantile, 0.25)
    case "occurrences" => (Occurrences, Double.NaN)
    case "feather" => (Feather, Double.NaN)
    case "roughness" => (Roughness, Double.NaN)
    case "tri" => (Tri, Double.NaN)
    case "tpi" => (Tpi, Double.NaN)
    case "occurrences_center" => (OccurrencesCenter, Double.NaN)
    case m => throw new IllegalArgumentException(s"unknown convolve method: $m")
  }

  /** Equal-weight reference quantile over an ASCENDING-sorted prefix
    * `sorted[0, n)`: np.interp(q, (i+0.5)/n, v) == linear interpolation at
    * position q*n - 0.5, clamped (funcs.py:115-130 with equal weights).
    * For q=0.5 this coincides with the usual quantile_cont median.
    */
  def refQuantileSorted(sorted: Array[Double], n: Int, q: Double): Double = {
    val pos = q * n - 0.5
    if (pos <= 0.0) sorted(0)
    else if (pos >= n - 1) sorted(n - 1)
    else {
      val lo = math.floor(pos).toInt
      sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (pos - lo)
    }
  }

  /** ks selection floor for sigma-lee (funcs.py:196-199). */
  def sigmaLeeKs(n: Int): Int =
    math.rint(-0.0000837834 * n.toDouble * n + 0.045469 * n + 0.805733).toInt

  /** Mode over rint(values): highest count; ties → smallest value
    * (funcs.py:51-73 iterates unique values ascending, strict >).
    * Mutates `work` (sorted in place over [0, n)).
    */
  def modeSorted(work: Array[Double], n: Int): Double = {
    java.util.Arrays.sort(work, 0, n)
    var best = math.rint(work(0)); var bestCnt = 1
    var cur = best; var curCnt = 1
    var k = 1
    while (k < n) {
      val v = math.rint(work(k))
      if (v == cur) curCnt += 1
      else { cur = v; curCnt = 1 }
      if (curCnt > bestCnt) { best = cur; bestCnt = curCnt }
      k += 1
    }
    best
  }

  // ---------------------------------------------------------------------
  // Faithful weighted forms (generic-kernel path). values/weights hold the
  // present neighbors only, in kernel scan order; n = count; centerIdx =
  // index of the center pixel in the arrays or -1 if absent.
  // ---------------------------------------------------------------------

  def weightedSum(v: Array[Double], w: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += v(i) * w(i); i += 1 }
    s
  }

  private def weightSum(w: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += w(i); i += 1 }
    s
  }

  /** value at argmax(v*w) — funcs.py:12-18. */
  def weightedMax(v: Array[Double], w: Array[Double], n: Int): Double = {
    var bi = 0; var bm = v(0) * w(0); var i = 1
    while (i < n) { val m = v(i) * w(i); if (m > bm) { bm = m; bi = i }; i += 1 }
    v(bi)
  }

  /** value at argmin(adjusted/(w+1e-7)), zero-weight → max — funcs.py:21-30. */
  def weightedMin(v: Array[Double], w: Array[Double], n: Int): Double = {
    var mx = v(0); var i = 1
    while (i < n) { if (v(i) > mx) mx = v(i); i += 1 }
    var bi = 0
    var bm = (if (w(0) == 0.0) mx else v(0)) / (w(0) + 1e-7)
    i = 1
    while (i < n) {
      val m = (if (w(i) == 0.0) mx else v(i)) / (w(i) + 1e-7)
      if (m < bm) { bm = m; bi = i }
      i += 1
    }
    v(bi)
  }

  def weightedMean(v: Array[Double], w: Array[Double], n: Int): Double =
    weightedSum(v, w, n) / weightSum(w, n)

  /** Weighted quantile — funcs.py:115-130: sort by value, cum weights,
    * intersect = (cum - 0.5w)/cumLast, np.interp(q, intersect, values).
    */
  def weightedQuantile(v: Array[Double], w: Array[Double], n: Int, q: Double): Double = {
    val idx = (0 until n).sortBy(v(_)).toArray
    val cum = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { s += w(idx(i)); cum(i) = s; i += 1 }
    val last = cum(n - 1)
    // np.interp with xp = intersect (ascending), clamped at the ends
    def inter(i: Int): Double = (cum(i) - 0.5 * w(idx(i))) / last
    if (q <= inter(0)) return v(idx(0))
    if (q >= inter(n - 1)) return v(idx(n - 1))
    var j = 1
    while (inter(j) < q) j += 1
    val x0 = inter(j - 1); val x1 = inter(j)
    val y0 = v(idx(j - 1)); val y1 = v(idx(j))
    if (x1 == x0) y1 else y0 + (y1 - y0) * (q - x0) / (x1 - x0)
  }

  /** Σ w (v - Σwv)² — funcs.py:187-194 (normalized-kernel contract). */
  def weightedVariance(v: Array[Double], w: Array[Double], n: Int): Double = {
    val s = weightedSum(v, w, n)
    var acc = 0.0; var i = 0
    while (i < n) { val d = v(i) - s; acc += d * d * w(i); i += 1 }
    acc
  }

  def weightedStd(v: Array[Double], w: Array[Double], n: Int): Double =
    math.sqrt(weightedVariance(v, w, n))

  /** |max(v·w) - min(adj/(w+1e-7))| — funcs.py:100-111. */
  def weightedContrast(v: Array[Double], w: Array[Double], n: Int): Double = {
    var mx = v(0); var i = 1
    while (i < n) { if (v(i) > mx) mx = v(i); i += 1 }
    var lmin = (if (w(0) == 0.0) mx else v(0)) / (w(0) + 1e-7)
    var lmax = v(0) * w(0)
    i = 1
    while (i < n) {
      val a = (if (w(i) == 0.0) mx else v(i)) / (w(i) + 1e-7)
      if (a < lmin) lmin = a
      val b = v(i) * w(i)
      if (b > lmax) lmax = b
      i += 1
    }
    math.abs(lmax - lmin)
  }

  /** Weighted mode over rint(v); unique ascending, strict > — funcs.py:51-73. */
  def weightedMode(v: Array[Double], w: Array[Double], n: Int): Double = {
    val ints = new Array[Double](n)
    var i = 0
    while (i < n) { ints(i) = math.rint(v(i)); i += 1 }
    val uniq = ints.distinct.sorted
    var best = 0.0; var bestW = -9999.9
    uniq.foreach { u =>
      var cw = 0.0; var j = 0
      while (j < n) { if (ints(j) == u) cw += w(j); j += 1 }
      if (cw > bestW) { bestW = cw; best = u }
    }
    best
  }

  def weightedMad(v: Array[Double], w: Array[Double], n: Int): Double = {
    val med = weightedQuantile(v, w, n, 0.5)
    val dev = new Array[Double](n)
    var i = 0
    while (i < n) { dev(i) = math.abs(v(i) - med); i += 1 }
    weightedQuantile(dev, w, n, 0.5)
  }

  /** (center - Σwv)/std — funcs.py:143-155. */
  def weightedZScore(v: Array[Double], w: Array[Double], n: Int, centerIdx: Int): Double =
    (v(centerIdx) - weightedSum(v, w, n)) / weightedStd(v, w, n)

  /** (center - median)/(mad·1.4826) — funcs.py:158-170. */
  def weightedZScoreMad(v: Array[Double], w: Array[Double], n: Int, centerIdx: Int): Double = {
    val madStd = weightedMad(v, w, n) * 1.4826
    (v(centerIdx) - weightedQuantile(v, w, n, 0.5)) / madStd
  }

  /** Sigma-lee SAR filter — funcs.py:202-242: grow a |v| ≥ σ·mult
    * selection until ks values pass; weighted mean of the selection with
    * renormalized weights.
    */
  def weightedSigmaLee(v: Array[Double], w: Array[Double], n: Int): Double = {
    val std = weightedStd(v, w, n)
    val ks = sigmaLeeKs(n)
    // the reference's attempt loop only ever selects on the mult=1
    // criterion (growing mult is stricter, and prior selections persist);
    // later attempts merely re-count the same members, so the selection
    // IS {v: |v| >= σ} whenever it is non-empty
    val selW = new Array[Double](n)
    var passed = 0
    var i = 0
    while (i < n) {
      if (v(i) >= std || v(i) <= -std) { selW(i) = w(i); passed += 1 }
      i += 1
    }
    if (passed == 0 || passed * 5 < ks) return weightedSum(v, w, n)
    val sw = weightSum(selW, n)
    if (sw == 0.0) return 0.0
    var acc = 0.0
    i = 0
    while (i < n) { acc += v(i) * (selW(i) / sw); i += 1 }
    acc
  }

  /** Σ w·[v == funcValue] (optionally / n for feather) — funcs.py:76-97. */
  def weightedOccurrences(v: Array[Double], w: Array[Double], n: Int,
                          funcValue: Double, normalise: Boolean): Double = {
    var occ = 0.0; var i = 0
    while (i < n) { if (v(i) == funcValue && w(i) > 0.0) occ += w(i); i += 1 }
    if (normalise) occ / n else occ
  }

  /** |center - v[argmax(|v-center|·w)]| — funcs.py:245-257. */
  def weightedRoughness(v: Array[Double], w: Array[Double], n: Int, centerIdx: Int): Double = {
    val c = v(centerIdx)
    var bi = 0; var bm = math.abs(v(0) - c) * w(0); var i = 1
    while (i < n) { val m = math.abs(v(i) - c) * w(i); if (m > bm) { bm = m; bi = i }; i += 1 }
    math.abs(c - v(bi))
  }

  /** Σ w'·|v_noncenter - center|, w' renormalized — funcs.py:278-291. */
  def weightedTri(v: Array[Double], w: Array[Double], n: Int, centerIdx: Int): Double = {
    if (n <= 1) return 0.0
    val c = v(centerIdx)
    var sw = 0.0; var i = 0
    while (i < n) { if (i != centerIdx) sw += w(i); i += 1 }
    var acc = 0.0; i = 0
    while (i < n) { if (i != centerIdx) acc += math.abs(v(i) - c) * (w(i) / sw); i += 1 }
    acc
  }

  /** |center - Σ w'·v_noncenter| — funcs.py:260-275. */
  def weightedTpi(v: Array[Double], w: Array[Double], n: Int, centerIdx: Int): Double = {
    if (n <= 1) return 0.0
    val c = v(centerIdx)
    var sw = 0.0; var i = 0
    while (i < n) { if (i != centerIdx) sw += w(i); i += 1 }
    var acc = 0.0; i = 0
    while (i < n) { if (i != centerIdx) acc += v(i) * (w(i) / sw); i += 1 }
    math.abs(c - acc)
  }
}
