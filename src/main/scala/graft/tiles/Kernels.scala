package graft.tiles

/** Kernel builders for the weighted convolve path — port of the
  * reference's constructors (reference:
  * buteo/array/convolution/kernels.py — kernel_base :197-270,
  * kernel_circular via _circular_kernel_2D, kernel_sobel :382-451,
  * kernel_unsharp :343-380 semantics).
  *
  * All builders return a `(dx, dy) => Double` weight function consumable
  * by TileOps.convolve's `weight` parameter (normalization happens in
  * convolve via its `normalised` flag, mirroring kernel_base).
  */
object Kernels {

  /** kernel_base: optionally circular footprint, optional center hole,
    * optional distance weighting (0 linear, 1 sqrt, 2 power, 3 gaussian,
    * 4 constant).
    */
  def base(radius: Double, circular: Boolean = false,
           distanceWeighted: Boolean = false, hole: Boolean = false,
           method: Int = 0, decay: Double = 0.2, sigma: Double = 2.0): (Int, Int) => Double =
    (dx, dy) => {
      if (hole && dx == 0 && dy == 0) 0.0
      else {
        val d = math.sqrt(dx.toDouble * dx + dy.toDouble * dy)
        val inside = if (circular) d <= radius + 1e-9 else true
        if (!inside) 0.0
        else if (!distanceWeighted) 1.0
        else method match {
          case 0 => math.max(0.0, 1.0 - d / (radius + 1.0))      // linear
          case 1 => math.max(0.0, 1.0 - math.sqrt(d / (radius + 1.0))) // sqrt
          case 2 => math.max(0.0, 1.0 - math.pow(d / (radius + 1.0), 2.0)) // power
          case 3 => math.exp(-(d * d) / (2.0 * sigma * sigma))   // gaussian
          case _ => 1.0                                          // constant
        }
      }
    }

  def circular(radius: Double): (Int, Int) => Double = base(radius, circular = true)

  /** Classic 3×3 sobel pair (radius-1 instance of kernel_sobel). */
  val sobelGx: (Int, Int) => Double = (dx, dy) =>
    if (dx == 0) 0.0 else (if (dy == 0) 2.0 else 1.0) * (if (dx < 0) 1.0 else -1.0)
  val sobelGy: (Int, Int) => Double = (dx, dy) =>
    if (dy == 0) 0.0 else (if (dx == 0) 2.0 else 1.0) * (if (dy < 0) 1.0 else -1.0)
}
