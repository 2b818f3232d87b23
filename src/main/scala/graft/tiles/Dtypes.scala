package graft.tiles

/** Dtype lattice: per-dtype default nodata values and value ranges —
  * exact port of the reference's tables (reference:
  * buteo/utils/utils_translate.py:417-471 default nodata,
  * :474-570 ranges; safe-cast checks :739).
  */
object Dtypes {

  /** Default nodata sentinel per dtype (utils_translate.py:443-458). */
  def defaultNodata(dtype: String): Double = dtype.toLowerCase match {
    case "int8" => -127.0
    case "int16" => -32767.0
    case "int32" => -2147483647.0
    case "int64" => -9223372036854775807.0
    case "uint8" | "byte" => 255.0
    case "uint16" => 65535.0
    case "uint32" => 4294967295.0
    case "uint64" => 18446744073709551615.0
    case "float16" | "float32" | "float64" | "cfloat32" | "cfloat64" => -9999.0
    case d => throw new IllegalArgumentException(s"Unsupported dtype: $d")
  }

  /** Representable value range per dtype (utils_translate.py:474-570). */
  def valueRange(dtype: String): (Double, Double) = dtype.toLowerCase match {
    case "int8" => (-128.0, 127.0)
    case "int16" => (-32768.0, 32767.0)
    case "int32" => (-2147483648.0, 2147483647.0)
    case "int64" => (-9.223372036854776e18, 9.223372036854776e18)
    case "uint8" | "byte" => (0.0, 255.0)
    case "uint16" => (0.0, 65535.0)
    case "uint32" => (0.0, 4294967295.0)
    case "uint64" => (0.0, 1.8446744073709552e19)
    case "float16" => (-65500.0, 65500.0)
    case "float32" => (-3.4028235e38, 3.4028235e38)
    case "float64" | "cfloat32" | "cfloat64" => (Double.MinValue, Double.MaxValue)
    case d => throw new IllegalArgumentException(s"Unsupported dtype: $d")
  }

  /** Can every value in [lo, hi] be represented by dtype (safe cast)? */
  def fitsRange(dtype: String, lo: Double, hi: Double): Boolean = {
    val (mn, mx) = valueRange(dtype)
    lo >= mn && hi <= mx
  }

  /** Is `v` representable without truncation (integral check for int
    * dtypes)?
    */
  def valueFits(dtype: String, v: Double): Boolean = {
    val (mn, mx) = valueRange(dtype)
    val integral = dtype.toLowerCase match {
      case d if d.startsWith("int") || d.startsWith("uint") || d == "byte" => v == math.rint(v)
      case _ => true
    }
    v >= mn && v <= mx && integral
  }
}
