package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Polyline operations over a POINT TABLE (fid, seq, x, y) — the
  * Spark-first shape: every op below is pure `functions._` + window
  * expressions (whole-stage codegen, no UDF), keyed so all three stay a
  * single hash-partition by fid. The reference's vector surface stops at
  * simplify/buffer (the buteo/vector modules); densify / interpolate / segment
  * metrics are the standard complements (PostGIS ST_Segmentize,
  * ST_LineInterpolatePoint, ST_Azimuth semantics).
  *
  * Scale shape: one shuffle on fid for the windows, then map-only
  * emission; densify's output is bounded by total length / maxLen, not
  * by row fan-out of the biggest feature times anything. A 10⁹-feature
  * layer partitions by fid with no skew beyond the longest single
  * feature (features are bounded; no cross-feature state).
  *
  * Exactness: with integer vertex coordinates every dx/dy is exact;
  * azimuth carries the ROUND-9 trig recipe; densify/interpolate emit
  * the same single-rounded IEEE expressions their SQL mirrors use.
  */
object LineOps {

  /** LINESTRING WKT → (fid, seq, x, y) point table. */
  def linePoints(df: DataFrame, idCol: String, wktCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wktCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (fid, wkt) =>
        val i = wkt.indexOf('('); val j = wkt.lastIndexOf(')')
        wkt.substring(i + 1, j).split(",").iterator.map(_.trim)
          .filter(_.nonEmpty).zipWithIndex.map { case (p, k) =>
            val xy = p.split("\\s+")
            (fid, k, xy(0).toDouble, xy(1).toDouble)
          }
      }.toDF("fid", "seq", "x", "y")
  }

  private def segBase(pts: DataFrame): DataFrame = {
    val w = Window.partitionBy("fid").orderBy("seq")
    pts.select(col("fid"), col("seq").as("seg"), col("x"), col("y"),
        lead("x", 1).over(w).as("x1"), lead("y", 1).over(w).as("y1"),
        count(lit(1)).over(Window.partitionBy("fid")).as("npts"))
      .where(col("x1").isNotNull)
      .withColumn("dx", col("x1") - col("x"))
      .withColumn("dy", col("y1") - col("y"))
      .withColumn("len", sqrt(col("dx") * col("dx") + col("dy") * col("dy")))
  }

  /** Per-segment length and geographic azimuth (degrees clockwise from
    * +y / north, ROUND-9): (fid, seg, len, az).
    */
  def segmentMetrics(pts: DataFrame): DataFrame =
    segBase(pts).select(col("fid"), col("seg"), col("len"),
      round(degrees(atan2(col("dx"), col("dy"))), 9).as("az"))

  /** Insert evenly spaced vertices so no piece exceeds `maxLen`
    * (ST_Segmentize): output (fid, seg, i, px, py); the final line
    * vertex is emitted as i = n of the last segment.
    */
  def densify(pts: DataFrame, maxLen: Double): DataFrame = {
    require(maxLen > 0, s"densify: maxLen > 0, got $maxLen")
    segBase(pts)
      .withColumn("n", greatest(ceil(col("len") / maxLen).cast("int"), lit(1)))
      .withColumn("hi", when(col("seg") === col("npts") - 2, col("n"))
        .otherwise(col("n") - 1))
      .select(col("fid"), col("seg"), col("x"), col("y"), col("dx"),
        col("dy"), col("n"), explode(sequence(lit(0), col("hi"))).as("i"))
      .select(col("fid"), col("seg"), col("i"),
        (col("x") + (col("i").cast("double") / col("n").cast("double")) * col("dx")).as("px"),
        (col("y") + (col("i").cast("double") / col("n").cast("double")) * col("dy")).as("py"))
  }

  /** Point at fraction f ∈ (0, 1) of each line's total length, for each
    * f in `fractions` (ST_LineInterpolatePoint): (fid, frac, px, py).
    * The winning segment is the one with cum <= f·total < cum + len —
    * deterministic even when the target lands exactly on a vertex.
    */
  def interpolate(pts: DataFrame, fractions: Seq[Double]): DataFrame = {
    require(fractions.forall(f => f > 0 && f < 1),
      "interpolate: fractions must be strictly inside (0, 1)")
    val w = Window.partitionBy("fid").orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segs = segBase(pts)
      .withColumn("cum", sum("len").over(w) - col("len"))
      .withColumn("total", sum("len").over(Window.partitionBy("fid")))
    segs.select(col("fid"), col("x"), col("y"), col("dx"), col("dy"),
        col("len"), col("cum"), col("total"),
        explode(array(fractions.map(lit): _*)).as("frac"))
      .withColumn("target", col("frac") * col("total"))
      .where(col("cum") <= col("target") && col("target") < col("cum") + col("len"))
      .select(col("fid"), col("frac"),
        (col("x") + ((col("target") - col("cum")) / col("len")) * col("dx")).as("px"),
        (col("y") + ((col("target") - col("cum")) / col("len")) * col("dy")).as("py"))
  }

  /** Chaikin corner cutting (1974), `iters` rounds: every segment (P, Q)
    * contributes the two points ¾P + ¼Q and ¼P + ¾Q; the original
    * endpoints are kept (open-polyline convention). The weights are
    * DYADIC, so on dyadic input coordinates every output coordinate is
    * exact — no rounding recipe, bit-identical at any parallelism, and
    * the SQL mirror is plain arithmetic. Each round is one fid-window +
    * a 2× generator on the same key (the exchange is reused; a 10⁹-line
    * layer stays hash-partitioned by fid throughout).
    */
  def chaikin(pts: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, s"chaikin: iters in [1,8], got $iters")
    var cur = pts.select(col("fid"), col("seq"), col("x"), col("y"))
    for (_ <- 1 to iters) {
      val w = Window.partitionBy("fid").orderBy("seq")
      val seg = cur.select(col("fid"), col("seq"), col("x"), col("y"),
        lead("x", 1).over(w).as("x1"), lead("y", 1).over(w).as("y1"))
      val first = cur.where(col("seq") === 0)
        .select(col("fid"), lit(-1L).as("k"), col("x"), col("y"))
      val last = seg.where(col("x1").isNull)
        .select(col("fid"), (col("seq") * 2).cast("long").as("k"), col("x"), col("y"))
      val cuts = seg.where(col("x1").isNotNull)
        .select(col("fid"), col("seq"), col("x"), col("y"), col("x1"), col("y1"),
          explode(array(
            struct((col("seq") * 2).cast("long").as("k"),
              (lit(0.75) * col("x") + lit(0.25) * col("x1")).as("px"),
              (lit(0.75) * col("y") + lit(0.25) * col("y1")).as("py")),
            struct((col("seq") * 2 + 1).cast("long").as("k"),
              (lit(0.25) * col("x") + lit(0.75) * col("x1")).as("px"),
              (lit(0.25) * col("y") + lit(0.75) * col("y1")).as("py")))).as("p"))
        .select(col("fid"), col("p.k").as("k"), col("p.px").as("x"), col("p.py").as("y"))
      cur = first.unionByName(cuts).unionByName(last)
        .withColumn("seq",
          row_number().over(Window.partitionBy("fid").orderBy("k")) - 1)
        .select("fid", "seq", "x", "y")
    }
    cur
  }
}
