package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Map-matching snap join: every point to its nearest segment of a
  * broadcast polyline network, with the nearest-ness decided EXACTLY.
  *
  * Geometry per (point p, segment a→b), all in integer local
  * coordinates (e.g. microdegrees):
  * {{{
  *   w = p − a;  d = b − a;  r = |d|²;  dot = w·d
  *   dot ≤ 0  → d² = |p−a|²                     (clamps to endpoint a)
  *   dot ≥ r  → d² = |p−b|²                     (clamps to endpoint b)
  *   else     → d² = (|w|²·r − dot²) / r        (interior projection)
  * }}}
  * so every candidate distance is the exact rational num/den with
  * den ∈ {1, r} — no sqrt, no division ever happens. The argmin is a
  * DOMINANCE ANTI JOIN on cross-multiplied Decimal(38) products (the
  * ml_stump pattern): candidate c loses iff some c' has
  * num'·den < num·den', ties to the lower seg_id. Long arithmetic holds
  * exactly while |w|²·r < 2⁶³ — local spans up to ~40k integer units;
  * reproject to a local frame first at larger extents (documented
  * contract, required at runtime).
  *
  * Scale shape: the network broadcasts (a road network is the small
  * side by construction); candidates = points × |network| rows stay
  * map-side; the dominance join is keyed on the point id — one
  * exchange, candidate groups bounded by the network size. Reference
  * anchor: buteo's nearest-geometry selection
  * (`vector/core_vector_spatial_ops.py`) — re-expressed as a broadcast
  * candidate join + exact-certificate argmin instead of a per-feature
  * GDAL loop.
  */
object SnapJoin {

  /** `points(idCol, xCol, yCol)` × `segments(seg_id, ax, ay, bx, by)` →
    * one row per point: (id, seg_id, snap_case, dist_num, dist_den).
    */
  def snapToSegments(points: DataFrame, segments: DataFrame,
                     idCol: String = "doc_id",
                     xCol: String = "x", yCol: String = "y"): DataFrame = {
    val dec = "decimal(38,0)"
    // every raw span is range-checked BEFORE any product is formed:
    // |s| < 2·10⁹ keeps each square ≤ 4·10¹⁸ and each two-term sum of
    // squares / dot ≤ 8·10¹⁸ < 2⁶³, so no intermediate can wrap before
    // the Decimal guard on w2·r below sees it (the guard otherwise
    // compared already-corrupted values outside the microdegree envelope)
    val spanCap = 2000000000L
    def span(c: Column): Column =
      when(abs(c) >= spanCap, raise_error(lit(
        "snapToSegments: coordinate span exceeds the exact-Long envelope; " +
          "reproject to a local frame")).cast("long"))
        .otherwise(c)
    val cand = points.crossJoin(broadcast(segments))
      .withColumn("dx", span(col("bx") - col("ax")))
      .withColumn("dy", span(col("by") - col("ay")))
      .withColumn("wx", span(col(xCol) - col("ax")))
      .withColumn("wy", span(col(yCol) - col("ay")))
      .withColumn("vx", span(col(xCol) - col("bx")))
      .withColumn("vy", span(col(yCol) - col("by")))
      .withColumn("r", col("dx") * col("dx") + col("dy") * col("dy"))
      .withColumn("dot", col("wx") * col("dx") + col("wy") * col("dy"))
      .withColumn("w2", col("wx") * col("wx") + col("wy") * col("wy"))
      .withColumn("snap_case",
        when(col("dot") <= 0, "a")
          .when(col("dot") >= col("r"), "b")
          .otherwise("mid"))
      .withColumn("dist_num",
        when(col("dot") <= 0, col("w2"))
          .when(col("dot") >= col("r"),
            col("vx") * col("vx") + col("vy") * col("vy"))
          // |w|²·r must stay below 2⁶³: fail loudly, never silently wrap
          // (checked in Decimal BEFORE the Long product is formed)
          .when(col("w2").cast(dec) * col("r") >= lit(Long.MaxValue).cast(dec),
            raise_error(lit("snapToSegments: coordinates exceed the exact-Long envelope; reproject to a local frame")).cast("long"))
          .otherwise(col("w2") * col("r") - col("dot") * col("dot")))
      .withColumn("dist_den",
        when(col("dot") <= 0 || col("dot") >= col("r"), lit(1L))
          .otherwise(col("r")))
      .select(col(idCol), col("seg_id"), col("snap_case"),
        col("dist_num").cast("long").as("dist_num"),
        col("dist_den").cast("long").as("dist_den"))
    val c = cand.alias("c")
    val o = cand.alias("o")
    val better =
      (col(s"o.$idCol") === col(s"c.$idCol")) && (
        (col("o.dist_num").cast(dec) * col("c.dist_den") <
          col("c.dist_num").cast(dec) * col("o.dist_den")) ||
        (col("o.dist_num").cast(dec) * col("c.dist_den") ===
          col("c.dist_num").cast(dec) * col("o.dist_den")) &&
          col("o.seg_id") < col("c.seg_id"))
    c.join(o, better, "left_anti")
      .select(col(idCol), col("seg_id"), col("snap_case"),
        col("dist_num"), col("dist_den"))
  }
}
