package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registers the engine's Catalyst expressions as SQL functions and exposes
  * typed Column wrappers. Registration is idempotent per session.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("h3_cell", es => H3CellExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("grid_cell", es => GridCellExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("s2_cell", es => S2CellExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("hilbert_d", es => HilbertExpr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("grid_x", es => GridXExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("grid_y", es => GridYExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("h3_kring", es => KRingExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("grid_kring", es => GridKRingExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("s2_kring", es => S2KRingExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("s2_parent", es => S2ParentExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("utm_epsg", es => UtmEpsgExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("geocode_url", es => GeocodeUrl(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("reproject_point", es => ReprojectPointExpr(es), "scala_udf")
    reg.createOrReplaceTempFunction("align_bbox", es => AlignBBoxExpr(es), "scala_udf")
    reg.createOrReplaceTempFunction("pixel_offsets", es => PixelOffsetsExpr(es), "scala_udf")
    reg.createOrReplaceTempFunction("st_contains_point",
      es => graft.plans.StContainsPoint(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("cover_cells",
      es => graft.plans.CoverCellsExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("st_dwithin",
      es => graft.plans.StDwithin(es(0), es(1), es(2), es(3), es(4)), "scala_udf")
    reg.createOrReplaceTempFunction("bloom_contains_all",
      es => BloomContainsAllExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_dot", es =>
      SortedDotExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_long", es =>
      DotLongExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dist2_long", es =>
      Dist2LongExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_float", es =>
      CosineFloatExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_band_keys", es =>
      LshBandKeysExpr(es(0),
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("rp_project", es =>
      RpProjectExpr(es(0),
        es(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_inter_count", es =>
      SortedInterCountExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("kmeans_assign", es => {
      val sd = es(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val sums = Array.tabulate(sd.numElements())(i => sd.getArray(i).toLongArray())
      val counts = es(2).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      KMeansAssignExpr(es(0), sums, counts)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("erase_spans", es =>
      EraseSpansExpr(es(0), es(1),
        es(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
    reg.createOrReplaceTempFunction("channel_transpose", es =>
      ChannelTransposeExpr(es(0),
        es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue(),
        es(3).eval().asInstanceOf[Number].intValue(),
        es(4).eval().asInstanceOf[Boolean]), "scala_udf")
  }

  /** align_bbox(refXMin, refYMax, tXMin, tXMax, tYMin, tYMax, pw, ph) →
    * struct(x_min, x_max, y_min, y_max)
    */
  def alignBBox(args: Column*): Column =
    call_function("align_bbox", args.map(_.cast("double")): _*)

  /** pixel_offsets(originX, pxW, originY, pxH, x0, x1, y0, y1) →
    * struct(x_start, y_start, x_size, y_size)
    */
  def pixelOffsets(args: Column*): Column =
    call_function("pixel_offsets", args.map(_.cast("double")): _*)

  def h3Cell(lon: Column, lat: Column, res: Column): Column =
    call_function("h3_cell", lon.cast("double"), lat.cast("double"), res.cast("int"))
  def gridCell(lon: Column, lat: Column, level: Column): Column =
    call_function("grid_cell", lon.cast("double"), lat.cast("double"), level.cast("int"))
  def s2Cell(lon: Column, lat: Column, level: Column): Column =
    call_function("s2_cell", lon.cast("double"), lat.cast("double"), level.cast("int"))
  def s2Parent(cell: Column, steps: Column): Column =
    call_function("s2_parent", cell, steps.cast("int"))
  def hilbertD(x: Column, y: Column, level: Column): Column =
    call_function("hilbert_d", x.cast("long"), y.cast("long"), level.cast("int"))
  def gridX(cell: Column): Column = call_function("grid_x", cell)
  def gridY(cell: Column): Column = call_function("grid_y", cell)
  def h3KRing(cell: Column, k: Column): Column = call_function("h3_kring", cell, k.cast("int"))
  def gridKRing(cell: Column, k: Column): Column = call_function("grid_kring", cell, k.cast("int"))
  def s2KRing(cell: Column, k: Column): Column = call_function("s2_kring", cell, k.cast("int"))
  def utmEpsg(lat: Column, lon: Column): Column =
    call_function("utm_epsg", lat.cast("double"), lon.cast("double"))
  def geocodeUrl(url: Column): Column = call_function("geocode_url", url)
  def reprojectPoint(x: Column, y: Column, src: Column, dst: Column): Column =
    call_function("reproject_point", x, y, src, dst)
}
