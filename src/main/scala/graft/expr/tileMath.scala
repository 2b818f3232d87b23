package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import graft.geo.{BBox, GeoTransform}

/** `align_bbox(refX0, refY1, tX0, tX1, tY0, tY1, pw, ph)` →
  * struct(x_min, x_max, y_min, y_max): snap the target bbox outward onto
  * the pixel grid anchored at the reference top-left corner.
  * Reference: buteo/bbox/operations.py:284-388 (snap :359-376) — only
  * refXMin/refYMax participate, so only those are taken as inputs.
  */
case class AlignBBoxExpr(children: Seq[Expression]) extends Expression with CodegenFallback {
  require(children.length == 8, "align_bbox takes 8 arguments")
  override def dataType: DataType = StructType(Seq(
    StructField("x_min", DoubleType, nullable = false),
    StructField("x_max", DoubleType, nullable = false),
    StructField("y_min", DoubleType, nullable = false),
    StructField("y_max", DoubleType, nullable = false)))
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val d = vs.map(_.asInstanceOf[Double])
    val ref = BBox(d(0), d(0), d(1), d(1)) // only xMin / yMax used by the snap
    val out = BBox.alignToPixelSize(ref, BBox(d(2), d(3), d(4), d(5)), d(6), d(7))
    InternalRow(out.xMin, out.xMax, out.yMin, out.yMax)
  }
  override def foldable: Boolean = children.forall(_.foldable)
  protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}

/** `pixel_offsets(originX, pxW, originY, pxH, x0, x1, y0, y1)` →
  * struct(x_start, y_start, x_size, y_size) ints.
  * Reference: buteo/bbox/operations.py:19-95 (np.rint half-even — matched
  * by math.rint in graft.geo.GeoTransform).
  */
case class PixelOffsetsExpr(children: Seq[Expression]) extends Expression with CodegenFallback {
  require(children.length == 8, "pixel_offsets takes 8 arguments")
  override def dataType: DataType = StructType(Seq(
    StructField("x_start", IntegerType, nullable = false),
    StructField("y_start", IntegerType, nullable = false),
    StructField("x_size", IntegerType, nullable = false),
    StructField("y_size", IntegerType, nullable = false)))
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val d = vs.map(_.asInstanceOf[Double])
    val gt = GeoTransform(d(0), d(1), 0.0, d(2), 0.0, d(3))
    val (xs, ys, xw, yh) = gt.pixelOffsets(BBox(d(4), d(5), d(6), d(7)))
    InternalRow(xs, ys, xw, yh)
  }
  override def foldable: Boolean = children.forall(_.foldable)
  protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression = copy(cs)
}
