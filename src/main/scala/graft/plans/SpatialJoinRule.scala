package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.geo.{Polygon, Wkt}
import graft.index.GridCell

/** `st_contains_point(wkt, x, y)` — winding-number point-in-polygon over a
  * WKT geometry column. Thread-local single-entry parse cache: polygon
  * rows arrive grouped in practice, so the common case parses once per
  * run of identical geometries.
  */
case class StContainsPoint(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType

  @transient private lazy val cache = new ThreadLocal[(UTF8String, Polygon)]

  override def nullSafeEval(wkt: Any, x: Any, y: Any): Any = {
    val w = wkt.asInstanceOf[UTF8String]
    val cached = cache.get()
    val poly =
      if (cached != null && cached._1 == w) cached._2
      else {
        val p = Wkt.parsePolygon(w.toString)
        cache.set((w.clone(), p))
        p
      }
    poly.contains(x.asInstanceOf[Double], y.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t)
}

/** `cover_cells(wkt, level)` → array<long> of quadtree cells covering the
  * geometry's envelope (superset of intersecting cells — the join rewrite
  * refines with the exact predicate).
  */
case class CoverCellsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(wkt: Any, level: Any): Any = {
    val p = Wkt.parsePolygon(wkt.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GridCell.cover(p.bbox, level.asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Optimizer rule: rewrite a spatial theta-join
  * `points JOIN polys ON st_contains_point(polys.wkt, points.x, points.y)`
  * into a cover-cell EQUI-join + exact refine:
  *
  * {{{
  *   Join(P, G, st_contains_point(g.wkt, p.x, p.y))
  *     ⇒ Project(origOutput,
  *         Join(P + [__cell = grid_cell(x, y, L)],
  *              Generate(explode(cover_cells(wkt, L)), G) as __gcell,
  *              __cell = __gcell && st_contains_point(...)))
  * }}}
  *
  * This is the standard Spark spatial-join reduction of the reference's
  * R-tree theta-join (reference: buteo/vector/intersect.py:51-65) — the
  * equi-key unlocks hash/sort-merge strategies + AQE instead of a
  * BroadcastNestedLoopJoin. Cover level from
  * `spark.graft.spatialJoin.level` (default 7).
  *
  * Handled forms: INNER (either operand order), LEFT SEMI / LEFT ANTI
  * with the point side preserved, and composite AND conditions (the PIP
  * predicate anywhere in the conjunction; other predicates ride along).
  * EXISTS/NOT EXISTS subqueries are rewritten to joins by Spark only
  * AFTER user optimizer rules run, so use explicit semi/anti join syntax
  * (or the typed SpatialJoins API) for those shapes.
  */
case class SpatialJoinRule(level: Int = 7) extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.plans.{JoinType, LeftAnti, LeftSemi}

  /** Already-rewritten joins carry the marker cell columns. */
  private def alreadyRewritten(l: LogicalPlan, r: LogicalPlan): Boolean =
    (l.output ++ r.output).exists(a => a.name == "__p_cell" || a.name == "__g_cell")

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, jt, Some(cond), hint)
        if (jt == Inner || jt == LeftSemi || jt == LeftAnti) &&
          !alreadyRewritten(l, r) =>
      // exactly one PIP predicate anywhere in the AND-tree qualifies; any
      // remaining predicates ride along into the rewritten condition
      cond.collect { case s: StContainsPoint => s } match {
        case Seq(pip @ StContainsPoint(wkt, x, y)) =>
          if (wkt.references.subsetOf(r.outputSet) &&
              x.references.subsetOf(l.outputSet) && y.references.subsetOf(l.outputSet))
            rewrite(j, l, r, jt, wkt, x, y, cond, hint)
          else if (jt == Inner &&
              wkt.references.subsetOf(l.outputSet) &&
              x.references.subsetOf(r.outputSet) && y.references.subsetOf(r.outputSet))
            // polygons on the left: mirror the rewrite (inner only — for
            // semi/anti the preserved side must stay unduplicated, and the
            // cover-cell Generate duplicates the polygon side)
            rewrite(j, r, l, jt, wkt, x, y, cond, hint, flipped = true)
          else j
        case _ => j
      }
  }

  private def rewrite(j: Join, points: LogicalPlan, polys: LogicalPlan,
                      joinType: JoinType,
                      wkt: Expression, x: Expression, y: Expression,
                      pred: Expression,
                      hint: JoinHint, flipped: Boolean = false): LogicalPlan = {
    val cellAlias = Alias(
      graft.expr.GridCellExpr(x, y, Literal(level)), "__p_cell")()
    val newPoints = Project(points.output :+ cellAlias, points)
    val gCell = AttributeReference("__g_cell", LongType, nullable = false)()
    val newPolys = Generate(
      Explode(CoverCellsExpr(wkt, Literal(level))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(gCell), child = polys)
    // contains(point, poly) implies cell-cover equality, so conjoining the
    // equi-key preserves inner AND existential (semi/anti) semantics
    val cond = And(EqualTo(cellAlias.toAttribute, gCell), pred)
    val joined =
      if (flipped) Join(newPolys, newPoints, joinType, Some(cond), hint)
      else Join(newPoints, newPolys, joinType, Some(cond), hint)
    Project(j.output, joined)
  }
}

/** `st_dwithin(x1, y1, x2, y2, r)` — Euclidean proximity predicate in
  * coordinate units (planar degrees here, matching the cell grid the
  * join rewrite buckets on). The expression alone is a theta-join
  * killer; [[DwithinJoinRule]] turns it into an equi-join.
  */
case class StDwithin(x1: Expression, y1: Expression,
                     x2: Expression, y2: Expression,
                     r: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(x1, y1, x2, y2, r)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = BooleanType
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val Seq(a, b, c, d, rr) = vs.map(StDwithin.asDouble)
      val dx = a - c; val dy = b - d
      dx * dx + dy * dy <= rr * rr
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4))
}

object StDwithin {
  /** SQL numeric literals arrive as Decimal; columns as Double/Float/Int. */
  private[plans] def asDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"st_dwithin: non-numeric argument $other")
  }
}

/** Optimizer rule: rewrite a distance theta-join
  * `A JOIN B ON st_dwithin(a.x, a.y, b.x, b.y, r)` (r a foldable
  * literal) into the covering cell-bucket EQUI-join — the
  * [[graft.joins.RangeJoin.selfJoinCells]] reduction lifted to the
  * Catalyst level so plain SQL gets it:
  *
  * {{{
  *   A + [__d_cell = grid_cell(x, y, L)]
  *     ⋈ Generate(explode(grid_kring(grid_cell(bx, by, L), 1)), B)
  *   ON __d_cell = __d_gcell && st_dwithin(...)
  * }}}
  *
  * L is the deepest level whose cell span still covers r in both axes
  * (2^L ≤ 180/r), capped by `spark.graft.dwithinJoin.maxLevel`; any
  * point within r of b lies in the 3×3 ring of b's cell at that level
  * (coordinate clamping keeps edge cells on the same side — no dateline
  * wrap, the selfJoinCells contract). Handled: INNER (either operand
  * order) and LEFT SEMI / LEFT ANTI with the probe side preserved;
  * extra AND predicates ride along.
  */
case class DwithinJoinRule(maxLevel: Int = 12) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.{JoinType, LeftAnti, LeftSemi}

  private def alreadyRewritten(l: LogicalPlan, r: LogicalPlan): Boolean =
    (l.output ++ r.output).exists(a => a.name == "__d_cell" || a.name == "__d_gcell")

  private def chooseLevel(radius: Double): Int = {
    var lvl = 0
    while (lvl < maxLevel && (180.0 / (1L << (lvl + 1))) >= radius) lvl += 1
    lvl
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, jt, Some(cond), hint)
        if (jt == Inner || jt == LeftSemi || jt == LeftAnti) &&
          !alreadyRewritten(l, r) =>
      cond.collect { case d: StDwithin => d } match {
        case Seq(d) if d.r.foldable && d.r.eval() != null &&
            StDwithin.asDouble(d.r.eval()) > 0.0 =>
          val radius = StDwithin.asDouble(d.r.eval())
          val lvl = chooseLevel(radius)
          def onSide(p: LogicalPlan, xs: Expression, ys: Expression) =
            xs.references.subsetOf(p.outputSet) && ys.references.subsetOf(p.outputSet)
          if (onSide(l, d.x1, d.y1) && onSide(r, d.x2, d.y2))
            rewrite(j, l, r, jt, d.x1, d.y1, d.x2, d.y2, lvl, cond, hint)
          else if (onSide(l, d.x2, d.y2) && onSide(r, d.x1, d.y1))
            rewrite(j, l, r, jt, d.x2, d.y2, d.x1, d.y1, lvl, cond, hint)
          else j
        case _ => j
      }
  }

  private def rewrite(j: Join, probe: LogicalPlan, build: LogicalPlan,
                      joinType: org.apache.spark.sql.catalyst.plans.JoinType,
                      px: Expression, py: Expression,
                      bx: Expression, by: Expression, level: Int,
                      pred: Expression, hint: JoinHint): LogicalPlan = {
    val cellAlias = Alias(
      graft.expr.GridCellExpr(px, py, Literal(level)), "__d_cell")()
    val newProbe = Project(probe.output :+ cellAlias, probe)
    val gCell = AttributeReference("__d_gcell", LongType, nullable = false)()
    val newBuild = Generate(
      Explode(graft.expr.GridKRingExpr(
        graft.expr.GridCellExpr(bx, by, Literal(level)), Literal(1))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(gCell), child = build)
    val cond = And(EqualTo(cellAlias.toAttribute, gCell), pred)
    Project(j.output, Join(newProbe, newBuild, joinType, Some(cond), hint))
  }
}

/** Session extensions: inject the spatial-join rewrite + SQL functions.
  * Enable with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule { session =>
      val lvl = session.conf.get("spark.graft.spatialJoin.level", "7").toInt
      SpatialJoinRule(lvl)
    }
    e.injectOptimizerRule { session =>
      val lvl = session.conf.get("spark.graft.dwithinJoin.maxLevel", "12").toInt
      DwithinJoinRule(lvl)
    }
  }
}
