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
  }
}
