package graft.ops

import graft.index.GridCell
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quadtree cell-set compaction/expansion ([[CellSets]]). The oracle
  * queries (`geo_cell_compact` / `geo_cell_uncompact`) check engine-vs-
  * DuckDB parity on the synthetic page corpus; this spec pins the set
  * semantics on handcrafted fixtures: exact inverse round-trips,
  * minimality (no surviving complete quad), prefix-freeness, and the
  * mixed promote/keep case computed by hand with GridCell itself.
  */
class CellSetsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(cells: Seq[Long]) = {
    import spark.implicits._
    cells.toDF("cell")
  }

  private def collectSet(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("cell").collect().map(_.getLong(0)).toSet

  private def descendants(cell: Long, target: Int): Seq[Long] = {
    var cur = Seq(cell)
    while (GridCell.level(cur.head) < target) cur = cur.flatMap(GridCell.children)
    cur
  }

  test("uncompact enumerates exactly the 4^d descendants of each cell") {
    val a = GridCell.encode(8.5, 50.5, 5)
    val b = GridCell.encode(-120.0, -33.0, 7)
    val got = collectSet(CellSets.uncompact(df(Seq(a, b)), 8))
    val want = (descendants(a, 8) ++ descendants(b, 8)).toSet
    assert(got === want)
    assert(got.size === (1 << 6) + (1 << 2)) // 4^3 + 4^1
  }

  test("uncompact at the cell's own level is the identity") {
    val a = GridCell.encode(0.1, 0.1, 6)
    assert(collectSet(CellSets.uncompact(df(Seq(a)), 6)) === Set(a))
  }

  test("uncompact rejects cells below the target level") {
    val a = GridCell.encode(8.5, 50.5, 9)
    val ex = intercept[Exception] { CellSets.uncompact(df(Seq(a)), 7).collect() }
    assert(ex.getMessage != null)
  }

  test("compact collapses a complete subtree back to its root") {
    val root = GridCell.encode(8.5, 50.5, 4)
    val out = CellSets.compact(df(descendants(root, 8)))
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((root, 4)))
  }

  test("compact keeps incomplete quads and promotes complete ones (hand case)") {
    val p = GridCell.encode(-45.0, 12.0, 6)
    val kids = GridCell.children(p) // level 7
    // full subtrees under 3 of the 4 children, plus 2 stray grandchildren
    // of the fourth: the three contract to level 7 but NOT to level 6, the
    // strays stay at level 8.
    val strays = GridCell.children(kids(3)).take(2)
    val base = kids.take(3).flatMap(c => descendants(c, 8)) ++ strays
    val got = CellSets.compact(df(base.toSeq)).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = kids.take(3).map(c => (c, 7)).toSet ++ strays.map(c => (c, 8))
    assert(got === want)
  }

  test("compact(uncompact) round-trips an already-compact set exactly") {
    val cells = Seq(GridCell.encode(10.0, 10.0, 5), GridCell.encode(100.0, -40.0, 5),
      GridCell.encode(-170.0, 80.0, 5))
    val out = CellSets.compact(CellSets.uncompact(df(cells), 9))
    assert(collectSet(out) === cells.toSet)
  }

  test("compact output is area-preserving, minimal, and prefix-free (property)") {
    val rnd = new scala.util.Random(77)
    val base = (1 to 400).map { _ =>
      GridCell.encode(rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85, 6)
    }.distinct
    val out = CellSets.compact(df(base))
    val cells = out.collect().map(_.getLong(0)).toSeq
    // area-preserving: expanding back to level 6 reproduces the input set
    assert(collectSet(CellSets.uncompact(df(cells), 6)) === base.toSet)
    // minimal: no complete sibling quadruple survives
    val byParent = cells.filter(GridCell.level(_) > 0).groupBy(GridCell.parent)
    assert(byParent.values.forall(_.size < 4))
    // prefix-free: no cell is an ancestor of another
    val set = cells.toSet
    assert(!cells.exists { c =>
      var a = c
      var hit = false
      while (GridCell.level(a) > 0 && !hit) { a = GridCell.parent(a); hit = set(a) }
      hit
    })
  }

  private def s2Descendants(cell: Long, target: Int): Seq[Long] = {
    import graft.index.S2Cell
    var cur = Seq(cell)
    while (S2Cell.level(cur.head) < target) cur = cur.flatMap(S2Cell.children)
    cur
  }

  test("S2 compact/uncompact round-trip across faces, including sign-bit faces") {
    import graft.index.S2Cell
    // face 0/2 (positive ids) and face 4/5 (bit 63 set — negative longs)
    val cells = Seq(S2Cell.encode(10.0, 5.0, 6), S2Cell.encode(0.0, 80.0, 6),
      S2Cell.encode(-95.0, -5.0, 6), S2Cell.encode(0.0, -80.0, 6))
    assert(cells.exists(_ < 0) && cells.exists(_ > 0))
    val out = CellSets.compactS2(CellSets.uncompactS2(df(cells), 9))
    assert(collectSet(out) === cells.toSet)
    val expanded = collectSet(CellSets.uncompactS2(df(cells), 8))
    assert(expanded === cells.flatMap(s2Descendants(_, 8)).toSet)
  }

  test("S2 compact collapses a full subtree to a level-0 face root") {
    import graft.index.S2Cell
    val face5 = S2Cell.pack(5, 0, 0, 0)
    val out = CellSets.compactS2(df(s2Descendants(face5, 4)))
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((face5, 0)))
  }

  test("uncompact spanning more than one chunk pass (d > 8) stays exact") {
    val root = GridCell.encode(8.5, 50.5, 0) // level 0 -> level 9 is two passes
    val out = CellSets.uncompact(df(Seq(root)), 9)
    assert(out.count() === (1L << 18)) // 4^9
    val probe = out.limit(3).collect().map(_.getLong(0)) :+
      out.orderBy(col("cell").desc).limit(1).collect().head.getLong(0)
    probe.foreach { c =>
      assert(GridCell.level(c) === 9)
      var a = c
      (1 to 9).foreach(_ => a = GridCell.parent(a))
      assert(a === root)
    }
  }

  test("compact rejects null cell ids with a clear error") {
    import spark.implicits._
    val withNull = Seq(Some(GridCell.encode(0.0, 0.0, 5)), None).toDF("cell")
    val ex = intercept[IllegalArgumentException] { CellSets.compact(withNull) }
    assert(ex.getMessage.contains("null cell ids"))
  }

  test("compact rejects mixed input levels and passes empty input through") {
    val mixed = df(Seq(GridCell.encode(0.0, 0.0, 5), GridCell.encode(0.0, 0.0, 6)))
    val ex = intercept[IllegalArgumentException] { CellSets.compact(mixed) }
    assert(ex.getMessage.contains("mixed input levels"))
    assert(CellSets.compact(df(Seq.empty)).count() === 0L)
  }
}
