package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.GraftFunctions

class HilbertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("level-1 curve is the canonical U: (0,0) (0,1) (1,1) (1,0)") {
    assert(Hilbert.xy2d(1, 0, 0) == 0L)
    assert(Hilbert.xy2d(1, 0, 1) == 1L)
    assert(Hilbert.xy2d(1, 1, 1) == 2L)
    assert(Hilbert.xy2d(1, 1, 0) == 3L)
  }

  test("the curve is a bijection and consecutive positions are rook-adjacent") {
    val level = 5
    val n = 1L << level
    val seen = new Array[Boolean]((n * n).toInt)
    for (x <- 0L until n; y <- 0L until n) {
      val d = Hilbert.xy2d(level, x, y)
      assert(d >= 0 && d < n * n)
      assert(!seen(d.toInt), s"collision at d=$d")
      seen(d.toInt) = true
      assert(Hilbert.d2xy(level, d) == (x, y), s"roundtrip broke at ($x,$y)")
    }
    // THE Hilbert property: each curve step moves exactly one cell
    var prev = Hilbert.d2xy(level, 0)
    (1L until n * n).foreach { d =>
      val cur = Hilbert.d2xy(level, d)
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan == 1, s"step $d jumped $manhattan cells")
      prev = cur
    }
  }

  test("high-level roundtrip on random cells") {
    val rnd = new scala.util.Random(3)
    for (level <- Seq(10, 20, 31); _ <- 1 to 300) {
      val n = 1L << level
      val x = (rnd.nextLong() & Long.MaxValue) % n
      val y = (rnd.nextLong() & Long.MaxValue) % n
      assert(Hilbert.d2xy(level, Hilbert.xy2d(level, x, y)) == (x, y))
    }
  }

  test("catalyst expression matches the JVM scalar and stays codegen'd") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(9)
    val rows = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(128).toLong, rnd.nextInt(128).toLong))
    val df = rows.toDF("id", "x", "y")
      .select(col("id"), GraftFunctions.hilbertD(col("x"), col("y"), lit(7)).as("hd"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, x, y) =>
      assert(got(id) == Hilbert.xy2d(7, x, y))
    }
    // a LocalRelation folds eagerly; use a range scan to pin the codegen span
    val ranged = spark.range(1000).select(
      GraftFunctions.hilbertD(col("id") % 128, (col("id") * 7) % 128, lit(7)).as("hd"))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen span in:\n$plan")
    ranged.collect().zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == Hilbert.xy2d(7, i % 128, (i * 7) % 128))
    }
  }
}
