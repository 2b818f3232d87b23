package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Channel-layout transposes: the codegen'd single-pass expression must
  * agree exactly with the Catalyst-builtin formulation, and the two
  * directions must round-trip.
  */
class ArrayOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture() = {
    import spark.implicits._
    (0 until 20).map { id =>
      (id.toLong, Array.tabulate(2 * 3 * 4)(i => (i * 7 + id * 13).toLong))
    }.toDF("id", "arr")
  }

  test("fast expression equals builtin transform for both directions") {
    graft.expr.GraftFunctions.register(spark)
    val df = fixture()
    val cmp = df.select(col("id"),
      ArrayOps.channelFirstToLast(col("arr"), 2, 3, 4).as("slow"),
      ArrayOps.channelFirstToLastFast(col("arr"), 2, 3, 4).as("fast"),
      ArrayOps.channelLastToFirst(col("arr"), 2, 3, 4).as("slow2"),
      ArrayOps.channelLastToFirstFast(col("arr"), 2, 3, 4).as("fast2"))
    val rows = cmp.collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"firstToLast id=${r.getLong(0)}")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"lastToFirst id=${r.getLong(0)}")
    }
  }

  test("round-trip: lastToFirst(firstToLast(x)) == x (fast path)") {
    graft.expr.GraftFunctions.register(spark)
    val df = fixture()
    val rt = df.select(col("arr"),
      ArrayOps.channelLastToFirstFast(
        ArrayOps.channelFirstToLastFast(col("arr"), 2, 3, 4), 2, 3, 4).as("rt"))
    rt.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
