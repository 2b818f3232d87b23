package graft.joins

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cell-pruned kNN agrees with exact broadcast kNN on guaranteed rows") {
    val pts = spark.range(3000).select(
      col("id"),
      ((col("id") * 1103515245L + 12345L) % 360000000L - 180000000L).as("x"),
      ((col("id") * 2654435761L + 99991L) % 170000000L - 85000000L).as("y"))
    val exact = KnnJoin.knnBroadcastProbes(pts, pts.filter(col("id") < 200), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val pruned = KnnJoin.knnCellPruned(pts, level = 4, rings = 2, k = 3)
      .filter(col("query_id") < 200)
      .collect()
    val guaranteed = pruned.filter(_.getBoolean(4))
    assert(guaranteed.length > 50, s"too few guaranteed rows: ${guaranteed.length}")
    guaranteed.foreach { r =>
      val key = (r.getLong(0), r.getInt(3))
      assert(exact.get(key).contains(r.getLong(1)),
        s"mismatch at $key: pruned=${r.getLong(1)} exact=${exact.get(key)}")
    }
  }
}
