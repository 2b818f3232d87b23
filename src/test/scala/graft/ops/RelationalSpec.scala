package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Q4-style semi-join count and Q14-style promo share (Relational.scala). */
class RelationalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("latePriorityOrders counts each order ONCE however many late lines it has") {
    import spark.implicits._
    val orders = Seq(
      (1L, "1-URGENT", ts("1996-01-01")),
      (2L, "1-URGENT", ts("1996-01-01")),
      (3L, "2-HIGH", ts("1996-01-01")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val lineitem = Seq(
      (1L, ts("1996-06-01")), (1L, ts("1996-07-01")), // two late lines, one order
      (2L, ts("1996-01-15")),                         // on time
      (3L, ts("1996-03-02")))                         // 61 days -> late
      .toDF("l_orderkey", "l_shipdate")
    val out = Relational.latePriorityOrders(lineitem, orders)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("1-URGENT" -> 1L, "2-HIGH" -> 1L))
    // boundary: exactly 60 days is NOT late (strict >)
    val li2 = Seq((2L, ts("1996-03-01"))).toDF("l_orderkey", "l_shipdate")
    assert(Relational.latePriorityOrders(li2, orders).collect().isEmpty)
    // the EXISTS stays a semi join in the physical plan (no duplication)
    val p = Relational.latePriorityOrders(lineitem, orders)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p.take(1200))
  }

  test("promoRevenueShare: exact quantized sums and truncating ppm") {
    import spark.implicits._
    val part = Seq((10L, "PROMO"), (11L, "ECONOMY")).toDF("p_partkey", "p_type")
    val lineitem = Seq(
      (10L, ts("1996-01-10"), 100.0, 0.10), // promo: 100*0.9 = 90.0000 -> 900000
      (11L, ts("1996-01-20"), 50.0, 0.00),  // other: 500000
      (10L, ts("1997-01-01"), 999.0, 0.0))  // outside the window
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val r = Relational.promoRevenueShare(lineitem, part,
      from = "1996-01-01", until = "1996-02-01").collect().head
    assert(r.getLong(0) === 900000L)
    assert(r.getLong(1) === 1400000L)
    // 900000 * 10^6 / 1400000 = 642857.142... -> truncates to 642857
    assert(r.getLong(2) === 642857L)
  }
}
