package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General relational analytics over the TPC-H-style star schema — the
  * engine is a complete Spark analytics surface, not only the geo ops.
  * Money math is quantized per-row to 1e-4 units (exact integer sums,
  * order-independent, oracle-portable).
  */
object Relational {

  private def q4(c: org.apache.spark.sql.Column) =
    round(c * lit(10000.0)).cast("long")

  /** TPC-H Q1-style pricing summary (quantity-bounded variant). */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_quantity") < 30)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(q4(col("l_quantity"))).as("sum_qty_q"),
        sum(q4(col("l_extendedprice"))).as("sum_base_q"),
        sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_q"),
        sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))))
          .as("sum_charge_q"),
        count(lit(1)).as("n"))

  /** TPC-H Q3-style: top 10 orders by discounted revenue (ties broken by
    * order key) with the customer joined in.
    */
  def topOrdersByRevenue(lineitem: DataFrame, orders: DataFrame,
                         customer: DataFrame): DataFrame = {
    val rev = lineitem
      .groupBy("l_orderkey")
      .agg(sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_q"))
    rev
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("l_orderkey").as("orderkey"), col("revenue_q"),
        col("c_mktsegment"), col("o_orderpriority"))
      .orderBy(col("revenue_q").desc, col("orderkey"))
      .limit(10)
  }

  /** TPC-H Q6-style forecasting-revenue-change: one tight scan whose
    * date/discount/quantity predicates all push into the parquet reader,
    * folding to a single quantized sum + count. The canonical
    * pushdown-and-prune probe: no join, no shuffle beyond the final
    * 1-row combine.
    */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(q4(col("l_extendedprice") * col("l_discount"))).as("revenue_q"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q5-style: revenue per nation where customer and supplier share
    * the nation, rolled up through region. Dimension tables broadcast.
    */
  def revenuePerNation(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                       supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_q"),
        count(lit(1)).as("n_items"))
}
