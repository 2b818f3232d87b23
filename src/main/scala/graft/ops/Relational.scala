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

  /** TPC-H Q4-style order-priority check, adapted to this schema's
    * columns (no commit/receipt dates): an order counts when ANY of its
    * lineitems shipped more than `lateDays` after the order date. The
    * EXISTS is a LEFT SEMI join — the probe never duplicates orders, so
    * the count is per-order exactly like Q4's correlated EXISTS.
    *
    * Scale shape: the semi join keys on orderkey (the residual date
    * predicate rides the join), lineitem prunes to two columns at the
    * scan, and the priority rollup is a map-side-combined count over the
    * handful of priority values.
    */
  def latePriorityOrders(lineitem: DataFrame, orders: DataFrame,
                         lateDays: Int = 60): DataFrame =
    orders
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))

  /** TPC-H Q12-style shipping-priority split, adapted to this schema
    * (no shipmode — the classifier is the return flag): per flag, how
    * many LATE lineitems (shipped > `lateDays` after the order date)
    * belong to critical-priority orders vs not. The Q12 shape: one
    * equi-join with a residual date predicate, then a conditional
    * two-way count rolled up map-side over a 3-value key.
    */
  def lateByFlag(lineitem: DataFrame, orders: DataFrame,
                 lateDays: Int = 60): DataFrame = {
    val crit = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    lineitem.select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy("l_returnflag")
      .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q19-style discounted revenue under an OR-of-conjunctions
    * predicate (brand × size-range × quantity-range disjuncts): the
    * disjunction can only partially push down (each disjunct references
    * BOTH sides), so the plan shape is a partkey equi-join — part is
    * dimension-sized, so AQE broadcasts it — with the residual OR
    * evaluated post-join, folding to one quantized sum.
    */
  def brandRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val d1 = col("p_brand") === "Brand#11" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val d2 = col("p_brand") === "Brand#22" &&
      col("p_size").between(10, 30) && col("l_quantity").between(10, 20)
    val d3 = col("p_brand") === "Brand#33" &&
      col("p_size").between(25, 50) && col("l_quantity").between(20, 30)
    lineitem.select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(part.select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(d1 || d2 || d3)
      .agg(sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_q"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q14-style promotion-revenue share over a shipdate window:
    * promo and total revenue as exact quantized sums plus the share in
    * exact ppm (decimal(38,0) cross-multiply + truncating DIV — the
    * Long·10⁶ product would overflow at warehouse scale). Part is the
    * canonical broadcast dimension.
    */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
                        from: String, until: String): DataFrame = {
    val rev = q4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(from)) &&
        col("l_shipdate") < to_timestamp(lit(until)))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(0L)).as("promo_q"),
        sum(rev).as("total_q"))
      .select(col("promo_q"), col("total_q"),
        expr("CAST((CAST(promo_q AS DECIMAL(38,0)) * 1000000) DIV total_q AS BIGINT)")
          .as("promo_ppm"))
  }

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed exactly k (non-excluded) orders, INCLUDING the
    * zero-order customers — the classic outer-join-preserving-zeros
    * shape the rest of the relational surface was missing.
    *
    * Scale shape: orders collapse to (custkey, count) FIRST with
    * map-side combine, the left join keys on custkey (equi, both sides
    * shuffle-partitioned on it), and the distribution rollup is a tiny
    * second agg over |distinct counts| rows.
    */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame,
                             excludePriority: String = "1-URGENT"): DataFrame =
    customer.select(col("c_custkey"))
      .join(
        orders.filter(col("o_orderpriority") =!= excludePriority)
          .groupBy("o_custkey").agg(count(lit(1)).as("cnt")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))

  /** 2-D Pareto skyline (minimize price, maximize size): every part not
    * dominated by another (price_q ≤, size ≥, one strict; price
    * quantized to exact 1e-4 ticks so dominance is integer). Duplicated
    * (price, size) points are mutually non-dominating — both stay.
    *
    * Scale shape — NO global window and NO dominance theta-join: for a
    * 2-D skyline, a row survives iff its size equals its price-group max
    * AND strictly exceeds the running max over all cheaper groups. That
    * prefix-max runs BUCKETED (the packSequences prefix-sum pattern):
    * per-price-group agg (map-side combined, output ≤ |distinct prices|,
    * domain-bounded), per-bucket partials, and ONE ordered window over
    * the per-bucket frame whose row count is priceRange/bucket —
    * independent of N. The brute-force NOT-EXISTS oracle certifies the
    * whole reduction lossless.
    */
  def skyline(parts: DataFrame, bucket: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = parts.select(col("p_partkey"), col("p_retailprice"), col("p_size"),
      q4(col("p_retailprice")).as("price_q"), col("p_size").cast("long").as("size_l"))
    val grp = q.groupBy("price_q").agg(max("size_l").as("gmax"))
      .withColumn("bkt", expr(s"price_q DIV $bucket"))
    val wB = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val prevBucket = grp.groupBy("bkt").agg(max("gmax").as("bmax"))
      .withColumn("prev_bmax", max("bmax").over(wB))
      .select("bkt", "prev_bmax")
    val wIn = Window.partitionBy("bkt").orderBy("price_q")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = grp.join(prevBucket, "bkt")
      .withColumn("pmax",
        greatest(coalesce(col("prev_bmax"), lit(Long.MinValue)),
          coalesce(max("gmax").over(wIn), lit(Long.MinValue))))
      .select(col("price_q"), col("gmax"), col("pmax"))
    q.join(pref, "price_q")
      .filter(col("size_l") === col("gmax") && col("size_l") > col("pmax"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
  }

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

  /** TPC-H Q10-style returned-item report: customers ranked by revenue
    * lost to returns in a half-year order window. Scale shape: the
    * returnflag + date filters push into both scans, the big join is
    * lineitem×orders on the order key, customer/nation broadcast; the
    * top-20 is (revenue DESC, custkey) — a total order, so LIMIT is
    * deterministic. Money stays in q4 integer ten-thousandths.
    */
  def returnedItemReport(lineitem: DataFrame, orders: DataFrame,
                         customer: DataFrame, nation: DataFrame): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-07-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_q"),
        max(q4(col("c_acctbal"))).as("acctbal_q"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue_q").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q18-style large-volume customers: orders whose total quantity
    * exceeds the threshold, joined back to customer. The HAVING runs as
    * one map-side-combined agg BEFORE any join (the big table collapses
    * to order grain first); quantities are integral doubles → exact Long.
    * Top-50 on the (qty DESC, orderkey) total order.
    */
  def largeOrders(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, minQty: Long = 120): DataFrame =
    lineitem
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).cast("long").as("total_qty"),
        count(lit(1)).as("n_items"))
      .filter(col("total_qty") > minQty)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("l_orderkey").as("orderkey"), col("c_custkey"),
        col("c_name"), col("total_qty"), col("n_items"))
      .orderBy(col("total_qty").desc, col("orderkey"))
      .limit(50)

  /** TPC-H Q2-style minimum-cost supplier (adapted: no partsupp table, so
    * the (part, supplier) "offer" is the minimum quoted line price seen
    * in lineitem). The correlated MIN subquery decorrelates to a per-part
    * min agg joined back on equality — the canonical Q2 plan shape: both
    * sides of the re-join come off the SAME offer frame, region-filtered
    * suppliers broadcast.
    */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame,
                      regionName: String = "EUROPE", sizeMin: Int = 30): DataFrame = {
    val supRegion = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region).filter(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = lineitem
      .join(broadcast(supRegion), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part.filter(col("p_size") >= sizeMin)),
        col("l_partkey") === col("p_partkey"))
      // group on the two integer keys only; the string/balance
      // decorations are constant per (part, supplier), so max() recovers
      // them exactly while the exchange hashes narrow Long keys
      .groupBy(col("p_partkey"), col("s_suppkey"))
      .agg(min(q4(col("l_extendedprice"))).as("offer_q"),
        max(col("p_brand")).as("p_brand"), max(col("s_name")).as("s_name"),
        max(col("s_acctbal")).as("s_acctbal"), max(col("n_name")).as("n_name"))
    // per-part MIN as a window over the offer frame (not an agg + self
    // join): one pass, and the part-key exchange is shared with the agg
    val wPart = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
    offers
      .withColumn("best_q", min(col("offer_q")).over(wPart))
      .filter(col("offer_q") === col("best_q"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"), col("s_name"),
        q4(col("s_acctbal")).as("acctbal_q"), col("n_name"), col("offer_q"))
  }

  /** TPC-H Q7-style volume shipping: discounted revenue flowing between
    * distinct (supplier nation, customer nation) pairs per ship year.
    * The one big join is lineitem×orders on the order key; both nation
    * decorations ride broadcast dims.
    */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                     supplier: DataFrame, nation: DataFrame): DataFrame = {
    val sn = supplier.join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cn = customer.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_q"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8-style national market share: of all revenue a region's
    * customers spent on one part type per year, the fraction supplied by
    * the target nation. Numerator and denominator stay exact integer q4
    * sums; the share is truncating integer ppm — no FP division anywhere,
    * so the result is order-free and oracle-portable.
    */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  supplier: DataFrame, nation: DataFrame, region: DataFrame,
                  part: DataFrame, targetNation: String = "CHINA",
                  regionName: String = "ASIA", partType: String = "ECONOMY"): DataFrame = {
    val custRegion = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region).filter(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val sn = supplier.join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = lineitem
      .join(broadcast(part.filter(col("p_type") === partType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).as("o_year"),
        q4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("vol_q"),
        col("supp_nation"))
    vol.groupBy("o_year")
      .agg(sum(when(col("supp_nation") === targetNation, col("vol_q"))
        .otherwise(lit(0L))).as("nation_q"),
        sum(col("vol_q")).as("total_q"))
      .withColumn("share_ppm", expr(
        "CAST((CAST(nation_q AS DECIMAL(38,0)) * 1000000) DIV total_q AS BIGINT)"))
  }

  /** TPC-H Q9-style product-type profit (adapted: no ps_supplycost — unit
    * cost proxies as 60% of the part's retail price, documented contract).
    * Profit per line = q4(revenue) − q4(cost·qty), both quantized BEFORE
    * the subtraction so every line amount is an exact Long and the
    * (nation, year) rollup is order-free.
    */
  def productTypeProfit(lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
                        nation: DataFrame, part: DataFrame,
                        nameToken: String = "widget"): DataFrame = {
    val sn = supplier.join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    lineitem
      .join(broadcast(part.filter(col("p_name").contains(nameToken))
        .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
        q4(col("p_retailprice") * lit(0.6) * col("l_quantity"))).as("profit_q"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q11-style important stock (adapted: the held "value" of a part
    * is the q4 revenue its nation's suppliers shipped). The HAVING vs a
    * global scalar decorrelates to one 1-row frame cross-joined in — the
    * grand total never recomputes per group, and the threshold compare is
    * integer cross-multiplication. Unlike Q11's absolute fraction (which
    * degenerates as the part count grows), the threshold here is
    * MEAN-RELATIVE — keep parts with value > (num/den)·(total/n_parts),
    * i.e. value·den·n > total·num — so the query stays selective AND
    * non-empty at every scale factor.
    */
  def importantStock(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
                     nationName: String = "GERMANY",
                     fracNum: Long = 5, fracDen: Long = 4): DataFrame = {
    val supNation = supplier
      .join(broadcast(nation).filter(col("n_name") === nationName),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = lineitem
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(q4(col("l_extendedprice"))).as("value_q"))
    val total = perPart.agg(sum(col("value_q")).as("total_q"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_q").cast("decimal(38,0)") * lit(fracDen) * col("n_parts") >
        col("total_q").cast("decimal(38,0)") * lit(fracNum))
      .select(col("l_partkey").as("partkey"), col("value_q"))
  }

  /** TPC-H Q15-style top supplier: revenue per supplier over a quarter,
    * then exactly the suppliers tied at the maximum (the view + scalar
    * MAX decorrelated to a 1-row broadcast frame; equality on exact q4
    * integers, so the tie set is well-defined).
    */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
                  from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(from)) &&
        col("l_shipdate") < to_timestamp(lit(until)))
      .groupBy(col("l_suppkey"))
      .agg(sum(q4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_q"))
    val best = rev.agg(max(col("revenue_q")).as("best_q"))
    rev.crossJoin(broadcast(best))
      .filter(col("revenue_q") === col("best_q"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_q"))
  }

  /** TPC-H Q16-style supplier-relationship count: how many DISTINCT
    * suppliers ship each (brand, type, size) bucket, minus an excluded
    * brand. The count-distinct keys on the bucket — Spark's two-phase
    * distinct agg (partial distinct below the exchange) is the scale
    * shape; no join bigger than lineitem×broadcast(part).
    */
  def partSupplierCount(lineitem: DataFrame, part: DataFrame,
                        excludeBrand: String = "Brand#13"): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_brand") =!= excludeBrand)
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  /** TPC-H Q17-style small-quantity revenue: lines whose quantity is
    * below 20% of their part's average. The correlated AVG decorrelates
    * to a per-part (n, Σqty) agg joined back; the compare is integer
    * cross-multiplication 5·qty·n < Σqty (quantities are integral), so
    * no FP average is ever formed.
    */
  def smallQtyRevenue(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem.groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
        count(lit(1)).as("n_lines"))
    lineitem
      .join(perPart, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity").cast("long") * lit(5L) * col("n_lines") < col("sum_qty"))
      .agg(sum(q4(col("l_extendedprice"))).as("revenue_q"),
        count(lit(1)).as("n_lines_small"))
  }

  /** TPC-H Q20-style dominant suppliers (adapted: a supplier qualifies
    * when, for some part matching the name token, it shipped strictly
    * more than 3/10 of that part's global quantity). Two-level agg, the
    * threshold as integer cross-multiplication, then ONE distinct semi
    * join up to supplier names — the nested-IN chain decorrelated.
    */
  def dominantSuppliers(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                        nameToken: String = "widget",
                        shareNum: Long = 3, shareDen: Long = 10): DataFrame = {
    val li = lineitem
      .join(broadcast(part.filter(col("p_name").contains(nameToken)).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
    val perPartSupp = li.groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("qty")).as("supp_qty"))
    val perPart = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("qty")).as("total_qty"))
    supplier
      .join(perPartSupp
        .join(perPart, col("l_partkey") === col("t_partkey"))
        .filter(col("supp_qty") * lit(shareDen) > col("total_qty") * lit(shareNum))
        .select(col("l_suppkey")),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
  }

  /** TPC-H Q21-style suppliers who kept orders waiting: supplier S is
    * charged for order O when S shipped late on O, at least one OTHER
    * supplier participated, and NO other supplier shipped late — the
    * EXISTS / NOT-EXISTS pair as one literal semi + anti join, all three
    * legs keyed on the order key (co-partitioned; one exchange family).
    */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
                       lateDays: Int = 45): DataFrame = {
    val li = lineitem
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
          .as("late"))
    val l1 = li.filter(col("late"))
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("s1")).distinct()
    val anyOther = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val lateOther = li.filter(col("late"))
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    l1
      .join(anyOther, col("k1") === col("k2") && col("s1") =!= col("s2"), "left_semi")
      .join(lateOther, col("k1") === col("k3") && col("s1") =!= col("s3"), "left_anti")
      .join(broadcast(supplier), col("s1") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** RFM customer segmentation (recency / frequency / monetary with
    * quintile scores): per customer, days since last order against the
    * corpus max date (1-row broadcast), order count, and q4 money; the
    * quintiles are ntile(5) over TOTAL orders (ties broken by custkey,
    * so every score is deterministic). Quintile convention: 1 = most
    * recent / most frequent / highest spend. The global ntile sorts the
    * customer-grain frame — fine while customers ≪ facts; at 10⁹+
    * customers swap the scoring to the exact counting-quantile op
    * (the text_length_quantiles machinery).
    */
  def rfm(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxD = orders.agg(max(col("o_orderdate")).as("max_d"))
    val per = orders.crossJoin(broadcast(maxD))
      .groupBy(col("o_custkey"))
      .agg(datediff(max(col("max_d")), max(col("o_orderdate")))
        .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(q4(col("o_totalprice"))).as("monetary_q"))
    per
      .withColumn("r_quintile", ntile(5).over(
        Window.orderBy(col("recency_days"), col("o_custkey"))).cast("long"))
      .withColumn("f_quintile", ntile(5).over(
        Window.orderBy(col("frequency").desc, col("o_custkey"))).cast("long"))
      .withColumn("m_quintile", ntile(5).over(
        Window.orderBy(col("monetary_q").desc, col("o_custkey"))).cast("long"))
  }

  /** Cohort lifetime-value triangle: customers cohorted by first-order
    * month, revenue accumulated per (cohort, months-since-first) cell —
    * the warehouse LTV report. Months are pure integers
    * (year·12 + month), money is q4, so every cell is exact. One
    * window (first order per customer, shared exchange with nothing
    * else) + one map-side-combined agg.
    */
  def cohortLtv(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate")))
      .cast("long")
    val w = Window.partitionBy("o_custkey")
    orders
      .withColumn("ord_m", m)
      .withColumn("cohort_m", min(col("ord_m")).over(w))
      .groupBy(col("cohort_m"), (col("ord_m") - col("cohort_m")).as("month_idx"))
      .agg(count(lit(1)).as("n_orders"),
        sum(q4(col("o_totalprice"))).as("revenue_q"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  /** Revenue-concentration (Pareto) curve: customers ranked by q4
    * revenue descending, reporting at each decile boundary the exact
    * cumulative revenue share in truncating ppm — the 80/20 report.
    * Customer-grain global window (dim ≪ facts, the rfm note applies);
    * every number integer, ties broken by custkey.
    */
  def paretoCurve(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = orders.groupBy("o_custkey")
      .agg(sum(q4(col("o_totalprice"))).as("rev_q"))
    val n = per.agg(count(lit(1)).as("n_cust"), sum(col("rev_q")).as("total_q"))
    val w = Window.orderBy(col("rev_q").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val deciles = orders.sparkSession.range(1, 11).toDF("decile")
    per
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rev_q").desc, col("o_custkey"))))
      .withColumn("cum_q", sum(col("rev_q")).over(w))
      .crossJoin(broadcast(n))
      .join(broadcast(deciles),
        col("rank") === expr("n_cust * decile DIV 10")) // boundary ranks
      .withColumn("share_ppm",
        expr("CAST(CAST(cum_q AS DECIMAL(38,0)) * 1000000 DIV total_q AS BIGINT)"))
      .select(col("decile"), col("rank").cast("long").as("n_top"),
        col("cum_q"), col("total_q"), col("share_ppm"))
  }

  /** Market-basket co-occurrence with lift (the a-priori pair pass):
    * distinct (order, brand) items self-join on the order key — output
    * bounded by Σ basket², never all-pairs across orders — with the
    * hot-basket hazard handled by a deterministic per-basket cap
    * (lowest `capPerBasket` brands participate; -1 = uncapped).
    * `lift_ppm = N·n_ab·10⁶ div (n_a·n_b)` in exact truncating integer
    * arithmetic (Decimal(38) cross products), so support and lift are
    * order-free and oracle-exact.
    */
  def basketPairs(lineitem: DataFrame, part: DataFrame,
                  capPerBasket: Int = 32): DataFrame = {
    require(capPerBasket > 0 || capPerBasket == -1,
      s"capPerBasket must be positive or -1, got $capPerBasket")
    val items0 = lineitem
      .join(broadcast(part.select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val items1 =
      if (capPerBasket == -1) items0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("okey").orderBy("brand")
        items0.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= capPerBasket).drop("rnk")
      }
    // consumed 4× (total, per-brand counts, both self-join sides): cache
    // the deduped basket table once — the lineitem⋈part join + distinct
    // + cap window otherwise re-run per consumer. The okey-keyed window
    // exchange partitioning is pinned by the cache, so the self-join
    // below consumes it without re-shuffling either side.
    val items = items1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = items.agg(countDistinct(col("okey")).as("n_orders"))
    val counts = items.groupBy("brand").agg(count(lit(1)).as("n"))
    val pairs = items.select(col("okey"), col("brand").as("brand_a"))
      .join(items.select(col("okey"), col("brand").as("brand_b")), Seq("okey"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(counts.select(col("brand").as("brand_a"), col("n").as("n_a"))),
        Seq("brand_a"))
      .join(broadcast(counts.select(col("brand").as("brand_b"), col("n").as("n_b"))),
        Seq("brand_b"))
      .crossJoin(broadcast(total))
      .withColumn("lift_ppm", expr(
        "CAST(CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000 " +
          "DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
      .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_orders"), col("lift_ppm"))
  }

  /** TPC-H Q22-style global sales opportunity: customers in a band of
    * "country codes" (adapted: nationkey mod 7) holding more than the
    * average positive balance, with NO orders on file. Scalar-AVG
    * threshold via integer cross-multiplication against a 1-row
    * broadcast (Σbal, n) frame; the NOT EXISTS is a literal anti join.
    */
  def salesOpportunity(customer: DataFrame, orders: DataFrame,
                       codes: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val cust = customer
      .withColumn("cntrycode", pmod(col("c_nationkey"), lit(7)))
      .filter(col("cntrycode").isin(codes.map(Integer.valueOf): _*))
      .select(col("c_custkey"), col("cntrycode"), q4(col("c_acctbal")).as("bal_q"))
    val avgPos = cust.filter(col("bal_q") > 0)
      .agg(sum(col("bal_q")).as("sum_bal"), count(lit(1)).as("n_pos"))
    cust.crossJoin(broadcast(avgPos))
      .filter(col("bal_q") * col("n_pos") > col("sum_bal"))
      .join(orders.select(col("o_custkey")), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"), sum(col("bal_q")).as("totacctbal_q"))
  }
}
