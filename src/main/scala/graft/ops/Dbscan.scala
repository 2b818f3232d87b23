package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.joins.RangeJoin

/** Distributed DBSCAN (Ester et al. KDD'96) over integer micro-degree
  * points — the density clustering a geo-analytics layer runs over page
  * or event locations. Composed entirely from proven scale primitives:
  *
  *  - ε-neighborhood pairs via [[RangeJoin.selfJoinCells]] (the 3×3
  *    covering cell-bucket equi-join — both sides big, AQE handles hot
  *    cells; certified lossless by the geo_pair_join brute-force oracle);
  *  - core test |N_ε(p)| ≥ minPts (self included, textbook semantics)
  *    as one map-side-combined degree aggregation;
  *  - clusters = connected components of the core-core ε-graph via
  *    [[Dedup.connectedComponents]] (alternating star contraction,
  *    O(log² n) rounds);
  *  - border points attach to the LOWEST cluster label among their core
  *    ε-neighbors — a deterministic contract (textbook DBSCAN leaves the
  *    choice scan-order-dependent; lowest-label is pinned here and in
  *    the SQL oracle so results are bit-identical at any parallelism).
  *
  * Noise (non-core, no core neighbor) is excluded from the output.
  * Distances are exact integer squared L2 in udeg² — no FP anywhere.
  */
object Dbscan {

  /** points: (id, x, y) with x/y integer micro-degrees.
    * Returns (id, cluster, role): cluster = smallest core id of the
    * component, role ∈ {core, border}.
    */
  def dbscan(points: DataFrame, epsUdeg: Long, minPts: Int,
             level: Int): DataFrame = {
    require(minPts >= 1, s"minPts >= 1, got $minPts")
    val pairs = RangeJoin.selfJoinCells(points, epsUdeg, level)
      .select("id_a", "id_b")
      // scanned three times (degrees, core-core edges, border candidates)
      .localCheckpoint()
    val deg = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_nbrs"))
    // |N_eps| includes the point itself
    val core = deg.filter(col("n_nbrs") + 1 >= minPts).select("id")
    val coreEdges = pairs
      .join(core.withColumnRenamed("id", "id_a"), "id_a")
      .join(core.withColumnRenamed("id", "id_b"), "id_b")
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = Dedup.connectedComponents(coreEdges)
    // isolated cores (no core neighbor) are their own singleton cluster
    val coreLab = core.join(comp, core("id") === comp("node"), "left")
      .select(core("id"),
        coalesce(col("component"), core("id")).as("cluster"))
    val cand = pairs.select(col("id_a").as("p"), col("id_b").as("c"))
      .unionAll(pairs.select(col("id_b").as("p"), col("id_a").as("c")))
    val borders = cand
      .join(coreLab.select(col("id").as("c"), col("cluster")), "c")
      .join(coreLab.select(col("id").as("p")), Seq("p"), "left_anti")
      .groupBy("p").agg(min("cluster").as("cluster"))
      .select(col("p").as("id"), col("cluster"), lit("border").as("role"))
    coreLab.select(col("id"), col("cluster"), lit("core").as("role"))
      .unionAll(borders)
  }
}
