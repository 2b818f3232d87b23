package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each probe row picks up the payload of the
  * latest build row with the same key and `ts` ≤ the probe's `ts` — the
  * time-series join Spark has no operator for (quotes→trades, config
  * snapshot→event, price→order). The composition trick is published
  * folklore (Databricks' tempo, Flink temporal joins): it needs NO join
  * at all.
  *
  * UNION + one window: tag build rows 0 and probe rows 1, sort each key
  * group by (ts, tag) — equal timestamps put the build row FIRST, so the
  * match is at-or-before inclusive — and carry the last non-null build
  * payload forward with an unbounded-preceding `last(_, ignoreNulls)`
  * frame. The payload rides in ONE struct, so multi-column payloads are
  * atomic (per-column carries could tear rows if a payload field were
  * legitimately null).
  *
  * Scale shape: exactly ONE shuffle (the window partitioning on the key)
  * over |probe| + |build| rows, no join, no broadcast, nothing keyed
  * wider than the key itself. A hot key concentrates its rows in one
  * window partition — same contract as any per-key analytic; pre-split
  * hot keys by time range upstream if a single key exceeds a partition.
  *
  * Contract: build must be UNIQUE per (keys, ts) — collapse duplicates
  * first (argmax by a tiebreaker id, the url_dedup_latest pattern);
  * otherwise "the" latest build row at a timestamp is undefined. Null
  * timestamps are rejected loudly rather than silently sorted first.
  */
object AsofJoin {

  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin: at least one key column")
    require(payload.nonEmpty, "asofJoin: at least one payload column")
    val pcols = probe.columns.toSeq
    require(!payload.exists(pcols.contains),
      s"asofJoin: payload ${payload.mkString(",")} collides with probe columns")

    val guard = (df: DataFrame) => df.filter(
      when(col(tsCol).isNull,
        raise_error(lit(s"asofJoin: null $tsCol"))).otherwise(true))
    val pay = struct(payload.map(col): _*)
    val p = guard(probe).select(
      pcols.map(col) ++ Seq(lit(1).as("__side"),
        lit(null).cast(build.select(pay).schema.head.dataType).as("__pay")): _*)
    val b = guard(build).select(
      pcols.map(c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)) ++
      Seq(lit(0).as("__side"), pay.as("__pay")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = p.unionByName(b)
      .withColumn("__carry", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carried.select(pcols.map(col) ++
      payload.map(f => col("__carry").getField(f).as(prefix + f)): _*)
  }
}
