package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the connected-components scaling leg (TimeQ's sibling):
  * `gen <nEdges> <dir>` materializes the Bench cc graph shape, `run
  * <cores> <dir>` times one star-contraction pass with the exact child
  * settings (64 shuffle partitions, warmup slice) so a single leg can be
  * measured in isolation while iterating on the round plan.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    args.headOption.getOrElse("") match {
      case "gen" =>
        val n = args(1).toLong
        val s = SparkSession.builder().master("local[16]")
          .config("spark.sql.shuffle.partitions", "64")
          .config("spark.local.dir", "/dev/shm/spark-graft-ccprobe")
          .config("spark.ui.enabled", "false").getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        val tree = n * 6 / 10
        val hub = n * 8 / 10
        s.range(1, n + 1)
          .select(col("id").as("src"),
            when(col("id") < tree, pmod(xxhash64(col("id")), col("id")))
              .when(col("id") < hub, lit(tree))
              .otherwise(col("id").bitwiseXOR(lit(1L))).as("dst"))
          .write.mode("overwrite").parquet(args(2))
        s.stop()
      case "run" =>
        val cores = args(1).toInt
        val parts = args.lift(3).getOrElse("64")
        val aqe = args.lift(4).getOrElse("true")
        val s = SparkSession.builder().master(s"local[$cores]")
          .config("spark.sql.shuffle.partitions", parts)
          .config("spark.local.dir", "/dev/shm/spark-graft-ccprobe")
          .config("spark.sql.adaptive.enabled", aqe)
          .config("spark.sql.adaptive.skewJoin.enabled", aqe)
          .config("spark.ui.enabled", "false").getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        val in = s.read.parquet(args(2))
        graft.ops.Dedup.connectedComponents(in.limit(100000)).count()
        val t0 = System.nanoTime()
        val (comp, rounds) = graft.ops.Dedup.connectedComponentsWithRounds(in)
        val nodes = comp.count()
        println(f"CCPROBE cores=$cores nodes=$nodes rounds=$rounds " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        s.stop()
      case other =>
        sys.error(s"CcProbe: unknown mode '$other'; usage: " +
          "gen <nEdges> <dir> | run <cores> <dir> [shuffleParts] [aqe]")
    }
  }
}
