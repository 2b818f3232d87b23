package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-3 gate hardening (VERDICT r2 §What's wrong #1 — the driver's
  * CORRECTNESS_r02.json came back `{}` because the serial dump blew the
  * round budget):
  *  - `oracle_sql.json` is written FIRST, so a mid-run kill still leaves
  *    the driver a full oracle map and every finished query's parquet —
  *    partial evidence instead of `{}`.
  *  - Queries run CONCURRENTLY on a fixed thread pool (Spark's scheduler
  *    multiplexes jobs fine; each query writes its own directory). This
  *    cuts the wall time ~6× — per-query planning/IO overhead dominated
  *    the serial run, not cluster compute.
  *  - Per-query wall seconds go to stderr incrementally for forensics.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val pool = sys.env.getOrElse("SPARK_GRAFT_VERIFY_POOL", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val todo = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val exec = Executors.newFixedThreadPool(pool)
    val t0 = System.nanoTime()
    todo.foreach { case (name, fn) =>
      exec.submit(new Runnable {
        def run(): Unit = {
          val s0 = System.nanoTime()
          try {
            // SPARK_GRAFT_EXPLAIN=1: dump the formatted physical plan per
            // query (plan-audit forensics; never on in the driver gate)
            if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
              val df = fn(spark, sfDir)
              Files.writeString(Paths.get(s"$outDir/$name.plan.txt"),
                df.queryExecution.explainString(
                  org.apache.spark.sql.execution.FormattedMode))
            }
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(f"[verify] $name ok ${(System.nanoTime() - s0) / 1e9}%.1fs")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
          }
        }
      })
    }
    exec.shutdown()
    exec.awaitTermination(120, TimeUnit.MINUTES)
    System.err.println(f"[verify] ${todo.size} queries in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
