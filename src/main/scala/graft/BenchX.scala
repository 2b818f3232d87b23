package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Profiling harness for optimization work (NOT part of the frozen bench):
  * runs named queries from SparkEntry.queries with a listener that reports
  * per-job wall time, stage count and task count — the breakdown that tells
  * whether a slow query is compute, shuffle volume, or fixed per-job /
  * per-task dispatch overhead. Also supports `-plans <outDir>` to dump
  * `.explain("formatted")` per query.
  *
  * Usage: runMain graft.BenchX <sfDir> [-reps N] [-plans dir] q1 q2 ...
  */
object BenchX {
  private class Prof extends SparkListener {
    case class J(id: Int, t0: Long) { var stages = 0; var tasks = 0 }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, Int)]()
    @volatile var taskTimeMs: Long = 0L
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobs.put(e.jobId, J(e.jobId, System.nanoTime()))
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val j = jobs.remove(e.jobId)
      if (j != null)
        done.add((j.id, (System.nanoTime() - j.t0) / 1e9, j.stages, j.tasks))
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      jobs.forEach((_, j) => ())
      val jids = jobs.values()
      if (!jids.isEmpty) {
        val j = jids.iterator().next()
        j.stages += 1
        j.tasks += e.stageInfo.numTasks
      }
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskInfo != null) taskTimeMs += e.taskInfo.duration
    def reset(): Unit = { done.clear(); taskTimeMs = 0L }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    var reps = 1
    var plansDir: Option[String] = None
    val names = collection.mutable.ArrayBuffer[String]()
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "-reps" => reps = args(i + 1).toInt; i += 2
        case "-plans" => plansDir = Some(args(i + 1)); i += 2
        case q => names += q; i += 1
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.local.dir", "/dev/shm/spark-graft-x")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    // experiment hook: SPARK_GRAFT_CONF="key=value;key=value"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.sparkContext.setLogLevel("ERROR")
    val prof = new Prof
    spark.sparkContext.addSparkListener(prof)

    names.foreach { q =>
      plansDir.foreach { d =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/$q.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
      var r = 0
      while (r < reps) {
        prof.reset()
        spark.sparkContext.setJobDescription(q)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener events drain
        val js = prof.done.toArray(Array.empty[(Int, Double, Int, Int)]).sortBy(_._1)
        val (nj, ns, nt) = (js.length, js.map(_._3).sum, js.map(_._4).sum)
        println(f"BENCHX $q rep$r $sec%.2fs rows=$n jobs=$nj stages=$ns tasks=$nt " +
          f"taskTime=${prof.taskTimeMs / 1000.0}%.1fs")
        if (sys.env.get("SPARK_GRAFT_JOBS").contains("1"))
          js.foreach { case (id, s, st, tk) =>
            println(f"  job $id%3d $s%6.2fs stages=$st tasks=$tk") }
        r += 1
      }
    }
    spark.stop()
  }
}
