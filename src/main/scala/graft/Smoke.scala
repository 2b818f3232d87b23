package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: executes SparkEntry.entry (the driver's rows>0
  * check) and prints the count + a sample + the physical plan.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows = ${df.count()}")
    df.show(5, truncate = false)
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
  }
}
