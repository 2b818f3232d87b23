package graft
import org.apache.spark.sql.SparkSession
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    Seq("geo_pip", "geo_pip_anti", "geo_geocode", "geo_knn_cell", "geo_cells").foreach { q =>
      val n = SparkEntry.queries(q)(spark, sf).count()
      println(s"CODEGEN_OK $q rows=$n")
    }
    val tiled = graft.pipeline.Pipeline.tilePages(
      graft.pipeline.Pipeline.synthPages(spark, 10000, 4), 7).count()
    println(s"CODEGEN_OK tiling rows=$tiled")
    spark.stop()
  }
}
