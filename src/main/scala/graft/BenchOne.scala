package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    sys.props("graft.hash.family") = "fast" // measure the production family
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_AQE_CACHE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: String): Unit = {
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    for (n <- args) { run(n) // warm
      val t0 = System.nanoTime(); run(n)
      println(s"TIMED $n ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
