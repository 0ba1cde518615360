package graft.sql

import org.apache.spark.sql.SparkSession
import graft.Tables

/** CLI for the EventFlux-SQL front end: run a multi-statement app file with
  * the testdata tables bound as input streams, print each INSERT INTO
  * target.
  *
  * usage: runMain graft.sql.RunApp <appFile.sql> [sfDir]
  */
object RunApp {
  def main(args: Array[String]): Unit = {
    val appFile = args.headOption.getOrElse(sys.error("usage: RunApp <appFile.sql> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val appSql = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(appFile)))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = GraftApp.parse(appSql)
    // bind any declared stream whose name matches a testdata table
    val inputs = spec.streams.keys.filter(Tables.names.contains)
      .map(n => n -> Tables(spark, sfDir, n)).toMap
    val env = GraftApp.run(spark, appSql, inputs)
    (spec.queries.map(_.target) ++ spec.patterns.map(_.target)).distinct.foreach { t =>
      println(s"===== $t =====")
      env(t).show(20, truncate = false)
    }
    spark.stop()
  }
}
