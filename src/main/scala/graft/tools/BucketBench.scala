// dev measurement tool (run via: sbt "runMain graft.tools.BucketBench [sfDir]")
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** SCALE.md evidence for the bucketed-write path ([[graft.Tables.writeBucketed]]):
  * times the lineitem⋈orders join+agg three ways on one host —
  *   plain:     both sides shuffle per query (the default fact-fact cost);
  *   bucketed:  zero-exchange plan over write-time bucketed tables;
  *   write:     the one-time bucketed ingest both reads amortize.
  * Prints one line per leg; the bucketed read must also report 0 shuffle
  * exchanges or the measurement is void (printed as a guard).
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketbench_wh").toString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false") // stable plan shapes
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force key joins
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def agg(li: org.apache.spark.sql.DataFrame, ord: org.apache.spark.sql.DataFrame) =
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // plain: warm once, measure
    sink(agg(Tables(spark, sfDir, "lineitem"), Tables(spark, sfDir, "orders")))
    val tPlain = timed(sink(agg(
      Tables(spark, sfDir, "lineitem"), Tables(spark, sfDir, "orders"))))

    val tWrite = timed {
      Tables.writeBucketed(spark, sfDir, "lineitem", "l_orderkey", 32)
      Tables.writeBucketed(spark, sfDir, "orders", "o_orderkey", 32)
    }
    val bucketed = agg(spark.table("lineitem_bucketed"), spark.table("orders_bucketed"))
    val nShuffles = bucketed.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }.size
    sink(bucketed) // warm
    val tBucketed = timed(sink(agg(
      spark.table("lineitem_bucketed"), spark.table("orders_bucketed"))))

    println(f"BUCKETBENCH sf=$sfDir plain=$tPlain%.2fs bucketed=$tBucketed%.2fs " +
      f"write_once=$tWrite%.2fs shuffles_in_bucketed_plan=$nShuffles " +
      f"speedup=${tPlain / tBucketed}%.2fx")
    spark.stop()
  }
}
