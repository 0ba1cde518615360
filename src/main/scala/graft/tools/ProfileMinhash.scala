// dev profiling scratch (run via: sbt "runMain graft.tools.ProfileMinhash")
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val d = Tables(spark, sfDir, "documents")
    println("docs=" + d.count())
    timed("tokenize+shingle only") {
      d.select(array_distinct(TextFns.shingles(col("text"), 3)).as("toks"))
        .select(sum(size(col("toks")))).collect()
    }
    timed("+ minhash signature") {
      d.select(array_distinct(TextFns.shingles(col("text"), 3)).as("toks"))
        .select(TextFns.minHashSignature(col("toks"), 64).as("sig"))
        .select(sum(size(col("sig")))).collect()
    }
    timed("full minHashLsh") {
      graft.operators.Dedup.minHashLsh(d, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.6,
        shingleSize = Some(3), maxBucketSize = 500)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    timed("full jaccardPairs") {
      graft.operators.Dedup.jaccardPairs(d, "doc_id", "text", "source", 0.6)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
