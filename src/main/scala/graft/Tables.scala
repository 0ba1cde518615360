package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed parquet directories; the
  * loader surface stays the same (`spark.read.parquet(dir)` handles a
  * directory of part files transparently). All queries go through this so
  * column pruning + predicate pushdown reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts varies by generator vintage: parquet TIMESTAMP(NANOS) (which
    // Spark 4 refuses to read natively — read as long nanos) or
    // TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ). Normalize
    // both to a micro-precision TimestampType column; every entry point pins
    // the session timezone to UTC, so the NTZ cast is micros-identical and
    // matches DuckDB's naive timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    } else df
  }

  /** Register every table as a temp view (for spark.sql-expressed queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
