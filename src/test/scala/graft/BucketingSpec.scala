package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof of SCALE.md's bucketing claim: two fact tables bucketed on the
  * join key join WITHOUT any ShuffleExchange — the co-located-join path a
  * 100 TB deployment uses to amortize the fact-fact shuffle across every
  * downstream join (write once bucketed, join forever shuffle-free).
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  import spark.implicits._

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast would bypass the point — force the join to be key-based
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 10000).map(i => (i.toLong % 500, i.toLong, i * 2.0))
        .toDF("k", "a_id", "a_v")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("fact_a")
      (1 to 8000).map(i => (i.toLong % 500, i.toLong, i * 3.0))
        .toDF("k", "b_id", "b_v")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("fact_b")
      val joined = spark.table("fact_a").join(spark.table("fact_b"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      // join AND the groupBy on the same key ride the bucket partitioning
      assert(shuffles.isEmpty,
        joined.queryExecution.executedPlan.toString.take(2000))
      // and the result is the plain-join answer
      val unbucketed = (1 to 10000).map(i => (i.toLong % 500, i.toLong, i * 2.0))
        .toDF("k", "a_id", "a_v")
        .join((1 to 8000).map(i => (i.toLong % 500, i.toLong, i * 3.0))
          .toDF("k", "b_id", "b_v"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == unbucketed)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS fact_a")
      spark.sql("DROP TABLE IF EXISTS fact_b")
    }
  }

  test("Tables.writeBucketed: bucketed lineitem JOIN orders plans with zero shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.writeBucketed(spark, dir, "lineitem", "l_orderkey", 8)
      val ord = Tables.writeBucketed(spark, dir, "orders", "o_orderkey", 8)
      val joined = spark.table(li)
        .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      // the fact-fact join AND the same-key aggregation both ride the
      // write-time bucket partitioning — zero exchanges in the whole plan
      assert(shuffles.isEmpty,
        joined.queryExecution.executedPlan.toString.take(2000))
      // answers equal the unbucketed plan's
      val plain = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == plain)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}
