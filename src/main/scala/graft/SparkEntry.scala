package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2) re-expressed Spark-first;
  * each entry that is ANSI-SQL-expressible also appears in `oracleSql` for
  * the driver's DuckDB hash-compare.
  */
object SparkEntry {

  private val families: Seq[QueryFamily] = Seq(
    CoreQueries, AggQueries, JoinQueries, MiscQueries, WindowQueries,
    DedupQueries, SimilarityQueries, TextQueries, CepQueries,
    ConnectorQueries, RollupQueries, SamplingQueries, CurationQueries,
    SearchQueries, GraphQueries, SketchQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation (TPC-H Q5 shape). Broadcast is reserved for the
    * FIXED-cardinality dimensions (nation=25, region=5): orders and
    * customer grow with SF, so forcing them broadcast is an executor OOM at
    * 100× — they take shuffle hash joins on their keys (AQE picks broadcast
    * anyway if a filtered side happens to be small at runtime). Projecting
    * join keys + aggregation inputs only keeps the shuffled rows narrow.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o  = Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c  = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n  = Tables(spark, dir, "nation")
    val r  = Tables(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_.oracles).toMap
}
