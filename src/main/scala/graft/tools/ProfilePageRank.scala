package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Graph

/** Stage-timing harness for Graph.pageRank (dev tool, not a query path):
  * times edge derivation, operator phases, and iteration counts separately
  * so regressions can be attributed. usage: runMain graft.tools.ProfilePageRank [sfDir]
  */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def edges() = {
      val o = Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val raw = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
    }

    // warm-up full run
    t("warmup-full")(Graph.pageRank(edges(), "src", "dst", 5)
      .write.format("noop").mode("overwrite").save())

    t("edges-only") {
      println("edge rows: " + edges().count())
    }
    for (it <- Seq(0, 1, 3, 5)) {
      t(s"pageRank-iters-$it")(Graph.pageRank(edges(), "src", "dst", it)
        .write.format("noop").mode("overwrite").save())
    }

    // manual phase replication of the operator internals
    {
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val e = edges()
      val degs = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val eDeg = degs.join(e, "src").persist(MEMORY_AND_DISK)
      t("phase-eDeg-materialize")(println("eDeg rows " + eDeg.count()))
      val nodes = degs.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist(MEMORY_AND_DISK)
      t("phase-nodes-materialize")(println("nodes " + nodes.count()))
      var rank = nodes.select(col("node"), lit(1000000000L).as("rank"))
      t("phase-3-iters-lazy") {
        var i = 0
        while (i < 3) {
          val contrib = eDeg
            .join(rank.select(col("node").as("src"), col("rank")), "src")
            .select(col("dst").as("node"), expr("rank div deg").as("c"))
          rank = contrib.union(nodes.select(col("node"), lit(0L).as("c")))
            .groupBy("node").agg(sum(col("c")).as("s"))
            .select(col("node"), (lit(150000000L) + expr("(85 * s) div 100")).as("rank"))
          i += 1
        }
        rank.write.format("noop").mode("overwrite").save()
      }
      t("phase-final-checkpoint")(rank.localCheckpoint(true))
      var rank2 = nodes.select(col("node"), lit(1000000000L).as("rank"))
      t("phase-3-iters-bcast") {
        var i = 0
        while (i < 3) {
          val contrib = eDeg
            .join(broadcast(rank2.select(col("node").as("src"), col("rank"))), "src")
            .select(col("dst").as("node"), expr("rank div deg").as("c"))
          rank2 = contrib.union(nodes.select(col("node"), lit(0L).as("c")))
            .groupBy("node").agg(sum(col("c")).as("s"))
            .select(col("node"), (lit(150000000L) + expr("(85 * s) div 100")).as("rank"))
          i += 1
        }
        rank2.write.format("noop").mode("overwrite").save()
      }
      nodes.unpersist(); eDeg.unpersist()
    }
    spark.stop()
  }
}
