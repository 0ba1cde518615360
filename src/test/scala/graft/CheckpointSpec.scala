package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Graph}

/** Durable-checkpoint contract for the iterative operators (round 16,
  * VERDICT r15 #3): with a reliable checkpoint dir configured the loops
  * switch from executor-local blocks to DFS checkpoints (surviving
  * executor loss on a cluster), and the results are BIT-IDENTICAL to the
  * local path — the checkpoint mechanism is pure materialization, never
  * semantics.
  */
class CheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def withCheckpointDir[T](body: => T): T = {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    try body
    finally {
      // reset to the local-checkpoint path for every other spec sharing
      // this JVM's context: Option(null) = None inside setCheckpointDir
      // (the non-local-path warning short-circuits on isLocal)
      sc.setCheckpointDir(null)
      assert(sc.getCheckpointDir.isEmpty, "checkpoint dir did not reset")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("pageRank: reliable-checkpoint path is bit-identical to local path") {
    import spark.implicits._
    // chain + cycle + dangling node — exercises damping, degree split, ckpt
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 4L), (6L, 1L)
    ).toDF("src", "dst")
    val localPath = Graph.pageRank(edges, "src", "dst", iters = 12, tolPm = Some(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val reliablePath = withCheckpointDir {
      Graph.pageRank(edges, "src", "dst", iters = 12, tolPm = Some(1L))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(reliablePath == localPath, s"reliable $reliablePath vs local $localPath")
    assert(localPath.nonEmpty)
  }

  test("clusters: reliable-checkpoint path is bit-identical to local path") {
    import spark.implicits._
    // two components, one a 40-node chain (forces several pointer-jump
    // rounds), one a triangle
    val chain = (100L until 139L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((1L, 2L), (2L, 3L), (1L, 3L))).toDF("a", "b")
    val localPath = Dedup.clusters(pairs, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val reliablePath = withCheckpointDir {
      Dedup.clusters(pairs, "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(reliablePath == localPath)
    // ground truth: chain collapses to 100, triangle to 1
    val labels = localPath.toMap
    assert((100L to 139L).forall(labels(_) == 100L))
    assert(Seq(1L, 2L, 3L).forall(labels(_) == 1L))
  }

  test("reliable path actually writes checkpoint files") {
    import spark.implicits._
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-probe").toString
    sc.setCheckpointDir(dir)
    try {
      val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
      Graph.pageRank(edges, "src", "dst", iters = 3).collect()
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(dir)),
        "no checkpoint files written under the configured dir")
    } finally {
      sc.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
