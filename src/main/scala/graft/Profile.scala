package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for declared queries (guide §1: measure first).
  *
  * For each named query: one warm (unmeasured) run, then one measured run
  * with a SparkListener attached; prints per-stage wall-clock, task count,
  * task-time sum, and shuffle read/write bytes, so the expensive stage —
  * not the expensive query — is the optimization target. Jobs are grouped
  * in submission order; stage names carry the callsite Spark records.
  *
  * usage: runMain graft.Profile <queryName> [more names...]
  * env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
  */
object Profile {
  private class Rec(val listenerLog: StringBuilder) extends SparkListener {
    case class St(id: Int, var name: String, var tasks: Int,
                  var launch: Long = Long.MaxValue, var done: Long = 0L,
                  var taskMs: Long = 0L, var shRead: Long = 0L,
                  var shWrite: Long = 0L, var inBytes: Long = 0L,
                  var spill: Long = 0L,
                  val durs: scala.collection.mutable.ArrayBuffer[Long] =
                    scala.collection.mutable.ArrayBuffer.empty)
    val stages = scala.collection.concurrent.TrieMap[Int, St]()
    val jobOfStage = scala.collection.concurrent.TrieMap[Int, Int]()
    @volatile var jobs = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs += 1
      j.stageInfos.foreach(si => jobOfStage(si.stageId) = j.jobId)
    }
    // per-task durations, for the stage max/median skew signal (guide
    // §2.5: a max/median ratio above ~5-10x marks a straggler partition)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val st = stages.getOrElseUpdate(te.stageId,
        St(te.stageId, "", 0))
      if (te.taskInfo != null) st.durs.synchronized {
        st.durs += te.taskInfo.duration
      }
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val st = stages.getOrElseUpdate(si.stageId,
        St(si.stageId, si.name, si.numTasks))
      st.name = si.name
      st.tasks = si.numTasks
      st.launch = si.submissionTime.getOrElse(Long.MaxValue)
      st.done = si.completionTime.getOrElse(0L)
      val m = si.taskMetrics
      if (m != null) {
        st.taskMs = m.executorRunTime
        st.shRead = m.shuffleReadMetrics.totalBytesRead
        st.shWrite = m.shuffleWriteMetrics.bytesWritten
        st.inBytes = m.inputMetrics.bytesRead
        st.spill = m.diskBytesSpilled
      }
    }
    def report(): String = {
      val sb = new StringBuilder
      sb.append(f"  jobs=$jobs stages=${stages.size}\n")
      stages.values.toSeq.sortBy(_.launch).foreach { s =>
        val wall = if (s.done > 0 && s.launch < Long.MaxValue) s.done - s.launch else -1
        val ds = s.durs.synchronized(s.durs.toArray.sorted)
        val tMax = if (ds.nonEmpty) ds.last else 0L
        val tMed = if (ds.nonEmpty) ds(ds.length / 2) else 0L
        sb.append(f"  [job ${jobOfStage.getOrElse(s.id, -1)}%3d stage ${s.id}%4d] " +
          f"wall=${wall}%5d ms tasks=${s.tasks}%4d taskSum=${s.taskMs}%6d ms " +
          f"tMax=${tMax}%5d tMed=${tMed}%5d " +
          f"in=${s.inBytes / 1024}%7d KB shR=${s.shRead / 1024}%6d KB " +
          f"shW=${s.shWrite / 1024}%6d KB spill=${s.spill / 1024}%5d KB  ${s.name.take(90)}\n")
      }
      sb.toString
    }
  }

  def main(args: Array[String]): Unit = {
    sys.props("graft.hash.family") = "fast"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: String): Unit = {
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    for (n <- args) {
      run(n) // warm: JIT/codegen off the measurement
      val rec = new Rec(new StringBuilder)
      spark.sparkContext.addSparkListener(rec)
      val t0 = System.nanoTime()
      run(n)
      val dt = (System.nanoTime() - t0) / 1e9
      // let straggler listener events drain before reporting
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(rec)
      println(f"\n=== $n : $dt%.3f s ===")
      println(rec.report())
    }
    spark.stop()
  }
}
