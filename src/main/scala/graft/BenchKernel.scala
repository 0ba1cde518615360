package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Kernel-only microbench: the window and CEP events/s numbers from
  * `Bench`, with none of the query corpus in front of them — for quiet-host
  * re-measurement when a full Bench run's kernel rates look host-contended
  * (they run last there, after ~15 min of corpus). Same measurement policy
  * as Bench: warm once (JIT/codegen), time the second run, noop sink.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.BenchKernel [reps=3]
  * Prints one TIMED line per rep so run-to-run spread is visible.
  */
object BenchKernel {
  def main(args: Array[String]): Unit = {
    sys.props("graft.hash.family") = "fast"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.streaming.{Cep, PatternSpec, Step, Windows, WinEvent}
    implicit val weEnc = org.apache.spark.sql.Encoders.product[WinEvent]
    val events = Tables(spark, sfDir, "events")
    val nEvents = events.count()
    val winDs = events.select(
      col("user_id").cast("string").as("key"), unix_micros(col("ts")).as("tsUs"),
      col("event_id").as("eventId"), col("value"),
      typedlit(Seq.empty[Double]).as("vals"),
      typedlit(Seq.empty[String]).as("svals")).as[WinEvent]
    val cepSpec = PatternSpec(
      Seq(Step.simple("a")(_.etype == "signup"), Step.simple("b")(_.etype == "purchase")),
      strict = false, every = true, withinUs = Some(86400000000L))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def winRun(): Unit =
      Windows.length(winDs, 10).write.format("noop").mode("overwrite").save()
    def cepRun(): Unit =
      Cep.detect(Cep.fromEvents(events), cepSpec)
        .write.format("noop").mode("overwrite").save()
    winRun(); cepRun() // warm
    for (r <- 1 to reps) {
      val tWin = timed(winRun())
      val tCep = timed(cepRun())
      // per-rep host calibration: the normalized columns (events per
      // calibration Mop) should sit flat across host states even when the
      // raw events/s swing — that flatness is the signal the floor gate
      // keys on (HostCalib scaladoc; SCALE.md round-11 validation table)
      val (_, calibN) = HostCalib.calibrate(cpus.toInt)
      println(f"TIMED rep=$r window=${nEvents / tWin}%.0f cep=${nEvents / tCep}%.0f " +
        f"events_per_sec calib=${calibN}%.0f Mops " +
        f"win_per_calib=${nEvents / tWin / calibN}%.1f cep_per_calib=${nEvents / tCep / calibN}%.1f " +
        f"adjust=${HostCalib.floorAdjust(calibN)}%.3f (n=$nEvents)")
    }
    spark.stop()
  }
}
