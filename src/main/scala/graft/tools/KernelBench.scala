package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench of the two custom streaming-core kernels alone — the same
  * measurement `graft.Bench` embeds at the end of the full corpus run,
  * extracted so a hot-loop change can be A/B'd in ~30 s instead of a
  * 10-minute corpus pass. Prints raw events/s for the length-window and
  * CEP kernels over the events table (3 timed reps after one warm-up).
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    sys.props("graft.hash.family") = "fast"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.{Cep, PatternSpec, Step, Windows, WinEvent}
    implicit val weEnc = org.apache.spark.sql.Encoders.product[WinEvent]
    val events = graft.Tables(spark, sfDir, "events")
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
    def win(): Unit =
      Windows.length(winDs, 10).write.format("noop").mode("overwrite").save()
    def cep(): Unit =
      Cep.detect(Cep.fromEvents(events), cepSpec).write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 5) { win(); cep() } // deep-JIT warm (Bench warms over the full corpus)
    val reps = sys.env.get("KB_REPS").map(_.toInt).getOrElse(4)
    for (i <- 1 to reps) {
      val tw = timed(win()); val tc = timed(cep())
      val load = scala.util.Try(scala.io.Source.fromFile("/proc/loadavg")
        .getLines().next().split(" ").head).getOrElse("?")
      println(f"rep$i window ${nEvents / tw}%.0f events/s  cep ${nEvents / tc}%.0f events/s  load=$load")
    }
    spark.stop()
  }
}
