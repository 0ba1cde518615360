package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TableOps

/** Streaming connector surfaces (SURVEY §2.1/§2.10): the timer/rate source
  * (timer_source.rs → format("rate")), and table upsert driven from a
  * stream via foreachBatch (insert_into_table_processor.rs).
  */
class ConnectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("timer source: rate stream emits monotonically increasing ticks") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50")
      .load()
      .writeStream.format("memory").queryName("ticks").outputMode("append")
      .start()
    try {
      // wait until at least a few ticks arrived
      var n = 0L
      val deadline = System.currentTimeMillis() + 20000
      while (n < 5 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        n = spark.table("ticks").count()
      }
      assert(n >= 5, s"rate source produced only $n rows")
      val vals = spark.table("ticks").select("value").as[Long].collect().sorted
      assert(vals.toSeq == vals.toSeq.distinct.sorted) // monotone tick ids
    } finally q.stop()
  }

  test("stream-driven table upsert via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    // table state held across micro-batches (the reference's in-memory table)
    var table: DataFrame = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val q = in.toDS().toDF("k", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        table = TableOps.upsert(table, batch, Seq("k"))
        table.cache().count() // materialize so later batches build on it
        ()
      }
      .start()
    try {
      in.addData((2L, 99.0)); q.processAllAvailable() // update existing key
      in.addData((3L, 30.0)); q.processAllAvailable() // insert new key
      val state = table.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(state == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
    } finally q.stop()
  }
}
