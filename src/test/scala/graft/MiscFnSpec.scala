package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftApp

/** Coverage for the nondeterministic / non-oracle-able scalar surface
  * (SURVEY §2.2: uuid, now/current_timestamp, instanceOf type tests) and
  * the SQL front end over a *streaming* input (stateless slice).
  */
class MiscFnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("SparkEntry.entry: flagship star-join returns rows (driver t1 smoke)") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("r_name", "n_name", "revenue", "n_items"))
    assert(rows.map(_.getLong(3)).sum > 0)
  }

  test("SparkEntry.entry plan: broadcast HINTS reserved for fixed dims (100x shape)") {
    // only nation (n_*) and region (r_*) may carry a FORCED broadcast hint —
    // orders/customer are SF-proportional; forcing them broadcast is the
    // executor OOM the round-5 review flagged. At toy SF Catalyst still
    // auto-broadcasts small sides from size stats (correct — stats scale
    // with SF and flip to shuffle joins at 100x), so the audit pins the
    // logical hints, not the stats-dependent physical picks.
    val hinted = SparkEntry.entry(spark).queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
        h.child.output.map(_.name)
    }
    assert(hinted.size == 2, hinted.map(_.mkString(",")).mkString(" | "))
    assert(hinted.forall(_.forall(n => n.startsWith("n_") || n.startsWith("r_"))),
      hinted.map(_.mkString(",")).mkString(" | "))
  }

  test("uuid(): RFC-4122 shape, unique per row, nondeterministic flag honored") {
    val df = spark.range(500).select(expr("uuid()").as("u"))
    val us = df.as[String].collect()
    assert(us.distinct.length == 500)
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    assert(us.forall(u => re.matches(u)))
  }

  test("now()/current_timestamp is constant within a query (reference now() contract)") {
    val ts = spark.range(100).select(current_timestamp().as("t"))
      .distinct().count()
    assert(ts == 1) // one consistent value per query execution
  }

  test("instanceOf-style type tests via schema (the typed-DDL equivalent)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    import org.apache.spark.sql.types._
    // the reference's instanceOfX() runtime checks become compile-time
    // schema facts under a typed catalog
    assert(e.schema("value").dataType == DoubleType)
    assert(e.schema("event_type").dataType == StringType)
    assert(e.schema("ts").dataType == TimestampType)
    // runtime check shape for dynamic data: typeof()
    val t = e.select(expr("typeof(value)").as("t")).distinct().as[String].collect()
    assert(t.toSeq == Seq("double"))
  }

  test("fully-declared app: WITH source/sink auto-attach runs end to end") {
    // reference auto_attach (eventflux_app_runtime.rs:996-1040): rate
    // source → filter → memory sink, zero host wiring
    val app =
      """CREATE STREAM Ticks (timestamp TIMESTAMP, value BIGINT)
        |  WITH ('type' = 'source', 'format' = 'rate', 'rowsPerSecond' = '50');
        |CREATE STREAM Evens (value BIGINT)
        |  WITH ('type' = 'sink', 'format' = 'memory');
        |INSERT INTO Evens SELECT value FROM Ticks WHERE value % 2 = 0;""".stripMargin
    val queries = graft.sql.AppRuntime.start(spark, app)
    try {
      assert(queries.length == 1)
      var n = 0L
      val deadline = System.currentTimeMillis() + 20000
      while (n < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        n = spark.table("Evens").count()
      }
      assert(n >= 3, s"sink received only $n rows")
      val vals = spark.table("Evens").as[Long].collect()
      assert(vals.forall(_ % 2 == 0))
    } finally queries.foreach(_.stop())
  }

  test("GraftApp compiles the same app over a streaming input (stateless slice)") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val app =
      """CREATE STREAM In (a INT);
        |CREATE STREAM Out (a INT, doubled INT);
        |INSERT INTO Out SELECT a, a * 2 AS doubled FROM In WHERE a > 5;""".stripMargin
    val outDf = GraftApp.run(spark, app, Map("In" -> in.toDS().toDF("a")))("Out")
    assert(outDf.isStreaming)
    val q = outDf.writeStream.format("memory").queryName("gapp_stream")
      .outputMode("append").start()
    try {
      in.addData(1, 6, 9); q.processAllAvailable()
      in.addData(7, 2); q.processAllAvailable()
      val got = spark.table("gapp_stream").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(got == Set((6, 12), (9, 18), (7, 14)))
    } finally q.stop()
  }
}
