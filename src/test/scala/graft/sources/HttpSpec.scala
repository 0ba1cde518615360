package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** HTTP connector (graft.sources.Http): webhook-receiver source e2e through
  * a declared app, protocol replies (404/405/413), and the POSTing sink
  * against an in-process server.
  */
class HttpSpec extends AnyFunSuite {

  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def post(url: String, body: String): Int = {
    val client = java.net.http.HttpClient.newHttpClient()
    client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body, UTF_8))
        .build(),
      java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  test("http source: webhook POSTs flow through the csv mapper; protocol replies") {
    import graft.sql.{AppRuntime, GraftApp}
    val port = freePort()
    val app =
      s"""CREATE STREAM ticks (symbol STRING, price DOUBLE)
         |WITH ('type'='source', 'format'='http',
         |      'port'='$port', 'path'='/ingest', 'map.format'='csv');
         |CREATE STREAM agg (symbol STRING, total DOUBLE);
         |INSERT INTO agg SELECT symbol, sum(price) AS total FROM ticks GROUP BY symbol;""".stripMargin
    val spec = GraftApp.parse(app)
    val env = GraftApp.run(spark, app, AppRuntime.bindSources(spark, spec))
    val q = env("agg").writeStream.format("memory").queryName("http_src_sink")
      .outputMode("complete").start()
    try {
      // the embedded server starts on the first offset poll
      q.processAllAvailable()
      val base = s"http://127.0.0.1:$port"
      assert(post(s"$base/ingest", "IBM,100.5") == 204)
      assert(post(s"$base/ingest", "IBM,7.5") == 204)
      assert(post(s"$base/ingest", "MSFT,50.25") == 204)
      // protocol edges: wrong path, wrong method
      assert(post(s"$base/other", "x") == 404)
      val get = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"$base/ingest")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
      assert(get == 405)
      val deadline = System.nanoTime() + 30e9.toLong
      var rows = Map.empty[String, Double]
      while (rows.get("IBM") != Some(108.0) && System.nanoTime() < deadline) {
        q.processAllAvailable()
        rows = spark.table("http_src_sink").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        if (rows.get("IBM") != Some(108.0)) Thread.sleep(200)
      }
      assert(rows == Map("IBM" -> 108.0, "MSFT" -> 50.25))
    } finally q.stop()
  }

  test("http sink: rows POST to the configured url; non-2xx fails the epoch") {
    import graft.sql.{AppRuntime, GraftApp}
    import spark.implicits._
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    @volatile var fail = false
    server.createContext("/hook", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      if (fail) ex.sendResponseHeaders(500, -1)
      else { received.add(body); ex.sendResponseHeaders(204, -1) }
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
      val app =
        s"""CREATE STREAM lines (value STRING)
           |WITH ('type'='sink', 'format'='http', 'url'='$url');""".stripMargin
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](spark)
      src.addData("a", "b", "c")
      val qs = AppRuntime.startSinks(GraftApp.parse(app),
        Map("lines" -> src.toDF().selectExpr("value")))
      try {
        qs.foreach(_.processAllAvailable())
        assert(received.toArray.map(_.toString).sorted.toSeq == Seq("a", "b", "c"))
        // a 500 from the endpoint fails the micro-batch loudly
        fail = true
        src.addData("d")
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          qs.foreach(_.processAllAvailable())
        }
      } finally qs.foreach(_.stop())
    } finally server.stop(0)
  }
}
