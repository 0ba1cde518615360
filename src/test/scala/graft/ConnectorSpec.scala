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

  // -- triggers.rs:trigger_test7_sql_periodic / trigger_test6_sql_start
  //    (TriggerTestCase ports), SQL-only end to end
  test("CREATE TRIGGER AT EVERY: periodic trigger feeds a query to a sink") {
    val app =
      """CREATE TRIGGER Tick AT EVERY 100 MILLISECONDS;
        |CREATE STREAM TrigOut (triggered_time TIMESTAMP) WITH ('type'='sink','format'='memory');
        |INSERT INTO TrigOut SELECT triggered_time FROM Tick;""".stripMargin
    val qs = graft.sql.AppRuntime.start(spark, app)
    try {
      var n = 0L
      val deadline = System.currentTimeMillis() + 20000
      while (n < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        n = spark.table("TrigOut").count()
      }
      assert(n >= 2, s"periodic trigger emitted only $n events")
    } finally qs.foreach(_.stop())
  }

  test("state-schema versioning: typed checkpoint error, marker stamped on fresh dirs") {
    import graft.streaming.StateSchema
    import java.nio.file.{Files, Paths}
    // fresh dir → marker stamped; same-version restart passes
    val dir = Files.createTempDirectory("graft-ckpt").toString
    StateSchema.guard(spark, dir)
    StateSchema.guard(spark, dir)
    assert(new java.io.File(dir, "graft-state-version.json").exists())
    // staged old-version marker → typed, actionable error naming both
    // versions (drop the local FS's .crc sidecar: we are simulating a
    // marker written by ANOTHER build, not editing this one's)
    Files.writeString(Paths.get(dir, "graft-state-version.json"), "{\"version\":7}")
    Files.deleteIfExists(Paths.get(dir, ".graft-state-version.json.crc"))
    val e = intercept[StateSchema.CheckpointVersionMismatch](
      StateSchema.guard(spark, dir))
    assert(e.getMessage.contains("v7") &&
      e.getMessage.contains(s"v${StateSchema.Version}") &&
      e.getMessage.contains("fresh"))
    // pre-versioning checkpoint (content, no marker) → typed error too
    val old = Files.createTempDirectory("graft-ckpt-old")
    Files.createDirectory(old.resolve("offsets"))
    val e2 = intercept[StateSchema.CheckpointVersionMismatch](
      StateSchema.guard(spark, old.toString))
    assert(e2.getMessage.contains("predates"))
    // the app-runtime path: a sink restarted on a staged old checkpoint
    // fails AT START with the typed message, before any executor work
    val dir3 = Files.createTempDirectory("graft-ckpt3")
    Files.writeString(dir3.resolve("graft-state-version.json"), "{\"version\":8}")
    Files.deleteIfExists(dir3.resolve(".graft-state-version.json.crc"))
    val app =
      s"""CREATE TRIGGER Tick AT EVERY 100 MILLISECONDS;
         |CREATE STREAM CkOut (triggered_time TIMESTAMP)
         |WITH ('type'='sink','format'='memory','checkpointLocation'='$dir3');
         |INSERT INTO CkOut SELECT triggered_time FROM Tick;""".stripMargin
    try {
      val e3 = intercept[StateSchema.CheckpointVersionMismatch](
        graft.sql.AppRuntime.start(spark, app))
      assert(e3.getMessage.contains("v8"))
    } finally spark.streams.active.foreach(_.stop())
  }

  test("CREATE TRIGGER AT START: fires exactly once at app start") {
    val app =
      """CREATE TRIGGER Boot AT START;
        |CREATE STREAM BootOut (triggered_time TIMESTAMP) WITH ('type'='sink','format'='memory');
        |INSERT INTO BootOut SELECT triggered_time FROM Boot;""".stripMargin
    val qs = graft.sql.AppRuntime.start(spark, app)
    try assert(spark.table("BootOut").count() == 1)
    finally qs.foreach(_.stop())
  }

  test("CREATE TRIGGER AT cron: every-second cron paces the trigger source") {
    val app =
      """CREATE TRIGGER Sec AT '* * * * * *';
        |CREATE STREAM SecOut (triggered_time TIMESTAMP) WITH ('type'='sink','format'='memory');
        |INSERT INTO SecOut SELECT triggered_time FROM Sec;""".stripMargin
    val qs = graft.sql.AppRuntime.start(spark, app)
    try {
      var n = 0L
      val deadline = System.currentTimeMillis() + 20000
      while (n < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        n = spark.table("SecOut").count()
      }
      assert(n >= 2, s"cron trigger emitted only $n events")
    } finally qs.foreach(_.stop())
  }

  test("CREATE TRIGGER parse: START, EVERY, cron forms and typed errors") {
    import graft.sql.GraftApp
    val spec = GraftApp.parse(
      """CREATE TRIGGER A AT START;
        |CREATE TRIGGER B AT EVERY 5 SECONDS;
        |CREATE TRIGGER C AT '*/2 * * * * *';""".stripMargin)
    assert(spec.triggers == Seq(
      GraftApp.TriggerDef("A", "start", None, None),
      GraftApp.TriggerDef("B", "every", Some(5000L), None),
      GraftApp.TriggerDef("C", "cron", Some(2000L), Some("*/2 * * * * *"))))
    // trigger streams are declared with the triggered_time column
    assert(spec.streams("B").schema.fieldNames.toSeq == Seq("triggered_time"))
    // general 5/6-field cron forms with a derivable fixed period
    // (trigger_runtime accepts full cron; phase offsets pace the period)
    assert(GraftApp.cronPeriodMs("*/5 * * * *") == Some(300000L))   // every 5 min
    assert(GraftApp.cronPeriodMs("* * * * *") == Some(60000L))      // every minute
    assert(GraftApp.cronPeriodMs("15 * * * *") == Some(3600000L))   // hourly at :15
    assert(GraftApp.cronPeriodMs("0 */6 * * *") == Some(21600000L)) // every 6 h
    assert(GraftApp.cronPeriodMs("30 2 * * *") == Some(86400000L))  // daily 02:30
    assert(GraftApp.cronPeriodMs("* * * * * *") == Some(1000L))     // every second
    assert(GraftApp.cronPeriodMs("30 * * * * *") == Some(60000L))   // every minute at :30
    assert(GraftApp.cronPeriodMs("0 0 * * * *") == Some(3600000L))  // hourly on the hour
    // */n is only fixed-period when n divides the field's modulus: real
    // cron resets */7 at the top of the hour (:56 → :00 is a 4-min gap)
    assert(GraftApp.cronPeriodMs("*/15 * * * *") == Some(900000L))  // 60 % 15 == 0
    assert(GraftApp.cronPeriodMs("*/7 * * * *") == None)            // irregular
    assert(GraftApp.cronPeriodMs("*/7 * * * * *") == None)          // seconds too
    assert(GraftApp.cronPeriodMs("0 */5 * * *") == None)            // 24 % 5 != 0
    assert(GraftApp.cronPeriodMs("*/20 * * * * *") == Some(20000L)) // 60 % 20 == 0
    val err7 = intercept[GraftApp.SqlError](
      GraftApp.parse("CREATE TRIGGER S AT '*/7 * * * *';"))
    assert(err7.getMessage.contains("divide"))
    val hourly = GraftApp.parse("CREATE TRIGGER H AT '0 * * * *';")
    assert(hourly.triggers == Seq(
      GraftApp.TriggerDef("H", "cron", Some(3600000L), Some("0 * * * *"))))
    // calendar-aligned fields: no fixed period from cronPeriodMs itself…
    assert(GraftApp.cronPeriodMs("0 0 1 * *") == None)
    assert(GraftApp.cronPeriodMs("0 0 * * 1") == None)
    // …but the trigger parses: paced at the wildcarded sub-period (daily)
    // with the calendar gate applied per tick at bind time
    val monthly = GraftApp.parse("CREATE TRIGGER M AT '0 0 1 * *';")
    assert(monthly.triggers == Seq(
      GraftApp.TriggerDef("M", "cron", Some(86400000L), Some("0 0 1 * *"))))
    val hourlyOn1st = GraftApp.parse("CREATE TRIGGER H1 AT '0 * 1 * *';")
    assert(hourlyOn1st.triggers.head.everyMs == Some(3600000L))
    // unsupported calendar shapes raise typed instead of degrading to *
    val errRange = intercept[GraftApp.SqlError](
      GraftApp.parse("CREATE TRIGGER R AT '0 0 1-5 * *';"))
    assert(errRange.getMessage.contains("unsupported day-of-month"))
  }

  test("JDBC table backend: Derby-backed table loads, DML composes, persists back") {
    import graft.sql.{AppRuntime, GraftApp}
    // in-process Derby (ships with Spark) — the jdbc_table.rs role: the
    // table's STORAGE is a database, the DML algebra stays engine-side
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE STOCK (symbol VARCHAR(16), price DOUBLE)")
    st.execute("INSERT INTO STOCK VALUES ('IBM', 100.0), ('MSFT', 50.0)")
    st.close()
    val app =
      """CREATE TABLE stock (symbol STRING, price DOUBLE)
        |WITH ('store'='jdbc', 'url'='jdbc:derby:memory:graftjdbc', 'dbtable'='STOCK');
        |CREATE STREAM quotes (symbol STRING, price DOUBLE);
        |UPDATE OR INSERT INTO stock SELECT symbol, price FROM quotes
        |ON stock.symbol = quotes.symbol;""".stripMargin
    val spec = GraftApp.parse(app)
    val jdbcEnv = AppRuntime.bindJdbcTables(spark, spec)
    assert(jdbcEnv.keySet == Set("stock"))
    val out = GraftApp.run(spark, app, jdbcEnv +
      ("quotes" -> Seq(("IBM", 150.0), ("WSO2", 10.0)).toDF("symbol", "price")))("stock")
    assert(out.orderBy("symbol").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("IBM", 150.0), ("MSFT", 50.0), ("WSO2", 10.0)))
    // persist back and re-read through a fresh JDBC bind
    AppRuntime.writeTableJdbc(out, url, "STOCK")
    val again = AppRuntime.bindJdbcTables(spark, spec)("stock")
    assert(again.orderBy("symbol").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("IBM", 150.0), ("MSFT", 50.0), ("WSO2", 10.0)))
    conn.close()
  }

  test("socket network source: csv-mapped lines stream through a declared app") {
    import graft.sql.{AppRuntime, GraftApp}
    // in-process TCP server — the websocket/rabbitmq source ROLE (a network
    // text transport + mapper) over the one transport the container allows
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val writerThread = new Thread(() => {
      val sock = server.accept()
      val w = new java.io.PrintWriter(sock.getOutputStream, true)
      w.println("IBM,100.5")
      w.println("MSFT,50.25")
      w.println("IBM,7.5")
      // keep the connection open long enough for the micro-batches to drain
      Thread.sleep(8000); w.close(); sock.close()
    })
    writerThread.setDaemon(true); writerThread.start()
    val app =
      s"""CREATE STREAM ticks (symbol STRING, price DOUBLE)
         |WITH ('type'='source', 'format'='socket',
         |      'host'='localhost', 'port'='$port');
         |CREATE STREAM agg (symbol STRING, total DOUBLE);
         |INSERT INTO agg SELECT symbol, sum(price) AS total FROM ticks GROUP BY symbol;""".stripMargin
    val spec = GraftApp.parse(app)
    val env = GraftApp.run(spark, app, AppRuntime.bindSources(spark, spec))
    val q = env("agg").writeStream.format("memory").queryName("sock_sink")
      .outputMode("complete").start()
    try {
      // poll until both symbols aggregated (socket source has no
      // processAllAvailable-style barrier for external writers)
      val deadline = System.nanoTime() + 30e9.toLong
      var rows = Map.empty[String, Double]
      while (rows.size < 2 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        rows = spark.table("sock_sink").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        if (rows.size < 2) Thread.sleep(200)
      }
      assert(rows == Map("IBM" -> 108.0, "MSFT" -> 50.25))
    } finally { q.stop(); server.close() }
  }

  test("socket source json mapping: JSONPath + auto-map lines through a declared app") {
    import graft.sql.{AppRuntime, GraftApp}
    // nested-JSON lines over live TCP: explicit json.mapping JSONPaths for
    // the nested fields, auto-map ($.city) for the top-level one —
    // reference json_mapper.rs:17-40 surface
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val writerThread = new Thread(() => {
      val sock = server.accept()
      val w = new java.io.PrintWriter(sock.getOutputStream, true)
      w.println("""{"order":{"id":1,"total":10.5},"city":"SF"}""")
      w.println("""{"order":{"id":2,"total":4.5},"city":"NY"}""")
      w.println("""{"order":{"id":3,"total":2.0},"city":"SF"}""")
      Thread.sleep(8000); w.close(); sock.close()
    })
    writerThread.setDaemon(true); writerThread.start()
    val app =
      s"""CREATE STREAM orders (oid BIGINT, amount DOUBLE, city STRING)
         |WITH ('type'='source', 'format'='socket',
         |      'host'='localhost', 'port'='$port',
         |      'json.mapping.oid'='$$.order.id',
         |      'json.mapping.amount'='$$.order.total');
         |CREATE STREAM agg (city STRING, total DOUBLE);
         |INSERT INTO agg SELECT city, sum(amount) AS total FROM orders GROUP BY city;""".stripMargin
    val spec = GraftApp.parse(app)
    val env = GraftApp.run(spark, app, AppRuntime.bindSources(spark, spec))
    val q = env("agg").writeStream.format("memory").queryName("sock_json_sink")
      .outputMode("complete").start()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      var rows = Map.empty[String, Double]
      while (rows.size < 2 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        rows = spark.table("sock_json_sink").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        if (rows.size < 2) Thread.sleep(200)
      }
      assert(rows == Map("SF" -> 12.5, "NY" -> 4.5))
    } finally { q.stop(); server.close() }
  }

  test("socket source json mapping: nested object into a declared STRUCT column (round 14)") {
    import graft.sql.{AppRuntime, GraftApp}
    // $.order maps into a STRUCT<id, total> column (from_json on the
    // JSONPath extract); a scalar sibling auto-maps alongside
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val writerThread = new Thread(() => {
      val sock = server.accept()
      val w = new java.io.PrintWriter(sock.getOutputStream, true)
      w.println("""{"order":{"id":1,"total":10.5},"city":"SF"}""")
      w.println("""{"order":{"id":2,"total":4.5},"city":"NY"}""")
      Thread.sleep(8000); w.close(); sock.close()
    })
    writerThread.setDaemon(true); writerThread.start()
    val app =
      s"""CREATE STREAM orders (o STRUCT<id: BIGINT, total: DOUBLE>, city STRING)
         |WITH ('type'='source', 'format'='socket',
         |      'host'='localhost', 'port'='$port',
         |      'json.mapping.o'='$$.order');
         |CREATE STREAM flat (city STRING, oid BIGINT, amount DOUBLE);
         |INSERT INTO flat SELECT city, o.id AS oid, o.total AS amount FROM orders;""".stripMargin
    val spec = GraftApp.parse(app)
    val env = GraftApp.run(spark, app, AppRuntime.bindSources(spark, spec))
    val q = env("flat").writeStream.format("memory").queryName("sock_struct_sink")
      .outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      var rows = Seq.empty[(String, Long, Double)]
      while (rows.size < 2 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        rows = spark.table("sock_struct_sink").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
        if (rows.size < 2) Thread.sleep(200)
      }
      assert(rows.sortBy(_._2) == Seq(("SF", 1L, 10.5), ("NY", 2L, 4.5)))
    } finally { q.stop(); server.close() }
  }

  // ---- RFC 6455 WebSocket transport (graft.sources.WebSocket) ----

  /** Server half of the Upgrade handshake for the in-process test server. */
  private def wsHandshake(sock: java.net.Socket):
      (java.io.DataInputStream, java.io.DataOutputStream) = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.DataOutputStream(sock.getOutputStream)
    def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
      sb.toString
    }
    var key: String = null
    var l = line()
    while (l.nonEmpty) {
      if (l.toLowerCase.startsWith("sec-websocket-key:"))
        key = l.substring(l.indexOf(':') + 1).trim
      l = line()
    }
    out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
      "Connection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${graft.sources.WsCodec.acceptKey(key)}\r\n\r\n")
      .getBytes("UTF-8"))
    out.flush()
    (in, out)
  }

  test("websocket codec: RFC accept key, mask round-trip, extended lengths, DoS cap") {
    import graft.sources.WsCodec
    // the RFC 6455 §1.3 worked example
    assert(WsCodec.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
    def rt(payload: Array[Byte], mask: Boolean): WsCodec.Frame =
      WsCodec.readFrame(new java.io.DataInputStream(new java.io.ByteArrayInputStream(
        WsCodec.encodeFrame(WsCodec.OpText, payload, mask))))
    for (mask <- Seq(true, false); n <- Seq(0, 1, 125, 126, 300, 70000)) {
      val payload = Array.tabulate(n)(i => ((i * 31 + 7) % 256).toByte)
      val f = rt(payload, mask)
      assert(f.fin && f.opcode == WsCodec.OpText && f.payload.toSeq == payload.toSeq,
        s"mask=$mask n=$n")
    }
    // wire-level length encodings: 7-bit <= 125, 16-bit to 65535, 64-bit above
    val e300 = WsCodec.encodeFrame(WsCodec.OpText, new Array[Byte](300), mask = false)
    assert((e300(1) & 0x7F) == 126 &&
      (((e300(2) & 0xFF) << 8) | (e300(3) & 0xFF)) == 300)
    assert((WsCodec.encodeFrame(WsCodec.OpText, new Array[Byte](70000),
      mask = false)(1) & 0x7F) == 127)
    // declared multi-GiB frame is rejected before allocation
    val evil = Array[Byte](0x81.toByte, 127, 0x7F, -1, -1, -1, -1, -1, -1, -1)
    intercept[java.io.IOException] {
      WsCodec.readFrame(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(evil)))
    }
  }

  test("websocket source: real frames (fragmentation, ping/pong) through a declared app") {
    import graft.sql.{AppRuntime, GraftApp}
    import graft.sources.WsCodec
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    @volatile var pongPayload: String = null
    val t = new Thread(() => {
      val sock = server.accept()
      val (in, out) = wsHandshake(sock)
      def send(op: Int, payload: Array[Byte], fin: Boolean = true): Unit = {
        out.write(WsCodec.encodeFrame(op, payload, mask = false, fin)); out.flush()
      }
      send(WsCodec.OpText, "IBM,100.5".getBytes("UTF-8"))
      // fragmented message: text(fin=0) + continuation(fin=1) must
      // reassemble into ONE line
      send(WsCodec.OpText, "MSFT,".getBytes("UTF-8"), fin = false)
      send(WsCodec.OpCont, "50.25".getBytes("UTF-8"))
      // ping: the client must answer a pong with the same payload
      send(WsCodec.OpPing, "hb".getBytes("UTF-8"))
      val pong = WsCodec.readFrame(in) // client frames are masked; readFrame unmasks
      if (pong != null && pong.opcode == WsCodec.OpPong)
        pongPayload = new String(pong.payload, "UTF-8")
      send(WsCodec.OpText, "IBM,7.5".getBytes("UTF-8"))
      Thread.sleep(8000)
      send(WsCodec.OpClose, Array.emptyByteArray)
      sock.close()
    })
    t.setDaemon(true); t.start()
    val app =
      s"""CREATE STREAM ticks (symbol STRING, price DOUBLE)
         |WITH ('type'='source', 'format'='websocket',
         |      'host'='127.0.0.1', 'port'='$port');
         |CREATE STREAM agg (symbol STRING, total DOUBLE);
         |INSERT INTO agg SELECT symbol, sum(price) AS total FROM ticks GROUP BY symbol;""".stripMargin
    val spec = GraftApp.parse(app)
    val env = GraftApp.run(spark, app, AppRuntime.bindSources(spark, spec))
    val q = env("agg").writeStream.format("memory").queryName("ws_src_sink")
      .outputMode("complete").start()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      var rows = Map.empty[String, Double]
      while (rows.get("IBM") != Some(108.0) && System.nanoTime() < deadline) {
        q.processAllAvailable()
        rows = spark.table("ws_src_sink").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        if (rows.get("IBM") != Some(108.0)) Thread.sleep(200)
      }
      assert(rows == Map("IBM" -> 108.0, "MSFT" -> 50.25))
      assert(pongPayload == "hb") // the transport answered the keepalive
    } finally { q.stop(); server.close() }
  }

  test("websocket wss: TLS source e2e against an in-process JSSE server, " +
      "untrusted chain rejected, config validation") {
    import graft.sql.{AppRuntime, GraftApp}
    import graft.sources.WsCodec
    // self-signed test keystore (PKCS12) via the JDK's own keytool
    val dir = java.nio.file.Files.createTempDirectory("graft-tls")
    val ks = dir.resolve("ws.p12").toString
    val keytool = new java.io.File(
      System.getProperty("java.home"), "bin/keytool").getAbsolutePath
    val gen = new ProcessBuilder(keytool, "-genkeypair", "-alias", "ws",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "30",
      "-dname", "CN=localhost",
      "-ext", "san=ip:127.0.0.1,dns:localhost",
      "-keystore", ks, "-storetype", "PKCS12", "-storepass", "changeit")
      .redirectErrorStream(true).start()
    assert(gen.waitFor() == 0, "keytool keystore generation failed")
    // TLS server socket from the keystore's key material
    val kstore = java.security.KeyStore.getInstance("PKCS12")
    val fin = new java.io.FileInputStream(ks)
    try kstore.load(fin, "changeit".toCharArray) finally fin.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(kstore, "changeit".toCharArray)
    val sctx = javax.net.ssl.SSLContext.getInstance("TLS")
    sctx.init(kmf.getKeyManagers, null, null)
    val server = sctx.getServerSocketFactory.createServerSocket(0)
    val port = server.getLocalPort
    val serve = new Thread(() => {
      // accept forever: the first (untrusted) client dies mid-handshake,
      // the trusted one gets the full upgrade + frames
      while (!server.isClosed) {
        try {
          val sock = server.accept()
          new Thread(() => {
            try {
              val (in, out) = wsHandshake(sock)
              def send(payload: String): Unit = {
                out.write(WsCodec.encodeFrame(WsCodec.OpText,
                  payload.getBytes("UTF-8"), mask = false))
                out.flush()
              }
              send("IBM,100.5"); send("IBM,7.5")
              Thread.sleep(30000)
            } catch { case _: Throwable => () }
          }).start()
        } catch { case _: Throwable => () }
      }
    })
    serve.setDaemon(true); serve.start()
    // 1. a client with the DEFAULT trust chain must reject the self-signed
    //    server — TLS without trust is worse than plaintext
    intercept[java.io.IOException] {
      val c = new graft.sources.WebSocketClient("127.0.0.1", port, "/",
        _ => (), tls = true)
      try c.connect() finally c.close()
    }
    // 2. the pinned-truststore path: full app e2e over wss
    val app =
      s"""CREATE STREAM ticks (symbol STRING, price DOUBLE)
         |WITH ('type'='source', 'format'='websocket',
         |      'host'='127.0.0.1', 'port'='$port', 'tls'='true',
         |      'tls.truststore'='$ks',
         |      'tls.truststore.password'='changeit');
         |CREATE STREAM agg (symbol STRING, total DOUBLE);
         |INSERT INTO agg SELECT symbol, sum(price) AS total FROM ticks GROUP BY symbol;""".stripMargin
    val spec = GraftApp.parse(app)
    val env = GraftApp.run(spark, app, AppRuntime.bindSources(spark, spec))
    val q = env("agg").writeStream.format("memory").queryName("wss_src_sink")
      .outputMode("complete").start()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      var total = 0.0
      while (total != 108.0 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        total = spark.table("wss_src_sink").collect()
          .find(_.getString(0) == "IBM").map(_.getDouble(1)).getOrElse(0.0)
        if (total != 108.0) Thread.sleep(200)
      }
      assert(total == 108.0)
    } finally { q.stop(); server.close() }
    // 3. truststore configured without tls='true' is rejected loudly
    intercept[IllegalArgumentException] {
      new graft.sources.WebSocketSourceProvider().getTable(null, Array.empty,
        scala.jdk.CollectionConverters.MapHasAsJava(Map(
          "host" -> "h", "port" -> "1",
          "tls.truststore" -> ks)).asJava)
    }
  }

  test("websocket sink: mapped rows leave as client-masked text frames") {
    import graft.sql.AppRuntime
    import graft.sources.WsCodec
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var serving = true
    val acceptor = new Thread(() => {
      while (serving) {
        try {
          val sock = server.accept()
          new Thread(() => {
            val (in, _) = wsHandshake(sock)
            var f = WsCodec.readFrame(in)
            while (f != null && f.opcode != WsCodec.OpClose) {
              if (f.opcode == WsCodec.OpText)
                received.add(new String(f.payload, "UTF-8"))
              f = WsCodec.readFrame(in)
            }
          }).start()
        } catch { case _: Exception => () /* server closed */ }
      }
    })
    acceptor.setDaemon(true); acceptor.start()
    val mem = MemoryStream[(String, Double)](spark, 1)
    val app =
      s"""CREATE STREAM src (symbol STRING, price DOUBLE);
         |CREATE STREAM wsout (symbol STRING, price DOUBLE)
         |WITH ('type'='sink', 'format'='websocket',
         |      'host'='127.0.0.1', 'port'='$port',
         |      'json.template'='{{symbol}}:{{price}}');
         |INSERT INTO wsout SELECT symbol, price FROM src WHERE price > 10;""".stripMargin
    val qs = AppRuntime.start(spark, app,
      extraInputs = Map("src" -> mem.toDF.toDF("symbol", "price")))
    try {
      mem.addData(("IBM", 100.5), ("PENNY", 0.5), ("MSFT", 50.25))
      qs.foreach(_.processAllAvailable())
      val deadline = System.nanoTime() + 20e9.toLong
      while (received.size < 2 && System.nanoTime() < deadline) Thread.sleep(100)
      val got = received.toArray(Array.empty[String]).toSet
      assert(got == Set("IBM:100.5", "MSFT:50.25")) // filter applied, template mapped
    } finally { qs.foreach(_.stop()); serving = false; server.close() }
  }

  // ---- AMQP 0-9-1 transport (graft.sources.Amqp) ----

  /** Scripted in-process broker half: negotiate one connection through
    * channel.open + queue.declare, then hand control to `afterSetup`.
    * Asserting inside threads is unreliable — protocol violations are
    * recorded and re-checked by the test body via the returned buffer.
    */
  private def amqpBrokerSetup(sock: java.net.Socket,
                              problems: java.util.Queue[String],
                              frameMax: Int = 131072):
      (java.io.DataInputStream, java.io.DataOutputStream, String) = {
    import graft.sources.AmqpCodec._
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.DataOutputStream(sock.getOutputStream)
    val hdr = new Array[Byte](8)
    in.readFully(hdr)
    if (!hdr.sameElements(ProtocolHeader)) problems.add(s"bad protocol header")
    // connection.start with a NON-empty server-properties table (the
    // client must skip it structurally) — one 'product' longstr entry
    val tableEntry = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(b)
      d.writeByte(7); d.write("product".getBytes("UTF-8"))
      d.writeByte('S'); d.writeInt(10); d.write("testbroker".getBytes("UTF-8"))
      b.toByteArray
    }
    val startArgs = new Args().u8(0).u8(9)
    val startPayload = new Args().u16(10).u16(10).bytes ++ startArgs.bytes ++
      (new Args().u32(tableEntry.length).bytes ++ tableEntry) ++
      new Args().longstr("PLAIN".getBytes).longstr("en_US".getBytes).bytes
    writeFrame(out, FrameMethod, 0, startPayload)
    // start-ok: mechanism PLAIN, SASL response \0user\0pass
    val so = new Reader(readFrame(in).payload)
    if ((so.u16(), so.u16()) != ((10, 11))) problems.add("expected start-ok")
    so.skipTable()
    if (so.shortstr() != "PLAIN") problems.add("mechanism not PLAIN")
    if (new String(so.longstr(), "UTF-8") != "\u0000guest\u0000guest")
      problems.add("bad SASL PLAIN response")
    // tune / tune-ok (client echoes, disables heartbeat)
    writeFrame(out, FrameMethod, 0, method(10, 30,
      new Args().u16(2047).u32(frameMax).u16(60)))
    val to = new Reader(readFrame(in).payload)
    if ((to.u16(), to.u16()) != ((10, 31))) problems.add("expected tune-ok")
    if (to.u16() != 2047 || to.u32() != frameMax) problems.add("tune-ok not echoed")
    // connection.open / open-ok
    val op = new Reader(readFrame(in).payload)
    if ((op.u16(), op.u16()) != ((10, 40))) problems.add("expected connection.open")
    if (op.shortstr() != "/") problems.add("bad vhost")
    writeFrame(out, FrameMethod, 0, method(10, 41, new Args().shortstr("")))
    // channel.open / open-ok
    val ch = readFrame(in)
    if (ch.channel != 1) problems.add("channel.open not on channel 1")
    val cr = new Reader(ch.payload)
    if ((cr.u16(), cr.u16()) != ((20, 10))) problems.add("expected channel.open")
    writeFrame(out, FrameMethod, 1, method(20, 11,
      new Args().longstr(Array.emptyByteArray)))
    // queue.declare / declare-ok
    val qd = new Reader(readFrame(in).payload)
    if ((qd.u16(), qd.u16()) != ((50, 10))) problems.add("expected queue.declare")
    qd.u16()
    val queue = qd.shortstr()
    writeFrame(out, FrameMethod, 1, method(50, 11,
      new Args().shortstr(queue).u32(0).u32(0)))
    (in, out, queue)
  }

  test("amqp codec: golden wire bytes, frame round-trip, size cap") {
    import graft.sources.AmqpCodec._
    // protocol header per the 0-9-1 spec
    assert(ProtocolHeader.map(b => f"${b & 0xFF}%02X").mkString ==
      "414D515000000901")
    // basic.publish method frame for queue "q" on channel 1, hand-computed:
    // type 01, channel 0001, size 0000000A,
    // payload 003C 0028 0000 00 0171 00, end CE
    val bos = new java.io.ByteArrayOutputStream()
    writeFrame(new java.io.DataOutputStream(bos), FrameMethod, 1,
      method(60, 40, new Args().u16(0).shortstr("").shortstr("q").u8(0)))
    assert(bos.toByteArray.map(b => f"${b & 0xFF}%02X").mkString ==
      "010001" + "0000000A" + "003C0028" + "0000" + "00" + "0171" + "00" + "CE")
    // round-trip
    val f = readFrame(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
    assert(f.ftype == FrameMethod && f.channel == 1 && f.payload.length == 10)
    // declared multi-GiB frame is rejected before allocation
    val evil = Array[Byte](1, 0, 0, 0x7F, -1, -1, -1)
    intercept[java.io.IOException] {
      readFrame(new java.io.DataInputStream(new java.io.ByteArrayInputStream(evil)))
    }
  }

  test("amqp source: negotiated consume, split body reassembly, heartbeat skip") {
    import graft.sql.{AppRuntime, GraftApp}
    import graft.sources.AmqpCodec._
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val problems = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t = new Thread(() => {
      val sock = server.accept()
      val (in, out, queue) = amqpBrokerSetup(sock, problems)
      // basic.consume / consume-ok
      val bc = new Reader(readFrame(in).payload)
      if ((bc.u16(), bc.u16()) != ((60, 20))) problems.add("expected basic.consume")
      bc.u16()
      if (bc.shortstr() != queue) problems.add("consume on wrong queue")
      bc.shortstr()
      if ((bc.u8() & 0x02) == 0) problems.add("no-ack flag not set")
      writeFrame(out, FrameMethod, 1, method(60, 21, new Args().shortstr("ctag-1")))
      def deliver(tag: Long, body: Array[Byte], split: Boolean): Unit = {
        writeFrame(out, FrameMethod, 1, method(60, 60,
          new Args().shortstr("ctag-1").u64(tag).u8(0).shortstr("").shortstr(queue)))
        writeFrame(out, FrameHeader, 1, contentHeader(body.length))
        if (split) {
          writeFrame(out, FrameBody, 1, body.take(body.length / 2))
          writeFrame(out, FrameBody, 1, body.drop(body.length / 2))
        } else writeFrame(out, FrameBody, 1, body)
      }
      deliver(1, "IBM,100.5".getBytes("UTF-8"), split = false)
      writeFrame(out, FrameHeartbeat, 0, Array.emptyByteArray) // must be skipped
      deliver(2, "MSFT,50.25".getBytes("UTF-8"), split = true) // body reassembly
      deliver(3, "IBM,7.5".getBytes("UTF-8"), split = false)
      Thread.sleep(8000)
      sock.close()
    })
    t.setDaemon(true); t.start()
    val app =
      s"""CREATE STREAM ticks (symbol STRING, price DOUBLE)
         |WITH ('type'='source', 'format'='rabbitmq',
         |      'host'='127.0.0.1', 'port'='$port', 'queue'='ticks');
         |CREATE STREAM agg (symbol STRING, total DOUBLE);
         |INSERT INTO agg SELECT symbol, sum(price) AS total FROM ticks GROUP BY symbol;""".stripMargin
    val spec = GraftApp.parse(app)
    val env = GraftApp.run(spark, app, AppRuntime.bindSources(spark, spec))
    val q = env("agg").writeStream.format("memory").queryName("amqp_src_sink")
      .outputMode("complete").start()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      var rows = Map.empty[String, Double]
      while (rows.get("IBM") != Some(108.0) && System.nanoTime() < deadline) {
        q.processAllAvailable()
        rows = spark.table("amqp_src_sink").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        if (rows.get("IBM") != Some(108.0)) Thread.sleep(200)
      }
      assert(rows == Map("IBM" -> 108.0, "MSFT" -> 50.25))
      assert(problems.isEmpty, s"broker saw protocol violations: $problems")
    } finally { q.stop(); server.close() }
  }

  test("amqps: the identical AMQP negotiation runs over JSSE TLS; untrusted chain rejected") {
    import graft.sources.AmqpCodec._
    // self-signed PKCS12 keystore via keytool (same recipe as the wss test)
    val dir = java.nio.file.Files.createTempDirectory("graft-amqps")
    val ks = dir.resolve("amqp.p12").toString
    val keytool = new java.io.File(
      System.getProperty("java.home"), "bin/keytool").getAbsolutePath
    val gen = new ProcessBuilder(keytool, "-genkeypair", "-alias", "amqp",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "30",
      "-dname", "CN=localhost", "-ext", "san=ip:127.0.0.1,dns:localhost",
      "-keystore", ks, "-storetype", "PKCS12", "-storepass", "changeit")
      .redirectErrorStream(true).start()
    assert(gen.waitFor() == 0, "keytool keystore generation failed")
    val kstore = java.security.KeyStore.getInstance("PKCS12")
    val fin = new java.io.FileInputStream(ks)
    try kstore.load(fin, "changeit".toCharArray) finally fin.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(kstore, "changeit".toCharArray)
    val sctx = javax.net.ssl.SSLContext.getInstance("TLS")
    sctx.init(kmf.getKeyManagers, null, null)
    val server = sctx.getServerSocketFactory.createServerSocket(0)
    val problems = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val acceptor = new Thread(() => {
      while (!server.isClosed) {
        try {
          val sock = server.accept()
          new Thread(() => {
            try {
              val (in, _, queue) = amqpBrokerSetup(sock, problems)
              var f = readFrame(in)
              var open = true
              while (open && f != null) {
                if (f.ftype == FrameMethod) {
                  val r = new Reader(f.payload)
                  val (c, m) = (r.u16(), r.u16())
                  if (c == 60 && m == 40) { // basic.publish
                    r.u16(); r.shortstr(); r.shortstr()
                    val hr = new Reader(readFrame(in).payload)
                    hr.u16(); hr.u16()
                    val size = hr.u64()
                    val body = new java.io.ByteArrayOutputStream()
                    while (body.size < size) body.write(readFrame(in).payload)
                    received.add(new String(body.toByteArray, "UTF-8") + "@" + queue)
                  } else if (c == 10 && m == 50) open = false
                }
                if (open) f = readFrame(in)
              }
            } catch { case _: Exception => () }
          }).start()
        } catch { case _: Exception => () }
      }
    })
    acceptor.setDaemon(true); acceptor.start()
    try {
      // default trust chain must reject the self-signed broker
      intercept[java.io.IOException] {
        val c = new graft.sources.AmqpClient("127.0.0.1", server.getLocalPort,
          tls = true)
        try c.connect() finally c.close()
      }
      // pinned truststore: the FULL 0-9-1 negotiation + publish over TLS
      val c = new graft.sources.AmqpClient("127.0.0.1", server.getLocalPort,
        tls = true, trustStore = Some(ks -> "changeit"))
      c.connect()
      try {
        c.declareQueue("secq")
        c.publish("secq", "over-tls".getBytes("UTF-8"))
      } finally c.close()
      val deadline = System.nanoTime() + 15e9.toLong
      while (received.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(received.toArray.toSeq == Seq("over-tls@secq"))
      assert(problems.isEmpty, problems.toArray.mkString("; "))
    } finally server.close()
  }

  test("amqp sink: mapped rows publish to the declared queue") {
    import graft.sql.AppRuntime
    import graft.sources.AmqpCodec._
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val problems = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var serving = true
    val acceptor = new Thread(() => {
      while (serving) {
        try {
          val sock = server.accept()
          new Thread(() => {
            try {
              // tiny negotiated frame-max: the client MUST split bodies
              val (in, _, queue) = amqpBrokerSetup(sock, problems, frameMax = 16)
              if (queue != "outq") problems.add(s"declared wrong queue: $queue")
              var open = true
              var f = readFrame(in)
              while (open && f != null) {
                if (f.ftype == FrameMethod) {
                  val r = new Reader(f.payload)
                  val (c, m) = (r.u16(), r.u16())
                  if (c == 60 && m == 40) { // basic.publish
                    r.u16()
                    if (r.shortstr() != "") problems.add("not the default exchange")
                    if (r.shortstr() != "outq") problems.add("wrong routing key")
                    val hr = new Reader(readFrame(in).payload)
                    hr.u16(); hr.u16()
                    val size = hr.u64()
                    val body = new java.io.ByteArrayOutputStream()
                    var nBodyFrames = 0
                    while (body.size < size) {
                      val bf = readFrame(in)
                      if (bf.payload.length > 16 - 8)
                        problems.add(s"body frame ${bf.payload.length} exceeds frame-max")
                      nBodyFrames += 1
                      body.write(bf.payload)
                    }
                    if (size > 8 && nBodyFrames < 2)
                      problems.add("oversized body was not split")
                    received.add(new String(body.toByteArray, "UTF-8"))
                  } else if (c == 10 && m == 50) open = false // connection.close
                }
                if (open) f = readFrame(in)
              }
            } catch { case _: Exception => () }
          }).start()
        } catch { case _: Exception => () }
      }
    })
    acceptor.setDaemon(true); acceptor.start()
    val mem = MemoryStream[(String, Double)](spark, 1)
    val app =
      s"""CREATE STREAM src (symbol STRING, price DOUBLE);
         |CREATE STREAM amqpout (symbol STRING, price DOUBLE)
         |WITH ('type'='sink', 'format'='rabbitmq',
         |      'host'='127.0.0.1', 'port'='$port', 'queue'='outq',
         |      'map.format'='csv');
         |INSERT INTO amqpout SELECT symbol, price FROM src WHERE price > 10;""".stripMargin
    val qs = AppRuntime.start(spark, app,
      extraInputs = Map("src" -> mem.toDF.toDF("symbol", "price")))
    try {
      mem.addData(("IBM", 100.5), ("PENNY", 0.5), ("MSFT", 50.25))
      qs.foreach(_.processAllAvailable())
      val deadline = System.nanoTime() + 20e9.toLong
      while (received.size < 2 && System.nanoTime() < deadline) Thread.sleep(100)
      val got = received.toArray(Array.empty[String]).toSet
      assert(got == Set("IBM,100.5", "MSFT,50.25"))
      assert(problems.isEmpty, s"broker saw protocol violations: $problems")
    } finally { qs.foreach(_.stop()); serving = false; server.close() }
  }

  test("sink mapper: json template, whole-row to_json, csv join") {
    import graft.sql.{AppRuntime, GraftApp}
    import spark.implicits._
    val rows = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("a", "b")
    def sinkView(withOpts: String, view: String): Seq[String] = {
      val app = s"""CREATE STREAM $view (a BIGINT, b STRING)
                   |WITH ('type'='sink', 'format'='memory'$withOpts);""".stripMargin
      AppRuntime.startSinks(GraftApp.parse(app), Map(view -> rows))
      spark.table(view).collect().map(_.getString(0)).toSeq.sorted
    }
    // template: placeholders substitute, NULL renders as JSON null
    assert(sinkView(""", 'json.template'='{"x":{{a}},"m":"{{b}}"}'""", "t_tpl")
      == Seq("""{"x":1,"m":"a"}""", """{"x":2,"m":"null"}""").sorted)
    // whole-row to_json (to_json omits null fields)
    assert(sinkView(", 'map.format'='json'", "t_json")
      == Seq("""{"a":1,"b":"a"}""", """{"a":2}""").sorted)
    // csv positional join
    assert(sinkView(", 'map.format'='csv'", "t_csv") == Seq("1,a", "2").sorted)
  }

  test("cron calendar gate keeps only ticks whose date matches dom/mon/dow") {
    import graft.sql.GraftApp
    import spark.implicits._
    def ticks(ts: String*) = ts.toSeq.toDF("t")
      .selectExpr("CAST(t AS TIMESTAMP) AS triggered_time")
    // monthly on the 1st: Jan 1 + Feb 1 pass, Jan 15 gated out
    val monthly = GraftApp.cronCalendarGate("0 0 1 * *").get
    assert(ticks("2026-01-01 00:00:00", "2026-01-15 00:00:00", "2026-02-01 00:00:00")
      .filter(monthly).count() == 2)
    // weekly Monday (cron dow 1): 2026-08-10 is a Monday, 08-11 a Tuesday
    val mondays = GraftApp.cronCalendarGate("0 0 * * 1").get
    assert(ticks("2026-08-10 00:00:00", "2026-08-11 00:00:00")
      .filter(mondays).count() == 1)
    // Sunday as both 0 and 7 (2026-08-09 is a Sunday)
    for (dowSun <- Seq("0", "7")) {
      val sundays = GraftApp.cronCalendarGate(s"0 0 * * $dowSun").get
      assert(ticks("2026-08-09 00:00:00", "2026-08-10 00:00:00")
        .filter(sundays).count() == 1)
    }
    // compound: 1st of February only
    val feb1 = GraftApp.cronCalendarGate("0 0 1 2 *").get
    assert(ticks("2026-01-01 00:00:00", "2026-02-01 00:00:00", "2026-02-02 00:00:00")
      .filter(feb1).count() == 1)
    // comma list dom
    val d1or15 = GraftApp.cronCalendarGate("0 0 1,15 * *").get
    assert(ticks("2026-03-01 00:00:00", "2026-03-15 00:00:00", "2026-03-20 00:00:00")
      .filter(d1or15).count() == 2)
    // unrestricted calendar → no gate
    assert(GraftApp.cronCalendarGate("*/5 * * * *").isEmpty)
    // out-of-range value raises typed
    val err = intercept[GraftApp.SqlError](GraftApp.cronCalendarGate("0 0 32 * *"))
    assert(err.getMessage.contains("outside"))
  }

  // file connector (SURVEY §2.1; the reference plans file sources): a fully
  // declared app reading a json directory source into a memory sink
  test("file source WITH clause: json directory streams through a query to a sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a.json").toPath,
      """{"sym":"IBM","v":10.0}
        |{"sym":"MSFT","v":3.0}
        |{"sym":"IBM","v":7.5}""".stripMargin)
    val app =
      s"""CREATE STREAM In (sym STRING, v DOUBLE)
         |  WITH ('type'='source','format'='json','path'='${dir.getAbsolutePath}');
         |CREATE STREAM FileOut (sym STRING, v DOUBLE)
         |  WITH ('type'='sink','format'='memory');
         |INSERT INTO FileOut SELECT sym, v FROM In WHERE v > 5.0;""".stripMargin
    val qs = graft.sql.AppRuntime.start(spark, app)
    try {
      qs.foreach(_.processAllAvailable())
      val got = spark.table("FileOut").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got == Set(("IBM", 10.0), ("IBM", 7.5)))
    } finally qs.foreach(_.stop())
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

  test("mapper fault routing: on.error=stream sends raw bad lines to !source") {
    import graft.sql.{AppRuntime, GraftApp}
    // stream_junction.rs OnErrorAction::STREAM at the mapper seam: two
    // parseable JSON lines reach the main stream, the garbage line lands
    // raw on the implicit !orders fault stream
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    // each streaming query opens its OWN socket connection — serve the
    // same lines to every client
    val writerThread = new Thread(() => {
      while (!server.isClosed) {
        val sock = server.accept()
        val t = new Thread(() => {
          val w = new java.io.PrintWriter(sock.getOutputStream, true)
          w.println("""{"oid":1,"amount":10.5}""")
          w.println("this is not json at all")
          w.println("""{"oid":2,"amount":4.5}""")
          Thread.sleep(8000); w.close(); sock.close()
        })
        t.setDaemon(true); t.start()
      }
    })
    writerThread.setDaemon(true); writerThread.start()
    val app =
      s"""CREATE STREAM orders (oid BIGINT, amount DOUBLE)
         |WITH ('type'='source', 'format'='socket',
         |      'host'='localhost', 'port'='$port',
         |      'map.format'='json', 'on.error'='stream');
         |CREATE STREAM good (oid BIGINT, amount DOUBLE);
         |CREATE STREAM bad (value STRING);
         |INSERT INTO good SELECT oid, amount FROM orders;
         |INSERT INTO bad SELECT value FROM !orders;""".stripMargin
    val spec = GraftApp.parse(app)
    val env = GraftApp.run(spark, app, AppRuntime.bindSources(spark, spec))
    val qg = env("good").writeStream.format("memory").queryName("fault_good")
      .outputMode("append").start()
    val qb = env("bad").writeStream.format("memory").queryName("fault_bad")
      .outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      var good = Seq.empty[(Long, Double)]
      var bad = Seq.empty[String]
      while ((good.size < 2 || bad.size < 1) && System.nanoTime() < deadline) {
        qg.processAllAvailable(); qb.processAllAvailable()
        good = spark.table("fault_good").collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
        bad = spark.table("fault_bad").collect().map(_.getString(0)).toSeq
        if (good.size < 2 || bad.size < 1) Thread.sleep(200)
      }
      assert(good == Seq((1L, 10.5), (2L, 4.5)))
      assert(bad == Seq("this is not json at all"))
    } finally { qg.stop(); qb.stop(); server.close() }
  }

  test("on.error validates its action; store points at the fault-stream spelling") {
    import graft.sql.GraftApp
    val err = intercept[GraftApp.SqlError](GraftApp.parse(
      """CREATE STREAM s (a BIGINT)
        |WITH ('type'='source','format'='socket','on.error'='store');""".stripMargin))
    assert(err.getMessage.contains("on.error"))
    assert(err.getMessage.contains("fault stream"))
  }

  test("file STREAMING sink: writeStream appends exactly-once parquet per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-file-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-file-ckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("id", "name").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      in.addData((1L, "alpha")); q.processAllAvailable()
      in.addData((2L, "beta"), (3L, "gamma")); q.processAllAvailable()
    } finally q.stop()
    // the manifest-committed files reassemble to exactly the input
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
  }

  test("file STREAMING source: readStream tails a csv drop directory") {
    // the streaming half of the file connector (batch round trip is the
    // q_file_csv oracle row): files dropped into a directory become
    // micro-batches, each file exactly once
    val dir = java.nio.file.Files.createTempDirectory("graft-file-stream")
    def drop(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("stage", ".csv")
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes)
      // atomic move in: Spark's file source requires complete files
      java.nio.file.Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    drop("a.csv", Seq("1,alpha", "2,beta"))
    val q = spark.readStream
      .schema("id LONG, name STRING")
      .csv(dir.toString)
      .writeStream.format("memory").queryName("file_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      drop("b.csv", Seq("3,gamma"))
      q.processAllAvailable()
      val got = spark.table("file_stream").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(got == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    } finally q.stop()
  }
}
