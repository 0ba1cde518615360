package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Driver-buffer backpressure (BufferPolicy): the reference's junction
  * Drop/Block strategies (event_pipeline.rs:23-72) re-expressed for the
  * buffered micro-batch transports. A producer flooding past `max.buffered`
  * must either have its excess counted and dropped, or be parked (the
  * reader thread stops draining the socket → TCP flow control) — never
  * grow driver memory without bound.
  */
class BackpressureSpec extends AnyFunSuite {

  /** Minimal in-process RFC 6455 server that accepts one client and floods
    * it with `msgs` text frames as fast as the socket accepts them.
    */
  private def floodServer(msgs: Seq[String]): (java.net.ServerSocket, Thread) = {
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try {
        val sock = server.accept()
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
          s"Sec-WebSocket-Accept: ${WsCodec.acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
        out.flush()
        msgs.foreach { m =>
          out.write(WsCodec.encodeFrame(WsCodec.OpText, m.getBytes(UTF_8), mask = false))
        }
        out.flush()
        // hold the connection open; the client closes when the test stops
        Thread.sleep(60000)
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    (server, t)
  }

  private def awaitUntil(deadlineMs: Long = 15000)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + deadlineMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(25)
    assert(cond)
  }

  private def offsetN(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o.asInstanceOf[WsOffset].n

  test("drop policy: buffer capped, excess counted, no unbounded growth") {
    val msgs = (1 to 50).map(i => s"m$i")
    val (server, _) = floodServer(msgs)
    val stream = new WsMicroBatchStream("127.0.0.1", server.getLocalPort, "/",
      BufferPolicy(10, "drop"))
    try {
      stream.initialOffset() // connects and starts the reader thread
      // the flood drains fully (drop never parks the reader); the buffer
      // high-water mark is the cap and everything past it is counted
      awaitUntil()(stream.droppedCount == 40L)
      assert(offsetN(stream.latestOffset()) == 10L)
      // committed messages free slots, but dropped ones are gone for good
      stream.commit(WsOffset(10L))
      Thread.sleep(200)
      assert(offsetN(stream.latestOffset()) == 10L)
      assert(stream.droppedCount == 40L)
    } finally { stream.stop(); server.close() }
  }

  test("block policy: reader parks at the cap, commits release it, zero loss") {
    val msgs = (1 to 30).map(i => s"m$i")
    val (server, _) = floodServer(msgs)
    val stream = new WsMicroBatchStream("127.0.0.1", server.getLocalPort, "/",
      BufferPolicy(10, "block"))
    try {
      stream.initialOffset()
      awaitUntil()(offsetN(stream.latestOffset()) == 10L)
      // parked: nothing more arrives while the buffer stays full
      Thread.sleep(300)
      assert(offsetN(stream.latestOffset()) == 10L)
      assert(stream.droppedCount == 0L)
      // drain through micro-batch commits; every message survives in order
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      var base = 0L
      while (got.size < msgs.size) {
        awaitUntil()(offsetN(stream.latestOffset()) > base)
        val end = offsetN(stream.latestOffset())
        val part = stream.planInputPartitions(WsOffset(base), WsOffset(end))
        got ++= part(0).asInstanceOf[WsInputPartition].rows
        stream.commit(WsOffset(end))
        base = end
      }
      assert(got.toSeq == msgs)
      assert(stream.droppedCount == 0L)
    } finally { stream.stop(); server.close() }
  }

  test("policy options parse and validate from WITH-clause config") {
    def opts(kv: (String, String)*): CaseInsensitiveStringMap =
      new CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(kv.toMap).asJava)
    assert(BufferPolicy.fromOptions(opts()) == BufferPolicy.Default)
    assert(BufferPolicy.fromOptions(opts("max.buffered" -> "8", "overflow" -> "drop"))
      == BufferPolicy(8, "drop"))
    intercept[IllegalArgumentException] {
      BufferPolicy.fromOptions(opts("overflow" -> "shrug"))
    }
    intercept[IllegalArgumentException] {
      BufferPolicy.fromOptions(opts("max.buffered" -> "0"))
    }
    // the amqp provider carries the same policy surface
    intercept[IllegalArgumentException] {
      new AmqpSourceProvider().getTable(null, Array.empty,
        scala.jdk.CollectionConverters.MapHasAsJava(Map(
          "host" -> "h", "port" -> "1", "queue" -> "q",
          "overflow" -> "nope")).asJava)
    }
  }
}
