package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{ForeachWriter, Row}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** HTTP transport, pure JVM — the third connector of the reference's
  * planned source triple (MILESTONES.md:189-206: kafka/http/file). Both
  * halves use only JDK modules (`jdk.httpserver`, `java.net.http`):
  *
  *  - SOURCE = webhook receiver: an embedded HTTP server accepts POSTed
  *    bodies on the configured path and feeds them to the shared
  *    driver-buffered micro-batch stream — same `value STRING` wire shape,
  *    line mappers, fault routing and [[BufferPolicy]] backpressure as the
  *    socket/websocket/amqp transports (a flooding producer is dropped-
  *    and-counted or parked). Replies: 204 accepted, 413 over the frame
  *    cap, 404 wrong path, 405 non-POST.
  *  - SINK = webhook poster: each row's single string column is POSTed to
  *    the configured URL (`'content.type'` header configurable); non-2xx
  *    responses fail the epoch loudly.
  *
  * Like the reference's design, HTTP is a LOW-VOLUME control/feed channel;
  * a bulk feed belongs on a partitioned transport (files/kafka).
  */
class HttpSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebSocketSourceProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val port = Option(opts.get("port")).map(_.toInt).getOrElse(
      throw new IllegalArgumentException("http source needs a 'port' option"))
    val path = Option(opts.get("path")).getOrElse("/")
    val bind = Option(opts.get("bind")).getOrElse("0.0.0.0")
    new HttpTable(bind, port, path, BufferPolicy.fromOptions(opts))
  }
}

private[sources] class HttpTable(bind: String, port: Int, path: String,
                                 bufPolicy: BufferPolicy)
  extends Table with SupportsRead {
  override def name(): String = s"http:$bind:$port$path"
  override def schema(): StructType = WebSocketSourceProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WebSocketSourceProvider.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HttpMicroBatchStream(bind, port, path, bufPolicy)
      }
    }
}

private[sources] class HttpMicroBatchStream(bind: String, port: Int, path: String,
                                            bufPolicy: BufferPolicy = BufferPolicy.Default)
  extends DriverBufferedTextStream {
  override protected def policy: BufferPolicy = bufPolicy
  protected def open(onText: String => Unit, onDeath: String => Unit): AutoCloseable = {
    // 'bind' narrows the listen interface (e.g. '127.0.0.1' behind a
    // local reverse proxy); default = all interfaces, the webhook shape
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(bind, port), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val (code, body) =
          if (ex.getRequestURI.getPath != path) (404, "not found")
          else if (ex.getRequestMethod != "POST") (405, "POST only")
          else {
            // bound the body like the WS frame cap — an unbounded read
            // here would be a driver OOM lever
            val b = ex.getRequestBody.readNBytes(WsCodec.MaxFrameBytes.toInt + 1)
            if (b.length > WsCodec.MaxFrameBytes) (413, "body exceeds cap")
            else { onText(new String(b, UTF_8)); (204, "") }
          }
        if (code == 204) { ex.sendResponseHeaders(204, -1) }
        else {
          val bb = body.getBytes(UTF_8)
          ex.sendResponseHeaders(code, bb.length)
          ex.getResponseBody.write(bb)
        }
      } finally ex.close()
    })
    // request handling on a small pool — `block` backpressure parks these
    // threads, which surfaces to producers as slow/stalled POSTs
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2))
    server.start()
    () => {
      server.stop(0)
      server.getExecutor.asInstanceOf[java.util.concurrent.ExecutorService].shutdownNow()
    }
  }
}

/** HTTP SINK: POST each row's single string column to `url`. Failures
  * (connect errors, non-2xx) throw — the epoch fails loudly rather than
  * dropping rows silently.
  */
class HttpForeachWriter(url: String, contentType: String = "text/plain")
  extends ForeachWriter[Row] {
  @transient private var client: java.net.http.HttpClient = _
  override def open(partitionId: Long, epochId: Long): Boolean = {
    client = java.net.http.HttpClient.newHttpClient()
    true
  }
  override def process(row: Row): Unit = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", contentType)
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        String.valueOf(row.get(0)), UTF_8))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.discarding())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"http sink POST $url returned ${resp.statusCode()}")
  }
  override def close(errorOrNull: Throwable): Unit = ()
}
