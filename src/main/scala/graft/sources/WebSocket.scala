package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import scala.collection.mutable

import org.apache.spark.sql.{ForeachWriter, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** RFC 6455 WebSocket transport, pure JVM — the real protocol half of the
  * reference's websocket source/sink (websocket_source.rs:1-906,
  * websocket_sink.rs): HTTP Upgrade handshake (SHA-1/Base64 accept-key
  * derivation), frame codec (FIN/opcode byte, 7/16/64-bit payload lengths,
  * client-side masking, fragmentation reassembly, ping/pong, close), a
  * blocking client, a Spark DataSource-V2 micro-batch SOURCE, and a
  * `ForeachWriter` SINK. No external library — `java.net.Socket` +
  * `java.security.MessageDigest` only. Client-side TLS (wss://) is
  * supported pure-JVM via JSSE ([[WsTls]]: `'tls'='true'` +
  * optional pinned `'tls.truststore'`, hostname verification on); proxy
  * traversal and server-side TLS termination stay environment concerns,
  * as in the reference.
  *
  * The source follows the architecture of Spark's own dev-transport socket
  * source: a driver-side reader thread buffers messages; each micro-batch
  * serves a slice. That is the right shape for a LOW-VOLUME control/feed
  * channel (the reference's use); a 100 TB bulk feed belongs on a
  * partitioned transport (files/Kafka), not a single WebSocket. The buffer
  * is CAPPED ([[BufferPolicy]], `'max.buffered'`/`'overflow'` options):
  * a producer outpacing the trigger either has its excess dropped-and-
  * counted or is parked via TCP flow control — the reference's junction
  * Drop/Block strategies (event_pipeline.rs:23-72) — never an unbounded
  * driver heap.
  */
object WsCodec {

  val GuidSalt = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
  val MaxFrameBytes: Long = 16L << 20 // DoS guard: reject >16 MiB frames

  final case class Frame(fin: Boolean, opcode: Int, payload: Array[Byte])

  val OpCont = 0x0; val OpText = 0x1; val OpBinary = 0x2
  val OpClose = 0x8; val OpPing = 0x9; val OpPong = 0xA

  /** Sec-WebSocket-Accept for a Sec-WebSocket-Key (RFC 6455 §4.2.2). */
  def acceptKey(key: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
    Base64.getEncoder.encodeToString(sha.digest((key + GuidSalt).getBytes(UTF_8)))
  }

  /** One frame, wire-encoded. Clients MUST mask (RFC 6455 §5.3); servers
    * must not. The mask key need not be cryptographic — it defeats cache
    * poisoning of intermediaries, not eavesdroppers.
    */
  def encodeFrame(opcode: Int, payload: Array[Byte], mask: Boolean,
                  fin: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 14)
    out.write((if (fin) 0x80 else 0x00) | (opcode & 0x0F))
    val maskBit = if (mask) 0x80 else 0x00
    val n = payload.length
    if (n <= 125) out.write(maskBit | n)
    else if (n <= 0xFFFF) {
      out.write(maskBit | 126); out.write(n >> 8); out.write(n & 0xFF)
    } else {
      out.write(maskBit | 127)
      var k = 56
      while (k >= 0) { out.write(((n.toLong >> k) & 0xFF).toInt); k -= 8 }
    }
    if (mask) {
      val key = new Array[Byte](4)
      java.util.concurrent.ThreadLocalRandom.current().nextBytes(key)
      out.write(key)
      var i = 0
      while (i < n) { out.write(payload(i) ^ key(i % 4)); i += 1 }
    } else out.write(payload)
    out.toByteArray
  }

  /** Read one frame off the stream; null at clean EOF before a frame
    * starts. Masked payloads are unmasked in place.
    */
  def readFrame(in: DataInputStream): Frame = {
    val b0 = in.read()
    if (b0 < 0) return null
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0F
    val b1 = in.readUnsignedByte()
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) len = in.readUnsignedShort()
    else if (len == 127) len = in.readLong()
    if (len < 0 || len > MaxFrameBytes)
      throw new java.io.IOException(s"websocket frame length $len exceeds cap")
    val key = if (masked) { val k = new Array[Byte](4); in.readFully(k); k } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ key(i % 4)).toByte; i += 1
      }
    }
    Frame(fin, opcode, payload)
  }
}

/** Client-side TLS for wss:// over the existing socket path, pure JSSE.
  * `'tls'='true'` upgrades the transport; trust defaults to the JVM's
  * standard chain (cacerts / `javax.net.ssl.trustStore` properties), or a
  * `'tls.truststore'` (+ password) option pins an explicit store — the
  * shape every JVM client config uses. Endpoint identification (hostname
  * vs certificate SAN/CN) is ON — JSSE raw sockets skip it by default,
  * which would accept any certificate the chain signs.
  */
object WsTls {
  def context(trustStore: Option[(String, String)]): javax.net.ssl.SSLContext =
    trustStore match {
      case None => javax.net.ssl.SSLContext.getDefault
      case Some((path, password)) =>
        val ks = java.security.KeyStore.getInstance(
          java.security.KeyStore.getDefaultType)
        val in = new java.io.FileInputStream(path)
        try ks.load(in, password.toCharArray) finally in.close()
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(null, tmf.getTrustManagers, null)
        ctx
    }

  /** TLS-wrapped client socket with hostname verification enabled. */
  def socket(host: String, port: Int,
             trustStore: Option[(String, String)]): Socket = {
    val s = context(trustStore).getSocketFactory
      .createSocket(host, port).asInstanceOf[javax.net.ssl.SSLSocket]
    val p = s.getSSLParameters
    p.setEndpointIdentificationAlgorithm("HTTPS")
    s.setSSLParameters(p)
    s.startHandshake()
    s
  }
}

/** Blocking RFC 6455 client: connect + Upgrade handshake, then a message
  * loop that reassembles fragmented text/binary messages, answers pings,
  * and echoes close. `onText` fires once per complete text message.
  * `tls=true` runs the identical protocol over a JSSE socket ([[WsTls]]).
  */
final class WebSocketClient(host: String, port: Int, path: String,
                            onText: String => Unit,
                            tls: Boolean = false,
                            trustStore: Option[(String, String)] = None) {
  @volatile private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _

  def connect(): Unit = {
    socket = if (tls) WsTls.socket(host, port, trustStore)
             else new Socket(host, port)
    socket.setTcpNoDelay(true)
    in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream))
    out = new DataOutputStream(new java.io.BufferedOutputStream(socket.getOutputStream))
    val nonce = new Array[Byte](16)
    java.util.concurrent.ThreadLocalRandom.current().nextBytes(nonce)
    val key = Base64.getEncoder.encodeToString(nonce)
    val req = s"GET $path HTTP/1.1\r\nHost: $host:$port\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n"
    out.write(req.getBytes(UTF_8)); out.flush()
    // read status + headers up to the blank line
    val headers = mutable.ArrayBuffer.empty[String]
    var line = readLine()
    while (line != null && line.nonEmpty) { headers += line; line = readLine() }
    val status = headers.headOption.getOrElse("")
    if (!status.contains(" 101 "))
      throw new java.io.IOException(s"websocket handshake rejected: '$status'")
    val accept = headers.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-accept:") =>
        h.substring(h.indexOf(':') + 1).trim
    }
    if (!accept.contains(WsCodec.acceptKey(key)))
      throw new java.io.IOException(s"websocket accept-key mismatch: $accept")
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    if (c < 0 && sb.isEmpty) null else sb.toString
  }

  /** Message loop until close/EOF. Runs on the caller's thread. */
  def loop(): Unit = {
    var pendingOp = -1
    val pending = new java.io.ByteArrayOutputStream()
    // the per-frame cap alone doesn't bound a fragmented message — an
    // endless fin=0 continuation stream would grow `pending` without limit
    // on the driver; apply the same aggregate cap and treat excess as a
    // protocol violation (close, like any other malformed peer)
    def boundedWrite(b: Array[Byte]): Boolean = {
      if (pending.size.toLong + b.length > WsCodec.MaxFrameBytes) false
      else { pending.write(b); true }
    }
    try {
      var frame = WsCodec.readFrame(in)
      while (frame != null) {
        frame.opcode match {
          case WsCodec.OpText | WsCodec.OpBinary =>
            if (frame.fin) deliver(frame.opcode, frame.payload)
            else { pendingOp = frame.opcode; pending.reset()
              if (!boundedWrite(frame.payload)) return }
          case WsCodec.OpCont =>
            if (!boundedWrite(frame.payload)) return
            if (frame.fin && pendingOp >= 0) {
              deliver(pendingOp, pending.toByteArray); pendingOp = -1
            }
          case WsCodec.OpPing => send(WsCodec.OpPong, frame.payload)
          case WsCodec.OpPong => () // unsolicited pong: ignore (RFC 6455 §5.5.3)
          case WsCodec.OpClose =>
            try send(WsCodec.OpClose, frame.payload) catch { case _: Exception => () }
            return
          case _ => () // reserved opcode: skip
        }
        frame = WsCodec.readFrame(in)
      }
    } catch {
      case _: EOFException => ()
      case _: java.net.SocketException => () // closed under us: clean stop
    }
  }

  private def deliver(opcode: Int, payload: Array[Byte]): Unit =
    if (opcode == WsCodec.OpText) onText(new String(payload, UTF_8))
    // binary messages are out of scope for the text-line mapper surface

  def send(opcode: Int, payload: Array[Byte]): Unit = synchronized {
    out.write(WsCodec.encodeFrame(opcode, payload, mask = true)); out.flush()
  }

  def sendText(s: String): Unit = send(WsCodec.OpText, s.getBytes(UTF_8))

  def close(): Unit = {
    try send(WsCodec.OpClose, Array.emptyByteArray) catch { case _: Exception => () }
    try if (socket != null) socket.close() catch { case _: Exception => () }
  }
}

/** DataSource V2 streaming source: `spark.readStream.format(classOf[
  * WebSocketSourceProvider].getName).option("host", …).option("port", …)`.
  * Schema is the text-transport wire shape (`value STRING`) — the
  * declarative line mappers (json/csv) take over from there, exactly as
  * with the socket source.
  */
class WebSocketSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebSocketSourceProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val host = Option(opts.get("host")).getOrElse(
      throw new IllegalArgumentException("websocket source needs a 'host' option"))
    val port = Option(opts.get("port")).map(_.toInt).getOrElse(
      throw new IllegalArgumentException("websocket source needs a 'port' option"))
    val path = Option(opts.get("path")).getOrElse("/")
    new WsTable(host, port, path, BufferPolicy.fromOptions(opts),
      WebSocketSourceProvider.tlsOf(opts))
  }
}

object WebSocketSourceProvider {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** ('tls', 'tls.truststore', 'tls.truststore.password') → (tls?, store).
    * A truststore option without 'tls'='true' is a config mistake —
    * rejected rather than silently running plaintext.
    */
  private[sources] def tlsOf(opts: CaseInsensitiveStringMap)
      : (Boolean, Option[(String, String)]) = {
    val tls = Option(opts.get("tls")).exists(_.trim.equalsIgnoreCase("true"))
    val store = Option(opts.get("tls.truststore")).map(p =>
      p -> Option(opts.get("tls.truststore.password")).getOrElse(""))
    if (store.isDefined && !tls)
      throw new IllegalArgumentException(
        "'tls.truststore' is set but 'tls' is not 'true' — refusing to " +
          "run plaintext with TLS material configured")
    (tls, store)
  }
}

private[sources] class WsTable(host: String, port: Int, path: String,
                               bufPolicy: BufferPolicy,
                               tls: (Boolean, Option[(String, String)]) =
                                 (false, None))
  extends Table with SupportsRead {
  override def name(): String =
    s"${if (tls._1) "websocket+tls" else "websocket"}:$host:$port$path"
  override def schema(): StructType = WebSocketSourceProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WebSocketSourceProvider.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new WsMicroBatchStream(host, port, path, bufPolicy, tls)
      }
    }
}

private[sources] case class WsOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Driver-buffer backpressure policy for the buffered transports — the
  * reference's junction Drop/Block strategies (event_pipeline.rs:23-72)
  * re-expressed for the micro-batch buffer: `maxBuffered` caps messages
  * held between micro-batches; on overflow `drop` discards the incoming
  * message (counted, surfaced), `block` parks the reader thread until a
  * commit trims the buffer — which stops reading the socket, so TCP flow
  * control pushes back on the producer. Without a cap a producer that
  * outpaces the trigger grows driver memory until OOM — silently.
  */
private[sources] final case class BufferPolicy(maxBuffered: Int, overflow: String) {
  require(maxBuffered >= 1, s"max.buffered must be >= 1, got $maxBuffered")
  require(overflow == "drop" || overflow == "block",
    s"overflow must be 'drop' or 'block', got '$overflow'")
}

private[sources] object BufferPolicy {
  /** Default: block at 1M buffered messages — lossless backpressure sized
    * for the low-volume control feeds these transports are scoped to. */
  val Default: BufferPolicy = BufferPolicy(1000000, "block")
  def fromOptions(opts: CaseInsensitiveStringMap): BufferPolicy =
    BufferPolicy(
      Option(opts.get("max.buffered")).map(_.trim.toInt)
        .getOrElse(Default.maxBuffered),
      Option(opts.get("overflow")).map(_.trim.toLowerCase)
        .getOrElse(Default.overflow))
}

/** Driver-side buffered micro-batch stream (the socket-source architecture,
  * shared by the WebSocket and AMQP transports): `open` starts the
  * transport delivering complete text messages into the buffer;
  * `latestOffset` exposes the high-water mark, each batch slices
  * [start, end), `commit` trims everything below the committed offset.
  */
private[sources] abstract class DriverBufferedTextStream extends MicroBatchStream {

  /** Connect the transport; every complete message calls `onText`, and the
    * reader thread reports its exit through `onDeath` (a transport dying
    * mid-query must FAIL the query loudly, not stall it silently).
    * Returns the handle `stop()` closes.
    */
  protected def open(onText: String => Unit, onDeath: String => Unit): AutoCloseable

  /** Overflow behavior when the producer outpaces the trigger. */
  protected def policy: BufferPolicy = BufferPolicy.Default

  private val lock = new Object
  private var base = 0L
  private val buf = mutable.ArrayBuffer.empty[String]
  private var droppedTotal = 0L
  @volatile private var handle: AutoCloseable = _
  @volatile private var started = false
  @volatile private var stopped = false
  @volatile private var deadCause: String = _
  @volatile private var warnedGap = false

  /** Messages discarded by the `drop` overflow policy so far (also logged
    * on the first drop and every 10,000th). */
  def droppedCount: Long = lock.synchronized(droppedTotal)

  /** Enqueue one message under the policy. Runs on the reader thread, so
    * `block` parks the TRANSPORT — the socket stops being read and TCP
    * receive-window backpressure reaches the producer, the same effect as
    * the reference's Block junction strategy.
    */
  private def enqueue(s: String): Unit = lock.synchronized {
    if (buf.size >= policy.maxBuffered) {
      if (policy.overflow == "drop") {
        droppedTotal += 1
        if (droppedTotal == 1L || droppedTotal % 10000 == 0)
          System.err.println(
            s"[graft] WARNING: driver buffer full (${policy.maxBuffered}); " +
              s"dropped $droppedTotal message(s) so far (overflow='drop')")
        return
      }
      while (buf.size >= policy.maxBuffered && !stopped) lock.wait()
      if (stopped) return
    }
    buf += s
  }

  private def ensureStarted(): Unit = lock.synchronized {
    if (!started) {
      started = true
      handle = open(enqueue, cause => if (!stopped) deadCause = cause)
    }
  }

  override def initialOffset(): Offset = { ensureStarted(); WsOffset(0L) }
  override def latestOffset(): Offset = {
    ensureStarted()
    if (deadCause != null)
      throw new java.io.IOException(
        s"streaming transport died: $deadCause — this transport does not " +
          "replay; restart the query (fresh checkpoint) to reconnect")
    lock.synchronized { WsOffset(base + buf.size) }
  }
  override def deserializeOffset(json: String): Offset = WsOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WsOffset].n
    val e = end.asInstanceOf[WsOffset].n
    val rows = lock.synchronized {
      if (s > base + buf.size && !warnedGap) {
        warnedGap = true
        // a checkpointed restart: the committed offset is ahead of anything
        // this fresh connection has seen — like Spark's own socket source,
        // these transports cannot replay; say so instead of silently
        // swallowing the first (start - seen) messages
        System.err.println(
          s"[graft] WARNING: stream restarted from checkpointed offset $s " +
            "but this transport does not replay — messages before that " +
            "offset are lost and the next messages will be skipped until " +
            s"the count catches up; restart from a fresh checkpoint")
      }
      val from = math.max(0L, s - base).toInt
      val until = math.max(0L, math.min(buf.size.toLong, e - base)).toInt
      buf.slice(from, until).toArray
    }
    Array(WsInputPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory = new WsReaderFactory

  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[WsOffset].n
    val drop = math.max(0L, math.min(buf.size.toLong, e - base)).toInt
    buf.remove(0, drop)
    base += drop
    lock.notifyAll() // wake a reader parked by the `block` overflow policy
  }

  override def stop(): Unit = {
    lock.synchronized { stopped = true; lock.notifyAll() }
    if (handle != null) handle.close()
  }
}

private[sources] class WsMicroBatchStream(host: String, port: Int, path: String,
                                          bufPolicy: BufferPolicy = BufferPolicy.Default,
                                          tls: (Boolean, Option[(String, String)]) =
                                            (false, None))
  extends DriverBufferedTextStream {
  override protected def policy: BufferPolicy = bufPolicy
  protected def open(onText: String => Unit, onDeath: String => Unit): AutoCloseable = {
    val client = new WebSocketClient(host, port, path, onText, tls._1, tls._2)
    client.connect()
    val t = new Thread(() => {
      try { client.loop(); onDeath("connection closed by peer") }
      catch { case e: Throwable => onDeath(e.toString) }
    }, s"ws-reader-$host:$port")
    t.setDaemon(true)
    t.start()
    () => client.close()
  }
}

private[sources] case class WsInputPartition(rows: Array[String]) extends InputPartition

private[sources] class WsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[WsInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(rows(i)))
      override def close(): Unit = ()
    }
  }
}

/** WebSocket SINK half: one client connection per partition per epoch, each
  * row's single string column sent as a text frame (client-masked per the
  * RFC). Pair with the sink mappers (json template / to_json / csv) which
  * already reduce rows to one `value` column.
  */
class WebSocketForeachWriter(host: String, port: Int, path: String = "/",
                             tls: Boolean = false,
                             trustStore: Option[(String, String)] = None)
  extends ForeachWriter[Row] {
  @transient private var client: WebSocketClient = _
  override def open(partitionId: Long, epochId: Long): Boolean = {
    client = new WebSocketClient(host, port, path, _ => (), tls, trustStore)
    client.connect()
    // a write-side connection still has RFC obligations: run the message
    // loop on a daemon thread so server pings are answered (unanswered
    // keepalives get long-lived sink connections dropped mid-epoch) and
    // inbound frames never back up the receive buffer
    val c = client
    val t = new Thread(() => c.loop(), s"ws-sink-reader-$host:$port")
    t.setDaemon(true)
    t.start()
    true
  }
  override def process(row: Row): Unit =
    client.sendText(String.valueOf(row.get(0)))
  override def close(errorOrNull: Throwable): Unit =
    if (client != null) client.close()
}
