package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{ForeachWriter, Row}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** AMQP 0-9-1 wire protocol, pure JVM — the real transport half of the
  * reference's rabbitmq source/sink (rabbitmq_source.rs:1-1150,
  * rabbitmq_sink.rs): protocol header, the frame grammar (METHOD / HEADER
  * / BODY / HEARTBEAT, big-endian, 0xCE frame-end), the connection
  * negotiation (start/start-ok with PLAIN auth, tune/tune-ok, open),
  * channel open, queue.declare, basic.consume (no-ack) → basic.deliver
  * reassembly (method + content header + body frames), and basic.publish.
  * No client library — `java.net.Socket` only. Broker features beyond the
  * core (confirms, TLS, exchange topologies) stay environment concerns,
  * as in the reference.
  *
  * Spark side mirrors the WebSocket transport: a DataSource-V2
  * micro-batch SOURCE (driver-buffered text messages → `value STRING`,
  * the declarative line mappers take over) and a `ForeachWriter` SINK
  * publishing one message per row.
  */
object AmqpCodec {

  val FrameMethod = 1; val FrameHeader = 2; val FrameBody = 3
  val FrameHeartbeat = 8
  val FrameEnd = 0xCE
  val MaxFrameBytes: Long = 16L << 20

  /** The AMQP 0-9-1 protocol header octets. */
  val ProtocolHeader: Array[Byte] =
    "AMQP".getBytes(UTF_8) ++ Array[Byte](0, 0, 9, 1)

  final case class Frame(ftype: Int, channel: Int, payload: Array[Byte])

  def writeFrame(out: DataOutputStream, ftype: Int, channel: Int,
                 payload: Array[Byte]): Unit = {
    out.writeByte(ftype)
    out.writeShort(channel)
    out.writeInt(payload.length)
    out.write(payload)
    out.writeByte(FrameEnd)
    out.flush()
  }

  def readFrame(in: DataInputStream): Frame = {
    val t = in.read()
    if (t < 0) return null
    val channel = in.readUnsignedShort()
    val size = in.readInt()
    if (size < 0 || size > MaxFrameBytes)
      throw new java.io.IOException(s"amqp frame size $size exceeds cap")
    val payload = new Array[Byte](size)
    in.readFully(payload)
    if (in.readUnsignedByte() != FrameEnd)
      throw new java.io.IOException("amqp frame missing 0xCE end octet")
    Frame(t, channel, payload)
  }

  /** Big-endian argument writer for method/header payloads. */
  final class Args {
    private val bos = new java.io.ByteArrayOutputStream()
    private val out = new DataOutputStream(bos)
    def u8(v: Int): Args = { out.writeByte(v); this }
    def u16(v: Int): Args = { out.writeShort(v); this }
    def u32(v: Int): Args = { out.writeInt(v); this }
    def u64(v: Long): Args = { out.writeLong(v); this }
    def shortstr(s: String): Args = {
      val b = s.getBytes(UTF_8)
      require(b.length <= 255, "shortstr overflow")
      out.writeByte(b.length); out.write(b); this
    }
    def longstr(b: Array[Byte]): Args = { out.writeInt(b.length); out.write(b); this }
    def emptyTable(): Args = { out.writeInt(0); this }
    def bytes: Array[Byte] = { out.flush(); bos.toByteArray }
  }

  /** Big-endian argument reader; skips field tables structurally. */
  final class Reader(payload: Array[Byte]) {
    private val in = new DataInputStream(new java.io.ByteArrayInputStream(payload))
    def u8(): Int = in.readUnsignedByte()
    def u16(): Int = in.readUnsignedShort()
    def u32(): Int = in.readInt()
    def u64(): Long = in.readLong()
    def shortstr(): String = {
      val n = in.readUnsignedByte()
      val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
    }
    def longstr(): Array[Byte] = {
      val n = in.readInt()
      if (n < 0 || n > MaxFrameBytes) throw new java.io.IOException("longstr overflow")
      val b = new Array[Byte](n); in.readFully(b); b
    }
    def skipTable(): Unit = {
      val n = in.readInt()
      if (n < 0) throw new java.io.IOException("field table overflow")
      in.skipBytes(n)
    }
  }

  def method(classId: Int, methodId: Int, args: Args = new Args): Array[Byte] =
    new Args().u16(classId).u16(methodId).bytes ++ args.bytes

  /** Content HEADER frame payload for class 60 (basic): no properties. */
  def contentHeader(bodySize: Long): Array[Byte] =
    new Args().u16(60).u16(0).u64(bodySize).u16(0).bytes
}

/** Blocking AMQP 0-9-1 client: negotiate connection + channel 1, then
  * declare/consume/publish. Consume uses no-ack delivery (the transport
  * role — at-least-once ack flows are broker-policy concerns).
  */
final class AmqpClient(host: String, port: Int, vhost: String = "/",
                       user: String = "guest", pass: String = "guest",
                       tls: Boolean = false,
                       trustStore: Option[(String, String)] = None) {
  import AmqpCodec._

  @volatile private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _
  // negotiated in tune; 0 from the server means "no limit" → keep default
  private var frameMax: Int = 131072

  private def expectMethod(classId: Int, methodId: Int): Reader = {
    var f = readFrame(in)
    while (f != null && f.ftype == FrameHeartbeat) f = readFrame(in)
    if (f == null || f.ftype != FrameMethod)
      throw new java.io.IOException(s"amqp: expected method $classId.$methodId, got ${if (f == null) "EOF" else s"frame type ${f.ftype}"}")
    val r = new Reader(f.payload)
    val (c, m) = (r.u16(), r.u16())
    if (c != classId || m != methodId)
      throw new java.io.IOException(s"amqp: expected method $classId.$methodId, got $c.$m")
    r
  }

  def connect(): Unit = {
    // amqps:// = the identical AMQP conversation over a JSSE socket with
    // hostname verification (WsTls — shared with the wss:// transport)
    socket = if (tls) WsTls.socket(host, port, trustStore)
             else new Socket(host, port)
    socket.setTcpNoDelay(true)
    in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream))
    out = new DataOutputStream(new java.io.BufferedOutputStream(socket.getOutputStream))
    out.write(ProtocolHeader); out.flush()
    // connection.start: skip server-properties table, read mechanisms/locales
    val start = expectMethod(10, 10)
    start.u8(); start.u8() // version major/minor
    start.skipTable()
    start.longstr(); start.longstr()
    // start-ok: empty client-properties, PLAIN auth, en_US
    val plain = ("\u0000" + user + "\u0000" + pass).getBytes(UTF_8) // SASL PLAIN: NUL user NUL pass
    writeFrame(out, FrameMethod, 0, method(10, 11,
      new Args().emptyTable().shortstr("PLAIN").longstr(plain).shortstr("en_US")))
    // tune / tune-ok (echo; heartbeat 0 = disabled)
    val tune = expectMethod(10, 30)
    val chMax = tune.u16(); val frMax = tune.u32()
    if (frMax > 0) frameMax = frMax // 0 = server imposes no limit
    writeFrame(out, FrameMethod, 0, method(10, 31,
      new Args().u16(chMax).u32(frMax).u16(0)))
    // connection.open / open-ok
    writeFrame(out, FrameMethod, 0, method(10, 40,
      new Args().shortstr(vhost).shortstr("").u8(0)))
    expectMethod(10, 41)
    // channel.open / open-ok on channel 1
    writeFrame(out, FrameMethod, 1, method(20, 10, new Args().shortstr("")))
    expectMethod(20, 11)
  }

  def declareQueue(queue: String): Unit = {
    writeFrame(out, FrameMethod, 1, method(50, 10,
      new Args().u16(0).shortstr(queue).u8(0).emptyTable()))
    expectMethod(50, 11) // declare-ok: queue, message-count, consumer-count
  }

  /** basic.consume with no-ack, then the delivery loop on the caller's
    * thread: each basic.deliver's content (header + body frames, possibly
    * split) is reassembled and handed to `onMessage`.
    */
  def consume(queue: String, onMessage: Array[Byte] => Unit): Unit = {
    writeFrame(out, FrameMethod, 1, method(60, 20,
      new Args().u16(0).shortstr(queue).shortstr("").u8(0x02).emptyTable()))
    expectMethod(60, 21) // consume-ok
    try {
      var f = readFrame(in)
      while (f != null) {
        if (f.ftype == FrameMethod) {
          val r = new Reader(f.payload)
          val (c, m) = (r.u16(), r.u16())
          if (c == 60 && m == 60) { // basic.deliver
            r.shortstr(); r.u64(); r.u8(); r.shortstr(); r.shortstr()
            val header = readFrame(in)
            if (header == null || header.ftype != FrameHeader)
              throw new java.io.IOException("amqp: deliver without content header")
            val hr = new Reader(header.payload)
            hr.u16(); hr.u16() // class, weight
            val bodySize = hr.u64()
            if (bodySize > MaxFrameBytes)
              throw new java.io.IOException("amqp: content size exceeds cap")
            val body = new java.io.ByteArrayOutputStream(bodySize.toInt)
            while (body.size < bodySize) {
              val bf = readFrame(in)
              if (bf == null || bf.ftype != FrameBody)
                throw new java.io.IOException("amqp: truncated content body")
              body.write(bf.payload)
            }
            onMessage(body.toByteArray)
          } else if (c == 10 && m == 50) { // connection.close from server
            writeFrame(out, FrameMethod, 0, method(10, 51))
            return
          }
        } // heartbeats and other frames: ignore
        f = readFrame(in)
      }
    } catch {
      case _: java.io.EOFException => ()
      case _: java.net.SocketException => () // closed under us: clean stop
    }
  }

  def publish(queue: String, body: Array[Byte]): Unit = synchronized {
    writeFrame(out, FrameMethod, 1, method(60, 40,
      new Args().u16(0).shortstr("").shortstr(queue).u8(0)))
    writeFrame(out, FrameHeader, 1, contentHeader(body.length))
    // bodies must be split into frames within the NEGOTIATED frame-max
    // (spec 4.2.6: frame = 7-byte header + payload + end octet; one
    // oversized BODY frame is a FRAME_ERROR that kills the connection)
    val chunk = math.max(1, frameMax - 8)
    var off = 0
    while (off < body.length) {
      val n = math.min(chunk, body.length - off)
      writeFrame(out, FrameBody, 1, java.util.Arrays.copyOfRange(body, off, off + n))
      off += n
    }
    if (body.isEmpty) () // zero-length content: header frame alone suffices
  }

  def close(): Unit = {
    try {
      writeFrame(out, FrameMethod, 0, method(10, 50,
        new Args().u16(200).shortstr("OK").u16(0).u16(0)))
    } catch { case _: Exception => () }
    try if (socket != null) socket.close() catch { case _: Exception => () }
  }
}

/** DataSource V2 streaming source: AMQP queue consumer → `value STRING`
  * rows (message bodies decoded as UTF-8 text — the line-mapper wire
  * shape, as with socket/websocket).
  */
class AmqpSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebSocketSourceProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    def req(k: String): String = Option(opts.get(k)).getOrElse(
      throw new IllegalArgumentException(s"amqp source needs a '$k' option"))
    new AmqpTable(req("host"), req("port").toInt, req("queue"),
      Option(opts.get("vhost")).getOrElse("/"),
      Option(opts.get("user")).getOrElse("guest"),
      Option(opts.get("pass")).getOrElse("guest"),
      BufferPolicy.fromOptions(opts),
      WebSocketSourceProvider.tlsOf(opts))
  }
}

private[sources] class AmqpTable(host: String, port: Int, queue: String,
                                 vhost: String, user: String, pass: String,
                                 bufPolicy: BufferPolicy,
                                 tls: (Boolean, Option[(String, String)]) =
                                   (false, None))
  extends Table with SupportsRead {
  override def name(): String = s"amqp:$host:$port/$queue"
  override def schema(): StructType = WebSocketSourceProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = WebSocketSourceProvider.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new AmqpMicroBatchStream(host, port, queue, vhost, user, pass,
            bufPolicy, tls)
      }
    }
}

private[sources] class AmqpMicroBatchStream(host: String, port: Int, queue: String,
                                            vhost: String, user: String, pass: String,
                                            bufPolicy: BufferPolicy = BufferPolicy.Default,
                                            tls: (Boolean, Option[(String, String)]) =
                                              (false, None))
  extends DriverBufferedTextStream {
  override protected def policy: BufferPolicy = bufPolicy
  protected def open(onText: String => Unit, onDeath: String => Unit): AutoCloseable = {
    val client = new AmqpClient(host, port, vhost, user, pass, tls._1, tls._2)
    client.connect()
    client.declareQueue(queue)
    val t = new Thread(() => {
      try {
        client.consume(queue, b => onText(new String(b, UTF_8)))
        onDeath("connection closed by broker")
      } catch { case e: Throwable => onDeath(e.toString) }
    }, s"amqp-consumer-$host:$port/$queue")
    t.setDaemon(true)
    t.start()
    () => client.close()
  }
}

/** AMQP SINK half: one connection per partition per epoch; each row's
  * single string column publishes to `queue` via the default exchange.
  */
class AmqpForeachWriter(host: String, port: Int, queue: String,
                        vhost: String = "/", user: String = "guest",
                        pass: String = "guest", tls: Boolean = false,
                        trustStore: Option[(String, String)] = None)
  extends ForeachWriter[Row] {
  @transient private var client: AmqpClient = _
  override def open(partitionId: Long, epochId: Long): Boolean = {
    client = new AmqpClient(host, port, vhost, user, pass, tls, trustStore)
    client.connect()
    client.declareQueue(queue)
    true
  }
  override def process(row: Row): Unit =
    client.publish(queue, String.valueOf(row.get(0)).getBytes(UTF_8))
  override def close(errorOrNull: Throwable): Unit =
    if (client != null) client.close()
}
