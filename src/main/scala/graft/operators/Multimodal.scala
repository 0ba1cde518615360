package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct. The Spark-side contract —
  * schema, per-partition decoder lifecycle, batch shape, partition sizing —
  * is real; the actual codec is stubbed (no media libraries in this
  * environment) behind [[MediaDecoder]], deterministic so tests are stable.
  *
  * Scale notes: blobs dominate row width, so (a) payloads are decoded
  * per-partition with one decoder instance (codec init is expensive),
  * (b) `maxPartitionBytes` governs blob-scan parallelism, not row count,
  * (c) derived metadata is written to its own narrow table so downstream
  * analytics never re-scan the blobs.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, nFrames: Int, format: String)

  /** Decoder contract: one instance per partition, `decode` per payload.
    * A production build plugs a real codec here (`???` marks the seam).
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(payload: Array[Byte]): MediaMeta
    def close(): Unit = ()
  }

  /** Real decoder seam — intentionally unimplemented in this environment. */
  object NativeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = ???
  }

  /** Deterministic fake decoder: derives plausible metadata from a stable
    * hash of the payload bytes. Keeps the full pipeline testable.
    */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      val h = graft.functions.TextHash.hash64(payload)
      val width = 160 + (Math.floorMod(h, 8L).toInt * 160)
      val height = 120 + (Math.floorMod(h >>> 8, 8L).toInt * 120)
      val frames = 1 + Math.floorMod(h >>> 16, 240L).toInt
      val fmt = Seq("jpeg", "png", "webm", "wav")(Math.floorMod(h >>> 24, 4L).toInt)
      MediaMeta(width, height, frames, fmt)
    }
  }

  /** Attach decoded metadata columns to a DataFrame holding `binCol`.
    * mapPartitions so the decoder opens once per partition (codec init
    * amortized over the batch) — the Scala analog of a batched decode UDF.
    */
  def withMediaMeta(df: DataFrame, binCol: String,
                    decoder: MediaDecoder = StubDecoder): DataFrame = {
    val outSchema = df.schema
      .add("width", IntegerType).add("height", IntegerType)
      .add("n_frames", IntegerType).add("format", StringType)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      decoder.open()
      it.map { r =>
        val meta = decoder.decode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq ++ Seq(meta.width, meta.height, meta.nFrames, meta.format))
      } ++ { decoder.close(); Iterator.empty } // close after exhaustion (++ is lazy)
    }(Encoders.row(outSchema))
  }
}
