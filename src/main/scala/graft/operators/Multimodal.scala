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

  /** Pure-JVM container-header codec: parses PNG / JPEG / GIF / BMP / WAV
    * headers from the raw bytes — real dimension/frame extraction with no
    * native media libraries. Full pixel decode (the part that genuinely
    * needs libjpeg/ffmpeg) stays behind [[FrameDecoder]]; header metadata is
    * what the curation pipeline actually filters on (resolution gates,
    * aspect-ratio gates, duration gates), so this is the production-shaped
    * fast path: no decompression, O(header) bytes touched per blob.
    */
  object HeaderDecoder extends MediaDecoder {
    private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xFF
    private def be16(p: Array[Byte], i: Int): Int = (u8(p, i) << 8) | u8(p, i + 1)
    private def be32(p: Array[Byte], i: Int): Int =
      (u8(p, i) << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
    private def le16(p: Array[Byte], i: Int): Int = u8(p, i) | (u8(p, i + 1) << 8)
    private def le32(p: Array[Byte], i: Int): Int =
      u8(p, i) | (u8(p, i + 1) << 8) | (u8(p, i + 2) << 16) | (u8(p, i + 3) << 24)
    private def ascii(p: Array[Byte], i: Int, s: String): Boolean =
      p.length >= i + s.length && s.indices.forall(k => u8(p, i + k) == s.charAt(k))

    private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

    def decode(p: Array[Byte]): MediaMeta = {
      if (p.length >= 24 && PngSig.indices.forall(i => u8(p, i) == PngSig(i)) &&
          ascii(p, 12, "IHDR"))
        MediaMeta(be32(p, 16), be32(p, 20), 1, "png")
      else if (p.length >= 4 && u8(p, 0) == 0xFF && u8(p, 1) == 0xD8)
        decodeJpeg(p)
      else if (ascii(p, 0, "GIF87a") || ascii(p, 0, "GIF89a"))
        MediaMeta(le16(p, 6), le16(p, 8), 1, "gif")
      else if (ascii(p, 0, "BM") && p.length >= 26)
        MediaMeta(le32(p, 18), le32(p, 22), 1, "bmp")
      else if (ascii(p, 0, "RIFF") && ascii(p, 8, "WAVE"))
        decodeWav(p)
      else MediaMeta(0, 0, 0, "unknown")
    }

    /** Walk JPEG marker segments to the first SOF frame header (C0–CF minus
      * the non-frame C4/C8/CC) — height/width live at fixed offsets in it.
      */
    private def decodeJpeg(p: Array[Byte]): MediaMeta = {
      var i = 2
      while (i + 3 < p.length && u8(p, i) == 0xFF) {
        val m = u8(p, i + 1)
        if (m == 0xFF) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2 // standalone
        else {
          val segLen = be16(p, i + 2)
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            if (i + 8 < p.length)
              return MediaMeta(be16(p, i + 7), be16(p, i + 5), 1, "jpeg")
            else return MediaMeta(0, 0, 0, "unknown")
          }
          i += 2 + segLen
        }
      }
      MediaMeta(0, 0, 0, "unknown")
    }

    /** Walk RIFF chunks for fmt (block align) and data (payload size);
      * frame count = data bytes / block align.
      */
    private def decodeWav(p: Array[Byte]): MediaMeta = {
      var i = 12
      var blockAlign = 0
      var dataSize = -1
      while (i + 8 <= p.length) {
        val size = le32(p, i + 4)
        if (ascii(p, i, "fmt ") && i + 8 + 14 <= p.length)
          blockAlign = le16(p, i + 8 + 12)
        if (ascii(p, i, "data")) dataSize = size
        i += 8 + size + (size & 1) // chunks are 2-byte aligned
      }
      if (blockAlign > 0 && dataSize >= 0)
        MediaMeta(0, 0, dataSize / blockAlign, "wav")
      else MediaMeta(0, 0, 0, "unknown")
    }
  }

  /** Pixel/frame decode seam — the one stage that genuinely needs a native
    * codec library (absent in this environment). Header metadata does NOT
    * go through this: [[HeaderDecoder]] is real.
    */
  object FrameDecoder extends MediaDecoder {
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

  /** Frame-sampling plumbing: one row per sampled frame index — every
    * `every`-th frame of each media row with frames (video/audio), the
    * standard decimation step before per-frame feature extraction. Pure
    * generator projection (explode of a sequence), no UDF: the downstream
    * per-frame decode joins back to the blob by (id, frame_idx).
    */
  def frameSample(df: DataFrame, nFramesCol: String, every: Int): DataFrame = {
    require(every > 0, s"every must be positive, got $every")
    df.filter(col(nFramesCol) > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col(nFramesCol).cast("long") - 1, lit(every.toLong))))
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
