package graft.sources

import java.io.IOException

/** Pure-JVM Zstandard (RFC 8878) for the Kafka wire path — closes the last
  * codec gap (record-batch attributes codec 4), so the source reads topics
  * produced with zstd and the sink can produce them, with no external jars
  * (the same contract as the snappy/lz4 encoders in [[KafkaCompress]]).
  *
  * Decode side is the FULL format: frame/block layering, Raw/RLE/Compressed
  * blocks, all four literals block types (Raw, RLE, Huffman-compressed with
  * direct or FSE-compressed weights, Treeless repeats), 1- and 4-stream
  * literals, sequences under all four symbol-compression modes (Predefined,
  * RLE, FSE_Compressed, Repeat), the three-slot repeat-offset machine with
  * the literals_length==0 substitutions, multi-block history, multi-frame
  * concatenation, skippable frames, and the xxHash64-low-32 content
  * checksum. Every declared size is bounded by [[KafkaCompress.MaxOut]] —
  * a corrupt length cannot OOM an executor (same bomb guard as the other
  * codecs).
  *
  * Encode side ([[Zstd.compress]]) emits real LZ77 compression in the
  * format's simplest fully-standard profile: raw literals plus sequences
  * under the PREDEFINED FSE distributions (RFC 8878 §3.1.1.3.2.2) — the
  * greedy hash-table matcher of the sibling encoders, framed per spec with
  * the frame content size and content checksum. Incompressible input
  * degrades to Raw blocks. Output is validated against the reference zstd
  * CLI in ZstdSpec (round-trip both directions) plus pinned golden frames.
  *
  * Reference: RFC 8878 (Zstandard Compression and the 'application/zstd'
  * Media Type) — all table constants below are transcribed from it.
  */
object Zstd {

  private def fail(msg: String): Nothing = throw new IOException(s"zstd: $msg")

  private def checked(n: Long, what: String): Int = {
    if (n < 0 || n > KafkaCompress.MaxOut)
      fail(s"$what $n outside [0, ${KafkaCompress.MaxOut}]")
    n.toInt
  }

  // ------------------------------------------------------------- xxHash64
  /** xxHash64 (Collet's public spec) — the frame content checksum is its
    * low 32 bits (seed 0).
    */
  object XxHash64 {
    private final val P1 = 0x9E3779B185EBCA87L
    private final val P2 = 0xC2B2AE3D27D4EB4FL
    private final val P3 = 0x165667B19E3779F9L
    private final val P4 = 0x85EBCA77C2B2AE63L
    private final val P5 = 0x27D4EB2F165667C5L

    def hash(d: Array[Byte], off: Int, len: Int, seed: Long): Long = {
      def le64(i: Int): Long = {
        var v = 0L; var k = 7
        while (k >= 0) { v = (v << 8) | (d(i + k) & 0xFFL); k -= 1 }
        v
      }
      def le32(i: Int): Long =
        (d(i) & 0xFFL) | ((d(i + 1) & 0xFFL) << 8) |
          ((d(i + 2) & 0xFFL) << 16) | ((d(i + 3) & 0xFFL) << 24)
      def round(acc: Long, in: Long): Long =
        java.lang.Long.rotateLeft(acc + in * P2, 31) * P1
      def merge(acc0: Long, v: Long): Long =
        (acc0 ^ round(0L, v)) * P1 + P4
      var i = off
      val end = off + len
      var h =
        if (len >= 32) {
          var a1 = seed + P1 + P2; var a2 = seed + P2
          var a3 = seed; var a4 = seed - P1
          while (i <= end - 32) {
            a1 = round(a1, le64(i)); a2 = round(a2, le64(i + 8))
            a3 = round(a3, le64(i + 16)); a4 = round(a4, le64(i + 24))
            i += 32
          }
          var acc = java.lang.Long.rotateLeft(a1, 1) +
            java.lang.Long.rotateLeft(a2, 7) +
            java.lang.Long.rotateLeft(a3, 12) +
            java.lang.Long.rotateLeft(a4, 18)
          acc = merge(acc, a1); acc = merge(acc, a2)
          acc = merge(acc, a3); acc = merge(acc, a4)
          acc
        } else seed + P5
      h += len
      while (i <= end - 8) { h = java.lang.Long.rotateLeft(h ^ round(0L, le64(i)), 27) * P1 + P4; i += 8 }
      if (i <= end - 4) { h = java.lang.Long.rotateLeft(h ^ (le32(i) * P1), 23) * P2 + P3; i += 4 }
      while (i < end) { h = java.lang.Long.rotateLeft(h ^ ((d(i) & 0xFFL) * P5), 11) * P1; i += 1 }
      h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
      h
    }
  }

  // -------------------------------------------------- RFC 8878 code tables

  // Literals-length codes (§3.1.1.3.2.1.1): baseline + extra bits per code
  private val LlBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // Match-length codes (§3.1.1.3.2.1.1)
  private val MlBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // Predefined FSE distributions (§3.1.1.3.2.2); -1 = "less than one"
  private val LlDefault = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val LlDefaultLog = 6
  private val MlDefault = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val MlDefaultLog = 6
  private val OfDefault = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
  private val OfDefaultLog = 5

  private val MaxLlCode = 35
  private val MaxMlCode = 52
  private val MaxOfCode = 31 // table can hold up to 31; >28 valid only w/ big windows
  private val MaxLlLog = 9
  private val MaxMlLog = 9
  private val MaxOfLog = 8

  // -------------------------------------------------- backward bit reader

  /** The backward bitstream (§3.1.1.3.2.1.2 / FSE spec): written forward,
    * read from the LAST byte, whose highest set bit is a sentinel. Bits are
    * returned MSB-first relative to the write order's bit sequence.
    */
  private final class BackBits(d: Array[Byte], start: Int, len: Int) {
    if (len <= 0) fail("empty backward bitstream")
    private var bitsLeft: Int = {
      val last = d(start + len - 1) & 0xFF
      if (last == 0) fail("backward bitstream: missing sentinel bit")
      (len - 1) * 8 + (31 - Integer.numberOfLeadingZeros(last))
    }

    def remaining: Int = bitsLeft

    /** Read n bits (n <= 31): the n-bit little-endian field ending at the
      * current position, word-loaded in one pass. Reading PAST the start
      * returns zero bits — the spec's defined completion behavior for FSE
      * state reloads.
      */
    def read(n: Int): Int = {
      if (n == 0) return 0
      bitsLeft -= n
      val p = bitsLeft
      if (p >= 0) {
        val byteIdx = p >> 3
        val lim = math.min(6, len - byteIdx)
        var v = 0L
        var k = 0
        while (k < lim) { v |= (d(start + byteIdx + k) & 0xFFL) << (8 * k); k += 1 }
        ((v >>> (p & 7)) & ((1L << n) - 1)).toInt
      } else {
        // partial underflow: the low -p bits are zero-filled
        if (p + n <= 0) 0
        else {
          val have = p + n // real bits, at positions [0, have)
          var v = 0L
          val lim = math.min(6, len)
          var k = 0
          while (k < lim) { v |= (d(start + k) & 0xFFL) << (8 * k); k += 1 }
          ((v & ((1L << have) - 1)) << (n - have)).toInt
        }
      }
    }

    /** True when every real bit has been consumed exactly (stream end). */
    def exhausted: Boolean = bitsLeft <= 0
  }

  // ------------------------------------------------------- forward bit reader

  /** Forward LSB-first bit reader — FSE table descriptions (§4.1.1) are
    * written this way.
    */
  private final class FwdBits(d: Array[Byte], val startOff: Int, limit: Int) {
    private var bitPos = 0
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val idx = startOff + (bitPos >> 3)
        if (idx >= limit) fail("FSE table description overruns its section")
        v |= (((d(idx) >> (bitPos & 7)) & 1) << k)
        bitPos += 1
        k += 1
      }
      v
    }
    def peek(n: Int): Int = { val save = bitPos; val v = read(n); bitPos = save; v }
    def skip(n: Int): Unit = bitPos += n
    def bytesConsumed: Int = (bitPos + 7) >> 3
  }

  // --------------------------------------------------------------- FSE

  /** FSE decode table: per state cell — symbol, bits to reload, base of the
    * next state range.
    */
  private final class FseTable(val log: Int, val symbol: Array[Int],
                               val nbBits: Array[Int], val newState: Array[Int])

  /** Read a normalized-count table description (§4.1.1) and return the
    * counts plus the accuracy log; `fb` is positioned at the description.
    */
  private def readNCount(fb: FwdBits, maxSymbol: Int, maxLog: Int): (Array[Int], Int) = {
    val accuracyLog = fb.read(4) + 5
    if (accuracyLog > maxLog) fail(s"FSE accuracy log $accuracyLog > max $maxLog")
    val tableSize = 1 << accuracyLog
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = accuracyLog + 1
    val counts = new Array[Int](maxSymbol + 1)
    var symbol = 0
    var prevIsZero = false
    while (remaining > 1) {
      if (symbol > maxSymbol) fail("FSE counts exceed the symbol alphabet")
      if (prevIsZero) {
        // runs of zero-probability symbols: 2-bit repeat flags, 3 = continue
        var rep = fb.read(2)
        while (rep == 3) {
          symbol += 3
          if (symbol > maxSymbol + 1) fail("FSE zero-run past alphabet")
          rep = fb.read(2)
        }
        symbol += rep
        prevIsZero = false
      } else {
        val max = (threshold << 1) - 1 - remaining
        var count = fb.peek(nbBits)
        if ((count & (threshold - 1)) < max) {
          fb.skip(nbBits - 1)
          count &= threshold - 1
        } else {
          fb.skip(nbBits)
          count &= (threshold << 1) - 1
          if (count >= threshold) count -= max
        }
        count -= 1 // shifted representation: -1 = "less than one"
        remaining -= math.abs(count)
        counts(symbol) = count
        symbol += 1
        prevIsZero = count == 0
        while (remaining > 1 && remaining < threshold) {
          nbBits -= 1
          threshold >>= 1
        }
      }
    }
    if (remaining != 1) fail("FSE counts do not sum to the table size")
    (counts, accuracyLog)
  }

  /** Build the decode table from normalized counts (§4.1.1 spread). */
  private def buildFse(counts: Array[Int], log: Int): FseTable = {
    val size = 1 << log
    val symbolOf = new Array[Int](size)
    var highThreshold = size - 1
    // "less than one" symbols: one cell each at the table's end
    var s = 0
    while (s < counts.length) {
      if (counts(s) == -1) { symbolOf(highThreshold) = s; highThreshold -= 1 }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    var pos = 0
    s = 0
    while (s < counts.length) {
      var c = counts(s)
      while (c > 0) {
        symbolOf(pos) = s
        pos = (pos + step) & (size - 1)
        while (pos > highThreshold) pos = (pos + step) & (size - 1)
        c -= 1
      }
      s += 1
    }
    if (pos != 0) fail("FSE spread did not return to zero")
    // per-cell transitions: count occurrences seen so far per symbol
    val next = new Array[Int](counts.length)
    s = 0
    while (s < counts.length) {
      next(s) = if (counts(s) == -1) 1 else math.max(counts(s), 0)
      s += 1
    }
    val nbBits = new Array[Int](size)
    val newState = new Array[Int](size)
    var cell = 0
    while (cell < size) {
      val sym = symbolOf(cell)
      val n = next(sym); next(sym) = n + 1
      val bits = log - (31 - Integer.numberOfLeadingZeros(n))
      nbBits(cell) = bits
      newState(cell) = (n << bits) - size
      cell += 1
    }
    new FseTable(log, symbolOf, nbBits, newState)
  }

  /** A 1-cell table for RLE mode: every read yields the same symbol. */
  private def rleFse(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  private lazy val LlPredef = buildFse(LlDefault, LlDefaultLog)
  private lazy val MlPredef = buildFse(MlDefault, MlDefaultLog)
  private lazy val OfPredef = buildFse(OfDefault, OfDefaultLog)

  // ------------------------------------------------------------- Huffman

  /** Huffman literals decode table: direct lookup on `log` peeked bits. */
  private final class HufTable(val log: Int, val symbol: Array[Byte], val bits: Array[Int])

  /** Build the canonical table from weights (§4.2.1): weight w>0 means the
    * symbol's code has (maxBits + 1 - w) bits; lower weights fill first.
    */
  private def buildHuf(weights: Array[Int]): HufTable = {
    var total = 0L
    var w = 0
    while (w < weights.length) {
      if (weights(w) > 0) total += 1L << (weights(w) - 1)
      w += 1
    }
    if (total == 0) fail("huffman: no weighted symbols")
    // implicit last symbol completes the sum to the next power of two
    val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(total) // ceil log2 for next pow2
    val target = 1L << maxBits
    val rest = target - total
    // rest must itself be a power of two = the implicit symbol's 1<<(w-1)
    if (rest <= 0 || (rest & (rest - 1)) != 0) fail("huffman: weights do not complete a power of two")
    val lastWeight = java.lang.Long.numberOfTrailingZeros(rest).toInt + 1
    val all = weights :+ lastWeight
    val log = maxBits.toInt
    if (log > 11) fail(s"huffman: table log $log > 11")
    val size = 1 << log
    val symbol = new Array[Byte](size)
    val bits = new Array[Int](size)
    // fill by ascending weight, symbols in natural order within a weight
    var pos = 0
    var weight = 1
    while (weight <= log) {
      var sym = 0
      while (sym < all.length) {
        if (all(sym) == weight) {
          val nb = log + 1 - weight
          val span = 1 << (log - nb)
          var k = 0
          while (k < span) {
            symbol(pos) = sym.toByte; bits(pos) = nb; pos += 1; k += 1
          }
        }
        sym += 1
      }
      weight += 1
    }
    if (pos != size) fail("huffman: canonical fill incomplete")
    new HufTable(log, symbol, bits)
  }

  /** Parse a Huffman tree description (§4.2.1.1): either FSE-compressed
    * weights (header < 128) or direct 4-bit weights. Returns (table,
    * bytes consumed).
    */
  private def readHufTable(d: Array[Byte], off: Int, limit: Int): (HufTable, Int) = {
    if (off >= limit) fail("huffman: missing tree description")
    val header = d(off) & 0xFF
    if (header >= 128) {
      val nSymbols = header - 127
      val nBytes = (nSymbols + 1) / 2
      if (off + 1 + nBytes > limit) fail("huffman: direct weights overrun")
      val weights = new Array[Int](nSymbols)
      var i = 0
      while (i < nSymbols) {
        val b = d(off + 1 + (i >> 1)) & 0xFF
        weights(i) = if ((i & 1) == 0) b >> 4 else b & 0xF
        i += 1
      }
      (buildHuf(weights), 1 + nBytes)
    } else {
      // FSE-compressed weights: two interleaved states, accuracy log <= 6
      val compSize = header
      if (off + 1 + compSize > limit) fail("huffman: fse weights overrun")
      val fb = new FwdBits(d, off + 1, off + 1 + compSize)
      val (counts, log) = readNCount(fb, 255, 6)
      val table = buildFse(counts, log)
      val hdrBytes = fb.bytesConsumed
      val bitsStart = off + 1 + hdrBytes
      val bitsLen = compSize - hdrBytes
      val bb = new BackBits(d, bitsStart, bitsLen)
      // two interleaved states, alternating emission; when a state's
      // reload would cross the stream start, emit the OTHER state's
      // symbol and stop (RFC 8878 §4.1.1 end condition)
      var s1 = bb.read(table.log)
      var s2 = bb.read(table.log)
      val ws = Array.newBuilder[Int]
      var n = 0
      var done = false
      while (!done) {
        ws += table.symbol(s1)
        n += 1
        if (n > 255) fail("huffman: more than 255 fse-coded weights")
        if (bb.remaining < table.nbBits(s1)) {
          ws += table.symbol(s2)
          done = true
        } else {
          val next = table.newState(s1) + bb.read(table.nbBits(s1))
          s1 = s2
          s2 = next
        }
      }
      (buildHuf(ws.result()), 1 + compSize)
    }
  }

  /** Decode one Huffman-coded stream (backward bitstream) to exactly
    * `outLen` bytes.
    */
  private def hufDecodeStream(t: HufTable, d: Array[Byte], off: Int, len: Int,
                              out: Array[Byte], outOff: Int, outLen: Int): Unit = {
    val bb = new BackBits(d, off, len)
    var produced = 0
    // maintain a peek window of t.log bits: read eagerly, consume per symbol
    var window = bb.read(t.log)
    while (produced < outLen) {
      val cell = window
      out(outOff + produced) = t.symbol(cell)
      produced += 1
      val nb = t.bits(cell)
      if (produced < outLen)
        window = ((window << nb) | bb.read(nb)) & ((1 << t.log) - 1)
    }
  }

  // --------------------------------------------------------- literals section

  /** Per-frame decoding context carried across blocks: the previous
    * Huffman table (Treeless literals) and previous FSE tables (Repeat
    * sequence modes), plus the repeat-offset history.
    */
  private final class Ctx {
    var huf: HufTable = null
    var llFse: FseTable = null
    var mlFse: FseTable = null
    var ofFse: FseTable = null
    val rep: Array[Int] = Array(1, 4, 8)
  }

  /** Decode the literals section; returns (literals, bytesConsumed). */
  private def decodeLiterals(d: Array[Byte], off: Int, limit: Int, ctx: Ctx): (Array[Byte], Int) = {
    if (off >= limit) fail("missing literals section")
    val b0 = d(off) & 0xFF
    val blockType = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    blockType match {
      case 0 | 1 => // Raw | RLE
        // Raw/RLE Size_Format: low bit 0 (spelled 00 or 10) → 1 bit of
        // format, 5-bit size in bits 3-7; 01 → 12-bit; 11 → 20-bit
        val (regen, hdr) = sizeFormat match {
          case 0 | 2 => (b0 >> 3, 1)
          case 1 =>
            if (off + 2 > limit) fail("truncated literals header")
            ((b0 >> 4) | ((d(off + 1) & 0xFF) << 4), 2)
          case 3 =>
            if (off + 3 > limit) fail("truncated literals header")
            ((b0 >> 4) | ((d(off + 1) & 0xFF) << 4) | ((d(off + 2) & 0xFF) << 12), 3)
        }
        val n = checked(regen.toLong, "literals size")
        if (blockType == 0) {
          if (off + hdr + n > limit) fail("raw literals overrun the block")
          (java.util.Arrays.copyOfRange(d, off + hdr, off + hdr + n), hdr + n)
        } else {
          if (off + hdr + 1 > limit) fail("rle literals missing byte")
          val out = new Array[Byte](n)
          java.util.Arrays.fill(out, d(off + hdr))
          (out, hdr + 1)
        }
      case 2 | 3 => // Compressed | Treeless
        var regen = 0; var comp = 0; var hdr = 0; var fourStreams = true
        sizeFormat match {
          case 0 | 1 =>
            val h = (d(off) & 0xFF) | ((d(off + 1) & 0xFF) << 8) | ((d(off + 2) & 0xFF) << 16)
            regen = (h >> 4) & 0x3FF; comp = (h >> 14) & 0x3FF; hdr = 3
            fourStreams = sizeFormat == 1
          case 2 =>
            val h = (d(off) & 0xFF) | ((d(off + 1) & 0xFF) << 8) |
              ((d(off + 2) & 0xFF) << 16) | ((d(off + 3) & 0xFF) << 24)
            regen = (h >> 4) & 0x3FFF; comp = (h >> 18) & 0x3FFF; hdr = 4
          case 3 =>
            val h = (d(off) & 0xFFL) | ((d(off + 1) & 0xFFL) << 8) |
              ((d(off + 2) & 0xFFL) << 16) | ((d(off + 3) & 0xFFL) << 24) |
              ((d(off + 4) & 0xFFL) << 32)
            regen = ((h >> 4) & 0x3FFFF).toInt; comp = ((h >> 22) & 0x3FFFF).toInt; hdr = 5
        }
        val n = checked(regen.toLong, "literals size")
        if (off + hdr + comp > limit) fail("compressed literals overrun the block")
        var p = off + hdr
        val table =
          if (blockType == 2) {
            val (t, used) = readHufTable(d, p, off + hdr + comp)
            ctx.huf = t
            p += used
            t
          } else {
            if (ctx.huf == null) fail("treeless literals with no previous huffman table")
            ctx.huf
          }
        val streamsEnd = off + hdr + comp
        val out = new Array[Byte](n)
        if (!fourStreams) hufDecodeStream(table, d, p, streamsEnd - p, out, 0, n)
        else {
          if (p + 6 > streamsEnd) fail("missing 4-stream jump table")
          def le16(i: Int) = (d(i) & 0xFF) | ((d(i + 1) & 0xFF) << 8)
          val s1 = le16(p); val s2 = le16(p + 2); val s3 = le16(p + 4)
          p += 6
          val s4 = streamsEnd - p - s1 - s2 - s3
          if (s4 <= 0) fail("4-stream sizes overrun the section")
          val seg = (n + 3) / 4
          val last = n - 3 * seg
          if (last < 0) fail("regenerated size too small for 4 streams")
          hufDecodeStream(table, d, p, s1, out, 0, seg)
          hufDecodeStream(table, d, p + s1, s2, out, seg, seg)
          hufDecodeStream(table, d, p + s1 + s2, s3, out, 2 * seg, seg)
          hufDecodeStream(table, d, p + s1 + s2 + s3, s4, out, 3 * seg, last)
        }
        (out, hdr + comp)
    }
  }

  // -------------------------------------------------------- sequences section

  private def seqTable(d: Array[Byte], pos0: Int, limit: Int, mode: Int,
                       predef: => FseTable, prev: FseTable, maxSym: Int,
                       maxLog: Int, what: String): (FseTable, Int) = mode match {
    case 0 => (predef, pos0)
    case 1 =>
      if (pos0 >= limit) fail(s"$what: missing RLE symbol")
      val sym = d(pos0) & 0xFF
      if (sym > maxSym) fail(s"$what: RLE symbol $sym > max $maxSym")
      (rleFse(sym), pos0 + 1)
    case 2 =>
      val fb = new FwdBits(d, pos0, limit)
      val (counts, log) = readNCount(fb, maxSym, maxLog)
      (buildFse(counts, log), pos0 + fb.bytesConsumed)
    case 3 =>
      if (prev == null) fail(s"$what: Repeat mode with no previous table")
      (prev, pos0)
  }

  /** Growable output buffer with random access — match copies reach back
    * into the already-produced frame bytes, so the decoder writes into one
    * flat array instead of a stream.
    */
  private final class Buf {
    var a: Array[Byte] = new Array[Byte](8192)
    var len: Int = 0
    def ensure(extra: Int): Unit = {
      val need = len + extra
      if (need > KafkaCompress.MaxOut) fail("decoded frame exceeds the bomb guard")
      if (need > a.length) {
        val grown = new Array[Byte](math.max(need, a.length * 2))
        System.arraycopy(a, 0, grown, 0, len)
        a = grown
      }
    }
    def append(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n)
      System.arraycopy(src, off, a, len, n)
      len += n
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(a, len)
  }

  /** Decode and execute the sequences section over `literals`, appending
    * to `out` (which already holds this frame's earlier blocks — the
    * match window).
    */
  private def decodeSequences(d: Array[Byte], off: Int, limit: Int,
                              literals: Array[Byte], ctx: Ctx,
                              out: Buf, frameStart: Int): Unit = {
    if (off >= limit) fail("missing sequences section")
    var p = off
    val b0 = d(p) & 0xFF; p += 1
    val nbSeq =
      if (b0 < 128) b0
      else if (b0 < 255) {
        if (p >= limit) fail("truncated sequence count")
        val v = ((b0 - 128) << 8) | (d(p) & 0xFF); p += 1; v
      } else {
        if (p + 1 >= limit) fail("truncated sequence count")
        val v = (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8); p += 2; v + 0x7F00
      }
    if (nbSeq == 0) {
      if (p != limit) fail("trailing bytes after a 0-sequence section")
      out.append(literals, 0, literals.length)
      return
    }
    if (p >= limit) fail("missing symbol compression modes")
    val modes = d(p) & 0xFF; p += 1
    if ((modes & 3) != 0) fail("reserved sequence-mode bits set")
    val llMode = (modes >> 6) & 3
    val ofMode = (modes >> 4) & 3
    val mlMode = (modes >> 2) & 3
    val (llT, p1) = seqTable(d, p, limit, llMode, LlPredef, ctx.llFse, MaxLlCode, MaxLlLog, "LL")
    val (ofT, p2) = seqTable(d, p1, limit, ofMode, OfPredef, ctx.ofFse, MaxOfCode, MaxOfLog, "OF")
    val (mlT, p3) = seqTable(d, p2, limit, mlMode, MlPredef, ctx.mlFse, MaxMlCode, MaxMlLog, "ML")
    ctx.llFse = llT; ctx.ofFse = ofT; ctx.mlFse = mlT
    val bb = new BackBits(d, p3, limit - p3)
    var llState = bb.read(llT.log)
    var ofState = bb.read(ofT.log)
    var mlState = bb.read(mlT.log)
    var litPos = 0
    var seq = 0
    while (seq < nbSeq) {
      val ofCode = ofT.symbol(ofState)
      val mlCode = mlT.symbol(mlState)
      val llCode = llT.symbol(llState)
      if (ofCode > 31) fail(s"offset code $ofCode out of range")
      if (mlCode > MaxMlCode) fail(s"match-length code $mlCode out of range")
      if (llCode > MaxLlCode) fail(s"literals-length code $llCode out of range")
      // extra bits read in OF, ML, LL order
      val ofValue = (1L << ofCode) + (if (ofCode > 0) bb.read(math.min(ofCode, 31)).toLong else 0L)
      val ml = MlBase(mlCode) + bb.read(MlBits(mlCode))
      val ll = LlBase(llCode) + bb.read(LlBits(llCode))
      // repeat-offset machine (§3.1.1.3.2.1.1)
      val offset: Int =
        if (ofValue > 3) {
          val o = checked(ofValue - 3, "match offset")
          ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0); ctx.rep(0) = o
          o
        } else {
          val idx0 = ofValue.toInt - 1
          val idx = if (ll == 0) idx0 + 1 else idx0
          val o =
            if (idx == 3) { val v = ctx.rep(0) - 1; if (v <= 0) fail("repeat offset underflow"); v }
            else ctx.rep(idx)
          if (idx != 0) {
            if (idx >= 2) ctx.rep(2) = ctx.rep(1)
            ctx.rep(1) = ctx.rep(0)
            ctx.rep(0) = o
          }
          o
        }
      if (litPos + ll > literals.length) fail("sequence literals overrun")
      out.ensure(ll + ml)
      System.arraycopy(literals, litPos, out.a, out.len, ll)
      litPos += ll; out.len += ll
      // match window is the CURRENT frame only — out.len spans every frame
      // decoded so far in a multi-frame payload, and a corrupt offset must
      // fail typed rather than copy another frame's bytes
      if (offset > out.len - frameStart) fail(s"match offset $offset beyond frame history ${out.len - frameStart}")
      if (offset >= ml) { // non-overlapping: one block copy
        System.arraycopy(out.a, out.len - offset, out.a, out.len, ml)
        out.len += ml
      } else {
        var k = 0
        while (k < ml) { // byte-wise: overlap (offset < ml) is the RLE idiom
          out.a(out.len) = out.a(out.len - offset); out.len += 1; k += 1
        }
      }
      seq += 1
      if (seq < nbSeq) {
        // state updates in LL, ML, OF order
        llState = llT.newState(llState) + bb.read(llT.nbBits(llState))
        mlState = mlT.newState(mlState) + bb.read(mlT.nbBits(mlState))
        ofState = ofT.newState(ofState) + bb.read(ofT.nbBits(ofState))
      }
    }
    if (!bb.exhausted) fail("sequences bitstream has unconsumed bits")
    // trailing literals after the last sequence
    out.append(literals, litPos, literals.length - litPos)
  }

  // -------------------------------------------------------------- frames

  /** Decompress a full zstd payload: one or more concatenated frames,
    * skippable frames passed over, content checksums verified.
    */
  def decompress(data: Array[Byte]): Array[Byte] = {
    val out = new Buf
    var p = 0
    def le32(i: Int): Int =
      (data(i) & 0xFF) | ((data(i + 1) & 0xFF) << 8) |
        ((data(i + 2) & 0xFF) << 16) | ((data(i + 3) & 0xFF) << 24)
    while (p < data.length) {
      if (p + 4 > data.length) fail("truncated frame magic")
      val magic = le32(p)
      if ((magic & 0xFFFFFFF0) == 0x184D2A50) { // skippable frame
        if (p + 8 > data.length) fail("truncated skippable frame")
        val sz = checked(le32(p + 4) & 0xFFFFFFFFL, "skippable frame size")
        p += 8 + sz
      } else if (magic != 0xFD2FB528) {
        fail(f"bad frame magic 0x$magic%08X")
      } else {
        p += 4
        val frameStart = out.len
        if (p >= data.length) fail("truncated frame header")
        val fhd = data(p) & 0xFF; p += 1
        if ((fhd & 0x08) != 0) fail("reserved frame-header bit set")
        val singleSegment = (fhd & 0x20) != 0
        val checksum = (fhd & 0x04) != 0
        val didSize = Array(0, 1, 2, 4)((fhd & 3))
        if (didSize != 0) fail("dictionary frames are not supported (no dictionary source)")
        if (!singleSegment) p += 1 // window descriptor — output is fully buffered
        val fcsSize = (fhd >> 6) match {
          case 0 => if (singleSegment) 1 else 0
          case 1 => 2
          case 2 => 4
          case 3 => 8
        }
        if (p + fcsSize > data.length) fail("truncated frame header")
        var contentSize = -1L
        if (fcsSize > 0) {
          var v = 0L; var k = 0
          while (k < fcsSize) { v |= (data(p + k) & 0xFFL) << (8 * k); k += 1 }
          if (fcsSize == 2) v += 256
          contentSize = v
          checked(v, "frame content size")
          p += fcsSize
        }
        val ctx = new Ctx
        var last = false
        while (!last) {
          if (p + 3 > data.length) fail("truncated block header")
          val bh = (data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8) | ((data(p + 2) & 0xFF) << 16)
          p += 3
          last = (bh & 1) == 1
          val btype = (bh >> 1) & 3
          val bsize = bh >>> 3
          btype match {
            case 0 => // Raw
              if (p + bsize > data.length) fail("raw block overruns input")
              out.append(data, p, bsize)
              p += bsize
            case 1 => // RLE: one byte, bsize = regenerated length
              if (p >= data.length) fail("rle block missing byte")
              out.ensure(bsize)
              java.util.Arrays.fill(out.a, out.len, out.len + bsize, data(p))
              out.len += bsize
              p += 1
            case 2 => // Compressed
              if (p + bsize > data.length) fail("compressed block overruns input")
              val limit = p + bsize
              val (lits, used) = decodeLiterals(data, p, limit, ctx)
              decodeSequences(data, p + used, limit, lits, ctx, out, frameStart)
              p = limit
            case 3 => fail("reserved block type")
          }
        }
        val frameOut = out.len - frameStart
        if (contentSize >= 0 && frameOut != contentSize)
          fail(s"frame declared $contentSize bytes but decoded $frameOut")
        if (checksum) {
          if (p + 4 > data.length) fail("truncated content checksum")
          val stored = le32(p); p += 4
          val got = XxHash64.hash(out.a, frameStart, frameOut, 0L).toInt
          if (got != stored)
            fail(f"content checksum mismatch: stored 0x$stored%08X computed 0x$got%08X")
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- encoder

  /** FSE ENCODE table built from the same normalized counts — the encoder
    * walks the decode-table construction backward (§4.1: the decode and
    * encode tables describe the same state machine).
    */
  private final class FseEnc(val log: Int, counts: Array[Int]) {
    private val size = 1 << log
    private val table = buildFse(counts, log) // decode view: cell -> (symbol, nbBits, newStateBase)
    // direct encode view: cellFor(sym*size + state) = the cell emitting
    // `sym` whose transition range covers `state` (the FSE invariant: a
    // symbol's cells' ranges partition the state space) — O(1) per step
    private val cellFor: Array[Int] = {
      val m = new Array[Int](counts.length * size)
      java.util.Arrays.fill(m, -1)
      var c = 0
      while (c < size) {
        val s = table.symbol(c)
        val base = table.newState(c)
        val span = 1 << table.nbBits(c)
        var st = base
        while (st < base + span) { m(s * size + st) = c; st += 1 }
        c += 1
      }
      m
    }
    def nbBitsAt(cell: Int): Int = table.nbBits(cell)
    def baseAt(cell: Int): Int = table.newState(cell)
    /** Encoding step: FROM the decoder's NEXT cell (`state`), the cell
      * that emits symbol s and transitions into it. -1 never occurs for
      * in-range symbols (ranges partition the space).
      */
    def cellInto(state: Int, s: Int): Int = {
      val c = cellFor(s * size + state)
      if (c < 0) fail(s"fse encode: no transition to symbol $s from state $state")
      c
    }
    /** Any cell that emits s — used to seed the initial states. */
    def anyCell(s: Int): Int = cellInto(0, s) // state 0 is always covered
  }

  private lazy val LlEnc = new FseEnc(LlDefaultLog, LlDefault)
  private lazy val MlEnc = new FseEnc(MlDefaultLog, MlDefault)
  private lazy val OfEnc = new FseEnc(OfDefaultLog, OfDefault)

  /** Backward bit WRITER: bits pushed are read back MSB-first by BackBits;
    * finished with the sentinel 1-bit and zero padding to a byte. Fields
    * accumulate LSB-first in a 64-bit container, flushed bytewise.
    */
  private final class BackBitsW {
    private var bytes = new Array[Byte](64)
    private var n = 0
    private var acc = 0L
    private var accBits = 0
    def push(value: Int, nb: Int): Unit = {
      acc |= (value.toLong & ((1L << nb) - 1)) << accBits
      accBits += nb
      while (accBits >= 8) {
        if (n == bytes.length) bytes = java.util.Arrays.copyOf(bytes, n * 2)
        bytes(n) = acc.toByte; n += 1
        acc >>>= 8; accBits -= 8
      }
    }
    def result(): Array[Byte] = {
      // sentinel bit then pad to the byte
      acc |= 1L << accBits
      if (n == bytes.length) bytes = java.util.Arrays.copyOf(bytes, n + 1)
      bytes(n) = acc.toByte; n += 1
      java.util.Arrays.copyOf(bytes, n)
    }
  }

  // ------------------------------------------- Huffman literals ENCODING

  /** Depth-limited (≤ 11) canonical Huffman code lengths for the given
    * frequencies: two-queue Huffman, clamp, then Kraft-sum repair (take
    * the cheapest length increments until the code is complete again).
    * Returns null when Huffman can't apply (fewer than 2 distinct bytes).
    */
  private def hufLengths(freq: Array[Int]): Array[Int] = {
    val present = (0 until freq.length).filter(freq(_) > 0)
    if (present.size < 2) return null
    // two-queue Huffman over (weight, members)
    final case class Node(w: Long, syms: List[Int], depth: Int,
                          l: Node = null, r: Node = null)
    var leaves = present.map(s => Node(freq(s), List(s), 0))
      .sortBy(_.w).toList
    var merged = List.empty[Node]
    def popMin(): Node = (leaves, merged) match {
      case (a :: ta, b :: _) if a.w <= b.w => leaves = ta; a
      case (a :: ta, Nil) => leaves = ta; a
      case (_, b :: tb) => merged = tb; b
      case _ => fail("huffman: empty queues")
    }
    var count = leaves.size
    while (count > 1) {
      val a = popMin(); val b = popMin()
      merged = merged :+ Node(a.w + b.w, Nil, 0, a, b)
      count -= 1
    }
    val root = popMin()
    val len = new Array[Int](freq.length)
    def walk(n: Node, d: Int): Unit =
      if (n.l == null) n.syms.foreach(s => len(s) = math.max(d, 1))
      else { walk(n.l, d + 1); walk(n.r, d + 1) }
    walk(root, 0)
    // depth-limit to 11, then repair the Kraft sum to exactly 1
    val MaxLen = 11
    present.foreach(s => if (len(s) > MaxLen) len(s) = MaxLen)
    def kraft: Long = present.map(s => 1L << (MaxLen - len(s))).sum
    val full = 1L << MaxLen
    while (kraft > full) {
      // lengthen the lowest-frequency symbol that can still grow
      val s = present.filter(len(_) < MaxLen).minBy(freq(_))
      len(s) += 1
    }
    var slack = full - kraft
    while (slack > 0) {
      // shorten the highest-frequency symbol whose step fits the slack
      val fit = present.filter(s => len(s) > 1 &&
        (1L << (MaxLen - len(s))) <= slack)
      if (fit.isEmpty) fail("huffman: cannot complete the code")
      val s = fit.maxBy(freq(_))
      slack -= 1L << (MaxLen - len(s))
      len(s) -= 1
    }
    len
  }

  /** Encode `lits` as a Compressed literals section (direct-weights
    * Huffman table + 1 or 4 backward streams). Returns null when the
    * compressed form is not smaller or the shape is outside the
    * direct-weights profile (highest byte > 128 — the FSE-weights form
    * is decode-only here).
    */
  private def hufEncodeLiterals(lits: Array[Byte]): Array[Byte] = {
    val n = lits.length
    if (n < 64) return null
    val freq = new Array[Int](256)
    var i = 0
    while (i < n) { freq(lits(i) & 0xFF) += 1; i += 1 }
    val maxSym = (255 to 0 by -1).find(freq(_) > 0).get
    if (maxSym > 128) return null // direct weights carry at most 128 entries
    val len = hufLengths(freq)
    if (len == null) return null
    val maxBits = (0 to maxSym).filter(freq(_) > 0).map(len(_)).max
    // weights; the LAST present symbol's weight is implicit (the decoder
    // completes the power of two), so transmit weights for 0..maxSym-1
    val weight = new Array[Int](maxSym + 1)
    var s = 0
    while (s <= maxSym) {
      weight(s) = if (freq(s) == 0) 0 else maxBits + 1 - len(s)
      s += 1
    }
    val nW = maxSym // transmitted weights: symbols 0..maxSym-1
    val table = new java.io.ByteArrayOutputStream()
    table.write(127 + nW)
    var w2 = 0
    while (w2 < nW) {
      val hi = weight(w2)
      val lo = if (w2 + 1 < nW) weight(w2 + 1) else 0
      table.write((hi << 4) | lo)
      w2 += 2
    }
    // canonical codes in the DECODER's fill order: ascending weight,
    // ascending symbol — a symbol's code = its table start >> (log - nb)
    val log = maxBits
    val code = new Array[Int](maxSym + 1)
    val nb = new Array[Int](maxSym + 1)
    var pos = 0
    var wgt = 1
    while (wgt <= log) {
      var sym = 0
      while (sym <= maxSym) {
        if (freq(sym) > 0 && maxBits + 1 - len(sym) == wgt) {
          nb(sym) = len(sym)
          code(sym) = pos >> (log - len(sym))
          pos += 1 << (log - len(sym))
        }
        sym += 1
      }
      wgt += 1
    }
    if (pos != (1 << log)) fail("huffman encode: incomplete canonical fill")
    def encodeStream(off: Int, sz: Int): Array[Byte] = {
      val w = new BackBitsW
      var k = off + sz - 1
      while (k >= off) { // backward: last literal pushed first
        val b = lits(k) & 0xFF
        w.push(code(b), nb(b))
        k -= 1
      }
      w.result()
    }
    val fourStreams = n > 1023
    val streams: Array[Array[Byte]] =
      if (!fourStreams) Array(encodeStream(0, n))
      else {
        val seg = (n + 3) / 4
        Array(encodeStream(0, seg), encodeStream(seg, seg),
          encodeStream(2 * seg, seg), encodeStream(3 * seg, n - 3 * seg))
      }
    if (fourStreams && streams.take(3).exists(_.length > 0xFFFF)) return null
    val comp = table.size() + streams.map(_.length).sum +
      (if (fourStreams) 6 else 0)
    // header: type 2 (Compressed); format by the larger of (regen, comp)
    val out = new java.io.ByteArrayOutputStream()
    val m = math.max(n, comp)
    if (!fourStreams) { // 1 stream: Size_Format 00, 10-bit sizes
      if (m > 1023) return null
      val h = 2 | (0 << 2) | (n << 4) | (comp << 14)
      out.write(h & 0xFF); out.write((h >> 8) & 0xFF); out.write((h >> 16) & 0xFF)
    } else if (m <= 16383) { // Size_Format 10, 14-bit sizes
      val h = 2L | (2L << 2) | (n.toLong << 4) | (comp.toLong << 18)
      out.write((h & 0xFF).toInt); out.write(((h >> 8) & 0xFF).toInt)
      out.write(((h >> 16) & 0xFF).toInt); out.write(((h >> 24) & 0xFF).toInt)
    } else { // Size_Format 11, 18-bit sizes
      if (m > 0x3FFFF) return null
      val h = 2L | (3L << 2) | (n.toLong << 4) | (comp.toLong << 22)
      var b = 0
      while (b < 5) { out.write(((h >> (8 * b)) & 0xFF).toInt); b += 1 }
    }
    table.writeTo(out)
    if (fourStreams) {
      def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      w16(streams(0).length); w16(streams(1).length); w16(streams(2).length)
    }
    streams.foreach(st => out.write(st, 0, st.length))
    val bytes = out.toByteArray
    if (bytes.length >= n) null else bytes
  }

  /** Map a literals length to its code (inverse of LlBase). */
  private def llCodeOf(ll: Int): Int = {
    var c = LlBase.length - 1
    while (LlBase(c) > ll) c -= 1
    c
  }
  private def mlCodeOf(ml: Int): Int = {
    var c = MlBase.length - 1
    while (MlBase(c) > ml) c -= 1
    c
  }

  /** Compress one block's worth of input with the greedy hash-table
    * matcher (same shape as the snappy/lz4 encoders), emitting raw
    * literals + predefined-FSE sequences. Returns None when the
    * compressed form would not be smaller (caller emits a Raw block),
    * else (body, rep0Out). `rep0In` is the decoder's rep0 entering this
    * block — repeat-offset history persists ACROSS blocks within a frame
    * (RFC 8878 §3.1.1.5), so the caller threads it block to block; a Raw
    * block leaves it unchanged.
    */
  private def compressBlock(d: Array[Byte], off: Int, len: Int, rep0In: Int): Option[(Array[Byte], Int)] = {
    if (len < 16) return None
    // entropy-aware match gate: a sequence costs ~32 bits (state updates +
    // offset/length extras) while a literal costs ~H bits under the
    // Huffman stage — emitting a short match on low-entropy data LOSES to
    // just coding the bytes. Estimate H from the block's byte histogram
    // and require ml ≥ ~36/H (clamped), so text keeps long matches only
    // and lets the entropy stage take the rest, while random-ish data
    // keeps the 4-byte floor.
    val minMatch = {
      val hist = new Array[Int](256)
      var i = off
      while (i < off + len) { hist(d(i) & 0xFF) += 1; i += 1 }
      var h = 0.0
      var s = 0
      while (s < 256) {
        if (hist(s) > 0) {
          val p = hist(s).toDouble / len
          h -= p * math.log(p) / math.log(2)
        }
        s += 1
      }
      math.max(4, math.min(12, math.round(36.0 / math.max(h, 1.0)).toInt))
    }
    val hashLog = 15
    val hash = new Array[Int](1 << hashLog)
    java.util.Arrays.fill(hash, -1)
    def h4(i: Int): Int = {
      val v = (d(i) & 0xFF) | ((d(i + 1) & 0xFF) << 8) |
        ((d(i + 2) & 0xFF) << 16) | ((d(i + 3) & 0xFF) << 24)
      (v * -1640531535) >>> (32 - hashLog)
    }
    // primitive parallel arrays: (literal run, offset, match len) per seq
    var seqLl = new Array[Int](256)
    var seqOf = new Array[Int](256)
    var seqMl = new Array[Int](256)
    var ns = 0
    def addSeq(ll: Int, ofs: Int, ml: Int): Unit = {
      if (ns == seqLl.length) {
        seqLl = java.util.Arrays.copyOf(seqLl, ns * 2)
        seqOf = java.util.Arrays.copyOf(seqOf, ns * 2)
        seqMl = java.util.Arrays.copyOf(seqMl, ns * 2)
      }
      seqLl(ns) = ll; seqOf(ns) = ofs; seqMl(ns) = ml; ns += 1
    }
    val lits = new java.io.ByteArrayOutputStream()
    var anchor = off
    var i = off
    val end = off + len
    while (i + 4 <= end) {
      val slot = h4(i)
      val cand = hash(slot)
      hash(slot) = i
      if (cand >= off && i - cand <= (1 << 17) - 1 &&
          d(cand) == d(i) && d(cand + 1) == d(i + 1) &&
          d(cand + 2) == d(i + 2) && d(cand + 3) == d(i + 3)) {
        var ml = 4
        while (i + ml < end && d(cand + ml) == d(i + ml)) ml += 1
        if (ml >= minMatch) {
          lits.write(d, anchor, i - anchor)
          addSeq(i - anchor, i - cand, ml)
          // index a couple of positions inside the match (cheap future hits)
          var j = i + 1
          val stop = math.min(i + ml, end - 4)
          while (j < stop) { hash(h4(j)) = j; j += math.max(1, ml / 8) }
          i += ml
          anchor = i
        } else i += 1
      } else i += 1
    }
    lits.write(d, anchor, end - anchor)
    val literals = lits.toByteArray

    // literals section: Huffman-compressed when it wins, RLE when uniform,
    // Raw otherwise
    def rawHeader(n: Int, tpe: Int): Array[Byte] =
      if (n < 32) Array(((n << 3) | tpe).toByte) // size_format 00, 5-bit size
      else if (n < 4096) { // size_format 01, 12-bit size
        val h = (n << 4) | 4 | tpe
        Array((h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte)
      } else { // size_format 11, 20-bit size
        val h = (n << 4) | 12 | tpe
        Array((h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte, ((h >> 16) & 0xFF).toByte)
      }
    val lout = new java.io.ByteArrayOutputStream()
    locally {
      val n = literals.length
      val uniform = n > 1 && {
        var k = 1; while (k < n && literals(k) == literals(0)) k += 1; k == n
      }
      val huf = if (uniform) null else hufEncodeLiterals(literals)
      if (uniform) { // RLE literals: header (type 1) + the one byte
        val h = rawHeader(n, 1); lout.write(h, 0, h.length)
        lout.write(literals(0))
      } else if (huf != null) lout.write(huf, 0, huf.length)
      else {
        val h = rawHeader(n, 0); lout.write(h, 0, h.length)
        lout.write(literals, 0, n)
      }
    }
    if (ns == 0) {
      // literals-only block (no matches): worth emitting only when the
      // entropy stage actually shrank it — else the caller's Raw block
      val body = lout.toByteArray
      if (body.length + 1 >= len) return None
      val out = new java.io.ByteArrayOutputStream()
      out.write(body, 0, body.length)
      out.write(0) // zero sequences
      return Some((out.toByteArray, rep0In)) // no sequences → rep unchanged
    }

    // sequences: count, modes (all predefined), interleaved FSE bitstream
    val sout = new java.io.ByteArrayOutputStream()
    if (ns < 128) sout.write(ns)
    else if (ns < 0x7F00) { sout.write((ns >> 8) + 128); sout.write(ns & 0xFF) }
    else { sout.write(255); sout.write((ns - 0x7F00) & 0xFF); sout.write(((ns - 0x7F00) >> 8) & 0xFF) }
    sout.write(0) // LL/OF/ML all Predefined_Mode, reserved 0

    // per-sequence codes. Repeat-offset reuse (forward walk mirroring the
    // decoder's rep machine): a sequence whose offset equals the current
    // rep0 AND has literals emits offset_value 1 — code 0, ZERO extra
    // bits (the big win on offset-repetitive data); everything else is
    // offset_value = offset + 3, which also becomes the new rep0. Only
    // the ll>0 / rep0 cell is used, so the rep1/rep2 shifts never matter.
    val llCode = new Array[Int](ns)
    val mlCode = new Array[Int](ns)
    val ofCode = new Array[Int](ns)
    val ofVal = new Array[Int](ns)
    var rep0 = rep0In // rep0 entering this block (frame-initial is 1)
    var ci = 0
    while (ci < ns) {
      llCode(ci) = llCodeOf(seqLl(ci))
      mlCode(ci) = mlCodeOf(seqMl(ci))
      val ofv =
        if (seqOf(ci) == rep0 && seqLl(ci) > 0) 1
        else { rep0 = seqOf(ci); seqOf(ci) + 3 }
      val c = 31 - Integer.numberOfLeadingZeros(ofv)
      if (c > 28) return None // beyond the predefined OF table
      ofCode(ci) = c
      ofVal(ci) = ofv
      ci += 1
    }

    // The DECODER reads: init states LL,OF,ML; per seq k: OF extra, ML
    // extra, LL extra; then (k < last) state updates LL,ML,OF. FSE encodes
    // BACKWARD: the decoder's cells c_0..c_{ns-1} satisfy symbol(c_k) =
    // code_k and c_{k+1} = newState(c_k) + updateBits_k, so we seed the
    // chain at ANY cell of the last sequence's code and walk k = ns-2..0,
    // each step finding the cell of code_k whose transition range covers
    // c_{k+1} (the FSE invariant: a symbol's cells' ranges partition the
    // state space, so one always exists). The cells we end on are the
    // decoder's init states. A backward reader consumes bits in the
    // reverse of write order, so the walk pushes the forward field
    // sequence REVERSED, fused into one loop: last sequence's extras
    // (reversed LL,ML,OF), then per earlier sequence the updates
    // (reversed OF,ML,LL) and its extras, finally the init states
    // (reversed ML,OF,LL).
    val w = new BackBitsW
    def pushExtras(q: Int): Unit = {
      val llc = llCode(q); val mlc = mlCode(q); val ofc = ofCode(q)
      w.push(seqLl(q) - LlBase(llc), LlBits(llc))            // LL extra
      w.push(seqMl(q) - MlBase(mlc), MlBits(mlc))            // ML extra
      w.push(ofVal(q) - (1 << ofc), ofc)                     // OF extra
    }
    var llState = LlEnc.anyCell(llCode(ns - 1))
    var mlState = MlEnc.anyCell(mlCode(ns - 1))
    var ofState = OfEnc.anyCell(ofCode(ns - 1))
    pushExtras(ns - 1)
    var k = ns - 2
    while (k >= 0) {
      val llC = LlEnc.cellInto(llState, llCode(k))
      val mlC = MlEnc.cellInto(mlState, mlCode(k))
      val ofC = OfEnc.cellInto(ofState, ofCode(k))
      // updates, reversed field order (decoder reads LL, ML, OF)
      w.push(ofState - OfEnc.baseAt(ofC), OfEnc.nbBitsAt(ofC))
      w.push(mlState - MlEnc.baseAt(mlC), MlEnc.nbBitsAt(mlC))
      w.push(llState - LlEnc.baseAt(llC), LlEnc.nbBitsAt(llC))
      llState = llC; mlState = mlC; ofState = ofC
      pushExtras(k)
      k -= 1
    }
    // init states = the cells for sequence 0, reversed read order
    w.push(mlState, MlDefaultLog)
    w.push(ofState, OfDefaultLog)
    w.push(llState, LlDefaultLog)
    val seqBits = w.result()
    sout.write(seqBits, 0, seqBits.length)

    val body = new java.io.ByteArrayOutputStream()
    lout.writeTo(body); sout.writeTo(body)
    val outBytes = body.toByteArray
    if (outBytes.length >= len) None else Some((outBytes, rep0))
  }

  /** Compress `data` into one zstd frame (single-segment, frame content
    * size + content checksum present — the shape the reference CLI also
    * produces for small payloads). Blocks are 128 KB.
    */
  def compress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF); out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    w32(0xFD2FB528)
    val n = data.length
    // FHD: single-segment, checksum, FCS field per size
    val (fcsFlag, fcsBytes) =
      if (n < 256) (0, 1)
      else if (n < 65536 + 256) (1, 2)
      else (2, 4)
    out.write((fcsFlag << 6) | 0x20 | 0x04)
    fcsFlag match {
      case 0 => out.write(n)
      case 1 => val v = n - 256; out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      case 2 => w32(n)
    }
    val BlockMax = 128 * 1024
    var off = 0
    if (n == 0) {
      // one empty raw last-block
      out.write(1); out.write(0); out.write(0)
    }
    var rep0 = 1 // decoder's frame-initial rep0; persists across blocks
    while (off < n) {
      val len = math.min(BlockMax, n - off)
      val last = off + len >= n
      compressBlock(data, off, len, rep0) match {
        case Some((body, rep0Out)) =>
          val bh = (body.length << 3) | (2 << 1) | (if (last) 1 else 0)
          out.write(bh & 0xFF); out.write((bh >> 8) & 0xFF); out.write((bh >> 16) & 0xFF)
          out.write(body, 0, body.length)
          rep0 = rep0Out
        case None =>
          val bh = (len << 3) | (0 << 1) | (if (last) 1 else 0)
          out.write(bh & 0xFF); out.write((bh >> 8) & 0xFF); out.write((bh >> 16) & 0xFF)
          out.write(data, off, len)
      }
      off += len
    }
    w32(XxHash64.hash(data, 0, n, 0L).toInt)
    out.toByteArray
  }
}
