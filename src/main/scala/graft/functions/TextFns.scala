package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis primitives for a training-data pipeline over a `documents`
  * table: tokenization, language-ID heuristics, quality scoring, and
  * fingerprinting. All the non-custom pieces are composed from codegen'd
  * built-ins (regexp_count / split / md5), so they fuse into the scan at
  * 100 TB; the rolling hash and simhash are native Catalyst expressions.
  */
object TextFns {

  /** Whitespace-collapsed, lower-cased canonical text. */
  def normText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content-defined fingerprint of the canonical text (md5 → hex). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** 64-bit rolling-hash fingerprint (native expression, codegen). */
  def rollingHash(c: Column): Column = column(RollingHash64(expression(c.cast("string"))))

  def tokenCount(c: Column): Column = regexp_count(c, lit("\\S+")).cast("long")

  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Word n-gram shingles (n consecutive tokens joined by space). Native
    * expression: the HOF formulation (transform + slice + concat_ws per
    * position) costs ~1 ms/doc interpreted — the single biggest stage of
    * MinHash-LSH before this (4.8 s of a 9.4 s sf0.1 run).
    */
  def shingles(c: Column, n: Int): Column = column(WordShingles(expression(c), n))

  /** Count of matches of any of `words` as whole words (lower-cased). */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    regexp_count(lower(c), lit(words.mkString("\\b(", "|", ")\\b"))).cast("long")

  /** 64-bit simhash over a token array (native expression). */
  def simHash(tokensCol: Column): Column = column(SimHash64(expression(tokensCol)))

  /** Deflate-compressed byte length of the UTF-8 text (see [[DeflateLen]]). */
  def deflateLen(c: Column): Column = column(DeflateLen(expression(c.cast("string"))))

  /** Unicode NFC canonical composition (see [[NfcNormalize]]). */
  def nfc(c: Column): Column = column(NfcNormalize(expression(c.cast("string"))))

  /** MinHash signature of length k over a token array (native expression:
    * one pass over the tokens computes all k slot minima — one base hash
    * per token + k cheap mixes, no per-slot array traversal).
    */
  def minHashSignature(tokensCol: Column, k: Int): Column =
    column(MinHashSig(expression(tokensCol), k))

  /** Exact Jaccard of two SORTED string arrays: one merge pass counts the
    * intersection (|A∪B| = |A|+|B|−|A∩B|) — no per-row hash-set builds,
    * unlike array_intersect + array_union. Callers must array_sort inputs.
    */
  def sortedJaccard(a: Column, b: Column): Column =
    column(SortedJaccard(expression(a), expression(b)))
}

/** Shared 64-bit byte hashing (FNV-1a core + splitmix64 finalizer).
  * Self-contained on purpose: no dependence on engine-internal hash utils,
  * and trivially portable to any re-implementation.
  */
object TextHash {
  def hash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }
  def mix64(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Unicode NFC normalization (canonical composition) — the standard first
  * step of text curation: visually-identical strings with different
  * codepoint sequences (e + COMBINING ACUTE vs precomposed é) collapse to
  * one canonical form, so downstream dedup/fingerprinting sees them as
  * equal. Pure JDK `java.text.Normalizer` (Unicode-conformant, matches
  * other engines' NFC), codegen'd.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // fast path: already-normalized (all-ASCII included) skips the rebuild
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $x.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |  ? $x
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash of a UTF8 string (64-bit wraparound).
  * The streaming form (chunk-wise rolling) makes this a document
  * fingerprint computable without materializing the whole document.
  */
case class RollingHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
    TextHash.mix64(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bs = ctx.freshName("bs"); val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |byte[] $bs = $x.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bs.length; $i++) {
         |  $h = $h * 1000003L + ($bs[$i] & 0xffL);
         |}
         |${ev.value} = graft.functions.TextHash.mix64($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass word n-gram shingler over the raw string: tokenize on
  * whitespace, emit m-n+1 space-joined n-grams (the whole token list when
  * m < n, nothing for blank text) — byte-identical to the previous
  * HOF formulation (sequence → slice → concat_ws → filter), one codegen'd
  * call instead of ~m interpreted lambda evaluations.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.WordShingles.compute($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def compute(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // Replicate the exact HOF semantics (trim = SPACES only, like Spark's
    // trim; split with limit -1 keeps edge empty tokens from leading/
    // trailing non-space whitespace; empty shingles filtered at the end) —
    // Java String.trim would also strip \t/\n and change MinHash signatures
    // for documents with edge whitespace.
    val str = s.trim().toString // UTF8String.trim: ASCII space only
    val toks = str.split("\\s+", -1)
    val m = toks.length
    val raw: Seq[String] =
      if (m < n) Seq(toks.mkString(" "))
      else {
        val sb = new java.lang.StringBuilder
        (0 to m - n).map { i =>
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          sb.toString
        }
      }
    val out: Array[Any] = raw.filter(_.nonEmpty).map(UTF8String.fromString).toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Merge-pass Jaccard over two sorted distinct string arrays. The verify
  * step of the dedup pipelines evaluates this once per candidate pair —
  * linear in array length with zero allocation.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature: slot i = min over tokens of mix64(hash64(token) ^
  * seed_i). One tight loop per row; the hot path of MinHash-LSH dedup
  * (observed 64 interpreted lambda passes per doc → 390 s at sf0.1 before
  * this expression; ~seconds after).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => TextHash.mix64(i + 1L))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = TextHash.hash64(arr.getUTF8String(i).getBytes)
        var s = 0
        while (s < k) {
          val h = TextHash.mix64(base ^ seeds(s))
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: each token votes ±1 on every bit of
  * its 64-bit hash; the sign of each bit-sum forms the output bits. Near-
  * duplicate documents land within a small Hamming distance.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = TextHash.hash64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val votes = ctx.freshName("votes"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val b = ctx.freshName("b"); val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |int $n = $x.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    long $h = graft.functions.TextHash.hash64($x.getUTF8String($i).getBytes());
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deflate-compressed byte length of the UTF-8 text — the compression-ratio
  * quality signal of the RefinedWeb/CCNet heuristic family: machine-
  * generated or boilerplate-repetitive text compresses far below natural
  * prose, so `deflate_len/octet_length` separates them with zero linguistic
  * machinery. Raw zlib DEFLATE at the default level through the JDK's
  * Deflater (one instance per evaluation, `end()`ed — no native-memory
  * leak), deterministic per JVM. No SQL oracle (compressed length is
  * codec-implementation-specific): covered by spec goldens + a rows-only
  * corpus query, the same check class as trained-BPE encode.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(v: Any): Any =
    DeflateLen.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.DeflateLen.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  def compute(s: UTF8String): Long = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(s.getBytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
