package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training + encoding — the vocabulary-construction step a
  * training-data pipeline runs between curation and packing (the token
  * budget every downstream op counts in is DEFINED by this vocabulary).
  *
  * Scale contract (the standard industrial shape, cf. the word-count-based
  * trainers in public BPE implementations): merge learning never touches
  * the corpus — it runs on the DISTINCT-WORD frequency table, which is the
  * output of one distributed hash-agg and is bounded (`maxWords` cap keeps
  * the driver-held table top-N by count; rare-word truncation is the
  * standard trade and changes merges only in the statistical tail). The
  * corpus-side passes ([[wordCounts]], [[pairCounts]], [[bpeEncode]]) are
  * one explode + one token-key agg, or pure map-side work with the learned
  * merge table broadcast.
  *
  * Symbol convention: a word is its character sequence plus a final
  * `</w>` end-of-word symbol (the Sennrich-style boundary marker, kept as
  * a SEPARATE symbol so the pair statistics are replayable with plain
  * per-character splitting in any engine).
  */
object Tokenizer {

  /** End-of-word marker symbol. */
  val EndOfWord = "</w>"

  /** The corpus word tokenizer shared with Search/Curation: lowercase,
    * split on non-alphanumeric runs, drop empties. */
  private def words(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Distributed word-frequency table: (word, cnt), one token-key agg. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(words(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** Adjacent symbol-pair frequencies over the word table — the statistic
    * a BPE round maximizes (round-0 table; training re-derives it per
    * round driver-side on the bounded word table). Fully declarative:
    * chars + end marker via split/zip_with, pair counts weighted by word
    * count, one narrow hash-agg on the pair key.
    */
  def pairCounts(wordCounts: DataFrame): DataFrame = {
    val syms = concat(filter(split(col("word"), ""), c => c =!= lit("")),
      array(lit(EndOfWord)))
    val n = size(syms)
    val pairs = zip_with(slice(syms, lit(1), n - 1), slice(syms, lit(2), n - 1),
      (a, b) => struct(a.as("a"), b.as("b")))
    wordCounts
      .select(col("cnt"), explode(pairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** Classic BPE merge learning over a (word, cnt) table.
    *
    * Driver-side BY DESIGN (see object doc): the input is the bounded
    * distinct-word table, not the corpus — `maxWords` enforces the bound
    * (top-N by cnt, ties by word, so the selection is deterministic).
    * Each round merges the (count DESC, pair ASC) best adjacent pair in
    * every word, left-to-right non-overlapping; learning stops early when
    * no pair repeats. Returns the ordered merge list.
    */
  def bpeTrain(wordCounts: DataFrame, numMerges: Int,
               maxWords: Int = 50000): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val rows = wordCounts
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
    var vocab: Array[(Array[String], Long)] = rows.map { r =>
      val w = r.getString(r.fieldIndex("word"))
      (w.map(_.toString).toArray :+ EndOfWord, r.getLong(r.fieldIndex("cnt")))
    }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty || counts.valuesIterator.max < 2) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, cnt) => (mergeOnce(syms, best), cnt) }
        round += 1
      }
    }
    merges.result()
  }

  /** One left-to-right non-overlapping application of a single merge. */
  private[graft] def mergeOnce(syms: Array[String],
                               pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word with a learned merge-rank table: repeatedly merge the
    * lowest-rank adjacent pair (all its occurrences, left-to-right) until
    * no learnable pair remains — the standard rank-priority encoder, which
    * reproduces training's in-order application exactly.
    */
  def encodeWord(word: String,
                 ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray :+ EndOfWord
    var go = true
    while (go && syms.length > 1) {
      var best = Int.MaxValue
      var bp: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bp = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bp == null) go = false
      else syms = mergeOnce(syms, bp)
    }
    syms
  }

  /** Map-side corpus encode: per doc, the BPE piece sequence and its
    * length. The merge table rides a broadcast variable (it is vocabulary-
    * sized, KBs–MBs); per-row work is pure JVM dictionary lookup — no
    * shuffle, the piece stats agg downstream is the only exchange.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val bc: Broadcast[Map[(String, String), Int]] =
      spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("pieces", ArrayType(StringType, containsNull = false)),
      StructField("n_pieces", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      val ranks = bc.value
      val cache = collection.mutable.HashMap.empty[String, Array[String]]
      it.map { r =>
        val id = r.get(inIdx) match {
          case l: Long => l case i: Int => i.toLong case o => o.toString.toLong
        }
        val text = Option(r.getString(txtIdx)).getOrElse("")
        val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val pieces = ws.flatMap(w =>
          cache.getOrElseUpdate(w, encodeWord(w, ranks)))
        Row(id, pieces.toSeq, pieces.length.toLong)
      }
    }(enc)
  }
}
