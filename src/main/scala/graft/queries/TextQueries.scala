package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns
import graft.operators.{Dedup, Multimodal}

/** Text analysis + multimodal plumbing over `documents` (beyond-reference
  * LLM-data surface): token counting, quality scoring, language-ID
  * heuristic, fingerprinting, binary-payload metadata. Everything except
  * the rolling hash and the stubbed media decode carries a full oracle.
  */
object TextQueries extends QueryFamily {

  private val StopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private val StopData = Seq("table", "query", "row", "column", "value")

  /** Big-endian / little-endian byte encodings of an int column (exactly n
    * bytes, byte-wise) and a single-byte hex pair — shared by every staged
    * media query; one definition so an endianness or padding fix cannot
    * miss a copy.
    */
  private def be(c: org.apache.spark.sql.Column, n: Int) =
    concat((n - 1 to 0 by -1).map(k =>
      unhex(lpad(hex(shiftright(c, 8 * k).bitwiseAND(lit(255))), 2, "0"))): _*)
  private def le(c: org.apache.spark.sql.Column, n: Int) =
    concat((0 until n).map(k =>
      unhex(lpad(hex(shiftright(c, 8 * k).bitwiseAND(lit(255))), 2, "0"))): _*)
  private def hx(c: org.apache.spark.sql.Column) = lpad(hex(c % 256), 2, "0")

  /** 128-entry GIF global color table with arithmetic RGB ramps —
    * palette[i] = ((2i)%256, (2i+85)%256, (2i+170)%256) — constant across
    * rows so it stages as one hex literal and DuckDB recomputes the means
    * from the same arithmetic.
    */
  private lazy val GifPaletteHex: String =
    (0 until 128).map(i =>
      f"${(i * 2) % 256}%02X${(i * 2 + 85) % 256}%02X${(i * 2 + 170) % 256}%02X").mkString

  /** Synthetic-but-well-formed media payloads per doc (PNG/JPEG/GIF/BMP/WAV
    * headers built with pure byte-assembly SQL — unhex/concat — plus an
    * 'unknown' raw-text case), dimensions derived arithmetically from
    * doc_id so DuckDB can recompute the expected decode output.
    */
  private def stagedMedia(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = (col("doc_id") % 317 + 16).cast("int")
    val h = (col("doc_id") % 211 + 16).cast("int")
    val nf = (col("doc_id") % 211 + 16).cast("int") // wav frame count
    val png = concat(
      unhex(lit("89504E470D0A1A0A0000000D49484452")), // sig + IHDR len/tag
      be(w, 4), be(h, 4),
      unhex(lit("0806000000DEADBEEF")))               // depth/color + crc
    val jpeg = concat(
      unhex(lit("FFD8FFE000104A46494600010100000100010000")), // SOI + APP0
      unhex(lit("FFC0001108")), be(h, 2), be(w, 2),           // SOF0
      unhex(lit("03012200021101031101FFD9")))
    val gif = concat(
      unhex(lit("474946383961")), le(w, 2), le(h, 2),         // GIF89a
      unhex(lit("F7000000003B")))
    val bmp = concat(
      unhex(lit("424D")), le(lit(70), 4), unhex(lit("00000000")),
      le(lit(54), 4), le(lit(40), 4), le(w, 4), le(h, 4),
      unhex(lit("0100180000000000")))
    val wav = concat(
      unhex(lit("52494646")), le(nf * 2 + 36, 4), unhex(lit("57415645")),
      unhex(lit("666D7420")), le(lit(16), 4),                 // fmt chunk
      le(lit(1), 2), le(lit(1), 2), le(lit(8000), 4),         // pcm mono 8k
      le(lit(16000), 4), le(lit(2), 2), le(lit(16), 2),
      unhex(lit("64617461")), le(nf * 2, 4))                  // data header
    val payload = when(col("doc_id") % 6 === 0, png)
      .when(col("doc_id") % 6 === 1, jpeg)
      .when(col("doc_id") % 6 === 2, gif)
      .when(col("doc_id") % 6 === 3, bmp)
      .when(col("doc_id") % 6 === 4, wav)
      // leading NUL guarantees no container magic matches, whatever the
      // text happens to start with
      .otherwise(concat(unhex(lit("00")), col("text").cast("binary")))
    d.select(col("doc_id"), payload.as("payload"))
  }

  def defs: Seq[QueryDef] = Seq(

    // Token / character statistics — the quality-filter raw features.
    QueryDef(
      "q_text_stats",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        d.select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars"),
            TextFns.tokenCount(col("text")).as("n_tokens"),
            regexp_count(col("text"), lit("[aeiou]")).cast("long").as("n_vowels"),
            regexp_count(col("text"), lit("[0-9]")).cast("long").as("n_digits"),
            size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long").as("n_unique_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  length(text) AS n_chars,
             |  len(regexp_extract_all(text, '\S+')) AS n_tokens,
             |  len(regexp_extract_all(text, '[aeiou]')) AS n_vowels,
             |  len(regexp_extract_all(text, '[0-9]')) AS n_digits,
             |  len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_unique_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Corpus vocabulary builder — the term-frequency / document-frequency
    // table a tokenizer-training or TF-IDF pass starts from: explode is
    // map-side, one hash-agg shuffle carries (token, partial tf, doc_id
    // set partials), top-200 by (tf DESC, token) lowers to
    // TakeOrderedAndProject (distributed partial top-k, no global sort).
    QueryDef(
      "q_text_vocab",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        d.select(col("doc_id"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
          .filter(col("token") =!= "")
          .groupBy(col("token"))
          .agg(count(lit(1)).cast("long").as("tf"),
            count_distinct(col("doc_id")).cast("long").as("df"))
          .orderBy(col("tf").desc, col("token"))
          .limit(200)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
             |  FROM documents)
             |SELECT token, CAST(count(*) AS BIGINT) AS tf,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |FROM tok WHERE token <> ''
             |GROUP BY token ORDER BY tf DESC, token LIMIT 200""".stripMargin)),

    // BPE-ish token counting: the GPT-2 pre-tokenizer alternation shape
    // (contractions | space-prefixed letter runs | digit runs | punct runs)
    // as a plain leftmost-first regex — a much closer LLM token-cost proxy
    // than whitespace splitting (punctuation and contractions count). Pure
    // regexp_extract_all both sides; no lookarounds so Java regex and
    // DuckDB's RE2 agree.
    QueryDef(
      "q_text_bpe_tokens",
      (s, dir) => {
        val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+"
        val d = Tables(s, dir, "documents")
        // sorted before the heavy 1:1 projection — a trailing orderBy's
        // range-sampling pass re-runs the regex tokenization (guide §2.4)
        d.orderBy(col("doc_id")).select(
            col("doc_id"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0)))
              .cast("long").as("n_bpe_tokens"),
            TextFns.tokenCount(col("text")).as("n_ws_tokens"))
      },
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text,
             |    '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+'))
             |    AS n_bpe_tokens,
             |  len(regexp_extract_all(text, '\S+')) AS n_ws_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality score: deterministic arithmetic over exact integer counts —
    // identical doubles on both engines, no rounding needed.
    QueryDef(
      "q_text_quality",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val nTok = TextFns.tokenCount(col("text"))
        val nChr = length(col("text")).cast("long")
        val uniq = size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long")
        val stop = TextFns.stopwordHits(col("text"), StopEn)
        d.select(
            col("doc_id"),
            nTok.as("n_tokens"),
            (uniq.cast("double") / nTok.cast("double")).as("uniq_ratio"),
            (stop.cast("double") / nTok.cast("double")).as("stop_ratio"),
            (nChr.cast("double") / nTok.cast("double")).as("avg_token_len"),
            when(nTok < 20, "short")
              .when(uniq.cast("double") / nTok.cast("double") < 0.3, "repetitive")
              .otherwise("ok").as("quality_band"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  len(regexp_extract_all(text, '\\S+')) AS n_tokens,
              |  CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
              |    / len(regexp_extract_all(text, '\\S+')) AS uniq_ratio,
              |  CAST(len(regexp_extract_all(lower(text), '\\b(${StopEn.mkString("|")})\\b')) AS DOUBLE)
              |    / len(regexp_extract_all(text, '\\S+')) AS stop_ratio,
              |  CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '\\S+')) AS avg_token_len,
              |  CASE WHEN len(regexp_extract_all(text, '\\S+')) < 20 THEN 'short'
              |       WHEN CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
              |            / len(regexp_extract_all(text, '\\S+')) < 0.3 THEN 'repetitive'
              |       ELSE 'ok' END AS quality_band
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language-ID heuristic: stopword-profile scores, argmax with a stable
    // tie-break, compared against the labeled lang.
    QueryDef(
      "q_text_langid",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val scoreEn = TextFns.stopwordHits(col("text"), StopEn)
        val scoreData = TextFns.stopwordHits(col("text"), StopData)
        // sorted before the stopword regex projection (see q_text_bpe_tokens)
        d.orderBy(col("doc_id")).select(
            col("doc_id"), col("lang"),
            scoreEn.as("score_en"),
            scoreData.as("score_data"),
            when(scoreEn >= scoreData, "en").otherwise("data").as("predicted"),
            ((col("lang") === "en") === (scoreEn >= scoreData)).as("agree"))
      },
      Some(s"""SELECT doc_id, lang,
              |  len(regexp_extract_all(lower(text), '\\b(${StopEn.mkString("|")})\\b')) AS score_en,
              |  len(regexp_extract_all(lower(text), '\\b(${StopData.mkString("|")})\\b')) AS score_data,
              |  CASE WHEN len(regexp_extract_all(lower(text), '\\b(${StopEn.mkString("|")})\\b'))
              |         >= len(regexp_extract_all(lower(text), '\\b(${StopData.mkString("|")})\\b'))
              |       THEN 'en' ELSE 'data' END AS predicted,
              |  (lang = 'en') = (len(regexp_extract_all(lower(text), '\\b(${StopEn.mkString("|")})\\b'))
              |    >= len(regexp_extract_all(lower(text), '\\b(${StopData.mkString("|")})\\b'))) AS agree
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Canonical fingerprint (md5, full oracle) + rolling hash (native
    // expression — covered by the fingerprint column's parity, checked
    // rows-only for the hash value itself in TextSpec).
    QueryDef(
      "q_text_fingerprint",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        // sorted before the md5 projection (see q_text_bpe_tokens)
        d.orderBy(col("doc_id")).select(
            col("doc_id"),
            TextFns.fingerprint(col("text")).as("fp_md5"),
            col("source"))
      },
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5,
             |  source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Word-shingle inventory: n-gram extraction parity (positional slicing).
    QueryDef(
      "q_text_shingles",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 50)
        d.select(col("doc_id"), explode(TextFns.shingles(col("text"), 3)).as("shingle"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
               countDistinct(col("shingle")).as("n_unique"),
               min(col("shingle")).as("first_shingle"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents WHERE doc_id < 50),
             |sh AS (
             |  SELECT doc_id,
             |    array_to_string(toks[i.i + 1 : i.i + 3], ' ') AS shingle
             |  FROM t CROSS JOIN LATERAL (
             |    SELECT unnest(range(0, greatest(len(toks) - 3, 0) + 1)) AS i) i)
             |SELECT doc_id, count(*) AS n_shingles,
             |  count(DISTINCT shingle) AS n_unique, min(shingle) AS first_shingle
             |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Multimodal metadata with full oracle: text payload treated as an
    // opaque binary column; byte length + sha256 digest of the blob.
    QueryDef(
      "q_multimodal_meta",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        // sorted before the sha256 projection (see q_text_bpe_tokens)
        d.orderBy(col("doc_id")).select(
            col("doc_id"),
            octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
            sha2(col("text").cast("binary"), 256).as("sha"))
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  sha256(text) AS sha
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // REAL media decode through the mapPartitions plumbing: each doc gets a
    // synthetic-but-well-formed container payload (PNG/JPEG/GIF/BMP/WAV
    // headers built with pure byte-assembly SQL — unhex/concat — plus an
    // 'unknown' raw-text case), and Multimodal.HeaderDecoder parses the
    // bytes back. The oracle recomputes the embedded dimensions
    // arithmetically, so a parser that misreads any header field (endian,
    // offset, marker walk) hash-mismatches.
    QueryDef(
      "q_multimodal_decode",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        // sorted before staging+decode (see q_text_bpe_tokens)
        Multimodal.withMediaMeta(stagedMedia(d.orderBy(col("doc_id"))),
            "payload", Multimodal.HeaderDecoder)
          .select(col("doc_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"),
            col("format"))
      },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 6 IN (0, 1, 2, 3) THEN doc_id % 317 + 16 ELSE 0 END AS width,
             |  CASE WHEN doc_id % 6 IN (0, 1, 2, 3) THEN doc_id % 211 + 16 ELSE 0 END AS height,
             |  CASE WHEN doc_id % 6 IN (0, 1, 2, 3) THEN 1
             |       WHEN doc_id % 6 = 4 THEN doc_id % 211 + 16 ELSE 0 END AS n_frames,
             |  CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
             |       WHEN 3 THEN 'bmp' WHEN 4 THEN 'wav' ELSE 'unknown' END AS format
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame sampling over decoded media: every 25th frame of each WAV
    // payload, with its byte offset in the container (data chunk at 44,
    // block align 2 in the staged layout). Decode → decimate → per-frame
    // fan-out, the multimodal feature-extraction feed shape.
    QueryDef(
      "q_multimodal_frames",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val meta = Multimodal.withMediaMeta(stagedMedia(d), "payload",
          Multimodal.HeaderDecoder)
        Multimodal.frameSample(meta.filter(col("format") === "wav"), "n_frames", 25)
          .select(col("doc_id"), col("frame_idx"),
            (lit(44L) + col("frame_idx") * 2L).as("byte_offset"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id, CAST(i.f AS BIGINT) AS frame_idx,
             |  CAST(44 + i.f * 2 AS BIGINT) AS byte_offset
             |FROM documents CROSS JOIN LATERAL (
             |  SELECT unnest(range(0, doc_id % 211 + 16, 25)) AS f) i
             |WHERE doc_id % 6 = 4 ORDER BY doc_id, frame_idx""".stripMargin)),

    // End-to-end curation pipeline — the canonical training-data prep flow
    // as ONE declarative plan: quality banding → lang-ID → exact dedup →
    // per-(source, lang) corpus stats. Scale shape: every per-document
    // computation (tokens, bands, stopword scores, fingerprint) is
    // codegen'd map-side work over the scan; the `text` column is dropped
    // BEFORE the first shuffle, so the dedup groupBy moves only
    // (fp, doc_id, source, predicted, n_tokens) — at 100 TB the wide text
    // bytes never leave the mappers, and the whole job is two shuffles
    // (dedup keys, final stats).
    QueryDef(
      "q_pipeline_curation",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val nTok = TextFns.tokenCount(col("text"))
        val uniq = size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long")
        val scoreEn = TextFns.stopwordHits(col("text"), StopEn)
        val scoreData = TextFns.stopwordHits(col("text"), StopData)
        val staged = d.select(
            col("doc_id"), col("source"),
            nTok.as("n_tokens"),
            when(scoreEn >= scoreData, "en").otherwise("data").as("predicted"),
            when(nTok < 20, "short")
              .when(uniq.cast("double") / nTok.cast("double") < 0.3, "repetitive")
              .otherwise("ok").as("quality_band"),
            TextFns.fingerprint(col("text")).as("fp"))
          .filter(col("quality_band") === "ok")
        val kept = staged.groupBy(col("fp"))
          .agg(min_by(
            struct(col("doc_id"), col("source"), col("predicted"), col("n_tokens")),
            col("doc_id")).as("r"))
          .select(col("r.source").as("source"), col("r.predicted").as("predicted"),
            col("r.n_tokens").as("n_tokens"))
        kept.groupBy(col("source"), col("predicted"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"))
          // exact integer sum / count: bit-deterministic, unlike avg()'s
          // order-dependent double accumulation
          .withColumn("avg_tokens",
            col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .orderBy(col("source"), col("predicted"))
      },
      Some(s"""WITH staged AS (
              |  SELECT doc_id, source,
              |    len(regexp_extract_all(text, '\\S+')) AS n_tokens,
              |    CASE WHEN len(regexp_extract_all(lower(text), '\\b(${StopEn.mkString("|")})\\b'))
              |           >= len(regexp_extract_all(lower(text), '\\b(${StopData.mkString("|")})\\b'))
              |         THEN 'en' ELSE 'data' END AS predicted,
              |    CASE WHEN len(regexp_extract_all(text, '\\S+')) < 20 THEN 'short'
              |         WHEN CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
              |              / len(regexp_extract_all(text, '\\S+')) < 0.3 THEN 'repetitive'
              |         ELSE 'ok' END AS quality_band,
              |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
              |  FROM documents),
              |ok_docs AS (SELECT * FROM staged WHERE quality_band = 'ok'),
              |kept AS (SELECT min(doc_id) AS doc_id FROM ok_docs GROUP BY fp),
              |rows_kept AS (SELECT o.* FROM ok_docs o JOIN kept k ON o.doc_id = k.doc_id)
              |SELECT source, predicted,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
              |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
              |FROM rows_kept GROUP BY source, predicted
              |ORDER BY source, predicted""".stripMargin)),

    // REAL sample-level audio decode: each doc stages an 8-bit mono PCM
    // WAV whose sample bytes are the arithmetic ramp (doc_id*31 + i*7) %
    // 256 — Spark byte-assembles the container and PcmDecoder folds the
    // actual data-chunk bytes; DuckDB reproduces the features from the
    // same arithmetic. Integer sums → exact double ratios, so the hash
    // compare is strict.
    QueryDef(
      "q_multimodal_audio",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
          .orderBy(col("doc_id"))
        val nf = (col("doc_id") % 211 + 16).cast("int")
        val sampleHex = concat_ws("",
          transform(sequence(lit(0), nf - 1),
            i => lpad(hex((col("doc_id") * 31 + i * 7) % 256), 2, "0")))
        val wav = concat(
          unhex(lit("52494646")), le(nf + 36, 4), unhex(lit("57415645")),
          unhex(lit("666D7420")), le(lit(16), 4),                 // fmt chunk
          le(lit(1), 2), le(lit(1), 2), le(lit(8000), 4),         // pcm mono 8k
          le(lit(8000), 4), le(lit(1), 2), le(lit(8), 2),         // u8 samples
          unhex(lit("64617461")), le(nf, 4), unhex(sampleHex))
        Multimodal.withAudioStats(d.select(col("doc_id"), wav.as("payload")), "payload")
          .select(col("doc_id"), col("n_samples"), col("mean_amp"),
            col("rms_amp"), col("peak_amp"))
      },
      Some("""SELECT d.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_samples,
             |  CAST(sum((d.doc_id * 31 + g.i * 7) % 256) AS DOUBLE) / count(*) AS mean_amp,
             |  sqrt(CAST(sum(((d.doc_id * 31 + g.i * 7) % 256)
             |                * ((d.doc_id * 31 + g.i * 7) % 256)) AS DOUBLE)
             |       / count(*)) AS rms_amp,
             |  CAST(max((d.doc_id * 31 + g.i * 7) % 256) AS BIGINT) AS peak_amp
             |FROM documents d CROSS JOIN LATERAL (
             |  SELECT unnest(range(0, d.doc_id % 211 + 16)) AS i) g
             |WHERE d.doc_id < 300
             |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // Energy-based activity segmentation over the same staged WAVs (the
    // VAD-shaped pre-ASR gate): 16-sample frames, a frame is active iff
    // its integer mean-square energy >= 22000 (~ the uniform-byte
    // expectation, so actives and silences both occur); segments = maximal
    // active runs. The oracle replays frames with integer arithmetic and
    // rebuilds runs gaps-and-islands style.
    QueryDef(
      "q_multimodal_vad",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
          .orderBy(col("doc_id"))
        val nf = (col("doc_id") % 211 + 16).cast("int")
        val sampleHex = concat_ws("",
          transform(sequence(lit(0), nf - 1),
            i => lpad(hex((col("doc_id") * 31 + i * 7) % 256), 2, "0")))
        val wav = concat(
          unhex(lit("52494646")), le(nf + 36, 4), unhex(lit("57415645")),
          unhex(lit("666D7420")), le(lit(16), 4),
          le(lit(1), 2), le(lit(1), 2), le(lit(8000), 4),
          le(lit(8000), 4), le(lit(1), 2), le(lit(8), 2),
          unhex(lit("64617461")), le(nf, 4), unhex(sampleHex))
        Multimodal.withAudioSegments(
            d.select(col("doc_id"), wav.as("payload")), "payload", 16, 22000L)
          .select(col("doc_id"), col("n_frames"), col("n_active"),
            col("n_segments"), col("longest_run"))
      },
      Some("""WITH s AS (
             |  SELECT d.doc_id, g.i, (d.doc_id * 31 + g.i * 7) % 256 AS v
             |  FROM documents d CROSS JOIN LATERAL (
             |    SELECT unnest(range(0, d.doc_id % 211 + 16)) AS i) g
             |  WHERE d.doc_id < 300),
             |f AS (
             |  SELECT doc_id, i // 16 AS frame, sum(v * v) AS ss, count(*) AS c
             |  FROM s GROUP BY 1, 2),
             |fa AS (SELECT doc_id, frame, (ss >= 22000 * c) AS active FROM f),
             |isl AS (
             |  SELECT doc_id,
             |    frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS isl
             |  FROM fa WHERE active),
             |seg AS (SELECT doc_id, count(*) AS run FROM isl GROUP BY doc_id, isl),
             |segagg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
             |    CAST(max(run) AS BIGINT) AS longest_run
             |  FROM seg GROUP BY doc_id),
             |fagg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
             |    CAST(sum(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active
             |  FROM fa GROUP BY doc_id)
             |SELECT fagg.doc_id, n_frames, n_active,
             |  coalesce(n_segments, 0) AS n_segments,
             |  coalesce(longest_run, 0) AS longest_run
             |FROM fagg LEFT JOIN segagg ON fagg.doc_id = segagg.doc_id
             |ORDER BY fagg.doc_id""".stripMargin)),

    // REAL pixel-level image decode: each doc stages a w×h 24-bit BMP
    // (w=doc_id%8+2, h=doc_id%6+2) whose BGR channels carry three distinct
    // arithmetic ramps — B=(doc_id+3x+7y)%256, G=+85, R=+170 — with true
    // 4-byte row-stride padding. BmpPixelDecoder folds the actual pixel
    // bytes (a BGR-order or stride bug shifts a channel mean); DuckDB
    // reproduces the means from the same arithmetic.
    QueryDef(
      "q_multimodal_pixels",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
          .orderBy(col("doc_id"))
        val w = (col("doc_id") % 8 + 2).cast("int")
        val h = (col("doc_id") % 6 + 2).cast("int")
        val stride = (w * 3 + 3).bitwiseAND(lit(-4))
        val padHex = lit("000000").substr(lit(1), (stride - w * 3) * 2)
        val pixelsHex = concat_ws("",
          transform(sequence(lit(0), h - 1), y => concat(
            concat_ws("", transform(sequence(lit(0), w - 1), x => {
              val v = col("doc_id") + x * 3 + y * 7
              concat(hx(v), hx(v + 85), hx(v + 170))
            })),
            padHex)))
        val bmp = concat(
          unhex(lit("424D")), le(stride * h + 54, 4), unhex(lit("00000000")),
          le(lit(54), 4),                                        // data offset
          le(lit(40), 4), le(w, 4), le(h, 4),                    // info header
          le(lit(1), 2), le(lit(24), 2), le(lit(0), 4),          // planes/bits/BI_RGB
          le(stride * h, 4), unhex(lit("0000000000000000")),     // img size + ppm
          le(lit(0), 4), le(lit(0), 4),                          // palette counts
          unhex(pixelsHex))
        Multimodal.withImageStats(d.select(col("doc_id"), bmp.as("payload")), "payload")
          .select(col("doc_id"), col("n_pixels"), col("mean_b"),
            col("mean_g"), col("mean_r"))
      },
      Some("""SELECT d.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_pixels,
             |  CAST(sum((d.doc_id + gx.x * 3 + gy.y * 7) % 256) AS DOUBLE) / count(*) AS mean_b,
             |  CAST(sum((d.doc_id + gx.x * 3 + gy.y * 7 + 85) % 256) AS DOUBLE) / count(*) AS mean_g,
             |  CAST(sum((d.doc_id + gx.x * 3 + gy.y * 7 + 170) % 256) AS DOUBLE) / count(*) AS mean_r
             |FROM documents d
             |CROSS JOIN LATERAL (SELECT unnest(range(0, d.doc_id % 8 + 2)) AS x) gx
             |CROSS JOIN LATERAL (SELECT unnest(range(0, d.doc_id % 6 + 2)) AS y) gy
             |WHERE d.doc_id < 300
             |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // REAL PNG pixel decode through the zlib path: each doc stages a w×h
    // RGB PNG whose IDAT is a stored-block deflate stream (BTYPE=00 —
    // byte-assemblable in SQL, yet decoded by the same JDK Inflater that
    // handles compressed blocks from real encoders; the Deflater round-trip
    // and filters 1–4 are spec-covered). Channels carry the arithmetic
    // ramps R=(doc_id+3x+7y)%256, G=+85, B=+170, filter byte 0 per row;
    // an endian, filter-offset, or channel-order bug shifts a mean.
    QueryDef(
      "q_multimodal_pixels_png",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
          .orderBy(col("doc_id"))
        val w = (col("doc_id") % 8 + 2).cast("int")
        val h = (col("doc_id") % 6 + 2).cast("int")
        val rawHex = concat_ws("",
          transform(sequence(lit(0), h - 1), y => concat(
            lit("00"), // filter type None
            concat_ws("", transform(sequence(lit(0), w - 1), x => {
              val v = col("doc_id") + x * 3 + y * 7
              concat(hx(v), hx(v + 85), hx(v + 170))
            })))))
        val rawLen = h * (w * 3 + 1)
        val png = concat(
          unhex(lit("89504E470D0A1A0A")),
          be(lit(13), 4), unhex(lit("49484452")),            // IHDR
          be(w, 4), be(h, 4), unhex(lit("0802000000")),      // 8-bit RGB
          unhex(lit("00000000")),                            // crc (lenient)
          be(rawLen + 11, 4), unhex(lit("49444154")),        // IDAT
          unhex(lit("7801")),                                // zlib CM=8
          unhex(lit("01")), le(rawLen, 2),                   // final stored block
          le(rawLen.bitwiseXOR(lit(65535)), 2),              // NLEN
          unhex(rawHex),
          unhex(lit("00000000")),                            // adler (raw mode)
          unhex(lit("00000000")),                            // idat crc
          be(lit(0), 4), unhex(lit("49454E4400000000")))     // IEND
        Multimodal.withImageStats(d.select(col("doc_id"), png.as("payload")), "payload")
          .select(col("doc_id"), col("n_pixels"), col("mean_b"),
            col("mean_g"), col("mean_r"))
      },
      Some("""SELECT d.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_pixels,
             |  CAST(sum((d.doc_id + gx.x * 3 + gy.y * 7 + 170) % 256) AS DOUBLE) / count(*) AS mean_b,
             |  CAST(sum((d.doc_id + gx.x * 3 + gy.y * 7 + 85) % 256) AS DOUBLE) / count(*) AS mean_g,
             |  CAST(sum((d.doc_id + gx.x * 3 + gy.y * 7) % 256) AS DOUBLE) / count(*) AS mean_r
             |FROM documents d
             |CROSS JOIN LATERAL (SELECT unnest(range(0, d.doc_id % 8 + 2)) AS x) gx
             |CROSS JOIN LATERAL (SELECT unnest(range(0, d.doc_id % 6 + 2)) AS y) gy
             |WHERE d.doc_id < 300
             |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // REAL GIF pixel decode through the LZW path: each doc stages a w×h
    // GIF whose 128-entry global color table carries the arithmetic RGB
    // ramps palette[i] = ((2i)%256, (2i+85)%256, (2i+170)%256) and whose
    // index stream is clear + literal codes + EOI (min code size 7 keeps
    // every code an aligned byte — assemblable in SQL, yet decoded by the
    // same variable-width LZW loop that handles real encoders' dictionary
    // codes; the ImageIO round-trip is spec-covered). A bit-order, palette
    // -offset, or dictionary bug shifts a channel mean.
    QueryDef(
      "q_multimodal_pixels_gif",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
          .orderBy(col("doc_id"))
        val w = (col("doc_id") % 8 + 2).cast("int")
        val h = (col("doc_id") % 6 + 2).cast("int")
        val idxHex = concat_ws("",
          transform(sequence(lit(0), h - 1), y =>
            concat_ws("", transform(sequence(lit(0), w - 1), x =>
              hx((col("doc_id") + x * 3 + y * 7) % 128)))))
        val gif = concat(
          unhex(lit("474946383961")), le(w, 2), le(h, 2),      // GIF89a + screen
          unhex(lit("F60000")),                                // GCT(128), bg, aspect
          unhex(lit(GifPaletteHex)),
          unhex(lit("2C")), le(lit(0), 4), le(w, 2), le(h, 2), // image descriptor
          unhex(lit("0007")),                                  // no LCT; min code 7
          le(w * h + 2, 1),                                    // one data sub-block
          unhex(lit("80")), unhex(idxHex), unhex(lit("81")),   // clear, literals, EOI
          unhex(lit("003B")))                                  // terminator + trailer
        Multimodal.withImageStats(d.select(col("doc_id"), gif.as("payload")), "payload")
          .select(col("doc_id"), col("n_pixels"), col("mean_b"),
            col("mean_g"), col("mean_r"))
      },
      Some("""SELECT d.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_pixels,
             |  CAST(sum(((d.doc_id + gx.x * 3 + gy.y * 7) % 128 * 2 + 170) % 256) AS DOUBLE)
             |    / count(*) AS mean_b,
             |  CAST(sum(((d.doc_id + gx.x * 3 + gy.y * 7) % 128 * 2 + 85) % 256) AS DOUBLE)
             |    / count(*) AS mean_g,
             |  CAST(sum((d.doc_id + gx.x * 3 + gy.y * 7) % 128 * 2 % 256) AS DOUBLE)
             |    / count(*) AS mean_r
             |FROM documents d
             |CROSS JOIN LATERAL (SELECT unnest(range(0, d.doc_id % 8 + 2)) AS x) gx
             |CROSS JOIN LATERAL (SELECT unnest(range(0, d.doc_id % 6 + 2)) AS y) gy
             |WHERE d.doc_id < 300
             |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // REAL JPEG pixel decode through the JDK codec (entropy decode + IDCT):
    // each doc stages a solid-color w×h JPEG (encode is deterministic but
    // LOSSY, so exact means aren't SQL-recomputable); the oracle contract is
    // a tolerance assertion instead — solid color makes the round-trip
    // error ≤2 per channel mean (constant chroma subsamples losslessly),
    // so `ok` = all channels within 6 must be TRUE for every row, which
    // DuckDB predicts exactly. A codec failure or channel swap flips ok.
    QueryDef(
      "q_multimodal_pixels_jpeg",
      (s, dir) => {
        import s.implicits._
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
          .orderBy(col("doc_id"))
        val staged = d.select(col("doc_id")).as[Long].mapPartitions { it =>
          it.map { id =>
            val w = (id % 8 + 8).toInt; val h = (id % 6 + 8).toInt
            (id, Multimodal.JpegStager.solid(w, h,
              ((id * 3) % 256).toInt, ((id * 5 + 85) % 256).toInt,
              ((id * 7 + 170) % 256).toInt))
          }
        }.toDF("doc_id", "payload")
        Multimodal.withImageStats(staged, "payload")
          .select(col("doc_id"), col("n_pixels"),
            (abs(col("mean_r") - (col("doc_id") * 3 % 256)) <= 6 &&
             abs(col("mean_g") - (col("doc_id") * 5 + 85) % 256) <= 6 &&
             abs(col("mean_b") - (col("doc_id") * 7 + 170) % 256) <= 6).as("ok"))
      },
      Some("""SELECT doc_id,
             |  CAST((doc_id % 8 + 8) * (doc_id % 6 + 8) AS BIGINT) AS n_pixels,
             |  TRUE AS ok
             |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin)),

    // REAL MP4 container metadata through the ISO BMFF box walk: each doc
    // stages a minimal-but-to-spec MP4 (ftyp + moov{mvhd + trak{tkhd +
    // mdia/minf/stbl/stts}}) with doc_id-derived dimensions (16.16 fixed in
    // tkhd) and frame count (stts sample sum) — byte-assembled in SQL with
    // exact box sizes, so a size-accounting, fixed-point, or recursion bug
    // breaks the parse. DuckDB predicts the decoded metadata arithmetically.
    QueryDef(
      "q_multimodal_video",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
          .orderBy(col("doc_id"))
        val w = (col("doc_id") % 317 + 16).cast("int")
        val h = (col("doc_id") % 211 + 16).cast("int")
        val nf = (col("doc_id") % 97 + 10).cast("int")
        val dur = nf * 40 // 25 fps at timescale 1000
        val matrixHex =
          "000100000000000000000000000000000001000000000000000000000000000040000000"
        val mp4 = concat(
          unhex(lit("000000106674797069736F6D00000000")),     // ftyp isom
          unhex(lit("000001086D6F6F76")),                     // moov (264)
          unhex(lit("0000006C6D766864" + "00000000" * 3)),    // mvhd v0, times 0
          be(lit(1000), 4), be(dur, 4),                       // timescale, duration
          unhex(lit("000100000100" + "00" * 10 + matrixHex + "00" * 24 + "00000002")),
          unhex(lit("000000947472616B")),                     // trak (148)
          unhex(lit("0000005C746B6864" + "00000007" +        // tkhd v0, flags 7
            "00000000" * 2 + "00000001" + "00000000")),       // times, id 1, rsvd
          be(dur, 4), unhex(lit("00" * 16 + matrixHex)),      // dur, layer.., matrix
          be(w, 2), unhex(lit("0000")), be(h, 2), unhex(lit("0000")), // 16.16 dims
          unhex(lit("000000306D646961000000286D696E66000000207374626C")),
          unhex(lit("0000001873747473" + "00000000" + "00000001")), // stts, 1 entry
          be(nf, 4), unhex(lit("00000001")))                  // count, delta
        Multimodal.withMediaMeta(d.select(col("doc_id"), mp4.as("payload")),
            "payload", Multimodal.HeaderDecoder)
          .select(col("doc_id"), col("width"), col("height"),
            col("n_frames"), col("format"))
      },
      Some("""SELECT doc_id,
             |  CAST(doc_id % 317 + 16 AS INTEGER) AS width,
             |  CAST(doc_id % 211 + 16 AS INTEGER) AS height,
             |  CAST(doc_id % 97 + 10 AS INTEGER) AS n_frames,
             |  'mp4' AS format
             |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin)),

    // REAL video FRAME decode for Motion-JPEG MP4: each doc stages an MP4
    // whose mdat holds nf solid-color JPEG frames located by to-spec sample
    // tables (stsd 'jpeg' + stsz/stsc/stco); MjpegDecoder walks the tables,
    // decodes every frame through the JDK codec, and pools channel sums
    // across frames. A sample-table bug (chunk-offset, size accounting,
    // stsc run expansion) loses or misreads frames; a codec bug shifts a
    // mean. Solid frames bound the lossy round-trip, so `ok` (all channel
    // means within 6 of the staged average) is TRUE for every row, which
    // DuckDB predicts exactly along with the frame and pixel counts.
    QueryDef(
      "q_multimodal_mjpeg",
      (s, dir) => {
        import s.implicits._
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
          .orderBy(col("doc_id"))
        val staged = d.select(col("doc_id")).as[Long].mapPartitions { it =>
          it.map { id =>
            val w = (id % 8 + 8).toInt; val h = (id % 6 + 8).toInt
            val nf = (id % 5 + 2).toInt
            val colors = (0 until nf).map { j =>
              (((id * 3 + j * 17) % 256).toInt,
               ((id * 5 + 85 + j * 17) % 256).toInt,
               ((id * 7 + 170 + j * 17) % 256).toInt)
            }
            (id, Multimodal.MjpegStager.stage(w, h, colors),
             colors.map(_._1).sum.toDouble / nf,
             colors.map(_._2).sum.toDouble / nf,
             colors.map(_._3).sum.toDouble / nf)
          }
        }.toDF("doc_id", "payload", "exp_r", "exp_g", "exp_b")
        Multimodal.withVideoStats(staged, "payload")
          .select(col("doc_id"), col("n_frames_decoded"), col("n_pixels"),
            (abs(col("mean_r") - col("exp_r")) <= 6 &&
             abs(col("mean_g") - col("exp_g")) <= 6 &&
             abs(col("mean_b") - col("exp_b")) <= 6).as("ok"))
      },
      Some("""SELECT doc_id,
             |  CAST(doc_id % 5 + 2 AS INTEGER) AS n_frames_decoded,
             |  CAST((doc_id % 5 + 2) * (doc_id % 8 + 8) * (doc_id % 6 + 8) AS BIGINT)
             |    AS n_pixels,
             |  TRUE AS ok
             |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin)),

    // AUDIO near-dup by energy-profile hash (the 1-D dHash twin): 25
    // groups of staged 8-bit PCM WAVs (130 samples = 65 windows of exactly
    // 2) share a per-group waveform; every 4th doc perturbs the FIRST
    // window (+60 on samples 0-1), which only bit 0 compares — within a
    // group Hamming ≤ 1. audioNearDup walks the RIFF chunks, pools
    // |v-128| amplitude into exact integer windows, bands the 64-bit hash
    // and verifies Hamming ≤ 2; DuckDB replays samples → windows → bits →
    // bands → pairs arithmetically (HUGEINT hash assembly, like phash).
    QueryDef(
      "q_multimodal_audiohash",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 200)
        val g = col("doc_id") % 25
        val delta = when(col("doc_id") % 4 === 0, lit(60)).otherwise(lit(0))
        val sampleHex = concat_ws("",
          transform(sequence(lit(0), lit(129)), i =>
            hx(g * 31 + i * 7 + when(i < 2, delta).otherwise(lit(0)))))
        val wav = concat(
          unhex(lit("52494646")), le(lit(130 + 36), 4), unhex(lit("57415645")),
          unhex(lit("666D7420")), le(lit(16), 4),                 // fmt chunk
          le(lit(1), 2), le(lit(1), 2), le(lit(8000), 4),         // pcm mono 8k
          le(lit(8000), 4), le(lit(1), 2), le(lit(8), 2),         // u8 samples
          unhex(lit("64617461")), le(lit(130), 4), unhex(sampleHex))
        Dedup.audioNearDup(d.select(col("doc_id"), wav.as("payload")),
            "doc_id", "payload", maxHamming = 2)
          .repartition(1).sortWithinPartitions(col("a_id"), col("b_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, doc_id % 25 AS g,
             |    CASE WHEN doc_id % 4 = 0 THEN 60 ELSE 0 END AS dd
             |  FROM documents WHERE doc_id < 200),
             |amp AS (
             |  SELECT doc_id, i.i // 2 AS w,
             |    abs((g * 31 + i.i * 7 +
             |         CASE WHEN i.i < 2 THEN dd ELSE 0 END) % 256 - 128) AS a
             |  FROM d, (SELECT unnest(range(0, 130)) AS i) i),
             |wins AS (
             |  SELECT doc_id, w, CAST(sum(a) AS BIGINT) AS e
             |  FROM amp GROUP BY doc_id, w),
             |bits AS (
             |  SELECT a.doc_id, a.w, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
             |  FROM wins a JOIN wins b ON b.doc_id = a.doc_id AND b.w = a.w + 1
             |  WHERE a.w < 64),
             |hash AS (
             |  SELECT doc_id,
             |    CAST(CASE WHEN hs >= CAST(9223372036854775808 AS HUGEINT)
             |              THEN hs - CAST(18446744073709551616 AS HUGEINT)
             |              ELSE hs END AS BIGINT) AS sh
             |  FROM (SELECT doc_id, sum(bit * (CAST(1 AS HUGEINT) << w)) AS hs
             |        FROM bits GROUP BY doc_id)),
             |banded AS (
             |  SELECT doc_id, sh, b.band AS band, (sh >> (b.band * 16)) & 65535 AS band_key
             |  FROM hash, (SELECT unnest(range(0, 4)) AS band) b),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
             |  FROM banded a JOIN banded b USING (band, band_key)
             |  WHERE a.doc_id < b.doc_id)
             |SELECT a_id, b_id, CAST(bit_count(xor(ash, bsh)) AS BIGINT) AS hamming
             |FROM cand WHERE bit_count(xor(ash, bsh)) <= 2
             |ORDER BY a_id, b_id""".stripMargin)),

    // IMAGE near-dup by perceptual hash (dHash): 25 groups of staged 18×16
    // BMPs share a per-group pixel pattern; every 4th doc perturbs ONE
    // pixel (+120 on (0,0)) — a re-encode-scale edit that byte dedup would
    // miss but moves at most one dHash bit (pixel (0,0) only feeds cell
    // (0,0), which only bit (0,0) compares). imageNearDup decodes via the
    // JDK codec (BI_RGB is lossless), pools exact integer cells, bands the
    // 64-bit hash, verifies Hamming ≤ 2. DuckDB replays pixels → cells →
    // bits → bands → pairs arithmetically; BMP rows are staged bottom-up
    // (file row k = image row 15-k) so the oracle's top-down y matches the
    // decoded raster.
    QueryDef(
      "q_multimodal_phash",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 200)
        val g = col("doc_id") % 25
        val delta = when(col("doc_id") % 4 === 0, lit(120)).otherwise(lit(0))
        val stride = 56 // 18*3 = 54, padded to the 4-byte boundary
        val pixelsHex = concat_ws("",
          transform(sequence(lit(0), lit(15)), yf => {
            val y = lit(15) - yf // bottom-up storage
            concat(
              concat_ws("", transform(sequence(lit(0), lit(17)), x => {
                val v = g * 7 + x * 13 + y * 29 +
                  when(x === 0 && y === 0, delta).otherwise(lit(0))
                concat(hx(v), hx(v), hx(v))
              })),
              lit("0000")) // 2-byte stride padding
          }))
        val bmp = concat(
          unhex(lit("424D")), le(lit(stride * 16 + 54), 4), unhex(lit("00000000")),
          le(lit(54), 4),
          le(lit(40), 4), le(lit(18), 4), le(lit(16), 4),
          le(lit(1), 2), le(lit(24), 2), le(lit(0), 4),
          le(lit(stride * 16), 4), unhex(lit("0000000000000000")),
          le(lit(0), 4), le(lit(0), 4),
          unhex(pixelsHex))
        Dedup.imageNearDup(d.select(col("doc_id"), bmp.as("payload")),
            "doc_id", "payload", maxHamming = 2)
          .repartition(1).sortWithinPartitions(col("a_id"), col("b_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, doc_id % 25 AS g,
             |    CASE WHEN doc_id % 4 = 0 THEN 120 ELSE 0 END AS dd
             |  FROM documents WHERE doc_id < 200),
             |pix AS (
             |  SELECT doc_id, x.x // 2 AS c, y.y // 2 AS r,
             |    3 * ((g * 7 + x.x * 13 + y.y * 29 +
             |          CASE WHEN x.x = 0 AND y.y = 0 THEN dd ELSE 0 END) % 256) AS gray
             |  FROM d,
             |    (SELECT unnest(range(0, 18)) AS x) x,
             |    (SELECT unnest(range(0, 16)) AS y) y),
             |cells AS (
             |  SELECT doc_id, r, c, CAST(sum(gray) AS BIGINT) AS s
             |  FROM pix GROUP BY doc_id, r, c),
             |bits AS (
             |  SELECT a.doc_id, a.r, a.c, CASE WHEN b.s > a.s THEN 1 ELSE 0 END AS bit
             |  FROM cells a
             |  JOIN cells b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
             |  WHERE a.c < 8),
             |hash AS (
             |  -- assemble in HUGEINT (1<<63 overflows BIGINT), then fold
             |  -- to the two's-complement int64 Spark's long carries
             |  SELECT doc_id,
             |    CAST(CASE WHEN hs >= CAST(9223372036854775808 AS HUGEINT)
             |              THEN hs - CAST(18446744073709551616 AS HUGEINT)
             |              ELSE hs END AS BIGINT) AS sh
             |  FROM (SELECT doc_id,
             |          sum(bit * (CAST(1 AS HUGEINT) << (r * 8 + c))) AS hs
             |        FROM bits GROUP BY doc_id)),
             |banded AS (
             |  SELECT doc_id, sh, b.band AS band, (sh >> (b.band * 16)) & 65535 AS band_key
             |  FROM hash, (SELECT unnest(range(0, 4)) AS band) b),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sh AS ash, b.sh AS bsh
             |  FROM banded a JOIN banded b USING (band, band_key)
             |  WHERE a.doc_id < b.doc_id)
             |SELECT a_id, b_id, CAST(bit_count(xor(ash, bsh)) AS BIGINT) AS hamming
             |FROM cand WHERE bit_count(xor(ash, bsh)) <= 2
             |ORDER BY a_id, b_id""".stripMargin)),

    // Unicode NFC normalization + whitespace/case canonicalization — the
    // standard first curation step. Staged text appends a decomposed
    // sequence (e + COMBINING ACUTE, bytes 65 CC 81) and a precomposed é
    // (C3 A9) plus ragged whitespace; after NFC both spell the same
    // codepoint, so len_norm drops by exactly the composed pairs. DuckDB's
    // nfc_normalize implements the same Unicode algorithm.
    QueryDef(
      "q_text_normalize",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 200)
          .orderBy(col("doc_id"))
        val raw = concat(
          substring(col("text"), 1, 30), lit(" CAF"),
          decode(unhex(lit("65CC81")), "UTF-8"),     // e + combining acute
          lit("  Mixed   CASE "),
          decode(unhex(lit("C3A9")), "UTF-8"))       // precomposed é
        d.select(col("doc_id"),
            raw.as("raw"),
            trim(regexp_replace(lower(TextFns.nfc(raw)), "\\s+", " ")).as("norm_text"))
          .select(col("doc_id"), col("norm_text"),
            length(col("raw")).cast("long").as("len_raw"),
            length(col("norm_text")).cast("long").as("len_norm"))
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    substr(text, 1, 30) || ' CAF' || 'e' || chr(769)
             |      || '  Mixed   CASE ' || chr(233) AS raw
             |  FROM documents WHERE doc_id < 200),
             |n AS (
             |  SELECT doc_id, raw,
             |    trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g')) AS norm_text
             |  FROM staged)
             |SELECT doc_id, norm_text,
             |  CAST(length(raw) AS BIGINT) AS len_raw,
             |  CAST(length(norm_text) AS BIGINT) AS len_norm
             |FROM n ORDER BY doc_id""".stripMargin)),

    // End-to-end multimodal curation: decode headers → resolution gates for
    // images (width AND height ≥ 100) / duration gate for audio (≥ 100
    // frames) → per-format survivor stats. The q_pipeline_curation shape
    // for the multimodal side: decode is map-side over the blob scan, the
    // gate is a codegen'd projection, and only the narrow per-format
    // aggregate ever shuffles.
    QueryDef(
      "q_pipeline_multimodal",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val meta = Multimodal.withMediaMeta(stagedMedia(d), "payload",
          Multimodal.HeaderDecoder)
        meta
          .withColumn("keep",
            (col("format").isin("png", "jpeg", "gif", "bmp") &&
              col("width") >= 100 && col("height") >= 100) ||
            (col("format") === "wav" && col("n_frames") >= 100))
          .groupBy(col("format"))
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            coalesce(
              avg(when(col("keep"),
                col("width").cast("long") * col("height"))), lit(0.0))
              .as("avg_kept_pixels"))
          .orderBy(col("format"))
      },
      Some("""WITH meta AS (
             |  SELECT doc_id,
             |    CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
             |         WHEN 3 THEN 'bmp' WHEN 4 THEN 'wav' ELSE 'unknown' END AS format,
             |    CASE WHEN doc_id % 6 IN (0, 1, 2, 3) THEN doc_id % 317 + 16 ELSE 0 END AS width,
             |    CASE WHEN doc_id % 6 IN (0, 1, 2, 3) THEN doc_id % 211 + 16 ELSE 0 END AS height,
             |    CASE WHEN doc_id % 6 IN (0, 1, 2, 3) THEN 1
             |         WHEN doc_id % 6 = 4 THEN doc_id % 211 + 16 ELSE 0 END AS n_frames
             |  FROM documents),
             |gated AS (
             |  SELECT *,
             |    (format IN ('png', 'jpeg', 'gif', 'bmp') AND width >= 100 AND height >= 100)
             |     OR (format = 'wav' AND n_frames >= 100) AS keep
             |  FROM meta)
             |SELECT format,
             |  CAST(count(*) AS BIGINT) AS n_total,
             |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  coalesce(avg(CASE WHEN keep THEN CAST(width * height AS BIGINT) END), 0.0)
             |    AS avg_kept_pixels
             |FROM gated GROUP BY format ORDER BY format""".stripMargin)),

    // BPE training statistic: the adjacent symbol-pair frequency table
    // over the word-count relation (chars + </w> end marker) — the exact
    // quantity each merge round maximizes. Fully declarative on the Spark
    // side (explode + two hash aggs); DuckDB replays it verbatim. The
    // trainer itself (Tokenizer.bpeTrain, driver-side over this bounded
    // table) and the rank-priority encoder stay TokenizerSpec-golden.
    QueryDef(
      "q_text_bpe_pairs",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        graft.operators.Tokenizer.pairCounts(
            graft.operators.Tokenizer.wordCounts(d, "text"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(100)
      },
      Some("""WITH tok AS (
             |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |         t -> t <> '')) AS word
             |  FROM documents),
             |w AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY word),
             |sy AS (SELECT word, cnt,
             |         list_append(regexp_extract_all(word, '.'), '</w>') AS syms FROM w),
             |pr AS (SELECT syms[i.i] AS a, syms[i.i + 1] AS b, cnt
             |       FROM sy, LATERAL (SELECT unnest(range(1, len(syms))) AS i) i)
             |SELECT a, b, CAST(sum(cnt) AS BIGINT) AS cnt
             |FROM pr GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 100""".stripMargin)),

    // End-to-end tokenizer pass: train 30 merges on the corpus word table,
    // broadcast the merge ranks, encode every doc map-side, report the
    // piece vocabulary (top-50 by frequency). The trained merges are data-
    // derived (not SQL-recomputable), so the oracle is a STAGED GOLDEN:
    // the expected output is a committed parquet fixture per SF
    // (src/test/resources/golden/, regenerated by tools/stage_goldens.sh)
    // that DuckDB reads and the driver hash-compares like any other row.
    // The SF is selected by the corpus's total text bytes — a content key,
    // since sf0.001 and sf0.01 share a row count. TokenizerSpec pins the
    // algorithm itself with hand-computed goldens.
    QueryDef(
      "q_text_bpe_encode",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val merges = graft.operators.Tokenizer.bpeTrain(
          graft.operators.Tokenizer.wordCounts(d, "text"), numMerges = 30)
        graft.operators.Tokenizer.bpeEncode(d, "doc_id", "text", merges)
          .select(explode(col("pieces")).as("piece"))
          .groupBy(col("piece"))
          .agg(count(lit(1)).cast("long").as("cnt"))
          .orderBy(col("cnt").desc, col("piece"))
          .limit(50)
      },
      Some(TextQueries.stagedGolden("q_text_bpe_encode", "piece, cnt"))),

    // Compression-ratio quality signal (RefinedWeb/CCNet heuristic family):
    // deflate_len/n_bytes separates boilerplate-repetitive text from prose
    // with zero linguistic machinery. Docs on id%5=0 are staged repetitive
    // (first 10 chars × 30) so both bands appear. Compressed length is
    // codec-implementation-specific (not SQL-recomputable) — the oracle is
    // a STAGED GOLDEN parquet fixture per SF (see q_text_bpe_encode note;
    // regenerate with tools/stage_goldens.sh); SearchSpec pins determinism,
    // band separation, null safety.
    QueryDef(
      "q_text_deflate",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        // sorted before the deflate projection (see q_text_bpe_tokens)
        val staged = d.orderBy(col("doc_id")).select(col("doc_id"),
          when(col("doc_id") % 5 === 0, repeat(substring(col("text"), 1, 10), 30))
            .otherwise(col("text")).as("text"))
        staged.select(col("doc_id"),
            octet_length(col("text")).cast("long").as("n_bytes"),
            graft.functions.TextFns.deflateLen(col("text")).as("deflate_bytes"))
          .withColumn("ratio_pm", expr("(1000 * deflate_bytes) div n_bytes"))
          .withColumn("band",
            when(col("ratio_pm") < 200, "repetitive").otherwise("prose"))
      },
      Some(TextQueries.stagedGolden("q_text_deflate",
        "doc_id, n_bytes, deflate_bytes, ratio_pm, band")))
  )

  /** Staged-golden oracle SQL: the expected output lives as a committed
    * parquet fixture per SF (src/test/resources/golden/<q>_sf<sf>.parquet,
    * written by tools/stage_goldens.sh from the query's own deterministic
    * output); DuckDB selects the fixture matching the corpus under test by
    * its TOTAL TEXT BYTES (a content key — sf0.001 and sf0.01 share a row
    * count) and the driver hash-compares it like any SQL-recomputed oracle.
    * An unknown corpus matches no branch → zero oracle rows → a loud
    * row-count mismatch, never a silent pass.
    */
  /** Golden-fixture directory, resolved per checkout (never a hardcoded
    * absolute path): `-Dgraft.golden.dir` wins; else the working
    * directory's `src/test/resources/golden` (Verify/sbt run from the repo
    * root); else walk up from the compiled-classes location (classes sit
    * at `target/scala-2.13/...` inside the repo) until the directory
    * appears. Resolution happens when the oracle SQL is GENERATED — in
    * this JVM — so the SQL the driver hands DuckDB always carries a path
    * valid for the checkout that produced it.
    */
  private[queries] lazy val goldenDir: String = {
    val rel = "src/test/resources/golden"
    sys.props.get("graft.golden.dir")
      .orElse {
        val cwd = new java.io.File(rel)
        if (cwd.isDirectory) Some(cwd.getAbsolutePath) else None
      }
      .orElse {
        val code = new java.io.File(
          getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
        Iterator.iterate(code)(_.getParentFile).takeWhile(_ != null).take(8)
          .map(p => new java.io.File(p, rel))
          .collectFirst { case d if d.isDirectory => d.getAbsolutePath }
      }
      .getOrElse(new java.io.File(rel).getAbsolutePath)
  }

  private[queries] def stagedGolden(q: String, cols: String): String = {
    val dir = goldenDir
    Seq("0.001" -> 153156L, "0.01" -> 149174L, "0.1" -> 1485576L)
      .map { case (sf, key) =>
        s"""SELECT $cols FROM read_parquet('$dir/${q}_sf$sf.parquet')
           |WHERE (SELECT sum(strlen(text)) FROM documents) = $key""".stripMargin }
      .mkString("\nUNION ALL\n")
  }
}
