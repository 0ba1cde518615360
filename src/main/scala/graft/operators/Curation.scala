package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: repetition/quality gates (the Gopher-rule
  * family), PII redaction, benchmark decontamination, and token-window
  * chunking. All four are pure DataFrame transforms built from codegen'd
  * Spark functions — no UDFs — with documented shuffle shapes, so every
  * output is DuckDB-oracle-expressible and the plans hold at corpus scale.
  */
object Curation {

  /** Repetition/shape statistics behind the classic quality gates (the
    * Gopher-rule family: token length bounds, max-word-dominance,
    * duplicate-n-gram fraction): per doc,
    *   - n_tokens, mean_token_len
    *   - top_token_frac: occurrences of the most frequent token / n_tokens
    *     (tie irrelevant — it is a max over counts)
    *   - top_bigram_frac: same over word bigrams
    *   - hapax_ratio: tokens occurring exactly once / distinct tokens
    *
    * Scale shape: one explode to narrow (id, token) rows — the wide text
    * column never shuffles — then two hash aggregations
    * (id, token) → (id). Per-doc memory is O(1); nothing is quadratic in
    * document length (the naive higher-order-function form is O(L²) per
    * doc — fine on toy rows, a stall on 100 KB documents).
    */
  def gopherStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NO spreadForCompute here (round 17, measured): the token and bigram
    // stat families execute as PARALLEL independent subtrees over the scan
    // (the r16 single-scan lesson) — a spread exchange in front serialized
    // them behind a barrier and read +22% (q_text_gopher A/B)
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    val toks = base.select(col("doc_id"),
      explode(TextFns.tokens(col("__text"))).as("tok"))
    val tokStats = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"), sum(length(col("tok")).cast("long")).as("chars"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        (sum(col("chars")).cast("double") / sum(col("c"))).as("mean_token_len"),
        (max(col("c")).cast("double") / sum(col("c"))).as("top_token_frac"),
        (sum(when(col("c") === 1, 1L).otherwise(0L)).cast("double")
          / count(lit(1))).as("hapax_ratio"))
    val bigrams = base.select(col("doc_id"),
      explode(TextFns.shingles(col("__text"), 2)).as("bg"))
    val bgStats = bigrams.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("top_bigram_frac"))
    // left join: a 1-token doc has no bigrams — frac 0, not a dropped row
    tokStats.join(bgStats, Seq("doc_id"), "left_outer")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }

  /** Duplicate-n-gram character fraction — the remaining Gopher repetition
    * gate (`fraction of characters in duplicate n-grams`): per doc, the
    * share of n-gram characters whose n-gram occurs more than once. Each
    * occurrence weighs its full character length, so a doc that is one
    * phrase repeated 50× scores ~1.0 while organic prose stays near 0.
    * Docs shorter than n tokens have no n-grams → 0.0 (kept, like the
    * gopherStats bigram convention).
    *
    * Scale shape: same as gopherStats — explode to narrow (id, shingle)
    * rows (the wide text never shuffles), two hash aggregations, integer
    * sums divided once. Nothing quadratic in document length.
    */
  def dupNgramCharFrac(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      explode(TextFns.shingles(col(textCol), n)).as("sh"))
    val perDoc = sh.groupBy(col("doc_id"), col("sh"))
      .agg(count(lit(1)).as("c"), max(length(col("sh"))).cast("long").as("l"))
      .groupBy(col("doc_id"))
      .agg((sum(when(col("c") > 1, col("c") * col("l")).otherwise(0L)).cast("double")
        / sum(col("c") * col("l"))).as("dup_ngram_char_frac"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left_outer")
      .withColumn("dup_ngram_char_frac",
        coalesce(col("dup_ngram_char_frac"), lit(0.0)))
  }

  /** PII regexes shared by the Spark and oracle sides: plain RE2-safe
    * alternation-free patterns (no lookarounds, no backrefs) so Java regex
    * and DuckDB's RE2 match identically.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Scrub emails, NANP-shaped phone numbers and IPv4 literals from
    * `textCol`, appending per-category hit counts. Order matters and is
    * fixed: emails first (an address can embed digits), then phones, then
    * IPs (the phone pattern cannot match a dotted quad and vice versa —
    * separators differ). Pure regexp_replace/regexp_count projection:
    * map-side only, codegen'd, no shuffle.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), lit(EmailRe), lit("[EMAIL]")),
          lit(PhoneRe), lit("[PHONE]")),
        lit(Ipv4Re), lit("[IP]"))
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRe)).cast("long"))
      .withColumn("n_ips", regexp_count(col(textCol), lit(Ipv4Re)).cast("long"))
      .withColumn("redacted", scrubbed)
  }

  /** Re-identification risk gates for released datasets (the datacard
    * privacy row): k-anonymity — every quasi-identifier combination must
    * describe at least k rows — and l-diversity — each combination must
    * carry at least l distinct values of the sensitive column (a k-sized
    * group with one sensitive value still discloses it). One hash
    * aggregation on the quasi-identifier key; exact distinct per group is
    * fine because l is small and the count is per-group, not global.
    * Returns one row per quasi-identifier group with both measures and
    * the combined pass flag; join back on the quasi columns to drop or
    * generalize violating rows.
    */
  def anonymityRisk(df: DataFrame, quasiCols: Seq[String],
                    sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1,
      s"need quasi columns and k,l >= 1 (got k=$k l=$l)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("sensitive_distinct"))
      .withColumn("k_anonymous", col("group_n") >= k)
      .withColumn("l_diverse", col("sensitive_distinct") >= l)
      .withColumn("pass", col("k_anonymous") && col("l_diverse"))
  }

  /** Benchmark decontamination: count, per document, the distinct word
    * `n`-grams it shares with a probe corpus (the eval/benchmark set), and
    * flag docs at `minOverlap`. The standard training-data hygiene pass —
    * a doc that reproduces benchmark n-grams leaks eval data.
    *
    * Scale shape: the probe side is the SMALL side (eval sets are KBs–MBs)
    * — its distinct shingles broadcast; the doc side explodes to narrow
    * (id, shingle) rows (text never shuffles), semi-joins the broadcast
    * set map-side, and one aggregation per doc remains. Docs with zero
    * overlap are restored by a left join against the id spine so the
    * output is total (every doc gets a row — gates need a verdict, not
    * just offenders).
    */
  def contamination(docs: DataFrame, probes: DataFrame, idCol: String,
                    textCol: String, n: Int, minOverlap: Long): DataFrame = {
    val probeShingles = probes
      .select(explode(array_distinct(TextFns.shingles(col(textCol), n))).as("sh"))
      .distinct()
    val docShingles = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFns.shingles(col(textCol), n))).as("sh"))
    val hits = docShingles
      .join(broadcast(probeShingles), Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    docs.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left_outer")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** Token-window chunking: cut each document into training sequences of
    * `size` tokens starting every `stride` tokens (stride < size ⇒
    * overlapping context windows, the standard LM packing prep). Emits
    * (doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text). The final
    * partial window is kept — downstream packing (Packing.packGreedy)
    * decides padding, not the chunker.
    *
    * Pure generator projection: tokens once per doc, posexplode over the
    * arithmetic start sequence, slice + array_join — map-side codegen, no
    * shuffle, output rows ≈ n_tokens/stride per doc.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size], got $stride (size $size)")
    val toks = df.select(col(idCol).as("doc_id"), TextFns.tokens(col(textCol)).as("toks"))
      // split(trim(''), '\s+') yields [""] (size 1), NOT an empty array —
      // an empty/whitespace-only doc must count 0 tokens or the filter
      // below never fires and a spurious empty chunk reaches packing
      .withColumn("n_toks",
        when(element_at(col("toks"), 1) === "", lit(0))
          .otherwise(size_(col("toks"))))
    toks
      // empty/whitespace-only (and NULL-text) docs emit no chunks — the
      // oracle's `trim(text) <> ''` filter, matched here
      .filter(col("n_toks") > 0)
      .select(col("doc_id"), col("toks"), col("n_toks"),
        posexplode(sequence(lit(0), greatest(col("n_toks") - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(size), col("n_toks") - col("start_tok")).cast("long").as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(size)), " ").as("chunk_text"))
  }

  /** Corpus-level line deduplication (the CCNet / RefinedWeb boilerplate
    * pass): a line whose trimmed form appears in at least `maxDocFreq`
    * DISTINCT documents is boilerplate (nav bars, cookie banners,
    * copyright footers) and is dropped from EVERY document; all other
    * lines keep their original order. Blank lines are layout, not
    * content — never counted and never dropped. Output is total: one row
    * per input doc with (clean_text, n_kept, n_dropped); a doc whose
    * every line is boilerplate survives with an empty clean_text.
    *
    * Scale shape: lines explode map-side to (doc_id, pos, line); the
    * document-frequency aggregation shuffles only (md5(line), doc_id) —
    * 16-byte keys, never the line text. Boilerplate is by definition the
    * high-frequency tail of that aggregate, so the surviving set is tiny
    * (bounded by corpus_lines / maxDocFreq distinct values) and
    * BROADCASTS back — the drop itself is a map-side hash probe, not a
    * join shuffle. The only wide shuffle is the unavoidable reassembly
    * groupBy(doc_id); per-doc state there is bounded by document size.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                maxDocFreq: Int): DataFrame =
    segmentDedup(df, idCol, textCol, maxDocFreq, "\n", "\n")

  /** Corpus-wide PARAGRAPH dedup — [[lineDedup]] at paragraph granularity
    * (split on blank-line runs): catches boilerplate blocks (cookie
    * banners, footers) whose internal line structure varies. Blank-run
    * separators normalize to one blank line on reassembly (documented
    * lossy-layout trade, same class as lineDedup's trim-normalized
    * matching).
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     maxDocFreq: Int): DataFrame =
    segmentDedup(df, idCol, textCol, maxDocFreq, "\n\\s*\n", "\n\n")

  private def segmentDedup(df: DataFrame, idCol: String, textCol: String,
                           maxDocFreq: Int, splitRe: String,
                           joinStr: String): DataFrame = {
    require(maxDocFreq >= 2,
      s"maxDocFreq must be >= 2 (1 would drop every non-blank segment), got $maxDocFreq")
    val lines = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), splitRe, -1)).as(Seq("pos", "line")))
      .withColumn("norm", trim(col("line")))
    val boiler = lines.filter(col("norm") =!= "")
      .select(md5(col("norm")).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("docfreq"))
      .filter(col("docfreq") >= maxDocFreq)
      .select(col("h"))
    lines
      .join(broadcast(boiler), md5(col("norm")) === col("h"), "left_outer")
      .withColumn("keep", col("h").isNull)
      .groupBy(col("doc_id"))
      .agg(
        coalesce(
          array_join(transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("pos"), col("line"))))),
            x => x("line")), joinStr),
          lit("")).as("clean_text"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
  }

  /** Within-document line dedup — the intra-doc half of the CCNet pass
    * ([[lineDedup]] is the corpus-wide half; they compose): repeated
    * identical (trimmed) non-blank lines inside one document keep their
    * FIRST occurrence only; blank lines are layout and always survive.
    * Output matches lineDedup's shape: (doc_id, clean_text, n_kept,
    * n_dropped), total over input docs.
    *
    * Scale shape: no corpus-wide state at all — a rank over
    * (doc_id, line) then the doc-keyed reassembly, two narrow doc-local
    * shuffles; per-doc window state is bounded by document size.
    */
  def lineDedupWithinDoc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("norm")).orderBy(col("pos"))
    df.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("norm", trim(col("line")))
      .withColumn("keep", col("norm") === "" || row_number().over(w) === 1)
      .groupBy(col("doc_id"))
      .agg(
        coalesce(
          array_join(transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("pos"), col("line"))))),
            x => x("line")), "\n"),
          lit("")).as("clean_text"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
  }

  // functions.size clashes with the `size` parameter name above
  /** URL canonicalization — the normalization step before URL-level dedup
    * and per-domain frequency capping (CommonCrawl-style corpus balancing):
    * lowercase the scheme and host, strip default ports (:80/:443), drop
    * tracking query params (utm_*, fbclid, gclid), strip the fragment;
    * path case and non-tracking params are preserved, an empty path becomes
    * "/". Pure column expressions — codegen'd, map-side, fuses into the
    * scan; DuckDB replays it with the same regex family.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(hostport, ":(443|80)$", "")
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val q2 = array_join(filter(split(q, "&"),
      p => !p.rlike("^(utm_[^=]*|fbclid|gclid)=")), "&")
    concat(scheme, lit("://"), host,
      when(path === "", lit("/")).otherwise(path),
      when(q2 === "", lit("")).otherwise(concat(lit("?"), q2)))
  }

  /** HTML → text extraction — the CommonCrawl WET-style boilerplate strip
    * that precedes every text-quality gate on web corpora: drop
    * script/style subtrees and comments (content and all), flatten the
    * remaining tags to spaces, decode the common character entities
    * (`&amp;` LAST, so `&amp;lt;` round-trips as the literal `&lt;` and
    * never double-decodes), and collapse whitespace. Pure codegen'd column
    * expressions — map-side, fuses into the scan; DuckDB replays the same
    * RE2-safe regex chain. Tag-soup behavior (the standard regex-stripper
    * contract, deterministic but not a parser): an UNTERMINATED `<script>`
    * loses only the tag itself (its body leaks as text — the subtree rule
    * needs the closing tag); a bare `<` swallows through the next `>` if
    * one exists, and survives as text when none does.
    */
  def htmlToText(html: Column): Column = {
    val s1 = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val s2 = regexp_replace(s1, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val s3 = regexp_replace(s2, "(?s)<!--.*?-->", " ")
    val s4 = regexp_replace(s3, "<[^>]*>", " ")
    val e1 = regexp_replace(s4, "&nbsp;", " ")
    val e2 = regexp_replace(e1, "&lt;", "<")
    val e3 = regexp_replace(e2, "&gt;", ">")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    val e5 = regexp_replace(e4, "&#39;", "'")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(regexp_replace(e6, "\\s+", " "))
  }

  /** HTML extraction with the boilerplate signals quality filters gate on:
    * `clean_text` ([[htmlToText]]), `n_tags` (tag count outside
    * script/style — markup density), `n_links` (`<a` count — link-farm
    * gate), and `text_ratio` (clean/raw length — the text-to-markup ratio;
    * 0.0 for empty raw). All map-side column expressions over the one scan.
    */
  def htmlStats(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val raw = col(htmlCol)
    val noSub = regexp_replace(
      regexp_replace(raw, "(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val clean = htmlToText(raw)
    df.select(col(idCol), clean.as("clean_text"),
      (size_(split(noSub, "<[^>]*>", -1)) - 1).cast("long").as("n_tags"),
      (size_(split(raw, "(?i)<a\\b", -1)) - 1).cast("long").as("n_links"),
      when(length(raw) === 0, lit(0.0))
        .otherwise(length(clean).cast("double") / length(raw)).as("text_ratio"))
  }

  /** Hashed n-gram linear classifier INFERENCE — the fastText/DCLM-style
    * learned quality filter, the step after the rule-based gates in a
    * production curation stack: features are lowercased word unigrams +
    * adjacent bigrams hashed into `nBuckets` buckets (portable md5 family,
    * so any engine reproduces the bucketing); `weights` is the trained
    * model as a (bucket LONG, weight LONG) table — INTEGER weights, so the
    * per-doc sum is exact and order-free (a double sum would depend on
    * Spark's partial-agg order). Score = weight sum / feature count;
    * label = score > 0.
    *
    * Scale shape: the feature explode is map-side; the model join is a
    * BROADCAST (a 4 M-bucket int model is ~64 MB — fastText quantizes to
    * exactly this shape); the one shuffle carries (id, partial sums) —
    * never text. Missing buckets weigh 0 (an L1-pruned model).
    *
    * Hash families (the [[graft.RunMode]] convention): `portable` buckets
    * by md5-prefix so any engine reproduces the bucketing (the oracle
    * path); the production family is codegen'd xxhash64 — 4x faster at the
    * 10x study size (SCALE.md). A real model is TRAINED under one family;
    * both are deterministic, the choice just travels with the model.
    */
  def classifierScore(df: DataFrame, idCol: String, textCol: String,
                      weights: DataFrame, nBuckets: Int,
                      portable: Boolean = true): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= lit(""))
    val n1 = size_(toks)
    val pairLen = greatest(n1 - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), pairLen), slice(toks, lit(2), pairLen),
      (a, b) => concat(a, lit("_"), b))
    val feats = concat(toks, bigrams)
    val bucketExpr =
      if (portable) conv(substring(md5(col("feat")), 1, 8), 16, 10).cast("long") % nBuckets
      else pmod(xxhash64(col("feat")), lit(nBuckets.toLong))
    Skew.spreadForCompute(df)
      .select(col(idCol), explode_outer(feats).as("feat"))
      .withColumn("bucket", bucketExpr)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("feat").isNotNull, coalesce(col("weight"), lit(0L)))
          .otherwise(lit(0L))).cast("long").as("score_num"),
        count(col("feat")).cast("long").as("n_feats"))
      .withColumn("score", when(col("n_feats") === 0, lit(0.0))
        .otherwise(col("score_num").cast("double") / col("n_feats")))
      .withColumn("label", col("score") > 0)
  }

  /** Corpus-LM fluency scoring — the CCNet/KenLM-role quality signal
    * (docs whose word transitions are improbable under a reference corpus
    * score low: boilerplate, shuffled text, OCR noise): train bigram
    * conditionals on the corpus itself, score each doc by its mean
    * conditional probability. All arithmetic is EXACT integer — the
    * conditional is `(1e6·c2(w1,w2)) div c1(w1)` (c1 counts w1 as bigram
    * prefix, so Σ_w2 conditionals = 1e6 per prefix — a proper
    * distribution), the per-doc sum is an order-free BIGINT, and one
    * double division at the end yields `lm_score` in [0,1]. A real KenLM
    * adds Kneser-Ney smoothing; this is the deterministic integer shape
    * of the same filter.
    *
    * Scale shape: the model is two hash aggs over the narrow exploded
    * bigram relation; the scoring join is on bigram keys (never text). At
    * 100 TB the model trains ONCE on a reference sample, persists as a
    * table, and broadcasts when pruned to the top-k bigrams.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
              onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    // The bigram relation feeds THREE hash-aggs/joins (model c2, model c1,
    // scoring join): persist it so the corpus text is tokenized/exploded
    // once, not three times. MEMORY_AND_DISK — the relation is narrow
    // (id, w1, w2) but corpus-sized, so it must be allowed to spill.
    val docBi = docBigrams(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(docBi)
    scoreUnderModel(docBi, idCol, bigramModel(docBi))
      .withColumn("lm_score", when(col("n_bigrams") === 0, lit(0.0))
        .otherwise(col("score_num").cast("double") / (col("n_bigrams") * 1000000L)))
  }

  /** (id, w1, w2) bigram relation; docs with <2 tokens keep a null-w1 spine
    * row (explode_outer) so every doc scores. */
  private def docBigrams(df: DataFrame, idCol: String, textCol: String,
                         extraCols: Seq[String] = Nil): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= lit(""))
    val n1 = size_(toks)
    val pairLen = greatest(n1 - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), pairLen), slice(toks, lit(2), pairLen),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val keep = col(idCol) +: extraCols.map(col)
    // spread before the bigram explode (round 17): identity on any
    // already-split input, parallelizes the single-file local scan
    Skew.spreadForCompute(df).select(keep :+ explode_outer(bigrams).as("bg"): _*)
      .select(keep :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
  }

  /** Fixed-point bigram conditionals `(1e6·c2) div c1` from a bigram
    * relation — Σ_w2 = 1e6 per prefix, a proper distribution. Integer
    * `div`, not `/`: double division's round-to-nearest can cross an
    * integer boundary before the floor.
    *
    * ONE corpus-wide agg: c1 (prefix totals) is Σ c2 over w1, re-aggregated
    * from the already-aggregated MODEL relation (distinct bigrams) instead
    * of a second scan of the corpus-sized input — the c1 agg and its join
    * back are model-sized, and both land on the w1 hash partitioning the
    * c2 agg already produced.
    */
  private def bigramModel(bi: DataFrame): DataFrame = {
    val c2 = bi.filter(col("w1").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    // prefix totals as a WINDOW over the aggregated model relation, not a
    // groupBy(w1) + join-back — the join consumed c2 twice (re-running the
    // corpus-wide bigram aggregation once per consumer) and cost an extra
    // model-sized exchange (round 16; same shape dsirResample already uses)
    val w1win = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    c2.withColumn("c1", sum(col("c2")).over(w1win))
      .select(col("w1"), col("w2"),
        expr("CAST(1000000 AS BIGINT) * c2 div c1").as("cond_milli"))
  }

  /** (id, score_num, n_bigrams) of each doc under a bigram model — LEFT
    * join so out-of-model bigrams contribute 0 (matters when the model is
    * trained on a DIFFERENT corpus, e.g. dsirResample's target domain). */
  private def scoreUnderModel(docBi: DataFrame, idCol: String,
                              model: DataFrame): DataFrame =
    docBi.join(model, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("w1").isNotNull, coalesce(col("cond_milli"), lit(0L)))
          .otherwise(lit(0L))).cast("long").as("score_num"),
        count(col("w1")).cast("long").as("n_bigrams"))

  /** DSIR-style importance RESAMPLING (Xie et al. 2023's shape, this
    * repo's exact-integer discipline): score every raw doc under a bigram
    * model of the TARGET domain and one of the raw corpus, form the
    * fixed-point importance weight
    *   `w_pm = min(capX·1e6, (1e6·(st+1)) div (sr+1))`
    * (st/sr = mean bigram conditional in 1e-6 units under target/raw —
    * the probability-RATIO substitute for the classic log-ratio, monotone
    * per component, +1-smoothed), then keep each doc with probability
    * `ratePm·w_pm / 1e9` via the portable md5 unit hash (Sampling.scala's
    * hash-gated convention — deterministic, engine-replayable, never RNG):
    *   `u24 = int(md5('salt:id')[0:6 hex]); keep ⇔ u24 < (ratePm·w_pm·2^24) div 1e9`.
    * Docs matching the target domain (high st relative to sr) are kept at
    * up to capX× the base rate; off-domain docs are downsampled.
    *
    * Scale shape: two bigram-model hash-aggs + two scoring joins on bigram
    * keys (text never shuffles), then a map-side hash gate. At 100 TB the
    * target model trains on the (small) domain sample once and broadcasts
    * when pruned; the raw model trains on a documented sample —
    * `rawSamplePm` IS that sample: the raw/doc bigram model trains on a
    * deterministic md5-gated per-mille of the raw DOCS
    * (`u24('<salt>raw:' || id) < rawSamplePm·2^24/1000` — the same portable
    * hash-gate convention as the keep decision, so any engine replays the
    * exact model), while SCORING still covers the full corpus. A bigram
    * model is a frequency ratio — a uniform doc sample estimates it with
    * error ~1/sqrt(sample size) and shrinks the model-build aggregation by
    * the sampling factor; 1000 (default) = train on everything, identical
    * to the pre-option behavior.
    */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, ratePm: Int, capX: Int = 10,
                   salt: String = "dsir",
                   rawSamplePm: Int = 1000,
                   onPersist: DataFrame => Unit = _ => (),
                   targetFromRaw: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    require(ratePm >= 1 && ratePm <= 1000, s"ratePm must be in [1,1000], got $ratePm")
    require(capX >= 1 && capX <= 100, s"capX must be in [1,100], got $capX")
    require(rawSamplePm >= 1 && rawSamplePm <= 1000,
      s"rawSamplePm must be in [1,1000], got $rawSamplePm")
    // `targetFromRaw` (round 16): when the target domain is a PREDICATE
    // over the raw corpus (the common "en-domain slice of the crawl"
    // shape), tokenizing raw once with the predicate as a flag column
    // replaces the separate target tokenize pass — profiled at sf0.1 the
    // target branch was a second full 0.7 s scan+tokenize of the domain
    // slice. The flag rides the persisted bigram relation; the target
    // branch is a cache filter. Bit-identical: docBigrams of a filtered
    // relation == the filtered docBigrams (per-doc rows). `target` is
    // ignored when the predicate is given.
    targetFromRaw match {
      case Some(cond) if rawSamplePm >= 1000 =>
        // full model: the cache already exists for the two full-corpus
        // consumers, so the flag rides it for free and the target branch
        // becomes a cache filter (one tokenize total; A/B -11%)
        val bi = docBigrams(raw.withColumn("__tgt", cond), idCol, textCol,
            extraCols = Seq("__tgt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        onPersist(bi)
        val rawBi = bi.drop("__tgt")
        val targetBi = bi.filter(col("__tgt")).drop("__tgt")
        return dsirCore(rawBi, rawBi, targetBi, idCol, ratePm, capX, salt)
      case Some(cond) =>
        // sampled model: scoring is the only full-corpus consumer, so a
        // persist costs more than it saves (A/B: +16%) — keep the
        // stream-once layout and tokenize only the filtered slices for
        // the model branches
        val sampleGate =
          conv(substring(md5(concat(lit(salt), lit("raw:"),
            col(idCol).cast("string"))), 1, 6), 16, 10).cast("long") <
            lit(rawSamplePm.toLong * 16777216L / 1000L)
        return dsirCore(
          docBigrams(raw, idCol, textCol),
          docBigrams(raw.filter(sampleGate), idCol, textCol),
          docBigrams(raw.filter(cond), idCol, textCol),
          idCol, ratePm, capX, salt)
      case None => ()
    }
    // Raw-model training slice (`rawSamplePm`): the md5 doc gate (salted
    // differently from the keep gate so the two decisions are independent)
    // filters the raw DOCS — per-doc hashes, not per-bigram — and the
    // model branch tokenizes only the sample. Consumer accounting decides
    // the persist: full model (two full-corpus consumers: model agg +
    // scoring) → tokenize once into a spill-safe cache; sampled model
    // (scoring is the ONLY full-corpus consumer) → no persist at all, the
    // scoring scan streams once and the model branch re-tokenizes just the
    // sample. The target relation always feeds the model agg once — never
    // persisted (a single-consumer persist only adds a serialize/
    // deserialize pass; round-11 plan audit).
    val (rawBi, rawModelBi) =
      if (rawSamplePm >= 1000) {
        val p = docBigrams(raw, idCol, textCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        onPersist(p)
        (p, p)
      } else {
        val sampleDocs = raw.filter(
          conv(substring(md5(concat(lit(salt), lit("raw:"),
            col(idCol).cast("string"))), 1, 6), 16, 10).cast("long") <
            lit(rawSamplePm.toLong * 16777216L / 1000L))
        (docBigrams(raw, idCol, textCol), docBigrams(sampleDocs, idCol, textCol))
      }
    val targetBi = docBigrams(target, idCol, textCol)
    dsirCore(rawBi, rawModelBi, targetBi, idCol, ratePm, capX, salt)
  }

  /** Shared model-build + scoring tail of [[dsirResample]] — identical
    * arithmetic for both tokenize layouts (separate target relation, or
    * the flag-column single-tokenize path). */
  private def dsirCore(rawBi: DataFrame, rawModelBi: DataFrame,
                       targetBi: DataFrame, idCol: String,
                       ratePm: Int, capX: Int, salt: String): DataFrame = {
    // MERGED-MODEL build + scoring: ONE tagged-union aggregation computes
    // both corpora's bigram counts side by side (c2t/c2r per bigram, c1
    // re-aggregated model-sized), replacing the round-10 shape of two
    // separate model aggs + a full-outer sort-merge — four exchanges
    // collapse into one union agg. Conditionals are NULL where the bigram
    // is absent from that corpus, exactly the old outer-join padding, so
    // the scoring arithmetic below is bit-identical. Scoring stays a
    // SINGLE pass over the corpus bigrams (one join + one hash-agg).
    val taggedBi = targetBi.withColumn("__t", lit(1))
      .unionByName(rawModelBi.withColumn("__t", lit(0)))
    val c2 = taggedBi.filter(col("w1").isNotNull)
      .groupBy(col("w1"), col("w2"))
      .agg(sum(when(col("__t") === 1, 1L).otherwise(0L)).as("c2t"),
        sum(when(col("__t") === 0, 1L).otherwise(0L)).as("c2r"))
    // prefix totals as a WINDOW over the aggregated model relation, not a
    // self-join — a join would consume c2 twice and re-execute the
    // (unpersisted) tokenize branches once per consumer; the window costs
    // one model-sized exchange on w1
    val w1win = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    val model = c2
      .withColumn("c1t", sum(col("c2t")).over(w1win))
      .withColumn("c1r", sum(col("c2r")).over(w1win))
      .select(col("w1"), col("w2"),
        when(col("c2t") > 0, expr("CAST(1000000 AS BIGINT) * c2t div c1t")).as("__ct"),
        when(col("c2r") > 0, expr("CAST(1000000 AS BIGINT) * c2r div c1r")).as("__cr"))
    val scores = rawBi.join(model, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("w1").isNotNull, coalesce(col("__ct"), lit(0L)))
          .otherwise(lit(0L))).cast("long").as("st_num"),
        sum(when(col("w1").isNotNull, coalesce(col("__cr"), lit(0L)))
          .otherwise(lit(0L))).cast("long").as("sr_num"),
        count(col("w1")).cast("long").as("n_bigrams"))
    scores
      .withColumn("st_fp", expr("st_num div greatest(n_bigrams, 1)"))
      .withColumn("sr_fp", expr("sr_num div greatest(n_bigrams, 1)"))
      .withColumn("w_pm",
        least(lit(capX * 1000000L),
          expr("(1000000 * (st_fp + 1)) div (sr_fp + 1)")).cast("long"))
      .withColumn("__u24",
        conv(substring(md5(concat(lit(salt), lit(":"),
          col(idCol).cast("string"))), 1, 6), 16, 10).cast("long"))
      .withColumn("kept",
        col("__u24") < expr(s"($ratePm * w_pm * 16777216) div 1000000000"))
      .select(col(idCol), col("st_fp"), col("sr_fp"), col("w_pm"), col("kept"))
  }

  /** Unicode-script profile — the routing signal a multilingual corpus
    * needs BEFORE language-specific pipelines (the n-gram lang-ID only
    * works within a script): per-block character counts (Latin, CJK
    * unified, Cyrillic, Arabic) and the dominant script, ties resolved in
    * that fixed order. Map-side regexp counts; `\x{...}` class spellings
    * are shared verbatim with the DuckDB oracle (valid in both Java regex
    * and RE2).
    */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nLatin = regexp_count(t, lit("[A-Za-z]")).cast("long")
    val nCjk = regexp_count(t, lit("[\\x{4E00}-\\x{9FFF}]")).cast("long")
    val nCyr = regexp_count(t, lit("[\\x{0400}-\\x{04FF}]")).cast("long")
    val nArab = regexp_count(t, lit("[\\x{0600}-\\x{06FF}]")).cast("long")
    df.select(col(idCol), nLatin.as("n_latin"), nCjk.as("n_cjk"),
        nCyr.as("n_cyr"), nArab.as("n_arab"))
      .withColumn("script",
        when(col("n_latin") >= col("n_cjk") && col("n_latin") >= col("n_cyr") &&
             col("n_latin") >= col("n_arab"), "latin")
          .when(col("n_cjk") >= col("n_cyr") && col("n_cjk") >= col("n_arab"), "cjk")
          .when(col("n_cyr") >= col("n_arab"), "cyrillic")
          .otherwise("arabic"))
  }

  /** Per-key frequency CAP — the corpus-balancing step after
    * [[canonicalizeUrl]]/[[urlDomain]] (CommonCrawl-style: no domain, source
    * or license bucket may dominate the mix): keep at most `maxPerKey` docs
    * per key, selected DETERMINISTICALLY by the portable md5 hash order
    * (Sampling.scala's convention — an unbiased, engine-replayable draw;
    * (hash, id) total order makes ties impossible). Output is the full doc
    * spine with the key, the draw rank, and the verdict.
    *
    * Scale shape: one key-hash exchange for the rank window; per-key window
    * state is the key's population (sort spills). A pathologically hot key
    * at 100 TB ranks inside one task — pre-filter such keys with an
    * aggregate count gate (the maxDf/skew discipline) before ranking.
    */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String,
                maxPerKey: Int, salt: String = "cap"): DataFrame = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    val h = md5(concat(lit(salt), lit(":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(h, col(idCol))
    df.select(col(idCol), col(keyCol))
      .withColumn("cap_rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("cap_rank") <= maxPerKey)
  }

  /** Registrable domain-ish key for frequency capping: the lowercased host
    * with the default port and a leading `www.` stripped.
    */
  def urlDomain(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        ":(443|80)$", ""),
      "^www\\.", "")

  /** Data-expectations pass (the Deequ/Great-Expectations role): each rule
    * is (name, violation predicate); output is one row per rule with the
    * violation count and the corpus size. ONE corpus pass — every rule is
    * a conditional sum inside a single aggregate (map-side partials), then
    * a k-row stack/unpivot. Rules are ordinary Columns, so any check the
    * engine can express is a rule.
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    rules.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"), s"rule name '$n' must be [A-Za-z0-9_]+") }
    val aggs = count(lit(1)).cast("long").as("n_checked") +:
      rules.map { case (n, p) =>
        sum(when(p, 1L).otherwise(0L)).cast("long").as(s"__$n") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r => s"'${r._1}', __${r._1}").mkString(", ")
    one.select(
        expr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)"),
        col("n_checked"))
      .select(col("rule"), col("n_violations"), col("n_checked"))
  }

  /** Diff two corpus snapshots by content digest: per doc id, `added` /
    * `deleted` / `changed` / `unchanged` — the audit table an incremental
    * corpus refresh publishes. The join carries only (id, presence, md5) —
    * text never shuffles; one id-key exchange.
    *
    * Presence is carried as an explicit flag per side, NOT inferred from
    * digest nullness: a doc present with NULL text would otherwise get a
    * NULL digest and be misreported as added/deleted (and NULL-vs-NULL as
    * added). NULL text hashes as a sentinel distinct from any real md5 and
    * from the empty string's digest, so NULL→'' edits report `changed` and
    * NULL→NULL reports `unchanged`.
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    def slim(df: DataFrame, h: String, p: String) =
      df.select(col(idCol).cast("long").as("doc_id"),
        lit(true).as(p),
        coalesce(md5(col(textCol).cast("binary")), lit("<null-text>")).as(h))
    slim(v1, "h1", "p1").join(slim(v2, "h2", "p2"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("p1").isNull, "added")
          .when(col("p2").isNull, "deleted")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed"))
      .select(col("doc_id"), col("status"))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
