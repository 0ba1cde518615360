package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Curation

/** Corpus-curation pipeline stages over `documents` (beyond-reference
  * LLM-data surface): repetition/quality gates, PII redaction, benchmark
  * decontamination, token-window chunking. Every query carries a full
  * DuckDB oracle — the operators are pure codegen'd-function transforms.
  */
object CurationQueries extends QueryFamily {

  /** Deterministic PII staging (the stagedMedia pattern): the corpus is
    * synthetic word salad with no real PII, so each doc gets a
    * doc_id-derived contact line appended — emails on id%4=0, phones on
    * id%4=1, dotted-quad hosts on id%4=2, nothing on id%4=3 — which BOTH
    * engines reconstruct arithmetically. The redaction operator itself
    * never sees the staging (it takes an opaque text column).
    */
  private def stagedPii(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    d.select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@mail.example.com for details")))
        .when(col("doc_id") % 4 === 1,
          concat(col("text"), lit(" call 415-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now")))
        .when(col("doc_id") % 4 === 2,
          concat(col("text"), lit(" host 10."), (col("doc_id") % 256).cast("string"),
            lit("."), (col("doc_id") % 199).cast("string"),
            lit("."), (col("doc_id") % 97).cast("string"), lit(" up")))
        .otherwise(col("text")).as("text"))

  def defs: Seq[QueryDef] = Seq(

    // Repetition/shape gates (the Gopher-rule family): mean token length,
    // max-token dominance, duplicate-bigram dominance, hapax ratio, and
    // the resulting keep/drop verdict.
    QueryDef(
      "q_text_gopher",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Curation.gopherStats(d, "doc_id", "text")
          .withColumn("keep",
            col("n_tokens") >= 20 && col("top_token_frac") < 0.2 &&
              col("top_bigram_frac") < 0.2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |tc AS (
             |  SELECT doc_id, tok, count(*) AS c, sum(length(tok)) AS chars
             |  FROM toks GROUP BY doc_id, tok),
             |ts AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    CAST(sum(chars) AS DOUBLE) / sum(c) AS mean_token_len,
             |    CAST(max(c) AS DOUBLE) / sum(c) AS top_token_frac,
             |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS hapax_ratio
             |  FROM tc GROUP BY doc_id),
             |t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |bg AS (
             |  SELECT doc_id, array_to_string(w[i.i + 1 : i.i + 2], ' ') AS bg
             |  FROM t CROSS JOIN LATERAL (
             |    SELECT unnest(range(0, greatest(len(w) - 2, 0) + 1)) AS i) i),
             |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
             |bs AS (
             |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
             |  FROM bc GROUP BY doc_id)
             |SELECT ts.doc_id, n_tokens, mean_token_len, top_token_frac, hapax_ratio,
             |  coalesce(top_bigram_frac, 0.0) AS top_bigram_frac,
             |  (n_tokens >= 20 AND top_token_frac < 0.2
             |   AND coalesce(top_bigram_frac, 0.0) < 0.2) AS keep
             |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
             |ORDER BY ts.doc_id""".stripMargin)),

    // The remaining Gopher repetition gate: duplicate-3-gram character
    // fraction (each occurrence of a repeated 3-gram contributes its full
    // character length). Same explode + two-hash-agg shape as q_text_gopher.
    QueryDef(
      "q_text_gopher_rep",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Curation.dupNgramCharFrac(d, "doc_id", "text", 3)
          .withColumn("keep", col("dup_ngram_char_frac") < 0.2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, array_to_string(w[i.i + 1 : i.i + 3], ' ') AS sh
             |  FROM t CROSS JOIN LATERAL (
             |    SELECT unnest(range(0, greatest(len(w) - 3, 0) + 1)) AS i) i),
             |sc AS (
             |  SELECT doc_id, sh, count(*) AS c, length(sh) AS l
             |  FROM sh GROUP BY doc_id, sh),
             |f AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN c > 1 THEN c * l ELSE 0 END) AS DOUBLE)
             |      / sum(c * l) AS dup_ngram_char_frac
             |  FROM sc GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(dup_ngram_char_frac, 0.0) AS dup_ngram_char_frac,
             |  coalesce(dup_ngram_char_frac, 0.0) < 0.2 AS keep
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |LEFT JOIN f ON d.doc_id = f.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Re-identification risk gates (k-anonymity + l-diversity per
    // quasi-identifier group) — the datacard privacy row. One hash agg on
    // the quasi key; exact per-group distinct of the sensitive attribute.
    QueryDef(
      "q_text_anonymity",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .withColumn("sens", col("n_chars") % 7)
        Curation.anonymityRisk(d, Seq("lang", "source"), "sens", 5L, 3L)
          .select(col("lang"), col("source"),
            col("group_n"), col("sensitive_distinct"),
            col("k_anonymous"), col("l_diverse"), col("pass"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT lang, source, count(*) AS group_n,
             |  count(DISTINCT n_chars % 7) AS sensitive_distinct,
             |  count(*) >= 5 AS k_anonymous,
             |  count(DISTINCT n_chars % 7) >= 3 AS l_diverse,
             |  (count(*) >= 5 AND count(DISTINCT n_chars % 7) >= 3) AS pass
             |FROM documents GROUP BY lang, source
             |ORDER BY lang, source""".stripMargin)),

    // PII redaction over the staged corpus: per-category hit counts + the
    // scrubbed text (the oracle re-runs the same RE2-safe regex chain).
    QueryDef(
      "q_text_redact",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        // sorted before the regex chain: a trailing orderBy's range-
        // sampling pass re-ran the three-regex redaction once more
        // (profiled: 619 ms sampling + 454 ms real at sf0.1; guide §2.4)
        Curation.redactPii(stagedPii(d.orderBy(col("doc_id"))), "text")
          .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
            col("redacted"))
      },
      Some(s"""WITH staged AS (
              |  SELECT doc_id,
              |    CASE
              |      WHEN doc_id % 4 = 0 THEN text || ' contact user' || doc_id || '@mail.example.com for details'
              |      WHEN doc_id % 4 = 1 THEN text || ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
              |      WHEN doc_id % 4 = 2 THEN text || ' host 10.' || (doc_id % 256) || '.' || (doc_id % 199) || '.' || (doc_id % 97) || ' up'
              |      ELSE text END AS text
              |  FROM documents)
              |SELECT doc_id,
              |  len(regexp_extract_all(text, '${Curation.EmailRe}')) AS n_emails,
              |  len(regexp_extract_all(text, '${Curation.PhoneRe}')) AS n_phones,
              |  len(regexp_extract_all(text, '${Curation.Ipv4Re}')) AS n_ips,
              |  regexp_replace(regexp_replace(regexp_replace(text,
              |    '${Curation.EmailRe}', '[EMAIL]', 'g'),
              |    '${Curation.PhoneRe}', '[PHONE]', 'g'),
              |    '${Curation.Ipv4Re}', '[IP]', 'g') AS redacted
              |FROM staged ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination: docs 0..24 stand in as the eval set;
    // count each training doc's distinct 4-gram overlaps with it.
    QueryDef(
      "q_text_contamination",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val probes = d.filter(col("doc_id") < 25)
        val train = d.filter(col("doc_id") >= 25)
        Curation.contamination(train, probes, "doc_id", "text", n = 4, minOverlap = 3L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, array_to_string(w[i.i + 1 : i.i + 4], ' ') AS sh
             |  FROM t CROSS JOIN LATERAL (
             |    SELECT unnest(range(0, greatest(len(w) - 4, 0) + 1)) AS i) i),
             |probe AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 25),
             |hits AS (
             |  SELECT s.doc_id, count(*) AS n_overlap
             |  FROM sh s JOIN probe USING (sh) WHERE s.doc_id >= 25
             |  GROUP BY s.doc_id)
             |SELECT d.doc_id, coalesce(h.n_overlap, 0) AS n_overlap,
             |  coalesce(h.n_overlap, 0) >= 3 AS contaminated
             |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
             |WHERE d.doc_id >= 25 ORDER BY d.doc_id""".stripMargin)),

    // Token-window chunking: 16-token training sequences every 12 tokens
    // (4-token overlapping context), final partial window kept.
    QueryDef(
      "q_text_chunks",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 100)
        Curation.chunkTokens(d, "doc_id", "text", size = 16, stride = 12)
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |  FROM documents WHERE doc_id < 100 AND trim(text) <> '')
             |SELECT doc_id,
             |  CAST(i.s / 12 AS BIGINT) AS chunk_idx,
             |  CAST(i.s AS BIGINT) AS start_tok,
             |  CAST(least(16, len(w) - i.s) AS BIGINT) AS n_chunk_tokens,
             |  array_to_string(w[i.s + 1 : i.s + 16], ' ') AS chunk_text
             |FROM t CROSS JOIN LATERAL (
             |  SELECT unnest(range(0, greatest(len(w) - 1, 0) + 1, 12)) AS s) i
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Corpus-level line dedup (CCNet/RefinedWeb boilerplate pass): the
    // synthetic corpus has no newlines, so docs are staged with a shared
    // newsletter header (+ a blank layout line, doc_id%3=0) and a shared
    // copyright footer (doc_id%3 in {0,1}) around a unique 80-char body —
    // both engines reconstruct the staging arithmetically. With
    // maxDocFreq=5 the header (~67 docs) and footer (~134 docs) are
    // boilerplate; bodies and blank lines survive in order.
    QueryDef(
      "q_text_line_dedup",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val staged = d.filter(col("doc_id") < 200).select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat_ws("\n", lit("Subscribe to our newsletter"), lit(""),
              substring(col("text"), 1, 80), lit("Copyright 2026 Example Corp")))
          .when(col("doc_id") % 3 === 1,
            concat_ws("\n", substring(col("text"), 1, 80),
              lit("Copyright 2026 Example Corp")))
          .otherwise(substring(col("text"), 1, 80)).as("text"))
        Curation.lineDedup(staged, "doc_id", "text", maxDocFreq = 5)
          .orderBy(col("doc_id"))
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    CASE
             |      WHEN doc_id % 3 = 0 THEN 'Subscribe to our newsletter' || chr(10) || chr(10) || substr(text, 1, 80) || chr(10) || 'Copyright 2026 Example Corp'
             |      WHEN doc_id % 3 = 1 THEN substr(text, 1, 80) || chr(10) || 'Copyright 2026 Example Corp'
             |      ELSE substr(text, 1, 80) END AS text
             |  FROM documents WHERE doc_id < 200),
             |l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM staged),
             |l AS (
             |  SELECT doc_id, unnest(ls) AS line,
             |         unnest(range(1, len(ls) + 1)) AS pos
             |  FROM l0),
             |b AS (
             |  SELECT trim(line) AS norm FROM l WHERE trim(line) <> ''
             |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 5)
             |SELECT l.doc_id,
             |  coalesce(string_agg(CASE WHEN b.norm IS NULL THEN l.line END,
             |                      chr(10) ORDER BY l.pos), '') AS clean_text,
             |  CAST(count(CASE WHEN b.norm IS NULL THEN 1 END) AS BIGINT) AS n_kept,
             |  CAST(count(b.norm) AS BIGINT) AS n_dropped
             |FROM l LEFT JOIN b ON trim(l.line) = b.norm
             |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin)),

    // Corpus-wide PARAGRAPH dedup (Curation.paragraphDedup): staged docs
    // share a multi-LINE cookie-notice block and a footer block — units
    // line dedup can't treat atomically. Blocks present in >= 5 docs drop
    // whole; the unique body paragraph survives; blank-run separators
    // normalize to one blank line (documented).
    QueryDef(
      "q_text_para_dedup",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val staged = d.filter(col("doc_id") < 200).select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat_ws("\n\n",
              lit("We use cookies on this site\nAccept all to continue"),
              substring(col("text"), 1, 80),
              lit("Footer line A\nFooter line B")))
          .when(col("doc_id") % 3 === 1,
            concat_ws("\n\n", substring(col("text"), 1, 80),
              lit("Footer line A\nFooter line B")))
          .otherwise(substring(col("text"), 1, 80)).as("text"))
        Curation.paragraphDedup(staged, "doc_id", "text", maxDocFreq = 5)
          .orderBy(col("doc_id"))
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    CASE
             |      WHEN doc_id % 3 = 0 THEN 'We use cookies on this site' || chr(10) || 'Accept all to continue' || chr(10) || chr(10) || substr(text, 1, 80) || chr(10) || chr(10) || 'Footer line A' || chr(10) || 'Footer line B'
             |      WHEN doc_id % 3 = 1 THEN substr(text, 1, 80) || chr(10) || chr(10) || 'Footer line A' || chr(10) || 'Footer line B'
             |      ELSE substr(text, 1, 80) END AS text
             |  FROM documents WHERE doc_id < 200),
             |l0 AS (SELECT doc_id, string_split_regex(text, '\n\s*\n') AS ls FROM staged),
             |l AS (
             |  SELECT doc_id, unnest(ls) AS line,
             |         unnest(range(1, len(ls) + 1)) AS pos
             |  FROM l0),
             |b AS (
             |  SELECT trim(line) AS norm FROM l WHERE trim(line) <> ''
             |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 5)
             |SELECT l.doc_id,
             |  coalesce(string_agg(CASE WHEN b.norm IS NULL THEN l.line END,
             |                      chr(10) || chr(10) ORDER BY l.pos), '') AS clean_text,
             |  CAST(count(CASE WHEN b.norm IS NULL THEN 1 END) AS BIGINT) AS n_kept,
             |  CAST(count(b.norm) AS BIGINT) AS n_dropped
             |FROM l LEFT JOIN b ON trim(l.line) = b.norm
             |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin)),

    // Per-key frequency cap (Curation.capPerKey): at most 10 docs per
    // source bucket, drawn by the portable md5 hash order — the
    // corpus-balancing step no single domain/source may dominate past.
    // Both engines replay the (md5, id) rank and the verdict exactly.
    QueryDef(
      "q_text_cap",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Curation.capPerKey(d, "doc_id", "source", maxPerKey = 10)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source,
             |  CAST(row_number() OVER (PARTITION BY source
             |    ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS cap_rank,
             |  row_number() OVER (PARTITION BY source
             |    ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) <= 10 AS kept
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Within-doc line dedup (keep-first): each staged doc repeats a line
    // twice around unique body halves plus two blank layout lines — the
    // second occurrence drops, blanks and both bodies survive in order.
    QueryDef(
      "q_text_line_dedup_doc",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val staged = d.filter(col("doc_id") < 200).select(col("doc_id"),
          concat_ws("\n",
            substring(col("text"), 1, 40), lit("repeated boilerplate line"),
            lit(""), substring(col("text"), 41, 40), lit(""),
            lit("repeated boilerplate line")).as("text"))
        Curation.lineDedupWithinDoc(staged, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    substr(text, 1, 40) || chr(10) || 'repeated boilerplate line' || chr(10)
             |      || chr(10) || substr(text, 41, 40) || chr(10) || chr(10)
             |      || 'repeated boilerplate line' AS text
             |  FROM documents WHERE doc_id < 200),
             |l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM staged),
             |l AS (
             |  SELECT doc_id, unnest(ls) AS line,
             |         unnest(range(1, len(ls) + 1)) AS pos
             |  FROM l0),
             |r AS (
             |  SELECT doc_id, line, pos, trim(line) AS norm,
             |    row_number() OVER (PARTITION BY doc_id, trim(line) ORDER BY pos) AS rn
             |  FROM l)
             |SELECT doc_id,
             |  coalesce(string_agg(CASE WHEN norm = '' OR rn = 1 THEN line END,
             |                      chr(10) ORDER BY pos), '') AS clean_text,
             |  CAST(count(CASE WHEN norm = '' OR rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
             |  CAST(count(CASE WHEN norm <> '' AND rn > 1 THEN 1 END) AS BIGINT) AS n_dropped
             |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // URL canonicalization + per-domain frequency cap (CommonCrawl-style
    // corpus balancing). Staged URLs (the stagedPii pattern — the corpus
    // text has no URLs) exercise every rule: uppercase scheme/host, a :443
    // default port, utm_* tracking params around a kept param, fragments.
    // kept = row_number per canonical domain by doc_id <= 5, the standard
    // per-domain cap. Both engines reconstruct the staging arithmetically.
    QueryDef(
      "q_text_urls",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 1000)
        val id = col("doc_id")
        val url = concat(
          lit("HTTPS://WWW.Site"), (id % 37).cast("string"), lit(".Example.COM"),
          when(id % 4 === 0, lit(":443")).otherwise(lit("")),
          lit("/Path/To/Page"), id.cast("string"),
          when(id % 3 === 0,
            concat(lit("?utm_source=feed&ref="), (id % 7).cast("string"),
              lit("&utm_campaign=x")))
            .otherwise(concat(lit("?ref="), (id % 7).cast("string"))),
          when(id % 5 === 0, lit("#Section2")).otherwise(lit("")))
        d.select(id, url.as("url"))
          .select(id,
            Curation.urlDomain(col("url")).as("domain"),
            Curation.canonicalizeUrl(col("url")).as("canon_url"))
          .withColumn("kept",
            row_number().over(
              Window.partitionBy(col("domain")).orderBy(col("doc_id"))) <= 5)
          .orderBy(col("doc_id"))
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    'HTTPS://WWW.Site' || CAST(doc_id % 37 AS VARCHAR) || '.Example.COM'
             |      || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
             |      || '/Path/To/Page' || CAST(doc_id AS VARCHAR)
             |      || CASE WHEN doc_id % 3 = 0
             |           THEN '?utm_source=feed&ref=' || CAST(doc_id % 7 AS VARCHAR)
             |                  || '&utm_campaign=x'
             |           ELSE '?ref=' || CAST(doc_id % 7 AS VARCHAR) END
             |      || CASE WHEN doc_id % 5 = 0 THEN '#Section2' ELSE '' END AS url
             |  FROM documents WHERE doc_id < 1000),
             |parts AS (
             |  SELECT doc_id, url,
             |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             |    regexp_replace(lower(regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':(443|80)$', '') AS host,
             |    regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
             |    regexp_extract(url, '\?([^#]*)', 1) AS q
             |  FROM staged),
             |canon AS (
             |  SELECT doc_id,
             |    regexp_replace(host, '^www\.', '') AS domain,
             |    scheme || '://' || host
             |      || CASE WHEN path = '' THEN '/' ELSE path END
             |      || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canon_url
             |  FROM (SELECT *,
             |          array_to_string(list_filter(string_split(q, '&'),
             |            p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=')),
             |            '&') AS q2
             |        FROM parts))
             |SELECT doc_id, domain, canon_url,
             |  row_number() OVER (PARTITION BY domain ORDER BY doc_id) <= 5 AS kept
             |FROM canon ORDER BY doc_id""".stripMargin)),

    // HTML → text extraction (the WET-style boilerplate strip before any
    // web-corpus quality gate). Staged HTML wraps each doc's text with
    // every feature the chain must handle: script/style subtrees whose
    // CONTENT must vanish (including a `1 < 2` that would break a naive
    // tag regex), comments, attribute-bearing tags, all six entities
    // (incl. `&amp;lt;` double-decode bait), and a per-doc link count.
    // Outputs: clean text, tag/link counts, text-to-markup ratio. DuckDB
    // replays the identical RE2-safe chain.
    QueryDef(
      "q_text_html",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 500)
        val id = col("doc_id")
        val html = concat(
          lit("<HTML><head><title>Doc "), id.cast("string"), lit("</title>"),
          lit("<style type=\"text/css\">body{color:#"),
          (id % 10).cast("string"), lit("}</style>"),
          lit("<script src=\"a.js\">var x = 1 < 2 && y > 0;</script></head>"),
          lit("<body><!-- id "), id.cast("string"), lit(" --><p class=\"lead\">"),
          substring(col("text"), 1, 60),
          lit(" &amp; more &amp;lt;raw&gt;&nbsp;it&#39;s &quot;q&quot;</p>"),
          lit("<div><a href=\"/p1\">l1</a>"),
          when(id % 3 === 0, lit("<A HREF=\"/p2\">l2</A>")).otherwise(lit("")),
          lit("</div></body></HTML>"))
        Curation.htmlStats(d.select(id, html.as("html")), "doc_id", "html")
          .orderBy(col("doc_id"))
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    '<HTML><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>'
             |    || '<style type="text/css">body{color:#'
             |    || CAST(doc_id % 10 AS VARCHAR) || '}</style>'
             |    || '<script src="a.js">var x = 1 < 2 && y > 0;</script></head>'
             |    || '<body><!-- id ' || CAST(doc_id AS VARCHAR) || ' --><p class="lead">'
             |    || substr(text, 1, 60)
             |    || ' &amp; more &amp;lt;raw&gt;&nbsp;it&#39;s &quot;q&quot;</p>'
             |    || '<div><a href="/p1">l1</a>'
             |    || CASE WHEN doc_id % 3 = 0 THEN '<A HREF="/p2">l2</A>' ELSE '' END
             |    || '</div></body></HTML>' AS html
             |  FROM documents WHERE doc_id < 500),
             |nosub AS (
             |  SELECT doc_id, html,
             |    regexp_replace(
             |      regexp_replace(html, '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
             |      '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g') AS ns
             |  FROM staged),
             |clean AS (
             |  SELECT doc_id, html, ns,
             |    trim(regexp_replace(
             |      regexp_replace(
             |        regexp_replace(
             |          regexp_replace(
             |            regexp_replace(
             |              regexp_replace(
             |                regexp_replace(
             |                  regexp_replace(
             |                    regexp_replace(ns, '(?s)<!--.*?-->', ' ', 'g'),
             |                    '<[^>]*>', ' ', 'g'),
             |                  '&nbsp;', ' ', 'g'),
             |                '&lt;', '<', 'g'),
             |              '&gt;', '>', 'g'),
             |            '&quot;', '"', 'g'),
             |          '&#39;', '''', 'g'),
             |        '&amp;', '&', 'g'),
             |      '\s+', ' ', 'g')) AS clean_text
             |  FROM nosub)
             |SELECT doc_id, clean_text,
             |  CAST(len(regexp_split_to_array(ns, '<[^>]*>')) - 1 AS BIGINT) AS n_tags,
             |  CAST(len(regexp_split_to_array(html, '(?i)<a\b')) - 1 AS BIGINT) AS n_links,
             |  CASE WHEN length(html) = 0 THEN 0.0
             |       ELSE CAST(length(clean_text) AS DOUBLE) / length(html) END AS text_ratio
             |FROM clean ORDER BY doc_id""".stripMargin)),

    // Hashed n-gram linear classifier inference (the fastText/DCLM-style
    // learned quality filter): unigram+bigram features → portable md5
    // buckets → broadcast model join → exact integer weight sum per doc.
    // The model is arithmetic (weight(b) = (b*2654435761) % 2001 - 1000 on
    // 4096 buckets) so DuckDB reconstructs the whole inference — bucketing,
    // weights, score, label — with no staged table.
    QueryDef(
      "q_text_classifier",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val weights = s.range(4096).select(col("id").as("bucket"),
          ((col("id") * 2654435761L) % 2001 - 1000).as("weight"))
        // Oracle runs bucket with the portable md5 family (DuckDB replays
        // it); Bench measures the production xxhash64 family (RunMode).
        Curation.classifierScore(d, "doc_id", "text", weights, 4096,
            portable = !graft.RunMode.productionHash)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |           t -> t <> '') AS ts
             |  FROM documents),
             |feats AS (
             |  SELECT doc_id, unnest(list_concat(ts,
             |    list_transform(range(1, len(ts)), i -> ts[i] || '_' || ts[i + 1]))) AS feat
             |  FROM tok),
             |scored AS (
             |  SELECT doc_id,
             |    CAST(sum((CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % 4096
             |         * 2654435761) % 2001 - 1000) AS BIGINT) AS score_num,
             |    CAST(count(*) AS BIGINT) AS n_feats
             |  FROM feats GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(s.score_num, 0) AS score_num,
             |  coalesce(s.n_feats, 0) AS n_feats,
             |  CASE WHEN coalesce(s.n_feats, 0) = 0 THEN 0.0
             |       ELSE CAST(s.score_num AS DOUBLE) / s.n_feats END AS score,
             |  CASE WHEN coalesce(s.n_feats, 0) = 0 THEN FALSE
             |       ELSE CAST(s.score_num AS DOUBLE) / s.n_feats > 0 END AS label
             |FROM documents d LEFT JOIN scored s USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Corpus-LM fluency scoring (the CCNet/KenLM quality-filter role):
    // self-trained bigram conditionals, exact integer arithmetic
    // throughout — DuckDB retrains the same model and reproduces every
    // score bit-for-bit.
    QueryDef(
      "q_text_lm_score",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Curation.lmScore(d, "doc_id", "text").orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |           t -> t <> '') AS ts
             |  FROM documents),
             |bi AS (
             |  SELECT doc_id, ts[i.i] AS w1, ts[i.i + 1] AS w2
             |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) i),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
             |model AS (
             |  SELECT c2.w1, c2.w2, (1000000 * c2.c2) // c1.c1 AS cond_milli
             |  FROM c2 JOIN c1 USING (w1)),
             |scored AS (
             |  SELECT b.doc_id, CAST(sum(m.cond_milli) AS BIGINT) AS score_num,
             |    CAST(count(*) AS BIGINT) AS n_bigrams
             |  FROM bi b JOIN model m USING (w1, w2) GROUP BY b.doc_id)
             |SELECT d.doc_id,
             |  coalesce(s.score_num, 0) AS score_num,
             |  coalesce(s.n_bigrams, 0) AS n_bigrams,
             |  CASE WHEN coalesce(s.n_bigrams, 0) = 0 THEN 0.0
             |       ELSE CAST(s.score_num AS DOUBLE) / (s.n_bigrams * 1000000) END AS lm_score
             |FROM documents d LEFT JOIN scored s USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // DSIR-style importance resampling (Curation.dsirResample): score every
    // doc under the en-domain bigram model vs the whole-corpus model, form
    // the capped fixed-point probability-ratio weight, keep via the
    // portable md5 hash gate at ratePm·w_pm/1e9 — target-domain docs
    // upsampled, off-domain downsampled, all BIGINT-exact and replayed by
    // DuckDB end to end.
    QueryDef(
      "q_text_dsir",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        // target domain as a predicate over raw: one tokenize pass serves
        // both models (the separate target relation re-tokenized the en
        // slice — a second full 0.7 s scan at sf0.1; round 16, guide §2.4)
        Curation.dsirResample(d, d, "doc_id", "text", ratePm = 500,
            targetFromRaw = Some(col("lang") === "en"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |           t -> t <> '') AS ts
             |  FROM documents),
             |bi0 AS (
             |  SELECT doc_id, lang, ts[i.i] AS w1, ts[i.i + 1] AS w2
             |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) i),
             |spine AS (SELECT doc_id FROM documents),
             |tmodel AS (
             |  SELECT w1, w2, (1000000 * count(*)) // (sum(count(*)) OVER (PARTITION BY w1)) AS cond_milli
             |  FROM bi0 WHERE lang = 'en' GROUP BY w1, w2),
             |rmodel AS (
             |  SELECT w1, w2, (1000000 * count(*)) // (sum(count(*)) OVER (PARTITION BY w1)) AS cond_milli
             |  FROM bi0 GROUP BY w1, w2),
             |st AS (
             |  SELECT b.doc_id, CAST(sum(coalesce(m.cond_milli, 0)) AS BIGINT) AS st_num,
             |    CAST(count(*) AS BIGINT) AS nb
             |  FROM bi0 b LEFT JOIN tmodel m USING (w1, w2) GROUP BY b.doc_id),
             |sr AS (
             |  SELECT b.doc_id, CAST(sum(coalesce(m.cond_milli, 0)) AS BIGINT) AS sr_num,
             |    CAST(count(*) AS BIGINT) AS nb
             |  FROM bi0 b LEFT JOIN rmodel m USING (w1, w2) GROUP BY b.doc_id),
             |w AS (
             |  SELECT p.doc_id,
             |    coalesce(st.st_num, 0) // greatest(coalesce(st.nb, 0), 1) AS st_fp,
             |    coalesce(sr.sr_num, 0) // greatest(coalesce(sr.nb, 0), 1) AS sr_fp
             |  FROM spine p LEFT JOIN st USING (doc_id) LEFT JOIN sr USING (doc_id)),
             |ww AS (
             |  SELECT doc_id, st_fp, sr_fp,
             |    least(10000000, (1000000 * (st_fp + 1)) // (sr_fp + 1)) AS w_pm,
             |    CAST(('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) AS u24
             |  FROM w)
             |SELECT doc_id, CAST(st_fp AS BIGINT) AS st_fp, CAST(sr_fp AS BIGINT) AS sr_fp,
             |  CAST(w_pm AS BIGINT) AS w_pm,
             |  u24 < (500 * w_pm * 16777216) // 1000000000 AS kept
             |FROM ww ORDER BY doc_id""".stripMargin)),

    // DSIR with a SAMPLED raw model (round 11, the documented 100 TB
    // shape): the raw/doc bigram model trains on an md5-gated 20% of the
    // docs (deterministic, salted independently of the keep gate) while
    // scoring still covers the full corpus — the model-build aggregation
    // shrinks 5x. DuckDB replays the identical hash gate, so the sampled
    // model (and every downstream keep decision) is bit-exact.
    QueryDef(
      "q_text_dsir_sampled",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        // predicate-form target: one tokenize pass (see q_text_dsir)
        Curation.dsirResample(d, d, "doc_id", "text", ratePm = 500,
            rawSamplePm = 200, targetFromRaw = Some(col("lang") === "en"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |           t -> t <> '') AS ts
             |  FROM documents),
             |bi0 AS (
             |  SELECT doc_id, lang, ts[i.i] AS w1, ts[i.i + 1] AS w2
             |  FROM tok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) i),
             |spine AS (SELECT doc_id FROM documents),
             |tmodel AS (
             |  SELECT w1, w2, (1000000 * count(*)) // (sum(count(*)) OVER (PARTITION BY w1)) AS cond_milli
             |  FROM bi0 WHERE lang = 'en' GROUP BY w1, w2),
             |rmodel AS (
             |  SELECT w1, w2, (1000000 * count(*)) // (sum(count(*)) OVER (PARTITION BY w1)) AS cond_milli
             |  FROM bi0
             |  WHERE CAST(('0x' || substr(md5('dsirraw:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
             |        < (200 * CAST(16777216 AS BIGINT)) // 1000
             |  GROUP BY w1, w2),
             |st AS (
             |  SELECT b.doc_id, CAST(sum(coalesce(m.cond_milli, 0)) AS BIGINT) AS st_num,
             |    CAST(count(*) AS BIGINT) AS nb
             |  FROM bi0 b LEFT JOIN tmodel m USING (w1, w2) GROUP BY b.doc_id),
             |sr AS (
             |  SELECT b.doc_id, CAST(sum(coalesce(m.cond_milli, 0)) AS BIGINT) AS sr_num,
             |    CAST(count(*) AS BIGINT) AS nb
             |  FROM bi0 b LEFT JOIN rmodel m USING (w1, w2) GROUP BY b.doc_id),
             |w AS (
             |  SELECT p.doc_id,
             |    coalesce(st.st_num, 0) // greatest(coalesce(st.nb, 0), 1) AS st_fp,
             |    coalesce(sr.sr_num, 0) // greatest(coalesce(sr.nb, 0), 1) AS sr_fp
             |  FROM spine p LEFT JOIN st USING (doc_id) LEFT JOIN sr USING (doc_id)),
             |ww AS (
             |  SELECT doc_id, st_fp, sr_fp,
             |    least(10000000, (1000000 * (st_fp + 1)) // (sr_fp + 1)) AS w_pm,
             |    CAST(('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) AS u24
             |  FROM w)
             |SELECT doc_id, CAST(st_fp AS BIGINT) AS st_fp, CAST(sr_fp AS BIGINT) AS sr_fp,
             |  CAST(w_pm AS BIGINT) AS w_pm,
             |  u24 < (500 * w_pm * 16777216) // 1000000000 AS kept
             |FROM ww ORDER BY doc_id""".stripMargin)),

    // Unicode-script routing: staged multilingual docs (Scala-side
    // Character.toChars staging; DuckDB rebuilds identical codepoints via
    // chr()) — every 4th doc appends a CJK run, others Cyrillic/Arabic/
    // none, lengths scaled so the dominant script flips where the counts
    // say so. Both engines replay the per-block counts and the fixed tie
    // order exactly.
    QueryDef(
      "q_text_script",
      (s, dir) => {
        import s.implicits._
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 500)
          // sorted before the script staging + regexp_count profile (§2.4)
          .orderBy(col("doc_id"))
        val staged = d.select(col("doc_id"), substring(col("text"), 1, 20).as("base"))
          .as[(Long, String)].mapPartitions { it =>
            it.map { case (id, base) =>
              def run(cp0: Int, n: Int): String =
                (0 until n).map(j => new String(Character.toChars(cp0 + j.toInt % 40))).mkString
              val extra = (id % 4) match {
                case 0 => run(0x4E00 + (id % 40).toInt, (id % 30 + 15).toInt) // CJK
                case 1 => run(0x0410 + (id % 20).toInt, (id % 25 + 10).toInt) // Cyrillic
                case 2 => run(0x0627, (id % 20 + 5).toInt)                    // Arabic
                case _ => ""
              }
              (id, base + " " + extra)
            }
          }.toDF("doc_id", "text")
        Curation.scriptProfile(staged, "doc_id", "text")
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    substr(text, 1, 20) || ' ' ||
             |    CASE doc_id % 4
             |      WHEN 0 THEN (SELECT string_agg(chr(CAST(19968 + doc_id % 40 + j.j % 40 AS INTEGER)), '' ORDER BY j.j)
             |                   FROM (SELECT unnest(range(0, doc_id % 30 + 15)) AS j) j)
             |      WHEN 1 THEN (SELECT string_agg(chr(CAST(1040 + doc_id % 20 + j.j % 40 AS INTEGER)), '' ORDER BY j.j)
             |                   FROM (SELECT unnest(range(0, doc_id % 25 + 10)) AS j) j)
             |      WHEN 2 THEN (SELECT string_agg(chr(CAST(1575 + j.j % 40 AS INTEGER)), '' ORDER BY j.j)
             |                   FROM (SELECT unnest(range(0, doc_id % 20 + 5)) AS j) j)
             |      ELSE '' END AS text
             |  FROM documents WHERE doc_id < 500),
             |counts AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
             |    CAST(len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) AS BIGINT) AS n_cjk,
             |    CAST(len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS BIGINT) AS n_cyr,
             |    CAST(len(regexp_extract_all(text, '[\x{0600}-\x{06FF}]')) AS BIGINT) AS n_arab
             |  FROM staged)
             |SELECT doc_id, n_latin, n_cjk, n_cyr, n_arab,
             |  CASE WHEN n_latin >= n_cjk AND n_latin >= n_cyr AND n_latin >= n_arab THEN 'latin'
             |       WHEN n_cjk >= n_cyr AND n_cjk >= n_arab THEN 'cjk'
             |       WHEN n_cyr >= n_arab THEN 'cyrillic'
             |       ELSE 'arabic' END AS script
             |FROM counts ORDER BY doc_id""".stripMargin)),

    // End-to-end WEB pipeline — the round-8 operators composed as one
    // declarative plan, the q_pipeline_curation shape for crawled data:
    // HTML → text (map-side regexp chain) → learned-classifier gate
    // (broadcast model, exact integer score) → per-domain frequency cap →
    // per-domain survivor stats. The wide html/clean_text columns are
    // consumed map-side (strip + feature explode); shuffles carry only
    // (doc_id, bucket weights), the domain window, and the final stats.
    QueryDef(
      "q_pipeline_web",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 500)
        val id = col("doc_id")
        val html = concat(
          lit("<html><head><style>p{c:#"), (id % 10).cast("string"),
          lit("}</style><script>var x = 1 < 2;</script></head><body><p>"),
          substring(col("text"), 1, 120),
          lit(" &amp; tail</p><a href=\"/x\">l</a></body></html>"))
        val url = concat(lit("HTTPS://WWW.Site"), (id % 37).cast("string"),
          lit(".Example.COM/Path"), id.cast("string"))
        val staged = d.select(id, html.as("html"), url.as("url"))
        val stats = Curation.htmlStats(staged, "doc_id", "html")
        val weights = s.range(4096).select(col("id").as("bucket"),
          ((col("id") * 2654435761L) % 2001 - 1000).as("weight"))
        val scored = Curation.classifierScore(stats, "doc_id", "clean_text",
          weights, 4096, portable = !graft.RunMode.productionHash)
        val joined = stats.select(col("doc_id"), col("text_ratio"))
          .join(scored.select(col("doc_id"), col("score_num"), col("n_feats"),
            col("label")), "doc_id")
          .join(staged.select(id, Curation.urlDomain(col("url")).as("domain")), "doc_id")
        joined
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("domain")).orderBy(col("doc_id"))))
          .filter(col("rn") <= 8 && col("text_ratio") > 0.1 && col("label"))
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_feats")).cast("long").as("total_feats"),
            sum(col("score_num")).cast("long").as("total_score"))
          // exact integer sums → one double division (order-free)
          .withColumn("mean_score",
            col("total_score").cast("double") / col("total_feats"))
          .orderBy(col("domain"))
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    '<html><head><style>p{c:#' || CAST(doc_id % 10 AS VARCHAR)
             |    || '}</style><script>var x = 1 < 2;</script></head><body><p>'
             |    || substr(text, 1, 120)
             |    || ' &amp; tail</p><a href="/x">l</a></body></html>' AS html,
             |    'HTTPS://WWW.Site' || CAST(doc_id % 37 AS VARCHAR)
             |    || '.Example.COM/Path' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents WHERE doc_id < 500),
             |clean AS (
             |  SELECT doc_id, html,
             |    trim(regexp_replace(
             |      regexp_replace(
             |        regexp_replace(
             |          regexp_replace(
             |            regexp_replace(
             |              regexp_replace(
             |                regexp_replace(
             |                  regexp_replace(
             |                    regexp_replace(
             |                      regexp_replace(
             |                        regexp_replace(html,
             |                          '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
             |                        '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
             |                      '(?s)<!--.*?-->', ' ', 'g'),
             |                    '<[^>]*>', ' ', 'g'),
             |                  '&nbsp;', ' ', 'g'),
             |                '&lt;', '<', 'g'),
             |              '&gt;', '>', 'g'),
             |            '&quot;', '"', 'g'),
             |          '&#39;', '''', 'g'),
             |        '&amp;', '&', 'g'),
             |      '\s+', ' ', 'g')) AS clean_text
             |  FROM staged),
             |ratio AS (
             |  SELECT doc_id, clean_text,
             |    CAST(length(clean_text) AS DOUBLE) / length(html) AS text_ratio
             |  FROM clean),
             |tok AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(clean_text),
             |           '[^a-z0-9]+'), t -> t <> '') AS ts
             |  FROM ratio),
             |feats AS (
             |  SELECT doc_id, unnest(list_concat(ts,
             |    list_transform(range(1, len(ts)), i -> ts[i] || '_' || ts[i + 1]))) AS feat
             |  FROM tok),
             |scored AS (
             |  SELECT doc_id,
             |    CAST(sum((CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % 4096
             |         * 2654435761) % 2001 - 1000) AS BIGINT) AS score_num,
             |    CAST(count(*) AS BIGINT) AS n_feats
             |  FROM feats GROUP BY doc_id),
             |joined AS (
             |  SELECT r.doc_id, r.text_ratio, sc.score_num, sc.n_feats,
             |    CAST(sc.score_num AS DOUBLE) / sc.n_feats > 0 AS label,
             |    regexp_replace(regexp_replace(lower(regexp_extract(s.url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':(443|80)$', ''),
             |      '^www\.', '') AS domain
             |  FROM ratio r JOIN scored sc USING (doc_id) JOIN staged s USING (doc_id)),
             |capped AS (
             |  SELECT *, row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
             |  FROM joined)
             |SELECT domain,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_feats) AS BIGINT) AS total_feats,
             |  CAST(sum(score_num) AS BIGINT) AS total_score,
             |  CAST(sum(score_num) AS DOUBLE) / sum(n_feats) AS mean_score
             |FROM capped WHERE rn <= 8 AND text_ratio > 0.1 AND label
             |GROUP BY domain ORDER BY domain""".stripMargin)),

    // Corpus data card — the per-(lang, source) summary a dataset release
    // ships: doc counts, char volume, exact interpolated median/p90 doc
    // length (Spark `percentile` and DuckDB `quantile_cont` share the
    // (n-1)·p linear-interpolation definition; both sides round to 4dp),
    // and each stratum's exact per-myriad share of the corpus (integer
    // div — replayable, no float ratio). One hash-agg on the stratum key;
    // the 1-row corpus total broadcasts.
    QueryDef(
      "q_text_datacard",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val total = d.agg(count(lit(1)).cast("long").as("total"))
        d.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            round(median(col("n_chars")), 4).as("med_chars"),
            round(expr("percentile(n_chars, 0.9)"), 4).as("p90_chars"))
          .crossJoin(broadcast(total))
          .withColumn("permyriad", expr("(10000 * n_docs) div total"))
          .drop("total")
          .orderBy(col("lang"), col("source"))
      },
      Some("""WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
             |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  round(median(n_chars), 4) AS med_chars,
             |  round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
             |  (10000 * CAST(count(*) AS BIGINT)) // (SELECT total FROM t) AS permyriad
             |FROM documents GROUP BY lang, source
             |ORDER BY lang, source""".stripMargin)),

    // End-to-end QUALITY ENSEMBLE — the three independent quality signals
    // (Gopher repetition/length gates, learned hashed-n-gram classifier,
    // corpus-LM fluency) joined into one keep/drop verdict, reported per
    // language with per-signal failure counts (the corpus-QA table a
    // filtering run ships). The LM gate compares integers
    // (score_num > 34000*n_bigrams  ==  lm_score > 0.034) so the verdict
    // is replayable with zero float-threshold risk. Each signal is its own
    // narrow agg over the one corpus scan family; the verdict join carries
    // (doc_id, bool) triples; the final lang rollup is one tiny hash agg.
    QueryDef(
      "q_pipeline_quality",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val weights = s.range(4096).select(col("id").as("bucket"),
          ((col("id") * 2654435761L) % 2001 - 1000).as("weight"))
        val g = Curation.gopherStats(d, "doc_id", "text")
          .select(col("doc_id"), (col("n_tokens") >= 20 &&
            col("top_token_frac") < 0.2 &&
            col("top_bigram_frac") < 0.2).as("pass_gopher"))
        val c = Curation.classifierScore(d, "doc_id", "text", weights, 4096,
            portable = !graft.RunMode.productionHash)
          .select(col("doc_id"), col("label").as("pass_cls"))
        val l = Curation.lmScore(d, "doc_id", "text")
          .select(col("doc_id"),
            (col("score_num") > col("n_bigrams") * 34000L).as("pass_lm"))
        d.select(col("doc_id"), col("lang"))
          .join(g, "doc_id").join(c, "doc_id").join(l, "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("pass_gopher") && col("pass_cls") && col("pass_lm"),
              1L).otherwise(0L)).cast("long").as("n_keep"),
            sum(when(!col("pass_gopher"), 1L).otherwise(0L)).cast("long")
              .as("n_fail_gopher"),
            sum(when(!col("pass_cls"), 1L).otherwise(0L)).cast("long")
              .as("n_fail_cls"),
            sum(when(!col("pass_lm"), 1L).otherwise(0L)).cast("long")
              .as("n_fail_lm"))
          .orderBy(col("lang"))
      },
      Some("""WITH gtok AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
             |  FROM documents),
             |gtc AS (
             |  SELECT doc_id, tok, count(*) AS c, sum(length(tok)) AS chars
             |  FROM gtok GROUP BY doc_id, tok),
             |gts AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    CAST(max(c) AS DOUBLE) / sum(c) AS top_token_frac
             |  FROM gtc GROUP BY doc_id),
             |gt AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |gbg AS (
             |  SELECT doc_id, array_to_string(w[i.i + 1 : i.i + 2], ' ') AS bg
             |  FROM gt CROSS JOIN LATERAL (
             |    SELECT unnest(range(0, greatest(len(w) - 2, 0) + 1)) AS i) i),
             |gbc AS (SELECT doc_id, bg, count(*) AS c FROM gbg GROUP BY doc_id, bg),
             |gbs AS (
             |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
             |  FROM gbc GROUP BY doc_id),
             |gop AS (
             |  SELECT gts.doc_id,
             |    (n_tokens >= 20 AND top_token_frac < 0.2
             |     AND coalesce(top_bigram_frac, 0.0) < 0.2) AS pass_gopher
             |  FROM gts LEFT JOIN gbs ON gts.doc_id = gbs.doc_id),
             |ctok AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |           t -> t <> '') AS ts
             |  FROM documents),
             |cfeats AS (
             |  SELECT doc_id, unnest(list_concat(ts,
             |    list_transform(range(1, len(ts)), i -> ts[i] || '_' || ts[i + 1]))) AS feat
             |  FROM ctok),
             |cscored AS (
             |  SELECT doc_id,
             |    CAST(sum((CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % 4096
             |         * 2654435761) % 2001 - 1000) AS BIGINT) AS score_num,
             |    CAST(count(*) AS BIGINT) AS n_feats
             |  FROM cfeats GROUP BY doc_id),
             |cls AS (
             |  SELECT d.doc_id,
             |    CASE WHEN coalesce(s.n_feats, 0) = 0 THEN FALSE
             |         ELSE CAST(s.score_num AS DOUBLE) / s.n_feats > 0 END AS pass_cls
             |  FROM documents d LEFT JOIN cscored s USING (doc_id)),
             |lbi AS (
             |  SELECT doc_id, ts[i.i] AS w1, ts[i.i + 1] AS w2
             |  FROM ctok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) i),
             |lc2 AS (SELECT w1, w2, count(*) AS c2 FROM lbi GROUP BY w1, w2),
             |lc1 AS (SELECT w1, count(*) AS c1 FROM lbi GROUP BY w1),
             |lmodel AS (
             |  SELECT lc2.w1, lc2.w2, (1000000 * lc2.c2) // lc1.c1 AS cond_milli
             |  FROM lc2 JOIN lc1 USING (w1)),
             |lscored AS (
             |  SELECT b.doc_id, CAST(sum(m.cond_milli) AS BIGINT) AS score_num,
             |    CAST(count(*) AS BIGINT) AS n_bigrams
             |  FROM lbi b JOIN lmodel m USING (w1, w2) GROUP BY b.doc_id),
             |lm AS (
             |  SELECT d.doc_id,
             |    coalesce(s.score_num, 0) > coalesce(s.n_bigrams, 0) * 34000 AS pass_lm
             |  FROM documents d LEFT JOIN lscored s USING (doc_id))
             |SELECT d.lang,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN pass_gopher AND pass_cls AND pass_lm THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             |  CAST(sum(CASE WHEN NOT pass_gopher THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_gopher,
             |  CAST(sum(CASE WHEN NOT pass_cls THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_cls,
             |  CAST(sum(CASE WHEN NOT pass_lm THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_lm
             |FROM documents d
             |JOIN gop USING (doc_id) JOIN cls USING (doc_id) JOIN lm USING (doc_id)
             |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),

    // Corpus snapshot DIFF — the audit table an incremental refresh
    // publishes: v2 stages deterministic deletions (id%10=7), edits
    // (id%10=3) and additions (shifted ids), then corpusDiff classifies
    // every id by content digest. The join carries (id, md5) only.
    QueryDef(
      "q_corpus_diff",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val v2 = d.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"),
            when(col("doc_id") % 10 === 3, concat(col("text"), lit(" edited v2")))
              .otherwise(col("text")).as("text"))
          .unionByName(d.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        Curation.corpusDiff(d, v2, "doc_id", "text")
          .groupBy(col("status"))
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .orderBy(col("status"))
      },
      Some("""WITH v2 AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 3 THEN text || ' edited v2' ELSE text END AS text
             |  FROM documents WHERE doc_id % 10 <> 7
             |  UNION ALL
             |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
             |a AS (SELECT doc_id, md5(text) AS h1 FROM documents),
             |b AS (SELECT doc_id, md5(text) AS h2 FROM v2),
             |j AS (
             |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             |    CASE WHEN a.doc_id IS NULL THEN 'added'
             |         WHEN b.doc_id IS NULL THEN 'deleted'
             |         WHEN h1 = h2 THEN 'unchanged' ELSE 'changed' END AS status
             |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
             |SELECT status, CAST(count(*) AS BIGINT) AS n_docs
             |FROM j GROUP BY status ORDER BY status""".stripMargin)),

    // Data-expectations pass (Curation.expectations): three rules over a
    // deterministically corrupted corpus (blank text on id%11, n_chars
    // drift on id%13, unknown lang on id%17) — one corpus pass, conditional
    // sums inside a single aggregate, k-row stack. DuckDB replays staging
    // and counts.
    QueryDef(
      "q_text_validate",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val staged = d.select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit("  ")).otherwise(col("text")).as("text"),
          when(col("doc_id") % 17 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
          when(col("doc_id") % 13 === 0, col("n_chars") + 1)
            .otherwise(col("n_chars")).as("n_chars"))
        Curation.expectations(staged, Seq(
            "chars_consistent" -> (length(col("text")).cast("long") =!= col("n_chars")),
            "lang_known" -> !col("lang").isin("en", "es", "de", "fr", "zh"),
            "text_nonblank" -> (trim(col("text")) === "")))
          .orderBy(col("rule"))
      },
      Some("""WITH staged AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0 THEN '  ' ELSE text END AS text,
             |    CASE WHEN doc_id % 17 = 0 THEN 'xx' ELSE lang END AS lang,
             |    CASE WHEN doc_id % 13 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
             |  FROM documents)
             |SELECT * FROM (
             |  SELECT 'chars_consistent' AS rule,
             |    CAST(count(*) FILTER (length(text) <> n_chars) AS BIGINT) AS n_violations,
             |    CAST(count(*) AS BIGINT) AS n_checked FROM staged
             |  UNION ALL
             |  SELECT 'lang_known',
             |    CAST(count(*) FILTER (lang NOT IN ('en', 'es', 'de', 'fr', 'zh')) AS BIGINT),
             |    CAST(count(*) AS BIGINT) FROM staged
             |  UNION ALL
             |  SELECT 'text_nonblank',
             |    CAST(count(*) FILTER (trim(text) = '') AS BIGINT),
             |    CAST(count(*) AS BIGINT) FROM staged)
             |ORDER BY rule""".stripMargin)),

    // END-TO-END PREPROCESS — the whole front half of a training-data
    // build as ONE declarative plan: NFC normalize → quality gate (token
    // count + top-token dominance) → exact dedup keep-first →
    // deterministic 90/5/5 split → per-split doc/token stats, with the
    // quality and dup drop counts as audit rows. Wide text is consumed
    // map-side (digest + token stats); every shuffle after that carries
    // (id, counts, digest) only. DuckDB replays the entire chain.
    QueryDef(
      "q_pipeline_preprocess",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables(s, dir, "documents")
        val norm = d.select(col("doc_id"),
          graft.functions.TextFns.nfc(col("text")).as("t"))
        val ts = norm
          .select(col("doc_id"), explode(graft.functions.TextFns.tokens(col("t"))).as("tk"))
          .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).cast("long").as("n_tokens"),
            (max(col("c")).cast("double") / sum(col("c"))).as("top_frac"))
        // narrow spine persists: referenced by the kept chain + 2 audits
        val base = norm.join(ts, "doc_id")
          .select(col("doc_id"), md5(col("t").cast("binary")).as("h"),
            col("n_tokens"),
            (col("n_tokens") >= 20 && col("top_frac") < 0.2).as("pass_q"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dd = base.filter(col("pass_q"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("h")).orderBy(col("doc_id"))))
        val kept = graft.operators.Sampling.hashSplit(
          dd.filter(col("rn") === 1).select(col("doc_id"), col("n_tokens")),
          "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        def stats(df: org.apache.spark.sql.DataFrame, label: Option[String]) = {
          val g = label match {
            case Some(l) => df.agg(count(lit(1)).cast("long").as("n_docs"),
                coalesce(sum(col("n_tokens")), lit(0L)).cast("long").as("total_tokens"))
              .select(lit(l).as("split"), col("n_docs"), col("total_tokens"))
            case None => df.groupBy(col("split"))
              .agg(count(lit(1)).cast("long").as("n_docs"),
                coalesce(sum(col("n_tokens")), lit(0L)).cast("long").as("total_tokens"))
          }
          g
        }
        stats(kept, None)
          .unionByName(stats(base.filter(!col("pass_q")), Some("_dropped_quality")))
          .unionByName(stats(dd.filter(col("rn") > 1), Some("_dropped_dup")))
          .orderBy(col("split"))
      },
      Some("""WITH norm AS (
             |  SELECT doc_id, nfc_normalize(text) AS t FROM documents),
             |tok AS (SELECT doc_id, unnest(string_split_regex(trim(t), '\s+')) AS tk FROM norm),
             |tc AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk),
             |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |         CAST(max(c) AS DOUBLE) / sum(c) AS top_frac FROM tc GROUP BY doc_id),
             |q AS (SELECT n.doc_id, md5(n.t) AS h, ts.n_tokens,
             |        (ts.n_tokens >= 20 AND ts.top_frac < 0.2) AS pass_q
             |      FROM norm n JOIN ts USING (doc_id)),
             |dd AS (SELECT doc_id, n_tokens,
             |         row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
             |       FROM q WHERE pass_q),
             |kept AS (SELECT doc_id, n_tokens,
             |           CASE WHEN u < 0.9 THEN 'train' WHEN u < 0.95 THEN 'val'
             |                ELSE 'test' END AS split
             |         FROM (SELECT doc_id, n_tokens,
             |                 CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             |                   / 4294967296.0 AS u
             |               FROM dd WHERE rn = 1)),
             |outp AS (
             |  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total_tokens
             |  FROM kept GROUP BY split
             |  UNION ALL
             |  SELECT '_dropped_quality', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM q WHERE NOT pass_q
             |  UNION ALL
             |  SELECT '_dropped_dup', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM dd WHERE rn > 1)
             |SELECT split, n_docs, total_tokens FROM outp ORDER BY split""".stripMargin))
  )
}
