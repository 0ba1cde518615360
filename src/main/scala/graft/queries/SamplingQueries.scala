package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sampling

/** Corpus-composition sampling (beyond-reference LLM-data operators):
  * deterministic stratified sampling and mixture re-weighting over
  * `documents`. Both are hash-gated (portable md5 family), so DuckDB
  * reproduces the exact sample — full oracles, no rows-only checks.
  */
object SamplingQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // Exactly 5 docs per source, uniform by hash rank — deterministic
    // per-stratum reservoir sampling.
    QueryDef(
      "q_sample_stratified",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Sampling.stratifiedK(d, Seq("source"), "doc_id", 5)
          .select(col("doc_id"), col("source"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source, row_number() OVER (
             |    PARTITION BY source
             |    ORDER BY md5('s:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents) WHERE rk <= 5 ORDER BY source, doc_id""".stripMargin)),

    // Resample the corpus to a target language mixture (en-heavy corpus →
    // 40/20/20/10/10): per-stratum rates derived from counts (largest
    // total preserving exact proportions), then a map-side hash gate.
    QueryDef(
      "q_sample_mixture",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Sampling.mixture(d, "lang", "doc_id",
            Map("en" -> 0.4, "zh" -> 0.2, "es" -> 0.2, "de" -> 0.1, "fr" -> 0.1))
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
             |    CASE lang WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.2 WHEN 'es' THEN 0.2
             |              WHEN 'de' THEN 0.1 WHEN 'fr' THEN 0.1 END AS w
             |  FROM documents GROUP BY lang),
             |t AS (SELECT min(n / w) AS t FROM c WHERE w IS NOT NULL),
             |r AS (SELECT lang, least(1.0, w * t.t / n) AS rate FROM c, t
             |      WHERE w IS NOT NULL)
             |SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang
             |WHERE CAST('0x' || substr(md5('m:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             |      / 4294967296.0 < r.rate
             |ORDER BY d.doc_id""".stripMargin)),

    // Deterministic train/val/test split (90/5/5): each doc's unit hash
    // falls into one cumulative-weight interval — disjoint, exhaustive,
    // and STABLE under corpus growth (an eval doc never migrates into
    // train when new docs arrive). Map-side; DuckDB replays the hash
    // arithmetic and interval logic exactly.
    QueryDef(
      "q_sample_split",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Sampling.hashSplit(d, "doc_id",
            Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
          .select(col("doc_id"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CASE WHEN u < 0.9 THEN 'train'
             |       WHEN u < 0.95 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             |          / 4294967296.0 AS u
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic training-order sharding: shard = portable hash % 8,
    // within-shard position = (md5, id) rank — the reproducible "global
    // shuffle" before writing training shards (rand-based shuffles are
    // not reproducible across engines or retries).
    QueryDef(
      "q_sample_shards",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Sampling.shardOrder(d, "doc_id", 8)
          .select(col("doc_id"), col("shard"), col("pos"))
          .orderBy(col("shard"), col("pos"))
      },
      Some("""SELECT doc_id,
             |  CAST(h % 8 AS INTEGER) AS shard,
             |  CAST(row_number() OVER (PARTITION BY h % 8
             |    ORDER BY md5('shard:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
             |FROM (SELECT doc_id,
             |        CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
             |      FROM documents)
             |ORDER BY shard, pos""".stripMargin)),

    // Budget-constrained selection: the best-scoring docs whose cumulative
    // char cost fits 100k (~2/3 of the corpus — the gate binds) — "train on the best N tokens" as an exact
    // prefix of the (score DESC, id) order. One global sort (range-
    // partitioned) + running-sum window; DuckDB replays the prefix.
    QueryDef(
      "q_sample_budget",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .withColumn("score", col("n_chars") * 2654435761L % 1000)
        Sampling.selectBudget(d, "doc_id", "score", "n_chars", 100000L)
          .select(col("doc_id"), col("score"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, score, n_chars FROM (
             |  SELECT doc_id, (n_chars * 2654435761) % 1000 AS score, n_chars,
             |    sum(n_chars) OVER (
             |      ORDER BY (n_chars * 2654435761) % 1000 DESC, doc_id) AS cum
             |  FROM documents)
             |WHERE cum <= 100000 ORDER BY doc_id""".stripMargin)),

    // Sequence packing: per-source offset packing into 4096-char budgets
    // (concat-then-chunk pretraining layout); per-pack composition stats.
    QueryDef(
      "q_pack_sequences",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        graft.operators.Packing.offsetPack(d, Seq("source"), "doc_id", "n_chars", 4096L)
          .groupBy(col("source"), col("pack_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"), col("pack_id"))
      },
      Some("""SELECT source, CAST(floor((cum - n_chars) / 4096.0) AS BIGINT) AS pack_id,
             |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM (SELECT source, doc_id, n_chars,
             |        sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id) AS cum
             |      FROM documents)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Greedy BIN packing (no straddle — the packed-SFT layout): per-source
    // sequential fill into 4096-char bins, a doc that does not fit closes
    // the bin. Oracle replays the same left fold with a recursive CTE.
    QueryDef(
      "q_pack_bins",
      (s, dir) => {
        // project BEFORE the fold: mapPartitions is opaque to column
        // pruning, so un-projected wide text would ride the stratum
        // shuffle and sort
        val d = Tables(s, dir, "documents").select("source", "doc_id", "n_chars")
        graft.operators.Packing.binPack(d, Seq("source"), "doc_id", "n_chars", 4096L)
          .groupBy(col("source"), col("bin_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"), col("bin_id"))
      },
      Some("""WITH RECURSIVE ordered AS (
             |  SELECT source, doc_id, COALESCE(n_chars, 0) AS n_chars,
             |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
             |  FROM documents),
             |p AS (
             |  SELECT source, rn, n_chars, 0 AS bin, n_chars AS fill
             |  FROM ordered WHERE rn = 1
             |  UNION ALL
             |  SELECT o.source, o.rn, o.n_chars,
             |         CASE WHEN p.fill > 0 AND p.fill + o.n_chars > 4096
             |              THEN p.bin + 1 ELSE p.bin END,
             |         CASE WHEN p.fill > 0 AND p.fill + o.n_chars > 4096
             |              THEN o.n_chars ELSE p.fill + o.n_chars END
             |  FROM p JOIN ordered o ON o.source = p.source AND o.rn = p.rn + 1)
             |SELECT source, CAST(bin AS BIGINT) AS bin_id, count(*) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // SFT chat-template assembly (Packing.assembleChat): staged 5-turn
    // conversations (doc_id div 5, alternating roles) render to one
    // training string with the assistant loss-mask spans as exact 1-based
    // character offsets — both text and mask replayed by DuckDB.
    QueryDef(
      "q_pack_chat",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val turns = d.select(
          expr("doc_id div 5").as("conv_id"),
          (col("doc_id") % 5).as("idx"),
          when(col("doc_id") % 5 % 2 === 0, "user").otherwise("assistant").as("role"),
          substring(col("text"), 1, 60).as("txt"))
        graft.operators.Packing.assembleChat(turns, "conv_id", "idx", "role", "txt")
          .orderBy(col("conv_id"))
      },
      Some("""WITH turns AS (
             |  SELECT doc_id // 5 AS conv_id, doc_id % 5 AS idx,
             |    CASE WHEN doc_id % 5 % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
             |    substr(text, 1, 60) AS txt
             |  FROM documents),
             |b AS (SELECT conv_id, idx, role,
             |        '<|' || role || '|>' || txt || '<|end|>' AS block FROM turns),
             |o AS (SELECT conv_id, idx, role, block,
             |        CAST(length(block) AS BIGINT) AS len,
             |        CAST(coalesce(sum(length(block)) OVER (PARTITION BY conv_id ORDER BY idx
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) + 1 AS start
             |      FROM b)
             |SELECT CAST(conv_id AS BIGINT) AS conv_id, CAST(count(*) AS BIGINT) AS n_turns,
             |  string_agg(block, '' ORDER BY idx) AS text,
             |  coalesce(string_agg(CASE WHEN role = 'assistant'
             |    THEN start || '-' || (start + len - 1) END, ',' ORDER BY idx), '') AS assistant_spans
             |FROM o GROUP BY conv_id ORDER BY conv_id""".stripMargin))
  )
}
