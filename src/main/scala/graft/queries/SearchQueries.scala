package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Search

/** Retrieval surface over the documents table: inverted index, BM25
  * ranked retrieval, TF-IDF keyword extraction. All three are exact
  * integer arithmetic end-to-end (Search.scala's fixed-point convention),
  * so DuckDB replays the full chain — postings, df/tf, idf substitutes,
  * scores, ranks — bit-for-bit.
  */
object SearchQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // Inverted index over the corpus tokenizer: per token tf, df and the
    // sorted posting list (joined to a comma string so the compare is a
    // plain scalar — no engine-specific array rendering). minDf=3 drops
    // noise; maxDf gate wide open at this vocabulary size.
    QueryDef(
      "q_search_index",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Search.invertedIndex(d, "doc_id", "text", minDf = 3)
          .select(col("token"), col("tf"), col("df"),
            array_join(transform(col("posting_ids"), x => x.cast("string")), ",")
              .as("postings"))
          .orderBy(col("token"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |           t -> t <> '')) AS token
             |  FROM documents),
             |tfs AS (SELECT token, CAST(count(*) AS BIGINT) AS tf
             |        FROM tok GROUP BY token),
             |dd AS (SELECT DISTINCT doc_id, token FROM tok),
             |post AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
             |           string_agg(doc_id, ',' ORDER BY doc_id) AS postings
             |         FROM dd GROUP BY token)
             |SELECT token, tf, df, postings
             |FROM post JOIN tfs USING (token)
             |WHERE df >= 3 ORDER BY token""".stripMargin)),

    // Relation-form postings (postingsAs='relation'): the 100 TB-native
    // surface — one narrow (token, doc_id, tf_doc) row with the token's
    // (tf, df) alongside; no collect_set arrays, shards by token.
    QueryDef(
      "q_search_index_rel",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Search.invertedIndex(d, "doc_id", "text", minDf = 3,
            postingsAs = "relation")
          .orderBy(col("token"), col("doc_id"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |           t -> t <> '')) AS token
             |  FROM documents),
             |td AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf_doc
             |       FROM tok GROUP BY token, doc_id),
             |rel AS (SELECT token, doc_id, tf_doc,
             |          CAST(sum(tf_doc) OVER (PARTITION BY token) AS BIGINT) AS tf,
             |          CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df
             |        FROM td)
             |SELECT token, doc_id, tf_doc, tf, df FROM rel
             |WHERE df >= 3 ORDER BY token, doc_id""".stripMargin)),

    // BM25 top-20 for a three-term query. Fixed-point contract documented
    // at Search.bm25TopK; DuckDB recomputes every BIGINT score exactly.
    QueryDef(
      "q_search_bm25",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        Search.bm25TopK(d, "doc_id", "text",
            Seq("spark", "vector", "customer"), k = 20)
          .select(col("doc_id"), col("n_hit"), col("score_fp"), col("score"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |      t -> t <> '') AS ts
             |  FROM documents),
             |wd AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS dl FROM base),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |            CAST(sum(dl) AS BIGINT) AS total_dl FROM wd),
             |hits AS (
             |  SELECT doc_id, dl, t.token AS token, CAST(count(*) AS BIGINT) AS tf
             |  FROM wd, LATERAL (SELECT unnest(ts) AS token) t
             |  WHERE t.token IN ('spark', 'vector', 'customer')
             |  GROUP BY doc_id, dl, t.token),
             |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t
             |          FROM hits GROUP BY token),
             |scored AS (
             |  SELECT h.doc_id,
             |    ((1000 * (2 * (s.n_docs - d.df_t) + 1)) // (2 * d.df_t + 1))
             |      * ((22000000 * h.tf) //
             |         (10000 * h.tf + 3000 + 9 * ((1000 * h.dl * s.n_docs) // s.total_dl)))
             |      AS contrib
             |  FROM hits h JOIN dfreq d USING (token), stats s),
             |agg AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_fp,
             |          CAST(count(*) AS BIGINT) AS n_hit
             |        FROM scored GROUP BY doc_id)
             |SELECT doc_id, n_hit, score_fp,
             |  CAST(score_fp AS DOUBLE) / 1000000 AS score
             |FROM agg ORDER BY score_fp DESC, doc_id LIMIT 20""".stripMargin)),

    // The same retrieval through the RELATION-form index path
    // (Search.bm25TopKFromIndex over invertedIndex(postingsAs='relation')
    // + docLengths): the 100 TB shape — corpus text is tokenized only to
    // BUILD the index; query-time scoring touches narrow (token, doc)
    // fact rows and the doc-length dimension. Same exact fixed-point
    // scores, same oracle as q_search_bm25.
    QueryDef(
      "q_search_bm25_rel",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val idx = Search.invertedIndex(d, "doc_id", "text",
          postingsAs = "relation")
        Search.bm25TopKFromIndex(idx, Search.docLengths(d, "doc_id", "text"),
            Seq("spark", "vector", "customer"), k = 20)
          .select(col("doc_id"), col("n_hit"), col("score_fp"), col("score"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |      t -> t <> '') AS ts
             |  FROM documents),
             |wd AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS dl FROM base),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |            CAST(sum(dl) AS BIGINT) AS total_dl FROM wd),
             |hits AS (
             |  SELECT doc_id, dl, t.token AS token, CAST(count(*) AS BIGINT) AS tf
             |  FROM wd, LATERAL (SELECT unnest(ts) AS token) t
             |  WHERE t.token IN ('spark', 'vector', 'customer')
             |  GROUP BY doc_id, dl, t.token),
             |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t
             |          FROM hits GROUP BY token),
             |scored AS (
             |  SELECT h.doc_id,
             |    ((1000 * (2 * (s.n_docs - d.df_t) + 1)) // (2 * d.df_t + 1))
             |      * ((22000000 * h.tf) //
             |         (10000 * h.tf + 3000 + 9 * ((1000 * h.dl * s.n_docs) // s.total_dl)))
             |      AS contrib
             |  FROM hits h JOIN dfreq d USING (token), stats s),
             |agg AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_fp,
             |          CAST(count(*) AS BIGINT) AS n_hit
             |        FROM scored GROUP BY doc_id)
             |SELECT doc_id, n_hit, score_fp,
             |  CAST(score_fp AS DOUBLE) / 1000000 AS score
             |FROM agg ORDER BY score_fp DESC, doc_id LIMIT 20""".stripMargin)),

    // Per-doc top-3 keywords by fixed-point TF-IDF on a 100-doc slice
    // (bounds the output; df/N computed over the same slice both sides).
    QueryDef(
      "q_search_tfidf",
      (s, dir) => {
        val d = Tables(s, dir, "documents").filter(col("doc_id") < 100)
        Search.tfIdfTopTerms(d, "doc_id", "text", m = 3)
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH docs AS (SELECT * FROM documents WHERE doc_id < 100),
             |tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |           t -> t <> '')) AS token
             |  FROM docs),
             |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY doc_id, token),
             |dfreq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |          FROM tok GROUP BY token),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs),
             |sc AS (
             |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
             |    tf.tf * ((1000 * n.n_docs) // dfreq.df) AS tfidf_fp
             |  FROM tf JOIN dfreq USING (token), n),
             |rk AS (
             |  SELECT doc_id, token, tf, df, tfidf_fp,
             |    CAST(row_number() OVER (PARTITION BY doc_id
             |           ORDER BY tfidf_fp DESC, token) AS BIGINT) AS rank
             |  FROM sc)
             |SELECT doc_id, rank, token, tf, df, tfidf_fp
             |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // HYBRID retrieval: BM25 lexical top-50 and exact-cosine semantic
    // top-50 (query = vector 0 against the rest) fused by reciprocal-rank
    // fusion in exact fixed-point (Search.rrfFuse). Both rank lists and
    // the fusion are integer-replayable, so DuckDB reproduces the final
    // top-20 bit-for-bit. The rank windows run over already-top-k rows
    // (50 each) — the single-partition window is on a k-row relation,
    // never the corpus.
    QueryDef(
      "q_search_hybrid",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val e = Tables(s, dir, "embeddings")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("score_fp").desc, col("doc_id"))
        val lex = Search.bm25TopK(d, "doc_id", "text",
            Seq("spark", "vector", "customer"), k = 50)
          .select(col("doc_id"),
            row_number().over(w).cast("long").as("rank"))
        val sem = graft.operators.Similarity.bruteForceTopKQuantized(
            e.filter(col("vec_id") === 0), e.filter(col("vec_id") >= 1),
            "vec_id", "vec_id", "embedding", k = 50)
          .select(col("c_id").as("doc_id"), col("rnk").as("rank"))
        Search.rrfFuse(Seq(lex, sem), k = 20)
      },
      Some("""WITH base AS (
             |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             |    t -> t <> '') AS ts
             |  FROM documents),
             |wd AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS dl FROM base),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |            CAST(sum(dl) AS BIGINT) AS total_dl FROM wd),
             |hits AS (
             |  SELECT doc_id, dl, t.token AS token, CAST(count(*) AS BIGINT) AS tf
             |  FROM wd, LATERAL (SELECT unnest(ts) AS token) t
             |  WHERE t.token IN ('spark', 'vector', 'customer')
             |  GROUP BY doc_id, dl, t.token),
             |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t FROM hits GROUP BY token),
             |lexscored AS (
             |  SELECT h.doc_id,
             |    ((1000 * (2 * (s.n_docs - d.df_t) + 1)) // (2 * d.df_t + 1))
             |      * ((22000000 * h.tf) //
             |         (10000 * h.tf + 3000 + 9 * ((1000 * h.dl * s.n_docs) // s.total_dl)))
             |      AS contrib
             |  FROM hits h JOIN dfreq d USING (token), stats s),
             |lexagg AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_fp
             |           FROM lexscored GROUP BY doc_id),
             |lex AS (
             |  SELECT doc_id, rank_ AS rank FROM (
             |    SELECT doc_id, CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id) AS BIGINT) AS rank_
             |    FROM lexagg) WHERE rank_ <= 50),
             |qv AS (SELECT vec_id,
             |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
             |       FROM embeddings),
             |semscored AS (
             |  SELECT b.vec_id AS doc_id,
             |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv), z -> z[1] * z[2])) AS DOUBLE)
             |      / (sqrt(CAST(list_sum(list_transform(a.qv, x -> x * x)) AS DOUBLE))
             |         * sqrt(CAST(list_sum(list_transform(b.qv, x -> x * x)) AS DOUBLE))) AS sim
             |  FROM qv a JOIN qv b ON a.vec_id = 0 AND b.vec_id >= 1),
             |sem AS (
             |  SELECT doc_id, rank_ AS rank FROM (
             |    SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS rank_
             |    FROM semscored) WHERE rank_ <= 50),
             |u AS (
             |  SELECT doc_id, 1000000 // (60 + rank) AS contrib FROM lex
             |  UNION ALL
             |  SELECT doc_id, 1000000 // (60 + rank) AS contrib FROM sem)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
             |  CAST(sum(contrib) AS BIGINT) AS rrf_fp
             |FROM u GROUP BY doc_id ORDER BY rrf_fp DESC, doc_id LIMIT 20""".stripMargin))
  )
}
