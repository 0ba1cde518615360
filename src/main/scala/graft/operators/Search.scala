package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus search / term-weighting primitives — the retrieval side of a
  * training-data pipeline (corpus QA, probe-set mining, keyword-based
  * decontamination lookups all start from an inverted index + a ranked
  * retrieval function over it).
  *
  * Everything here is EXACT integer arithmetic (the repo's fixed-point
  * convention, cf. Curation.lmScore): scores are BIGINT fixed-point values
  * that any oracle engine reproduces bit-for-bit — no floating-point `ln`
  * whose last-ulp rounding differs across engines. The classic `ln`-shaped
  * idf is replaced by documented monotone rational substitutes, so rankings
  * are comparable while every score stays replayable.
  *
  * Scale shape (100 TB): the token relation is a map-side explode of the
  * scan; the only wide exchange is the hash-agg on the token key. Posting
  * lists partition BY TOKEN — the known skew is stopword tokens, which is
  * why [[invertedIndex]] takes a `maxDf` gate (drop tokens present in more
  * than a fraction of docs — they carry no retrieval signal and their
  * postings are the skew). BM25 scoring only ever explodes the QUERY terms
  * (the array filter runs before the explode), so the shuffled relation is
  * the matched postings, not the corpus.
  */
object Search {

  /** The corpus tokenizer shared with Curation.classifierScore/lmScore:
    * lowercase, split on non-alphanumeric runs, drop empties. */
  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Inverted index: one row per surviving token with corpus tf, document
    * df and the sorted posting list (distinct doc ids). `minDf` drops
    * hapax-ish noise; `maxDfPermille` (per-mille of the corpus doc count)
    * drops stopword-grade tokens — the posting-list skew at scale.
    *
    * `postingsAs` picks the materialization:
    *  - `'array'` (default): one row per token, postings as a sorted
    *    `collect_set` array — convenient for bounded indexes; under the
    *    maxDf gate each array is bounded, but the row is as wide as the
    *    token's df.
    *  - `'relation'`: the 100 TB-native surface — one NARROW row per
    *    (token, doc_id) with the per-doc tf and the token's (tf, df)
    *    alongside (count/sum over the token partition of the already-
    *    aggregated relation — no second corpus pass, no wide rows, and
    *    downstream joins/scans shard by token like any fact table).
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1, maxDfPermille: Int = 1000,
                    postingsAs: String = "array"): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxDfPermille >= 1 && maxDfPermille <= 1000,
      s"maxDfPermille must be in [1, 1000], got $maxDfPermille")
    require(postingsAs == "array" || postingsAs == "relation",
      s"postingsAs must be 'array' or 'relation', got '$postingsAs'")
    // NO spreadForCompute here (round 17, measured +18%/+50% on
    // q_search_index/q_search_tfidf): the postings pipeline's small
    // exchanges re-coalesce to single tasks under AQE anyway, so the
    // extra spread exchange buys no downstream parallelism
    val tok = df.select(col(idCol).cast("long").as("doc_id"),
        explode(toks(col(textCol))).as("token"))
    val nDocs = df.select(count(lit(1)).cast("long").as("n_docs"))
    def gated(d: DataFrame): DataFrame =
      d.crossJoin(broadcast(nDocs))
        .filter(col("df") >= minDf &&
          col("df") * 1000L <= col("n_docs") * maxDfPermille.toLong)
        .drop("n_docs")
    if (postingsAs == "array")
      // df = size(posting_ids), NOT count_distinct: a distinct aggregate
      // next to collect_set plans an Expand (every input row duplicated
      // per aggregate family) — the set is already being built, so its
      // size is the distinct count for free, one pass instead of two.
      gated(tok.groupBy(col("token"))
        .agg(count(lit(1)).cast("long").as("tf"),
          sort_array(collect_set(col("doc_id"))).as("posting_ids"))
        .withColumn("df", size(col("posting_ids")).cast("long"))
        .select(col("token"), col("tf"), col("df"), col("posting_ids")))
    else {
      val w = Window.partitionBy(col("token"))
      gated(tok.groupBy(col("token"), col("doc_id"))
          .agg(count(lit(1)).cast("long").as("tf_doc"))
          .withColumn("tf", sum(col("tf_doc")).over(w).cast("long"))
          .withColumn("df", count(lit(1)).over(w).cast("long")))
        .select(col("token"), col("doc_id"), col("tf_doc"), col("tf"), col("df"))
    }
  }

  /** BM25 top-k retrieval for a literal term list, exact fixed-point.
    *
    * Classic BM25 (k1 = 1.2, b = 0.75) with two documented substitutions
    * that make every score an exact BIGINT:
    *  - idf: `ln((N-df+0.5)/(df+0.5))` → the fixed-point RATIO of the same
    *    argument, `idf_fp = (1000·(2(N−df)+1)) div (2df+1)` — monotone in
    *    the classic idf, so rankings agree where classic BM25's do;
    *  - relative doc length `dl/avgdl` → `rdl = (1000·dl·N) div T` (T =
    *    total corpus tokens), a defined per-mille quantization that keeps
    *    every operand within BIGINT range at any corpus size.
    * Per-term contribution (k1+1 = 11/5, denominator ×10000):
    *   `tfn_fp = (22000000·tf) div (10000·tf + 3000 + 9·rdl)`  (≤ 2.2e6)
    *   `score_fp = Σ idf_fp · tfn_fp` — an order-free BIGINT sum.
    *
    * Plan: dl/token stats are map-side; the query-term filter runs INSIDE
    * the array before the explode, so only matched postings shuffle (one
    * hash-agg on (doc, term)); per-term df and the 1-row corpus stats
    * broadcast back; the final top-k lowers to TakeOrderedAndProject.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      toks(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")).cast("long"))
    val stats = base.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("total_dl"))
    // per-term document frequency is a COUNT OVER the token partition of
    // the matched-postings relation (one row per (doc, term), so the
    // partition row count IS df_t) — a single corpus pass with no persist;
    // a cache here would outlive the query in the session's CacheManager
    // (library callers composing operators would accumulate cached
    // relations for the session lifetime). The windowed relation is
    // docs×|terms| rows of (ids, counts) — tiny.
    val hits = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("ts"), t => t.isInCollection(terms))).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("df_t",
        count(lit(1)).over(Window.partitionBy(col("token"))).cast("long"))
    hits.crossJoin(broadcast(stats))
      .withColumn("idf_fp",
        expr("(1000 * (2 * (n_docs - df_t) + 1)) div (2 * df_t + 1)"))
      .withColumn("rdl", expr("(1000 * dl * n_docs) div total_dl"))
      .withColumn("contrib",
        col("idf_fp") * expr("(22000000 * tf) div (10000 * tf + 3000 + 9 * rdl)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("long").as("score_fp"),
        count(lit(1)).cast("long").as("n_hit"))
      .withColumn("score", col("score_fp").cast("double") / 1e6)
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-doc token count (dl) — the narrow doc-length dimension the
    * index-side BM25 scorer joins; build it once alongside the inverted
    * index (one map-side pass, no shuffle).
    */
  def docLengths(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      size(toks(col(textCol))).cast("long").as("dl"))

  /** BM25 top-k scored from a PRE-BUILT relation-form index — the 100 TB
    * retrieval path: `postings` is [[invertedIndex]]`(postingsAs =
    * 'relation')` output ((token, doc_id, tf_doc, tf, df) — build it
    * UNGATED, minDf=1/maxDfPermille=1000, for exact [[bm25TopK]] parity),
    * `docLens` is [[docLengths]]. No corpus text is touched at query
    * time: the plan filters the postings fact table by term (narrow rows,
    * token-prunable when the index is written partitioned/bucketed by
    * token), joins the doc-length dimension on the doc key, and
    * broadcasts the 1-row corpus stats. Scores are the identical exact
    * fixed-point BIGINTs of [[bm25TopK]] (same idf_fp/rdl/tfn_fp
    * formulas), so both paths are interchangeable under one oracle.
    */
  def bm25TopKFromIndex(postings: DataFrame, docLens: DataFrame,
                        terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopKFromIndex needs at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val stats = docLens.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("total_dl"))
    val hits = postings
      .filter(col("token").isInCollection(terms))
      .select(col("doc_id"), col("tf_doc").as("tf"), col("df").as("df_t"))
      .join(docLens, "doc_id")
    hits.crossJoin(broadcast(stats))
      .withColumn("idf_fp",
        expr("(1000 * (2 * (n_docs - df_t) + 1)) div (2 * df_t + 1)"))
      .withColumn("rdl", expr("(1000 * dl * n_docs) div total_dl"))
      .withColumn("contrib",
        col("idf_fp") * expr("(22000000 * tf) div (10000 * tf + 3000 + 9 * rdl)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("long").as("score_fp"),
        count(lit(1)).cast("long").as("n_hit"))
      .withColumn("score", col("score_fp").cast("double") / 1e6)
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion over N rankings — the standard hybrid-search
    * combiner (lexical BM25 + semantic ANN, or any mix of rank lists).
    * Each input is a (doc_id, rank) relation; a document's fused score is
    * `Σ 1000000 div (c + rank)` over the lists that ranked it — the
    * classic RRF formula in exact fixed-point (integer division, order-
    * free BIGINT sum), so fusion is engine-replayable. Inputs are already
    * top-k-sized rank lists (tiny); the union + one hash-agg + final
    * TakeOrderedAndProject never touch the corpus.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1 && c >= 0, s"bad k=$k / c=$c")
    rankings
      .map(_.select(col("doc_id").cast("long").as("doc_id"),
        expr(s"1000000 div ($c + rank)").cast("long").as("__contrib")))
      .reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_lists"),
        sum(col("__contrib")).cast("long").as("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-document top-m keyword extraction by fixed-point TF-IDF:
    * `tfidf_fp = tf · ((1000·N) div df)` — the idf is the scaled inverse
    * document-frequency RATIO (monotone in the classic `ln(N/df)`).
    * Ties break (tfidf_fp DESC, token ASC). One token-key agg for df, one
    * doc-key window for the per-doc rank — both narrow relations.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val tok = df.select(col(idCol).cast("long").as("doc_id"),
      explode(toks(col(textCol))).as("token"))
    // df derives FROM the tf relation (one row per (doc, token), so the
    // token partition's row count IS the document frequency) — computed as
    // COUNT OVER the token window, keeping the whole operator a single
    // corpus pass with no persist (a cache here would sit in the session's
    // CacheManager until clearCache — a leak for library callers)
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("token"))).cast("long"))
    val nDocs = df.select(count(lit(1)).cast("long").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_fp").desc, col("token"))
    tf.crossJoin(broadcast(nDocs))
      .withColumn("tfidf_fp", col("tf") * expr("(1000 * n_docs) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= m)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("tfidf_fp"))
  }
}
