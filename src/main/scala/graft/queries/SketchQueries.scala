package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sketches

/** Bounded-state sketch operators (operators/Sketches.scala) over the
  * driver tables — cardinality estimation and exact pruned heavy hitters,
  * both engine-replayable (portable md5 hashing, integer thresholds), so
  * DuckDB hash-compares the actual sketch outputs.
  */
object SketchQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // SQL surface for the sketch family (round 13): the eventflux-SQL app
    // text a migrating user writes — kmv_distinct(col, k) and
    // hist_quantile(col, q_pm[, scale]) as GROUP BY aggregates, lowered by
    // GraftApp.compileQuery to the Sketches OPERATORS (bounded
    // per-(partition,group) state), mixed with a plain count(*) that rides
    // the normal grouped path and joins back on the group spine. The
    // oracle replays the md5-60 bottom-k estimator and the integer
    // histogram-quantile rule per group.
    QueryDef(
      "q_sketch_sql",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (etype STRING, n BIGINT, du BIGINT, p50 DOUBLE);
            |INSERT INTO Out SELECT event_type AS etype, count(*) AS n,
            |  kmv_distinct(user_id, 64) AS du,
            |  hist_quantile(value, 500, 100) AS p50
            |FROM events GROUP BY event_type ORDER BY etype;""".stripMargin
        graft.sql.GraftApp.run(s, app,
          Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("etype"))
      },
      Some("""WITH h AS (SELECT DISTINCT event_type AS key,
             |  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |r AS (SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv) AS rn FROM h),
             |du AS (SELECT key, CAST(count(*) AS BIGINT) AS k_used, max(hv) AS kth
             |       FROM r WHERE rn <= 64 GROUP BY key),
             |duv AS (SELECT key,
             |  CASE WHEN k_used < 64 THEN k_used
             |       ELSE CAST(round(63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)) AS BIGINT) END AS du
             |  FROM du),
             |b AS (SELECT event_type AS key, CAST(floor(value * 100) AS BIGINT) AS bucket
             |      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
             |bc AS (SELECT key, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
             |cum AS (SELECT key, bucket, sum(cnt) OVER (PARTITION BY key ORDER BY bucket) AS cum,
             |               sum(cnt) OVER (PARTITION BY key) AS nn FROM bc),
             |p50 AS (SELECT key, min(bucket) AS bucket FROM cum
             |        WHERE cum >= greatest(1, (500 * nn + 999) // 1000) GROUP BY key),
             |n AS (SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
             |SELECT n.key AS etype, n.n,
             |       duv.du, CAST(p50.bucket AS DOUBLE) / 100 AS p50
             |FROM n LEFT JOIN duv ON duv.key = n.key
             |       LEFT JOIN p50 ON p50.key = n.key
             |ORDER BY etype""".stripMargin)),

    // Multi-key GROUP BY + HAVING for sketch SQL (round 14): the datacard
    // query a migrating user writes on day one — GROUP BY source×lang
    // shaped keys with a composite spine (to_json key struct joins the
    // per-group operator results back; output keys keep their original
    // columns/types) and HAVING evaluated in the normal-aggregate pass
    // pruning the spine. The oracle replays the md5-60 bottom-k estimator
    // per composite group and applies the same HAVING.
    QueryDef(
      "q_sketch_sql_multikey",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (etype STRING, user_id BIGINT, n BIGINT, du BIGINT);
            |INSERT INTO Out SELECT event_type AS etype, user_id, count(*) AS n,
            |  kmv_distinct(event_id, 16) AS du
            |FROM events GROUP BY event_type, user_id HAVING count(*) >= 15
            |ORDER BY etype, user_id;""".stripMargin
        graft.sql.GraftApp.run(s, app,
          Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("etype"), col("user_id"))
      },
      Some("""WITH h AS (SELECT DISTINCT event_type, user_id,
             |  CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |  FROM events WHERE event_id IS NOT NULL),
             |r AS (SELECT event_type, user_id, hv,
             |  row_number() OVER (PARTITION BY event_type, user_id ORDER BY hv) AS rn FROM h),
             |du AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS k_used, max(hv) AS kth
             |       FROM r WHERE rn <= 16 GROUP BY 1, 2),
             |duv AS (SELECT event_type, user_id,
             |  CASE WHEN k_used < 16 THEN k_used
             |       ELSE CAST(round(15.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)) AS BIGINT) END AS du
             |  FROM du),
             |n AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2
             |      HAVING count(*) >= 15)
             |SELECT n.event_type AS etype, n.user_id, n.n, duv.du
             |FROM n LEFT JOIN duv ON duv.event_type = n.event_type AND duv.user_id = n.user_id
             |ORDER BY 1, 2""".stripMargin)),

    // GLOBAL sketch + plain-aggregate mix (round 15): the whole-corpus
    // datacard one-liner — count(*), a KMV distinct, max, and a median in
    // ONE global select, composed as 1×1 cross joins with no spine
    // (previously typed-rejected: "entire select list"). The oracle
    // replays each piece independently.
    QueryDef(
      "q_sketch_sql_global",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (n BIGINT, du BIGINT, mx DOUBLE, p50 DOUBLE);
            |INSERT INTO Out SELECT count(*) AS n, kmv_distinct(user_id, 64) AS du,
            |  round(max(value), 6) AS mx, hist_quantile(value, 500) AS p50
            |FROM events;""".stripMargin
        graft.sql.GraftApp.run(s, app,
          Map("events" -> Tables(s, dir, "events")))("Out")
      },
      Some("""WITH h AS (SELECT DISTINCT
             |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |kk AS (SELECT hv FROM h ORDER BY hv LIMIT 64),
             |duv AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
             |  ELSE CAST(round(63.0 * 1152921504606846976.0 / CAST(max(hv) AS DOUBLE)) AS BIGINT) END AS du
             |  FROM kk),
             |b AS (SELECT CAST(floor(value * 100) AS BIGINT) AS bucket,
             |        CAST(count(*) AS BIGINT) AS cnt
             |      FROM events WHERE value IS NOT NULL GROUP BY 1),
             |nb AS (SELECT coalesce(sum(cnt), 0) AS n FROM b),
             |c AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum FROM b),
             |p50 AS (SELECT CAST(min(c.bucket) AS DOUBLE) / 100 AS p50
             |        FROM c, nb WHERE c.cum >= greatest(1, (500 * nb.n + 999) // 1000))
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n,
             |  duv.du, (SELECT round(max(value), 6) FROM events) AS mx, p50.p50
             |FROM duv, p50""".stripMargin)),

    // KMV bottom-k distinct estimation over two key columns of events:
    // user_id (1.5k distinct at sf0.1 — estimated from 64 hashes) and
    // event_id (100k distinct — estimated from 256). DuckDB replays the
    // identical bottom-k hash sets and the (k-1)·2^60/kth estimator; the
    // estimate is deterministic, so the hash compare is exact, not a
    // tolerance band.
    QueryDef(
      "q_sketch_kmv",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        Sketches.kmvDistinct(e, "user_id", 64).withColumn("dim", lit("user_id"))
          .unionByName(
            Sketches.kmvDistinct(e, "event_id", 256).withColumn("dim", lit("event_id")))
          .select(col("dim"), col("k_used"), col("kth_hash"), col("est_distinct"))
          .orderBy(col("dim"))
      },
      Some("""WITH hu AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv FROM events WHERE user_id IS NOT NULL),
             |ku AS (SELECT hv FROM hu ORDER BY hv LIMIT 64),
             |ua AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(hv) AS kth FROM ku),
             |he AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv FROM events WHERE event_id IS NOT NULL),
             |ke AS (SELECT hv FROM he ORDER BY hv LIMIT 256),
             |ea AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(hv) AS kth FROM ke)
             |SELECT dim, k_used, kth_hash, est_distinct FROM (
             |  SELECT 'user_id' AS dim, k_used, coalesce(kth, 0) AS kth_hash,
             |    CASE WHEN k_used < 64 THEN k_used
             |         ELSE CAST(round(63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)) AS BIGINT) END AS est_distinct
             |  FROM ua
             |  UNION ALL
             |  SELECT 'event_id' AS dim, k_used, coalesce(kth, 0) AS kth_hash,
             |    CASE WHEN k_used < 256 THEN k_used
             |         ELSE CAST(round(255.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)) AS BIGINT) END AS est_distinct
             |  FROM ea)
             |ORDER BY dim""".stripMargin)),

    // KMV set-overlap without a join: how much do the signup and purchase
    // user populations overlap? Union/intersection/Jaccard estimated from
    // the two bottom-64 sketches alone — the corpora are never joined.
    // DuckDB replays the merged sketch and every integer estimator.
    QueryDef(
      "q_sketch_overlap",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        Sketches.kmvOverlap(
          e.filter(col("event_type") === "signup"), "user_id",
          e.filter(col("event_type") === "purchase"), "user_id", 64)
      },
      Some("""WITH ha AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |            FROM events WHERE event_type = 'signup' AND user_id IS NOT NULL),
             |ka AS (SELECT hv FROM ha ORDER BY hv LIMIT 64),
             |hb AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |            FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
             |kb AS (SELECT hv FROM hb ORDER BY hv LIMIT 64),
             |m AS (SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb) ORDER BY hv LIMIT 64),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(hv) AS kth,
             |  CAST(count(*) FILTER (WHERE hv IN (SELECT hv FROM ka)
             |                          AND hv IN (SELECT hv FROM kb)) AS BIGINT) AS n_both
             |  FROM m),
             |est AS (SELECT k_used, n_both,
             |  CASE WHEN k_used < 64 THEN k_used
             |       ELSE CAST(round(63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)) AS BIGINT) END AS est_union
             |  FROM agg)
             |SELECT k_used, n_both, est_union,
             |  CASE WHEN k_used > 0 THEN (n_both * est_union) // k_used ELSE 0 END AS est_intersection,
             |  CASE WHEN k_used > 0 THEN (n_both * 1000) // k_used ELSE 0 END AS jaccard_pm
             |FROM est""".stripMargin)),

    // Per-group KMV (round 12): distinct users PER EVENT TYPE from one
    // bounded fold (k-entry TreeSet per group per partition) — the
    // datacard's "distinct X per Y" from ≤ k longs per group, never a
    // distinct-key exchange. DuckDB replays each group's bottom-64 and
    // the estimator per group.
    QueryDef(
      "q_sketch_kmv_by",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        Sketches.kmvDistinctBy(e, "event_type", "user_id", 64)
      },
      Some("""WITH h AS (SELECT DISTINCT event_type AS key,
             |  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |r AS (SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv) AS rn FROM h),
             |a AS (SELECT key, CAST(count(*) AS BIGINT) AS k_used, max(hv) AS kth
             |      FROM r WHERE rn <= 64 GROUP BY key)
             |SELECT key, k_used, kth AS kth_hash,
             |  CASE WHEN k_used < 64 THEN k_used
             |       ELSE CAST(round(63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)) AS BIGINT) END
             |    AS est_distinct
             |FROM a ORDER BY key""".stripMargin)),

    // Sketch persistence + merge (round 12): the corpus splits into two
    // independently-sketched halves (kmvSketch = the persistable ≤k-row
    // relation), kmvMerge folds them (union → re-truncate: KMV's closure
    // property, bit-exact), kmvEstimate reads the union cardinality off
    // the merged sketch alone — the incremental-crawl shape: no rescan of
    // the old half. The oracle replays the whole-corpus bottom-64, which
    // the merged sketch must equal exactly.
    QueryDef(
      "q_sketch_merge",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val a = Sketches.kmvSketch(
          e.filter(col("event_type").isin("signup", "click")), "user_id", 64)
        val b = Sketches.kmvSketch(
          e.filter(!col("event_type").isin("signup", "click")), "user_id", 64)
        Sketches.kmvEstimate(Sketches.kmvMerge(a, b, 64), 64)
      },
      Some("""WITH h AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |           FROM events WHERE user_id IS NOT NULL),
             |kk AS (SELECT hv FROM h ORDER BY hv LIMIT 64),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(hv) AS kth FROM kk)
             |SELECT k_used, coalesce(kth, 0) AS kth_hash,
             |  CASE WHEN k_used < 64 THEN k_used
             |       ELSE CAST(round(63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE)) AS BIGINT) END
             |    AS est_distinct
             |FROM a""".stripMargin)),

    // Histogram sketch persistence + merge (round 12): the quantile
    // analog of q_sketch_merge — two corpus halves histogrammed
    // independently (histSketch = the persistable bucket relation),
    // histMerge ADDS bucket counts (exact, associative), and
    // quantilesFromHist reads the merged corpus percentiles off the
    // bucket relations alone. Unlike probabilistic quantile sketches this
    // is EXACT under merge, so the oracle is simply the whole-corpus
    // quantile replay.
    QueryDef(
      "q_sketch_hist_merge",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val a = Sketches.histSketch(
          li.filter(col("l_orderkey") % 2 === 0), "l_extendedprice", 100)
        val b = Sketches.histSketch(
          li.filter(col("l_orderkey") % 2 =!= 0), "l_extendedprice", 100)
        Sketches.quantilesFromHist(Sketches.histMerge(a, b),
          Seq(50, 500, 950), scale = 100)
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS bucket,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
             |n AS (SELECT coalesce(sum(cnt), 0) AS n FROM b),
             |c AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum FROM b),
             |t AS (SELECT CAST(v.q AS BIGINT) AS q_pm,
             |             greatest(1, (CAST(v.q AS BIGINT) * n.n + 999) // 1000) AS target
             |      FROM (VALUES (50), (500), (950)) v(q), n)
             |SELECT t.q_pm, min(c.bucket) AS bucket,
             |       CAST(min(c.bucket) AS DOUBLE) / 100 AS value
             |FROM t JOIN c ON c.cum >= t.target
             |GROUP BY t.q_pm ORDER BY q_pm""".stripMargin)),

    // Distributed exact quantiles via the bucket histogram: the p1/p25/
    // median/p75/p99 of lineitem prices at cent granularity — work bounded
    // by distinct buckets, integer-deterministic quantile contract
    // (smallest bucket reaching ceil(q·N/1000)), replayed plain in DuckDB.
    QueryDef(
      "q_sketch_quantiles",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        Sketches.quantiles(li, "l_extendedprice", Seq(10, 250, 500, 750, 990),
          scale = 100)
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS bucket,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
             |n AS (SELECT coalesce(sum(cnt), 0) AS n FROM b),
             |c AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum FROM b),
             |t AS (SELECT CAST(v.q AS BIGINT) AS q_pm,
             |             greatest(1, (CAST(v.q AS BIGINT) * n.n + 999) // 1000) AS target
             |      FROM (VALUES (10), (250), (500), (750), (990)) v(q), n)
             |SELECT t.q_pm, min(c.bucket) AS bucket,
             |       CAST(min(c.bucket) AS DOUBLE) / 100 AS value
             |FROM t JOIN c ON c.cum >= t.target
             |GROUP BY t.q_pm ORDER BY q_pm""".stripMargin)),

    // Per-group quantiles: document length (chars) p25/p50/p95 PER
    // LANGUAGE — the datacard shape; the cumulative window partitions by
    // the group key, so every group computes in parallel with no global
    // single-task stage. DuckDB replays the integer contract per group.
    QueryDef(
      "q_sketch_quantiles_by",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .select(col("lang"), length(col("text")).as("n_chars"))
        Sketches.quantilesBy(d, "lang", "n_chars", Seq(250, 500, 950), scale = 1)
      },
      Some("""WITH b AS (
             |  SELECT lang AS key, CAST(floor(CAST(length(text) AS DOUBLE) * 1) AS BIGINT) AS bucket,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
             |  GROUP BY 1, 2),
             |c AS (SELECT key, bucket,
             |        sum(cnt) OVER (PARTITION BY key ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
             |        sum(cnt) OVER (PARTITION BY key) AS n
             |      FROM b),
             |q AS (SELECT CAST(v.q AS BIGINT) AS q_pm FROM (VALUES (250), (500), (950)) v(q))
             |SELECT c.key, q.q_pm, min(c.bucket) AS bucket,
             |       CAST(min(c.bucket) AS DOUBLE) / 1 AS value
             |FROM c, q
             |WHERE c.cum >= greatest(1, (q.q_pm * c.n + 999) // 1000)
             |GROUP BY c.key, q.q_pm ORDER BY key, q_pm""".stripMargin)),

    // Exact heavy hitters with Misra-Gries pruning: keys with
    // count·(k+1) > N, exact counts — documents.lang at k=3 (only the
    // dominant language clears N/4) and document tokens at k=30 (the
    // above-mean half of the near-uniform vocabulary). The oracle is the
    // plain exact threshold — the MG pass only prunes, never changes the
    // answer.
    QueryDef(
      "q_sketch_heavy",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val langs = Sketches.heavyHitters(d, "lang", 3)
          .select(lit("lang").as("dim"), col("key"), col("cnt"))
        val toks = d.select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
            t => t =!= lit(""))).as("tok"))
        val tokHh = Sketches.heavyHitters(toks, "tok", 30)
          .select(lit("tok").as("dim"), col("key"), col("cnt"))
        langs.unionByName(tokHh).orderBy(col("dim"), col("cnt").desc, col("key"))
      },
      Some("""WITH lc AS (SELECT lang AS key, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang),
             |ln AS (SELECT count(*) AS n FROM documents),
             |tk AS (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok FROM documents),
             |tc AS (SELECT tok AS key, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
             |tn AS (SELECT count(*) AS n FROM tk)
             |SELECT dim, key, cnt FROM (
             |  SELECT 'lang' AS dim, lc.key, lc.cnt FROM lc, ln WHERE lc.cnt * 4 > ln.n
             |  UNION ALL
             |  SELECT 'tok' AS dim, tc.key, tc.cnt FROM tc, tn WHERE tc.cnt * 31 > tn.n)
             |ORDER BY dim, cnt DESC, key""".stripMargin)),

    // Per-group exact heavy hitters (round 12): heavy tokens PER LANGUAGE
    // — Misra-Gries per (partition, group), exact recount of candidates
    // only, each group's own N_g threshold. The oracle is the plain
    // per-group exact computation the MG pass provably only prunes.
    QueryDef(
      "q_sketch_heavy_by",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val toks = d.select(col("lang"),
          explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
            t => t =!= lit(""))).as("tok"))
        Sketches.heavyHittersBy(toks, "lang", "tok", 30)
      },
      Some("""WITH tk AS (SELECT lang AS grp,
             |  unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS key
             |  FROM documents),
             |tc AS (SELECT grp, key, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY 1, 2),
             |tn AS (SELECT grp, count(*) AS n FROM tk GROUP BY 1)
             |SELECT tc.grp AS grp, tc.key AS key, tc.cnt AS cnt
             |FROM tc JOIN tn ON tc.grp IS NOT DISTINCT FROM tn.grp
             |WHERE tc.cnt * 31 > tn.n
             |ORDER BY 1, 3 DESC, 2""".stripMargin)))
}
