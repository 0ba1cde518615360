package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window operator family (SURVEY §2.5) in batch/event-time form over the
  * `events` table. The reference drives these per-event with a wall-clock
  * scheduler (window/mod.rs); since `ts` is a data column, every one of its
  * windows has an exact event-time (externalTime*) equivalent here:
  *
  *  - timeBatch/tumbling + externalTimeBatch → `window(ts, size)` (native)
  *  - sliding/hop (rejected by the reference, converter.rs:659-667; native
  *    for us) → `window(ts, size, slide)`
  *  - session (session_window_processor.rs) → `session_window(ts, gap)`
  *  - length (sliding count, window/mod.rs:63-195) → count-bounded frame
  *  - lengthBatch (window/mod.rs:645-964) → row-bucket tumbling count
  *  - time (per-event sliding, window/mod.rs:196-644) → range frame on
  *    event-time micros
  *  - sort (top-N retention, sort_window_processor.rs) → rank ≤ N per key
  *
  * The streaming (flatMapGroupsWithState) forms of length/lengthBatch/time/
  * sort live in graft.streaming; these batch forms are the oracle-checkable
  * result-level semantics. Scale: every query shuffles once on the grouping
  * key (or user_id for per-key frames); window frames are computed within
  * partitions, no driver-side state.
  */
object WindowQueries extends QueryFamily {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  def defs: Seq[QueryDef] = Seq(

    // Tumbling event-time window (timeBatch ≡ externalTimeBatch in batch).
    QueryDef(
      "q_win_tumble",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
          .select(
            date_format(col("window.start"), TsFmt).as("w_start"),
            col("event_type"), col("n"), col("sum_v"))
          .orderBy(col("w_start"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Sliding / hopping window: size 1h, slide 15m — each event lands in 4
    // windows. The reference parses but rejects this (converter.rs:659-667).
    QueryDef(
      "q_win_hop",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        e.groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
          .select(date_format(col("window.start"), TsFmt).as("w_start"), col("n"), col("sum_v"))
          .orderBy(col("w_start"))
      },
      Some("""SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
             |                - (k.k * INTERVAL '15 minutes'), '%Y-%m-%d %H:%M:%S') AS w_start,
             |  count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Session window, 6h gap per user. Spark closes a session when the gap
    // is >= gapDuration; the islands-style oracle uses the same boundary.
    QueryDef(
      "q_win_session",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        e.groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
          .select(
            col("user_id"),
            date_format(col("session_window.start"), TsFmt).as("s_start"),
            col("n"), col("sum_v"))
          .orderBy(col("user_id"), col("s_start"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR ts - lag(ts) OVER w >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
             |  count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin)),

    // length(N): sliding count window — per event, aggregate over the last
    // 10 events of that user (window/mod.rs:63-195 emits exactly this state
    // after each arrival).
    QueryDef(
      "q_win_length",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(-9, 0)
        e.select(
            col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_in_win"),
            round(sum(col("value")).over(w), 2).as("sum_win"),
            round(max(col("value")).over(w), 2).as("max_win"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  count(*) OVER w AS n_in_win,
             |  round(sum(value) OVER w, 2) AS sum_win,
             |  round(max(value) OVER w, 2) AS max_win
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // lengthBatch(N): tumbling count window — flush every 10 events per
    // user; only complete batches emit (window/mod.rs:645-964).
    QueryDef(
      "q_win_length_batch",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        e.withColumn("batch_no", expr("(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) div 10"))
          .groupBy(col("user_id"), col("batch_no"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"),
               min(col("event_id")).as("first_event"))
          .filter(col("n") === 10)
          .orderBy(col("user_id"), col("batch_no"))
      },
      Some("""SELECT user_id, batch_no, count(*) AS n, round(sum(value), 2) AS sum_v,
             |  min(event_id) AS first_event
             |FROM (SELECT *, (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 10 AS batch_no
             |      FROM events)
             |GROUP BY user_id, batch_no HAVING count(*) = 10
             |ORDER BY user_id, batch_no""".stripMargin)),

    // time(d): per-event sliding time window — for each event, the state of
    // a 1-hour window ending at it (window/mod.rs:196-644). Range frame over
    // event-time micros.
    QueryDef(
      "q_win_time_sliding",
      (s, dir) => {
        val e = Tables(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0)
        e.select(
            col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_1h"),
            round(sum(col("value")).over(w), 2).as("sum_1h"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  count(*) OVER w AS n_1h,
             |  round(sum(value) OVER w, 2) AS sum_1h
             |FROM (SELECT *, epoch_us(ts) AS ts_us FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // sort(N, attr): keep the top-3 by value per user — the end state of the
    // reference's sort window (sort_window_processor.rs:25-45).
    QueryDef(
      "q_win_sort",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))
        e.select(col("user_id"), col("event_id"), col("value"),
            row_number().over(w).cast("long").as("rnk"))
          .filter(col("rnk") <= 3)
          .orderBy(col("user_id"), col("rnk"))
      },
      Some("""SELECT user_id, event_id, value, rnk FROM (
             |  SELECT user_id, event_id, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
             |  FROM events)
             |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin)),

    // multi-criteria sort window THROUGH the SQL surface (the reference
    // comparator-list form, sort_window_processor.rs:25-45): per user, the
    // 2 best rows under (event_type asc, value desc); ties by ts then the
    // remaining columns.
    QueryDef(
      "q_win_sort_multi",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, event_id BIGINT, event_type STRING, value DOUBLE);
            |PARTITION WITH (user_id OF events) BEGIN
            |INSERT INTO Out SELECT user_id, event_id, event_type, value FROM events
            |WINDOW('sort', 2, event_type asc, value desc)
            |ORDER BY user_id, event_type, value DESC, event_id;
            |END;""".stripMargin
        graft.sql.GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
      },
      Some("""SELECT user_id, event_id, event_type, value FROM (
             |  SELECT user_id, event_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY event_type, value DESC, ts, event_id, props) AS rn
             |  FROM events)
             |WHERE rn <= 2
             |ORDER BY user_id, event_type, value DESC, event_id""".stripMargin)),

    // unique window (keep-LATEST per unique attribute; UniqueWindowTestCase
    // roadmap) THROUGH the SQL surface's WINDOW('unique', key) lowering.
    QueryDef(
      "q_win_unique",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_type STRING, event_id BIGINT, value DOUBLE);
            |INSERT INTO Out SELECT event_type, event_id, value FROM events
            |WINDOW('unique', event_type) ORDER BY event_type;""".stripMargin
        graft.sql.GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
      },
      Some("""SELECT event_type, event_id, value FROM (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY ts DESC, event_id DESC, user_id DESC, value DESC, props DESC) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // frequent window, batch result-level form: events of the top-2 most
    // frequent event types (count desc, type asc) — the exact contract the
    // streaming Misra-Gries kernel approximates (FrequentWindowTestCase
    // roadmap; the reference's lossyCounting sibling is a stub there).
    QueryDef(
      "q_win_frequent",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, event_type STRING);
            |INSERT INTO Out SELECT event_id, event_type FROM events
            |WINDOW('frequent', 2, event_type) ORDER BY event_id;""".stripMargin
        graft.sql.GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
      },
      Some("""WITH topk AS (
             |  SELECT event_type FROM (
             |    SELECT event_type, count(*) AS c FROM events GROUP BY 1)
             |  ORDER BY c DESC, event_type LIMIT 2)
             |SELECT event_id, event_type FROM events
             |WHERE event_type IN (SELECT event_type FROM topk)
             |ORDER BY event_id""".stripMargin)),

    // delay window (DelayWindowTestCase roadmap), batch result-level form:
    // events surface 90 seconds of EVENT time later — the streaming buffer
    // form is Windows.delay / delayWithTimeout (watermark-released).
    QueryDef(
      "q_win_delay",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, release_ts STRING, value DOUBLE);
            |INSERT INTO Out SELECT event_id, date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS release_ts,
            |  value FROM events WINDOW('delay', 90000) ORDER BY event_id;""".stripMargin
        graft.sql.GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
      },
      Some("""SELECT event_id,
             |  strftime(ts + INTERVAL 90 SECOND, '%Y-%m-%d %H:%M:%S') AS release_ts,
             |  value FROM events ORDER BY event_id""".stripMargin)),

    // lossyCounting window, batch result-level form: events of attributes
    // with exact frequency >= support × N — the contract the streaming
    // Manku-Motwani kernel (Windows.lossyCounting) approximates with a hard
    // error bound. The reference registers this window name but its
    // processor is a pass-through stub (window/mod.rs:1654-1741); this is
    // the real operator. support=0.199 splits the ~0.20-uniform event types.
    QueryDef(
      "q_win_lossy",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, event_type STRING);
            |INSERT INTO Out SELECT event_id, event_type FROM events
            |WINDOW('lossyCounting', 0.199, 0.01, event_type) ORDER BY event_id;""".stripMargin
        graft.sql.GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
      },
      Some("""SELECT event_id, event_type FROM events
             |WHERE event_type IN (
             |  SELECT event_type FROM events GROUP BY 1
             |  HAVING count(*) >= 0.199 * (SELECT count(*) FROM events))
             |ORDER BY event_id""".stripMargin)),

    // firstUnique window (keep-FIRST per unique attribute) via SQL.
    QueryDef(
      "q_win_first_unique",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_type STRING, event_id BIGINT, value DOUBLE);
            |INSERT INTO Out SELECT event_type, event_id, value FROM events
            |WINDOW('firstUnique', event_type) ORDER BY event_type;""".stripMargin
        graft.sql.GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
      },
      Some("""SELECT event_type, event_id, value FROM (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY ts ASC, event_id ASC, user_id ASC, value ASC, props ASC) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY event_type""".stripMargin))
  )
}
