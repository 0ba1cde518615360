package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.GraftApp
import graft.streaming.{Cep, PatternSpec, Step}

/** CEP pattern queries (SURVEY §2.8) run through the real NFA engine in
  * batch mode over `events`, each validated against a window-function or
  * join-based SQL oracle. The same specs run streaming via
  * Cep.detectStream (CepStreamingSpec).
  */
object CepQueries extends QueryFamily {

  private val H1 = 3600000000L   // 1h in micros
  private val H6 = 6 * H1
  private val H24 = 24 * H1
  private val H48 = 48 * H1

  def defs: Seq[QueryDef] = Seq(

    // SEQUENCE (strict): error immediately followed by purchase within 1h.
    QueryDef(
      "q_cep_seq",
      (s, dir) => {
        import s.implicits._
        val spec = PatternSpec(
          steps = Seq(
            Step.simple("e1")(_.etype == "error"),
            Step.simple("e2")(_.etype == "purchase")),
          strict = true, every = true, withinUs = Some(H1))
        Cep.detect(Cep.fromEvents(Tables(s, dir, "events")), spec)
          .map(m => (m.key.toLong, m.steps.head.events.head.eventId, m.steps(1).events.head.eventId))
          .toDF("user_id", "e1_id", "e2_id")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""SELECT user_id, e1_id, e2_id FROM (
             |  SELECT user_id, event_id AS e1_id, event_type AS t1,
             |    lead(event_id) OVER w AS e2_id, lead(event_type) OVER w AS t2,
             |    epoch_us(ts) AS ts1, lead(epoch_us(ts)) OVER w AS ts2
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |WHERE t1 = 'error' AND t2 = 'purchase' AND ts2 - ts1 <= 3600000000
             |ORDER BY user_id, e1_id""".stripMargin)),

    // PATTERN (relaxed, EVERY): signup followed (skipping others) by the
    // first purchase within 24h.
    QueryDef(
      "q_cep_followedby",
      (s, dir) => {
        import s.implicits._
        val spec = PatternSpec(
          steps = Seq(
            Step.simple("e1")(_.etype == "signup"),
            Step.simple("e2")(_.etype == "purchase")),
          strict = false, every = true, withinUs = Some(H24))
        Cep.detect(Cep.fromEvents(Tables(s, dir, "events")), spec)
          .map(m => (m.key.toLong, m.steps.head.events.head.eventId, m.steps(1).events.head.eventId))
          .toDF("user_id", "e1_id", "e2_id")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH s AS (SELECT user_id, event_id AS s_id, epoch_us(ts) AS s_ts
             |          FROM events WHERE event_type = 'signup'),
             |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts
             |      FROM events WHERE event_type = 'purchase')
             |SELECT s.user_id, s.s_id AS e1_id, min(p.p_id) AS e2_id
             |FROM s JOIN p ON s.user_id = p.user_id
             |  AND p.p_id > s.s_id AND p.p_ts - s.s_ts <= 86400000000
             |GROUP BY s.user_id, s.s_id
             |ORDER BY 1, 2""".stripMargin)),

    // Count quantifier {3} strict: three consecutive errors within 1h.
    QueryDef(
      "q_cep_count",
      (s, dir) => {
        import s.implicits._
        val spec = PatternSpec(
          steps = Seq(Step.count("e", 3)(_.etype == "error")),
          strict = true, every = true, withinUs = Some(H48))
        Cep.detect(Cep.fromEvents(Tables(s, dir, "events")), spec)
          .map(m => (m.key.toLong,
            m.steps.head.events.head.eventId,
            m.steps.head.events(1).eventId,
            m.steps.head.events(2).eventId))
          .toDF("user_id", "e1_id", "e2_id", "e3_id")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""SELECT user_id, e1_id, e2_id, e3_id FROM (
             |  SELECT user_id, event_id AS e1_id, event_type AS t1,
             |    lead(event_id, 1) OVER w AS e2_id, lead(event_type, 1) OVER w AS t2,
             |    lead(event_id, 2) OVER w AS e3_id, lead(event_type, 2) OVER w AS t3,
             |    epoch_us(ts) AS ts1, lead(epoch_us(ts), 2) OVER w AS ts3
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |WHERE t1 = 'error' AND t2 = 'error' AND t3 = 'error'
             |  AND ts3 - ts1 <= 172800000000
             |ORDER BY user_id, e1_id""".stripMargin)),

    // UNBOUNDED one-or-more (round 9, beyond the reference): every signup
    // RUN prefix followed by the first purchase, within 6h of the seed.
    // The NFA's enumerate-all-prefixes semantics are exactly the SQL
    // triangle: one match per signup PAIR (first, last) with first<=last,
    // completed by the first purchase after `last` while the seed is
    // inside the WITHIN horizon — DuckDB replays every match and the
    // collected count (signups in [first, last]) bit-for-bit.
    QueryDef(
      "q_cep_plus",
      (s, dir) => {
        import s.implicits._
        val spec = PatternSpec(
          steps = Seq(
            Step.atLeast("e", 1)(_.etype == "signup"),
            Step.simple("z")(_.etype == "purchase")),
          strict = false, every = true, withinUs = Some(H6))
        Cep.detect(Cep.fromEvents(Tables(s, dir, "events")), spec)
          .map(m => (m.key.toLong,
            m.steps.head.events.head.eventId,
            m.steps.head.events.last.eventId,
            m.steps(1).events.head.eventId,
            m.steps.head.events.size.toLong))
          .toDF("user_id", "first_id", "last_id", "b_id", "n_collected")
          .orderBy(col("user_id"), col("first_id"), col("last_id"))
      },
      Some(cepPlusOracle)),

    // The same A+ semantics THROUGH THE SQL SURFACE (PatternCompiler's
    // `+` quantifier, e[0]/e[last] indexed access and count(e) collection
    // agg over the unbounded step) — identical oracle, so the API and the
    // compiled paths are pinned to each other at corpus scale.
    QueryDef(
      "q_cep_sql_plus",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, first_id BIGINT, last_id BIGINT,
            |                   b_id BIGINT, n_collected BIGINT);
            |INSERT INTO Out
            |SELECT e.user_id AS user_id, e[0].event_id AS first_id,
            |       e[last].event_id AS last_id, z.event_id AS b_id,
            |       count(e) AS n_collected
            |FROM PATTERN (EVERY e=events[event_type = 'signup']+
            |              -> z=events[event_type = 'purchase'])
            |WITHIN 6 HOURS
            |PARTITION BY user_id;""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("first_id"), col("last_id"))
      },
      Some(cepPlusOracle)),

    // Logical OR step + relaxed follow: (signup OR error) then first
    // purchase within 6h.
    QueryDef(
      "q_cep_or",
      (s, dir) => {
        import s.implicits._
        val spec = PatternSpec(
          steps = Seq(
            Step.or("e1")(_.etype == "signup", _.etype == "error"),
            Step.simple("e2")(_.etype == "purchase")),
          strict = false, every = true, withinUs = Some(H6))
        Cep.detect(Cep.fromEvents(Tables(s, dir, "events")), spec)
          .map(m => (m.key.toLong, m.steps.head.events.head.eventId, m.steps(1).events.head.eventId))
          .toDF("user_id", "e1_id", "e2_id")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH s AS (SELECT user_id, event_id AS s_id, epoch_us(ts) AS s_ts
             |          FROM events WHERE event_type IN ('signup', 'error')),
             |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts
             |      FROM events WHERE event_type = 'purchase')
             |SELECT s.user_id, s.s_id AS e1_id, min(p.p_id) AS e2_id
             |FROM s JOIN p ON s.user_id = p.user_id
             |  AND p.p_id > s.s_id AND p.p_ts - s.s_ts <= 21600000000
             |GROUP BY s.user_id, s.s_id
             |ORDER BY 1, 2""".stripMargin)),

    // Absent pattern: `error NOT followed by purchase WITHIN 2h` — a
    // reference roadmap item (MILESTONES.md:121,126-133, unimplemented
    // there). Result-level form: time-bounded anti-join per key; the
    // streaming form is an EventTimeTimeout flush in the NFA (round-2).
    QueryDef(
      "q_cep_absent",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val errs = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("e1_id"), col("ts").as("e1_ts"))
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
        errs.join(purch,
            errs("user_id") === purch("user_id") &&
            col("p_id") > col("e1_id") &&
            col("p_ts") <= col("e1_ts") + expr("INTERVAL 2 HOURS"), "left_anti")
          .select(col("user_id"), col("e1_id"))
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""SELECT user_id, event_id AS e1_id FROM events a
             |WHERE event_type = 'error' AND NOT EXISTS (
             |  SELECT 1 FROM events b
             |  WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
             |    AND b.event_id > a.event_id
             |    AND b.ts <= a.ts + INTERVAL 2 HOUR)
             |ORDER BY user_id, e1_id""".stripMargin)),

    // The FULL SQL pattern surface, partitioned: FROM PATTERN … PARTITION BY
    // user_id lowers to a per-key ordering window + per-key NFA — every user
    // is an independent NFA on its own core (the 100 TB shape; an
    // unpartitioned SQL pattern is inherently one global order = one task).
    QueryDef(
      "q_cep_sql_partitioned",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, e2_id BIGINT);
            |INSERT INTO Out
            |SELECT e1.user_id AS user_id, e1.event_id AS e1_id, e2.event_id AS e2_id
            |FROM PATTERN (EVERY (e1=events[event_type = 'signup'] -> e2=events[event_type = 'purchase']))
            |WITHIN 24 HOURS
            |PARTITION BY user_id;""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH s AS (SELECT user_id, event_id AS s_id, epoch_us(ts) AS s_ts
             |          FROM events WHERE event_type = 'signup'),
             |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts
             |      FROM events WHERE event_type = 'purchase')
             |SELECT s.user_id, s.s_id AS e1_id, min(p.p_id) AS e2_id
             |FROM s JOIN p ON s.user_id = p.user_id
             |  AND p.p_id > s.s_id AND p.p_ts - s.s_ts <= 86400000000
             |GROUP BY s.user_id, s.s_id
             |ORDER BY 1, 2""".stripMargin)),

    // Count quantifier THROUGH the SQL surface: e<3> strict, partitioned —
    // same semantics as q_cep_count (Scala API) but exercising parseSteps'
    // quantifier grammar + indexed e[i] select resolution end to end.
    QueryDef(
      "q_cep_sql_count",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, e2_id BIGINT, e3_id BIGINT);
            |INSERT INTO Out
            |SELECT e.user_id AS user_id, e[0].event_id AS e1_id,
            |       e[1].event_id AS e2_id, e[2].event_id AS e3_id
            |FROM SEQUENCE (EVERY (e=events[event_type = 'error']<3>))
            |WITHIN 48 HOURS
            |PARTITION BY user_id;""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""SELECT user_id, e1_id, e2_id, e3_id FROM (
             |  SELECT user_id, event_id AS e1_id, event_type AS t1,
             |    lead(event_id, 1) OVER w AS e2_id, lead(event_type, 1) OVER w AS t2,
             |    lead(event_id, 2) OVER w AS e3_id, lead(event_type, 2) OVER w AS t3,
             |    epoch_us(ts) AS ts1, lead(epoch_us(ts), 2) OVER w AS ts3
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |WHERE t1 = 'error' AND t2 = 'error' AND t3 = 'error'
             |  AND ts3 - ts1 <= 172800000000
             |ORDER BY user_id, e1_id""".stripMargin)),

    // OR alternatives THROUGH the SQL surface (coalesce over the two
    // alternative aliases), partitioned per user.
    QueryDef(
      "q_cep_sql_or",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, e2_id BIGINT);
            |INSERT INTO Out
            |SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
            |       coalesce(s1.event_id, s2.event_id) AS e1_id,
            |       p.event_id AS e2_id
            |FROM PATTERN (EVERY ((s1=events[event_type = 'signup'] OR s2=events[event_type = 'error'])
            |  -> p=events[event_type = 'purchase']))
            |WITHIN 6 HOURS
            |PARTITION BY user_id;""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH s AS (SELECT user_id, event_id AS s_id, epoch_us(ts) AS s_ts
             |          FROM events WHERE event_type IN ('signup', 'error')),
             |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts
             |      FROM events WHERE event_type = 'purchase')
             |SELECT s.user_id, s.s_id AS e1_id, min(p.p_id) AS e2_id
             |FROM s JOIN p ON s.user_id = p.user_id
             |  AND p.p_id > s.s_id AND p.p_ts - s.s_ts <= 21600000000
             |GROUP BY s.user_id, s.s_id
             |ORDER BY 1, 2""".stripMargin)),

    // Cross-step reference IN THE STEP PREDICATE through the SQL surface:
    // value > 2 * e1.value evaluates NFA-side (Catalyst precomputes both
    // comparison operands as vals slots), so each view matches its FIRST
    // qualifying purchase — same semantics as q_cep_trend's
    // Step.withContext, same oracle.
    QueryDef(
      "q_cep_sql_trend",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, e2_id BIGINT, v1 DOUBLE, v2 DOUBLE);
            |INSERT INTO Out
            |SELECT e1.user_id AS user_id, e1.event_id AS e1_id, e2.event_id AS e2_id,
            |       e1.value AS v1, e2.value AS v2
            |FROM PATTERN (EVERY (e1=events[event_type = 'view']
            |  -> e2=events[event_type = 'purchase' AND value > 2 * e1.value]))
            |WITHIN 2 HOURS
            |PARTITION BY user_id;""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH a AS (SELECT user_id, event_id AS a_id, epoch_us(ts) AS a_ts, value AS v1
             |          FROM events WHERE event_type = 'view'),
             |b AS (SELECT user_id, event_id AS b_id, epoch_us(ts) AS b_ts, value AS v2
             |      FROM events WHERE event_type = 'purchase')
             |SELECT a.user_id, a.a_id AS e1_id, min(b.b_id) AS e2_id,
             |  min(a.v1) AS v1,
             |  min_by(b.v2, b.b_id) AS v2
             |FROM a JOIN b ON a.user_id = b.user_id
             |  AND b.b_id > a.a_id AND b.b_ts - a.a_ts <= 7200000000
             |  AND b.v2 > 2.0 * a.v1
             |GROUP BY a.user_id, a.a_id
             |ORDER BY 1, 2""".stripMargin)),

    // The ANSI/Flink MATCH_RECOGNIZE spelling of the same engine (round
    // 10, beyond reference — desugars onto SEQUENCE/EVERY): strict
    // error→purchase within 1h, same oracle as q_cep_seq.
    QueryDef(
      "q_cep_mr",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, e2_id BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS e1_id, B.event_id AS e2_id
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A B) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""SELECT user_id, e1_id, e2_id FROM (
             |  SELECT user_id, event_id AS e1_id, event_type AS t1,
             |    lead(event_id) OVER w AS e2_id, lead(event_type) OVER w AS t2,
             |    epoch_us(ts) AS ts1, lead(epoch_us(ts)) OVER w AS ts2
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |WHERE t1 = 'error' AND t2 = 'purchase' AND ts2 - ts1 <= 3600000000
             |ORDER BY user_id, e1_id""".stripMargin)),

    // MATCH_RECOGNIZE PREV/NEXT physical navigation (round 11): PREV in
    // DEFINE gates on the physically previous row per user (lowered to a
    // lag window over the pattern's per-key order), PREV/NEXT in MEASURES
    // reach one row outside the match (physical-offset join-backs on the
    // per-key row_number). Oracle = the same lag/lead windows in DuckDB.
    QueryDef(
      "q_cep_mr_nav",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, e2_id BIGINT,
            |                   before_v DOUBLE, after_v DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS e1_id, B.event_id AS e2_id,
            |           PREV(A.value) AS before_v, NEXT(B.value) AS after_v
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A B) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error',
            |         B AS B.event_type = 'purchase' AND B.value > PREV(B.value)
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""SELECT user_id, e1_id, e2_id, before_v, after_v FROM (
             |  SELECT user_id, event_id AS e1_id, event_type AS t1, value AS v1,
             |    lag(value) OVER w AS before_v,
             |    lead(event_id) OVER w AS e2_id, lead(event_type) OVER w AS t2,
             |    lead(value) OVER w AS v2, lead(value, 2) OVER w AS after_v,
             |    epoch_us(ts) AS ts1, lead(epoch_us(ts)) OVER w AS ts2
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |WHERE t1 = 'error' AND t2 = 'purchase' AND ts2 - ts1 <= 3600000000
             |  AND v2 > v1
             |ORDER BY user_id, e1_id""".stripMargin)),

    // MATCH_RECOGNIZE ALL ROWS PER MATCH (round 11): one output row per
    // matched EVENT — classifier + FINAL measures join back onto the
    // matched rows. EVERY emits every B+ prefix, so the oracle enumerates
    // (error, k-th consecutive purchase) pairs via a purchase-streak
    // window and explodes each prefix into its k+1 member rows.
    QueryDef(
      "q_cep_mr_rows",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                   event_type STRING, value DOUBLE, props STRING,
            |                   n_b BIGINT, mr_match_number BIGINT,
            |                   mr_classifier STRING);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES count(B.value) AS n_b
            |  ALL ROWS PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A B+) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
            "value", "n_b", "mr_match_number", "mr_classifier")
          .orderBy(col("user_id"), col("mr_match_number"), col("event_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |streaks AS (
             |  SELECT *, rn - coalesce(max(CASE WHEN event_type <> 'purchase' THEN rn END)
             |    OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING), 0) AS pstreak
             |  FROM ord),
             |m0 AS (
             |  SELECT a.user_id, a.rn AS arn, bk.rn - a.rn AS k
             |  FROM ord a JOIN streaks bk
             |    ON bk.user_id = a.user_id AND bk.rn > a.rn
             |  WHERE a.event_type = 'error' AND bk.event_type = 'purchase'
             |    AND bk.pstreak >= bk.rn - a.rn
             |    AND bk.tsu - a.tsu <= 3600000000),
             |m AS (
             |  SELECT user_id, arn, k,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY arn, k) AS BIGINT)
             |      AS mr_match_number
             |  FROM m0),
             |out AS (
             |  SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         CAST(m.k AS BIGINT) AS n_b, m.mr_match_number,
             |         'A' AS mr_classifier
             |  FROM m JOIN ord o ON o.user_id = m.user_id AND o.rn = m.arn
             |  UNION ALL
             |  SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         CAST(m.k AS BIGINT) AS n_b, m.mr_match_number,
             |         'B' AS mr_classifier
             |  FROM m JOIN ord o ON o.user_id = m.user_id
             |    AND o.rn > m.arn AND o.rn <= m.arn + m.k)
             |SELECT user_id, event_id, ts_us, value, n_b, mr_match_number, mr_classifier
             |FROM out ORDER BY user_id, mr_match_number, event_id""".stripMargin)),

    // MATCH_RECOGNIZE pattern alternation (round 12): (A|B) lowers to the
    // engine's n-ary OR step — the classifier stays per alternative, so
    // the unmatched branch's measures are NULL. strict (signup|view) →
    // purchase within 1h; the oracle replays it with lead windows and a
    // two-way CASE on the anchoring type.
    QueryDef(
      "q_cep_mr_alt",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, b_id BIGINT, c_id BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, B.event_id AS b_id, C.event_id AS c_id
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN ((A | B) C) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'signup', B AS B.event_type = 'view',
            |         C AS C.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("c_id"))
      },
      Some("""SELECT user_id, a_id, b_id, c_id FROM (
             |  SELECT user_id,
             |    CASE WHEN event_type = 'signup' THEN event_id END AS a_id,
             |    CASE WHEN event_type = 'view' THEN event_id END AS b_id,
             |    event_type AS t1,
             |    lead(event_id) OVER w AS c_id, lead(event_type) OVER w AS t2,
             |    epoch_us(ts) AS ts1, lead(epoch_us(ts)) OVER w AS ts2
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |WHERE t1 IN ('signup', 'view') AND t2 = 'purchase'
             |  AND ts2 - ts1 <= 3600000000
             |ORDER BY user_id, c_id""".stripMargin)),

    // MATCH_RECOGNIZE ALL ROWS × alternation (round 12): the per-row
    // classifier resolves WHICH alternative bound the head row (re-
    // evaluating the alternatives' predicates against the row, first
    // textual match winning). Oracle = the q_cep_mr_alt pair enumeration
    // exploded to (head, C) rows with a CASE classifier.
    QueryDef(
      "q_cep_mr_alt_rows",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                   event_type STRING, value DOUBLE, props STRING,
            |                   c_v DOUBLE, mr_match_number BIGINT,
            |                   mr_classifier STRING);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES C.value AS c_v
            |  ALL ROWS PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN ((A | B) C) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'signup', B AS B.event_type = 'view',
            |         C AS C.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "event_id", "value", "c_v",
            "mr_match_number", "mr_classifier")
          .orderBy(col("user_id"), col("mr_match_number"), col("event_id"))
      },
      Some("""WITH m0 AS (
             |  SELECT user_id, event_id AS h_id, event_type AS t1, value AS h_v,
             |         epoch_us(ts) AS ts1,
             |         lead(event_id) OVER w AS c_id, lead(event_type) OVER w AS t2,
             |         lead(value) OVER w AS c_val, lead(epoch_us(ts)) OVER w AS ts2
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
             |m AS (
             |  SELECT user_id, h_id, t1, h_v, c_id, c_val,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY h_id) AS BIGINT) AS mn
             |  FROM m0
             |  WHERE t1 IN ('signup', 'view') AND t2 = 'purchase'
             |    AND ts2 - ts1 <= 3600000000),
             |out AS (
             |  SELECT user_id, h_id AS event_id, h_v AS value, c_val AS c_v, mn,
             |         CASE WHEN t1 = 'signup' THEN 'A' ELSE 'B' END AS mr_classifier
             |  FROM m
             |  UNION ALL
             |  SELECT user_id, c_id, c_val, c_val, mn, 'C' FROM m)
             |SELECT user_id, event_id, value, c_v, mn AS mr_match_number, mr_classifier
             |FROM out ORDER BY user_id, mr_match_number, event_id""".stripMargin)),

    // MATCH_RECOGNIZE AFTER MATCH SKIP PAST LAST ROW (round 12): ANSI's
    // DEFAULT skip mode — the clause is OMITTED here to pin exactly the
    // paste-a-Flink-query contract. Greedy leftmost non-overlapping over
    // self-chaining predicates: in every maximal per-user run of
    // consecutive value>50 events, A B pairs rows off (1,2),(3,4),… —
    // where SKIP TO NEXT ROW would emit every adjacent pair. The oracle
    // replays the pairing with gaps-and-islands windows: odd positions in
    // each qualifying island pair with their successor.
    QueryDef(
      "q_cep_mr_skip",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, e2_id BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS e1_id, B.event_id AS e2_id
            |  ONE ROW PER MATCH
            |  PATTERN (A B)
            |  DEFINE A AS A.value > 50, B AS B.value > 50
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |isl AS (
             |  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
             |  FROM ord WHERE value > 50),
             |pos AS (
             |  SELECT *, row_number() OVER (PARTITION BY user_id, grp ORDER BY rn) AS p
             |  FROM isl)
             |SELECT a.user_id, a.event_id AS e1_id, b.event_id AS e2_id
             |FROM pos a JOIN pos b
             |  ON b.user_id = a.user_id AND b.grp = a.grp AND b.p = a.p + 1
             |WHERE a.p % 2 = 1
             |ORDER BY 1, 2""".stripMargin)),

    // SKIP PAST LAST ROW greedy quantifier (round 12): B+ consumes the
    // WHOLE consecutive purchase streak after an error (bounded by WITHIN
    // 1h), not the every-mode prefix enumeration — n_b is the maximal
    // count and b_last the streak's final event. The oracle computes the
    // same maximal extent per anchoring error via the purchase-streak
    // window (matches are automatically disjoint: an error can only
    // anchor the streak that starts immediately after it).
    QueryDef(
      "q_cep_mr_skip_greedy",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, n_b BIGINT, b_last BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS e1_id, count(B.value) AS n_b,
            |           LAST(B.event_id) AS b_last
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A B+) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |streaks AS (
             |  SELECT *, rn - coalesce(max(CASE WHEN event_type <> 'purchase' THEN rn END)
             |    OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING), 0) AS pstreak
             |  FROM ord)
             |SELECT a.user_id, a.event_id AS e1_id,
             |       CAST(max(b.rn - a.rn) AS BIGINT) AS n_b,
             |       max_by(b.event_id, b.rn) AS b_last
             |FROM ord a JOIN streaks b
             |  ON b.user_id = a.user_id AND b.rn > a.rn
             |WHERE a.event_type = 'error' AND b.event_type = 'purchase'
             |  AND b.pstreak >= b.rn - a.rn
             |  AND b.tsu - a.tsu <= 3600000000
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    // MATCH_RECOGNIZE bounded group repetition (round 13): (D U){1,2} —
    // one step-order variant per repetition count, member aliases
    // suffixed per repetition, measures over D/U distributed across the
    // repetitions via auto-SUBSET unions (count sums, sum NULL-safe,
    // LAST coalesces reverse-chain). The oracle replays both repetition
    // counts as lead() chains; k=1 and k=2 are mutually exclusive per
    // anchor (position 3 is 'signup' vs 'view'). WITHIN 30 DAY never
    // binds at the test densities (same note as q_cep_mr_skip_to).
    QueryDef(
      "q_cep_mr_group",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT,
            |                   s_u DOUBLE, u_last BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           round(sum(U.value), 6) AS s_u, LAST(U.event_id) AS u_last
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A (D U){1,2} C) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error', D AS D.event_type = 'view',
            |         U AS U.event_type = 'purchase', C AS C.event_type = 'signup'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d",
            "s_u", "u_last")
          .orderBy(col("user_id"), col("a_id"), col("n_d"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |w AS (
             |  SELECT user_id, event_id, event_type,
             |         lead(event_type, 1) OVER win AS e1, lead(event_type, 2) OVER win AS e2,
             |         lead(event_type, 3) OVER win AS e3, lead(event_type, 4) OVER win AS e4,
             |         lead(event_type, 5) OVER win AS e5,
             |         lead(value, 2) OVER win AS v2, lead(value, 4) OVER win AS v4,
             |         lead(event_id, 2) OVER win AS id2, lead(event_id, 4) OVER win AS id4
             |  FROM ord
             |  WINDOW win AS (PARTITION BY user_id ORDER BY rn))
             |SELECT user_id, event_id AS a_id, CAST(1 AS BIGINT) AS n_d,
             |       round(v2, 6) AS s_u, id2 AS u_last
             |FROM w WHERE event_type = 'error' AND e1 = 'view'
             |  AND e2 = 'purchase' AND e3 = 'signup'
             |UNION ALL
             |SELECT user_id, event_id AS a_id, CAST(2 AS BIGINT) AS n_d,
             |       round(v2 + v4, 6) AS s_u, id4 AS u_last
             |FROM w WHERE event_type = 'error' AND e1 = 'view'
             |  AND e2 = 'purchase' AND e3 = 'view' AND e4 = 'purchase'
             |  AND e5 = 'signup'
             |ORDER BY 1, 2, 3""".stripMargin)),

    // MATCH_RECOGNIZE unbounded loop group (round 13): (D U)+ — a
    // loop-back NFA edge re-enters the group per iteration, accumulating
    // the members' buffers; EVERY emits every completable iteration
    // count. The oracle probes k = 1..12 via a bounded series (far above
    // the data's longest alternating view/purchase run) and checks all k
    // pair positions plus the closing signup arithmetically. WITHIN
    // 30 DAY never binds at test densities.
    QueryDef(
      "q_cep_mr_loop",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT, s_u DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           round(sum(U.value), 6) AS s_u
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A (D U)+ C) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error', D AS D.event_type = 'view',
            |         U AS U.event_type = 'purchase', C AS C.event_type = 'signup'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d", "s_u")
          .orderBy(col("user_id"), col("a_id"), col("n_d"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |pairs AS (
             |  SELECT a.user_id, a.rn FROM ord a JOIN ord b
             |    ON b.user_id = a.user_id AND b.rn = a.rn + 1
             |  WHERE a.event_type = 'view' AND b.event_type = 'purchase'),
             |ks AS (SELECT unnest(range(1, 13)) AS k)
             |SELECT e.user_id, e.event_id AS a_id, CAST(ks.k AS BIGINT) AS n_d,
             |  (SELECT round(sum(o2.value), 6) FROM ord o2
             |   WHERE o2.user_id = e.user_id AND o2.rn >= e.rn + 2
             |     AND o2.rn <= e.rn + 2 * ks.k AND (o2.rn - e.rn) % 2 = 0) AS s_u
             |FROM ord e CROSS JOIN ks
             |WHERE e.event_type = 'error'
             |  AND (SELECT count(*) FROM pairs p WHERE p.user_id = e.user_id
             |       AND p.rn >= e.rn + 1 AND p.rn <= e.rn + 2 * ks.k - 1
             |       AND (p.rn - e.rn) % 2 = 1) = ks.k
             |  AND EXISTS (SELECT 1 FROM ord c WHERE c.user_id = e.user_id
             |       AND c.rn = e.rn + 2 * ks.k + 1 AND c.event_type = 'signup')
             |ORDER BY 1, 2, 3""".stripMargin)),

    // MATCH_RECOGNIZE quantified group member (round 14): (D U+)+ — the
    // inner U+ is gated PER ITERATION of the loop group (each view may be
    // followed by a RUN of purchases, not exactly one). Because the member
    // types are disjoint, exactly one NFA branch survives each event, so
    // each error anchor yields at most ONE match: the contiguous
    // view(purchase+) segment ending right before a signup. The oracle is
    // an independent terminator-scan formulation: per anchor, find the
    // first non-(view|purchase) row t; the match exists iff t is a signup,
    // the segment starts with a view, and every view is immediately
    // followed by a purchase. n_u > n_d rows pin the member quantifier (a
    // one-per-iteration regression drops them). WITHIN 30 DAY never binds
    // at test densities (same note as q_cep_mr_loop).
    QueryDef(
      "q_cep_mr_group_quant",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT,
            |                   n_u BIGINT, s_u DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           count(U.value) AS n_u, round(sum(U.value), 6) AS s_u
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A (D U+)+ C) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error', D AS D.event_type = 'view',
            |         U AS U.event_type = 'purchase', C AS C.event_type = 'signup'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d",
            "CAST(n_u AS BIGINT) AS n_u", "s_u")
          .orderBy(col("user_id"), col("a_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             |         lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
             |  FROM events),
             |anch AS (
             |  SELECT e.user_id, e.event_id, e.rn,
             |    (SELECT min(o.rn) FROM ord o WHERE o.user_id = e.user_id
             |       AND o.rn > e.rn AND o.event_type NOT IN ('view','purchase')) AS t
             |  FROM ord e WHERE e.event_type = 'error')
             |SELECT a.user_id, a.event_id AS a_id,
             |  CAST((SELECT count(*) FROM ord o WHERE o.user_id = a.user_id
             |        AND o.rn > a.rn AND o.rn < a.t AND o.event_type = 'view') AS BIGINT) AS n_d,
             |  CAST((SELECT count(*) FROM ord o WHERE o.user_id = a.user_id
             |        AND o.rn > a.rn AND o.rn < a.t AND o.event_type = 'purchase') AS BIGINT) AS n_u,
             |  (SELECT round(sum(o.value), 6) FROM ord o WHERE o.user_id = a.user_id
             |        AND o.rn > a.rn AND o.rn < a.t AND o.event_type = 'purchase') AS s_u
             |FROM anch a
             |JOIN ord f ON f.user_id = a.user_id AND f.rn = a.t
             |JOIN ord s ON s.user_id = a.user_id AND s.rn = a.rn + 1
             |WHERE f.event_type = 'signup' AND a.t >= a.rn + 3
             |  AND s.event_type = 'view'
             |  AND NOT EXISTS (SELECT 1 FROM ord v WHERE v.user_id = a.user_id
             |        AND v.rn > a.rn AND v.rn < a.t AND v.event_type = 'view'
             |        AND v.nxt <> 'purchase')
             |ORDER BY 1, 2""".stripMargin)),

    // MATCH_RECOGNIZE per-iteration cross-member reference (round 14):
    // (D U)+ with U defined as value > D.value — each iteration's U
    // compares against ITS OWN iteration's D (the engine anchors the
    // comparand at the current iteration's base, not the first
    // iteration's head; CepSpec pins the k>=2 differential on a synthetic
    // tape). The oracle is q_cep_mr_loop's bounded k-probe with the
    // value condition folded into the pair relation.
    QueryDef(
      "q_cep_mr_iter_ref",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT, s_u DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           round(sum(U.value), 6) AS s_u
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A (D U)+ C) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error', D AS D.event_type = 'view',
            |         U AS U.event_type = 'purchase' AND U.value > D.value,
            |         C AS C.event_type = 'signup'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d", "s_u")
          .orderBy(col("user_id"), col("a_id"), col("n_d"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |pairs AS (
             |  SELECT a.user_id, a.rn FROM ord a JOIN ord b
             |    ON b.user_id = a.user_id AND b.rn = a.rn + 1
             |  WHERE a.event_type = 'view' AND b.event_type = 'purchase'
             |    AND b.value > a.value),
             |ks AS (SELECT unnest(range(1, 13)) AS k)
             |SELECT e.user_id, e.event_id AS a_id, CAST(ks.k AS BIGINT) AS n_d,
             |  (SELECT round(sum(o2.value), 6) FROM ord o2
             |   WHERE o2.user_id = e.user_id AND o2.rn >= e.rn + 2
             |     AND o2.rn <= e.rn + 2 * ks.k AND (o2.rn - e.rn) % 2 = 0) AS s_u
             |FROM ord e CROSS JOIN ks
             |WHERE e.event_type = 'error'
             |  AND (SELECT count(*) FROM pairs p WHERE p.user_id = e.user_id
             |       AND p.rn >= e.rn + 1 AND p.rn <= e.rn + 2 * ks.k - 1
             |       AND (p.rn - e.rn) % 2 = 1) = ks.k
             |  AND EXISTS (SELECT 1 FROM ord c WHERE c.user_id = e.user_id
             |       AND c.rn = e.rn + 2 * ks.k + 1 AND c.event_type = 'signup')
             |ORDER BY 1, 2, 3""".stripMargin)),

    // MATCH_RECOGNIZE QUANTIFIED PERMUTE (round 15): PERMUTE(D, U){1,2}
    // lowers to the engine PERMUTE-loop — one looped chain per ordering,
    // the interleaving chosen PER MATCH and repeated across iterations
    // (documented; a per-iteration re-permutation would need
    // orderings^iterations variants). The pattern ends ON the loop, so
    // EVERY emits one row per (anchor, arm, iteration count). The oracle
    // replays BOTH arms × BOTH iteration counts: per anchor × (arm, j),
    // the 2j rows after the anchor must alternate view/purchase in the
    // arm's parity; d1/u1 pin WHICH arm bound (min view/purchase ids).
    QueryDef(
      "q_cep_mr_permute_quant",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT,
            |                   s_u DOUBLE, d1 BIGINT, u1 BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           round(sum(U.value), 6) AS s_u,
            |           FIRST(D.event_id) AS d1, FIRST(U.event_id) AS u1
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A PERMUTE(D, U){1,2}) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error', D AS D.event_type = 'view',
            |         U AS U.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d",
            "s_u", "d1", "u1")
          .orderBy(col("user_id"), col("a_id"), col("n_d"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |anch AS (SELECT user_id, event_id, rn FROM ord WHERE event_type = 'error'),
             |arms AS (
             |  SELECT 'du' AS arm, 1 AS j UNION ALL SELECT 'du', 2 UNION ALL
             |  SELECT 'ud', 1 UNION ALL SELECT 'ud', 2)
             |SELECT a.user_id, a.event_id AS a_id, CAST(x.j AS BIGINT) AS n_d,
             |  (SELECT round(sum(o.value), 6) FROM ord o WHERE o.user_id = a.user_id
             |     AND o.rn > a.rn AND o.rn <= a.rn + 2 * x.j
             |     AND o.event_type = 'purchase') AS s_u,
             |  (SELECT min(o.event_id) FROM ord o WHERE o.user_id = a.user_id
             |     AND o.rn > a.rn AND o.rn <= a.rn + 2 * x.j
             |     AND o.event_type = 'view') AS d1,
             |  (SELECT min(o.event_id) FROM ord o WHERE o.user_id = a.user_id
             |     AND o.rn > a.rn AND o.rn <= a.rn + 2 * x.j
             |     AND o.event_type = 'purchase') AS u1
             |FROM anch a CROSS JOIN arms x
             |WHERE (SELECT count(*) FROM ord o WHERE o.user_id = a.user_id
             |         AND o.rn > a.rn AND o.rn <= a.rn + 2 * x.j
             |         AND ((o.rn - a.rn) % 2 = (CASE WHEN x.arm = 'du' THEN 1 ELSE 0 END)
             |              AND o.event_type = 'view'
             |           OR (o.rn - a.rn) % 2 = (CASE WHEN x.arm = 'du' THEN 0 ELSE 1 END)
             |              AND o.event_type = 'purchase')) = 2 * x.j
             |ORDER BY 1, 2, 3""".stripMargin)),

    // MATCH_RECOGNIZE variable-count NESTED group (round 15):
    // ((D U){1,3} C)+ — the inner group's ITERATION count varies per
    // outer iteration, running the engine's nested iteration frame
    // (Partial.innerIters/innerBase; reference has no MATCH_RECOGNIZE —
    // beyond feat/grammar/GRAMMAR.md:328-338's roadmap). Member classes
    // are disjoint two-type sets so the parse per (anchor, end) is
    // tape-determined, and the pattern ends ON the outer group, so EVERY
    // emits one row per completed outer-iteration count j. The oracle is
    // an independent TWO-LEVEL replay: a deterministic block relation
    // ((d u){k} c for k = 1..3 — at most one k is valid per start) chained
    // by a recursive CTE, one row per (anchor, j), with n_d summing the
    // per-block pair counts (n_d > n_c rows pin the variable inner count;
    // n_c >= 2 rows pin the outer chaining). WITHIN 30 DAY never binds at
    // test densities (same note as q_cep_mr_loop).
    QueryDef(
      "q_cep_mr_nested",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT,
            |                   n_c BIGINT, s_u DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           count(C.value) AS n_c, round(sum(U.value), 6) AS s_u
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A ((D U){1,3} C)+) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error',
            |         D AS D.event_type = 'view' OR D.event_type = 'signup',
            |         U AS U.event_type = 'purchase' OR U.event_type = 'click',
            |         C AS C.event_type = 'error'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d",
            "CAST(n_c AS BIGINT) AS n_c", "s_u")
          .orderBy(col("user_id"), col("a_id"), col("n_c"))
      },
      Some("""WITH RECURSIVE ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |blk AS (
             |  SELECT d1.user_id, d1.rn AS s, 1 AS k, d1.rn + 2 AS e
             |  FROM ord d1
             |  JOIN ord u1 ON u1.user_id = d1.user_id AND u1.rn = d1.rn + 1
             |  JOIN ord c  ON c.user_id  = d1.user_id AND c.rn  = d1.rn + 2
             |  WHERE d1.event_type IN ('view','signup')
             |    AND u1.event_type IN ('purchase','click') AND c.event_type = 'error'
             |  UNION ALL
             |  SELECT d1.user_id, d1.rn, 2, d1.rn + 4
             |  FROM ord d1
             |  JOIN ord u1 ON u1.user_id = d1.user_id AND u1.rn = d1.rn + 1
             |  JOIN ord d2 ON d2.user_id = d1.user_id AND d2.rn = d1.rn + 2
             |  JOIN ord u2 ON u2.user_id = d1.user_id AND u2.rn = d1.rn + 3
             |  JOIN ord c  ON c.user_id  = d1.user_id AND c.rn  = d1.rn + 4
             |  WHERE d1.event_type IN ('view','signup') AND u1.event_type IN ('purchase','click')
             |    AND d2.event_type IN ('view','signup') AND u2.event_type IN ('purchase','click')
             |    AND c.event_type = 'error'
             |  UNION ALL
             |  SELECT d1.user_id, d1.rn, 3, d1.rn + 6
             |  FROM ord d1
             |  JOIN ord u1 ON u1.user_id = d1.user_id AND u1.rn = d1.rn + 1
             |  JOIN ord d2 ON d2.user_id = d1.user_id AND d2.rn = d1.rn + 2
             |  JOIN ord u2 ON u2.user_id = d1.user_id AND u2.rn = d1.rn + 3
             |  JOIN ord d3 ON d3.user_id = d1.user_id AND d3.rn = d1.rn + 4
             |  JOIN ord u3 ON u3.user_id = d1.user_id AND u3.rn = d1.rn + 5
             |  JOIN ord c  ON c.user_id  = d1.user_id AND c.rn  = d1.rn + 6
             |  WHERE d1.event_type IN ('view','signup') AND u1.event_type IN ('purchase','click')
             |    AND d2.event_type IN ('view','signup') AND u2.event_type IN ('purchase','click')
             |    AND d3.event_type IN ('view','signup') AND u3.event_type IN ('purchase','click')
             |    AND c.event_type = 'error'),
             |anch AS (SELECT user_id, event_id, rn FROM ord WHERE event_type = 'error'),
             |chain AS (
             |  SELECT a.user_id, a.event_id AS a_id, a.rn AS anchor_rn,
             |         b.e AS end_rn, b.k AS n_d, 1 AS n_c
             |  FROM anch a JOIN blk b ON b.user_id = a.user_id AND b.s = a.rn + 1
             |  UNION ALL
             |  SELECT ch.user_id, ch.a_id, ch.anchor_rn, b.e, ch.n_d + b.k, ch.n_c + 1
             |  FROM chain ch JOIN blk b ON b.user_id = ch.user_id AND b.s = ch.end_rn + 1)
             |SELECT ch.user_id, ch.a_id, CAST(ch.n_d AS BIGINT) AS n_d,
             |  CAST(ch.n_c AS BIGINT) AS n_c,
             |  (SELECT round(sum(o.value), 6) FROM ord o WHERE o.user_id = ch.user_id
             |     AND o.rn > ch.anchor_rn AND o.rn < ch.end_rn
             |     AND o.event_type IN ('purchase','click')) AS s_u
             |FROM chain ch
             |ORDER BY 1, 2, 4""".stripMargin)),

    // MATCH_RECOGNIZE quantified PERMUTE over FOUR operands (round 16):
    // PERMUTE(W, X, Y, Z){1,2} = 24 looped-chain variants, exactly the
    // shared-NFA MaxVariants budget — one pass folds every ordering. The
    // interleaving is chosen PER MATCH and repeats across iterations
    // (round-15 documented semantics). The oracle replays ALL 24 orderings
    // at once: each 4-block must hold the four classes pairwise-distinct
    // and block k+1 must repeat block k's ordering positionally. At corpus
    // densities j=2 is vanishingly rare ((1/5)^4 per anchor) — the crafted
    // GraftAppSpec tape pins the repeat-and-reject behavior directly.
    QueryDef(
      "q_cep_mr_permute4",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_w BIGINT,
            |                   w1 BIGINT, z1 BIGINT, s_x DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(W.value) AS n_w,
            |           FIRST(W.event_id) AS w1, FIRST(Z.event_id) AS z1,
            |           round(sum(X.value), 6) AS s_x
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A PERMUTE(W, X, Y, Z){1,2}) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error', W AS W.event_type = 'view',
            |         X AS X.event_type = 'purchase', Y AS Y.event_type = 'click',
            |         Z AS Z.event_type = 'signup'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_w AS BIGINT) AS n_w",
            "w1", "z1", "s_x")
          .orderBy(col("user_id"), col("a_id"), col("n_w"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |anch AS (SELECT user_id, event_id, rn FROM ord WHERE event_type = 'error'),
             |js AS (SELECT 1 AS j UNION ALL SELECT 2),
             |bs AS (SELECT 0 AS b UNION ALL SELECT 1),
             |ok AS (
             |  SELECT a.user_id, a.event_id AS a_id, a.rn, x.j
             |  FROM anch a CROSS JOIN js x
             |  WHERE
             |    NOT EXISTS (
             |      SELECT 1 FROM bs WHERE bs.b < x.j
             |        AND ((SELECT count(DISTINCT o.event_type) FROM ord o
             |             WHERE o.user_id = a.user_id
             |               AND o.rn > a.rn + 4 * bs.b AND o.rn <= a.rn + 4 * (bs.b + 1)
             |               AND o.event_type IN ('view','purchase','click','signup')) <> 4
             |         OR (SELECT count(*) FROM ord o
             |             WHERE o.user_id = a.user_id
             |               AND o.rn > a.rn + 4 * bs.b AND o.rn <= a.rn + 4 * (bs.b + 1)) <> 4))
             |    AND NOT EXISTS (
             |      SELECT 1 FROM ord o JOIN ord p
             |        ON p.user_id = o.user_id AND p.rn = o.rn - 4
             |      WHERE o.user_id = a.user_id AND o.rn > a.rn + 4 AND o.rn <= a.rn + 4 * x.j
             |        AND o.event_type <> p.event_type))
             |SELECT k.user_id, k.a_id, CAST(k.j AS BIGINT) AS n_w,
             |  (SELECT o.event_id FROM ord o WHERE o.user_id = k.user_id
             |     AND o.rn > k.rn AND o.rn <= k.rn + 4 AND o.event_type = 'view') AS w1,
             |  (SELECT o.event_id FROM ord o WHERE o.user_id = k.user_id
             |     AND o.rn > k.rn AND o.rn <= k.rn + 4 AND o.event_type = 'signup') AS z1,
             |  (SELECT round(sum(o.value), 6) FROM ord o WHERE o.user_id = k.user_id
             |     AND o.rn > k.rn AND o.rn <= k.rn + 4 * k.j
             |     AND o.event_type = 'purchase') AS s_x
             |FROM ok k
             |ORDER BY 1, 2, 3""".stripMargin)),

    // MULTIPLE loop groups in one pattern (round 16): A (D U)+ C (L H)+
    // — each group runs its own iteration frame (Partial.iters/iterBase
    // reset on leaving a group, so the second group starts fresh). Group 1
    // is class-driven (disjoint member classes, so its iteration count is
    // tape-forced: the error terminator cannot extend a pair), group 2 is
    // VALUE-driven (low<50 / high>=50 over any event type); the pattern
    // ends ON group 2, so EVERY emits one row per completed j2. The oracle
    // chains both groups independently with recursive CTEs and reads H
    // values off the alternation parity.
    QueryDef(
      "q_cep_mr_multigroup",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT,
            |                   n_l BIGINT, s_h DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           count(L.value) AS n_l, round(sum(H.value), 6) AS s_h
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A (D U)+ C (L H)+) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error',
            |         D AS D.event_type = 'view' OR D.event_type = 'signup',
            |         U AS U.event_type = 'purchase' OR U.event_type = 'click',
            |         C AS C.event_type = 'error',
            |         L AS L.value < 50, H AS H.value >= 50
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d",
            "CAST(n_l AS BIGINT) AS n_l", "s_h")
          .orderBy(col("user_id"), col("a_id"), col("n_l"))
      },
      Some("""WITH RECURSIVE ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |p1 AS (
             |  SELECT d.user_id, d.rn AS s, d.rn + 1 AS e
             |  FROM ord d JOIN ord u ON u.user_id = d.user_id AND u.rn = d.rn + 1
             |  WHERE d.event_type IN ('view','signup') AND u.event_type IN ('purchase','click')),
             |c1 AS (
             |  SELECT user_id, s, e, 1 AS j1 FROM p1
             |  UNION ALL
             |  SELECT c.user_id, c.s, b.e, c.j1 + 1
             |  FROM c1 c JOIN p1 b ON b.user_id = c.user_id AND b.s = c.e + 1),
             |p2 AS (
             |  SELECT l.user_id, l.rn AS s, l.rn + 1 AS e
             |  FROM ord l JOIN ord h ON h.user_id = l.user_id AND h.rn = l.rn + 1
             |  WHERE l.value < 50 AND h.value >= 50),
             |c2 AS (
             |  SELECT user_id, s, e, 1 AS j2 FROM p2
             |  UNION ALL
             |  SELECT c.user_id, c.s, b.e, c.j2 + 1
             |  FROM c2 c JOIN p2 b ON b.user_id = c.user_id AND b.s = c.e + 1),
             |anch AS (SELECT user_id, event_id, rn FROM ord WHERE event_type = 'error'),
             |m AS (
             |  SELECT a.user_id, a.event_id AS a_id, g1.j1, cv.rn AS crn,
             |         g2.j2, g2.e AS endrn
             |  FROM anch a
             |  JOIN c1 g1 ON g1.user_id = a.user_id AND g1.s = a.rn + 1
             |  JOIN ord cv ON cv.user_id = a.user_id AND cv.rn = g1.e + 1
             |     AND cv.event_type = 'error'
             |  JOIN c2 g2 ON g2.user_id = a.user_id AND g2.s = cv.rn + 1)
             |SELECT m.user_id, m.a_id, CAST(m.j1 AS BIGINT) AS n_d,
             |  CAST(m.j2 AS BIGINT) AS n_l,
             |  (SELECT round(sum(o.value), 6) FROM ord o WHERE o.user_id = m.user_id
             |     AND o.rn > m.crn AND o.rn <= m.endrn AND o.rn % 2 = (m.crn + 2) % 2) AS s_h
             |FROM m ORDER BY 1, 2, 4""".stripMargin)),

    // ZERO-MIN nested group (round 16): A ((D U)* C)+ — an outer
    // iteration may contain NO (D U) pairs, so runs of consecutive errors
    // chain as bare-C iterations (the NFA's zero-iteration tail fork,
    // Cep.zeroMinTails; property-tested vs brute force with inMin=0).
    // The oracle adds the EMPTY block (s=e=error) to the block relation
    // and chains as before; n_d=0 rows pin the zero-iteration outers,
    // n_d>0 rows the mixed chains. WITHIN 60 DAY never binds (the whole
    // corpus spans 30).
    QueryDef(
      "q_cep_mr_nested_zeromin",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT,
            |                   n_c BIGINT, s_u DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           count(C.value) AS n_c, round(sum(U.value), 6) AS s_u
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A ((D U)* C)+) WITHIN INTERVAL '60' DAY
            |  DEFINE A AS A.event_type = 'error',
            |         D AS D.event_type = 'view' OR D.event_type = 'signup',
            |         U AS U.event_type = 'purchase' OR U.event_type = 'click',
            |         C AS C.event_type = 'error'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d",
            "CAST(n_c AS BIGINT) AS n_c", "s_u")
          .orderBy(col("user_id"), col("a_id"), col("n_c"))
      },
      Some("""WITH RECURSIVE ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |p1 AS (
             |  SELECT d.user_id, d.rn AS s, d.rn + 1 AS e
             |  FROM ord d JOIN ord u ON u.user_id = d.user_id AND u.rn = d.rn + 1
             |  WHERE d.event_type IN ('view','signup') AND u.event_type IN ('purchase','click')),
             |c1 AS (
             |  SELECT user_id, s, e, 1 AS k FROM p1
             |  UNION ALL
             |  SELECT c.user_id, c.s, b.e, c.k + 1
             |  FROM c1 c JOIN p1 b ON b.user_id = c.user_id AND b.s = c.e + 1),
             |blk AS (
             |  SELECT user_id, rn AS s, rn AS e, 0 AS nd FROM ord WHERE event_type = 'error'
             |  UNION ALL
             |  SELECT c.user_id, c.s, o.rn, c.k
             |  FROM c1 c JOIN ord o ON o.user_id = c.user_id AND o.rn = c.e + 1
             |  WHERE o.event_type = 'error'),
             |ochain AS (
             |  SELECT user_id, s, e, nd, 1 AS nc FROM blk
             |  UNION ALL
             |  SELECT oc.user_id, oc.s, b.e, oc.nd + b.nd, oc.nc + 1
             |  FROM ochain oc JOIN blk b ON b.user_id = oc.user_id AND b.s = oc.e + 1),
             |anch AS (SELECT user_id, event_id, rn FROM ord WHERE event_type = 'error')
             |SELECT a.user_id, a.event_id AS a_id, CAST(oc.nd AS BIGINT) AS n_d,
             |  CAST(oc.nc AS BIGINT) AS n_c,
             |  (SELECT round(sum(o.value), 6) FROM ord o WHERE o.user_id = a.user_id
             |     AND o.rn > a.rn AND o.rn <= oc.e
             |     AND o.event_type IN ('purchase','click')) AS s_u
             |FROM anch a JOIN ochain oc ON oc.user_id = a.user_id AND oc.s = a.rn + 1
             |ORDER BY 1, 2, 4""".stripMargin)),

    // MATCH_RECOGNIZE DEPTH-2 nested group (round 16): (((D){1,2} U)+ C)+
    // — the innermost single-member group (D){1,2} normalizes to D{1,2}
    // engine-side (no third iteration frame), so depth-2 runs the round-15
    // nested machinery with a RANGE-quantified inner member. Classes are
    // disjoint (D view/signup, U purchase/click, C error), so the parse per
    // (anchor, end) is tape-determined; the pattern ends ON the outer
    // group, so EVERY emits one row per completed outer count. The oracle
    // is a TWO-LEVEL recursive replay: (d{1,2} u) mini-blocks, inner chains
    // of mini-blocks closed by an error, outer chains of those blocks.
    QueryDef(
      "q_cep_mr_nested2",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_d BIGINT,
            |                   n_u BIGINT, n_c BIGINT, s_u DOUBLE);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(D.value) AS n_d,
            |           count(U.value) AS n_u, count(C.value) AS n_c,
            |           round(sum(U.value), 6) AS s_u
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A (((D){1,2} U)+ C)+) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error',
            |         D AS D.event_type = 'view' OR D.event_type = 'signup',
            |         U AS U.event_type = 'purchase' OR U.event_type = 'click',
            |         C AS C.event_type = 'error'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "a_id", "CAST(n_d AS BIGINT) AS n_d",
            "CAST(n_u AS BIGINT) AS n_u", "CAST(n_c AS BIGINT) AS n_c", "s_u")
          .orderBy(col("user_id"), col("a_id"), col("n_c"))
      },
      Some("""WITH RECURSIVE ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |dub AS (
             |  SELECT d1.user_id, d1.rn AS s, d1.rn + 1 AS e, 1 AS nd
             |  FROM ord d1 JOIN ord u ON u.user_id = d1.user_id AND u.rn = d1.rn + 1
             |  WHERE d1.event_type IN ('view','signup') AND u.event_type IN ('purchase','click')
             |  UNION ALL
             |  SELECT d1.user_id, d1.rn, d1.rn + 2, 2
             |  FROM ord d1
             |  JOIN ord d2 ON d2.user_id = d1.user_id AND d2.rn = d1.rn + 1
             |  JOIN ord u  ON u.user_id  = d1.user_id AND u.rn  = d1.rn + 2
             |  WHERE d1.event_type IN ('view','signup') AND d2.event_type IN ('view','signup')
             |    AND u.event_type IN ('purchase','click')),
             |ichain AS (
             |  SELECT user_id, s, e, nd, 1 AS nu FROM dub
             |  UNION ALL
             |  SELECT ic.user_id, ic.s, b.e, ic.nd + b.nd, ic.nu + 1
             |  FROM ichain ic JOIN dub b ON b.user_id = ic.user_id AND b.s = ic.e + 1),
             |oblk AS (
             |  SELECT ic.user_id, ic.s, c.rn AS e, ic.nd, ic.nu
             |  FROM ichain ic JOIN ord c ON c.user_id = ic.user_id AND c.rn = ic.e + 1
             |  WHERE c.event_type = 'error'),
             |ochain AS (
             |  SELECT user_id, s, e, nd, nu, 1 AS nc FROM oblk
             |  UNION ALL
             |  SELECT oc.user_id, oc.s, b.e, oc.nd + b.nd, oc.nu + b.nu, oc.nc + 1
             |  FROM ochain oc JOIN oblk b ON b.user_id = oc.user_id AND b.s = oc.e + 1),
             |anch AS (SELECT user_id, event_id, rn FROM ord WHERE event_type = 'error')
             |SELECT a.user_id, a.event_id AS a_id, CAST(oc.nd AS BIGINT) AS n_d,
             |  CAST(oc.nu AS BIGINT) AS n_u, CAST(oc.nc AS BIGINT) AS n_c,
             |  (SELECT round(sum(o.value), 6) FROM ord o WHERE o.user_id = a.user_id
             |     AND o.rn > a.rn AND o.rn < oc.e
             |     AND o.event_type IN ('purchase','click')) AS s_u
             |FROM anch a JOIN ochain oc ON oc.user_id = a.user_id AND oc.s = a.rn + 1
             |ORDER BY 1, 2, 5""".stripMargin)),

    // MATCH_RECOGNIZE reluctant quantifier (round 13): B+? takes the
    // FEWEST purchases that complete the match — exactly one — where the
    // greedy B+ (q_cep_mr_skip_greedy, same tape) consumes the whole
    // streak. The oracle is the error→immediately-next-purchase pair;
    // n_b pins the count at 1 and b_last pins the collected row at the
    // FIRST purchase (a greedy regression would flip both).
    QueryDef(
      "q_cep_mr_reluctant",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, e1_id BIGINT, n_b BIGINT, b_last BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS e1_id, count(B.value) AS n_b,
            |           LAST(B.event_id) AS b_last
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP PAST LAST ROW
            |  PATTERN (A B+?) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events)
             |SELECT a.user_id, a.event_id AS e1_id, CAST(1 AS BIGINT) AS n_b,
             |       b.event_id AS b_last
             |FROM ord a JOIN ord b
             |  ON b.user_id = a.user_id AND b.rn = a.rn + 1
             |WHERE a.event_type = 'error' AND b.event_type = 'purchase'
             |  AND b.tsu - a.tsu <= 3600000000
             |ORDER BY 1, 2""".stripMargin)),

    // MATCH_RECOGNIZE PERMUTE as a CHAIN ELEMENT (round 14): the
    // either-order pair sits BETWEEN ordered anchor steps — A then
    // PERMUTE(D, U) then C lowers to the engine's per-element AND
    // (interleavings of the element's own operands; the chain keeps its
    // order). The oracle replays both arms as lead() chains; at sf0.01
    // 10 of 22 anchors bind the REVERSED (purchase-then-view) arm, so a
    // regression to a fixed order loses rows and flips d_v/u_v.
    QueryDef(
      "q_cep_mr_permute_chain",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, d_v DOUBLE,
            |                   u_v DOUBLE, c_id BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, round(D.value, 6) AS d_v,
            |           round(U.value, 6) AS u_v, C.event_id AS c_id
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A PERMUTE(D, U) C) WITHIN INTERVAL '30' DAY
            |  DEFINE A AS A.event_type = 'error', D AS D.event_type = 'view',
            |         U AS U.event_type = 'purchase', C AS C.event_type = 'signup'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("a_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |w AS (
             |  SELECT user_id, event_id, event_type,
             |         lead(event_type, 1) OVER win AS e1, lead(event_type, 2) OVER win AS e2,
             |         lead(event_type, 3) OVER win AS e3,
             |         lead(value, 1) OVER win AS v1, lead(value, 2) OVER win AS v2,
             |         lead(event_id, 3) OVER win AS id3
             |  FROM ord WINDOW win AS (PARTITION BY user_id ORDER BY rn))
             |SELECT user_id, event_id AS a_id,
             |  round(CASE WHEN e1 = 'view' THEN v1 ELSE v2 END, 6) AS d_v,
             |  round(CASE WHEN e1 = 'purchase' THEN v1 ELSE v2 END, 6) AS u_v,
             |  id3 AS c_id
             |FROM w WHERE event_type = 'error' AND e3 = 'signup'
             |  AND ((e1 = 'view' AND e2 = 'purchase') OR
             |       (e1 = 'purchase' AND e2 = 'view'))
             |ORDER BY 1, 2""".stripMargin)),

    // MATCH_RECOGNIZE reluctant quantifier under SKIP TO NEXT ROW
    // (round 14): ANSI reads reluctance as a parse PREFERENCE, so it
    // composes with every skip mode — under NEXT ROW each START emits its
    // one preferred (fewest-B) parse and matches overlap freely. Anchoring
    // on purchases makes the modes observably different: in a purchase
    // streak p1..pn EVERY pi..pi+1 pair emits here (n-1 rows), where SKIP
    // PAST LAST ROW would consume p2 and emit only alternate pairs; and
    // n_b = 1 pins reluctance (greedy B+ would take the whole streak).
    QueryDef(
      "q_cep_mr_reluctant_next",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_b BIGINT, b_last BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(B.value) AS n_b,
            |           LAST(B.event_id) AS b_last
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A B+?) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'purchase', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("a_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events)
             |SELECT a.user_id, a.event_id AS a_id, CAST(1 AS BIGINT) AS n_b,
             |       b.event_id AS b_last
             |FROM ord a JOIN ord b
             |  ON b.user_id = a.user_id AND b.rn = a.rn + 1
             |WHERE a.event_type = 'purchase' AND b.event_type = 'purchase'
             |  AND b.tsu - a.tsu <= 3600000000
             |ORDER BY 1, 2""".stripMargin)),

    // MATCH_RECOGNIZE AFTER MATCH SKIP TO LAST <var> (round 12): the
    // partial-overlap resume — the textbook V-shape PATTERN (A D+ U+)
    // where consecutive Vs SHARE their peak (the scan resumes AT the last
    // U row, which anchors the next descent). The oracle enumerates Vs
    // from the run-length structure: every maximal down-run immediately
    // followed by an up-run is a V anchored one row earlier, and under
    // SKIP TO LAST U every such V emits (the resume row is always at or
    // before the next V's anchor). WITHIN 30 DAYS never binds at the test
    // densities (~0.5 day/event, runs of ≤ ~12 rows).
    QueryDef(
      "q_cep_mr_skip_to",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, a_v DOUBLE,
            |                   n_d BIGINT, n_u BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, A.value AS a_v,
            |           count(D.value) AS n_d, count(U.value) AS n_u
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO LAST U
            |  PATTERN (A D+ U+) WITHIN INTERVAL '30' DAY
            |  DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("a_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, value,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             |         lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
             |  FROM events),
             |dirs AS (
             |  SELECT *, CASE WHEN pv IS NULL THEN 'F'
             |                 WHEN value < pv THEN 'D'
             |                 WHEN value > pv THEN 'U' ELSE 'F' END AS dir
             |  FROM ord),
             |runs0 AS (
             |  SELECT user_id, dir, rn,
             |         rn - row_number() OVER (PARTITION BY user_id, dir ORDER BY rn) AS grp
             |  FROM dirs),
             |ragg AS (
             |  SELECT user_id, dir, grp, min(rn) AS rs, max(rn) AS re,
             |         count(*) AS len
             |  FROM runs0 GROUP BY 1, 2, 3),
             |v AS (
             |  SELECT dd.user_id, dd.rs - 1 AS a_rn,
             |         CAST(dd.len AS BIGINT) AS n_d, CAST(uu.len AS BIGINT) AS n_u
             |  FROM ragg dd JOIN ragg uu
             |    ON uu.user_id = dd.user_id AND uu.rs = dd.re + 1
             |  WHERE dd.dir = 'D' AND uu.dir = 'U' AND dd.rs >= 2)
             |SELECT v.user_id, o.event_id AS a_id, o.value AS a_v, v.n_d, v.n_u
             |FROM v JOIN ord o ON o.user_id = v.user_id AND o.rn = v.a_rn
             |ORDER BY 1, 2""".stripMargin)),

    // MATCH_RECOGNIZE SUBSET (round 12): union variable U = (A, B) —
    // MEASURES over U distribute over the members (count sums the member
    // counts, sum/min combine, LAST coalesces in reverse chain order).
    // Every-mode error → k consecutive purchases; the oracle recomputes
    // each union aggregate from the anchoring error row plus the streak
    // members directly.
    QueryDef(
      "q_cep_mr_subset",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, n_u BIGINT,
            |                   s_u DOUBLE, v_min DOUBLE, u_last BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, count(U.value) AS n_u,
            |           sum(U.value) AS s_u, min(U.value) AS v_min,
            |           LAST(U.event_id) AS u_last
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A B+) WITHIN INTERVAL '1' HOUR
            |  SUBSET U = (A, B)
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("a_id"), col("n_u"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |streaks AS (
             |  SELECT *, rn - coalesce(max(CASE WHEN event_type <> 'purchase' THEN rn END)
             |    OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING), 0) AS pstreak
             |  FROM ord),
             |m AS (
             |  SELECT a.user_id, a.rn AS arn, a.event_id AS a_id, a.value AS a_v,
             |         b.rn - a.rn AS k
             |  FROM ord a JOIN streaks b
             |    ON b.user_id = a.user_id AND b.rn > a.rn
             |  WHERE a.event_type = 'error' AND b.event_type = 'purchase'
             |    AND b.pstreak >= b.rn - a.rn
             |    AND b.tsu - a.tsu <= 3600000000)
             |SELECT m.user_id, m.a_id, CAST(m.k + 1 AS BIGINT) AS n_u,
             |       m.a_v + sum(o.value) AS s_u,
             |       least(m.a_v, min(o.value)) AS v_min,
             |       max_by(o.event_id, o.rn) AS u_last
             |FROM m JOIN ord o
             |  ON o.user_id = m.user_id AND o.rn > m.arn AND o.rn <= m.arn + m.k
             |GROUP BY m.user_id, m.a_id, m.a_v, m.k
             |ORDER BY 1, 2, 3""".stripMargin)),

    // MATCH_RECOGNIZE CLASSIFIER()/MATCH_NUMBER() (round 12): ANSI's
    // per-row functions, lowered to aliases of the mr_classifier /
    // mr_match_number columns EMIT ALL ROWS appends — the q_cep_mr_rows
    // oracle with the two extra aliased copies.
    QueryDef(
      "q_cep_mr_classifier",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                   event_type STRING, value DOUBLE, props STRING,
            |                   cls STRING, mn BIGINT, mr_match_number BIGINT,
            |                   mr_classifier STRING);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS mn
            |  ALL ROWS PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A B+) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
            "value", "cls", "mn", "mr_match_number", "mr_classifier")
          .orderBy(col("user_id"), col("mr_match_number"), col("event_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |streaks AS (
             |  SELECT *, rn - coalesce(max(CASE WHEN event_type <> 'purchase' THEN rn END)
             |    OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING), 0) AS pstreak
             |  FROM ord),
             |m0 AS (
             |  SELECT a.user_id, a.rn AS arn, bk.rn - a.rn AS k
             |  FROM ord a JOIN streaks bk
             |    ON bk.user_id = a.user_id AND bk.rn > a.rn
             |  WHERE a.event_type = 'error' AND bk.event_type = 'purchase'
             |    AND bk.pstreak >= bk.rn - a.rn
             |    AND bk.tsu - a.tsu <= 3600000000),
             |m AS (
             |  SELECT user_id, arn, k,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY arn, k) AS BIGINT)
             |      AS mr_match_number
             |  FROM m0),
             |out AS (
             |  SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         'A' AS cls, m.mr_match_number AS mn,
             |         m.mr_match_number, 'A' AS mr_classifier
             |  FROM m JOIN ord o ON o.user_id = m.user_id AND o.rn = m.arn
             |  UNION ALL
             |  SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         'B' AS cls, m.mr_match_number AS mn,
             |         m.mr_match_number, 'B' AS mr_classifier
             |  FROM m JOIN ord o ON o.user_id = m.user_id
             |    AND o.rn > m.arn AND o.rn <= m.arn + m.k)
             |SELECT user_id, event_id, ts_us, value, cls, mn, mr_match_number, mr_classifier
             |FROM out ORDER BY user_id, mr_match_number, event_id""".stripMargin)),

    // MATCH_RECOGNIZE pattern exclusion {- A -} (round 12): A still
    // anchors, times and numbers the match — its rows are just omitted
    // from the ALL ROWS output. Oracle = the q_cep_mr_rows enumeration
    // restricted to the B branch.
    QueryDef(
      "q_cep_mr_excl",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                   event_type STRING, value DOUBLE, props STRING,
            |                   n_b BIGINT, mr_match_number BIGINT,
            |                   mr_classifier STRING);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES count(B.value) AS n_b
            |  ALL ROWS PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN ({- A -} B+) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
            "value", "n_b", "mr_match_number", "mr_classifier")
          .orderBy(col("user_id"), col("mr_match_number"), col("event_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |streaks AS (
             |  SELECT *, rn - coalesce(max(CASE WHEN event_type <> 'purchase' THEN rn END)
             |    OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING), 0) AS pstreak
             |  FROM ord),
             |m0 AS (
             |  SELECT a.user_id, a.rn AS arn, bk.rn - a.rn AS k
             |  FROM ord a JOIN streaks bk
             |    ON bk.user_id = a.user_id AND bk.rn > a.rn
             |  WHERE a.event_type = 'error' AND bk.event_type = 'purchase'
             |    AND bk.pstreak >= bk.rn - a.rn
             |    AND bk.tsu - a.tsu <= 3600000000),
             |m AS (
             |  SELECT user_id, arn, k,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY arn, k) AS BIGINT)
             |      AS mr_match_number
             |  FROM m0)
             |SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |       CAST(m.k AS BIGINT) AS n_b, m.mr_match_number,
             |       'B' AS mr_classifier
             |FROM m JOIN ord o ON o.user_id = m.user_id
             |  AND o.rn > m.arn AND o.rn <= m.arn + m.k
             |ORDER BY m.user_id, m.mr_match_number, o.event_id""".stripMargin)),

    // MATCH_RECOGNIZE RUNNING semantics (round 12): RUNNING count(B.value)
    // re-aggregates per output ROW (rows up to and including the current
    // one) while FINAL stays the whole-match constant. Oracle: the
    // anchoring A row has seen 0 B rows; the j-th B row has seen j.
    QueryDef(
      "q_cep_mr_running",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                   event_type STRING, value DOUBLE, props STRING,
            |                   rc BIGINT, n_b BIGINT, mr_match_number BIGINT,
            |                   mr_classifier STRING);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES RUNNING count(B.value) AS rc, FINAL count(B.value) AS n_b
            |  ALL ROWS PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A B+) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
            "value", "rc", "n_b", "mr_match_number", "mr_classifier")
          .orderBy(col("user_id"), col("mr_match_number"), col("event_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |streaks AS (
             |  SELECT *, rn - coalesce(max(CASE WHEN event_type <> 'purchase' THEN rn END)
             |    OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING), 0) AS pstreak
             |  FROM ord),
             |m0 AS (
             |  SELECT a.user_id, a.rn AS arn, bk.rn - a.rn AS k
             |  FROM ord a JOIN streaks bk
             |    ON bk.user_id = a.user_id AND bk.rn > a.rn
             |  WHERE a.event_type = 'error' AND bk.event_type = 'purchase'
             |    AND bk.pstreak >= bk.rn - a.rn
             |    AND bk.tsu - a.tsu <= 3600000000),
             |m AS (
             |  SELECT user_id, arn, k,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY arn, k) AS BIGINT)
             |      AS mr_match_number
             |  FROM m0),
             |out AS (
             |  SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         CAST(0 AS BIGINT) AS rc, CAST(m.k AS BIGINT) AS n_b,
             |         m.mr_match_number, 'A' AS mr_classifier
             |  FROM m JOIN ord o ON o.user_id = m.user_id AND o.rn = m.arn
             |  UNION ALL
             |  SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         CAST(o.rn - m.arn AS BIGINT) AS rc, CAST(m.k AS BIGINT) AS n_b,
             |         m.mr_match_number, 'B' AS mr_classifier
             |  FROM m JOIN ord o ON o.user_id = m.user_id
             |    AND o.rn > m.arn AND o.rn <= m.arn + m.k)
             |SELECT user_id, event_id, ts_us, value, rc, n_b, mr_match_number, mr_classifier
             |FROM out ORDER BY user_id, mr_match_number, event_id""".stripMargin)),

    // MATCH_RECOGNIZE ALL ROWS WITH UNMATCHED ROWS (round 12): every input
    // row NO match claimed also emits, measures/classifier/number NULL.
    // Oracle = the q_cep_mr_rows enumeration UNION the anti-joined rest of
    // the events table.
    QueryDef(
      "q_cep_mr_unmatched",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                   event_type STRING, value DOUBLE, props STRING,
            |                   n_b BIGINT, mr_match_number BIGINT,
            |                   mr_classifier STRING);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES count(B.value) AS n_b
            |  ALL ROWS PER MATCH WITH UNMATCHED ROWS
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (A B+) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
            "value", "n_b", "mr_match_number", "mr_classifier")
          .orderBy(col("user_id"), col("mr_match_number"), col("event_id"))
      },
      Some("""WITH ord AS (
             |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
             |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
             |  FROM events),
             |streaks AS (
             |  SELECT *, rn - coalesce(max(CASE WHEN event_type <> 'purchase' THEN rn END)
             |    OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING), 0) AS pstreak
             |  FROM ord),
             |m0 AS (
             |  SELECT a.user_id, a.rn AS arn, bk.rn - a.rn AS k
             |  FROM ord a JOIN streaks bk
             |    ON bk.user_id = a.user_id AND bk.rn > a.rn
             |  WHERE a.event_type = 'error' AND bk.event_type = 'purchase'
             |    AND bk.pstreak >= bk.rn - a.rn
             |    AND bk.tsu - a.tsu <= 3600000000),
             |m AS (
             |  SELECT user_id, arn, k,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY arn, k) AS BIGINT)
             |      AS mr_match_number
             |  FROM m0),
             |claimed AS (
             |  SELECT DISTINCT m.user_id, o.rn
             |  FROM m JOIN ord o ON o.user_id = m.user_id
             |    AND o.rn >= m.arn AND o.rn <= m.arn + m.k),
             |out AS (
             |  SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         CAST(m.k AS BIGINT) AS n_b, m.mr_match_number,
             |         'A' AS mr_classifier
             |  FROM m JOIN ord o ON o.user_id = m.user_id AND o.rn = m.arn
             |  UNION ALL
             |  SELECT m.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         CAST(m.k AS BIGINT) AS n_b, m.mr_match_number,
             |         'B' AS mr_classifier
             |  FROM m JOIN ord o ON o.user_id = m.user_id
             |    AND o.rn > m.arn AND o.rn <= m.arn + m.k
             |  UNION ALL
             |  SELECT o.user_id, o.event_id, o.tsu AS ts_us, o.value,
             |         CAST(NULL AS BIGINT) AS n_b, CAST(NULL AS BIGINT) AS mr_match_number,
             |         CAST(NULL AS VARCHAR) AS mr_classifier
             |  FROM ord o LEFT JOIN claimed c
             |    ON c.user_id = o.user_id AND c.rn = o.rn
             |  WHERE c.rn IS NULL)
             |SELECT user_id, event_id, ts_us, value, n_b, mr_match_number, mr_classifier
             |FROM out ORDER BY user_id, mr_match_number, event_id""".stripMargin)),

    // MATCH_RECOGNIZE PERMUTE (round 12): every ordering of the members —
    // lowered to the engine's n-ary AND element (arrival-order variants,
    // one shared NFA pass). Strict error/purchase adjacency in EITHER
    // order; the oracle enumerates adjacent pairs with a lead window and
    // assigns a_id/b_id by which type came first.
    QueryDef(
      "q_cep_mr_permute",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, a_id BIGINT, b_id BIGINT);
            |INSERT INTO Out SELECT * FROM events MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts
            |  MEASURES A.event_id AS a_id, B.event_id AS b_id
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (PERMUTE(A, B)) WITHIN INTERVAL '1' HOUR
            |  DEFINE A AS A.event_type = 'error', B AS B.event_type = 'purchase'
            |);""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("a_id"), col("b_id"))
      },
      Some("""SELECT user_id,
             |  CASE WHEN t1 = 'error' THEN id1 ELSE id2 END AS a_id,
             |  CASE WHEN t1 = 'error' THEN id2 ELSE id1 END AS b_id
             |FROM (
             |  SELECT user_id, event_id AS id1, event_type AS t1,
             |         lead(event_id) OVER w AS id2, lead(event_type) OVER w AS t2,
             |         epoch_us(ts) AS ts1, lead(epoch_us(ts)) OVER w AS ts2
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
             |WHERE ((t1 = 'error' AND t2 = 'purchase')
             |    OR (t1 = 'purchase' AND t2 = 'error'))
             |  AND ts2 - ts1 <= 3600000000
             |ORDER BY user_id, a_id, b_id""".stripMargin)),

    // Cross-step reference (e2.value > 2 * e1.value) — the StateEvent
    // access pattern; relaxed, within 2h.
    QueryDef(
      "q_cep_trend",
      (s, dir) => {
        import s.implicits._
        val spec = PatternSpec(
          steps = Seq(
            Step.simple("e1")(_.etype == "view"),
            Step.withContext("e2") { (e, coll) =>
              e.etype == "purchase" && e.value > 2.0 * coll.head.head.value }),
          strict = false, every = true, withinUs = Some(2 * H1))
        Cep.detect(Cep.fromEvents(Tables(s, dir, "events")), spec)
          .map(m => (m.key.toLong,
            m.steps.head.events.head.eventId, m.steps(1).events.head.eventId,
            m.steps.head.events.head.value, m.steps(1).events.head.value))
          .toDF("user_id", "e1_id", "e2_id", "v1", "v2")
          .orderBy(col("user_id"), col("e1_id"))
      },
      Some("""WITH a AS (SELECT user_id, event_id AS a_id, epoch_us(ts) AS a_ts, value AS v1
             |          FROM events WHERE event_type = 'view'),
             |b AS (SELECT user_id, event_id AS b_id, epoch_us(ts) AS b_ts, value AS v2
             |      FROM events WHERE event_type = 'purchase')
             |SELECT a.user_id, a.a_id AS e1_id, min(b.b_id) AS e2_id,
             |  min(a.v1) AS v1,
             |  min_by(b.v2, b.b_id) AS v2
             |FROM a JOIN b ON a.user_id = b.user_id
             |  AND b.b_id > a.a_id AND b.b_ts - a.a_ts <= 7200000000
             |  AND b.v2 > 2.0 * a.v1
             |GROUP BY a.user_id, a.a_id
             |ORDER BY 1, 2""".stripMargin)),

    // Three-way logical AND (round 10; the reference `#[ignore]`s the
    // chained form, patterns.rs:1228): signup AND purchase AND error in
    // ANY arrival order within 6h — the compiler unions all 3! = 6
    // arrival-order variants, each a first-next chain from its seed. The
    // oracle replays exactly that: per permutation, seed each event of the
    // first type, chain min-id picks, horizon on completion.
    QueryDef(
      "q_cep_sql_and3",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, s_id BIGINT, p_id BIGINT, c_id BIGINT);
            |INSERT INTO Out
            |SELECT e1.user_id AS user_id, e1.event_id AS s_id,
            |       e2.event_id AS p_id, e3.event_id AS c_id
            |FROM PATTERN (EVERY (e1=events[event_type = 'signup']
            |              AND e2=events[event_type = 'purchase']
            |              AND e3=events[event_type = 'error']))
            |WITHIN 6 HOURS
            |PARTITION BY user_id;""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("s_id"), col("p_id"), col("c_id"))
      },
      Some(interleaveOracle(Seq("s", "p", "c").permutations.toSeq))),

    // Nested sub-chain AND (round 10; patterns.rs:611 `#[ignore]`d):
    // (signup -> purchase) AND error — the sub-chain completes in order,
    // the error lands anywhere relative to it (3 interleavings).
    QueryDef(
      "q_cep_sql_group",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, s_id BIGINT, p_id BIGINT, c_id BIGINT);
            |INSERT INTO Out
            |SELECT e1.user_id AS user_id, e1.event_id AS s_id,
            |       e2.event_id AS p_id, e3.event_id AS c_id
            |FROM PATTERN (EVERY ((e1=events[event_type = 'signup']
            |              -> e2=events[event_type = 'purchase'])
            |              AND e3=events[event_type = 'error']))
            |WITHIN 6 HOURS
            |PARTITION BY user_id;""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("s_id"), col("p_id"), col("c_id"))
      },
      Some(interleaveOracle(Seq(
        Seq("s", "p", "c"), Seq("s", "c", "p"), Seq("c", "s", "p"))))),

    // Zero-or-more (round 10; patterns.rs:563 `#[ignore]`d `e1=A* -> e2=B`):
    // `signup* -> purchase` = the A+ enumeration PLUS one zero-repeat match
    // per purchase (first/last NULL, count 0) — the documented
    // `B OR (A+ -> B)` union, both branches in one compiled query.
    QueryDef(
      "q_cep_sql_star",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, first_id BIGINT, last_id BIGINT,
            |                   b_id BIGINT, n_collected BIGINT);
            |INSERT INTO Out
            |SELECT z.user_id AS user_id, e[0].event_id AS first_id,
            |       e[last].event_id AS last_id, z.event_id AS b_id,
            |       count(e) AS n_collected
            |FROM PATTERN (EVERY e=events[event_type = 'signup']*
            |              -> z=events[event_type = 'purchase'])
            |WITHIN 6 HOURS
            |PARTITION BY user_id;""".stripMargin
        GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("first_id"), col("last_id"), col("b_id"))
      },
      Some(
        """WITH plus AS (
          |""".stripMargin +
        cepPlusOracle.replace("ORDER BY m.user_id, m.first_id, m.last_id", "") + """
          |)
          |SELECT * FROM plus
          |UNION ALL
          |SELECT user_id, CAST(NULL AS BIGINT) AS first_id,
          |  CAST(NULL AS BIGINT) AS last_id, event_id AS b_id,
          |  CAST(0 AS BIGINT) AS n_collected
          |FROM events WHERE event_type = 'purchase'
          |ORDER BY user_id, first_id, last_id, b_id""".stripMargin))
  )

  /** Oracle generator for AND-interleaving rows: one SELECT per arrival
    * order (a, b, c are type tags s=signup, p=purchase, c=error), each a
    * seed + two first-next (min id) picks with the 6h horizon checked on
    * the completing event, UNION ALL'd. A concrete event triple has ONE
    * arrival order, so the union is duplicate-free — same argument as the
    * compiler's variant union.
    */
  private def interleaveOracle(perms: Seq[Seq[String]]): String = {
    val tbl = Map("s" -> "sg", "p" -> "pur", "c" -> "er")
    val variantSqls = perms.map { case Seq(a, b, c) =>
      def outCol(tag: String, idExpr: String) = s"$idExpr AS ${tag}_id"
      val cols = Seq("s", "p", "c").map { t =>
        if (t == a) outCol(t, "f.a_id")
        else if (t == b) outCol(t, "f.b_id")
        else outCol(t, "min(t3.id)")
      }.mkString(", ")
      s"""SELECT f.user_id, $cols
         |FROM (
         |  SELECT t1.user_id, t1.id AS a_id, t1.ts AS a_ts, min(t2.id) AS b_id
         |  FROM ${tbl(a)} t1 JOIN ${tbl(b)} t2
         |    ON t2.user_id = t1.user_id AND t2.id > t1.id
         |  GROUP BY 1, 2, 3) f
         |JOIN ${tbl(c)} t3 ON t3.user_id = f.user_id AND t3.id > f.b_id
         |  AND t3.ts - f.a_ts <= 21600000000
         |GROUP BY f.user_id, f.a_id, f.b_id""".stripMargin
    }
    """WITH sg AS (SELECT user_id, event_id AS id, epoch_us(ts) AS ts
      |           FROM events WHERE event_type = 'signup'),
      |pur AS (SELECT user_id, event_id AS id, epoch_us(ts) AS ts
      |        FROM events WHERE event_type = 'purchase'),
      |er AS (SELECT user_id, event_id AS id, epoch_us(ts) AS ts
      |       FROM events WHERE event_type = 'error')
      |""".stripMargin +
      variantSqls.mkString("", "\nUNION ALL\n", "\n") +
      "ORDER BY user_id, s_id, p_id, c_id"
  }

  /** Shared oracle for the A+ rows (q_cep_plus / q_cep_sql_plus): one
    * match per signup PAIR (first <= last), completed by the first
    * purchase after `last` while the seed stays inside the 6h horizon;
    * n_collected = signups in [first, last].
    */
  private def cepPlusOracle: String =
    """WITH sg AS (
      |  SELECT user_id, event_id AS id, epoch_us(ts) AS ts
      |  FROM events WHERE event_type = 'signup'),
      |pur AS (
      |  SELECT user_id, event_id AS id, epoch_us(ts) AS ts
      |  FROM events WHERE event_type = 'purchase'),
      |pairs AS (
      |  SELECT a.user_id, a.id AS first_id, k.id AS last_id, a.ts AS s_ts
      |  FROM sg a JOIN sg k ON a.user_id = k.user_id AND k.id >= a.id),
      |m AS (
      |  SELECT p.user_id, p.first_id, p.last_id, min(b.id) AS b_id
      |  FROM pairs p JOIN pur b ON b.user_id = p.user_id
      |    AND b.id > p.last_id AND b.ts - p.s_ts <= 21600000000
      |  GROUP BY 1, 2, 3)
      |SELECT m.user_id, m.first_id, m.last_id, m.b_id,
      |  CAST(count(*) AS BIGINT) AS n_collected
      |FROM m JOIN sg x ON x.user_id = m.user_id
      |  AND x.id BETWEEN m.first_id AND m.last_id
      |GROUP BY 1, 2, 3, 4
      |ORDER BY m.user_id, m.first_id, m.last_id""".stripMargin
}
