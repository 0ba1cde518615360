package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Rollups, Scd, TableOps}

/** Incremental multi-granularity aggregation (§1.1) and keyed-table DML
  * (§2.10) through the real operators, oracle-checked. The rollup queries
  * go through the CASCADE (minute → hour → day), so a pass proves the
  * re-aggregation composes, not just that Spark can group by hour.
  */
object RollupQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // Hour-grain rollup computed THROUGH the minute grain.
    QueryDef(
      "q_rollup_hour",
      (s, dir) => {
        val c = Rollups.cascade(Tables(s, dir, "events"), "ts",
          Seq("event_type"), "value", Seq("minute", "hour"))
        c.byGrain("hour")
          .select(
            col("event_type"),
            date_format(col("bucket"), "yyyy-MM-dd HH").as("h"),
            col("cnt"),
            round(col("sum_v"), 2).as("sum_v"),
            col("min_v"), col("max_v"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS h,
             |  count(*) AS cnt, round(sum(value), 2) AS sum_v,
             |  min(value) AS min_v, max(value) AS max_v
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // On-demand range query at day grain (query_aggregation "within"),
    // THROUGH the SQL surface: CREATE AGGREGATION lowers onto the
    // minute → hour → day Rollups.cascade, and the WITHIN … PER statement
    // is the reference's query_aggregation(agg_id, within, per)
    // (aggregation_definition.rs:13-24, eventflux_app_runtime.rs:982-993).
    QueryDef(
      "q_rollup_query",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (user_id BIGINT, d STRING, cnt BIGINT,
            |                   sum_v DOUBLE, avg_v DOUBLE);
            |CREATE AGGREGATION UserDaily FROM events
            |GROUP BY user_id AGGREGATE value BY ts EVERY minute TO day;
            |INSERT INTO Out
            |SELECT user_id, date_format(bucket, 'yyyy-MM-dd') AS d, cnt,
            |       round(sum_v, 2) AS sum_v, round(avg_v, 4) AS avg_v
            |FROM UserDaily WITHIN '2024-01-10' AND '2024-01-20' PER 'day'
            |ORDER BY user_id, d;""".stripMargin
        graft.sql.GraftApp.run(s, app, Map("events" -> Tables(s, dir, "events")))("Out")
      },
      Some("""SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
             |  count(*) AS cnt, round(sum(value), 2) AS sum_v,
             |  round(sum(value) / count(*), 4) AS avg_v
             |FROM events
             |WHERE date_trunc('day', ts) >= TIMESTAMP '2024-01-10'
             |  AND date_trunc('day', ts) < TIMESTAMP '2024-01-20'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // UPDATE OR INSERT (upsert): keys <= 50 updated to bal 0, synthetic
    // keys (+1000000) inserted, everything else kept.
    QueryDef(
      "q_table_upsert",
      (s, dir) => {
        val t = Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("bal"))
        val updates = t.filter(col("c_custkey") <= 50)
          .select(col("c_custkey"), col("c_name"), lit(0.0).as("bal"))
        val inserts = t.filter(col("c_custkey") <= 20)
          .select((col("c_custkey") + 1000000).as("c_custkey"), col("c_name"), lit(1.0).as("bal"))
        TableOps.upsert(t, updates.unionByName(inserts), Seq("c_custkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH t AS (SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal FROM customer),
             |d AS (SELECT c_custkey, c_name, 0.0 AS bal FROM t WHERE c_custkey <= 50
             |      UNION ALL
             |      SELECT c_custkey + 1000000, c_name, 1.0 FROM t WHERE c_custkey <= 20)
             |SELECT * FROM (
             |  SELECT * FROM t WHERE c_custkey NOT IN (SELECT c_custkey FROM d)
             |  UNION ALL SELECT * FROM d)
             |ORDER BY c_custkey""".stripMargin)),

    // DELETE ON condition: drop customers holding any >450k order.
    QueryDef(
      "q_table_delete",
      (s, dir) => {
        val t = Tables(s, dir, "customer")
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        val matches = Tables(s, dir, "orders")
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey").as("c_custkey"))
        TableOps.delete(t, matches, Seq("c_custkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // The same DML algebra through the SQL surface: UPDATE OR INSERT then
    // DELETE as app statements executing in declared order against the
    // table env (update_table_processor.rs roadmap syntax).
    QueryDef(
      "q_table_dml_sql",
      (s, dir) => {
        val app =
          """CREATE TABLE t (c_custkey BIGINT, bal DOUBLE);
            |CREATE STREAM updates (c_custkey BIGINT, bal DOUBLE);
            |CREATE STREAM dels (c_custkey BIGINT);
            |UPDATE OR INSERT INTO t SELECT c_custkey, bal FROM updates
            |ON t.c_custkey = updates.c_custkey;
            |DELETE FROM t FROM dels WHERE t.c_custkey = dels.c_custkey;""".stripMargin
        val cust = Tables(s, dir, "customer")
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        val updates = cust.filter(col("c_custkey") <= 50)
          .select(col("c_custkey"), lit(0.0).as("bal"))
          .unionByName(cust.filter(col("c_custkey") <= 20)
            .select((col("c_custkey") + 1000000).as("c_custkey"), lit(1.0).as("bal")))
        val dels = Tables(s, dir, "orders")
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey").as("c_custkey"))
        graft.sql.GraftApp.run(s, app,
            Map("t" -> cust, "updates" -> updates, "dels" -> dels))("t")
          .orderBy(col("c_custkey"))
      },
      Some("""WITH t0 AS (SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer),
             |d AS (SELECT c_custkey, 0.0 AS bal FROM t0 WHERE c_custkey <= 50
             |      UNION ALL
             |      SELECT c_custkey + 1000000, 1.0 FROM t0 WHERE c_custkey <= 20),
             |t1 AS (SELECT * FROM t0 WHERE c_custkey NOT IN (SELECT c_custkey FROM d)
             |       UNION ALL SELECT * FROM d)
             |SELECT * FROM t1
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = t1.c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Table-membership IN predicate (in_expression_executor.rs): events
    // whose user exists in the high-balance customer table.
    QueryDef(
      "q_table_contains",
      (s, dir) => {
        val stream = Tables(s, dir, "events")
          .select(col("event_id"), col("user_id").as("c_custkey"), col("value"))
        val table = Tables(s, dir, "customer").filter(col("c_acctbal") > 5000.0)
        TableOps.containsFilter(stream, table, Seq("c_custkey"))
          .select(col("event_id"), col("c_custkey").as("user_id"), col("value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE EXISTS (SELECT 1 FROM customer
             |  WHERE c_custkey = user_id AND c_acctbal > 5000.0)
             |ORDER BY event_id""".stripMargin)),

    // SCD type-2 history built from a change log (Scd.history): each
    // customer's order-status intervals over time, change-compressed
    // (re-stating the same status extends the interval). One key exchange
    // + within-key sort; lag/lead share the window pass.
    QueryDef(
      "q_table_scd2",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        Scd.history(o, Seq("o_custkey"), "o_orderdate", "o_orderkey",
            Seq("o_orderstatus"))
          .select(col("o_custkey").as("custkey"),
            col("o_orderstatus").as("status"),
            date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
            date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"),
            col("is_current"))
          .orderBy(col("custkey"), col("valid_from"), col("valid_to"),
            col("status"))
      },
      Some("""WITH w AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             |    lag(o_orderstatus) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS prev
             |  FROM orders),
             |o AS (SELECT * FROM w WHERE prev IS NULL OR prev <> o_orderstatus),
             |h AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate AS vf,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS vt
             |  FROM o)
             |SELECT o_custkey AS custkey, o_orderstatus AS status,
             |  strftime(vf, '%Y-%m-%d') AS valid_from,
             |  strftime(vt, '%Y-%m-%d') AS valid_to,
             |  vt IS NULL AS is_current
             |FROM h ORDER BY custkey, valid_from, valid_to, status""".stripMargin)),

    // Point-in-time (as-of) lookup against the SCD2 history — the read
    // path the dimension exists for: every order resolves the status
    // interval in effect at its date (valid_from <= d < valid_to,
    // open-ended current). Scale shape: per-key history is small by
    // construction, so ONE equi-join on the key with the interval filter
    // as residual is the right plan (no banding needed — the join key
    // already bounds the candidates).
    QueryDef(
      "q_table_scd2_asof",
      (s, dir) => {
        val cutoff = to_timestamp(lit("1997-01-01 00:00:00"))
        val o = Tables(s, dir, "orders")
        val dim = Scd.history(o.filter(col("o_orderdate") < cutoff),
          Seq("o_custkey"), "o_orderdate", "o_orderkey", Seq("o_orderstatus"))
        val probes = o.select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"))
        probes.join(dim, Seq("o_custkey"))
          .filter(col("valid_from") <= col("o_orderdate") &&
            (col("valid_to").isNull || col("valid_to") > col("o_orderdate")))
          .select(col("o_orderkey").as("orderkey"),
            col("o_custkey").as("custkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("as_of"),
            col("o_orderstatus").as("status_then"))
          .orderBy(col("orderkey"))
      },
      Some("""WITH pre AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
             |w AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             |    lag(o_orderstatus) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS prev
             |  FROM pre),
             |o AS (SELECT * FROM w WHERE prev IS NULL OR prev <> o_orderstatus),
             |dim AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate AS vf,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS vt
             |  FROM o)
             |SELECT p.o_orderkey AS orderkey, p.o_custkey AS custkey,
             |  strftime(p.o_orderdate, '%Y-%m-%d') AS as_of,
             |  d.o_orderstatus AS status_then
             |FROM orders p JOIN dim d ON p.o_custkey = d.o_custkey
             |  AND d.vf <= p.o_orderdate
             |  AND (d.vt IS NULL OR d.vt > p.o_orderdate)
             |ORDER BY orderkey""".stripMargin)),

    // Incremental SCD2 merge (Scd.merge): the pre-1997 history absorbs one
    // delta batch (each key's latest post-1997 status, effective at the
    // cutoff). Unchanged keys' rows pass through untouched — the daily-merge
    // shape that never rewrites the cold dimension at 100 TB.
    QueryDef(
      "q_table_scd2_merge",
      (s, dir) => {
        val cutoff = to_timestamp(lit("1997-01-01 00:00:00"))
        val o = Tables(s, dir, "orders")
        val dim = Scd.history(o.filter(col("o_orderdate") < cutoff),
          Seq("o_custkey"), "o_orderdate", "o_orderkey", Seq("o_orderstatus"))
        val delta = o.filter(col("o_orderdate") >= cutoff)
          .withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
          .filter(col("rn") === 1).select("o_custkey", "o_orderstatus")
        Scd.merge(dim, delta, Seq("o_custkey"), Seq("o_orderstatus"), cutoff)
          .select(col("o_custkey").as("custkey"),
            col("o_orderstatus").as("status"),
            date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
            date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"),
            col("is_current"))
          .orderBy(col("custkey"), col("valid_from"), col("valid_to"),
            col("status"), col("is_current"))
      },
      Some("""WITH pre AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
             |w AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             |    lag(o_orderstatus) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS prev
             |  FROM pre),
             |o AS (SELECT * FROM w WHERE prev IS NULL OR prev <> o_orderstatus),
             |dim AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate AS vf,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS vt
             |  FROM o),
             |delta AS (
             |  SELECT o_custkey, o_orderstatus FROM (
             |    SELECT o_custkey, o_orderstatus, row_number() OVER (
             |      PARTITION BY o_custkey
             |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
             |  WHERE rn = 1),
             |changed AS (
             |  SELECT d.o_custkey, d.o_orderstatus, d.vf, x.o_orderstatus AS new_s
             |  FROM dim d JOIN delta x ON d.o_custkey = x.o_custkey
             |  WHERE d.vt IS NULL AND d.o_orderstatus <> x.o_orderstatus),
             |merged AS (
             |  SELECT o_custkey, o_orderstatus, vf, vt FROM dim
             |  WHERE vt IS NOT NULL
             |    OR o_custkey NOT IN (SELECT o_custkey FROM changed)
             |  UNION ALL
             |  SELECT o_custkey, o_orderstatus, vf,
             |    TIMESTAMP '1997-01-01' FROM changed
             |  UNION ALL
             |  SELECT o_custkey, new_s, TIMESTAMP '1997-01-01', NULL FROM changed
             |  UNION ALL
             |  SELECT o_custkey, o_orderstatus, TIMESTAMP '1997-01-01', NULL
             |  FROM delta WHERE o_custkey NOT IN (
             |    SELECT o_custkey FROM dim WHERE vt IS NULL))
             |SELECT o_custkey AS custkey, o_orderstatus AS status,
             |  strftime(vf, '%Y-%m-%d') AS valid_from,
             |  strftime(vt, '%Y-%m-%d') AS valid_to,
             |  vt IS NULL AS is_current
             |FROM merged
             |ORDER BY custkey, valid_from, valid_to, status, is_current""".stripMargin))
  )
}
