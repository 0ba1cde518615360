package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Join surface (SURVEY §2.3).
  *
  * The reference joins are nested loops over windowed buffers
  * (join_processor.rs:18-214, table_join_processor.rs:17-176). Spark-first
  * re-expression: equi-conditions become hash joins (broadcast when one side
  * is a dimension — at 100 TB the fact side never shuffles for those);
  * residual theta conditions ride along as post-join filters; pure theta
  * joins fall back to broadcast-nested-loop, which we only use on dimension-
  * sized inputs. Semi/anti/as-of joins are free additions the reference
  * lists as unimplemented (GRAMMAR.md:328-338).
  */
object JoinQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // INNER equi join fact-to-fact, aggregated. At scale: shuffle hash/SMJ
    // on l_orderkey=o_orderkey; AQE picks the physical strategy.
    QueryDef(
      "q_join_inner",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val o  = Tables(s, dir, "orders")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // LEFT OUTER: unmatched left rows pad NULLs (join_processor.rs LEFT arm);
    // count(o_orderkey) skips the padded NULLs, count(*) does not.
    QueryDef(
      "q_join_left",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_big_orders"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  count(o_orderkey) AS n_big_orders,
             |  count(*) AS n_rows
             |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
             |  ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // RIGHT OUTER mirror.
    QueryDef(
      "q_join_right",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem").filter(col("l_quantity") >= 49.0)
        val o  = Tables(s, dir, "orders")
        li.join(o, col("l_orderkey") === col("o_orderkey"), "right_outer")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(col("l_orderkey")).as("n_matched"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  count(l_orderkey) AS n_matched,
             |  count(*) AS n_rows
             |FROM (SELECT * FROM lineitem WHERE l_quantity >= 49.0) li
             |  RIGHT JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // FULL OUTER: both sides contribute unmatched keys.
    QueryDef(
      "q_join_full",
      (s, dir) => {
        val big  = Tables(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
        val poor = Tables(s, dir, "customer").filter(col("c_acctbal") < 0.0)
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        big.join(poor, col("o_custkey") === col("c_custkey"), "full_outer")
          .select(
            coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
            coalesce(col("n_big"), lit(0L)).as("n_big"),
            col("bal").isNotNull.as("in_debt"))
          .orderBy(col("custkey"))
      },
      Some("""SELECT coalesce(o_custkey, c_custkey) AS custkey,
             |  coalesce(n_big, 0) AS n_big,
             |  bal IS NOT NULL AS in_debt
             |FROM (SELECT o_custkey, count(*) AS n_big FROM orders
             |      WHERE o_totalprice > 450000.0 GROUP BY o_custkey) big
             |FULL JOIN (SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
             |           WHERE c_acctbal < 0.0) poor
             |  ON o_custkey = c_custkey
             |ORDER BY custkey""".stripMargin)),

    // Theta (non-equi) join — the reference's joins are arbitrary-theta
    // nested loops; on Spark a pure theta join is broadcast-nested-loop, so
    // we only ever run it dimension×dimension (supplier×nation here).
    QueryDef(
      "q_join_theta",
      (s, dir) => {
        val su = Tables(s, dir, "supplier")
        val n  = Tables(s, dir, "nation")
        su.join(broadcast(n),
            col("s_acctbal") > col("n_nationkey") * lit(150.0) &&
            col("s_nationkey") =!= col("n_nationkey"))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_nation"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, count(*) AS n_nations, min(n_name) AS first_nation
             |FROM supplier JOIN nation
             |  ON s_acctbal > n_nationkey * 150.0 AND s_nationkey <> n_nationkey
             |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin)),

    // LEFT SEMI (EXISTS) — shuffle-free on the build side when broadcast;
    // no row duplication, output columns only from the left.
    QueryDef(
      "q_join_semi",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // LEFT ANTI (NOT EXISTS).
    QueryDef(
      "q_join_anti",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Multiway star join (TPC-H Q5 shape): every dimension broadcast — the
    // 100 TB plan scans lineitem once, no dimension shuffle.
    QueryDef(
      "q_join_star",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val o  = Tables(s, dir, "orders")
        val c  = Tables(s, dir, "customer")
        val n  = Tables(s, dir, "nation")
        val r  = Tables(s, dir, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("o_orderdate") < lit("1999-01-01"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderdate < TIMESTAMP '1999-01-01'
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // Stream–table join analog (table_join_processor.rs): the events fact
    // joins a broadcast customer dimension; LEFT so unmatched users pad
    // NULLs exactly like the reference's LEFT table join.
    QueryDef(
      "q_join_streamtable",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val c = Tables(s, dir, "customer")
        e.join(broadcast(c), col("user_id") === col("c_custkey"), "left_outer")
          .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
          .agg(
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("sum_value"))
          .orderBy(col("segment"))
      },
      Some("""SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment,
             |  count(*) AS n_events,
             |  round(sum(value), 2) AS sum_value
             |FROM events LEFT JOIN customer ON user_id = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Windowed stream-stream join through the SQL surface (joins.rs
    // join_test1 / join_test_mixed_windows shape): each join side bounded
    // by its own buffer window — purchases keep the last 500 arrivals
    // (length buffer), views the last 48h of event time (time buffer);
    // window-then-join batch form, the length-bounded side broadcast.
    QueryDef(
      "q_join_windowed",
      (s, dir) => {
        val app =
          """CREATE STREAM purchases (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                         event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM views (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                     event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (p_id BIGINT, v_id BIGINT, user_id BIGINT, total DOUBLE);
            |INSERT INTO Out
            |SELECT purchases.event_id AS p_id, views.event_id AS v_id,
            |       purchases.user_id AS user_id,
            |       purchases.value + views.value AS total
            |FROM purchases WINDOW('length', 500)
            |JOIN views WINDOW('time', '48 hours')
            |ON purchases.user_id = views.user_id
            |ORDER BY p_id, v_id;""".stripMargin
        val e = Tables(s, dir, "events")
        graft.sql.GraftApp.run(s, app, Map(
          "purchases" -> e.filter(col("event_type") === "purchase"),
          "views"     -> e.filter(col("event_type") === "view")))("Out")
      },
      Some("""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
             |pbuf AS (SELECT * FROM (
             |    SELECT *, row_number() OVER (ORDER BY ts DESC, event_id DESC,
             |      user_id DESC, event_type DESC, value DESC, props DESC) AS rn
             |    FROM p) WHERE rn <= 500),
             |v AS (SELECT * FROM events WHERE event_type = 'view'),
             |vbuf AS (SELECT * FROM v
             |  WHERE epoch_us(ts) > (SELECT max(epoch_us(ts)) FROM v) - 172800000000)
             |SELECT pbuf.event_id AS p_id, vbuf.event_id AS v_id,
             |       pbuf.user_id AS user_id, pbuf.value + vbuf.value AS total
             |FROM pbuf JOIN vbuf ON pbuf.user_id = vbuf.user_id
             |ORDER BY p_id, v_id""".stripMargin)),

    // As-of join (beyond the reference; GRAMMAR.md:328-338 roadmap): for
    // each event, the most recent order of that user at-or-before the event
    // time. SORT-MERGE shape: union both relations, one per-user sort, a
    // running last-non-null carries the newest order into each event row —
    // work is O(n log n) per user with NO join fan-out, so a hot user costs
    // its sort instead of |events|x|orders| intermediate rows (the
    // conditional-join + max_by form this replaces was quadratic on a
    // skewed key; SCALE.md has the micro-bench). Ties: orders sort before
    // events at the same instant (at-or-before inclusivity), and among
    // same-date orders the largest orderkey wins — the (date, orderkey)
    // max the aggregate form computed.
    QueryDef(
      "q_join_asof",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables(s, dir, "events").filter(col("event_type") === "purchase")
          .select(col("user_id").as("u"), unix_micros(col("ts")).as("t_us"),
            lit(1).as("kind"), col("event_id"),
            lit(null).cast("long").as("okey"),
            lit(null).cast("string").as("odate"),
            lit(null).cast("double").as("oprice"))
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey").as("u"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
            lit(0).as("kind"), lit(null).cast("long").as("event_id"),
            col("o_orderkey").as("okey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
            round(col("o_totalprice"), 2).as("oprice"))
        val w = Window.partitionBy(col("u"))
          .orderBy(col("t_us"), col("kind"), col("okey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.unionByName(o)
          .withColumn("last_order_date", last(col("odate"), ignoreNulls = true).over(w))
          .withColumn("last_order_price", last(col("oprice"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("last_order_date"), col("last_order_price"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  max(strftime(o_orderdate, '%Y-%m-%d')) AS last_order_date,
             |  max_by(round(o_totalprice, 2), strftime(o_orderdate, '%Y-%m-%d')
             |    || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS last_order_price
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
             |LEFT JOIN orders ON user_id = o_custkey AND o_orderdate <= ts
             |GROUP BY event_id ORDER BY event_id""".stripMargin)),

    // Salted skew join (Skew.saltedJoin): lineitem⋈supplier with the big
    // side's per-key rows spread over 8 salted reducers, then aggregated —
    // the oracle is the PLAIN join, which is the operator's correctness
    // contract (salting must be invisible in the result). The skew tool for
    // when the small side is too big to broadcast and AQE can't see the
    // shuffle (e.g. it feeds this very groupBy).
    QueryDef(
      "q_join_salted",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
        val sup = Tables(s, dir, "supplier")
          .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
        graft.operators.Skew.saltedJoin(li, sup, Seq("suppkey"), salts = 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey, count(*) AS n_items,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // Edit-distance FUZZY join (record linkage) over part names: the join
    // runs on the distinct-name dictionary (blocked by head noun + length
    // band), exact Levenshtein verify at d<=3, multiplicities as count
    // products. Both engines implement classic Levenshtein — bit-exact.
    QueryDef(
      "q_join_fuzzy",
      (s, dir) => {
        val p = Tables(s, dir, "part")
        graft.operators.Dedup.fuzzyNamePairs(p, "p_name", maxDist = 3)
          .orderBy(col("a_name"), col("b_name"))
      },
      Some("""WITH n AS (
             |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS cnt,
             |    string_split(p_name, ' ')[-1] AS blk, length(p_name) AS ln
             |  FROM part GROUP BY p_name)
             |SELECT a.name AS a_name, b.name AS b_name,
             |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
             |  a.cnt * b.cnt AS n_pairs
             |FROM n a JOIN n b ON a.blk = b.blk AND a.name < b.name
             |  AND abs(a.ln - b.ln) <= 3
             |WHERE levenshtein(a.name, b.name) <= 3
             |ORDER BY a_name, b_name""".stripMargin)),

    // Banded RANGE join (RangeJoin.bandedIntervalJoin): each purchase
    // event joined to the same user's other events within ±1 hour. The
    // theta range predicate runs as an equi-join on (user, 2h-bin) + exact
    // residual — no nested-loop anywhere (the scale rewrite); the oracle
    // is the PLAIN range join, which is the operator's correctness
    // contract (banding must be invisible in the result).
    QueryDef(
      "q_join_range",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val purch = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            (unix_timestamp(col("ts")) - 3600L).as("w_start"),
            (unix_timestamp(col("ts")) + 3600L).as("w_end"))
        val others = e.select(col("event_id").as("o_id"), col("user_id"),
          unix_timestamp(col("ts")).as("o_sec"), col("value"))
        graft.operators.RangeJoin.bandedIntervalJoin(
            purch, others, Seq("user_id"), "w_start", "w_end", "o_sec",
            binWidthSec = 7200L)
          .filter(col("o_id") =!= col("p_id"))
          .groupBy(col("p_id"))
          .agg(count(lit(1)).cast("long").as("n_nearby"),
            round(sum(col("value")), 2).as("sum_value"))
          .orderBy(col("p_id"))
      },
      Some("""WITH p AS (
             |  SELECT event_id AS p_id, user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) - 3600 AS w_start,
             |    CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS w_end
             |  FROM events WHERE event_type = 'purchase'),
             |o AS (SELECT event_id AS o_id, user_id,
             |        CAST(floor(epoch(ts)) AS BIGINT) AS o_sec, value
             |      FROM events),
             |j AS (
             |  SELECT p.p_id, o.value FROM p JOIN o ON p.user_id = o.user_id
             |    AND o.o_sec BETWEEN p.w_start AND p.w_end
             |    AND o.o_id <> p.p_id)
             |SELECT p_id, CAST(count(*) AS BIGINT) AS n_nearby,
             |  round(sum(value), 2) AS sum_value
             |FROM j GROUP BY p_id ORDER BY p_id""".stripMargin))
  )
}
