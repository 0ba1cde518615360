package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sorts / limits / top-k (SURVEY §2.6), set operations (§2.7), DISTINCT and
  * analytic (rank/lag/lead) functions.
  *
  * Scale notes: a global ORDER BY + LIMIT k compiles to TakeOrderedAndProject
  * (per-partition top-k then a k-row driver merge — no full sort at 100 TB);
  * per-key top-k uses a rank over a hash-partitioned window (one shuffle on
  * the partition key). UNION ALL is a zero-shuffle concatenation; INTERSECT/
  * EXCEPT are distinct-ized joins the reference lacks entirely
  * (GRAMMAR.md:328-338).
  */
object MiscQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // Global top-k — ORDER BY + LIMIT with a total tie-break.
    QueryDef(
      "q_topk",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.select(
            col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            round(col("l_extendedprice"), 2).as("price"))
          .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(20)
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  round(l_extendedprice, 2) AS price
             |FROM lineitem
             |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin)),

    // LIMIT + OFFSET (select_processor.rs:396-419 apply_limit_offset).
    QueryDef(
      "q_limit_offset",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        o.select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
          .orderBy(col("price").desc, col("o_orderkey"))
          .offset(5).limit(10)
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price
             |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10 OFFSET 5""".stripMargin)),

    // UNION ALL fan-in — the reference's implicit multi-INSERT junction
    // semantics (stream_junction.rs:40-58).
    QueryDef(
      "q_union_all",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val hi = o.filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"), lit("high").as("src"))
        val lo = o.filter(col("o_totalprice") < 5000.0)
          .select(col("o_orderkey"), lit("low").as("src"))
        hi.union(lo).orderBy(col("o_orderkey"), col("src"))
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, 'high' AS src FROM orders WHERE o_totalprice > 450000.0
             |  UNION ALL
             |  SELECT o_orderkey, 'low' AS src FROM orders WHERE o_totalprice < 5000.0)
             |ORDER BY o_orderkey, src""".stripMargin)),

    // INTERSECT / EXCEPT (distinct semantics on both engines).
    QueryDef(
      "q_intersect_except",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
        val both = y95.intersect(y96).withColumn("tag", lit("both"))
        val only95 = y95.except(y96).withColumn("tag", lit("only95"))
        both.union(only95).orderBy(col("o_custkey"), col("tag"))
      },
      Some("""SELECT * FROM (
             |  SELECT o_custkey, 'both' AS tag FROM
             |    (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |     INTERSECT
             |     SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
             |  UNION ALL
             |  SELECT o_custkey, 'only95' AS tag FROM
             |    (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |     EXCEPT
             |     SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996))
             |ORDER BY o_custkey, tag""".stripMargin)),

    // SELECT DISTINCT.
    QueryDef(
      "q_distinct",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.select(col("l_returnflag"), col("l_linestatus")).distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Distribution analytics: ntile/percent_rank/cume_dist over a key.
    QueryDef(
      "q_rank_dist",
      (s, dir) => {
        val o = Tables(s, dir, "orders").filter(col("o_custkey") <= 100)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        o.select(
            col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  ntile(4) OVER w AS quartile,
             |  round(percent_rank() OVER w, 6) AS pr,
             |  round(cume_dist() OVER w, 6) AS cd
             |FROM orders WHERE o_custkey <= 100
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Analytic functions: per-key rank/row_number/lag/lead — the batch
    // counterpart of the reference's sort window (§2.5) and the kernel for
    // per-key top-k at scale (single shuffle on the partition key).
    QueryDef(
      "q_rank_lag",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem").filter(col("l_suppkey") <= 20)
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        li.select(
            col("l_suppkey"),
            col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            round(col("l_extendedprice"), 2).as("price"),
            row_number().over(w).cast("long").as("rn"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            round(lag(col("l_extendedprice"), 1).over(w), 2).as("prev_price"),
            round(lead(col("l_extendedprice"), 1).over(w), 2).as("next_price"))
          .filter(col("rn") <= 5)
          .orderBy(col("l_suppkey"), col("rn"))
      },
      Some("""SELECT * FROM (
             |  SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |    round(l_extendedprice, 2) AS price,
             |    row_number() OVER w AS rn,
             |    rank() OVER w AS rnk,
             |    dense_rank() OVER w AS drnk,
             |    round(lag(l_extendedprice, 1) OVER w, 2) AS prev_price,
             |    round(lead(l_extendedprice, 1) OVER w, 2) AS next_price
             |  FROM lineitem WHERE l_suppkey <= 20
             |  WINDOW w AS (PARTITION BY l_suppkey
             |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))
             |WHERE rn <= 5 ORDER BY l_suppkey, rn""".stripMargin)),

    // Z-order (Morton) layout key (Layout.zValue): events bucketed onto an
    // 8-bit × 8-bit (user, value) grid, bit-interleaved, grouped into
    // 64-key blocks (≈ files of a z-ordered write). The per-block min/max
    // spans demonstrate the property the layout exists for: every block's
    // bounding box is tight on BOTH dimensions, so a reader's two-sided
    // predicate prunes from footer stats alone. All-integer arithmetic;
    // DuckDB replays the interleave bit-for-bit.
    QueryDef(
      "q_layout_zorder",
      (s, dir) => {
        import graft.operators.Layout
        val e = Tables(s, dir, "events")
          .select(col("user_id"), expr("CAST(round(value * 100) AS LONG)").as("vi"))
        val bounds = e.agg((max(col("user_id")) + 1).as("ub_max"),
          (max(col("vi")) + 1).as("vi_max"))
        val b = e.crossJoin(broadcast(bounds))
          .select(Layout.scaleBucket(col("user_id"), col("ub_max"), 8).as("ub"),
            Layout.scaleBucket(col("vi"), col("vi_max"), 8).as("vb"))
        b.withColumn("zkey", Layout.zValue(Seq(col("ub"), col("vb")), 8))
          .groupBy(shiftright(col("zkey"), 6).as("block"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("ub")).as("u_min"), max(col("ub")).as("u_max"),
            min(col("vb")).as("v_min"), max(col("vb")).as("v_max"))
          .orderBy(col("block"))
      },
      Some {
        val terms = (0 until 8).flatMap(i => Seq(
          s"(((ub >> $i) & 1) << ${2 * i})",
          s"(((vb >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
        s"""WITH e AS (
           |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vi FROM events),
           |m AS (SELECT max(user_id) + 1 AS ubm, max(vi) + 1 AS vim FROM e),
           |b AS (SELECT (user_id * 256) // ubm AS ub, (vi * 256) // vim AS vb
           |      FROM e, m),
           |z AS (SELECT ub, vb, $terms AS zkey FROM b)
           |SELECT zkey // 64 AS block, count(*) AS n_rows,
           |  min(ub) AS u_min, max(ub) AS u_max,
           |  min(vb) AS v_min, max(vb) AS v_max
           |FROM z GROUP BY 1 ORDER BY block""".stripMargin
      }),

    // Hilbert-curve layout key (Layout.withHilbert) over the same 8-bit
    // grid: consecutive indices are always grid neighbors, so unaligned
    // curve ranges bound tighter than Morton's (LayoutScdSpec quantifies).
    // The oracle replays the per-bit reflect/swap walk as a recursive CTE —
    // 8 integer steps per row, bit-exact.
    QueryDef(
      "q_layout_hilbert",
      (s, dir) => {
        import graft.operators.Layout
        val e = Tables(s, dir, "events")
          .select(col("user_id"), expr("CAST(round(value * 100) AS LONG)").as("vi"))
        val bounds = e.agg((max(col("user_id")) + 1).as("ub_max"),
          (max(col("vi")) + 1).as("vi_max"))
        val b = e.crossJoin(broadcast(bounds))
          .select(Layout.scaleBucket(col("user_id"), col("ub_max"), 8).as("ub"),
            Layout.scaleBucket(col("vi"), col("vi_max"), 8).as("vb"))
        Layout.withHilbert(b, col("ub"), col("vb"), 8, "hkey")
          .groupBy(shiftright(col("hkey"), 6).as("block"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("ub")).as("u_min"), max(col("ub")).as("u_max"),
            min(col("vb")).as("v_min"), max(col("vb")).as("v_max"))
          .orderBy(col("block"))
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vi FROM events),
             |m AS (SELECT max(user_id) + 1 AS ubm, max(vi) + 1 AS vim FROM e),
             |b AS (SELECT (user_id * 256) // ubm AS ub, (vi * 256) // vim AS vb
             |      FROM e, m),
             |w AS (
             |  SELECT ub, vb, ub AS x, vb AS y, CAST(0 AS BIGINT) AS d, 7 AS k
             |  FROM b
             |  UNION ALL
             |  SELECT ub, vb,
             |    CASE WHEN ((y >> k) & 1) = 0 THEN
             |      (CASE WHEN ((x >> k) & 1) = 1 THEN 255 - y ELSE y END)
             |    ELSE x END,
             |    CASE WHEN ((y >> k) & 1) = 0 THEN
             |      (CASE WHEN ((x >> k) & 1) = 1 THEN 255 - x ELSE x END)
             |    ELSE y END,
             |    d + (CAST(1 AS BIGINT) << (2 * k))
             |      * xor(3 * ((x >> k) & 1), (y >> k) & 1),
             |    k - 1
             |  FROM w WHERE k >= 0)
             |SELECT d // 64 AS block, count(*) AS n_rows,
             |  min(ub) AS u_min, max(ub) AS u_max,
             |  min(vb) AS v_min, max(vb) AS v_max
             |FROM w WHERE k = -1
             |GROUP BY 1 ORDER BY block""".stripMargin)),

    // CREATE FUNCTION expression UDFs (round 16, §2.11's last row): the
    // declarative analogue of the reference's script-UDF stub
    // (script_function_executor.rs:12) — bodies are Catalyst scalar
    // expressions substituted at compile, so the plan stays codegen'd;
    // the oracle inlines the same expressions by hand.
    QueryDef(
      "q_udf_expr",
      (s, dir) => {
        val app =
          """CREATE FUNCTION net(v) AS 'v * 0.9';
            |CREATE FUNCTION band(v) AS
            |  'CASE WHEN v >= 7.5 THEN ''high'' WHEN v >= 2.5 THEN ''mid'' ELSE ''low'' END';
            |CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Out (etype STRING, n BIGINT, tot DOUBLE, b STRING);
            |INSERT INTO Out SELECT event_type AS etype, count(*) AS n,
            |  round(sum(net(value)), 6) AS tot, band(avg(value)) AS b
            |FROM events WHERE net(value) > 0.5
            |GROUP BY event_type ORDER BY etype;""".stripMargin
        graft.sql.GraftApp.run(s, app,
          Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("etype"))
      },
      Some("""SELECT event_type AS etype, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(value * 0.9), 6) AS tot,
             |  CASE WHEN avg(value) >= 7.5 THEN 'high'
             |       WHEN avg(value) >= 2.5 THEN 'mid' ELSE 'low' END AS b
             |FROM events WHERE value * 0.9 > 0.5
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
