package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Group-by aggregation surface of the reference (SURVEY §2.4):
  * sum/avg/count/distinctCount/min/max/stdDev/first/last, GROUP BY composite
  * keys, HAVING post-filter.
  *
  * Reference: src/core/query/selector/attribute/aggregator/mod.rs (incremental
  * add/remove executors); group-by key at
  * src/core/query/selector/group_by_key_generator.rs:9-38. On Spark the same
  * semantics are a declarative groupBy().agg() — Catalyst plans partial+final
  * aggregation (map-side combine) so the shuffle moves pre-aggregated state,
  * which is what keeps this correct AND cheap at 100 TB: shuffle volume is
  * O(groups), not O(rows).
  */
object AggQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // TPC-H Q1-style pricing summary: the flagship scan+agg. At scale the
    // only shuffle is on the 6-group key after partial aggregation.
    QueryDef(
      "q1_agg",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-01"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Exact distinctCount (reference keeps a refcounted HashMap —
    // aggregator/mod.rs:1117-1395; we stay exact, not HLL).
    QueryDef(
      "q_agg_distinct",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("nd_part"),
            countDistinct(col("l_suppkey")).as("nd_supp"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS nd_part,
             |  count(DISTINCT l_suppkey) AS nd_supp,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // min/max (reference keeps a sorted multiset for window retraction —
    // aggregator/mod.rs:1396-1535; batch groupBy needs no such state) plus
    // minForever/maxForever semantics (= plain min/max over all input).
    QueryDef(
      "q_agg_minmax",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        o.groupBy(col("o_orderpriority"))
          .agg(
            round(min(col("o_totalprice")), 2).as("min_price"),
            round(max(col("o_totalprice")), 2).as("max_price"),
            date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_date"),
            date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_date"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |  round(min(o_totalprice), 2) AS min_price,
             |  round(max(o_totalprice), 2) AS max_price,
             |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
             |  strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // stdDev — reference is Welford mean/M2 population stddev
    // (aggregator/mod.rs:1536-1659) → stddev_pop; stddev_samp for coverage.
    QueryDef(
      "q_agg_stddev",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        e.groupBy(col("event_type"))
          .agg(
            round(stddev_pop(col("value")), 4).as("sd_pop"),
            round(stddev_samp(col("value")), 4).as("sd_samp"),
            round(var_pop(col("value")), 4).as("v_pop"),
            round(avg(col("value")), 4).as("mean_v"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  round(stddev_pop(value), 4) AS sd_pop,
             |  round(stddev_samp(value), 4) AS sd_samp,
             |  round(var_pop(value), 4) AS v_pop,
             |  round(avg(value), 4) AS mean_v,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // first/last — order-sensitive in the reference (arrival order,
    // aggregator/mod.rs:1660-1884). Deterministic Spark equivalent: value at
    // min/max event-time via min_by/max_by (same functions exist in DuckDB).
    QueryDef(
      "q_agg_first_last",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        e.groupBy(col("user_id"))
          .agg(
            min_by(col("event_type"), col("event_id")).as("first_type"),
            max_by(col("event_type"), col("event_id")).as("last_type"),
            round(min_by(col("value"), col("event_id")), 2).as("first_value"),
            round(max_by(col("value"), col("event_id")), 2).as("last_value"),
            count(lit(1)).as("n"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  min_by(event_type, event_id) AS first_type,
             |  max_by(event_type, event_id) AS last_type,
             |  round(min_by(value, event_id), 2) AS first_value,
             |  round(max_by(value, event_id), 2) AS last_value,
             |  count(*) AS n
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // HAVING = per-group post-filter (select_processor.rs:330,478-489);
    // Catalyst plans it as Filter above Aggregate — no extra pass.
    QueryDef(
      "q_agg_having",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.groupBy(col("l_suppkey"))
          .agg(
            round(sum(col("l_quantity")), 2).as("total_qty"),
            count(lit(1)).as("n"))
          .filter(col("total_qty") > 100.0)
          .orderBy(col("l_suppkey"))
      },
      Some("""SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty, count(*) AS n
             |FROM lineitem GROUP BY l_suppkey
             |HAVING round(sum(l_quantity), 2) > 100.0 ORDER BY l_suppkey""".stripMargin)),

    // ROLLUP grouping sets — explicitly rejected by the reference
    // (converter.rs:314-321); free under Catalyst. Subtotal rows surface
    // NULL keys → coalesced to a sentinel for stable cross-engine compare.
    QueryDef(
      "q_agg_rollup",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("sum_qty"), col("n"))
          .orderBy(col("rf"), col("ls"))
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // Median / percentiles — exact median both engines (linear interp on
    // even counts), quantized to dodge interpolation ulps.
    QueryDef(
      "q_agg_median",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        e.groupBy(col("event_type"))
          .agg(
            round(median(col("value")), 4).as("med"),
            round(min(col("value")), 4).as("lo"),
            round(max(col("value")), 4).as("hi"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  round(median(value), 4) AS med,
             |  round(min(value), 4) AS lo,
             |  round(max(value), 4) AS hi
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Multi-key GROUP BY — reference builds a composite string key per event
    // (group_by_key_generator.rs:9-38); Spark hashes native key columns, no
    // string materialization.
    QueryDef(
      "q_agg_multikey",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        o.groupBy(col("o_orderstatus"), col("o_orderpriority"), year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            round(sum(col("o_totalprice")), 2).as("sum_total"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"), col("o_orderpriority"), col("o_year"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS o_year,
             |  round(sum(o_totalprice), 2) AS sum_total, count(*) AS n
             |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))
  )
}
