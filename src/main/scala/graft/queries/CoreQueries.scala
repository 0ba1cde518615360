package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Projection / filter / predicate / scalar-expression surface (SURVEY §2.2).
  *
  * The reference interprets a tree of boxed executors per event
  * (src/core/executor/...); here every expression is a Catalyst `Column`, so
  * the whole row pipeline fuses into one whole-stage-codegen'd loop and the
  * filters/projections push down into the parquet scan — at 100 TB the scan
  * reads only the referenced columns and skips row groups via min/max stats.
  *
  * Determinism conventions: integer outputs cast to BIGINT on both sides,
  * doubles rounded identically, total ORDER BY (see QueryDef).
  */
object CoreQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // WHERE + projection + arithmetic (+ - * / %) — filter_processor.rs:18,
    // math executors src/core/executor/math/*.
    QueryDef(
      "q_filter_project",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        // sorted after the filter, before the arithmetic projection: a
        // trailing orderBy's range-sampling pass re-runs its child once
        // more (guide §2.4); the 1:1 projection preserves content
        li.filter(col("l_quantity") > 45.0 && col("l_discount") >= 0.05)
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            // raw doubles on purpose: per-row IEEE arithmetic is bit-identical
            // across engines, while round() is not (Spark rounds the shortest
            // decimal repr, DuckDB the binary value).
            (col("l_extendedprice") + col("l_tax")).as("add_v"),
            (col("l_extendedprice") - col("l_discount") * 100.0).as("sub_v"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("mul_v"),
            (col("l_extendedprice") / col("l_quantity")).as("div_v"),
            (col("l_orderkey") % 97).as("mod_v"))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  l_extendedprice + l_tax AS add_v,
             |  l_extendedprice - l_discount * 100.0 AS sub_v,
             |  l_extendedprice * (1.0 - l_discount) AS mul_v,
             |  l_extendedprice / l_quantity AS div_v,
             |  l_orderkey % 97 AS mod_v
             |FROM lineitem
             |WHERE l_quantity > 45.0 AND l_discount >= 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // CASE WHEN (searched + simple) and CAST across the reference's scalar
    // types (converter.rs:865-925; cast_function_executor.rs).
    QueryDef(
      "q_expr_case_cast",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        // sorted before the projection (see q_filter_project)
        o.orderBy(col("o_orderkey")).select(
            col("o_orderkey"),
            when(col("o_totalprice") > 300000.0, "high")
              .when(col("o_totalprice") > 100000.0, "mid")
              .otherwise("low").as("price_band"),
            when(col("o_orderstatus") === "F", lit(1L))
              .when(col("o_orderstatus") === "O", lit(2L))
              .otherwise(lit(0L)).as("status_code"),
            col("o_totalprice").cast("long").as("price_long"),
            col("o_custkey").cast("double").as("cust_dbl"),
            col("o_custkey").cast("string").as("cust_str"),
            round(col("o_totalprice").cast("string").cast("double"), 2).as("roundtrip"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice > 300000.0 THEN 'high'
             |       WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'low' END AS price_band,
             |  CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE 0 END AS status_code,
             |  CAST(trunc(o_totalprice) AS BIGINT) AS price_long,
             |  CAST(o_custkey AS DOUBLE) AS cust_dbl,
             |  CAST(o_custkey AS VARCHAR) AS cust_str,
             |  round(CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE), 2) AS roundtrip
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // IN list (converter.rs:977-1010), IS [NOT] NULL, coalesce/ifnull/nullif
    // (null-handling executors). Nulls are manufactured via nullif so the
    // null path is actually exercised.
    QueryDef(
      "q_expr_in_null",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        // sorted after the filter, before the projection (see q_filter_project)
        o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
          .orderBy(col("o_orderkey"))
          .select(
            col("o_orderkey"),
            nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
            nullif(col("o_orderstatus"), lit("O")).isNull.as("is_open"),
            nullif(col("o_orderstatus"), lit("O")).isNotNull.as("is_closed"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_filled"),
            coalesce(nullif(col("o_custkey"), col("o_custkey")), lit(-1L)).as("always_default"))
      },
      Some("""SELECT o_orderkey,
             |  nullif(o_orderstatus, 'O') AS status_or_null,
             |  nullif(o_orderstatus, 'O') IS NULL AS is_open,
             |  nullif(o_orderstatus, 'O') IS NOT NULL AS is_closed,
             |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
             |  coalesce(nullif(o_custkey, o_custkey), -1) AS always_default
             |FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
             |ORDER BY o_orderkey""".stripMargin)),

    // String function surface — string_functions.rs:12-877 registers
    // length/concat/lower/upper/substr/trim/replace/left/right/reverse/
    // repeat/instr/ascii/lpad/rpad; all native Catalyst here.
    QueryDef(
      "q_str_funcs",
      (s, dir) => {
        val p = Tables(s, dir, "part")
        // sorted before the string-function projection (see q_filter_project)
        p.orderBy(col("p_partkey")).select(
            col("p_partkey"),
            length(col("p_name")).cast("long").as("name_len"),
            concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
            lower(col("p_type")).as("type_lower"),
            upper(col("p_brand")).as("brand_upper"),
            substring(col("p_name"), 1, 8).as("name_prefix"),
            trim(lit("  pad  ")).as("trimmed"),
            ltrim(lit("  pad  ")).as("ltrimmed"),
            rtrim(lit("  pad  ")).as("rtrimmed"),
            regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_snake"),
            reverse(col("p_brand")).as("brand_rev"),
            expr("left(p_name, 5)").as("name_left"),
            expr("right(p_name, 5)").as("name_right"),
            repeat(col("p_brand"), 2).as("brand_twice"),
            instr(col("p_type"), "ED").cast("long").as("ed_pos"),
            ascii(col("p_brand")).cast("long").as("first_ascii"),
            lpad(col("p_brand"), 12, "*").as("brand_lpad"),
            rpad(col("p_brand"), 12, "*").as("brand_rpad"))
      },
      Some("""SELECT p_partkey,
             |  length(p_name) AS name_len,
             |  p_brand || '/' || p_type AS brand_type,
             |  lower(p_type) AS type_lower,
             |  upper(p_brand) AS brand_upper,
             |  substring(p_name, 1, 8) AS name_prefix,
             |  trim('  pad  ') AS trimmed,
             |  ltrim('  pad  ') AS ltrimmed,
             |  rtrim('  pad  ') AS rtrimmed,
             |  replace(p_name, ' ', '_') AS name_snake,
             |  reverse(p_brand) AS brand_rev,
             |  left(p_name, 5) AS name_left,
             |  right(p_name, 5) AS name_right,
             |  repeat(p_brand, 2) AS brand_twice,
             |  instr(p_type, 'ED') AS ed_pos,
             |  ascii(p_brand) AS first_ascii,
             |  lpad(p_brand, 12, '*') AS brand_lpad,
             |  rpad(p_brand, 12, '*') AS brand_rpad
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Math function surface — math_functions.rs:22-784. Transcendentals are
    // rounded to 6 dp: Java Math vs C libm may differ in the last ulp.
    QueryDef(
      "q_math_funcs",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        // sorted after the filter, before the math projection (see q_filter_project)
        li.filter(col("l_orderkey") <= 500)
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .select(
            col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            round(sqrt(col("l_extendedprice")), 6).as("sqrt_v"),
            round(col("l_extendedprice"), 0).cast("long").as("round0_v"),
            abs(col("l_discount") - lit(0.05)).as("abs_v"),
            floor(col("l_extendedprice")).cast("long").as("floor_v"),
            ceil(col("l_extendedprice")).cast("long").as("ceil_v"),
            round(exp(col("l_discount")), 6).as("exp_v"),
            round(log(col("l_extendedprice")), 6).as("ln_v"),
            round(log10(col("l_extendedprice")), 6).as("log10_v"),
            round(pow(col("l_quantity"), lit(2.0)), 2).as("pow_v"),
            signum(col("l_discount") - lit(0.05)).cast("long").as("sign_v"),
            round(sin(col("l_discount")), 6).as("sin_v"),
            round(cos(col("l_discount")), 6).as("cos_v"),
            round(tan(col("l_discount")), 6).as("tan_v"),
            round(asin(col("l_discount")), 6).as("asin_v"),
            round(acos(col("l_discount")), 6).as("acos_v"),
            round(atan(col("l_quantity")), 6).as("atan_v"),
            greatest(col("l_quantity"), col("l_discount") * 100.0).as("max_v"),
            least(col("l_quantity"), col("l_discount") * 100.0).as("min_v"),
            (col("l_extendedprice").cast("long") * 100 / 100).cast("double").as("trunc_v"))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |  round(sqrt(l_extendedprice), 6) AS sqrt_v,
             |  CAST(round(l_extendedprice, 0) AS BIGINT) AS round0_v,
             |  abs(l_discount - 0.05) AS abs_v,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_v,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_v,
             |  round(exp(l_discount), 6) AS exp_v,
             |  round(ln(l_extendedprice), 6) AS ln_v,
             |  round(log10(l_extendedprice), 6) AS log10_v,
             |  round(pow(l_quantity, 2.0), 2) AS pow_v,
             |  CAST(sign(l_discount - 0.05) AS BIGINT) AS sign_v,
             |  round(sin(l_discount), 6) AS sin_v,
             |  round(cos(l_discount), 6) AS cos_v,
             |  round(tan(l_discount), 6) AS tan_v,
             |  round(asin(l_discount), 6) AS asin_v,
             |  round(acos(l_discount), 6) AS acos_v,
             |  round(atan(l_quantity), 6) AS atan_v,
             |  greatest(l_quantity, l_discount * 100.0) AS max_v,
             |  least(l_quantity, l_discount * 100.0) AS min_v,
             |  CAST(CAST(trunc(l_extendedprice) AS BIGINT) * 100 / 100 AS DOUBLE) AS trunc_v
             |FROM lineitem WHERE l_orderkey <= 500
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // STRUCT DDL columns (round 14; reference roadmap
    // feat/struct_type/STRUCT_TYPE.md specifies struct() composite
    // returns): build a struct into a STRUCT-typed intermediate stream,
    // filter on a field, project fields back out in a chained query. The
    // oracle routes through a DuckDB STRUCT (struct_pack + field access),
    // not a flattened rewrite.
    QueryDef(
      "q_struct_cols",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Mid (user_id BIGINT,
            |                   s STRUCT<id: BIGINT, k: STRING, vv: DOUBLE>);
            |CREATE STREAM Out (user_id BIGINT, eid BIGINT, k STRING, vv DOUBLE);
            |INSERT INTO Mid SELECT user_id,
            |  named_struct('id', event_id, 'k', event_type,
            |               'vv', round(value * 2, 6)) AS s FROM events;
            |INSERT INTO Out SELECT user_id, s.id AS eid, s.k AS k, s.vv AS vv
            |FROM Mid WHERE s.vv > 150 AND s.k <> 'click';""".stripMargin
        graft.sql.GraftApp.run(s, app,
          Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("user_id"), col("eid"))
      },
      Some("""SELECT user_id, s.id AS eid, s.k AS k, s.vv AS vv FROM (
             |  SELECT user_id, struct_pack(id := event_id, k := event_type,
             |                              vv := round(value * 2, 6)) AS s
             |  FROM events) t
             |WHERE s.vv > 150 AND s.k <> 'click'
             |ORDER BY 1, 2""".stripMargin)),

    // MAP DDL columns (round 15; closes the only spec-only DDL type —
    // STRUCT and ARRAY both carry oracle rows): build a MAP<STRING,DOUBLE>
    // into a MAP-typed intermediate stream with a DATA-DEPENDENT key,
    // element access in projection and WHERE, map_keys cardinality and the
    // sorted key list. The oracle routes through a real DuckDB MAP
    // (map([k…],[v…]); element access returns a LIST there, hence [1]).
    QueryDef(
      "q_map_cols",
      (s, dir) => {
        val app =
          """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            |                      event_type STRING, value DOUBLE, props STRING);
            |CREATE STREAM Mid (event_id BIGINT, user_id BIGINT,
            |                   kv MAP<STRING, DOUBLE>);
            |CREATE STREAM Out (event_id BIGINT, user_id BIGINT, got DOUBLE,
            |                   uid2 DOUBLE, nk BIGINT, ks STRING);
            |INSERT INTO Mid SELECT event_id, user_id,
            |  map(event_type, round(value, 6),
            |      'uid', CAST(user_id AS DOUBLE)) AS kv FROM events;
            |INSERT INTO Out SELECT event_id, user_id,
            |  kv['click'] AS got, kv['uid'] AS uid2,
            |  CAST(size(map_keys(kv)) AS BIGINT) AS nk,
            |  array_join(array_sort(map_keys(kv)), ',') AS ks
            |FROM Mid WHERE kv['click'] IS NOT NULL AND kv['click'] > 120;""".stripMargin
        graft.sql.GraftApp.run(s, app,
          Map("events" -> Tables(s, dir, "events")))("Out")
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  kv['click'][1] AS got, kv['uid'][1] AS uid2,
             |  CAST(cardinality(kv) AS BIGINT) AS nk,
             |  array_to_string(list_sort(map_keys(kv)), ',') AS ks
             |FROM (
             |  SELECT event_id, user_id,
             |    map([event_type, 'uid'],
             |        [CAST(round(value, 6) AS DOUBLE),
             |         CAST(user_id AS DOUBLE)]) AS kv
             |  FROM events) t
             |WHERE kv['click'][1] IS NOT NULL AND kv['click'][1] > 120
             |ORDER BY event_id""".stripMargin)),

    // Date/time surface — date_functions.rs:14-92: formatDate→date_format,
    // parseDate→to_timestamp, dateAdd→+INTERVAL; extraction for good measure.
    QueryDef(
      "q_date_funcs",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        // sorted before the date-format projection (see q_filter_project)
        o.orderBy(col("o_orderkey")).select(
            col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt_date"),
            date_format(col("o_orderdate"), "yyyy/MM").as("fmt_ym"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("d"),
            quarter(col("o_orderdate")).cast("long").as("q"),
            date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").as("plus30"),
            date_format(to_timestamp(concat(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit(" 12:00:00")),
              "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss").as("parsed_noon"),
            datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).cast("long").as("days_to_2002"))
      },
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS fmt_date,
             |  strftime(o_orderdate, '%Y/%m') AS fmt_ym,
             |  year(o_orderdate) AS y,
             |  month(o_orderdate) AS m,
             |  day(o_orderdate) AS d,
             |  quarter(o_orderdate) AS q,
             |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
             |  strftime(strptime(strftime(o_orderdate, '%Y-%m-%d') || ' 12:00:00',
             |    '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_noon,
             |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // LIKE / NOT LIKE (like executor in string_functions.rs) + regexp match
    // (free on Spark; reference roadmap).
    QueryDef(
      "q_expr_like",
      (s, dir) => {
        val p = Tables(s, dir, "part")
        // sorted before the pattern projection (see q_filter_project)
        p.orderBy(col("p_partkey")).select(
            col("p_partkey"),
            col("p_type").like("%BRUSHED%").as("is_brushed"),
            col("p_type").like("STANDARD%").as("is_standard"),
            (!col("p_name").like("%a%")).as("no_a"),
            col("p_type").rlike("STEEL$").as("ends_steel"))
      },
      Some("""SELECT p_partkey,
             |  p_type LIKE '%BRUSHED%' AS is_brushed,
             |  p_type LIKE 'STANDARD%' AS is_standard,
             |  p_name NOT LIKE '%a%' AS no_a,
             |  regexp_matches(p_type, 'STEEL$') AS ends_steel
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Reference-spelled builtins through the registered RefFns surface
    // (builtin_wrapper.rs:645-): maximum/minimum/default/convert/truncate/
    // formatDate/parseDate/dateAdd/eventTimestamp/instanceOfX all resolve
    // to native Catalyst compositions — this query runs them against the
    // DuckDB-ANSI equivalents.
    QueryDef(
      "q_ref_scalar_fns",
      (s, dir) => {
        graft.functions.RefFns.register(s)
        // dateAdd shadows a Spark builtin — analysis must happen inside the
        // scoped override (DataFrame analysis is eager, so the returned
        // frame keeps the reference semantics after the scope closes)
        graft.functions.RefFns.withShadowing(s) {
        Tables(s, dir, "orders")
          .where("o_orderkey <= 2000")
          // sorted before the RefFns projection (see q_filter_project)
          .orderBy(col("o_orderkey"))
          .selectExpr(
            "o_orderkey",
            "maximum(o_totalprice, 150000.0D) AS max_v",
            "minimum(o_totalprice, 150000.0D) AS min_v",
            "default(CAST(NULL AS DOUBLE), o_totalprice) AS def_v",
            "convert(o_orderkey, 'string') AS conv_s",
            "truncate(o_totalprice, 1) AS trunc1_v",
            "formatDate(eventTimestamp(CAST(o_orderdate AS TIMESTAMP)), '%Y-%m') AS fmt_ym",
            "dateAdd(eventTimestamp(CAST(o_orderdate AS TIMESTAMP)), 2, 'days') AS plus2_ms",
            "parseDate(concat(formatDate(eventTimestamp(CAST(o_orderdate AS TIMESTAMP)), " +
              "'%Y-%m-%d'), ' 06:30:00'), '%Y-%m-%d %H:%M:%S') AS halfpast_ms",
            "instanceOfDouble(o_totalprice) AS is_dbl",
            "instanceOfString(o_orderstatus) AS is_str")
        }
      },
      Some("""SELECT o_orderkey,
             |  greatest(o_totalprice, 150000.0) AS max_v,
             |  least(o_totalprice, 150000.0) AS min_v,
             |  coalesce(CAST(NULL AS DOUBLE), o_totalprice) AS def_v,
             |  CAST(o_orderkey AS VARCHAR) AS conv_s,
             |  trunc(o_totalprice * 10.0) / 10.0 AS trunc1_v,
             |  strftime(o_orderdate, '%Y-%m') AS fmt_ym,
             |  epoch_ms(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 2 DAY) AS plus2_ms,
             |  epoch_ms(strptime(strftime(o_orderdate, '%Y-%m-%d') || ' 06:30:00',
             |    '%Y-%m-%d %H:%M:%S')) AS halfpast_ms,
             |  TRUE AS is_dbl,
             |  TRUE AS is_str
             |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin))
  )
}
