package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftApp
import graft.streaming._
import graft.streaming.WindowKernels.EmptyBuffer

/** Golden tests ported from the reference's compatibility corpus
  * (/root/reference/tests/compatibility/ — the de-facto operator-semantics
  * spec per SURVEY §5): same app SQL text, same positional inputs, same
  * expected outputs. Each test cites the reference case it ports. Our
  * harness runs the app through GraftApp (batch = result after all sends)
  * or the streaming kernels/CEP NFA where the case exercises window/pattern
  * event protocols.
  */
class CompatSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // -- filters.rs:filter_test1_basic_greater_than (FilterTestCase1.java:filterTest1)
  test("compat filter_test1: literal > attribute keeps only MSFT") {
    val app =
      """CREATE STREAM cseEventStream (symbol STRING, price FLOAT, volume BIGINT);
        |CREATE STREAM outputStream (symbol STRING, price FLOAT);
        |INSERT INTO outputStream
        |SELECT symbol, price FROM cseEventStream WHERE 70.0 > price;""".stripMargin
    val in = Seq(("IBM", 700.0f, 100L), ("MSFT", 60.5f, 200L))
      .toDF("symbol", "price", "volume")
    val out = GraftApp.run(spark, app, Map("cseEventStream" -> in))("outputStream")
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "MSFT")
    assert(rows(0).getFloat(1) == 60.5f)
  }

  // -- filters.rs:filter_test8_string_equality
  test("compat filter_test8: string equality") {
    val app =
      """CREATE STREAM cseEventStream (symbol STRING, price FLOAT, volume BIGINT);
        |CREATE STREAM outputStream (symbol STRING, price FLOAT);
        |INSERT INTO outputStream
        |SELECT symbol, price FROM cseEventStream WHERE symbol = 'IBM';""".stripMargin
    val in = Seq(("IBM", 700.0f, 100L), ("MSFT", 60.5f, 200L), ("IBM", 710.0f, 300L))
      .toDF("symbol", "price", "volume")
    val out = GraftApp.run(spark, app, Map("cseEventStream" -> in))("outputStream")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("IBM", "IBM"))
  }

  // -- filters.rs:filter_test10_and_operator
  test("compat filter_test10: AND of two predicates") {
    val app =
      """CREATE STREAM cseEventStream (symbol STRING, price FLOAT, volume BIGINT);
        |CREATE STREAM outputStream (symbol STRING);
        |INSERT INTO outputStream
        |SELECT symbol FROM cseEventStream WHERE price > 100.0 AND volume < 250;""".stripMargin
    val in = Seq(("A", 150.0f, 100L), ("B", 50.0f, 100L), ("C", 150.0f, 300L))
      .toDF("symbol", "price", "volume")
    val out = GraftApp.run(spark, app, Map("cseEventStream" -> in))("outputStream")
    assert(out.as[String].collect().toSeq == Seq("A"))
  }

  // -- windows.rs:length_window_test1_fewer_events_than_window
  //    (LengthWindowTestCase.java:lengthWindowTest1)
  test("compat lengthWindowTest1: fewer events than window pass through in order") {
    val events = Seq(
      WinEvent("k", 1L, 0L, 700.0),  // IBM
      WinEvent("k", 2L, 1L, 60.5))   // MSFT
    val (out, _) = WindowKernels.length(events, EmptyBuffer, n = 4)
    assert(out.length == 2)                       // two Current events, no eviction
    assert(out.forall(_.op == 1))
    assert(out.map(_.value) == Seq(700.0, 60.5))  // arrival order preserved
  }

  // -- windows.rs:length_window_test2_more_events_than_window
  test("compat lengthWindowTest2: six events through a length-4 window") {
    val events = (1 to 6).map(i => WinEvent("k", i.toLong, i.toLong, 700.0))
    val (out, buf) = WindowKernels.length(events, EmptyBuffer, n = 4)
    assert(out.count(_.op == 1) == 6)   // every event emitted as Current
    assert(out.count(_.op == -1) == 2)  // two oldest evicted as Expired
    assert(buf.events.map(_.eventId) == Seq(3L, 4L, 5L, 6L))
  }

  // -- windows.rs:length_window_test4_aggregation_functions: the
  //    incremental max/min over the window content after each arrival
  test("compat lengthWindowTest4: window-state aggregation after each event") {
    val events = Seq(WinEvent("k", 1L, 1L, 100.0), WinEvent("k", 2L, 2L, 200.0))
    val (out, buf) = WindowKernels.length(events, EmptyBuffer, n = 4)
    val windowContent = buf.events.map(_.value)
    assert(windowContent.max == 200.0) // maxp
    assert(windowContent.min == 100.0) // minp
    assert(out.map(o => o.value * o.op).sum == 300.0) // sum via changelog
  }

  // -- aggregations.rs:group_by_test2_having (via the SQL surface)
  test("compat group_by_test2: HAVING filters groups") {
    val app =
      """CREATE STREAM S (symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol STRING, total DOUBLE);
        |INSERT INTO Out SELECT symbol, sum(price) AS total FROM S
        |GROUP BY symbol HAVING sum(price) > 150.0 ORDER BY symbol;""".stripMargin
    val in = Seq(("IBM", 100.0), ("IBM", 100.0), ("MSFT", 60.0))
      .toDF("symbol", "price")
    val out = GraftApp.run(spark, app, Map("S" -> in))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("IBM", 200.0)))
  }

  // -- where_vs_having_test.rs:test_where_before_having_after_aggregation:
  //    WHERE filters rows BEFORE aggregation, HAVING filters groups AFTER,
  //    and HAVING's COUNT sees only WHERE-surviving rows (A: 3 of 4 pass
  //    WHERE → kept; B: 2 of 4 → dropped by HAVING; C: 5 of 5 → kept)
  test("compat where_vs_having: WHERE pre-aggregation, HAVING post, counts reflect WHERE") {
    val app =
      """CREATE STREAM Products (category STRING, price INT);
        |CREATE STREAM Output (category STRING, cnt BIGINT);
        |INSERT INTO Output SELECT category, count(*) AS cnt FROM Products
        |WHERE price > 100 GROUP BY category HAVING count(*) > 2 ORDER BY category;""".stripMargin
    val in = Seq(
      ("A", 50), ("A", 150), ("A", 200), ("A", 120),
      ("B", 80), ("B", 90), ("B", 110), ("B", 130),
      ("C", 150), ("C", 160), ("C", 170), ("C", 180), ("C", 190))
      .toDF("category", "price")
    val out = GraftApp.run(spark, app, Map("Products" -> in))("Output")
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("A", 3L), ("C", 5L)))
  }

  // -- app_runner_case_expression.rs:test_case_null_semantics: a simple
  //    CASE compares with SQL equality, so WHEN NULL never matches (NULL =
  //    NULL is NULL) — a NULL operand falls to ELSE
  test("compat case_null_semantics: simple CASE WHEN NULL falls to ELSE") {
    val app =
      """CREATE STREAM In (symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol STRING, result STRING);
        |INSERT INTO Out SELECT symbol,
        |  CASE price WHEN NULL THEN 'NULL_MATCH' WHEN 100.0 THEN 'HUNDRED'
        |  ELSE 'OTHER' END AS result FROM In ORDER BY symbol;""".stripMargin
    val in = Seq(("AAPL", None), ("GOOGL", Some(100.0)), ("MSFT", Some(50.0)))
      .toDF("symbol", "price")
    val out = GraftApp.run(spark, app, Map("In" -> in))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("AAPL", "OTHER"), ("GOOGL", "HUNDRED"), ("MSFT", "OTHER")))
  }

  // -- windows.rs:length_window_test4_aggregation_functions via the SQL
  //    surface: WINDOW('length', 4) + aggregates → per-event window state
  test("compat lengthWindowTest4 via SQL: per-event aggregates over WINDOW('length', 4)") {
    val app =
      """CREATE STREAM cseEventStream (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM outputStream (maxp DOUBLE, minp DOUBLE, sump DOUBLE);
        |INSERT INTO outputStream
        |SELECT max(price) AS maxp, min(price) AS minp, sum(price) AS sump
        |FROM cseEventStream WINDOW('length', 4);""".stripMargin
    val in = Seq(("2024-01-01 00:00:01", "IBM", 100.0), ("2024-01-01 00:00:02", "IBM", 200.0))
      .toDF("ts_s", "symbol", "price")
      .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "symbol", "price")
    val out = GraftApp.run(spark, app, Map("cseEventStream" -> in))("outputStream")
    val rows = out.orderBy("sump").collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // per-arrival emissions: after IBM@100 → (100,100,100); after IBM@200 → (200,100,300)
    assert(rows.toSeq == Seq((100.0, 100.0, 100.0), (200.0, 100.0, 300.0)))
  }

  // -- tables.rs:table_test1_insert_and_query: stream fills a table, a
  //    query stream joins against it — the full table lifecycle in SQL
  test("compat table_test1: insert into table then stream-table join") {
    val app =
      """CREATE TABLE stockTable (symbol STRING, price DOUBLE, volume INT);
        |CREATE STREAM stockStream (symbol STRING, price DOUBLE, volume INT);
        |CREATE STREAM queryStream (qsym STRING);
        |CREATE STREAM outputStream (symbol STRING, price DOUBLE, volume INT);
        |INSERT INTO stockTable SELECT symbol, price, volume FROM stockStream;
        |INSERT INTO outputStream
        |SELECT stockTable.symbol AS symbol, stockTable.price AS price, stockTable.volume AS volume
        |FROM queryStream JOIN stockTable ON queryStream.qsym = stockTable.symbol;""".stripMargin
    val stocks = Seq(("IBM", 75.6, 100), ("MSFT", 55.6, 50)).toDF("symbol", "price", "volume")
    val lookups = Seq("IBM").toDF("qsym")
    val out = GraftApp.run(spark, app,
      Map("stockStream" -> stocks, "queryStream" -> lookups))("outputStream")
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSeq ==
      Seq(("IBM", 75.6, 100)))
  }

  // -- aggregations.rs:aggregation_test_min_max
  test("compat aggregation_test_min_max") {
    val app =
      """CREATE STREAM S (symbol STRING, price DOUBLE);
        |CREATE STREAM Out (minp DOUBLE, maxp DOUBLE);
        |INSERT INTO Out SELECT min(price) AS minp, max(price) AS maxp FROM S;""".stripMargin
    val in = Seq(("A", 55.6), ("B", 70.6), ("C", 23.5)).toDF("symbol", "price")
    val out = GraftApp.run(spark, app, Map("S" -> in))("Out")
    assert(out.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq ==
      Seq((23.5, 70.6)))
  }

  // -- aggregations.rs:order_by_limit_test1
  test("compat order_by_limit_test1: top-2 by price desc") {
    val app =
      """CREATE STREAM S (symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol STRING, price DOUBLE);
        |INSERT INTO Out SELECT symbol, price FROM S ORDER BY price DESC LIMIT 2;""".stripMargin
    val in = Seq(("A", 10.0), ("B", 30.0), ("C", 20.0), ("D", 5.0)).toDF("symbol", "price")
    val out = GraftApp.run(spark, app, Map("S" -> in))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("B", 30.0), ("C", 20.0)))
  }

  // -- patterns.rs:pattern_test1_simple_followedby, through the FULL SQL
  //    surface (FROM PATTERN clause → NFA lowering)
  test("compat pattern_test1 via SQL: FROM PATTERN (e1=Stream1 -> e2=Stream2)") {
    val app =
      """CREATE STREAM Stream1 (ts TIMESTAMP, symbol STRING, price FLOAT, volume INT);
        |CREATE STREAM Stream2 (ts TIMESTAMP, symbol STRING, price FLOAT, volume INT);
        |CREATE STREAM OutputStream (symbol1 STRING, symbol2 STRING);
        |INSERT INTO OutputStream
        |SELECT e1.symbol AS symbol1, e2.symbol AS symbol2
        |FROM PATTERN (e1=Stream1 -> e2=Stream2);""".stripMargin
    val s1 = Seq(("2024-01-01 00:00:01", "MSFT", 55.6f, 100)).toDF("ts_s", "symbol", "price", "volume")
      .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "symbol", "price", "volume")
    val s2 = Seq(("2024-01-01 00:00:02", "IBM", 55.7f, 100)).toDF("ts_s", "symbol", "price", "volume")
      .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "symbol", "price", "volume")
    val out = GraftApp.run(spark, app, Map("Stream1" -> s1, "Stream2" -> s2))("OutputStream")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("MSFT", "IBM")))
  }

  // -- patterns.rs:pattern_test2_with_filter via SQL: step predicate gates
  test("compat pattern_test2 via SQL: step filter [price > 20.0]") {
    val app =
      """CREATE STREAM Stream1 (ts TIMESTAMP, symbol STRING, price FLOAT);
        |CREATE STREAM Stream2 (ts TIMESTAMP, symbol STRING, price FLOAT);
        |CREATE STREAM OutputStream (symbol1 STRING, symbol2 STRING);
        |INSERT INTO OutputStream
        |SELECT e1.symbol AS symbol1, e2.symbol AS symbol2
        |FROM PATTERN (e1=Stream1[price > 20.0] -> e2=Stream2) WITHIN 60 SECONDS;""".stripMargin
    def mk(ts: String, sym: String, p: Float) =
      Seq((ts, sym, p)).toDF("ts_s", "symbol", "price")
        .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "symbol", "price")
    // matching: price 55.6 > 20
    val hit = GraftApp.run(spark, app, Map(
      "Stream1" -> mk("2024-01-01 00:00:01", "MSFT", 55.6f),
      "Stream2" -> mk("2024-01-01 00:00:02", "IBM", 55.7f)))("OutputStream")
    assert(hit.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("MSFT", "IBM")))
    // below-filter first event → no match
    val miss = GraftApp.run(spark, app, Map(
      "Stream1" -> mk("2024-01-01 00:00:01", "MSFT", 10.0f),
      "Stream2" -> mk("2024-01-01 00:00:02", "IBM", 55.7f)))("OutputStream")
    assert(miss.count() == 0)
    // WITHIN exceeded → no match
    val late = GraftApp.run(spark, app, Map(
      "Stream1" -> mk("2024-01-01 00:00:01", "MSFT", 55.6f),
      "Stream2" -> mk("2024-01-01 00:05:00", "IBM", 55.7f)))("OutputStream")
    assert(late.count() == 0)
  }

  private def tsDf(rows: Seq[(Int, Int)]): org.apache.spark.sql.DataFrame =
    rows.toDF("sec", "val")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val")

  // -- patterns.rs:logical_pattern_test2_or (LogicalPatternTestCase:testQuery1)
  test("compat logical_pattern_test2_or via SQL: e1=A OR e2=B") {
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM B (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (aval INT);
        |INSERT INTO Out SELECT e1.val AS aval FROM PATTERN (e1=A OR e2=B);""".stripMargin
    val out = GraftApp.run(spark, app,
      Map("A" -> tsDf(Seq((1, 1))), "B" -> tsDf(Nil)))("Out")
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  // -- patterns.rs:logical_pattern_test4_or_first_match — the unmatched
  //    alternative's columns are NULL, resolved with coalesce
  test("compat logical_pattern_test4: OR first match wins via coalesce") {
    val app =
      """CREATE STREAM Stream1 (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Stream2 (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol STRING, price DOUBLE);
        |INSERT INTO Out
        |SELECT coalesce(e1.symbol, e2.symbol) AS symbol,
        |       coalesce(e1.price, e2.price) AS price
        |FROM PATTERN (e1=Stream1 OR e2=Stream2);""".stripMargin
    def mk(rows: Seq[(Int, String, Double)]) = rows.toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    val out = GraftApp.run(spark, app, Map(
      "Stream1" -> mk(Seq((1, "IBM", 50.0))), "Stream2" -> mk(Nil)))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("IBM", 50.0)))
  }

  // -- patterns.rs:pattern_test_count_exact (CountPatternTestCase):
  //    e1=A<2> with indexed access e1[0]/e1[1]
  test("compat pattern_test_count_exact via SQL: e1=A<2>, indexed select") {
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (val1 INT, val2 INT);
        |INSERT INTO Out SELECT e1[0].val AS val1, e1[1].val AS val2
        |FROM PATTERN (e1=A<2>);""".stripMargin
    val out = GraftApp.run(spark, app, Map("A" -> tsDf(Seq((1, 1), (2, 2)))))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 2)))
  }

  // -- patterns.rs:pattern_test_collection_aggregation: avg over the
  //    collected events + e1[last] (collection_aggregation_executor.rs)
  test("compat pattern_test_collection_aggregation via SQL: avg(e1.price), e1[last]") {
    val app =
      """CREATE STREAM Stock (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol STRING, avgPrice DOUBLE, n BIGINT);
        |INSERT INTO Out
        |SELECT e1[last].symbol AS symbol, avg(e1.price) AS avgPrice, count(e1) AS n
        |FROM PATTERN (e1=Stock<3>);""".stripMargin
    val in = Seq((1, "IBM", 100.0), (2, "IBM", 110.0), (3, "IBM", 120.0))
      .toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    val out = GraftApp.run(spark, app, Map("Stock" -> in))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq(("IBM", 110.0, 3L)))
  }

  // -- patterns.rs:pattern_test_or_then_followedby: (e1=A OR e2=B) -> e3=C
  test("compat pattern_test_or_then_followedby via SQL") {
    val app =
      """CREATE STREAM A (ts TIMESTAMP, id INT);
        |CREATE STREAM B (ts TIMESTAMP, id INT);
        |CREATE STREAM C (ts TIMESTAMP, id INT);
        |CREATE STREAM Out (aOrB INT, c INT);
        |INSERT INTO Out
        |SELECT coalesce(e1.id, e2.id) AS aOrB, e3.id AS c
        |FROM PATTERN ((e1=A OR e2=B) -> e3=C);""".stripMargin
    def mk(rows: Seq[(Int, Int)]) = rows.toDF("sec", "id")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "id")
    val out = GraftApp.run(spark, app, Map(
      "A" -> mk(Seq((1, 1))), "B" -> mk(Nil), "C" -> mk(Seq((2, 3)))))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 3)))
  }

  // -- patterns.rs:logical_pattern_test3_and_with_symbol: AND = both
  //    orderings enumerated (LogicalPreStateProcessor), WHERE post-filter
  test("compat logical_pattern_test3 via SQL: e1=Stream1 AND e2=Stream2 + WHERE") {
    val app =
      """CREATE STREAM Stream1 (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Stream2 (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol1 STRING, symbol2 STRING);
        |INSERT INTO Out
        |SELECT e1.symbol AS symbol1, e2.symbol AS symbol2
        |FROM PATTERN (e1=Stream1 AND e2=Stream2)
        |WHERE e1.symbol = 'IBM' AND e2.symbol = 'MSFT';""".stripMargin
    def mk(rows: Seq[(Int, String, Double)]) = rows.toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    // Stream2 event arrives AFTER Stream1 — matches via the 1→2 ordering
    val out = GraftApp.run(spark, app, Map(
      "Stream1" -> mk(Seq((1, "IBM", 50.0))),
      "Stream2" -> mk(Seq((2, "MSFT", 60.0)))))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("IBM", "MSFT")))
    // reverse arrival order — matches via the 2→1 ordering
    val out2 = GraftApp.run(spark, app, Map(
      "Stream1" -> mk(Seq((2, "IBM", 50.0))),
      "Stream2" -> mk(Seq((1, "MSFT", 60.0)))))("Out")
    assert(out2.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("IBM", "MSFT")))
  }

  // -- patterns.rs:1220-1260 pattern_test_three_way_and / _or (both
  //    `#[ignore = "Chained logical operators … not yet supported"]` in the
  //    reference): n-ary AND = all arrival orderings; n-ary OR = first
  //    match of any alternative
  test("compat three-way AND / OR patterns") {
    def mk(rows: Seq[(Int, Int)]) = rows.toDF("sec", "val")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val")
    val andApp =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM B (ts TIMESTAMP, val INT);
        |CREATE STREAM C (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (aval INT, bval INT, cval INT);
        |INSERT INTO Out
        |SELECT e1.val AS aval, e2.val AS bval, e3.val AS cval
        |FROM PATTERN (e1=A AND e2=B AND e3=C);""".stripMargin
    // the reference test's arrival order A,B,C — and a scrambled order
    // C,A,B that only the n-ary enumeration catches
    val out = GraftApp.run(spark, andApp, Map(
      "A" -> mk(Seq((1, 1))), "B" -> mk(Seq((2, 2))), "C" -> mk(Seq((3, 3)))))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1, 2, 3)))
    val out2 = GraftApp.run(spark, andApp, Map(
      "A" -> mk(Seq((2, 1))), "B" -> mk(Seq((3, 2))), "C" -> mk(Seq((1, 3)))))("Out")
    assert(out2.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1, 2, 3)))
    val orApp =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM B (ts TIMESTAMP, val INT);
        |CREATE STREAM C (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (result INT);
        |INSERT INTO Out
        |SELECT coalesce(e1.val, e2.val, e3.val) AS result
        |FROM PATTERN (e1=A OR e2=B OR e3=C);""".stripMargin
    val orOut = GraftApp.run(spark, orApp, Map(
      "A" -> mk(Nil), "B" -> mk(Seq((1, 20))), "C" -> mk(Nil)))("Out")
    assert(orOut.collect().map(_.getInt(0)).toSeq == Seq(20))
  }

  // -- patterns.rs:600-620 pattern_test_complex_nested (`#[ignore]`d):
  //    `(e1=A -> e2=B) AND e3=C` — the sub-chain completes in order, C
  //    lands anywhere relative to it (3 interleavings)
  test("compat complex nested pattern: (A -> B) AND C") {
    def mk(rows: Seq[(Int, Int)]) = rows.toDF("sec", "val")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val")
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM B (ts TIMESTAMP, val INT);
        |CREATE STREAM C (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (aval INT, bval INT, cval INT);
        |INSERT INTO Out
        |SELECT e1.val AS aval, e2.val AS bval, e3.val AS cval
        |FROM PATTERN ((e1=A -> e2=B) AND e3=C);""".stripMargin
    def run(a: Int, b: Int, c: Int) = GraftApp.run(spark, app, Map(
        "A" -> mk(Seq((a, 1))), "B" -> mk(Seq((b, 2))), "C" -> mk(Seq((c, 3)))))("Out")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(run(1, 2, 3) == Seq((1, 2, 3))) // A B C (the reference test's order)
    assert(run(1, 3, 2) == Seq((1, 2, 3))) // C between A and B
    assert(run(2, 3, 1) == Seq((1, 2, 3))) // C first
    assert(run(2, 1, 3) == Nil)            // B before A: sub-chain violated
  }

  // -- patterns.rs:553-570 pattern_test_count_zero_or_more (`#[ignore]`d):
  //    `e1=A* -> e2=B` — matches with ZERO A events (e1 refs NULL, counts
  //    0) and with runs of As (the A+ branch); WITHIN-gated like A+
  test("compat zero-or-more pattern: e1=A* -> e2=B") {
    def mk(rows: Seq[(Int, Int)]) = rows.toDF("sec", "val")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val")
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM B (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (bval INT, nA BIGINT, aSum BIGINT, firstA INT);
        |INSERT INTO Out
        |SELECT e2.val AS bval, count(e1) AS nA, sum(e1.val) AS aSum,
        |       e1.val AS firstA
        |FROM PATTERN (e1=A* -> e2=B) WITHIN 100 SECONDS;""".stripMargin
    // the reference test: zero A events, then B → exactly one match
    val zero = GraftApp.run(spark, app, Map(
      "A" -> mk(Nil), "B" -> mk(Seq((1, 10)))))("Out")
    assert(zero.collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSeq ==
      Seq((10, 0L, -1L, -1)))
    // two As then B: the zero branch (B alone) + the A+ branch's single
    // non-EVERY match (the maximal run) — the documented `B OR (A+ -> B)`
    // union semantics, one match per branch
    val runs = GraftApp.run(spark, app, Map(
      "A" -> mk(Seq((1, 1), (2, 2))), "B" -> mk(Seq((3, 10)))))("Out")
    val got = runs.collect().map(r => (r.getInt(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
    assert(got == Seq((10, 0L, -1L), (10, 2L, 3L)))
    // EVERY form: the A+ branch enumerates all in-flight prefixes at B
    // ({A1}, {A1 A2}, {A2}) — same contract as the standalone A+ test
    val every = GraftApp.run(spark,
      app.replace("PATTERN (e1=A* -> e2=B)", "PATTERN (EVERY (e1=A* -> e2=B))"),
      Map("A" -> mk(Seq((1, 1), (2, 2))), "B" -> mk(Seq((3, 10)))))("Out")
    val gotE = every.collect().map(r => (r.getInt(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
    assert(gotE == Seq((10, 0L, -1L), (10, 1L, 1L), (10, 1L, 2L), (10, 2L, 3L)))
    // an all-optional pattern is a typed error, not an empty-stream match
    val e = intercept[GraftApp.SqlError](GraftApp.run(spark,
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (v INT);
        |INSERT INTO Out SELECT e1.val AS v
        |FROM PATTERN (e1=A*) WITHIN 10 SECONDS;""".stripMargin,
      Map("A" -> mk(Seq((1, 1))))))
    assert(e.getMessage.contains("required element"))
  }

  // -- patterns.rs:pattern_test7_cross_stream_reference (WHERE form) and
  //    the grammar's in-predicate form (PATTERN_GRAMMAR_V1.2.md:715 shape)
  test("compat pattern_test7: cross-step reference via WHERE and via predicate") {
    def mk(rows: Seq[(Int, String, Double)]) = rows.toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    // WHERE form (post-filter over resolved aliases)
    val appWhere =
      """CREATE STREAM Stream1 (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Stream2 (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol1 STRING, symbol2 STRING);
        |INSERT INTO Out SELECT e1.symbol AS symbol1, e2.symbol AS symbol2
        |FROM PATTERN (e1=Stream1 -> e2=Stream2)
        |WHERE e2.price > e1.price;""".stripMargin
    val hit = GraftApp.run(spark, appWhere, Map(
      "Stream1" -> mk(Seq((1, "MSFT", 50.0))), "Stream2" -> mk(Seq((2, "IBM", 60.0)))))("Out")
    assert(hit.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("MSFT", "IBM")))
    // pattern_test8 shape: condition fails → no match
    val miss = GraftApp.run(spark, appWhere, Map(
      "Stream1" -> mk(Seq((1, "MSFT", 70.0))), "Stream2" -> mk(Seq((2, "IBM", 60.0)))))("Out")
    assert(miss.count() == 0)
    // in-PREDICATE form: the NFA keeps waiting past non-qualifying events —
    // semantics a WHERE post-filter cannot express (the first Stream2 event
    // fails the comparison; the SECOND qualifies and matches)
    val appPred =
      """CREATE STREAM Stream1 (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Stream2 (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol2 STRING);
        |INSERT INTO Out SELECT e2.symbol AS symbol2
        |FROM PATTERN (e1=Stream1 -> e2=Stream2[price > e1.price * 1.1]);""".stripMargin
    val later = GraftApp.run(spark, appPred, Map(
      "Stream1" -> mk(Seq((1, "MSFT", 100.0))),
      "Stream2" -> mk(Seq((2, "ALOW", 105.0), (3, "BHIGH", 120.0)))))("Out")
    assert(later.collect().map(_.getString(0)).toSeq == Seq("BHIGH"))
  }

  // WITHIN n EVENTS through SQL (the reference parses but blocks this;
  // the NFA's count-bounded expiry supports it)
  test("WITHIN n EVENTS via SQL: partial expires after n arrivals") {
    val app =
      """CREATE STREAM E (ts TIMESTAMP, kind STRING);
        |CREATE STREAM Out (k1 STRING, k2 STRING);
        |INSERT INTO Out SELECT e1.kind AS k1, e2.kind AS k2
        |FROM PATTERN (EVERY (e1=E[kind = 'a'] -> e2=E[kind = 'b'])) WITHIN 2 EVENTS;""".stripMargin
    def mk(kinds: Seq[String]) = kinds.zipWithIndex.map { case (k, i) => (i + 1, k) }
      .toDF("sec", "kind")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "kind")
    // a then b one event later: within 2 events → match
    val hit = GraftApp.run(spark, app, Map("E" -> mk(Seq("a", "x", "b"))))("Out")
    assert(hit.count() == 1)
    // two fillers push b past the 2-event budget → partial expired
    val miss = GraftApp.run(spark, app, Map("E" -> mk(Seq("a", "x", "y", "b"))))("Out")
    assert(miss.count() == 0)
  }

  // regression: SAME-STREAM OR alternatives must NULL the alias whose
  // predicate failed (the join re-applies the alternative's predicate)
  test("OR alternatives over one stream: unmatched alias is NULL") {
    val app =
      """CREATE STREAM E (ts TIMESTAMP, kind STRING, v INT);
        |CREATE STREAM Out (v1 INT, v2 INT);
        |INSERT INTO Out SELECT s1.v AS v1, s2.v AS v2
        |FROM PATTERN (s1=E[kind = 'a'] OR s2=E[kind = 'b']);""".stripMargin
    val in = Seq((1, "b", 42)).toDF("sec", "kind", "v")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "kind", "v")
    val rows = GraftApp.run(spark, app, Map("E" -> in))("Out").collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(0) && rows(0).getInt(1) == 42) // s1 NULL, s2 bound
  }

  // regression: indexed access beyond a range quantifier's collected count
  // yields NULL instead of dropping the match
  test("range quantifier: e[j] beyond collected count is NULL, match kept") {
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (n BIGINT, v0 INT, v2 INT);
        |INSERT INTO Out SELECT count(e) AS n, e[0].val AS v0, e[2].val AS v2
        |FROM PATTERN (e=A<2:3> -> stop=A[val = 99]);""".stripMargin
    // two collected A's (1,2) then the stop marker: e[2] does not exist
    val in = Seq((1, 1), (2, 2), (3, 99)).toDF("sec", "val")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val")
    val rows = GraftApp.run(spark, app, Map("A" -> in))("Out").collect()
    assert(rows.nonEmpty)
    val two = rows.filter(_.getLong(0) == 2L)
    assert(two.nonEmpty && two.head.getInt(1) == 1 && two.head.isNullAt(2))
  }

  // -- BEYOND the reference: `A+` / `{n,}` unbounded quantifiers, gated on
  //    WITHIN (the reference rejects them outright; here state is bounded
  //    by the horizon + maxPartials, so the WITHIN-gated form is sound)
  test("unbounded quantifier: A+ with WITHIN collects growing prefixes; {2,} floors; no-WITHIN rejected") {
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (n BIGINT, total BIGINT);
        |INSERT INTO Out SELECT count(e) AS n, sum(e.val) AS total
        |FROM PATTERN (EVERY e=A[val < 50]+ -> stop=A[val = 99])
        |WITHIN 1 HOUR;""".stripMargin
    // A(1) A(2) stop: in-flight collected sets at stop = [1], [1,2], [2]
    val in = Seq((1, 1), (2, 2), (3, 99)).toDF("sec", "val")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val")
    val rows = GraftApp.run(spark, app, Map("A" -> in))("Out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    assert(rows.toSeq == Seq((1L, 1L), (1L, 2L), (2L, 3L)))
    // {2,}: the single-A prefixes fall below the floor
    val app2 = app.replace("[val < 50]+", "[val < 50]{2,}")
    val rows2 = GraftApp.run(spark, app2, Map("A" -> in))("Out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows2 == Seq((2L, 3L)))
    // WITHIN n EVENTS also bounds state — accepted
    val app3 = app.replace("WITHIN 1 HOUR", "WITHIN 10 EVENTS")
    assert(GraftApp.run(spark, app3, Map("A" -> in))("Out").collect().length == 3)
    // no WITHIN at all = unbounded in-flight state — typed compile error
    val e = intercept[GraftApp.SqlError] {
      GraftApp.run(spark, app.replace("\nWITHIN 1 HOUR", ""), Map("A" -> in))
    }
    assert(e.getMessage.contains("WITHIN"), e.getMessage)
    // strict SEQUENCE form: contiguity makes the run a single maximal match
    val app4 =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (n BIGINT, total BIGINT);
        |INSERT INTO Out SELECT count(e) AS n, sum(e.val) AS total
        |FROM SEQUENCE (e=A[val < 50]+ -> stop=A[val = 99])
        |WITHIN 1 HOUR;""".stripMargin
    val rows4 = GraftApp.run(spark, app4, Map("A" -> in))("Out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows4 == Seq((2L, 3L)))
  }

  // -- patterns.rs:pattern_test_concat_filter (ignored there): function
  //    calls in step predicates are free — flags are Catalyst expressions
  test("compat pattern_test_concat_filter via SQL: function call in step filter") {
    val app =
      """CREATE STREAM userStream (ts TIMESTAMP, prefix STRING, suffix STRING);
        |CREATE STREAM Out (prefix STRING, suffix STRING);
        |INSERT INTO Out SELECT e1.prefix AS prefix, e1.suffix AS suffix
        |FROM PATTERN (EVERY (e1=userStream[concat(prefix, suffix) = 'ADMIN']));""".stripMargin
    val in = Seq((1, "USER", ""), (2, "ADM", "IN")).toDF("sec", "prefix", "suffix")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "prefix", "suffix")
    val out = GraftApp.run(spark, app, Map("userStream" -> in))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("ADM", "IN")))
  }

  // -- patterns.rs:pattern_test_not_absent: e1=A -> NOT B -> e2=C
  //    (B must not occur between A's and C's matches)
  test("compat pattern_test_not_absent via SQL: mid-chain NOT guard") {
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM B (ts TIMESTAMP, val INT);
        |CREATE STREAM C (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (aval INT, cval INT);
        |INSERT INTO Out SELECT e1.val AS aval, e2.val AS cval
        |FROM PATTERN (e1=A -> NOT B -> e2=C);""".stripMargin
    // no B between → match
    val hit = GraftApp.run(spark, app, Map(
      "A" -> tsDf(Seq((1, 1))), "B" -> tsDf(Nil), "C" -> tsDf(Seq((3, 3)))))("Out")
    assert(hit.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 3)))
    // B in the gap → guarded out
    val miss = GraftApp.run(spark, app, Map(
      "A" -> tsDf(Seq((1, 1))), "B" -> tsDf(Seq((2, 2))), "C" -> tsDf(Seq((3, 3)))))("Out")
    assert(miss.count() == 0)
    // B after C does NOT kill the match
    val after = GraftApp.run(spark, app, Map(
      "A" -> tsDf(Seq((1, 1))), "B" -> tsDf(Seq((4, 2))), "C" -> tsDf(Seq((3, 3)))))("Out")
    assert(after.count() == 1)
  }

  // mid-chain NOT … FOR d (grammar FOR-bounded mid-gap form): the guard
  // covers only the d window after the anchoring step, not the whole gap
  test("mid-chain NOT … FOR via SQL: guard narrowed to the FOR window") {
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM B (ts TIMESTAMP, val INT);
        |CREATE STREAM C (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (aval INT, cval INT);
        |INSERT INTO Out SELECT e1.val AS aval, e2.val AS cval
        |FROM PATTERN (e1=A -> NOT B FOR 5 SECONDS -> e2=C);""".stripMargin
    // B inside the 5s window after A → guarded out (even though C is later)
    val miss = GraftApp.run(spark, app, Map(
      "A" -> tsDf(Seq((1, 1))), "B" -> tsDf(Seq((3, 2))), "C" -> tsDf(Seq((100, 3)))))("Out")
    assert(miss.count() == 0)
    // B in the gap but PAST the FOR window → match survives (the unbounded
    // mid-chain NOT above would have killed it)
    val hit = GraftApp.run(spark, app, Map(
      "A" -> tsDf(Seq((1, 1))), "B" -> tsDf(Seq((30, 2))), "C" -> tsDf(Seq((100, 3)))))("Out")
    assert(hit.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 3)))
  }

  // trailing NOT … FOR d (grammar absent_pattern; MILESTONES.md:126-133)
  test("trailing NOT … FOR via SQL: order not shipped within the deadline") {
    val app =
      """CREATE STREAM OrderS (ts TIMESTAMP, oid INT);
        |CREATE STREAM Ship (ts TIMESTAMP, oid INT);
        |CREATE STREAM Out (oid INT);
        |INSERT INTO Out SELECT e1.oid AS oid
        |FROM PATTERN (EVERY (e1=OrderS -> NOT Ship FOR 10 SECONDS))
        |PARTITION BY oid;""".stripMargin
    def mk(rows: Seq[(Int, Int)]) = rows.toDF("sec", "oid")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "oid")
    // order 1 ships at +5s (inside FOR) → suppressed; order 2 ships late
    // (+20s); order 3 never ships → both emitted
    val out = GraftApp.run(spark, app, Map(
      "OrderS" -> mk(Seq((1, 1), (2, 2), (3, 3))),
      "Ship" -> mk(Seq((6, 1), (22, 2)))))("Out")
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }

  // PARTITION BY on FROM PATTERN: per-key NFA isolation — users must not
  // cross-match (§2.9 + PATTERN_GRAMMAR_V1.2.md PARTITION BY)
  test("pattern PARTITION BY: per-key isolation, no cross-key matches") {
    val app =
      """CREATE STREAM E (ts TIMESTAMP, user_id INT, kind STRING);
        |CREATE STREAM Out (user_id INT, k1 STRING, k2 STRING);
        |INSERT INTO Out
        |SELECT e1.user_id AS user_id, e1.kind AS k1, e2.kind AS k2
        |FROM PATTERN (EVERY (e1=E[kind = 'a'] -> e2=E[kind = 'b']))
        |PARTITION BY user_id;""".stripMargin
    // user 1: a@1 .. b@4 ; user 2: a@3 (never followed by b) , b@2 (before a)
    val in = Seq((1, 1, "a"), (2, 2, "b"), (3, 2, "a"), (4, 1, "b"))
      .toDF("sec", "user_id", "kind")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "user_id", "kind")
    val (env, close) = GraftApp.runTracked(spark, app, Map("E" -> in))
    val rows = env("Out").collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    close()
    // unpartitioned would match user 2's a@3 with user 1's b@4
    assert(rows.toSeq == Seq((1, "a", "b")))
  }

  // SQL pattern WITHOUT the EVERY keyword = non-EVERY default: single
  // instance per key, first complete sequence wins
  // (pattern_every_overlapping_test.rs:194 e2e through the SQL surface)
  test("pattern without EVERY: one match per key, first sequence wins") {
    val app =
      """CREATE STREAM E (ts TIMESTAMP, user_id INT, kind STRING, v INT);
        |CREATE STREAM Out (user_id INT, v1 INT, v2 INT);
        |INSERT INTO Out
        |SELECT e1.user_id AS user_id, e1.v AS v1, e2.v AS v2
        |FROM PATTERN (e1=E[kind = 'a'] -> e2=E[kind = 'b'])
        |PARTITION BY user_id;""".stripMargin
    // user 1: a(1)@1, a(2)@2, b(3)@3 — reference expects EXACTLY the
    // a(1)-b(3) match: a(2) neither seeds a second instance nor replaces
    // the in-flight one, and b@5 after the match does not re-match.
    // user 2 checks per-key independence of the once-latch.
    val in = Seq((1, 1, "a", 1), (2, 1, "a", 2), (3, 1, "b", 3),
        (4, 2, "a", 7), (5, 1, "b", 4), (6, 2, "b", 8))
      .toDF("sec", "user_id", "kind", "v")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts",
        "user_id", "kind", "v")
    val (env, close) = GraftApp.runTracked(spark, app, Map("E" -> in))
    val rows = env("Out").collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    close()
    assert(rows.sorted.toSeq == Seq((1, 1, 3), (2, 7, 8)))
  }

  // -- functions/arithmetic.rs:arithmetic_test_modulo (ignored there:
  //    their converter lacks %; expressions here are Spark's parser)
  test("compat arithmetic_test_modulo: % operator in SQL") {
    val app =
      """CREATE STREAM inputStream (a INT, b INT);
        |CREATE STREAM Out (result INT);
        |INSERT INTO Out SELECT a % b AS result FROM inputStream;""".stripMargin
    val out = GraftApp.run(spark, app,
      Map("inputStream" -> Seq((10, 3)).toDF("a", "b")))("Out")
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  // -- aggregations.rs:group_by_test_case_when (ignored there; adapted:
  //    batch form aggregates full history, length window dropped)
  test("compat group_by_test_case_when: CASE WHEN group keys") {
    val app =
      """CREATE STREAM stockStream (symbol STRING, price DOUBLE);
        |CREATE STREAM Out (category STRING, totalPrice DOUBLE);
        |INSERT INTO Out
        |SELECT CASE WHEN price > 100.0 THEN 'high' ELSE 'low' END AS category,
        |       sum(price) AS totalPrice
        |FROM stockStream
        |GROUP BY CASE WHEN price > 100.0 THEN 'high' ELSE 'low' END
        |ORDER BY category;""".stripMargin
    val in = Seq(("IBM", 150.0), ("MSFT", 50.0), ("X", 250.0)).toDF("symbol", "price")
    val out = GraftApp.run(spark, app, Map("stockStream" -> in))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("high", 400.0), ("low", 50.0)))
  }

  // -- compatibility/tables.rs:70-80 partition_test1_value_based: the
  //    reference's `PARTITION BY symbol OF stockStream BEGIN … END`
  //    spelling — identical semantics to PARTITION WITH (symbol OF
  //    stockStream); both spellings must agree row-for-row
  test("compat partition_test1: PARTITION BY … OF … spelling ≡ PARTITION WITH") {
    def app(header: String) =
      s"""CREATE STREAM stockStream (ts TIMESTAMP, symbol STRING, price DOUBLE, volume INT);
         |CREATE STREAM outputStream (symbol STRING, totalVolume BIGINT);
         |$header
         |INSERT INTO outputStream
         |SELECT symbol, sum(volume) AS totalVolume
         |FROM stockStream WINDOW('length', 2);
         |END;""".stripMargin
    val in = Seq((1, "IBM", 75.6, 100), (2, "WSO2", 57.6, 200), (3, "IBM", 76.0, 50))
      .toDF("sec", "symbol", "price", "volume")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts",
        "symbol", "price", "volume")
    def run(header: String) =
      GraftApp.run(spark, app(header), Map("stockStream" -> in))("outputStream")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val by = run("PARTITION BY symbol OF stockStream BEGIN")
    val withForm = run("PARTITION WITH (symbol OF stockStream) BEGIN")
    assert(by == withForm)
    // per-arrival frame sums within each symbol partition: IBM 100, then
    // 100+50=150; WSO2 200
    assert(by == Seq(("IBM", 100L), ("IBM", 150L), ("WSO2", 200L)))
    // multi-key form parses and shards by both keys
    val multi =
      """CREATE STREAM S (ts TIMESTAMP, a STRING, b STRING, v INT);
        |CREATE STREAM Out (a STRING, b STRING, t BIGINT);
        |PARTITION BY a, b OF S BEGIN
        |INSERT INTO Out SELECT a, b, sum(v) AS t FROM S WINDOW('length', 10);
        |END;""".stripMargin
    val mIn = Seq((1, "x", "p", 1), (2, "x", "q", 2), (3, "x", "p", 3))
      .toDF("sec", "a", "b", "v")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "a", "b", "v")
    val mOut = GraftApp.run(spark, multi, Map("S" -> mIn))("Out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(mOut == Seq(("x", "p", 1L), ("x", "p", 4L), ("x", "q", 2L)))
  }

  // -- sql_with_end_to_end.rs:409: a bare trailing `SELECT … FROM s;`
  //    statement (no INSERT INTO) is the reference's ad-hoc subscription —
  //    desugared onto a synthesized output stream exposed in the result map
  test("compat ad-hoc SELECT: bare SELECT statement subscribes to a stream") {
    val app =
      """CREATE STREAM InternalStream (tick STRING);
        |CREATE STREAM Loud (tick STRING);
        |INSERT INTO Loud SELECT upper(tick) AS tick FROM InternalStream;
        |SELECT tick FROM Loud;""".stripMargin
    val in = Seq("a", "b").toDF("tick")
    val outs = GraftApp.run(spark, app, Map("InternalStream" -> in))
    val adhoc = outs.keys.filter(_.startsWith("__adhoc")).toSeq
    assert(adhoc.size == 1)
    assert(outs(adhoc.head).collect().map(_.getString(0)).sorted.toSeq == Seq("A", "B"))
  }

  // -- app_runner_windows.rs:228-242 cron_window: `WINDOW cron('*/1 * * * *
  //    *')` flushes its buffer every cron firing; fixed-period crons lower
  //    to the matching tumbling bucket in the batch model
  test("compat cron_window: WINDOW cron(…) bare spelling, fixed-period lowering") {
    val app =
      """CREATE STREAM In (ts TIMESTAMP, v INT);
        |CREATE STREAM Out (v INT);
        |INSERT INTO Out SELECT v FROM In WINDOW cron('*/1 * * * * *');""".stripMargin
    val in = Seq((0, 1), (1500, 2)).toDF("ms", "v")
      .selectExpr("timestamp_millis(ms) AS ts", "v")
    val out = GraftApp.run(spark, app, Map("In" -> in))("Out")
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // the cron grid is visible when grouped: */1 second buckets
    val agg =
      """CREATE STREAM In (ts TIMESTAMP, v INT);
        |CREATE STREAM Out (n BIGINT);
        |INSERT INTO Out SELECT count(v) AS n FROM In WINDOW cron('*/1 * * * * *')
        |GROUP BY window ORDER BY n;""".stripMargin
    val in2 = Seq((0, 1), (200, 2), (1500, 3)).toDF("ms", "v")
      .selectExpr("timestamp_millis(ms) AS ts", "v")
    val out2 = GraftApp.run(spark, agg, Map("In" -> in2))("Out")
    assert(out2.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // calendar cron (day-of-month restricted → no fixed period) is a typed
    // error naming the trigger path
    val cal =
      """CREATE STREAM In (ts TIMESTAMP, v INT);
        |CREATE STREAM Out (v INT);
        |INSERT INTO Out SELECT v FROM In WINDOW cron('0 0 1 1 * *');""".stripMargin
    val e = intercept[GraftApp.SqlError](GraftApp.run(spark, cal,
      Map("In" -> in)))
    assert(e.getMessage.contains("trigger"))
  }

  // -- partitions.rs:partition_test79_coalesce (ignored there: their parser
  //    split the coalesce args on the comma)
  test("compat partition_test79: coalesce with commas inside a partition block") {
    val app =
      """CREATE STREAM dataStream (key STRING, primary_val STRING, backup_val STRING);
        |CREATE STREAM Out (key STRING, result STRING);
        |PARTITION WITH (key OF dataStream) BEGIN
        |  INSERT INTO Out SELECT key, coalesce(primary_val, backup_val) AS result
        |  FROM dataStream
        |END;""".stripMargin
    val in = Seq(("K1", "primary", "backup"), ("K2", null, "backup2"))
      .toDF("key", "primary_val", "backup_val")
    val out = GraftApp.run(spark, app, Map("dataStream" -> in))("Out")
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("K1", "primary"), ("K2", "backup2")))
  }

  // -- windows.rs:session_window_test2_with_partition (ignored there):
  //    session window with an inline partition key — implicit per-(key,
  //    session) grouping
  test("compat session_window_test2: session window with partition key") {
    val app =
      """CREATE STREAM stockStream (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol STRING, total DOUBLE);
        |INSERT INTO Out
        |SELECT symbol, sum(price) AS total FROM stockStream
        |WINDOW('session', 100 MILLISECONDS, symbol) ORDER BY symbol;""".stripMargin
    val in = Seq((0, "IBM", 100.0), (20, "MSFT", 50.0), (40, "IBM", 200.0), (5000, "IBM", 7.0))
      .toDF("ms", "symbol", "price")
      .selectExpr("timestamp_millis(ms) AS ts", "symbol", "price")
    val out = GraftApp.run(spark, app, Map("stockStream" -> in))("Out")
    // IBM: one session (0,40ms) totalling 300, a second at 5s totalling 7
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("IBM", 300.0), ("IBM", 7.0), ("MSFT", 50.0)) ||
      out.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("IBM", 300.0), ("IBM", 7.0), ("MSFT", 50.0)))
  }

  // -- partitions.rs:partition_test10_multiple_queries (ignored there):
  //    several queries in one PARTITION BEGIN block
  test("compat partition_test10: multiple queries in one PARTITION block") {
    val app =
      """CREATE STREAM inputStream (key STRING, value INT);
        |CREATE STREAM sumStream (key STRING, total BIGINT);
        |CREATE STREAM countStream (key STRING, cnt BIGINT);
        |PARTITION WITH (key OF inputStream) BEGIN
        |  INSERT INTO sumStream SELECT SUM(value) AS total FROM inputStream;
        |  INSERT INTO countStream SELECT COUNT(value) AS cnt FROM inputStream
        |END;""".stripMargin
    val in = Seq(("A", 10), ("A", 5), ("B", 1)).toDF("key", "value")
    val env = GraftApp.run(spark, app, Map("inputStream" -> in))
    assert(env("sumStream").collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("A", 15L), ("B", 1L)))
    assert(env("countStream").collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("A", 2L), ("B", 1L)))
  }

  // -- joins.rs:join_test27_three_way_join (adapted: join-side length
  //    windows dropped — batch result-level form joins full history)
  test("compat join_test27: three-way chained join") {
    val app =
      """CREATE STREAM Orders (orderId INT, productId INT, customerId INT);
        |CREATE STREAM Products (productId INT, productName STRING);
        |CREATE STREAM Customers (customerId INT, customerName STRING);
        |CREATE STREAM Out (orderId INT, productName STRING, customerName STRING);
        |INSERT INTO Out
        |SELECT Orders.orderId AS orderId, Products.productName AS productName,
        |       Customers.customerName AS customerName
        |FROM Orders
        |JOIN Products ON Orders.productId = Products.productId
        |JOIN Customers ON Orders.customerId = Customers.customerId;""".stripMargin
    val out = GraftApp.run(spark, app, Map(
      "Orders" -> Seq((101, 1, 1)).toDF("orderId", "productId", "customerId"),
      "Products" -> Seq((1, "Laptop")).toDF("productId", "productName"),
      "Customers" -> Seq((1, "Alice")).toDF("customerId", "customerName")))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((101, "Laptop", "Alice")))
  }

  // -- joins.rs:join_test1_inner_with_window + join_test_mixed_windows:
  //    each join side probes the opposite side's WINDOWED buffer — events
  //    evicted from a length/time buffer must stop matching
  test("compat join_test1/mixed: windowed join bounds each side's buffer") {
    def mk(rows: Seq[(Int, Int, Int)]) = rows.toDF("sec", "id", "v")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "id", "v")
    val app =
      """CREATE STREAM A (ts TIMESTAMP, id INT, v INT);
        |CREATE STREAM B (ts TIMESTAMP, id INT, v INT);
        |CREATE STREAM Out (a_id INT, av INT, bv INT);
        |INSERT INTO Out
        |SELECT A.id AS a_id, A.v AS av, B.v AS bv
        |FROM A WINDOW('length', 2)
        |JOIN B WINDOW('time', 10 SECONDS)
        |ON A.id = B.id ORDER BY a_id;""".stripMargin
    // A: ids 1..4 in ts order — the length-2 buffer keeps only ids 3,4
    val a = mk(Seq((1, 1, 10), (2, 2, 20), (3, 3, 30), (4, 4, 40)))
    // B: max ts = 12s, 10s buffer keeps ts > 2s — id 1 at t=1 evicted
    val b = mk(Seq((1, 1, 100), (5, 3, 300), (12, 4, 400)))
    val out = GraftApp.run(spark, app, Map("A" -> a, "B" -> b))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((3, 30, 300), (4, 40, 400)))
  }

  // -- joins.rs:join_test25_left_outer_with_coalesce: windowed LEFT OUTER
  //    pads NULLs for unmatched buffer rows
  test("compat join_test25: windowed left outer join with coalesce") {
    val app =
      """CREATE STREAM Orders (ts TIMESTAMP, orderId INT, customerId INT);
        |CREATE STREAM Customers (ts TIMESTAMP, customerId INT, name STRING);
        |CREATE STREAM Out (orderId INT, customerName STRING);
        |INSERT INTO Out
        |SELECT Orders.orderId AS orderId,
        |       coalesce(Customers.name, 'Unknown') AS customerName
        |FROM Orders WINDOW('length', 10)
        |LEFT OUTER JOIN Customers WINDOW('length', 10)
        |ON Orders.customerId = Customers.customerId;""".stripMargin
    val orders = Seq((1, 1, 999)).toDF("sec", "orderId", "customerId")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "orderId", "customerId")
    val custs = Seq((1, 7, "Alice")).toDF("sec", "customerId", "name")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "customerId", "name")
    val out = GraftApp.run(spark, app, Map("Orders" -> orders, "Customers" -> custs))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "Unknown")))
  }

  // -- windows.rs:unique_window_test1_basic / first_unique_window_test1_basic
  //    / delay_window_test1_basic (roadmap syntax in the reference)
  test("compat unique/firstUnique/delay windows via SQL") {
    def mk(rows: Seq[(Int, String, Double)]) = rows.toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    val in = mk(Seq((1, "IBM", 100.0), (2, "MSFT", 200.0), (3, "IBM", 150.0)))
    def app(win: String) =
      s"""CREATE STREAM S (ts TIMESTAMP, symbol STRING, price DOUBLE);
         |CREATE STREAM Out (symbol STRING, price DOUBLE);
         |INSERT INTO Out SELECT symbol, price FROM S WINDOW($win) ORDER BY symbol;""".stripMargin
    // unique: latest per symbol
    val u = GraftApp.run(spark, app("'unique', symbol"), Map("S" -> in))("Out")
    assert(u.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("IBM", 150.0), ("MSFT", 200.0)))
    // firstUnique: first per symbol
    val f = GraftApp.run(spark, app("'firstUnique', symbol"), Map("S" -> in))("Out")
    assert(f.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("IBM", 100.0), ("MSFT", 200.0)))
    // delay: rows pass through with event time shifted by the delay
    val dApp =
      """CREATE STREAM S (ts TIMESTAMP, symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol STRING, ts TIMESTAMP);
        |INSERT INTO Out SELECT symbol, ts FROM S WINDOW('delay', 100);""".stripMargin
    val d = GraftApp.run(spark, dApp, Map("S" -> in))("Out")
    assert(d.count() == 3)
    val shifted = d.filter($"symbol" === "MSFT").collect()(0).getTimestamp(1)
    assert(shifted.getTime == 2100L) // 2s event + 100ms delay
  }

  // -- windows.rs:frequent_window_test1_basic (roadmap): batch form = exact
  //    top-k frequent values; streaming kernel = Misra-Gries
  test("compat frequent_window_test1 via SQL: top-k frequent symbols") {
    val app =
      """CREATE STREAM S (symbol STRING, price DOUBLE);
        |CREATE STREAM Out (symbol STRING);
        |INSERT INTO Out SELECT symbol FROM S WINDOW('frequent', 2, symbol);""".stripMargin
    val in = Seq(("IBM", 100.0), ("IBM", 105.0), ("MSFT", 50.0), ("X", 1.0), ("X", 2.0), ("Y", 9.0))
      .toDF("symbol", "price")
    val out = GraftApp.run(spark, app, Map("S" -> in))("Out")
    // top-2 by count: IBM(2), X(2) — MSFT/Y dropped
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("IBM", "IBM", "X", "X"))
  }

  // -- tables.rs:table_test2_update (UpdateTableTestCase.java:updateTableTest1;
  //    roadmap syntax in the reference, implemented here)
  test("compat table_test2: UPDATE table SET … FROM stream WHERE cond") {
    val app =
      """CREATE TABLE stockTable (symbol STRING, price DOUBLE, volume INT);
        |CREATE STREAM stockStream (symbol STRING, price DOUBLE, volume INT);
        |CREATE STREAM updateStream (symbol STRING, newPrice DOUBLE);
        |INSERT INTO stockTable SELECT symbol, price, volume FROM stockStream;
        |UPDATE stockTable SET price = updateStream.newPrice
        |FROM updateStream
        |WHERE stockTable.symbol = updateStream.symbol;""".stripMargin
    val out = GraftApp.run(spark, app, Map(
      "stockStream" -> Seq(("IBM", 100.0, 100), ("MSFT", 50.0, 10)).toDF("symbol", "price", "volume"),
      "updateStream" -> Seq(("IBM", 150.0)).toDF("symbol", "newPrice")))("stockTable")
    assert(out.orderBy("symbol").collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSeq ==
      Seq(("IBM", 150.0, 100), ("MSFT", 50.0, 10)))
  }

  // -- tables.rs:table_test3_delete (DeleteFromTableTestCase.java)
  test("compat table_test3: DELETE FROM table FROM stream WHERE cond") {
    val app =
      """CREATE TABLE stockTable (symbol STRING, price DOUBLE, volume INT);
        |CREATE STREAM stockStream (symbol STRING, price DOUBLE, volume INT);
        |CREATE STREAM deleteStream (symbol STRING);
        |INSERT INTO stockTable SELECT symbol, price, volume FROM stockStream;
        |DELETE FROM stockTable
        |FROM deleteStream
        |WHERE stockTable.symbol = deleteStream.symbol;""".stripMargin
    val out = GraftApp.run(spark, app, Map(
      "stockStream" -> Seq(("IBM", 100.0, 100), ("MSFT", 50.0, 10)).toDF("symbol", "price", "volume"),
      "deleteStream" -> Seq(Tuple1("IBM")).toDF("symbol")))("stockTable")
    assert(out.collect().map(_.getString(0)).toSeq == Seq("MSFT"))
  }

  // -- tables.rs:table_test7_upsert (UpdateOrInsertTableTestCase.java)
  test("compat table_test7: UPDATE OR INSERT INTO table … ON cond") {
    val app =
      """CREATE TABLE stockTable (symbol STRING, price DOUBLE, volume INT);
        |CREATE STREAM seedStream (symbol STRING, price DOUBLE, volume INT);
        |CREATE STREAM stockStream (symbol STRING, price DOUBLE, volume INT);
        |INSERT INTO stockTable SELECT symbol, price, volume FROM seedStream;
        |UPDATE OR INSERT INTO stockTable
        |SELECT symbol, price, volume
        |FROM stockStream
        |ON stockTable.symbol = stockStream.symbol;""".stripMargin
    val out = GraftApp.run(spark, app, Map(
      "seedStream" -> Seq(("IBM", 100.0, 100)).toDF("symbol", "price", "volume"),
      "stockStream" -> Seq(("IBM", 150.0, 200), ("WSO2", 10.0, 5)).toDF("symbol", "price", "volume")))("stockTable")
    assert(out.orderBy("symbol").collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSeq ==
      Seq(("IBM", 150.0, 200), ("WSO2", 10.0, 5)))
  }

  // -- patterns.rs:pattern_test1_simple_followedby
  //    (PatternTestCase / e1=Stream1 -> e2=Stream2): two streams fan into
  //    one NFA input with the stream tag as etype, exactly the reference's
  //    junction wiring
  test("compat pattern_test1: simple followed-by across two streams") {
    val events = Seq(
      CepEvent("app", 1L, 1L, "Stream1", 55.6),  // MSFT
      CepEvent("app", 2L, 2L, "Stream2", 55.7))  // IBM
    val spec = PatternSpec(
      Seq(Step.simple("e1")(_.etype == "Stream1"),
          Step.simple("e2")(_.etype == "Stream2")),
      strict = false, every = true, withinUs = None)
    val matches = Cep.runNfa(events, NfaState(Nil, done = false), spec)._1
    assert(matches.length == 1)
    assert(matches.head.steps.map(_.events.head.value) == Seq(55.6, 55.7))
  }

  // -- patterns.rs:pattern_test2_with_filter (EveryPatternTestCase.java:
  //    testQuery1): e1=Stream1[price > 20] -> e2=Stream2
  test("compat pattern_test2: step filter gates the first step") {
    val spec = PatternSpec(
      Seq(Step.simple("e1")(e => e.etype == "Stream1" && e.value > 20.0),
          Step.simple("e2")(_.etype == "Stream2")),
      strict = false, every = true, withinUs = None)
    // matching first event
    val hit = Cep.runNfa(Seq(
      CepEvent("app", 1L, 1L, "Stream1", 55.6),
      CepEvent("app", 2L, 2L, "Stream2", 55.7)),
      NfaState(Nil, done = false), spec)._1
    assert(hit.length == 1)
    // below-filter first event → no match
    val miss = Cep.runNfa(Seq(
      CepEvent("app", 1L, 1L, "Stream1", 10.0),
      CepEvent("app", 2L, 2L, "Stream2", 55.7)),
      NfaState(Nil, done = false), spec)._1
    assert(miss.isEmpty)
  }

  // -- tests/type_validation_test.rs + compare_expression.rs: the
  //    reference validates expression types at COMPILE time where Spark's
  //    analyzer would silently coerce. TypeGuard restores the reference's
  //    rejections on the GraftApp surface.
  private def tgApp(whereClause: String,
                    cols: String = "sym STRING, price DOUBLE, n INT, ok BOOLEAN") = {
    import spark.implicits._
    val in = Seq(("a", 1.0, 1, true)).toDF("sym", "price", "n", "ok")
    val app =
      s"""CREATE STREAM S ($cols);
         |CREATE STREAM Out (sym STRING);
         |INSERT INTO Out SELECT sym FROM S WHERE $whereClause;""".stripMargin
    graft.sql.GraftApp.run(spark, app, Map("S" -> in))("Out")
  }

  test("compat type_validation 1_1: BOOL ordering comparisons rejected, equality allowed") {
    for (op <- Seq(">", "<", ">=", "<=")) {
      val e = intercept[GraftApp.SqlError](tgApp(s"ok $op false"))
      assert(e.getMessage.contains("Only == and != supported for BOOL"), op)
    }
    assert(tgApp("ok = true").count() == 1)   // test_1_1_boolean_equal_allowed
    assert(tgApp("ok != false").count() == 1) // ..._not_equal_allowed
  }

  test("compat type_validation 1_2: STRING vs numeric/BOOL comparison rejected, STRING-STRING allowed") {
    for (rhs <- Seq("42", "4.5D", "true")) {
      val e = intercept[GraftApp.SqlError](tgApp(s"sym = $rhs"))
      assert(e.getMessage.contains("Cannot compare"), rhs)
    }
    val e2 = intercept[GraftApp.SqlError](tgApp("n > 'abc'"))
    assert(e2.getMessage.contains("Cannot compare"))
    assert(tgApp("sym = 'a'").count() == 1)
    assert(tgApp("sym >= 'a'").count() == 1) // string ordering is legal
  }

  test("compat type_validation: numeric cross-type comparisons stay allowed") {
    assert(tgApp("n <= price").count() == 1)          // INT vs DOUBLE
    assert(tgApp("n = CAST(1 AS LONG)").count() == 1) // INT vs LONG
    assert(tgApp("price >= 0.5").count() == 1)
  }

  test("compat type_validation 1_6: NOT requires a boolean operand") {
    val e = intercept[GraftApp.SqlError](tgApp("NOT price"))
    assert(e.getMessage.contains("NOT requires a BOOL operand"))
    assert(tgApp("NOT ok = false").count() == 0 ||
           tgApp("NOT (ok = false)").count() == 1) // boolean forms legal
  }

  test("compat type_validation 1_3: undefined attribute in WHERE is a typed error") {
    val e = intercept[GraftApp.SqlError](tgApp("missing_col > 5"))
    assert(e.getMessage.contains("undefined attribute 'missing_col'"))
  }

  test("compat type_validation 1_4: duplicate stream definition rejected, distinct names fine") {
    import spark.implicits._
    val in = Seq(("a", 1.0)).toDF("sym", "price")
    val dup =
      """CREATE STREAM Stock (sym STRING, price DOUBLE);
        |CREATE STREAM Stock (sym STRING, volume INT);
        |INSERT INTO Out SELECT sym FROM Stock;""".stripMargin
    val e = intercept[GraftApp.SqlError](
      graft.sql.GraftApp.run(spark, dup, Map("Stock" -> in)))
    assert(e.getMessage.contains("duplicate") && e.getMessage.contains("Stock"))
  }

  test("compat type_validation 1_7: direct table query rejected; table JOIN and stream query allowed") {
    import spark.implicits._
    val lookup = Seq((1, "x")).toDF("id", "name")
    val events = Seq((1, "d")).toDF("id", "data")
    val direct =
      """CREATE STREAM Events (id INT, data STRING);
        |CREATE TABLE Lookup (id INT, name STRING);
        |CREATE STREAM Out (id INT, name STRING);
        |INSERT INTO Out SELECT id, name FROM Lookup;""".stripMargin
    val e = intercept[GraftApp.SqlError](graft.sql.GraftApp.run(
      spark, direct, Map("Events" -> events, "Lookup" -> lookup)))
    assert(e.getMessage.contains("table") && e.getMessage.contains("JOIN"))
    val joined =
      """CREATE STREAM Events (id INT, data STRING);
        |CREATE TABLE Lookup (id INT, name STRING);
        |CREATE STREAM Out (id INT, name STRING);
        |INSERT INTO Out SELECT Events.id AS id, Lookup.name AS name
        |FROM Events JOIN Lookup ON Events.id = Lookup.id;""".stripMargin
    assert(graft.sql.GraftApp.run(
      spark, joined, Map("Events" -> events, "Lookup" -> lookup))("Out").count() == 1)
  }

  test("compat sort_window_validation: constants and order typos rejected, both order spellings work") {
    import spark.implicits._
    val in = Seq((1, 5.0), (2, 1.0), (3, 9.0)).toDF("sec", "value")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "value")
    def app(winParams: String) =
      s"""CREATE STREAM In (ts TIMESTAMP, value DOUBLE);
         |CREATE STREAM Out (value DOUBLE);
         |INSERT INTO Out SELECT value FROM In WINDOW('sort', $winParams);""".stripMargin
    def run(winParams: String) =
      graft.sql.GraftApp.run(spark, app(winParams), Map("In" -> in))("Out")
    // constant criterion rejected (test_sort_window_rejects_constant_expression)
    val e1 = intercept[GraftApp.SqlError](run("2, 5"))
    assert(e1.getMessage.contains("not a stream attribute"))
    // order-string typo rejected, both spellings (…_invalid_order_string / _order_typo)
    val e2 = intercept[GraftApp.SqlError](run("2, value, 'ascending'"))
    assert(e2.getMessage.contains("asc or desc"))
    val e3 = intercept[GraftApp.SqlError](run("2, value descc"))
    assert(e3.getMessage.contains("asc or desc"))
    // order token with no attribute rejected (…_requires_attribute)
    val e4 = intercept[GraftApp.SqlError](run("2, 'asc'"))
    assert(e4.getMessage.contains("before any sort attribute"))
    // valid forms: inline, quoted-param, default asc, case-insensitive
    assert(run("2, value desc").collect().map(_.getDouble(0)).sorted.toSeq == Seq(5.0, 9.0))
    assert(run("2, value, 'DESC'").collect().map(_.getDouble(0)).sorted.toSeq == Seq(5.0, 9.0))
    assert(run("2, value").collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.0, 5.0))
  }

  test("compat parser errors are typed: malformed expressions name the offending text") {
    import spark.implicits._
    val in = Seq((1, 2.0)).toDF("k", "v")
    def run(whereClause: String) = graft.sql.GraftApp.run(spark,
      s"""CREATE STREAM In (k INT, v DOUBLE);
         |CREATE STREAM Out (k INT);
         |INSERT INTO Out SELECT k FROM In WHERE $whereClause;""".stripMargin,
      Map("In" -> in))("Out")
    // incomplete predicate → typed SqlError carrying the text, not Spark's
    // raw ParseException (reference parser errors are typed; parser_tests.rs)
    val e = intercept[GraftApp.SqlError](run("v >"))
    assert(e.getMessage.contains("cannot parse expression") && e.getMessage.contains("v >"))
    assert(run("v > 1").collect().map(_.getInt(0)).toSeq == Seq(1))
    // unknown bare attribute in SELECT → typed (test_1_3 select variant)
    val e2 = intercept[GraftApp.SqlError](graft.sql.GraftApp.run(spark,
      """CREATE STREAM In (k INT, v DOUBLE);
        |CREATE STREAM Out (k INT);
        |INSERT INTO Out SELECT symbol1 FROM In;""".stripMargin,
      Map("In" -> Seq((1, 2.0)).toDF("k", "v")))("Out"))
    assert(e2.getMessage.contains("unknown attribute 'symbol1'"))
  }

  test("compat join_validation: USING and NATURAL JOIN lower to equality ON") {
    // converter.rs:631-634 rejects both spellings ("not yet supported");
    // round 10 lowers them to the equivalent equality-ON conjunction at
    // compile, once both sides' schemas are known — beyond-parity, same
    // family as the hop window
    def app(fromClause: String) =
      s"""CREATE STREAM L (id INT, name STRING);
         |CREATE STREAM R (id INT, value INT);
         |CREATE STREAM Out (name STRING, value INT);
         |INSERT INTO Out SELECT L.name, R.value FROM $fromClause;""".stripMargin
    def run(fromClause: String) =
      GraftApp.run(spark, app(fromClause), Map(
        "L" -> Seq((1, "a"), (2, "b")).toDF("id", "name"),
        "R" -> Seq((2, 20), (3, 30)).toDF("id", "value")))("Out")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
    val expected = Seq(("b", 20))
    assert(run("L JOIN R USING (id)") == expected)
    assert(run("L NATURAL JOIN R") == expected) // common column set = {id}
    assert(run("L JOIN R ON L.id = R.id") == expected)
    // LEFT ... USING keeps the unmatched left row
    val left = GraftApp.run(spark, app("L LEFT JOIN R USING (id)"), Map(
      "L" -> Seq((1, "a"), (2, "b")).toDF("id", "name"),
      "R" -> Seq((2, 20)).toDF("id", "value")))("Out")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toSeq.sorted
    assert(left == Seq(("a", -1), ("b", 20)))
    // typed errors: unknown USING column; NATURAL with an ON clause;
    // NATURAL with zero common columns
    val e1 = intercept[GraftApp.SqlError](GraftApp.run(spark,
      app("L JOIN R USING (nope)"), Map(
        "L" -> Seq((1, "a")).toDF("id", "name"),
        "R" -> Seq((1, 10)).toDF("id", "value"))))
    assert(e1.getMessage.contains("USING column 'nope'"))
    val e2 = intercept[GraftApp.SqlError](GraftApp.parse(
      app("L NATURAL JOIN R ON L.id = R.id")))
    assert(e2.getMessage.contains("NATURAL"))
    val e3 = intercept[GraftApp.SqlError](GraftApp.run(spark,
      """CREATE STREAM L (id INT);
        |CREATE STREAM R (other INT);
        |CREATE STREAM Out (id INT);
        |INSERT INTO Out SELECT L.id FROM L NATURAL JOIN R;""".stripMargin, Map(
        "L" -> Seq(Tuple1(1)).toDF("id"),
        "R" -> Seq(Tuple1(2)).toDF("other"))))
    assert(e3.getMessage.contains("no common columns") ||
      e3.getMessage.contains("share no columns"))
    // `L JOIN R` with no ON is NOT malformed — it is the reference's
    // cross-join form (joins.rs:join_test5_cross_join, ported above):
    // it parses as an always-true join condition
    val crossSpec = GraftApp.parse(app("L JOIN R"))
    assert(crossSpec.queries.head.joins.head.cond == "TRUE")
    // the plain ON form still parses
    GraftApp.parse(app("L JOIN R ON L.id = R.id"))
    // a well-formed OUTPUT rate clause now PARSES (round 10); a malformed
    // one stays a typed error, never a silent full-rate emission
    val rateSpec = GraftApp.parse(
      """CREATE STREAM In (k INT);
        |CREATE STREAM Out (k INT);
        |INSERT INTO Out SELECT k FROM In OUTPUT LAST EVERY 10 EVENTS;""".stripMargin)
    assert(rateSpec.queries.head.outputRate.contains(
      GraftApp.OutputRateSpec("events", "last", 10L)))
    val e4 = intercept[GraftApp.SqlError](GraftApp.parse(
      """CREATE STREAM In (k INT);
        |CREATE STREAM Out (k INT);
        |INSERT INTO Out SELECT k FROM In OUTPUT LAST 10 EVENTS;""".stripMargin))
    assert(e4.getMessage.contains("OUTPUT rate"))
    // pattern statements reject ANY unconsumed trailing clause
    val e5 = intercept[GraftApp.SqlError](GraftApp.parse(
      """CREATE STREAM E (ts TIMESTAMP, k STRING);
        |CREATE STREAM Out (k STRING);
        |INSERT INTO Out SELECT e1.k AS k
        |FROM PATTERN (EVERY (e1=E[k = 'a'])) OUTPUT LAST EVERY 5 EVENTS;""".stripMargin))
    assert(e5.getMessage.contains("unrecognized text after pattern clause"))
  }

  test("compat division semantics: x/0 is NULL, int/int promotes to DOUBLE (divide.rs)") {
    import spark.implicits._
    // the reference's divide executor returns NULL on a zero divisor
    // (divide.rs:82-87) and promotes ANY numeric division to DOUBLE
    // (divide.rs:25-43) — under Spark 4's default ANSI mode x/0 would
    // instead raise, so GraftApp compiles with the lenient semantics
    val in = Seq((7, 2, 4), (1, 0, 4)).toDF("a", "b", "c")
    val app =
      """CREATE STREAM In (a INT, b INT, c INT);
        |CREATE STREAM Out (result DOUBLE);
        |INSERT INTO Out SELECT (a / b) * c AS result FROM In;""".stripMargin
    val ansiBefore = spark.conf.getOption("spark.sql.ansi.enabled")
    val out = graft.sql.GraftApp.run(spark, app, Map("In" -> in))("Out")
    assert(out.schema("result").dataType.typeName == "double")
    val rows = out.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows.toSet == Set(Some(14.0), None))
    // the caller's session-level ANSI setting is restored after compilation
    assert(spark.conf.getOption("spark.sql.ansi.enabled") == ansiBefore)
  }

  test("compat type_validation 1_9: table as a pattern step rejected, stream allowed") {
    import spark.implicits._
    val t = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "a"))
      .toDF("ts", "user_id", "kind")
    val app =
      """CREATE STREAM E (ts TIMESTAMP, user_id BIGINT, kind STRING);
        |CREATE TABLE L (ts TIMESTAMP, user_id BIGINT, kind STRING);
        |CREATE STREAM Out (user_id BIGINT);
        |INSERT INTO Out
        |SELECT e1.user_id AS user_id
        |FROM PATTERN (e1=E[kind = 'a'] -> e2=L[kind = 'b'])
        |PARTITION BY user_id;""".stripMargin
    val e = intercept[GraftApp.SqlError](graft.sql.GraftApp.run(
      spark, app, Map("E" -> t, "L" -> t)))
    assert(e.getMessage.contains("pattern") && e.getMessage.contains("L"))
  }

  // -- app_runner_selector.rs:group_by_having_order_limit_offset: the full
  //    selector clause chain in one statement — groups (b=1,s=7) (b=2,s=10)
  //    (b=3,s=1), HAVING >5 keeps {1,2}, DESC orders [2,1], OFFSET 1 LIMIT 2
  //    leaves exactly (1,7)
  test("compat selector: GROUP BY + HAVING + ORDER BY DESC + LIMIT + OFFSET chain") {
    val app =
      """CREATE STREAM In (a INT, b INT);
        |CREATE STREAM Out (b INT, s BIGINT);
        |INSERT INTO Out
        |SELECT b, SUM(a) AS s FROM In GROUP BY b
        |HAVING SUM(a) > 5 ORDER BY b DESC LIMIT 2 OFFSET 1;""".stripMargin
    val in = Seq((3, 1), (4, 1), (10, 2), (1, 3)).toDF("a", "b")
    val out = GraftApp.run(spark, app, Map("In" -> in))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((1, 7L)))
  }

  // -- app_runner_joins.rs:join_with_condition_gt: pure theta join through
  //    the SQL surface (no equi-key at all)
  test("compat join_with_condition_gt: pure theta ON L.id > R.id") {
    val app =
      """CREATE STREAM L (id INT);
        |CREATE STREAM R (id INT);
        |CREATE STREAM Out (l INT, r INT);
        |INSERT INTO Out SELECT L.id AS l, R.id AS r FROM L JOIN R ON L.id > R.id;""".stripMargin
    val out = GraftApp.run(spark, app, Map(
      "L" -> Seq(1, 3).toDF("id"), "R" -> Seq(1).toDF("id")))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((3, 1)))
  }

  // -- app_runner_joins.rs:join_complex_condition — `#[ignore]`d in the
  //    reference ("Complex nested JOIN conditions - Not part of M1");
  //    DELIBERATE SUPERSET: Catalyst evaluates the nested (AND)-OR residual
  //    directly, so the construct works here
  test("compat join_complex_condition (reference-ignored): nested (AND) OR in ON") {
    val app =
      """CREATE STREAM L (id INT);
        |CREATE STREAM R (id INT);
        |CREATE STREAM Out (l INT, r INT);
        |INSERT INTO Out SELECT L.id AS l, R.id AS r
        |FROM L JOIN R ON (L.id > R.id AND R.id > 0) OR L.id = 10;""".stripMargin
    val out = GraftApp.run(spark, app, Map(
      "L" -> Seq(1, 10).toDF("id"), "R" -> Seq(1, 2).toDF("id")))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((10, 1), (10, 2)))
  }

  // -- app_runner_joins.rs:join_with_group_by: aggregation directly over a
  //    join result, grouped by a projected join column
  test("compat join_with_group_by: COUNT(*) per category over the joined rows") {
    val app =
      """CREATE STREAM L (id INT, cat INT);
        |CREATE STREAM R (id INT);
        |CREATE STREAM Out (cat INT, c BIGINT);
        |INSERT INTO Out SELECT L.cat AS cat, COUNT(*) AS c
        |FROM L JOIN R ON L.id = R.id GROUP BY cat ORDER BY cat ASC;""".stripMargin
    val out = GraftApp.run(spark, app, Map(
      "L" -> Seq((1, 10), (1, 10), (2, 20)).toDF("id", "cat"),
      "R" -> Seq(1, 2).toDF("id")))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((10, 2L), (20, 1L)))
  }

  // -- app_runner_windows.rs:external_time_window_basic, result-level: the
  //    window timeline is the DECLARED LONG-millis attribute, not arrival
  //    time. Per-arrival window content: e1(ts 0) → {1}; e2(ts 150) expels
  //    e1 (150-100=50 > 0) → {2}. (The Current/Expired emission protocol of
  //    the same window is StreamingSpec's time-kernel coverage.)
  test("compat external_time_window: per-event sums over a declared millis attribute") {
    val app =
      """CREATE STREAM In (ts BIGINT, v INT);
        |CREATE STREAM Out (ts BIGINT, s BIGINT);
        |INSERT INTO Out SELECT ts, sum(v) AS s FROM In
        |WINDOW('externalTime', ts, 100 MILLISECONDS) ORDER BY ts;""".stripMargin
    val in = Seq((0L, 1), (150L, 2)).toDF("ts", "v")
    val out = GraftApp.run(spark, app, Map("In" -> in))("Out")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 1L), (150L, 2L)))
  }

  // -- app_runner_windows.rs:external_time_batch_window, result-level:
  //    100ms buckets over the declared millis attribute — [0,100):{1,2},
  //    [100,200):{3}, [200,300):{4}
  test("compat external_time_batch_window: bucket sums over a declared millis attribute") {
    val app =
      """CREATE STREAM In (ts BIGINT, v INT);
        |CREATE STREAM Out (s BIGINT, n BIGINT);
        |INSERT INTO Out SELECT sum(v) AS s, count(*) AS n FROM In
        |WINDOW('externalTimeBatch', ts, 100 MILLISECONDS)
        |GROUP BY window ORDER BY s, n;""".stripMargin
    val in = Seq((0L, 1), (60L, 2), (120L, 3), (240L, 4)).toDF("ts", "v")
    val out = GraftApp.run(spark, app, Map("In" -> in))("Out")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 1L), (3L, 2L), (4L, 1L)))
  }

  // -- compatibility/functions/cast_functions.rs:function_test_cast_double_to_int
  //    (9.99 truncates to 9 — lenient cast, no ANSI overflow error) and
  //    combined.rs:string_chain / mixed_functions / nested_calls and
  //    utility_functions.rs:coalesce_in_filter — the scalar-composition
  //    corpus through the SQL surface
  test("compat function corpus: truncating casts, chained/nested scalars, coalesce filter") {
    def one(app: String, in: org.apache.spark.sql.DataFrame,
            inName: String = "inputStream") =
      GraftApp.run(spark, app, Map(inName -> in))("outputStream").collect()
    val castOut = one(
      """CREATE STREAM inputStream (value DOUBLE);
        |CREATE STREAM outputStream (result INT);
        |INSERT INTO outputStream SELECT CAST(value AS INT) AS result FROM inputStream;""".stripMargin,
      Seq(9.99, -9.99).toDF("value"))
    assert(castOut.map(_.getInt(0)).sorted.toSeq == Seq(-9, 9)) // toward zero
    val chainOut = one(
      """CREATE STREAM inputStream (text STRING);
        |CREATE STREAM outputStream (result STRING);
        |INSERT INTO outputStream
        |SELECT upper(concat(text, '_suffix')) AS result FROM inputStream;""".stripMargin,
      Seq("hello").toDF("text"))
    assert(chainOut.map(_.getString(0)).toSeq == Seq("HELLO_SUFFIX"))
    val mixedOut = one(
      """CREATE STREAM inputStream (name STRING, score DOUBLE);
        |CREATE STREAM outputStream (report STRING, rounded DOUBLE);
        |INSERT INTO outputStream
        |SELECT upper(name) AS report, round(score) AS rounded FROM inputStream;""".stripMargin,
      Seq(("alice", 85.6)).toDF("name", "score"))
    assert(mixedOut.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("ALICE", 86.0)))
    val nestedOut = one(
      """CREATE STREAM inputStream (value DOUBLE);
        |CREATE STREAM outputStream (result DOUBLE);
        |INSERT INTO outputStream
        |SELECT round(sqrt(value)) AS result FROM inputStream;""".stripMargin,
      Seq(17.0).toDF("value"))
    assert(nestedOut.map(_.getDouble(0)).toSeq == Seq(4.0))
    val coalesceOut = one(
      """CREATE STREAM cseEventStream (symbol STRING, price1 FLOAT, price2 FLOAT, quantity INT);
        |CREATE STREAM outputStream (symbol STRING, price FLOAT, quantity INT);
        |INSERT INTO outputStream
        |SELECT symbol, coalesce(price1, price2) AS price, quantity
        |FROM cseEventStream WHERE coalesce(price1, price2) > 0.0
        |ORDER BY quantity;""".stripMargin,
      Seq(("MSFT", Some(50.0f), Some(60.0f), 6), ("MSFT", Some(70.0f), None, 10))
        .toDF("symbol", "price1", "price2", "quantity"),
      "cseEventStream")
    assert(coalesceOut.map(_.getFloat(1)).toSeq == Seq(50.0f, 70.0f))
  }

  // -- expression_parser_complex.rs:test_app_runner_table_in_lookup: the
  //    stream feeds a bounded cache table AND filters on membership in it —
  //    statement order means the insert runs before the lookup, so both
  //    events pass (reference asserts [[1],[1]])
  test("compat table_in_lookup: stream-fed cache-table membership via IN") {
    val app =
      """CREATE STREAM S (val INT);
        |CREATE TABLE T (val INT) WITH ('max_size' = '100');
        |CREATE STREAM Out (val INT);
        |INSERT INTO T SELECT val FROM S;
        |INSERT INTO Out SELECT val FROM S WHERE val IN T;""".stripMargin
    val out = GraftApp.run(spark, app, Map("S" -> Seq(1, 1).toDF("val")))("Out")
    assert(out.as[Int].collect().toSeq == Seq(1, 1))
  }

  // -- app_runner_functions.rs:app_runner_cast_string_to_double /
  //    cast_int_to_string / cast_with_avg: CAST round-trips through the SQL
  //    surface, including CAST feeding an aggregate over a lengthBatch
  //    window (the reference asserts the final complete batch)
  test("compat casts: string→double, int→varchar, CAST under AVG in a lengthBatch") {
    val castApp =
      """CREATE STREAM In (price VARCHAR);
        |CREATE STREAM Out (numeric_price DOUBLE);
        |INSERT INTO Out SELECT CAST(price AS DOUBLE) AS numeric_price FROM In;""".stripMargin
    val o1 = GraftApp.run(spark, castApp,
      Map("In" -> Seq("123.45").toDF("price")))("Out")
    assert(o1.collect().map(_.getDouble(0)).toSeq == Seq(123.45))
    val intApp =
      """CREATE STREAM In (count INT);
        |CREATE STREAM Out (count_str VARCHAR);
        |INSERT INTO Out SELECT CAST(count AS VARCHAR) AS count_str FROM In;""".stripMargin
    val o2 = GraftApp.run(spark, intApp,
      Map("In" -> Seq(42).toDF("count")))("Out")
    assert(o2.collect().map(_.getString(0)).toSeq == Seq("42"))
    val avgApp =
      """CREATE STREAM In (ts TIMESTAMP, price VARCHAR);
        |CREATE STREAM Out (avg_price DOUBLE);
        |INSERT INTO Out SELECT AVG(CAST(price AS DOUBLE)) AS avg_price
        |FROM In WINDOW('lengthBatch', 2);""".stripMargin
    val in3 = Seq((1, "10.0"), (2, "20.0"))
      .toDF("sec", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "price")
    val o3 = GraftApp.run(spark, avgApp, Map("In" -> in3))("Out")
    assert(o3.collect().map(_.getDouble(0)).toSeq == Seq(15.0))
  }

  // -- joins.rs:join_test5_cross_join: JOIN with no ON clause is the
  //    reference's CROSS join over the two window buffers
  test("compat joinTest5: ON-less JOIN is a cross join") {
    val app =
      """CREATE STREAM A (ts TIMESTAMP, val INT);
        |CREATE STREAM B (ts TIMESTAMP, val INT);
        |CREATE STREAM Out (a INT, b INT);
        |INSERT INTO Out
        |SELECT A.val AS a, B.val AS b
        |FROM A WINDOW('length', 10)
        |JOIN B WINDOW('length', 10);""".stripMargin
    def in(vals: Int*) = vals.zipWithIndex.map { case (v, i) => (i + 1, v) }
      .toDF("sec", "val")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val")
    val out = GraftApp.run(spark, app, Map("A" -> in(1), "B" -> in(2)))("Out")
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 2)))
    // three-by-two cross product
    val out2 = GraftApp.run(spark, app,
      Map("A" -> in(1, 2, 3), "B" -> in(10, 20)))("Out")
    assert(out2.count() == 6)
  }

  // -- aggregator/mod.rs:1655-1840 — first/last keep the FIRST/LAST
  //    ARRIVED value; with the input deliberately re-partitioned so
  //    partition order ≠ arrival order, the answer must still follow ts
  //    (Spark's native First/Last would return whatever partition 0 held)
  test("compat first/last: arrival-order semantics survive re-partitioning") {
    val app =
      """CREATE STREAM S (ts TIMESTAMP, v DOUBLE);
        |CREATE STREAM Out (f DOUBLE, l DOUBLE);
        |INSERT INTO Out SELECT first(v) AS f, last(v) AS l FROM S;""".stripMargin
    val in = (1 to 200).map(i => (i, i.toDouble)).toDF("sec", "v")
      .repartition(8)
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "v")
    val r = GraftApp.run(spark, app, Map("S" -> in))("Out").collect()
    assert(r.length == 1 && r(0).getDouble(0) == 1.0 && r(0).getDouble(1) == 200.0)
    // grouped form: per-key arrival order
    val app2 =
      """CREATE STREAM S (ts TIMESTAMP, k STRING, v DOUBLE);
        |CREATE STREAM Out (k STRING, f DOUBLE, l DOUBLE);
        |INSERT INTO Out SELECT k, first(v) AS f, last(v) AS l FROM S
        |GROUP BY k ORDER BY k;""".stripMargin
    val in2 = (1 to 100).map(i => (i, if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("sec", "k", "v").repartition(8)
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "k", "v")
    val rows = GraftApp.run(spark, app2, Map("S" -> in2))("Out").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
      == Seq(("a", 2.0, 100.0), ("b", 1.0, 99.0)))
  }

  // -- aggregator/mod.rs:1696-1705,1804-1811 — the reference's First/Last
  //    process_add pushes ANY Some(v), and a null attribute arrives as
  //    Some(AttributeValue::Null), not None (value.rs): a null at the
  //    earliest/latest ts IS the first/last value. Duplicate-ts rows
  //    resolve deterministically (value tie-break), not by partition order
  test("compat first/last: nulls are values (reference parity); duplicate ts is deterministic") {
    val app =
      """CREATE STREAM S (ts TIMESTAMP, v DOUBLE);
        |CREATE STREAM Out (f DOUBLE, l DOUBLE);
        |INSERT INTO Out SELECT first(v) AS f, last(v) AS l FROM S;""".stripMargin
    // nulls sit at BOTH extremes of the arrival order — first AND last
    // must be NULL, exactly as the reference's VecDeque front/back would be
    val in = Seq((1, null), (2, "5.0"), (3, "7.0"), (4, null))
      .toDF("sec", "s").repartition(4)
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts",
        "CAST(s AS DOUBLE) AS v")
    val r = GraftApp.run(spark, app, Map("S" -> in))("Out").collect()
    assert(r.length == 1 && r(0).isNullAt(0) && r(0).isNullAt(1))
    // non-null extremes still behave
    val inNn = Seq((1, "5.0"), (2, null), (3, "7.0"))
      .toDF("sec", "s").repartition(3)
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts",
        "CAST(s AS DOUBLE) AS v")
    val rNn = GraftApp.run(spark, app, Map("S" -> inNn))("Out").collect()
    assert(rNn.length == 1 && rNn(0).getDouble(0) == 5.0 && rNn(0).getDouble(1) == 7.0)
    // all-null input: first/last are NULL (reference: empty VecDeque)
    val inAllNull = Seq(1, 2).toDF("sec")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts",
        "CAST(NULL AS DOUBLE) AS v")
    val r2 = GraftApp.run(spark, app, Map("S" -> inAllNull))("Out").collect()
    assert(r2.length == 1 && r2(0).isNullAt(0) && r2(0).isNullAt(1))
    // duplicate ts: arrival order within one ts is unobservable in the
    // batch model — the contract is DETERMINISM (min/max value at the tied
    // extreme ts), stable under any repartitioning
    val inTies = Seq((1, 3.0), (1, 1.0), (1, 2.0), (2, 9.0), (2, 8.0))
      .toDF("sec", "v").repartition(5)
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "v")
    (1 to 3).foreach { _ =>
      val rt = GraftApp.run(spark, app, Map("S" -> inTies))("Out").collect()
      assert(rt.length == 1 && rt(0).getDouble(0) == 1.0 && rt(0).getDouble(1) == 9.0)
    }
  }

  // -- compatibility/aggregations.rs:789-868 (rate_limit_test2/3/4 —
  //    `#[ignore = "… syntax not yet supported"]` in the reference) +
  //    app_runner_output_rate.rs:51-64 (ALL EVERY 2: every row arrives by
  //    shutdown): the OUTPUT rate SQL surface, run through the batch
  //    lowering. 6 events EVERY 3 → ALL = all six, FIRST = batch starts
  //    {1,4}, LAST = batch completions {3,6} (the reference test asserts
  //    out.len() == 2 for both FIRST and LAST).
  test("compat OUTPUT rate: ALL/FIRST/LAST EVERY n EVENTS, time buckets, snapshot") {
    def app(clause: String) =
      s"""CREATE STREAM stockStream (ts TIMESTAMP, symbol STRING, price DOUBLE);
         |CREATE STREAM outputStream (symbol STRING, price DOUBLE);
         |INSERT INTO outputStream
         |SELECT symbol, price
         |FROM stockStream WINDOW('length', 10)
         |$clause;""".stripMargin
    def in(n: Int) = (1 to n).map(i => (i, s"SYM$i", i * 10.0))
      .toDF("sec", "symbol", "price").repartition(3)
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts",
        "symbol", "price")
    def run(clause: String, n: Int = 6): Seq[String] =
      GraftApp.run(spark, app(clause), Map("stockStream" -> in(n)))("outputStream")
        .collect().map(_.getString(0)).toSeq.sorted
    assert(run("OUTPUT ALL EVERY 3 EVENTS") == (1 to 6).map(i => s"SYM$i"))
    assert(run("OUTPUT FIRST EVERY 3 EVENTS") == Seq("SYM1", "SYM4"))
    assert(run("OUTPUT LAST EVERY 3 EVENTS") == Seq("SYM3", "SYM6"))
    // 7th event STARTS a batch: FIRST emits it immediately
    // (EventsOutputRate First emits at batch start); LAST waits for the
    // batch to complete, so the open batch emits nothing
    assert(run("OUTPUT FIRST EVERY 3 EVENTS", n = 7) == Seq("SYM1", "SYM4", "SYM7"))
    assert(run("OUTPUT LAST EVERY 3 EVENTS", n = 7) == Seq("SYM3", "SYM6"))
    // time variant (rate_limit_test5-7 family): 2-second event-time
    // buckets over sec 1..6 = {1},{2,3},{4,5},{6}
    assert(run("OUTPUT FIRST EVERY 2 SECONDS") == Seq("SYM1", "SYM2", "SYM4", "SYM6"))
    assert(run("OUTPUT LAST EVERY 2 SECONDS") == Seq("SYM1", "SYM3", "SYM5", "SYM6"))
    assert(run("OUTPUT ALL EVERY 200 MILLISECONDS") == (1 to 6).map(i => s"SYM$i"))
    // SNAPSHOT EVERY d (rate_limit_test8 family): the final batch result
    // IS the last snapshot — identity
    assert(run("OUTPUT SNAPSHOT EVERY 500 MILLISECONDS") == (1 to 6).map(i => s"SYM$i"))
    // aggregated shape + FIRST/LAST: typed error (batch results cannot
    // observe per-arrival state re-emission); ALL still passes
    val aggApp =
      """CREATE STREAM S (ts TIMESTAMP, v DOUBLE);
        |CREATE STREAM Out (s DOUBLE);
        |INSERT INTO Out SELECT sum(v) AS s FROM S OUTPUT FIRST EVERY 3 EVENTS;""".stripMargin
    val e = intercept[GraftApp.SqlError](GraftApp.run(spark, aggApp,
      Map("S" -> in(3).selectExpr("ts", "price AS v"))))
    assert(e.getMessage.contains("OUTPUT FIRST/LAST"))
    // SNAPSHOT EVERY n EVENTS is not a reference form — typed at parse
    val e2 = intercept[GraftApp.SqlError](GraftApp.parse(app(
      "OUTPUT SNAPSHOT EVERY 5 EVENTS")))
    assert(e2.getMessage.contains("SNAPSHOT"))
  }

  // -- joins.rs: the ON-less form is ONLY the bare (cross) JOIN; an outer
  //    keyword with a dropped ON must stay a loud compile error, never a
  //    silent cross product
  test("compat: outer JOIN without ON is rejected at compile") {
    Seq("LEFT", "RIGHT", "FULL", "LEFT OUTER", "FULL OUTER").foreach { kw =>
      val app =
        s"""CREATE STREAM A (ts TIMESTAMP, val INT);
           |CREATE STREAM B (ts TIMESTAMP, val INT);
           |CREATE STREAM Out (a INT, b INT);
           |INSERT INTO Out
           |SELECT A.val AS a, B.val AS b
           |FROM A WINDOW('length', 10)
           |$kw JOIN B WINDOW('length', 10);""".stripMargin
      val e = intercept[GraftApp.SqlError] {
        GraftApp.run(spark, app, Map(
          "A" -> Seq((1, 1)).toDF("sec", "val")
            .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val"),
          "B" -> Seq((1, 2)).toDF("sec", "val")
            .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "val")))
      }
      assert(e.getMessage.toLowerCase.contains("on"), s"$kw: ${e.getMessage}")
    }
  }

  // -- aggregator/mod.rs:1530 — the reference's stdDev divides M2 by n
  //    (POPULATION), not n−1: an app spelling stddev must get 1.118 on
  //    {1,2,3,4}, not Spark's sample 1.291
  test("compat stdDev: app-level stddev is the reference's population form") {
    val app =
      """CREATE STREAM S (v DOUBLE);
        |CREATE STREAM Out (sd DOUBLE, sds DOUBLE);
        |INSERT INTO Out
        |SELECT stddev(v) AS sd, stddev_samp(v) AS sds FROM S;""".stripMargin
    val in = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val r = GraftApp.run(spark, app, Map("S" -> in))("Out").collect()(0)
    assert(math.abs(r.getDouble(0) - math.sqrt(5.0 / 4.0)) < 1e-12) // population
    assert(math.abs(r.getDouble(1) - math.sqrt(5.0 / 3.0)) < 1e-12) // explicit sample
  }

  // -- joins.rs:join_test2_with_aliases + join_test3_self_join — the Rust
  //    reference marks BOTH ignored ("aliases not yet supported"); the
  //    Java original (JoinTestCase joinTest2/3) supports them, and so do
  //    we: AS-aliased sides, including a self-join under two aliases
  test("compat joinTest2/3: AS-aliased join sides and aliased self-join") {
    val app =
      """CREATE STREAM cseEventStream (ts TIMESTAMP, symbol STRING, price FLOAT);
        |CREATE STREAM twitterStream (ts TIMESTAMP, user STRING, tweet STRING, company STRING);
        |CREATE STREAM outputStream (symbol STRING, tweet STRING, price FLOAT);
        |INSERT INTO outputStream
        |SELECT a.symbol AS symbol, b.tweet AS tweet, a.price AS price
        |FROM cseEventStream AS a WINDOW('length', 10)
        |JOIN twitterStream AS b WINDOW('length', 10)
        |ON a.symbol = b.company;""".stripMargin
    val cse = Seq((1, "MSFT", 55.6f)).toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    val twt = Seq((2, "User1", "Hello World", "MSFT")).toDF("sec", "user", "tweet", "company")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "user", "tweet", "company")
    val out = GraftApp.run(spark, app,
      Map("cseEventStream" -> cse, "twitterStream" -> twt))("outputStream")
    assert(out.collect().map(r => (r.getString(0), r.getString(1), r.getFloat(2))).toSeq
      == Seq(("MSFT", "Hello World", 55.6f)))
    // self-join: one stream under two aliases (join_test3)
    val selfApp =
      """CREATE STREAM S (ts TIMESTAMP, symbol STRING, price FLOAT);
        |CREATE STREAM Out (symbol STRING, priceA FLOAT, priceB FLOAT);
        |INSERT INTO Out
        |SELECT a.symbol AS symbol, a.price AS priceA, b.price AS priceB
        |FROM S AS a WINDOW('length', 10)
        |JOIN S AS b WINDOW('length', 10)
        |ON a.symbol = b.symbol;""".stripMargin
    val s = Seq((1, "IBM", 75.6f), (2, "MSFT", 57.6f)).toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    val out2 = GraftApp.run(spark, selfApp, Map("S" -> s))("Out")
    // each row matches itself only (distinct symbols)
    assert(out2.collect().map(r => (r.getString(0), r.getFloat(1), r.getFloat(2)))
      .toSet == Set(("IBM", 75.6f, 75.6f), ("MSFT", 57.6f, 57.6f)))
  }

  // -- triggers.rs:trigger_test8_sql_cron: `AT CRON '…'` spelling parses
  //    to the same schedule as the bare quoted form
  test("compat triggerTest8: AT CRON spelling") {
    val spec = GraftApp.parse(
      """CREATE TRIGGER CronTrigger AT CRON '*/1 * * * * *';
        |CREATE STREAM Out (triggered_time TIMESTAMP);
        |INSERT INTO Out SELECT triggered_time FROM CronTrigger;""".stripMargin)
    val t = spec.triggers.head
    assert(t.mode == "cron" && t.everyMs.contains(1000L))
  }

  // -- tables.rs:trigger_test1_periodic: `AT EVERY 5000` — unitless
  //    trigger periods read as milliseconds (the reference's TimeUtil)
  test("compat triggerTest1: bare-millis AT EVERY period parses") {
    val spec = GraftApp.parse(
      """CREATE TRIGGER FiveSecTrigger AT EVERY 5000;
        |CREATE STREAM outputStream (triggered BOOLEAN);
        |INSERT INTO outputStream
        |SELECT true AS triggered FROM FiveSecTrigger;""".stripMargin)
    val trig = spec.triggers.head
    assert(trig.name == "FiveSecTrigger" && trig.everyMs.contains(5000L))
  }

  // -- windows.rs:length_window_null_handling_in_aggregation: a NULL-priced
  //    event still occupies a window slot — count() counts EVENTS (2), max
  //    skips the NULL (700.0), exactly the reference's last-row assertion
  test("compat lengthWindowNull: NULL slots count as events, max skips them") {
    val app =
      """CREATE STREAM cseEventStream (ts TIMESTAMP, symbol STRING, price FLOAT);
        |CREATE STREAM outputStream (maxp FLOAT, cp BIGINT);
        |INSERT INTO outputStream
        |SELECT max(price) AS maxp, count() AS cp
        |FROM cseEventStream WINDOW('length', 4);""".stripMargin
    val in = Seq((1, null.asInstanceOf[String], null.asInstanceOf[java.lang.Float]),
        (2, "IBM", java.lang.Float.valueOf(700.0f)))
      .toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    val out = GraftApp.run(spark, app, Map("cseEventStream" -> in))("outputStream")
      .collect()
    assert(out.nonEmpty)
    val last = out.last
    assert(last.getFloat(0) == 700.0f && last.getLong(1) == 2L)
  }

  // -- windows.rs:length_window_test11_with_expiry_count: after 4 events
  //    through length-2, the window holds exactly 2 — the count the LAST
  //    output row reports
  test("compat lengthWindowTest11: count over a full length-2 window is 2") {
    val app =
      """CREATE STREAM stockStream (ts TIMESTAMP, symbol STRING, price FLOAT);
        |CREATE STREAM outputStream (symbol STRING, cnt BIGINT);
        |INSERT INTO outputStream
        |SELECT symbol, count() AS cnt FROM stockStream WINDOW('length', 2);""".stripMargin
    val in = Seq((1, "IBM", 100.0f), (2, "MSFT", 200.0f), (3, "GOOG", 300.0f),
        (4, "AAPL", 400.0f))
      .toDF("sec", "symbol", "price")
      .selectExpr("CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "symbol", "price")
    val out = GraftApp.run(spark, app, Map("stockStream" -> in))("outputStream")
      .collect()
    assert(out.length >= 4)
    assert(out.last.getLong(1) == 2L)
  }

  // -- windows.rs:time_window_test7_expiring_sum: once the 100ms window
  //    passes, the changelog retracts the old events — the running sum
  //    after the late arrival covers ONLY the newest event
  test("compat timeWindowTest7: expiring sum retracts past-duration events") {
    val ms = 1000L // µs per ms
    val events = Seq(
      WinEvent("k", 0L, 1L, 100.0),
      WinEvent("k", 10 * ms, 2L, 200.0),
      WinEvent("k", 150 * ms, 3L, 50.0))
    val (out, buf) = WindowKernels.time(events, EmptyBuffer, durUs = 100 * ms)
    assert(out.count(_.op == -1) == 2)                   // both old events expired
    assert(out.map(o => o.value * o.op).sum == 50.0)     // changelog sum = newest only
    assert(buf.events.map(_.eventId) == Seq(3L))
  }

  // -- windows.rs:external_time_window_test2_out_of_order: event-time
  //    driven eviction processes out-of-order arrivals without dropping —
  //    all three events emit as Current
  test("compat externalTimeTest2: out-of-order events all process") {
    val ms = 1000L
    val events = Seq(
      WinEvent("k", 100 * ms, 1L, 100.0),
      WinEvent("k", 50 * ms, 2L, 50.0),   // out of order
      WinEvent("k", 200 * ms, 3L, 200.0))
    val (out, _) = WindowKernels.time(events, EmptyBuffer, durUs = 500 * ms)
    assert(out.count(_.op == 1) == 3)
    assert(out.count(_.op == -1) == 0)   // nothing older than 500ms of max ts
  }

  // -- windows.rs:sort_window_test4_string_sort: 'asc' on a STRING
  //    criterion keeps the lexicographically smallest n; the largest
  //    evicts on overflow
  test("compat sortWindowTest4: string-criterion sort window") {
    import graft.streaming.WindowKernels.SortKey
    def ev(id: Long, sym: String) =
      WinEvent("k", id, id, 0.0, svals = Seq(sym))
    val events = Seq(ev(1, "MSFT"), ev(2, "IBM"), ev(3, "GOOG"), ev(4, "ZZZ"))
    val (out, buf) = WindowKernels.sortTopNMulti(events, EmptyBuffer, n = 3,
      keys = Seq(SortKey(slot = 0, asc = true, sslot = 0)))
    assert(out.count(_.op == 1) == 4)
    // ZZZ is the largest under asc — it evicts on its own arrival
    assert(out.filter(_.op == -1).map(_.eventId) == Seq(4L))
    assert(buf.events.map(_.svals.head).sorted == Seq("GOOG", "IBM", "MSFT"))
  }

  // -- windows.rs:sort_window_test5_with_ties: equal sort values all fit
  //    while capacity allows — no spurious eviction on ties
  test("compat sortWindowTest5: ties retained up to capacity") {
    val events = Seq(
      WinEvent("k", 1L, 1L, 100.0),
      WinEvent("k", 2L, 2L, 100.0),
      WinEvent("k", 3L, 3L, 100.0))
    val (out, buf) = WindowKernels.sortTopN(events, EmptyBuffer, n = 3,
      descending = true)
    assert(out.count(_.op == 1) == 3 && out.count(_.op == -1) == 0)
    assert(buf.events.length == 3)
  }

  // ---- sketch aggregate SQL spellings (round 13): the app-text face of
  // graft.operators.Sketches — lowered to the operators, so the SQL result
  // must equal the operator's own output; bad arity/types/placement die
  // typed at compile, never at Spark analysis.
  test("sketch SQL: heavy_hitters list equals the operator; rejections are typed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (1 to 400).map(i => (i.toLong, "t" + (i % 3),
      if (i % 5 != 0) 7L else i.toLong, i / 10.0)) // user 7 dominates
    val ev = rows.toDF("event_id", "user_id0", "uid", "value")
      .selectExpr("event_id", "CAST(timestamp_seconds(event_id) AS TIMESTAMP) AS ts",
        "uid AS user_id", "user_id0 AS event_type", "value", "'{}' AS props")
    def app(select: String, group: String = "GROUP BY event_type") =
      s"""CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
         |                      event_type STRING, value DOUBLE, props STRING);
         |CREATE STREAM Out (etype STRING, hh STRING);
         |INSERT INTO Out SELECT event_type AS etype, $select AS hh
         |FROM events $group ORDER BY etype;""".stripMargin
    // list parity with heavyHittersBy (count-desc then key — the
    // operator's own order), read back as the packed array
    val got = GraftApp.run(spark,
      app("heavy_hitters(user_id, 4)"), Map("events" -> ev))("Out")
      .select(col("etype"), col("hh").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val op = graft.operators.Sketches.heavyHittersBy(ev, "event_type", "user_id", 4)
      .groupBy(col("grp"))
      .agg(expr("transform(array_sort(collect_list(named_struct('nc', -cnt, 'k', key))), x -> x.k)").as("hh"))
      .select(col("grp"), col("hh").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == op, s"sql $got vs operator $op")
    // user 7 dominates every group
    assert(got.forall(_._2.contains("7")))

    def err(a: String): String =
      intercept[GraftApp.SqlError](GraftApp.run(spark, a, Map("events" -> ev)))
        .getMessage
    // bad arity / types / ranges
    assert(err(app("kmv_distinct(user_id, 1)")).contains("k must be >= 2"))
    assert(err(app("hist_quantile(value, 0)")).contains("per-mille"))
    assert(err(app("hist_quantile(value, 1001)")).contains("per-mille"))
    assert(err(app("hist_quantile(value, 500, 0)")).contains("scale"))
    assert(err(app("heavy_hitters(user_id, 0)")).contains("k must be >= 1"))
    assert(err(app("kmv_distinct(nosuch, 64)")).contains("unknown column"))
    // round 14: multi-key GROUP BY composes (composite spine); HAVING
    // over a SKETCH alias stays typed, HAVING over plain aggregates prunes
    val multiKey =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (etype STRING, user_id BIGINT, n BIGINT, du BIGINT);
        |INSERT INTO Out SELECT event_type AS etype, user_id, count(*) AS n,
        |  kmv_distinct(event_id, 256) AS du
        |FROM events GROUP BY event_type, user_id HAVING count(*) >= 100;""".stripMargin
    val mkGot = GraftApp.run(spark, multiKey, Map("events" -> ev))("Out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val mkWant = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"), count_distinct(col("event_id")).as("du"))
      .filter(col("n") >= 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    // k=256 >> per-group distinct ids here, so the KMV estimate is EXACT
    assert(mkGot == mkWant, s"multi-key sketch $mkGot vs $mkWant")
    assert(mkGot.nonEmpty && mkGot.size < ev.select("event_type", "user_id").distinct().count())
    assert(err(app("kmv_distinct(user_id, 64)",
      "GROUP BY event_type HAVING hh > 1")).contains("HAVING"))
    // ADVICE r14: HAVING referencing a GROUP BY key resolves (grouping
    // columns are legal in the normal-agg pass, which now groups by the
    // raw keys too) — single key and composite key, mixed with aggregates
    val keyHaving =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (etype STRING, du BIGINT);
        |INSERT INTO Out SELECT event_type AS etype, kmv_distinct(event_id, 256) AS du
        |FROM events GROUP BY event_type HAVING event_type <> 't0';""".stripMargin
    val khGot = GraftApp.run(spark, keyHaving, Map("events" -> ev))("Out")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val khWant = ev.filter(col("event_type") =!= "t0")
      .groupBy(col("event_type"))
      .agg(count_distinct(col("event_id")).as("du"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(khGot == khWant, s"key HAVING $khGot vs $khWant")
    val keyHavingMulti =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (etype STRING, user_id BIGINT, n BIGINT, du BIGINT);
        |INSERT INTO Out SELECT event_type AS etype, user_id, count(*) AS n,
        |  kmv_distinct(event_id, 256) AS du
        |FROM events GROUP BY event_type, user_id
        |HAVING user_id = 7 AND count(*) >= 100;""".stripMargin
    val khmGot = GraftApp.run(spark, keyHavingMulti, Map("events" -> ev))("Out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val khmWant = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"), count_distinct(col("event_id")).as("du"))
      .filter(col("user_id") === 7 && col("n") >= 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(khmGot == khmWant && khmGot.nonEmpty,
      s"multi-key key HAVING $khmGot vs $khmWant")
    // a non-trivial expression aliased to the GROUP BY key would silently
    // read back the raw spine key in the output — typed rejection (round 14)
    val aliasClash =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (event_type STRING, du BIGINT);
        |INSERT INTO Out SELECT upper(event_type) AS event_type,
        |  kmv_distinct(user_id, 64) AS du
        |FROM events GROUP BY event_type;""".stripMargin
    assert(err(aliasClash).contains("aliased to the GROUP BY key"))
    // round 15: the GLOBAL form composes with plain aggregates (the
    // datacard one-liner) — 1x1 cross joins, no spine
    val mixed =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (n BIGINT, du BIGINT, mx DOUBLE, p50 DOUBLE);
        |INSERT INTO Out SELECT count(*) AS n, kmv_distinct(user_id, 64) AS du,
        |  max(value) AS mx, hist_quantile(value, 500) AS p50
        |FROM events;""".stripMargin
    val mixGot = GraftApp.run(spark, mixed, Map("events" -> ev))("Out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val mixWant = {
      val n = ev.count()
      val du = graft.operators.Sketches.kmvDistinct(ev, "user_id", 64)
        .select("est_distinct").head().getLong(0)
      val mx = ev.agg(max(col("value"))).head().getDouble(0)
      val p50 = graft.operators.Sketches.quantiles(ev, "value", Seq(500), 100)
        .select("value").head().getDouble(0)
      Seq((n, du, mx, p50))
    }
    assert(mixGot == mixWant, s"global mix $mixGot vs $mixWant")
    // round 16 (VERDICT r15 #1): SCALAR-WRAPPED aggregates classify as
    // aggregates — `round(max(value), 6)` shipped broken under the
    // ^-anchored regex; aggregate detection is now expression-level
    val wrapped =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (n BIGINT, du BIGINT, mx DOUBLE);
        |INSERT INTO Out SELECT count(*) AS n, kmv_distinct(user_id, 64) AS du,
        |  round(max(value), 6) AS mx
        |FROM events;""".stripMargin
    val wrapGot = GraftApp.run(spark, wrapped, Map("events" -> ev))("Out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val wrapWant = Seq((mixWant.head._1, mixWant.head._2,
      BigDecimal(mixWant.head._3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(wrapGot == wrapWant, s"wrapped global mix $wrapGot vs $wrapWant")
    // a NON-aggregate item without GROUP BY stays typed
    val badMix =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (et STRING, du BIGINT);
        |INSERT INTO Out SELECT event_type AS et, kmv_distinct(user_id, 64) AS du
        |FROM events;""".stripMargin
    assert(err(badMix).contains("not an aggregate"))
    // multiple hist_quantile calls on one (column, scale) batch into ONE
    // quantilesBy pass (the p50/p95 datacard shape) — values must equal
    // the operator's own per-quantile output
    val multiQ =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (etype STRING, p50 DOUBLE, p95 DOUBLE);
        |INSERT INTO Out SELECT event_type AS etype,
        |  hist_quantile(value, 500) AS p50, hist_quantile(value, 950) AS p95
        |FROM events GROUP BY event_type ORDER BY etype;""".stripMargin
    val qGot = GraftApp.run(spark, multiQ, Map("events" -> ev))("Out")
      .select("etype", "p50", "p95")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted.toSeq
    val qOp = graft.operators.Sketches.quantilesBy(ev, "event_type", "value", Seq(500, 950), 100)
      .groupBy(col("key"))
      .agg(max(when(col("q_pm") === 500, col("value"))).as("p50"),
        max(when(col("q_pm") === 950, col("value"))).as("p95"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted.toSeq
    assert(qGot == qOp, s"sql $qGot vs operator $qOp")

    // global single-sketch form works and equals the operator
    val glob =
      """CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
        |                      event_type STRING, value DOUBLE, props STRING);
        |CREATE STREAM Out (du BIGINT);
        |INSERT INTO Out SELECT kmv_distinct(user_id, 64) AS du FROM events;""".stripMargin
    val gGot = GraftApp.run(spark, glob, Map("events" -> ev))("Out")
      .collect().map(_.getLong(0)).toSeq
    val gOp = graft.operators.Sketches.kmvDistinct(ev, "user_id", 64)
      .select(col("est_distinct")).collect().map(_.getLong(0)).toSeq
    assert(gGot == gOp)
  }
}
