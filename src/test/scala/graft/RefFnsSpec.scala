package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RefFns
import graft.sql.GraftApp

/** The reference's 57 registered builtin names (builtin_wrapper.rs:645-)
  * callable from GraftApp SQL: natives resolve as-is; RefFns supplies the
  * rest (maximum/minimum/default/convert/now/eventTimestamp/formatDate/
  * parseDate/dateAdd/trunc/truncate/instanceOfX) as compositions of native
  * Catalyst expressions with the reference's semantics.
  */
class RefFnsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def one(exprSql: String): Any = {
    RefFns.register(spark)
    RefFns.withShadowing(spark) {
      spark.range(1).selectExpr(s"($exprSql) AS v").collect()(0).get(0)
    }
  }

  test("all 57 reference builtin names resolve through the SQL parser") {
    RefFns.register(spark)
    // one sample invocation per registered name from builtin_wrapper.rs;
    // cast(x, t) is grammar-level CAST syntax in Spark — `convert` is the
    // function-call spelling (identical semantics, converter.rs:30-35)
    val samples = Seq(
      "cast(5.5 AS INT)", "convert(5.5, 'int')", "coalesce(NULL, 1)",
      "ifnull(NULL, 1)", "nullif(1, 1)", "default(NULL, 2)", "uuid()",
      "now()", "eventTimestamp(timestamp_seconds(1))",
      "formatDate(0, '%Y')", "parseDate('1970-01-01', '%Y-%m-%d')",
      "dateAdd(0, 1, 'days')", "abs(-1)", "acos(1.0)", "asin(0.0)",
      "atan(0.0)", "ascii('a')", "ceil(1.2)", "char(65)", "chr(65)",
      "concat('a', 'b')", "cos(0.0)", "exp(1.0)", "floor(1.8)",
      "instr('abc', 'b')", "left('abc', 1)", "length('abc')",
      "like('abc', 'a%')", "ln(1.0)", "locate('b', 'abc')", "log(2.0, 8.0)",
      "log10(100.0)", "lower('AB')", "lpad('a', 3, 'x')", "ltrim(' a')",
      "maximum(1, 2, 3)", "minimum(1, 2, 3)", "mod(7, 3)",
      "position('b', 'abc')", "pow(2, 3)", "power(2, 3)", "repeat('a', 2)",
      "replace('aa', 'a', 'b')", "reverse('ab')", "right('abc', 1)",
      "round(1.25, 1)", "rpad('a', 3, 'x')", "rtrim('a ')", "sign(-2)",
      "sin(0.0)", "sqrt(4.0)", "substr('abc', 2)", "substring('abc', 2)",
      "tan(0.0)", "trim(' a ')", "trunc(5.79)", "truncate(5.789, 2)",
      "upper('ab')")
    val row = RefFns.withShadowing(spark) {
      spark.range(1)
        .selectExpr(samples.zipWithIndex.map { case (s, i) => s"($s) AS c$i" }: _*)
        .collect()(0)
    }
    assert(row.length == samples.length)
  }

  test("maximum/minimum = variadic greatest/least") {
    assert(one("maximum(3, 9, 5)") == 9)
    assert(one("minimum(3, 9, 5)") == 3)
    assert(one("maximum(1.5, CAST(2 AS DOUBLE))") == 2.0)
  }

  test("default(v, d): d on NULL, v otherwise; exactly 2 args") {
    assert(one("default(CAST(NULL AS INT), 7)") == 7)
    assert(one("default(4, 7)") == 4)
    val e = intercept[GraftApp.SqlError](one("default(1, 2, 3)"))
    assert(e.getMessage.contains("exactly 2"))
  }

  test("convert(x, 'type'): the reference's six type spellings; typed error otherwise") {
    assert(one("convert('42', 'int')") == 42)
    assert(one("convert(1, 'bool')") == true)
    assert(one("convert(5.9, 'long')") == 5L)
    assert(one("convert(5, 'string')") == "5")
    assert(one("convert('2.5', 'float')") == 2.5f)
    assert(one("convert('2.5', 'double')") == 2.5)
    val e = intercept[GraftApp.SqlError](one("convert(1, 'decimal')"))
    assert(e.getMessage.contains("unknown target type"))
  }

  test("now() returns epoch millis LONG (reference time domain, date_functions.rs:13-24)") {
    val before = System.currentTimeMillis()
    val v = one("now()").asInstanceOf[Long]
    val after = System.currentTimeMillis()
    assert(v >= before - 5000 && v <= after + 5000)
  }

  test("formatDate: chrono %-patterns translate, literal letters quoted, unknown specifier typed") {
    // 2021-03-04T05:06:07Z = 1614834367000 ms
    assert(one("formatDate(1614834367000, '%Y-%m-%d %H:%M:%S')") == "2021-03-04 05:06:07")
    assert(one("formatDate(1614834367000, '%d %B %Y')") == "04 March 2021")
    // literal letters in the pattern survive (quoted for Java)
    assert(one("formatDate(1614834367000, '%Hh at %Mm')") == "05h at 06m")
    // %% = literal percent
    assert(one("formatDate(1614834367000, '%H%%')") == "05%")
    // Java-style pattern with no % passes through
    assert(one("formatDate(1614834367000, 'yyyy/MM/dd')") == "2021/03/04")
    val e = intercept[GraftApp.SqlError](one("formatDate(0, '%Q')"))
    assert(e.getMessage.contains("unsupported chrono specifier"))
  }

  test("parseDate: date-only → midnight; datetime form; inverse of formatDate") {
    assert(one("parseDate('2021-03-04', '%Y-%m-%d')") == 1614816000000L)
    assert(one("parseDate('2021-03-04 05:06:07', '%Y-%m-%d %H:%M:%S')") == 1614834367000L)
    assert(one("parseDate(formatDate(1614834367000, '%Y-%m-%d %H:%M:%S'), " +
      "'%Y-%m-%d %H:%M:%S')") == 1614834367000L)
  }

  test("dateAdd: fixed-width units over millis; negative increments; typed unit error") {
    assert(one("dateAdd(1000, 3, 'seconds')") == 4000L)
    assert(one("dateAdd(0, 2, 'minutes')") == 120000L)
    assert(one("dateAdd(0, 1, 'hours')") == 3600000L)
    assert(one("dateAdd(86400000, -1, 'days')") == 0L)
    assert(one("dateAdd(CAST(NULL AS LONG), 1, 'days')") == null)
    val e = intercept[GraftApp.SqlError](one("dateAdd(0, 1, 'months')"))
    assert(e.getMessage.contains("unknown unit"))
  }

  test("eventTimestamp(ts) = event-time column as epoch millis") {
    assert(one("eventTimestamp(timestamp_seconds(42))") == 42000L)
  }

  test("trunc/truncate: toward-zero numeric truncation (math_functions.rs:781-828)") {
    assert(one("trunc(5.79)") == 5.0)
    assert(one("trunc(-5.79)") == -5.0) // toward zero, NOT floor
    assert(one("truncate(5.789, 2)") == 5.78)
    assert(one("truncate(-5.789, 1)") == -5.7)
    assert(one("trunc(5.789, 1)") == 5.7)
    // 2-arg string form still dispatches to Spark's date trunc
    assert(one("trunc(DATE'2021-03-15', 'MM')").toString == "2021-03-01")
  }

  test("instanceOfX: value-type tests, false on NULL (instance_of_checkers.rs)") {
    assert(one("instanceOfInteger(1)") == true)
    assert(one("instanceOfInteger(CAST(1 AS LONG))") == false)
    assert(one("instanceOfLong(CAST(1 AS LONG))") == true)
    assert(one("instanceOfString('a')") == true)
    assert(one("instanceOfString(1)") == false)
    assert(one("instanceOfFloat(CAST(1 AS FLOAT))") == true)
    // NB: a bare `1.5` literal is DECIMAL in Spark SQL (not the reference's
    // DOUBLE) — typed columns / casts carry the reference's six-type model
    assert(one("instanceOfDouble(1.5D)") == true)
    assert(one("instanceOfDouble(1.5)") == false)
    assert(one("instanceOfBoolean(true)") == true)
    assert(one("instanceOfDouble(CAST(NULL AS DOUBLE))") == false)
  }

  test("property: formatDate/parseDate round-trip random second-aligned instants") {
    import spark.implicits._
    RefFns.register(spark)
    val rnd = new scala.util.Random(7)
    // 200 instants across 1970-2100, second resolution (the finest the
    // patterns carry)
    val ms = Seq.fill(200)((rnd.nextLong().abs % 4102444800L) * 1000L)
    val pats = Seq("%Y-%m-%d %H:%M:%S", "%F %T", "%Y/%m/%d %H:%M:%S")
    for (p <- pats) {
      val rows = RefFns.withShadowing(spark) {
        ms.toDF("ms")
          .selectExpr(s"ms", s"parseDate(formatDate(ms, '$p'), '$p') AS rt")
          .collect()
      }
      rows.foreach(r => assert(r.getLong(1) == r.getLong(0), s"pattern $p"))
    }
    // letter literals in the pattern survive the chrono→Java translation
    val lit = spark.range(1)
      .selectExpr("formatDate(0, '%Y year, %m month at %H hrs')").collect()(0).getString(0)
    assert(lit == "1970 year, 01 month at 00 hrs")
  }

  test("shadowing overrides are scoped: native now()/trunc return after the scope") {
    RefFns.register(spark)
    // inside the scope: reference semantics (now() = LONG epoch millis)
    RefFns.withShadowing(spark) {
      assert(spark.range(1).selectExpr("now()").schema.head.dataType ==
        org.apache.spark.sql.types.LongType)
    }
    // outside: plain spark.sql gets the Spark natives back — now() is a
    // TIMESTAMP, trunc() date-truncates with a non-literal format column
    assert(spark.sql("SELECT now()").schema.head.dataType ==
      org.apache.spark.sql.types.TimestampType)
    val d = spark.sql("SELECT trunc(DATE'2021-03-15', fmt) AS t FROM (SELECT 'MM' AS fmt)")
      .collect()(0).get(0)
    assert(d.toString == "2021-03-01")
  }

  test("RefFns compositions keep the parquet filter pushdown intact") {
    RefFns.register(spark)
    val df = SparkEntry.queries("q_ref_scalar_fns")(spark, "/root/testdata/sf0.001")
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(scan.contains("LessThanOrEqual(o_orderkey,2000)"),
      s"filter must reach the scan: $scan")
  }

  test("reference spellings work through the GraftApp SQL surface end to end") {
    import spark.implicits._
    val events = Seq(
      (1000L, 1L, 5.0, 2.0), (2000L, 2L, 1.0, 9.0), (3000L, 3L, 4.5, 6.0)
    ).toDF("ms", "user_id", "a", "b")
      .selectExpr("timestamp_millis(ms) AS ts", "user_id", "a", "b")
    val app =
      """CREATE STREAM E (ts TIMESTAMP, user_id BIGINT, a DOUBLE, b DOUBLE);
        |CREATE STREAM Out (user_id BIGINT, hi DOUBLE, ems BIGINT, day STRING);
        |INSERT INTO Out
        |SELECT user_id, maximum(a, b) AS hi,
        |       dateAdd(eventTimestamp(ts), 1, 'seconds') AS ems,
        |       formatDate(eventTimestamp(ts), '%Y-%m-%d') AS day
        |FROM E WHERE instanceOfDouble(a) AND minimum(a, b) < 4.4;""".stripMargin
    val out = GraftApp.run(spark, app, Map("E" -> events))("Out")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 5.0, 2000L, "1970-01-01"),
      (2L, 9.0, 3000L, "1970-01-01")))
  }

  test("GraftFns: LLM-ops extensions resolve by name and match the Column API") {
    import graft.functions.{GraftFns, TextFns, VectorFns}
    import spark.implicits._
    GraftFns.register(spark)
    val df = Seq(("the quick brown fox jumps", Seq(0.1f, 0.2f, 0.7f), Seq(0.3f, 0.1f, 0.6f)))
      .toDF("text", "va", "vb")
    df.createOrReplaceTempView("gfn_docs")
    val sqlRow = spark.sql(
      """SELECT token_count(text) AS tc, rolling_hash64(text) AS rh,
        |  word_shingles(text, 2) AS sh, simhash64(word_shingles(text, 1)) AS sim,
        |  minhash_sig(word_shingles(text, 1), 8) AS mh,
        |  sorted_jaccard(array('a','b'), array('b','c')) AS jac,
        |  cosine_sim(va, vb) AS cs
        |FROM gfn_docs""".stripMargin).collect()(0)
    val apiRow = df.select(
      TextFns.tokenCount(col("text")).as("tc"),
      TextFns.rollingHash(col("text")).as("rh"),
      TextFns.shingles(col("text"), 2).as("sh"),
      TextFns.simHash(TextFns.shingles(col("text"), 1)).as("sim"),
      TextFns.minHashSignature(TextFns.shingles(col("text"), 1), 8).as("mh"),
      VectorFns.cosine(col("va"), col("vb")).as("cs")).collect()(0)
    assert(sqlRow.getLong(0) == apiRow.getLong(0))
    assert(sqlRow.getLong(1) == apiRow.getLong(1))
    assert(sqlRow.getSeq[String](2) == apiRow.getSeq[String](2))
    assert(sqlRow.getLong(3) == apiRow.getLong(3))
    assert(sqlRow.getSeq[Long](4) == apiRow.getSeq[Long](4))
    assert(math.abs(sqlRow.getDouble(5) - 1.0 / 3) < 1e-12) // |{b}| / |{a,b,c}|
    assert(math.abs(sqlRow.getDouble(6) - apiRow.getDouble(5)) < 1e-12)
    // bad arity / non-literal size die at analysis with the function name
    val e1 = intercept[Exception](spark.sql("SELECT token_count('a','b')").collect())
    assert(e1.getMessage.contains("token_count"))
    val e2 = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('a'), length('xx'))").collect())
    assert(e2.getMessage.contains("integer literal"))
  }

  test("GraftFns round-8 curation compositions: by-name ≡ Column API, app surface") {
    import graft.functions.GraftFns
    import graft.operators.Curation
    import spark.implicits._
    GraftFns.register(spark)
    val df = Seq(
      ("<p>A &amp; B</p><script>x()</script>",
       "HTTPS://WWW.Ex.COM:443/P?utm_source=a&id=7#f")).toDF("html", "url")
    df.createOrReplaceTempView("gfn_web")
    val sqlRow = spark.sql(
      """SELECT html_to_text(html) AS t, url_canon(url) AS c, url_domain(url) AS d
        |FROM gfn_web""".stripMargin).collect()(0)
    val apiRow = df.select(
      Curation.htmlToText(col("html")).as("t"),
      Curation.canonicalizeUrl(col("url")).as("c"),
      Curation.urlDomain(col("url")).as("d")).collect()(0)
    assert(sqlRow.getString(0) == "A & B" && sqlRow.getString(0) == apiRow.getString(0))
    assert(sqlRow.getString(1) == "https://www.ex.com/P?id=7" &&
      sqlRow.getString(1) == apiRow.getString(1))
    assert(sqlRow.getString(2) == "ex.com" && sqlRow.getString(2) == apiRow.getString(2))
    // and through a declared app: strip + domain-gate in EventFlux SQL
    val app =
      """CREATE STREAM Pages (id BIGINT, html STRING, url STRING);
        |CREATE STREAM Clean (id BIGINT, text STRING, domain STRING);
        |INSERT INTO Clean
        |SELECT id, html_to_text(html) AS text, url_domain(url) AS domain
        |FROM Pages WHERE token_count(html_to_text(html)) >= 2 ORDER BY id;""".stripMargin
    val pages = Seq(
      (1L, "<b>hello</b> world<style>s{}</style>", "http://a.example.com/x"),
      (2L, "<p>hi</p>", "http://b.example.com/y")).toDF("id", "html", "url")
    val out = GraftApp.run(spark, app, Map("Pages" -> pages))("Clean")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "hello world", "a.example.com")))
  }

  test("GraftFns zorder_key: by-name ≡ Layout.zValue, typed arg errors") {
    import graft.functions.GraftFns
    import graft.operators.Layout
    import spark.implicits._
    GraftFns.register(spark)
    val df = Seq((5L, 9L), (0L, 255L), (255L, 0L)).toDF("u", "v")
    df.createOrReplaceTempView("gfn_z")
    val sqlRows = spark.sql(
      "SELECT zorder_key(u, v, 8) AS z FROM gfn_z").collect().map(_.getLong(0))
    val apiRows = df.select(Layout.zValue(Seq(col("u"), col("v")), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(sqlRows.toSeq == apiRows.toSeq)
    // bits must be a literal; n*bits must fit a long
    intercept[Exception](spark.sql("SELECT zorder_key(u, v, u) FROM gfn_z").collect())
    intercept[Exception](spark.sql("SELECT zorder_key(u, v, 32) FROM gfn_z").collect())
  }

  test("GraftFns resolve inside GraftApp SQL apps (curation via the app surface)") {
    import spark.implicits._
    val app =
      """CREATE STREAM Docs (id BIGINT, text STRING);
        |CREATE STREAM Gated (id BIGINT, n BIGINT);
        |INSERT INTO Gated SELECT id, token_count(text) AS n FROM Docs
        |WHERE token_count(text) >= 3 ORDER BY id;""".stripMargin
    val docs = Seq((1L, "one two three four"), (2L, "too short")).toDF("id", "text")
    val out = GraftApp.run(spark, app, Map("Docs" -> docs))("Gated")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 4L)))
  }
}
