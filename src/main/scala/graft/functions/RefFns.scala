package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference-spelled scalar functions, registered into the session
  * `FunctionRegistry` so every GraftApp SQL expression (filters, selects,
  * HAVING, join conditions — all routed through Spark's expression parser)
  * resolves the reference's builtin names (builtin_wrapper.rs:645-,
  * 57 names).
  *
  * Most of the 57 are native Spark functions with identical spelling and
  * semantics (abs..upper); this object supplies only the names Spark lacks
  * (or spells differently), each lowered to compositions of native Catalyst
  * expressions — analyzer-resolved, whole-stage-codegen'd, no UDFs:
  *
  *  - `maximum`/`minimum` (math_functions.rs) → greatest/least
  *  - `default(v, d)` (default_function_executor.rs) → 2-arg coalesce
  *  - `convert(x, 'type')` (convert_function_executor.rs:30-35) → cast
  *  - `now()` (date_functions.rs:13-24) → epoch **millis** LONG (the
  *    reference's time domain), not Spark's TIMESTAMP now()
  *  - `eventTimestamp([ts])` (event_timestamp_function_executor.rs) →
  *    the event-time column `ts` as epoch millis
  *  - `formatDate(ms, '%pat')` / `parseDate(s, '%pat')`
  *    (date_functions.rs:31-41) — chrono `%`-style patterns translated to
  *    Java patterns at compile time (the reference requires constant
  *    patterns, so translation never happens per-row)
  *  - `dateAdd(ms, n, 'unit')` (date_functions.rs:93-160) → fixed-millis
  *    arithmetic (units are seconds/minutes/hours/days — all constant width)
  *  - `trunc`/`truncate` (math_functions.rs:781-828) → toward-zero numeric
  *    truncation; `trunc(date, 'fmt')` still dispatches to Spark's date form
  *  - `instanceOfX(v)` (instance_of_checkers.rs) → typeof() comparison,
  *    false on NULL as in the reference
  */
object RefFns {

  import graft.sql.GraftApp.SqlError

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args, isDistinct = false)

  private def millisToTs(e: Expression): Expression =
    fn("timestamp_millis", Cast(e, LongType))

  private def constStr(e: Expression, who: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw SqlError(s"$who requires a constant string argument")
  }

  // chrono strftime specifier → Java DateTimeFormatter pattern
  private val chronoSpec: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'p' -> "a",
    'b' -> "MMM", 'B' -> "MMMM", 'a' -> "EEE", 'A' -> "EEEE", 'j' -> "DDD",
    'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss", 'R' -> "HH:mm")

  /** Translate a chrono `%`-pattern to a Java pattern; literal runs that
    * contain letters are single-quoted so Java doesn't interpret them.
    * Patterns with no `%` pass through untouched (Java-style convenience).
    */
  private[functions] def chronoToJava(pat: String): String = {
    if (!pat.contains('%')) return pat
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(c => c.isLetter || c == '\'')) {
        out.append('\'').append(s.replace("'", "''")).append('\'')
      } else out.append(s)
      lit.clear()
    }
    var i = 0
    while (i < pat.length) {
      if (pat(i) == '%' && i + 1 < pat.length) {
        val c = pat(i + 1)
        if (c == '%') { lit.append('%'); i += 2 }
        else chronoSpec.get(c) match {
          case Some(j) => flush(); out.append(j); i += 2
          case None => throw SqlError(
            s"formatDate/parseDate: unsupported chrono specifier '%$c' in '$pat'")
        }
      } else { lit.append(pat(i)); i += 1 }
    }
    flush()
    out.toString
  }

  private val convertTypes: Map[String, DataType] = Map(
    "string" -> StringType, "int" -> IntegerType, "long" -> LongType,
    "float" -> FloatType, "double" -> DoubleType,
    "bool" -> BooleanType, "boolean" -> BooleanType)

  private val dateUnitMs: Map[String, Long] = Map(
    "seconds" -> 1000L, "minutes" -> 60000L,
    "hours" -> 3600000L, "days" -> 86400000L)

  // typeof() spellings per reference scalar type (value.rs six-type model)
  private val instanceOf: Seq[(String, String)] = Seq(
    "instanceofboolean" -> "boolean", "instanceofstring" -> "string",
    "instanceofinteger" -> "int", "instanceoflong" -> "bigint",
    "instanceoffloat" -> "float", "instanceofdouble" -> "double")

  private def numericTrunc(num: Expression, prec: Option[Expression]): Expression =
    prec match {
      case None =>
        // (x).trunc(): double→long cast truncates toward zero
        Cast(Cast(Cast(num, DoubleType), LongType), DoubleType)
      case Some(p) =>
        val pow = fn("pow", Literal(10.0), Cast(p, DoubleType))
        Divide(
          Cast(Cast(Multiply(Cast(num, DoubleType), pow), LongType), DoubleType),
          pow)
    }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.size != n)
      throw SqlError(s"$name() requires exactly $n argument(s), got ${args.size}")

  private type Builder = Seq[Expression] => Expression
  private def entry(name: String)(b: Builder): (String, Builder) = name -> b

  private val builders: Seq[(String, Builder)] = Seq(
    entry("maximum")(args => fn("greatest", args: _*)),
    entry("minimum")(args => fn("least", args: _*)),
    entry("default") { args =>
      arity("default", args, 2); fn("coalesce", args: _*)
    },
    entry("convert") { args =>
      arity("convert", args, 2)
      val t = constStr(args(1), "convert type").toLowerCase
      val dt = convertTypes.getOrElse(t,
        throw SqlError(s"convert: unknown target type '$t' " +
          s"(one of ${convertTypes.keys.toSeq.sorted.mkString("/")})"))
      Cast(args.head, dt)
    },
    entry("now") { args =>
      arity("now", args, 0); fn("unix_millis", fn("current_timestamp"))
    },
    entry("eventtimestamp") { args =>
      val src = args match {
        case Seq() => UnresolvedAttribute("ts")
        case Seq(e) => e
        case _ => throw SqlError("eventTimestamp() takes at most 1 argument")
      }
      fn("unix_millis", Cast(src, TimestampType))
    },
    entry("formatdate") { args =>
      arity("formatDate", args, 2)
      val pat = chronoToJava(constStr(args(1), "formatDate pattern"))
      fn("date_format", millisToTs(args.head), Literal(UTF8String.fromString(pat), StringType))
    },
    entry("parsedate") { args =>
      arity("parseDate", args, 2)
      val pat = chronoToJava(constStr(args(1), "parseDate pattern"))
      fn("unix_millis",
        fn("to_timestamp", args.head, Literal(UTF8String.fromString(pat), StringType)))
    },
    entry("dateadd") { args =>
      arity("dateAdd", args, 3)
      val unit = constStr(args(2), "dateAdd unit").toLowerCase
      val ms = dateUnitMs.getOrElse(unit,
        throw SqlError(s"dateAdd: unknown unit '$unit' " +
          s"(one of ${dateUnitMs.keys.toSeq.sorted.mkString("/")})"))
      Add(Cast(args.head, LongType), Multiply(Cast(args(1), LongType), Literal(ms)))
    },
    // trunc keeps Spark's date form when the 2nd arg is a string literal
    // ('MM'/'YEAR'…); numeric otherwise — the reference's trunc(num[, prec])
    entry("trunc") {
      case Seq(d, l @ Literal(_, StringType)) => TruncDate(d, l)
      case Seq(num) => numericTrunc(num, None)
      case Seq(num, p) => numericTrunc(num, Some(p))
      case args => throw SqlError(s"trunc() takes 1-2 arguments, got ${args.size}")
    },
    entry("truncate") {
      case Seq(num) => numericTrunc(num, None)
      case Seq(num, p) => numericTrunc(num, Some(p))
      case args => throw SqlError(s"truncate() takes 1-2 arguments, got ${args.size}")
    },
    // count() — the reference's parameterless EVENT count (count_test
    // corpus spells it bare; Spark requires >= 1 arg). Zero args lower to
    // count(1); with args, Spark's own Count semantics apply unchanged.
    // Shadowing-scoped: live only inside GraftApp compiles.
    entry("count") { args =>
      org.apache.spark.sql.catalyst.expressions.aggregate.Count(
        if (args.isEmpty) Seq(Literal(1)) else args)
    },
    // stddev — the reference's Welford aggregator divides M2 by n
    // (aggregator/mod.rs:1530: POPULATION stddev), while Spark's `stddev`
    // is the SAMPLE form (n−1) — a silent wrong-results divergence for any
    // app spelling `stddev`. Shadow it to stddev_pop inside app compiles;
    // stddev_samp stays reachable for the explicit sample form.
    entry("stddev") { args =>
      arity("stddev", args, 1)
      fn("stddev_pop", args.head)
    }) ++ instanceOf.map { case (name, typeName) =>
    // (first/last arrival-order semantics live in GraftApp's
    // rewriteArrivalOrderAggs — the parser builds First/Last AST nodes
    // directly, so a registry shadow here would never fire)
    entry(name) { args =>
      arity(name, args, 1)
      And(IsNotNull(args.head),
        EqualTo(fn("typeof", args.head), Literal(UTF8String.fromString(typeName), StringType)))
    }
  }

  private lazy val builderMap: Map[String, Builder] = builders.toMap

  /** Builder names that SHADOW a native Spark builtin (now, trunc, …).
    * A permanent override would change plain `spark.sql` semantics
    * session-wide — now() returning LONG millis instead of TIMESTAMP,
    * trunc() mis-routing non-literal formats to numeric truncation — so
    * these names go live only inside [[withShadowing]] (the GraftApp
    * compilation scope); [[register]] installs everything else for good.
    */
  private lazy val shadowingNames: Seq[String] = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    builders.map(_._1).filter { n =>
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
        .functionExists(FunctionIdentifier(n))
    }
  }

  /** Install every NON-shadowing reference-spelled name into the session
    * registry. Once per session (a WeakHashMap latch — re-registering on
    * every GraftApp.run would log a "function replaced" warning per name
    * per run, and must not pin sessions in memory).
    */
  private val installed =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  def register(spark: SparkSession): Unit = installed.synchronized {
    if (installed.containsKey(spark)) return
    val reg = spark.sessionState.functionRegistry
    val shadow = shadowingNames.toSet
    builders.foreach { case (name, b) =>
      if (!shadow(name)) reg.createOrReplaceTempFunction(name, b, "built-in")
    }
    installed.put(spark, java.lang.Boolean.TRUE)
  }

  /** Run `body` with the shadowing names (now, trunc, …) resolving to their
    * reference semantics, restoring the native builders afterwards —
    * DataFrame analysis is eager, so plans built inside the scope keep the
    * reference semantics while later `spark.sql` outside it gets the Spark
    * natives back (same scoping discipline as GraftApp's ANSI-off compile;
    * like that toggle, compilation is single-threaded per session).
    */
  def withShadowing[T](spark: SparkSession)(body: => T): T = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    val saved = shadowingNames.map { n =>
      val id = FunctionIdentifier(n)
      (n, reg.lookupFunction(id), reg.lookupFunctionBuilder(id))
    }
    shadowingNames.foreach(n =>
      reg.createOrReplaceTempFunction(n, builderMap(n), "built-in"))
    try body
    finally saved.foreach {
      case (n, Some(info), Some(b)) =>
        reg.registerFunction(FunctionIdentifier(n), info, b)
      case (n, _, _) =>
        reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(n))
    }
  }
}
