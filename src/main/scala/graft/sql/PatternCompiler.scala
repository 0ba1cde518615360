package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.{Cep, CepEvent, PatternSpec, Step}

/** Lowers the SQL pattern surface — `FROM PATTERN (e1=S[pred] -> e2=T[pred])
  * [WITHIN n unit]` / `FROM SEQUENCE (…)` — onto the CEP NFA
  * (SURVEY §2.8; reference grammar PATTERN_GRAMMAR_V1.2.md:36-160).
  *
  * Lowering strategy: step predicates are arbitrary SQL boolean exprs over
  * their stream's columns, so they are evaluated ONCE as codegen'd columns
  * on the tagged union of the referenced streams; the NFA then only reads a
  * per-step flag bitstring (CepEvent.etype). Matched step event-ids join
  * back to the union to resolve `e<k>.<col>` select items. Event order =
  * the `ts` TIMESTAMP column (the reference's arrival order made explicit —
  * a distributed engine cannot have implicit arrival order).
  *
  * v1 scope: one event per step ({n,m} and partitioned patterns are
  * available on the Scala API, graft.streaming.Cep).
  */
object PatternCompiler {

  final case class PatternStep(alias: String, stream: String, pred: Option[String])

  final case class PatternQuery(
      target: String,
      selectItems: Seq[(String, Option[String])],
      strict: Boolean,           // SEQUENCE vs PATTERN
      every: Boolean,
      steps: Seq[PatternStep],
      withinUs: Option[Long])

  def compile(spark: SparkSession, q: PatternQuery,
              env: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val streams = q.steps.map(_.stream).distinct
    streams.foreach { s =>
      if (!env.contains(s)) throw GraftApp.SqlError(s"pattern stream '$s' has no bound data")
    }
    // tagged union of all referenced streams (junction fan-in)
    val tagged = streams.map { s =>
      env(s).withColumn("__stream", lit(s))
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    if (!tagged.columns.contains("ts"))
      throw GraftApp.SqlError(
        "pattern streams need a 'ts' TIMESTAMP column (explicit event order)")

    // per-step match flags -> one bitstring column, evaluated by Catalyst
    val flags = q.steps.map { st =>
      val base = col("__stream") === st.stream
      st.pred.map(p => base && expr(p)).getOrElse(base)
    }
    val bits = concat(flags.map(f => when(f, lit("1")).otherwise(lit("0"))): _*)
    // global order (single NFA instance, like an unpartitioned reference
    // pattern); partitioned patterns go through the Scala API
    val ordered = tagged
      .withColumn("__bits", bits)
      .withColumn("__id", row_number().over(Window.orderBy(col("ts"))).cast("long"))
      .persist()

    val cepIn = ordered.select(
        lit("app").as("key"),
        unix_micros(col("ts")).as("tsUs"),
        col("__id").as("eventId"),
        col("__bits").as("etype"),
        lit(0.0).as("value"))
      .as[CepEvent]

    val steps = q.steps.zipWithIndex.map { case (st, i) =>
      Step.simple(st.alias)(e => e.etype.length > i && e.etype.charAt(i) == '1')
    }
    val spec = PatternSpec(steps, strict = q.strict, every = q.every,
      withinUs = q.withinUs)
    val matches = Cep.detect(cepIn, spec).toDF()

    // one column per step alias: the matched event id
    var out = q.steps.zipWithIndex.foldLeft(
      matches.select(col("startUs") +: q.steps.zipWithIndex.map { case (st, i) =>
        expr(s"steps[$i].events[0].eventId").as(s"__${st.alias}_id")
      }: _*)) { case (df, (st, _)) =>
      // join the original row back for e<k>.<col> references
      df.join(ordered.as(st.alias),
        col(s"__${st.alias}_id") === col(s"${st.alias}.__id"), "inner")
    }
    val selectCols = q.selectItems.map {
      case (e, Some(a)) => expr(e).as(a)
      case (e, None) => expr(e)
    }
    out.orderBy(q.steps.map(st => col(s"__${st.alias}_id")): _*)
      .select(selectCols: _*)
  }

  /** Parse the step chain `[EVERY] e1=S[pred] -> e2=T[pred] …`. */
  def parseSteps(raw0: String): (Seq[PatternStep], Boolean) = {
    var raw = raw0.trim
    val every = raw.toUpperCase.startsWith("EVERY ") || raw.toUpperCase.startsWith("EVERY(")
    if (every) raw = raw.substring(5).trim.stripPrefix("(").stripSuffix(")")
    val stepRe = """(?s)^\s*(\w+)\s*=\s*(\w+)\s*(?:\[(.*)\])?\s*$""".r
    val steps = raw.split("->").toSeq.map(_.trim).map {
      case stepRe(alias, stream, pred) =>
        PatternStep(alias, stream, Option(pred).map(_.trim).filter(_.nonEmpty))
      case other => throw GraftApp.SqlError(s"bad pattern step '$other'")
    }
    (steps, every)
  }

  def parseWithin(n: Option[String], unit: Option[String]): Option[Long] =
    n.map { v =>
      val base = v.trim.toLong
      unit.map(_.toUpperCase.stripSuffix("S")) match {
        case Some("SECOND") => base * 1000000L
        case Some("MINUTE") => base * 60000000L
        case Some("HOUR") => base * 3600000000L
        case Some("MILLISECOND") => base * 1000L
        case other => throw GraftApp.SqlError(s"bad WITHIN unit $other")
      }
    }
}
