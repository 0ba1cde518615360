package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftApp

/** Front-end TOTALITY sweep over the reference's whole test corpus: every
  * app SQL text embedded anywhere under /root/reference/tests either
  * parses or fails with the typed SqlError — never an untyped crash (MatchError,
  * NPE, StringIndexOutOfBounds…). This is the robustness contract the
  * per-case CompatSpec ports can't give: THEY check semantics on ~80
  * curated cases; this checks the parser's error discipline on all of
  * them, including apps using features we reject (kafka transports,
  * unsupported annotations) — rejection must be loud and typed.
  */
class CorpusSweepSpec extends AnyFunSuite {

  private val root = Paths.get("/root/reference/tests")

  /** Rust string literals (line-continuations collapsed, escapes decoded)
    * that look like full app texts. */
  /** Hand-rolled literal scanner (a regex over whole files overflows the
    * matcher stack): walk chars, collect each double-quoted literal with
    * its escapes intact. */
  private def literals(src: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < src.length) {
      if (src.startsWith("r#\"", i)) {
        // Rust raw string: verbatim until "#
        val end = src.indexOf("\"#", i + 3)
        if (end < 0) i = src.length
        else { out += src.substring(i + 3, end); i = end + 2 }
      } else if (src.charAt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (i < src.length && !done) {
          val c = src.charAt(i)
          if (c == '\\' && i + 1 < src.length) { sb.append(c).append(src.charAt(i + 1)); i += 2 }
          else if (c == '"') { done = true; i += 1 }
          else { sb.append(c); i += 1 }
        }
        out += sb.toString
      } else i += 1
    }
    out.result()
  }

  private def extractApps(): Seq[(String, String)] = {
    val files = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".rs")).toSeq
    files.flatMap { p =>
      val src = new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
      literals(src).collect {
        case lit if lit.contains("INSERT INTO") || lit.contains("CREATE TRIGGER") =>
          val joined = lit.replaceAll("\\\\\n\\s*", "")
          val s = joined.replace("\\n", "\n").replace("\\\"", "\"")
            .replace("\\'", "'").replace("\\\\", "\\")
          (p.toString, s)
      }.filter { case (_, s) =>
        s.contains("CREATE STREAM") || s.contains("CREATE TRIGGER")
      }
    }
  }

  test("corpus sweep: 1200+ reference app texts parse or fail TYPED; " +
       "most of the corpus parses clean") {
    assume(Files.isDirectory(root), "reference corpus not present")
    val apps = extractApps()
    assert(apps.size >= 1200, s"extraction shrank: ${apps.size} apps")
    var ok = 0
    val unexpected = collection.mutable.Buffer.empty[(String, String, String)]
    val rejected = collection.mutable.Buffer.empty[String]
    apps.foreach { case (f, s) =>
      try { GraftApp.parse(s); ok += 1 }
      catch {
        case e: GraftApp.SqlError =>
          rejected += (e.getMessage + "  @" + f.substring(f.lastIndexOf('/') + 1))
        case e: Throwable =>
          unexpected += ((f, s.linesIterator.take(3).mkString(" | ").take(120),
            e.getClass.getName + ": " + String.valueOf(e.getMessage).take(120)))
      }
    }
    rejected.groupBy(_.takeWhile(_ != '\'')).toSeq.sortBy(-_._2.size)
      .foreach { case (k, v) => info(s"typed reject ×${v.size}: ${v.head.take(160)}") }
    // full rejection list on disk so every remaining rejection is
    // individually inspectable (target/, not committed)
    Files.write(java.nio.file.Paths.get("target/sweep-rejections.txt"),
      rejected.sorted.mkString("\n").getBytes("UTF-8"))
    assert(unexpected.isEmpty,
      s"${unexpected.size} untyped crashes, first 5:\n" +
        unexpected.take(5).map(t => s"  ${t._1}\n    ${t._2}\n    ${t._3}")
          .mkString("\n"))
    // parse-clean floor: the corpus includes transports/annotations we
    // deliberately reject — but the bulk of the language must parse
    info(s"parsed clean: $ok of ${apps.size} extracted corpus apps")
    assert(ok >= apps.size * 7 / 10, s"only $ok/${apps.size} parsed clean")
    // round 11: the residue is PINNED exactly — all four remaining
    // rejections are behaviors the reference itself intends (negative
    // type-validation fixtures: a mid-app CREATE AGGREGATION re-definition
    // cascade and a deliberately undefined stream). Any parser regression
    // or NEW rejection class changes this set and fails loudly, instead of
    // hiding under the >=70% floor.
    val residue = rejected.map { r =>
      val at = r.lastIndexOf("  @")
      val fixture = r.substring(at + 3).trim
      val msg = r.substring(0, at)
      val prefix = msg.takeWhile(c => c != '—' && c != '(').trim.take(60)
      s"$fixture :: $prefix"
    }.sorted
    val pinned = Seq(
      "app_runner_tables.rs :: undefined stream/table 'NonExistentStream'",
      "type_validation_test.rs :: aggregation 'StockAgg' must be queried with WITHIN 'from' AN",
      "type_validation_test.rs :: duplicate stream/table/trigger definition 'Stock'",
      "type_validation_test.rs :: unsupported statement: CREATE AGGREGATION StockAgg ...")
    assert(residue == pinned,
      s"sweep residue drifted from the pinned reference-intended set:\n" +
        residue.mkString("\n"))
  }
}
