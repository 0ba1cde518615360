package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Registry gate (round 16, VERDICT r15 #2): every `SparkEntry.queries`
  * entry must compile AND run end-to-end on sf0.001 inside `sbt test`.
  * Round 15 shipped q_sketch_sql_global compile-broken because a query
  * added after the driver's correctness pass had no hard gate — Bench
  * swallowed the throw into a silent `-1.0` and the only red was the next
  * round's driver run. This spec closes that window: a throwing registry
  * entry fails the build, with every failure named in one assertion
  * message. Full materialization (noop write), not plan-only — runtime-only
  * failures (bad kernel state schema, a mis-typed collect) must gate too.
  */
class RegistrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry registry entry runs on sf0.001") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists() ||
      new java.io.File(s"$sfDir/events").exists(), s"testdata missing at $sfDir")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          None
        } catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | "))
        }
      spark.catalog.clearCache()
      r
    }
    assert(failures.isEmpty,
      s"\n${failures.size} registry entr${if (failures.size == 1) "y" else "ies"} failed:\n" +
        failures.mkString("\n"))
  }

  test("entry() smoke: flagship query returns rows") {
    assume(new java.io.File(sfDir).exists())
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
