package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * Conventions that keep the driver's hash-compare stable:
  *  - every output column is explicitly aliased, identically on both sides;
  *  - every query ends with a total ORDER BY (deterministic row order);
  *  - double-typed aggregates are rounded identically on both sides;
  *  - integer sums are cast to BIGINT on both sides (DuckDB sums INTEGER
  *    into HUGEINT otherwise).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryFamily {
  def defs: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap
  final def oracles: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
