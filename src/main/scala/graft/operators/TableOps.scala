package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed-table DML (SURVEY §2.10): the reference's Table trait
  * (insert/update/delete/find, src/core/table/mod.rs:92-140) re-expressed
  * as merge-style set operations over keyed DataFrames. In streaming these
  * run inside `foreachBatch` against the table's storage (see
  * StreamingSpec's upsert test); the merge algebra itself is engine-side
  * and batch-testable.
  *
  * Scale: each op is one equi-join on the key — broadcast when the delta is
  * small (the common case: a micro-batch against a big table), shuffle-hash
  * otherwise; with the table bucketed on the key the join is shuffle-free.
  */
object TableOps {

  /** UPDATE OR INSERT INTO (upsert): delta rows replace same-key table rows,
    * new keys append (update_table_processor.rs "update or insert").
    */
  def upsert(table: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val kept = table.join(delta.select(keys.map(col): _*), keys, "left_anti")
    kept.unionByName(delta)
  }

  /** UPDATE table SET (via whole-row replacement) ON key match only —
    * delta rows for unknown keys are ignored (update_table_processor.rs).
    */
  def update(table: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val matched = delta.join(table.select(keys.map(col): _*), keys, "left_semi")
    upsert(table, matched, keys)
  }

  /** DELETE FROM table ON cond — anti join on the matching keys
    * (delete_table_processor.rs).
    */
  def delete(table: DataFrame, matchKeys: DataFrame, keys: Seq[String]): DataFrame =
    table.join(matchKeys.select(keys.map(col): _*), keys, "left_anti")

  /** `IN table` membership predicate (in_expression_executor.rs) — the
    * stream side filtered to rows whose key exists in the table.
    */
  def containsFilter(stream: DataFrame, table: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(table.select(keys.map(col): _*), keys, "left_semi")
}
