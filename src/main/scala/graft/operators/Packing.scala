package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — assign documents to fixed-budget training sequences
  * (the batch-composition stage after sampling/dedup in an LLM data
  * pipeline). This is OFFSET packing: documents line up in a deterministic
  * order and each one belongs to the pack where its start offset falls, so
  * packs fill to the budget with bounded straddle (a doc may overflow into
  * the next pack — the standard concat-then-chunk pretraining layout, not
  * bin-packing, which is neither deterministic under parallelism nor
  * needed when documents ≪ budget).
  *
  * Scale shape: packing runs PER STRATUM (source/shard column), so the
  * cumulative sum is a partitioned window — one shuffle on the stratum
  * key, no global single-task sort. At 100 TB the stratum is whatever
  * already shards the corpus (source, date bucket, shard id).
  */
object Packing {

  /** Adds `pack_id`: the 0-based pack (of `budget` length units) whose
    * range contains this document's start offset within its stratum, laid
    * out in `idCol` order. `lenCol` is the document's length in the packing
    * unit (tokens, chars, bytes).
    */
  def offsetPack(df: DataFrame, strataCols: Seq[String], idCol: String,
                 lenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(lenCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(lenCol)) / lit(budget.toDouble)).cast("long"))
      .drop("__cum")
  }
}
