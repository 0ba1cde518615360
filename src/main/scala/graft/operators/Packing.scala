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

  /** Greedy sequential BIN packing — adds `bin_id`. Documents are laid out
    * per stratum in `idCol` order; one that does not fit the open bin
    * CLOSES it and starts the next, so no document straddles a boundary —
    * the packed-SFT / fine-tuning layout where example boundaries must not
    * cross sequences ([[offsetPack]] is the concat-then-chunk pretraining
    * layout that allows straddle). A document longer than the budget gets a
    * bin of its own (callers chunk oversized docs first — Curation
    * .chunkTokens).
    *
    * Determinism: the assignment is a pure left fold over the stratum's
    * idCol-ordered length sequence — independent of partitioning, cluster
    * size, and reruns (same contract as the hash-gated samplers).
    *
    * Scale shape: one shuffle on the stratum key, a SPILLABLE secondary
    * sort (strata, id), then a sequential in-partition fold with O(1)
    * state (open-bin fill) — a hot stratum streams through, same
    * bounded-memory shape as Windows.foldSorted / Cep.detectSorted. NOT a
    * partitioned window: the fill-reset recurrence is not expressible as a
    * frame aggregate, and a row_number-based rewrite would carry the whole
    * stratum through one window buffer.
    *
    * The fold is opaque to Catalyst column pruning (mapPartitions), so
    * PROJECT FIRST: pass only the columns the downstream needs — an
    * un-projected wide text column would ride the shuffle and sort.
    */
  def binPack(df: DataFrame, strataCols: Seq[String], idCol: String,
              lenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(strataCols.nonEmpty, "binPack needs at least one stratum column")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df
      .repartition(strataCols.map(col): _*)
      .sortWithinPartitions((strataCols :+ idCol).map(col): _*)
    // resolve columns case-insensitively (the SQL surface's fieldIdx
    // convention) and type-check lenCol UP FRONT: a missing or non-numeric
    // length column must be a driver-side error, not an executor-side
    // ClassCastException mid-job
    def fieldIdxOf(name: String, what: String): Int = {
      val i = sorted.schema.fields.indexWhere(_.name.equalsIgnoreCase(name))
      require(i >= 0, s"$what: '$name' is not a column of the input " +
        s"(columns: ${sorted.schema.fieldNames.mkString(", ")})")
      i
    }
    val strataIdx = strataCols.map(fieldIdxOf(_, "binPack strata column"))
    val lenIdx = fieldIdxOf(lenCol, "binPack length column")
    sorted.schema.fields(lenIdx).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"binPack length column '$lenCol' must be numeric, got ${other.sql}")
    }
    val outSchema = StructType(sorted.schema.fields :+
      StructField("bin_id", LongType, nullable = false))
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var bin = 0L
      var fill = 0L
      it.map { r =>
        val key = strataIdx.map(r.get)
        if (key != curKey) { curKey = key; bin = 0L; fill = 0L }
        val len = if (r.isNullAt(lenIdx)) 0L
          else r.get(lenIdx).asInstanceOf[Number].longValue()
        if (fill > 0L && fill + len > budget) { bin += 1L; fill = len }
        else fill += len
        Row.fromSeq(r.toSeq :+ bin)
      }
    }(Encoders.row(outSchema))
  }

  /** SFT chat-template assembly — the conversation → training-text step:
    * each conversation's turns render as `<|role|>content<|end|>` blocks
    * in turn order, concatenated into one training string, with the
    * 1-based inclusive character spans of the ASSISTANT blocks (content +
    * end tag — the tokens the loss applies to) emitted alongside as
    * `start-end` pairs. All offsets are exact cumulative-length
    * arithmetic, so any engine replays text and mask bit-for-bit.
    *
    * Scale shape: one conversation-key shuffle; block rendering and
    * lengths are map-side; the per-conversation window and the ordered
    * aggregation reuse the same partitioning. Conversations are the unit
    * of parallelism — turns-per-conversation is small by construction.
    */
  def assembleChat(turns: DataFrame, convCol: String, idxCol: String,
                   roleCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val blocks = turns.select(col(convCol).as("conv_id"),
        col(idxCol).as("idx"), col(roleCol).as("role"),
        concat(lit("<|"), col(roleCol), lit("|>"), col(textCol),
          lit("<|end|>")).as("block"))
      .withColumn("len", length(col("block")).cast("long"))
      .withColumn("start", coalesce(sum(col("len")).over(w), lit(0L)) + 1L)
      .withColumn("end", col("start") + col("len") - 1L)
    blocks.groupBy(col("conv_id"))
      .agg(
        count(lit(1)).cast("long").as("n_turns"),
        array_join(transform(array_sort(collect_list(
          struct(col("idx"), col("block").as("b")))), s => s.getField("b")), "")
          .as("text"),
        array_join(transform(array_sort(collect_list(
          when(col("role") === "assistant",
            struct(col("idx"), concat(col("start"), lit("-"), col("end")).as("sp"))))),
          s => s.getField("sp")), ",").as("assistant_spans"))
      .select(col("conv_id"), col("n_turns"), col("text"), col("assistant_spans"))
  }
}
