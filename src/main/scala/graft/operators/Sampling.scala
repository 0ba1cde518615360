package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the composition stage of a training-data
  * pipeline (beyond-reference LLM-data operator, sibling of Dedup/TextFns):
  * subsample strata and re-weight source/language mixtures BEFORE the
  * expensive downstream stages (dedup mining, embedding).
  *
  * Everything is hash-gated, never RNG-gated: the portable unit hash
  * (md5 prefix, same family as Dedup.minHashLsh's portable mode) makes
  * every sample a pure function of (id, salt) — reproducible across runs,
  * partitionings and cluster sizes, trivially auditable cross-engine, and
  * stable under incremental re-runs (a doc's keep/drop verdict never
  * changes when the corpus around it grows, unlike rand(seed) which
  * depends on row order per partition).
  *
  * Scale shape: `hashSample`/`mixture` are map-side filters (the only
  * shuffle in `mixture` is the stratum-count aggregate, whose result is
  * broadcast back); `stratifiedK` shuffles once on the stratum key and
  * rank-prunes with one window pass.
  */
object Sampling {

  /** Portable uniform in [0,1): first 8 md5 hex digits of `salt:id`,
    * parsed as an unsigned 32-bit numerator. DuckDB computes the same
    * value as `CAST('0x' || substr(md5(salt || ':' || id), 1, 8) AS
    * BIGINT) / 4294967296.0`.
    */
  def unitHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Deterministic Bernoulli sample: keep rows whose unit hash < rate.
    * A pure map-side filter — pushes below any downstream shuffle.
    */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 salt: String = "s"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(unitHash(col(idCol), salt) < rate)
  }

  /** Deterministic train/validation/test SPLIT: each row's unit hash falls
    * into one label's cumulative-weight interval. Disjoint and exhaustive
    * by construction, and STABLE under corpus growth (a doc's split never
    * changes when other docs arrive — the property rand(seed) splits
    * lack, and the one that keeps eval sets eval). Map-side.
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val u = unitHash(col(idCol), salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // last label catches everything (u < 1 always, but guard fp drift)
    val expr = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((label, _), bound), acc) =>
      when(u < bound, label).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic training-order SHARDING: shard = portable hash of the
    * id, order within a shard = (md5, id) — the "global shuffle" step
    * before writing training shards, reproducible across runs/engines
    * (rand-based shuffles are not). One shuffle on the shard key; the
    * within-shard sort is in-partition. Scale note: a shard is the
    * ranking-parallelism unit — pick nShards at least the cluster's
    * task parallelism (training shards number in the thousands anyway).
    */
  def shardOrder(df: DataFrame, idCol: String, nShards: Int,
                 salt: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = conv(substring(md5(concat(lit(salt), lit(":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("shard", (h % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Exactly min(k, |stratum|) rows per stratum, uniformly by hash rank —
    * the deterministic equivalent of per-stratum reservoir sampling. The
    * rank orders on the md5 string itself (id tie-break), so any engine
    * reproduces the exact same sample.
    */
  def stratifiedK(df: DataFrame, strataCols: Seq[String], idCol: String,
                  k: Int, salt: String = "s"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k).drop("__rk")
  }

  /** Resample to target mixture proportions over `stratumCol`: compute the
    * largest total T that achieves `weights` exactly without oversampling
    * any stratum (T = min over strata of N_s / w_s), gate each stratum at
    * rate w_s·T / N_s. Strata absent from `weights` are dropped (weight 0).
    * One count aggregate (broadcast back), then a map-side hash gate.
    */
  def mixture(df: DataFrame, stratumCol: String, idCol: String,
              weights: Map[String, Double], salt: String = "m"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val wlit = map(weights.toSeq.flatMap { case (s, v) => Seq(lit(s), lit(v)) }: _*)
    val counts = df.groupBy(col(stratumCol).as("__st"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", element_at(wlit, col("__st")))
      .filter(col("__w").isNotNull)
    // T = min(N_s / w_s): the largest sampled total with exact proportions.
    // Computed as a global window over the counts relation (one row per
    // stratum) — a separate agg would re-scan the whole corpus for the
    // second aggregate; the single-task window runs over #strata rows only.
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rates = counts
      .withColumn("__t", min(col("__n") / col("__w")).over(wAll))
      .select(col("__st"), least(lit(1.0), col("__w") * col("__t") / col("__n")).as("__rate"))
    df.join(broadcast(rates), col(stratumCol) === col("__st"), "inner")
      .filter(unitHash(col(idCol), salt) < col("__rate"))
      .drop("__st", "__rate")
  }

  /** Budget-constrained corpus selection: keep the best-scoring rows whose
    * cumulative cost (tokens, chars, bytes) stays within `budget` — the
    * greedy quality-first pick behind "train on the best N tokens of the
    * corpus". Deterministic: ties on score break by `idCol`. A row is kept
    * iff the running cost INCLUDING it fits, so selection is a prefix of
    * the (score DESC, id) order and any engine replays it exactly.
    *
    * Scale: an UNPARTITIONED running-sum window would drag the whole
    * corpus through one task, so the prefix sum is two-level instead:
    * range-partition on the selection order (partition p's rows all
    * precede partition p+1's), running sum WITHIN each range partition,
    * plus each partition's broadcast base offset (the tiny per-partition
    * totals relation, cumulated driver-free). Two exchanges + one
    * broadcast; no task ever holds more than its range slice.
    */
  def selectBudget(df: DataFrame, idCol: String, scoreCol: String,
                   costCol: String, budget: Long,
                   onPersist: Option[DataFrame => Unit] = None): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    // persisted: the range partitioner SAMPLES its boundaries, so the two
    // consumers (offsets + main) must read one materialization — a
    // re-evaluated exchange could split rows differently and the offsets
    // would describe the wrong partitioning.
    // Lifetime: by default the cached relation is freed INTERNALLY — the
    // result is eagerly materialized (localCheckpoint, same discipline as
    // Graph.pageRank) and `ranged` unpersisted before returning, so
    // repeated calls never leak a corpus-sized cache for the session's
    // lifetime. Callers who want the lazy plan instead pass
    // `onPersist = Some(cb)` and own the unpersist.
    val ranged = df
      .repartitionByRange(col(scoreCol).desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist.foreach(cb => cb(ranged))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(scoreCol).desc, col(idCol))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // per-partition base offsets: one row per range partition — tiny, and
    // the only place an unpartitioned window runs
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col(costCol).cast("long")).as("__ptot"))
      .withColumn("__off", coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    val out = ranged
      .withColumn("__cum", sum(col(costCol).cast("long")).over(wIn))
      .join(broadcast(offsets), Seq("__pid"))
      .filter(col("__off") + col("__cum") <= budget)
      .drop("__pid", "__cum", "__off")
    if (onPersist.isDefined) out
    else {
      val res = out.localCheckpoint(true)
      ranged.unpersist()
      res
    }
  }
}
