package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set is the small side — it broadcasts; the corpus
  * never shuffles for the brute-force path (one scan, per-partition top-k,
  * k-row combine). The LSH path buckets the corpus once (linear) and probes
  * only matching buckets.
  */
object Similarity {

  /** Per-query top-k via the bounded [[TopKBySim]] aggregator: partial
    * aggregation keeps at most k entries per (partition, query) ahead of the
    * shuffle — the heap+combine shape, vs a rank window's full sort of every
    * scored row. The aggregator buffer keys ids as longs; non-integral id
    * types fall back to the rank window (same order contract) instead of
    * silently nulling ids through a cast.
    */
  private def topKSelect(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integralId = scored.schema("c_id").dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (integralId)
      scored.groupBy(col("q_id"))
        .agg(TopK.bySim(k)(col("c_id").cast("long"), col("sim")).as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("q_id"), (col("pos") + 1).cast("long").as("rnk"),
          col("e.c_id").as("c_id"), col("e.sim").as("sim"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("q_id"), col("rnk"), col("c_id"), col("sim"))
    }
  }

  /** Exact brute-force cosine top-k: broadcast queries × one corpus scan,
    * bounded top-k aggregation (no full sort anywhere).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qIdCol: String, cIdCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(cIdCol).as("c_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q))
      .withColumn("sim", VectorFns.cosine(col("q_vec"), col("c_vec")))
    topKSelect(scored, k)
  }

  /** Quantized variant (exact integer dot/norms, see VectorFns.cosineQ) —
    * the cross-engine-reproducible path and the practical storage format at
    * scale (int16 components, 4x narrower shuffles).
    */
  def bruteForceTopKQuantized(queries: DataFrame, corpus: DataFrame,
                              qIdCol: String, cIdCol: String, vecCol: String,
                              k: Int, scale: Int = 10000): DataFrame = {
    val q = queries.select(col(qIdCol).as("q_id"),
      VectorFns.quantize(col(vecCol), scale).as("q_vec"))
    val c = corpus.select(col(cIdCol).as("c_id"),
      VectorFns.quantize(col(vecCol), scale).as("c_vec"))
    val scored = c.join(broadcast(q))
      .withColumn("sim", VectorFns.cosineQ(col("q_vec"), col("c_vec")))
    topKSelect(scored, k)
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component j of
    * plane p derives from mix64(p*dim + j), mapped to [-0.5, 0.5).
    */
  private def planes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { j =>
        val h = graft.functions.TextHash.mix64(p.toLong * dim + j)
        (h.toDouble / Long.MaxValue.toDouble) / 2.0
      }
    }

  /** Random-hyperplane LSH bucket id (numPlanes sign bits) for each vector.
    * Bucketing is a narrow map — no shuffle until the probe join.
    */
  def lshBucket(df: DataFrame, vecCol: String, numPlanes: Int, dim: Int): DataFrame = {
    val ps = planes(numPlanes, dim)
    val bucket = ps.zipWithIndex.map { case (plane, p) =>
      val dot = aggregate(
        zip_with(col(vecCol), typedlit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (s, v) => s + v)
      when(dot >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("lsh_bucket", bucket)
  }

  /** ANN top-k: probe same-bucket candidates plus, with multiProbe, every
    * bucket at Hamming distance 1 from the query's bucket (flip each sign
    * bit once) — the standard multi-probe LSH recall fix for near-boundary
    * vectors. Candidate step stays corpus-linear; the query side (small,
    * broadcast) carries the probe expansion.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame,
              qIdCol: String, cIdCol: String, vecCol: String,
              k: Int, numPlanes: Int, dim: Int,
              multiProbe: Boolean = true): DataFrame = {
    val qBase = lshBucket(queries, vecCol, numPlanes, dim)
      .select(col(qIdCol).as("q_id"), col(vecCol).as("q_vec"), col("lsh_bucket"))
    val q =
      if (!multiProbe) qBase
      else qBase.withColumn("lsh_bucket",
          explode(array((lit(0L) +: (0 until numPlanes).map(p => lit(1L << p)))
            .map(m => col("lsh_bucket").bitwiseXOR(m)): _*)))
    val c = lshBucket(corpus, vecCol, numPlanes, dim)
      .select(col(cIdCol).as("c_id"), col(vecCol).as("c_vec"), col("lsh_bucket"))
    val scored = c.join(broadcast(q), Seq("lsh_bucket"))
      .withColumn("sim", VectorFns.cosine(col("q_vec"), col("c_vec")))
      .dropDuplicates("q_id", "c_id")
    topKSelect(scored, k)
  }
}
