package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity search over `embeddings` (beyond-reference LLM-data surface).
  * Brute-force top-k uses the quantized cosine (bit-exact oracle); the
  * LSH-bucketed ANN path is engine-specific (rows-only + spec-level recall
  * check against brute force).
  */
object SimilarityQueries extends QueryFamily {

  def defs: Seq[QueryDef] = Seq(

    // Exact top-5 neighbors for a 10-vector query set: broadcast queries,
    // single corpus scan, per-query rank.
    QueryDef(
      "q_sim_topk",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
        val corpus  = e.filter(col("vec_id") >= 10)
        Similarity.bruteForceTopKQuantized(queries, corpus,
            "vec_id", "vec_id", "embedding", k = 5)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings),
             |scored AS (
             |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv), z -> z[1] * z[2])) AS DOUBLE)
             |      / (sqrt(CAST(list_sum(list_transform(a.qv, x -> x * x)) AS DOUBLE))
             |         * sqrt(CAST(list_sum(list_transform(b.qv, x -> x * x)) AS DOUBLE))) AS sim
             |  FROM q a JOIN q b ON a.vec_id < 10 AND b.vec_id >= 10),
             |ranked AS (
             |  SELECT q_id, c_id, sim,
             |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rnk
             |  FROM scored)
             |SELECT q_id, rnk, c_id, sim FROM ranked WHERE rnk <= 5
             |ORDER BY q_id, rnk""".stripMargin)),

    // ANN via random-hyperplane LSH buckets (rows-only check; recall vs
    // brute force asserted in SimilaritySpec).
    QueryDef(
      "q_sim_ann_lsh",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
        val corpus  = e.filter(col("vec_id") >= 10)
        Similarity.annTopK(queries, corpus, "vec_id", "vec_id", "embedding",
            k = 5, numPlanes = 8, dim = 64)
          .withColumn("sim", round(col("sim"), 6))
          .orderBy(col("q_id"), col("rnk"))
      },
      None),

    // ANN via IVF coarse quantizer (rows-only check; the nprobe==nlist
    // exact-equality and partial-probe recall contracts are asserted in
    // LlmOpsSpec — deterministic k-means, so rows are stable).
    QueryDef(
      "q_sim_ivf",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
        val corpus  = e.filter(col("vec_id") >= 10)
        Similarity.ivfTopK(queries, corpus,
            "vec_id", "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4)
          .withColumn("sim", round(col("sim"), 6))
          .orderBy(col("q_id"), col("rnk"))
      },
      None),

    // Centroid distance per label — embedding analytics shape: elementwise
    // array aggregation without exploding (posexplode would be 64x rows;
    // here we aggregate the quantized arrays summed per label).
    QueryDef(
      "q_sim_centroid",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
          .select(col("label").cast("long").as("label"),
            slice(graft.functions.VectorFns.quantize(col("embedding"), 10000), 1, 4).as("qv"))
          .select(col("label"), posexplode(col("qv")).as(Seq("dim", "v")))
          .select(col("label"), col("dim").cast("long").as("dim"), col("v"))
        e.groupBy(col("label"), col("dim"))
          .agg(sum(col("v")).as("sum_q"), count(lit(1)).as("n"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""WITH q AS (
             |  SELECT CAST(label AS BIGINT) AS label,
             |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings)
             |SELECT label, d.d AS dim, CAST(sum(qv[d.d + 1]) AS BIGINT) AS sum_q, count(*) AS n
             |FROM q CROSS JOIN (SELECT unnest(range(0, 4)) AS d) d
             |GROUP BY label, d.d ORDER BY label, dim""".stripMargin))
  )
}
