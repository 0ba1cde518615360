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

    // Hard-negative mining (contrastive-training data prep): each anchor's
    // top-5 most-similar corpus vectors with a DIFFERENT label — the gate
    // applies before ranking so excluded positives never consume a slot.
    QueryDef(
      "q_sim_hardneg",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val anchors = e.filter(col("vec_id") < 10)
        val corpus = e.filter(col("vec_id") >= 10)
        Similarity.hardNegatives(anchors, corpus,
            "vec_id", "vec_id", "label", "embedding", k = 5)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings),
             |scored AS (
             |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv), z -> z[1] * z[2])) AS DOUBLE)
             |      / (sqrt(CAST(list_sum(list_transform(a.qv, x -> x * x)) AS DOUBLE))
             |         * sqrt(CAST(list_sum(list_transform(b.qv, x -> x * x)) AS DOUBLE))) AS sim
             |  FROM q a JOIN q b ON a.vec_id < 10 AND b.vec_id >= 10
             |    AND a.label <> b.label),
             |ranked AS (
             |  SELECT q_id, c_id, sim,
             |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rnk
             |  FROM scored)
             |SELECT q_id, rnk, c_id, sim FROM ranked WHERE rnk <= 5
             |ORDER BY q_id, rnk""".stripMargin)),

    // ANN via quantized sign-LSH buckets with a FULL oracle: integer plane
    // weights (Similarity.planesQ — inlined as literals into BOTH engines),
    // exact BIGINT dot signs for bucketing, Hamming-1 multi-probe, exact
    // quantized-cosine scoring. DuckDB recomputes buckets, probes,
    // candidates and the top-5 bit-exactly. The float-cosine annTopK path
    // stays covered by SimilaritySpec's recall checks.
    QueryDef(
      "q_sim_ann_lsh",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
        val corpus  = e.filter(col("vec_id") >= 10)
        Similarity.annTopKQuantized(queries, corpus, "vec_id", "vec_id",
            "embedding", k = 5, numPlanes = 8, dim = 64)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(annLshOracle)),

    // ANN via IVF coarse lists with a FULL oracle: centroids are the corpus
    // vectors with vec_id 10..17 (data-derived, oracle-reproducible),
    // assignment/probing/scoring all exact quantized cosine with
    // (sim DESC, list ASC) tie-breaks. The k-means-trained ivfTopK path
    // (nprobe==nlist ≡ brute force, recall) stays covered by LlmOpsSpec.
    QueryDef(
      "q_sim_ivf",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
        val corpus  = e.filter(col("vec_id") >= 10)
        Similarity.ivfTopKQuantized(queries, corpus,
            "vec_id", "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4,
            centroidIds = (10L until 18L))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(ivfOracle)),

    // PQ/ADC top-k with a FULL oracle: 16 data-derived codebook rows
    // (vec_ids 10..25), exact integer squared-L2 encode (ties to the
    // smallest codeword), BIGINT ADC sums, (dist ASC, c_id ASC) ranking —
    // the 32x memory-compression path for billion-vector indexes, every
    // step replayed by DuckDB.
    QueryDef(
      "q_sim_pq",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
        val corpus  = e.filter(col("vec_id") >= 10)
        Similarity.pqTopKQuantized(queries, corpus, "vec_id", "vec_id",
            "embedding", k = 5, codebookIds = (10L until 26L))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(pqOracle)),

    // IVF + PQ composed (the FAISS IVFPQ production pairing): coarse L2
    // lists (centroids 10..17) prune, PQ/ADC codes (codebook 10..25)
    // score; all exact integer with (d ASC, idx ASC) tie rules — DuckDB
    // replays assignment, probe sets, codes and ranking bit-for-bit.
    QueryDef(
      "q_sim_ivfpq",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
        val corpus  = e.filter(col("vec_id") >= 10)
        Similarity.ivfPqTopKQuantized(queries, corpus, "vec_id", "vec_id",
            "embedding", k = 5, nprobe = 4,
            centroidIds = (10L until 18L), codebookIds = (10L until 26L))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(ivfPqOracle)),

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
             |GROUP BY label, d.d ORDER BY label, dim""".stripMargin)),

    // Distributed Lloyd k-means (k=4, 2 iterations) with exact integer
    // arithmetic end-to-end: init = 4 lowest vec_ids, map-side argmin
    // assignment against driver-held centroid literals, floor(sum/count)
    // centroid update. DuckDB replays both iterations (chained CTEs) and
    // every final (cluster, dist_sq) matches bit-for-bit.
    QueryDef(
      "q_sim_kmeans",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        Similarity.kmeansAssignQuantized(e, "vec_id", "embedding",
            k = 4, iters = 2)
          .orderBy(col("vec_id"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings),
             |c0 AS (
             |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl, qv
             |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 4)),
             |a1 AS (
             |  SELECT q.vec_id, q.qv, best.cl
             |  FROM q, LATERAL (
             |    SELECT c.cl FROM c0 c
             |    ORDER BY list_sum(list_transform(list_zip(q.qv, c.qv),
             |      z -> (z[1]-z[2])*(z[1]-z[2]))) ASC, c.cl ASC LIMIT 1) best),
             |s1 AS (
             |  SELECT a.cl, d.i AS dim, CAST(sum(a.qv[d.i + 1]) AS BIGINT) AS s,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM a1 a, LATERAL (SELECT unnest(range(0, 64)) AS i) d
             |  GROUP BY a.cl, d.i),
             |c1v AS (
             |  SELECT cl, list((s - ((s % n) + n) % n) // n ORDER BY dim) AS qv
             |  FROM s1 GROUP BY cl),
             |c1 AS (SELECT c0.cl, coalesce(c1v.qv, c0.qv) AS qv FROM c0 LEFT JOIN c1v USING (cl)),
             |a2 AS (
             |  SELECT q.vec_id, q.qv, best.cl
             |  FROM q, LATERAL (
             |    SELECT c.cl FROM c1 c
             |    ORDER BY list_sum(list_transform(list_zip(q.qv, c.qv),
             |      z -> (z[1]-z[2])*(z[1]-z[2]))) ASC, c.cl ASC LIMIT 1) best),
             |s2 AS (
             |  SELECT a.cl, d.i AS dim, CAST(sum(a.qv[d.i + 1]) AS BIGINT) AS s,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM a2 a, LATERAL (SELECT unnest(range(0, 64)) AS i) d
             |  GROUP BY a.cl, d.i),
             |c2v AS (
             |  SELECT cl, list((s - ((s % n) + n) % n) // n ORDER BY dim) AS qv
             |  FROM s2 GROUP BY cl),
             |c2 AS (SELECT c1.cl, coalesce(c2v.qv, c1.qv) AS qv FROM c1 LEFT JOIN c2v USING (cl))
             |SELECT q.vec_id, CAST(best.cl AS BIGINT) AS cluster, CAST(best.d AS BIGINT) AS dist_sq
             |FROM q, LATERAL (
             |  SELECT c.cl, list_sum(list_transform(list_zip(q.qv, c.qv),
             |    z -> (z[1]-z[2])*(z[1]-z[2]))) AS d
             |  FROM c2 c ORDER BY d ASC, c.cl ASC LIMIT 1) best
             |ORDER BY vec_id""".stripMargin)),

    // SEMANTIC decontamination: eval set = vectors 0..24 (broadcast
    // probes); the corpus is the remaining vectors plus the probes
    // re-keyed verbatim (+1000) as staged leaks — exactly those 25 rows
    // must flag at sim = 1.0 while the genuine corpus stays below 0.5.
    // Exact quantized cosine, lowest-probe-id ties; DuckDB replays every
    // similarity and verdict bit-for-bit.
    QueryDef(
      "q_sim_decontam",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val probes = e.filter(col("vec_id") < 25)
        val corpus = e.filter(col("vec_id") >= 25)
          .select(col("vec_id"), col("embedding"))
          .unionByName(probes.select((col("vec_id") + 1000L).as("vec_id"),
            col("embedding")))
        Similarity.semanticDecontam(corpus, probes, "vec_id", "vec_id",
            "embedding", threshold = 0.9)
          .orderBy(col("c_id"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings),
             |probes AS (SELECT vec_id AS p_id, qv FROM q WHERE vec_id < 25),
             |corpus AS (
             |  SELECT vec_id AS c_id, qv FROM q WHERE vec_id >= 25
             |  UNION ALL
             |  SELECT p_id + 1000 AS c_id, qv FROM probes),
             |scored AS (
             |  SELECT c.c_id, p.p_id,
             |    CAST(list_sum(list_transform(list_zip(p.qv, c.qv), z -> z[1] * z[2])) AS DOUBLE)
             |      / (sqrt(CAST(list_sum(list_transform(p.qv, x -> x * x)) AS DOUBLE))
             |         * sqrt(CAST(list_sum(list_transform(c.qv, x -> x * x)) AS DOUBLE))) AS sim
             |  FROM corpus c CROSS JOIN probes p),
             |best AS (
             |  SELECT c_id, p_id AS probe_id, sim AS best_sim,
             |    row_number() OVER (PARTITION BY c_id ORDER BY sim DESC, p_id) AS rn
             |  FROM scored)
             |SELECT c_id, best_sim, probe_id, best_sim > 0.9 AS contaminated
             |FROM best WHERE rn = 1 ORDER BY c_id""".stripMargin))
  )

  /** The exact quantized-cosine expression both oracles share (DuckDB SQL,
    * identical arithmetic to VectorFns.cosineQ: BIGINT dot and norms, one
    * double division at the end).
    */
  private def qcos(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(list_zip($a, $b), z -> z[1]*z[2])) AS DOUBLE)
       |     / (sqrt(CAST(list_sum(list_transform($a, x -> x*x)) AS DOUBLE))
       |        * sqrt(CAST(list_sum(list_transform($b, x -> x*x)) AS DOUBLE)))""".stripMargin

  /** DuckDB replica of annTopKQuantized (8 planes, dim 64, k=5, scale 1e4,
    * Hamming-1 multi-probe): the SAME integer plane literals Similarity
    * .planesQ generates are inlined here, so bucket bits — signs of exact
    * BIGINT dots — match by construction.
    */
  private def annLshOracle: String = {
    val P = 8
    val planes = Similarity.planesQ(P, 64)
    val bucketExpr = planes.zipWithIndex.map { case (pl, p) =>
      val plit = pl.mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip(qv, $plit), z -> z[1]*z[2])) >= 0 THEN 1 ELSE 0 END << $p)"
    }.mkString("\n    + ")
    val masks = (0L +: (0 until P).map(p => 1L << p)).mkString("[", ",", "]")
    s"""WITH q0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |bkt AS (SELECT vec_id, qv, $bucketExpr AS bucket FROM q0),
       |qside AS (
       |  SELECT vec_id AS q_id, xor(bucket, m.m) AS bucket
       |  FROM bkt, LATERAL (SELECT unnest($masks) AS m) m WHERE vec_id < 10),
       |cside AS (SELECT vec_id AS c_id, bucket FROM bkt WHERE vec_id >= 10),
       |cand AS (SELECT DISTINCT q_id, c_id FROM qside JOIN cside USING (bucket)),
       |scored AS (
       |  SELECT c.q_id, c.c_id,
       |    ${qcos("a.qv", "b.qv")} AS sim
       |  FROM cand c JOIN q0 a ON a.vec_id = c.q_id JOIN q0 b ON b.vec_id = c.c_id),
       |ranked AS (
       |  SELECT q_id, c_id, sim, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rnk
       |  FROM scored)
       |SELECT q_id, rnk, c_id, sim FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
  }

  /** DuckDB replica of pqTopKQuantized (m=8 blocks of 8 dims, 16 codewords
    * = corpus vectors 10..25, k=5): same integer squared-L2 block
    * distances, same (d ASC, j ASC) encode tie rule, same BIGINT ADC sums,
    * same (dist ASC, c_id ASC) ranking.
    */
  private def pqOracle: String = {
    val M = 8; val SUB = 8; val K = 5
    def sd(v: String, c: String): String =
      s"list_sum(list_transform(range(0, $SUB), i -> " +
        s"($v[m.m * $SUB + i + 1] - $c[m.m * $SUB + i + 1]) * " +
        s"($v[m.m * $SUB + i + 1] - $c[m.m * $SUB + i + 1])))"
    s"""WITH q0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |cb AS (SELECT vec_id - 10 AS j, qv AS cv FROM q0 WHERE vec_id >= 10 AND vec_id < 26),
       |bd AS (
       |  SELECT v.vec_id, m.m, c.j, ${sd("v.qv", "c.cv")} AS d
       |  FROM q0 v CROSS JOIN (SELECT unnest(range(0, $M)) AS m) m CROSS JOIN cb c),
       |enc AS (
       |  SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
       |    FROM bd WHERE vec_id >= 10) WHERE rn = 1),
       |qtab AS (SELECT vec_id AS q_id, m, j, d FROM bd WHERE vec_id < 10),
       |adc AS (
       |  SELECT t.q_id, e.vec_id AS c_id, CAST(sum(t.d) AS BIGINT) AS dist
       |  FROM enc e JOIN qtab t USING (m, j)
       |  GROUP BY t.q_id, e.vec_id),
       |ranked AS (
       |  SELECT q_id, c_id, dist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS rnk
       |  FROM adc)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, c_id, dist
       |FROM ranked WHERE rnk <= $K ORDER BY q_id, rnk""".stripMargin
  }

  /** DuckDB replica of ivfPqTopKQuantized (centroids 10..17, 16-codeword
    * books 10..25, nprobe=4, m=8, k=5): full-vector L2 assignment/probe
    * with (d ASC, list ASC) ties, the pqOracle encode/table machinery, ADC
    * restricted to probed lists.
    */
  private def ivfPqOracle: String = {
    val M = 8; val SUB = 8; val K = 5; val NPROBE = 4
    def sd(v: String, c: String): String =
      s"list_sum(list_transform(range(0, $SUB), i -> " +
        s"($v[m.m * $SUB + i + 1] - $c[m.m * $SUB + i + 1]) * " +
        s"($v[m.m * $SUB + i + 1] - $c[m.m * $SUB + i + 1])))"
    s"""WITH q0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |cents AS (SELECT vec_id - 10 AS list, qv AS cv FROM q0 WHERE vec_id >= 10 AND vec_id < 18),
       |cb AS (SELECT vec_id - 10 AS j, qv AS cv FROM q0 WHERE vec_id >= 10 AND vec_id < 26),
       |cl AS (
       |  SELECT v.vec_id, c.list,
       |    list_sum(list_transform(range(1, 65),
       |      i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS d
       |  FROM q0 v CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, list FROM (
       |    SELECT vec_id, list, row_number() OVER (PARTITION BY vec_id ORDER BY d, list) AS rn
       |    FROM cl WHERE vec_id >= 10) WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id AS q_id, list FROM (
       |    SELECT vec_id, list, row_number() OVER (PARTITION BY vec_id ORDER BY d, list) AS rn
       |    FROM cl WHERE vec_id < 10) WHERE rn <= $NPROBE),
       |bd AS (
       |  SELECT v.vec_id, m.m, c.j, ${sd("v.qv", "c.cv")} AS d
       |  FROM q0 v CROSS JOIN (SELECT unnest(range(0, $M)) AS m) m CROSS JOIN cb c),
       |enc AS (
       |  SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
       |    FROM bd WHERE vec_id >= 10) WHERE rn = 1),
       |qtab AS (SELECT vec_id AS q_id, m, j, d FROM bd WHERE vec_id < 10),
       |adc AS (
       |  SELECT t.q_id, e.vec_id AS c_id, CAST(sum(t.d) AS BIGINT) AS dist
       |  FROM enc e
       |  JOIN assign a ON a.vec_id = e.vec_id
       |  JOIN qprobe p ON p.list = a.list
       |  JOIN qtab t ON t.q_id = p.q_id AND t.m = e.m AND t.j = e.j
       |  GROUP BY t.q_id, e.vec_id),
       |ranked AS (
       |  SELECT q_id, c_id, dist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS rnk
       |  FROM adc)
       |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, c_id, dist
       |FROM ranked WHERE rnk <= $K ORDER BY q_id, rnk""".stripMargin
  }

  /** DuckDB replica of ivfTopKQuantized (nlist=8, nprobe=4, k=5, centroids =
    * corpus vectors 10..17): same assignment argmax, same probe ranking,
    * same tie-breaks, same quantized-cosine scores.
    */
  private def ivfOracle: String =
    s"""WITH q0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id - 10 AS list, qv AS cv FROM q0 WHERE vec_id >= 10 AND vec_id < 18),
       |csim AS (
       |  SELECT v.vec_id, c.list,
       |    ${qcos("v.qv", "c.cv")} AS sim
       |  FROM q0 v CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, list FROM (
       |    SELECT vec_id, list, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list) AS rn
       |    FROM csim) WHERE rn = 1),
       |cside AS (
       |  SELECT a.list, v.vec_id AS c_id FROM assign a JOIN q0 v USING (vec_id) WHERE v.vec_id >= 10),
       |qprobe AS (
       |  SELECT vec_id AS q_id, list FROM (
       |    SELECT vec_id, list, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list) AS rn
       |    FROM csim WHERE vec_id < 10) WHERE rn <= 4),
       |scored AS (
       |  SELECT p.q_id, c.c_id,
       |    ${qcos("a.qv", "b.qv")} AS sim
       |  FROM qprobe p JOIN cside c USING (list)
       |  JOIN q0 a ON a.vec_id = p.q_id JOIN q0 b ON b.vec_id = c.c_id),
       |ranked AS (
       |  SELECT q_id, c_id, sim, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rnk FROM scored)
       |SELECT q_id, rnk, c_id, sim FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
}
