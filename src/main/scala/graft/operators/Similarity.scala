package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Hard-negative mining for contrastive training: for each anchor, the
    * top-k most-similar corpus items whose LABEL DIFFERS — same-class
    * neighbors are positives, not negatives, so the label gate applies
    * BEFORE ranking (an excluded same-class hit must not consume a rank
    * slot). Same broadcast + quantized-cosine plumbing as
    * [[bruteForceTopKQuantized]]; at 100 TB the anchors broadcast (the
    * anchor set is the small side by construction) and the corpus is
    * scanned map-side once.
    */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame,
                    qIdCol: String, cIdCol: String, labelCol: String,
                    vecCol: String, k: Int, scale: Int = 10000): DataFrame = {
    val q = anchors.select(col(qIdCol).as("q_id"), col(labelCol).as("q_lbl"),
      VectorFns.quantize(col(vecCol), scale).as("q_vec"))
    val c = corpus.select(col(cIdCol).as("c_id"), col(labelCol).as("c_lbl"),
      VectorFns.quantize(col(vecCol), scale).as("c_vec"))
    val scored = c.join(broadcast(q))
      .filter(col("q_lbl") =!= col("c_lbl"))
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

  /** Deterministic INTEGER plane weights in [-5000, 5000] for the quantized
    * sign-LSH path: component j of plane p derives from mix64(p*dim + j).
    * Integers are the point — the bucket bit is the sign of an exact BIGINT
    * dot product, so any engine given the same literal weights computes the
    * same buckets (no float rounding at the sign boundary).
    */
  def planesQ(numPlanes: Int, dim: Int): Seq[Seq[Long]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { j =>
        Math.floorMod(graft.functions.TextHash.mix64(p.toLong * dim + j), 10001L) - 5000L
      }
    }

  /** Quantized sign-LSH ANN top-k: vectors quantize to BIGINT components
    * (scale 1e4), bucket bits are signs of exact integer dots against the
    * literal [[planesQ]] weights, and the final similarity is the exact
    * quantized cosine — every stage is integer-or-deterministic-double, so
    * candidates AND scores reproduce bit-exactly cross-engine (the
    * q_sim_ann_lsh oracle path). Plan shape identical to [[annTopK]]:
    * corpus-linear bucketing, broadcast query side carrying the Hamming-1
    * multi-probe expansion, pair dedup, bounded top-k aggregation.
    */
  def annTopKQuantized(queries: DataFrame, corpus: DataFrame,
                       qIdCol: String, cIdCol: String, vecCol: String,
                       k: Int, numPlanes: Int, dim: Int,
                       scale: Int = 10000, multiProbe: Boolean = true): DataFrame = {
    val ps = planesQ(numPlanes, dim)
    def bucketOf(qv: Column): Column =
      ps.zipWithIndex.map { case (plane, p) =>
        val dot = aggregate(
          zip_with(qv, typedlit(plane), (x, w) => x * w),
          lit(0L), (s, v) => s + v)
        when(dot >= 0L, lit(1L << p)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    val qBase = queries.select(col(qIdCol).as("q_id"),
        VectorFns.quantize(col(vecCol), scale).as("q_qv"))
      .withColumn("lsh_bucket", bucketOf(col("q_qv")))
    val q =
      if (!multiProbe) qBase
      else qBase.withColumn("lsh_bucket",
        explode(array((lit(0L) +: (0 until numPlanes).map(p => lit(1L << p)))
          .map(m => col("lsh_bucket").bitwiseXOR(m)): _*)))
    val c = corpus.select(col(cIdCol).as("c_id"),
        VectorFns.quantize(col(vecCol), scale).as("c_qv"))
      .withColumn("lsh_bucket", bucketOf(col("c_qv")))
    val scored = c.join(broadcast(q), Seq("lsh_bucket"))
      .withColumn("sim", VectorFns.cosineQ(col("q_qv"), col("c_qv")))
      .dropDuplicates("q_id", "c_id")
    topKSelect(scored, k)
  }

  // ---- IVF (inverted-file) ANN — the other standard scale path next to
  // sign-LSH (the FAISS IVF-Flat shape): k-means coarse lists over the
  // corpus; queries probe only the nprobe nearest lists. Centroids are
  // nlist × dim doubles (KBs) and live on the driver, so list ASSIGNMENT
  // is a pure projection against literal centroids — corpus-linear, no
  // UDF, no shuffle besides the Lloyd updates (iters × one groupBy) and
  // the final probe join. At 100 TB, train on a corpus sample (the
  // assignment pass is the same either way).

  /** Nearest-centroid list id (argmax cosine) as a literal-centroid
    * projection: an array of (sim, list) structs reduced by array_max
    * (lexicographic — sim first), no shuffle.
    */
  private def assignList(vec: Column, cents: Seq[Seq[Float]]): Column =
    array_max(array(cents.zipWithIndex.map { case (cv, i) =>
      struct(VectorFns.cosine(vec, typedlit(cv)).as("sim"), lit(i).as("list"))
    }: _*)).getField("list")

  /** Deterministic Lloyd k-means: init = the nlist corpus vectors with the
    * smallest xxhash64(id) (a deterministic pseudo-random sample), then
    * `iters` assignment/mean rounds. Empty lists keep their centroid.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int, iters: Int = 3): Seq[Seq[Float]] = {
    var cents: Seq[Seq[Float]] = corpus
      .orderBy(xxhash64(col(idCol)))
      .limit(nlist)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    for (_ <- 0 until iters) {
      val means = corpus
        .withColumn("__list", assignList(col(vecCol), cents))
        .select(col("__list"), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
        .groupBy(col("__list"), col("__pos"))
        .agg(avg(col("__v")).as("__m"))
        .collect().groupBy(_.getInt(0))
      cents = cents.indices.map { i =>
        means.get(i)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq)
          .getOrElse(cents(i))
      }
    }
    cents
  }

  /** IVF top-k: corpus vectors land in exactly one list (so the probe join
    * produces no duplicate (q, c) pairs — unlike multi-probe LSH, no dedup
    * shuffle); each query explodes to its nprobe best lists and broadcasts.
    * nprobe == nlist probes everything and reproduces brute force exactly
    * (the recall/cost dial with an exact endpoint).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              qIdCol: String, cIdCol: String, vecCol: String,
              k: Int, nlist: Int, nprobe: Int, iters: Int = 3): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe $nprobe must be in [1, $nlist]")
    val cents = trainCentroids(corpus, cIdCol, vecCol, nlist, iters)
    val c = corpus.select(col(cIdCol).as("c_id"), col(vecCol).as("c_vec"))
      .withColumn("__list", assignList(col("c_vec"), cents))
    val probeArr = array(cents.zipWithIndex.map { case (cv, i) =>
      struct(VectorFns.cosine(col("q_vec"), typedlit(cv)).as("sim"),
        lit(i).as("list"))
    }: _*)
    val q = queries.select(col(qIdCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("__list",
        explode(slice(reverse(array_sort(probeArr)), 1, nprobe).getField("list")))
    val scored = c.join(broadcast(q), Seq("__list"))
      .withColumn("sim", VectorFns.cosine(col("q_vec"), col("c_vec")))
    topKSelect(scored, k)
  }

  /** Quantized IVF top-k with DATA-DERIVED centroids: the coarse lists are
    * the quantized vectors of `centroidIds` (a deterministic pick of corpus
    * rows — at scale, a hashed sample; k-means refinement is [[ivfTopK]]'s
    * job and stays spec-checked). Assignment, probing and scoring are all
    * exact quantized-cosine computations with (sim DESC, list ASC)
    * tie-breaks, so an oracle engine that looks up the same centroid rows
    * reproduces list membership, probe sets and top-k bit-exactly (the
    * q_sim_ivf oracle path). Plan shape identical to [[ivfTopK]]: literal
    * centroids (KBs, driver-held), assignment as a pure projection, each
    * corpus vector in exactly one list, broadcast probe join.
    */
  def ivfTopKQuantized(queries: DataFrame, corpus: DataFrame,
                       qIdCol: String, cIdCol: String, vecCol: String,
                       k: Int, nlist: Int, nprobe: Int,
                       centroidIds: Seq[Long], scale: Int = 10000): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, s"nprobe $nprobe must be in [1, $nlist]")
    require(centroidIds.size == nlist, "need exactly nlist centroid ids")
    val centRows = corpus
      .filter(col(cIdCol).isin(centroidIds: _*))
      .select(col(cIdCol).cast("long").as("id"),
        VectorFns.quantize(col(vecCol), scale).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val cents: Seq[Seq[Long]] = centroidIds.map(id => centRows.getOrElse(id,
      throw new IllegalArgumentException(s"centroid id $id not in corpus")))
    // (sim, -list) struct max ⇒ ties pick the SMALLEST list index — the
    // cross-engine tie rule (ORDER BY sim DESC, list ASC)
    def simToCent(qv: Column, cv: Seq[Long]): Column =
      VectorFns.cosineQ(qv, typedlit(cv))
    def assignQ(qv: Column): Column =
      -array_max(array(cents.zipWithIndex.map { case (cv, i) =>
        struct(simToCent(qv, cv).as("sim"), lit(-i).as("nl"))
      }: _*)).getField("nl")
    val c = corpus.select(col(cIdCol).as("c_id"),
        VectorFns.quantize(col(vecCol), scale).as("c_qv"))
      .withColumn("__list", assignQ(col("c_qv")))
    val probeArr = array(cents.zipWithIndex.map { case (cv, i) =>
      struct(simToCent(col("q_qv"), cv).as("sim"), lit(-i).as("nl"))
    }: _*)
    val q = queries.select(col(qIdCol).as("q_id"),
        VectorFns.quantize(col(vecCol), scale).as("q_qv"))
      .withColumn("__nl",
        explode(slice(reverse(array_sort(probeArr)), 1, nprobe).getField("nl")))
      .withColumn("__list", -col("__nl"))
      .drop("__nl")
    val scored = c.join(broadcast(q), Seq("__list"))
      .withColumn("sim", VectorFns.cosineQ(col("q_qv"), col("c_qv")))
    topKSelect(scored, k)
  }

  /** PRODUCT-QUANTIZATION top-k (the FAISS PQ/ADC shape) — the
    * memory-compression path for embedding search at 100 TB: a 64-dim
    * float vector (256 B) compresses to `m`=8 one-byte codes (32×), so a
    * billion-vector index fits where raw vectors cannot, and scoring is
    * `m` table lookups per pair instead of a 64-term dot product.
    *
    * Determinism/oracle contract mirrors [[ivfTopKQuantized]]: the
    * per-subspace codebooks are DATA-DERIVED (the quantized vectors of
    * `codebookIds`, sliced per block — k-means refinement is the same
    * upgrade path as ivfTopK's and changes no plumbing), encoding is exact
    * integer squared-L2 argmin with ties to the smallest codeword, and
    * the ADC distance is an exact BIGINT sum of per-block table entries —
    * any engine replaying the arithmetic reproduces codes, tables and
    * top-k bit-for-bit. Ranking: (dist ASC, c_id ASC) through the bounded
    * top-k aggregator (sim = −dist, exact for dist < 2^53).
    *
    * Implementation note: encode and table-build run as PER-PARTITION
    * imperative arithmetic (mapPartitions — the media-decoder precedent),
    * not as Catalyst expressions: the unrolled m×|codebook|×sub tree
    * (~16k nodes) costs the optimizer and codegen tens of seconds per
    * plan while evaluating no faster per row. The ADC join + lookup-sum
    * stays declarative (narrow columns, codegen'd).
    *
    * Production composition: IVF lists ([[ivfTopKQuantized]]) prune
    * candidates, PQ codes score them — independent dials, same plumbing.
    */
  def pqTopKQuantized(queries: DataFrame, corpus: DataFrame,
                      qIdCol: String, cIdCol: String, vecCol: String,
                      k: Int, codebookIds: Seq[Long], dim: Int = 64,
                      m: Int = 8, scale: Int = 10000): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(codebookIds.nonEmpty && codebookIds.size <= 256,
      "codebook must hold 1..256 entries (one-byte codes)")
    val sub = dim / m
    val cbs = lookupQuantized(corpus, cIdCol, vecCol, codebookIds, scale, "codebook")
    val c = encodeCorpus(corpus, cIdCol, vecCol, cbs, dim, m, scale)
    val q = queryTables(queries, qIdCol, vecCol, cbs, dim, m, scale)
    val scored = c.join(broadcast(q))
      .withColumn("dist", (0 until m).map(blk =>
        element_at(element_at(col("tabs"), blk + 1),
          element_at(col("codes"), blk + 1) + 1)).reduce(_ + _))
      .withColumn("sim", -col("dist").cast("double"))
    topKSelect(scored, k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        (-col("sim")).cast("long").as("dist"))
  }

  /** Quantized vectors of `ids`, in order, as driver-held arrays. */
  private def lookupQuantized(corpus: DataFrame, idCol: String, vecCol: String,
                              ids: Seq[Long], scale: Int,
                              what: String): Array[Array[Long]] = {
    val rows = corpus.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).cast("long").as("id"),
        VectorFns.quantize(col(vecCol), scale).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    ids.map(id => rows.getOrElse(id,
      throw new IllegalArgumentException(s"$what id $id not in corpus"))).toArray
  }

  /** VectorFns.quantize semantics in Scala: floor(x·scale + 0.5) as long
    * (float→double widening is exact, so this is bit-identical to the
    * expression form — the oracle contract depends on it).
    */
  private def quantizeRow(v: Seq[Float], scale: Int): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < out.length) {
      out(i) = math.floor(v(i).toDouble * scale + 0.5).toLong; i += 1
    }
    out
  }

  /** Exact integer squared L2 between block `blk` of `v` and codeword `cw`. */
  private def blockDist(v: Array[Long], cw: Array[Long], blk: Int, sub: Int): Long = {
    var d = 0L; var i = blk * sub
    val end = i + sub
    while (i < end) { val t = v(i) - cw(i); d += t * t; i += 1 }
    d
  }

  /** (c_id, codes array<int>): per-block argmin codeword, ties to the
    * smallest index (strict `<` keeps the first minimum — the
    * cross-engine ORDER BY d ASC, j ASC rule).
    */
  private def encodeCorpus(corpus: DataFrame, idCol: String, vecCol: String,
                           cbs: Array[Array[Long]], dim: Int, m: Int,
                           scale: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
    val sub = dim / m
    val schema = StructType(Seq(StructField("c_id", LongType),
      StructField("codes", ArrayType(IntegerType))))
    corpus.select(col(idCol).cast("long"), col(vecCol)).mapPartitions { it =>
      it.map { r =>
        val qv = quantizeRow(r.getSeq[Float](1), scale)
        val codes = new Array[Int](m)
        var blk = 0
        while (blk < m) {
          var best = 0; var bestD = Long.MaxValue
          var j = 0
          while (j < cbs.length) {
            val d = blockDist(qv, cbs(j), blk, sub)
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          codes(blk) = best; blk += 1
        }
        Row(r.getLong(0), codes.toSeq)
      }
    }(Encoders.row(schema))
  }

  /** (q_id, tabs array<array<long>>): per-block distance table to every
    * codeword — the ADC lookup tables.
    */
  private def queryTables(queries: DataFrame, idCol: String, vecCol: String,
                          cbs: Array[Array[Long]], dim: Int, m: Int,
                          scale: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
    val sub = dim / m
    val schema = StructType(Seq(StructField("q_id", LongType),
      StructField("tabs", ArrayType(ArrayType(LongType)))))
    queries.select(col(idCol).cast("long"), col(vecCol)).mapPartitions { it =>
      it.map { r =>
        val qv = quantizeRow(r.getSeq[Float](1), scale)
        val tabs = (0 until m).map(blk => cbs.map(cw =>
          blockDist(qv, cw, blk, sub)).toSeq)
        Row(r.getLong(0), tabs)
      }
    }(Encoders.row(schema))
  }

  /** IVF + PQ composed (the FAISS IVFPQ production pairing): coarse
    * squared-L2 lists prune candidates, PQ/ADC codes score them. All-L2,
    * all exact integer, both quantizers DATA-DERIVED — the oracle replays
    * list assignment (d ASC, list ASC ties), probe sets, per-block codes,
    * and ADC ranking bit-for-bit. nprobe == nlist degrades to
    * [[pqTopKQuantized]] exactly (the recall dial's closed endpoint).
    *
    * 100 TB shape: the index is (list, 8-byte code) per vector — the scan
    * side of the probe join reads codes only; raw vectors are touched once
    * at encode time. Queries broadcast with their nprobe lists + 16-entry
    * distance tables (KBs).
    */
  def ivfPqTopKQuantized(queries: DataFrame, corpus: DataFrame,
                         qIdCol: String, cIdCol: String, vecCol: String,
                         k: Int, nprobe: Int,
                         centroidIds: Seq[Long], codebookIds: Seq[Long],
                         dim: Int = 64, m: Int = 8, scale: Int = 10000): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(nprobe >= 1 && nprobe <= centroidIds.size,
      s"nprobe $nprobe must be in [1, ${centroidIds.size}]")
    val sub = dim / m
    val cents = lookupQuantized(corpus, cIdCol, vecCol, centroidIds, scale, "centroid")
    val cbs = lookupQuantized(corpus, cIdCol, vecCol, codebookIds, scale, "codebook")
    def fullDist(v: Array[Long], cw: Array[Long]): Long = {
      var d = 0L; var i = 0
      while (i < v.length) { val t = v(i) - cw(i); d += t * t; i += 1 }
      d
    }
    // corpus index rows: (list, c_id, codes) — strict `<` keeps the first
    // minimum, the cross-engine (d ASC, idx ASC) tie rule on both levels
    val cSchema = StructType(Seq(StructField("__list", IntegerType),
      StructField("c_id", LongType), StructField("codes", ArrayType(IntegerType))))
    val c = corpus.select(col(cIdCol).cast("long"), col(vecCol)).mapPartitions { it =>
      it.map { r =>
        val qv = quantizeRow(r.getSeq[Float](1), scale)
        var bestL = 0; var bestD = Long.MaxValue
        var i = 0
        while (i < cents.length) {
          val d = fullDist(qv, cents(i))
          if (d < bestD) { bestD = d; bestL = i }
          i += 1
        }
        val codes = new Array[Int](m)
        var blk = 0
        while (blk < m) {
          var best = 0; var bd = Long.MaxValue
          var j = 0
          while (j < cbs.length) {
            val d = blockDist(qv, cbs(j), blk, sub)
            if (d < bd) { bd = d; best = j }
            j += 1
          }
          codes(blk) = best; blk += 1
        }
        Row(bestL, r.getLong(0), codes.toSeq)
      }
    }(Encoders.row(cSchema))
    // query rows: one per probed list, carrying the ADC tables
    val qSchema = StructType(Seq(StructField("__list", IntegerType),
      StructField("q_id", LongType),
      StructField("tabs", ArrayType(ArrayType(LongType)))))
    val q = queries.select(col(qIdCol).cast("long"), col(vecCol)).mapPartitions { it =>
      it.flatMap { r =>
        val qv = quantizeRow(r.getSeq[Float](1), scale)
        val probes = cents.indices
          .map(i => (fullDist(qv, cents(i)), i)).sorted.take(nprobe)
        val tabs = (0 until m).map(blk => cbs.map(cw =>
          blockDist(qv, cw, blk, sub)).toSeq)
        probes.map { case (_, list) => Row(list, r.getLong(0), tabs) }
      }
    }(Encoders.row(qSchema))
    val scored = c.join(broadcast(q), Seq("__list"))
      .withColumn("dist", (0 until m).map(blk =>
        element_at(element_at(col("tabs"), blk + 1),
          element_at(col("codes"), blk + 1) + 1)).reduce(_ + _))
      .withColumn("sim", -col("dist").cast("double"))
    topKSelect(scored, k)
      .select(col("q_id"), col("rnk"), col("c_id"),
        (-col("sim")).cast("long").as("dist"))
  }

  /** SEMANTIC decontamination — the embedding-space sibling of
    * Curation.contamination's n-gram overlap: every corpus document gets
    * its best cosine similarity against the eval/probe set and a verdict
    * at `threshold` (paraphrased eval leakage that shares no n-grams still
    * lights up here). Eval sets are small → probes broadcast; the corpus
    * contributes one scan; the per-document max is a map-side partial agg
    * (each c_id's probe rows stay in its partition), so the exchange
    * carries one row per corpus doc. Ties on sim go to the LOWEST probe
    * id (struct-max on (sim, -p_id) — the cross-engine rank rule).
    */
  def semanticDecontam(corpus: DataFrame, probes: DataFrame, cIdCol: String,
                       pIdCol: String, vecCol: String, threshold: Double,
                       scale: Int = 10000): DataFrame = {
    require(threshold > 0 && threshold < 1, s"threshold must be in (0,1), got $threshold")
    val p = probes.select(col(pIdCol).cast("long").as("p_id"),
      VectorFns.quantize(col(vecCol), scale).as("pv"))
    val c = corpus.select(col(cIdCol).cast("long").as("c_id"),
      VectorFns.quantize(col(vecCol), scale).as("cv"))
    c.join(broadcast(p))
      .withColumn("sim", VectorFns.cosineQ(col("pv"), col("cv")))
      .groupBy(col("c_id"))
      .agg(max(struct(col("sim").as("s"), (-col("p_id")).as("np"))).as("b"))
      .select(col("c_id"), col("b.s").as("best_sim"),
        (-col("b.np")).cast("long").as("probe_id"),
        (col("b.s") > threshold).as("contaminated"))
  }

  /** Distributed Lloyd k-means over quantized vectors, EXACT arithmetic —
    * the clustering pass a corpus-curation pipeline runs before per-cluster
    * sampling / SemDeDup (this is the full-corpus, oracle-replayable
    * sibling of [[trainCentroids]]'s float/sample flavor).
    *
    * Determinism contract (every step integer, replayable by any engine):
    *  - init: the quantized vectors of the k smallest ids (at 100 TB swap
    *    in a hashed sample — the iteration contract is unchanged);
    *  - assignment: exact squared-L2 argmin over the k driver-held centroid
    *    literals, ties to the LOWEST cluster index — a pure map-side
    *    projection, the corpus never shuffles for assignment;
    *  - update: per-dim FLOOR(sum/count) — floor division spelled
    *    `(s - pmod(s, n)) div n` so engines with truncating and flooring
    *    integer division agree on negative sums; empty clusters keep their
    *    previous centroid.
    *
    * Per iteration: one narrow (cluster, dim, partial-sum) hash agg —
    * k·dim result rows collected to the driver (KBs, the same bounded
    * collect contract as trainCentroids/ivfTopK). Output: every vector's
    * final cluster and exact squared distance to its centroid.
    */
  def kmeansAssignQuantized(df: DataFrame, idCol: String, vecCol: String,
                            k: Int, iters: Int,
                            scale: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val q = df.select(col(idCol).cast("long").as("vec_id"),
      VectorFns.quantize(col(vecCol), scale).as("qv"))
    def distSq(cv: Seq[Long]): Column =
      aggregate(zip_with(col("qv"), typedlit(cv), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    // struct sort: (dist ASC, cluster ASC) — the lowest-index tie rule
    def assign(cents: Seq[Seq[Long]]): Column =
      array_sort(array(cents.zipWithIndex.map { case (cv, i) =>
        struct(distSq(cv).as("d"), lit(i).as("cl"))
      }: _*)).getItem(0)
    var cents: Seq[Seq[Long]] = q.orderBy(col("vec_id")).limit(k)
      .select(col("qv")).collect().map(_.getSeq[Long](0).toSeq).toSeq
    require(cents.size == k, s"corpus has fewer than k=$k vectors")
    for (_ <- 0 until iters) {
      val means = q.withColumn("cl", assign(cents).getField("cl"))
        .select(col("cl"), posexplode(col("qv")).as(Seq("dim", "v")))
        .groupBy(col("cl"), col("dim"))
        .agg(sum(col("v")).cast("long").as("s"),
          count(lit(1)).cast("long").as("n"))
        .withColumn("c", expr("(s - pmod(s, n)) div n"))
        .select(col("cl"), col("dim"), col("c"))
        .collect().groupBy(_.getInt(0))
      cents = cents.indices.map { i =>
        means.get(i)
          .map(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
          .getOrElse(cents(i))
      }
    }
    q.withColumn("a", assign(cents))
      .select(col("vec_id"), col("a.cl").cast("long").as("cluster"),
        col("a.d").as("dist_sq"))
  }
}
