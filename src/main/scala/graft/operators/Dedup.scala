package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for a document corpus, designed for the 100 TB
  * shape: never all-pairs over the corpus — candidate generation always goes
  * through a hash/band bucket (shuffle key) so the quadratic step is bounded
  * to within-bucket pairs, and every stage is a plain shuffle-once groupBy
  * or equi-join that AQE can skew-split.
  */
object Dedup {

  /** Exact dedup: canonical-text digest → representative id + multiplicity.
    * One shuffle on the digest; at scale this is the classic hash-dedup.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFns.fingerprint(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Token-set Jaccard pairs within a blocking key, via an inverted index:
    * explode tokens, self-join on (block, token) to count co-occurrences
    * (|A∩B| as a hash-aggregated count), derive |A∪B| = |A|+|B|-|A∩B|.
    *
    * Scale rationale vs the naive array formulation (join all pairs, then
    * array_intersect): the inverted index never materializes token arrays
    * through the join — the shuffle rows are (block, token, id, size)
    * tuples and partial aggregation combines map-side. Pairs sharing no
    * token never appear (their jaccard is 0 < any threshold). The block
    * bound remains the scale contract: pairs are only enumerated inside a
    * block (language, shard, LSH bucket), never across the corpus.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, threshold: Double,
                   onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    require(threshold >= 0.0, "threshold must be non-negative")
    val t = df.select(
        col(idCol).as("id"), col(blockCol).as("blk"),
        TextFns.tokenSet(col(textCol)).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      .withColumn("tk", explode(col("toks")))
      .select(col("blk"), col("tk"), col("id"), col("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(t)
    val a = t.select(col("blk"), col("tk"), col("id").as("a_id"), col("sz").as("a_sz"))
    val b = t.select(col("blk"), col("tk"), col("id").as("b_id"), col("sz").as("b_sz"))
    a.join(b, Seq("blk", "tk")).filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jac",
        col("inter").cast("double") /
        (col("a_sz") + col("b_sz") - col("inter")).cast("double"))
      .filter(col("jac") > threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** MinHash + LSH near-dup detection:
    * shingle/tokenize → k-slot minhash signature → band keys → bucket join
    * candidates → exact Jaccard verification. Candidate generation is
    * linear in corpus size (explode by #bands, shuffle on band key); only
    * same-bucket pairs are verified.
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.7,
                 shingleSize: Option[Int] = None,
                 maxBucketSize: Int = 2000,
                 onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // Shingles (word n-grams) are the discriminative unit for near-dup
    // detection; bare unigram sets degenerate on vocabulary-limited corpora
    // (every doc shares the vocab → identical signatures → quadratic
    // buckets — observed live: 877s vs 3s at sf0.1).
    val unit = shingleSize
      .map(n => array_distinct(TextFns.shingles(col(textCol), n)))
      .getOrElse(TextFns.tokenSet(col(textCol)))
    // Materialize shingles+signatures once: feeds the banding (sig) and the
    // verification (toks). At cluster scale this is "write signatures to a
    // table"; locally MEMORY_AND_DISK.
    val base = df.select(col(idCol).as("id"), unit.as("toks"))
      .withColumn("sig", TextFns.minHashSignature(col("toks"), numHashes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(base)
    // NARROW banded relation: (band, band_key, id) only — token arrays
    // never enter the ×bands explode or the candidate self-join shuffle.
    val allBanded = base.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key", hash(slice(col("sig"), col("band") * r + 1, lit(r)), col("band")))
      .select(col("band"), col("band_key"), col("id"))
    // Skew guard: drop buckets above maxBucketSize before the candidate
    // join — a huge bucket means an exact-dup cluster (handled by
    // Dedup.exact) or a degenerate band; joining it is O(bucket^2).
    val bucketSizes = allBanded.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select(col("band"), col("band_key"))
    val banded = allBanded.join(bucketSizes, Seq("band", "band_key"))
    val a = banded.select(col("band"), col("band_key"), col("id").as("a_id"))
    val b = banded.select(col("band"), col("band_key"), col("id").as("b_id"))
    val cands = a.join(b, Seq("band", "band_key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
    // Exact-Jaccard verification by joining the deduped candidate PAIRS back
    // to the id→tokens relation: each side's tokens shuffle once total,
    // not once per band bucket occurrence.
    val toksRel = base.select(col("id"), col("toks"))
    cands
      .join(toksRel.select(col("id").as("a_id"), col("toks").as("a_toks")), Seq("a_id"))
      .join(toksRel.select(col("id").as("b_id"), col("toks").as("b_toks")), Seq("b_id"))
      .withColumn("jac",
        size(array_intersect(col("a_toks"), col("b_toks"))).cast("double") /
        size(array_union(col("a_toks"), col("b_toks"))).cast("double"))
      .filter(col("jac") > threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** SimHash near-dup: 64-bit signature, 4×16-bit band blocking, Hamming
    * verification via bit_count(xor). A pair within Hamming distance d<=3
    * shares at least one of the 4 bands (pigeonhole) → recall 1.0 for d<=3.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      TextFns.simHash(TextFns.tokens(col(textCol))).as("sh"))
    val banded = base.withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("band_key",
        expr("shiftrightunsigned(sh, band * 16)").bitwiseAND(lit(0xFFFFL)))
    val a = banded.select(col("band"), col("band_key"), col("id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("band"), col("band_key"), col("id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("band", "band_key")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }
}
