package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-pruned membership joins — the 100 TB blocklist gate.
  *
  * The curation passes that check corpus rows against a membership set
  * (URL / document-id blocklists, "already ingested" ledgers, opt-out
  * registries) hit a scale wall when BOTH sides are huge: the set is too
  * big to broadcast as an exact hash set, so a plain semi join shuffles the
  * full corpus keys. A Bloom filter restores the map-side gate: the set
  * aggregates DISTRIBUTED into a fixed-size bit array (Spark's native
  * `BloomFilterAggregate`, built with partial aggregation — never
  * collected row-by-row anywhere), the corpus probes it map-side as a
  * scalar-subquery literal (the same shape Spark's own
  * InjectRuntimeFilter rule emits), and only the bloom-HIT slice (true
  * members + the fpp sliver) reaches the exact confirming join. Results
  * are EXACT — the bloom only prunes; false positives are eliminated by
  * the confirm join, and a bloom filter has no false negatives — so the
  * DuckDB oracle is the plain semi/anti join.
  *
  * Preference order honored: native Catalyst expressions (codegen path),
  * not UDFs.
  */
object Bloom {

  /** The bloom bit-array as a scalar-subquery expression over a
    * distributed aggregation of `memberCol` (hashed to 64 bits with the
    * same XxHash64 the probe side uses). `might_contain` requires exactly
    * this shape — a constant or scalar subquery — so the filter stays a
    * one-job side computation, reused across both probe branches by
    * Spark's subquery-reuse rule. `expectedItems` sizes the array for ~3%
    * fpp at that cardinality; oversize rather than undersize — fpp
    * degrades silently, size costs only a few MBs.
    */
  private def bloomSubquery(members: DataFrame, memberCol: String,
                            expectedItems: Long,
                            probeType: org.apache.spark.sql.types.DataType): ScalarSubquery = {
    // XxHash64 is type-sensitive (INT 5 and BIGINT 5 hash differently), so a
    // member column of a different type than the probe key would seed the
    // bloom with hashes the probe never produces — silent false negatives,
    // breaking the exact-results contract. Cast the member side to the probe
    // key's type so both sides hash the same representation; the confirm
    // join already coerces, so this aligns the bloom gate with it.
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(col(memberCol).cast(probeType)))), expectedItems)
    val bfDf = members.select(Bridge.column(agg.toAggregateExpression()).as("__bf"))
    ScalarSubquery(bfDf.queryExecution.analyzed)
  }

  /** `might_contain` over an EMPTY member set yields NULL (the aggregate
    * of zero rows is a NULL bloom) — coalesce to false so "empty set
    * contains nothing" holds and the anti direction passes everything. */
  private def mightContain(bf: ScalarSubquery, key: Column): Column =
    coalesce(Bridge.column(BloomFilterMightContain(bf,
      new XxHash64(Seq(Bridge.expression(key))))), lit(false))

  /** Exact semi join `df ⋉ members`, bloom-pruned: rows of `df` whose
    * `keyCol` appears in `members.memberCol`. The corpus side probes the
    * bloom map-side; only bloom hits shuffle into the confirming
    * `left_semi`. At a 0.1% true-hit rate the exchange shrinks ~30×
    * (hits + ~3% fpp) with zero correctness cost.
    */
  def semiJoin(df: DataFrame, keyCol: String, members: DataFrame,
               memberCol: String, expectedItems: Long): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    val hits = df.filter(
      mightContain(bloomSubquery(members, memberCol, expectedItems,
        df.schema(keyCol).dataType), col(keyCol)))
    hits.join(members.select(col(memberCol).as(keyCol)).distinct(),
      Seq(keyCol), "left_semi")
  }

  /** Exact anti join `df ▷ members` (the blocklist REMOVE direction),
    * bloom-pruned. A bloom miss is a definite non-member — those rows pass
    * straight through with no join at all; only the bloom-hit sliver runs
    * the exact `left_anti` to weed out false positives. The union keeps
    * both branches narrow and the big branch exchange-free.
    */
  def antiJoin(df: DataFrame, keyCol: String, members: DataFrame,
               memberCol: String, expectedItems: Long): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    val probeType = df.schema(keyCol).dataType
    val definiteMiss = df.filter(
      !mightContain(bloomSubquery(members, memberCol, expectedItems, probeType), col(keyCol)))
    val candidates = df.filter(
        mightContain(bloomSubquery(members, memberCol, expectedItems, probeType), col(keyCol)))
      .join(members.select(col(memberCol).as(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
    definiteMiss.unionByName(candidates)
  }
}
