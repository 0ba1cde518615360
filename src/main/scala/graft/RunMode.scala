package graft

/** Run-mode switch for operators that ship two hash families.
  *
  * Near-dup operators (MinHash+LSH, SimHash) are family-parametric: the
  * LSH machinery is identical, only the per-slot hash differs. Verify runs
  * keep the portable md5 families so DuckDB can recompute signatures and
  * candidate pairs bit-exactly (the hard-oracle path); Bench opts into the
  * production xxhash64-derived families (native codegen'd expressions,
  * spec-cross-validated against the portable family for recall) so the
  * published numbers reflect the production plan's cost, not the
  * portability tax of 16 md5 calls per token.
  */
object RunMode {
  /** True when the production (xxhash64) hash families should be used —
    * set by [[Bench]]; Verify/oracle runs leave it unset. */
  def productionHash: Boolean = sys.props.get("graft.hash.family").contains("fast")
}
