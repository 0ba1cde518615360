package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (beyond-reference lakehouse operator):
  * Z-order (Morton) clustering so parquet row-group / file min-max stats
  * stay tight on EVERY clustered dimension at once, not just the leading
  * sort key — the standard trick behind multi-dimensional data skipping.
  *
  * At 100 TB this is a write-path operator: `zorderBy` range-partitions on
  * the interleaved key and sorts within partitions, so the writer emits
  * files whose (dim1, dim2, …) bounding boxes are small; a reader's
  * two-sided predicate then prunes most files from the parquet footer
  * stats alone. Everything is integer bit arithmetic inside whole-stage
  * codegen — no UDF, no driver state; the only exchange is the range
  * partitioner's (which any global layout necessarily pays once).
  */
object Layout {

  /** Interleaved-bit (Morton) key over already-bucketed dimension columns.
    * Each input must be a non-negative integer in [0, 2^bits); dimension j
    * contributes its bit i to output bit `i * n + j` (LSB-first round-robin
    * interleave). `n * bits` must fit a signed long. The expansion is a
    * static tree of shift/and/add terms over disjoint bit positions —
    * codegen-friendly, constant-folded per row.
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 1 && bits >= 1 && n * bits <= 63,
      s"zValue needs 1+ dims and n*bits <= 63 (got n=$n bits=$bits)")
    // out-of-range inputs (negative, or >= 2^bits) would interleave sign /
    // overflow bits and collide with unrelated cells — the layout would be
    // silently destroyed, so the domain is enforced per row (a codegen'd
    // branch; raise_error carries the offending value)
    val hi = (1L << bits) - 1
    val checked = dims.map { d0 =>
      val d = d0.cast("long")
      when(d.between(0L, hi), d).otherwise(raise_error(format_string(
        s"zValue: dimension value %s outside [0, ${hi}] — bucket inputs " +
          s"first (scaleBucket/pmod)", d)).cast("long"))
    }
    val terms = for {
      i <- 0 until bits
      (d, j) <- checked.zipWithIndex
    } yield shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _) // disjoint bit positions: + is |
  }

  /** Scale a non-negative integer column onto [0, 2^bits) given its
    * (exclusive) upper bound — integer arithmetic only, so any engine
    * replays the bucketing exactly. For unbounded/skewed domains compute
    * the bound once (1-row aggregate) or rank-bucket upstream.
    */
  def scaleBucket(c: Column, bound: Column, bits: Int): Column =
    call_function("div", c.cast("long") * lit(1L << bits), bound.cast("long"))

  /** Layout prep for a Z-ordered write: cluster rows by the interleaved key
    * so downstream `write.parquet` emits multi-dim-tight files. `buckets`
    * bounds output file count; ordering inside each range partition makes
    * row-group stats tight too.
    */
  def zorderBy(df: DataFrame, zkey: Column, buckets: Int): DataFrame =
    df.withColumn("_zkey", zkey)
      .repartitionByRange(buckets, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")

  /** 2-D Hilbert curve index — the stronger locality alternative to
    * [[zValue]]: consecutive indices are always grid NEIGHBORS (Morton
    * order jumps at power-of-two boundaries), so equal-size blocks of the
    * curve have equal-or-tighter bounding boxes. The classic xy→d walk
    * (one reflect/swap rotation per bit, high bit first) unrolls to a
    * static chain of `bits` conditional stages over staged columns —
    * whole-stage codegen, no UDF, no driver state. Adds `out` (LONG in
    * [0, 4^bits)); both inputs must already sit in [0, 2^bits).
    *
    * Column-staged rather than a single Column because each stage rewrites
    * (x, y) for the next — a closed-form expression would duplicate the
    * subtree per stage (exponential blowup); named stages keep the plan
    * linear in `bits`.
    */
  def withHilbert(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
                  out: String): DataFrame = {
    require(bits >= 1 && bits <= 30, s"hilbert needs 1 <= bits <= 30, got $bits")
    val n = 1L << bits
    val init = df
      .withColumn("_hx", xCol.cast("long"))
      .withColumn("_hy", yCol.cast("long"))
      .withColumn(out, lit(0L))
    val walked = (0 until bits).reverse.foldLeft(init) { (d, k) =>
      val s = 1L << k
      d.withColumn("_rx", when(col("_hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("_ry", when(col("_hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(out,
          col(out) + lit(s * s) * (lit(3L) * col("_rx")).bitwiseXOR(col("_ry")))
        // rotate the frame for the next bit: reflect within the n-grid when
        // rx=1&ry=0, then swap axes whenever ry=0 (the standard xy2d step)
        .withColumn("_nx", when(col("_ry") === 0,
          when(col("_rx") === 1, lit(n - 1) - col("_hy")).otherwise(col("_hy")))
          .otherwise(col("_hx")))
        .withColumn("_ny", when(col("_ry") === 0,
          when(col("_rx") === 1, lit(n - 1) - col("_hx")).otherwise(col("_hx")))
          .otherwise(col("_hy")))
        .withColumn("_hx", col("_nx"))
        .withColumn("_hy", col("_ny"))
    }
    walked.drop("_hx", "_hy", "_rx", "_ry", "_nx", "_ny")
  }
}
