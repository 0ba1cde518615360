package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (binned) interval join — the equi-join rewrite of the theta
  * time-range join.
  *
  * A naive `a.ts BETWEEN b.start AND b.end` join has no equi-key, so Spark
  * plans a broadcast/shuffled nested-loop — O(|L|·|R|) per key group and
  * the classic 100 TB cliff. Banding restores an equi-key: each LEFT
  * interval explodes to the time bins it covers, each RIGHT instant maps
  * to exactly one bin, and the range predicate becomes an equi-join on
  * (keys…, bin) followed by an exact residual filter. With `binWidthSec`
  * at least the max interval span, a left row covers at most 2 bins — the
  * join input is ≤2·|L| + |R| rows, shuffled once on narrow keys, and the
  * sort-merge/hash machinery (plus AQE) applies as to any equi-join.
  */
object RangeJoin {

  /** Join `left` intervals `[startCol, endCol]` (epoch seconds, inclusive)
    * to `right` instants `pointCol`, additionally equi-keyed by `keys`.
    * Column names must be disjoint apart from `keys` (rename upstream).
    */
  def bandedIntervalJoin(left: DataFrame, right: DataFrame,
                         keys: Seq[String], startCol: String, endCol: String,
                         pointCol: String, binWidthSec: Long): DataFrame = {
    require(binWidthSec > 0, s"binWidthSec must be positive, got $binWidthSec")
    require(keys.nonEmpty, "bandedIntervalJoin needs at least one equi-key")
    val lb = left.withColumn("__bin", explode(sequence(
      floor(col(startCol) / binWidthSec).cast("long"),
      floor(col(endCol) / binWidthSec).cast("long"))))
    val rb = right.withColumn("__bin",
      floor(col(pointCol) / binWidthSec).cast("long"))
    lb.join(rb, keys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
