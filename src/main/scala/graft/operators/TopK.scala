package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate for a query: corpus id + similarity. */
final case class SimEntry(c_id: Long, sim: Double)

/** Typed bounded top-k aggregator — the §2.11 aggregator-extension surface
  * (reference custom-aggregator factories, aggregator/mod.rs:15), shipped as
  * a real `org.apache.spark.sql.expressions.Aggregator`.
  *
  * Order: (sim desc, c_id asc) — identical to the rank-window formulation,
  * so results are deterministic and oracle-comparable.
  *
  * Scale: the buffer is bounded at k, and Spark runs partial aggregation —
  * each map partition contributes at most k entries per query to the
  * shuffle, vs the rank window's full sort of every scored (query, corpus)
  * row. At 1B corpus rows × 100 queries × k=10 that is 10⁣k shuffle rows
  * instead of 10¹¹.
  */
class TopKBySim(k: Int) extends Aggregator[SimEntry, Seq[SimEntry], Seq[SimEntry]]
    with Serializable {
  require(k > 0, "k must be positive")

  private def better(a: SimEntry, b: SimEntry): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.c_id < b.c_id)

  // buffer invariant: sorted best-first, size <= k
  private def insert(buf: Seq[SimEntry], e: SimEntry): Seq[SimEntry] =
    if (buf.size >= k && better(buf.last, e)) buf
    else {
      val idx = buf.indexWhere(b => better(e, b)) match {
        case -1 => buf.size
        case i => i
      }
      val v = (buf.take(idx) :+ e) ++ buf.drop(idx)
      if (v.size > k) v.take(k) else v
    }

  override def zero: Seq[SimEntry] = Vector.empty
  override def reduce(buf: Seq[SimEntry], e: SimEntry): Seq[SimEntry] = insert(buf, e)
  override def merge(a: Seq[SimEntry], b: Seq[SimEntry]): Seq[SimEntry] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[SimEntry]): Seq[SimEntry] = r
  override def bufferEncoder: Encoder[Seq[SimEntry]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[SimEntry]] = ExpressionEncoder()
}

object TopK {
  /** Column form: `bySim(k)(c_id, sim)` aggregates to the k best entries. */
  def bySim(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKBySim(k), ExpressionEncoder[SimEntry]())
}
