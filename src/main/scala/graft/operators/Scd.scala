package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history over keyed change streams —
  * the temporal side of the Table surface (SURVEY §2.10). The reference's
  * tables are last-write-wins (src/core/table/mod.rs:92-140 — update/upsert
  * replace the row); a training-data/warehouse pipeline additionally needs
  * the HISTORY of each key: which attribute values were in effect over
  * which time interval. These operators build and maintain that history
  * with plain window functions — no driver state, one hash exchange on the
  * dimension key.
  *
  * Scale (100 TB): `history` is exactly one exchange (hash on `keys`) plus
  * a within-key sort — the minimum any per-key ordered derivation needs;
  * change-compression happens in the same window pass (lag), so adding it
  * is free. `merge` is the incremental form: the big current dimension is
  * touched only for keys present in the (small) delta — a broadcast-able
  * semi/anti split — so a daily merge never rewrites unchanged keys' rows.
  */
object Scd {

  /** Build a type-2 history from a change log.
    *
    * Input: one row per observed change event `(keys…, orderCol, attrs…)`.
    * Output: one row per DISTINCT consecutive attribute state per key, with
    * `valid_from` (the first event time showing this state), `valid_to`
    * (the next state's valid_from; NULL while current) and `is_current`.
    * Consecutive events with identical `attrs` collapse into one interval
    * (change compression — re-stating the same value extends the interval,
    * it does not split it).
    *
    * Ties on `orderCol` within a key are broken by `tieBreak` so the
    * history is deterministic under at-least-once ingestion.
    */
  def history(changes: DataFrame, keys: Seq[String], orderCol: String,
              tieBreak: String, attrs: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(orderCol), col(tieBreak))
    val state = struct(attrs.map(col): _*)
    // a row OPENS an interval iff its state differs from the previous row's
    val opens = changes.withColumn("_prev", lag(state, 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= state)
      .drop("_prev")
    val w2 = Window.partitionBy(keyCols: _*).orderBy(col(orderCol), col(tieBreak))
    opens
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrs.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }

  /** Incrementally merge a delta of new states into an existing SCD2
    * dimension (`dim` has the `history` output shape). Keys absent from the
    * delta pass through UNTOUCHED (no shuffle of their rows when the join
    * broadcasts); for delta keys, the key's current row closes at the new
    * state's `asOf` unless the state is unchanged (then the delta row is a
    * no-op and the interval simply persists).
    *
    * `delta`: one row per key `(keys…, attrs…)`, all effective at `asOf`.
    *
    * Both inputs are consumed more than once (dim: pass-through + close-out
    * + known-key sides; delta: state join + fresh-key anti), so both are
    * persisted for the merge — `onPersist` receives each persisted frame so
    * the caller can unpersist after materializing (the `minHashLsh`
    * discipline). Without this, `dim` — typically itself a windowed
    * derivation — would be recomputed up to four times.
    */
  def merge(dim0: DataFrame, delta0: DataFrame, keys: Seq[String],
            attrs: Seq[String], asOf: Column,
            onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    val dim = dim0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val delta = delta0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(dim); onPersist(delta)
    val keyCols = keys.map(col)
    val state = struct(attrs.map(col): _*)
    // current rows of keys the delta touches, with the delta's new state
    val touched = dim.filter(col("is_current"))
      .join(delta.select((keyCols :+ state.as("_new")): _*), keys, "inner")
    // changed feeds three branches (anti filter, close-out, re-open) —
    // persist so the state-compare join runs once, not three times
    val changed = touched.filter(state =!= col("_new"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(changed)
    // 1. untouched rows: closed history passes through whole; current rows
    //    survive unless their key changed (anti join runs on current rows
    //    only — the small side broadcasts for a typical daily delta)
    val keep = dim.filter(!col("is_current"))
      .unionByName(dim.filter(col("is_current"))
        .join(changed.select(keyCols: _*), keys, "left_anti"))
    // 2. closed-out versions of the changed keys' current rows
    val closed = changed.drop("_new")
      .withColumn("valid_to", asOf)
      .withColumn("is_current", lit(false))
    // 3. the new current rows: changed keys + keys new to the dimension
    val known = dim.filter(col("is_current")).select(keyCols: _*)
    val fresh = delta.join(known, keys, "left_anti")
    val opened = changed
      .select((keyCols ++ attrs.map(a => col(s"_new.$a").as(a))): _*)
      .unionByName(fresh.select((keyCols ++ attrs.map(col)): _*))
      .withColumn("valid_from", asOf)
      .withColumn("valid_to", lit(null).cast(dim.schema("valid_to").dataType))
      .withColumn("is_current", lit(true))
    keep.unionByName(closed).unionByName(opened)
  }
}
