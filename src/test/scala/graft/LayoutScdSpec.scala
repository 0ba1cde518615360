package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Layout, Scd}

/** Invariants for the lakehouse layout + temporal-dimension operators:
  * Z-order tile tightness (the data-skipping property itself) and SCD2
  * history/merge structural correctness (one current row per key,
  * non-overlapping contiguous intervals, merge≡rebuild equivalence).
  */
class LayoutScdSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // --- Layout -------------------------------------------------------------

  test("zValue: bit interleave matches a Scala reference and is invertible") {
    def ref(u: Long, v: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | ((u >> i) & 1L) << (2 * i) | ((v >> i) & 1L) << (2 * i + 1)
      }
    val pts = for (u <- 0 until 16; v <- 0 until 16) yield (u.toLong, v.toLong)
    val got = pts.toDF("u", "v")
      .select(col("u"), col("v"),
        Layout.zValue(Seq(col("u"), col("v")), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((u, v) <- pts) assert(got((u, v)) == ref(u, v, 4), s"($u,$v)")
    // bijective on the grid = invertible
    assert(got.values.toSet.size == pts.size)
  }

  test("zValue blocks are aligned tiles: every 64-key block spans <= 8x8") {
    // the data-skipping property: an aligned run of 64 Morton codes covers
    // exactly one 8x8 tile, so every block's bounding box is tight on BOTH
    // dimensions (a lexicographic (u,v) sort gives v-span 255 instead)
    val grid = (for (u <- 0 until 256; v <- 0 until 256) yield (u.toLong, v.toLong))
      .toDF("u", "v")
    val spans = grid
      .select(shiftright(Layout.zValue(Seq(col("u"), col("v")), 8), 6).as("block"),
        col("u"), col("v"))
      .groupBy("block")
      .agg((max("u") - min("u")).as("du"), (max("v") - min("v")).as("dv"))
      .agg(max("du"), max("dv")).head()
    assert(spans.getLong(0) == 7 && spans.getLong(1) == 7)
  }

  test("zValue: out-of-range dims raise (negative/overflow would corrupt the key)") {
    // a negative or >= 2^bits input would interleave sign/overflow bits and
    // collide with unrelated cells — destroying the layout silently
    val bad = Seq((-1L, 3L), (2L, 256L)).toDF("u", "v")
    val e = intercept[Exception](
      bad.select(Layout.zValue(Seq(col("u"), col("v")), 8)).collect())
    assert(e.getMessage.contains("zValue") || Option(e.getCause)
      .exists(_.getMessage.contains("zValue")))
  }

  test("zValue: rejects bit-width overflow and accepts 3-dim interleave") {
    intercept[IllegalArgumentException](Layout.zValue(Seq(col("a")), 64))
    val z = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
      .select(Layout.zValue(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .head().getLong(0)
    // a=01 → out bit 0; b=10 → out bit 4; c=11 → out bits 2 and 5
    assert(z == ((1L << 0) | (1L << 4) | (1L << 2) | (1L << 5)))
  }

  test("zorderBy: partitions are range-disjoint and internally sorted") {
    val df = (0 until 2048).map(i => ((i * 37) % 256).toLong).toDF("k")
    val zed = Layout.zorderBy(df, col("k"), 8)
    val perPart = zed.select("k").rdd.mapPartitionsWithIndex { (pid, it) =>
      val ks = it.map(_.getLong(0)).toVector
      if (ks.isEmpty) Iterator.empty
      else Iterator((pid, ks.min, ks.max, ks == ks.sorted))
    }.collect().sortBy(_._1)
    assert(perPart.forall(_._4), "each partition sorted")
    perPart.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"ranges overlap: $a $b")
      case _ =>
    }
  }

  // Scala reference xy2d (the classic per-bit reflect/swap walk)
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbert: matches the reference walk, bijective, consecutive = neighbors") {
    val bits = 5
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val got = Layout.withHilbert(pts.toDF("x", "y"), col("x"), col("y"), bits, "h")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((x, y) <- pts) assert(got((x, y)) == hilbertRef(bits, x, y), s"($x,$y)")
    assert(got.values.toSet.size == pts.size) // bijective on the grid
    // the defining property Morton lacks: d and d+1 are always grid
    // neighbors (Manhattan distance 1) — no jumps anywhere on the curve
    val byD = got.map(_.swap)
    for (d <- 0L until (pts.size - 1).toLong) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  test("hilbert beats morton on unaligned contiguous ranges (locality)") {
    // equal-length UNALIGNED runs of each curve: Hilbert's bounding boxes
    // are tighter in aggregate (on 4^k-ALIGNED runs both orders give the
    // same quadtree tiles — the difference is exactly the unaligned case)
    val bits = 6
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val zm = grid.map { case (x, y) =>
      ((0 until bits).foldLeft(0L)((a, i) =>
        a | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)), (x, y))
    }.toMap
    val hm = grid.map { case (x, y) => (hilbertRef(bits, x, y), (x, y)) }.toMap
    def bboxArea(m: Map[Long, (Long, Long)], from: Long, len: Int): Long = {
      val ps = (from until from + len).map(m)
      (ps.map(_._1).max - ps.map(_._1).min + 1) * (ps.map(_._2).max - ps.map(_._2).min + 1)
    }
    val rnd = new scala.util.Random(42)
    val starts = Seq.fill(200)(rnd.nextInt(64 * 64 - 50).toLong)
    val zArea = starts.map(s => bboxArea(zm, s, 50)).sum
    val hArea = starts.map(s => bboxArea(hm, s, 50)).sum
    assert(hArea < zArea, s"hilbert $hArea should beat morton $zArea")
  }

  test("z-ordered files concentrate two-sided predicates (the skipping payoff)") {
    // write the grid as one file per z-block, then read with a predicate on
    // BOTH dimensions: matching rows must live in a tiny fraction of the
    // files — every other file's (u, v) footer stats exclude the predicate,
    // which is exactly what parquet min/max skipping (PushedFilters) prunes
    // on. A u-sorted layout has no such property on v: every u-stripe file
    // spans all of v, so only the leading dimension ever prunes.
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val grid = (for (u <- 0 until 64; v <- 0 until 64) yield (u.toLong, v.toLong))
      .toDF("u", "v")
      .withColumn("block", shiftright(Layout.zValue(Seq(col("u"), col("v")), 6), 4))
    grid.write.mode("overwrite").partitionBy("block").parquet(dir)
    val all = spark.read.parquet(dir)
    val pred = col("u").between(8, 15) && col("v").between(16, 23)
    val hit = all.filter(pred)
    // the scan must carry the pushed two-sided range so stats skipping is live
    val scanStr = hit.queryExecution.executedPlan.collectLeaves().mkString
    assert(scanStr.contains("PushedFilters") &&
      scanStr.contains("GreaterThanOrEqual(u,8"), s"filter not pushed: $scanStr")
    assert(hit.count() == 64) // 8x8 rectangle, every cell exactly once
    // block = zkey >> 4 is an aligned 4x4 tile; the 8x8 rectangle overlaps
    // exactly (8/4)*(8/4) = 4 of the 256 tiles
    val filesWithHits = hit.select(input_file_name()).distinct().count()
    val filesTotal = all.select(input_file_name()).distinct().count()
    assert(filesTotal >= 256, s"expected one file per block, got $filesTotal")
    assert(filesWithHits == 4,
      s"aligned rectangle should live in exactly 4 tiles, got $filesWithHits")
  }

  // --- SCD2 ---------------------------------------------------------------

  private def changelog(rows: (Int, Int, String)*) =
    rows.toDF("k", "t", "s")

  test("history: change compression, tie-break, interval chaining") {
    val h = Scd.history(
      changelog((1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"),
        (2, 10, "X"), (3, 5, "Y"), (3, 5, "Z")), // key 3: tie on t, id order
      Seq("k"), "t", "s", Seq("s"))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getInt(2), Option(r.get(3)), r.getBoolean(4)))
    assert(h.toSeq == Seq(
      (1, "A", 10, Some(30), false), // 20 "A" compressed away
      (1, "B", 30, Some(40), false),
      (1, "A", 40, None, true),
      (2, "X", 10, None, true),
      (3, "Y", 5, Some(5), false), // tie broken by s ("Y" < "Z")
      (3, "Z", 5, None, true)))
  }

  test("history invariants on real data: one current row per key, contiguous") {
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    val h = Scd.history(o, Seq("o_custkey"), "o_orderdate", "o_orderkey",
      Seq("o_orderstatus")).cache()
    val perKey = h.groupBy("o_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("cur"))
    assert(perKey.filter(col("cur") =!= 1).isEmpty, "exactly one current row per key")
    // contiguity: every non-current valid_to equals the next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("valid_from")
    val gaps = h.withColumn("nxt", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("nxt"))
    assert(gaps.isEmpty, "intervals chain without gaps")
    h.unpersist()
  }

  test("streaming foreachBatch merge maintains the dimension incrementally") {
    // the production shape: change batches arrive on a stream, each batch
    // merges into the dimension table; after N batches the table must equal
    // the one-shot history of the concatenated changelog
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Int, String)] // (k, t, s)
    var dim = Scd.history(changelog(), Seq("k"), "t", "s", Seq("s"))
    val q = in.toDS().toDF("k", "t", "s").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect() // test-scale; production keeps it a DF
        if (rows.nonEmpty) {
          val asOf = rows.map(_.getInt(1)).max
          val delta = rows.map(r => (r.getInt(0), r.getString(2))).toSeq
            .toDF("k", "s")
          // localCheckpoint: the merged lineage must not re-read this
          // batch's source after the micro-batch ends
          dim = Scd.merge(dim, delta, Seq("k"), Seq("s"), lit(asOf))
            .localCheckpoint()
        }
      }
      .start()
    try {
      in.addData((1, 10, "A"), (2, 10, "X")); q.processAllAvailable()
      in.addData((1, 20, "B"), (3, 20, "N")); q.processAllAvailable()
      in.addData((1, 30, "A"), (2, 30, "X")); q.processAllAvailable() // 2: no-op
    } finally q.stop()
    val got = dim.orderBy("k", "valid_from")
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getInt(2), Option(r.get(3)), r.getBoolean(4)))
    val want = Scd.history(
      changelog((1, 10, "A"), (2, 10, "X"), (1, 20, "B"), (3, 20, "N"),
        (1, 30, "A"), (2, 30, "X")),
      Seq("k"), "t", "s", Seq("s"))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getInt(2), Option(r.get(3)), r.getBoolean(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("merge == rebuild when the delta is the post-cutoff latest state") {
    // property: history(pre) merged with "latest state per key after cutoff,
    // effective at cutoff" == history(pre ++ one synthetic change at cutoff)
    val pre = changelog((1, 10, "A"), (1, 20, "B"), (2, 10, "X"), (4, 1, "Q"))
    val dim = Scd.history(pre, Seq("k"), "t", "s", Seq("s"))
    val delta = Seq((1, "C"), (2, "X"), (3, "N")).toDF("k", "s") // 2 is a no-op
    val merged = Scd.merge(dim, delta, Seq("k"), Seq("s"), lit(100))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getInt(2), Option(r.get(3)), r.getBoolean(4)))
    val rebuilt = Scd.history(
      changelog((1, 10, "A"), (1, 20, "B"), (1, 100, "C"),
        (2, 10, "X"), (2, 100, "X"), // no-op change compresses away
        (3, 100, "N"), (4, 1, "Q")),
      Seq("k"), "t", "s", Seq("s"))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getInt(2), Option(r.get(3)), r.getBoolean(4)))
    assert(merged.toSeq == rebuilt.toSeq)
    assert(merged.count(_._5) == 4) // one current row per key: 1,2,3,4
  }
}
