package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key stress harness — the SCALE.md evidence runs:
  *
  *  1. one-key CEP: N events on a SINGLE key through Cep.detectSorted
  *     (chunked secondary-sort NFA). The point is memory shape, not
  *     speed: resident state is one chunk (64k events) + the partial set,
  *     so a 10M-event hot key streams through a default-memory executor
  *     where the one-shot it.toSeq path would hold all 10M.
  *  2. skewed as-of join: the union + running-last sort-merge plan vs the
  *     conditional-join + max_by plan on a corpus with one hot user. The
  *     fan-out plan materializes |events|×|orders| rows for the hot key
  *     (quadratic); the sort-merge plan pays one spillable sort.
  *
  * usage: runMain graft.Stress [nCepEvents] [hotEvents] [hotOrders]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 10000000
    val hotE = if (args.length > 1) args(1).toInt else 10000
    val hotO = if (args.length > 2) args(2).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming._

    def timed[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[stress] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- 1. one-key CEP through the chunked NFA ----
    implicit val evEnc: org.apache.spark.sql.Encoder[CepEvent] =
      org.apache.spark.sql.Encoders.product[CepEvent]
    val hot = spark.range(n).select(
        lit("hot").as("key"), (col("id") * 1000L).as("tsUs"), col("id").as("eventId"),
        when(col("id") % 2 === 0, "A").otherwise("B").as("etype"),
        lit(0.0).as("value"),
        typedlit(Seq.empty[Double]).as("vals"),
        typedlit(Seq.empty[String]).as("svals"))
      .as[CepEvent]
    val spec = PatternSpec(
      Seq(Step.simple("a")(_.etype == "A"), Step.simple("b")(_.etype == "B")),
      strict = false, every = true, withinUs = Some(10000000L))
    val matches = timed(s"one-key CEP, $n events, chunked detectSorted") {
      Cep.detectSorted(hot, spec).count()
    }
    println(s"[stress] matches: $matches")

    // ---- 1b. one-key batch window kernel through the chunked fold ----
    // Windows.length on a batch Dataset routes through foldSorted (the
    // compiled default): spillable secondary sort + 64k-event chunked
    // kernel fold, so the 10M-event hot key never materializes — the
    // flatMapGroupsWithState batch path would hold all N in one group.
    implicit val weEnc: org.apache.spark.sql.Encoder[WinEvent] =
      org.apache.spark.sql.Encoders.product[WinEvent]
    val hotWin = spark.range(n).select(
        lit("hot").as("key"), (col("id") * 1000L).as("tsUs"), col("id").as("eventId"),
        (col("id") % 97).cast("double").as("value"),
        typedlit(Seq.empty[Double]).as("vals"),
        typedlit(Seq.empty[String]).as("svals"))
      .as[WinEvent]
    val winRows = timed(s"one-key batch length(10) window, $n events, foldSorted default") {
      Windows.length(hotWin, 10).count()
    }
    println(s"[stress] window changelog rows: $winRows")

    // ---- 2. skewed as-of join: sort-merge vs conditional-join fan-out ----
    import org.apache.spark.sql.expressions.Window
    val coldUsers = 1000
    val ev = spark.range(hotE).select(lit(0L).as("u"), (col("id") * 1000L).as("t_us"),
        col("id").as("event_id"))
      .union(spark.range(coldUsers * 10).select((col("id") % coldUsers + 1).as("u"),
        (col("id") * 1000L).as("t_us"), (col("id") + hotE).as("event_id")))
    val ord = spark.range(hotO).select(lit(0L).as("u"), (col("id") * 5000L).as("o_us"),
        col("id").as("okey"), (col("id") % 100).cast("double").as("price"))
      .union(spark.range(coldUsers * 3).select((col("id") % coldUsers + 1).as("u"),
        (col("id") * 5000L).as("o_us"), (col("id") + hotO).as("okey"),
        (col("id") % 100).cast("double").as("price")))
    val sortMerge = timed(s"as-of SORT-MERGE (hot user: $hotE ev × $hotO ord)") {
      val e = ev.select(col("u"), col("t_us"), lit(1).as("kind"), col("event_id"),
        lit(null).cast("long").as("okey"), lit(null).cast("double").as("price"))
      val o = ord.select(col("u"), col("o_us").as("t_us"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"), col("okey"), col("price"))
      val w = Window.partitionBy(col("u"))
        .orderBy(col("t_us"), col("kind"), col("okey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // sum over the carried values forces the real computation — a bare
      // count() lets Catalyst eliminate the aggregate (and for the fan-out
      // plan below, the whole duplicate-insensitive outer join)
      e.unionByName(o)
        .withColumn("last_price", last(col("price"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(sum(col("last_price"))).collect()(0).getDouble(0)
    }
    val fanOut = timed("as-of FAN-OUT (conditional join + max_by)") {
      ev.join(ord, ev("u") === ord("u") && col("o_us") <= col("t_us"), "left_outer")
        .groupBy(col("event_id"))
        .agg(max_by(col("price"), col("okey")).as("last_price"))
        .select(sum(col("last_price"))).collect()(0).getDouble(0)
    }
    println(s"[stress] rows: sortMerge=$sortMerge fanOut=$fanOut")

    // ---- 3. lineDedup scaling: 1x vs 10x synthetic corpus ----
    // Each doc = 2 corpus-wide boilerplate lines + 6 unique body lines.
    // The evidence is the growth FACTOR: the three-shuffle plan (16-byte
    // doc-frequency agg, broadcast drop, doc-keyed reassembly) should
    // scale near-linearly in docs; super-linear growth would flag a
    // broadcast-threshold or skew cliff.
    def lineCorpus(docs: Int) = spark.range(docs).select(col("id").as("doc_id"),
      concat_ws("\n",
        lit("SUBSCRIBE TO OUR NEWSLETTER"),
        concat(lit("body "), col("id"), lit(" alpha")),
        concat(lit("body "), col("id"), lit(" beta gamma")),
        concat(lit("body "), col("id"), lit(" delta")),
        concat(lit("body "), col("id"), lit(" epsilon zeta")),
        concat(lit("body "), col("id"), lit(" eta")),
        concat(lit("body "), col("id"), lit(" theta iota")),
        lit("COPYRIGHT 2026 EXAMPLE CORP")).as("text"))
    val ld1 = timed(s"lineDedup 1x (${hotE * 10} docs)") {
      graft.operators.Curation.lineDedup(lineCorpus(hotE * 10), "doc_id", "text", 5)
        .agg(sum(col("n_kept")), sum(col("n_dropped"))).collect()(0)
    }
    val ld10 = timed(s"lineDedup 10x (${hotE * 100} docs)") {
      graft.operators.Curation.lineDedup(lineCorpus(hotE * 100), "doc_id", "text", 5)
        .agg(sum(col("n_kept")), sum(col("n_dropped"))).collect()(0)
    }
    println(s"[stress] lineDedup kept/dropped 1x=$ld1 10x=$ld10")
    spark.stop()
  }
}
