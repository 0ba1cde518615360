package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Spec for the corpus-curation operators (Curation.scala): Gopher-style
  * repetition gates, PII redaction, benchmark decontamination, token
  * chunking. Hand-computed goldens on tiny inputs; the sf-corpus parity
  * is covered by the q_text_* DuckDB oracles.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("gopherStats: token/bigram dominance and hapax on a hand-computed doc") {
    // "a a a b" → tokens 4, top token a=3/4, bigrams: "a a"(2) "a b"(1) → 2/3,
    // hapax: {b}=1 of 2 distinct, mean len (1+1+1+1)/4 = 1
    val df = Seq((1L, "a a a b"), (2L, "x y")).toDF("id", "txt")
    val out = Curation.gopherStats(df, "id", "txt")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(r1.fieldIndex("n_tokens")) == 4L)
    assert(r1.getDouble(r1.fieldIndex("top_token_frac")) == 0.75)
    assert(math.abs(r1.getDouble(r1.fieldIndex("top_bigram_frac")) - 2.0 / 3) < 1e-12)
    assert(r1.getDouble(r1.fieldIndex("hapax_ratio")) == 0.5)
    assert(r1.getDouble(r1.fieldIndex("mean_token_len")) == 1.0)
    val r2 = out(1) // "x y": every token unique, single bigram
    assert(r2.getLong(r2.fieldIndex("n_tokens")) == 2L)
    assert(r2.getDouble(r2.fieldIndex("hapax_ratio")) == 1.0)
    assert(r2.getDouble(r2.fieldIndex("top_bigram_frac")) == 1.0)
  }

  test("round-9 plan audits: dsir/cap shuffles stay narrow, dsir models broadcast-or-key-join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (1 to 200)
        .map(i => (i.toLong, s"k${i % 5}",
          (1 to 30).map(j => s"w${(i * j) % 40}").mkString(" ")))
        .toDF("id", "key", "text")
      // dsir: the wide text column is consumed by the map-side bigram
      // explode on BOTH scoring passes — only bigram/id-width rows shuffle
      val d = Curation.dsirResample(docs, docs.filter(col("id") % 2 === 0),
        "id", "text", ratePm = 500)
      val dShuffles = d.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
      assert(dShuffles.nonEmpty)
      assert(dShuffles.forall(s => !s.output.exists(_.name == "text")),
        dShuffles.map(_.output.map(_.name).mkString(",")).mkString(" | "))
      // round-11 consumer accounting: the RAW bigram relation (two
      // consumers: model agg + scoring join) is persisted — both read the
      // InMemoryTableScan; the TARGET relation (one consumer) tokenizes
      // live exactly once (a single-consumer persist would only add a
      // serialize/deserialize pass)
      val liveGens = d.queryExecution.executedPlan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g }
      assert(liveGens.size == 1,
        s"expected exactly the target tokenize live, got ${liveGens.size}")
      val cached = d.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s }
      assert(cached.size >= 2, s"expected >=2 cached raw-bigram scans, got ${cached.size}")
      // sampled raw model (rawSamplePm): scoring is the ONLY full-corpus
      // consumer, so NOTHING persists — the model branch tokenizes just
      // the md5-gated doc sample (3 live Generates: scoring, model
      // sample, target; 0 cached scans). Clear the cache first — the
      // full-path persist above would otherwise substitute into the
      // sampled plan's scoring branch and mask a live Generate.
      spark.catalog.clearCache()
      val ds = Curation.dsirResample(docs, docs.filter(col("id") % 2 === 0),
        "id", "text", ratePm = 500, rawSamplePm = 300)
      val dsGens = ds.queryExecution.executedPlan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g }
      assert(dsGens.size == 3, s"expected 3 live tokenizes, got ${dsGens.size}")
      val dsCached = ds.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s }
      assert(dsCached.isEmpty, s"sampled path must not persist, got ${dsCached.size}")
      val dsShuffles = ds.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
      assert(dsShuffles.forall(s => !s.output.exists(_.name == "text")))
      // capPerKey: ONE key-hash exchange for the rank window, id/key width
      val c = Curation.capPerKey(docs, "id", "key", maxPerKey = 3)
      val cShuffles = c.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
      assert(cShuffles.size == 1, c.queryExecution.executedPlan.toString.take(1200))
      assert(!cShuffles.head.output.exists(_.name == "text"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("paragraphDedup: multi-line blocks drop whole; blank runs normalize; unique bodies survive") {
    val boiler = "We use cookies\nAccept to continue"
    val docs = (1L to 5L).map(i => (i, s"$boiler\n\nbody text $i"))
      .toDF("id", "txt")
      // one doc with a 3-newline separator run: still ONE paragraph break
      .union(Seq((6L, s"$boiler\n\n\nbody text 6")).toDF("id", "txt"))
    val out = Curation.paragraphDedup(docs, "id", "txt", maxDocFreq = 5)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getString(1) == s"body text ${r.getLong(0)}")
      assert(r.getLong(2) == 1L && r.getLong(3) == 1L) // kept 1, dropped 1
    }
    // below threshold: everything survives, separators normalized to \n\n
    val few = Seq((1L, "para one\n\n\npara two")).toDF("id", "txt")
    val kept = Curation.paragraphDedup(few, "id", "txt", maxDocFreq = 5)
      .collect()(0)
    assert(kept.getString(1) == "para one\n\npara two")
  }

  test("capPerKey: deterministic hash-order cap, full spine, rank contiguity") {
    val docs = (1L to 25L).map(i => (i, s"k${i % 3}")).toDF("id", "key")
    val out = Curation.capPerKey(docs, "id", "key", maxPerKey = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 25) // verdict spine covers every doc
    // per key: ranks are 1..n contiguous, exactly min(4, n) kept
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.count(_._4) == math.min(4, rows.length))
      // kept = the 4 LOWEST ranks, which follow the md5 draw order
      assert(rows.filter(_._4).map(_._3).forall(_ <= 4L))
    }
    // deterministic across runs
    val again = Curation.capPerKey(docs, "id", "key", maxPerKey = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(out.forall(r => again(r._1) == r._4))
    intercept[IllegalArgumentException] {
      Curation.capPerKey(docs, "id", "key", maxPerKey = 0)
    }
  }

  test("dsirResample: on-domain docs outweigh off-domain, cap applies, deterministic") {
    // target domain: "the cat sat" style; off-domain: digit babble
    val raw = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "9 8 7 6 5 4 3 2 1 0 9 8 7 6 5"),
      (4L, ""),                      // no bigrams: scores 0, weight = 1e6·1/1
      (5L, "the cat sat")).toDF("id", "txt")
    val target = raw.filter(col("id") =!= 3L && col("id") =!= 4L)
    val out = Curation.dsirResample(raw, target, "id", "txt", ratePm = 500)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // on-domain: target model ≡ raw model restricted to these docs → st ≈ sr
    // → w_pm near 1e6; off-domain doc 3's bigrams are absent from the
    // target model → st=0 → weight collapses toward (1e6·1)/(sr+1)
    assert(byId(1L)._3 > byId(3L)._3)
    assert(byId(3L)._1 == 0L) // zero target-model mass
    // doc 4 (no bigrams): st=sr=0 → w_pm = (1e6·1) div 1 = 1e6 exactly
    assert(byId(4L)._3 == 1000000L)
    // the cap binds when the raw model under-weights a target-heavy doc
    val skew = Curation.dsirResample(raw, target, "id", "txt",
      ratePm = 500, capX = 1)
      .orderBy("id").collect().map(r => r.getLong(3))
    assert(skew.forall(_ <= 1000000L))
    // hash-gated, not RNG-gated: identical verdicts on every run
    val again = Curation.dsirResample(raw, target, "id", "txt", ratePm = 500)
      .orderBy("id").collect()
    assert(out.toSeq == again.toSeq)
    // rate validation
    intercept[IllegalArgumentException] {
      Curation.dsirResample(raw, target, "id", "txt", ratePm = 0)
    }
    // rawSamplePm = 1000 is bit-identical to the default (full model);
    // a sampled model is deterministic run to run
    val full = Curation.dsirResample(raw, target, "id", "txt", ratePm = 500,
      rawSamplePm = 1000).orderBy("id").collect()
    assert(full.toSeq == out.toSeq)
    val s1 = Curation.dsirResample(raw, target, "id", "txt", ratePm = 500,
      rawSamplePm = 400).orderBy("id").collect()
    val s2 = Curation.dsirResample(raw, target, "id", "txt", ratePm = 500,
      rawSamplePm = 400).orderBy("id").collect()
    assert(s1.toSeq == s2.toSeq)
    intercept[IllegalArgumentException] {
      Curation.dsirResample(raw, target, "id", "txt", ratePm = 500, rawSamplePm = 0)
    }
    intercept[IllegalArgumentException] {
      Curation.dsirResample(raw, target, "id", "txt", ratePm = 500, rawSamplePm = 1001)
    }
  }

  test("dsirResample: targetFromRaw predicate path is bit-identical to the " +
      "separate-target relation, full and sampled models (round 16)") {
    val raw = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "9 8 7 6 5 4 3 2 1 0 9 8 7 6 5"),
      (4L, ""),
      (5L, "the cat sat"),
      (6L, "a b a b a b a b"),
      (7L, "the mat sat on the cat")).toDF("id", "txt")
    val cond = col("id") =!= 3L && col("id") =!= 4L
    val target = raw.filter(cond)
    // full model (persist-with-flag single-tokenize layout)
    val sep = Curation.dsirResample(raw, target, "id", "txt", ratePm = 500)
      .orderBy("id").collect()
    val pred = Curation.dsirResample(raw, raw, "id", "txt", ratePm = 500,
      targetFromRaw = Some(cond)).orderBy("id").collect()
    assert(sep.toSeq == pred.toSeq)
    // sampled model (stream-once layout, lazily filtered slices)
    val sepS = Curation.dsirResample(raw, target, "id", "txt", ratePm = 500,
      rawSamplePm = 400).orderBy("id").collect()
    val predS = Curation.dsirResample(raw, raw, "id", "txt", ratePm = 500,
      rawSamplePm = 400, targetFromRaw = Some(cond)).orderBy("id").collect()
    assert(sepS.toSeq == predS.toSeq)
  }

  test("corpusDiff: NULL text is presence, not absence") {
    // id 1: text→NULL = changed (not deleted); id 2: NULL→text = changed
    // (not added); id 3: NULL→NULL = unchanged (not added); id 4: only in
    // v1 = deleted; id 5: only in v2 = added; id 6: NULL→'' = changed
    // (the empty string's digest is distinct from the null sentinel)
    val v1 = Seq((1L, Option("x")), (2L, None), (3L, None),
      (4L, Option("d")), (6L, None)).toDF("id", "txt")
    val v2 = Seq((1L, None), (2L, Option("y")), (3L, None),
      (5L, Option("a")), (6L, Option(""))).toDF("id", "txt")
    val got = Curation.corpusDiff(v1, v2, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged",
      4L -> "deleted", 5L -> "added", 6L -> "changed"))
  }

  test("redactPii: all three categories scrubbed, counts exact, order-safe") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "dial 415-555-0134 or 650-555-9999"),
      (3L, "ping 10.0.255.7 ok"),
      (4L, "clean text only")).toDF("id", "text")
    val out = Curation.redactPii(df, "text").orderBy("id")
      .select("n_emails", "n_phones", "n_ips", "redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 0L, 0L, "mail [EMAIL] now")))
    assert(out(1) == ((0L, 2L, 0L, "dial [PHONE] or [PHONE]")))
    assert(out(2) == ((0L, 0L, 1L, "ping [IP] ok")))
    assert(out(3) == ((0L, 0L, 0L, "clean text only")))
  }

  test("contamination: overlap counts distinct shared n-grams; zero-overlap docs kept") {
    val probes = Seq((100L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta zeta"), // shares "alpha beta gamma" + "beta gamma delta"
      (2L, "zeta eta theta iota kappa"),   // no overlap
      (3L, "alpha beta gamma alpha beta gamma x")) // distinct overlap still 1 ("alpha beta gamma")
      .toDF("id", "text")
    val out = Curation.contamination(docs, probes, "id", "text", n = 3, minOverlap = 2L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1L, 2L, true), (2L, 0L, false), (3L, 1L, false)))
  }

  test("chunkTokens: stride windows cover every token; final partial kept") {
    val df = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val out = Curation.chunkTokens(df, "id", "text", size = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(r.fieldIndex("chunk_idx")),
        r.getLong(r.fieldIndex("start_tok")),
        r.getLong(r.fieldIndex("n_chunk_tokens")),
        r.getString(r.fieldIndex("chunk_text"))))
    assert(out.toSeq == Seq(
      (0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (2L, 6L, 4L, "t7 t8 t9 t10"),
      (3L, 9L, 1L, "t10")))
    // invariant: every token index lands in at least one chunk
    val covered = out.flatMap { case (_, s, n, _) => s until (s + n) }.toSet
    assert(covered == (0L until 10L).toSet)
  }

  test("chunkTokens rejects bad size/stride") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException](Curation.chunkTokens(df, "id", "text", 0, 1))
    intercept[IllegalArgumentException](Curation.chunkTokens(df, "id", "text", 4, 5))
  }

  test("chunkTokens: empty / whitespace-only / NULL docs emit ZERO chunks " +
       "(split('') yields [\"\"], which must not count as a token)") {
    val df = Seq((1L, ""), (2L, "   \t "), (4L, "one two"))
      .toDF("id", "text")
      .unionByName(Seq(3L).toDF("id")
        .selectExpr("id", "CAST(NULL AS STRING) AS text"))
    val out = Curation.chunkTokens(df, "id", "text", size = 4, stride = 3)
      .collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("n_chunk_tokens")),
        r.getString(r.fieldIndex("chunk_text"))))
    // only the real doc produces a chunk; no zero-length chunk rows exist
    assert(out.toSeq == Seq((4L, 2L, "one two")))
  }

  test("gopherStats/contamination plan audits: text never shuffles; probe side broadcasts") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (1 to 200)
        .map(i => (i.toLong, (1 to 30).map(j => s"w${(i * j) % 40}").mkString(" ")))
        .toDF("id", "text")
      // gopher: the wide text column is consumed by the map-side explode --
      // only (doc_id, tok/bg)-width rows may cross the wire
      val g = Curation.gopherStats(docs, "id", "text")
      val gShuffles = g.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
      assert(gShuffles.nonEmpty)
      assert(gShuffles.forall(s => !s.output.exists(c => c.name == "text" || c.name == "__text")),
        gShuffles.map(_.output.map(_.name).mkString(",")).mkString(" | "))
      // contamination: the probe-shingle side reaches the doc side as a
      // broadcast (eval sets are small by contract), and doc text stays
      // out of every shuffle
      val c = Curation.contamination(docs, docs.filter(col("id") < 20), "id", "text",
        n = 3, minOverlap = 2L)
      val plan = c.queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
        plan.toString.take(1500))
      val cShuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(cShuffles.forall(s => !s.output.exists(_.name == "text")),
        cShuffles.map(_.output.map(_.name).mkString(",")).mkString(" | "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("lineDedup: corpus-frequent lines dropped, order kept, blanks immune") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HEADER\nunique one\n\nFOOTER"),
      (2L, "HEADER\nunique two\nFOOTER"),
      (3L, "HEADER\nFOOTER"),
      (4L, "only body here"),
      (5L, "  HEADER  \ntrailing ws still boilerplate")
    ).toDF("id", "text")
    val out = Curation.lineDedup(docs, "id", "text", maxDocFreq = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      // HEADER (4 docs incl. the whitespace-padded one) and FOOTER (3 docs)
      // are boilerplate at maxDocFreq=3; the blank line is layout and stays
      (1L, "unique one\n", 2L, 2L),
      (2L, "unique two", 1L, 2L),
      (3L, "", 0L, 2L),          // all lines dropped — doc survives empty
      (4L, "only body here", 1L, 0L),
      (5L, "trailing ws still boilerplate", 1L, 1L)))
  }

  test("lineDedup: below-threshold lines all kept; maxDocFreq validated") {
    import spark.implicits._
    val docs = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("id", "text")
    val out = Curation.lineDedup(docs, "id", "text", maxDocFreq = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq((1L, "a\nb", 2L, 0L), (2L, "a\nc", 2L, 0L)))
    intercept[IllegalArgumentException] {
      Curation.lineDedup(docs, "id", "text", maxDocFreq = 1)
    }
  }

  test("lineDedupWithinDoc: keep-first per doc, blanks immune, docs independent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a\nb\na\n\n\na"),   // 'a' x3 → first kept; two blanks kept
      (2L, "a\na"),              // independent doc: its own first 'a' kept
      (3L, "  pad  \npad")       // trimmed-equal → second drops, first verbatim
    ).toDF("id", "text")
    val out = Curation.lineDedupWithinDoc(docs, "id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      (1L, "a\nb\n\n", 4L, 2L),
      (2L, "a", 1L, 1L),
      (3L, "  pad  ", 1L, 1L)))
  }

  test("lineDedup plan audit: boilerplate set broadcasts; count shuffle is hash-width") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = (1 to 300)
        .map(i => (i.toLong, s"SHARED BANNER\nbody ${i} text\nSHARED FOOTER"))
        .toDF("id", "text")
      val plan = Curation.lineDedup(docs, "id", "text", maxDocFreq = 10)
        .queryExecution.executedPlan
      // the frequent-line set comes back as a broadcast, never a join shuffle
      assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
        plan.toString.take(1500))
      // the doc-frequency aggregation shuffles (h, doc_id) — the raw line
      // text crosses the wire only in the unavoidable reassembly groupBy
      val dfShuffles = plan.collect { case s: ShuffleExchangeExec => s }
        .filter(_.output.exists(_.name == "h"))
      assert(dfShuffles.nonEmpty)
      assert(dfShuffles.forall(s => !s.output.exists(c =>
        c.name == "line" || c.name == "norm" || c.name == "text")),
        dfShuffles.map(_.output.map(_.name).mkString(",")).mkString(" | "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("canonicalizeUrl/urlDomain: case, ports, tracking params, fragments, non-URLs") {
    val df = Seq(
      (1L, "HTTPS://WWW.Example.COM:443/Path/Page?utm_source=a&id=7&utm_campaign=b#frag"),
      (2L, "http://example.com"),                        // no path → "/"
      (3L, "https://sub.Example.com:8080/x?fbclid=z"),   // non-default port kept
      (4L, "https://example.com/p?utm_medium=m"),        // all params tracking
      (5L, "not a url at all")
    ).toDF("id", "url")
    val out = df.select(col("id"),
        Curation.canonicalizeUrl(col("url")).as("c"),
        Curation.urlDomain(col("url")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "https://www.example.com/Path/Page?id=7")
    assert(out(0).getString(2) == "example.com")
    assert(out(1).getString(1) == "http://example.com/")
    assert(out(2).getString(1) == "https://sub.example.com:8080/x")
    assert(out(2).getString(2) == "sub.example.com:8080")
    assert(out(3).getString(1) == "https://example.com/p")
    // a non-URL canonicalizes to the degenerate "://" + "/" skeleton — the
    // caller gates on a scheme match before trusting it; must not throw
    assert(out(4).getString(1) == ":///")
    assert(out(4).getString(2) == "")
  }

  test("htmlToText/htmlStats: subtree drop, entity decode order, tag soup, counts") {
    val df = Seq(
      // script CONTENT (with a bare `1 < 2`) and style content vanish;
      // entities decode; &amp;lt; must end as literal "&lt;" (no double
      // decode); block structure flattens to single-spaced text
      (1L, "<html><head><style>p{x}</style><script>if(1 < 2){a();}</script>" +
        "</head><body><p class=\"x\">A &amp; B &amp;lt;c&gt; &nbsp;it&#39;s " +
        "&quot;q&quot;</p><a href=\"/1\">l1</a><A HREF=\"/2\">l2</A></body></html>"),
      // tag soup: a bare `<` with no later `>` survives as text
      (2L, "keep <b>this</b> 1 < 2 stays"),
      // unterminated script: only the tag strips, its body leaks as text
      // (the documented regex-stripper contract — not a parser)
      (3L, "drop<script>x = 1;"),
      (4L, "")
    ).toDF("id", "html")
    val out = Curation.htmlStats(df, "id", "html").orderBy("id").collect()
    assert(out(0).getString(1) == "A & B &lt;c> it's \"q\" l1 l2")
    assert(out(0).getLong(2) == 12L)  // every tag outside the script/style subtrees
    assert(out(0).getLong(3) == 2L)   // both <a and <A
    assert(out(1).getString(1) == "keep this 1 < 2 stays")
    assert(out(1).getLong(2) == 2L)   // <b> and </b>
    assert(out(2).getString(1) == "drop x = 1;")
    assert(out(3).getString(1) == "" && out(3).getLong(2) == 0L &&
      out(3).getDouble(4) == 0.0)
    // ratio: clean/raw lengths
    val r0 = out(0)
    assert(r0.getDouble(4) ==
      r0.getString(1).length.toDouble / df.collect()(0).getString(1).length)
  }

  test("classifierScore: hand-replayed md5 bucketing, empty/null docs, broadcast plan") {
    val nB = 64
    val weights = spark.range(nB).select(col("id").as("bucket"),
      ((col("id") * 2654435761L) % 2001 - 1000).as("weight"))
    val df = Seq((1L, Some("The cat SAT on the mat")), (2L, Some("")),
      (3L, None: Option[String]), (4L, Some("one"))).toDF("id", "txt")
    val out = Curation.classifierScore(df, "id", "txt", weights, nB)
      .orderBy("id").collect()
    // replay doc 1 by hand: tokens [the,cat,sat,on,the,mat] + 5 bigrams
    val toks = "the cat sat on the mat".split(" ").toSeq
    val feats = toks ++ toks.sliding(2).map(p => p(0) + "_" + p(1))
    def bucket(f: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % nB
    }
    val expNum = feats.map(f => (bucket(f) * 2654435761L) % 2001 - 1000).sum
    val r1 = out(0)
    assert(r1.getLong(r1.fieldIndex("score_num")) == expNum)
    assert(r1.getLong(r1.fieldIndex("n_feats")) == 11L)
    assert(r1.getDouble(r1.fieldIndex("score")) == expNum.toDouble / 11)
    assert(r1.getBoolean(r1.fieldIndex("label")) == (expNum > 0))
    // empty and NULL docs: zero features, score 0.0, label false — rows kept
    for (i <- Seq(1, 2)) {
      assert(out(i).getLong(out(i).fieldIndex("n_feats")) == 0L)
      assert(out(i).getDouble(out(i).fieldIndex("score")) == 0.0)
      assert(!out(i).getBoolean(out(i).fieldIndex("label")))
    }
    // single token: 1 unigram, 0 bigrams
    assert(out(3).getLong(out(3).fieldIndex("n_feats")) == 1L)
    // plan: the model join must be a BROADCAST (never a shuffle of the
    // exploded feature relation against the model)
    val plan = Curation.classifierScore(df, "id", "txt", weights, nB)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    // production family (xxhash64 buckets): different hash, same feature
    // extraction — n_feats identical, scores deterministic
    val fast = Curation.classifierScore(df, "id", "txt", weights, nB, portable = false)
      .orderBy("id").collect()
    assert(fast.map(r => r.getLong(r.fieldIndex("n_feats"))).toSeq ==
      out.map(r => r.getLong(r.fieldIndex("n_feats"))).toSeq)
    val fast2 = Curation.classifierScore(df, "id", "txt", weights, nB, portable = false)
      .orderBy("id").collect()
    assert(fast.map(_.toSeq).toSeq == fast2.map(_.toSeq).toSeq)
  }

  test("lmScore: hand-computed bigram conditionals, floor division, empty docs") {
    // corpus bigrams: (a,b) x2, (a,c) x1 → c1(a)=3;
    // cond(a,b) = 2000000 div 3 = 666666, cond(a,c) = 333333
    val df = Seq((1L, Some("a b")), (2L, Some("a b")), (3L, Some("a c")),
      (4L, Some("solo")), (5L, None: Option[String])).toDF("id", "txt")
    val out = Curation.lmScore(df, "id", "txt").orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 666666L && byId(1L).getLong(2) == 1L)
    assert(byId(1L).getDouble(3) == 666666.0 / 1000000)
    assert(byId(3L).getLong(1) == 333333L)
    // floor loss: per-prefix conditionals sum to <= 1e6 (666666 + 333333)
    assert(byId(1L).getLong(1) + byId(3L).getLong(1) == 999999L)
    // single-token and NULL docs: zero bigrams, score 0.0, rows kept
    for (i <- Seq(4L, 5L)) {
      assert(byId(i).getLong(2) == 0L && byId(i).getDouble(3) == 0.0)
    }
    assert(out.length == 5)
  }

  test("substringDedup: cross-doc spans removed, within-doc repeats kept, order") {
    import graft.operators.Dedup
    val span = "COMMON SPAN OF EIGHT TOKENS HERE NOW END"
    val df = Seq(
      (1L, s"x $span y"),
      (2L, s"a b $span c"),
      (3L, "solo text under eight"),
      // the 8-token window repeats WITHIN one doc only → 1 distinct doc,
      // not a cross-corpus span, nothing removed
      (4L, "p q r s t u v w p q r s t u v w")
    ).toDF("id", "txt")
    val out = Dedup.substringDedup(df, "id", "txt", 8).orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "x y")
    assert(byId(1L).getLong(2) == 10L && byId(1L).getLong(3) == 8L)
    assert(byId(2L).getString(1) == "a b c")
    assert(byId(2L).getLong(3) == 8L)
    assert(byId(3L).getString(1) == "solo text under eight" &&
      byId(3L).getLong(3) == 0L)                       // shorter than k: untouched
    assert(byId(4L).getString(1) == "p q r s t u v w p q r s t u v w" &&
      byId(4L).getLong(3) == 0L)                       // within-doc repeat kept
    // typed parameter guards
    intercept[IllegalArgumentException](Dedup.substringDedup(df, "id", "txt", 0))
    intercept[IllegalArgumentException](Dedup.substringDedup(df, "id", "txt", 8, 1))
  }

  test("substringDupStats: shared window counted, short and unique docs zeroed") {
    import graft.operators.Dedup
    // k=3: docs 1 and 2 share the window "q w e" (1 window each);
    // doc 3 has no 3-token window in common; doc 4 is too short (2 tokens)
    val df = Seq(
      (1L, "q w e r t"),   // windows: "q w e","w e r","e r t" (3)
      (2L, "z q w e"),     // windows: "z q w","q w e" (2)
      (3L, "a b c d"),     // windows: "a b c","b c d" (2), none shared
      (4L, "x y")          // too short: zero windows
    ).toDF("id", "txt")
    val out = Dedup.substringDupStats(df, "id", "txt", 3)
      .orderBy("id").collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getLong(2), out(i).getDouble(3))
    assert(row(0) == ((3L, 1L, 1.0 / 3)))
    assert(row(1) == ((2L, 1L, 0.5)))
    assert(row(2) == ((2L, 0L, 0.0)))
    assert(row(3) == ((0L, 0L, 0.0)))
    // a window repeated WITHIN one doc only is not a cross-doc duplicate
    val solo = Seq((1L, "m n m n m n")).toDF("id", "txt") // "m n m" x2 etc.
    val so = Dedup.substringDupStats(solo, "id", "txt", 3).collect()(0)
    assert(so.getLong(1) == 4L && so.getLong(2) == 0L)
    intercept[IllegalArgumentException] {
      Dedup.substringDupStats(df, "id", "txt", 1)
    }
  }
}
