package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Search, Similarity, Tokenizer}

/** Search/retrieval, BPE tokenizer, and exact k-means specs: hand-computed
  * fixed-point goldens (the oracle queries re-check the same arithmetic
  * against DuckDB at sf0.01; here the numbers are derived by hand so a
  * same-bug-both-sides slip in the SQL can't hide).
  */
class SearchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("invertedIndex: tf/df/postings golden + minDf and maxDf gates") {
    val d = docs(
      1L -> "apple banana apple",
      2L -> "banana cherry",
      3L -> "apple? BANANA banana")
    val out = Search.invertedIndex(d, "doc_id", "text")
      .orderBy("token")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toList))
    assert(out.toList == List(
      ("apple", 3L, 2L, List(1L, 3L)),
      ("banana", 4L, 3L, List(1L, 2L, 3L)),
      ("cherry", 1L, 1L, List(2L))))
    // minDf drops cherry; maxDf at 700‰ of 3 docs (=2.1 docs) drops banana
    assert(Search.invertedIndex(d, "doc_id", "text", minDf = 2)
      .collect().map(_.getString(0)).toSet == Set("apple", "banana"))
    assert(Search.invertedIndex(d, "doc_id", "text", maxDfPermille = 700)
      .collect().map(_.getString(0)).toSet == Set("apple", "cherry"))
  }

  test("invertedIndex relation form: narrow rows agree with the array form") {
    val d = docs(
      1L -> "apple banana apple",
      2L -> "banana cherry",
      3L -> "apple? BANANA banana")
    val rel = Search.invertedIndex(d, "doc_id", "text",
        postingsAs = "relation")
      .orderBy("token", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // (token, doc_id, tf_doc, tf, df): per-doc tf plus the token stats
    assert(rel.toList == List(
      ("apple", 1L, 2L, 3L, 2L), ("apple", 3L, 1L, 3L, 2L),
      ("banana", 1L, 1L, 4L, 3L), ("banana", 2L, 1L, 4L, 3L),
      ("banana", 3L, 2L, 4L, 3L),
      ("cherry", 2L, 1L, 1L, 1L)))
    // gates apply identically; bad mode is a typed error
    assert(Search.invertedIndex(d, "doc_id", "text", minDf = 2,
        postingsAs = "relation")
      .collect().map(_.getString(0)).toSet == Set("apple", "banana"))
    intercept[IllegalArgumentException] {
      Search.invertedIndex(d, "doc_id", "text", postingsAs = "csv")
    }
  }

  test("bm25TopK: hand-computed fixed-point scores, ranking, tie-break") {
    // Corpus: N=3 docs, dl = 3, 2, 4; T = 9.
    val d = docs(
      1L -> "x x y",
      2L -> "y z",
      3L -> "z z z w")
    // Query "x": df=1 ⇒ idf_fp = (1000·(2·2+1)) div 3 = 1666.
    //   doc1: tf=2, rdl = (1000·3·3) div 9 = 1000
    //     tfn = (22000000·2) div (10000·2 + 3000 + 9·1000) = 44000000 div 32000 = 1375
    //     contrib = 1666·1375 = 2290750
    // Query "z": df=2 ⇒ idf_fp = (1000·3) div 5 = 600.
    //   doc2: tf=1, rdl = (1000·2·3) div 9 = 666
    //     tfn = 22000000 div (10000 + 3000 + 5994) = 22000000 div 18994 = 1158
    //     contrib = 600·1158 = 694800
    //   doc3: tf=3, rdl = (1000·4·3) div 9 = 1333
    //     tfn = 66000000 div (30000 + 3000 + 11997) = 66000000 div 44997 = 1466
    //     contrib = 600·1466 = 879600
    val out = Search.bm25TopK(d, "doc_id", "text", Seq("x", "z"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toList == List(
      (1L, 2290750L, 1L), (3L, 879600L, 1L), (2L, 694800L, 1L)))
  }

  test("bm25TopKFromIndex: relation-index path reproduces bm25TopK bit-exactly") {
    val d = docs(
      1L -> "x x y",
      2L -> "y z",
      3L -> "z z z w")
    // same hand golden as bm25TopK above, scored from the pre-built
    // relation index + doc-length dimension instead of the corpus text
    val idx = Search.invertedIndex(d, "doc_id", "text", postingsAs = "relation")
    val out = Search.bm25TopKFromIndex(idx,
        Search.docLengths(d, "doc_id", "text"), Seq("x", "z"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toList == List(
      (1L, 2290750L, 1L), (3L, 879600L, 1L), (2L, 694800L, 1L)))
    // parity on a larger slice of the real corpus, multi-hit docs included
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents").limit(300)
    val a = Search.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "vector", "customer"), k = 50).collect().toSeq
    val idx2 = Search.invertedIndex(corpus, "doc_id", "text",
      postingsAs = "relation")
    val b = Search.bm25TopKFromIndex(idx2,
      Search.docLengths(corpus, "doc_id", "text"),
      Seq("spark", "vector", "customer"), k = 50).collect().toSeq
    assert(a.map(r => (r.getLong(0), r.getLong(2))) ==
      b.map(r => (r.getLong(0), r.getLong(2))))
  }

  test("tfIdfTopTerms: rank order and tie-break by token") {
    val d = docs(
      1L -> "a a b c",
      2L -> "b b b c")
    // N=2; df: a=1, b=2, c=2. idf_fp: a=2000, b=1000, c=1000.
    // doc1: a: 2·2000=4000, b: 1·1000=1000, c: 1·1000=1000 (b before c)
    val out = Search.tfIdfTopTerms(d, "doc_id", "text", m = 3)
      .filter(col("doc_id") === 1)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(5)))
    assert(out.toList == List((1L, "a", 4000L), (2L, "b", 1000L), (3L, "c", 1000L)))
  }

  test("rrfFuse: hand-computed fused scores, overlap counted, tie-break by id") {
    import spark.implicits._
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((11L, 1L), (13L, 2L)).toDF("doc_id", "rank")
    // contrib = 1000000 div (60 + rank):
    //   rank1=16393, rank2=16129, rank3=15873
    // doc11: 16129 + 16393 = 32522 (2 lists); doc10: 16393; doc13: 16129; doc12: 15873
    val out = Search.rrfFuse(Seq(lex, sem), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toList == List(
      (11L, 2L, 32522L), (10L, 1L, 16393L), (13L, 1L, 16129L), (12L, 1L, 15873L)))
  }

  test("bpeTrain: textbook merge sequence on a hand golden") {
    import spark.implicits._
    // words: "aaab"×3, "aab"×2 → symbols a a a b</w>... wait: chars + </w>
    // aaab: a a a b </w> (cnt 3); aab: a a b </w> (cnt 2)
    // round 1 pairs: (a,a): 3·2+2·1=8... aaab has (a,a) at pos1,2 → 2·3=6; aab 1·2=2 ⇒ 8
    //   (a,b): 3+2=5, (b,</w>): 5 ⇒ best (a,a) count 8 → merge "aa"
    // round 2: aaab→[aa,a,b,</w>] (left-to-right non-overlap), aab→[aa,b,</w>]
    //   pairs: (aa,a):3, (a,b):3, (aa,b):2, (b,</w>):5 ⇒ best (b,</w>) → "b</w>"
    // round 3: (aa,a):3, (a,b</w>):3, (aa,b</w>):2 ⇒ ties at 3 → lexicographic:
    //   ("a","b</w>") < ("aa","a") ⇒ merge ("a","b</w>")
    val wc = Seq(("aaab", 3L), ("aab", 2L)).toDF("word", "cnt")
    val merges = Tokenizer.bpeTrain(wc, numMerges = 3)
    assert(merges == Seq(("a", "a"), ("b", "</w>"), ("a", "b</w>")))
    // encode agrees with training's merge application
    val ranks = merges.zipWithIndex.toMap
    assert(Tokenizer.encodeWord("aaab", ranks).toList == List("aa", "ab</w>"))
    assert(Tokenizer.encodeWord("aab", ranks).toList == List("aa", "b</w>"))
    assert(Tokenizer.encodeWord("ba", ranks).toList == List("b", "a", "</w>"))
  }

  test("bpeTrain: stops when no pair repeats; zero merges = empty") {
    import spark.implicits._
    val wc = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "cnt")
    assert(Tokenizer.bpeTrain(wc, numMerges = 10) == Seq.empty)
    val wc2 = Seq(("aa", 5L)).toDF("word", "cnt")
    assert(Tokenizer.bpeTrain(wc2, numMerges = 0) == Seq.empty)
  }

  test("mergeOnce: left-to-right non-overlapping (KwKwK-style run)") {
    assert(Tokenizer.mergeOnce(Array("a", "a", "a"), ("a", "a")).toList
      == List("aa", "a"))
    assert(Tokenizer.mergeOnce(Array("a", "a", "a", "a"), ("a", "a")).toList
      == List("aa", "aa"))
  }

  test("bpeEncode: distributed encode matches encodeWord; piece concat restores text") {
    val d = docs(5L -> "Hello, hello world", 6L -> "", 7L -> "a")
    val merges = Seq(("l", "l"), ("o", "</w>"), ("h", "e"))
    val out = Tokenizer.bpeEncode(d, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    val ranks = merges.zipWithIndex.toMap
    val exp5 = Seq("hello", "hello", "world").flatMap(w => Tokenizer.encodeWord(w, ranks))
    assert(out(0).getSeq[String](1) == exp5)
    assert(out(0).getLong(2) == exp5.length.toLong)
    assert(out(1).getSeq[String](1).isEmpty && out(1).getLong(2) == 0L)
    // concatenating pieces and dropping </w> restores the normalized words
    assert(exp5.mkString.replace("</w>", " ").trim == "hello hello world")
  }

  test("bandedIntervalJoin: banding is invisible — equals the plain theta join, " +
       "including bin-boundary points") {
    import spark.implicits._
    import graft.operators.RangeJoin
    // deterministic pseudo-random intervals/points, spans ≤ width=100,
    // plus exact bin-boundary points (p = k·width) that must not drop
    val left = (0L until 60L).map { i =>
      val s = (i * 97) % 1000
      (i, i % 5, s, s + (i * 13) % 100)
    }.toDF("l_id", "k", "s", "e")
    val right = ((0L until 80L).map { j =>
      (j, j % 5, (j * 61) % 1100)
    } ++ Seq((900L, 0L, 100L), (901L, 1L, 200L), (902L, 2L, 0L)))
      .toDF("r_id", "k", "p")
    val banded = RangeJoin.bandedIntervalJoin(left, right, Seq("k"), "s", "e", "p", 100L)
      .select(col("l_id"), col("r_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = left.join(right, Seq("k"))
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select(col("l_id"), col("r_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == plain && plain.nonEmpty)
    intercept[IllegalArgumentException] {
      RangeJoin.bandedIntervalJoin(left, right, Seq("k"), "s", "e", "p", 0L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.bandedIntervalJoin(left, right, Seq.empty, "s", "e", "p", 100L)
    }
  }

  test("deflateLen: repetitive text compresses far below prose; deterministic; by-name SQL") {
    import graft.functions.{DeflateLen, GraftFns, TextFns}
    import org.apache.spark.unsafe.types.UTF8String
    val prose = "the quick brown fox jumps over the lazy dog " * 8
    val repet = "ab" * 176 // same byte length as prose (352)
    assert(prose.length == repet.length)
    val dlP = DeflateLen.compute(UTF8String.fromString(prose))
    val dlR = DeflateLen.compute(UTF8String.fromString(repet))
    assert(dlR * 4 < dlP, s"repetitive $dlR should compress ≪ prose $dlP")
    assert(dlP < prose.length) // even prose with repeats compresses some
    // deterministic per JVM
    assert(dlP == DeflateLen.compute(UTF8String.fromString(prose)))
    // distributed + null safety + by-name registration agree with the API
    val df = docs(1L -> prose, 2L -> repet)
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(3L, null))),
        docs(1L -> "x").schema))
    val api = df.select(col("doc_id"), TextFns.deflateLen(col("text")).as("dl"))
      .orderBy("doc_id").collect()
    assert(api(0).getLong(1) == dlP && api(1).getLong(1) == dlR && api(2).isNullAt(1))
    GraftFns.register(spark)
    df.createOrReplaceTempView("dfl_docs")
    val byName = spark.sql(
      "SELECT deflate_len(text) AS dl FROM dfl_docs ORDER BY doc_id").collect()
    assert(byName.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toList
      == List(dlP, dlR, -1L))
  }

  test("kmeansAssignQuantized: every vector lands on its nearest centroid; deterministic") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat / 11f - 0.4f).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val a = Similarity.kmeansAssignQuantized(df, "vec_id", "embedding", k = 3, iters = 2)
      .orderBy("vec_id").collect()
    val b = Similarity.kmeansAssignQuantized(df, "vec_id", "embedding", k = 3, iters = 2)
      .orderBy("vec_id").collect()
    assert(a.toSeq == b.toSeq) // rerun-deterministic
    assert(a.length == 40 && a.map(_.getLong(1)).toSet.subsetOf(Set(0L, 1L, 2L)))
    // iters=0: assignment against the raw init centroids (3 lowest ids) —
    // those three vectors must each sit in their own cluster at dist 0
    val z = Similarity.kmeansAssignQuantized(df, "vec_id", "embedding", k = 3, iters = 0)
      .filter(col("vec_id") < 3).orderBy("vec_id").collect()
    assert(z.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      == List((0L, 0L, 0L), (1L, 1L, 0L), (2L, 2L, 0L)))
    intercept[IllegalArgumentException] {
      Similarity.kmeansAssignQuantized(df.limit(2), "vec_id", "embedding", k = 3, iters = 1)
    }
  }
}
