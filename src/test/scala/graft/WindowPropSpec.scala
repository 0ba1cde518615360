package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._
import graft.streaming.WindowKernels.EmptyBuffer

/** Property tests for the pure window kernels and the CEP NFA — invariants
  * the reference's compatibility corpus checks by example, here checked over
  * randomized inputs (the reference has no property tests; SURVEY §5
  * flagged this as a cheap win). The NFA is additionally checked against a
  * brute-force quadratic reference matcher.
  */
class WindowPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genEvents: Gen[List[WinEvent]] = for {
    n <- Gen.choose(0, 60)
    vals <- Gen.listOfN(n, Gen.choose(-100, 100))
  } yield vals.zipWithIndex.map { case (v, i) =>
    WinEvent("k", i.toLong * 10, i.toLong, v.toDouble)
  }

  private def splitRandomly[A](xs: List[A], cut: Int): (List[A], List[A]) =
    xs.splitAt(if (xs.isEmpty) 0 else math.abs(cut) % (xs.length + 1))

  test("unbounded A+ state bound: O(h²) in the WITHIN horizon, never the stream; cap catches runaway") {
    // 2k events on one key, ALL matching the unbounded step — the
    // worst case for A+ (every event extends every stay branch and parks
    // an advance branch). The contract the WITHIN gate promises: in-flight
    // partials are bounded by the HORIZON population h as ~h²/2 prefixes
    // (enumerate-all-prefixes semantics), independent of stream length.
    def run(withinEvents: Long, cap: Int): (Int, Long) = {
      val spec = PatternSpec(
        Seq(Step.atLeast("a", 1)(_.etype == "A"), Step.simple("b")(_.etype == "B")),
        strict = false, every = true, withinEvents = Some(withinEvents),
        maxPartials = cap)
      val events = (0 until 2000).map(i =>
        CepEvent("k", i.toLong * 10, i.toLong, "A", 0.0, Nil, Nil))
      var st = NfaState(Nil, done = false)
      var maxP = 0
      events.grouped(200).foreach { chunk =>
        val (_, st2) = Cep.runNfa(chunk, st, spec)
        st = st2
        maxP = math.max(maxP, st.partials.size)
      }
      (maxP, st.dropped)
    }
    // h = 12: partials ≈ h²/2 + h stays ≈ 90 — far below a 1k cap, flat
    // over 2k events (re-runs at 10× stream length hold the same bound)
    val (maxP, dropped) = run(withinEvents = 12L, cap = 1000)
    assert(maxP <= 160, s"partials grew to $maxP")
    assert(dropped == 0L)
    // a WIDE horizon with a low cap: the maxPartials guard engages and
    // REPORTS the drops instead of letting state run away silently
    val (maxP2, dropped2) = run(withinEvents = 500L, cap = 256)
    assert(maxP2 <= 256 && dropped2 > 0L)
  }

  test("length(n): #Current = #events, #Expired = max(0, #events-n), window = last n") {
    check(Prop.forAll(genEvents, Gen.choose(1, 10)) { (events, n) =>
      val (out, buf) = WindowKernels.length(events, EmptyBuffer, n)
      val current = out.filter(_.op == 1)
      val expired = out.filter(_.op == -1)
      current.size == events.size &&
        expired.size == math.max(0, events.size - n) &&
        buf.events == events.takeRight(n) &&
        // changelog replays to exactly the retained window
        (current.map(_.eventId).toSet -- expired.map(_.eventId).toSet) ==
          buf.events.map(_.eventId).toSet
    })
  }

  test("length(n) is batch-split invariant (streaming = batch semantics)") {
    check(Prop.forAll(genEvents, Gen.choose(1, 10), Gen.choose(0, 100)) { (events, n, cut) =>
      val (a, b) = splitRandomly(events, cut)
      val (out1, s1) = WindowKernels.length(a, EmptyBuffer, n)
      val (out2, s2) = WindowKernels.length(b, s1, n)
      val (whole, sw) = WindowKernels.length(events, EmptyBuffer, n)
      (out1 ++ out2) == whole && s2 == sw
    })
  }

  test("lengthBatch(n): only complete batches flush; Expired lags one batch") {
    check(Prop.forAll(genEvents, Gen.choose(1, 10)) { (events, n) =>
      val (out, buf) = WindowKernels.lengthBatch(events, EmptyBuffer, n)
      val flushes = events.size / n
      val current = out.filter(_.op == 1)
      val expired = out.filter(_.op == -1)
      current.size == flushes * n &&
        expired.size == math.max(0, (flushes - 1) * n) &&
        buf.events.size == events.size % n
    })
  }

  test("time(d): retained window spans exactly (lastTs-d, lastTs]") {
    check(Prop.forAll(genEvents, Gen.choose(1L, 300L)) { (events, d) =>
      val (out, buf) = WindowKernels.time(events, EmptyBuffer, d)
      events.isEmpty || {
        val last = events.last.tsUs
        buf.events == events.filter(e => e.tsUs > last - d) &&
          out.count(_.op == 1) == events.size &&
          out.count(_.op == -1) == events.size - buf.events.size
      }
    })
  }

  test("sortTopN keeps the n best by value; split invariant") {
    check(Prop.forAll(genEvents, Gen.choose(1, 8), Gen.choose(0, 100)) { (events, n, cut) =>
      val (out, buf) = WindowKernels.sortTopN(events, EmptyBuffer, n, descending = true)
      val expectTop = events.sortBy(e => (-e.value, e.tsUs, e.eventId)).take(n)
      val (a, b) = splitRandomly(events, cut)
      val (o1, s1) = WindowKernels.sortTopN(a, EmptyBuffer, n, descending = true)
      val (o2, s2) = WindowKernels.sortTopN(b, s1, n, descending = true)
      buf.events.toSet == expectTop.toSet &&
        s2 == buf && (o1 ++ o2) == out
    })
  }

  test("sortTopNMulti: lexicographic criteria chain; split invariant") {
    import graft.streaming.WindowKernels.SortKey
    val genMulti: Gen[List[WinEvent]] = for {
      n <- Gen.choose(0, 60)
      vs <- Gen.listOfN(n, Gen.zip(Gen.choose(-3, 3), Gen.choose(-100, 100)))
    } yield vs.zipWithIndex.map { case ((g, v), i) =>
      WinEvent("k", i.toLong * 10, i.toLong, v.toDouble, Seq(g.toDouble))
    }
    check(Prop.forAll(genMulti, Gen.choose(1, 8), Gen.choose(0, 100)) { (events, n, cut) =>
      // criteria: vals(0) asc, then value desc — ties by (tsUs, eventId)
      val keys = Seq(SortKey(1, asc = true), SortKey(0, asc = false))
      val (out, buf) = WindowKernels.sortTopNMulti(events, EmptyBuffer, n, keys)
      val expectTop = events.sortBy(e => (e.vals.head, -e.value, e.tsUs, e.eventId)).take(n)
      val (a, b) = splitRandomly(events, cut)
      val (o1, s1) = WindowKernels.sortTopNMulti(a, EmptyBuffer, n, keys)
      val (o2, s2) = WindowKernels.sortTopNMulti(b, s1, n, keys)
      buf.events.toSet == expectTop.toSet &&
        s2 == buf && (o1 ++ o2) == out
    })
  }

  // ---- NFA vs brute-force reference matcher

  private val genCepEvents: Gen[List[CepEvent]] = for {
    n <- Gen.choose(0, 40)
    types <- Gen.listOfN(n, Gen.oneOf("A", "B", "C"))
  } yield types.zipWithIndex.map { case (t, i) =>
    CepEvent("k", i.toLong * 100, i.toLong, t, i.toDouble)
  }

  /** Brute-force relaxed A->B with EVERY + WITHIN: for each A, the first B
    * at-or-after it within w.
    */
  private def bruteForceAB(events: List[CepEvent], withinUs: Long): List[(Long, Long)] =
    events.filter(_.etype == "A").flatMap { a =>
      events.find(b => b.etype == "B" && b.tsUs > a.tsUs &&
        b.tsUs - a.tsUs <= withinUs).map(b => (a.eventId, b.eventId))
    }

  test("NFA relaxed A->B EVERY+WITHIN equals brute-force matcher") {
    val spec = PatternSpec(
      Seq(Step.simple("a")(_.etype == "A"), Step.simple("b")(_.etype == "B")),
      strict = false, every = true, withinUs = Some(500L))
    check(Prop.forAll(genCepEvents) { events =>
      val got = Cep.runNfa(events, NfaState(Nil, done = false), spec)._1
        .map(m => (m.steps.head.events.head.eventId, m.steps(1).events.head.eventId))
      got == bruteForceAB(events, 500L)
    })
  }

  test("NFA non-EVERY equals first-complete-sequence model, batch-split invariant") {
    // reference contract (pattern_every_overlapping_test.rs:194): without
    // EVERY a pattern is single-instance — the match anchors at the FIRST A
    // whose instance completes, later As neither seed nor replace it
    val spec = PatternSpec(
      Seq(Step.simple("a")(_.etype == "A"), Step.simple("b")(_.etype == "B")),
      strict = false, every = false)
    def model(events: List[CepEvent]): List[(Long, Long)] =
      events.find(_.etype == "A").flatMap { a =>
        events.find(b => b.etype == "B" && b.tsUs > a.tsUs)
          .map(b => (a.eventId, b.eventId))
      }.toList
    check(Prop.forAll(genCepEvents, Gen.choose(0, 100)) { (events, cut) =>
      val got = Cep.runNfa(events, NfaState(Nil, done = false), spec)._1
        .map(m => (m.steps.head.events.head.eventId, m.steps(1).events.head.eventId))
      val (a, b) = splitRandomly(events, cut)
      val (m1, s1) = Cep.runNfa(a, NfaState(Nil, done = false), spec)
      val (m2, _) = Cep.runNfa(b, s1, spec)
      got == model(events) && (m1 ++ m2).map(
        m => (m.steps.head.events.head.eventId, m.steps(1).events.head.eventId)) == got
    })
  }

  test("NFA is batch-split invariant (streaming = batch semantics)") {
    val spec = PatternSpec(
      Seq(Step.simple("a")(_.etype == "A"), Step.simple("b")(_.etype == "B")),
      strict = false, every = true, withinUs = Some(700L))
    check(Prop.forAll(genCepEvents, Gen.choose(0, 100)) { (events, cut) =>
      val (a, b) = splitRandomly(events, cut)
      val (m1, s1) = Cep.runNfa(a, NfaState(Nil, done = false), spec)
      val (m2, s2) = Cep.runNfa(b, s1, spec)
      val (whole, sw) = Cep.runNfa(events, NfaState(Nil, done = false), spec)
      (m1 ++ m2) == whole && s2 == sw
    })
  }

  test("skip-past NFA equals greedy leftmost non-overlapping reference, batch-split invariant, timeout flush") {
    import Cep.{SkipNfaState, runNfaSkipPast, skipPastTimeoutFlush}
    val w = 500L
    val spec = PatternSpec(
      Seq(Step.simple("a")(_.etype == "A"),
        Step("b", 1, 3, (e, _) => e.etype == "B")),
      strict = true, every = true, withinUs = Some(w))
    def emptySt = SkipNfaState(NfaState(Nil, done = false), 0L, Nil)
    def ids(ms: Seq[CepMatch]) = ms.map(m =>
      (m.steps.head.events.head.eventId, m.steps(1).events.last.eventId,
        m.steps(1).events.size))
    // independent reference: scan left to right; at an A, take the LONGEST
    // contiguous B run (≤3, end within w of the A), emit, resume past it
    def ref(events: List[CepEvent]): List[(Long, Long, Int)] = {
      val ev = events.toVector
      val out = List.newBuilder[(Long, Long, Int)]
      var pos = 0
      while (pos < ev.length) {
        val g = if (ev(pos).etype != "A") None else
          (3 to 1 by -1).collectFirst(Function.unlift { k =>
            val end = pos + k
            if (end < ev.length && (pos + 1 to end).forall(ev(_).etype == "B") &&
                ev(end).tsUs - ev(pos).tsUs <= w) Some((k, end)) else None
          })
        g match {
          case Some((k, end)) =>
            out += ((ev(pos).eventId, ev(end).eventId, k)); pos = end + 1
          case None => pos += 1
        }
      }
      out.result()
    }
    check(Prop.forAll(genCepEvents, Gen.choose(0, 100)) { (events, cut) =>
      // whole-tape run + a far-future flush for candidates still held at
      // the tape end (the watermark sweep's job on a real stream)
      val (m0, s0) = runNfaSkipPast(events, emptySt, spec)
      val (mf, _) = skipPastTimeoutFlush(s0, Long.MaxValue / 2, w)
      val got = ids(m0 ++ mf)
      // the same tape split into two micro-batches must agree, state and all
      val (a, b) = splitRandomly(events, cut)
      val (m1, s1) = runNfaSkipPast(a, emptySt, spec)
      val (m2, s2) = runNfaSkipPast(b, s1, spec)
      val (mf2, _) = skipPastTimeoutFlush(s2, Long.MaxValue / 2, w)
      got == ref(events) && ids(m1 ++ m2 ++ mf2) == got
    })
  }

  test("NFA strict {n} equals consecutive-run counting") {
    val spec = PatternSpec(Seq(Step.count("e", 3)(_.etype == "A")),
      strict = true, every = true, withinUs = None)
    check(Prop.forAll(genCepEvents) { events =>
      val got = Cep.runNfa(events, NfaState(Nil, done = false), spec)._1.size
      // brute force: windows of 3 consecutive events, all A
      val expected = events.sliding(3).count(w => w.size == 3 && w.forall(_.etype == "A"))
      got == expected
    })
  }

  test("everyNEvents: chunk algebra + batch-split invariance for all behaviors") {
    val behaviors = Gen.oneOf[RateBehavior](
      RateBehavior.First, RateBehavior.Last, RateBehavior.All)
    check(Prop.forAll(genEvents, Gen.choose(1, 7), behaviors) { (events, n, b) =>
      val (out, st) = WindowKernels.everyNEvents(events, RateBuffer(0L, Nil), n, b)
      val chunks = events.grouped(n).toList
      val complete = chunks.filter(_.size == n)
      val algebraOk = b match {
        case RateBehavior.First =>
          // every chunk's head (open trailing chunk included), on arrival
          out.map(_.eventId) == chunks.map(_.head.eventId) && st.pending.isEmpty
        case RateBehavior.Last =>
          out.map(_.eventId) == complete.map(_.last.eventId) && st.pending.isEmpty
        case RateBehavior.All =>
          out.map(_.eventId) == complete.flatten.map(_.eventId) &&
            st.pending.map(_.eventId) == events.drop(complete.size * n).map(_.eventId)
      }
      algebraOk
    })
    check(Prop.forAll(genEvents, Gen.choose(1, 7), Gen.choose(0, 100), behaviors) {
      (events, n, cut, b) =>
        val (a2, b2) = splitRandomly(events, cut)
        val (o1, s1) = WindowKernels.everyNEvents(a2, RateBuffer(0L, Nil), n, b)
        val (o2, s2) = WindowKernels.everyNEvents(b2, s1, n, b)
        val (whole, sw) = WindowKernels.everyNEvents(events, RateBuffer(0L, Nil), n, b)
        (o1 ++ o2) == whole && s2 == sw
    })
  }

  // Skewed attribute stream: one heavy value plus a uniform tail, so runs
  // exercise both sides of the support threshold and bucket pruning.
  private val genLossyEvents: Gen[List[WinEvent]] = for {
    n <- Gen.choose(0, 300)
    vals <- Gen.listOfN(n, Gen.frequency(
      (6, Gen.const(1)), (2, Gen.const(2)), (1, Gen.choose(3, 12))))
  } yield vals.zipWithIndex.map { case (v, i) =>
    WinEvent("k", i.toLong * 10, i.toLong, v.toDouble)
  }

  test("lossyCounting: Manku-Motwani guarantees (soundness, ε-undercount, no false negatives, state bound)") {
    val params = Gen.oneOf((0.2, 0.05), (0.3, 0.1), (0.5, 0.2), (0.15, 0.02))
    check(Prop.forAll(genLossyEvents, params) { case (events, (support, error)) =>
      val (out, st) = WindowKernels.lossyCounting(
        events, LossyState(0L, Nil), support, error, _.value.toString)
      val n = events.size.toLong
      val trueFreq = events.groupBy(_.value.toString).map { case (a, es) => a -> es.size.toLong }
      val entryOf = st.entries.map(e => e.attr -> e).toMap
      // soundness: a tracked count never exceeds the true frequency, and
      // the bucket-offset bound Δ covers everything missed before tracking
      val sound = st.entries.forall(e =>
        e.cnt <= trueFreq(e.attr) && e.cnt + e.delta >= trueFreq(e.attr))
      // ε-undercount: tracked undercounts ≤ εN; untracked true freq ≤ εN
      val bounded = trueFreq.forall { case (a, f) =>
        entryOf.get(a) match {
          case Some(e) => f - e.cnt <= error * n + 1
          case None => f <= error * n + 1
        }
      }
      // no false negatives: every attr at/above support has a net-emitted
      // retained event, and the changelog nets to exactly the emitted set
      val netIds = out.groupBy(_.eventId).collect {
        case (id, ops) if ops.map(_.op).sum > 0 => id
      }.toSet
      val emittedIds = st.entries.filter(_.emitted).map(_.ev.eventId).toSet
      val noFalseNeg = trueFreq.forall { case (a, f) =>
        f < support * n || entryOf.get(a).exists(_.emitted)
      }
      // paper bound: at most (1/ε)·log(εN) + w entries
      val w = math.ceil(1.0 / error)
      val stateOk = n == 0 ||
        st.entries.size <= w * (math.log(math.max(error * n, math.E)) + 1)
      sound && bounded && noFalseNeg && netIds == emittedIds && stateOk
    })
  }

  test("lossyCounting is batch-split invariant (streaming = batch semantics)") {
    check(Prop.forAll(genLossyEvents, Gen.choose(0, 300)) { (events, cut) =>
      val (a, b) = splitRandomly(events, cut)
      val (o1, s1) = WindowKernels.lossyCounting(a, LossyState(0L, Nil), 0.3, 0.1, _.value.toString)
      val (o2, s2) = WindowKernels.lossyCounting(b, s1, 0.3, 0.1, _.value.toString)
      val (whole, sw) = WindowKernels.lossyCounting(
        events, LossyState(0L, Nil), 0.3, 0.1, _.value.toString)
      (o1 ++ o2) == whole && s2 == sw
    })
  }
}
