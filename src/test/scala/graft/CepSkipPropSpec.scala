package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._

/** Property test for the incremental skip-selection machine
  * ([[Cep.runNfaSkipPast]] + the timeout flush): random strict chains with
  * mixed greedy/reluctant quantifiers over random tapes, checked against an
  * INDEPENDENT brute-force reference — enumerate every (start, counts)
  * parse of the contiguous chain, then replay ANSI's selection loop
  * (earliest viable start, direction-aware lexicographic parse preference,
  * resume past-last-row or at a SKIP TO variable's row). Pure JVM (no
  * SparkSession): the kernel is where the selection logic lives; the batch
  * and streaming lowerings around it are pinned by the oracle rows and the
  * StreamingSpec parity tests.
  */
class CepSkipPropSpec extends AnyFunSuite {

  // deterministic LCG so failures replay
  private final class Rng(seed0: Long) {
    private var s = seed0
    def next(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound).toInt + bound) % bound
    }
  }

  private case class StepSpec(kinds: Set[Int], min: Int, max: Int, rel: Boolean)

  /** All (start, counts) parses: contiguous span from `start`, step i
    * consuming counts(i) events all matching step i's kind set. */
  private def enumerate(tape: IndexedSeq[Int], steps: Seq[StepSpec]): Seq[(Int, Seq[Int])] = {
    val out = Seq.newBuilder[(Int, Seq[Int])]
    def rec(si: Int, pos: Int, acc: List[Int], start: Int): Unit = {
      if (si == steps.length) { out += ((start, acc.reverse)); return }
      val st = steps(si)
      var c = 0
      var p = pos
      // zero consumed is never legal here (min >= 1 in generated chains)
      while (c < st.max && p < tape.length && st.kinds(tape(p))) {
        c += 1; p += 1
        if (c >= st.min) rec(si + 1, p, c :: acc, start)
      }
    }
    tape.indices.foreach(s => rec(0, s, Nil, s))
    out.result()
  }

  /** ANSI selection loop over the enumerated parse set. `resume`:
    * None = past last row; Some((i, first)) = at variable i's first/last
    * row (inclusive). */
  private def select(matches: Seq[(Int, Seq[Int])], rel: Seq[Boolean],
                     resume: Option[(Int, Boolean)]): Seq[(Int, Seq[Int])] = {
    def preferred(a: Seq[Int], b: Seq[Int]): Boolean = {
      val i = a.zip(b).indexWhere { case (x, y) => x != y }
      i >= 0 && (if (rel(i)) a(i) < b(i) else a(i) > b(i))
    }
    val out = Seq.newBuilder[(Int, Seq[Int])]
    var pos = Int.MinValue
    var live = matches
    var cont = true
    while (cont) {
      live = live.filter(_._1 >= pos)
      if (live.isEmpty) cont = false
      else {
        val s = live.map(_._1).min
        val best = live.filter(_._1 == s)
          .reduceLeft((x, y) => if (preferred(y._2, x._2)) y else x)
        out += best
        pos = resume match {
          case None => best._1 + best._2.sum
          case Some((i, first)) =>
            if (first) best._1 + best._2.take(i).sum
            else best._1 + best._2.take(i + 1).sum - 1
        }
        // progress guard mirrors the compile gate (resume never at start)
        require(pos > best._1, "resume must advance")
      }
    }
    out.result()
  }

  private def runMachine(tape: IndexedSeq[Int], steps: Seq[StepSpec],
                         resume: Option[(Int, Boolean)]): Seq[(Int, Seq[Int])] = {
    val within = 1000L * 1000000L
    val spec = PatternSpec(
      steps.zipWithIndex.map { case (st, i) =>
        Step(s"S$i", st.min, st.max,
          (e, _) => st.kinds(e.etype.toInt), reluctant = st.rel)
      },
      strict = true, every = true, withinUs = Some(within),
      maxPartials = 10000)
    val evs = tape.zipWithIndex.map { case (k, i) =>
      CepEvent("k", i.toLong * 1000000, i.toLong, k.toString, 0.0, Nil, Nil)
    }
    val (out, st) = Cep.runNfaSkipPast(evs,
      Cep.SkipNfaState(NfaState(Nil, done = false), 0L, Nil), spec, resume)
    // end of input = watermark past every deadline
    val (tail, _) = Cep.skipPastTimeoutFlush(st,
      wmUs = Long.MaxValue / 2, withinUs = within, resume = resume,
      rel = steps.map(_.rel))
    (out ++ tail).map { m =>
      // startSeq is 1-based over the tape; convert to 0-based index
      val startIdx = m.steps.head.events.head.eventId.toInt
      (startIdx, m.steps.map(_.events.size))
    }
  }

  /** Loop-chain parses: `pre… (loop…)+ post…` — members all {1,1}, k ≥ 1
    * iterations. counts = pre 1s ++ (k per loop member) ++ post 1s; the
    * span is contiguous, so the selection/resume arithmetic is shared
    * with plain chains. */
  private def enumerateLoop(tape: IndexedSeq[Int], pre: Seq[StepSpec],
                            loop: Seq[StepSpec], post: Seq[StepSpec]): Seq[(Int, Seq[Int])] = {
    val out = Seq.newBuilder[(Int, Seq[Int])]
    def consume(specs: Seq[StepSpec], pos: Int): Option[Int] = {
      var p = pos
      specs.foreach { st =>
        if (p >= tape.length || !st.kinds(tape(p))) return None
        p += 1
      }
      Some(p)
    }
    tape.indices.foreach { start =>
      consume(pre, start).foreach { p0 =>
        var p = p0
        var k = 0
        var cont = true
        while (cont) {
          consume(loop, p) match {
            case Some(p2) =>
              p = p2; k += 1
              consume(post, p).foreach { _ =>
                out += ((start, pre.map(_ => 1) ++ loop.map(_ => k) ++ post.map(_ => 1)))
              }
            case None => cont = false
          }
        }
      }
    }
    out.result()
  }

  private def runLoopMachine(tape: IndexedSeq[Int], pre: Seq[StepSpec],
                             loop: Seq[StepSpec], post: Seq[StepSpec],
                             resume: Option[(Int, Boolean)]): Seq[(Int, Seq[Int])] = {
    val within = 1000L * 1000000L
    def mk(st: StepSpec, name: String, lb: Int): Step =
      Step(name, 1, 1, (e, _) => st.kinds(e.etype.toInt), loopBack = lb)
    val steps = pre.zipWithIndex.map { case (st, i) => mk(st, s"P$i", -1) } ++
      loop.zipWithIndex.map { case (st, i) =>
        mk(st, s"L$i", if (i == loop.size - 1) loop.size - 1 else -1) } ++
      post.zipWithIndex.map { case (st, i) => mk(st, s"Q$i", -1) }
    val spec = PatternSpec(steps, strict = true, every = true,
      withinUs = Some(within), maxPartials = 10000)
    val evs = tape.zipWithIndex.map { case (kk, i) =>
      CepEvent("k", i.toLong * 1000000, i.toLong, kk.toString, 0.0, Nil, Nil)
    }
    val (out, st) = Cep.runNfaSkipPast(evs,
      Cep.SkipNfaState(NfaState(Nil, done = false), 0L, Nil), spec, resume)
    val (tail, _) = Cep.skipPastTimeoutFlush(st,
      wmUs = Long.MaxValue / 2, withinUs = within, resume = resume, rel = Nil)
    (out ++ tail).map { m =>
      (m.steps.head.events.head.eventId.toInt, m.steps.map(_.events.size))
    }
  }

  test("loop-group skip selection == brute-force reference over 200 random samples") {
    val rng = new Rng(0xBEEF)
    var checked = 0
    var nonEmpty = 0
    while (checked < 200) {
      def specOf(): StepSpec = {
        val kinds = (0 until 3).filter(_ => rng.next(2) == 1).toSet match {
          case e if e.isEmpty => Set(rng.next(3))
          case s2 => s2
        }
        StepSpec(kinds, 1, 1, rel = false)
      }
      val pre = Seq.fill(rng.next(2))(specOf())   // 0..1
      val loop = Seq.fill(1 + rng.next(2))(specOf()) // 1..2
      val post = Seq.fill(rng.next(2))(specOf())  // 0..1
      if (pre.isEmpty && post.isEmpty && loop.isEmpty) ()
      else {
        val tape = IndexedSeq.fill(4 + rng.next(17))(rng.next(3))
        // resume: past-last, or SKIP TO FIRST/LAST of a POST step (never a
        // loop member — its rows interleave; never the head — gate parity)
        val postBase = pre.size + loop.size
        val resume =
          if (post.isEmpty || rng.next(2) == 0) None
          else Some((postBase + rng.next(post.size), rng.next(2) == 0))
        val all = enumerateLoop(tape, pre, loop, post)
        val nSteps = pre.size + loop.size + post.size
        val want = select(all, Seq.fill(nSteps)(false), resume)
        val got = runLoopMachine(tape, pre, loop, post, resume)
        assert(got == want,
          s"pre=$pre loop=$loop post=$post tape=${tape.mkString} resume=$resume\n" +
            s"  want=$want\n  got=$got")
        if (want.nonEmpty) nonEmpty += 1
        checked += 1
      }
    }
    assert(nonEmpty > 80, s"only $nonEmpty/200 samples produced matches")
  }

  /** Quantified-member loop groups (round 14): brute-force every
    * (start, per-iteration member-count split) parse of
    * `pre (m1{1,x1} m2{1,x2}){minIters,maxIters} post` — strict
    * contiguity, so each parse's exact per-member row membership is
    * derivable — and compare the EVERY enumeration ([[Cep.runNfa]])
    * match-for-match on FULL collected event ids. This pins three things
    * at once: per-iteration min/max gating (iterBase), the
    * [minIters, maxIters] iteration gate, and the iterHist dedup identity
    * (two different splits can share per-step TOTALS — e.g. iteration
    * splits (1,2)+(2,1) vs (2,1)+(1,2) — and a totals-only identity would
    * wrongly collapse them).
    */
  test("quantified-member loop groups: EVERY enumeration == brute force over 200 random samples") {
    val rng = new Rng(0xF00D)

    final case class LoopCase(pre: Seq[StepSpec], loop: Seq[StepSpec],
                              post: Seq[StepSpec], minIters: Int, maxIters: Int)

    // brute force: all (start, per-step collected id lists)
    def bruteForce(tape: IndexedSeq[Int], c: LoopCase): Seq[(Int, Seq[Seq[Long]])] = {
      val out = Seq.newBuilder[(Int, Seq[Seq[Long]])]
      val nPre = c.pre.size; val nLoop = c.loop.size
      def consumeSeq(specs: Seq[StepSpec], pos: Int): Option[(Int, Seq[Seq[Long]])] = {
        var p = pos
        val bufs = Seq.newBuilder[Seq[Long]]
        specs.foreach { st =>
          if (p >= tape.length || !st.kinds(tape(p))) return None
          bufs += Seq(p.toLong); p += 1
        }
        Some((p, bufs.result()))
      }
      // one loop member with count choice c in [min..max]
      def member(si: Int, pos: Int, acc: Seq[Seq[Long]],
                 k: Int, start: Int, preB: Seq[Seq[Long]],
                 loopAcc: Seq[Seq[Long]]): Unit = {
        if (si == nLoop) { iterations(pos, k + 1, start, preB, loopAcc); return }
        val st = c.loop(si)
        var p = pos; var cnt = 0; var ids = List.empty[Long]
        while (cnt < st.max && p < tape.length && st.kinds(tape(p))) {
          ids ::= p.toLong; p += 1; cnt += 1
          if (cnt >= st.min)
            member(si + 1, p, acc, k, start, preB,
              loopAcc.updated(si, loopAcc(si) ++ ids.reverse))
        }
      }
      def iterations(pos: Int, k: Int, start: Int, preB: Seq[Seq[Long]],
                     loopAcc: Seq[Seq[Long]]): Unit = {
        if (k >= c.minIters)
          consumeSeq(c.post, pos).foreach { case (_, postB) =>
            out += ((start, preB ++ loopAcc ++ postB))
          }
        if (k < c.maxIters)
          member(0, pos, preB, k, start, preB, loopAcc)
      }
      tape.indices.foreach { start =>
        consumeSeq(c.pre, start).foreach { case (p0, preB) =>
          iterations(p0, 0, start, preB, Seq.fill(nLoop)(Seq.empty[Long]))
        }
      }
      out.result()
    }

    def runEvery(tape: IndexedSeq[Int], c: LoopCase): Seq[(Int, Seq[Seq[Long]])] = {
      def mk(st: StepSpec, name: String, lb: Int, looped: Boolean): Step =
        Step(name, st.min, st.max, (e, _) => st.kinds(e.etype.toInt),
          loopBack = lb, looped = looped,
          minIters = math.max(c.minIters, 1), maxIters = c.maxIters)
      val steps = c.pre.zipWithIndex.map { case (st, i) => mk(st, s"P$i", -1, looped = false) } ++
        c.loop.zipWithIndex.map { case (st, i) =>
          mk(st, s"L$i", if (i == c.loop.size - 1) c.loop.size - 1 else -1, looped = true) } ++
        c.post.zipWithIndex.map { case (st, i) => mk(st, s"Q$i", -1, looped = false) }
      val spec = PatternSpec(steps, strict = true, every = true,
        withinUs = Some(1000L * 1000000L), maxPartials = 10000)
      val evs = tape.zipWithIndex.map { case (kk, i) =>
        CepEvent("k", i.toLong * 1000000, i.toLong, kk.toString, 0.0, Nil, Nil)
      }
      val (out, _) = Cep.runNfa(evs, NfaState(Nil, done = false), spec)
      // start = the earliest consumed event (step 0's buffer may be EMPTY
      // when pre is empty and an inner group takes zero iterations)
      out.map(m => (m.steps.flatMap(_.events).map(_.eventId).min.toInt,
        m.steps.map(_.events.map(_.eventId))))
    }

    var checked = 0
    var nonEmpty = 0
    var multiIter = 0
    while (checked < 200) {
      def specOf(varCount: Boolean): StepSpec = {
        val kinds = (0 until 3).filter(_ => rng.next(2) == 1).toSet match {
          case e if e.isEmpty => Set(rng.next(3))
          case s2 => s2
        }
        val mx = if (varCount) 1 + rng.next(3) else 1
        StepSpec(kinds, 1, mx, rel = false)
      }
      val pre = Seq.fill(rng.next(2))(specOf(varCount = false))
      val loop = Seq.fill(1 + rng.next(2))(specOf(varCount = true))
      val post = Seq.fill(rng.next(2))(specOf(varCount = false))
      if (loop.forall(_.max == 1) && rng.next(3) != 0) ()   // bias toward real member quants
      else {
        val mi = 1 + rng.next(2)
        val ma = if (rng.next(2) == 0) Int.MaxValue else mi + rng.next(3)
        val c = LoopCase(pre, loop, post, mi, ma)
        val tape = IndexedSeq.fill(4 + rng.next(13))(rng.next(3))
        val want = bruteForce(tape, c)
          .map { case (s2, b) => (s2, b.map(_.sorted)) }.sortBy(_.toString)
        val got = runEvery(tape, c)
          .map { case (s2, b) => (s2, b.map(_.sorted)) }.sortBy(_.toString)
        assert(got == want,
          s"case=$c tape=${tape.mkString}\n  want=$want\n  got=$got")
        if (want.nonEmpty) nonEmpty += 1
        if (want.exists(_._2.take(pre.size + 1).lastOption.exists(_.size > 1)) ||
            want.exists { case (_, b) =>
              pre.size < b.size && b(pre.size).size > 1 }) multiIter += 1
        checked += 1
      }
    }
    assert(nonEmpty > 60, s"only $nonEmpty/200 samples produced matches")
    assert(multiIter > 20, s"only $multiIter/200 samples exercised multi-count members")
  }

  test("skip selection == brute-force reference over 300 random (chain, tape) samples") {
    val rng = new Rng(0xC0FFEE)
    var checked = 0
    var nonEmpty = 0
    while (checked < 300) {
      val nSteps = 2 + rng.next(2) // 2..3 steps
      val steps = (0 until nSteps).map { _ =>
        val kinds = (0 until 3).filter(_ => rng.next(2) == 1).toSet match {
          case e if e.isEmpty => Set(rng.next(3))
          case s2 => s2
        }
        val min = 1
        val max = rng.next(4) match {
          case 0 => 1
          case 1 => 2
          case 2 => 3
          case _ => Int.MaxValue
        }
        StepSpec(kinds, min, max, rel = rng.next(3) == 0)
      }
      val tape = IndexedSeq.fill(4 + rng.next(21))(rng.next(3))
      // resume mode: past-last, or SKIP TO FIRST/LAST of a non-head step
      val resume = rng.next(3) match {
        case 0 => None
        case 1 => Some((1 + rng.next(nSteps - 1), true))
        case _ => Some((1 + rng.next(nSteps - 1), false))
      }
      val all = enumerate(tape, steps)
      val want = select(all, steps.map(_.rel), resume)
      val got = runMachine(tape, steps, resume)
      assert(got == want,
        s"steps=$steps tape=${tape.mkString} resume=$resume\n" +
          s"  all=${all.take(20)}\n  want=$want\n  got=$got")
      if (want.nonEmpty) nonEmpty += 1
      checked += 1
    }
    // the generator must actually exercise matches, not vacuous emptiness
    assert(nonEmpty > 150, s"only $nonEmpty/300 samples produced matches")
  }
  test("variable-count NESTED groups: EVERY enumeration == brute force over 200 random samples") {
    val rng = new Rng(0xCAFE15)

    // pattern: pre -> ( (innerM){inMin,inMax} tail ){outMin,outMax} -> post
    final case class NestCase(pre: Seq[StepSpec], innerM: Seq[StepSpec],
                              tail: Seq[StepSpec], post: Seq[StepSpec],
                              inMin: Int, inMax: Int, outMin: Int, outMax: Int)

    // independent brute force: enumerate every derivation, collect per-STEP
    // buffers (inner members accumulate across all outer x inner
    // iterations), then dedup on (start, membership) — derivations that
    // differ only in inner boundary placement are the SAME match
    def bruteForce(tape: IndexedSeq[Int], c: NestCase): Seq[(Int, Seq[Seq[Long]])] = {
      val out = Seq.newBuilder[(Int, Seq[Seq[Long]])]
      val offIn = c.pre.size
      val offTail = offIn + c.innerM.size
      val offPost = offTail + c.tail.size
      val total = offPost + c.post.size
      def consume1(specs: Seq[StepSpec], off: Int, pos: Int, acc: Vector[Seq[Long]],
                   k: (Int, Vector[Seq[Long]]) => Unit): Unit = {
        def go(si: Int, p: Int, a: Vector[Seq[Long]]): Unit =
          if (si == specs.size) k(p, a)
          else if (p < tape.length && specs(si).kinds(tape(p)))
            go(si + 1, p + 1, a.updated(off + si, a(off + si) :+ p.toLong))
        go(0, pos, acc)
      }
      def consumeVar(specs: Seq[StepSpec], off: Int, pos: Int, acc: Vector[Seq[Long]],
                     k: (Int, Vector[Seq[Long]]) => Unit): Unit = {
        def go(si: Int, p0: Int, a0: Vector[Seq[Long]]): Unit =
          if (si == specs.size) k(p0, a0)
          else {
            val st = specs(si)
            var p = p0; var cnt = 0; var a = a0
            while (cnt < st.max && p < tape.length && st.kinds(tape(p))) {
              a = a.updated(off + si, a(off + si) :+ p.toLong)
              p += 1; cnt += 1
              if (cnt >= st.min) go(si + 1, p, a)
            }
          }
        go(0, pos, acc)
      }
      def innerIters(pos: Int, j: Int, acc: Vector[Seq[Long]], kOut: Int, start: Int): Unit = {
        if (j >= c.inMin)
          consume1(c.tail, offTail, pos, acc,
            (p2, a2) => outerIters(p2, kOut + 1, a2, start))
        if (j < c.inMax)
          consumeVar(c.innerM, offIn, pos, acc,
            (p2, a2) => innerIters(p2, j + 1, a2, kOut, start))
      }
      def outerIters(pos: Int, k: Int, acc: Vector[Seq[Long]], start: Int): Unit = {
        if (k >= c.outMin)
          consume1(c.post, offPost, pos, acc, (p2, a2) => out += ((start, a2)))
        if (k < c.outMax) innerIters(pos, 0, acc, k, start)
      }
      tape.indices.foreach { start =>
        consume1(c.pre, 0, start, Vector.fill(total)(Seq.empty[Long]),
          (p0, a0) => outerIters(p0, 0, a0, start))
      }
      out.result().distinct
    }

    def runEvery(tape: IndexedSeq[Int], c: NestCase): Seq[(Int, Seq[Seq[Long]])] = {
      val nLoop = c.innerM.size + c.tail.size
      def mk(st: StepSpec, name: String): Step =
        Step(name, st.min, st.max, (e, _) => st.kinds(e.etype.toInt))
      val steps =
        c.pre.zipWithIndex.map { case (st, i) => mk(st, s"P$i") } ++
        c.innerM.zipWithIndex.map { case (st, i) =>
          mk(st, s"I$i").copy(looped = true,
            minIters = c.outMin, maxIters = c.outMax,
            inner = true,
            innerLoopBack = if (i == c.innerM.size - 1) c.innerM.size - 1 else -1,
            innerMinIters = c.inMin, innerMaxIters = c.inMax) } ++
        c.tail.zipWithIndex.map { case (st, i) =>
          mk(st, s"T$i").copy(looped = true,
            minIters = c.outMin, maxIters = c.outMax,
            loopBack = if (i == c.tail.size - 1) nLoop - 1 else -1) } ++
        c.post.zipWithIndex.map { case (st, i) => mk(st, s"Q$i") }
      val spec = PatternSpec(steps, strict = true, every = true,
        withinUs = Some(1000L * 1000000L), maxPartials = 20000)
      val evs = tape.zipWithIndex.map { case (kk, i) =>
        CepEvent("k", i.toLong * 1000000, i.toLong, kk.toString, 0.0, Nil, Nil)
      }
      val (out, _) = Cep.runNfa(evs, NfaState(Nil, done = false), spec)
      // start = the earliest consumed event (step 0's buffer may be EMPTY
      // when pre is empty and an inner group takes zero iterations)
      out.map(m => (m.steps.flatMap(_.events).map(_.eventId).min.toInt,
        m.steps.map(_.events.map(_.eventId))))
    }

    var checked = 0
    var nonEmpty = 0
    var multiInner = 0
    while (checked < 200) {
      def specOf(maxMax: Int): StepSpec = {
        val kinds = (0 until 3).filter(_ => rng.next(2) == 1).toSet match {
          case e if e.isEmpty => Set(rng.next(3))
          case s2 => s2
        }
        StepSpec(kinds, 1, 1 + rng.next(maxMax), rel = false)
      }
      val pre = Seq.fill(rng.next(2))(specOf(1))
      val innerM = Seq.fill(1 + rng.next(2))(specOf(2))
      val tail = Seq.fill(1 + rng.next(2))(specOf(1))
      val post = Seq.fill(rng.next(2))(specOf(1))
      // round 16: inMin = 0 exercises the zero-min tail fork (an outer
      // iteration may contain NO inner iterations)
      val inMin = rng.next(3)
      val inMax = if (rng.next(2) == 0) Int.MaxValue
        else math.max(inMin, 1) + rng.next(2)
      val outMin = 1 + rng.next(2)
      val outMax = if (rng.next(3) == 0) Int.MaxValue else outMin + rng.next(2)
      val c = NestCase(pre, innerM, tail, post, inMin, inMax, outMin, outMax)
      val tape = IndexedSeq.fill(4 + rng.next(11))(rng.next(3))
      val want = bruteForce(tape, c)
        .map { case (s2, b) => (s2, b.map(_.sorted)) }.distinct.sortBy(_.toString)
      val got = runEvery(tape, c)
        .map { case (s2, b) => (s2, b.map(_.sorted)) }.sortBy(_.toString)
      assert(got == want,
        s"case=$c tape=${tape.mkString}\n  want=$want\n  got=$got")
      if (want.nonEmpty) nonEmpty += 1
      // sample exercised >1 inner iteration: some inner member holds more
      // events than outer iterations could alone explain only if... just
      // count samples where an inner member's buffer exceeds its max
      // (must span >1 iteration, inner or outer)
      if (want.exists { case (_, b) =>
            b.slice(c.pre.size, c.pre.size + c.innerM.size).zip(c.innerM)
              .exists { case (buf, st) => buf.size > st.max } }) multiInner += 1
      checked += 1
    }
    assert(nonEmpty > 35, s"only $nonEmpty/200 samples produced matches")
    assert(multiInner > 8, s"only $multiInner/200 samples exercised repeated inner groups")
  }
  test("reluctant variable-member loop groups: two-level skip preference == brute force over 200 random samples") {
    val rng = new Rng(0x15BEEF)

    final case class RelCase(pre: Seq[StepSpec], loop: Seq[StepSpec],
                             post: Seq[StepSpec], minIters: Int, maxIters: Int)

    // every parse: (start, iterations, per-step counts) — pre steps may
    // be variable-count, so they enumerate count choices like loop members
    def parses(tape: IndexedSeq[Int], c: RelCase): Seq[(Int, Int, Seq[Int])] = {
      val out = Seq.newBuilder[(Int, Int, Seq[Int])]
      val nLoop = c.loop.size
      def consumeFix(specs: Seq[StepSpec], pos: Int): Option[Int] = {
        var p = pos
        specs.foreach { st =>
          if (p >= tape.length || !st.kinds(tape(p))) return None
          p += 1
        }
        Some(p)
      }
      def preStep(si: Int, pos: Int, start: Int, preCnts: Seq[Int]): Unit = {
        if (si == c.pre.size) {
          iterations(pos, 0, start, preCnts, Seq.fill(nLoop)(0)); return
        }
        val st = c.pre(si)
        var p = pos; var n = 0
        while (n < st.max && p < tape.length && st.kinds(tape(p))) {
          p += 1; n += 1
          if (n >= st.min) preStep(si + 1, p, start, preCnts.updated(si, n))
        }
      }
      def member(si: Int, pos: Int, k: Int, start: Int, preCnts: Seq[Int],
                 cnts: Seq[Int]): Unit = {
        if (si == nLoop) { iterations(pos, k + 1, start, preCnts, cnts); return }
        val st = c.loop(si)
        var p = pos; var n = 0
        while (n < st.max && p < tape.length && st.kinds(tape(p))) {
          p += 1; n += 1
          if (n >= st.min)
            member(si + 1, p, k, start, preCnts, cnts.updated(si, cnts(si) + n))
        }
      }
      def iterations(pos: Int, k: Int, start: Int, preCnts: Seq[Int],
                     cnts: Seq[Int]): Unit = {
        if (k >= c.minIters)
          consumeFix(c.post, pos).foreach { _ =>
            out += ((start, k, preCnts ++ cnts ++ c.post.map(_ => 1)))
          }
        if (k < c.maxIters) member(0, pos, k, start, preCnts, cnts)
      }
      tape.indices.foreach(start => preStep(0, start, start, Seq.fill(c.pre.size)(0)))
      out.result()
    }

    // the defined preference: earliest start; same start -> POSITIONAL
    // left-to-right resolution (regex backtracking order): each pre step
    // resolves by its own direction first; AT the group's position the
    // iteration count resolves (fewest preferred); member counts then
    // break ties (looped steps all reluctant -> fewer rows); post greedy.
    // Resume past the emitted match's last row.
    def selectRel(all: Seq[(Int, Int, Seq[Int])], c: RelCase): Seq[(Int, Seq[Int])] = {
      val nPre = c.pre.size
      def pref(a: (Int, Int, Seq[Int]), b: (Int, Int, Seq[Int])): Boolean = {
        var i = 0
        val n = math.min(a._3.length, b._3.length)
        while (i < n) {
          if (i == nPre && a._2 != b._2) return a._2 < b._2
          if (a._3(i) != b._3(i)) {
            val relI =
              if (i < nPre) c.pre(i).rel
              else if (i < nPre + c.loop.size) true
              else false
            return if (relI) a._3(i) < b._3(i) else a._3(i) > b._3(i)
          }
          i += 1
        }
        false
      }
      val out = Seq.newBuilder[(Int, Seq[Int])]
      var pos = Int.MinValue
      var live = all
      var cont = true
      while (cont) {
        live = live.filter(_._1 >= pos)
        if (live.isEmpty) cont = false
        else {
          val s = live.map(_._1).min
          val best = live.filter(_._1 == s)
            .reduceLeft((x, y) => if (pref(y, x)) y else x)
          out += ((best._1, best._3))
          pos = best._1 + best._3.sum
        }
      }
      out.result()
    }

    def runRelMachine(tape: IndexedSeq[Int], c: RelCase): Seq[(Int, Seq[Int])] = {
      val within = 1000L * 1000000L
      def mk(st: StepSpec, name: String): Step =
        Step(name, st.min, st.max, (e, _) => st.kinds(e.etype.toInt))
      val steps =
        c.pre.zipWithIndex.map { case (st, i) =>
          mk(st, s"P$i").copy(reluctant = st.rel) } ++
        c.loop.zipWithIndex.map { case (st, i) =>
          mk(st, s"L$i").copy(looped = true, reluctant = true,
            minIters = c.minIters, maxIters = c.maxIters,
            loopBack = if (i == c.loop.size - 1) c.loop.size - 1 else -1) } ++
        c.post.zipWithIndex.map { case (st, i) => mk(st, s"Q$i") }
      val spec = PatternSpec(steps, strict = true, every = true,
        withinUs = Some(within), maxPartials = 10000)
      val evs = tape.zipWithIndex.map { case (kk, i) =>
        CepEvent("k", i.toLong * 1000000, i.toLong, kk.toString, 0.0, Nil, Nil)
      }
      val rel = steps.map(_.reluctant)
      val (out, st) = Cep.runNfaSkipPast(evs,
        Cep.SkipNfaState(NfaState(Nil, done = false), 0L, Nil), spec, None)
      val (tail, _) = Cep.skipPastTimeoutFlush(st,
        wmUs = Long.MaxValue / 2, withinUs = within, resume = None, rel = rel)
      (out ++ tail).map { m =>
        (m.steps.head.events.head.eventId.toInt, m.steps.map(_.events.size))
      }
    }

    var checked = 0
    var nonEmpty = 0
    var tradeoff = 0
    while (checked < 200) {
      def specOf(maxMax: Int): StepSpec = {
        val kinds = (0 until 3).filter(_ => rng.next(2) == 1).toSet match {
          case e if e.isEmpty => Set(rng.next(3))
          case s2 => s2
        }
        StepSpec(kinds, 1, 1 + rng.next(maxMax), rel = false)
      }
      // pre steps may themselves be VARIABLE-count and RELUCTANT: the
      // positional rule must resolve them BEFORE the group's iteration key
      val pre = Seq.fill(rng.next(2))(
        specOf(2).copy(rel = rng.next(2) == 0))
      val loop = Seq.fill(1 + rng.next(2))(specOf(3))
      val post = Seq.fill(rng.next(2))(specOf(1))
      if (loop.forall(_.max == 1)) () // need a variable member
      else {
        val mi = 1 + rng.next(2)
        val ma = if (rng.next(2) == 0) Int.MaxValue else mi + rng.next(3)
        val c = RelCase(pre, loop, post, mi, ma)
        val tape = IndexedSeq.fill(4 + rng.next(13))(rng.next(3))
        val all = parses(tape, c)
        val want = selectRel(all, c)
        val got = runRelMachine(tape, c)
        assert(got == want,
          s"case=$c tape=${tape.mkString}\n  want=$want\n  got=$got")
        if (want.nonEmpty) nonEmpty += 1
        // a start held parses with DIFFERENT iteration counts -> the
        // two-level order was load-bearing
        if (all.groupBy(_._1).values.exists(ps => ps.map(_._2).distinct.size > 1))
          tradeoff += 1
        checked += 1
      }
    }
    assert(nonEmpty > 60, s"only $nonEmpty/200 samples produced matches")
    assert(tradeoff > 30, s"only $tradeoff/200 samples had iteration/row tradeoffs")
  }
  test("reluctant quantifier MATRIX on nested groups: skip selection == backtracking-DFS brute force over 240 random samples") {
    val rng = new Rng(0x16C0DE)

    // pattern: pre -> ( (innerM){inMin,inMax}[?] tail ){outMin,outMax}[?] -> post
    // — every member FIXED count 1 (the compile gate); innerRel/outerRel
    // set the preference direction at each choice; inMin may be 0 (the
    // zero-iteration derivation composes with both directions)
    final case class IRelCase(pre: Seq[StepSpec], innerM: Seq[StepSpec],
                              tail: Seq[StepSpec], post: Seq[StepSpec],
                              inMin: Int, inMax: Int, outMin: Int, outMax: Int,
                              innerRel: Boolean, outerRel: Boolean)

    // regex backtracking reference: DFS with the preferred branch first
    // (reluctant inner -> LEAVE/SKIP before CONTINUE; reluctant outer ->
    // COMPLETE before CONTINUE); first completed derivation per start wins
    def preferredParse(tape: IndexedSeq[Int], c: IRelCase, start: Int)
        : Option[Seq[Seq[Int]]] = {
      val offIn = c.pre.size
      val offTail = offIn + c.innerM.size
      val offPost = offTail + c.tail.size
      val total = offPost + c.post.size
      def consume(specs: Seq[StepSpec], off: Int, pos: Int,
                  acc: Vector[Seq[Int]]): Option[(Int, Vector[Seq[Int]])] = {
        var p = pos; var a = acc; var si = 0
        while (si < specs.size) {
          if (p >= tape.length || !specs(si).kinds(tape(p))) return None
          a = a.updated(off + si, a(off + si) :+ p)
          p += 1; si += 1
        }
        Some((p, a))
      }
      def atInner(pos: Int, j: Int, acc: Vector[Seq[Int]], k: Int)
          : Option[Vector[Seq[Int]]] = {
        def leave: Option[Vector[Seq[Int]]] =
          if (j >= c.inMin) consume(c.tail, offTail, pos, acc) match {
            case None => None
            case Some((p2, a2)) => outerChoice(p2, k + 1, a2)
          } else None
        def cont: Option[Vector[Seq[Int]]] =
          if (j < c.inMax) consume(c.innerM, offIn, pos, acc) match {
            case None => None
            case Some((p2, a2)) => atInner(p2, j + 1, a2, k)
          } else None
        if (c.innerRel) leave.orElse(cont) else cont.orElse(leave)
      }
      def outerChoice(pos: Int, k: Int, acc: Vector[Seq[Int]])
          : Option[Vector[Seq[Int]]] = {
        def cont: Option[Vector[Seq[Int]]] =
          if (k < c.outMax) atInner(pos, 0, acc, k) else None
        def comp: Option[Vector[Seq[Int]]] =
          if (k >= c.outMin) consume(c.post, offPost, pos, acc).map(_._2)
          else None
        if (c.outerRel) comp.orElse(cont) else cont.orElse(comp)
      }
      consume(c.pre, 0, start, Vector.fill(total)(Seq.empty[Int])) match {
        case None => None
        case Some((p0, a0)) => atInner(p0, 0, a0, 0)
      }
    }

    def runMachine(tape: IndexedSeq[Int], c: IRelCase): Seq[(Int, Seq[Seq[Int]])] = {
      val within = 1000L * 1000000L
      val nLoop = c.innerM.size + c.tail.size
      def mk(st: StepSpec, name: String): Step =
        Step(name, 1, 1, (e, _) => st.kinds(e.etype.toInt))
      val steps =
        c.pre.zipWithIndex.map { case (st, i) => mk(st, s"P$i") } ++
        c.innerM.zipWithIndex.map { case (st, i) =>
          mk(st, s"I$i").copy(looped = true, reluctant = c.outerRel,
            minIters = c.outMin, maxIters = c.outMax,
            inner = true,
            innerLoopBack = if (i == c.innerM.size - 1) c.innerM.size - 1 else -1,
            innerMinIters = c.inMin, innerMaxIters = c.inMax,
            innerReluctant = c.innerRel) } ++
        c.tail.zipWithIndex.map { case (st, i) =>
          mk(st, s"T$i").copy(looped = true, reluctant = c.outerRel,
            minIters = c.outMin, maxIters = c.outMax,
            loopBack = if (i == c.tail.size - 1) nLoop - 1 else -1) } ++
        c.post.zipWithIndex.map { case (st, i) => mk(st, s"Q$i") }
      val spec = PatternSpec(steps, strict = true, every = true,
        withinUs = Some(within), maxPartials = 20000)
      val evs = tape.zipWithIndex.map { case (kk, i) =>
        CepEvent("k", i.toLong * 1000000, i.toLong, kk.toString, 0.0, Nil, Nil)
      }
      // SKIP TO NEXT ROW under a parse preference: every start emits its
      // one preferred parse
      val resume = Some((-1, true))
      val (out, st) = Cep.runNfaSkipPast(evs,
        Cep.SkipNfaState(NfaState(Nil, done = false), 0L, Nil), spec, resume)
      val (tail, _) = Cep.skipPastTimeoutFlush(st,
        wmUs = Long.MaxValue / 2, withinUs = within, resume = resume,
        rel = steps.map(_.reluctant))
      (out ++ tail).map { m =>
        (m.steps.flatMap(_.events).map(_.eventId).min.toInt,
          m.steps.map(_.events.map(_.eventId).map(_.toInt)))
      }
    }

    var checked = 0
    var nonEmpty = 0
    var choiceful = 0
    var zeroMin = 0
    while (checked < 240) {
      def specOf(): StepSpec = {
        val kinds = (0 until 3).filter(_ => rng.next(2) == 1).toSet match {
          case e if e.isEmpty => Set(rng.next(3))
          case s2 => s2
        }
        StepSpec(kinds, 1, 1, rel = false)
      }
      val pre = Seq.fill(rng.next(2))(specOf())
      val innerM = Seq.fill(1 + rng.next(2))(specOf())
      val tail = Seq.fill(1 + rng.next(2))(specOf())
      val post = Seq.fill(rng.next(2))(specOf())
      val inMin = rng.next(3) // 0 exercises the zero-min fork under both directions
      val inMax = if (rng.next(2) == 0) Int.MaxValue
        else math.max(inMin, 1) + 1 + rng.next(2)
      val outMin = 1 + rng.next(2)
      val outMax = if (rng.next(3) == 0) Int.MaxValue else outMin + rng.next(2)
      // direction matrix: at least one reluctant (all-greedy nested specs
      // keep the counts-lex selection, a different defined order)
      val (ir, orl) = rng.next(3) match {
        case 0 => (true, false)
        case 1 => (false, true)
        case _ => (true, true)
      }
      val c = IRelCase(pre, innerM, tail, post, inMin, inMax, outMin, outMax, ir, orl)
      val tape = IndexedSeq.fill(4 + rng.next(11))(rng.next(3))
      val want = tape.indices.flatMap(st =>
        preferredParse(tape, c, st).map(b => (st, b.map(_.toSeq))))
      val got = runMachine(tape, c).sortBy(_._1)
      assert(got == want.sortBy(_._1),
        s"case=$c tape=${tape.mkString}\n  want=$want\n  got=$got")
      if (want.nonEmpty) nonEmpty += 1
      if (want.exists { case (st, b) =>
            b.slice(c.pre.size, c.pre.size + c.innerM.size).exists(_.size > math.max(c.inMin, 1)) ||
            b.flatten.size > (c.pre.size + c.innerM.size * math.max(c.inMin, 1) + c.tail.size + c.post.size) })
        choiceful += 1
      if (c.inMin == 0 && want.exists(_._2.slice(c.pre.size, c.pre.size + c.innerM.size).exists(_.isEmpty)))
        zeroMin += 1
      checked += 1
    }
    assert(nonEmpty > 40, s"only $nonEmpty/240 samples produced matches")
    assert(choiceful > 12, s"only $choiceful/240 samples exercised non-minimal parses")
    assert(zeroMin > 5, s"only $zeroMin/240 samples exercised empty inner buffers")
  }
}
