package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP pattern/sequence engine — the reference's differentiating feature
  * (SURVEY §2.8), re-expressed as an NFA over per-key ordered events inside
  * `flatMapGroupsWithState` (the FlinkCEP / MATCH_RECOGNIZE shape).
  *
  * Feature map to the reference:
  *  - `e1=S[filter] -> e2=S[filter]` followed-by chains: [[Step]] sequence;
  *    cross-step references (`e2.price > e1.price`) via the predicate's view
  *    of already-collected step events
  *    (stream_pre_state_processor.rs's StateEvent access)
  *  - PATTERN (relaxed, skip non-matching) vs SEQUENCE (strict contiguous):
  *    [[PatternSpec.strict]] (sequence_stream_receiver.rs clears pending on
  *    mismatch)
  *  - `{n}` count quantifiers: [[Step.min]]/[[Step.max]]
  *    (count_pre_state_processor.rs)
  *  - `EVERY` multi-instance restart: [[PatternSpec.every]] — every event
  *    seeds a new instance; without it the pattern matches once
  *  - `WITHIN d`: [[PatternSpec.withinUs]] — partials expire by event time
  *    (timer_wheel.rs)
  *  - logical OR: [[Step.or]]; AND of two streams = union of the two
  *    orderings (compose two detect() calls), as the reference's
  *    LogicalPreStateProcessor enumerates both arrival orders
  *  - indexed access `e1[0].x` + collection aggregations `avg(e1.price)`:
  *    the emitted [[CepMatch]] carries every collected event per step
  *
  * Scale: state is per key (`groupByKey`), bounded by
  * [[PatternSpec.maxPartials]] × pattern length; WITHIN expiry prunes
  * partials by event time. This is the same state-growth discipline the
  * reference needs 2120 lines of count_pre_state_processor.rs for.
  */
/** `vals` carries precomputed comparison operands for cross-step
  * predicates (SQL surface): Catalyst evaluates both sides of
  * `e2.price > e1.price * 1.1` as per-event doubles; the NFA only compares
  * slots — no expression evaluation inside the state machine. `svals`
  * carries select-referenced column values as strings for the STREAMING
  * SQL pattern path (outputs cast back to the target's declared types), so
  * match resolution needs no join back to the source.
  */
final case class CepEvent(key: String, tsUs: Long, eventId: Long, etype: String,
                          value: Double, vals: Seq[Double] = Nil,
                          svals: Seq[String] = Nil)
final case class Collected(step: String, events: Seq[CepEvent])
/** `matchSeq` (round 12): per-key 1-based ordinal in match-COMPLETION
  * order, carried across micro-batches through [[NfaState.matchSeq]] —
  * the streaming MATCH_NUMBER() equivalent (EMIT ALL ROWS groups a
  * match's per-event rows by it). Batch EMIT ALL ROWS keeps its own
  * start-position numbering (the oracle-pinned contract); completion
  * order and start order differ only for overlapping matches.
  */
final case class CepMatch(key: String, startUs: Long, endUs: Long,
                          steps: Seq[Collected], matchSeq: Long = 0L)
/** A [[CepMatch]] tagged with the index of the variant NFA that emitted it
  * (multi-variant patterns: AND arrival orderings, min=0 presence pairs).
  * `matchSeq`: per-key ordinal SHARED across variants, assigned in
  * conclusive-emission order by [[Cep.detectStreamMultiAllRows]] (streaming
  * EMIT ALL ROWS' mr_match_number); 0 from the other detect kernels.
  */
final case class VariantMatch(variant: Int, key: String, startUs: Long,
                              endUs: Long, steps: Seq[Collected],
                              matchSeq: Long = 0L)

/** One pattern step. `pred` sees the candidate event and all events
  * collected so far (indexed [stepIdx][arrivalIdx]) for cross-step
  * conditions. With min < max the NFA branches (both "stay" and "advance"
  * instances are kept), emitting eagerly at each count >= min on the last
  * step.
  */
/** `reluctant` (ANSI `+?` / `{n,m}?`): under skip-mode parse selection
  * this quantifier prefers the FEWEST repetitions (see skipPreferred);
  * ignored by the plain EVERY enumeration, which explores all parses.
  * `loopBack >= 0` (unbounded group repetition `(A B)+`): on this step's
  * completion the NFA ALSO branches back `loopBack` steps for another
  * iteration of the group, accumulating into the same per-step buffers.
  */
/** `minIters` / `maxIters` (with `loopBack >= 0`, round 14): the
  * `(A B){n,m}` family on the loop machine — the group must complete at
  * least `minIters` iterations before the match may advance past it or
  * emit, and the loop-back branch is taken only while the completed
  * iteration count stays below `maxIters` (∞ for `+` / `{n,}`). With
  * min/max on a `looped` step the MEMBER itself is quantified PER
  * ITERATION (`(A B+)+`): the NFA gates on the count collected since the
  * current iteration began ([[Partial.iterBase]]), not the accumulated
  * total.
  *
  * `iterPred` (round 14, per-iteration cross-member references): when
  * set, the NFA calls it instead of `pred`, passing the partial's
  * current-iteration base offsets — a predicate comparing against another
  * member of the SAME loop group anchors at that member's first event of
  * the CURRENT iteration (`(D U)+` with `U.price > D.price` binds each U
  * to its own iteration's D), where `pred`'s collected view could only
  * reach the first iteration's.
  */
/** `inner` / `innerLoopBack` / `innerMinIters` / `innerMaxIters`
  * (round 15, variable-count NESTED groups `((A B){1,3} C)+`): `inner`
  * marks every member of a variable-count inner group — its member
  * quantifier gates on the count collected since the current INNER
  * iteration began ([[Partial.innerBase]]) and same-inner-group refs
  * anchor there. `innerLoopBack >= 0` sits on the inner group's LAST
  * member: on its completion the NFA resolves the inner frame first —
  * once `innerMinIters` inner iterations are done the partial may LEAVE
  * the inner group (falling through to the ordinary outer advance /
  * outer loop-back logic), and while below `innerMaxIters` it also
  * branches back `innerLoopBack` steps for another inner iteration.
  * Exact-count inner groups keep the round-14 inlining (`__i` suffixes)
  * and never set these fields.
  */
final case class Step(
    name: String, min: Int, max: Int,
    pred: (CepEvent, Seq[Seq[CepEvent]]) => Boolean,
    reluctant: Boolean = false,
    loopBack: Int = -1,
    minIters: Int = 1,
    maxIters: Int = Int.MaxValue,
    looped: Boolean = false,
    iterPred: Option[(CepEvent, Seq[Seq[CepEvent]], Seq[Int]) => Boolean] = None,
    inner: Boolean = false,
    innerLoopBack: Int = -1,
    innerMinIters: Int = 1,
    innerMaxIters: Int = Int.MaxValue,
    // round 16: reluctant INNER group (`((A B)+? C)+`, inner `{n,m}?`) —
    // under skip-mode parse selection the inner loop prefers LEAVING at
    // the first opportunity. Resolved through the candidate's iterHist
    // record stream (see skipPreferred's histPreferred level); compile
    // gates keep every member fixed-count so record CONTENT is parse-
    // independent and the stream comparison is purely structural.
    innerReluctant: Boolean = false)
  extends Serializable

object Step {
  def simple(name: String)(p: CepEvent => Boolean): Step =
    Step(name, 1, 1, (e, _) => p(e))
  def count(name: String, n: Int)(p: CepEvent => Boolean): Step =
    Step(name, n, n, (e, _) => p(e))
  /** Unbounded `n`-or-more (the SQL `+` / `{n,}` forms). Pair with a
    * WITHIN bound — the SQL compiler enforces it; API callers must too,
    * or in-flight partials grow with the stream. */
  def atLeast(name: String, n: Int)(p: CepEvent => Boolean): Step =
    Step(name, n, Int.MaxValue, (e, _) => p(e))
  def or(name: String)(p1: CepEvent => Boolean, p2: CepEvent => Boolean): Step =
    Step(name, 1, 1, (e, _) => p1(e) || p2(e))
  def withContext(name: String)(p: (CepEvent, Seq[Seq[CepEvent]]) => Boolean): Step =
    Step(name, 1, 1, p)
}

/** Mid-chain absent guard (`A -> NOT B -> C`,
  * stream_pre_state_processor.rs's absent discipline): an event matching
  * `pred` kills every partial sitting in the guarded gap — the anchoring
  * step `afterStep` complete, the next step not yet started — unless that
  * same event advances the partial out of the gap (the batch anti-join
  * bounds the guard STRICTLY between the anchor's last and the next step's
  * first event, so the next step's own event never kills its match).
  * `forUs` additionally narrows the guard to d after the anchor's last
  * collected event. Evaluated inside [[Cep.runNfa]], so it works on batch
  * and on every streaming detect variant, cross-micro-batch.
  */
final case class MidGuard(afterStep: Int, pred: CepEvent => Boolean,
                          forUs: Option[Long] = None) extends Serializable

/** withinEvents: count-bounded WITHIN — a partial expires once more than n
  * events (of its key) have arrived since it was seeded. The reference
  * parses but blocks `WITHIN n EVENTS` at conversion; the NFA supports it
  * directly.
  *
  * maxPartials bounds the simultaneous in-flight partial matches PER KEY
  * (state is per key × pattern length — without a cap, EVERY + relaxed
  * skipping on a hot key grows state linearly with the stream). On
  * overflow the earliest-seeded partials are kept, the newest dropped;
  * every drop is counted in [[NfaState.dropped]], surfaced through the
  * optional drop accumulator on detect/detectStream, and logged as a
  * warning — matches past the cap are LOST, so a nonzero count means
  * raise maxPartials, narrow step predicates, or add WITHIN bounds.
  */
final case class PatternSpec(
    steps: Seq[Step],
    strict: Boolean = false,
    every: Boolean = true,
    withinUs: Option[Long] = None,
    withinEvents: Option[Long] = None,
    maxPartials: Int = 512,
    midGuards: Seq[MidGuard] = Nil)

/** Serializable NFA state (data only — predicates live in the spec).
  * startSeq = per-key event ordinal at seed time (for withinEvents).
  * dropped = cumulative partials discarded past [[PatternSpec.maxPartials]].
  *
  * Loop-group bookkeeping (round 14, all empty/zero outside loop groups so
  * plain chains pay nothing):
  *  - `iters`: COMPLETED iterations of the loop group currently being
  *    matched (reset to 0 on advancing past the group's last member, so a
  *    later group in the same pattern starts fresh);
  *  - `iterBase`: per-step buffer size at the moment the current iteration
  *    began (Nil ≡ all zeros) — member quantifiers gate on
  *    `collected(i).size - iterBase(i)`, and per-iteration cross-member
  *    predicates anchor at `collected(ref)(iterBase(ref))`;
  *  - `iterHist`: flattened per-iteration counts of the looped steps for
  *    completed iterations, populated ONLY when some member has a variable
  *    count (min != max) — two parses can then hold the same per-step
  *    TOTALS with different membership (e.g. `(A+ B)+` splitting 3 As as
  *    2+1 vs 1+2 around a skipped event), so the dedup identity needs the
  *    split itself. Fixed-count members derive the split from the totals,
  *    keeping round-13 loop groups at their original hashing cost.
  */
final case class Partial(stepIdx: Int, startUs: Long, startSeq: Long,
                         collected: Seq[Seq[CepEvent]],
                         iters: Int = 0,
                         iterBase: Seq[Int] = Nil,
                         iterHist: Seq[Int] = Nil,
                         // nested (inner) iteration frame (round 15, both
                         // empty/zero outside variable-count nested groups):
                         // completed iterations of the inner group currently
                         // being matched within the CURRENT outer iteration,
                         // and the per-step buffer sizes when the current
                         // INNER iteration began — inner member quantifiers
                         // gate on `collected(i).size - innerBase(i)` and
                         // inner cross-member refs anchor at
                         // `collected(ref)(innerBase(ref))`. Reset to 0 (the
                         // base stays, see advance logic) on leaving the
                         // inner group; re-snapshotted on the outer
                         // loop-back edge.
                         innerIters: Int = 0,
                         innerBase: Seq[Int] = Nil)
final case class NfaState(partials: Seq[Partial], done: Boolean, seq: Long = 0L,
                          dropped: Long = 0L, matchSeq: Long = 0L)
/** One state-store entry for a multi-variant pattern family: the i-th
  * entry is variant i's independent NFA state.
  */
final case class MultiNfaState(states: Seq[NfaState])

object Cep {

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Event-time deadline (us) → state-store timeout timestamp (ms), rounded
    * UP: flooring would let the timeout fire up to 1ms before the
    * microsecond deadline, purging a partial a deadline-exact event could
    * still complete.
    */
  private def ceilMs(us: Long): Long = (us + 999L) / 1000L

  /** Dedup branch-convergent partials by their IDENTITY KEY instead of
    * structural equality: within one machine run a partial is fully
    * determined by (stepIdx, startSeq, per-step counts) — the seed event
    * is unique per startSeq, and at a given start the collected membership
    * follows deterministically from when each quantifier advanced, which
    * the count vector encodes. Structural `.distinct` hashed every
    * partial's full collected buffers on EVERY event — O(buffered events)
    * per event, the quadratic the monotone-streak bench caught (9 s for a
    * 10⁴-row streak spent hashing one partial's ever-growing buffer).
    */
  /** `hasLoops` = the spec contains a loop group: only then do the
    * iteration-frame fields join the key — same totals can hide different
    * iteration splits (and, with variable members, different membership —
    * iterHist carries the split; see [[Partial]]). Plain chains keep the
    * round-13 3-field key: hashing two always-Nil Seqs and an Int per
    * partial per event measurably taxed the hot kernel (~7% on the bench
    * CEP kernel), and without a loop edge the extra fields are constants.
    */
  /** `hasInner` = the spec contains a variable-count NESTED group: only
    * then do the inner-frame fields join the key (same flag-gating
    * rationale as `hasLoops` — outside nested groups they are constants).
    */
  private def distinctPartials(ps: Vector[Partial], hasLoops: Boolean,
                               hasInner: Boolean): Vector[Partial] =
    if (ps.length <= 1) ps
    else if (!hasLoops) {
      val seen = scala.collection.mutable.HashSet.empty[(Int, Long, Seq[Int])]
      ps.filter(p => seen.add((p.stepIdx, p.startSeq, p.collected.map(_.size))))
    } else if (!hasInner) {
      val seen = scala.collection.mutable.HashSet
        .empty[(Int, Long, Seq[Int], Int, Seq[Int], Seq[Int])]
      ps.filter(p => seen.add((p.stepIdx, p.startSeq,
        p.collected.map(_.size), p.iters, p.iterBase, p.iterHist)))
    } else {
      val seen = scala.collection.mutable.HashSet
        .empty[((Int, Long, Seq[Int], Int, Seq[Int], Seq[Int]), (Int, Seq[Int]))]
      ps.filter(p => seen.add(((p.stepIdx, p.startSeq,
        p.collected.map(_.size), p.iters, p.iterBase, p.iterHist),
        (p.innerIters, p.innerBase))))
    }

  private def specHasLoops(spec: PatternSpec): Boolean =
    spec.steps.exists(_.loopBack >= 0)
  private def specHasInner(spec: PatternSpec): Boolean =
    spec.steps.exists(_.innerLoopBack >= 0)

  /** Loop-group helpers shared by [[runNfa]] and [[runNfaSkipPast]].
    * `iterPred` anchors: for specs WITHOUT nested groups the base view is
    * the outer iteration base verbatim (zero allocation, the round-14
    * path); with nested groups each INNER step's anchor comes from the
    * inner frame instead — a ref from an inner member to an outer member
    * of the same group still reads the outer base, and a ref from an
    * outer member to an inner member reads the LAST inner iteration's
    * start (the inner base survives leaving the group).
    */
  private def stepOk(step: Step, e: CepEvent, p: Partial,
                     mergedBase: Partial => Seq[Int]): Boolean =
    step.iterPred match {
      case Some(ip) => ip(e, p.collected, mergedBase(p))
      case None => step.pred(e, p.collected)
    }
  private def baseAt(p: Partial, i: Int): Int =
    if (p.iterBase.isEmpty) 0 else p.iterBase(i)
  private def innerBaseAt(p: Partial, i: Int): Int =
    if (p.innerBase.isEmpty) 0 else p.innerBase(i)
  /** Gating base for the member quantifier at step i: inner members count
    * within the current INNER iteration, other looped members within the
    * current outer iteration, plain steps from zero. */
  private def gateBaseAt(step: Step, p: Partial, i: Int): Int =
    if (step.inner) innerBaseAt(p, i) else baseAt(p, i)
  /** Per-step counts collected in the CURRENT inner iteration of the
    * nested group [stepIdx-innerLoopBack, stepIdx]. */
  private def innerIterCounts(p: Partial, coll2: Seq[Seq[CepEvent]],
                              innerLoopBack: Int): Seq[Int] =
    (p.stepIdx - innerLoopBack to p.stepIdx)
      .map(i => coll2(i).size - innerBaseAt(p, i))
  /** Inner base for the NEXT inner iteration: the inner range snapshots
    * its current buffer sizes; everything else keeps its old inner base. */
  private def nextInnerBase(p: Partial, coll2: Seq[Seq[CepEvent]],
                            innerLoopBack: Int): Seq[Int] = {
    val lo = p.stepIdx - innerLoopBack
    Seq.tabulate(coll2.size)(i =>
      if (i >= lo && i <= p.stepIdx) coll2(i).size else innerBaseAt(p, i))
  }
  /** Per-step counts collected in the CURRENT iteration of the group
    * [stepIdx-loopBack, stepIdx]. */
  private def iterCounts(p: Partial, coll2: Seq[Seq[CepEvent]], loopBack: Int): Seq[Int] =
    (p.stepIdx - loopBack to p.stepIdx).map(i => coll2(i).size - baseAt(p, i))
  /** Iteration base for the NEXT iteration: the group range snapshots its
    * current buffer sizes; everything else keeps its old base (0 outside
    * any group the partial has visited). */
  private def nextBase(p: Partial, coll2: Seq[Seq[CepEvent]], loopBack: Int): Seq[Int] = {
    val lo = p.stepIdx - loopBack
    Seq.tabulate(coll2.size)(i =>
      if (i >= lo && i <= p.stepIdx) coll2(i).size else baseAt(p, i))
  }
  /** Zero-min inner groups (round 16): inner-group FIRST-member index →
    * tail first-step index, for groups with `innerMinIters == 0`
    * (`((A B)* C)+`, `{0,m}`). A partial standing at the group's first
    * inner member with NO inner events collected this outer iteration may
    * alternatively stand at the tail (the zero-iteration derivation).
    * Twins are DERIVED per event and never stored, so partial state,
    * checkpoints, and dedup keys are untouched; a twin that advances
    * becomes an ordinary partial at the tail. The compile gates require a
    * tail to exist (a trailing zero-min inner group is typed).
    */
  private def zeroMinTails(spec: PatternSpec): Map[Int, Int] =
    spec.steps.zipWithIndex.collect {
      case (s, li) if s.innerLoopBack >= 0 && s.innerMinIters == 0 =>
        (li - s.innerLoopBack, li + 1)
    }.toMap

  /** iterHist is only needed when a per-iteration count can vary: a looped
    * member's own count (min != max), or — round 15 — a nested group's
    * ITERATION count (innerMin != innerMax): two parses can then share
    * per-step totals and frame state while holding different membership
    * (e.g. `((I){1,} T){2,3}` reading I,T,I,I,I,T as splits (1|1)(3|1) vs
    * (3|1)(1|1) — same totals, different T rows; see [[Partial]]). */
  private def needIterHist(spec: PatternSpec): Boolean =
    spec.steps.exists(s => ((s.looped || s.loopBack >= 0) && s.min != s.max) ||
      (s.innerLoopBack >= 0 && s.innerMinIters != s.innerMaxIters))

  private implicit val keyEnc: Encoder[String] = Encoders.STRING
  private implicit val matchEnc: Encoder[CepMatch] = Encoders.product[CepMatch]
  private implicit val stateEnc: Encoder[NfaState] = Encoders.product[NfaState]
  private implicit val evEnc: Encoder[CepEvent] = Encoders.product[CepEvent]


  /** Shared member-completion advance for [[runNfa]] and
    * [[runNfaSkipPast]] (the two machines differ ONLY in what a terminal
    * completion does — emit vs hold a candidate): resolves the INNER
    * frame first (leave once the inner floor is met, folding the inner
    * split into iterHist — the inner base SURVIVES leaving so later
    * outer-member refs anchor at the last inner iteration — and branch
    * back while below the inner ceiling), then the OUTER loop frame
    * (iteration gate, maxIters-bounded loop-back, −1-marked history
    * records on nested specs), then plain advance/complete. */
  private def advanceMember(step: Step, p: Partial, coll2: Seq[Seq[CepEvent]],
      needHist: Boolean, hasInner: Boolean, nSteps: Int,
      push: Partial => Unit, complete: Seq[Int] => Unit): Unit = {
    def outerAdvance(pp: Partial): Unit = {
      if (step.loopBack >= 0) {
        val itersDone = pp.iters + 1
        val histDone =
          if (!needHist) Nil
          else if (hasInner)
            pp.iterHist ++ (-1 +: iterCounts(pp, coll2, step.loopBack))
          else pp.iterHist ++ iterCounts(pp, coll2, step.loopBack)
        if (itersDone >= step.minIters) {
          if (pp.stepIdx == nSteps - 1) complete(histDone)
          else push(Partial(pp.stepIdx + 1, pp.startUs, pp.startSeq,
            coll2, iters = 0, iterBase = Nil, iterHist = histDone))
        }
        if (itersDone < step.maxIters) {
          val nb = nextBase(pp, coll2, step.loopBack)
          // a fresh outer iteration also restarts the inner frame
          push(Partial(pp.stepIdx - step.loopBack, pp.startUs,
            pp.startSeq, coll2, iters = itersDone,
            iterBase = nb, iterHist = histDone,
            innerIters = 0, innerBase = if (hasInner) nb else Nil))
        }
      } else if (pp.stepIdx == nSteps - 1) {
        complete(pp.iterHist)
      } else {
        // mid-group members carry the iteration frames forward; outside a
        // group all fields are at their defaults
        push(Partial(pp.stepIdx + 1, pp.startUs, pp.startSeq, coll2,
          iters = pp.iters, iterBase = pp.iterBase, iterHist = pp.iterHist,
          innerIters = pp.innerIters, innerBase = pp.innerBase))
      }
    }
    if (step.innerLoopBack >= 0) {
      val innerDone = p.innerIters + 1
      val ihist =
        if (!needHist) p.iterHist
        else p.iterHist ++ innerIterCounts(p, coll2, step.innerLoopBack)
      if (innerDone >= step.innerMinIters)
        outerAdvance(p.copy(iterHist = ihist, innerIters = 0))
      if (innerDone < step.innerMaxIters)
        push(Partial(p.stepIdx - step.innerLoopBack, p.startUs, p.startSeq,
          coll2, iters = p.iters, iterBase = p.iterBase,
          iterHist = ihist, innerIters = innerDone,
          innerBase = nextInnerBase(p, coll2, step.innerLoopBack)))
    } else outerAdvance(p)
  }

  /** Core incremental NFA step: feed ordered events through the state. */
  def runNfa(events: Seq[CepEvent], init: NfaState, spec: PatternSpec)
      : (Seq[CepMatch], NfaState) = {
    val nSteps = spec.steps.size
    val needHist = needIterHist(spec)
    val hasLoops = specHasLoops(spec)
    val hasInner = specHasInner(spec)
    val mergedBase: Partial => Seq[Int] =
      if (!hasInner) (p: Partial) => p.iterBase
      else (p: Partial) => Seq.tabulate(nSteps)(i =>
        if (spec.steps(i).inner) innerBaseAt(p, i) else baseAt(p, i))
    val zmTails: Map[Int, Int] =
      if (hasInner) zeroMinTails(spec) else Map.empty
    var partials: Vector[Partial] = init.partials.toVector
    var done = init.done
    var seq = init.seq
    var mseq = init.matchSeq
    var droppedRun = 0L
    val matches = Seq.newBuilder[CepMatch]

    events.foreach { e =>
      seq += 1
      if (!(done && !spec.every)) {
        // WITHIN expiry by event time and/or event count
        spec.withinUs.foreach { w =>
          partials = partials.filter(p => e.tsUs - p.startUs <= w)
        }
        spec.withinEvents.foreach { n =>
          partials = partials.filter(p => seq - p.startSeq <= n)
        }
        // Without EVERY the pattern is single-instance: only the FIRST
        // complete sequence ever emits, and no new instance is seeded while
        // one is in flight (pattern_every_overlapping_test.rs:194-285 —
        // A1, A2, B3 against `A -> B` yields exactly A1-B3; A2 is ignored).
        // With EVERY, every event seeds a fresh concurrent instance — true
        // overlapping per the reference's grammar spec (same file :786-969),
        // including the sliding count-quantifier form its :1203 test marks
        // as intended-but-unimplemented.
        val seedNow = spec.every || partials.isEmpty
        val seed = Partial(0, e.tsUs, seq, Vector.fill(nSteps)(Vector.empty))
        val next = Vector.newBuilder[Partial]
        var matchedNow = false
        // nested groups only: two parses differing ONLY in inner-iteration
        // structure can hold IDENTICAL buffers (e.g. ((A{1,2}){1,2} C)+
        // reading A A as one 2-count iteration vs two 1-count iterations) —
        // same (start, membership) = the SAME match, emitted once
        val emittedNow =
          if (hasInner)
            scala.collection.mutable.HashSet.empty[(Long, Seq[Seq[Long]])]
          else null

        (if (seedNow) partials :+ seed else partials).foreach { p0 =>
          // zero-min inner group: also evaluate this event at the tail (the
          // zero-iteration derivation) when no inner event has been
          // consumed this outer iteration — derived, never stored
          val forks: Seq[(Partial, Boolean)] = zmTails.get(p0.stepIdx) match {
            case Some(t) if p0.innerIters == 0 &&
                p0.collected(p0.stepIdx).size == innerBaseAt(p0, p0.stepIdx) =>
              Seq((p0, false), (p0.copy(stepIdx = t), true))
            case _ => Seq((p0, false))
          }
          forks.foreach { case (p, isTwin) =>
          val step = spec.steps(p.stepIdx)
          // mid-chain NOT: this event kills every partial whose guarded gap
          // is open (anchor collected, next step empty) — unless the step
          // predicate also matches, in which case the event ADVANCES the
          // partial instead (strict between-bounds, see [[MidGuard]])
          val guardKill = spec.midGuards.exists { g =>
            p.stepIdx == g.afterStep + 1 && p.collected(p.stepIdx).isEmpty &&
            g.pred(e) &&
            g.forUs.forall(f => e.tsUs <= p.collected(g.afterStep).last.tsUs + f)
          }
          if (stepOk(step, e, p, mergedBase)) {
            val coll2 = p.collected.updated(p.stepIdx, p.collected(p.stepIdx) :+ e)
            // member quantifiers gate on the count collected THIS
            // iteration (total minus the iteration base — zero outside
            // loop groups, so plain chains read the total as before;
            // INNER members gate within the current inner iteration)
            val cnt = coll2(p.stepIdx).size
            val cntIter = cnt - gateBaseAt(step, p, p.stepIdx)
            if (cntIter < step.max)
              next += p.copy(collected = coll2) // stay: await more of this step
            if (cntIter >= step.min) {
              def emitHere(): Unit = {
                // non-EVERY: first completion only — a second partial
                // completing on the same event is not emitted (reference:
                // "the first complete sequence" wins)
                // key = full membership (event ids), not counts: relaxed
                // mode can skip middle events, so equal counts do not
                // imply equal membership; hashing is per EMISSION, not
                // per event
                if (hasInner && !emittedNow.add(
                    (p.startSeq, coll2.map(_.map(_.eventId))))) {
                  matchedNow = true; return
                }
                if (spec.every || !matchedNow) {
                  mseq += 1
                  matches += CepMatch(e.key, p.startUs, e.tsUs,
                    spec.steps.map(_.name).zip(coll2).map { case (n, es) => Collected(n, es) },
                    matchSeq = mseq)
                }
                matchedNow = true
              }
              advanceMember(step, p, coll2, needHist, hasInner, nSteps,
                next += _, _ => emitHere())
            }
          } else if (!spec.strict && !guardKill) {
            // relaxed PATTERN: non-matching events are skipped; seeds that
            // fail step 0 are simply not retained. Twins never retain —
            // the original (retained separately) re-derives them.
            if (!isTwin && (p ne seed)) next += p
          }
          // strict SEQUENCE: mismatch kills the in-flight instance;
          // guardKill: a mid-chain NOT event kills the gap's partial
          }
        }

        val trimmed = distinctPartials(next.result(), hasLoops, hasInner)
        if (trimmed.size > spec.maxPartials)
          droppedRun += trimmed.size - spec.maxPartials
        partials = trimmed.take(spec.maxPartials)
        if (matchedNow && !spec.every) { done = true; partials = Vector.empty }
      }
    }
    if (droppedRun > 0)
      log.warn(s"CEP NFA dropped $droppedRun in-flight partial match(es) past " +
        s"maxPartials=${spec.maxPartials} for key '${events.head.key}' — " +
        "matches past the cap are lost; raise PatternSpec.maxPartials, " +
        "narrow step predicates, or add a WITHIN bound")
    (matches.result(), NfaState(partials, done, seq, init.dropped + droppedRun, mseq))
  }

  /** One held candidate of the streaming SKIP PAST LAST ROW machine: a
    * COMPLETED match waiting until no earlier-or-same-start partial can
    * still produce a leftmost-greedier match. `counts` = per-step buffer
    * sizes (the greedy comparison key — lex-max wins at a fixed start).
    */
  /** `groupIters` (round 15, −1 = not applicable): total loop-group
    * iterations of the candidate's parse — populated only when the spec
    * holds a RELUCTANT loop group with a variable-count member, where the
    * group-level '?' is defined as the two-level lexicographic key
    * "fewest ITERATIONS, then fewest member rows" (member counts alone
    * cannot order parses whose iteration/member splits trade off). */
  /** `hist` (round 16, Nil = not applicable): the candidate parse's full
    * iterHist record stream — populated only when the spec holds a
    * reluctant INNER group, where the parse preference is the stream's
    * first structural divergence (leave-inner beats continue-inner; a
    * longer stream beats a strict prefix under the greedy outer group).
    * Streaming state schema v15 (the field defaults Nil, so pre-round-16
    * checkpoints of OTHER specs restore cleanly; inner-reluctant specs
    * are new surface with no prior checkpoints).
    */
  final case class SkipCand(m: CepMatch, startSeq: Long, endSeq: Long,
                            counts: Seq[Long], groupIters: Long = -1L,
                            hist: Seq[Int] = Nil)

  /** State of the streaming skip-past machine: the NFA state (partials
    * enumerate every (start, parse) pair exactly like EVERY mode), the
    * consumed-row frontier `pos` (per-key seq ordinal — matches starting
    * before it are overlapped and dead), and the held candidates (one
    * per start, best-parse-so-far).
    */
  final case class SkipNfaState(nfa: NfaState, pos: Long, cands: Seq[SkipCand])

  /** Incremental `AFTER MATCH SKIP PAST LAST ROW` / `SKIP TO FIRST|LAST`
    * (greedy leftmost non-overlapping selection) for a STRICT single-chain
    * pattern — batch AND streaming run this same machine (batch through
    * [[detectSkipPast]], which folds it over the key's history and
    * end-of-input-flushes; streaming through [[detectStreamSkipPast]]'s
    * watermark timeout). Enumeration is EVERY-mode (each event seeds;
    * stay/advance both explored), but instead of emitting on completion, a
    * completed match becomes a held CANDIDATE — at most ONE per live start
    * (lex-max parse wins), so the full EVERY match set is never
    * materialized: a k-row monotone streak holds one partial and one
    * candidate where the enumerate-then-filter shape materializes O(k²)
    * collected events. A candidate at start s emits only when NO live
    * partial has start ≤ s (an earlier-or-same-start partial could still
    * complete leftmost-er or greedier — the conservative hold), and
    * emission advances `pos` to the resume row — past the match's last row
    * (SKIP PAST), or AT the row FIRST/LAST of the named variable mapped to
    * (`resume` = (step index, isFirst); inclusive — that row may start the
    * next match, and the compile gate rejects resume-at-head so emitted
    * starts strictly increase) — killing overlapped partials/candidates.
    * `resume = Some((-1, _))` is SKIP TO NEXT ROW under a parse preference
    * (reluctant quantifiers): resume at start + 1, so every start emits
    * its one preferred parse and matches overlap freely (round 14).
    * In strict mode a partial dies on the first non-matching event or at
    * WITHIN expiry, so the hold is bounded by the WITHIN window — which
    * is why the streaming lowering REQUIRES a time WITHIN (the timeout
    * sweep must be able to flush a key that stops receiving events).
    * matchSeq numbers the SELECTED matches in emission order.
    *
    * Resume-row mapping needs no extra state: a strict chain's match spans
    * CONSECUTIVE rows (every event in [startSeq, endSeq] is collected —
    * a mismatch anywhere kills the instance), so variable i's first row is
    * startSeq + Σcounts(0..i-1) and its last is startSeq + Σcounts(0..i) - 1.
    *
    * No midGuards / OR-residual machinery: the compile gates restrict
    * skip modes to strict single chains without absent guards.
    */
  def runNfaSkipPast(events: Seq[CepEvent], init: SkipNfaState,
                     spec: PatternSpec,
                     resume: Option[(Int, Boolean)] = None): (Seq[CepMatch], SkipNfaState) = {
    val nSteps = spec.steps.size
    val needHist = needIterHist(spec)
    val hasLoops = specHasLoops(spec)
    val hasInner = specHasInner(spec)
    val mergedBase: Partial => Seq[Int] =
      if (!hasInner) (p: Partial) => p.iterBase
      else (p: Partial) => Seq.tabulate(nSteps)(i =>
        if (spec.steps(i).inner) innerBaseAt(p, i) else baseAt(p, i))
    // reluctant loop group with a VARIABLE-count member: candidates carry
    // the parse's total iteration count for the two-level preference
    // (fewest iterations, then fewest member rows). Derived from the
    // iterHist record count — needIterHist is true for exactly these
    // specs, one record of `width` ints per completed iteration (the
    // compile gates keep this to a single, non-nested loop group)
    val zmTails: Map[Int, Int] =
      if (hasInner) zeroMinTails(spec) else Map.empty
    val relVarWidth: Int =
      if (spec.steps.exists(s => s.looped && s.reluctant && s.min != s.max))
        spec.steps.find(_.loopBack >= 0).map(_.loopBack + 1).getOrElse(0)
      else 0
    var partials: Vector[Partial] = init.nfa.partials.toVector
    var seq = init.nfa.seq
    var mseq = init.nfa.matchSeq
    var pos = init.pos
    var cands: Vector[SkipCand] = init.cands.toVector
    var droppedRun = 0L
    val out = Seq.newBuilder[CepMatch]

    val rel = spec.steps.map(_.reluctant)
    val gStart = relVarGroupStart(spec)
    val irel = innerRelCfg(spec)
    def addCand(c: SkipCand): Unit = {
      if (c.startSeq < pos) return
      val i = cands.indexWhere(_.startSeq == c.startSeq)
      if (i < 0) cands :+= c
      else if (skipPreferred(c.counts, cands(i).counts, rel,
        c.groupIters, cands(i).groupIters, gStart,
        c.hist, cands(i).hist, irel)) cands = cands.updated(i, c)
    }
    def flush(): Unit = {
      val (emitted, st2) = skipFlush(SkipNfaState(
        NfaState(partials, done = false, seq, 0L, mseq), pos, cands), resume, rel,
        gStart, irel)
      out ++= emitted
      partials = st2.nfa.partials.toVector
      mseq = st2.nfa.matchSeq
      pos = st2.pos
      cands = st2.cands.toVector
    }

    events.foreach { e =>
      seq += 1
      spec.withinUs.foreach { w =>
        partials = partials.filter(p => e.tsUs - p.startUs <= w)
      }
      spec.withinEvents.foreach { n =>
        partials = partials.filter(p => seq - p.startSeq <= n)
      }
      val seed = Partial(0, e.tsUs, seq, Vector.fill(nSteps)(Vector.empty))
      val next = Vector.newBuilder[Partial]
      (partials :+ seed).foreach { p0 =>
        // zero-min inner group: derived tail fork (see zeroMinTails)
        val forks: Seq[Partial] = zmTails.get(p0.stepIdx) match {
          case Some(t) if p0.innerIters == 0 &&
              p0.collected(p0.stepIdx).size == innerBaseAt(p0, p0.stepIdx) =>
            Seq(p0, p0.copy(stepIdx = t))
          case _ => Seq(p0)
        }
        forks.foreach { p =>
        val step = spec.steps(p.stepIdx)
        if (stepOk(step, e, p, mergedBase)) {
          val coll2 = p.collected.updated(p.stepIdx, p.collected(p.stepIdx) :+ e)
          val cnt = coll2(p.stepIdx).size
          val cntIter = cnt - gateBaseAt(step, p, p.stepIdx)
          if (cntIter < step.max) next += p.copy(collected = coll2)
          if (cntIter >= step.min) {
            def candHere(hist: Seq[Int]): Unit = addCand(SkipCand(
              CepMatch(e.key, p.startUs, e.tsUs,
                spec.steps.map(_.name).zip(coll2).map { case (n, es) => Collected(n, es) }),
              p.startSeq, seq, coll2.map(_.size.toLong),
              groupIters =
                if (relVarWidth > 0) (hist.size / relVarWidth).toLong else -1L,
              hist = if (irel.isDefined) hist else Nil))
            // same loop-group bookkeeping as [[runNfa]], terminal
            // completions become held candidates
            advanceMember(step, p, coll2, needHist, hasInner, nSteps,
              next += _, candHere)
          }
        }
        // strict contiguity: a mismatching event kills the instance
        }
      }
      val trimmed = distinctPartials(next.result(), hasLoops, hasInner)
      if (trimmed.size > spec.maxPartials)
        droppedRun += trimmed.size - spec.maxPartials
      partials = trimmed.take(spec.maxPartials)
      flush()
    }
    if (droppedRun > 0)
      log.warn(s"CEP skip-past NFA dropped $droppedRun in-flight partial " +
        s"match(es) past maxPartials=${spec.maxPartials} for key " +
        s"'${events.headOption.map(_.key).getOrElse("?")}'")
    (out.result(),
      SkipNfaState(NfaState(partials, done = false, seq,
        init.nfa.dropped + droppedRun, mseq), pos, cands))
  }

  /** Parse preference at a fixed start: quantifiers resolve left to right,
    * each greedy one preferring MORE repetitions and each reluctant one
    * (`+?` / `{n,m}?`) FEWER — lexicographic comparison with a
    * per-position direction (regex backtracking order for a contiguous
    * chain). `rel(i)` = step i is reluctant; empty = all greedy. Returns
    * true when `a` is strictly preferred over `b`.
    */
  /** Hist-preference config (round 16): when the spec holds a nested
    * group under a RELUCTANT quantifier — inner (`((A B)+? C)+`), outer
    * (`((A B)+ C)+?`), or both — (group position, inner record width,
    * outer record width, innerReluctant, outerReluctant) for the
    * hist-stream preference; None otherwise (all-greedy nested specs keep
    * the counts-lex selection).
    */
  private[streaming] def innerRelCfg(spec: PatternSpec)
      : Option[(Int, Int, Int, Boolean, Boolean)] =
    spec.steps.find(_.innerLoopBack >= 0).flatMap { in =>
      val outerRel = spec.steps.exists(s => s.loopBack >= 0 && s.reluctant)
      if (!in.innerReluctant && !outerRel) None
      else Some((spec.steps.indexWhere(_.looped),
        in.innerLoopBack + 1,
        spec.steps.find(_.loopBack >= 0).map(_.loopBack + 1).getOrElse(0),
        in.innerReluctant, outerRel))
    }

  /** Backtracking order over two parses' iterHist record streams (both
    * from the same start, all member counts FIXED by the compile gates, so
    * record content is parse-independent and the first STRUCTURAL
    * divergence is the first differing derivation choice):
    *  - one stream has the `-1` outer marker where the other has an inner
    *    record → the marker-side parse LEFT (or, zero-min, SKIPPED) the
    *    inner loop at that choice; preferred iff the INNER group is
    *    reluctant, else the continuing parse wins (greedy inner);
    *  - equal prefix, one stream ends → the shorter COMPLETED where the
    *    longer took the outer loop-back; preferred iff the OUTER group is
    *    reluctant, else the longer wins (greedy outer).
    * Returns <0 a preferred, >0 b preferred, 0 tie.
    */
  private def histPreferred(a: Seq[Int], b: Seq[Int],
                            innerW: Int, outerW: Int,
                            innerRel: Boolean, outerRel: Boolean): Int = {
    var ia = 0; var ib = 0
    while (ia < a.length && ib < b.length) {
      val aOuter = a(ia) == -1; val bOuter = b(ib) == -1
      if (aOuter != bOuter)
        return if (aOuter == innerRel) -1 else 1
      val w = if (aOuter) outerW + 1 else innerW
      ia += w; ib += w
    }
    if (a.length == b.length) 0
    else if ((a.length < b.length) == outerRel) -1
    else 1
  }

  private def skipPreferred(a: Seq[Long], b: Seq[Long], rel: Seq[Boolean],
                            aIters: Long = -1L, bIters: Long = -1L,
                            groupStart: Int = -1,
                            aHist: Seq[Int] = Nil, bHist: Seq[Int] = Nil,
                            irel: Option[(Int, Int, Int, Boolean, Boolean)] = None): Boolean = {
    // two-level key for reluctant groups with variable-count members
    // (round 15): the group-level '?' prefers the FEWEST ITERATIONS, and
    // it resolves AT THE GROUP'S POSITION in the left-to-right quantifier
    // order (regex backtracking: steps BEFORE the group keep their own
    // preference first — a global iters-first comparison would let the
    // group override an earlier reluctant step's resolution); the
    // member-level directions then break ties among equal-iteration
    // parses (fewest member rows)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (i == groupStart && aIters >= 0L && bIters >= 0L && aIters != bIters)
        return aIters < bIters
      // reluctant INNER group (round 16): the whole group's parse order is
      // the hist-stream backtracking comparison, resolved AT the group's
      // position in the left-to-right quantifier order
      irel match {
        case Some((gs, iw, ow, ir, orl)) if i == gs =>
          val h = histPreferred(aHist, bHist, iw, ow, ir, orl)
          if (h != 0) return h < 0
        case _ => ()
      }
      if (a(i) != b(i))
        return if (i < rel.length && rel(i)) a(i) < b(i) else a(i) > b(i)
      i += 1
    }
    false
  }

  /** First looped step's index when the spec holds a reluctant loop group
    * with a variable-count member (the positional anchor for the
    * iteration key above); −1 otherwise. */
  private def relVarGroupStart(spec: PatternSpec): Int =
    if (spec.steps.exists(s => s.looped && s.reluctant && s.min != s.max))
      spec.steps.indexWhere(_.looped)
    else -1

  /** The selection sweep shared by the event path and the timeout path:
    * repeatedly emit the earliest-start held candidate once no live
    * partial at-or-before that start remains, advancing `pos` to the
    * emitted match's resume row (see [[runNfaSkipPast]]: past the span, or
    * the SKIP TO variable's first/last row — inclusive, allowing partial
    * overlap of the NEXT match). Returns (emitted, state'). */
  private def skipFlush(st: SkipNfaState,
                        resume: Option[(Int, Boolean)] = None,
                        rel: Seq[Boolean] = Nil,
                        groupStart: Int = -1,
                        irel: Option[(Int, Int, Int, Boolean, Boolean)] = None)
      : (Seq[CepMatch], SkipNfaState) = {
    var pos = st.pos
    var cands = st.cands.toVector
    var partials = st.nfa.partials.toVector
    var mseq = st.nfa.matchSeq
    val o = Seq.newBuilder[CepMatch]
    var cont = true
    while (cont) {
      cont = false
      cands = cands.filter(_.startSeq >= pos)
      if (cands.nonEmpty) {
        val s = cands.map(_.startSeq).min
        if (!partials.exists(_.startSeq <= s)) {
          val best = cands.filter(_.startSeq == s)
            .reduceLeft((x, y) => if (skipPreferred(y.counts, x.counts, rel,
              y.groupIters, x.groupIters, groupStart, y.hist, x.hist, irel)) y else x)
          mseq += 1
          o += best.m.copy(matchSeq = mseq)
          pos = resume match {
            case None => best.endSeq + 1
            case Some((i, _)) if i < 0 =>
              // SKIP TO NEXT ROW with a parse preference (reluctant
              // quantifiers, round 14): one preferred parse per START, the
              // scan resumes at the row after the match's first — matches
              // overlap freely, only same-start alternatives are decided
              best.startSeq + 1
            case Some((i, isFirst)) =>
              // contiguous span: variable i's rows sit at a counts-prefix
              // offset from the start (see runNfaSkipPast scaladoc)
              if (isFirst) best.startSeq + best.counts.take(i).sum
              else best.startSeq + best.counts.take(i + 1).sum - 1
          }
          partials = partials.filter(_.startSeq >= pos)
          cont = true
        }
      }
    }
    (o.result(), SkipNfaState(
      st.nfa.copy(partials = partials, matchSeq = mseq), pos, cands))
  }

  /** Expire partials past the WITHIN deadline at watermark time and
    * re-flush: candidates blocked only by now-dead partials emit. The
    * timeout half of [[runNfaSkipPast]] — without it a key that stops
    * receiving events would hold its last candidates forever.
    */
  def skipPastTimeoutFlush(st: SkipNfaState, wmUs: Long, withinUs: Long,
                           resume: Option[(Int, Boolean)] = None,
                           rel: Seq[Boolean] = Nil,
                           groupStart: Int = -1,
                           irel: Option[(Int, Int, Int, Boolean, Boolean)] = None)
      : (Seq[CepMatch], SkipNfaState) = {
    val live = st.nfa.partials.filter(p => p.startUs + withinUs >= wmUs)
    skipFlush(st.copy(nfa = st.nfa.copy(partials = live)), resume, rel,
      groupStart, irel)
  }

  /** Batch `AFTER MATCH SKIP PAST LAST ROW` / `SKIP TO FIRST|LAST`
    * detection: per-key sort, one [[runNfaSkipPast]] pass, then a final
    * flush with every partial dead — end of input is a watermark past
    * every deadline, so every held candidate is conclusive. This replaces
    * the enumerate-all-EVERY-matches-then-filter shape: the machine holds
    * O(live starts) candidates and consumes on match, so a key's cost is
    * linear in its history even on adversarial monotone streaks where the
    * EVERY match set is quadratic.
    */
  def detectSkipPast(ds: Dataset[CepEvent], spec: PatternSpec,
                     resume: Option[(Int, Boolean)] = None): Dataset[CepMatch] =
    // COLUMN-keyed grouping, not groupByKey(_.key) (round 16): the lambda
    // key adds a per-row AppendColumns closure and an exchange that can
    // never match existing partitioning; the column key drops the closure
    // and reuses an upstream hash exchange on `key` (the MR compiler's
    // persisted ordering) when one exists. Same groups, same matches.
    ds.groupBy(org.apache.spark.sql.functions.col("key")).as[String, CepEvent]
      .flatMapGroups { (_: String, it: Iterator[CepEvent]) =>
      val evs = it.toSeq.sortBy(e => (e.tsUs, e.eventId))
      val (out, st) = runNfaSkipPast(evs,
        SkipNfaState(NfaState(Nil, done = false), 0L, Nil), spec, resume)
      val (tail, _) = skipFlush(st.copy(nfa = st.nfa.copy(partials = Nil)),
        resume, spec.steps.map(_.reluctant), relVarGroupStart(spec),
        innerRelCfg(spec))
      (out ++ tail).iterator
    }

  /** Batch detection: per-key sort then one NFA pass. `dropCounter`
    * aggregates partials discarded past maxPartials across keys — zero
    * means no match was lost to the state cap.
    */
  def detect(ds: Dataset[CepEvent], spec: PatternSpec,
             dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[CepMatch] =
    // column-keyed grouping — see detectSkipPast
    ds.groupBy(org.apache.spark.sql.functions.col("key")).as[String, CepEvent]
      .flatMapGroups { (_: String, it: Iterator[CepEvent]) =>
      val (out, st) = runNfa(it.toSeq.sortBy(e => (e.tsUs, e.eventId)),
        NfaState(Nil, done = false), spec)
      dropCounter.foreach(_.add(st.dropped))
      out.iterator
    }

  /** Batch detection for a FAMILY of pattern variants over one shared
    * event encoding: each key's history is shuffled, sorted, and
    * materialized ONCE, then every variant's NFA folds over the same
    * in-memory sequence — V variants cost one exchange instead of V
    * (the multi-variant SQL patterns: AND arrival orderings, `A*`
    * presence pairs). Each variant runs the IDENTICAL independent
    * [[runNfa]] it would run under [[detect]], so match sets are
    * bit-for-bit those of V separate passes.
    */
  def detectMulti(ds: Dataset[CepEvent], specs: Seq[PatternSpec],
                  dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[VariantMatch] = {
    implicit val vmEnc: Encoder[VariantMatch] = Encoders.product[VariantMatch]
    // column-keyed grouping — see detectSkipPast
    ds.groupBy(org.apache.spark.sql.functions.col("key")).as[String, CepEvent]
      .flatMapGroups { (_: String, it: Iterator[CepEvent]) =>
      val evs = it.toSeq.sortBy(e => (e.tsUs, e.eventId))
      specs.iterator.zipWithIndex.flatMap { case (spec, vi) =>
        val (out, st) = runNfa(evs, NfaState(Nil, done = false), spec)
        dropCounter.foreach(_.add(st.dropped))
        out.map(m => VariantMatch(vi, m.key, m.startUs, m.endUs, m.steps))
      }
    }
  }

  /** Batch detection with BOUNDED per-key memory — the hot-key scale path.
    * [[detect]] materializes each key's full history (`it.toSeq`) before
    * the NFA pass: fine on TPC-H-shaped keys, an executor-memory cliff on a
    * pathological hot key. This variant instead SECONDARY-SORTS the
    * partitions (repartition by key, sortWithinPartitions by key/ts/id —
    * Spark's sort is spillable, so the ordering never needs the key in
    * memory) and folds the sorted run through [[runNfa]] in fixed-size
    * chunks, exactly like the streaming path folds micro-batches; resident
    * state is one chunk + the partial set (maxPartials-capped). Chunked
    * fold ≡ one-shot pass because runNfa is a state fold (the
    * batch≡streaming property CepSpec pins).
    */
  def detectSorted(ds: Dataset[CepEvent], spec: PatternSpec,
                   chunkSize: Int = 1 << 16,
                   dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[CepMatch] = {
    val sorted = ds.repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsUs"), col("eventId"))
      .as[CepEvent](evEnc)
    sorted.mapPartitions { it =>
      val b = it.buffered
      // one inner iterator per key run; flatten consumes each fully before
      // advancing, preserving the single-pass contract
      new Iterator[Iterator[CepMatch]] {
        def hasNext: Boolean = b.hasNext
        def next(): Iterator[CepMatch] = {
          val key = b.head.key
          var st = NfaState(Nil, done = false)
          val chunks = new Iterator[Seq[CepEvent]] {
            def hasNext: Boolean = b.hasNext && b.head.key == key
            def next(): Seq[CepEvent] = {
              val buf = Vector.newBuilder[CepEvent]
              var n = 0
              while (n < chunkSize && b.hasNext && b.head.key == key) {
                buf += b.next(); n += 1
              }
              buf.result()
            }
          }
          var lastDropped = 0L
          chunks.flatMap { evs =>
            val (out, st2) = runNfa(evs, st, spec)
            st = st2
            dropCounter.foreach(_.add(st2.dropped - lastDropped))
            lastDropped = st2.dropped
            out
          }
        }
      }.flatten
    }(matchEnc)
  }

  /** Streaming detection: NFA state persists across micro-batches; events
    * are ordered within each batch (cross-batch order = source contract).
    * `dropCounter` adds each batch's newly dropped partials (state carries
    * the cumulative count).
    */
  def detectStream(ds: Dataset[CepEvent], spec: PatternSpec,
                   dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[CepMatch] =
    ds.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[NfaState]) =>
        val init = state.getOption.getOrElse(NfaState(Nil, done = false))
        val (out, next) = runNfa(
          it.toSeq.sortBy(e => (e.tsUs, e.eventId)), init, spec)
        dropCounter.foreach(_.add(next.dropped - init.dropped))
        state.update(next)
        out.iterator
    }

  /** Streaming detection for a FAMILY of pattern variants: ONE state-store
    * entry per key holds every variant's [[NfaState]], and each micro-batch
    * shuffles the stream once instead of once per variant (the streaming
    * face of [[detectMulti]]). Each variant folds the identical
    * [[runNfa]] it would fold under [[detectStream]].
    */
  def detectStreamMulti(ds: Dataset[CepEvent], specs: Seq[PatternSpec],
                        dropCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[VariantMatch] = {
    implicit val vmEnc: Encoder[VariantMatch] = Encoders.product[VariantMatch]
    implicit val msEnc: Encoder[MultiNfaState] = Encoders.product[MultiNfaState]
    ds.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[MultiNfaState]) =>
        val evs = it.toSeq.sortBy(e => (e.tsUs, e.eventId))
        val init = state.getOption.getOrElse(
          MultiNfaState(specs.map(_ => NfaState(Nil, done = false))))
        val results = specs.zip(init.states).zipWithIndex.map { case ((spec, s0), vi) =>
          val (out, s1) = runNfa(evs, s0, spec)
          dropCounter.foreach(_.add(s1.dropped - s0.dropped))
          (out.map(m => VariantMatch(vi, m.key, m.startUs, m.endUs, m.steps)), s1)
        }
        state.update(MultiNfaState(results.map(_._2)))
        results.iterator.flatMap(_._1)
    }
  }

  /** [[detectStreamMulti]] with the [[detectStreamWithTimeout]] hygiene:
    * the event-time watermark purges partials past their WITHIN deadline
    * across ALL variants, and a key drained in every variant drops its
    * state entry entirely. All variants carry the query's single WITHIN.
    */
  def detectStreamMultiWithTimeout(ds: Dataset[CepEvent], specs: Seq[PatternSpec],
                                   watermarkDelay: String): Dataset[VariantMatch] = {
    val withinUs = specs.head.withinUs.getOrElse(
      throw new IllegalArgumentException("detectStreamMultiWithTimeout requires withinUs"))
    implicit val vmEnc: Encoder[VariantMatch] = Encoders.product[VariantMatch]
    implicit val msEnc: Encoder[MultiNfaState] = Encoders.product[MultiNfaState]
    val withTime = ds.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CepEvent](evEnc)
    def emptyStates = MultiNfaState(specs.map(_ => NfaState(Nil, done = false)))
    def latched(sts: Seq[NfaState]): Boolean =
      sts.zip(specs).exists { case (s, spec) => s.done && !spec.every }
    def schedule(state: GroupState[MultiNfaState], sts: Seq[NfaState]): Unit = {
      val deadlines = sts.flatMap(_.partials.map(p => ceilMs(p.startUs + withinUs)))
      if (deadlines.nonEmpty) state.setTimeoutTimestamp(
        math.max(deadlines.max, state.getCurrentWatermarkMs() + 1))
    }
    withTime.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[MultiNfaState]) =>
        if (state.hasTimedOut) {
          // same keep-at-equality rule as the single-spec kernel
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val sts = state.getOption.getOrElse(emptyStates).states.map(s =>
            s.copy(partials = s.partials.filter(p => p.startUs + withinUs >= wmUs)))
          if (sts.forall(_.partials.isEmpty) && !latched(sts)) state.remove()
          else { state.update(MultiNfaState(sts)); schedule(state, sts) }
          Iterator.empty
        } else {
          val evs = it.toSeq.sortBy(e => (e.tsUs, e.eventId))
          val init = state.getOption.getOrElse(emptyStates)
          val results = specs.zip(init.states).zipWithIndex.map { case ((spec, s0), vi) =>
            val (out, s1) = runNfa(evs, s0, spec)
            (out.map(m => VariantMatch(vi, m.key, m.startUs, m.endUs, m.steps)), s1)
          }
          val sts = results.map(_._2)
          if (sts.forall(_.partials.isEmpty) && !latched(sts)) state.remove()
          else { state.update(MultiNfaState(sts)); schedule(state, sts) }
          results.iterator.flatMap(_._1)
        }
    }
  }

  /** State of [[detectStreamMultiAllRows]]: every variant's NFA state plus
    * the per-key match ordinal SHARED across variants (streaming EMIT ALL
    * ROWS' mr_match_number must number a key's matches once, not per
    * variant — two variants' counters would collide).
    */
  final case class MultiSeqState(states: Seq[NfaState], shared: Long)

  /** [[detectStreamMultiWithTimeout]] for the EMIT ALL ROWS lowering: the
    * same shared-pass variant fold and watermark hygiene, plus a per-key
    * match ordinal shared across variants — each batch's matches (all
    * variants) sort by (endUs, startUs, variant) and number through one
    * counter carried in [[MultiSeqState]]. Completion-order numbering,
    * exactly like the single-chain kernel's matchSeq (batch numbers by
    * start position instead; the orders differ only for overlapping
    * matches). The counter latches the state shell once any match emitted
    * (the retainMatchSeq discipline) so numbers never restart mid-stream.
    *
    * State bound: O(keys that ever matched) retained shells for the life
    * of the query, a few dozen bytes each, never revisited while the key
    * is idle (once partials drain no timeout is scheduled — there is
    * nothing left to expire, and the shell itself must outlive any idle
    * gap to keep mr_match_number monotonic). This is deliberate, same
    * contract as [[detectStreamWithTimeout]]'s retainMatchSeq doc: no TTL
    * can prove a key finished on an unbounded stream, so a deployment
    * that cannot afford keys × ~100 B should not expose mr_match_number.
    */
  def detectStreamMultiAllRows(ds: Dataset[CepEvent], specs: Seq[PatternSpec],
                               watermarkDelay: String): Dataset[VariantMatch] = {
    val withinUs = specs.head.withinUs.getOrElse(
      throw new IllegalArgumentException("detectStreamMultiAllRows requires withinUs"))
    implicit val vmEnc: Encoder[VariantMatch] = Encoders.product[VariantMatch]
    implicit val msEnc: Encoder[MultiSeqState] = Encoders.product[MultiSeqState]
    val withTime = ds.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CepEvent](evEnc)
    def emptySt = MultiSeqState(specs.map(_ => NfaState(Nil, done = false)), 0L)
    def latched(sts: Seq[NfaState]): Boolean =
      sts.zip(specs).exists { case (s, spec) => s.done && !spec.every }
    def schedule(state: GroupState[MultiSeqState], sts: Seq[NfaState]): Unit = {
      val deadlines = sts.flatMap(_.partials.map(p => ceilMs(p.startUs + withinUs)))
      if (deadlines.nonEmpty) state.setTimeoutTimestamp(
        math.max(deadlines.max, state.getCurrentWatermarkMs() + 1))
    }
    withTime.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[MultiSeqState]) =>
        val st = state.getOption.getOrElse(emptySt)
        if (state.hasTimedOut) {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val sts = st.states.map(s =>
            s.copy(partials = s.partials.filter(p => p.startUs + withinUs >= wmUs)))
          if (sts.forall(_.partials.isEmpty) && !latched(sts) && st.shared == 0)
            state.remove()
          else { state.update(MultiSeqState(sts, st.shared)); schedule(state, sts) }
          Iterator.empty
        } else {
          val evs = it.toSeq.sortBy(e => (e.tsUs, e.eventId))
          val results = specs.zip(st.states).zipWithIndex.map { case ((spec, s0), vi) =>
            val (out, s1) = runNfa(evs, s0, spec)
            (out.map(m => (vi, m)), s1)
          }
          var shared = st.shared
          val numbered = results.flatMap(_._1)
            .sortBy { case (vi, m) => (m.endUs, m.startUs, vi) }
            .map { case (vi, m) =>
              shared += 1
              VariantMatch(vi, m.key, m.startUs, m.endUs, m.steps, shared)
            }
          val sts = results.map(_._2)
          if (sts.forall(_.partials.isEmpty) && !latched(sts) && shared == 0)
            state.remove()
          else { state.update(MultiSeqState(sts, shared)); schedule(state, sts) }
          numbered.iterator
        }
    }
  }

  /** Streaming detection with watermark-driven state hygiene: partials of
    * idle keys are dropped once the event-time watermark passes their
    * WITHIN deadline (GroupStateTimeout.EventTimeTimeout) — without this,
    * a key that stops sending events retains its partial matches forever
    * (the reference needs its TimerWheel for exactly this,
    * timers/timer_wheel.rs). Requires withinUs; watermarkDelay bounds
    * out-of-orderness.
    */
  /** `retainMatchSeq`: keep the per-key state shell after the partials
    * drain so [[NfaState.matchSeq]] never restarts — REQUIRED when the
    * query exposes mr_match_number (streaming EMIT ALL ROWS): a removed
    * entry restarts the counter and a later match of the same key would
    * re-issue an already-used number, conflating two matches' rows
    * downstream. Costs one O(1) shell per key that ever matched (the
    * done-latch class of retained state); queries that never read
    * matchSeq keep the default remove-on-drain.
    *
    * State bound, stated explicitly: with retainMatchSeq the retained
    * footprint is O(keys that ever matched) for the LIFE of the query —
    * a shell is a few dozen bytes (counter + empty partial vectors), but
    * it is never evicted, because ANY later event of that key must resume
    * the numbering, and no TTL can prove a key is finished on an unbounded
    * stream. At 100 TB this is the same bound as any per-key monotonic
    * counter (e.g. Spark's own streaming dedup state without a watermark
    * column): size it as keys × ~100 B. If a deployment can tolerate
    * match numbers restarting for keys idle far beyond WITHIN, run the
    * query without mr_match_number — the remove-on-drain default then
    * bounds state by ACTIVE keys only.
    */
  def detectStreamWithTimeout(ds: Dataset[CepEvent], spec: PatternSpec,
                              watermarkDelay: String,
                              retainMatchSeq: Boolean = false): Dataset[CepMatch] = {
    val withinUs = spec.withinUs.getOrElse(
      throw new IllegalArgumentException("detectStreamWithTimeout requires withinUs"))
    val withTime = ds.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CepEvent](evEnc)
    withTime.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[NfaState]) =>
        if (state.hasTimedOut) {
          // watermark passed the registered deadline: purge only partials
          // that can no longer complete. A partial completes via an event
          // at tsUs <= startUs + withinUs; events at-or-below the watermark
          // are dropped before the NFA, so >= (keep at equality) errs on
          // the side of keeping — the next timeout sweeps it at no cost,
          // while dropping early can lose a deadline-exact match.
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(NfaState(Nil, done = false))
          val live = st.partials.filter(p => p.startUs + withinUs >= wmUs)
          if (live.isEmpty && !(st.done && !spec.every) &&
              !(retainMatchSeq && st.matchSeq > 0)) state.remove()
          else {
            state.update(st.copy(partials = live))
            if (live.nonEmpty) state.setTimeoutTimestamp(math.max(
              ceilMs(live.map(p => p.startUs + withinUs).max),
              state.getCurrentWatermarkMs() + 1))
          }
          Iterator.empty
        } else {
          val events = it.toSeq.sortBy(e => (e.tsUs, e.eventId))
          val (out, next) = runNfa(events,
            state.getOption.getOrElse(NfaState(Nil, done = false)), spec)
          // drained keys drop their state entry entirely (a key whose
          // partials all resolved must not keep an empty shell in the
          // state store — at high key cardinality that is unbounded
          // growth); the done-latch of every=false is the one shell kept:
          // it enforces the once-per-key contract (a later event must NOT
          // re-match), so it cannot expire without changing semantics —
          // O(1) per matched key, documented in SCALE.md
          if (next.partials.isEmpty && !(next.done && !spec.every) &&
              !(retainMatchSeq && next.matchSeq > 0)) state.remove()
          else {
            state.update(next)
            // schedule cleanup at the latest live deadline (event-time ms,
            // rounded up; clamped above the watermark — registering
            // at-or-below it is rejected by the state store)
            val deadlines = next.partials.map(p => ceilMs(p.startUs + withinUs))
            if (deadlines.nonEmpty) state.setTimeoutTimestamp(
              math.max(deadlines.max, state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
        }
    }
  }

  /** Streaming `AFTER MATCH SKIP PAST LAST ROW` detection: the
    * [[runNfaSkipPast]] machine under event-time timeout. A candidate
    * match is held until every partial that could produce a leftmost-er
    * or greedier match dies — by a mismatching event (strict mode, same
    * micro-batch) or by WITHIN expiry (the timeout sweep, which also
    * FLUSHES newly-unblocked candidates — the reason this kernel
    * requires a time WITHIN: a key that stops receiving events must
    * still emit its held matches once the watermark passes the window).
    * Emission delay is therefore bounded by the WITHIN duration.
    */
  /** `resume` (SKIP TO FIRST|LAST): same candidate hold, but emission
    * resumes at the variable's row instead of past the span — a surviving
    * candidate's emission still kills every held overlapper whose start
    * precedes the resume row (the skipFlush pos advance), which is the
    * partial-overlap care SKIP TO needs.
    */
  def detectStreamSkipPast(ds: Dataset[CepEvent], spec: PatternSpec,
                           watermarkDelay: String,
                           retainMatchSeq: Boolean = false,
                           resume: Option[(Int, Boolean)] = None): Dataset[CepMatch] = {
    val withinUs = spec.withinUs.getOrElse(
      throw new IllegalArgumentException("detectStreamSkipPast requires withinUs"))
    implicit val skipEnc: Encoder[SkipNfaState] = Encoders.product[SkipNfaState]
    val withTime = ds.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CepEvent](evEnc)
    def schedule(state: GroupState[SkipNfaState], st: SkipNfaState): Unit = {
      // wake at the latest live-partial deadline; held candidates with no
      // live partials flush immediately (skipFlush), so partials are the
      // only thing worth waiting for
      val deadlines = st.nfa.partials.map(p => ceilMs(p.startUs + withinUs))
      if (deadlines.nonEmpty) state.setTimeoutTimestamp(
        math.max(deadlines.max, state.getCurrentWatermarkMs() + 1))
    }
    def emptySt = SkipNfaState(NfaState(Nil, done = false), 0L, Nil)
    withTime.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[SkipNfaState]) =>
        if (state.hasTimedOut) {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(emptySt)
          val (out, next) = skipPastTimeoutFlush(st, wmUs, withinUs, resume,
            spec.steps.map(_.reluctant), relVarGroupStart(spec),
            innerRelCfg(spec))
          if (next.nfa.partials.isEmpty && next.cands.isEmpty &&
              !(retainMatchSeq && next.nfa.matchSeq > 0)) {
            // seq/pos continuity is not needed once nothing is held: a
            // fresh entry restarts at 0 with an empty frontier, and the
            // selection only ever compares ordinals WITHIN a lifetime
            // (matchSeq is the exception — the retain flag keeps it)
            state.remove()
          } else {
            state.update(next)
            schedule(state, next)
          }
          out.iterator
        } else {
          val events = it.toSeq.sortBy(e => (e.tsUs, e.eventId))
          val (out, next) = runNfaSkipPast(events,
            state.getOption.getOrElse(emptySt), spec, resume)
          if (next.nfa.partials.isEmpty && next.cands.isEmpty &&
              !(retainMatchSeq && next.nfa.matchSeq > 0)) state.remove()
          else {
            state.update(next)
            schedule(state, next)
          }
          out.iterator
        }
    }
  }

  /** One input row awaiting its unmatched-eligibility proof, and the
    * reference that marks it claimed: (tsUs, eventId) — eventId is the
    * streaming tie-break hash, so bit-identical duplicate rows share a
    * ref (they are already conflated everywhere the stream lacks a
    * physical row id; batch WITH UNMATCHED distinguishes them via its
    * row_number ids).
    */
  final case class RowRef(tsUs: Long, eventId: Long)
  /** State of [[detectStreamWithUnmatched]]: the inner match machine
    * (SkipNfaState — for the plain EVERY mode only its `nfa` field is
    * used), the rows not yet provably unmatched, and the claimed refs of
    * matches already emitted (kept until the rows they cover expire).
    */
  final case class UnmatchedNfaState(skip: SkipNfaState, pending: Seq[CepEvent],
                                     claimed: Seq[RowRef])

  /** Streaming `ALL ROWS PER MATCH WITH UNMATCHED ROWS` detection: matched
    * rows emit through the inner machine exactly as without the clause;
    * an UNMATCHED row is emitted as a pseudo-match (matchSeq = -1, the row
    * alone in a "__unmatched" step) once it is PROVABLE no match will ever
    * claim it. The proof is the WITHIN bound + the watermark: any match
    * containing row r spans at most `within`, so it completes by an event
    * at tsUs <= r.tsUs + within — once the watermark passes that, r's
    * eligibility is decided (the round-12 rejection reasoned "cannot prove
    * a row will never be claimed"; under a WITHIN it can be, which is why
    * this kernel REQUIRES one). Emission delay for unmatched rows is
    * therefore exactly the WITHIN duration, the same bound the held-
    * candidate skip machine already pays.
    *
    * Order of operations per sweep matters: the inner machine flushes
    * FIRST (its claims mark rows), THEN pending rows past their deadline
    * flush as unmatched. A row inside a HELD skip candidate can never
    * expire before its candidate resolves: every partial blocking the
    * candidate starts at-or-before it, so the partials' deadlines pass
    * first and the same timeout sweep resolves the candidate before the
    * row's own deadline check runs.
    *
    * State is pending-rows + claimed-refs per key, both bounded by the
    * WITHIN window — the same O(window) bound the NFA partials already
    * hold; drained keys drop their entry.
    */
  def detectStreamWithUnmatched(ds: Dataset[CepEvent], spec: PatternSpec,
                                watermarkDelay: String, useSkip: Boolean,
                                resume: Option[(Int, Boolean)] = None,
                                retainMatchSeq: Boolean = false): Dataset[CepMatch] = {
    val withinUs = spec.withinUs.getOrElse(
      throw new IllegalArgumentException("detectStreamWithUnmatched requires withinUs"))
    implicit val stEnc: Encoder[UnmatchedNfaState] = Encoders.product[UnmatchedNfaState]
    val rel = spec.steps.map(_.reluctant)
    val withTime = ds.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CepEvent](evEnc)
    def emptySt = UnmatchedNfaState(
      SkipNfaState(NfaState(Nil, done = false), 0L, Nil), Nil, Nil)
    def claimRefs(ms: Seq[CepMatch]): Seq[RowRef] =
      ms.flatMap(_.steps.flatMap(_.events)).map(e => RowRef(e.tsUs, e.eventId))
    def pseudo(e: CepEvent): CepMatch =
      CepMatch(e.key, e.tsUs, e.tsUs, Seq(Collected("__unmatched", Seq(e))),
        matchSeq = -1L)
    withTime.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[UnmatchedNfaState]) =>
        val st = state.getOption.getOrElse(emptySt)
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val events =
          if (state.hasTimedOut) Nil
          else it.toSeq.sortBy(e => (e.tsUs, e.eventId))
        // 1. inner machine first (its claims mark rows before the
        //    unmatched flush below decides anything)
        val (matched: Seq[CepMatch], skip2: SkipNfaState) =
          if (state.hasTimedOut) {
            if (useSkip) skipPastTimeoutFlush(st.skip, wmUs, withinUs, resume, rel,
              relVarGroupStart(spec), innerRelCfg(spec))
            else (Seq.empty[CepMatch], st.skip.copy(nfa = st.skip.nfa.copy(
              partials = st.skip.nfa.partials.filter(p => p.startUs + withinUs >= wmUs))))
          } else if (useSkip) runNfaSkipPast(events, st.skip, spec, resume)
          else {
            val (o, n2) = runNfa(events, st.skip.nfa, spec)
            (o, st.skip.copy(nfa = n2))
          }
        // 2. bookkeeping: new rows join pending; emitted matches claim
        val claimed = st.claimed ++ claimRefs(matched)
        val claimedSet = claimed.map(r => (r.tsUs, r.eventId)).toSet
        // 3. provably-unmatched flush: rows whose deadline the watermark
        //    passed emit (unclaimed) or drop (claimed); claimed refs past
        //    the same deadline have no row left to mark — prune
        val (due, live) = (st.pending ++ events)
          .partition(e => e.tsUs + withinUs < wmUs)
        val unmatchedOut = due.filterNot(e => claimedSet((e.tsUs, e.eventId)))
          .sortBy(e => (e.tsUs, e.eventId)).map(pseudo)
        val claimedLive = claimed.filter(r => r.tsUs + withinUs >= wmUs)
        val next = UnmatchedNfaState(skip2, live, claimedLive)
        val drained = next.pending.isEmpty && next.skip.nfa.partials.isEmpty &&
          next.skip.cands.isEmpty
        if (drained && !(retainMatchSeq && next.skip.nfa.matchSeq > 0)) state.remove()
        else {
          state.update(next)
          // wake at the earliest decision point: a pending row's
          // unmatched deadline or a partial's WITHIN expiry (held skip
          // candidates resolve at partial expiry, which the same sweep runs)
          val deadlines = next.pending.map(e => ceilMs(e.tsUs + withinUs)) ++
            next.skip.nfa.partials.map(p => ceilMs(p.startUs + withinUs))
          if (deadlines.nonEmpty) state.setTimeoutTimestamp(
            math.max(deadlines.min, state.getCurrentWatermarkMs() + 1))
        }
        (matched ++ unmatchedOut).iterator
    }
  }

  /** Streaming absent pattern — `e1=A NOT FOLLOWED BY B WITHIN d` (the
    * reference's `NOT … FOR d` roadmap design, MILESTONES.md:126-133; batch
    * result-level form = q_cep_absent's anti-join). A matched first event
    * waits out its deadline in per-key state:
    *  - an absent-matching event before the deadline kills the partial;
    *  - deadline passing (older in-batch event time, or the event-time
    *    watermark firing EventTimeTimeout) flushes the partial as a match.
    * Emission is therefore delayed by exactly the WITHIN duration — absence
    * is only knowable after the deadline (same reason the reference routes
    * this through its TimerWheel).
    */
  final case class AbsentSpec(
      first: CepEvent => Boolean,
      absent: CepEvent => Boolean,
      withinUs: Long) extends Serializable

  def detectAbsentStream(ds: Dataset[CepEvent], spec: AbsentSpec,
                         watermarkDelay: String): Dataset[CepMatch] = {
    val withTime = ds.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CepEvent](evEnc)
    withTime.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[NfaState]) =>
        def emit(p: Partial): CepMatch = {
          val a = p.collected.head.head
          CepMatch(a.key, a.tsUs, p.startUs + spec.withinUs, Seq(Collected("e1", Seq(a))))
        }
        var pending = state.getOption.map(_.partials.toVector).getOrElse(Vector.empty)
        val out = Seq.newBuilder[CepMatch]
        if (state.hasTimedOut) {
          // watermark passed some deadlines: flush those, keep the rest
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (due, live) = pending.partition(p => p.startUs + spec.withinUs <= wmUs)
          due.foreach(p => out += emit(p))
          pending = live
        } else {
          it.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
            // deadlines strictly before this event's time are conclusive
            val (due, live) = pending.partition(p => p.startUs + spec.withinUs < e.tsUs)
            due.foreach(p => out += emit(p))
            pending = live
            if (spec.absent(e))
              // <= : an absent event at the SAME event time arrives after
              // the pending first event in arrival order (matches the batch
              // NOT-guard's __id ordering)
              pending = pending.filterNot(p => p.startUs <= e.tsUs) // followed → killed
            if (spec.first(e))
              pending :+= Partial(0, e.tsUs, 0L, Vector(Vector(e)))
          }
        }
        if (pending.isEmpty) state.remove()
        else {
          state.update(NfaState(pending, done = false))
          val nextDeadlineMs = pending.map(p => ceilMs(p.startUs + spec.withinUs)).min
          state.setTimeoutTimestamp(math.max(nextDeadlineMs,
            state.getCurrentWatermarkMs() + 1))
        }
        out.result().iterator
    }
  }

  /** Trailing absent guard over a full pattern chain, streaming — the
    * generalization of [[detectAbsentStream]] to arbitrary base chains
    * (`… -> NOT B FOR d`, the streaming SQL surface's trailing NOT): the
    * NFA completes a base match, which then waits out every guard's FOR
    * deadline in per-key state; a guard-matching later event (arrival order
    * within the guard's window) kills it; the deadline passing (an older
    * in-batch event time, or the event-time watermark firing
    * EventTimeTimeout) flushes it as a match. Emission is delayed by up to
    * the longest FOR duration — absence is only knowable after the deadline.
    */
  final case class TrailingAbsent(pred: CepEvent => Boolean, forUs: Long)
    extends Serializable

  /** NFA state + completed base matches awaiting their absence deadlines.
    * `seq` (round 13): per-key CONCLUSIVE-emission ordinal — matchSeq is
    * assigned when a pending match survives its deadlines, not when the
    * NFA completes it, so guard-KILLED matches leave no gap in
    * mr_match_number (the reason streaming ALL ROWS + trailing NOT was
    * batch-only before). State schema v12.
    */
  final case class AbsentChainState(nfa: NfaState, pending: Seq[CepMatch],
                                    seq: Long)

  /** `retainMatchSeq`: keep the per-key shell once any match emitted so
    * the conclusive ordinal never restarts (streaming EMIT ALL ROWS'
    * mr_match_number contract — same flag as the other kernels). */
  def detectStreamWithTrailingAbsents(ds: Dataset[CepEvent], spec: PatternSpec,
      guards: Seq[TrailingAbsent], watermarkDelay: String,
      retainMatchSeq: Boolean = false): Dataset[CepMatch] = {
    require(guards.nonEmpty, "detectStreamWithTrailingAbsents needs >= 1 guard")
    implicit val stEnc: Encoder[AbsentChainState] = Encoders.product[AbsentChainState]
    // a match is conclusive only once EVERY guard's window has passed
    val maxForUs = guards.map(_.forUs).max
    val withTime = ds.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[CepEvent](evEnc)
    withTime.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, it: Iterator[CepEvent], state: GroupState[AbsentChainState]) =>
        val st = state.getOption.getOrElse(
          AbsentChainState(NfaState(Nil, done = false), Nil, 0L))
        var nfa = st.nfa
        var pending = st.pending.toVector
        var seq = st.seq
        val out = Seq.newBuilder[CepMatch]
        // conclusive emission: matchSeq assigned in flush order (endUs then
        // startUs — deterministic), so guard-killed matches leave no gap
        def flushDue(due: Seq[CepMatch]): Unit =
          due.sortBy(m => (m.endUs, m.startUs)).foreach { m =>
            seq += 1; out += m.copy(matchSeq = seq)
          }
        if (state.hasTimedOut) {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (due, live) = pending.partition(m => m.endUs + maxForUs <= wmUs)
          flushDue(due)
          pending = live
          // purge NFA partials whose WITHIN deadline the watermark passed —
          // idle keys would otherwise retain partial matches forever (the
          // TimerWheel role detectStreamWithTimeout plays for plain chains);
          // >= keeps a deadline-exact partial (see the purge note in
          // detectStreamWithTimeout)
          spec.withinUs.foreach { w =>
            nfa = nfa.copy(partials = nfa.partials.filter(p => p.startUs + w >= wmUs))
          }
        } else {
          it.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
            // deadlines strictly before this event's time are conclusive
            val (due, live) = pending.partition(m => m.endUs + maxForUs < e.tsUs)
            flushDue(due)
            pending = live
            guards.foreach { g =>
              if (g.pred(e))
                // <= : a guard event at the SAME event time arrives after
                // the base match in arrival order (matches the batch
                // NOT-guard anti-join's __id ordering)
                pending = pending.filterNot(m =>
                  m.endUs <= e.tsUs && e.tsUs <= m.endUs + g.forUs)
            }
            // the guard check runs before the NFA consumes the event, so a
            // completing event can never kill its own match
            val (ms, n2) = runNfa(Seq(e), nfa, spec)
            nfa = n2
            ms.foreach(pending :+= _)
          }
        }
        // drained keys (no pending matches awaiting deadlines, no in-flight
        // partials) drop their state entry — mirrors detectAbsentStream's
        // remove-on-drain; the done-latch of every=false is the one shell
        // kept (it must keep suppressing re-matches)
        if (pending.isEmpty && nfa.partials.isEmpty && !(nfa.done && !spec.every) &&
            !(retainMatchSeq && seq > 0))
          state.remove()
        else {
          state.update(AbsentChainState(nfa, pending, seq))
          // wake at the earliest conclusive deadline: a pending match's FOR
          // window or (when WITHIN bounds the chain) a partial's expiry
          val deadlines = pending.map(m => ceilMs(m.endUs + maxForUs)) ++
            spec.withinUs.toSeq.flatMap(w => nfa.partials.map(p => ceilMs(p.startUs + w)))
          if (deadlines.nonEmpty)
            state.setTimeoutTimestamp(math.max(deadlines.min,
              state.getCurrentWatermarkMs() + 1))
        }
        out.result().iterator
    }
  }

  /** Adapt the `events` table (or an equivalently-shaped stream) to
    * [[CepEvent]]: key = user_id, event time in micros.
    */
  def fromEvents(df: DataFrame): Dataset[CepEvent] =
    df.select(
        col("user_id").cast("string").as("key"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").cast("long").as("eventId"),
        col("event_type").as("etype"),
        col("value").cast("double").as("value"),
        typedlit(Seq.empty[Double]).as("vals"),
        typedlit(Seq.empty[String]).as("svals"))
      .as[CepEvent]
}
