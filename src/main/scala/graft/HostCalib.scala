package graft

/** Fixed-work CPU calibration for host-normalized kernel floors.
  *
  * Problem (SCALE.md, round 10): the same build read 233k-508k window
  * events/s across one day's host states — a raw regression floor can
  * false-fail a healthy build on a noisy-neighbor host. The fix is to
  * measure the HOST alongside the kernels: a pinned, deterministic
  * checksum fold over a constant array whose ops/s moves with exactly the
  * resource the kernels contend on (CPU cycles across all cores), and to
  * judge the kernels per calibration op instead of in absolute events/s.
  *
  * The work unit is a 64-bit mix-fold over a 64K-element long array
  * (512 KiB — L2-resident, so the number tracks CPU contention rather than
  * memory bandwidth). It is measured two ways:
  *  - single-threaded (`calib1`): raw cycle speed of one core;
  *  - N-way (`calibN`, one thread per advertised executor thread):
  *    aggregate throughput under whatever sharing the host imposes —
  *    this is the denominator the 32-way Spark kernels actually see.
  *
  * Determinism: the array content and fold are fixed; JIT warm-up runs
  * before timing; the timed section is ~0.4 s per mode so a Bench run
  * pays <1 s total.
  */
object HostCalib {

  private val N = 65536
  private val arr: Array[Long] = {
    val a = new Array[Long](N)
    var i = 0
    var x = 0x243F6A8885A308D3L // pi digits — pinned seed
    while (i < N) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      a(i) = x; i += 1
    }
    a
  }

  /** One work unit: splitmix-style fold over the pinned array. Returns the
    * checksum so the JIT cannot dead-code the loop. */
  private def unit(seed: Long): Long = {
    var acc = seed ^ 0x9E3779B97F4A7C15L
    var i = 0
    while (i < N) {
      var x = arr(i) + acc
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      acc = x ^ (x >>> 31)
      i += 1
    }
    acc
  }

  @volatile private var sink: Long = 0L

  private def runUnits(units: Int, seed: Long): Unit = {
    var u = 0
    var s = seed
    while (u < units) { s = unit(s); u += 1 }
    sink ^= s
  }

  /** Mega-ops/s (array elements folded per microsecond) for `threads`
    * concurrent workers. `threads = 1` is the single-core number.
    *
    * Best of `trials` short timed sections: a single section is exposed to
    * transient dips (GC of the surrounding JVM, scheduler bursts) that the
    * minutes-long kernels average away — the max of three 0.3 s sections
    * tracks the capacity actually available over the bench window, and
    * measured far steadier than one 0.4 s section (±3 % vs ±30 % on the
    * dev host at 32 threads).
    */
  def mops(threads: Int, targetSec: Double = 0.5, trials: Int = 4): Double = {
    require(threads >= 1)
    // warm: JIT the fold, then pick a unit count hitting ~targetSec/thread
    runUnits(64, 1L)
    val t0 = System.nanoTime()
    runUnits(256, 2L)
    val perUnitSec = (System.nanoTime() - t0) / 1e9 / 256
    val units = math.max(64, (targetSec / perUnitSec).toInt)
    (1 to trials).map { trial =>
      val ts = (0 until threads).map { tid =>
        new Thread(() => runUnits(units, trial * 131L + tid + 3L))
      }
      val w0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      val wall = (System.nanoTime() - w0) / 1e9
      threads.toLong * units * N / wall / 1e6
    }.max
  }

  /** (single-threaded Mops, nThreads-way aggregate Mops). The first
    * threaded pass is discarded as warm-up — thread-path JIT costs the
    * first section ~10-20 % and would bias the reference downward. */
  def calibrate(nThreads: Int): (Double, Double) = {
    if (nThreads > 1) mops(nThreads, targetSec = 0.3, trials = 2) // warm, discarded
    val c1 = mops(1)
    val cN = if (nThreads <= 1) c1 else mops(nThreads)
    (c1, cN)
  }

  /** Reference 32-way calibration, measured on the quiet round-11 dev host
    * (local[32], 128 GiB) — the host state under which the raw floors
    * (window 325k / CEP 250k events/s at sf0.1) were set. The floor gate
    * scales by `calibNow / CALIB_REF_32T_MOPS`, clamped to [0.25, 1.25]:
    * a contended host lowers the bar proportionally (no false fail), a
    * moderately faster host raises it (no free pass), and the clamp stops
    * a pathological calibration from disabling the gate entirely.
    */
  val CALIB_REF_32T_MOPS: Double = 7100.0

  def floorAdjust(calibNowMops: Double): Double =
    math.min(1.25, math.max(0.25, calibNowMops / CALIB_REF_32T_MOPS))

  /** Ad-hoc host probe: `runMain graft.HostCalib [threads]` prints the two
    * calibration numbers — used to set/audit CALIB_REF_32T_MOPS. */
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 32
    for (r <- 1 to 3) {
      val (c1, cN) = calibrate(n)
      println(f"CALIB rep=$r single=$c1%.0f Mops ${n}t=$cN%.0f Mops adjust=${floorAdjust(cN)}%.3f")
    }
  }
}
