package graft.sql

/** Loud-warning channel for plans that silently degenerate at scale — an
  * unpartitioned SQL pattern or per-event frame compiles to ONE global
  * ordering = one task, no matter the cluster size (the same inherent
  * serialization as the reference's single-threaded junction). The warning
  * names the consequence and the fix (PARTITION BY / PARTITION WITH); the
  * last few messages stay inspectable for tests.
  */
private[graft] object ScaleWarnings {
  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)
  private val recent =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)

  def warn(msg: String): Unit = {
    recent.updateAndGet(s => (s :+ msg).takeRight(16))
    log.warn(msg)
  }

  private[graft] def recentWarnings: Seq[String] = recent.get()
  private[graft] def reset(): Unit = recent.set(Nil)
}
