package graft.operators

/** Overlap INDEPENDENT write jobs from driver threads (optimization
  * guide §2.6): a store lifecycle op (build / append / forget / delete)
  * lands several relations whose writes have no data dependency on each
  * other — only the commit marker must land LAST. Run sequentially, each
  * small write pays full scheduling + planning + commit latency while 31
  * of 32 cores idle; submitted together, the scheduler back-fills the
  * tail of one job with the next one's tasks. FIFO scheduling keeps the
  * earlier job's resource priority (exactly the back-fill behavior the
  * guide describes).
  *
  * Contracts the callers uphold:
  *  - the actions are independent (no action reads a path another one
  *    writes) and the COMMIT MARKER is written by the caller AFTER this
  *    returns — crash-invisibility is untouched: a crash mid-parallel
  *    leaves an unmarked (invisible) epoch exactly as a crash
  *    mid-sequential did;
  *  - shared inputs are persisted frames ([[graft.CacheRegistry]]) —
  *    concurrent first materialization of one cached frame is safe
  *    (Spark's cache manager serializes per-partition computation);
  *  - any failure fails the whole op BEFORE the marker: the first
  *    exception is rethrown after every in-flight job settles, so no
  *    half-written epoch ever becomes visible.
  */
private[graft] object ParWrites {

  /** Degree of driver-side write overlap. 2-3 in-flight jobs fill the
    * scheduling gaps; more only adds driver contention (guide §2.6's
    * "2-3 jobs in flight is plenty"). Bounded, fixed, scale-independent:
    * this overlaps per-job LATENCY, which does not shrink on a cluster.
    */
  private val Parallelism = 4

  def run(actions: Seq[() => Unit]): Unit = {
    val live = actions.filter(_ != null)
    if (live.isEmpty) return
    if (live.size == 1) { live.head.apply(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(Parallelism, live.size))
    try {
      val futures = live.map(a =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = a()
        }))
      var failure: Throwable = null
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (failure == null) failure = e.getCause
          case e: Throwable => if (failure == null) failure = e
        }
      }
      if (failure != null) throw failure
    } finally pool.shutdown()
  }

  def run(first: () => Unit, rest: (() => Unit)*): Unit =
    run(first +: rest)
}
