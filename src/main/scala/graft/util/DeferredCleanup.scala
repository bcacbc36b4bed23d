package graft.util

/** Post-measurement cleanup queue.
  *
  * Some teardown work protects the NEXT query, not the one that ran —
  * the canonical case is unloading finished streaming queries' state
  * stores ([[org.apache.spark.sql.graft.StateStoreShim]]): the retained
  * provider maps tax LATER batch queries' GC, but `StateStore.stop()`
  * itself costs a few hundred ms of thread-pool shutdown. Running it
  * inside a timed gate query charges that cost to the wrong query
  * (measured +0.4-0.5s on every composed streaming gate in r6).
  *
  * So producers `enqueue` the teardown and the measurement harnesses
  * ([[graft.Bench]], [[graft.Verify]], the spec base) `drain` it AFTER
  * their timing/compare boundary. Draining is idempotent and re-entrant
  * (concurrent drains each pop distinct thunks); a thunk that throws is
  * dropped, not retried — cleanup is best-effort by definition.
  *
  * A caller that never drains just keeps the pre-r7 behavior (teardown
  * deferred until the next streaming query's own entry drain), so the
  * queue can never grow past the number of streams started since the
  * last drain.
  */
object DeferredCleanup {
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  def enqueue(f: () => Unit): Unit = { pending.add(f); () }

  /** Run and clear every pending thunk. */
  def drain(): Unit = {
    var t = pending.poll()
    while (t != null) {
      try t() catch { case _: Exception => () }
      t = pending.poll()
    }
  }
}
