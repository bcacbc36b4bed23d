package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Visibility bridge to the executor-side state-store registry.
  *
  * A finished StreamingQuery leaves its [[StateStore]] providers LOADED
  * in the JVM-wide registry — live references to every state map the
  * query built, plus a background maintenance thread — until another
  * query happens to evict them. In a long-lived session that interleaves
  * streaming and batch (this engine's registered suite, or any notebook
  * deployment), that retained heap taxes every subsequent batch query's
  * GC. Each registered streaming query uses a throwaway checkpoint, so
  * its state is unreachable by design the moment the query stops —
  * unloading eagerly is pure win. Same package-scope pattern as
  * [[ColumnShim]]: no logic, just visibility.
  */
object StateStoreShim {
  /** Unload every state-store provider and stop the maintenance task.
    * Safe between queries: providers lazily reload on next use.
    */
  def unloadAll(): Unit = StateStore.stop()
}
