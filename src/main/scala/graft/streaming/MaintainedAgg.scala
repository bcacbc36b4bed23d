package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.IncrementalAgg

/** Streaming materialized-view maintenance: [[IncrementalAgg]] state
  * advanced by a CDC feed consumed through `foreachBatch` — the
  * composition every warehouse ships as "continuous aggregate". The
  * batch operator already guarantees state + delta ≡ full recompute
  * with EXACT decimal arithmetic, and decimal addition commutes, so the
  * final state is independent of HOW the stream was cut into
  * micro-batches — the property the spec pins by re-splitting one feed
  * three ways. (Contrast the built-in streaming aggregation: update-
  * mode outputs depend on batch boundaries; the maintained STATE here
  * does not.)
  *
  * A group whose count reaches zero mid-stream drops losslessly: a
  * consistent feed (deletes name previously-inserted rows) forces its
  * decimal sums to exactly zero at that moment, so nothing is lost if
  * it reappears later — exactness is what makes the drop safe, a
  * float-summed state could not do this.
  *
  * Scale shape: per micro-batch, the work is the batch-sized signed
  * aggregation plus a group-cardinality-sized join; the state frame is
  * re-materialized (`localCheckpoint`) each batch so lineage stays ONE
  * plan deep instead of growing with batch count — the superseded
  * checkpoint RDD is released to the context cleaner.
  */
object MaintainedAgg {

  /** Mutable holder wired into `foreachBatch(m.processBatch _)`. The
    * feed carries `opCol` ∈ {"I", "D"}; unknown ops fail fast (a CDC
    * feed with "U" rows must be exploded to delete+insert upstream —
    * silently ignoring them would corrupt the state).
    *
    * @param validate guard each batch against unknown ops BEFORE
    *   applying it — one extra (short-circuiting) pass over the batch.
    *   Default on: a corrupted state is unrecoverable without a
    *   bootstrap rescan, so the pass is cheap insurance. A feed whose
    *   producer already enforces the I/D contract can turn it off.
    */
  final class Maintainer(state0: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String], opCol: String = "op",
      validate: Boolean = true) {
    @volatile private var current: DataFrame = state0
    @volatile private var lastApplied: Long = Long.MinValue

    /** The maintained state as of the last completed batch. */
    def state: DataFrame = current

    /** The user-facing report of the current state. */
    def report: DataFrame =
      IncrementalAgg.report(current, groupCols, valueCols)

    def processBatch(batch: DataFrame, batchId: Long): Unit = {
      // foreachBatch is AT-LEAST-once: a failure between this method
      // completing and the streaming commit re-delivers the same
      // batchId — applying it twice would double the delta. Batch ids
      // are monotone within a checkpointed query, so the standard
      // skip-if-seen guard makes the apply effectively-once. (A
      // RESTARTED query resuming an old checkpoint against a fresh
      // in-memory Maintainer is the caller's contract: bootstrap
      // state0 from the durably-stored state that matches the
      // checkpoint, exactly as any foreachBatch sink pairs its
      // storage with the checkpoint location.)
      if (batchId <= lastApplied) return
      if (validate) {
        val bad = batch.filter(!col(opCol).isin("I", "D")).limit(1).count()
        require(bad == 0,
          s"CDC feed contains ops other than I/D (batch $batchId)")
      }
      val next = IncrementalAgg.applyDelta(current,
        batch.filter(col(opCol) === "I").drop(opCol),
        batch.filter(col(opCol) === "D").drop(opCol),
        groupCols, valueCols).localCheckpoint(true)
      current = next
      lastApplied = batchId
    }
  }
}
