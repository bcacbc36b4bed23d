package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity sequence features — the feature-engineering sweep a
  * training pipeline runs over an event log before model input: previous-
  * event gap, bounded rolling aggregates, and sequence position, all from
  * ONE keyed window.
  *
  * Scale shape: a single hash exchange on the entity key, then one local
  * sort per partition serves every feature (lag, rolling frame, rank
  * share the window spec, so Catalyst plans ONE Window operator). Rolling
  * frames are ROWS-bounded (k events), so state per row is O(k) no
  * matter how long a user's history grows; money-typed sums go through
  * DECIMAL so the sliding-frame arithmetic is exact and engine-portable
  * (IEEE sliding sums differ between Spark's buffer replay and an
  * engine's segment-tree subtraction).
  */
object Features {

  val DefaultWindow = 5

  /** `(idCol, userCol, ts_us, prev_gap_us, roll_sum_k, roll_cnt_k,
    * seq_no)` per event: gap to the user's previous event (null on the
    * first), sum/count of `valCol` over the last `k` events inclusive,
    * and the 1-based position in the user's timeline. Ordering ties
    * break on `idCol`, so results are engine-deterministic.
    */
  def rollingEventFeatures(events: DataFrame, userCol: String,
      tsCol: String, valCol: String, idCol: String,
      k: Int = DefaultWindow): DataFrame = {
    val tsUs = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(userCol)).orderBy(tsUs, col(idCol))
    val rolling = w.rowsBetween(-(k - 1), Window.currentRow)
    events.select(
      col(idCol), col(userCol), tsUs.as("ts_us"),
      (tsUs - lag(tsUs, 1).over(w)).as("prev_gap_us"),
      sum(col(valCol).cast("decimal(18,6)")).over(rolling)
        .cast("double").as(s"roll_sum_$k"),
      count(lit(1)).over(rolling).as(s"roll_cnt_$k"),
      row_number().over(w).cast("long").as("seq_no"))
  }
}
