package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key change-point (level-shift) detection over a fixed-interval
  * series — the complement to [[Timeseries.robustAnomalies]] (single
  * outlying slots) and [[graft.dq.Drift]] (whole-population shape):
  * here the question is WHEN a key's level moved and stayed moved (a
  * price change, a deploy that shifted a metric, a feed that re-scaled
  * a unit). The statistic is the two-window mean contrast — mean of the
  * `w` slots starting at a boundary minus mean of the `w` slots before
  * it — which is the classic step-filter form of CUSUM-style detection
  * expressible as plain sliding windows (CUSUM proper is a recursive
  * max and needs per-key sequential state; the two-window contrast is
  * the same alarm as two bounded window frames).
  *
  * Determinism: slot values round to 4dp and sum as DECIMAL inside the
  * window frames — decimal addition is exact and order-independent, so
  * a sliding-frame recompute (Spark) and a segment-tree sum (DuckDB)
  * produce the same total bit-for-bit (the [[graft.dq.Drift]]
  * integer-sum ruling). Each mean is then ONE decimal→double cast and
  * ONE division by the constant `w`, mirrored verbatim in the oracle,
  * so shifts and the suppression maxima are IEEE-identical.
  *
  * Scale shape: one window pass per key over the (dense, resampled)
  * series — per-key state is the 2w-slot frame, keys partition the
  * exchange, nothing global. The non-maximum suppression runs only
  * over the CANDIDATE frame (slots whose |shift| already cleared the
  * threshold — report-sized, not series-sized).
  */
object Changepoint {

  /** Detected level shifts: `(keyCol, slot, mean_before, mean_after,
    * shift)` for slots where |mean_after − mean_before| > `threshold`,
    * both windows are full (`w` slots each — boundary slots with a
    * truncated window never alarm), and the slot is a per-key local
    * maximum of |shift| within ±(w−1) slots (non-maximum suppression —
    * a real step trips the raw contrast at up to 2w−1 consecutive
    * boundaries; only the strongest survives). Exact |shift| ties
    * within a suppression range all survive (deterministic either way;
    * with 4dp-rounded inputs ties are measure-zero noise, not policy).
    */
  def meanShifts(series: DataFrame, keyCol: String, slotCol: String,
      valueCol: String, w: Int, threshold: Double): DataFrame = {
    require(w > 0, "window width must be positive")
    val base = series.select(col(keyCol),
      col(slotCol).cast("long").as("slot"),
      round(col(valueCol).cast("double"), 4).cast("decimal(20,4)")
        .as("__v"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
    val before = byKey.rowsBetween(-w, -1)
    val after = byKey.rowsBetween(0, w - 1)
    val contrasts = base.select(col(keyCol), col("slot"),
        sum(col("__v")).over(before).as("__sb"),
        count(col("__v")).over(before).as("__cb"),
        sum(col("__v")).over(after).as("__sa"),
        count(col("__v")).over(after).as("__ca"))
      .filter(col("__cb") === w && col("__ca") === w)
      .select(col(keyCol), col("slot"),
        (col("__sb").cast("double") / w).as("mean_before"),
        (col("__sa").cast("double") / w).as("mean_after"),
        ((col("__sa").cast("double") / w) -
          (col("__sb").cast("double") / w)).as("shift"))
      .filter(abs(col("shift")) > threshold)
    // non-maximum suppression over the candidate frame only: RANGE on
    // the slot value (candidates are sparse — ROWS would compare
    // unrelated distant slots)
    val nms = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rangeBetween(-(w - 1).toLong, (w - 1).toLong)
    contrasts
      .withColumn("__peak", max(abs(col("shift"))).over(nms))
      .filter(abs(col("shift")) === col("__peak"))
      .drop("__peak")
  }
}
