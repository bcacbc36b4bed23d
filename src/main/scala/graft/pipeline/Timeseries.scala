package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with forward fill — the gap-filling step
  * between an irregular event log and the fixed-interval grid every
  * rolling-feature / training-window pipeline downstream expects
  * ([[Features]] assumes dense sequences; real logs are sparse). Per
  * key: bucket observations into fixed µs slots, keep the LAST
  * observation per slot, materialize the key's full slot grid from its
  * first to its last observation, and carry the last known value
  * forward across empty slots.
  *
  * Determinism: slots are integer µs division (positive epochs — the
  * [[Retention]] rule); last-per-slot is a (ts desc, tiebreak desc)
  * row_number window (the SCD1 idiom, replayed as QUALIFY); the fill
  * is `last(value) IGNORE NULLS` over the slot order, which both
  * engines define identically once last-per-slot is unique. Values are
  * carried, never computed — the hash pins placement, not arithmetic.
  *
  * Scale shape: per-slot dedup and bounds are one window + one
  * map-side-combinable aggregate over the corpus; the grid explodes
  * key-bounds rows into key×slots rows MAP-SIDE (sequence + explode —
  * no shuffle makes the grid); the fill is one window over a key
  * exchange of the slot-grain frame. Nothing is ever ordered globally,
  * and no corpus-sized join occurs — the grid join is slot-grain ⋈
  * slot-grain on (key, slot). Slot width is the density dial: size it
  * so key×slots stays O(corpus), exactly like a real downsampling job.
  */
object Timeseries {

  /** `(keyCol, slot, slot_ts_us, value, observed)` — one row per key
    * per slot from the key's first to last observation; `value` is the
    * slot's last observation forward-filled across gaps; `observed`
    * marks slots that had their own observation.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepUs: Long,
      tieBreaker: String): DataFrame = {
    // materialized once: the deduped observation frame feeds TWO
    // consumers (the bounds aggregate and the join side) — without the
    // checkpoint the events scan + dedup window run twice (the
    // multi-pass persist lesson from the quantiles lane)
    val obs = lastPerSlot(df, keyCol, tsCol, valueCol, stepUs, tieBreaker)
      .withColumnRenamed("value", "__v")
      .localCheckpoint(true)
    // per-key slot grid, exploded map-side from the bounds row (bounds
    // of the deduped frame ≡ bounds of the raw observations — dedup
    // keeps every distinct (key, slot))
    val grid = obs.groupBy(col(keyCol))
      .agg(min(col("slot")).as("__lo"), max(col("slot")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("slot"))
    val wFill = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the obs side is CORPUS-SIZED (one row per observed key-slot — it
    // grows with the data), so it must never broadcast; without the
    // hint, Catalyst's static size estimate squeezed a 766k-row obs
    // frame under the 10 MB threshold at probe x10 and collected it
    // through the driver (measured 14.5s vs 4.7s for 3× MORE data at
    // x30, where the estimate tipped over into the correct shuffle
    // join). Both sides are (key, slot)-keyed; the merge join is the
    // plan that survives any scale.
    grid.join(obs.hint("merge"), Seq(keyCol, "slot"), "left")
      .select(col(keyCol), col("slot"),
        (col("slot") * stepUs).as("slot_ts_us"),
        last(col("__v"), ignoreNulls = true).over(wFill).as("value"),
        col("__v").isNotNull.as("observed"))
  }

  /** The dedup stage alone: `(keyCol, slot, value)` — each key-slot's
    * LAST observation, no grid, no fill. [[resampleFfill]] composes
    * this; a consumer that only wants OBSERVED slots (e.g.
    * [[robustAnomalies]], which scores measurements, not synthetic
    * fills) calls it directly and skips the grid explode + fill window
    * entirely — `resampleFfill(...).filter(observed)` computes the
    * identical frame at the cost of materializing and filling the full
    * grid first.
    */
  def lastPerSlot(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepUs: Long, tieBreaker: String): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val slotted = df.select(col(keyCol),
      expr(s"unix_micros($tsCol) DIV ${stepUs}L").as("slot"),
      col(valueCol).as("__v"), col(tieBreaker).as("__tb"),
      unix_micros(col(tsCol)).as("__ts"))
    // last observation per (key, slot) — deterministic under the
    // (ts desc, tiebreak desc) total order
    val wSlot = Window.partitionBy(col(keyCol), col("slot"))
      .orderBy(col("__ts").desc, col("__tb").desc)
    slotted.withColumn("__rn", row_number().over(wSlot))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("slot"), col("__v").as("value"))
  }

  /** Per-key robust anomaly detection over a (key, slot, value) series —
    * the modified z-score (Iglewicz–Hoaglin): `0.6745·|v − median| /
    * MAD`, flagging slots past `threshold` (3.5 is the standard cut).
    * Median/MAD instead of mean/stddev because the statistic must
    * survive the very outliers it hunts — one spike inflates a stddev
    * enough to hide itself.
    *
    * Determinism: both per-key statistics round to 4dp BEFORE any
    * downstream arithmetic (Spark `percentile` and DuckDB
    * `quantile_cont` share the interpolation rule but not final-ulp
    * bits — the [[graft.profile.Profiler]] grouped-quantile ruling), so
    * every score is IEEE arithmetic on identical inputs and the flagged
    * set hash-matches. A key with MAD = 0 (constant series) scores 0 —
    * never flagged, never a division by zero.
    *
    * Scale shape: two grouped exact percentiles (per-key state bounded
    * by the key's slot count — the resampled grid bounds it by
    * construction) + two key-grain broadcast-joinable stat frames; the
    * series never shuffles more than the percentile aggregations
    * themselves. At unbounded keys×slots swap `percentile` for
    * `approx_percentile` exactly like the profiling lanes.
    */
  def robustAnomalies(series: DataFrame, keyCol: String, slotCol: String,
      valueCol: String, threshold: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    // med/mad are KEY-cardinality frames — small for bounded key
    // domains but unbounded in general (billions of users), so the
    // broadcast decision belongs to Catalyst's stats, not a forced
    // hint: under the threshold it broadcasts anyway; above it the
    // keyed shuffle join is the only plan that works at all
    val med = series.groupBy(col(keyCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 4).as("med"))
    val withMed = series.join(med, Seq(keyCol))
      .select(col(keyCol), col(slotCol).as("slot"), v.as("value"),
        col("med"), abs(v - col("med")).as("__dev"))
    val mad = withMed.groupBy(col(keyCol))
      .agg(round(expr("percentile(__dev, 0.5)"), 4).as("mad"))
    withMed.join(mad, Seq(keyCol))
      .select(col(keyCol), col("slot"), col("value"), col("med"),
        col("mad"),
        when(col("mad") === 0, lit(0.0))
          .otherwise(lit(0.6745) * col("__dev") / col("mad"))
          .as("score"))
      .filter(col("score") > threshold)
  }
}
