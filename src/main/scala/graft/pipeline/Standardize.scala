package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winsorized z-score standardization — the model-input normalizer:
  * clip a feature to its within-group [pLow, pHigh] percentile band
  * (so a single corrupt reading can't stretch the scale), then center
  * and scale by the clipped mean/stddev. The winsorize-then-standardize
  * order matters and is the point: plain z-scores inherit the outlier
  * they were meant to tame.
  *
  * Determinism across engines (the [[Binning]] / [[graft.profile]]
  * recipe): percentile cuts and the clipped mean/stddev are rounded to
  * 4dp — Spark `percentile` and DuckDB `quantile_cont` share the
  * interpolation rule at that rounding, and rounding absorbs the
  * partition-order drift of float accumulation — while the per-row
  * z itself is a fixed two-op IEEE tree `(clip(v) − mean) / std` over
  * those rounded stats, bit-equal in any engine.
  *
  * Scale shape: two bounded aggregations over the corpus (cut points,
  * then clipped moments — both group-cardinality-sized results) each
  * joined back BROADCAST; the corpus never sorts, never windows, never
  * shuffles on anything but the scan. Exact percentiles hold a group's
  * values in the aggregation task — the documented unbounded swap is
  * `approx_percentile`, one line, same downstream plan.
  */
object Standardize {

  /** Appends `lo_cut`, `hi_cut`, `z` to `df`: the rounded winsor cuts
    * and the standardized clipped value. Rows are never dropped — a
    * null value, a null-cut group (all values null), or a zero/null
    * stddev (constant group, or a single row's null sample-stddev)
    * yields a null `z` instead.
    */
  def withZScore(df: DataFrame, groupCol: String, valueCol: String,
      pLow: Double = 0.01, pHigh: Double = 0.99): DataFrame = {
    require(0 <= pLow && pLow < pHigh && pHigh <= 1,
      "need 0 <= pLow < pHigh <= 1")
    val cuts = df.groupBy(col(groupCol))
      .agg(expr(s"round(percentile($valueCol, $pLow), 4)").as("lo_cut"),
        expr(s"round(percentile($valueCol, $pHigh), 4)").as("hi_cut"))
    val clipped = df.join(broadcast(cuts), Seq(groupCol), "left")
      // explicit null guard: least/greatest SKIP nulls, so without it a
      // null value would silently "clip" to lo_cut — inventing a reading
      .withColumn("__vc",
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(
            least(greatest(col(valueCol), col("lo_cut")), col("hi_cut"))))
    val stats = clipped.groupBy(col(groupCol))
      .agg(round(avg(col("__vc")), 4).as("__mean"),
        round(stddev_samp(col("__vc")), 4).as("__std"))
    clipped.join(broadcast(stats), Seq(groupCol), "left")
      .withColumn("z",
        when(col("__vc").isNull || col("__std").isNull ||
          col("__std") === 0.0, lit(null).cast("double"))
          .otherwise((col("__vc") - col("__mean")) / col("__std")))
      .drop("__vc", "__mean", "__std")
  }
}
