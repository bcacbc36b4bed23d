package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a relation —
  * the DQ question CDC diffing ([[graft.pipeline.SnapshotDiff]]) does
  * not answer: not WHICH rows changed, but whether the population's
  * SHAPE moved (a feed that silently dropped a region, a price model
  * that shifted the mix). The classic monitoring statistic here is PSI,
  * but PSI's `(p-q)·ln(p/q)` terms need libm and its zero-bucket guards
  * are convention; total-variation distance `TV = ½·Σ|p_i − q_i|` is
  * the same alarm with exact arithmetic: this implementation keeps the
  * per-value numerators in EXACT integers
  * (`|cnt_a·total_b − cnt_b·total_a|`), sums them (integer sum —
  * order-independent, unlike a double Σ), and divides ONCE, so the
  * reported TV is bit-identical across engines (the
  * [[graft.text.Bm25]] determinism pattern). Longs stay exact while
  * `cnt · total < 2^63` (~3·10^9 rows even fully skewed); past that
  * swap the products to DECIMAL(38,0).
  *
  * Scale shape: one map-side-combinable count aggregation per side
  * (value-cardinality-sized output — categorical by assumption), a
  * full-outer join of the two small count frames, scalar totals
  * broadcast as a single row. Nothing corpus-sized ever shuffles twice.
  */
object Drift {

  /** Per-value drift report for a categorical column: counts and exact
    * shares on each side, the per-value TV numerator, and the total TV
    * distance repeated on every row (constant column — the report is
    * value-cardinality-sized, and the driver gate hashes full rows).
    * Values absent from one side count 0 there; null is a value like
    * any other (drift TO null is drift).
    *
    * Output: `(value, cnt_a, cnt_b, share_a, share_b, tv)` ordered by
    * value.
    */
  def categoricalDrift(before: DataFrame, after: DataFrame,
      column: String): DataFrame = {
    val a = before.groupBy(col(column).cast("string").as("va"))
      .agg(count(lit(1)).as("cnt_a"))
    val b = after.groupBy(col(column).cast("string").as("vb"))
      .agg(count(lit(1)).as("cnt_b"))
    // null-safe equality so a null bucket on each side is ONE value row
    // (drift to null is drift, not two half-rows)
    val joined = a.join(b, col("va") <=> col("vb"), "full_outer")
      .select(coalesce(col("va"), col("vb")).as("value"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    // totals first, numerator second (the numerator needs both totals,
    // so it is a second pass over the value-cardinality-sized frame,
    // not the corpus); both broadcast back as single rows
    val t = broadcast(joined.agg(
      sum(col("cnt_a")).as("total_a"),
      sum(col("cnt_b")).as("total_b")))
    val withTotals = joined.crossJoin(t)
    val tvNum = broadcast(withTotals.agg(
      sum(abs(col("cnt_a") * col("total_b") -
        col("cnt_b") * col("total_a"))).as("tv_num")))
    withTotals.crossJoin(tvNum)
      .select(col("value"), col("cnt_a"), col("cnt_b"),
        (col("cnt_a").cast("double") / col("total_a").cast("double"))
          .as("share_a"),
        (col("cnt_b").cast("double") / col("total_b").cast("double"))
          .as("share_b"),
        (col("tv_num").cast("double") /
          (lit(2.0) * col("total_a").cast("double") *
            col("total_b").cast("double"))).as("tv"))
      .orderBy("value")
  }

  /** Numeric drift via fixed-width bucketing: `floor(col / width)`
    * becomes the categorical value (rendered as the bucket's lower
    * bound so the report reads as a histogram). Width is the
    * sensitivity dial: at 100 TB pick it from the column's committed
    * profile (min/max), not from a data pass.
    */
  def numericDrift(before: DataFrame, after: DataFrame,
      column: String, width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def bucketed(df: DataFrame) = df.withColumn(column,
      floor(col(column).cast("double") / width) * width)
    categoricalDrift(bucketed(before), bucketed(after), column)
  }
}
