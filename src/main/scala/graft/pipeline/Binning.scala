package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile discretization (feature binning) — the classic train-prep
  * transform: replace a continuous feature with its within-group
  * quantile bucket so downstream models see a uniform, outlier-robust
  * ordinal. The deliberate contrast with an `ntile()` window: ntile
  * ranks the WHOLE group through one task (a scale-killer at corpus
  * grain, the r7 Vocab lesson), while boundary-binning computes k−1
  * cut points per group (bounded aggregation state), broadcasts the
  * group-cardinality-sized cut table, and bins by a codegen'd array
  * comparison — the corpus never sorts and never re-shuffles.
  *
  * Determinism: cut points are exact percentiles rounded to 4dp (the
  * [[graft.profile]] grouped-quantile recipe — Spark `percentile` and
  * DuckDB `quantile_cont` share the interpolation rule at that
  * rounding), and the bin is an integer from strict `<` comparisons of
  * raw values against rounded cuts — a value equal to a cut goes LOW,
  * identically in both engines.
  *
  * Scale note: exact per-group percentiles hold the group's values in
  * the aggregation task — fine while groups fit a task (the gate's
  * event types); the unbounded swap is `approx_percentile` grouped,
  * one line, same downstream plan.
  */
object Binning {

  /** Appends `bin` ∈ 1..k: the value's within-`groupCol` quantile
    * bucket under cut points at `i/k, i = 1..k−1`. Rows are NEVER
    * dropped: a null value, a null group, or a group with no non-null
    * values gets a null bin instead.
    */
  def withQuantileBins(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "need at least two bins")
    val probs = (1 until k).map(i => i.toDouble / k)
      .mkString("array(", ", ", ")")
    val cuts = df.groupBy(col(groupCol))
      .agg(expr(s"transform(percentile($valueCol, $probs), " +
        "x -> round(x, 4))").as("__cuts"))
    // LEFT join: an inner join's EqualTo would silently DROP every
    // null-group row (the transform contract is one row out per row
    // in); unmatched rows — null group, or a group whose values were
    // all null (percentile null → null cuts) — keep their row and get
    // a null bin via the guard below
    df.join(broadcast(cuts), Seq(groupCol), "left")
      .withColumn("bin",
        when(col(valueCol).isNull || col("__cuts").isNull,
          lit(null).cast("int"))
          .otherwise(size(filter(col("__cuts"),
            b => b < col(valueCol))) + 1))
      .drop("__cuts")
  }
}
