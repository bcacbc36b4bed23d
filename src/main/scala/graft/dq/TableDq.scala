package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Five-pillar data-quality scoring over a table profile.
  *
  * Semantics follow `/root/reference/Data_Quality_Table.sql:112-189`:
  *   - completeness = 1 − null_ratio (`:115-122`)
  *   - uniqueness   = distinct_ratio (`:124-131`)
  *   - validity     = numeric family: 1.0 if avg ≥ 0 else 0.5; other
  *                    families 1.0 (`:133-144`)
  *   - accuracy     = temporal family: 1 − future/total (0 when the table
  *                    is empty); other families 1.0 (`:146-161`)
  *   - consistency  = 1.0, hardcoded in the reference (`:163-170`)
  *   - column_score = mean of the five UNROUNDED pillar values, rounded to
  *                    3 (the reference accumulates `total_score` before
  *                    rounding, `:121,130,143,160,173`)
  *   - table_score  = mean of the ROUNDED column scores, rounded to 3
  *                    (`:178,188`)
  *
  * Every pillar is column arithmetic over [[graft.profile.Profiler]] output,
  * so a full table DQ report costs exactly ONE scan of the data (the
  * reference issues ≥ 2N+1 full-scan queries for an N-column table).
  *
  * Documented deviations from the reference (bug-for-bug parity rejected):
  *   - the reference's `"DATE" in data_type` test misses TIMESTAMP columns
  *     (Snowflake reports `TIMESTAMP_NTZ`); here the accuracy check applies
  *     to the whole temporal family, which is the stated intent ("no future
  *     dates").
  *   - an all-null numeric column yields `str(nan)` → validity 0.5 in the
  *     reference; here a null average counts as 0 (valid).
  */
object TableDq {

  private val numericTypes = Seq("NUMBER", "FLOAT")

  /** Per-column pillar scores from a profile frame (one row per column,
    * schema = [[graft.profile.Profiler.outputColumns]]).
    */
  def score(profile: DataFrame): DataFrame = {
    val isNumeric = col("data_type").isin(numericTypes: _*)
    val isTemporal = col("data_type") === "TIMESTAMP"

    val completeness = lit(1.0) - col("null_ratio")
    val uniqueness = col("distinct_ratio")
    val validity = when(!isNumeric, 1.0)
      .when(coalesce(col("avg_val"), lit(0.0)) >= 0, 1.0)
      .otherwise(0.5)
    val accuracy = when(!isTemporal, 1.0)
      .otherwise(lit(1.0) - when(col("count_all") > 0,
        col("future_count").cast("double") / col("count_all")).otherwise(0.0))
    val consistency = lit(1.0)

    val columnScore = round(
      (completeness + uniqueness + validity + accuracy + consistency) / 5, 3)

    profile.select(
      col("column_name"),
      round(completeness, 3).as("completeness"),
      round(uniqueness, 3).as("uniqueness"),
      round(validity, 3).as("validity"),
      round(accuracy, 3).as("accuracy"),
      round(consistency, 3).as("consistency"),
      columnScore.as("column_score"))
  }

  /** Whole-table roll-up: mean of rounded column scores, rounded to 3
    * (`/root/reference/Data_Quality_Table.sql:178,188`). One output row.
    */
  def tableScore(profile: DataFrame): DataFrame =
    score(profile).agg(round(avg("column_score"), 3).as("table_score"))
}
