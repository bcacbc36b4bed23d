package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the classic product-analytics report the
  * reference's event-aggregation tasks gesture at (generated GROUP BY
  * aggregations over an activity log, `CODE_GENERATOR.sql:75-87`) but
  * never compose: bucket every user by the week of their FIRST activity
  * (the cohort), then count how many of each cohort are still active
  * N weeks later.
  *
  * Determinism: weeks are `epoch_us DIV (7·86400·10⁶)` — integer
  * division of the µs timestamp (the [[PipelineQueries]] representation
  * rule), so cohort and offset are exact integers on both engines and
  * the retention rate is ONE IEEE division of two exact longs per
  * report row (bit-identical, hence hash-oracle-able). Epochs in this
  * corpus are positive, where `DIV` (truncation) equals floor; the
  * pre-1970 caveat is documented rather than paid for.
  *
  * Scale shape (the part that matters at 100 TB of events):
  *   1. the ONLY corpus-sized pass is `groupBy(user, week)` — a
  *      map-side-combinable distinct, so the exchange carries at most
  *      |users|·|active weeks| rows, not events;
  *   2. the cohort week is a `min` window over that reduced frame,
  *      partitioned by user (one exchange of the reduced frame);
  *   3. the report aggregation and the cohort-size self-join operate on
  *      a (cohorts × offsets)-sized frame; sizes broadcast.
  * No corpus-sized join, no unpartitioned window anywhere.
  */
object Retention {

  /** Microseconds per week. */
  val WeekUs: Long = 7L * 86400L * 1000000L

  /** Per-(cohort, offset) retention report:
    * `(cohort_week, week_offset, active_users, cohort_users, retention)`
    * ordered by (cohort_week, week_offset). `cohort_week` is the
    * epoch-week index of the cohort's first activity; every cohort has
    * a `week_offset = 0` row with `retention = 1.0` by construction
    * (each user is active in their own first week).
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    // corpus-sized pass #1 (the only one): distinct active (user, week)
    // via groupBy so the partial aggregation combines map-side
    val weeks = events
      .select(col(userCol).as("__user"),
        expr(s"unix_micros($tsCol) DIV ${WeekUs}L").as("__week"))
      .groupBy("__user", "__week").agg(count(lit(1)).as("__n"))
      .drop("__n")
    // cohort = first active week per user — window over the reduced frame
    val cohorted = weeks.withColumn("cohort_week",
      min(col("__week")).over(Window.partitionBy(col("__user"))))
    val counts = cohorted
      .groupBy(col("cohort_week"),
        (col("__week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    // cohort sizes = the offset-0 rows (every user is active in their
    // cohort week); cohort-cardinality-sized, broadcast back
    val sizes = broadcast(counts.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("active_users").as("cohort_users")))
    counts.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_users"),
        (col("active_users").cast("double") /
          col("cohort_users").cast("double")).as("retention"))
      .orderBy("cohort_week", "week_offset")
  }
}
