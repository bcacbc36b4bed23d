package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling active-user counts — the DAU/WAU/stickiness report every
  * product-analytics pipeline computes, done EXACTLY (no HLL) with a
  * bounded map-side expansion instead of a per-day distinct over a
  * 7-day self-join.
  *
  * Shape: the ONLY corpus-sized pass is the map-side-combinable
  * `(user, day)` distinct (days are `epoch_us DIV 86400·10⁶` — integer
  * bucketing, engine-portable). Each active (user, day) then
  * contributes to exactly `window` report days (`sequence(day,
  * day+window−1)` exploded map-side — bounded ×window, never a range
  * join), and a second distinct collapses multi-active users per
  * report day. DAU is a plain count over the same reduced frame;
  * stickiness is ONE IEEE division of exact longs. Report days are
  * clipped to the observed `[min, max]` day range (single-row
  * broadcast), so trailing partial windows are not reported.
  *
  * At 100 TB this is the exact-form twin of the sketch path (per-day
  * HLL merged across the window); the exact form is the oracle-able
  * default and the sketch swap is one aggregate substitution, the same
  * relationship as `profile_lineitem` / `profile_lineitem_approx`.
  */
object Actives {

  /** Microseconds per day. */
  val DayUs: Long = 86400L * 1000000L

  /** `(day, dau, rolling_actives, stickiness)` per observed day, where
    * `rolling_actives` counts distinct users active in the trailing
    * `window` days (inclusive) and `stickiness = dau /
    * rolling_actives`. Days with no own-day activity inside a window
    * still report (dau 0).
    */
  def rolling(events: DataFrame, userCol: String, tsCol: String,
      window: Int): DataFrame =
    rollingFromPairs(pairs(events, userCol, tsCol), window)

  /** The reduced `(user, day)` distinct frame — the ONE corpus-sized
    * pass, exposed so the streaming maintainer can keep exactly this
    * frame as its state.
    */
  def pairs(events: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    events
      .select(col(userCol).as("user"),
        expr(s"unix_micros($tsCol) DIV ${DayUs}L").as("day"))
      .distinct()

  /** The report over an already-reduced `(user, day)` distinct frame
    * (state-sized work — nothing here touches the corpus).
    */
  def rollingFromPairs(userDay: DataFrame, window: Int): DataFrame = {
    require(window >= 1, "need a positive window")
    val bounds = userDay.agg(min(col("day")).as("__lo"),
      max(col("day")).as("__hi"))
    val dau = userDay.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = userDay
      .select(col("user"),
        explode(expr(s"sequence(day, day + ${window - 1})"))
          .as("day"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("rolling_actives"))
    wau
      .join(dau, Seq("day"), "left")
      .crossJoin(broadcast(bounds))
      .filter(col("day") >= col("__lo") && col("day") <= col("__hi"))
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        col("rolling_actives"),
        (coalesce(col("dau"), lit(0L)).cast("double") /
          col("rolling_actives")).as("stickiness"))
  }
}
