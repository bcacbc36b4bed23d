package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-/last-touch conversion attribution — the marketing-analytics
  * ledger behind "which channel gets credit for this purchase?": for
  * each conversion event, find the earliest and the latest touch event
  * of the same key inside a lookback window, and roll credits up per
  * channel. Extends the event-analytics family (funnel X36b, growth
  * X60, transitions X65) with the credit-assignment report.
  *
  * Determinism without a sort-dependent pick: the first/last touch are
  * `min`/`max` over `struct(ts_us, id, channel)` in a RANGE-bounded
  * frame — set semantics, so timestamp ties (frame "peers", which a
  * RANGE frame includes wholesale) resolve by the unique id instead of
  * by physical row order. A touch at the exact conversion timestamp
  * counts (the frame is inclusive).
  *
  * Scale shape: ONE hash exchange on the key feeds ONE window operator
  * (both extremes share the frame spec); conversions then explode into
  * exactly two credit rows each and a map-side-combinable sum collapses
  * to the channel-domain frame. No self-join, no second corpus pass.
  */
object Attribution {

  /** Credit bucket for conversions with no touch inside the lookback. */
  val NoTouch = "(none)"

  val DefaultLookbackUs: Long = 7L * 24 * 3600 * 1000000 // 7 days

  /** `(channel, first_touch, last_touch)` conversion credits.
    * `touchTypes` must not contain `convType` (a conversion crediting
    * itself is always a modelling error).
    */
  def firstLast(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, idCol: String, convType: String,
      touchTypes: Seq[String],
      lookbackUs: Long = DefaultLookbackUs): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convType),
      "convType must not be a touch type")
    require(lookbackUs > 0, "lookback must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ts"))
      .rangeBetween(-lookbackUs, 0)
    val touch = col(typeCol).isin(touchTypes.map(t => t: Any): _*)
    val tagged = events
      .select(col(keyCol), col(typeCol),
        unix_micros(col(tsCol)).as("__ts"), col(idCol).as("__id"))
      .withColumn("__tch", when(touch,
        struct(col("__ts").as("t"), col("__id").as("i"),
          col(typeCol).as("c"))))
      .withColumn("__first", min(col("__tch")).over(w))
      .withColumn("__last", max(col("__tch")).over(w))
    tagged.filter(col(typeCol) === convType)
      .select(
        coalesce(col("__first.c"), lit(NoTouch)).as("first_ch"),
        coalesce(col("__last.c"), lit(NoTouch)).as("last_ch"))
      .select(explode(array(
        struct(col("first_ch").as("channel"), lit(1L).as("f"),
          lit(0L).as("l")),
        struct(col("last_ch").as("channel"), lit(0L).as("f"),
          lit(1L).as("l")))).as("e"))
      .select(col("e.channel").as("channel"), col("e.f").as("f"),
        col("e.l").as("l"))
      .groupBy(col("channel"))
      .agg(sum(col("f")).as("first_touch"),
        sum(col("l")).as("last_touch"))
  }
}
