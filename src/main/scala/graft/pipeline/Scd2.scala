package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type 2 (full history) — the versioned sibling of [[Scd1]].
  *
  * The reference's generated MERGE overwrites in place
  * (`/root/reference/CODE_GENERATOR.sql:39-59`, SCD1); a training-data
  * warehouse almost always needs the Type-2 variant instead — keep every
  * version of a row with its validity interval, so any historical corpus
  * snapshot can be reconstructed ("the documents table as of the May
  * crawl"). Two capabilities:
  *
  *   - [[historize]]: a change log → interval history in ONE window pass
  *     (valid_from = the change's own order value, valid_to = the next
  *     change's, open interval on the newest row).
  *   - [[merge]]: history + incoming batch → history, closing out current
  *     rows whose tracked attributes actually changed (null-safe
  *     comparison) and inserting new current versions; unchanged rows are
  *     not re-versioned (the standard SCD2 no-op rule).
  *
  * Scale: historize is one keyed shuffle (the window). merge shuffles the
  * source once for its latest-per-key window and joins current-target ×
  * latest on the merge key — both sides keyed identically, and AQE
  * broadcasts the batch side when it is dimension-sized. Closed/untouched/
  * new partitions are unions of the SAME keyed frames (no re-shuffle), and
  * nothing ever funnels through the driver.
  *
  * Feed contract: batch order values must not precede the current rows'
  * valid_from — i.e. feeds are appended in event-time order per key, the
  * same assumption the reference's CREATED_AT-latest MERGE makes. Since
  * r7 the contract is ENFORCED, not just documented: the closing path
  * raises a task error naming the offending key instead of silently
  * writing an inverted interval (valid_to < valid_from) into history —
  * a `raise_error` branch inside the close expression, so the happy
  * path costs one codegen'd comparison and no extra pass.
  */
object Scd2 {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"
  val IsCurrent = "is_current"

  /** Change log → interval history. `valid_to` is the NEXT version's
    * order value (half-open interval, the join-friendly convention:
    * `from <= t < to`); null on each key's newest row. `tieBreakers`
    * make `lead` deterministic when order values collide.
    */
  def historize(df: DataFrame, keys: Seq[String], orderCol: String,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "historize needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol +: tieBreakers).map(c => col(c).asc): _*)
    df.withColumn(ValidFrom, col(orderCol))
      .withColumn(ValidTo, lead(col(orderCol), 1).over(w))
      .withColumn(IsCurrent, col(ValidTo).isNull)
  }

  /** SCD2 upsert of `source` (a raw batch, source-schema rows) into
    * `target` (history-schema rows: source columns + valid_from/valid_to/
    * is_current). A key's newest batch row becomes its new current
    * version iff any column of `attrs` differs null-safely from the
    * key's current version (or the key is new); the superseded version
    * closes with `valid_to` = the new version's order value.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      orderCol: String, attrs: Seq[String],
      tieBreakers: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "SCD2 merge needs at least one key column")
    require(attrs.nonEmpty,
      "SCD2 merge needs at least one tracked attribute (attrs) — with " +
        "none, no redelivery could ever constitute a change")
    val srcCols = source.columns.toSeq
    val latest = Scd1.latestPerKey(source, keys, orderCol, tieBreakers)
    val current = target.filter(col(IsCurrent))
    val history = target.filter(!col(IsCurrent))

    // latest × current on the merge key; keep batch rows that are new
    // keys (left join, null current side) or differ on a tracked
    // attribute. <=> (null-safe equality) so null→value and value→null
    // transitions count as changes instead of vanishing.
    val l = latest.alias("l")
    val c = current.alias("c")
    val keyEq = keys.map(k => col(s"l.$k") === col(s"c.$k"))
      .reduce(_ && _)
    val differs = attrs.map(a => !(col(s"l.$a") <=> col(s"c.$a")))
      .reduce(_ || _)
    val changed = l.join(c, keyEq, "left")
      .filter(col(s"c.${keys.head}").isNull || differs)
      .select(srcCols.map(n => col(s"l.$n")): _*)

    val changedKeys = changed.select(keys.map(col): _*)
    // per changed key: when the new version starts = when the old closes
    val closeAt = changed.select(
      (keys.map(col) :+ col(orderCol).as("__close_at")): _*)

    val closed = current.join(closeAt, keys)
      .withColumn(ValidTo,
        when(col("__close_at") < col(ValidFrom),
          raise_error(format_string(
            "SCD2 feed contract violated: batch order value %s precedes " +
              "current valid_from %s for key (%s) — feeds must arrive in " +
              "event-time order per key",
            col("__close_at").cast("string"),
            col(ValidFrom).cast("string"),
            concat_ws(",", keys.map(k => col(k).cast("string")): _*)))
            .cast(target.schema(ValidTo).dataType))
          .otherwise(col("__close_at")))
      .withColumn(IsCurrent, lit(false))
      .drop("__close_at")
    val untouchedCurrent = current.join(changedKeys, keys, "left_anti")
    val newRows = changed
      .withColumn(ValidFrom, col(orderCol))
      .withColumn(ValidTo, lit(null).cast(
        target.schema(ValidTo).dataType))
      .withColumn(IsCurrent, lit(true))

    history.unionByName(closed).unionByName(untouchedCurrent)
      .unionByName(newRows)
  }

  /** Point-in-time snapshot of a history frame: the version of each key
    * whose validity interval contains `at` — `valid_from ≤ at` and
    * (`valid_to` is NULL or `at < valid_to`), i.e. intervals are
    * closed-open exactly as [[historize]]/[[merge]] emit them. This is
    * the READ side of SCD2 (the time-travel query a warehouse runs
    * against the dimension): a pure filter over the history — no
    * window, no join, fully pushdown-eligible, so at 100 TB a
    * `valid_from`-partitioned or z-ordered layout prunes it to the
    * files that can contain live versions.
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col(ValidFrom) <= at &&
      (col(ValidTo).isNull || at < col(ValidTo)))
}
