package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style snapshot diff — the warehouse reconciliation op: given two
  * snapshots of a table, classify every key as added / removed /
  * changed / unchanged and name the columns that differ. The feed for
  * audits ("what did yesterday's load change?") and for building change
  * logs where the source system offers none (the reverse of the SCD
  * lanes, which CONSUME change feeds).
  *
  * Scale shape: one full-outer shuffle join on the key — both sides
  * exchange once, comparison is a codegen'd null-safe fold per row, and
  * the changed-column list is a per-row array expression (no second
  * pass). For repeated diffs of bucketed snapshots the exchange
  * disappears entirely (see BucketedStage — the join is key-equi).
  */
object SnapshotDiff {

  /** `(keys..., change_type, changed_cols)` per key present in either
    * snapshot. `changed_cols` is a comma-joined column-name list (in
    * `compareCols` order) for keys present in both sides; empty for
    * added/removed/unchanged. Comparison is null-safe (`<=>`): a column
    * going null counts as a change.
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    val bn = before.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"__b_$c")) :+
      lit(1).as("__b_present"): _*)
    val an = after.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"__a_$c")) :+
      lit(1).as("__a_present"): _*)
    val joined = bn.join(an, keys, "full_outer")
    val changed = filter(
      array(compareCols.map(c =>
        when(!(col(s"__b_$c") <=> col(s"__a_$c")), lit(c))
          .otherwise(lit(null))): _*),
      x => x.isNotNull)
    joined.select(keys.map(col) ++ Seq(
      when(col("__b_present").isNull, lit("added"))
        .when(col("__a_present").isNull, lit("removed"))
        .when(size(changed) > 0, lit("changed"))
        .otherwise(lit("unchanged")).as("change_type"),
      when(col("__b_present").isNotNull && col("__a_present").isNotNull,
        array_join(changed, ",")).otherwise(lit(""))
        .as("changed_cols")): _*)
  }
}
