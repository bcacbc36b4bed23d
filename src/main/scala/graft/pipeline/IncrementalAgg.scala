package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view update path
  * every warehouse runs at scale: a maintained per-group aggregate table
  * is brought up to date by an insert/delete change feed (updates =
  * delete + insert, the CDC convention) WITHOUT rescanning the corpus.
  * At 100 TB this is the difference between touching the day's changes
  * (GBs) and recomputing the aggregate from the full fact table (the
  * reference's orchestration procedures rebuild their aggregate tables
  * wholesale each run — `ORCHESTRATE_INGESTION.sql`'s CTAS-per-cycle —
  * which is exactly what stops working at scale).
  *
  * The core API ([[aggState]]/[[applyDelta]]) maintains DECOMPOSABLE
  * state only: `cnt` and per-column decimal sums (avg derives). min/max
  * are not delta-maintainable under deletes (a deleted minimum forces a
  * rescan of its group) — the textbook boundary of incremental view
  * maintenance — so they get the dedicated repair-scoped extension
  * below ([[aggStateMinMax]]/[[applyDeltaMinMax]]), which recomputes
  * exactly the touched groups instead of excluding extremes outright.
  *
  * Determinism: values round to 4dp and sum as DECIMAL — exact,
  * order-independent addition ([[graft.dq.Drift]] ruling) — so the
  * maintained state after any sequence of deltas is bit-identical to a
  * from-scratch aggregation of the final table, which is exactly the
  * invariant the gate oracle checks (the oracle aggregates the AFTER
  * table directly; the engine never sees it assembled).
  *
  * Scale shape: building state is one map-side-combinable aggregation
  * over the corpus (once, at bootstrap). Applying a delta aggregates
  * ONLY the change feed (signed contributions, map-side combinable) and
  * full-outer-joins two GROUP-CARDINALITY-sized frames — the corpus is
  * never touched again. Groups whose count reaches zero drop out.
  */
object IncrementalAgg {

  private def sumCol(c: String) =
    sum(round(col(c).cast("double"), 4).cast("decimal(20,4)"))

  /** Bootstrap: per-group `(groupCols..., cnt, sum_<v>...)` over a full
    * table. `sum_<v>` columns are exact decimals (internal state —
    * [[report]] renders the user-facing view).
    */
  def aggState(rows: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && valueCols.nonEmpty,
      "need at least one group and one value column")
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        valueCols.map(c => sumCol(c).as(s"sum_$c")): _*)
  }

  /** Advance `state` by one change batch. `deletes` rows must be rows
    * that exist in the table the state summarizes (the CDC contract —
    * the feed is authoritative; a delete for a row never inserted
    * silently corrupts the state, exactly as it would corrupt the
    * underlying table).
    */
  def applyDelta(state: DataFrame, inserts: DataFrame, deletes: DataFrame,
      groupCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && valueCols.nonEmpty,
      "need at least one group and one value column")
    val signed = inserts.withColumn("__sign", lit(1L))
      .unionByName(deletes.withColumn("__sign", lit(-1L)))
    // sign via negation, not multiplication: a long×decimal product
    // would widen past precision 38 and trigger Spark's loss-tolerant
    // re-scale; unary minus keeps the exact (20,4) type
    val delta = signed.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sign")).as("__d_cnt"),
        valueCols.map { c =>
          val v = round(col(c).cast("double"), 4).cast("decimal(20,4)")
          sum(when(col("__sign") > 0, v).otherwise(-v)).as(s"__d_sum_$c")
        }: _*)
    // null-SAFE key equality: a NULL group is a group like any other
    // (the Drift value-join ruling) — a USING join's EqualTo would
    // leave a null-keyed state row and its delta unmatched, silently
    // discarding the delete and duplicating the insert
    val st = state.select(
      groupCols.map(c => col(c).as(s"__s_$c")) ++
        Seq(col("cnt")) ++ valueCols.map(c => col(s"sum_$c")): _*)
    val cond = groupCols.map(c => col(s"__s_$c") <=> col(s"__d_$c"))
      .reduce(_ && _)
    val dl = delta.select(
      groupCols.map(c => col(c).as(s"__d_$c")) ++
        Seq(col("__d_cnt")) ++
        valueCols.map(c => col(s"__d_sum_$c")): _*)
    st.join(dl, cond, "full_outer")
      .select(groupCols.map(c =>
        coalesce(col(s"__s_$c"), col(s"__d_$c")).as(c)) ++
        Seq((coalesce(col("cnt"), lit(0L)) +
          coalesce(col("__d_cnt"), lit(0L))).as("cnt")) ++
        valueCols.map { c =>
          val z = lit(0).cast("decimal(20,4)")
          (coalesce(col(s"sum_$c"), z) + coalesce(col(s"__d_sum_$c"), z))
            .as(s"sum_$c")
        }: _*)
      .filter(col("cnt") > 0)
  }

  /** User-facing view of a state frame: counts, sums and averages as
    * doubles (one decimal→double cast + one division by the exact
    * count, mirrored in oracles).
    */
  def report(state: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame =
    state.select(groupCols.map(col) ++ Seq(col("cnt")) ++
      valueCols.flatMap(c => Seq(
        col(s"sum_$c").cast("double").as(s"sum_$c"),
        (col(s"sum_$c").cast("double") / col("cnt"))
          .as(s"avg_$c"))): _*)

  // ---- min/max extension: delta-advance with group-scoped repair ----
  //
  // min/max are NOT decomposable under deletes (the module scaladoc's
  // textbook boundary) — but real warehouses still maintain them
  // incrementally, the way this extension does: inserts advance an
  // extreme for free (min(old, new) is always safe), and a delete only
  // invalidates a group's extreme when the deleted batch TOUCHES it
  // (batch min ≤ stored min, or batch max ≥ stored max). Only those
  // groups re-read the base table — at 100 TB a partition/cluster-
  // pruned scan of the day's touched groups, not a rebuild.

  /** Bootstrap incl. extremes:
    * `(groupCols..., cnt, sum_<v>..., min_<v>..., max_<v>...)`.
    */
  def aggStateMinMax(rows: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && valueCols.nonEmpty,
      "need at least one group and one value column")
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        valueCols.flatMap(c => Seq(
          sumCol(c).as(s"sum_$c"),
          min(col(c).cast("double")).as(s"min_$c"),
          max(col(c).cast("double")).as(s"max_$c"))): _*)
  }

  /** Per-group min/max of `valueCols` with `<prefix>min_<c>` /
    * `<prefix>max_<c>` names — the shared builder for the delete-,
    * insert- and repair-side extreme frames.
    */
  private def extremesAgg(df: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String], prefix: String): DataFrame = {
    val aggs = valueCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${prefix}min_$c"),
      max(col(c).cast("double")).as(s"${prefix}max_$c")))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Groups whose stored extreme is touched by the delete batch —
    * exactly the groups [[applyDeltaMinMax]] re-reads from `base`.
    * Exposed so the repair scope is directly testable.
    */
  private[pipeline] def touchedGroups(state: DataFrame,
      deletes: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val delExt = extremesAgg(deletes, groupCols, valueCols, "__d_")
    val st = state.select(
      groupCols.map(c => col(c).as(s"__s_$c")) ++
        valueCols.flatMap(c =>
          Seq(col(s"min_$c"), col(s"max_$c"))): _*)
    val cond = groupCols.map(c => col(s"__s_$c") <=> col(c))
      .reduce(_ && _)
    val touched = valueCols.map(c =>
      col(s"__d_min_$c") <= col(s"min_$c") ||
        col(s"__d_max_$c") >= col(s"max_$c")).reduce(_ || _)
    delExt.join(st, cond, "inner").filter(touched)
      .select(groupCols.map(col): _*)
  }

  /** Advance a [[aggStateMinMax]] state by one change batch. `base` is
    * the maintained table AFTER the batch (deletes applied, inserts
    * appended — the warehouse always has it); it is read ONLY for the
    * groups whose stored extreme a delete touched, via a broadcast
    * semi-join on that (delete-batch-bounded) key set. Decomposable
    * parts advance exactly as [[applyDelta]]; untouched groups'
    * extremes advance from the insert extremes alone and never read
    * `base` — the property the spec pins with a poisoned-base test.
    */
  def applyDeltaMinMax(state: DataFrame, inserts: DataFrame,
      deletes: DataFrame, base: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val core = applyDelta(
      state.select(groupCols.map(col) ++ Seq(col("cnt")) ++
        valueCols.map(c => col(s"sum_$c")): _*),
      inserts, deletes, groupCols, valueCols)
    val insExt = extremesAgg(inserts, groupCols, valueCols, "__i_")
    // candidates: stored extreme advanced by insert extremes
    // (least/greatest SKIP nulls — here that is exactly right: a new
    // group has no stored extreme, an uninserted group no insert one)
    val st = state.select(
      groupCols.map(c => col(c).as(s"__s_$c")) ++
        valueCols.flatMap(c =>
          Seq(col(s"min_$c"), col(s"max_$c"))): _*)
    val condSI = groupCols.map(c => col(s"__s_$c") <=> col(c))
      .reduce(_ && _)
    val cand = st.join(insExt, condSI, "full_outer")
      .select(groupCols.map(c =>
        coalesce(col(s"__s_$c"), col(c)).as(c)) ++
        valueCols.flatMap(c => Seq(
          least(col(s"min_$c"), col(s"__i_min_$c")).as(s"min_$c"),
          greatest(col(s"max_$c"), col(s"__i_max_$c")).as(s"max_$c"))): _*)
    // repair: recompute extremes from base for the touched groups only
    val touched = touchedGroups(state, deletes, groupCols, valueCols)
    val baseCond = groupCols.map(c => col(c) <=> col(s"__t_$c"))
      .reduce(_ && _)
    val repaired = extremesAgg(
      base.join(broadcast(touched.select(
          groupCols.map(c => col(c).as(s"__t_$c")): _*)),
        baseCond, "left_semi"),
      groupCols, valueCols, "__r_")
    val condCR = groupCols.map(c => col(c) <=> col(s"__r_$c"))
      .reduce(_ && _)
    // __r_hit marks "a repair row EXISTS" separately from the repaired
    // value: a touched group whose surviving values are all null must
    // repair to NULL, which a bare coalesce would mistake for "no
    // repair row" and resurrect the stale deleted extreme
    val rep = repaired.select(
      groupCols.map(c => col(c).as(s"__r_$c")) ++
        Seq(lit(true).as("__r_hit")) ++
        valueCols.flatMap(c =>
          Seq(col(s"__r_min_$c"), col(s"__r_max_$c"))): _*)
    val extremes = cand.join(rep, condCR, "left")
      .select(groupCols.map(col) ++
        valueCols.flatMap(c => Seq(
          when(col("__r_hit"), col(s"__r_min_$c"))
            .otherwise(col(s"min_$c")).as(s"min_$c"),
          when(col("__r_hit"), col(s"__r_max_$c"))
            .otherwise(col(s"max_$c")).as(s"max_$c"))): _*)
    // surviving groups come from core; every survivor has a candidate
    // row (state ∪ inserts covers it), so the inner join loses nothing
    val condCE = groupCols.map(c => col(c) <=> col(s"__e_$c"))
      .reduce(_ && _)
    core.join(extremes.select(
        groupCols.map(c => col(c).as(s"__e_$c")) ++
          valueCols.flatMap(c =>
            Seq(col(s"min_$c"), col(s"max_$c"))): _*),
        condCE, "inner")
      .select(groupCols.map(col) ++ Seq(col("cnt")) ++
        valueCols.flatMap(c => Seq(col(s"sum_$c"), col(s"min_$c"),
          col(s"max_$c"))): _*)
  }

  /** [[report]] plus the extremes, for [[aggStateMinMax]]-shaped
    * state.
    */
  def reportMinMax(state: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame =
    state.select(groupCols.map(col) ++ Seq(col("cnt")) ++
      valueCols.flatMap(c => Seq(
        col(s"sum_$c").cast("double").as(s"sum_$c"),
        (col(s"sum_$c").cast("double") / col("cnt")).as(s"avg_$c"),
        col(s"min_$c"), col(s"max_$c"))): _*)
}
