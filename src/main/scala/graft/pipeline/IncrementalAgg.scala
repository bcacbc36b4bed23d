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
  * Only DECOMPOSABLE state is maintained: `cnt` and per-column decimal
  * sums (avg derives). min/max are deliberately absent — they are not
  * delta-maintainable under deletes (a deleted minimum forces a rescan
  * of its group), which is the textbook boundary of incremental view
  * maintenance; a caller needing them recomputes the affected groups.
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
}
