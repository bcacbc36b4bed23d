package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate foreign-key discovery — inclusion-dependency profiling
  * over declared column pairs: does child column C's value set live
  * inside parent column P's, and is P unique enough to be a key? This
  * extends the reference's schema-discovery surface
  * (`Data_Discovery_Table.sql`'s column metadata walk) with the
  * RELATIONSHIP layer it stops short of: the measured evidence behind
  * an ER diagram.
  *
  * Per pair this reports parent-side key quality (distinct vs non-null
  * row count) and child-side containment (fraction of the child's
  * distinct values present in the parent) — 1.0 containment + unique
  * parent = FK candidate; a low containment pair is measured, not
  * guessed, as a non-relationship.
  *
  * Scale shape: per pair, two map-side-combinable distinct
  * aggregations and ONE left join of the child's distinct-value frame
  * (key-cardinality-sized, far smaller than the relation) against the
  * parent's; the per-pair one-row results cross-join into a single
  * report plan — a declared pair list (schema-sized, not data-sized)
  * built as one lazy plan, no driver-side data loop. Nulls are
  * excluded on both sides (SQL FK semantics: null references nothing).
  *
  * The pair list is DECLARED, not enumerated: profiling all O(cols²)
  * column pairs of a warehouse is its own (sketch-based) problem —
  * at that scale swap the distinct frames for bloom/HLL summaries
  * ([[graft.dedup.IncrementalDedup]]'s sketch seam).
  */
object FkDiscovery {

  /** One candidate: child `(table, column)` referencing parent
    * `(table, column)`, with the loaded frames.
    */
  final case class Candidate(childName: String, child: DataFrame,
      childCol: String, parentName: String, parent: DataFrame,
      parentCol: String)

  /** One row per candidate:
    * `(child_col, parent_col, child_distinct, contained, containment,
    * parent_distinct, parent_unique)`, ordered by (child_col,
    * parent_col). Containment of an all-null child column is 0.0 by
    * convention.
    */
  def audit(pairs: Seq[Candidate]): DataFrame = {
    require(pairs.nonEmpty, "declare at least one candidate pair")
    pairs.map(one).reduce(_ unionByName _)
      .orderBy("child_col", "parent_col")
  }

  private def one(c: Candidate): DataFrame = {
    val childVals = c.child
      .select(col(c.childCol).as("v")).filter(col("v").isNotNull)
      .distinct()
    val parentVals = c.parent
      .select(col(c.parentCol).as("pv")).filter(col("pv").isNotNull)
      .distinct()
    val containment = childVals
      .join(parentVals, col("v") === col("pv"), "left")
      .agg(count(lit(1)).as("child_distinct"),
        count(col("pv")).as("contained"))
    val parentStats = c.parent.agg(
      countDistinct(col(c.parentCol)).as("parent_distinct"),
      count(col(c.parentCol)).as("parent_rows"))
    containment.crossJoin(broadcast(parentStats))
      .select(
        lit(s"${c.childName}.${c.childCol}").as("child_col"),
        lit(s"${c.parentName}.${c.parentCol}").as("parent_col"),
        col("child_distinct"), col("contained"),
        when(col("child_distinct") === 0, lit(0.0))
          .otherwise(col("contained").cast("double") /
            col("child_distinct").cast("double")).as("containment"),
        col("parent_distinct"),
        (col("parent_distinct") === col("parent_rows"))
          .as("parent_unique"))
  }
}
