package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-evolution audit — the metadata complement of the population
  * drift detector (`graft.dq.Drift`): diff two catalog frames
  * ([[Catalog.columnsFrame]] shape) and classify every column as
  * added / removed / type_changed / nullability_changed / unchanged.
  * This is the check a 100 TB ingestion runs BEFORE data flows: a
  * producer renaming or retyping a column breaks downstream pipelines
  * silently unless the catalog diff trips first. Extends the
  * reference's INFORMATION_SCHEMA discovery surface (SURVEY S9;
  * `Data_Quality_Table.sql:38-54`) from point-in-time projection to
  * snapshot comparison.
  *
  * Scale shape: catalogs are schema-sized (columns, not rows) — the
  * diff is a full-outer join of two frames bounded by table width.
  * Nothing here touches data; classification is pure projection.
  */
object SchemaDrift {

  /** `(column_name, status, before_type, after_type, before_nullable,
    * after_nullable)`, one row per column present in either catalog.
    * Type change dominates nullability change when both occur.
    */
  def diff(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("column_name"),
      col("data_type").as("before_type"),
      col("is_nullable").as("before_nullable"))
    val a = after.select(col("column_name"),
      col("data_type").as("after_type"),
      col("is_nullable").as("after_nullable"))
    b.join(a, Seq("column_name"), "full_outer")
      .select(col("column_name"),
        when(col("after_type").isNull, lit("removed"))
          .when(col("before_type").isNull, lit("added"))
          .when(col("before_type") =!= col("after_type"),
            lit("type_changed"))
          .when(col("before_nullable") =!= col("after_nullable"),
            lit("nullability_changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("before_type"), col("after_type"),
        col("before_nullable"), col("after_nullable"))
  }
}
