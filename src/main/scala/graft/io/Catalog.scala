package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.TypeMapper

/** S9: catalog scan — the reference's INFORMATION_SCHEMA.COLUMNS
  * projection with its CASE length/precision dispatch
  * (`/root/reference/Data_Quality_Table.sql:38-54`;
  * `/root/reference/Business_Glossory.sql:37-43`), re-expressed over a
  * DataFrame's `StructType` (the catalog of a path-backed table) and
  * returned AS a DataFrame so catalog metadata is queryable like any
  * other relation.
  *
  * Length/precision semantics (the reference's CASE, `:43-49`):
  *   - string family  → CHARACTER_MAXIMUM_LENGTH (unbounded on Spark
  *     strings → 16 MB Snowflake default, reported as 16777216)
  *   - numeric family → NUMERIC_PRECISION (decimal precision; 38 for
  *     NUMBER-mapped integers, 17 significant digits for FLOAT/double)
  *   - temporal family → DATETIME_PRECISION (µs = 6 on Spark timestamps,
  *     0 for dates)
  *   - else NULL
  */
object Catalog {

  private val StringMax = 16777216L

  def columnsFrame(spark: SparkSession, df: DataFrame,
      tableName: String): DataFrame = {
    import spark.implicits._
    df.schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      val engineType = TypeMapper.toEngineType(f.dataType)
      val lenPrec: Option[Long] = TypeMapper.familyOf(f.dataType) match {
        case TypeMapper.StringFamily => Some(StringMax)
        case TypeMapper.NumericFamily =>
          f.dataType match {
            case d: org.apache.spark.sql.types.DecimalType =>
              Some(d.precision.toLong)
            case org.apache.spark.sql.types.DoubleType |
                 org.apache.spark.sql.types.FloatType => Some(17L)
            case _ => Some(38L) // integer types map to NUMBER(38,0)
          }
        case TypeMapper.TemporalFamily =>
          f.dataType match {
            case org.apache.spark.sql.types.DateType => Some(0L)
            case _ => Some(6L) // timestamps are µs-precision on Spark
          }
        case _ => None
      }
      (tableName.toUpperCase, f.name.toUpperCase, engineType,
        if (f.nullable) "YES" else "NO", lenPrec, (i + 1).toLong)
    }.toDF("table_name", "column_name", "data_type", "is_nullable",
      "character_maximum_length", "ordinal_position")
  }

  /** Catalog scan for a corpus table, ordered by ordinal like the
    * reference (`Data_Quality_Table.sql:53`).
    */
  def tableColumns(spark: SparkSession, dir: String,
      table: String): DataFrame =
    columnsFrame(spark, Tables.load(spark, dir, table), table)
      .orderBy("ordinal_position")
}
