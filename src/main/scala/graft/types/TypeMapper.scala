package graft.types

import org.apache.spark.sql.types._

/** Engine type names and their mapping to/from Spark [[DataType]]s.
  *
  * The reference infers engine types from pandas dtypes
  * (`/root/reference/Data_Discovery_File.sql:27-53`) and classifies catalog
  * types into families for profiling
  * (`/root/reference/Data_Quality_Table.sql:43-49,89`). Here the same mapping
  * is expressed over Spark's [[DataType]] lattice, which is the schema source
  * of truth once data is read by a Spark source.
  */
object TypeMapper {

  /** Engine type name for a Spark type.
    * Truth table: `/root/reference/Data_Discovery_File.sql:27-53`.
    */
  def toEngineType(dt: DataType): String = dt match {
    case StringType | _: VarcharType | _: CharType => "VARCHAR"
    case ByteType | ShortType | IntegerType | LongType => "NUMBER"
    case d: DecimalType if d.scale == 0 => "NUMBER"
    case FloatType | DoubleType | _: DecimalType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType | DateType => "TIMESTAMP"
    // VARIANT fallback (`Data_Discovery_File.sql:51-53`): anything the
    // engine can't classify is carried as JSON text.
    case _ => "VARIANT"
  }

  /** Type family used to pick profiling stats for a column.
    * Truth: `/root/reference/Data_Quality_Table.sql:43-49,89,147`.
    */
  sealed trait Family
  case object NumericFamily extends Family
  case object StringFamily extends Family
  case object TemporalFamily extends Family
  case object OtherFamily extends Family

  def familyOf(dt: DataType): Family = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | _: DecimalType => NumericFamily
    case StringType | _: VarcharType | _: CharType => StringFamily
    case DateType | TimestampType | TimestampNTZType => TemporalFamily
    case _ => OtherFamily
  }

  /** Catalog-name classification, mirroring the ILIKE dispatch on
    * `INFORMATION_SCHEMA.COLUMNS.DATA_TYPE`
    * (`/root/reference/Data_Quality_Table.sql:44-49,89`).
    */
  def familyOfEngineName(name: String): Family = {
    val u = name.toUpperCase
    if (Seq("NUMBER", "DECIMAL", "FLOAT", "INT", "DOUBLE").exists(u.contains))
      NumericFamily
    else if (u.contains("CHAR") || u.contains("TEXT") || u.contains("VARCHAR"))
      StringFamily
    else if (u.contains("DATE") || u.contains("TIME")) TemporalFamily
    else OtherFamily
  }
}
