package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable capability: a Spark query over a scale-factor directory
  * plus (when SQL-expressible) an equivalent DuckDB oracle statement over
  * the same parquet tables. The driver hash-compares the two (BASELINE.md).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[QueryDef]
}
