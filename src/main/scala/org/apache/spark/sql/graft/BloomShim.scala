package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column wrappers for Spark's internal Bloom-filter expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` power Spark's own
  * runtime row-level join filtering but are not registered in the public
  * FunctionRegistry; like [[ColumnShim]], this bridge lives in the
  * `org.apache.spark.sql` package scope purely for visibility. Both are
  * codegen'd (`doGenCode`) — no UDF in the probe path.
  */
object BloomShim {

  /** Aggregate: serialized Bloom filter (binary) over a LongType child
    * (pass `xxhash64(key)`), sized by (estimatedItems, numBits).
    */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnShim.column(
      new BloomFilterAggregate(ColumnShim.expression(hashed),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Predicate: membership probe of a LongType hash against a serialized
    * filter carried as a binary literal (the same constant-filter shape
    * Spark's runtime filtering injects).
    */
  def mightContain(bloom: Array[Byte], hashed: Column): Column =
    ColumnShim.column(
      new BloomFilterMightContain(Literal(bloom, BinaryType),
        ColumnShim.expression(hashed)))
}
