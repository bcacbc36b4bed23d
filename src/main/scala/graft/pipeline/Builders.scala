package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generated-pipeline constructors: the join and aggregation shapes the
  * reference's code generator emits and executes
  * (`/root/reference/CODE_GENERATOR.sql:61-73` join_query, `:75-87`
  * aggregation incl. monthly summaries).
  *
  * Scale notes: dimension inputs marked small are broadcast (hash join
  * with no shuffle of the fact side); Catalyst/AQE picks sort-merge with
  * skew handling otherwise. Money aggregates go through DECIMAL so sums
  * are exact and order-independent — float sums depend on partition order
  * and can't be reproduced across engines bit-for-bit.
  */
object Builders {

  /** J1: left-deep multi-table equi-join. Each dim is (df, joinKeys,
    * broadcastHint); broadcast dims skip shuffling the accumulated fact.
    */
  def join(fact: DataFrame,
      dims: Seq[(DataFrame, Seq[String], Boolean)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, keys, small)) =>
      acc.join(if (small) broadcast(dim) else dim, keys)
    }

  /** A13: GROUP BY aggregation with named metric expressions. */
  def aggregate(df: DataFrame, groupCols: Seq[Column],
      metrics: Seq[Column]): DataFrame =
    df.groupBy(groupCols: _*).agg(metrics.head, metrics.tail: _*)

  /** Monthly summary: truncate to month, then aggregate
    * (`CODE_GENERATOR.sql:75-87` "monthly summaries").
    */
  def monthlySummary(df: DataFrame, dateCol: String,
      metrics: Seq[Column]): DataFrame =
    aggregate(
      df.withColumn("month", date_trunc("month", col(dateCol)).cast("date")),
      Seq(col("month")), metrics)

  /** Exact money sum: cast to DECIMAL(18,2) per row first — decimal
    * addition is associative, so the result is independent of partition
    * order (unlike double sums).
    */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,2)"))
}
