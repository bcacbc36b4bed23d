package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins and aggregations — the explicit fallback
  * when AQE's runtime skew splitting isn't enough (e.g. one key holding
  * >1 executor's worth of rows, or a deterministic-partitioning
  * requirement that disables AQE).
  *
  * Shapes:
  *   - [[saltedJoin]]: the skewed (big) side gets a random salt in
  *     [0, buckets); the small side is exploded ×buckets so every
  *     (key, salt) bucket finds its match. Join key becomes (key, salt) —
  *     a skewed key's rows spread over `buckets` tasks. Inner/left joins
  *     only (salting the null-producing side of an outer join would
  *     duplicate unmatched rows).
  *   - [[saltedAggregate]]: two-level aggregation — partial by
  *     (key, salt), final by key. For algebraic aggregates Catalyst's
  *     partial aggregation already does this map-side; use this form when
  *     the partial itself needs a shuffle (e.g. exact distinct per key).
  */
object Salting {

  def withSalt(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))

  /** Explode the SMALL side once per salt bucket. */
  def replicated(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salting supports inner/left joins, not $joinType")
    // SHUFFLE_HASH hint: callers reach for saltedJoin exactly when the
    // other side is too big to broadcast — but at test scale Catalyst
    // would broadcast it anyway, silently turning the operator into a
    // no-op whose (key, salt) spreading never exercises. The hint pins
    // the shuffle-join shape the operator exists for (a broadcastable
    // side needs no salting — use a plain join).
    withSalt(big, buckets)
      .join(replicated(small, buckets).hint("SHUFFLE_HASH"),
        keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Two-level COUNT(DISTINCT valueCol) per key: exact, skew-spread,
    * bounded buffers. The salt is the VALUE's hash, not a random draw:
    * each distinct value then lands in exactly one (key, salt) bucket,
    * so the per-bucket exact distinct counts SUM to the answer — no
    * collected value arrays anywhere, and a hot key's distinct state
    * spreads over `buckets` aggregation groups at both levels. (A random
    * salt would scatter copies of one value across buckets, forcing a
    * set-union merge whose final buffer holds every distinct value of
    * the hot key — the exact memory hazard salting exists to avoid.)
    */
  def saltedDistinctCount(df: DataFrame, key: String,
      valueCol: String, buckets: Int): DataFrame =
    df.groupBy(col(key),
        pmod(xxhash64(col(valueCol)), lit(buckets.toLong)).as("__salt"))
      .agg(countDistinct(col(valueCol)).as("__d"))
      .groupBy(col(key))
      .agg(sum("__d").cast("long").as("distinct_count"))

  /** Generic two-level aggregate: partial over (key, salt), final over
    * key. Caller supplies both levels (they must compose, e.g.
    * sum → sum, count → sum).
    */
  def saltedAggregate(df: DataFrame, key: String, buckets: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    withSalt(df, buckets)
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
}
