package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — "which interval(s) does each event
  * fall into" — without the plan Spark gives a raw inequality join: a
  * BroadcastNestedLoop/cartesian that evaluates every point against
  * every interval (the same Θ(n·m) cliff the brute kNN foil labels).
  * The classic fix, bucketization: an interval [lo, hi) registers in
  * every fixed-width time bucket it touches (a map-side
  * sequence+explode, bounded by interval length ÷ width), points key
  * into exactly ONE bucket, and the join becomes a plain shuffled
  * EQUI-join on (keys..., bucket) with the true containment check as a
  * post-join residual filter. Width is the replication dial: width ≈
  * typical interval length ⇒ ~2 replicas per interval and a candidate
  * set that is the bucket's co-resident points, never the corpus.
  *
  * Join keys co-partition both sides, so the only data movement is the
  * one keyed exchange either side of a hash join — at 100 TB the same
  * shape as any fact-to-dim equi-join, and AQE's skew split applies to
  * hot buckets exactly as to hot keys.
  *
  * Determinism: bucket indices are integer µs division; containment is
  * `lo <= t < hi` on exact µs longs — no floats anywhere.
  */
object RangeJoin {

  /** Inner-join `points` (with µs timestamp `tCol`) to `intervals`
    * (with µs bounds `[loCol, hiCol)`), equi-matching `keyCols` and
    * containment. Output: point columns + the interval's columns
    * (minus its key copies).
    *
    * `widthUs` must be positive; intervals where `hi <= lo` match
    * nothing (empty interval — dropped by the residual, never an
    * error).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], tCol: String, loCol: String, hiCol: String,
      widthUs: Long): DataFrame = {
    require(widthUs > 0, "bucket width must be positive")
    // integer DIV, not float division: epoch-µs magnitudes lose ulps in
    // a double and a boundary point would bucket off-by-one. Positive
    // epochs assumed (the Retention rule — DIV truncates toward zero).
    // hi is exclusive: the last touched bucket is the one containing
    // hi − 1, so a boundary-aligned interval does not replicate into a
    // bucket it cannot match
    // empty intervals drop BEFORE the explode: Spark's sequence(a, b)
    // with a > b counts DOWNWARD, which would replicate an empty
    // interval into buckets the residual then has to discard
    val iv = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bucket",
        explode(sequence(expr(s"$loCol DIV ${widthUs}L"),
          expr(s"($hiCol - 1) DIV ${widthUs}L"))))
    val pt = points.withColumn("__bucket", expr(s"$tCol DIV ${widthUs}L"))
    pt.join(iv, keyCols :+ "__bucket")
      .filter(col(loCol) <= col(tCol) && col(tCol) < col(hiCol))
      .drop("__bucket")
  }
}
