package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding aggregation for training-data pipelines: per-group centroids
  * (mean pooling) — the building block for cluster summaries, IVF coarse
  * quantizers, and class prototypes over an embedding column.
  *
  * Scale design: `posexplode` unrolls each vector into (group, dim, value)
  * rows that partial-aggregate map-side, so the shuffle carries at most
  * `groups × dim` partial sums per task — independent of corpus row count.
  * At 100 TB this is the canonical two-phase mean; no vector ever needs to
  * be collected or broadcast.
  *
  * The reference has no vector surface; this extends the profiling family
  * (SURVEY §2d) per the training-data mandate.
  */
object EmbeddingAgg {

  /** Per-`groupCol` centroid, one row per (group, dim): `dim` is 1-based,
    * `centroid_v` the mean of that dimension, `n_vecs` the group's
    * vector count.
    *
    * The mean is ONE IEEE division of an exact DECIMAL(38,12) sum — not
    * a running double average: double sums accumulate in partition order,
    * so the low bits would vary run-to-run, and a mean landing within an
    * ulp of a rounding boundary could flip a downstream rounded digit
    * nondeterministically (a flaky oracle compare, found in round-4
    * advice). The decimal sum is partition-order-independent; the 1e-12
    * quantization is far below any embedding's float precision.
    */
  def centroids(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.select(col(groupCol),
        posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col(groupCol), (col("__pos") + 1).cast("long").as("dim"))
      .agg(sum(col("__v").cast("double").cast("decimal(38,12)")).as("__s"),
        count(lit(1)).as("n_vecs"))
      .select(col(groupCol), col("dim"),
        (col("__s").cast("double") / col("n_vecs")).as("centroid_v"),
        col("n_vecs"))
}
