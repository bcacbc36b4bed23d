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
    * `centroid_v` the mean of that dimension (float→double before
    * summation), `n_vecs` the group's vector count.
    */
  def centroids(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.select(col(groupCol),
        posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col(groupCol), (col("__pos") + 1).cast("long").as("dim"))
      .agg(avg(col("__v").cast("double")).as("centroid_v"),
        count(lit(1)).as("n_vecs"))
}
