package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space drift monitor — the snapshot-over-snapshot health
  * check an embedding pipeline runs after re-ingesting or re-encoding
  * a corpus (new crawl, new encoder version): per label it compares
  * membership MASS (share shift — the [[graft.dq]] distribution-drift
  * move applied to labels) and centroid DIRECTION (cosine between the
  * two snapshots' mean vectors — encoder or population drift that
  * count distributions cannot see).
  *
  * Determinism (the `emb_centroid_label` / `emb_outliers_label`
  * recipe): centroids are exact DECIMAL(38,12) sums with one IEEE
  * division per (label, dim); every cross-snapshot product rounds once
  * to DECIMAL(38,12) before the order-independent per-label sum, and
  * the final cosine/share arithmetic is plain IEEE — every number
  * replays bit-for-bit on any SQL engine.
  *
  * Scale shape: two grouped aggregations (label·dim grain — bounded by
  * label count × dimension, never corpus-sized after the first
  * combine), one label·dim join, one label-grain roll-up. A label
  * absent from one snapshot keeps its row (counts coalesce to 0,
  * cosine NULL — the loud signal, never a silent drop).
  */
object EmbeddingDrift {

  /** `(labelCol, n_a, n_b, share_a, share_b, share_shift,
    * centroid_cos)` — one row per label present in either snapshot.
    */
  def compare(a: DataFrame, b: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val ca = EmbeddingAgg.centroids(a, labelCol, vecCol)
      .select(col(labelCol), col("dim"), col("centroid_v").as("__ca"),
        col("n_vecs").as("__na"))
    val cb = EmbeddingAgg.centroids(b, labelCol, vecCol)
      .select(col(labelCol), col("dim"), col("centroid_v").as("__cb"),
        col("n_vecs").as("__nb"))
    val per = ca.join(cb, Seq(labelCol, "dim"), "full")
      .groupBy(col(labelCol)).agg(
        coalesce(max(col("__na")), lit(0L)).as("n_a"),
        coalesce(max(col("__nb")), lit(0L)).as("n_b"),
        sum((col("__ca") * col("__cb")).cast("decimal(38,12)"))
          .as("__dot"),
        sum((col("__ca") * col("__ca")).cast("decimal(38,12)"))
          .as("__a2"),
        sum((col("__cb") * col("__cb")).cast("decimal(38,12)"))
          .as("__b2"))
    val tot = per.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb"))
    per.crossJoin(broadcast(tot))
      .select(col(labelCol),
        col("n_a"), col("n_b"),
        (col("n_a").cast("double") / greatest(col("__ta"), lit(1L)))
          .as("share_a"),
        (col("n_b").cast("double") / greatest(col("__tb"), lit(1L)))
          .as("share_b"),
        abs(col("n_a").cast("double") / greatest(col("__ta"), lit(1L)) -
          col("n_b").cast("double") / greatest(col("__tb"), lit(1L)))
          .as("share_shift"),
        (col("__dot").cast("double") /
          (sqrt(col("__a2").cast("double")) *
            sqrt(col("__b2").cast("double")))).as("centroid_cos"))
  }
}
