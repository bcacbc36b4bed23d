package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution end to end — the MDM "golden record" pipeline
  * composed from operators this engine already proves separately:
  * [[FuzzyJoin]] finds same-entity record pairs by bounded edit
  * distance (deletion-neighborhood blocking, never all-pairs),
  * [[graft.graph.Components]] closes them transitively into entity
  * clusters (min-label + pointer jumping), and a single hash
  * aggregation merges each cluster into one golden row under
  * deterministic survivorship rules.
  *
  * Survivorship is deliberately expressed as plain `min`/`max`
  * aggregates: SQL aggregates skip NULLs, so `max(col)` IS the
  * "prefer a non-null value, break ties high" rule (and `min` its low
  * twin) — deterministic, order-independent, map-side combinable, and
  * replayed verbatim by the oracle. Richer rules (latest-by-timestamp,
  * longest-string) are the same shape with a `struct` sort key.
  *
  * Scale: the match stage is FuzzyJoin's signature-blocked join; the
  * cluster stage runs over the PAIR graph (match-cardinality, not
  * corpus-cardinality); the merge is one aggregation of the records
  * frame keyed by cluster. Unmatched records pass through as their own
  * cluster (left join + coalesce — no row is lost).
  */
object GoldenRecord {

  /** One golden row per entity cluster: `(cluster_name, n_members,
    * golden_id, <rule columns>)`. `rules` maps column name →
    * "min" | "max" survivorship.
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      maxDist: Int, rounds: Int,
      rules: Seq[(String, String)]): DataFrame = {
    val pairs = FuzzyJoin.selfMatch(records, nameCol, maxDist)
      .select(col("name_a").as("src"), col("name_b").as("dst"))
    val lbls = graft.graph.Components.labels(pairs, rounds)
    val clustered = records
      .join(lbls, records(nameCol) === lbls("node"), "left")
      .withColumn("cluster_name", coalesce(col("lbl"), col(nameCol)))
    val survivors = rules.map {
      case (c, "min") => min(col(c)).as(c)
      case (c, "max") => max(col(c)).as(c)
      case (c, rule) =>
        throw new IllegalArgumentException(
          s"unknown survivorship rule '$rule' for column $c")
    }
    clustered.groupBy(col("cluster_name"))
      .agg(count(lit(1)).as("n_members"),
        (min(col(idCol)).as("golden_id") +: survivors): _*)
  }
}
