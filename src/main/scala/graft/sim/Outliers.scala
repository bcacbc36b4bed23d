package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Intra-cluster outlier detection over embeddings: the k LEAST-CENTRAL
  * members of each group by cosine to the group's mean centroid — the
  * prototypicality filter a curation pipeline runs after clustering
  * (SemDeDup prunes the REDUNDANT core; this surfaces the stragglers a
  * quality pass reviews or drops). Reference scope: the engine's
  * embedding-curation family (near-dup, SemDeDup, decontamination);
  * this is the centrality-ranking member.
  *
  * Determinism (the [[EmbeddingAgg]] contract): the centroid is an
  * exact DECIMAL(38,12) per-dimension sum with ONE IEEE division; every
  * per-dimension product (member·centroid, member·member,
  * centroid·centroid) is a deterministic double rounded once to
  * DECIMAL(38,12), so the sums are partition-order-independent and the
  * final cosine is a fixed chain of IEEE ops — a SQL engine replays it
  * bit-for-bit. Ranking ties break on id.
  *
  * Scale shape: one explode (map-side) feeds BOTH aggregations — the
  * centroid shuffle is bounded by groups × dim, the member-cosine
  * shuffle by members — then one window partitioned by group ranks the
  * report. No pairwise stage anywhere: cost is linear in corpus size,
  * unlike the O(cluster²) pair scan it complements.
  */
object Outliers {

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast("decimal(38,12)")

  /** `(group, rank, id, cosine)` — the `k` members of each group least
    * similar to the group's mean-pooled centroid, rank 1 = least
    * central; ties on cosine break by ascending id.
    */
  def leastCentral(df: DataFrame, groupCol: String, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val dims = df.select(col(groupCol).as("__g"), col(idCol).as("__id"),
      posexplode(col(vecCol)).as(Seq("__d", "__vr")))
      .select(col("__g"), col("__id"), col("__d"),
        col("__vr").cast("double").as("__v"))
    val cent = dims.groupBy(col("__g"), col("__d"))
      .agg((sum(dec(col("__v"))).cast("double") /
        count(lit(1))).as("__c"))
    val scores = dims.join(cent, Seq("__g", "__d"))
      .groupBy(col("__g"), col("__id"))
      .agg(sum(dec(col("__v") * col("__c"))).cast("double").as("__dot"),
        sum(dec(col("__v") * col("__v"))).cast("double").as("__nv"),
        sum(dec(col("__c") * col("__c"))).cast("double").as("__nc"))
      .select(col("__g"), col("__id"),
        when(sqrt(col("__nv")) * sqrt(col("__nc")) === 0.0, 0.0)
          .otherwise(col("__dot") /
            (sqrt(col("__nv")) * sqrt(col("__nc")))).as("cosine"))
    // rank as long — the Similarity convention (matches the BIGINT the
    // SQL oracle's row_number produces)
    scores.withColumn("rank", row_number().over(
        Window.partitionBy(col("__g"))
          .orderBy(col("cosine").asc, col("__id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__g").as(groupCol), col("rank"),
        col("__id").as(idCol), col("cosine"))
  }
}
