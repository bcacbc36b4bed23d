package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic core pruning (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic
  * deduplication" — public arXiv work): cluster the embedding corpus,
  * then compare members PAIRWISE ONLY WITHIN THEIR CLUSTER and drop
  * every member that has a semantically-duplicate partner ranked
  * before it. Completes the curation loop with [[Kmeans]] and
  * [[Outliers]]: cluster → prune the redundant core (here) → rank the
  * straggler tail.
  *
  * Scale shape — the paper's own argument, kept explicit: the
  * quadratic step is per-CLUSTER, so with cluster occupancy held at a
  * target (k grows with n), within-cluster pairs stay
  * O(n · occupancy), never O(n²). The cluster equi-join shuffles on
  * `label` (an int), the pair cosine is one codegen'd dot per pair,
  * and the drop decision is one window per member.
  *
  * Keep rule (deterministic, both engines replay it): a member is
  * DROPPED when some same-cluster partner has pairwise cosine ≥ τ AND
  * precedes it under (d² to centroid ASC, id ASC) — i.e. each
  * duplicate set keeps its most-prototypical member, ties by id. Of a
  * dropped member's preceding duplicates, `dup_of` names the
  * (cosine DESC, id ASC) first.
  */
object SemDedup {

  /** Target within-cluster occupancy: k = max(8, ceil(n / occupancy)).
    * 100 keeps the per-cluster pair fan-out ≈ 10⁴ — the SemDeDup
    * bounded-pairwise budget.
    */
  val TargetOccupancy = 100

  def clusterCount(n: Long): Int =
    math.max(8, math.ceil(n.toDouble / TargetOccupancy).toInt)

  /** The composed operator at ANY corpus size: k = [[clusterCount]](n)
    * trained via [[Kmeans.fitAuto]] (driver Lloyd's under the
    * [[IvfSimilarity.DriverTrainThreshold]] bound, Spark ML above it —
    * the occupancy rule outgrows the driver trainer past ~6,400 rows),
    * then [[prune]]; assignment inside prune switches from literal-
    * argmin to the broadcast centroid join above
    * [[IvfSimilarity.JoinProbeThreshold]] centroids, so the plan stays
    * constant-size however far k grows.
    */
  def run(df: DataFrame, idCol: String, vecCol: String, tau: Double,
      iters: Int = 10, seed: Long = 42L,
      totalRows: Option[Long] = None): DataFrame = {
    val n = totalRows.getOrElse(df.count())
    val cents = Kmeans.fitAuto(df, vecCol, clusterCount(n), iters,
      seed, totalRows = Some(n))
    prune(df, idCol, vecCol, cents, tau)
  }

  /** `(idCol, label, kept, dup_of, dup_cos)` for every corpus row —
    * `kept = false` rows carry their best preceding duplicate.
    * `centroids` come from [[Kmeans.fit]] (live) or a pinned table
    * (oracle replay).
    */
  def prune(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], tau: Double): DataFrame = {
    val assigned = Kmeans
      .assignWithVec(df, idCol, vecCol, centroids)
      .localCheckpoint(true) // both sides of the within-cluster join
    val a = assigned.select(col("label"), col(idCol).as("__ida"),
      col("d2").as("__d2a"), col("__nv").as("__nva"))
    val b = assigned.select(col("label"), col(idCol).as("__idb"),
      col("d2").as("__d2b"), col("__nv").as("__nvb"))
    val prec = (col("__d2b") < col("__d2a")) ||
      (col("__d2b") === col("__d2a") && col("__idb") < col("__ida"))
    val dups = a.join(b, Seq("label"))
      .filter(col("__ida") =!= col("__idb") && prec)
      .withColumn("__cos", Similarity.dot(col("__nva"), col("__nvb")))
      .filter(col("__cos") >= tau)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__ida"))
      .orderBy(col("__cos").desc, col("__idb").asc)
    val best = dups
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__ida").as(idCol), col("__idb").as("dup_of"),
        col("__cos").as("dup_cos"))
    assigned.select(col(idCol), col("label"))
      .join(best, Seq(idCol), "left")
      .select(col(idCol), col("label"),
        col("dup_of").isNull.as("kept"), col("dup_of"), col("dup_cos"))
  }
}
