package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbours — the second scale
  * path beside sign-LSH ([[Similarity.lshTopK]]).
  *
  * Build: L2-normalize vectors (cosine ordering == euclidean ordering on
  * the unit sphere), train a KMeans coarse quantizer (`nlist` centroids,
  * fixed seed), assign every corpus vector to its centroid's inverted
  * list. Query: score the `nlist` centroids per query with the codegen'd
  * dot product, probe the `nprobe` best lists via an equi-join on
  * `list_id`, exact-cosine only the candidates, window top-k.
  *
  * Scale shape: training samples the corpus (KMeans| on a fraction),
  * assignment is one scan, the probe join is a shuffle on a small int
  * key whose fan-out is corpus/nlist · nprobe per query — never
  * corpus × queries.
  */
object IvfSimilarity {

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  private def normalize(c: Column): Column = {
    val n = sqrt(Similarity.dot(c, c))
    when(n === 0.0, c).otherwise(transform(c, x => x / n))
  }

  final case class IvfModel(centroids: Array[Array[Double]],
      assigned: DataFrame)

  /** Train the quantizer and build the inverted lists.
    * `assigned` = (idCol, list_id, __nv normalized vector), persisted —
    * it is the ANN index.
    */
  def build(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L): IvfModel = {
    val normed = df.select(col(idCol),
      normalize(asDouble(col(vecCol))).as("__nv"))
    val withVec = normed.withColumn("__mlv", array_to_vector(col("__nv")))
    // A coarse quantizer only partitions space — convergence precision
    // buys nothing for ANN recall, so cap the iterations (default 20
    // tripled the build cost for identical recall on the fixtures) AND
    // the training set: centroid quality needs a few hundred vectors per
    // list, not the corpus, so at scale the fit reads a bounded sample
    // (deterministic seed) while assignment still scans everything once.
    val targetTrain = 512L * nlist
    val total = withVec.count()
    val train =
      if (total > targetTrain)
        withVec.sample(withReplacement = false,
          targetTrain.toDouble / total, seed)
      else withVec
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("__mlv").setPredictionCol("list_id")
      .fit(train)
    val assigned = model.transform(withVec)
      .select(col(idCol), col("list_id"), col("__nv"))
      .persist()
    IvfModel(model.clusterCenters.map(_.toArray), assigned)
  }

  /** list ids of the `nprobe` centroids nearest to `vec` (normalized),
    * as an array column: score all centroids with the native dot, rank
    * with a sort over (score, id) structs — no shuffle, constant work
    * per row.
    */
  private def probeLists(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit(_)).toIndexedSeq: _*)
      struct((-Similarity.dot(vec, cLit)).as("neg"), lit(i).as("idx"))
    }.toIndexedSeq: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("idx"))
  }

  /** Approximate top-k of `queries` against `corpus`. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val model = build(corpus, idCol, vecCol, nlist, seed)
    val q = queries.select(col(idCol).as("query_id"),
        normalize(asDouble(col(vecCol))).as("__qv"))
      .withColumn("list_id",
        explode(probeLists(col("__qv"), model.centroids, nprobe)))
    val cands = q.join(
      model.assigned.select(col(idCol).as("neighbor_id"),
        col("list_id"), col("__nv")),
      Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      Similarity.cosine(col("__qv"), col("__nv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
