package graft.sim

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.io.Tables

/** Registered similarity-search queries over `embeddings`.
  *
  * The brute-force top-k is DuckDB-oracled EXACTLY: both engines cast
  * float→double and fold the dot product in sequential array order, so the
  * IEEE results are bit-identical (verified empirically; no rounding
  * needed). The LSH path has no SQL equivalent (hash-derived hyperplanes)
  * and registers rows-only, with recall pinned against brute force in
  * SimilaritySpec.
  */
object SimilarityQueries extends QueryPack {

  val K = 10
  val QueryIds = 10 // vec_id < 10 form the query set

  private val cosineSql =
    "CASE WHEN sqrt(list_dot_product(q.v, q.v)) * " +
      "sqrt(list_dot_product(c.v, c.v)) = 0 THEN 0.0 " +
      "ELSE list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v))" +
      " * sqrt(list_dot_product(c.v, c.v))) END"

  private def bruteQuery = QueryDef(
    "sim_topk_bruteforce",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < QueryIds), "vec_id", "embedding", K)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < $QueryIds),
         |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  $cosineSql AS cosine FROM e c, q WHERE c.vec_id <> q.vec_id)
         |SELECT query_id, rn AS rank, neighbor_id, cosine FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rn FROM s)
         |WHERE rn <= $K ORDER BY query_id, rank""".stripMargin
        .replace("\n", " ")))

  private def lshQuery = QueryDef(
    "sim_topk_lsh",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      // footer-statistics sizing: no count job before the real work
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < QueryIds),
          "vec_id", "embedding", K,
          corpusSize = Some(Tables.rowCount(s, dir, "embeddings")))
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    },
    None)

  val GraphK = 5

  /** Exact k-NN graph (top-k neighbours for EVERY corpus row) — the
    * deliberately-quadratic baseline the LSH graph is measured against:
    * Θ(n²) cosines plus an n²-row ranking shuffle.
    */
  private def knnBruteQuery = QueryDef(
    "sim_knn_graph_brute",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", GraphK)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  $cosineSql AS cosine FROM e c, e q WHERE c.vec_id <> q.vec_id)
         |SELECT query_id, rn AS rank, neighbor_id, cosine FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rn FROM s)
         |WHERE rn <= $GraphK ORDER BY query_id, rank""".stripMargin
        .replace("\n", " ")))

  /** Approximate k-NN graph via the multi-probed, corpus-scaled LSH
    * index — the batch shape where the index amortizes (O(n) candidates
    * vs the brute graph's Θ(n²); recall vs the exact graph pinned in
    * SimilaritySpec).
    */
  private def knnLshQuery = QueryDef(
    "sim_knn_graph_lsh",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.lshKnnGraph(emb, "vec_id", "embedding", GraphK,
          corpusSize = Some(Tables.rowCount(s, dir, "embeddings")))
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    },
    None)

  /** IVF-probed approximate top-k (rows-only: KMeans centroids have no
    * SQL equivalent; recall pinned against brute force in SimilaritySpec).
    */
  private def ivfQuery = QueryDef(
    "sim_topk_ivf",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      IvfSimilarity.topK(emb, emb.filter(col("vec_id") < QueryIds),
          "vec_id", "embedding", K,
          corpusSize = Some(Tables.rowCount(s, dir, "embeddings")))
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    },
    None)

  /** Per-label centroids (mean-pooled embeddings, [[EmbeddingAgg]]) —
    * oracled exactly: both engines sum the widened doubles as
    * DECIMAL(38,12) (partition-order-independent) and take ONE IEEE
    * division, so the mean is bit-stable and no rounding has to absorb
    * accumulation drift. round(…,4) is kept only as presentation.
    */
  private def centroidQuery = QueryDef(
    "emb_centroid_label",
    (s, dir) => EmbeddingAgg.centroids(
        Tables.load(s, dir, "embeddings"), "label", "embedding")
      .select(col("label"), col("dim"),
        round(col("centroid_v"), 4).as("centroid_v"), col("n_vecs"))
      .orderBy("label", "dim"),
    Some("SELECT label, dim, " +
      "round(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,12))) " +
      "AS DOUBLE) / count(*), 4) AS centroid_v, count(*) AS n_vecs " +
      "FROM (SELECT label, unnest(embedding) AS v, " +
      "generate_subscripts(embedding, 1) AS dim FROM embeddings) " +
      "GROUP BY label, dim ORDER BY label, dim"))

  override def queries: Seq[QueryDef] =
    Seq(bruteQuery, lshQuery, ivfQuery, knnBruteQuery, knnLshQuery,
      centroidQuery)
}
