package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns — the
  * dimensionality-reduction leg of the ANN toolbox (alongside int8
  * quantization, [[Quantize]]: quantization shrinks each coordinate,
  * projection shrinks HOW MANY there are). A k-dim Rademacher (±1)
  * projection preserves pairwise geometry to O(√(log n / k)) distortion
  * (Achlioptas 2003 — database-friendly random projections), so a
  * 64→16 projection cuts every downstream cosine to a quarter of the
  * FLOPs and memory while approximately preserving neighbor rank.
  *
  * Determinism contract (the hash-oracle story shared with the LSH
  * hyperplanes, [[Similarity.planeValues]]): the sign matrix is seeded
  * driver-side and embedded as LITERAL arrays, projections are the
  * native sequential-fold [[Similarity.dot]] against those literals
  * (±1.0 multiplies are IEEE-exact) scaled by one double constant —
  * DuckDB replays the identical fold via `list_dot_product`, so
  * projected values, coarse ranks and re-ranked results all
  * hash-compare bit-identically.
  *
  * Scale shape: projection is a stateless per-row map over literal
  * constants — ZERO shuffle, zero joins, no fitted state to version
  * (unlike IVF centroids there is nothing to train). The two-stage
  * [[topKProjected]] scans only k-dim vectors in its corpus-sized
  * coarse stage and touches full-width vectors for n_queries·coarseK
  * candidate rows only.
  */
object Projection {

  /** Deterministic ±1 sign matrix, row j = output dimension j. Seeded
    * per (seed, j) so widening k appends rows without changing existing
    * projections.
    */
  def signMatrix(k: Int, dims: Int, seed: Int = 17): Seq[Seq[Double]] =
    (0 until k).map { j =>
      val rng = new scala.util.Random(seed.toLong * 1000003L + j * 7919L)
      Seq.fill(dims)(if (rng.nextBoolean()) 1.0 else -1.0)
    }

  /** 1/√k — the JL scale constant. One correctly-rounded IEEE sqrt +
    * division, identical across engines (and exact 0.25 at k = 16).
    */
  def scale(k: Int): Double = 1.0 / math.sqrt(k.toDouble)

  private def rowLit(row: Seq[Double]): Column = array(row.map(lit): _*)

  /** Projects an `array<double>` column to `array<double>` of length k:
    * element j = scale(k) · (vec · signRow_j).
    */
  def projectCol(vec: Column, k: Int, dims: Int, seed: Int = 17): Column = {
    val s = scale(k)
    array(signMatrix(k, dims, seed).map { row =>
      Similarity.dot(vec, rowLit(row)) * s
    }: _*)
  }

  /** `(idCol, proj)` — the projected corpus. `vecCol` may be
    * `array<float>`; it is widened once behind a projection boundary.
    */
  def project(df: DataFrame, idCol: String, vecCol: String, k: Int,
      dims: Int, seed: Int = 17): DataFrame =
    df.select(col(idCol), transform(col(vecCol), _.cast("double"))
        .as("__v"))
      .select(col(idCol), projectCol(col("__v"), k, dims, seed).as("proj"))

  /** Two-stage ANN through the projection: coarse top-`coarseK` by
    * cosine in the k-dim projected space (quarter-width corpus scan),
    * then EXACT cosine re-rank of only those candidates in the original
    * space.
    *
    * Honest operating envelope (pinned by ProjectionSpec, the
    * [[Similarity]] honesty pattern): in the θ ≤ 30° planted-cluster
    * regime curation ANN runs in, recall@10 ≥ 0.9 at coarseK = 32; on
    * the adversarial near-isotropic fixture (θ ≈ 60–70° neighbors —
    * a ~0.1 cosine gap under ~0.19 mean JL error at k = 16) it
    * measures ≈ 0.26, and the fix there is coarseK (exactness in the
    * limit coarseK → n−1 is spec-pinned), more projected dims, or the
    * exact/LSH lanes. Queries are broadcast both times; the full-width corpus is
    * touched once at scan (to project — in a deployed pipeline the
    * projected table is materialized and this leg disappears) and once
    * as a semi-join fetch of candidate rows. Output matches
    * [[Similarity.bruteForceTopK]]: `(query_id, neighbor_id, cosine,
    * rank)`.
    */
  def topKProjected(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, coarseK: Int, dims: Int,
      projDims: Int = 16, seed: Int = 17): DataFrame = {
    require(coarseK >= k, s"coarseK $coarseK must be >= k $k")
    def prep(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
          transform(col(vecCol), _.cast("double")).as(s"__v_$id"))
        .withColumn(s"__p_$id",
          projectCol(col(s"__v_$id"), projDims, dims, seed))
    val c = prep(corpus, "neighbor_id")
    val q = prep(queries, "query_id")
    // coarse stage reads ONLY projected vectors (k-dim scan)
    val coarse = c.select(col("neighbor_id"), col("__p_neighbor_id"))
      .crossJoin(broadcast(
        q.select(col("query_id"), col("__p_query_id"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__p_query_id"), col("__p_neighbor_id"))
          .as("__proj_cos"))
    val wCoarse = Window.partitionBy("query_id")
      .orderBy(col("__proj_cos").desc, col("neighbor_id"))
    val candidates = coarse
      .withColumn("__crank", row_number().over(wCoarse))
      .filter(col("__crank") <= coarseK)
      .select("query_id", "neighbor_id")
    // re-rank: full-width vectors for candidate rows only
    val rescored = candidates
      .join(c.select(col("neighbor_id"), col("__v_neighbor_id")),
        "neighbor_id")
      .join(broadcast(q.select(col("query_id"), col("__v_query_id"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__v_query_id"), col("__v_neighbor_id"))
          .as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
