package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the training-data-pipeline mandate:
  *   - [[bruteForceTopK]]: exact cosine top-k of a (small) query set
  *     against the corpus. The query side is broadcast — the "join" is a
  *     broadcast nested loop scan of the corpus, linear in corpus size,
  *     never corpus×corpus.
  *   - [[lshTopK]]: random-hyperplane (sign) LSH — L hash tables of b bits
  *     each; candidates are generated with an equi-join on
  *     (table, bucket) and only candidates get exact cosine. This is the
  *     100 TB path: bucket join ≈ shuffle on a short key, candidate count
  *     per query bounded by bucket sizes.
  *
  * All math is native column expressions over array columns (`zip_with` +
  * `aggregate`), codegen-friendly, no UDFs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, sequential array order (native codegen
    * expression — see [[graft.functions.VectorExpressions]]).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. Single-loop
    * native expression — three accumulators, one array traversal.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Exact top-k: every query row against every corpus row, ranked by
    * cosine desc with id tie-break. `queries` must be small enough to
    * broadcast (it is crossed with the corpus).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic random hyperplane as a LITERAL array column: generated
    * driver-side from a fixed seed, so the expression tree carries plain
    * constants — per-row hyperplane hashing bloated task binaries to
    * ~17 MB and is gone.
    */
  private def planeLit(table: Int, bit: Int, dims: Int): Column = {
    val rng = new scala.util.Random(table.toLong * 1000003L + bit * 7919L)
    array((0 until dims).map(_ => lit(rng.nextDouble() * 2 - 1)): _*)
  }

  /** Sign-LSH bucket id for one table: b bits, bit j = sign(v · plane_j).
    * `vec` should already be `array<double>` (the codegen'd [[dot]] makes
    * the per-plane loops cheap; the cast must not be re-derived per plane,
    * which [[lshIndex]] guarantees with a projection boundary).
    */
  def signBucket(vec: Column, table: Int, bits: Int, dims: Int): Column =
    (0 until bits).map { j =>
      when(dot(vec, planeLit(table, j, dims)) >= 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** (id, table_idx, bucket) — L·|df| rows, the ANN index. The vector is
    * cast to `array<double>` once behind a projection boundary; each of
    * the tables·bits plane dots is then a native codegen'd loop.
    */
  def lshIndex(df: DataFrame, idCol: String, vecCol: String, tables: Int,
      bits: Int, dims: Int): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .select(col(idCol),
        posexplode(array((0 until tables).map(t =>
          signBucket(col("__v"), t, bits, dims)): _*))
          .as(Seq("table_idx", "bucket")))

  /** Approximate top-k: candidates = corpus rows sharing any (table,
    * bucket) with the query, then exact cosine on candidates only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, tables: Int = 16, bits: Int = 4,
      dims: Int = 64): DataFrame = {
    val cIdx = lshIndex(corpus, idCol, vecCol, tables, bits, dims)
      .withColumnRenamed(idCol, "neighbor_id")
    val qIdx = lshIndex(queries, idCol, vecCol, tables, bits, dims)
      .withColumnRenamed(idCol, "query_id")
    val cands = cIdx.join(qIdx, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val cVec = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"))
    val qVec = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"))
    val scored = cands.join(cVec, "neighbor_id").join(qVec, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
