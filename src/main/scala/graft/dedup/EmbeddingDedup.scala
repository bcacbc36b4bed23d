package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Embedding-cosine near-duplicate detection — the vector-space member of
  * the dedup family (exact / MinHash / SimHash / n-gram Jaccard live in
  * [[Dedup]]).
  *
  * Two candidate generators, one verifier:
  *   - [[cosinePairsBlocked]]: equality blocking on a caller-chosen key
  *     (hash join, never a crossJoin). Correctness variant — the block key
  *     must be selective for this to scale; it is the oracle-checkable
  *     path, not the 100 TB default.
  *   - [[cosinePairsLsh]]: random-hyperplane sign-LSH buckets (reusing
  *     [[Similarity.lshIndex]]) with a per-bucket size bound, so candidate
  *     fan-out stays linear in corpus size even under degenerate buckets.
  *     This is the scale path: shuffle on a short (table, bucket) key.
  *
  * Verification is exact cosine on candidate PAIRS only, in double
  * precision with a sequential fold (bit-identical to DuckDB's
  * list_dot_product, so the blocked variant hash-matches its oracle).
  */
object EmbeddingDedup {

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Exact cosine on candidate pairs via two hash joins back to the
    * (id, vector) projection.
    */
  def cosineOnPairs(pairs: DataFrame, df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val vecs = df.select(col(idCol).as("__id"),
      asDouble(col(vecCol)).as("__v"))
    pairs
      .join(vecs.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__v", "__va"), "id_a")
      .join(vecs.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__v", "__vb"), "id_b")
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("__va"), col("__vb")).as("cosine"))
  }

  /** Near-dup pairs sharing `blockCol`, cosine ≥ threshold. */
  def cosinePairsBlocked(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val e = df.select(col(idCol), col(blockCol).as("__blk"))
    val pairs = e.as("a")
      .join(e.as("b"), col("a.__blk") === col("b.__blk") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
    cosineOnPairs(pairs, df, idCol, vecCol)
      .filter(col("cosine") >= threshold)
  }

  /** Near-dup pairs from sign-LSH buckets, cosine ≥ threshold.
    *
    * @param maxBucket buckets larger than this are dropped (same
    *                  degenerate-bucket guard as [[Dedup.lshCandidates]]).
    */
  def cosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 16, bits: Int = 4, dims: Int = 64,
      maxBucket: Int = 256): DataFrame = {
    val idx = Similarity.lshIndex(df, idCol, vecCol, tables, bits, dims)
    // Materialized ANN index: without the persist the hyperplane hashing is
    // re-derived on each side of the self-join (and under the window).
    val bounded = idx.withColumn("__bucket_n",
        count(lit(1)).over(Window.partitionBy("table_idx", "bucket")))
      .filter(col("__bucket_n").between(2, maxBucket))
      .drop("__bucket_n")
      .persist()
    val left = bounded.select(col("table_idx"), col("bucket"),
      col(idCol).as("id_a"))
    val right = bounded.select(col("table_idx"), col("bucket"),
      col(idCol).as("id_b"))
    val cands = left.join(right, Seq("table_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cosineOnPairs(cands, df, idCol, vecCol)
      .filter(col("cosine") >= threshold)
  }
}
