package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for embedding/retrieval pipelines: split each doc
  * into fixed-token windows with overlap (stride = size − overlap), the
  * step that turns a curated corpus into embedding-ready passages.
  *
  * Chunk rule (exact integer arithmetic, engine-portable): for n tokens,
  * `nChunks = max(1, ceil((n − overlap) / stride))`; chunk i covers
  * tokens `[1 + i·stride, 1 + i·stride + size)` (1-based, last chunk may
  * be short). Empty docs yield no chunks.
  *
  * Scale shape: tokens materialize in one projection (see
  * [[graft.dedup.Dedup.wordShinglesFromTokens]] for why), chunk arrays in
  * the next, then a single explode — no shuffle at any corpus size.
  */
object Chunking {

  /** One row per chunk: (idCol, chunk_idx, chunk_n_tokens, chunk_text). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = col("__toks")
    val n = org.apache.spark.sql.functions.size(toks)
    // ceil((n-overlap)/stride) in exact integer math; max(1,…) keeps
    // short docs as a single chunk
    val nChunks = greatest(lit(1),
      floor((n - overlap + (stride - 1)) / lit(stride)).cast("int"))
    val chunks = when(n === 0, array().cast("array<array<string>>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => slice(toks, i * stride + 1, lit(size))))
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), chunks.as("__chunks"))
      .select(col(idCol),
        posexplode(col("__chunks")).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__c")).cast("long")
          .as("chunk_n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }
}
