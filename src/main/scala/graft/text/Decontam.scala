package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination for training-data pipelines: flag corpus
  * documents that share word n-grams with a held-out evaluation set —
  * the standard train/test-overlap sweep run before every corpus release
  * (GPT-3 §5 / PaLM-style 8-13-gram overlap; n is a parameter here).
  *
  * Scale design (the 100 TB shape):
  *   - the EVAL side is benchmark suites — MBs against a corpus of TBs —
  *     so its distinct-gram set is **broadcast**: matching is a map-side
  *     hash probe fused with the corpus scan, no shuffle of corpus grams.
  *   - per-document totals ride the same single projection (grams are
  *     computed once per row); the only exchange is the final
  *     groupBy(doc_id) over MATCHED grams, which is bounded by the
  *     contamination volume, not the corpus size.
  *   - gram semantics reuse [[Dedup.wordShingles]] (a doc shorter than n
  *     words contributes its whole text as one gram — a tiny doc equal to
  *     an eval fragment IS contamination).
  *
  * The reference has no decontamination surface; this extends its DQ
  * family (SURVEY §2d) per the training-data mandate.
  */
object Decontam {

  /** One row per document: (idCol, __grams = distinct n-gram array).
    *
    * Persist THIS frame before feeding it to [[overlapReportFromArrays]]:
    * the join above the explode makes Catalyst infer a
    * `size(grams)>0 AND isnotnull(grams)` filter and push it below the
    * scan's exchange, where it re-derives the full shingling expression
    * per row in the (unsplittable single-file) scan task — measured 2.5×
    * the whole query. A persisted array frame is a barrier: the inferred
    * filter probes the cached array instead of recomputing it.
    */
  def docGramArrays(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame =
    // tokens materialize in their own projection (see the
    // wordShinglesFromTokens scaladoc — an inlined split re-tokenizes
    // once per emitted gram inside the interpreted transform lambda)
    df.select(col(idCol), Dedup.tokensOf(col(textCol)).as("__toks"))
      .select(col(idCol),
        array_distinct(Dedup.wordShinglesFromTokens(col("__toks"), n))
          .as("__grams"))

  /** One row per distinct n-gram per document: (idCol, gram). */
  def docGrams(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame =
    docGramArrays(df, idCol, textCol, n)
      .select(col(idCol), explode(col("__grams")).as("gram"))

  /** Contamination report over `corpus` against `eval`: for every corpus
    * document sharing at least one distinct n-gram with the eval set,
    * emit (idCol, matched_grams, total_grams, contamination_ratio).
    *
    * `matched_grams` counts the document's distinct grams that appear
    * anywhere in the eval set; callers threshold the ratio (or the raw
    * count) to drop or audit documents.
    */
  /** Convenience composition for tests/small frames — it does NOT persist
    * the gram frames, so it takes the slow path the [[docGramArrays]]
    * scaladoc warns about. Production callers persist both array frames
    * and use [[overlapReportFromArrays]] (see the registered
    * `decontam_overlap_documents` query for the pattern).
    */
  def overlapReport(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame =
    overlapReportFromArrays(docGramArrays(corpus, idCol, textCol, n),
      docGramArrays(eval, idCol, textCol, n), idCol)

  /** The report over precomputed (id, __grams) frames — persist BOTH
    * first (see [[docGramArrays]]; exploding an unmaterialized gram
    * expression re-derives it per element in the interpreted Generate
    * path — measured 10× the cost of building the arrays themselves).
    * The corpus is shingled exactly once: the per-doc total rides
    * through the explode as a carried column, so totals need no second
    * scan and no re-join against a second gram computation.
    *
    * @param broadcastEval true (default) broadcasts the distinct eval
    *   gram set — the right shape while eval suites are MBs against a TB
    *   corpus (map-side probe, zero corpus-gram shuffle). Set false when
    *   the eval set outgrows a broadcast (e.g. decontaminating against
    *   another whole corpus): both sides then hash-partition on the gram
    *   key — one shuffle of each side's distinct grams, still never an
    *   all-pairs comparison.
    */
  def overlapReportFromArrays(corpusArrays: DataFrame,
      evalArrays: DataFrame, idCol: String,
      broadcastEval: Boolean = true): DataFrame = {
    val evalSet = evalArrays
      .select(explode(col("__grams")).as("gram")).distinct()
    corpusArrays
      .select(col(idCol),
        size(col("__grams")).cast("long").as("total_grams"),
        explode(col("__grams")).as("gram"))
      .join(if (broadcastEval) broadcast(evalSet) else evalSet, "gram")
      .groupBy(col(idCol), col("total_grams"))
      .agg(count(lit(1)).as("matched_grams"))
      .select(col(idCol), col("matched_grams"), col("total_grams"),
        (col("matched_grams").cast("double") / col("total_grams"))
          .as("contamination_ratio"))
  }
}
