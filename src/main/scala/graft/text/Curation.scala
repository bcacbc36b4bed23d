package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The modern curation loop's shared stages — ONE implementation used
  * verbatim by the batch lane (`corpus_curate_e2e_documents`) and the
  * streaming twin (`stream_curate_documents`), so the two can never
  * drift (the shared-builder idiom applied at the Scala level: the
  * streaming gate's oracle is the batch lane's SQL verbatim, which is
  * only sound if both engines run literally the same dataflow).
  */
object Curation {

  /** Per-document curation metadata from raw markup: NFC markup
    * normalization → HTML extraction ([[HtmlExtract]]) →
    * pinned-weight quality inference ([[QualityModel.scorePinned]]) —
    * one fused map-side chain, no shuffle, so scoring is
    * embarrassingly parallel per batch or per file split. Output:
    * `(idCol, sourceCol, n_tokens BIGINT, keep)` — the metadata-sized
    * frame every later curation stage reads INSTEAD of the corpus.
    *
    * The keep gate is `margin ≥ minScore · n_tokens` — the
    * exact-integer form of `score ≥ minScore`, whose default is the
    * CALIBRATION-CHOSEN operating threshold
    * ([[QualityThresholdPinned]]; the choice itself is oracled by
    * `text_quality_threshold_documents`). `minScore = 0` recovers the
    * classic sign gate.
    */
  def scoreDocs(df: DataFrame, idCol: String, htmlCol: String,
      sourceCol: String, weights: Array[Long], bias: Long,
      minScore: Long = QualityThresholdPinned.MinScore): DataFrame =
    QualityModel.scorePinned(
        HtmlExtract.extract(
          df.withColumn(htmlCol, TextAnalysis.nfc(col(htmlCol))),
          idCol, htmlCol, keepCols = Seq(sourceCol)),
        idCol, "text", weights, bias, keepCols = Seq(sourceCol))
      .select(col(idCol), col(sourceCol),
        col("n_tokens").cast("long").as("n_tokens"),
        (col("margin") >= lit(minScore) * col("n_tokens")).as("keep"))

  /** Selection + per-source funnel over a SCORED metadata frame:
    * quality-kept docs join the embeddings table for SemDeDup pruning
    * under pinned centroids, survivors rebalance under T = 2
    * temperature mixing, and the funnel reports
    * `(source, n_docs, n_quality, n_dedup, n_selected, sel_tokens)`.
    * `scored` should be materialized (checkpoint or a state-read) —
    * it feeds three consumers.
    */
  def funnel(scored: DataFrame, idCol: String, sourceCol: String,
      embeddings: DataFrame, embIdCol: String, embCol: String,
      centroids: Array[Array[Double]], tau: Double,
      budget: Long): DataFrame = {
    val q = scored.filter(col("keep"))
    val pruned = graft.sim.SemDedup.prune(
        embeddings.join(q.select(col(idCol).as(embIdCol)),
          Seq(embIdCol)),
        embIdCol, embCol, centroids, tau)
      .filter(col("kept")).select(col(embIdCol).as(idCol))
      .localCheckpoint(true) // read by mixing AND the funnel join
    val sel = graft.pipeline.Mixing.byTemperatureT2(
        q.join(pruned, Seq(idCol)), sourceCol, idCol, "n_tokens",
        budget)
      .select(col(idCol), lit(true).as("__sel"))
    scored
      .join(pruned.withColumn("__dd", lit(true)), Seq(idCol), "left")
      .join(sel, Seq(idCol), "left")
      .groupBy(sourceCol).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("__dd"), 1L).otherwise(0L)).as("n_dedup"),
        sum(when(col("__sel"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("__sel"), col("n_tokens")).otherwise(0L))
          .as("sel_tokens"))
  }
}
