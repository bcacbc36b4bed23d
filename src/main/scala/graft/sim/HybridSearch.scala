package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — Reciprocal Rank Fusion (Cormack et al.
  * 2009) of independently-produced ranked lists, the standard way to
  * combine sparse (BM25) and dense (embedding-cosine) retrieval
  * without score calibration: each list contributes `1 / (c + rank)`
  * per document and the fused score is their sum, so only RANKS
  * matter — BM25's unbounded scores and cosine's [−1, 1] never meet on
  * one scale. `c = 60` is the published default.
  *
  * Determinism: each contribution is one IEEE division of exact
  * operands and the fusion is a FIXED left-fold expression tree in
  * source order (built by `reduce` over the source list, not a
  * groupBy sum whose accumulation order floats) — mirrored verbatim in
  * the oracle.
  *
  * Scale shape: inputs are top-k ranked LISTS (already report-sized by
  * their producers — the corpus never reaches this operator), joined
  * full-outer on the document id across sources; the fused cut is a
  * TakeOrdered under the (score desc, doc_id) total order. The
  * expensive work (inverted-index probe, ANN) happens upstream in the
  * rankers, which is the point: fusion composes engines, it does not
  * re-rank corpora.
  */
object HybridSearch {

  /** Fuse named `(doc_id, rank)` lists: output `(doc_id,
    * rank_<name>..., rrf_score)` for the top `k` by fused score;
    * documents absent from a source carry a null rank there and
    * contribute 0 for it.
    */
  def rrf(rankings: Seq[(String, DataFrame)], c: Int = 60,
      k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking names must be distinct")
    require(c > 0, "rank constant must be positive")
    val named = rankings.map { case (name, df) =>
      df.select(col("doc_id"), col("rank").as(s"rank_$name"))
    }
    val joined = named.reduce((a, b) =>
      a.join(b, Seq("doc_id"), "full_outer"))
    val fused = rankings.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(c.toDouble) +
        col(s"rank_$name").cast("double")), lit(0.0))
    }.reduce(_ + _)
    joined.select(col("doc_id") +:
        rankings.map { case (name, _) => col(s"rank_$name") } :+
        fused.as("rrf_score"): _*)
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }
}
