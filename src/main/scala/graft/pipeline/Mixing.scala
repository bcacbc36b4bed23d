package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain mixing for training-corpus assembly: select documents per
  * source up to a per-source token budget, in deterministic md5(id)
  * order — the step that turns per-domain weights into an actual
  * document selection, reproducible on any engine or cluster size.
  *
  * Greedy rule (same convention as [[Packing]]): docs are laid
  * end-to-end in md5(id) order within their source; a doc is selected if
  * it STARTS before the budget is exhausted, so a source can overflow by
  * at most one document and docs are never split.
  *
  * Scale shape: one cumulative-sum window per source — parallelism =
  * source count, which normally matches or exceeds cluster parallelism
  * (corpora mix hundreds of domains). For a mega-source whose documents
  * dwarf its budget, pre-filter with the hash-threshold trick described
  * in [[Sampling]] (keep md5(id) below ≈ 2·budget/avgTokens/count of the
  * hash space) before the exact window — same selection, bounded sort.
  */
object Mixing {

  /** Rows of `df` selected under each source's token budget.
    *
    * @param budgets       per-source token budgets
    * @param defaultBudget budget for sources absent from `budgets`
    */
  def byTokenBudget(df: DataFrame, sourceCol: String, idCol: String,
      tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    val budget = coalesce(
      element_at(typedLit(budgets), col(sourceCol)), lit(defaultBudget))
    val w = Window.partitionBy(sourceCol)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // compute the working columns in a projection of our own making so a
    // caller frame that happens to contain __n/__cum is never clobbered
    val n = col(tokenCol).cast("long")
    df.select(col("*"), (sum(n).over(w) - n).as("__graft_mix_cum"))
      .filter(col("__graft_mix_cum") < budget)
      .drop("__graft_mix_cum")
  }
}
