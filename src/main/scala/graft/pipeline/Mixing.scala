package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
  * source count. A mega-source whose corpus dwarfs its budget
  * (CommonCrawl ≫ budget is the NORMAL case in a training mix) would
  * sort entirely in one window task, so above
  * [[StratumPrefilter.AutoEngageBytes]] (or on request) the selection
  * runs the hash-threshold prefilter: one counting pass takes each
  * source's row/token totals, rows above a per-source md5-prefix
  * threshold — a `Margin·budget/tokenSum` slice that is an exact ORDER
  * PREFIX of the source — are dropped before the window, and any source
  * whose surviving slice does not provably reach its budget is re-run
  * unfiltered and unioned back. The selected rows are IDENTICAL to the
  * unfiltered window's (pinned in `MixingSpec`); the mega-source sort
  * input drops from its full corpus to ≈ `Margin·budget/avgTokens` rows.
  */
object Mixing {

  /** Rows of `df` selected under each source's token budget.
    *
    * @param budgets       per-source token budgets
    * @param defaultBudget budget for sources absent from `budgets`
    * @param prefilter     force the hash-threshold prefilter on/off;
    *                      default engages it when the optimizer's size
    *                      estimate exceeds
    *                      [[StratumPrefilter.AutoEngageBytes]].
    */
  def byTokenBudget(df: DataFrame, sourceCol: String, idCol: String,
      tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long,
      prefilter: Option[Boolean] = None): DataFrame = {
    val engage = prefilter.getOrElse(
      df.queryExecution.optimizedPlan.stats.sizeInBytes >
        StratumPrefilter.AutoEngageBytes)
    if (!engage) exactMix(df, sourceCol, idCol, tokenCol, budgets,
      defaultBudget)
    else prefilteredMix(df, sourceCol, idCol, tokenCol, budgets,
      defaultBudget, StratumPrefilter.Margin)
  }

  private def budgetCol(sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long): Column =
    coalesce(
      element_at(typedLit(budgets), col(sourceCol)), lit(defaultBudget))

  /** The plain selection: per-source cumulative token sum in hash order,
    * keep rows starting before the budget.
    */
  private def exactMix(df: DataFrame, sourceCol: String, idCol: String,
      tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    val w = Window.partitionBy(sourceCol)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // compute the working columns in a projection of our own making so a
    // caller frame that happens to contain __n/__cum is never clobbered
    val n = col(tokenCol).cast("long")
    df.select(col("*"), (sum(n).over(w) - n).as("__graft_mix_cum"))
      .filter(col("__graft_mix_cum") < budgetCol(sourceCol, budgets,
        defaultBudget))
      .drop("__graft_mix_cum")
  }

  /** `margin` is a test seam (rescue-path coverage needs a margin small
    * enough to guarantee a survivor shortfall); production callers go
    * through [[byTokenBudget]], which passes [[StratumPrefilter.Margin]].
    */
  private[pipeline] def prefilteredMix(df: DataFrame, sourceCol: String,
      idCol: String, tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long, margin: Double): DataFrame = {
    import StratumPrefilter._
    val skey = col(sourceCol).cast("string")
    val totals = df.groupBy(skey.as("__graft_sp_sk"))
      .agg(sum(col(tokenCol).cast("long")).as("__graft_sp_tok")).collect()
    def budgetOf(src: String): Long = budgets.getOrElse(src, defaultBudget)
    // Sources worth filtering: expected survivor token mass is
    // margin·budget, so only sources holding more than that get a
    // threshold (null-keyed sources never do — map keys can't be null —
    // and therefore keep every row, which is trivially exact).
    val thr = totals.iterator.flatMap { r =>
      Option(r.getAs[String]("__graft_sp_sk")).flatMap { src =>
        val tok = r.getAs[Long]("__graft_sp_tok")
        val f = margin * budgetOf(src) / tok.toDouble
        if (tok > 0 && f < 1.0) Some(src -> hexThreshold(f)) else None
      }
    }.toMap
    if (thr.isEmpty) return exactMix(df, sourceCol, idCol, tokenCol,
      budgets, defaultBudget)

    val surv = df.filter(hashPrefix(col(idCol)) < thresholdCol(skey, thr))
    val w = Window.partitionBy(sourceCol)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col(tokenCol).cast("long")
    val cum = surv.select(col("*"), (sum(n).over(w) - n).as("__graft_mix_cum"),
      skey.as("__graft_sp_sk"))

    // A filtered source is safe exactly when its surviving token mass
    // REACHES the budget: the survivors are an order prefix, so the
    // greedy cut then falls inside the slice. A shortfall — including
    // zero survivors, invisible in `cum` — reruns unfiltered. All lazily
    // in-plan via a broadcast join of the (normally empty) unsafe set.
    import df.sparkSession.implicits._
    val candidates = thr.keys.toSeq.toDF("__graft_sp_sk")
    val unsafe = candidates
      .join(cum.groupBy("__graft_sp_sk")
          .agg(sum(col(tokenCol).cast("long")).as("__graft_sp_stok")),
        Seq("__graft_sp_sk"), "left")
      .filter(coalesce(col("__graft_sp_stok"), lit(0L)) <
        element_at(typedLit(thr.keys.map(s => s -> budgetOf(s)).toMap),
          col("__graft_sp_sk")))
      .select("__graft_sp_sk")
    val safe = cum.join(broadcast(unsafe), Seq("__graft_sp_sk"), "left_anti")
      .filter(col("__graft_mix_cum") < budgetCol(sourceCol, budgets,
        defaultBudget))
      .drop("__graft_mix_cum", "__graft_sp_sk")
    val rescued = exactMix(
      df.withColumn("__graft_sp_sk", skey)
        .join(broadcast(unsafe), Seq("__graft_sp_sk"), "left_semi")
        .drop("__graft_sp_sk"),
      sourceCol, idCol, tokenCol, budgets, defaultBudget)
    safe.unionByName(rescued)
  }
}
