package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for corpus curation: keep up to
  * `quota` rows per stratum (e.g. per language / per source), chosen by a
  * stable hash order instead of `rand()` — the same rows are selected on
  * any engine, cluster size, or re-run, which makes corpus builds
  * reproducible and the operator oracle-checkable.
  *
  * Scale shape: one shuffle on the stratum key; output is bounded by
  * `quota × |strata|`. A stratum that dwarfs its quota would sort entirely
  * inside one window task, so above [[StratumPrefilter.AutoEngageBytes]]
  * (or on request) the selection runs the hash-threshold prefilter: one
  * map-side-combined counting pass sizes each stratum, rows above a
  * per-stratum `md5` prefix threshold — a `Margin·quota/n` slice that is
  * an exact ORDER PREFIX of the stratum — are dropped before the window,
  * and any stratum whose surviving slice could not cover its quota
  * (possible only under extreme hash skew) is re-run unfiltered and
  * unioned back. The selected rows are IDENTICAL to the unfiltered
  * window's (pinned in `SamplingSpec`); the big-stratum sort input drops
  * from `n` to ≈ `Margin·quota`. (Spark 4's WindowGroupLimit already
  * partial-limits a `row_number ≤ quota` window map-side — visible in the
  * spec's pinned plan — so even the plain path never shuffles more than
  * `quota` rows per map partition; the prefilter additionally bounds the
  * per-task SORT input and the scan-to-shuffle volume.)
  *
  * (The reference has no sampler beyond `LIMIT`; this extends SURVEY
  * §2f O3 for the training-data mandate.)
  */
object Sampling {

  /** Up to `quota` rows per stratum, by md5(id) order (ties broken by id;
    * md5 because every engine computes the identical hex digest).
    *
    * @param prefilter force the hash-threshold prefilter on/off; default
    *                  engages it when the optimizer's size estimate
    *                  exceeds [[StratumPrefilter.AutoEngageBytes]] (so
    *                  test-scale inputs keep the plain single-window plan).
    */
  def stratifiedHead(df: DataFrame, stratumCols: Seq[String],
      idCol: String, quota: Int,
      prefilter: Option[Boolean] = None): DataFrame = {
    require(quota > 0, "quota must be positive")
    val engage = prefilter.getOrElse(
      df.queryExecution.optimizedPlan.stats.sizeInBytes >
        StratumPrefilter.AutoEngageBytes)
    if (!engage) exactHead(df, stratumCols, idCol, quota)
    else prefilteredHead(df, stratumCols, idCol, quota,
      StratumPrefilter.Margin)
  }

  /** The plain selection: rank within stratum, keep the head. */
  private def exactHead(df: DataFrame, stratumCols: Seq[String],
      idCol: String, quota: Int): DataFrame = {
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__graft_sp_rn", row_number().over(w))
      .filter(col("__graft_sp_rn") <= quota)
      .drop("__graft_sp_rn")
  }

  /** `margin` is a test seam (rescue-path coverage needs a margin small
    * enough to guarantee a survivor shortfall); production callers go
    * through [[stratifiedHead]], which passes [[StratumPrefilter.Margin]].
    */
  private[pipeline] def prefilteredHead(df: DataFrame,
      stratumCols: Seq[String], idCol: String, quota: Int,
      margin: Double): DataFrame = {
    import StratumPrefilter._
    // Injective string key for the driver-side threshold map; to_json of
    // the stratum struct distinguishes null from "" and composes multi-
    // column strata.
    val skey = to_json(struct(stratumCols.map(col): _*))
    val counts = df.groupBy(skey.as("__graft_sp_sk"))
      .agg(count(lit(1)).as("__graft_sp_n")).collect()
    // Strata worth filtering: expected survivors margin·quota, i.e. only
    // strata with more than margin·quota rows get a threshold at all.
    val thr = counts.iterator.flatMap { r =>
      val f = margin * quota / r.getAs[Long]("__graft_sp_n")
      if (f < 1.0) Some(r.getAs[String]("__graft_sp_sk") -> hexThreshold(f)) else None
    }.toMap
    if (thr.isEmpty) return exactHead(df, stratumCols, idCol, quota)

    val surv = df.filter(
      hashPrefix(col(idCol)) < thresholdCol(skey, thr))
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    val ranked = surv.withColumn("__graft_sp_sk", skey)
      .withColumn("__graft_sp_rn", row_number().over(w))

    // A filtered stratum is safe exactly when ≥ quota rows survived (the
    // survivor slice is an order prefix, so its head IS the stratum's
    // head). Anything short — including zero survivors, which the ranked
    // frame can't even show — reruns unfiltered. All lazily in-plan: the
    // unsafe-strata frame is broadcast-joined, no second driver collect.
    import df.sparkSession.implicits._
    val candidates = thr.keys.toSeq.toDF("__graft_sp_sk")
    val unsafe = candidates
      .join(ranked.groupBy("__graft_sp_sk").agg(count(lit(1)).as("__graft_sp_scnt")),
        Seq("__graft_sp_sk"), "left")
      .filter(coalesce(col("__graft_sp_scnt"), lit(0L)) < quota)
      .select("__graft_sp_sk")
    val safe = ranked.join(broadcast(unsafe), Seq("__graft_sp_sk"), "left_anti")
      .filter(col("__graft_sp_rn") <= quota)
      .drop("__graft_sp_rn", "__graft_sp_sk")
    val rescued = exactHead(
      df.withColumn("__graft_sp_sk", skey)
        .join(broadcast(unsafe), Seq("__graft_sp_sk"), "left_semi")
        .drop("__graft_sp_sk"),
      stratumCols, idCol, quota)
    safe.unionByName(rescued)
  }
}
