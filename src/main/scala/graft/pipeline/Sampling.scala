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
  * `quota × |strata|`. Rank-within-stratum is the standard quota sampler;
  * for strata that dwarf the quota at extreme scale, pre-filter with an
  * approximate hash-threshold (`hash < quota/|stratum| × MAX`) before the
  * exact rank to cut the shuffle — same selection, two passes.
  *
  * (The reference has no sampler beyond `LIMIT`; this extends SURVEY
  * §2f O3 for the training-data mandate.)
  */
object Sampling {

  /** Up to `quota` rows per stratum, by md5(id) order (ties broken by id;
    * md5 because every engine computes the identical hex digest).
    */
  def stratifiedHead(df: DataFrame, stratumCols: Seq[String],
      idCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }
}
