package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type 1 (overwrite) incremental merge, decomposed for immutable
  * storage.
  *
  * The reference's code generator emits a Snowflake `MERGE … UPDATE ALL BY
  * NAME / INSERT ALL BY NAME` with a source-side "only the latest record
  * based on CREATED_AT" dedup (`/root/reference/CODE_GENERATOR.sql:39-59`).
  * Plain parquet has no MERGE, so the upsert is decomposed relationally:
  *
  *   merged = target ⟕anti source.keys  ∪  latestPerKey(source)
  *
  * Scale notes: the anti-join shuffles both sides on the key (or broadcasts
  * a small source — Catalyst/AQE decides); the window dedup shuffles the
  * source once on the same key, and Catalyst reuses that partitioning for
  * the join side when it can. No driver-side collection at any size.
  */
object Scd1 {

  /** W1: keep only the newest row per key. `tieBreakers` make row_number
    * deterministic when order-column values collide (the reference's
    * ROW_NUMBER over CREATED_AT alone is nondeterministic on ties).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: String,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol +: tieBreakers).map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** S15/J2: SCD1 upsert of `source` into `target` on `keys`. Rows whose
    * key exists in the source are overwritten by the source's latest
    * version; all other target rows pass through unchanged.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      orderCol: String, tieBreakers: Seq[String] = Nil): DataFrame = {
    val latest = latestPerKey(source, keys, orderCol, tieBreakers)
    target.join(latest, keys, "left_anti").unionByName(latest)
  }
}
