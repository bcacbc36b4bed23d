package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed token-budget packs (the pre-tokenization grouping step that
  * turns a curated corpus into ~budget-token training sequences).
  *
  * Packing needs NO global order — any deterministic partition of the
  * corpus into budget-bounded groups is a valid packing — so the corpus
  * is first sharded by a hash prefix of the id and packed greedily WITHIN
  * each shard: every shard's cumulative-sum window runs in its own task,
  * and the operator scales out linearly instead of serializing through
  * one global window (the single-task-window trap; cf. the distributed
  * selection rework in [[graft.profile.Profiler]]).
  *
  * Greedy rule: docs are laid end-to-end in md5(id) order; a doc belongs
  * to the pack in which it STARTS (`floor(preceding_tokens / budget)`),
  * so packs can overflow by at most one document and docs are never
  * split. Deterministic on any engine: md5 + exact integer sums.
  */
object Packing {

  /** One row per pack: (shard, pack_id, n_docs, pack_tokens).
    *
    * @param tokenCol      exact per-doc token count (integer column)
    * @param budget        target tokens per pack
    * @param shardHexChars md5-prefix width driving the shard fan-out
    *                      (1 → 16 shards, 2 → 256); pick a width whose
    *                      fan-out ≥ cluster parallelism at scale
    */
  def packs(df: DataFrame, idCol: String, tokenCol: String,
      budget: Int, shardHexChars: Int = 1): DataFrame = {
    val idStr = col(idCol).cast("string")
    val shard = substring(md5(idStr.cast("binary")), 1, shardHexChars)
    val w = Window.partitionBy("shard")
      .orderBy(md5(col("__id").cast("binary")), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(shard.as("shard"), idStr.as("__id"),
        col(tokenCol).cast("long").as("__n"))
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col("__n")) / budget).cast("long"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("pack_tokens"))
  }
}
