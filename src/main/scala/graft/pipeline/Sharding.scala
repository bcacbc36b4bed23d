package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle-sharding — the write-side layout step of
  * a training-data pipeline: every example gets a reproducible (shard,
  * position) so any run of the loader — or any engine — reads the same
  * global order, with no RNG state to checkpoint. The "shuffle" is an
  * md5 keyed sort (the standard seeded-hash shuffle: order by
  * hash(seed, id)), so re-sharding with a new seed is a pure recompute.
  *
  * Scale shape: shard assignment is a stateless per-row expression (no
  * shuffle); per-shard positions are a window partitioned by shard — ONE
  * hash exchange into `nShards` groups, each sorted locally, exactly the
  * sort the shard writer needs anyway. Parallelism is capped at
  * `nShards`, so size it to O(cluster width × a few): 1024+ in a real
  * deployment, never the 16 of the gate fixture.
  */
object Sharding {

  val DefaultSeed = "42"
  val DefaultShards = 16

  /** Per-document shard + order assignment: `(idCol, sort_key, shard,
    * shard_pos)`. `sort_key = md5(seed || ':' || id)`; `shard` folds the
    * first two hex nibbles (0..255) mod `nShards` — uniform when
    * `nShards` is a power of two ≤ 256 (use powers of two); `shard_pos`
    * is the 1-based rank within the shard by sort_key.
    */
  def assignments(docs: DataFrame, idCol: String,
      seed: String = DefaultSeed, nShards: Int = DefaultShards): DataFrame = {
    require(nShards > 0 && 256 % nShards == 0,
      s"nShards must be a power of two <= 256, got $nShards")
    val key = md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
      .cast("binary"))
    val hexVal = (i: Int) =>
      expr(s"locate(substring(sort_key, $i, 1), '0123456789abcdef') - 1")
    docs.select(col(idCol), key.as("sort_key"))
      .withColumn("shard",
        ((hexVal(1) * 16 + hexVal(2)) % nShards).cast("long"))
      .withColumn("shard_pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("sort_key")))
          .cast("long"))
  }

  /** The physical layout the loader reads: one hash exchange on `shard`
    * (each shard lands WHOLLY in one task — multiple shards may share a
    * task, but a shard is never split), locally sorted by (shard,
    * sort_key) so every shard is a contiguous key-ordered run — exactly
    * what `.write.partitionBy("shard")` consumes to emit one ordered
    * file set per shard.
    */
  def layout(assigned: DataFrame): DataFrame =
    assigned.repartition(col("shard"))
      .sortWithinPartitions("shard", "sort_key")
}
