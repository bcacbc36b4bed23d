package graft.io

import org.apache.spark.sql.SparkSession

/** One-time hive-partitioned staging of the events table — the
  * DIRECTORY-layout half of the storage-pruning story
  * ([[graft.pipeline.ZOrder]] evaluates the within-file min/max half):
  * a fact table written `partitionBy(key)` lets every downstream query
  * with a key predicate skip whole directories at PLANNING time
  * (`PartitionFilters` in the scan, zero I/O for pruned partitions) —
  * at 100 TB the difference between reading one day/type and listing
  * the lake.
  *
  * All memo/verify/reap mechanics live in [[graft.util.Staging]] (the
  * r11 consolidation): stamp = row count + exact decimal `event_id`
  * sum, verified on every (re-)stage; reuse re-validates marker +
  * file inventory; dead siblings reaped with a pid-liveness check.
  */
object PartitionedStage {

  private val stage =
    new graft.util.Staging.PathStage("graft_events_parted",
      stampKeyCol = Some("event_id"))

  /** Path of the events table staged `partitionBy(event_type)` for
    * `dir`, writing at most once per (JVM, corpus version).
    */
  def ensure(s: SparkSession, dir: String): String =
    stage.ensure(s, dir, "", Tables.sourceStamp(s, dir, "events"))(
      s2 => Tables.load(s2, dir, "events"))(
      (df, path) => df.write.mode("overwrite")
        .partitionBy("event_type").parquet(path))
}
