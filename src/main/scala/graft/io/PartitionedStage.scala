package graft.io

import org.apache.spark.sql.SparkSession

/** One-time hive-partitioned staging of the events table — the
  * DIRECTORY-layout half of the storage-pruning story ([[graft.pipeline.ZOrder]]
  * evaluates the within-file min/max half): a fact table written
  * `partitionBy(key)` lets every downstream query with a key predicate
  * skip whole directories at PLANNING time (`PartitionFilters` in the
  * scan, zero I/O for pruned partitions) — at 100 TB the difference
  * between reading one day/type and listing the lake.
  *
  * Same memoization contract as [[graft.pipeline.BucketedStage]]: one
  * write per (JVM, corpus version), keyed by source mtime+size, path
  * carries the pid and a corpus-dir hash so warm-up and timed corpora
  * never clobber each other; re-staged automatically when the source
  * is rewritten.
  */
object PartitionedStage {

  private val built = scala.collection.mutable.Map[String, String]()

  /** Path of the events table staged `partitionBy(event_type)` for
    * `dir`, writing at most once per (JVM, corpus version).
    */
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val key = s"$dir:${sourceKey(s, dir)}"
    built.getOrElseUpdate(key, {
      val pid = ProcessHandle.current().pid()
      val dh = Integer.toHexString(dir.hashCode)
      val path = new java.io.File(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")))
        .toPath.resolve(s"graft_events_parted_${pid}_$dh").toString
      Tables.load(s, dir, "events")
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(path)
      path
    })
  }

  private def sourceKey(s: SparkSession, dir: String): String =
    try {
      val hp = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
      val st = hp.getFileSystem(s.sessionState.newHadoopConf())
        .getFileStatus(hp)
      s"${st.getModificationTime}:${st.getLen}"
    } catch {
      case _: java.io.IOException => s"nostat:${System.nanoTime()}"
    }
}
