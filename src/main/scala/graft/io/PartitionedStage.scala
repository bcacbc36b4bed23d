package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, sum}

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
  *
  * The staged copy is CORRECTNESS-critical state (a gate query's result
  * is hashed against an oracle that reads the RAW table), so staging is
  * verified, never trusted: after every write the staged copy's content
  * stamp — row count + exact decimal sum of `event_id` — must equal the
  * source's, or `ensure` throws (fail loud; a silently partial or stale
  * copy must never produce a plausible-but-wrong aggregate). On memo
  * reuse the commit marker (`_SUCCESS`) is re-checked — if the staged
  * dir was deleted or truncated between calls (external cleanup, a
  * sibling's reaper misfiring), the copy is re-staged and re-verified
  * instead of scanning a ghost path.
  */
object PartitionedStage {

  private case class Staged(path: String, rows: Long,
    idSum: java.math.BigDecimal)

  private val built = scala.collection.mutable.Map[String, Staged]()

  /** (row count, exact `sum(event_id)` as DECIMAL(38,0)) of `df` — the
    * content stamp compared between source and staged copy. Count + key
    * sum catches the realistic corruptions (dropped/duplicated rows,
    * partial write, stale content from a prior corpus) in one cheap
    * two-column scan; the decimal sum is partition-order-independent.
    */
  private def stamp(df: org.apache.spark.sql.DataFrame)
      : (Long, java.math.BigDecimal) = {
    val r = df.agg(count(org.apache.spark.sql.functions.lit(1)),
      sum(col("event_id").cast("decimal(38,0)"))).head()
    (r.getLong(0), Option(r.getDecimal(1))
      .getOrElse(java.math.BigDecimal.ZERO))
  }

  /** Path of the events table staged `partitionBy(event_type)` for
    * `dir`, writing at most once per (JVM, corpus version) and
    * verifying the staged content stamp against the source on every
    * (re-)stage.
    */
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val key = s"$dir:${Tables.sourceStamp(s, dir, "events")}"
    built.get(key) match {
      case Some(st) if new java.io.File(st.path, "_SUCCESS").isFile =>
        st.path
      case _ =>
        val pid = ProcessHandle.current().pid()
        val dh = Integer.toHexString(dir.hashCode)
        val wh = new java.io.File(
          new java.net.URI(s.conf.get("spark.sql.warehouse.dir")))
        reapStaleSiblings(wh, pid)
        val path = wh.toPath
          .resolve(s"graft_events_parted_${pid}_$dh").toString
        Tables.load(s, dir, "events")
          .write.mode("overwrite").partitionBy("event_type")
          .parquet(path)
        val (srcRows, srcSum) = stamp(Tables.load(s, dir, "events"))
        val (stgRows, stgSum) = stamp(s.read.parquet(path))
        if (stgRows != srcRows || stgSum.compareTo(srcSum) != 0)
          throw new IllegalStateException(
            s"PartitionedStage content mismatch at $path: " +
              s"staged ($stgRows rows, id-sum $stgSum) != " +
              s"source ($srcRows rows, id-sum $srcSum)")
        built(key) = Staged(path, srcRows, srcSum)
        path
    }
  }

  /** Dead pids' staged dirs untouched for an hour are deleted here —
    * in the staging step, never inside a timed query — otherwise every
    * gate/bench JVM would leave an events-sized parquet copy behind
    * forever (path-only staging: no catalog entries to drop).
    */
  private def reapStaleSiblings(wh: java.io.File, pid: Long): Unit =
    try {
      val cutoff = System.currentTimeMillis() - 3600L * 1000
      Option(wh.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.matches("graft_events_parted_\\d+_[0-9a-f]+")
          && !f.getName.startsWith(s"graft_events_parted_${pid}_")
          && f.lastModified() < cutoff)
        .foreach { dead =>
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(): Unit
          }
          rm(dead)
        }
    } catch { case _: Exception => () } // cleanup is best-effort
}
