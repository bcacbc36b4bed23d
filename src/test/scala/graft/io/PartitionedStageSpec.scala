package graft.io

import graft.SparkSpec

class PartitionedStageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ensure stages once, memo-reuses while the commit marker lives, " +
      "and re-stages (stamp-verified) when the staged copy vanishes") {
    val p1 = PartitionedStage.ensure(spark, dir)
    assert(new java.io.File(p1, "_SUCCESS").isFile,
      "staging must leave a commit marker")
    val rows1 = spark.read.parquet(p1).count()
    assert(rows1 === spark.read.parquet(s"$dir/events.parquet").count())
    // memo hit: same path, no rewrite (mtime of the marker unchanged)
    val marker = new java.io.File(p1, "_SUCCESS")
    val t1 = marker.lastModified()
    assert(PartitionedStage.ensure(spark, dir) === p1)
    assert(marker.lastModified() === t1, "memo reuse must not re-write")
    // external deletion (cleanup, reaper misfire): reuse must notice the
    // missing marker and re-stage rather than scan a ghost path — the
    // r9 verdict's correctness-critical-state hardening
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(p1))
    assert(!new java.io.File(p1).exists())
    val p2 = PartitionedStage.ensure(spark, dir)
    assert(new java.io.File(p2, "_SUCCESS").isFile, "must re-stage")
    assert(spark.read.parquet(p2).count() === rows1)
  }
}
