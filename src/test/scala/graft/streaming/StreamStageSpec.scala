package graft.streaming

import graft.SparkSpec

class StreamStageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ensure stages once per variant, memo-reuses, re-stages when the " +
      "staged copy vanishes, and keeps variants independent") {
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds += 1
      graft.io.Tables.load(s, dir, "events", parallelize = false)
        .select("user_id", "ts")
    }
    val p1 = StreamStage.ensure(spark, dir, "specvar")(build)
    assert(new java.io.File(p1, "_SUCCESS").isFile)
    assert(builds === 1)
    assert(StreamStage.ensure(spark, dir, "specvar")(build) === p1)
    assert(builds === 1, "memo reuse must not rebuild")
    // a different variant writes its own directory
    val p2 = StreamStage.ensure(spark, dir, "specvarb")(build)
    assert(p2 !== p1)
    assert(builds === 2)
    // external deletion → re-stage (stamp-verified on the way)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(p1))
    val p3 = StreamStage.ensure(spark, dir, "specvar")(build)
    assert(builds === 3, "vanished copy must rebuild")
    assert(new java.io.File(p3, "_SUCCESS").isFile)
    assert(spark.read.parquet(p3).count() ===
      spark.read.parquet(s"$dir/events.parquet").count())
  }
}
