package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The single spec for the consolidated staging core (r11): every
  * adapter ([[graft.io.PartitionedStage]],
  * [[graft.streaming.StreamStage]], [[graft.pipeline.BucketedStage]],
  * the DQ report memo) inherits these properties from here.
  */
class StagingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def freshStage(tagCol: Option[String] = Some("id")) =
    new Staging.PathStage(
      s"graft_stagingspec${System.nanoTime() % 1000000}", tagCol)

  private def frame(n: Int)(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  test("stages once, memo-reuses, re-stages when the copy vanishes") {
    val st = freshStage()
    var writes = 0
    def ens() = st.ensure(spark, dir, "t", "stamp1")(frame(10)) {
      (df, p) => writes += 1; df.write.mode("overwrite").parquet(p)
    }
    val p1 = ens()
    assert(writes === 1)
    assert(ens() === p1)
    assert(writes === 1, "memo reuse must not rewrite")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(p1))
    ens()
    assert(writes === 2, "vanished copy must re-stage")
  }

  test("a truncated dir with an intact _SUCCESS re-stages (inventory)") {
    val st = freshStage()
    var writes = 0
    def ens() = st.ensure(spark, dir, "t", "stamp1")(frame(200)) {
      (df, p) => writes += 1
      df.repartition(4).write.mode("overwrite").parquet(p)
    }
    val p1 = ens()
    // delete ONE data file, keep the commit marker — the r10 ADVICE
    // hole: marker-only validation would trust the truncated copy
    val part = new java.io.File(p1).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(part.delete())
    assert(new java.io.File(p1, "_SUCCESS").isFile)
    ens()
    assert(writes === 2, "truncated copy must re-stage")
    assert(spark.read.parquet(p1).count() === 200L)
  }

  test("a corrupted write fails loud (content stamp mismatch)") {
    val st = freshStage()
    val ex = intercept[IllegalStateException] {
      st.ensure(spark, dir, "t", "stamp1")(frame(10)) {
        // writes one row short of the source — a silent partial copy
        (df, p) => df.limit(9).write.mode("overwrite").parquet(p)
      }
    }
    assert(ex.getMessage.contains("content mismatch"))
  }

  test("a rewritten source (new stamp) re-stages under a new key") {
    val st = freshStage()
    var writes = 0
    def ens(stamp: String) =
      st.ensure(spark, dir, "t", stamp)(frame(5)) {
        (df, p) => writes += 1; df.write.mode("overwrite").parquet(p)
      }
    ens("v1"); ens("v1")
    assert(writes === 1)
    ens("v2")
    assert(writes === 2, "a new source stamp must invalidate the memo")
  }

  test("reaper deletes only DEAD pids' stale dirs — never live ones") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_reap_spec").toFile
    val pat = "spec_reap_(\\d+)_[0-9a-f]+".r
    val old = System.currentTimeMillis() - 2 * 3600L * 1000
    val livePid = ProcessHandle.current().pid()
    def mk(name: String) = {
      val f = new java.io.File(wh, name)
      assert(f.mkdirs()); assert(f.setLastModified(old)); f
    }
    // a LIVE sibling older than an hour (the r10 ADVICE scenario: a
    // long-running gate JVM) must keep its in-use stage
    val dead1 = mk(s"spec_reap_${livePid + 1000000}_ab") // dead, stale
    val dead2 = mk(s"spec_reap_99999999_cd")              // dead, stale
    val mine = mk(s"spec_reap_${livePid}_ef")           // own pid
    val aliveOther = {
      // find SOME other live pid (init is pid 1 in this container)
      val p = ProcessHandle.allProcesses().filter(h =>
        h.pid() != livePid && h.isAlive).findFirst()
      p.map[java.io.File](h => mk(s"spec_reap_${h.pid()}_99"))
        .orElse(null)
    }
    Staging.reapStale(wh, pat, livePid)
    assert(!dead1.exists(), "dead stale sibling must be reaped")
    assert(!dead2.exists(), "dead stale sibling must be reaped")
    assert(mine.exists(), "own dir must never be reaped")
    if (aliveOther != null)
      assert(aliveOther.exists(),
        "a LIVE sibling's dir must survive regardless of age")
  }

  test("ValueMemo builds once per key and isolates keys") {
    val m = new Staging.ValueMemo[Int]
    var builds = 0
    def get(k: String) = m.get(k) { builds += 1; builds }
    assert(get("a") === 1); assert(get("a") === 1)
    assert(get("b") === 2)
    assert(builds === 2)
  }
}
