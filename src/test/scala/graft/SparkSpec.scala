package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (same config as the driver gates). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = {
    // Deferred teardown from any streams this suite ran (state-store
    // unload) — keeps finished streams' state maps from taxing later
    // suites' GC (the r6 scalatest win: 17 → 13 min).
    util.DeferredCleanup.drain()
    super.afterAll()
  }
}

object SparkSpec {
  // One session per JVM: sbt forks a single test JVM; per-suite sessions
  // would pay ~5s startup each.
  lazy val session: SparkSession = Sessions.local("graft-test")
}
