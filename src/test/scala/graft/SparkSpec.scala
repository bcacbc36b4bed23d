package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (same config as the driver gates). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Runs `body` and asserts it left no NEW persisted RDDs behind
    * (cache-lifecycle pin: an operator that persists must release —
    * itself, or via its documented caller-release contract exercised by
    * the test). Pre-existing entries from earlier suites on the shared
    * session are excluded; async `unpersist(blocking = false)` gets a
    * short drain window before the check fails.
    */
  def assertNoNewPersists[A](body: => A): A = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = body
    def leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    val deadline = System.nanoTime() + 2000000000L
    while (leaked.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(leaked.isEmpty, s"persisted RDDs leaked by body: $leaked")
    out
  }

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
