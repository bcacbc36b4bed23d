package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd1Spec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*) =
    rows.toDF("k", "v", "payload")

  test("latestPerKey keeps the single newest row per key") {
    val in = df((1, 1, "old"), (1, 2, "new"), (2, 5, "only"))
    val out = Scd1.latestPerKey(in, Seq("k"), "v").orderBy("k")
      .as[(Int, Int, String)].collect()
    assert(out === Array((1, 2, "new"), (2, 5, "only")))
  }

  test("latestPerKey breaks order ties deterministically") {
    val in = Seq((1, 1, 10, "a"), (1, 1, 20, "b")).toDF("k", "v", "id", "p")
    val out = Scd1.latestPerKey(in, Seq("k"), "v", tieBreakers = Seq("id"))
      .as[(Int, Int, Int, String)].collect()
    assert(out === Array((1, 1, 20, "b")))
  }

  test("merge overwrites matched keys and keeps unmatched target rows") {
    val target = df((1, 1, "t1"), (2, 1, "t2"), (3, 1, "t3"))
    val source = df((2, 9, "s2-old"), (2, 10, "s2"), (4, 1, "s4"))
    val out = Scd1.merge(target, source, Seq("k"), "v").orderBy("k")
      .as[(Int, Int, String)].collect()
    assert(out === Array((1, 1, "t1"), (2, 10, "s2"), (3, 1, "t3"),
      (4, 1, "s4")))
  }

  test("merge is idempotent: re-merging the same source changes nothing") {
    val target = df((1, 1, "t1"), (2, 1, "t2"))
    val source = df((2, 10, "s2"), (4, 1, "s4"))
    val once = Scd1.merge(target, source, Seq("k"), "v")
    val twice = Scd1.merge(once, source, Seq("k"), "v")
    assert(twice.orderBy("k").collect() === once.orderBy("k").collect())
  }

  test("merge plan has no cartesian product and shuffles on the key") {
    val target = df((1, 1, "t1"))
    val source = df((2, 10, "s2"))
    val plan = Scd1.merge(target, source, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
