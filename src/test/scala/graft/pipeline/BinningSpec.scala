package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinningSpec extends SparkSpec {
  import spark.implicits._

  private def binsOf(rows: Seq[(String, Option[Double])], k: Int) =
    Binning.withQuantileBins(rows.toDF("g", "v"), "g", "v", k)
      .select("g", "v", "bin")
      .as[(String, Option[Double], Option[Int])].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("hand reference: quartiles of 1..10 split 3/2/2/3") {
    val out = binsOf((1 to 10).map(i => ("a", Some(i.toDouble))), k = 4)
    // cuts = p25, p50, p75 of 1..10 = 3.25, 5.5, 7.75
    assert(out.map(_._3.get) === Seq(1, 1, 1, 2, 2, 3, 3, 4, 4, 4))
  }

  test("a value exactly at a cut goes to the LOWER bin") {
    // 1..9: median (p50) is exactly 5 → 5 itself bins low
    val out = binsOf((1 to 9).map(i => ("a", Some(i.toDouble))), k = 2)
    assert(out.filter(_._2.contains(5.0)).head._3 === Some(1))
    assert(out.filter(_._2.contains(6.0)).head._3 === Some(2))
  }

  test("groups bin independently: same value, different group scales") {
    val out = binsOf(
      (1 to 4).map(i => ("small", Some(i.toDouble))) ++
        (1 to 4).map(i => ("big", Some(i * 1000.0))) :+
        (("big", Some(2.0))), k = 2)
    // 2.0 is top-half of `small` but rock-bottom of `big`
    assert(out.filter(r => r._1 == "small" && r._2.contains(2.0))
      .head._3 === Some(1))
    assert(out.filter(r => r._1 == "big" && r._2.contains(2.0))
      .head._3 === Some(1))
    assert(out.filter(r => r._1 == "big" && r._2.contains(4000.0))
      .head._3 === Some(2))
  }

  test("null values get a null bin, never bin 1") {
    val out = binsOf(Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None)),
      k = 2)
    assert(out.count(_._3.isEmpty) === 1)
    assert(out.filter(_._2.isEmpty).head._3.isEmpty)
  }

  test("bins cover 1..k and are monotone in the value") {
    val out = binsOf((1 to 100).map(i => ("a", Some(i.toDouble))), k = 10)
    assert(out.flatMap(_._3).distinct.sorted === (1 to 10))
    val sorted = out.sortBy(_._2)
    assert(sorted.map(_._3.get) === sorted.map(_._3.get).sorted)
  }

  test("rows are never dropped: null group and all-null group get null bins") {
    val df = Seq((Option("a"), Option(1.0)), (Option("a"), Option(2.0)),
      (None, Option(5.0)), (Option("allnull"), Option.empty[Double]))
      .toDF("g", "v")
    val out = Binning.withQuantileBins(df, "g", "v", 2)
    assert(out.count() === 4, "binning must preserve every input row")
    val nullGroup = out.filter(col("g").isNull)
      .select("bin").as[Option[Int]].collect()
    assert(nullGroup.toSeq === Seq(None))
    val allNull = out.filter(col("g") === "allnull")
      .select("bin").as[Option[Int]].collect()
    assert(allNull.toSeq === Seq(None))
  }

  test("plan: cut table broadcasts; no window over the corpus; no cartesian") {
    val df = (1 to 20).map(i => ("a", i.toDouble)).toDF("g", "v")
    val plan = Binning.withQuantileBins(df, "g", "v", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast cut-table join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"),
      "binning must not rank the corpus through a window")
  }
}
