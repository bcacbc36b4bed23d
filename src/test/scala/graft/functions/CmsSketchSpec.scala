package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.profile.Cms

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 4
  private val Width = 64

  private def estimates(values: Seq[String], depth: Int = Depth,
      width: Int = Width, parts: Int = 4) = {
    val df = values.toDF("v").repartition(parts)
    val ctr = df.agg(VectorExpressions.cms($"v", depth, width).as("ctr"))
    df.distinct()
      .crossJoin(ctr)
      .select($"v", Cms.estimate($"ctr", $"v", depth, width).as("est"))
      .as[(String, Long)].collect().toMap
  }

  private val corpus =
    Seq.fill(10)("apple") ++ Seq.fill(5)("pear") ++ Seq.fill(1)("yuzu")

  test("wide sketch is exact: estimates equal true counts") {
    assert(estimates(corpus) ===
      Map("apple" -> 10L, "pear" -> 5L, "yuzu" -> 1L))
  }

  test("counters are exact slot sums: layout-independent") {
    def counters(parts: Int) =
      corpus.toDF("v").repartition(parts)
        .agg(VectorExpressions.cms($"v", Depth, Width).as("ctr"))
        .as[Seq[Long]].head()
    val one = counters(1)
    assert(one === counters(7), "partition layout must not matter")
    // every depth row conserves total mass
    (0 until Depth).foreach { d =>
      assert(one.slice(d * Width, (d + 1) * Width).sum === corpus.size,
        s"depth row $d must sum to n")
    }
  }

  test("collision regime never undercounts") {
    // width 2, depth 1: heavy forced collisions
    val est = estimates(corpus, depth = 1, width = 2)
    val truth = corpus.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (v, cnt) =>
      assert(est(v) >= cnt, s"$v estimated ${est(v)} < true $cnt")
    }
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("v")
    val ctr = df.agg(VectorExpressions.cms($"v", 2, 8).as("ctr"))
      .as[Seq[Long]].head()
    assert(ctr.sum === 4L, "two depth rows × two non-null rows")
  }

  test("SQL surface: graft_cms(value, depth, width) is registered") {
    val est = Seq("a", "a", "b").toDF("v").createOrReplaceTempView("cms_in")
    val ctr = spark.sql(
      "SELECT graft_cms(v, 2, 16) AS ctr FROM cms_in")
      .as[Seq[Long]].head()
    assert(ctr.sum === 6L)
    assert(ctr.length === 32)
  }
}
