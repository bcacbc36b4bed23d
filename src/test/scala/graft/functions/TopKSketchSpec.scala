package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the Misra–Gries heavy-hitters aggregate in BOTH regimes:
  * exact (capacity ≥ #distinct — the oracled gate configuration) and
  * sketch (capacity < #distinct — the 100 TB configuration), plus the
  * SQL registration surface. The distributed runs below repartition the
  * input so partial buffers really serialize and merge.
  */
class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, colName: String,
      capacity: Int, k: Int): Seq[(String, Long)] =
    df.agg(VectorExpressions.approxTopK(col(colName), capacity, k)
        .as("tk"))
      .select(explode(col("tk")).as("e"))
      .select("e.value", "e.count")
      .as[(String, Long)].collect().toSeq

  private def exactCounts(df: org.apache.spark.sql.DataFrame,
      colName: String): Map[String, Long] =
    df.groupBy(col(colName)).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap

  // skewed fixture: value "v<i>" appears i*i times, i = 1..40 → n = 22140,
  // heavy tail at the top, long flat bottom
  private lazy val skewed = spark.sparkContext
    .parallelize((1 to 40).flatMap(i => Seq.fill(i * i)(s"v$i")), 8)
    .toDF("v")

  test("capacity ≥ #distinct degenerates to exact counts") {
    val got = topk(skewed, "v", capacity = 64, k = 40).toMap
    assert(got === exactCounts(skewed, "v"))
  }

  test("sketch regime keeps every value above the n/capacity guarantee") {
    val n = skewed.count()
    val capacity = 16
    val got = topk(skewed, "v", capacity, k = 16).toMap
    val exact = exactCounts(skewed, "v")
    // Misra–Gries guarantee: true frequency > n/capacity ⇒ value survives
    val mustSurvive = exact.filter(_._2 > n / capacity).keySet
    assert(mustSurvive.subsetOf(got.keySet),
      s"missing guaranteed heavy hitters: ${mustSurvive -- got.keySet}")
    // counts are never overestimated and undercount ≤ n/capacity per
    // merge level; with 8 partitions the summed bound still holds loosely
    got.foreach { case (v, c) =>
      assert(c <= exact(v), s"$v overestimated: $c > ${exact(v)}")
    }
  }

  test("top-k output is sorted (count desc, value asc) and truncated") {
    val got = topk(skewed, "v", capacity = 64, k = 5)
    assert(got.size === 5)
    assert(got === got.sortBy { case (v, c) => (-c, v) })
    assert(got.head._1 === "v40")
  }

  test("null inputs are ignored, empty input yields an empty array") {
    val withNulls = Seq(Some("a"), None, Some("a"), None)
      .toDF("v")
    assert(topk(withNulls, "v", 8, 3) === Seq(("a", 2L)))
    val empty = Seq.empty[String].toDF("v")
    assert(topk(empty, "v", 8, 3).isEmpty)
  }

  test("graft_topk is callable from SQL with literal sizes") {
    skewed.createOrReplaceTempView("topk_fixture")
    val rows = spark.sql(
      "SELECT graft_topk(v, 64, 3) AS tk FROM topk_fixture")
      .selectExpr("inline(tk)").collect()
    assert(rows.length === 3)
    assert(rows.head === Row("v40", 1600L))
  }

  test("non-literal capacity is rejected with a clear error") {
    skewed.createOrReplaceTempView("topk_fixture")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_topk(v, CAST(rand()*10 AS INT), 3) " +
        "FROM topk_fixture").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
