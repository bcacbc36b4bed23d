package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("quota respected per stratum; small strata keep everything") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L)).toDF("grp", "id")
    val out = Sampling.stratifiedHead(df, Seq("grp"), "id", quota = 2)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("a") === 2L)
    assert(byGrp("b") === 1L) // under quota: all rows kept
  }

  test("selection is deterministic across runs and repartitionings") {
    val docs = Tables.load(spark, sf, "documents")
    def pick() = Sampling
      .stratifiedHead(docs, Seq("lang"), "doc_id", quota = 10)
      .select("doc_id").as[Long].collect().toSet
    val first = pick()
    val second = Sampling
      .stratifiedHead(docs.repartition(7), Seq("lang"), "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(first === second)
    assert(first.nonEmpty)
  }

  test("hash order is not id order (it actually shuffles the pick)") {
    val df = (1L to 100L).toDF("id").withColumn("grp", lit("x"))
    val picked = Sampling.stratifiedHead(df, Seq("grp"), "id", quota = 10)
      .select("id").as[Long].collect().toSet
    assert(picked !== (1L to 10L).toSet,
      "md5 order should differ from natural id order")
  }
}
