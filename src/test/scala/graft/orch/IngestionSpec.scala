package graft.orch

import graft.SparkSpec

class IngestionSpec extends SparkSpec {

  test("discovery -> codegen composition succeeds end to end") {
    val r = Ingestion.run(spark, "monthly revenue summary",
      "/root/testdata/sf0.001/orders.parquet")
    assert(r.status === "SUCCESS")
    assert(r.taskType === Some("aggregation"))
    assert(r.columns.map(_.columnName).contains("o_totalprice"))
    assert(r.sqlCode.exists(_.nonEmpty))
    assert(r.sparkCode.exists(_.nonEmpty))
  }

  test("a bad file path short-circuits to FAILED like the reference") {
    val r = Ingestion.run(spark, "whatever", "/nope/missing.parquet")
    assert(r.status === "FAILED")
    assert(r.error.nonEmpty)
  }

  test("unsupported format propagates the loader error") {
    val r = Ingestion.run(spark, "whatever", "/tmp/file.feather")
    assert(r.status === "FAILED")
    assert(r.error.exists(_.contains("Unsupported")))
  }
}
