package graft.io

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("catalog scan reports engine types, nullability, length/precision") {
    val rows = Catalog.tableColumns(spark, sf, "customer").collect()
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("C_CUSTKEY", "C_NAME", "C_NATIONKEY", "C_ACCTBAL", "C_MKTSEGMENT"))
    val byName = rows.map(r => r.getString(1) ->
      (r.getString(2), r.getLong(4))).toMap
    assert(byName("C_CUSTKEY") === ("NUMBER", 38L))
    assert(byName("C_NAME") === ("VARCHAR", 16777216L))
    assert(byName("C_ACCTBAL") === ("FLOAT", 17L))
    assert(rows.map(_.getLong(5)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows.forall(_.getString(3) == "YES"))
  }

  test("temporal columns get datetime precision 6 (µs)") {
    val rows = Catalog.tableColumns(spark, sf, "events").collect()
    val ts = rows.find(_.getString(1) == "TS").get
    assert(ts.getString(2) === "TIMESTAMP")
    assert(ts.getLong(4) === 6L)
  }
}
