package graft.catalog

import graft.SparkSpec

class GlossarySpec extends SparkSpec {

  private def tmpPath(name: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_gloss_$name"
    Glossary.deleteForTest(p)
    p
  }

  test("create-if-absent yields an empty glossary") {
    val p = tmpPath("empty")
    assert(Glossary.read(spark, p).count() === 0)
    assert(Glossary.previousSummary(spark, p, None) ===
      "No previous entries found.")
  }

  test("regenerate writes one batch; per-table filter clears only its slice") {
    val p = tmpPath("regen")
    Glossary.regenerate(spark, p,
      Seq(("orders", "o_orderkey", "NUMBER"),
        ("orders", "o_totalprice", "FLOAT")), Some("orders"))
    Glossary.regenerate(spark, p,
      Seq(("region", "r_name", "VARCHAR")), Some("region"))
    val all = Glossary.read(spark, p)
    assert(all.count() === 3)
    // regenerating orders replaces its 2 rows, keeps region
    Glossary.regenerate(spark, p,
      Seq(("orders", "o_orderkey", "NUMBER")), Some("orders"))
    val after = Glossary.read(spark, p)
    assert(after.count() === 2)
    assert(after.filter("TABLE_NAME = 'REGION'").count() === 1)
  }

  test("definitions use the reference prompt through the stub") {
    val p = tmpPath("defs")
    Glossary.regenerate(spark, p, Seq(("t", "c", "NUMBER")), None)
    val d = Glossary.read(spark, p)
      .select("BUSINESS_DEFINITION").head().getString(0)
    assert(d.contains("[generated]"))
    assert(d.contains("business-friendly definition"))
  }

  test("no-filter regenerate clears everything first") {
    val p = tmpPath("clear")
    Glossary.regenerate(spark, p, Seq(("a", "x", "NUMBER")), None)
    Glossary.regenerate(spark, p, Seq(("b", "y", "NUMBER")), None)
    val all = Glossary.read(spark, p)
    assert(all.count() === 1)
    assert(all.head().getString(0) === "B")
  }
}
