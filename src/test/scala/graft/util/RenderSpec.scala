package graft.util

import graft.SparkSpec

class RenderSpec extends SparkSpec {
  import spark.implicits._

  test("markdownTable renders an aligned pipe table") {
    val df = Seq((1, "alice"), (22, "b")).toDF("id", "name")
    val md = Render.markdownTable(df)
    assert(md ===
      """#| id | name  |
        #|----|-------|
        #| 1  | alice |
        #| 22 | b     |""".stripMargin('#'))
  }

  test("markdownTable caps rows and renders nulls as empty") {
    val df = Seq((1, Some("x")), (2, None), (3, Some("z")))
      .toDF("id", "v")
    val md = Render.markdownTable(df, maxRows = 2)
    assert(md.linesIterator.size === 4) // header + sep + 2 rows
    assert(md.contains("| 2  |   |") || md.contains("| 2  |  |"))
  }

  test("maskingReport includes both samples and the pii map") {
    val before = Seq(("a@x.com")).toDF("email")
    val after = Seq(("a***@x.com")).toDF("email")
    val r = Render.maskingReport("customer", before, after,
      Map("email" -> "EMAIL"))
    assert(r.contains("### Original Table Sample (customer)"))
    assert(r.contains("### Masked Table Sample (customer_MASKED)"))
    assert(r.contains("**Columns Masked:** [email]"))
    assert(r.contains("email -> EMAIL"))
  }
}
