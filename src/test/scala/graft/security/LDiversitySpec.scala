package graft.security

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LDiversitySpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, Option[String])], l: Int) =
    Pii.lDiversityViolations(rows.toDF("q", "s"), Seq(col("q")),
        col("s"), l)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)

  test("homogeneity attack: a k-large but single-valued group is flagged") {
    val rows = (1 to 10).map(_ => ("g1", Some("cancer"))) ++
      Seq(("g2", Some("a")), ("g2", Some("b")), ("g2", Some("c")))
    val out = audit(rows, l = 3)
    assert(out === Seq(("g1", 10L, 1L)))
  }

  test("a group meeting l distinct sensitive values passes") {
    val rows = Seq(("g", Some("a")), ("g", Some("b")), ("g", Some("a")))
    assert(audit(rows, l = 2).isEmpty)
    assert(audit(rows, l = 3) === Seq(("g", 3L, 2L)))
  }

  test("null is a sensitive value: it counts toward diversity") {
    // {a, null} is TWO disclosures-worth of diversity, not one
    val rows = Seq(("g", Some("a")), ("g", None))
    assert(audit(rows, l = 2).isEmpty)
  }

  test("an all-null group has diversity 1, not 0") {
    val rows = Seq(("g", None), ("g", None))
    assert(audit(rows, l = 2) === Seq(("g", 2L, 1L)))
  }

  test("l must exceed 1") {
    intercept[IllegalArgumentException] {
      Pii.lDiversityViolations(Seq(("g", "a")).toDF("q", "s"),
        Seq(col("q")), col("s"), 1)
    }
  }
}
