package graft.dq

import graft.SparkSpec

class RuleSuiteSpec extends SparkSpec {
  import spark.implicits._
  import RuleSuite.Rule

  private val df = Seq(
    (Some(1L), "O", 10.0, "1-URGENT"),
    (Some(2L), "F", -5.0, "5-LOW"),
    (Some(2L), "X", 120.0, "oops"),
    (None, "O", 50.0, "3-MEDIUM"))
    .toDF("k", "status", "price", "prio")

  private def run(rules: Rule*) =
    RuleSuite.run(df, rules)
      .as[(String, String, String, Double, Double, Boolean)]
      .collect().toSeq

  test("hand metrics: every check kind against known violations") {
    val got = run(
      Rule("k_complete", "k", "complete", 1.0),
      Rule("k_unique", "k", "unique", 1.0),
      Rule("status_ok", "status", "accepted", 0.9, "O,F"),
      Rule("price_pos", "price", "min_at_least", 0.0),
      Rule("price_cap", "price", "max_at_most", 100.0),
      Rule("price_band", "price", "between_frac", 0.5, "0,100"),
      Rule("prio_fmt", "prio", "matches", 0.75, "^[0-9]-[A-Z]+$"))
    val byName = got.map(r => r._1 -> r).toMap
    assert(byName("k_complete")._4 === 0.75 && !byName("k_complete")._6)
    assert(byName("k_unique")._4 === 0.5 && !byName("k_unique")._6)
    assert(byName("status_ok")._4 === 0.75 && !byName("status_ok")._6)
    assert(byName("price_pos")._4 === -5.0 && !byName("price_pos")._6)
    assert(byName("price_cap")._4 === 120.0 && !byName("price_cap")._6)
    assert(byName("price_band")._4 === 0.5 && byName("price_band")._6)
    assert(byName("prio_fmt")._4 === 0.75 && byName("prio_fmt")._6)
  }

  test("report carries declaration metadata verbatim") {
    val got = run(Rule("r1", "status", "accepted", 0.25, "O"))
    assert(got === Seq(("r1", "status", "accepted", 0.5, 0.25, true)))
  }

  test("an empty input reports NULL metrics, never a divide-by-zero") {
    val empty = df.filter($"price" > 1e9)
    val got = RuleSuite.run(empty, Seq(
      Rule("c", "k", "complete", 1.0),
      Rule("m", "price", "min_at_least", 0.0))).collect()
    assert(got.forall(_.isNullAt(3)), "metrics must be NULL on empty")
    assert(got.forall(_.isNullAt(5)), "passed must be NULL, not false")
  }

  test("unknown kinds and duplicate names fail loud") {
    val e1 = intercept[IllegalArgumentException] {
      run(Rule("r", "k", "bogus", 1.0))
    }
    assert(e1.getMessage.contains("bogus"))
    val e2 = intercept[IllegalArgumentException] {
      run(Rule("r", "k", "complete", 1.0),
        Rule("r", "status", "complete", 1.0))
    }
    assert(e2.getMessage.contains("unique"))
  }
}
