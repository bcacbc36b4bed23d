package graft.pipeline

import graft.SparkSpec

class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  private def records(rows: (Long, String, Double, String)*) =
    rows.toSeq.toDF("id", "name", "bal", "seg")

  private def run(rows: (Long, String, Double, String)*) =
    GoldenRecord.resolve(records(rows: _*), "id", "name",
        maxDist = 1, rounds = 3,
        rules = Seq("bal" -> "max", "seg" -> "max"))
      .orderBy("cluster_name")
      .as[(String, Long, Long, Double, String)].collect().toSeq

  test("typo'd twin merges; max skips NULL; unmatched pass through") {
    val got = run(
      (1L, "alpha", 10.0, "A"),
      (100L, "alphx", 30.0, null),    // d=1 twin of alpha, null seg
      (2L, "gamma", 5.0, "B"))        // far from everything
    assert(got === Seq(
      ("alpha", 2L, 1L, 30.0, "A"),   // bal from twin, seg from parent
      ("gamma", 1L, 2L, 5.0, "B")))
  }

  test("transitive chains close into one cluster") {
    // aaaa ~ aaab ~ aaac: pairwise d=1 via the shared prefix
    val got = run(
      (3L, "aaaa", 1.0, "X"),
      (2L, "aaab", 2.0, "Y"),
      (1L, "aaac", 3.0, "Z"))
    assert(got.size === 1)
    val (cluster, n, gid, bal, seg) = got.head
    assert(cluster === "aaaa" && n === 3L && gid === 1L)
    assert(bal === 3.0 && seg === "Z")
  }

  test("no matches at all still yields one cluster per record") {
    val got = run((1L, "abcdef", 1.0, "A"), (2L, "uvwxyz", 2.0, "B"))
    assert(got.map(_._2) === Seq(1L, 1L))
  }

  test("unknown survivorship rule fails loud") {
    val e = intercept[IllegalArgumentException] {
      GoldenRecord.resolve(records((1L, "a", 1.0, "A")), "id", "name",
        1, 3, Seq("bal" -> "latest"))
    }
    assert(e.getMessage.contains("latest"))
  }
}
