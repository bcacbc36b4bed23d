package graft.text

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "source", "text")

  private def clean(rows: (Long, String, String)*) =
    Boilerplate.removeCommonLines(docsOf(rows: _*), "doc_id", "source",
        "text", minFrac = 0.5, minDocs = 2)
      .as[(Long, String, Long, Long, String)].collect().toSeq.sortBy(_._1)

  test("hand reference: the shared header goes, unique bodies stay") {
    val out = clean(
      (1L, "s", "HDR\nalpha"), (2L, "s", "HDR\nbeta"),
      (3L, "s", "HDR\ngamma"), (4L, "s", "HDR\ndelta"))
    assert(out.map(_._5) === Seq("alpha", "beta", "gamma", "delta"))
    assert(out.forall(r => r._3 === 2L && r._4 === 1L))
  }

  test("frequency is document frequency, not occurrence count") {
    // "SPAM" appears 3× but only in ONE doc of four → kept
    val out = clean(
      (1L, "s", "SPAM\nSPAM\nSPAM\na"), (2L, "s", "b"),
      (3L, "s", "c"), (4L, "s", "d"))
    assert(out.head._5 === "SPAM\nSPAM\nSPAM\na")
  }

  test("scope is per source: the same line is template in s1, content in s2") {
    val out = clean(
      (1L, "s1", "promo\nx1"), (2L, "s1", "promo\nx2"),
      (3L, "s2", "promo\ny1"), (4L, "s2", "y2"), (5L, "s2", "y3"),
      (6L, "s2", "y4"))
    assert(out.filter(_._2 == "s1").map(_._5) === Seq("x1", "x2"))
    assert(out.filter(_._2 == "s2").map(_._5).toSet
      === Set("promo\ny1", "y2", "y3", "y4"))
  }

  test("surviving lines keep their original order; full template → empty text") {
    val out = clean(
      (1L, "s", "TOP\none\nMID\ntwo\nBOT"),
      (2L, "s", "TOP\nMID\nBOT"),
      (3L, "s", "TOP\nthree\nMID\nBOT"),
      (4L, "s", "TOP\nMID\nfour\nBOT"))
    assert(out.map(_._5) === Seq("one\ntwo", "", "three", "four"))
    assert(out.map(_._4) === Seq(3L, 3L, 3L, 3L))
  }

  test("minDocs floors the threshold: a single-doc source keeps everything") {
    // ceil(0.5 · 1) = 1 would make EVERY line of a singleton doc template;
    // minDocs = 2 forbids that
    val out = clean((1L, "lonely", "only\nlines\nhere"))
    assert(out.head._5 === "only\nlines\nhere")
    assert(out.head._4 === 0L)
  }

  test("threshold fraction: a 25%-of-source line survives at minFrac 0.5") {
    val out = clean(
      (1L, "s", "HDR\npromo\na"), (2L, "s", "HDR\nb"),
      (3L, "s", "HDR\nc"), (4L, "s", "HDR\nd"))
    assert(out.head._5 === "promo\na")
  }

  test("a null-text document keeps its row (one row per input document)") {
    val df = Seq((1L, "s", Option("a\nb")), (2L, "s", Option.empty[String]))
      .toDF("doc_id", "source", "text")
    val out = Boilerplate
      .removeCommonLines(df, "doc_id", "source", "text")
      .as[(Long, String, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.size === 2, "null text must not drop the document")
    assert(out(1)._5 === "" && out(1)._3 === 1L)
  }

  test("plan: no cartesian; the boilerplate set broadcasts onto the lines") {
    val df = docsOf((1L, "s", "H\na"), (2L, "s", "H\nb"))
    val plan = Boilerplate.removeCommonLines(df, "doc_id", "source", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast of the common-line set in:\n$plan")
  }
}
