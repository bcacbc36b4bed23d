package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // fixture: dl and tf known by construction
  private lazy val docs = Seq(
    (1L, "cat cat cat dog"),       // tf(cat)=3 tf(dog)=1 dl=4
    (2L, "cat dog dog dog dog"),   // tf(cat)=1 tf(dog)=4 dl=5
    (3L, "bird bird bird"),        // no query terms
    (4L, "cat"),                   // tf(cat)=1 dl=1
    (5L, "")                       // empty doc: dl=0
  ).toDF("doc_id", "text")

  /** Driver-side reference of the rational-idf score. */
  private def ref(tf: Map[String, Long], dl: Long, n: Long, dTot: Long,
      df: Map[String, Long], terms: Seq[String]): Double =
    terms.map { t =>
      tf.get(t) match {
        case None => 0.0
        case Some(f) =>
          val idf = (2.0 * n - 2 * df(t) + 1) / (2.0 * df(t) + 1)
          val sat = (22.0 * dTot * f) /
            (10.0 * dTot * f + 3.0 * dTot + 9.0 * dl * n)
          idf * sat
      }
    }.sum

  test("rational-idf scores match the closed form and docs without " +
      "query terms are absent") {
    val out = Bm25.rank(docs, "doc_id", "text", Seq("cat", "dog"), k = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getDouble(2)))
      .toMap
    // corpus: n=5 docs, d_total = 4+5+3+1+0 = 13 tokens
    val df = Map("cat" -> 3L, "dog" -> 2L)
    def s(tf: Map[String, Long], dl: Long) =
      ref(tf, dl, 5, 13, df, Seq("cat", "dog"))
    assert(out.keySet === Set(1L, 2L, 4L)) // 3 and 5 have no terms
    assert(out(1L)._2 === s(Map("cat" -> 3L, "dog" -> 1L), 4))
    assert(out(2L)._2 === s(Map("cat" -> 1L, "dog" -> 4L), 5))
    assert(out(4L)._2 === s(Map("cat" -> 1L), 1))
    // ranks follow (score desc, doc_id asc)
    val byRank = out.toSeq.sortBy(_._2._1).map(_._1)
    val byScore = out.toSeq.sortBy { case (id, (_, sc)) => (-sc, id) }
      .map(_._1)
    assert(byRank === byScore)
  }

  test("k cuts the tail deterministically") {
    val top1 = Bm25.rank(docs, "doc_id", "text", Seq("cat", "dog"), k = 1)
      .collect()
    assert(top1.length === 1 && top1.head.getLong(0) === 1L)
  }

  test("log-idf production form ranks the fixture identically to the " +
      "rational form (log is monotone; the fixture doesn't split " +
      "matches adversarially)") {
    def ranking(rational: Boolean) =
      Bm25.rank(docs, "doc_id", "text", Seq("cat", "dog"), k = 10,
          rationalIdf = rational)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(ranking(rational = true) === ranking(rational = false))
  }

  test("precomputed corpusStats skip the stats scan and reproduce the " +
      "same scores") {
    val auto = Bm25.rank(docs, "doc_id", "text", Seq("cat"), k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val pinned = Bm25.rank(docs, "doc_id", "text", Seq("cat"), k = 10,
        corpusStats = Some((5L, 13L)))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(auto === pinned)
  }

  test("term filter is an In over literals evaluated before the " +
      "aggregation (only query-term tokens shuffle) and the plan has " +
      "no Window operator") {
    val plan = Bm25.rank(docs, "doc_id", "text", Seq("cat", "dog"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("term#") || plan.contains("IN (cat,dog)") ||
      plan.toLowerCase.contains("cat"))
    assert(!plan.contains("Window"))
  }

  test("a query term absent from the whole corpus contributes zero " +
      "instead of failing") {
    val out = Bm25.rank(docs, "doc_id", "text", Seq("cat", "unicorn"),
        k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val only = Bm25.rank(docs, "doc_id", "text", Seq("cat"), k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out === only)
  }
}
