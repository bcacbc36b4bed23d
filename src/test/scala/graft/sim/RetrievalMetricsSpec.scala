package graft.sim

import graft.SparkSpec

class RetrievalMetricsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic 6-dim vectors in 3 label clusters around orthogonal
  // axes with small trig jitter — same-label pairs are near, cross-label
  // pairs far, but jitter keeps ranks nontrivial
  private def vec(label: Int, i: Int): Seq[Double] = {
    val base = Array.fill(6)(0.0)
    base(label * 2) = 1.0
    base.indices.map(d =>
      base(d) + 0.15 * math.sin(1.3 * i + 0.7 * d + label)).toSeq
  }

  private def corpus = (0 until 30).map { i =>
    val label = i % 3
    (i.toLong, vec(label, i), label)
  }.toDF("vec_id", "embedding", "label")

  private def driverRef(k: Int): Map[Long, (Long, Long, Option[Int])] = {
    val rows = (0 until 30).map { i => (i.toLong, vec(i % 3, i), i % 3) }
    val queries = rows.filter(_._1 < 5)
    queries.map { case (qid, qv, ql) =>
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        if (na * nb == 0) 0.0 else d / (na * nb)
      }
      val others = rows.filter(_._1 != qid)
        .map { case (id, v, l) => (id, l, cos(qv, v)) }
        .sortBy { case (id, _, c) => (-c, id) }
      val nRel = others.count(_._2 == ql).toLong
      val top = others.take(k)
      val hits = top.count(_._2 == ql).toLong
      val firstRank = top.zipWithIndex.collectFirst {
        case ((_, l, _), idx) if l == ql => idx + 1 }
      qid -> ((nRel, hits, firstRank))
    }.toMap
  }

  test("metrics equal the exact driver reference (k = 5)") {
    val k = 5
    val got = Similarity.retrievalMetrics(corpus,
        corpus.filter($"vec_id" < 5), "vec_id", "embedding", "label", k)
      .as[(Long, Int, Long, Long, Option[Double], Option[Long], Double)]
      .collect().map(r => r._1 -> r).toMap
    val ref = driverRef(k)
    assert(got.keySet === ref.keySet)
    for ((qid, (nRel, hits, fr)) <- ref) {
      val (_, _, gNRel, gHits, gRecall, gFr, gRr) = got(qid)
      assert(gNRel === nRel, s"n_relevant at $qid")
      assert(gHits === hits, s"hits at $qid")
      assert(gRecall === Some(hits.toDouble / math.min(k, nRel)),
        s"recall at $qid")
      assert(gFr === fr.map(_.toLong), s"first_rank at $qid")
      assert(gRr === fr.map(1.0 / _).getOrElse(0.0), s"rr at $qid")
    }
  }

  test("a label with no other corpus member yields NULL recall, rr 0") {
    val df = Seq(
      (1L, Seq(1.0, 0.0), 7), // the only label-7 vector
      (2L, Seq(0.9, 0.1), 1),
      (3L, Seq(0.8, 0.2), 1))
      .toDF("vec_id", "embedding", "label")
    val row = Similarity.retrievalMetrics(df, df.filter($"vec_id" === 1),
        "vec_id", "embedding", "label", 2)
      .as[(Long, Int, Long, Long, Option[Double], Option[Long], Double)]
      .collect().head
    assert(row._3 === 0L)            // n_relevant
    assert(row._4 === 0L)            // hits
    assert(row._5 === None)          // recall undefined
    assert(row._6 === None)          // first_rank
    assert(row._7 === 0.0)           // rr
  }

  test("perfect clustering gives recall 1 and rr 1 at k <= cluster size") {
    // tight clusters, zero jitter: every same-label neighbor outranks
    // every cross-label one
    val df = (0 until 12).map { i =>
      val l = i % 2
      (i.toLong, Seq(if (l == 0) 1.0 else 0.0,
        if (l == 0) 0.0 else 1.0, 0.01 * (i / 2)), l)
    }.toDF("vec_id", "embedding", "label")
    val rows = Similarity.retrievalMetrics(df, df.filter($"vec_id" < 4),
        "vec_id", "embedding", "label", 3)
      .as[(Long, Int, Long, Long, Option[Double], Option[Long], Double)]
      .collect()
    assert(rows.forall(_._5 === Some(1.0)), "recall@3 must be 1")
    assert(rows.forall(_._7 === 1.0), "rr must be 1")
  }
}
