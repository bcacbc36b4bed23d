package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-document duplicated-span profile: coverage interval-union fold,
  * cross-doc (not intra-doc) duplication semantics, short-doc edges, and
  * the no-cartesian plan shape.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def covered(pos: Seq[Int], w: Int): Long =
    Seq(pos).toDF("p")
      .select(SpanDedup.coveredTokens(col("p"), w).as("c"))
      .head.getLong(0)

  test("coveredTokens: disjoint, overlapping, nested, and unsorted input") {
    assert(covered(Seq(0), 8) === 8)
    assert(covered(Seq(0, 20), 8) === 16) // disjoint
    assert(covered(Seq(0, 4), 8) === 12) // overlap: [0,12)
    assert(covered(Seq(0, 1, 2), 8) === 10) // chain: [0,10)
    assert(covered(Seq(4, 0), 8) === 12) // unsorted input sorts first
    assert(covered(Seq(0, 2, 4, 6), 4) === 10) // stitched: [0,10)
    assert(covered(Seq.empty[Int], 8) === 0)
  }

  test("property: coveredTokens equals brute-force interval union over " +
      "random position multisets and widths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.choose(1, 12)
      pos <- Gen.listOf(Gen.choose(0, 60))
    } yield (w, pos)
    // scalatest↔scalacheck bridge isn't in the offline cache — drive
    // the generator manually with deterministic seeds (SplitterSpec
    // pattern); batch cases into one Spark job per distinct width
    val cases = (1 to 120).flatMap { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    cases.groupBy(_._1).foreach { case (w, group) =>
      val brute = group.map { case (_, pos) =>
        pos.flatMap(p => p until p + w).distinct.size.toLong
      }
      val got = group.zipWithIndex.map { case ((_, pos), i) => (i, pos) }
        .toDF("i", "p")
        .select(col("i"), SpanDedup.coveredTokens(col("p"), w).as("c"))
        .orderBy("i").collect().map(_.getLong(1)).toSeq
      assert(got === brute, s"width $w")
    }
  }

  test("a span repeated only WITHIN one doc is not duplicated; the same " +
      "span across two docs is, and every doc appears in the output") {
    val w8 = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = Seq(
      (1L, s"$w8 filler $w8"), // intra-doc repeat only
      (2L, s"lead $w8 tail"), // shares the window with doc 3
      (3L, s"$w8 something else entirely distinct"),
      (4L, "too short"), // < 8 tokens → 0 spans
      (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")) // unique spans
      .toDF("doc_id", "text")
    val out = SpanDedup.spanProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length === 5)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 1: the repeated window is duplicated only intra-doc... but doc 3
    // also contains it → all its occurrences count as duplicated
    assert(byId(1L).getAs[Long]("dup_spans") > 0)
    // doc 2 and 3 share the 8-token window → each has ≥1 dup span with
    // exactly 8 covered tokens for the lone shared window in doc 2
    assert(byId(2L).getAs[Long]("dup_spans") === 1L)
    assert(byId(2L).getAs[Long]("covered_tokens") === 8L)
    assert(byId(4L).getAs[Long]("n_spans") === 0L)
    assert(byId(4L).getAs[Long]("dup_spans") === 0L)
    assert(byId(4L).getAs[Double]("dup_token_ratio") === 0.0)
    assert(byId(5L).getAs[Long]("dup_spans") === 0L)
  }

  test("intra-doc-only repetition does NOT mark spans duplicated when no " +
      "other doc shares them") {
    val w8 = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = Seq(
      (1L, s"$w8 mid $w8"), // repeats internally, unique corpus-wide
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"))
      .toDF("doc_id", "text")
    val out = SpanDedup.spanProfile(docs, "doc_id", "text")
      .filter(col("doc_id") === 1L).head
    assert(out.getAs[Long]("dup_spans") === 0L)
    assert(out.getAs[Long]("covered_tokens") === 0L)
  }

  test("fully-duplicated docs cover ~all tokens; plan has no cartesian") {
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val df = SpanDedup.spanProfile(docs, "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"span profile must never cartesian:\n$plan")
    val rows = df.collect()
    assert(rows.forall(r => r.getAs[Long]("covered_tokens") === 40L))
    assert(rows.forall(r => r.getAs[Double]("dup_token_ratio") === 1.0))
  }
}
