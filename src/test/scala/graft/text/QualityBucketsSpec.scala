package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the `corpus_quality_buckets_documents` composition (LM
  * score → profiler decile cuts → bucket roll-up) on a hand corpus.
  */
class QualityBucketsSpec extends SparkSpec {
  import spark.implicits._

  // replays the lane's composition on an arbitrary documents frame
  private def buckets(docs: org.apache.spark.sql.DataFrame) = {
    val scores = LmScore.score(docs, "doc_id", "text", topV = 64)
      .select(col("doc_id"), col("n_tokens"),
        (col("lm_score") * 1000).as("q"))
      .localCheckpoint(true)
    val ps = (1 to 9).map(_ / 10.0)
    val names = ps.indices.map(i => s"c$i")
    val cuts = graft.profile.Profiler
      .quantiles(scores, Seq("q"), ps, names)
      .select(array(names.map(n => round(col(n), 4)): _*).as("__cuts"))
    scores.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("q").isNull, lit(null).cast("int"))
          .otherwise((size(filter(col("__cuts"),
            c => c < col("q"))) + 1).cast("int")))
  }

  private def corpus = {
    // 40 docs across a quality gradient: low-score docs are OOV-dense
    // (unique gibberish tokens), high-score docs repeat corpus-typical
    // words; one empty doc exercises the null-bucket arm
    val docs = (1 to 39).map { i =>
      val fluent = Seq.fill(20)("the quick brown fox").mkString(" ")
      val noise = (1 to i).map(j => s"zx${i}q$j").mkString(" ")
      (i.toLong, s"$fluent $noise")
    } :+ (40L, "")
    docs.toDF("doc_id", "text")
  }

  test("every doc lands in exactly one bucket; empty doc gets null") {
    val b = buckets(corpus).select("doc_id", "bucket")
      .as[(Long, Option[Int])].collect().toMap
    assert(b.size === 40)
    assert(b(40L) === None, "token-less doc must take the null bucket")
    assert(b.filter(_._1 != 40L).values.forall(o =>
      o.exists(v => v >= 1 && v <= 10)))
  }

  test("buckets order by score: more OOV noise -> lower bucket") {
    val b = buckets(corpus)
      .filter(col("q").isNotNull)
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    // doc 1 (least noise, highest score) must sit in a strictly higher
    // bucket than doc 39 (most noise)
    assert(b(1L) > b(39L),
      s"fluent doc bucket ${b(1L)} must exceed noisy doc ${b(39L)}")
  }

  test("deciles are balanced within the interpolation ties") {
    val sizes = buckets(corpus).filter(col("bucket").isNotNull)
      .groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(sizes.keys.min >= 1 && sizes.keys.max <= 10)
    assert(sizes.values.sum === 39L)
    assert(sizes.values.max - sizes.values.min <= 2,
      s"decile cut should stay near-balanced, got $sizes")
  }
}
