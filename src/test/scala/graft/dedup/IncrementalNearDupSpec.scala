package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the incremental batch-vs-corpus NEAR-dup probe
  * ([[IncrementalNearDup]]) — the r11-verdict composition gap: X2's
  * banding probed per batch without re-scanning the corpus.
  */
class IncrementalNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** A w-word doc: "w{g}_0 w{g}_1 …", with words [from, until) replaced
    * by variant tokens — controls the exact shingle overlap.
    */
  private def doc(g: Int, w: Int, mutFrom: Int = -1,
      mutUntil: Int = -1): String =
    (0 until w).map(i =>
      if (i >= mutFrom && i < mutUntil) s"v${g}_$i" else s"w${g}_$i")
      .mkString(" ")

  // corpus: three base docs (distinct vocabularies per g) + one decoy
  private def corpus = Seq(
    1L -> doc(1, 40),
    2L -> doc(2, 40),
    3L -> doc(3, 40),
    4L -> doc(4, 40)
  ).toDF("doc_id", "text")

  // batch: 100 = near-dup of 1 (one mid word changed → j = 35/41 ≈
  // 0.854), 101 = exact dup of 2, 102 = distant variant of 3 (ten words
  // changed → far under threshold), 103 = novel, 104/105 = near-dups of
  // EACH OTHER but of nothing in the corpus (batch-internal — out of
  // scope by contract)
  private def batch = Seq(
    100L -> doc(1, 40, 20, 21),
    101L -> doc(2, 40),
    102L -> doc(3, 40, 10, 20),
    103L -> doc(9, 40),
    104L -> doc(8, 40),
    105L -> doc(8, 40, 20, 21)
  ).toDF("doc_id", "text")

  /** Driver-side exact reference: the same trim-split tokens, 3-word
    * shingles (≤3 tokens → one joined shingle), distinct sets, brute
    * jaccard over the FULL batch × corpus cross product.
    */
  private def bruteReference(threshold: Double): Set[(Long, Long)] = {
    def shingles(text: String): Set[String] = {
      val t = text.trim
      val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+")
      if (toks.isEmpty) Set.empty
      else if (toks.length <= 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val c = Seq(1L -> doc(1, 40), 2L -> doc(2, 40), 3L -> doc(3, 40),
      4L -> doc(4, 40)).map { case (id, t) => id -> shingles(t) }
    val b = Seq(100L -> doc(1, 40, 20, 21), 101L -> doc(2, 40),
      102L -> doc(3, 40, 10, 20), 103L -> doc(9, 40),
      104L -> doc(8, 40), 105L -> doc(8, 40, 20, 21))
      .map { case (id, t) => id -> shingles(t) }
    (for {
      (bid, bs) <- b; (cid, cs) <- c
      j = (bs & cs).size.toDouble / math.max((bs | cs).size, 1)
      if j >= threshold
    } yield (bid, cid)).toSet
  }

  test("md5 probe equals the brute batch-x-corpus reference (recall 1)") {
    val got = IncrementalNearDup
      .probeOracled(corpus, batch, "doc_id", "text")
      .select("batch_id", "dup_of")
      .as[(Long, Long)].collect().toSet
    assert(got === bruteReference(0.8),
      "banded probe must equal the exhaustive verify at 128/32")
    assert(got.contains((100L, 1L)) && got.contains((101L, 2L)),
      "the planted near-dup and exact-dup must both surface")
    assert(!got.exists(p => p._1 == 104L || p._1 == 105L),
      "batch-internal near-dups are out of scope by contract")
  }

  test("xxhash production probe matches the md5 twin survivor-for-survivor") {
    val md5Rows = IncrementalNearDup
      .probeOracled(corpus, batch, "doc_id", "text")
      .select("batch_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val xxRows = IncrementalNearDup
      .probe(corpus, batch, "doc_id", "text")
      .select("batch_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(xxRows === md5Rows,
      "survivors are exact-verified, hence hash-family-independent " +
        "at total banding recall")
  }

  test("degenerate corpus buckets drop at maxBucket; singletons match") {
    // three identical corpus docs: every band bucket has 3 members
    val heavyCorpus = Seq(1L -> doc(1, 40), 2L -> doc(1, 40),
      3L -> doc(1, 40)).toDF("doc_id", "text")
    val probeBatch = Seq(100L -> doc(1, 40)).toDF("doc_id", "text")
    val bounded = IncrementalNearDup.probeOracled(heavyCorpus,
      probeBatch, "doc_id", "text", maxBucket = 2)
    assert(bounded.count() === 0L,
      "buckets past maxBucket must drop — the quadratic-blowup guard")
    val unbounded = IncrementalNearDup.probeOracled(heavyCorpus,
      probeBatch, "doc_id", "text", maxBucket = 64)
    assert(unbounded.count() === 3L, "within the bound all match")
    // a SINGLE corpus member is a legitimate target (no lower bound —
    // unlike the self-join lanes' [2, maxBucket])
    val single = IncrementalNearDup.probeOracled(
      Seq(1L -> doc(1, 40)).toDF("doc_id", "text"),
      probeBatch, "doc_id", "text")
    assert(single.count() === 1L,
      "a singleton corpus bucket must still match the probe")
  }

  test("probe plan never sort-merge-joins (corpus is streamed, not shuffled)") {
    val out = IncrementalNearDup.probeOracled(corpus, batch, "doc_id",
      "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "under the broadcast gate every join must be broadcast-hash — " +
        "an SMJ means the corpus side got shuffled")
  }

  test("admission composes as an anti-join on batch_id") {
    val m = IncrementalNearDup.probeOracled(corpus, batch, "doc_id",
      "text")
    val admitted = batch.join(m.select(col("batch_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(102L, 103L, 104L, 105L),
      "novel + below-threshold batch docs are admitted")
  }
}
