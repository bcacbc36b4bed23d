package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("wordShingles produces n-k+1 shingles; short docs collapse to one") {
    val out = Seq("a b c d", "a b", "").toDF("t")
      .select(Dedup.wordShingles(col("t"), 3)).as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq("a b"))
    assert(out(2) === Seq.empty)
  }

  test("minhash signature: identical docs identical, disjoint docs differ") {
    val df = Seq(
      (1, "the quick brown fox jumps over the lazy dog again today"),
      (2, "the quick brown fox jumps over the lazy dog again today"),
      (3, "completely different words entirely unrelated content here now"))
      .toDF("id", "t")
      .select(col("id"),
        Dedup.minHashSignature(Dedup.wordShingles(col("t"), 3), 64)
          .as("sig"))
    val sigs = df.as[(Int, Seq[Long])].collect().sortBy(_._1).map(_._2)
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
    assert(sigs(0).length === 64)
  }

  test("near-dup pipeline finds planted high-jaccard pairs, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // ground truth: exact jaccard over prefix-blocked pairs (the corpus
    // plants near-dups by prefix; see driver TESTDATA generation)
    val blocked = docs.select(col("doc_id"),
      substring(col("text"), 1, 80).as("blk"))
    val truthPairs = blocked.as("a")
      .join(blocked.as("b"), col("a.blk") === col("b.blk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val truth = Dedup.jaccardOnPairs(truthPairs, docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.8)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet

    val found = Dedup.nearDuplicates(docs, "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 32, threshold = 0.8)
    val plan = found.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LSH pipeline must never plan a cartesian product")
    val foundPairs =
      found.as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(truth.nonEmpty, "corpus should contain planted near-dups")
    assert(truth.subsetOf(foundPairs),
      s"LSH missed ${(truth -- foundPairs).size} of ${truth.size} pairs")
    // jaccard >= 0.8 filter means no false positives by construction
    foundPairs.foreach { case (a, b) => assert(a < b) }
  }

  test("simhash: near-identical docs within small hamming distance") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away"
    val b = "the quick brown fox jumps over the lazy dog and runs far home"
    val c = "totally unrelated text about spark catalyst optimizer internals"
    val fps = Seq(a, b, c).toDF("t")
      .select(SimHash.simhash64(Dedup.wordShingles(col("t"), 3)))
      .as[Long].collect()
    val dAB = java.lang.Long.bitCount(fps(0) ^ fps(1))
    val dAC = java.lang.Long.bitCount(fps(0) ^ fps(2))
    assert(dAB < dAC, s"near-dup hamming $dAB should be < unrelated $dAC")
    assert(dAB <= 16)
  }

  test("embedding cosine near-dup: LSH recalls blocked pairs, no cartesian") {
    val emb = graft.io.Tables.load(spark, sf, "embeddings")
    val truth = EmbeddingDedup.cosinePairsBlocked(emb, "vec_id",
        "embedding", "label", threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val found = EmbeddingDedup.cosinePairsLsh(emb, "vec_id", "embedding",
      threshold = 0.3)
    val plan = found.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LSH pipeline must never plan a cartesian product")
    val foundPairs =
      found.as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(truth.nonEmpty, "corpus should contain cosine>=0.3 pairs")
    // sign-LSH at theta≈72deg is probabilistic; require >=70% recall of
    // the blocked ground truth and exact-cosine precision by construction
    val recall = (truth & foundPairs).size.toDouble / truth.size
    assert(recall >= 0.7, s"LSH recall $recall below 0.7 (|truth|=${truth.size})")
    foundPairs.foreach { case (a, b) => assert(a < b) }
  }

  test("exact dedup collapses identical texts") {
    val df = Seq((1, "same"), (2, "same"), (3, "other")).toDF("id", "text")
    assert(Dedup.exact(df, Seq("text")).count() === 2)
  }
}
