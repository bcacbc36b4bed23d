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

  test("clusters: min-label propagation equals driver union-find on random graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 12 + rng.nextInt(12)
      val edges = (1 to n).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v)).toMap

      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
      assert(got === truth, s"trial $trial (n=$n, |E|=${edges.size})")
    }
  }

  test("clusters of an empty pair set is an empty clustering, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(empty).isEmpty)
    assert(Dedup.survivors(empty).isEmpty)
  }

  test("survivors marks exactly one survivor per cluster (the min id)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.survivors(pairs).as[(Long, Long, Boolean)].collect()
    val byCluster = out.groupBy(_._1)
    assert(byCluster.keySet === Set(1L, 10L))
    byCluster.foreach { case (c, members) =>
      assert(members.count(_._3) === 1)
      assert(members.filter(_._3).head._2 === c)
      assert(members.map(_._2).min === c)
    }
  }
}
