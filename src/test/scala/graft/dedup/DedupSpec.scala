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

  test("md5Base matches the cross-engine literal and the oracled " +
      "minhash lane recalls the same planted pairs as production") {
    // the DuckDB restatement ('0x' || substr(md5(x),1,15))::BIGINT of
    // 'hello world' — pinned as a literal so a drift in either engine's
    // md5/hex-parse semantics fails HERE, not as a gate hash mismatch
    val base = Seq("hello world").toDF("s")
      .select(Dedup.md5Base(col("s")).as("b")).head.getLong(0)
    assert(base === 426544247714475757L)
    // the native array loop (Md5Bases — what the gate lanes actually
    // run) must agree with the built-in conv/substr form per element
    val arr = Seq(Seq("hello world", "", "a b c", "αβγ"))
      .toDF("a")
    val native = arr.select(Dedup.md5Bases(col("a")).as("b"))
      .head.getSeq[Long](0)
    val builtin = arr
      .select(transform(col("a"), s => Dedup.md5Base(s)).as("b"))
      .head.getSeq[Long](0)
    assert(native === builtin)
    assert(native.head === 426544247714475757L)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val blocked = docs.select(col("doc_id"),
      substring(col("text"), 1, 80).as("blk"))
    val truthPairs = blocked.as("a")
      .join(blocked.as("b"), col("a.blk") === col("b.blk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val truth = Dedup.jaccardOnPairs(truthPairs, docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.8)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    // same recall contract as the xxhash pipeline: the hash family only
    // moves WHICH buckets collide, not the LSH physics
    val found = Dedup.nearDuplicatesOracled(docs, "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 32, threshold = 0.8)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(truth.nonEmpty && truth.subsetOf(found),
      s"oracled lane missed ${(truth -- found).size} of ${truth.size}")
  }

  test("sourceOverlap: planted cross-source duplicates count once, " +
      "disjoint pairs report 0.0, fingerprint ignores order/multiplicity") {
    val docs = Seq(
      (1L, "A", "shared doc one"),
      (2L, "A", "only in a"),
      (3L, "B", "one shared doc doc"), // bag-of-words ≡ doc 1 (set, sorted)
      (4L, "B", "only in b"),
      (5L, "C", "entirely separate text"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(docs, "source", "text")
      .orderBy("source_a", "source_b").collect()
    assert(out.length === 3) // AB, AC, BC — zero-overlap pairs included
    val ab = out(0)
    assert((ab.getString(0), ab.getString(1)) === ("A", "B"))
    assert(ab.getAs[Long]("common") === 1L)
    assert(ab.getAs[Double]("jaccard") === 1.0 / 3) // 1 / (2+2-1)
    assert(out(1).getAs[Long]("common") === 0L)
    assert(out(1).getAs[Double]("jaccard") === 0.0)
    assert(out(2).getAs[Long]("common") === 0L)
  }

  test("simhash pipeline recalls strong near-dups (quantified)") {
    // The quantified pin behind dedup_simhash_documents' rows-only gate:
    // recall of the chunk-blocked hamming<=12 pipeline against the
    // oracled blocked-Jaccard ground truth at >= 0.9 (strong dups share
    // most 3-shingles, so their fingerprints agree on most bits).
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val blocked = docs.select(col("doc_id"),
      substring(col("text"), 1, 80).as("blk"))
    val truthPairs = blocked.as("a")
      .join(blocked.as("b"), col("a.blk") === col("b.blk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val truth = Dedup.jaccardOnPairs(truthPairs, docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(truth.nonEmpty, "corpus should contain jaccard>=0.9 pairs")
    val found = graft.SparkEntry.queries("dedup_simhash_documents")(
        spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = (truth & found).size.toDouble / truth.size
    info(s"simhash recall vs jaccard>=0.9 = $recall " +
      s"(${(truth & found).size}/${truth.size})")
    // measured 0.846 on the fixture: the misses are short documents whose
    // 64-bit fingerprints are noisy enough to land hamming > 12 or to
    // share no 16-bit chunk — inherent simhash behavior, not a machinery
    // bug (MinHash-LSH is the high-recall path; this pin catches drift)
    assert(recall >= 0.8, s"simhash recall $recall below 0.8")
  }

  test("xxhash and md5 MinHash-LSH emit IDENTICAL survivors on the gate " +
      "corpus (the pin behind dedup_minhash_xxhash's equivalence oracle)") {
    // the xxhash production lane is oracled by the md5 twin's SQL —
    // sound because survivors are the exact-Jaccard-verified pairs
    // (hash-family-independent values) and both families achieve total
    // banding recall at 128/32. This pin re-proves the identity on the
    // ACTUAL gate corpus every test run, so a corpus regeneration or a
    // banding-parameter change that breaks the equivalence fails here
    // before the driver's gate goes red.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val x = Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleK = 3, numHashes = 128, bands = 32, threshold = 0.8)
    val m = Dedup.nearDuplicatesOracled(docs, "doc_id", "text",
      shingleK = 3, numHashes = 128, bands = 32, threshold = 0.8)
    assert(x.exceptAll(m).count() === 0L)
    assert(m.exceptAll(x).count() === 0L)
    assert(x.count() === m.count())
    spark.catalog.clearCache() // both pipelines persist internally
  }

  test("PRODUCTION SimHash.nearDuplicates (the xxhash 64-bit API " +
      "default) recalls strong near-dups and verifies every pair") {
    // the quantified correctness pin for the xxhash production form —
    // which is NOT gate-registered (no DuckDB oracle can reproduce a
    // family-defined survivor set; this spec + the ScaleProbe
    // dedup_simhash row ARE its coverage): same ground truth as the
    // md5 twin, the default 64-bit one-pass fingerprint family
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val blocked = docs.select(col("doc_id"),
      substring(col("text"), 1, 80).as("blk"))
    val truthPairs = blocked.as("a")
      .join(blocked.as("b"), col("a.blk") === col("b.blk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val truth = Dedup.jaccardOnPairs(truthPairs, docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(truth.nonEmpty)
    val out = SimHash.nearDuplicates(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    // cross rows ordered + verified; diagonal rows are hamming-0
    // groups at group grain (r15)
    out.foreach { case (a, b, h, na, nb) =>
      if (a == b) assert(h === 0L && na === nb && na >= 2L)
      else assert(a < b && h <= 12L)
    }
    val cross = out.filter(p => p._1 != p._2)
      .map(p => (p._1, p._2)).toSet
    // member-grain recall: a truth pair is found when both docs share
    // a fingerprint group (the diagonal report) or their group
    // REPRESENTATIVES survive as a cross pair — recomputed from the
    // same fingerprint projection the pipeline uses
    val repOf = docs
      .select(col("doc_id"), SimHash.simhash64(
        Dedup.wordShinglesFromTokens(
          Dedup.tokensOf(col("text")), 3)).as("fp"))
      .groupBy("fp").agg(collect_list("doc_id").as("ids"))
      .select("ids").as[Seq[Long]].collect()
      .flatMap { ids => val r = ids.min; ids.map(_ -> r) }.toMap
    val found = truth.filter { case (a, b) =>
      val (ra, rb) = (repOf(a), repOf(b))
      ra == rb || cross.contains((math.min(ra, rb), math.max(ra, rb)))
    }
    val recall = found.size.toDouble / truth.size
    info(s"production simhash recall vs jaccard>=0.9 = $recall " +
      s"(${found.size}/${truth.size})")
    assert(recall >= 0.8, s"production simhash recall $recall below 0.8")
    // no cartesian: candidates come from the chunk-key hash join
    assert(!SimHash.nearDuplicates(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString.contains("CartesianProduct"))
    spark.catalog.clearCache() // the pipeline persists internally
  }

  test("SimHash group collapse: a boilerplate pileup (identical docs) " +
      "reports ONE diagonal row, never the m²/2 within-group pairs") {
    val boiler = "lorem ipsum dolor sit amet " * 8
    val docs = ((1 to 5000).map(i => (i.toLong, boiler)) :+
      (9001L, "a genuinely different document about spark physical " +
        "plans and shuffle exchanges in distributed execution"))
      .toDF("doc_id", "text")
    val out = SimHash.nearDuplicates(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 0L, 5000L, 5000L)))
    spark.catalog.clearCache()
  }

  test("simhash 4x16 chunk blocking is lossless within hamming <= 3 " +
      "(pigeonhole: some chunk must match exactly)") {
    // fingerprints differing in ≤3 bits across 4 disjoint 16-bit chunks
    // must share at least one chunk — the blocking guarantee the
    // candidate filter rests on
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val fp = rnd.nextLong()
      val flips = rnd.nextInt(4) // 0..3 flipped bits
      val twin = (1 to flips).foldLeft(fp)((f, _) =>
        f ^ (1L << rnd.nextInt(64)))
      val chunksA = (0 until 4).map(i => (fp >>> (i * 16)) & 0xFFFFL)
      val chunksB = (0 until 4).map(i => (twin >>> (i * 16)) & 0xFFFFL)
      assert(chunksA.zip(chunksB).exists { case (x, y) => x == y },
        f"no shared chunk for fp=$fp%x twin=$twin%x")
    }
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

  test("embedding LSH: planted near-dup twins recalled, candidates O(n)") {
    // The fixture is an isotropic cloud with no true near-dups (max
    // pairwise cosine ≈ 0.5), so the DESIGN operating point — near-dups at
    // cosine ≥ 0.9 — is exercised by planting one jittered twin per
    // vector: twin = v̂ + α·û with α = 0.33 ⇒ cosine ≈ 1/√(1+α²) ≈ 0.95.
    val emb = graft.io.Tables.load(spark, sf, "embeddings")
    val base = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val rng = new scala.util.Random(11)
    val offset = 100000L
    def unit(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val twins = base.map { case (id, v) =>
      val u = unit(Seq.fill(v.length)(rng.nextGaussian()))
      val vhat = unit(v.map(_.toDouble))
      (id + offset,
        vhat.zip(u).map { case (a, b) => (a + 0.33 * b).toFloat })
    }
    val corpus = base.toSeq.toDF("vec_id", "embedding")
      .unionByName(twins.toSeq.toDF("vec_id", "embedding"))
    val n = base.length * 2L
    // ground truth from EXACT cosine of each (v, twin) pair — the jitter
    // scatters cosines ~0.93-0.97, so only verified-≥0.9 pairs count
    val planted = EmbeddingDedup.cosineOnPairs(
        base.map(b => (b._1, b._1 + offset)).toSeq.toDF("id_a", "id_b"),
        corpus, "vec_id", "embedding")
      .filter(col("cosine") >= 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(planted.size >= base.length * 9 / 10, "twin construction drifted")

    val cands = EmbeddingDedup.lshCandidatePairs(corpus, "vec_id",
      "embedding", corpusSize = Some(n))
    assert(!cands.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
    // THE round-3 regression pin: candidate volume must stay linear in
    // corpus size (fixed 4-bit buckets made it ~64% of ALL pairs).
    val candCount = cands.count()
    assert(candCount <= 32L * n,
      s"candidate pairs $candCount exceed 32·n (n=$n) — bucket width " +
        "stopped scaling with corpus size")

    val found = EmbeddingDedup.cosinePairsLsh(corpus, "vec_id",
        "embedding", threshold = 0.9, corpusSize = Some(n))
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val recall = (planted & found).size.toDouble / planted.size
    // analytic: p = 1−acos(0.95)/π ≈ 0.9, recall = 1−(1−p⁸)⁸ ≈ 0.99
    assert(recall >= 0.9,
      s"recall $recall < 0.9 at the cosine-0.95 design point " +
        s"(${(planted & found).size}/${planted.size})")
    found.foreach { case (a, b) => assert(a < b) }
  }

  test("embedding LSH recall at the isotropic tail matches the theory") {
    // At the fixture's cosine-0.3 tail (θ ≈ 72°, p ≈ 0.6 per bit) NO
    // O(n)-candidate LSH can recall well — ρ = ln p₁/ln p₂ ≈ 0.74 bounds
    // candidate work at n^1.74 for high recall. What IS checkable: the
    // measured recall equals the analytic 1−(1−pᵇ)ᴸ per-pair collision
    // curve. A machinery bug (wrong banding, broken bucket join) or a
    // silent return to degenerate buckets (recall ≈ 1 at 64%-of-pairs
    // cost) both blow the tolerance.
    val emb = graft.io.Tables.load(spark, sf, "embeddings")
    val truth = EmbeddingDedup.cosinePairsBlocked(emb, "vec_id",
        "embedding", "label", threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(truth.nonEmpty, "corpus should contain cosine>=0.3 pairs")
    val n = emb.count()
    val tables = 8
    val bits = graft.sim.Similarity.scaledBits(n, 32)
    val predicted = truth.map { case (_, _, c) =>
      val p = 1.0 - math.acos(math.min(1.0, c)) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, bits), tables)
    }.sum / truth.length
    val found = EmbeddingDedup.cosinePairsLsh(emb, "vec_id", "embedding",
        threshold = 0.3, tables = tables, corpusSize = Some(n))
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val truthPairs = truth.map(p => (p._1, p._2)).toSet
    val measured = (truthPairs & found).size.toDouble / truthPairs.size
    info(f"isotropic-tail recall: measured $measured%.3f vs " +
      f"analytic $predicted%.3f (bits=$bits)")
    assert(math.abs(measured - predicted) <= 0.15,
      f"recall $measured%.3f deviates from the analytic collision " +
        f"probability $predicted%.3f — LSH machinery or parameterization " +
        "drifted")
  }

  test("semantic decontam: planted paraphrase flagged with its argmax eval neighbor") {
    // eval vector e0 = (1,0,0); corpus: c1 ≈ e0 (paraphrase), c2 ⟂ e0
    val eval_ = Seq((0L, Seq(1f, 0f, 0f)), (10L, Seq(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.9f, 0.1f, 0f)), // near e0
      (2L, Seq(0f, 0f, 1f)))     // orthogonal to both
      .toDF("vec_id", "embedding")
    val out = EmbeddingDedup
      .evalOverlap(corpus, eval_, "vec_id", "embedding", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === Seq((1L, 0L)))
    assert(out.head._3 > 0.9)
  }

  test("semantic decontam: exact cosine ties break to the lowest eval id") {
    val eval_ = Seq((30L, Seq(1f, 0f)), (10L, Seq(1f, 0f)),
      (20L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val corpus = Seq((1L, Seq(2f, 0f))).toDF("vec_id", "embedding")
    val out = EmbeddingDedup
      .evalOverlap(corpus, eval_, "vec_id", "embedding", 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 10L, 1.0)))
  }

  test("semantic decontam plan: eval broadcasts; only corpus-grain rows shuffle") {
    val eval_ = Seq((0L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val corpus = (1 to 50).map(i => (i.toLong, Seq(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val plan = EmbeddingDedup
      .evalOverlap(corpus, eval_, "vec_id", "embedding", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"eval side must broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "the corpus-times-eval scoring must be a broadcast, never a " +
        "shuffled cartesian")
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

  test("survivorsLocal (driver union-find) equals distributed survivors") {
    val rng = new scala.util.Random(13)
    val edges = (1 to 40).map(_ =>
      (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val pairs = edges.toDF("id_a", "id_b")
    spark.catalog.clearCache()
    val local = Dedup.survivorsLocal(pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    // the fast path leaves nothing in the session cache
    assert(spark.sharedState.cacheManager.isEmpty)
    val dist = Dedup.survivors(pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(local === dist)
  }

  test("survivorsLocal past the edge bound stays DISTRIBUTED (no collect)") {
    // bound seam = 2 edges: the 4-edge graph must take the distributed
    // fallback, return the same clustering, and return it as a
    // checkpointed distributed frame — NOT a local relation funneled
    // through the driver (the round-4 hazard: a >2^20-edge graph's
    // membership set localized via Frames.localized).
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    spark.catalog.clearCache()
    val viaFallback = Dedup.survivorsLocal(pairs, maxLocalEdges = 2)
    val plan = viaFallback.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"big-graph fallback must checkpoint distributed, got:\n$plan")
    // nothing of the propagation stays in the SQL cache after the call
    // (it unpersists with blocking=false — poll briefly); checked BEFORE
    // the ground-truth call below, whose labels are caller-owned
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!spark.sharedState.cacheManager.isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(100)
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(viaFallback.as[(Long, Long, Boolean)].collect().toSet ===
      Dedup.survivors(pairs).as[(Long, Long, Boolean)].collect().toSet)
    spark.catalog.clearCache()
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
