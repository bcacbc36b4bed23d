package graft.tools

import org.apache.spark.sql.DataFrame

/** One-shot empirical check behind the r10 oracle upgrades of the three
  * rows-only production twins: prints, per twin, whether its output on
  * the gate corpus is IDENTICAL to a DuckDB-replayable computation —
  * (a) xxhash MinHash-LSH survivors vs the md5 twin's survivors (both
  *     are the exact-Jaccard-verified ≥ threshold pairs; equality means
  *     both hash families achieve the same recall on this corpus),
  * (b) xxhash SimHash survivor PAIRS vs the md5 family's pairs,
  * (c) auto-trained IVF top-k vs the same pipeline run through
  *     `topKPinned` with the centroids the auto path trains (equality
  *     certifies that pinning the trained centroids as oracle literals
  *     reproduces the trained lane bit-for-bit).
  * Run: `sbt "Test/runMain graft.tools.EquivalenceProbe [sfDir]"`.
  */
object EquivalenceProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-equiv-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    import graft.io.Tables

    def diff(name: String, a: DataFrame, b: DataFrame): Unit = {
      val extraA = a.exceptAll(b).count()
      val extraB = b.exceptAll(a).count()
      val na = a.count(); val nb = b.count()
      println(s"EQUIV $name: a=$na b=$nb onlyA=$extraA onlyB=$extraB " +
        (if (extraA == 0 && extraB == 0 && na == nb) "IDENTICAL"
         else "DIFFER"))
    }

    val docs = Tables.load(spark, dir, "documents", parallelize = true)

    val mhX = graft.dedup.Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleK = 3, numHashes = 128, bands = 32, threshold = 0.8)
    val mhM = graft.dedup.Dedup.nearDuplicatesOracled(docs, "doc_id",
      "text", shingleK = 3, numHashes = 128, bands = 32, threshold = 0.8)
    diff("minhash_xxhash_vs_md5", mhX, mhM)

    val shX = graft.dedup.SimHash.nearDuplicates(docs, "doc_id", "text",
      shingleK = 3, maxHamming = 12).select("id_a", "id_b")
    val shM = graft.SparkEntry.queries("dedup_simhash_documents")(
      spark, dir).select("id_a", "id_b")
    diff("simhash_xxhash_vs_md5_pairs", shX, shM)

    val emb = Tables.load(spark, dir, "embeddings")
    val n = Tables.rowCount(spark, dir, "embeddings")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id")
      < graft.sim.SimilarityQueries.QueryIds)
    val k = graft.sim.SimilarityQueries.K
    val trained = graft.sim.IvfSimilarity.topK(emb, queries, "vec_id",
      "embedding", k, corpusSize = Some(n))
      .select("query_id", "rank", "neighbor_id", "cosine")
    val nlist = graft.sim.IvfSimilarity.autoNlist(n)
    println(s"autoNlist($n) = $nlist")
    val model = graft.sim.IvfSimilarity.build(emb, "vec_id", "embedding",
      nlist)
    val pinnedRun = graft.sim.IvfSimilarity.topKPinned(emb, queries,
      "vec_id", "embedding", k, model.centroids, nprobe = 4)
      .select("query_id", "rank", "neighbor_id", "cosine")
    diff("ivf_trained_vs_pinned_same_centroids", trained, pinnedRun)
    model.close()

    spark.stop()
  }
}
