package graft.sim

import graft.SparkSpec

/** Tripwire for the `cluster_kmeans_embeddings` pinned oracle: the
  * LIVE seed-42 training the lane runs must still produce EXACTLY the
  * [[KmeansGatePinned]] literals on the gate corpus — corpus or
  * trainer drift fails `sbt test` with a regeneration hint instead of
  * surfacing as a driver hash-fail (the IvfGatePinned tripwire idiom;
  * the oracle additionally carries a DuckDB-side row-count guard).
  */
class KmeansGateDriftSpec extends SparkSpec {

  test("live gate-corpus training reproduces KmeansGatePinned") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.io.Tables.load(spark, dir, "embeddings")
    val n = graft.io.Tables.rowCount(spark, dir, "embeddings")
    assert(n === KmeansGatePinned.GateRows,
      "gate corpus size changed: regenerate KmeansGatePinned via " +
        "sbt \"Test/runMain graft.sim.PinKmeansCentroids\"")
    val live = Kmeans.fit(emb, "embedding", KmeansGatePinned.K,
      KmeansGatePinned.Iters, totalRows = Some(n))
    assert(live.length === KmeansGatePinned.centroids.length)
    for (i <- live.indices)
      assert(live(i).toSeq === KmeansGatePinned.centroids(i).toSeq,
        s"centroid $i drifted: regenerate KmeansGatePinned via " +
          "sbt \"Test/runMain graft.sim.PinKmeansCentroids\"")
  }
}
