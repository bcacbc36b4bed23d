package graft.sim

import graft.SparkSpec

/** Tripwire for the `emb_pca_embeddings` pinned oracle: the LIVE
  * seed-42 training the lane runs must still produce EXACTLY the
  * [[PcaGatePinned]] literals on the gate corpus — corpus or trainer
  * drift fails `sbt test` with a regeneration hint instead of
  * surfacing as a driver hash-fail (the KmeansGateDriftSpec idiom; the
  * oracle additionally carries a DuckDB-side row-count guard).
  */
class PcaGateDriftSpec extends SparkSpec {

  test("live gate-corpus training reproduces PcaGatePinned") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.io.Tables.load(spark, dir, "embeddings")
    val n = graft.io.Tables.rowCount(spark, dir, "embeddings")
    assert(n === PcaGatePinned.GateRows,
      "gate corpus size changed: regenerate PcaGatePinned via " +
        "sbt \"Test/runMain graft.sim.PinPcaModel\"")
    val live = Pca.fit(emb, "vec_id", "embedding", PcaGatePinned.P,
      totalRows = Some(n))
    assert(live.mean.toSeq === PcaGatePinned.mean.toSeq,
      "mean drifted: regenerate PcaGatePinned")
    assert(live.offsets.toSeq === PcaGatePinned.offsets.toSeq,
      "offsets drifted: regenerate PcaGatePinned")
    assert(live.scales.toSeq === PcaGatePinned.scales.toSeq,
      "scales drifted: regenerate PcaGatePinned")
    for (i <- live.components.indices)
      assert(live.components(i).toSeq ===
        PcaGatePinned.components(i).toSeq,
        s"component $i drifted: regenerate PcaGatePinned via " +
          "sbt \"Test/runMain graft.sim.PinPcaModel\"")
  }
}
