package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = {
    val rnd = new scala.util.Random(11)
    (1 to n).map(i => (i.toLong, 1 + rnd.nextInt(300)))
      .toDF("doc_id", "n_tokens")
  }

  test("packing conserves docs and tokens") {
    val df = corpus(400)
    val out = Packing.packs(df, "doc_id", "n_tokens", budget = 512)
    val (docs, toks) = out.agg(sum("n_docs"), sum("pack_tokens"))
      .as[(Long, Long)].head()
    val (expDocs, expToks) = df.agg(count(lit(1)),
      sum(col("n_tokens").cast("long"))).as[(Long, Long)].head()
    assert(docs == expDocs && toks == expToks)
  }

  test("packs overflow by at most one document") {
    val df = corpus(400)
    val out = Packing.packs(df, "doc_id", "n_tokens", budget = 512)
    val maxDoc = 300L
    out.collect().foreach { r =>
      val toks = r.getAs[Long]("pack_tokens")
      // a pack only exceeds the budget via its final straddling doc
      assert(toks < 512 + maxDoc, s"pack too large: $r")
    }
    // multiple packs exist per shard at this volume (the window actually
    // splits, it doesn't lump everything into pack 0)
    assert(out.filter(col("pack_id") > 0).count() > 0)
  }

  test("packing is deterministic under repartitioning") {
    val df = corpus(300)
    val a = Packing.packs(df, "doc_id", "n_tokens", budget = 256)
      .orderBy("shard", "pack_id").collect().toSeq
    val b = Packing.packs(df.repartition(7), "doc_id", "n_tokens",
        budget = 256)
      .orderBy("shard", "pack_id").collect().toSeq
    assert(a == b)
  }

  test("shard windows parallelize: one sort per shard, no global window") {
    val plan = Packing.packs(corpus(100), "doc_id", "n_tokens", 512)
      .queryExecution.executedPlan.toString
    // partitionBy("shard") must reach the Window's exchange — a global
    // (unpartitioned) window would serialize the corpus through one task
    assert(plan.contains("Window"), plan)
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
