package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic shuffle-sharding: reproducibility, shard range and
  * per-shard position contiguity, seed sensitivity, and the single-
  * exchange layout plan.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 400L).toDF("doc_id")

  test("assignments are reproducible, in range, and contiguous per shard") {
    val a = Sharding.assignments(docs, "doc_id").collect()
    val b = Sharding.assignments(docs, "doc_id").collect()
    assert(a.map(_.toSeq).toSet === b.map(_.toSeq).toSet)
    val shards = a.map(_.getAs[Long]("shard"))
    assert(shards.forall(s => s >= 0 && s < 16))
    assert(shards.distinct.length === 16) // 400 docs hit all 16 shards
    // positions are 1..n within each shard, no gaps or ties
    a.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val pos = rows.map(_.getAs[Long]("shard_pos")).sorted
      assert(pos === (1L to pos.length).toArray)
    }
  }

  test("a different seed produces a different order (the reshuffle story)") {
    val a = Sharding.assignments(docs, "doc_id", seed = "42")
      .select("doc_id", "sort_key").as[(Long, String)].collect().toMap
    val b = Sharding.assignments(docs, "doc_id", seed = "43")
      .select("doc_id", "sort_key").as[(Long, String)].collect().toMap
    assert(a.keySet === b.keySet)
    assert(a.count { case (k, v) => b(k) == v } === 0)
  }

  test("nShards must divide 256; smaller powers of two stay in range") {
    intercept[IllegalArgumentException] {
      Sharding.assignments(docs, "doc_id", nShards = 10)
    }
    val s4 = Sharding.assignments(docs, "doc_id", nShards = 4)
      .select("shard").as[Long].collect()
    assert(s4.forall(s => s >= 0 && s < 4))
    assert(s4.distinct.sorted === Array(0L, 1L, 2L, 3L))
  }

  test("layout: a shard is never split across partitions, and rows form " +
      "contiguous key-ordered runs per shard") {
    val out = Sharding.layout(Sharding.assignments(docs, "doc_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"))
    val parts = out.rdd.mapPartitions { it =>
      val rows = it.map(r => (r.getAs[Long]("shard"),
        r.getAs[String]("sort_key"))).toVector
      Iterator.single(rows)
    }.collect()
    // each shard appears in exactly one partition
    val shardToParts = parts.zipWithIndex
      .flatMap { case (rows, i) => rows.map(_._1).distinct.map(_ -> i) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(shardToParts.values.forall(_ === 1))
    // within a partition rows are (shard, key)-sorted → contiguous runs
    parts.foreach { rows => assert(rows === rows.sorted) }
  }
}
