package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing evidence for the 100 TB design: two tables bucketed on the
  * join key join WITHOUT a shuffle on either side — the exchange-free
  * plan is what pre-partitioned layout buys on a cluster (both sides
  * already hash-distributed by the key).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans no exchange") {
    val n = 1000
    (1 to n).map(i => (i.toLong, s"left_$i")).toDF("k", "lv")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucketed_left")
    (1 to n).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucketed_right")
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: a broadcast join would trivially have
      // no exchange and prove nothing about the bucketed layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucketed_left")
        .join(spark.table("graft_bucketed_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() === n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_right")
    }
  }
}
