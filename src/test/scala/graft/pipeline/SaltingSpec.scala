package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // one hot key (90% of rows) plus a tail
    val big = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong + 1, i.toLong)))
      .toDF("k", "v")
    val small = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Salting.saltedJoin(big, small, Seq("k"), buckets = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(salted === plain)
    assert(salted.length === 900 + 49) // hot key + matched tail keys 2..50
  }

  test("salted left join keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, "a"), (2L, "b"), (99L, "zz")).toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    val out = Salting.saltedJoin(big, small, Seq("k"), 4, "left")
      .collect().map(r => (r.getLong(0), r.isNullAt(2)))
    assert(out.length === 3)
    assert(out.count(_._2) === 1) // the unmatched key, not duplicated
  }

  test("salted distinct count matches exact countDistinct per key") {
    val df = ((1 to 500).map(i => (1L, (i % 37).toLong)) ++
      (1 to 50).map(i => (2L, (i % 7).toLong))).toDF("k", "v")
    val expected = df.groupBy("k")
      .agg(countDistinct("v").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Salting.saltedDistinctCount(df, "k", "v", buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted === expected)
  }

  test("salted two-level sum/count equals plain aggregation") {
    val df = (1 to 1000).map(i => ((i % 3).toLong, i.toLong)).toDF("k", "v")
    val expected = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val salted = Salting.saltedAggregate(df, "k", 8,
        partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
        finalAgg = Seq(sum("ps").cast("long").as("s"),
          sum("pn").cast("long").as("n")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(salted === expected)
  }
}
