package graft.dq

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.profile.Profiler

/** Scoring semantics vs `/root/reference/Data_Quality_Table.sql:112-189`. */
class TableDqSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("s", StringType),
    StructField("neg", DoubleType),
    StructField("d", TimestampType)))

  private val t = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private val tFuture = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
  private val now = lit("2020-06-01 00:00:00").cast("timestamp")

  private lazy val scored = {
    val df = spark.createDataFrame(Seq(
      Row(1L, "a", -1.0, t), Row(2L, "a", -2.0, t),
      Row(3L, "a", -3.0, tFuture), Row(4L, null, -4.0, t)).asJava, schema)
    TableDq.score(Profiler.profile(df, now = now))
  }

  private def row(c: String): Row =
    scored.filter(s"column_name = '$c'").collect().head

  test("completeness = 1 - null_ratio, rounded 3") {
    assert(row("k").getAs[Double]("completeness") == 1.0)
    assert(row("s").getAs[Double]("completeness") == 0.75)
  }

  test("uniqueness = distinct_ratio") {
    assert(row("k").getAs[Double]("uniqueness") == 1.0)
    assert(row("s").getAs[Double]("uniqueness") == 0.25)
  }

  test("validity: negative average scores 0.5, strings 1.0") {
    assert(row("neg").getAs[Double]("validity") == 0.5)
    assert(row("s").getAs[Double]("validity") == 1.0)
    assert(row("k").getAs[Double]("validity") == 1.0)
  }

  test("accuracy: future-date fraction on temporal columns only") {
    assert(row("d").getAs[Double]("accuracy") == 0.75) // 1 of 4 future
    assert(row("s").getAs[Double]("accuracy") == 1.0)
  }

  test("column_score averages unrounded pillars") {
    // k: (1 + 1 + 1 + 1 + 1)/5 = 1.0
    assert(row("k").getAs[Double]("column_score") == 1.0)
    // s: (0.75 + 0.25 + 1 + 1 + 1)/5 = 0.8
    assert(row("s").getAs[Double]("column_score") == 0.8)
    // neg: (1 + 1 + 0.5 + 1 + 1)/5 = 0.9
    assert(row("neg").getAs[Double]("column_score") == 0.9)
  }

  test("table_score is the mean of column scores") {
    val df = spark.createDataFrame(Seq(
      Row(1L, "a", -1.0, t), Row(2L, "a", -2.0, t),
      Row(3L, "a", -3.0, tFuture), Row(4L, null, -4.0, t)).asJava, schema)
    val ts = TableDq.tableScore(Profiler.profile(df, now = now))
      .collect().head.getAs[Double]("table_score")
    // column scores: k=1.0, s=0.8, neg=0.9,
    // d=(1 + 0.5 + 1 + 0.75 + 1)/5 = 0.85 (2 of 4 timestamps distinct);
    // mean = 0.8875 → Spark round() is HALF_UP → 0.888.
    assert(ts == 0.888)
  }

  test("scores stay in [0,1]") {
    val all = scored.collect()
    for {
      r <- all
      c <- Seq("completeness", "uniqueness", "validity", "accuracy",
        "consistency", "column_score")
    } {
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c = $v out of range")
    }
  }
}
