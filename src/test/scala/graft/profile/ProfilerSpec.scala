package graft.profile

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType),
    StructField("created", TimestampType)))

  private def df(rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private val t0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
  private val t1 = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
  private val now = lit("2020-06-01 00:00:00").cast("timestamp")

  private def rowFor(out: org.apache.spark.sql.DataFrame, col: String): Row =
    out.filter(s"column_name = '$col'").collect().head

  test("per-column stats over a small frame") {
    val out = Profiler.profile(
      df(Row(1L, "a", 10.0, t0), Row(2L, "a", null, t1),
        Row(3L, null, 30.0, null)),
      now = now)
    assert(out.count() == 4)

    val id = rowFor(out, "id")
    assert(id.getAs[Long]("count_all") == 3)
    assert(id.getAs[Long]("count_distinct") == 3)
    assert(id.getAs[Long]("count_nulls") == 0)
    assert(id.getAs[Double]("avg_val") == 2.0)
    assert(id.getAs[Double]("stddev_val") == 1.0) // sample stddev of 1,2,3

    val name = rowFor(out, "name")
    assert(name.getAs[String]("data_type") == "VARCHAR")
    assert(name.getAs[Long]("count_distinct") == 1)
    assert(name.getAs[Long]("count_nulls") == 1)
    assert(name.isNullAt(name.fieldIndex("avg_val")))

    val created = rowFor(out, "created")
    // t1 (2021) is after the injected clock (mid-2020): one future value.
    assert(created.getAs[Long]("future_count") == 1)
  }

  test("empty table: ratios guard against division by zero") {
    val out = Profiler.profile(df(), now = now)
    val id = rowFor(out, "id")
    assert(id.getAs[Long]("count_all") == 0)
    assert(id.getAs[Double]("null_ratio") == 0.0)
    assert(id.getAs[Double]("distinct_ratio") == 0.0)
  }

  test("all-null column yields null numeric stats") {
    val out = Profiler.profile(
      df(Row(1L, "a", null, t0), Row(2L, "b", null, t0)), now = now)
    val amount = rowFor(out, "amount")
    assert(amount.getAs[Long]("count_nulls") == 2)
    assert(amount.getAs[Long]("count_distinct") == 0)
    assert(amount.isNullAt(amount.fieldIndex("avg_val")))
    assert(amount.isNullAt(amount.fieldIndex("stddev_val")))
  }

  test("single-row table: stddev_samp is null, not NaN") {
    val out = Profiler.profile(df(Row(1L, "a", 5.0, t0)), now = now)
    val amount = rowFor(out, "amount")
    assert(amount.isNullAt(amount.fieldIndex("stddev_val")))
  }

  test("negative zero counts as one distinct value with zero (melt path)") {
    // aggregation normalizes -0.0 == 0.0; the melted string-cast distinct
    // must agree (it normalizes before casting)
    val out = Profiler.profile(
      df(Row(1L, "a", 0.0, t0), Row(2L, "b", -0.0, t0),
        Row(3L, "c", 1.0, t0)), now = now)
    assert(rowFor(out, "amount").getAs[Long]("count_distinct") == 2)
  }

  test("withRaw exposes unrounded moments alongside the rounded stats") {
    val out = Profiler.profile(
      df(Row(1L, "a", 1.0, t0), Row(2L, "b", 2.0, t0),
        Row(3L, "c", 4.0, t0)), now = now, withRaw = true)
    val amount = rowFor(out, "amount")
    val raw = amount.getAs[Double]("avg_raw")
    assert(raw == 7.0 / 3.0) // full precision
    assert(amount.getAs[Double]("avg_val") == 2.3333) // rounded to 4
    assert(amount.getAs[Double]("stddev_raw") ==
      amount.getAs[Double]("stddev_raw")) // present and non-NaN
  }

  test("distinct encodings are injective for nested and binary columns") {
    // display-cast would join array elements ambiguously: both rows below
    // would render "[a, b]"; and charset-decoding binary is lossy
    val sch = StructType(Seq(
      StructField("arr", ArrayType(StringType)),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(Seq("a, b"), Array[Byte](0, -1)),
      Row(Seq("a", " b"), Array[Byte](0, -2)))
    val out = Profiler.profile(
      spark.createDataFrame(rows.asJava, sch), now = now)
    assert(rowFor(out, "arr").getAs[Long]("count_distinct") == 2)
    assert(rowFor(out, "bin").getAs[Long]("count_distinct") == 2)
  }

  test("sort-based quantiles interpolate like quantile_cont; all-null -> null row") {
    val out = Profiler.quantiles(
      df(Row(1L, "a", 10.0, t0), Row(2L, "b", 20.0, t0),
        Row(3L, "c", 40.0, t0), Row(4L, "d", null, t0)),
      cols = Seq("amount", "id"), ps = Seq(0.5, 0.75),
      names = Seq("p50", "p75")).collect()
      .map(r => r.getString(0) -> r).toMap
    // amount values 10,20,40 (null dropped): p50 = 20; p75 -> idx 1.5 ->
    // 20 + 0.5*(40-20) = 30
    assert(out("amount").getDouble(1) === 20.0)
    assert(out("amount").getDouble(2) === 30.0)
    // id 1..4: p50 -> idx 1.5 -> 2.5
    assert(out("id").getDouble(1) === 2.5)

    val allNull = Profiler.quantiles(
      df(Row(1L, "a", null, t0), Row(2L, "b", null, t0)),
      cols = Seq("amount"), ps = Seq(0.5), names = Seq("p50")).collect()
    assert(allNull.length === 1)
    assert(allNull.head.isNullAt(1))
  }

  test("approx profile keeps counts near-exact at small scale") {
    val out = Profiler.approxProfile(
      df((1 to 50).map(i => Row(i.toLong, s"n$i", i.toDouble, t0)): _*))
    val id = rowFor(out, "id")
    val d = id.getAs[Long]("count_distinct")
    assert(d > 45 && d < 55, s"approx distinct $d out of range")
  }
}
