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

  test("selection quantiles match built-in percentile on 10k distinct") {
    // 10k distinct doubles across several buckets: the selection path
    // must interpolate exactly like Spark's built-in exact percentile.
    val vals = spark.range(10000)
      .selectExpr("id", "CAST(hash(id) AS DOUBLE) AS x")
    val got = Profiler.quantiles(vals.toDF(),
      cols = Seq("x", "id"), ps = Seq(0.5, 0.95),
      names = Seq("p50", "p95"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exp = vals
      .selectExpr("percentile(x, array(0.5, 0.95)) AS px",
        "percentile(id, array(0.5, 0.95)) AS pid")
      .collect().head
    for ((c, k) <- Seq("x" -> "px", "id" -> "pid")) {
      val e = exp.getSeq[Double](exp.fieldIndex(k))
      assert(got(c).getDouble(1) === e.head, s"$c p50")
      assert(got(c).getDouble(2) === e(1), s"$c p95")
    }
  }

  test("selection quantiles cross zero and negatives exactly") {
    // exercises the bit-image edge logic: negative buckets (flipped
    // lower bits), and the ±0.0 interval edges where the value-range
    // predicate is ambiguous (-0.0 == 0.0 as doubles) and selection must
    // fall back to comparing bit images
    val vals = spark.range(2001)
      .selectExpr("CAST(id - 1000 AS DOUBLE) / 8 AS x")
    val got = Profiler.quantiles(vals.toDF(), cols = Seq("x"),
      ps = Seq(0.1, 0.5, 0.9), names = Seq("p10", "p50", "p90"))
      .collect().head
    val exp = vals
      .selectExpr("percentile(x, array(0.1, 0.5, 0.9)) AS p")
      .collect().head.getSeq[Double](0)
    assert(got.getDouble(1) === exp.head, "p10 (negative range)")
    assert(got.getDouble(2) === exp(1), "p50 (zero crossing)")
    assert(got.getDouble(3) === exp(2), "p90")
    assert(got.getDouble(2) === 0.0)
  }

  test("quantile selection window partitions by (column, bucket)") {
    // The selection job must never sort a whole column in one window
    // partition — pin the (column_name, __bkt) partitioning on the plan.
    val shift = 50 // prefixBits = 14: multi-value buckets at this scale
    def bkt(v: Double): Long = {
      val b = java.lang.Double.doubleToLongBits(v)
      (if (b >= 0L) b else b ^ Long.MaxValue) >> shift
    }
    val base = spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS x")
    // two target buckets: the ones holding 100.0 and 600.0
    val (b1, b2) = (bkt(100.0), bkt(600.0))
    assert(b1 !== b2)
    val sel = Profiler.selectionFrame(base,
      Map(("x", b1) -> Set(5L), ("x", b2) -> Set(7L)), shift)
    val p = sel.queryExecution.executedPlan.toString
    val bucketWindow = p.linesIterator
      .exists(l => l.contains("Window") &&
        l.matches(""".*\[column_name#\d+, __bkt#\d+L?\].*"""))
    assert(bucketWindow,
      s"selection window must partition by (column_name, __bkt):\n$p")
    // and it returns exactly the requested order statistics, computed
    // independently here by the same bit-image bucketing
    val rows = sel.collect()
      .map(r => (r.getLong(r.fieldIndex("__bkt")), r.getLong(3)) ->
        r.getDouble(r.fieldIndex("__v"))).toMap
    def expected(b: Long, rank: Int): Double =
      (0 until 1000).map(_.toDouble).filter(bkt(_) == b).sorted
        .apply(rank - 1)
    assert(rows((b1, 5L)) === expected(b1, 5))
    assert(rows((b2, 7L)) === expected(b2, 7))
  }

  test("quantiles leaves no cached blocks behind") {
    // cleared first: the session is shared across suites, so only THIS
    // call's residue is meaningful
    spark.catalog.clearCache()
    Profiler.quantiles(
      df(Row(1L, "a", 10.0, t0), Row(2L, "b", 20.0, t0)),
      cols = Seq("amount"), ps = Seq(0.5), names = Seq("p50"))
    assert(spark.sharedState.cacheManager.isEmpty,
      "quantiles must unpersist its scan cache before returning")
  }

  test("approx profile keeps counts near-exact at small scale") {
    val out = Profiler.approxProfile(
      df((1 to 50).map(i => Row(i.toLong, s"n$i", i.toDouble, t0)): _*))
    val id = rowFor(out, "id")
    val d = id.getAs[Long]("count_distinct")
    assert(d > 45 && d < 55, s"approx distinct $d out of range")
  }

  test("HLL distinct counts stay within 8% of exact on lineitem") {
    // the quantified pin behind profile_lineitem_approx's rows-only gate:
    // rsd 0.05 is one standard error, and the fixture's worst column
    // measures 6% — 8% flags a broken sketch without flaking on the
    // sketch's own design variance (tighter rsd measured 3-4x slower,
    // defeating the approx path's purpose)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = Profiler.profile(li, now = now)
      .select("column_name", "count_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Profiler.approxProfile(li, now = now)
      .select("column_name", "count_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (c, e) =>
      val a = approx(c)
      val err =
        if (e == 0) math.abs(a).toDouble
        else math.abs(a - e).toDouble / e
      assert(err <= 0.08, f"$c: HLL $a vs exact $e (err ${err * 100}%.1f%%)")
    }
  }

  test("approx quantiles land inside an exact-quantile rank window") {
    // t-digest guarantees rank error <= n/accuracy; with accuracy 10000
    // the estimate must sit between the exact p±0.1 quantiles — a
    // principled pin that survives any tie/interpolation detail
    val li = graft.io.Tables.load(spark, "/root/testdata/sf0.001",
      "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val exact = Profiler.quantiles(li, cols,
        ps = Seq(0.4, 0.6, 0.85, 0.99),
        names = Seq("lo50", "hi50", "lo95", "hi95"))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profiler.approxQuantiles(li, cols,
        ps = Seq(0.5, 0.95), names = Seq("p50", "p95"))
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val e = exact(c); val a = approx(c)
      def d(r: org.apache.spark.sql.Row, f: String) =
        r.getAs[Double](f)
      assert(d(a, "p50") >= d(e, "lo50") && d(a, "p50") <= d(e, "hi50"),
        s"$c p50 ${d(a, "p50")} outside [${d(e, "lo50")}, ${d(e, "hi50")}]")
      assert(d(a, "p95") >= d(e, "lo95") && d(a, "p95") <= d(e, "hi95"),
        s"$c p95 ${d(a, "p95")} outside [${d(e, "lo95")}, ${d(e, "hi95")}]")
    }
  }
}
