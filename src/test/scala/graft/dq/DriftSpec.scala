package graft.dq

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical snapshots drift zero on every row") {
    val df = Seq("a", "a", "b", "c").toDF("v")
    val out = Drift.categoricalDrift(df, df, "v").collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Double]("tv") === 0.0))
    assert(out.forall(r =>
      r.getAs[Double]("share_a") === r.getAs[Double]("share_b")))
  }

  test("TV matches the exact rational closed form and handles " +
      "one-sided values") {
    // before: a:3 b:1 (total 4); after: a:1 c:1 (total 2)
    // TV = 1/2 (|3/4-1/2| + |1/4-0| + |0-1/2|) = 1/2
    val before = Seq("a", "a", "a", "b").toDF("v")
    val after = Seq("a", "c").toDF("v")
    val out = Drift.categoricalDrift(before, after, "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("tv"))).toMap
    assert(out.keySet === Set("a", "b", "c"))
    assert(out("a") === ((3L, 1L, 0.5)))
    assert(out("b") === ((1L, 0L, 0.5)))
    assert(out("c") === ((0L, 1L, 0.5)))
  }

  test("null is one value row, not two half-rows") {
    val before = Seq(Some("a"), None, None).toDF("v")
    val after = Seq(Some("a"), None).toDF("v")
    val rows = Drift.categoricalDrift(before, after, "v").collect()
    assert(rows.length === 2)
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) === 2L && nullRow.getLong(2) === 1L)
  }

  test("numeric drift buckets by width and labels buckets by lower " +
      "bound") {
    val before = Seq(5.0, 15.0, 25.0).toDF("x")
    val after = Seq(5.0, 6.0, 7.0).toDF("x")
    val out = Drift.numericDrift(before, after, "x", width = 10.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out === Map("0.0" -> ((1L, 3L)), "10.0" -> ((1L, 0L)),
      "20.0" -> ((1L, 0L))))
  }

  test("TV is invariant to which side is 'before' (symmetry) and " +
      "bounded by [0, 1]") {
    val x = Seq("a", "a", "b").toDF("v")
    val y = Seq("b", "c", "c", "c").toDF("v")
    def tv(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame) =
      Drift.categoricalDrift(l, r, "v").select("tv").head().getDouble(0)
    val t = tv(x, y)
    assert(t === tv(y, x))
    assert(t > 0.0 && t <= 1.0)
  }

  test("disjoint snapshots reach the TV = 1 maximum") {
    val t = Drift.categoricalDrift(
        Seq("a").toDF("v"), Seq("b").toDF("v"), "v")
      .select("tv").head().getDouble(0)
    assert(t === 1.0)
  }
}
