package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // change log: (key, order, tracked attr)
  private def log(rows: (Int, Long, String)*): DataFrame =
    rows.toDF("k", "t", "a")

  private def hist(df: DataFrame) =
    df.select("k", "t", "a", Scd2.ValidFrom, Scd2.ValidTo, Scd2.IsCurrent)
      .as[(Int, Long, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._4))

  test("historize chains half-open intervals per key") {
    val h = hist(Scd2.historize(
      log((1, 10L, "a"), (1, 20L, "b"), (1, 30L, "c"), (2, 5L, "x")),
      Seq("k"), "t"))
    assert(h === Array(
      (1, 10L, "a", 10L, Some(20L), false),
      (1, 20L, "b", 20L, Some(30L), false),
      (1, 30L, "c", 30L, None, true),
      (2, 5L, "x", 5L, None, true)))
  }

  test("merge closes the changed current row and inserts the new version") {
    val target = Scd2.historize(log((1, 10L, "a"), (2, 10L, "x")),
      Seq("k"), "t")
    val h = hist(Scd2.merge(target, log((1, 20L, "b")),
      Seq("k"), "t", attrs = Seq("a")))
    assert(h === Array(
      (1, 10L, "a", 10L, Some(20L), false),
      (1, 20L, "b", 20L, None, true),
      (2, 10L, "x", 10L, None, true)))
  }

  test("merge no-op rule: an unchanged redelivery must not grow history") {
    val target = Scd2.historize(log((1, 10L, "a")), Seq("k"), "t")
    val out = Scd2.merge(target, log((1, 20L, "a")),
      Seq("k"), "t", attrs = Seq("a"))
    assert(hist(out) === hist(target))
  }

  test("merge inserts brand-new keys as open current versions") {
    val target = Scd2.historize(log((1, 10L, "a")), Seq("k"), "t")
    val h = hist(Scd2.merge(target, log((9, 50L, "z")),
      Seq("k"), "t", attrs = Seq("a")))
    assert(h.contains((9, 50L, "z", 50L, None, true)))
    assert(h.length === 2)
  }

  test("merge is null-safe on tracked attrs (value→null is a change)") {
    val target = Scd2.historize(
      Seq((1, 10L, Some("a"))).toDF("k", "t", "a"), Seq("k"), "t")
    val out = Scd2.merge(target,
      Seq((1, 20L, Option.empty[String])).toDF("k", "t", "a"),
      Seq("k"), "t", attrs = Seq("a"))
    val cur = out.filter(col(Scd2.IsCurrent)).as[(Int, Long,
      Option[String], Long, Option[Long], Boolean)].collect()
    assert(cur === Array((1, 20L, None, 20L, None, true)))
    assert(out.count() === 2)
  }

  test("merge takes only the latest batch row per key") {
    val target = Scd2.historize(log((1, 10L, "a")), Seq("k"), "t")
    val h = hist(Scd2.merge(target,
      log((1, 20L, "mid"), (1, 30L, "newest")),
      Seq("k"), "t", attrs = Seq("a")))
    // the intermediate batch row versions nothing; one close, one insert
    assert(h === Array(
      (1, 10L, "a", 10L, Some(30L), false),
      (1, 30L, "newest", 30L, None, true)))
  }

  test("merge is idempotent on the same batch") {
    val target = Scd2.historize(log((1, 10L, "a"), (2, 10L, "x")),
      Seq("k"), "t")
    val batch = log((1, 20L, "b"), (3, 20L, "n"))
    val once = Scd2.merge(target, batch, Seq("k"), "t", attrs = Seq("a"))
    val twice = Scd2.merge(once, batch, Seq("k"), "t", attrs = Seq("a"))
    assert(hist(twice) === hist(once))
  }

  test("merge fails loudly on an out-of-order batch instead of writing " +
      "an inverted interval") {
    // current version of key 1 starts at t=20; a batch claiming t=5 with
    // a CHANGED attr would close that version at valid_to=5 < valid_from
    val target = Scd2.historize(log((1, 20L, "b")), Seq("k"), "t")
    val bad = Scd2.merge(target, log((1, 5L, "z")),
      Seq("k"), "t", attrs = Seq("a"))
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("SCD2 feed contract violated")),
      s"expected the feed-contract error, got: $e")
    // an EQUAL order value (zero-length closing interval) stays legal
    val edge = Scd2.merge(target, log((1, 20L, "z")),
      Seq("k"), "t", attrs = Seq("a"))
    assert(edge.filter(!col(Scd2.IsCurrent)).count() === 1)
  }

  test("asOf reads the version whose closed-open interval contains t") {
    val h = Scd2.historize(
      log((1, 10L, "a"), (1, 20L, "b"), (1, 30L, "c"), (2, 5L, "x")),
      Seq("k"), "t")
    def at(t: Long) = Scd2.asOf(h, lit(t))
      .select("k", "a").as[(Int, String)].collect().toSet
    assert(at(25L) === Set((1, "b"), (2, "x")))
    assert(at(20L) === Set((1, "b"), (2, "x")),
      "valid_from is inclusive (closed-open)")
    assert(at(19L) === Set((1, "a"), (2, "x")),
      "valid_to is exclusive")
    assert(at(99L) === Set((1, "c"), (2, "x")),
      "open current versions satisfy any later t")
    assert(at(4L) === Set.empty,
      "before a key's first version, the key is absent")
  }

  test("intervals partition each key's timeline with no overlap") {
    val target = Scd2.historize(
      log((1, 10L, "a"), (1, 20L, "b")), Seq("k"), "t")
    val merged = Scd2.merge(target, log((1, 30L, "c"), (1, 40L, "d")),
      Seq("k"), "t", attrs = Seq("a"))
    val rows = hist(merged).filter(_._1 == 1)
    // consecutive versions chain exactly: valid_to(i) == valid_from(i+1)
    rows.sliding(2).foreach {
      case Array(prev, next) => assert(prev._5 === Some(next._4))
      case _ =>
    }
    assert(rows.count(_._6) === 1, "exactly one current version per key")
  }
}
