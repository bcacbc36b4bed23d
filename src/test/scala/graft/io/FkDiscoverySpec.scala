package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FkDiscoverySpec extends SparkSpec {
  import spark.implicits._

  private def cand(child: Seq[Option[Int]], parent: Seq[Option[Int]]) =
    FkDiscovery.Candidate("c", child.toDF("ck"), "ck",
      "p", parent.toDF("pk"), "pk")

  test("a true FK audits as full containment with a unique parent") {
    val r = FkDiscovery.audit(Seq(cand(
        Seq(Some(1), Some(1), Some(2)), Seq(Some(1), Some(2), Some(3)))))
      .head()
    assert(r.getAs[Long]("child_distinct") === 2L)
    assert(r.getAs[Long]("contained") === 2L)
    assert(r.getAs[Double]("containment") === 1.0)
    assert(r.getAs[Long]("parent_distinct") === 3L)
    assert(r.getAs[Boolean]("parent_unique"))
  }

  test("partial containment and a duplicated parent are both reported") {
    val r = FkDiscovery.audit(Seq(cand(
        Seq(Some(1), Some(9)), Seq(Some(1), Some(1), Some(2))))).head()
    assert(r.getAs[Double]("containment") === 0.5)
    assert(!r.getAs[Boolean]("parent_unique"))
  }

  test("nulls reference nothing: excluded from both sides") {
    val r = FkDiscovery.audit(Seq(cand(
        Seq(Some(1), None), Seq(Some(1), None, None)))).head()
    assert(r.getAs[Long]("child_distinct") === 1L)
    assert(r.getAs[Double]("containment") === 1.0)
    // parent nulls don't count toward rows either, so one distinct
    // non-null value over one non-null row is still unique
    assert(r.getAs[Boolean]("parent_unique"))
  }

  test("an all-null child column reports containment 0.0 by convention") {
    val r = FkDiscovery.audit(Seq(cand(
        Seq(None, None), Seq(Some(1))))).head()
    assert(r.getAs[Long]("child_distinct") === 0L)
    assert(r.getAs[Double]("containment") === 0.0)
  }

  test("multiple pairs build ONE lazy unioned plan ordered by pair " +
      "name, not a driver data loop") {
    val out = FkDiscovery.audit(Seq(
      cand(Seq(Some(1)), Seq(Some(1))),
      FkDiscovery.Candidate("a", Seq(1).toDF("x"), "x",
        "b", Seq(2).toDF("y"), "y")))
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a.x", "c.ck"))
    assert(rows.find(_.getString(0) == "a.x").get
      .getAs[Double]("containment") === 0.0)
  }
}
