package graft.io

import graft.SparkSpec

class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(before: org.apache.spark.sql.DataFrame,
      after: org.apache.spark.sql.DataFrame) =
    SchemaDrift.diff(
      Catalog.columnsFrame(spark, before, "t"),
      Catalog.columnsFrame(spark, after, "t"))
      .select($"column_name", $"status")
      .as[(String, String)].collect().toMap

  test("all five statuses classify correctly") {
    val before = Seq((1L, "x", 1.5)).toDF("id", "name", "price")
    val after = Seq((1L, 2L, true)).toDF("id", "price", "flag")
      .selectExpr("id", "CAST(price AS DOUBLE) AS price", "flag")
    // name removed; flag added; price unchanged (FLOAT both sides);
    // id unchanged
    val m = run(before, after)
    assert(m("NAME") === "removed")
    assert(m("FLAG") === "added")
    assert(m("PRICE") === "unchanged")
    assert(m("ID") === "unchanged")
  }

  test("type change dominates nullability change") {
    import org.apache.spark.sql.functions._
    // Option makes n NULLABLE before (primitive Long would already be
    // non-nullable and the move would vanish)
    val before = Seq(("a", Option(1L))).toDF("s", "n")
    // s retyped to NUMBER (and non-nullable via lit); n made
    // non-nullable only
    val after = Seq(1).toDF("dummy")
      .select(lit(7L).as("s"), lit(2L).as("n"))
    val m = run(before, after)
    assert(m("S") === "type_changed",
      "a retype must report type_changed even when nullability moved too")
    assert(m("N") === "nullability_changed")
  }
}
