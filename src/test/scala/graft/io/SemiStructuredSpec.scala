package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** VARIANT-style promotion: typed extraction, malformed/missing-field/
  * null semantics, and bounded schema discovery.
  */
class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("tag", StringType)))

  test("valid rows promote typed fields; malformed rows flag false with " +
      "null fields; missing fields are null but valid") {
    val df = Seq(
      (1L, """{"k": 7, "tag": "a"}"""),
      (2L, """{"k": 8}"""), // tag missing → null, still valid
      (3L, """not json"""), // malformed
      (4L, null)) // null input
      .toDF("id", "props")
    val out = SemiStructured.promote(df, "props", schema)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("k") === 7L)
    assert(out(0).getAs[String]("tag") === "a")
    assert(out(0).getAs[Boolean]("props_valid") === true)
    assert(out(1).getAs[Any]("tag") === null)
    assert(out(1).getAs[Boolean]("props_valid") === true)
    assert(out(2).getAs[Any]("k") === null)
    assert(out(2).getAs[Boolean]("props_valid") === false)
    assert(out(3).getAs[Boolean]("props_valid") === false)
  }

  test("empty and whitespace-only input flags INVALID (from_json yields " +
      "a null struct there, not a corrupt record); reserved output " +
      "columns are guarded") {
    val df = Seq((1L, ""), (2L, "   "), (3L, """{"k": 1}"""))
      .toDF("id", "props")
    val out = SemiStructured.promote(df, "props", schema)
      .orderBy("id").collect()
    assert(out(0).getAs[Boolean]("props_valid") === false)
    assert(out(1).getAs[Boolean]("props_valid") === false)
    assert(out(2).getAs[Boolean]("props_valid") === true)
    intercept[IllegalArgumentException] {
      SemiStructured.promote(
        Seq(("x", "y")).toDF("props", "props_valid"), "props", schema)
    }
  }

  test("a schema field colliding with an existing input column fails " +
      "loud (withColumn would silently overwrite the real column)") {
    val df = Seq((1L, """{"id": 99, "k": 7}""")).toDF("id", "props")
    val colliding = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType)))
    val e = intercept[IllegalArgumentException] {
      SemiStructured.promote(df, "props", colliding)
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
    // the non-colliding subset of the same payload still promotes
    val ok = SemiStructured.promote(df, "props",
      StructType(Seq(StructField("k", LongType)))).head
    assert(ok.getAs[Long]("id") === 1L, "input id must be untouched")
    assert(ok.getAs[Long]("k") === 7L)
  }

  test("schemaOf discovers the merged struct from a bounded sample") {
    val df = Seq(
      """{"k": 1}""", """{"k": 2, "extra": "x"}""", """{"k": 3}""")
      .toDF("props")
    val s = SemiStructured.schemaOf(df, "props")
    assert(s.fieldNames.toSet === Set("k", "extra"))
    assert(s("k").dataType === LongType)
    // the discovered schema then drives a full promotion
    val out = SemiStructured.promote(df, "props", s)
    assert(out.agg(sum("k")).head.getLong(0) === 6L)
  }
}
