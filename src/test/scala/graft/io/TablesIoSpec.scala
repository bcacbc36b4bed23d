package graft.io

import graft.SparkSpec

/** Parquet-backed Tables behaviors: footer row counts and the
  * inferred-schema cache (keyed by path+mtime+size — a rewritten table
  * must never be served a stale schema).
  */
class TablesIoSpec extends SparkSpec {

  test("rowCount sums footer counts across a multi-file table directory") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tables_rc").toString
    import spark.implicits._
    (1L to 300L).toDF("id").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val parts = new java.io.File(s"$dir/t.parquet")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(parts >= 2, "fixture must produce a multi-file table")
    assert(Tables.rowCount(spark, dir, "t") === 300L)
  }

  test("schema cache invalidates when the table file is rewritten") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tables_sc").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val first = Tables.load(spark, dir, "t").schema.fieldNames.toSet
    assert(first === Set("id", "v"))
    Thread.sleep(1100) // ensure a distinct mtime on coarse filesystems
    Seq((1L, "a", 2.0)).toDF("id", "v", "extra")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val second = Tables.load(spark, dir, "t").schema.fieldNames.toSet
    assert(second === Set("id", "v", "extra"),
      "a rewritten table must never be served the stale cached schema")
  }
}
