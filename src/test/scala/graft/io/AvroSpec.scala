package graft.io

import graft.SparkSpec

/** RawLocalFileSystem variant whose DIRECTORY-swap renames (the job
  * commit's staging→final move) fail while [[FlakyRenameFs.failRemaining]]
  * is positive — the harness for proving the abort handler preserves
  * staging once the destination delete has run. Part-file renames (task
  * commits) pass through untouched.
  */
class FlakyRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    val isSwap = src.getName.startsWith(".") &&
      src.getName.contains("-staging-")
    if (isSwap && FlakyRenameFs.failRemaining.getAndUpdate(
        n => math.max(0, n - 1)) > 0) false
    else super.rename(src, dst)
  }
}
object FlakyRenameFs {
  val failRemaining = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Avro container reader/writer: round trip of the flat-tabular subset,
  * nullable-union decode, multi-file directory scan (the split axis of
  * the distributed read), and dispatch through Discovery.load.
  */
class AvroSpec extends SparkSpec {

  private def tmp(name: String): String =
    s"${java.nio.file.Files.createTempDirectory("graft_avro")}/$name"

  test("round trip: long/int/double/float/bool/string/bytes + nulls") {
    val p = tmp("rt.avro")
    Avro.write(p,
      Seq("id", "n", "ratio", "f", "flag", "name", "blob"), Seq(
        Seq[Any](1L, 7, 1.5, 2.5f, true, "alpha", Array[Byte](1, 2)),
        Seq[Any](2L, null, -2.25, null, false, null, null)))
    val df = Avro.read(spark, p)
    assert(df.schema.map(f => f.name -> f.dataType.typeName) === Seq(
      "id" -> "long", "n" -> "integer", "ratio" -> "double",
      "f" -> "float", "flag" -> "boolean", "name" -> "string",
      "blob" -> "binary"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getInt(1) === 7)
    assert(rows(0).getDouble(2) === 1.5)
    assert(rows(0).getFloat(3) === 2.5f)
    assert(rows(0).getBoolean(4) === true)
    assert(rows(0).getString(5) === "alpha")
    assert(rows(0).getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2))
    assert(rows(1).toSeq.drop(1) ===
      Seq(null, -2.25, null, false, null, null))
  }

  test("directory of containers reads as one relation (the per-file / " +
      "per-block split axis)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_dir")
    Avro.write(s"$dir/a.avro", Seq("id", "v"),
      (1L to 50L).map(i => Seq[Any](i, i * 0.5)))
    Avro.write(s"$dir/b.avro", Seq("id", "v"),
      (51L to 100L).map(i => Seq[Any](i, i * 0.5)))
    val df = Avro.read(spark, dir.toString)
    assert(df.count() === 100)
    assert(df.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) === 5050L)
  }

  test("Discovery.load dispatches .avro and reports 'avro'") {
    val p = tmp("disp.avro")
    Avro.write(p, Seq("event_id", "event_type"),
      Seq(Seq[Any](1L, "click"), Seq[Any](2L, "view")))
    val (df, tpe) = Discovery.load(spark, p)
    assert(tpe === "avro")
    assert(df.orderBy("event_id").collect().map(_.getString(1)).toSeq ===
      Seq("click", "view"))
  }

  test("distributed sink: one container per partition, full round trip " +
      "with nulls, read back as one relation") {
    import spark.implicits._
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_avro_w")}"
    val df = (1L to 200L).toDF("id")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("id") % 7 === 0,
          org.apache.spark.sql.functions.lit(null))
          .otherwise(org.apache.spark.sql.functions.col("id") * 0.5)
          .as("v"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("n"),
          org.apache.spark.sql.functions.col("id")).as("name"))
      .repartition(4)
    Avro.writeDistributed(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length === 4)
    val back = Avro.read(spark, dir)
    assert(back.count() === 200)
    assert(back.filter("v IS NULL").count() === 200L / 7)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) === 20100L)
    // exact IEEE round trip through the binary encoding
    assert(back.filter("id = 3").head.getAs[Double]("v") === 1.5)
  }

  test("rewriting a directory with FEWER partitions leaves no stale " +
      "part files (overwrite semantics)") {
    import spark.implicits._
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_avro_ow")}"
    Avro.writeDistributed((1L to 100L).toDF("id").repartition(4), dir)
    Avro.writeDistributed((1L to 10L).toDF("id").repartition(1), dir)
    val back = Avro.read(spark, dir)
    assert(back.count() === 10)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) === 55L)
  }

  test("a directory with divergent writer schemas fails loud instead of " +
      "decoding missing fields as silent nulls") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_avro_mx")}"
    Avro.write(s"$dir/a.avro", Seq("id", "v"),
      Seq(Seq[Any](1L, "x"), Seq[Any](2L, "y")))
    Avro.write(s"$dir/b.avro", Seq("id", "other"),
      Seq(Seq[Any](3L, 1.5)))
    val e = intercept[IllegalArgumentException] {
      Avro.read(spark, dir)
    }
    assert(e.getMessage.contains("diverges"), e.getMessage)
  }

  test("sink job failure leaves the previous data untouched and no " +
      "staging directory behind (commit protocol)") {
    import spark.implicits._
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_avro_cp")}"
    Avro.writeDistributed((1L to 50L).toDF("id").repartition(2), dir)
    // a mid-job failure: raise_error evaluates per row executor-side
    val failing = (1L to 50L).toDF("id")
      .select(org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") > 10,
        org.apache.spark.sql.functions.raise_error(
          org.apache.spark.sql.functions.lit("boom")))
        .otherwise(org.apache.spark.sql.functions.col("id")).as("id"))
      .repartition(2)
    intercept[Exception] { Avro.writeDistributed(failing, dir) }
    // old data still reads back complete
    val back = Avro.read(spark, dir)
    assert(back.count() === 50)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) === 1275L)
    // and the aborted job's staging dir was dropped
    val parent = new java.io.File(dir).getParentFile
    val leaked = parent.listFiles().filter(_.getName.startsWith(
      s".${new java.io.File(dir).getName}-staging-"))
    assert(leaked.isEmpty, leaked.mkString(", "))
  }

  test("a swap-rename failure AFTER the destination delete preserves " +
      "staging (the only surviving copy) instead of deleting it") {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.flaky.impl", classOf[FlakyRenameFs].getName)
    val base = java.nio.file.Files.createTempDirectory("graft_avro_sw")
      .toString
    val dir = s"flaky:$base/out"
    // seed previous data through the same FS (counter still 0 → passes)
    Avro.writeDistributed((1L to 20L).toDF("id").repartition(2), dir)
    // now fail the swap rename twice: the first attempt AND the retry —
    // the destination delete has already run, so staging must survive
    FlakyRenameFs.failRemaining.set(2)
    val e = intercept[java.io.IOException] {
      Avro.writeDistributed((100L to 149L).toDF("id").repartition(2), dir)
    }
    assert(e.getMessage.contains("preserved"), e.getMessage)
    // old destination is gone (the delete ran), staging holds the
    // complete new data
    assert(!new java.io.File(s"$base/out").exists())
    val staged = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith(".out-staging-"))
    assert(staged.length === 1, staged.mkString(", "))
    val parts = staged.head.listFiles().filter(_.getName.endsWith(".avro"))
    assert(parts.length === 2)
    // manual recovery exactly as the exception instructs: rename staging
    // into place, then the new data reads back complete
    val fsPath = new org.apache.hadoop.fs.Path(dir)
    val fs = fsPath.getFileSystem(hconf)
    assert(fs.rename(new org.apache.hadoop.fs.Path(
      s"flaky:${staged.head.getPath}"), fsPath))
    val back = Avro.read(spark, s"$base/out")
    assert(back.count() === 50)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) === (100L to 149L).sum)
  }

  test("a single swap-rename hiccup is absorbed by the retry (commit " +
      "succeeds, no staging left behind)") {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.flaky.impl", classOf[FlakyRenameFs].getName)
    val base = java.nio.file.Files.createTempDirectory("graft_avro_sr")
      .toString
    val dir = s"flaky:$base/out"
    FlakyRenameFs.failRemaining.set(1)
    Avro.writeDistributed((1L to 30L).toDF("id").repartition(3), dir)
    assert(Avro.read(spark, s"$base/out").count() === 30)
    assert(new java.io.File(base).listFiles()
      .forall(!_.getName.contains("-staging-")))
  }

  test("sink commits through a Hadoop FS path (file: URI java.io.File " +
      "cannot stat — create/rename must go through the FileSystem API)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_fs")
      .toString
    val uri = s"file:$dir/out"
    Avro.writeDistributed((1L to 30L).toDF("id").repartition(3), uri)
    val back = Avro.read(spark, uri)
    assert(back.count() === 30)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) === 465L)
    // parts really landed under the final path, none left in staging
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length === 3)
  }

  test("unsupported nesting is rejected, [null,T] unions unwrap") {
    // write side rejects unsupported value classes
    val p = tmp("bad.avro")
    intercept[IllegalArgumentException] {
      Avro.write(p, Seq("x"), Seq(Seq[Any](Map("k" -> 1))))
    }
    // all-null column has no type witness
    intercept[IllegalArgumentException] {
      Avro.write(p, Seq("x"), Seq(Seq[Any](null)))
    }
  }
}
