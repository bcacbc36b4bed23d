package graft.io

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container ingestion — the row-oriented lake format counterpart to
  * the ORC extension (`Data_Discovery_File.sql:317-349` covers the
  * reference's pandas formats; Avro is what a Spark-native shop ingests
  * from Kafka/connect landings). The `spark-avro` DataSource module does
  * not ship in this distribution, so the scan goes through
  * `avro-mapred`'s `AvroInputFormat` — which DOES ship with Spark — via
  * `SparkContext.hadoopFile`.
  *
  * Scale shape: Avro object-container files are block-structured with
  * sync markers, and `AvroInputFormat` splits on them — so ONE large
  * file fans out across executors exactly like parquet/ORC (this is the
  * key difference from the driver-bound xlsx/xls readers, whose formats
  * are not splittable). Record decode happens executor-side; only the
  * schema header is touched on the driver.
  *
  * Supported schema subset: records of `long | int | double | float |
  * boolean | string | bytes`, each optionally in a `[null, T]` union
  * (the standard nullable encoding). Logical types / nesting are out of
  * scope for the discovery surface, matching the flat-tabular contract
  * of the other staged-format gates.
  */
object Avro {

  // ---------------------------------------------------------------- read

  /** Read an Avro container file (or a directory of them) as a DataFrame.
    * Schema comes from the first file's header (driver-side, header-only
    * read); records decode distributed via `AvroInputFormat`. Every
    * sibling file's header is VALIDATED against the first before the
    * scan runs: a divergent writer schema would otherwise decode with
    * `r.get(name)` silently yielding null columns. The per-file header
    * probe is a bounded driver loop (one seek per file — the same cost
    * class as parquet footer listing), not a data read.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = validatedSchema(spark, path)
    require(schema.getType == Schema.Type.RECORD,
      s"avro: top-level schema must be a record, got ${schema.getType}")
    val fields = schema.getFields.asScala.toSeq
    val struct = StructType(fields.map(f =>
      StructField(f.name, sqlType(f.schema()), nullable = true)))
    val names = fields.map(_.name)

    val rows = spark.sparkContext
      .hadoopFile[AvroWrapper[GenericRecord], NullWritable,
        AvroInputFormat[GenericRecord]](path)
      .map { case (w, _) =>
        // AvroRecordReader REUSES the wrapper's datum across records:
        // extract (and copy Utf8/ByteBuffer views) before the iterator
        // advances — this map does exactly that, per record.
        val r = w.datum()
        Row.fromSeq(names.map(n => toCatalyst(r.get(n))))
      }
    spark.createDataFrame(rows, struct)
  }

  /** Writer schema shared by every `.avro` file under `path` (or of the
    * single file when `path` is one). Goes through the Hadoop FileSystem
    * API + avro's `FsInput`, so the header reads work on every store the
    * scan/sink work on (file:/hdfs:/s3a:) — java.io.File would break
    * non-local paths. Fails loud naming the first divergent file: the
    * scan's `r.get(name)` decode would silently null out columns missing
    * from a sibling's writer schema, so a mixed-schema directory is a
    * caller error, not a degraded read.
    */
  private def validatedSchema(spark: SparkSession, path: String): Schema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val targets =
      if (fs.getFileStatus(p).isDirectory) {
        val fl = fs.listStatus(p)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
          .sortBy(_.getPath.getName).map(_.getPath).toSeq
        if (fl.isEmpty) throw new IllegalArgumentException(
          s"avro: no .avro files under $path")
        fl
      } else Seq(p)
    def headerOf(t: org.apache.hadoop.fs.Path): Schema = {
      val reader = new DataFileReader[GenericRecord](
        new org.apache.avro.mapred.FsInput(t, conf),
        new GenericDatumReader[GenericRecord]())
      try reader.getSchema finally reader.close()
    }
    val first = headerOf(targets.head)
    targets.tail.foreach { t =>
      val s = headerOf(t)
      if (s != first) throw new IllegalArgumentException(
        s"avro: writer schema of $t diverges from ${targets.head} — " +
          "a mixed-schema directory would decode missing fields as " +
          s"silent nulls; expected $first got $s")
    }
    first
  }

  /** Avro field schema → Spark SQL type ([null, T] unions unwrap). */
  private def sqlType(s: Schema): DataType = unwrap(s).getType match {
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(
      s"avro: unsupported field type $other (flat-tabular subset only)")
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"avro: only [null, T] unions are supported, got $s")
      nonNull.head
    } else s

  /** Avro runtime value → Catalyst external value. */
  private def toCatalyst(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence => s.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case other => other // long / int / double / float / boolean
  }

  // --------------------------------------------------------------- write

  /** Distributed Avro SINK: one container file per partition under
    * `dir`, written executor-side through the Hadoop FileSystem API (so
    * the same code path serves file:/hdfs:/s3a:), schema derived from
    * the DataFrame schema (same flat-tabular subset as the reader; all
    * fields encode as nullable `[null, T]` unions). The directory then
    * reads back through [[read]] — write/read parity with the
    * parquet/ORC lanes. Size output files by partitioning the input
    * (`repartition(n)`) — the standard Spark sink contract.
    *
    * Commit protocol (FileOutputCommitter-v1-shaped): tasks write to a
    * hidden sibling STAGING directory under names that the reader's
    * `.avro` filter ignores, renaming each part into place on task
    * success — two speculative/retried attempts of one partition race
    * on that rename and the first wins (the loser deletes its attempt
    * file). Only after the WHOLE job succeeds does the driver swap
    * staging over the previous data; a mid-job failure deletes staging
    * and leaves the old directory untouched. The final delete+rename
    * pair is the protocol's (standard) non-atomic window; object stores
    * without atomic rename want a manifest committer instead — the
    * staging boundary here is where one plugs in. Once the swap's
    * DELETE has run, staging holds the only surviving copy of the data,
    * so a swap-rename failure retries once and then leaves staging IN
    * PLACE (named in the exception) for manual recovery — never
    * deleting it, which would turn a transient FS error into total
    * data loss.
    *
    * Determinism contract (as FileOutputCommitter v1): the first
    * task-attempt rename wins only on filesystems where rename fails
    * when the destination exists; on RawLocalFileSystem/POSIX a racing
    * attempt can silently REPLACE an already-committed part, which is
    * correct only because partition contents are required to be
    * deterministic — the task commit guards with a best-effort
    * `exists` check, but callers feeding nondeterministic partitions
    * (e.g. round-robin `repartition` upstream of the sink) are outside
    * the protocol's contract, exactly as they are for Spark's own v1
    * committer.
    */
  def writeDistributed(df: DataFrame, dir: String): Unit = {
    val names = df.schema.fields.map(_.name).toSeq
    val schemaJson = {
      var b = SchemaBuilder.record("row").namespace("graft").fields()
      df.schema.fields.foreach { f =>
        val fb = b.name(f.name).`type`().unionOf().nullType().and()
        b = (f.dataType match {
          case LongType => fb.longType()
          case IntegerType => fb.intType()
          case DoubleType => fb.doubleType()
          case FloatType => fb.floatType()
          case BooleanType => fb.booleanType()
          case StringType => fb.stringType()
          case BinaryType => fb.bytesType()
          case other => throw new IllegalArgumentException(
            s"avro sink: unsupported column type $other (flat subset)")
        }).endUnion().noDefault()
      }
      b.endRecord().toString // ship as JSON: Schema is not Serializable
    }
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf.value)
    // hidden sibling staging dir: leading dot keeps FileInputFormat's
    // hiddenFileFilter from ever scanning a half-written job, and the
    // old data stays live until the swap below
    val staging = new org.apache.hadoop.fs.Path(
      Option(path.getParent).getOrElse(path),
      s".${path.getName}-staging-${java.util.UUID.randomUUID}")
    fs.mkdirs(staging)
    val stagingStr = staging.toString
    // set once the destination delete can have run — from then on the
    // abort path must preserve staging (see catch below)
    var swapStarted = false
    try {
      df.queryExecution.toRdd // InternalRow — avoid the Row copy/record
        .mapPartitionsWithIndex { case (pid, rows) =>
          val schema = new Schema.Parser().parse(schemaJson)
          // loop-invariant: the non-null branch type of each field's
          // [null, T] union, hoisted out of the per-row encode loop
          val fieldTypes: Array[Schema.Type] = schema.getFields.asScala
            .map(_.schema().getTypes.get(1).getType).toArray
          // attempt-unique temp name (NOT .avro — invisible to readers
          // even mid-write), renamed into place on success
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val pfs = new org.apache.hadoop.fs.Path(stagingStr)
            .getFileSystem(conf.value)
          val tmp = new org.apache.hadoop.fs.Path(
            f"$stagingStr%s/part-$pid%05d-a$attempt%d.inprogress")
          val dst = new org.apache.hadoop.fs.Path(
            f"$stagingStr%s/part-$pid%05d.avro")
          val out = pfs.create(tmp, true)
          val writer = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          writer.create(schema, out)
          var n = 0L
          try rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            names.indices.foreach { i =>
              val v =
                if (r.isNullAt(i)) null
                else fieldTypes(i) match {
                  case Schema.Type.LONG => r.getLong(i)
                  case Schema.Type.INT => r.getInt(i)
                  case Schema.Type.DOUBLE => r.getDouble(i)
                  case Schema.Type.FLOAT => r.getFloat(i)
                  case Schema.Type.BOOLEAN => r.getBoolean(i)
                  case Schema.Type.STRING => r.getUTF8String(i).toString
                  case Schema.Type.BYTES =>
                    java.nio.ByteBuffer.wrap(r.getBinary(i))
                  case other => throw new IllegalStateException(s"$other")
                }
              rec.put(i, v)
            }
            writer.append(rec); n += 1
          } finally writer.close() // closes the Hadoop stream
          // task commit: first attempt to rename wins. The exists-check
          // is a best-effort guard for filesystems whose rename
          // OVERWRITES an existing destination (RawLocalFileSystem/
          // POSIX — HDFS rename instead returns false): without it a
          // racing speculative twin would silently replace the
          // committed part, which is safe only under the deterministic-
          // partition contract documented above. The residual
          // check-then-rename window is the same one FileOutputCommitter
          // v1 carries.
          if (pfs.exists(dst)) { pfs.delete(tmp, false); () }
          else if (!pfs.rename(tmp, dst)) {
            if (pfs.exists(dst)) { pfs.delete(tmp, false); () }
            else throw new java.io.IOException(
              s"avro sink: could not commit $tmp -> $dst")
          }
          Iterator.single(n)
        }.count()
      // job commit: every task committed — swap staging over the old
      // data. OVERWRITE semantics: a rewrite with fewer partitions must
      // not leave stale part files for read() to silently union in.
      // Past this point staging may be the ONLY surviving copy (the
      // destination delete has run), so the abort handler below must
      // not touch it.
      swapStarted = true
      fs.delete(path, true)
      if (!fs.rename(staging, path)) {
        // one retry absorbs a transient FS hiccup; a second failure
        // surfaces WITH the staging location — the data is complete
        // there and recoverable, the old directory is already gone
        if (!fs.rename(staging, path))
          throw new java.io.IOException(
            s"avro sink: could not commit $staging -> $path — the " +
              s"previous data at $path is deleted; the NEW data is " +
              s"complete and preserved at $staging (recover by renaming " +
              "it into place)")
      }
    } catch { case e: Throwable =>
      // job abort BEFORE the swap began: drop staging, previous data
      // untouched. Once the swap's delete may have run, staging stays
      // in place — deleting it would destroy the only surviving copy
      // and turn a recoverable failure into total data loss.
      if (!swapStarted) {
        try fs.delete(staging, true) catch { case _: Exception => () }
      }
      throw e
    }
  }

  /** Driver-side staging writer (gate/test fixture — bounded slices, same
    * role as [[Xlsx.write]]/[[Biff.write]]): one container file, schema
    * derived from the first row's value classes (Long / Int / Double /
    * Float / Boolean / String / Array[Byte]; null cells need a non-null
    * witness elsewhere in the column). All columns encode as nullable
    * `[null, T]` unions.
    */
  def write(path: String, columns: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    require(rows.nonEmpty, "avro write: need at least one row")
    val witness: Seq[Any] = columns.indices.map { i =>
      rows.iterator.map(_(i)).find(_ != null).getOrElse(
        throw new IllegalArgumentException(
          s"avro write: column ${columns(i)} is all-null — no type witness"))
    }
    var b = SchemaBuilder.record("row").namespace("graft").fields()
    columns.zip(witness).foreach { case (name, w) =>
      val fb = b.name(name).`type`().unionOf().nullType().and()
      b = (w match {
        case _: java.lang.Long => fb.longType()
        case _: java.lang.Integer => fb.intType()
        case _: java.lang.Double => fb.doubleType()
        case _: java.lang.Float => fb.floatType()
        case _: java.lang.Boolean => fb.booleanType()
        case _: String => fb.stringType()
        case _: Array[Byte] => fb.bytesType()
        case other => throw new IllegalArgumentException(
          s"avro write: unsupported value class ${other.getClass}")
      }).endUnion().noDefault()
    }
    val schema = b.endRecord()
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, new File(path))
    try rows.foreach { r =>
      val rec = new GenericData.Record(schema)
      columns.indices.foreach { i =>
        val v = r(i) match {
          case a: Array[Byte] => java.nio.ByteBuffer.wrap(a)
          case other => other
        }
        rec.put(columns(i), v)
      }
      writer.append(rec)
    } finally writer.close()
  }
}
