package graft.io

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (VARIANT-style) column promotion — the lane a
  * Snowflake shop uses constantly: a JSON string column carried through
  * ingestion gets promoted to typed columns for relational work.
  *
  * Scale shape: `from_json` with an EXPLICIT schema is a codegen'd
  * per-row expression — no shuffle, no sampling pass in the hot path.
  * Schema DISCOVERY (when the shape is unknown) belongs in a bounded
  * sampled step: `schemaOf` infers from a limited sample the same way
  * the file-discovery readers bound their inference, never on the full
  * corpus.
  */
object SemiStructured {

  /** Promote `jsonCol` into typed top-level columns per `schema`,
    * appending a `<jsonCol>_valid` flag (false = present but
    * unparseable; null input stays null-flagged false as well, callers
    * who care can test the source column). Field columns are null for
    * invalid rows — the PERMISSIVE contract relational consumers expect.
    */
  def promote(df: DataFrame, jsonCol: String, schema: StructType)
      : DataFrame = {
    // PERMISSIVE from_json yields a struct of NULLS (not a null struct)
    // for malformed input, so "parsed is null" cannot detect bad rows —
    // route the raw text of unparseable rows into a corrupt-record field
    // and flag on it.
    val corrupt = "_graft_corrupt"
    require(!schema.fieldNames.contains(corrupt),
      s"schema may not contain the reserved field $corrupt")
    val reserved = Seq("__p", s"${jsonCol}_valid")
    require(!reserved.exists(df.columns.contains),
      s"input may not already contain ${reserved.mkString("/")} — " +
        "promote would silently clobber them")
    // schema fields land as top-level columns via withColumn, which
    // OVERWRITES an existing column of the same name — a schema carrying
    // e.g. `event_id` would silently replace the input's real event_id.
    // Same fail-loud contract as the reserved names above.
    val clobbered = schema.fieldNames.toSet.intersect(df.columns.toSet)
    require(clobbered.isEmpty,
      s"schema fields ${clobbered.toSeq.sorted.mkString(", ")} collide " +
        "with existing input columns — promote would silently overwrite " +
        "them; rename the input columns or prune the schema")
    val parsed = from_json(col(jsonCol),
      schema.add(corrupt, org.apache.spark.sql.types.StringType),
      Map("columnNameOfCorruptRecord" -> corrupt).asJava)
    // valid needs BOTH probes: malformed non-empty input populates the
    // corrupt field, but EMPTY/whitespace input makes from_json return
    // a null struct outright (no corrupt record to inspect)
    val withParsed = df.withColumn("__p", parsed)
      .withColumn(s"${jsonCol}_valid",
        col(jsonCol).isNotNull && col("__p").isNotNull &&
          col(s"__p.$corrupt").isNull)
    schema.fields.foldLeft(withParsed) { (acc, f) =>
      acc.withColumn(f.name, col(s"__p.${f.name}"))
    }.drop("__p")
  }

  /** Sampled schema discovery for an unknown JSON column: infer from at
    * most `sampleRows` values (one bounded job), returning the merged
    * struct. The promotion itself then runs with this EXPLICIT schema —
    * inference never touches the full corpus.
    */
  def schemaOf(df: DataFrame, jsonCol: String,
      sampleRows: Int = 1000): StructType = {
    val sample = df.select(col(jsonCol)).na.drop().limit(sampleRows)
    val parsed = df.sparkSession.read
      .json(sample.rdd.map(_.getString(0)))
    StructType(parsed.schema.fields.filterNot(_.name == "_corrupt_record"))
  }
}
