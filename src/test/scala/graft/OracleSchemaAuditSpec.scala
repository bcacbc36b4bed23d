package graft

import org.apache.spark.sql.types._

/** Driver-proof final schemas, enforced for EVERY registered query.
  *
  * The r9 gate's only two hash-fails (`profile_melted_lineitem`,
  * `scan_partition_pruned_events`) replayed bit-exact locally and were
  * exactly the two lanes whose FINAL schema carried a DECIMAL column —
  * the driver's oracle stack converts decimals through a path we do not
  * control (and cannot version-pin: this host has a single DuckDB and
  * no egress, so an in-repo version matrix is impossible). The durable
  * fix is structural: exact decimal/BigInt arithmetic is welcome INSIDE
  * a query (order-independent accumulation), but every EMITTED column
  * must use a type whose parquet↔pandas↔DuckDB round-trip has one
  * representation — the types the 148 green r9 lanes actually used.
  * This spec is the regression guard: a new lane emitting a decimal
  * (or any other representation-fragile type) fails `sbt test` before
  * the driver ever sees it.
  *
  * Schema inspection only triggers ANALYSIS for lazy batch frames, but
  * QueryDef fns that run real machinery (streaming lanes, glossary
  * CRUD) execute on call — so this runs at the sf0.001 smoke corpus,
  * where the whole sweep is seconds.
  */
class OracleSchemaAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Types with exactly one cross-stack representation. Notably absent:
    * DecimalType (the r9 failure class), FloatType (single-precision
    * widens inconsistently; lanes emit double), nested/array types
    * (element-order and null rendering differ — the embedding lanes
    * emit exploded (dim, v) rows instead). TimestampType is allowed on
    * the strength of evidence, not theory: parquet stores UTC micros,
    * the session timezone is pinned UTC ([[Sessions]]), and the
    * timestamp-emitting lane (`sessionize_events`) has hash-matched the
    * driver's oracle every round since it landed.
    */
  private def driverProof(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | DoubleType | BooleanType |
         DateType | TimestampType => true
    case _ => false
  }

  test("every registered query has a DuckDB oracle — no rows-only rows") {
    // r10 reached 0 `no_oracle` rows in the driver's hard signal (a
    // rows-only lane records as `err`, indistinguishable from broken).
    // Lock it in: a new lane must ship WITH its oracle — equivalence
    // oracle, literal pinning, or demotion to spec coverage are the
    // documented outs (DedupQueries / SimilarityQueries scaladocs).
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"registered without an oracle: ${unoracled.toSeq.sorted.mkString(", ")}")
  }

  /** Spark-side final schemas, computed once for both direction sweeps
    * (schema inspection triggers analysis; streaming/CRUD lanes execute
    * on call — the sf0.001 corpus keeps the whole sweep in seconds).
    */
  private lazy val sparkSchemas: Map[String, StructType] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val schema = fn(spark, dir).schema
      spark.catalog.clearCache()
      graft.util.DeferredCleanup.drain()
      name -> schema
    }.toMap

  test("every registered query's FINAL schema uses only driver-proof " +
      "column types (no decimals, floats, or nested types)") {
    val offenders = sparkSchemas.toSeq.sortBy(_._1).flatMap {
      case (name, schema) =>
        schema.fields.filterNot(f => driverProof(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    assert(offenders.isEmpty,
      s"representation-fragile final columns:\n${offenders.mkString("\n")}")
  }

  /** DuckDB type → the Spark type class it must pair with. Anything
    * NOT in this map is oracle-side fragile (DECIMAL arithmetic left
    * uncast, HUGEINT from integer SUM, FLOAT, lists/structs) — the
    * half of the r9 failure class the Spark-side sweep cannot see.
    */
  private def duckClass(t: String): Option[DataType] = t match {
    case "BIGINT" => Some(LongType)
    case "INTEGER" => Some(IntegerType)
    case "DOUBLE" => Some(DoubleType)
    case "VARCHAR" => Some(StringType)
    case "BOOLEAN" => Some(BooleanType)
    case "DATE" => Some(DateType)
    case "TIMESTAMP" | "TIMESTAMP WITH TIME ZONE" => Some(TimestampType)
    case _ => None
  }

  test("every oracle's FINAL schema (DuckDB DESCRIBE) is driver-proof " +
      "and column-compatible with the Spark side") {
    // r10 ADVICE #6: the Spark-side guard covers half the failure
    // class — an oracle-side expression can still emit a fragile
    // intermediate (uncast DECIMAL arithmetic, HUGEINT integer SUMs).
    // DESCRIBE plans every oracle in the pinned DuckDB without
    // executing and this sweep compares the result schema per column.
    val probe = new ProcessBuilder("python3", "-c", "import duckdb")
      .start()
    assume(probe.waitFor() == 0,
      "python3+duckdb unavailable — oracle-side audit needs the " +
        "driver-side stack")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    SparkEntry.oracleSql.foreach { case (k, v) => node.put(k, v): Unit }
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.write(tmp, om.writeValueAsBytes(node))
    val pb = new ProcessBuilder("python3", "tools/oracle_schema_audit.py",
      dir, tmp.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"audit tool failed:\n$out")
    val rows = out.linesIterator.filter(_.nonEmpty)
      .map(_.split("\t", 3)).toSeq
    val errors = rows.filter(_(1) == "!ERROR")
      .map(r => s"${r(0)}: ${r(2)}")
    assert(errors.isEmpty,
      s"oracles that do not plan in DuckDB:\n${errors.mkString("\n")}")
    val duck: Map[String, Seq[(String, String)]] = rows
      .filter(_(1) != "!ERROR")
      .groupBy(_(0)).map { case (n, rs) =>
        n -> rs.map(r => (r(1), r(2))) }
    val offenders = SparkEntry.oracleSql.keySet.toSeq.sorted.flatMap {
      name =>
        val spark = sparkSchemas(name).fields
          .map(f => f.name -> f.dataType).toMap
        duck.getOrElse(name, Seq.empty).flatMap { case (col, typ) =>
          duckClass(typ) match {
            case None =>
              Seq(s"$name.$col: oracle-fragile DuckDB type $typ")
            case Some(cls) => spark.get(col) match {
              case None =>
                Seq(s"$name.$col: oracle column absent from Spark " +
                  s"schema (${spark.keys.toSeq.sorted.mkString(", ")})")
              case Some(st) if st != cls =>
                Seq(s"$name.$col: oracle $typ vs Spark " +
                  st.simpleString)
              case _ => Seq.empty
            }
          }
        } ++ {
          val duckCols = duck.getOrElse(name, Seq.empty).map(_._1).toSet
          spark.keySet.diff(duckCols).toSeq.sorted
            .map(c => s"$name.$c: Spark column absent from oracle")
        }
    }
    assert(offenders.isEmpty,
      s"oracle-side schema offenders:\n${offenders.mkString("\n")}")
  }
}
