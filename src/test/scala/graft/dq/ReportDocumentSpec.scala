package graft.dq

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.{Catalog, Discovery, Tables}
import graft.profile.Profiler

/** The VARIANT report documents (`Data_Quality_Table.sql:183-189`,
  * `Data_Discovery_File.sql:423-433`): shape-pinned by parsing the
  * rendered JSON back through Spark's JSON reader and checking fields.
  */
class ReportDocumentSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val now = lit(DqQueries.FixedNow).cast("timestamp")

  private def parse(json: String) =
    spark.read.json(Seq(json).toDS)

  test("table DQ document carries columns/profiling/dq_results/score") {
    val df = Tables.load(spark, sf, "orders")
    val doc = TableDq.document(
      Profiler.profile(df, now),
      Catalog.columnsFrame(spark, df, "orders"), "orders")
    val parsed = parse(doc)
    assert(parsed.columns.toSet ===
      Set("target_table", "columns", "profiling", "dq_results",
        "table_score"))
    val row = parsed.head()
    assert(row.getAs[String]("target_table") === "orders")
    val score = row.getAs[Double]("table_score")
    assert(score > 0.0 && score <= 1.0)
    // per-column keys present for a known column
    val dq = parsed.select("dq_results.o_orderkey.column_score").head()
    assert(dq.getDouble(0) > 0.0)
    val profiling = parsed
      .select("profiling.o_totalprice.numeric_stats.AVG_VAL").head()
    assert(profiling.getString(0).toDouble > 0.0)
    // non-numeric columns carry null numeric_stats like the reference
    assert(parse(doc).select("profiling.o_orderstatus.numeric_stats")
      .head().isNullAt(0))
  }

  test("file DQ document carries definition, summary and audit log") {
    val path = s"$sf/events.parquet"
    val df = Tables.load(spark, sf, "events")
    val fd = Discovery.fileDefinition(spark, path)
    val report = FileDq.report(df, Profiler.profile(df, now))
    val doc = FileDq.document(fd, report, path, 100.0, 105.5)
    val parsed = parse(doc)
    assert(parsed.columns.toSet ===
      Set("file_definition", "dq_auto_check_result", "audit_log"))
    val r = parsed.select(
      "dq_auto_check_result.rules_pass", "dq_auto_check_result.rules_fail",
      "audit_log.agent_name", "audit_log.start_time", "audit_log.input")
      .head()
    assert(r.getLong(0) + r.getLong(1) === report.count())
    assert(r.getString(2) === "DQ_DISCOVERY_AND_CHECKS")
    assert(r.getDouble(3) === 100.0)
    assert(r.getString(4) === path)
    assert(parsed.select(explode(col(
      "dq_auto_check_result.passed_rules_detail"))).count() === r.getLong(0))
  }
}
