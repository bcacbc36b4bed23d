package graft.orch

import org.apache.spark.sql.SparkSession

import graft.interp.{Objective, TextGenerator}
import graft.io.Discovery

/** Ingestion orchestration: discovery → codegen composition
  * (`/root/reference/INGESTION_CODE_GENERATOR.sql:25-77`).
  *
  * The reference's two `session.call` hops (separate stored-procedure
  * sandboxes) become plain function composition in one driver; only Spark
  * actions fan out. Errors short-circuit into a FAILED result like the
  * reference's try/except envelope.
  */
object Ingestion {

  final case class Result(status: String, filePath: String,
      objective: String, taskType: Option[String], sqlCode: Option[String],
      sparkCode: Option[String],
      columns: Seq[Discovery.ColumnDef], error: Option[String])

  def run(spark: SparkSession, objective: String, filePath: String,
      gen: TextGenerator = TextGenerator.Stub): Result =
    try {
      // 1. discovery (`:31-41`)
      val fd = Discovery.fileDefinition(spark, filePath)
      // 2. codegen with the discovered metadata (`:45-53`)
      val metadata: Objective.Metadata =
        Map(fd.fileName -> fd.columns.map(c => (c.columnName, c.`type`)))
      val code = Objective.generateCode(objective, metadata, gen)
      // 3. composed response (`:61-77`)
      Result("SUCCESS", filePath, objective, Some(code.taskType),
        Some(code.sqlCode), Some(code.sparkCode), fd.columns, None)
    } catch {
      case e: Exception =>
        Result("FAILED", filePath, objective, None, None, None, Nil,
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
    }
}
