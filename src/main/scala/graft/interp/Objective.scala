package graft.interp

/** Deterministic objective interpretation: task routing and metadata
  * keyword filtering (`/root/reference/CODE_GENERATOR.sql:25-34`,
  * `/root/reference/Obj_Interpreter.sql:17-29`).
  */
object Objective {

  sealed abstract class TaskType(val name: String)
  case object Scd1Pipeline extends TaskType("scd1_pipeline")
  case object JoinQuery extends TaskType("join_query")
  case object Aggregation extends TaskType("aggregation")
  case object DdlCopy extends TaskType("ddl_copy")
  case object Generic extends TaskType("generic")

  /** F15: keyword routing, reference priority order
    * (`CODE_GENERATOR.sql:25-34`).
    */
  def taskType(objective: String): TaskType = {
    val o = objective.trim.toLowerCase
    if (o.contains("scd1") || o.contains("incremental")) Scd1Pipeline
    else if (o.contains("join")) JoinQuery
    else if (o.contains("summary") || o.contains("aggregate") ||
      o.contains("monthly")) Aggregation
    else if (o.contains("filename:") && o.contains("stage:")) DdlCopy
    else Generic
  }

  /** Column metadata per table: (columnName, dataType). */
  type Metadata = Map[String, Seq[(String, String)]]

  /** F16: numeric-aggregate keywords (`Obj_Interpreter.sql:19`). */
  val NumericKeywords: Seq[String] =
    Seq("SUM", "AVG", "COUNT", "AMOUNT", "PRICE", "QUANTITY", "TOTAL")

  /** Keep tables with a column either named in the objective or whose
    * name contains a numeric keyword (`Obj_Interpreter.sql:17-29`).
    * (The keyword test makes most metric tables always pass — faithful
    * to the reference, which conjoins the tests with `or`.)
    */
  def filterRequiredMetadata(objective: String, metadata: Metadata)
      : Metadata = {
    val up = objective.toUpperCase
    metadata.filter { case (_, cols) =>
      cols.exists { case (name, _) =>
        val n = name.toUpperCase
        up.contains(n) || NumericKeywords.exists(n.contains)
      }
    }
  }

  /** Prompt pair for a task type (`CODE_GENERATOR.sql:39-119`), retargeted
    * from Snowflake SQL/Snowpark to Spark SQL / Scala Dataset API — the
    * deterministic half of codegen; the model behind [[TextGenerator]]
    * fills in the actual code.
    */
  def prompts(objective: String, tpe: TaskType): (String, String) =
    tpe match {
      case Scd1Pipeline => (
        "Generate a Spark SQL incremental-load statement with SCD Type 1 " +
          "(overwrite) semantics. Use metadata for column names and keys. " +
          "Where multiple source rows share a key, keep only the latest " +
          "record by CREATED_AT. Use a ROW_NUMBER window dedup plus an " +
          "anti-join + UNION ALL BY NAME upsert (Spark has no MERGE on " +
          s"plain tables). Output only SQL.\nObjective: $objective",
        "Generate Scala Spark Dataset code implementing incremental load " +
          "with SCD Type 1: dedup the source to the latest record per key " +
          "by CREATED_AT (Window.partitionBy + row_number), then " +
          "left_anti join + unionByName against the target. Output only " +
          s"Scala code.\nObjective: $objective")
      case JoinQuery => (
        "Generate a Spark SQL SELECT joining the necessary tables as " +
          "described. Include all join keys, derived columns and computed " +
          s"fields. Output only SQL.\nObjective: $objective",
        "Generate Scala Spark Dataset code performing the same join and " +
          s"column selection. Output only Scala code.\nObjective: " +
          objective)
      case Aggregation => (
        "Generate a Spark SQL aggregation query (GROUP BY with computed " +
          "metrics; monthly summaries via date_trunc('month', ...)). " +
          s"Output only SQL.\nObjective: $objective",
        "Generate Scala Spark Dataset code with groupBy/agg for the same " +
          s"summary. Output only Scala code.\nObjective: $objective")
      case DdlCopy => (
        "Generate Spark SQL that creates a table from a staged file: " +
          "CREATE TABLE ... USING parquet/csv options inferred from the " +
          s"file metadata. Output only SQL.\nObjective: $objective",
        "Generate Scala Spark code that reads the staged file with " +
          "schema inference and writes it with saveAsTable. Output only " +
          s"Scala code.\nObjective: $objective")
      case Generic => (
        s"Generate Spark SQL for: $objective. Output only SQL.",
        s"Generate Scala Spark Dataset code for: $objective. Output " +
          "only Scala code.")
    }

  final case class CodeGenResult(taskType: String, sqlCode: String,
      sparkCode: String)

  /** The CODE_GENERATOR_SP flow minus the network: route → prompts →
    * generate (stubbed/injected) → clean (`CODE_GENERATOR.sql:120-136`).
    */
  def generateCode(objective: String, metadata: Metadata,
      gen: TextGenerator = TextGenerator.Stub): CodeGenResult = {
    val tpe = taskType(objective)
    val (sqlPrompt, sparkPrompt) = prompts(objective, tpe)
    CodeGenResult(tpe.name,
      TextGenerator.cleanCode(gen.generate(sqlPrompt, metadata)),
      TextGenerator.cleanCode(gen.generate(sparkPrompt, metadata)))
  }
}
