package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Capabilities register themselves as [[QueryPack]]s; this object is the
  * flat view the driver consumes.
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    profile.ProfileQueries,
    dq.DqQueries,
    dq.FileDqQueries,
    pipeline.PipelineQueries,
    pipeline.BuilderQueries,
    security.PiiQueries,
    text.TextQueries,
    dedup.DedupQueries,
    sim.SimilarityQueries,
    exec.ExecQueries,
    io.DiscoveryQueries,
    mm.MultimodalQueries,
    orch.OrchQueries,
    streaming.StreamingQueries,
    catalog.GlossaryQueries,
    graph.GraphQueries)

  private lazy val all: Seq[QueryDef] = packs.flatMap(_.queries)

  /** Flagship query; driver smoke-checks rows>0. Data dir defaults to the
    * smoke scale factor but is env-overridable (no baked-in path policy).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DIR",
      "/root/testdata/sf0.001")
    profile.Profiler.profile(
      spark.read.parquet(s"$dir/lineitem.parquet"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
