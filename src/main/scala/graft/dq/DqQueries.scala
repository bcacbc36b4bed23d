package graft.dq

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.io.{Schemas, Tables}
import graft.io.Schemas.ColSpec
import graft.profile.Profiler

/** Registered five-pillar DQ queries with DuckDB oracles.
  *
  * The clock is pinned to a date INSIDE the corpus's date range so the
  * temporal accuracy pillar exercises a nonzero future-count branch
  * (`/root/reference/Data_Quality_Table.sql:148-153`); with a present-day
  * clock every score would be a constant 1.0 and the oracle would prove
  * nothing.
  */
object DqQueries extends QueryPack {

  val FixedNow = "1996-06-01 00:00:00"

  /** DuckDB arithmetic mirroring [[TableDq.score]] for one column. Returns
    * (per-pillar rounded selects, unrounded column_score expression).
    */
  private def pillarSql(c: ColSpec): (String, String) = {
    val q = c.name
    val comp = s"1 - (COUNT(*) - COUNT($q))::DOUBLE / GREATEST(COUNT(*), 1)"
    val uniq = s"COUNT(DISTINCT $q)::DOUBLE / GREATEST(COUNT(*), 1)"
    val valid =
      if (c.numeric)
        s"CASE WHEN COALESCE(AVG($q), 0) >= 0 THEN 1.0 ELSE 0.5 END"
      else "1.0"
    val acc =
      if (c.temporal)
        s"1 - (CASE WHEN COUNT(*) > 0 THEN SUM(CASE WHEN $q > TIMESTAMP " +
          s"'$FixedNow' THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) ELSE 0 END)"
      else "1.0"
    val cons = "1.0"
    val pillars =
      s"ROUND($comp, 3) AS completeness, ROUND($uniq, 3) AS uniqueness, " +
        s"ROUND($valid, 3) AS validity, ROUND($acc, 3) AS accuracy, " +
        s"ROUND($cons, 3) AS consistency"
    val colScore = s"ROUND((($comp) + ($uniq) + ($valid) + ($acc) + " +
      s"($cons)) / 5, 3)"
    (pillars, colScore)
  }

  private def dqOracle(table: String, cols: Seq[ColSpec]): String =
    cols.map { c =>
      val (pillars, colScore) = pillarSql(c)
      s"SELECT '${c.name}' AS column_name, $pillars, " +
        s"$colScore AS column_score FROM $table"
    }.mkString(" UNION ALL ") + " ORDER BY column_name"

  private def tableScoreOracle(table: String, cols: Seq[ColSpec]): String = {
    val scores = cols.map { c => s"SELECT ${pillarSql(c)._2} AS s FROM $table" }
    s"SELECT ROUND(AVG(s), 3) AS table_score FROM (" +
      scores.mkString(" UNION ALL ") + ")"
  }

  private def profiled(table: String) =
    (s: org.apache.spark.sql.SparkSession, dir: String) =>
      Profiler.profile(Tables.load(s, dir, table, parallelize = true),
        now = lit(FixedNow).cast("timestamp"))

  private def dqQuery(table: String): QueryDef =
    QueryDef(s"dq_table_$table",
      (s, dir) => TableDq.score(profiled(table)(s, dir))
        .orderBy("column_name"),
      Some(dqOracle(table, Schemas.byTable(table))))

  private def scoreQuery(table: String): QueryDef =
    QueryDef(s"dq_score_$table",
      (s, dir) => TableDq.tableScore(profiled(table)(s, dir)),
      Some(tableScoreOracle(table, Schemas.byTable(table))))

  override def queries: Seq[QueryDef] = Seq(
    dqQuery("lineitem"), dqQuery("orders"), dqQuery("events"),
    scoreQuery("lineitem"), scoreQuery("documents"))
}
