package graft.exec

import graft.{QueryDef, QueryPack}
import graft.io.Tables

/** Registered script-engine query: run a 3-statement script (with a
  * deliberately failing middle statement) over a temp view of `events` and
  * emit the audit rows. The oracle is the literal expected audit — the
  * engine's failure-isolation contract — while timing/preview behavior is
  * covered by ScriptEngineSpec.
  */
object ExecQueries extends QueryPack {

  private def scriptQuery = QueryDef(
    "exec_script_audit",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events").createOrReplaceTempView("exec_events")
      val report = ScriptEngine.run(s,
        """-- aggregate then fail then read
          |CREATE OR REPLACE TEMPORARY VIEW exec_top AS
          |  SELECT event_type, count(*) AS n FROM exec_events
          |  GROUP BY event_type;
          |SELECT * FROM this_table_does_not_exist;
          |SELECT * FROM exec_top;""".stripMargin)
      report.details
        .map(d => (d.step, d.status, d.error.isDefined))
        .toDF("step", "status", "failed")
        .orderBy("step")
    },
    Some("SELECT 1 AS step, 'SUCCESS' AS status, false AS failed " +
      "UNION ALL SELECT 2, 'FAILED', true " +
      "UNION ALL SELECT 3, 'SUCCESS', false ORDER BY step"))

  override def queries: Seq[QueryDef] = Seq(scriptQuery)
}
