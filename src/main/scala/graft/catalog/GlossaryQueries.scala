package graft.catalog

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.interp.TextGenerator
import graft.io.Schemas

/** Registered glossary query: the full CRUD cycle (create-if-absent,
  * batched append, table-filtered delete + regenerate) run against a
  * scratch glossary, then read back as a relation. Regenerating `nation`
  * twice proves the filtered-delete path replaces rather than duplicates
  * (`/root/reference/Business_Glossory.sql:47-50,85-89`). The oracle is
  * the literal expected table — definitions come from the deterministic
  * stub, so every row is predictable.
  */
object GlossaryQueries extends QueryPack {

  private def meta(table: String): Seq[(String, String, String)] =
    Schemas.byTable(table).map(c => (table, c.name, c.engineType))

  private def stubDef(table: String, column: String,
      dataType: String): String =
    TextGenerator.Stub.generate(
      Glossary.definitionPrompt(table, column, dataType))

  private def glossaryQuery = QueryDef(
    "glossary_crud_cycle",
    (s, dir) => {
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_glossary_q"
      Glossary.deleteForTest(path)
      Glossary.createIfAbsent(s, path)
      Glossary.regenerate(s, path, meta("region"), Some("region"))
      Glossary.regenerate(s, path, meta("nation"), Some("nation"))
      // second regenerate of the same table must REPLACE its slice
      Glossary.regenerate(s, path, meta("nation"), Some("nation"))
      Glossary.read(s, path)
        .orderBy("TABLE_NAME", "COLUMN_NAME")
    },
    Some {
      val rows = (meta("nation") ++ meta("region")).map { case (t, c, d) =>
        s"SELECT '${t.toUpperCase}' AS TABLE_NAME, '$c' AS COLUMN_NAME, " +
          s"'$d' AS DATA_TYPE, " +
          s"'${stubDef(t, c, d).replace("'", "''")}' AS BUSINESS_DEFINITION"
      }
      rows.mkString(" UNION ALL ") + " ORDER BY TABLE_NAME, COLUMN_NAME"
    })

  override def queries: Seq[QueryDef] = Seq(glossaryQuery)
}
