package graft.util

import org.apache.spark.sql.DataFrame

/** F17: driver-side markdown rendering of small result samples — the
  * Spark equivalent of the reference's `to_markdown` report assembly
  * (`/root/reference/Data_Security.sql:71-84`). Strictly for ≤-preview-cap
  * frames: it collects, so callers must `limit()` first (all call sites
  * here pass ≤ 5 rows, the reference's preview cap).
  */
object Render {

  /** GitHub-style pipe table of (up to) `maxRows` rows. */
  def markdownTable(df: DataFrame, maxRows: Int = 5): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(maxRows).collect().toSeq.map(r =>
      cols.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse("")))
    val widths = cols.indices.map { i =>
      (cols(i).length +: rows.map(_(i).length)).max
    }
    def line(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("|-", "-|-", "-|")
    (line(cols) +: sep +: rows.map(line)).mkString("\n")
  }

  /** The masking report shape (`Data_Security.sql:74-84`): before/after
    * samples plus the detected column→type map.
    */
  def maskingReport(table: String, before: DataFrame, after: DataFrame,
      piiInfo: Map[String, String]): String =
    s"""### Original Table Sample ($table)
       |${markdownTable(before)}
       |
       |### Masked Table Sample (${table}_MASKED)
       |${markdownTable(after)}
       |
       |**Columns Masked:** ${piiInfo.keys.toSeq.sorted.mkString("[", ", ", "]")}
       |**Masking Details:** ${piiInfo.toSeq.sorted.map { case (k, v) => s"$k -> $v" }.mkString("{", ", ", "}")}
       |""".stripMargin
}
