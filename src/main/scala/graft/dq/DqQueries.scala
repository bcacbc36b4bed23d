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
    // constant pillars are ::DOUBLE, not bare 1.0 literals: a bare
    // decimal literal propagates DECIMAL(2,1) through ROUND into the
    // FINAL schema — the oracle-side half of the r9 representation
    // fragility, caught by OracleSchemaAuditSpec's DESCRIBE sweep (r11)
    val valid =
      if (c.numeric)
        s"CASE WHEN COALESCE(AVG($q), 0) >= 0 THEN 1.0::DOUBLE " +
          "ELSE 0.5::DOUBLE END"
      else "1.0::DOUBLE"
    val acc =
      if (c.temporal)
        s"1 - (CASE WHEN COUNT(*) > 0 THEN SUM(CASE WHEN $q > TIMESTAMP " +
          s"'$FixedNow' THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) ELSE 0 END)"
      else "1.0::DOUBLE"
    val cons = "1.0::DOUBLE"
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

  /** Distribution drift ([[Drift]]): categorical drift on
    * o_orderstatus plus bucketed numeric drift on o_totalprice between
    * two modulo-derived snapshots (the [[graft.pipeline.SnapshotDiff]]
    * gate's derivation, reused so the two lanes answer the same
    * "what happened to this feed" question at row vs population
    * grain). TV is the exact-rational integer-numerator form — the
    * double hashes bit-identically.
    */
  private def driftQuery: QueryDef = QueryDef(
    "dq_drift_orders",
    (s, dir) => {
      val proj = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val before = proj.filter(col("o_orderkey") % 11 =!= 0)
      val after = proj.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 7 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      val cat = Drift.categoricalDrift(before, after, "o_orderstatus")
        .withColumn("col_name", lit("o_orderstatus"))
      val num = Drift.numericDrift(before, after, "o_totalprice",
          width = 50000.0)
        .withColumn("col_name", lit("o_totalprice"))
      cat.unionByName(num)
        .select("col_name", "value", "cnt_a", "cnt_b", "share_a",
          "share_b", "tv")
        .orderBy("col_name", "value")
    },
    Some {
      def side(c: String) =
        s"SELECT CAST($c AS VARCHAR) AS value, count(*) AS cnt " +
          "FROM snap GROUP BY 1"
      def block(colName: String, snapA: String, snapB: String) =
        s"WITH snap AS ($snapA), ca AS (${side(colName)}), " +
          s"snap2 AS ($snapB), " +
          s"cb AS (SELECT CAST($colName AS VARCHAR) AS value, " +
          "count(*) AS cnt FROM snap2 GROUP BY 1), " +
          "j AS (SELECT coalesce(ca.value, cb.value) AS value, " +
          "coalesce(ca.cnt, 0) AS cnt_a, coalesce(cb.cnt, 0) AS cnt_b " +
          "FROM ca FULL OUTER JOIN cb ON ca.value IS NOT DISTINCT " +
          "FROM cb.value), " +
          "t AS (SELECT sum(cnt_a) AS total_a, sum(cnt_b) AS total_b " +
          "FROM j), " +
          "nm AS (SELECT sum(abs(cnt_a * total_b - cnt_b * total_a)) " +
          "AS tv_num FROM j, t) " +
          s"SELECT '$colName' AS col_name, value, cnt_a, cnt_b, " +
          "CAST(cnt_a AS DOUBLE) / CAST(total_a AS DOUBLE) AS share_a, " +
          "CAST(cnt_b AS DOUBLE) / CAST(total_b AS DOUBLE) AS share_b, " +
          "CAST(tv_num AS DOUBLE) / (2.0 * CAST(total_a AS DOUBLE) * " +
          "CAST(total_b AS DOUBLE)) AS tv FROM j, t, nm"
      val beforeCat = "SELECT o_orderstatus FROM orders " +
        "WHERE o_orderkey % 11 != 0"
      val afterCat = "SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'X' " +
        "ELSE o_orderstatus END AS o_orderstatus FROM orders " +
        "WHERE o_orderkey % 13 != 0"
      val beforeNum = "SELECT floor(CAST(o_totalprice AS DOUBLE) / " +
        "50000.0) * 50000.0 AS o_totalprice FROM orders " +
        "WHERE o_orderkey % 11 != 0"
      val afterNum = "SELECT floor(CAST(o_totalprice AS DOUBLE) / " +
        "50000.0) * 50000.0 AS o_totalprice FROM orders " +
        "WHERE o_orderkey % 13 != 0"
      s"SELECT * FROM ((${block("o_orderstatus", beforeCat, afterCat)}) " +
        s"UNION ALL (${block("o_totalprice", beforeNum, afterNum)})) " +
        "ORDER BY col_name, value"
    })

  /** Declarative expectation suite ([[RuleSuite]]): seven checks over
    * orders compiled into ONE aggregation pass; `price_under_1k` is
    * deliberately failing (min o_totalprice ≈ 1013 at the gate corpus)
    * so the report carries a real `passed = false` row. Metrics are
    * exact counts → one IEEE division, mirrored verbatim in the
    * oracle.
    */
  private def suiteRules = Seq(
    RuleSuite.Rule("orderkey_complete", "o_orderkey", "complete", 1.0),
    RuleSuite.Rule("orderkey_unique", "o_orderkey", "unique", 1.0),
    RuleSuite.Rule("status_accepted", "o_orderstatus", "accepted", 1.0,
      "O,F,P"),
    RuleSuite.Rule("price_nonneg", "o_totalprice", "min_at_least", 0.0),
    RuleSuite.Rule("price_under_500k", "o_totalprice", "max_at_most",
      500000.0),
    RuleSuite.Rule("price_under_1k", "o_totalprice", "between_frac",
      0.9, "0,1000"),
    RuleSuite.Rule("priority_matches", "o_orderpriority", "matches",
      1.0, "^[0-9]-[A-Z ]+$"))

  private def suiteQuery = QueryDef(
    "dq_suite_orders",
    (s, dir) => RuleSuite.run(Tables.load(s, dir, "orders"), suiteRules)
      .orderBy("rule"),
    Some {
      def metricSql(r: RuleSuite.Rule): String = r.kind match {
        case "complete" =>
          s"count(${r.column})::DOUBLE / count(*)"
        case "unique" =>
          s"count(DISTINCT ${r.column})::DOUBLE / count(*)"
        case "min_at_least" => s"CAST(min(${r.column}) AS DOUBLE)"
        case "max_at_most" => s"CAST(max(${r.column}) AS DOUBLE)"
        case "between_frac" =>
          val Array(lo, hi) = r.param.split(",").map(_.trim)
          s"sum(CASE WHEN ${r.column} BETWEEN $lo AND $hi THEN 1 " +
            s"ELSE 0 END)::DOUBLE / count(*)"
        case "matches" =>
          s"sum(CASE WHEN regexp_matches(${r.column}, '${r.param}') " +
            s"THEN 1 ELSE 0 END)::DOUBLE / count(*)"
        case "accepted" =>
          val vs = r.param.split(",").map(v => s"'${v.trim}'")
            .mkString(", ")
          s"sum(CASE WHEN ${r.column} IN ($vs) THEN 1 ELSE 0 " +
            s"END)::DOUBLE / count(*)"
      }
      val aggs = suiteRules.zipWithIndex.map { case (r, i) =>
        s"${metricSql(r)} AS m_$i"
      }.mkString(", ")
      val legs = suiteRules.zipWithIndex.map { case (r, i) =>
        val cmp = if (r.kind == "max_at_most") "<=" else ">="
        s"SELECT '${r.name}' AS rule, '${r.column}' AS col_name, " +
          s"'${r.kind}' AS kind, m_$i AS metric, " +
          s"CAST(${r.threshold} AS DOUBLE) AS threshold, " +
          s"m_$i $cmp ${r.threshold} AS passed FROM a"
      }.mkString(" UNION ALL ")
      s"WITH a AS (SELECT $aggs FROM orders) " +
        s"SELECT * FROM ($legs) ORDER BY rule"
    })

  override def queries: Seq[QueryDef] = Seq(
    dqQuery("lineitem"), dqQuery("orders"), dqQuery("events"),
    scoreQuery("lineitem"), scoreQuery("documents"), driftQuery,
    suiteQuery)
}
