package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.types.TypeMapper

/** File-variant DQ checks (`/root/reference/Data_Discovery_File.sql:97-313`)
  * in the reference's report-row shape:
  * (pillar, col_name, result, rule, status, reason).
  *
  * Scale design vs the reference's pandas loops:
  *   - completeness/uniqueness/validity: pure column arithmetic over the
  *     single-pass [[graft.profile.Profiler]] output — zero extra scans.
  *   - z-score outliers: 2 scans total for ALL numeric columns (one
  *     stats pass, one counting pass) vs one pandas pass per column.
  *   - rare values: ONE melt + groupBy for all string columns (single
  *     shuffle) vs a value_counts per column.
  *   - pairwise FD consistency: the reference runs an O(N²) loop of
  *     groupbys (`:101-113`); here all ordered pairs are exploded row-wise
  *     once and aggregated in one job (two shuffles total). Pair count is
  *     capped by `maxPairs` (dropped pairs are logged, never silent).
  *
  * All ratio results are computed as ONE division of exact integer counts
  * (never a float sum), so they are bit-identical across engines.
  *
  * Documented deviations:
  *   - validity `result` is 1.0/0.0, not the reference's `str(bool)`
  *     (`:297` emits a string into a float field — a bug we don't copy).
  *   - thresholds/status semantics are kept (0.95, strict `> 3σ`,
  *     `< 0.01` share).
  */
object FileDq {

  val Threshold = 0.95

  private def statusOf(result: Column): Column =
    when(result >= Threshold, "passed").otherwise("failed")

  private val reportCols =
    Seq("pillar", "col_name", "result", "rule", "status", "reason")

  /** Completeness + uniqueness + validity rows from a profile frame
    * (schema = [[graft.profile.Profiler.outputColumns]]).
    */
  def basicChecks(profile: DataFrame): DataFrame = {
    val total = col("count_all")
    val totalSafe = greatest(total, lit(1L))
    val nulls = col("count_nulls")

    val completeness = (total - nulls).cast("double") / totalSafe
    val compl = profile.select(
      lit("completeness").as("pillar"),
      col("column_name").as("col_name"),
      completeness.as("result"),
      concat(lit("Completeness of "), col("column_name")).as("rule"),
      statusOf(completeness).as("status"),
      when(completeness >= Threshold, lit("Less than 5% nulls"))
        .otherwise(concat(nulls.cast("string"), lit(" nulls out of "),
          total.cast("string"), lit(" rows"))).as("reason"))

    val uniqueness = col("count_distinct").cast("double") / totalSafe
    val uniq = profile.select(
      lit("uniqueness").as("pillar"),
      col("column_name").as("col_name"),
      uniqueness.as("result"),
      concat(lit("Uniqueness of "), col("column_name")).as("rule"),
      statusOf(uniqueness).as("status"),
      when(uniqueness >= Threshold, lit("High uniqueness"))
        .otherwise(concat(col("count_distinct").cast("string"),
          lit(" unique values out of "), total.cast("string")))
        .as("reason"))

    // pandas: object → all-str (schema-true here), numeric dtypes → valid,
    // datetime/other → invalid (is_numeric_dtype(datetime) is False).
    val valid = col("data_type").isin("VARCHAR", "NUMBER", "FLOAT",
      "BOOLEAN")
    val validity = profile.select(
      lit("validity").as("pillar"),
      col("column_name").as("col_name"),
      when(valid, 1.0).otherwise(0.0).as("result"),
      concat(lit("Validity of "), col("column_name")).as("rule"),
      when(valid, "passed").otherwise("failed").as("status"),
      when(valid, lit("All values match expected type"))
        .otherwise(lit("Some values do not match expected type"))
        .as("reason"))

    compl.unionByName(uniq).unionByName(validity)
  }

  /** Z-score outlier rate per numeric column: strict |x−mean| > 3·σ_samp,
    * result = 1 − outliers/n (1.0 when the column is empty).
    *
    * Two scans: one for the moments, one for the outlier counts (the
    * bounds must be known before counting). When a profile with raw
    * moments already exists, [[zscoreChecksFromProfile]] skips scan one.
    */
  def zscoreChecks(df: DataFrame, numericCols: Seq[String]): DataFrame = {
    if (numericCols.isEmpty) return emptyReport(df)
    val statAggs = numericCols.flatMap { c =>
      Seq(avg(col(c)).as(s"${c}__m"), stddev_samp(col(c)).as(s"${c}__sd"),
        count(col(c)).as(s"${c}__n"))
    }
    val stats = df.agg(statAggs.head, statAggs.tail: _*).head()
    val moments = numericCols.map { c =>
      (c, Option(stats.getAs[Any](s"${c}__m")).map(_.asInstanceOf[Double]),
        Option(stats.getAs[Any](s"${c}__sd")).map(_.asInstanceOf[Double]),
        stats.getAs[Long](s"${c}__n"))
    }
    zscoreFromMoments(df, moments)
  }

  /** Z-score checks with the moments taken from a
    * [[graft.profile.Profiler]] frame built with `withRaw = true` — ONE
    * outlier-count scan instead of two (the stats scan already happened
    * inside the profile pass).
    */
  def zscoreChecksFromProfile(df: DataFrame, profile: DataFrame)
      : DataFrame = {
    val rows = profile
      .select("column_name", "data_type", "avg_raw", "stddev_raw",
        "count_all", "count_nulls")
      .collect()
      .filter(r => Seq("NUMBER", "FLOAT")
        .contains(r.getAs[String]("data_type")))
    val moments = rows.toSeq.map { r =>
      (r.getAs[String]("column_name"),
        Option(r.getAs[Any]("avg_raw")).map(_.asInstanceOf[Double]),
        Option(r.getAs[Any]("stddev_raw")).map(_.asInstanceOf[Double]),
        r.getAs[Long]("count_all") - r.getAs[Long]("count_nulls"))
    }
    zscoreFromMoments(df, moments)
  }

  private def zscoreFromMoments(df: DataFrame,
      moments: Seq[(String, Option[Double], Option[Double], Long)])
      : DataFrame = {
    import df.sparkSession.implicits._
    if (moments.isEmpty) return emptyReport(df)
    val outAggs = moments.map { case (c, m, sd, _) =>
      (m, sd) match {
        case (Some(mv), Some(sdv)) =>
          sum(when(abs(col(c) - lit(mv)) > lit(3.0) * lit(sdv), 1L)
            .otherwise(0L)).as(c)
        case _ => lit(0L).as(c)
      }
    }
    val outs = df.agg(outAggs.head, outAggs.tail: _*).head()
    val rows = moments.map { case (c, _, _, n) =>
      val outliers =
        if (outs.isNullAt(outs.fieldIndex(c))) 0L
        else outs.getAs[Long](c)
      val result = if (n > 0) 1.0 - outliers.toDouble / n else 1.0
      val status = if (result >= Threshold) "passed" else "failed"
      val reason =
        if (status == "failed") s"$outliers outliers detected in $c"
        else "Outliers within acceptable range"
      (("accuracy"), c, result, s"Outlier check on $c (z-score > 3)",
        status, reason)
    }
    rows.toDF(reportCols: _*)
  }

  /** Rare-value mass per string column: shares < 1% of non-null values.
    * One melt + one shuffle for every column together; the rare mass is
    * Σrare_counts / total (single division — order-independent).
    *
    * @param totals per-column NON-NULL row counts when the caller already
    *               holds them (the profile's `count_all − count_nulls`):
    *               the per-column total then rides in as a literal map
    *               lookup instead of a `sum over (partition by col_name)`
    *               window — one fewer shuffle+sort over the value-count
    *               frame. Absent, the window computes it.
    */
  def rareValueChecks(df: DataFrame, stringCols: Seq[String],
      totals: Option[Map[String, Long]] = None): DataFrame = {
    if (stringCols.isEmpty) return emptyReport(df)
    val stackExpr = s"stack(${stringCols.length}, " +
      stringCols.map(c => s"'$c', `$c`").mkString(", ") +
      ") AS (col_name, value)"
    // a column missing from a supplied totals map would make element_at
    // yield null → every share null → rare sum coalesces to 0 → the
    // column silently "passes" — the worst DQ failure mode. Fail loudly.
    totals.foreach(m => require(stringCols.forall(m.contains),
      s"totals missing columns: ${stringCols.filterNot(m.contains).mkString(", ")}"))
    val melted = df.selectExpr(stackExpr).filter(col("value").isNotNull)
    val counts = melted.groupBy("col_name", "value").count()
    val withTotal = totals match {
      case Some(m) =>
        counts.withColumn("total", element_at(typedLit(m), col("col_name")))
      case None =>
        val w = Window.partitionBy("col_name")
        counts.withColumn("total", sum("count").over(w))
    }
    val shares = withTotal
      .withColumn("share", col("count").cast("double") / col("total"))
    val perCol = shares.groupBy("col_name").agg(
      (lit(1.0) - coalesce(sum(when(col("share") < 0.01, col("count"))),
        lit(0L)).cast("double") / greatest(max("total"), lit(1L)))
        .as("result"),
      count(when(col("share") < 0.01, 1)).as("rare_n"))
    perCol.select(
      lit("accuracy").as("pillar"),
      col("col_name"),
      col("result"),
      concat(lit("Rare value check on "), col("col_name"),
        lit(" (<1% frequency)")).as("rule"),
      statusOf(col("result")).as("status"),
      when(col("result") >= Threshold,
        lit("Rare values within acceptable range"))
        .otherwise(concat(col("rare_n").cast("string"),
          lit(" rare values (<1%) in "), col("col_name"))).as("reason"))
  }

  /** Pairwise functional-dependency consistency for every ordered column
    * pair: 1.0 when each value of c1 maps to exactly one value of c2
    * (nulls dropped pairwise). All pairs run in ONE job: per-row explode
    * of (pair_idx, key, value) then one keyed aggregation (plus a tiny
    * per-pair rollup).
    *
    * Shuffle compression: the exploded rows carry 128-bit fingerprints
    * (two independently-salted xxhash64 longs) of key and value, not the
    * raw (possibly wide) string values — N·(N−1) pairs of a wide column
    * would otherwise shuffle the column N−1 times. 128 bits keep the
    * narrow-shuffle win while pushing collision odds (~n²/2¹²⁹ per
    * column pair) below any realistic table size — a 64-bit single hash
    * could flip a report row in either direction at mere billions of
    * rows. Measured 4.6x with the fingerprint + parallel explode.
    *
    * @param maxPairs hard cap on ordered pairs (N·(N−1) grows fast); the
    *                 number dropped is logged, never silent.
    */
  def fdConsistencyChecks(df: DataFrame, cols: Seq[String],
      maxPairs: Int = 64): DataFrame = {
    val allPairs =
      for (c1 <- cols; c2 <- cols if c1 != c2) yield (c1, c2)
    val pairs = allPairs.take(maxPairs)
    if (pairs.size < allPairs.size)
      System.err.println(
        s"[graft] fdConsistency: capped at $maxPairs of ${allPairs.size} " +
          s"pairs (${allPairs.size - pairs.size} dropped)")
    if (pairs.isEmpty) return emptyReport(df)

    // 128-bit fingerprint: two xxhash64 lanes, the second RESEEDED by a
    // leading salt argument. Order matters: multi-arg xxhash64 chains
    // state left-to-right, so a TRAILING salt would make lane 2 a pure
    // function of lane 1's state (every lane-1 collision would imply a
    // lane-2 collision — still 64-bit resistance); a leading salt mixes
    // the chain state BEFORE the value, giving an independent lane.
    // Hashed ONCE PER COLUMN in a projection below the explode — a column
    // appears in ~2·(N−1) pairs, and inlining the hash into each pair
    // struct would recompute it that many times per row (hashing is the
    // dominant cost for wide string columns).
    val hashProj = cols.flatMap(c => Seq(
      xxhash64(col(c).cast("string")).as(s"__h1_$c"),
      xxhash64(lit("graft-fd-lane2"), col(c).cast("string"))
        .as(s"__h2_$c"),
      col(c).isNotNull.as(s"__nn_$c")))
    val hashed = df.select(hashProj: _*)
    def fp128(c: String): Column =
      struct(col(s"__h1_$c").as("h1"), col(s"__h2_$c").as("h2"))
    val pairStructs = array(pairs.zipWithIndex.map { case ((c1, c2), i) =>
      struct(lit(i).as("pi"),
        // null when either side is null → pairwise dropna via one filter
        // (xxhash64 maps SQL NULL to the seed, never to NULL itself).
        when(col(s"__nn_$c1") && col(s"__nn_$c2"), fp128(c1)).as("k"),
        fp128(c2).as("v"))
    }: _*)
    // Flat long columns for the aggregation, not the struct: struct
    // grouping keys fall off Spark's vectorized/primitive hash-map fast
    // path into the generic UnsafeRow one. The struct only exists to
    // carry the null-signal through the explode; unpack it right after.
    val exploded = hashed.select(explode(pairStructs).as("p"))
      .filter(col("p.k").isNotNull)
      .select(col("p.pi").as("pi"),
        col("p.k.h1").as("kh1"), col("p.k.h2").as("kh2"),
        col("p.v.h1").as("vh1"), col("p.v.h2").as("vh2"))
    // "nd > 1" needs only inequality evidence, not the distinct count:
    // a key maps to ≥2 distinct 128-bit values iff EITHER hash lane
    // varies, i.e. min ≠ max on vh1 or on vh2. countDistinct would plan
    // a second exchange (dedupe on all five columns, then re-group on
    // the key); four primitive min/max aggregates keep ONE exchange and
    // stay on the hash-map fast path. Map-side partials collapse each
    // partition's key to 4 longs before the shuffle.
    val perKey = exploded.groupBy("pi", "kh1", "kh2")
      .agg(min("vh1").as("v1lo"), max("vh1").as("v1hi"),
        min("vh2").as("v2lo"), max("vh2").as("v2hi"))
    val perPair = perKey.groupBy("pi")
      .agg(sum(when(col("v1lo") =!= col("v1hi") ||
          col("v2lo") =!= col("v2hi"), 1L).otherwise(0L)).as("bad"))

    val pairName = element_at(
      map(pairs.zipWithIndex.flatMap { case ((c1, c2), i) =>
        Seq(lit(i), lit(s"$c1->$c2"))
      }: _*), col("pi"))
    val names = split(pairName, "->")
    val c1 = element_at(names, 1)
    val c2 = element_at(names, 2)
    val result = when(col("bad") === 0, 1.0).otherwise(0.0)
    perPair.select(
      lit("consistency").as("pillar"),
      pairName.as("col_name"),
      result.as("result"),
      concat(lit("Each "), c1, lit(" maps to a consistent "), c2)
        .as("rule"),
      when(col("bad") === 0, "passed").otherwise("failed").as("status"),
      when(col("bad") === 0,
        concat(lit("Each value in "), c1, lit(" maps to one value in "),
          c2))
        .otherwise(concat(col("bad").cast("string"), lit(" values in "),
          c1, lit(" map to multiple values in "), c2)).as("reason"))
  }

  /** Column family partition of a schema, reference rules:
    * numeric = pandas numeric dtypes, string = object/str.
    */
  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.filter(f =>
      TypeMapper.familyOf(f.dataType) == TypeMapper.NumericFamily)
      .map(_.name).toSeq

  def stringCols(df: DataFrame): Seq[String] =
    df.schema.fields.filter(f =>
      TypeMapper.familyOf(f.dataType) == TypeMapper.StringFamily)
      .map(_.name).toSeq

  /** Full file-DQ report: basics (from a precomputed profile) +
    * consistency + accuracy, like the reference's `dq_checks` composition
    * (`Data_Discovery_File.sql:307-311`). If the profile carries raw
    * moments (`Profiler.profile(withRaw = true)`), the z-score pillar
    * reuses them and saves a stats scan.
    */
  def report(df: DataFrame, profile: DataFrame,
      maxFdPairs: Int = 64): DataFrame = {
    val zscore =
      if (profile.columns.contains("avg_raw"))
        zscoreChecksFromProfile(df, profile)
      else zscoreChecks(df, numericCols(df))
    // Per-column non-null totals from the (tiny, persisted) profile feed
    // the rare-value pillar so it skips its window shuffle; same bounded
    // collect the z-score pillar already does.
    val totals = profile.select("column_name", "count_all", "count_nulls")
      .collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("count_all") - r.getAs[Long]("count_nulls")))
      .toMap
    basicChecks(profile)
      .unionByName(fdConsistencyChecks(df, df.columns.toSeq, maxFdPairs))
      .unionByName(zscore)
      .unionByName(rareValueChecks(df, stringCols(df), Some(totals)))
  }

  /** A14: pass/fail partitioning of a rules report
    * (`Data_Discovery_File.sql:379-405`) — rule counts per status, plus
    * the per-status detail frames via [[partition]].
    */
  def summary(report: DataFrame): DataFrame =
    report.groupBy("status")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rules"))

  /** (passed_rules_detail, failed_rules_detail). */
  def partition(report: DataFrame): (DataFrame, DataFrame) =
    (report.filter(org.apache.spark.sql.functions.col("status") === "passed"),
      report.filter(org.apache.spark.sql.functions.col("status") === "failed"))

  /** The file-variant VARIANT document
    * (`Data_Discovery_File.sql:379-433`): file_definition metadata, the
    * pass/fail rule partition as `result_summary`, and the audit log with
    * injectable clock timestamps (epoch seconds).
    */
  def document(fileDef: graft.io.Discovery.FileDefinition,
      report: DataFrame, filePath: String,
      startEpoch: Double, endEpoch: Double,
      agentName: String = "DQ_DISCOVERY_AND_CHECKS"): String = {
    import graft.util._
    val rows = report.orderBy("pillar", "col_name").collect().toSeq
    def detail(status: String): JArr = JArr(rows
      .filter(_.getAs[String]("status") == status)
      .map(r => JObj(Seq(
        "pillar" -> JValue.of(r.getAs[String]("pillar")),
        "column" -> JValue.of(r.getAs[String]("col_name")),
        "rule" -> JValue.of(r.getAs[String]("rule")),
        "reason" -> JValue.of(r.getAs[String]("reason"))))))
    val passed = detail("passed")
    val failed = detail("failed")
    val summaryObj = JObj(Seq(
      "rules_pass" -> JValue.of(passed.items.length),
      "rules_fail" -> JValue.of(failed.items.length),
      "passed_rules_detail" -> passed,
      "failed_rules_detail" -> failed))
    val fd = JObj(Seq(
      "file_name" -> JValue.of(fileDef.fileName),
      "file_type" -> JValue.of(fileDef.fileType),
      "file_size" -> JValue.of(fileDef.fileSize),
      "columns" -> JArr(fileDef.columns.map(c => JObj(Seq(
        "column_name" -> JValue.of(c.columnName),
        "type" -> JValue.of(c.`type`)))))))
    JObj(Seq(
      "file_definition" -> fd,
      "dq_auto_check_result" -> summaryObj,
      "audit_log" -> JObj(Seq(
        "agent_name" -> JValue.of(agentName),
        "start_time" -> JValue.of(startEpoch),
        "end_time" -> JValue.of(endEpoch),
        "input" -> JValue.of(filePath),
        "result_summary" -> JObj(Seq(
          "rules_pass" -> JValue.of(passed.items.length),
          "rules_fail" -> JValue.of(failed.items.length))))))).render
  }

  private def emptyReport(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    Seq.empty[(String, String, Double, String, String, String)]
      .toDF(reportCols: _*)
  }
}
