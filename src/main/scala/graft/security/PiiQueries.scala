package graft.security

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.io.Tables

/** Registered PII queries with DuckDB oracles.
  *
  * The corpus has no real PII, so both engines synthesize the same
  * deterministic PII-shaped columns from `customer` keys, then the Spark
  * side masks with the reference transforms
  * (`/root/reference/Data_Security.sql:20-33`) while the oracle recomputes
  * the expected strings with arithmetic DuckDB can express (its RE2 regex
  * engine has no lookahead, so the PHONE mask is oracle-checked on
  * digits-only values where the lookahead is equivalent to "star all but
  * the last 4").
  */
object PiiQueries extends QueryPack {

  /** Deterministic PII-shaped synthesis (same arithmetic as the oracle). */
  private def synth(df: DataFrame): DataFrame = df.select(
    col("c_custkey"),
    concat(lit("user"), col("c_custkey"), lit("@example.com")).as("email"),
    lpad((col("c_custkey") * 7 + 5550000000L).cast("string"), 10, "0")
      .as("phone"),
    concat(
      lpad(((col("c_custkey") * 13) % 10000).cast("string"), 4, "0"),
      lit(" "),
      lpad(((col("c_custkey") * 17) % 10000).cast("string"), 4, "0"),
      lit(" "),
      lpad(((col("c_custkey") * 19) % 10000).cast("string"), 4, "0"))
      .as("aadhaar"),
    concat(
      lpad(((col("c_custkey") * 23) % 10000).cast("string"), 4, "0"),
      lit("-"),
      lpad(((col("c_custkey") * 29) % 10000).cast("string"), 4, "0"),
      lit("-"),
      lpad(((col("c_custkey") * 31) % 10000).cast("string"), 4, "0"),
      lit("-"),
      lpad(((col("c_custkey") * 37) % 10000).cast("string"), 4, "0"))
      .as("card"))

  private val synthSql =
    """SELECT c_custkey,
      |'user' || c_custkey || '@example.com' AS email,
      |lpad((c_custkey * 7 + 5550000000)::VARCHAR, 10, '0') AS phone,
      |lpad(((c_custkey * 13) % 10000)::VARCHAR, 4, '0') || ' ' ||
      |  lpad(((c_custkey * 17) % 10000)::VARCHAR, 4, '0') || ' ' ||
      |  lpad(((c_custkey * 19) % 10000)::VARCHAR, 4, '0') AS aadhaar,
      |lpad(((c_custkey * 23) % 10000)::VARCHAR, 4, '0') || '-' ||
      |  lpad(((c_custkey * 29) % 10000)::VARCHAR, 4, '0') || '-' ||
      |  lpad(((c_custkey * 31) % 10000)::VARCHAR, 4, '0') || '-' ||
      |  lpad(((c_custkey * 37) % 10000)::VARCHAR, 4, '0') AS card
      |FROM customer""".stripMargin.replace("\n", " ")

  private def maskQuery = QueryDef(
    "pii_mask_customer",
    (s, dir) => synth(Tables.load(s, dir, "customer")).select(
        col("c_custkey"),
        Pii.maskValue(col("email"), "EMAIL").as("email_masked"),
        Pii.maskValue(col("phone"), "PHONE").as("phone_masked"),
        Pii.maskValue(col("aadhaar"), "AADHAAR").as("aadhaar_masked"),
        Pii.maskValue(col("card"), "CREDIT_CARD").as("card_masked"))
      .orderBy("c_custkey"),
    Some("SELECT c_custkey, " +
      "substr(email, 1, 1) || '***@' || split_part(email, '@', 2) " +
      "AS email_masked, " +
      "repeat('*', length(phone) - 4) || right(phone, 4) AS phone_masked, " +
      "'XXXX XXXX ' || right(aadhaar, 4) AS aadhaar_masked, " +
      "'XXXX-XXXX-XXXX-' || right(card, 4) AS card_masked " +
      s"FROM ($synthSql) ORDER BY c_custkey"))

  /** Detection over the synthesized columns, long format. AADHAAR/CARD
    * values intentionally classify as PHONE — the reference iterates its
    * pattern dict in insertion order and PHONE precedes them
    * (`/root/reference/Data_Security.sql:13-18,37-40`); parity, not a bug.
    */
  private def detectQuery = QueryDef(
    "pii_detect_customer",
    (s, dir) => {
      val stacked = synth(Tables.load(s, dir, "customer")).selectExpr(
        "stack(4, 'email', email, 'phone', phone, 'aadhaar', aadhaar, " +
          "'card', card) AS (column_name, value)")
      stacked.groupBy("column_name")
        .agg(min(Pii.detectType(col("value"))).as("min_type"),
          max(Pii.detectType(col("value"))).as("max_type"))
        .orderBy("column_name")
    },
    Some {
      val detect = Pii.patterns.map { case (t, p) =>
        s"WHEN regexp_matches(value, '${p.replace("'", "''")}') THEN '$t'"
      }.mkString("CASE ", " ", " ELSE NULL END")
      s"WITH sy AS ($synthSql) " +
        "SELECT column_name, MIN(pii) AS min_type, MAX(pii) AS max_type " +
        s"FROM (SELECT column_name, $detect AS pii FROM (" +
        "SELECT 'email' AS column_name, email AS value FROM sy " +
        "UNION ALL SELECT 'phone', phone FROM sy " +
        "UNION ALL SELECT 'aadhaar', aadhaar FROM sy " +
        "UNION ALL SELECT 'card', card FROM sy)) " +
        "GROUP BY column_name ORDER BY column_name"
    })

  /** In-text scrub over a synthesized free-text "ticket" built from the
    * PII columns — the pre-training corpus scrub ([[Pii.scrubText]]),
    * oracled by running the identical regexp_replace chain in DuckDB
    * (the patterns avoid lookaround, so Java regex and RE2 replace the
    * same spans). The oracle proves engine parity only — a regex that
    * missed its planted value would miss it identically in both engines —
    * so the catch-everything guarantee is pinned in `PiiSpec` against
    * literal expectations (zero residual digits, exactly 4 redactions).
    */
  private def scrubQuery = QueryDef(
    "pii_scrub_text_customer",
    (s, dir) => synth(Tables.load(s, dir, "customer"))
      .select(col("c_custkey"),
        concat(lit("Reach user at "), col("email"), lit(" or call "),
          col("phone"), lit("; id "), col("aadhaar"), lit("; card "),
          col("card"), lit(".")).as("ticket"))
      .select(col("c_custkey"), Pii.scrubText(col("ticket")).as("scrubbed"))
      .withColumn("n_redactions",
        regexp_count(col("scrubbed"),
          lit("\\[(EMAIL|AADHAAR|CREDIT_CARD|PHONE)\\]")).cast("long"))
      .orderBy("c_custkey"),
    Some {
      val typed = Pii.scrubOrder.foldLeft("ticket") { (acc, tpe) =>
        val pat = Pii.patterns.toMap.apply(tpe).replace("'", "''")
        s"regexp_replace($acc, '$pat', '[$tpe]', 'g')"
      }
      val scrubbed = s"regexp_replace($typed, " +
        s"'${Pii.LongDigitRunPattern}', '[NUMBER]', 'g')"
      s"WITH sy AS ($synthSql), " +
        "t AS (SELECT c_custkey, 'Reach user at ' || email || " +
        "' or call ' || phone || '; id ' || aadhaar || '; card ' || " +
        "card || '.' AS ticket FROM sy) " +
        s"SELECT c_custkey, $scrubbed AS scrubbed, " +
        s"len(regexp_extract_all($scrubbed, " +
        "'\\[(EMAIL|AADHAAR|CREDIT_CARD|PHONE)\\]'))::BIGINT " +
        "AS n_redactions FROM t ORDER BY c_custkey"
    })

  /** k-anonymity audit ([[Pii.kAnonymityViolations]]) over customer
    * quasi-identifiers — nation × segment × $1000 balance band, k=5:
    * lists every equivalence class small enough to re-identify. The
    * band uses floor (IEEE-exact on both engines), counts are exact
    * ints, so the oracle replays it verbatim.
    */
  private def kanonQuery = QueryDef(
    "pii_kanon_customer",
    (s, dir) => Pii.kAnonymityViolations(
        graft.io.Tables.load(s, dir, "customer"),
        Seq(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).as("acctbal_band")),
        k = 5)
      .orderBy("c_nationkey", "c_mktsegment", "acctbal_band"),
    Some("SELECT c_nationkey, c_mktsegment, " +
      "CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_band, " +
      "count(*) AS group_n FROM customer GROUP BY 1, 2, 3 " +
      "HAVING count(*) < 5 ORDER BY 1, 2, 3"))

  /** l-diversity audit ([[Pii.lDiversityViolations]]) on the released
    * quasi grain (nation, 2000-wide balance band) with the market
    * segment as the sensitive attribute: l = 5 = the segment domain
    * size, so a flagged class is one where at least one segment value
    * is absent — size and diversity both in the report. The null
    * sentinel coalesce is mirrored because COUNT(DISTINCT) skips nulls
    * in both engines.
    */
  private def ldivQuery = QueryDef(
    "pii_ldiversity_customer",
    (s, dir) => Pii.lDiversityViolations(
        Tables.load(s, dir, "customer"),
        Seq(col("c_nationkey"),
          floor(col("c_acctbal") / 2000).as("acctbal_band")),
        col("c_mktsegment"), l = 5)
      .orderBy("c_nationkey", "acctbal_band"),
    Some("SELECT c_nationkey, " +
      "CAST(floor(c_acctbal / 2000) AS BIGINT) AS acctbal_band, " +
      "count(*) AS group_n, " +
      "count(DISTINCT coalesce(CAST(c_mktsegment AS VARCHAR), ' null')) " +
      "AS distinct_sensitive FROM customer GROUP BY 1, 2 " +
      "HAVING count(DISTINCT coalesce(CAST(c_mktsegment AS VARCHAR), " +
      "' null')) < 5 ORDER BY 1, 2"))

  /** Deterministic format-preserving pseudonymization
    * ([[Pii.pseudonymize]]): the masking alternative that keeps
    * JOINABILITY — same value, same surrogate — over the synthesized
    * PII columns. Every surrogate step is md5/modulo/string arithmetic
    * DuckDB restates verbatim (the md5Base idiom); PiiSpec pins the
    * format-preservation (each surrogate re-matches its type's own
    * detection regex), determinism, distinctness and no-residue
    * properties the hash gate cannot express.
    */
  private def pseudoQuery = QueryDef(
    "pii_pseudonymize_customer",
    (s, dir) => synth(Tables.load(s, dir, "customer")).select(
        col("c_custkey"),
        Pii.pseudonymize(col("email"), "EMAIL").as("email_pseudo"),
        Pii.pseudonymize(col("phone"), "PHONE").as("phone_pseudo"),
        Pii.pseudonymize(col("aadhaar"), "AADHAAR")
          .as("aadhaar_pseudo"),
        Pii.pseudonymize(col("card"), "CREDIT_CARD").as("card_pseudo"))
      .orderBy("c_custkey"),
    Some {
      val salt = Pii.DefaultPseudoSalt
      def base(v: String) =
        s"('0x' || substr(md5('$salt' || $v), 1, 15))::BIGINT"
      def digits(v: String, n: Int) = {
        val m = (1 to n).foldLeft(1L)((a, _) => a * 10)
        s"lpad((${base(v)} % $m)::VARCHAR, $n, '0')"
      }
      s"WITH sy AS ($synthSql), p AS (SELECT c_custkey, " +
        s"'u' || substr(md5('$salt' || email), 1, 12) || " +
        "'@redacted.example' AS email_pseudo, " +
        s"${digits("phone", 10)} AS phone_pseudo, " +
        s"${digits("aadhaar", 12)} AS a12, " +
        s"${digits("card", 16)} AS c16 FROM sy) " +
        "SELECT c_custkey, email_pseudo, phone_pseudo, " +
        "substr(a12, 1, 4) || ' ' || substr(a12, 5, 4) || ' ' || " +
        "substr(a12, 9, 4) AS aadhaar_pseudo, " +
        "substr(c16, 1, 4) || '-' || substr(c16, 5, 4) || '-' || " +
        "substr(c16, 9, 4) || '-' || substr(c16, 13, 4) AS card_pseudo " +
        "FROM p ORDER BY c_custkey"
    })

  override def queries: Seq[QueryDef] =
    Seq(maskQuery, detectQuery, scrubQuery, kanonQuery, ldivQuery,
      pseudoQuery)
}
