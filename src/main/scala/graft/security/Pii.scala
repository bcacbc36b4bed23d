package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** PII detection and masking with native (codegen'd) column expressions —
  * no per-row UDFs anywhere.
  *
  * Patterns and mask shapes follow `/root/reference/Data_Security.sql:13-33`
  * exactly (the reference stores them double-escaped inside a SQL string
  * literal; the effective regexes are reproduced here). Detection priority
  * is the reference's dict order: EMAIL, PHONE, AADHAAR, CREDIT_CARD.
  *
  * Documented deviations:
  *   - the reference masks only its 1000-row sample and overwrites the
  *     `<TABLE>_MASKED` sink with just those rows
  *     (`/root/reference/Data_Security.sql:49,64-68`); here detection is
  *     sampled but masking runs over the FULL table, distributed.
  *   - the reference masks with the "first" type of an unordered Python
  *     set (nondeterministic); here the first type in pattern-priority
  *     order wins.
  */
object Pii {

  /** (type, regex) in detection-priority order
    * (`/root/reference/Data_Security.sql:13-18`).
    */
  val patterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "PHONE" ->
      "\\b(\\+?\\d{1,3}[\\s-]?)?(\\(?\\d{3,5}\\)?[\\s-]?)?\\d{3,5}[\\s-]?\\d{3,5}\\b",
    "AADHAAR" -> "\\b\\d{4}\\s\\d{4}\\s\\d{4}\\b",
    "CREDIT_CARD" -> "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b")

  /** First matching PII type for a value, else null
    * (`/root/reference/Data_Security.sql:35-41`).
    */
  def detectType(c: Column): Column =
    patterns.foldRight(lit(null).cast(StringType)) {
      case ((tpe, pat), acc) => when(c.rlike(pat), lit(tpe)).otherwise(acc)
    }

  /** Mask one value as the given PII type
    * (`/root/reference/Data_Security.sql:20-33`). Null passes through
    * (the reference skips NaN values at `:64`).
    */
  def maskValue(c: Column, piiType: String): Column = {
    val masked = piiType match {
      case "EMAIL" =>
        // limit = -1 keeps trailing empty strings, matching Python's
        // str.split (Java's default split drops them: "a@" must be 2 parts).
        val parts = split(c, "@", -1)
        when(size(parts) === 2,
          concat(substring(element_at(parts, 1), 1, 1), lit("***@"),
            element_at(parts, 2)))
          .otherwise(lit("*****"))
      case "PHONE" =>
        // every digit followed by ≥4 more digits → '*' (keeps last 4 and
        // all separators); Java regex supports the lookahead directly.
        regexp_replace(c, "\\d(?=\\d{4})", "*")
      case "AADHAAR" => concat(lit("XXXX XXXX "), substring(c, -4, 4))
      case "CREDIT_CARD" =>
        concat(lit("XXXX-XXXX-XXXX-"), substring(c, -4, 4))
      case _ => lit("*****")
    }
    when(c.isNull, c).otherwise(masked)
  }

  /** Scrub order for free text: longest/most-specific patterns first, so
    * a shorter pattern can't partially consume a value and leak the
    * remainder. CREDIT_CARD (16 digits) must precede AADHAAR (12): the
    * card pattern allows space separators, so AADHAAR-first would eat the
    * first 12 digits of a space-separated card and leave its last 4
    * unredacted. The reverse is safe — 12 digits can never match the
    * 16-digit card pattern. PHONE (the loosest digit matcher) runs last.
    * (Detection priority above is the reference's VALUE-typing order;
    * in-text replacement needs specificity order instead.)
    */
  val scrubOrder: Seq[String] =
    Seq("EMAIL", "CREDIT_CARD", "AADHAAR", "PHONE")

  /** Final scrub catch-all: any digit run (digits with space/dash
    * separators) of ~12+ characters that survived the typed patterns.
    * Every typed pattern is \b-bounded with bounded group sizes, so a
    * contiguous run LONGER than a pattern's maximum span (e.g. a 16-digit
    * card embedded in a 17+-digit run, or any ≥19-digit identifier)
    * matches nothing and would otherwise pass through UNREDACTED — the
    * residual class a catch-everything pre-training scrub must close.
    * Trades precision for recall by design (a 13-digit product id also
    * redacts): the right default for corpus scrubbing.
    */
  val LongDigitRunPattern = "\\d[\\d\\s-]{10,}\\d"

  /** In-text PII scrub for free-text corpora (the pre-training scrub):
    * every occurrence of each pattern is replaced with its bracketed type
    * token, e.g. `[EMAIL]`; [[LongDigitRunPattern]] then sweeps long
    * digit runs no typed pattern spans into `[NUMBER]` (typed tokens
    * carry no digits, so the sweep can never bridge across them). A pure
    * regexp_replace chain — codegen'd, shuffle-free, linear over the
    * corpus at any scale. The patterns avoid lookaround, so the same
    * chain runs on RE2-based engines.
    */
  def scrubText(c: Column): Column = {
    val byType = patterns.toMap
    val typed = scrubOrder.foldLeft(c) { (acc, tpe) =>
      regexp_replace(acc, byType(tpe), s"[$tpe]")
    }
    regexp_replace(typed, LongDigitRunPattern, "[NUMBER]")
  }

  /** Default surrogate salt — in production this is the ROTATED secret
    * (an HMAC key): anyone holding it can link surrogates to inputs by
    * re-hashing candidates, so pseudonymized data stays personal data
    * under GDPR until the salt is destroyed. A literal here because the
    * gate needs determinism; deployments pass their own.
    */
  val DefaultPseudoSalt = "graft-pseudo-v1"

  /** The salted md5-derived 60-bit base every surrogate draws from —
    * the [[graft.dedup.Dedup.md5Base]] idiom (top 15 hex chars of md5
    * parsed as a long: positive, < 2⁶⁰, restatable in any SQL engine).
    */
  private def pseudoBase(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c).cast("binary")), 1, 15),
      16, 10).cast("long")

  private def pseudoDigits(c: Column, salt: String, n: Int): Column = {
    val modulus = (1 to n).foldLeft(1L)((a, _) => a * 10) // exact 10^n
    lpad((pseudoBase(c, salt) % modulus).cast("string"), n, "0")
  }

  /** Deterministic FORMAT-PRESERVING pseudonymization — the masking
    * alternative that keeps JOINABILITY: the same input always maps to
    * the same surrogate (equality, grouping and cross-table joins on
    * the column survive), while [[maskValue]] collapses distinct values
    * into indistinguishable masks. Each surrogate keeps its type's
    * shape — it still matches the type's own detection regex
    * (spec-pinned), so downstream format validation passes — and
    * carries NO residue of the input beyond the salted hash:
    *
    *   - EMAIL → `u<12 hex>@redacted.example`
    *   - PHONE → 10 derived digits
    *   - AADHAAR → `dddd dddd dddd` derived digits
    *   - CREDIT_CARD → `dddd-dddd-dddd-dddd` derived digits
    *   - anything else → `tok_<12 hex>`
    *
    * All pure codegen'd md5/modulo/string ops (the 60-bit base stays
    * inside exact BIGINT arithmetic at every width up to the card's
    * 10¹⁶), so a SQL engine replays surrogates bit-for-bit. Null passes
    * through, like [[maskValue]]. Collisions are the birthday bound of
    * the digit budget (10¹⁰ for phones) — the standard pseudonymization
    * trade, acceptable because surrogates are join keys, not secrets.
    */
  def pseudonymize(c: Column, piiType: String,
      salt: String = DefaultPseudoSalt): Column = {
    val hex12 = substring(md5(concat(lit(salt), c).cast("binary")), 1, 12)
    val surrogate = piiType match {
      case "EMAIL" => concat(lit("u"), hex12, lit("@redacted.example"))
      case "PHONE" => pseudoDigits(c, salt, 10)
      case "AADHAAR" =>
        val d = pseudoDigits(c, salt, 12)
        concat(substring(d, 1, 4), lit(" "), substring(d, 5, 4),
          lit(" "), substring(d, 9, 4))
      case "CREDIT_CARD" =>
        val d = pseudoDigits(c, salt, 16)
        concat(substring(d, 1, 4), lit("-"), substring(d, 5, 4),
          lit("-"), substring(d, 9, 4), lit("-"), substring(d, 13, 4))
      case _ => concat(lit("tok_"), hex12)
    }
    when(c.isNull, c).otherwise(surrogate)
  }

  /** Sampled per-column detection: scan `sampleRows` rows once and collect
    * the set of PII types seen per string column
    * (`/root/reference/Data_Security.sql:49-58`; the reference further
    * limits to 100 values per column — one bounded pass over the sample is
    * the same cost envelope and strictly more thorough).
    *
    * Returns column → detected types (priority-ordered, comma-joined like
    * the reference's `", ".join`).
    */
  def detectColumns(df: DataFrame, sampleRows: Int = 1000)
      : Map[String, String] = {
    val stringCols =
      df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.isEmpty) return Map.empty
    val aggs = stringCols.toSeq.map(n =>
      collect_set(detectType(col(n))).as(n))
    val row = df.limit(sampleRows).agg(aggs.head, aggs.tail: _*).head()
    val order = patterns.map(_._1).zipWithIndex.toMap
    stringCols.flatMap { n =>
      val types = row.getSeq[String](row.fieldIndex(n))
        .sortBy(order.getOrElse(_, Int.MaxValue))
      if (types.isEmpty) None else Some(n -> types.mkString(", "))
    }.toMap
  }

  /** Full-table masking of the detected columns; appends the
    * `PII_MASKING_TYPE` lineage column
    * (`/root/reference/Data_Security.sql:60-66`).
    */
  def maskTable(df: DataFrame, piiInfo: Map[String, String]): DataFrame = {
    val masked = piiInfo.foldLeft(df) { case (acc, (name, types)) =>
      val primary = types.split(",")(0).trim
      acc.withColumn(name, maskValue(col(name), primary))
    }
    val lineage = piiInfo.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'$k': '$v'" }.mkString("{", ", ", "}")
    masked.withColumn("PII_MASKING_TYPE", lit(lineage))
  }

  /** End-to-end: sampled detection → full-table mask. Returns the input
    * unchanged (no lineage column) when nothing is detected.
    */
  def apply(df: DataFrame, sampleRows: Int = 1000): DataFrame = {
    val info = detectColumns(df, sampleRows)
    if (info.isEmpty) df else maskTable(df, info)
  }

  /** k-anonymity audit over quasi-identifier expressions: the
    * equivalence classes (groups sharing every quasi value) smaller than
    * `k` — each row in such a group is re-identifiable by joining the
    * quasi attributes against an external dataset, the standard release
    * check masking alone does not cover (masked direct identifiers do
    * not help when (nation, segment, balance-band) is unique). Callers
    * pass GENERALIZED quasi columns (e.g. banded numerics) — the audit
    * is one hash aggregation + filter, map-side combinable at any scale.
    */
  def kAnonymityViolations(df: DataFrame, quasi: Seq[Column],
      k: Int): DataFrame = {
    require(k > 1, s"k must exceed 1, got $k")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("group_n"))
      .filter(col("group_n") < k)
  }

  /** l-diversity audit — the attack k-anonymity misses: a group can be
    * large (k-safe) yet carry ONE sensitive value for every member, so
    * linking someone into the group discloses their attribute anyway
    * (the homogeneity attack; Machanavajjhala et al. 2007). A release
    * is l-diverse when every quasi-identifier equivalence class holds
    * at least `l` DISTINCT sensitive values; this returns the classes
    * that fail, with their size and diversity. Same scale shape as the
    * k audit: one hash aggregation (count + count-distinct per group —
    * the distinct dominated by the class size, not the corpus) +
    * filter, map-side combinable. Null is a sensitive value like any
    * other (disclosing "balance unknown" is disclosure), counted via a
    * null-sentinel the caller's domain cannot collide with.
    */
  def lDiversityViolations(df: DataFrame, quasi: Seq[Column],
      sensitive: Column, l: Int): DataFrame = {
    require(l > 1, s"l must exceed 1, got $l")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(coalesce(sensitive.cast("string"),
          lit(" null"))).as("distinct_sensitive"))
      .filter(col("distinct_sensitive") < l)
  }
}
