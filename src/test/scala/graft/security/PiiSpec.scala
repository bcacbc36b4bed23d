package graft.security

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def mask(v: String, tpe: String): String =
    Seq(v).toDF("v").select(Pii.maskValue(col("v"), tpe)).as[String].head()

  private def detect(v: String): Option[String] =
    Seq(v).toDF("v").select(Pii.detectType(col("v")))
      .as[Option[String]].head()

  // Expected strings computed by hand from the reference's Python
  // (`/root/reference/Data_Security.sql:20-33`).
  test("EMAIL mask keeps first char and domain") {
    assert(mask("alice.smith@example.com", "EMAIL") === "a***@example.com")
    assert(mask("a@b.co", "EMAIL") === "a***@b.co")
    // no '@' → python falls through to the generic mask
    assert(mask("not-an-email", "EMAIL") === "*****")
    // two '@' → 3 parts → generic mask (python len(parts)==2 fails)
    assert(mask("a@b@c", "EMAIL") === "*****")
    // trailing '@' → ["a",""] in python; Spark must match (split limit -1)
    assert(mask("a@", "EMAIL") === "a***@")
  }

  test("PHONE mask stars every digit that has 4+ digits after it") {
    assert(mask("5551234567", "PHONE") === "******4567")
    // separators break digit runs: the lookahead needs 4 CONSECUTIVE
    // digits, so a fully-separated number is untouched (python-verified)
    assert(mask("+1 555-123-4567", "PHONE") === "+1 555-123-4567")
    assert(mask("555-12345678", "PHONE") === "555-****5678")
    assert(mask("123", "PHONE") === "123")
  }

  test("AADHAAR and CREDIT_CARD masks keep the last 4") {
    assert(mask("1234 5678 9012", "AADHAAR") === "XXXX XXXX 9012")
    assert(mask("1234-5678-9012-3456", "CREDIT_CARD") ===
      "XXXX-XXXX-XXXX-3456")
  }

  test("unknown type masks fully; null passes through") {
    assert(mask("whatever", "SSN") === "*****")
    val out = Seq[Option[String]](None).toDF("v")
      .select(Pii.maskValue(col("v"), "EMAIL")).as[Option[String]].head()
    assert(out === None)
  }

  test("detection priority follows the reference's pattern order") {
    assert(detect("reach me at bob@corp.io") === Some("EMAIL"))
    assert(detect("5551234567") === Some("PHONE"))
    // aadhaar/card shapes ALSO match the loose PHONE pattern, which comes
    // first in dict order — parity with the reference, not a bug.
    assert(detect("1234 5678 9012") === Some("PHONE"))
    assert(detect("plain text") === None)
  }

  test("detectColumns finds types on a sample; maskTable masks full table") {
    val df = Seq(
      ("r1", "bob@x.io", "none"),
      ("r2", "eve@y.io", "none")).toDF("id", "contact", "clean")
    val info = Pii.detectColumns(df)
    assert(info === Map("contact" -> "EMAIL"))
    val masked = Pii.maskTable(df, info).orderBy("id")
    assert(masked.select("contact").as[String].collect() ===
      Array("b***@x.io", "e***@y.io"))
    assert(masked.select("PII_MASKING_TYPE").as[String].head() ===
      "{'contact': 'EMAIL'}")
  }

  test("scrubText replaces embedded PII with type tokens, leaves prose") {
    def scrub(s: String): String =
      Seq(s).toDF("t").select(Pii.scrubText(col("t"))).as[String].head()
    assert(scrub("mail bob@x.io and card 1234-5678-9012-3456 now") ===
      "mail [EMAIL] and card [CREDIT_CARD] now")
    // a SPACE-separated card must be one [CREDIT_CARD], not an [AADHAAR]
    // that eats 12 digits and leaks the last 4 (scrub-order pin)
    assert(scrub("card 1234 5678 9012 3456 end") ===
      "card [CREDIT_CARD] end")
    // aadhaar shape caught BEFORE the loose phone pattern can split it
    assert(scrub("id 1234 5678 9012 end") === "id [AADHAAR] end")
    assert(scrub("call 5551234567") === "call [PHONE]")
    assert(scrub("no sensitive content here") ===
      "no sensitive content here")
  }

  test("long digit runs beyond any typed pattern's span still redact") {
    def scrub(s: String): String =
      Seq(s).toDF("t").select(Pii.scrubText(col("t"))).as[String].head()
    // 17 digits: too long for the 16-digit card pattern, too long for
    // PHONE's max span -> previously leaked verbatim
    assert(!scrub("card 12345678901234567 leaked").exists(_.isDigit))
    // 22-digit identifier
    assert(!scrub("id=1234567890123456789012;").exists(_.isDigit))
    // a card inside a longer space-separated run: the typed pattern takes
    // the card; the 3-digit remnant is not PII and survives by design
    assert(scrub("acct 1234 5678 9012 3456 789") === "acct [CREDIT_CARD] 789")
    // short numbers (< the catch-all's floor, not phone-shaped) survive:
    // years, quantities, small ids must NOT be over-redacted
    assert(scrub("built in 2024, v3") === "built in 2024, v3")
  }

  test("scrubbed ticket retains zero digits and exactly 4 redactions") {
    // shape of the pii_scrub_text_customer ticket: if any pattern stops
    // matching its planted value, digits survive and this fails (the
    // oracle alone can't catch that — both engines would drift together)
    val ticket = "Reach user at user7@example.com or call 5550000049; " +
      "id 0091 0119 0133; card 0161-0203-0217-0259."
    val out = Seq(ticket).toDF("t")
      .select(Pii.scrubText(col("t")).as("s"))
      .select(col("s"),
        regexp_count(col("s"),
          lit("\\[(EMAIL|AADHAAR|CREDIT_CARD|PHONE)\\]")).as("n"))
      .as[(String, Int)].head()
    assert(!out._1.exists(_.isDigit), out._1)
    assert(out._2 === 4)
  }

  test("k-anonymity: groups below k are listed with their size, groups " +
      "at/above k are absent, k<=1 rejected") {
    val df = (Seq.fill(5)(("IN", "A")) ++ Seq.fill(2)(("IN", "B")) ++
      Seq(("US", "A"))).toDF("nation", "seg")
    val out = Pii.kAnonymityViolations(
        df, Seq(col("nation"), col("seg")), k = 5)
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("IN", "B", 2L), ("US", "A", 1L)))
    intercept[IllegalArgumentException] {
      Pii.kAnonymityViolations(df, Seq(col("nation")), k = 1)
    }
  }

  private def pseudo(v: String, tpe: String): String =
    Seq(v).toDF("v").select(Pii.pseudonymize(col("v"), tpe))
      .as[String].head()

  test("pseudonymize is format-preserving: surrogates re-match their " +
      "type's own detection regex") {
    val fixtures = Seq(
      "EMAIL" -> "alice.smith@example.com",
      "PHONE" -> "5551234567",
      "AADHAAR" -> "1234 5678 9012",
      "CREDIT_CARD" -> "1234-5678-9012-3456")
    val pats = Pii.patterns.toMap
    for ((tpe, v) <- fixtures) {
      val sur = pseudo(v, tpe)
      assert(sur !== v, s"$tpe surrogate must differ from the input")
      assert(sur.matches(".*" + pats(tpe) + ".*") ||
        sur.matches(pats(tpe)),
        s"$tpe surrogate '$sur' must still match its own pattern")
    }
  }

  test("pseudonymize keeps joinability: deterministic per value, " +
      "distinct across values, salt changes the mapping") {
    val a1 = pseudo("alice@example.com", "EMAIL")
    val a2 = pseudo("alice@example.com", "EMAIL")
    val b = pseudo("bob@example.com", "EMAIL")
    assert(a1 === a2, "same value must map to the same surrogate")
    assert(a1 !== b, "distinct values must map to distinct surrogates")
    val salted = Seq("alice@example.com").toDF("v")
      .select(Pii.pseudonymize(col("v"), "EMAIL", salt = "rotated-v2"))
      .as[String].head()
    assert(salted !== a1, "rotating the salt must re-key every surrogate")
  }

  test("pseudonymize: null passes through; unknown types tokenize") {
    val n = Seq(Option.empty[String]).toDF("v")
      .select(Pii.pseudonymize(col("v"), "EMAIL"))
      .as[Option[String]].head()
    assert(n.isEmpty)
    assert(pseudo("whatever", "SSN").startsWith("tok_"))
  }
}
