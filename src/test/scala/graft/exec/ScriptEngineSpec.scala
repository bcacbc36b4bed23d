package graft.exec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Pure splitter/stripper properties — no Spark session needed. The
  * scalatest↔scalacheck bridge isn't in the offline cache, so generators
  * are driven manually with deterministic seeds.
  */
class SplitterSpec extends AnyFunSuite {

  private def forAllSeeded[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("splits on semicolons outside quotes") {
    assert(ScriptEngine.splitStatements("SELECT 1; SELECT 2;") ===
      Seq("SELECT 1", "SELECT 2"))
  }

  test("semicolons inside single quotes do not split") {
    assert(ScriptEngine.splitStatements("SELECT 'a;b'; SELECT 2") ===
      Seq("SELECT 'a;b'", "SELECT 2"))
  }

  test("semicolons inside double quotes do not split (reference bug fixed)") {
    assert(ScriptEngine.splitStatements("SELECT \"a;b\"; SELECT 2") ===
      Seq("SELECT \"a;b\"", "SELECT 2"))
  }

  test("backslash-escaped quote does not close the string") {
    assert(ScriptEngine.splitStatements("SELECT 'a\\';b'; SELECT 2") ===
      Seq("SELECT 'a\\';b'", "SELECT 2"))
  }

  test("comment stripping drops -- lines and blanks") {
    val in = "-- header\nSELECT 1;\n\n  -- mid\nSELECT 2;"
    assert(ScriptEngine.stripComments(in) === "SELECT 1;\nSELECT 2;")
  }

  test("table detection finds from/join/into/update/table refs") {
    val t = ScriptEngine.detectTables(
      "INSERT INTO db.t1 SELECT * FROM t2 JOIN t3 ON x UPDATE t4")
    assert(t === Seq("db.t1", "t2", "t3", "t4"))
  }

  // property: for statements without semicolons/quotes/backslashes,
  // splitting the ';'-join recovers the trimmed non-empty statements
  private val plainStmt: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.const('\n')))
      .map(_.mkString)

  test("property: split is inverse of join for plain statements") {
    forAllSeeded(Gen.listOf(plainStmt)) { stmts =>
      val joined = stmts.mkString(";")
      val expected = stmts.map(_.trim).filter(_.nonEmpty)
      val got = ScriptEngine.splitStatements(joined)
      assert(got === expected)
    }
  }

  test("property: quoted semicolons never increase statement count") {
    val quoted = for {
      body <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(';')))
        .map(_.mkString)
      q <- Gen.oneOf("'", "\"")
    } yield s"SELECT $q$body$q"
    forAllSeeded(Gen.listOf(quoted)) { stmts =>
      val got = ScriptEngine.splitStatements(stmts.mkString(";"))
      assert(got.length === stmts.count(_.trim.nonEmpty))
    }
  }
}

class ScriptEngineSpec extends SparkSpec {

  test("runs statements in order with failure isolation") {
    val report = ScriptEngine.run(spark,
      """CREATE OR REPLACE TEMPORARY VIEW se_v AS SELECT 1 AS x;
        |SELECT broken FROM nowhere_at_all;
        |SELECT x FROM se_v;""".stripMargin)
    assert(report.status === "COMPLETED")
    assert(report.totalStatements === 3)
    assert(report.successCount === 2)
    assert(report.failedCount === 1)
    assert(report.details.map(_.status) ===
      Seq("SUCCESS", "FAILED", "SUCCESS"))
    assert(report.details(1).error.nonEmpty)
  }

  test("empty input fails fast") {
    assert(ScriptEngine.run(spark, "  ").status === "FAILED")
    assert(ScriptEngine.run(spark, null).status === "FAILED")
  }

  test("previews detected tables, capped at 5 rows") {
    ScriptEngine.run(spark,
      "CREATE OR REPLACE TEMPORARY VIEW se_w AS SELECT id FROM range(100)")
    val report = ScriptEngine.run(spark, "SELECT count(*) FROM se_w")
    assert(report.tablePreviews.contains("se_w"))
    report.tablePreviews("se_w") match {
      case Right(rows) => assert(rows.length === 5)
      case Left(err) => fail(s"preview failed: $err")
    }
  }

  test("unpreviewable table names degrade to an error entry") {
    val report = ScriptEngine.run(spark,
      "CREATE OR REPLACE TEMPORARY VIEW se_x AS SELECT 1 AS a FROM missing_tbl")
    // statement fails, so no preview attempted; now reference a weird name
    val r2 = ScriptEngine.run(spark, "SELECT 1 AS a -- from nothing")
    assert(r2.successCount === 1)
    assert(report.failedCount === 1)
  }
}
