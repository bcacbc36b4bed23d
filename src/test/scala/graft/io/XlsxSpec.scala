package graft.io

import graft.SparkSpec

/** The self-contained OOXML reader/writer: pandas `read_excel` typing
  * semantics, shared vs inline strings, sparse/ref-less cells, and
  * byte-determinism of the staged fixture.
  */
class XlsxSpec extends SparkSpec {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/$name"

  test("round-trip: long/string/double columns with nulls, " +
      "pandas-style types") {
    val p = tmp("graft_xlsx_rt.xlsx")
    Xlsx.write(p, Seq("id", "name", "score"), Seq(
      Seq[Any](1L, "alice", 1.5),
      Seq[Any](2L, null, 2.0),
      Seq[Any](3L, "carol", null)))
    val df = Xlsx.read(spark, p)
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("id", "long"), ("name", "string"), ("score", "double")))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.get(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.get(1)).toSeq === Seq("alice", null, "carol"))
    assert(rows.map(_.get(2)).toSeq === Seq(1.5, 2.0, null))
  }

  test("a shared-string cell holding digits stays a string column " +
      "(cell TYPE drives typing, as in pandas)") {
    val p = tmp("graft_xlsx_strnum.xlsx")
    Xlsx.write(p, Seq("code"), Seq(Seq[Any]("123"), Seq[Any]("456")))
    val df = Xlsx.read(spark, p)
    assert(df.schema.head.dataType.typeName === "string")
    assert(df.collect().map(_.getString(0)).sorted === Array("123", "456"))
  }

  test("all-integral numeric column is long, decimal marker makes it " +
      "double, booleans type as boolean, mixed renders as string") {
    val p = tmp("graft_xlsx_types.xlsx")
    Xlsx.write(p, Seq("i", "d", "b", "m"), Seq(
      Seq[Any](7L, 7.0, true, 1L),
      Seq[Any](8L, 8.25, false, "x")))
    val df = Xlsx.read(spark, p)
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("i", "long"), ("d", "double"), ("b", "boolean"),
        ("m", "string")))
    val byI = df.collect().sortBy(_.getLong(0))
    assert(byI.map(_.getDouble(1)).toSeq === Seq(7.0, 8.25))
    assert(byI.map(_.getBoolean(2)).toSeq === Seq(true, false))
    assert(byI.map(_.getString(3)).toSeq === Seq("1", "x"))
  }

  test("foreign-producer shapes parse: inline strings, ref-less " +
      "sequential cells, sparse refs, rich-text shared strings") {
    val p = tmp("graft_xlsx_foreign.xlsx")
    val ns = "xmlns=\"http://schemas.openxmlformats.org/" +
      "spreadsheetml/2006/main\""
    Xlsx.writeRaw(p, Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0"?><Types xmlns="http://schemas.""" +
          """openxmlformats.org/package/2006/content-types"/>"""),
      "xl/sharedStrings.xml" ->
        (s"""<?xml version="1.0"?><sst $ns>""" +
          // rich-text run: pieces concatenate
          "<si><r><t>he</t></r><r><t>llo</t></r></si></sst>"),
      "xl/worksheets/sheet1.xml" ->
        (s"""<?xml version="1.0"?><worksheet $ns><sheetData>""" +
          // header: ref-less cells land sequentially
          """<row><c t="inlineStr"><is><t>k</t></is></c>""" +
          """<c t="inlineStr"><is><t>v</t></is></c>""" +
          """<c t="inlineStr"><is><t>w</t></is></c></row>""" +
          // data row: sparse — B2 skipped entirely, C2 via explicit ref
          """<row r="2"><c r="A2" t="s"><v>0</v></c>""" +
          """<c r="C2"><v>42</v></c></row>""" +
          "</sheetData></worksheet>")))
    val df = Xlsx.read(spark, p)
    assert(df.columns.toSeq === Seq("k", "v", "w"))
    val row = df.collect().head
    assert(row.getString(0) === "hello")
    assert(row.get(1) === null)
    assert(row.getLong(2) === 42L)
  }

  test("phonetic runs (rPh) are excluded from shared-string values") {
    // Excel stores furigana hints as <rPh> runs with their own <t>
    // elements INSIDE <si>; pandas/openpyxl exclude them from the value
    val p = tmp("graft_xlsx_rph.xlsx")
    val ns = "xmlns=\"http://schemas.openxmlformats.org/" +
      "spreadsheetml/2006/main\""
    Xlsx.writeRaw(p, Seq(
      "xl/sharedStrings.xml" ->
        (s"""<?xml version="1.0"?><sst $ns>""" +
          """<si><t>value</t><rPh sqref="A2"><t>furigana</t></rPh>""" +
          "</si></sst>"),
      "xl/worksheets/sheet1.xml" ->
        (s"""<?xml version="1.0"?><worksheet $ns><sheetData>""" +
          """<row><c t="inlineStr"><is><t>h</t></is></c></row>""" +
          """<row r="2"><c r="A2" t="s"><v>0</v></c></row>""" +
          "</sheetData></worksheet>")))
    assert(Xlsx.read(spark, p).collect().head.getString(0) === "value")
  }

  test("missing header cell is named like pandas (Unnamed: N)") {
    val p = tmp("graft_xlsx_unnamed.xlsx")
    val ns = "xmlns=\"http://schemas.openxmlformats.org/" +
      "spreadsheetml/2006/main\""
    Xlsx.writeRaw(p, Seq(
      "xl/worksheets/sheet1.xml" ->
        (s"""<?xml version="1.0"?><worksheet $ns><sheetData>""" +
          """<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c>""" +
          """</row>""" +
          """<row r="2"><c r="A2"><v>1</v></c>""" +
          """<c r="B2"><v>2</v></c></row>""" +
          "</sheetData></worksheet>")))
    val df = Xlsx.read(spark, p)
    assert(df.columns.toSeq === Seq("a", "Unnamed: 1"))
  }

  test("writer output is byte-deterministic (fixed zip timestamps, " +
      "stable shared-string order)") {
    val p1 = tmp("graft_xlsx_det1.xlsx")
    val p2 = tmp("graft_xlsx_det2.xlsx")
    val rows = Seq(Seq[Any](1L, "x&<y>", 0.125), Seq[Any](2L, "x&<y>", 3.5))
    Xlsx.write(p1, Seq("a", "b", "c"), rows)
    Thread.sleep(20)
    Xlsx.write(p2, Seq("a", "b", "c"), rows)
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p1))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("xml special characters survive the shared-string round trip") {
    val p = tmp("graft_xlsx_esc.xlsx")
    Xlsx.write(p, Seq("s"), Seq(Seq[Any]("a&b <c> \"d\"")))
    assert(Xlsx.read(spark, p).collect().head.getString(0) ===
      "a&b <c> \"d\"")
  }

  test("column letter conversion round-trips through the AA boundary") {
    assert(Xlsx.colIndex("A1") === 0)
    assert(Xlsx.colIndex("Z9") === 25)
    assert(Xlsx.colIndex("AA12") === 26)
    assert(Xlsx.colIndex("BC7") === 54)
    (0 until 800).foreach { i =>
      assert(Xlsx.colIndex(Xlsx.colLetters(i) + "1") === i)
    }
  }

  test("discovery dispatch reads .xlsx as 'excel' with a typed schema") {
    val p = tmp("graft_xlsx_disc.xlsx")
    Xlsx.write(p, Seq("id", "s", "v"),
      Seq(Seq[Any](1L, "a", 1.5), Seq[Any](2L, "b", 2.5)))
    val fd = Discovery.fileDefinition(spark, p)
    assert(fd.fileType === "excel")
    assert(fd.columns.map(c => (c.columnName, c.`type`)) ===
      Seq(("id", "NUMBER"), ("s", "VARCHAR"), ("v", "FLOAT")))
  }
}
