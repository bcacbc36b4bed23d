package graft.io

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Self-contained .xlsx reader/writer over the public ECMA-376 (OOXML)
  * package format — a ZIP of XML parts — using only `java.util.zip` and
  * the JDK's StAX parser. Covers the reference's `pd.read_excel` branch
  * (`/root/reference/Data_Discovery_File.sql:325-327`) without an
  * external spreadsheet library.
  *
  * Reader semantics mirror `pd.read_excel` defaults: first worksheet,
  * row 1 is the header, columns are typed from the CELL types (a
  * shared-string cell holding "123" stays a string, exactly as pandas
  * keeps it `object`): an all-numeric column is integer when no raw
  * value carries a decimal/exponent marker, else float; an all-boolean
  * column is boolean; anything mixed or stringy is a string column.
  * Missing cells are null (pandas NaN). Style-driven date rendering is
  * out of scope (the corpus stages temporal columns through typed
  * formats; xlsx stores dates as styled numbers, which surface here as
  * the underlying serial numbers).
  *
  * Scale shape: one workbook parses on the driver —
  * deliberately. The format itself is hard-capped at 2²⁰ rows × 2¹⁴
  * columns per sheet and is not splittable (ZIP + single XML stream),
  * so there is no distributed scan to be had inside ONE file; xlsx is
  * an exchange format for discovery/ingestion, not a lake format. A
  * directory of many workbooks parallelizes per FILE (map over paths,
  * union), which is the only axis the format offers.
  */
object Xlsx {

  // ---------------------------------------------------------------- read

  private final case class RawCell(t: String, text: String)

  /** Read the first worksheet of an .xlsx workbook as a typed DataFrame,
    * header from row 1, pandas-style column typing (see object doc).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (header, rows) = readRaw(path)
    val nCols = (header.keysIterator ++ rows.iterator.flatMap(_.keysIterator))
      .foldLeft(-1)(math.max) + 1
    val names = (0 until nCols).map { i =>
      header.get(i).map(render).getOrElse(s"Unnamed: $i")
    }
    val types: Seq[DataType] = (0 until nCols).map { i =>
      val cells = rows.flatMap(_.get(i))
      if (cells.isEmpty) StringType
      else if (cells.forall(c => c.t == "n"))
        if (cells.exists(c => c.text.exists(ch =>
            ch == '.' || ch == 'e' || ch == 'E'))) DoubleType
        else LongType
      else if (cells.forall(_.t == "b")) BooleanType
      else StringType
    }
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val data: Seq[Row] = rows.map { r =>
      Row.fromSeq((0 until nCols).map { i =>
        r.get(i).map { c =>
          types(i) match {
            case LongType    => c.text.toLong
            case DoubleType  => c.text.toDouble
            case BooleanType => c.text == "1" || c.text == "true"
            case _           => render(c)
          }
        }.orNull
      })
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(data.asJava, schema)
  }

  /** A cell as a string, the way pandas renders a mixed column. */
  private def render(c: RawCell): String = c.t match {
    case "b" => if (c.text == "1" || c.text == "true") "True" else "False"
    case _   => c.text
  }

  /** Parse the workbook into (header row, data rows), each a sparse
    * colIndex → cell map; shared-string and inline-string cells are
    * resolved to their text here.
    */
  private def readRaw(path: String)
      : (Map[Int, RawCell], Seq[Map[Int, RawCell]]) = {
    val zip = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zip.entries().asScala.map(_.getName).toSeq
      val shared: IndexedSeq[String] =
        if (entries.contains("xl/sharedStrings.xml"))
          parseSharedStrings(zip, "xl/sharedStrings.xml")
        else IndexedSeq.empty
      // First worksheet = lowest-numbered sheet part (pd.read_excel's
      // default sheet 0; single-sheet workbooks — the discovery case —
      // are unambiguous).
      val sheet = entries.filter(n =>
          n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
        .sortBy { n =>
          val d = n.filter(_.isDigit)
          if (d.isEmpty) 0 else d.toInt
        }
        .headOption
        .getOrElse(throw new IllegalArgumentException(
          s"no worksheet part in $path"))
      val rows = parseSheet(zip, sheet, shared)
      (rows.headOption.getOrElse(Map.empty), rows.drop(1))
    } finally zip.close()
  }

  private def staxReader(zip: ZipFile, entry: String)
      : javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
    // hygiene: never resolve external entities from untrusted workbooks
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(zip.getInputStream(zip.getEntry(entry)))
  }

  /** `<si>` items; rich-text runs concatenate their `<t>` pieces.
    * Phonetic runs (`<rPh>`, furigana hints) carry their OWN `<t>`
    * elements that are NOT part of the cell value — pandas/openpyxl
    * exclude them, so concatenating would corrupt strings from
    * workbooks with phonetic guides.
    */
  private def parseSharedStrings(zip: ZipFile, entry: String)
      : IndexedSeq[String] = {
    val r = staxReader(zip, entry)
    val out = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    var phoneticDepth = 0
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "rPh" if inSi => phoneticDepth += 1
              case "t" if inSi && phoneticDepth == 0 => inT = true
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
            cur.append(r.getText): Unit
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = false; out += cur.result()
              case "rPh" if inSi => phoneticDepth -= 1
              case "t"  => inT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** Sheet rows in document order. Cells carry `r="A1"`-style refs
    * (sparse rows keep their true column); a cell without a ref lands
    * one past the previous cell, per the spec's sequential default.
    */
  private def parseSheet(zip: ZipFile, entry: String,
      shared: IndexedSeq[String]): Seq[Map[Int, RawCell]] = {
    val r = staxReader(zip, entry)
    val rows = Seq.newBuilder[Map[Int, RawCell]]
    var row: mutable.Map[Int, RawCell] = null
    var nextCol = 0
    var col = 0
    var cellT = "n"
    var inV = false
    var inIs = false
    var inIsT = false
    val text = new StringBuilder
    var sawText = false
    def finishCell(): Unit = if (sawText || cellT == "inlineStr") {
      val raw = text.result()
      row(col) = cellT match {
        case "s" => RawCell("s", shared(raw.trim.toInt))
        case "inlineStr" => RawCell("s", raw)
        case t => RawCell(t, raw)
      }
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = mutable.Map.empty; nextCol = 0
              case "c" if row != null =>
                col = Option(r.getAttributeValue(null, "r"))
                  .map(colIndex).getOrElse(nextCol)
                nextCol = col + 1
                cellT = Option(r.getAttributeValue(null, "t"))
                  .getOrElse("n")
                text.clear(); sawText = false
              case "v" => inV = true
              case "is" => inIs = true
              case "t" if inIs => inIsT = true
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS
              if inV || inIsT =>
            text.append(r.getText): Unit
            sawText = true
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "row" => rows += row.toMap; row = null
              case "c" if row != null => finishCell()
              case "v" => inV = false
              case "is" => inIs = false
              case "t" => inIsT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.result()
  }

  /** "BC7" → 0-based column 54 (letters only; the row digits are noise
    * here — row order comes from the document).
    */
  private[io] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** 0-based column → letters ("A", …, "Z", "AA", …). */
  private[io] def colLetters(idx: Int): String = {
    var n = idx + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar): Unit
      n = (n - 1) / 26
    }
    sb.result()
  }

  // --------------------------------------------------------------- write

  /** Write a minimal, byte-deterministic single-sheet workbook: fixed
    * ZIP entry timestamps, shared strings in first-appearance order.
    * Longs/ints become numeric cells, doubles keep `Double.toString`'s
    * exact round-trip text, strings go through sharedStrings (so reads
    * exercise the shared-string path real producers use), booleans are
    * `t="b"`, nulls are omitted cells. Fixture/staging writer — rows sit
    * in memory, same bound as the reader (see object doc).
    */
  def write(path: String, header: Seq[String],
      rows: Seq[Seq[Any]]): Unit = {
    val sharedIdx = mutable.LinkedHashMap.empty[String, Int]
    def sidx(s: String): Int =
      sharedIdx.getOrElseUpdate(s, sharedIdx.size)

    val sheet = new StringBuilder
    sheet.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
      .append("<worksheet xmlns=\"http://schemas.openxmlformats.org/")
      .append("spreadsheetml/2006/main\"><sheetData>")
    def appendRow(rowIdx: Int, cells: Seq[Any]): Unit = {
      sheet.append(s"""<row r="${rowIdx + 1}">""")
      cells.zipWithIndex.foreach { case (v, ci) =>
        val ref = s"${colLetters(ci)}${rowIdx + 1}"
        v match {
          case null =>
          case s: String =>
            sheet.append(s"""<c r="$ref" t="s"><v>${sidx(s)}</v></c>""")
          case b: Boolean =>
            sheet.append(
              s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
          case n @ (_: Long | _: Int | _: Short | _: Byte) =>
            sheet.append(s"""<c r="$ref"><v>$n</v></c>""")
          case d: Double =>
            sheet.append(s"""<c r="$ref"><v>${d.toString}</v></c>""")
          case f: Float =>
            sheet.append(s"""<c r="$ref"><v>${f.toDouble.toString}</v></c>""")
          case other => throw new IllegalArgumentException(
            s"unsupported xlsx cell type: ${other.getClass.getName}")
        }
      }
      sheet.append("</row>"): Unit
    }
    appendRow(0, header)
    rows.zipWithIndex.foreach { case (cells, i) => appendRow(i + 1, cells) }
    sheet.append("</sheetData></worksheet>")

    val sst = new StringBuilder
    sst.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
      .append("<sst xmlns=\"http://schemas.openxmlformats.org/")
      .append(s"spreadsheetml/2006/main\" count=\"${sharedIdx.size}\"")
      .append(s" uniqueCount=\"${sharedIdx.size}\">")
    sharedIdx.keysIterator.foreach { s =>
      sst.append(s"<si><t>${escapeXml(s)}</t></si>"): Unit
    }
    sst.append("</sst>")

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
        """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
        """</Relationships>"""

    val out = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        val e = new ZipEntry(name)
        e.setTime(0L) // byte-deterministic archives
        out.putNextEntry(e)
        out.write(content.getBytes("UTF-8"))
        out.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/sharedStrings.xml", sst.result())
      put("xl/worksheets/sheet1.xml", sheet.result())
    } finally out.close()
  }

  private def escapeXml(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c => c.toString
  }

  /** Bytes of a raw part list as an xlsx/zip — test seam for crafting
    * workbooks this writer would not emit (inline strings, ref-less
    * cells, foreign producers).
    */
  private[io] def writeRaw(path: String,
      parts: Seq[(String, String)]): Unit = {
    val out = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(0L)
      out.putNextEntry(e)
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
