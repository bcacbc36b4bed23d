package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Self-contained legacy `.xls` (BIFF8) reader/writer over the PUBLIC
  * [MS-CFB] compound-file and [MS-XLS] binary formats — JDK only, no
  * spreadsheet library. Completes the reference's `pd.read_excel`
  * dispatch branch (`/root/reference/Data_Discovery_File.sql:325-327`),
  * which accepts BOTH Excel flavors; [[Xlsx]] covers the OOXML half.
  *
  * Reader scope (the "minimal BIFF8 cell reader"): the first worksheet
  * substream of the `Workbook`/`Book` stream, cells from NUMBER / RK /
  * MULRK / LABELSST / LABEL / BOOLERR records, the SST with its
  * CONTINUE splits (including the mid-string re-issued flags byte),
  * both compressed-8-bit and UTF-16LE string encodings. Formulas,
  * styles-driven date rendering, rich-text runs and OBJ embeddings are
  * out of scope — exactly the subset `pd.read_excel` surfaces for the
  * discovery corpus shapes. Typing mirrors pandas for this format: BIFF
  * stores every number as an IEEE double (or a 30-bit RK packing of
  * one), so a numeric column whose values are all integral becomes
  * int64 (LongType), else float64 — unlike [[Xlsx]], which can consult
  * the raw cell text for a decimal marker.
  *
  * Scale shape: like xlsx, one workbook parses on the driver —
  * deliberately; the format is a non-splittable single stream inside a
  * sectored container, capped at 2¹⁶ rows. It is an exchange format for
  * discovery/ingestion; a directory of workbooks parallelizes per FILE.
  */
object Biff {

  // ------------------------------------------------------------ constants

  private val SectorSize = 512
  private val MiniSectorSize = 64
  private val MiniCutoff = 4096
  private val ENDOFCHAIN = 0xfffffffe
  private val FATSECT = 0xfffffffd
  private val FREESECT = 0xffffffff

  private val RecBof = 0x0809
  private val RecEof = 0x000a
  private val RecBoundSheet = 0x0085
  private val RecSst = 0x00fc
  private val RecContinue = 0x003c
  private val RecLabelSst = 0x00fd
  private val RecLabel = 0x0204
  private val RecNumber = 0x0203
  private val RecRk = 0x027e
  private val RecMulRk = 0x00bd
  private val RecBoolErr = 0x0205
  private val RecDimensions = 0x0200

  // ---------------------------------------------------------------- read

  private final case class Cell(value: Any) // Long | Double | Boolean | String

  /** Read the first worksheet of a BIFF8 workbook as a typed DataFrame,
    * header from row 1, pandas-style typing (see object doc).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val wb = workbookStream(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val rows = parseWorkbook(wb)
    val header = rows.headOption.getOrElse(Map.empty)
    val data = rows.drop(1)
    val nCols = (header.keysIterator ++ data.iterator.flatMap(_.keysIterator))
      .foldLeft(-1)(math.max) + 1
    val names = (0 until nCols).map { i =>
      header.get(i).map(c => renderString(c.value)).getOrElse(s"Unnamed: $i")
    }
    def isIntegral(d: Double): Boolean =
      d == math.rint(d) && math.abs(d) <= 9.007199254740992e15 // 2^53
    val types: Seq[DataType] = (0 until nCols).map { i =>
      val cells = data.flatMap(_.get(i)).map(_.value)
      if (cells.isEmpty) StringType
      else if (cells.forall {
        case _: Double | _: Long => true; case _ => false
      })
        if (cells.forall {
          case d: Double => isIntegral(d); case _ => true
        }) LongType
        else DoubleType
      else if (cells.forall(_.isInstanceOf[Boolean])) BooleanType
      else StringType
    }
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val out: Seq[Row] = data.map { r =>
      Row.fromSeq((0 until nCols).map { i =>
        r.get(i).map { c =>
          (types(i), c.value) match {
            case (LongType, d: Double) => d.toLong
            case (LongType, l: Long) => l
            case (DoubleType, d: Double) => d
            case (DoubleType, l: Long) => l.toDouble
            case (BooleanType, b: Boolean) => b
            case (_, v) => renderString(v)
          }
        }.orNull
      })
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.asJava, schema)
  }

  private def renderString(v: Any): String = v match {
    case b: Boolean => if (b) "True" else "False"
    case d: Double if d == math.rint(d) && !d.isInfinite => d.toLong.toString
    case other => other.toString
  }

  // ------------------------------------------------- CFB container (read)

  /** Locate and reassemble the `Workbook` (or BIFF5-named `Book`) stream
    * from the compound file: header DIFAT (+ chained DIFAT sectors) →
    * FAT → directory chain → stream chain, via the mini FAT when the
    * stream is under the 4096-byte cutoff.
    */
  private[io] def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 &&
      buf.getLong(0) == 0xe11ab1a1e011cfd0L, // D0 CF 11 E0 A1 B1 1A E1 LE
      "not an OLE2 compound file (bad signature)")
    val sectorShift = buf.getShort(30).toInt
    val ssz = 1 << sectorShift
    val numFat = buf.getInt(44)
    val firstDir = buf.getInt(48)
    val firstMiniFat = buf.getInt(60)
    val firstDifat = buf.getInt(68)
    val numDifat = buf.getInt(72)

    def sector(i: Int): Array[Byte] = {
      val off = 512 + i.toLong * ssz
      require(off + ssz <= bytes.length, s"sector $i beyond file end")
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + ssz)
    }
    // DIFAT: 109 header entries, then a chain of DIFAT sectors whose
    // last 4 bytes point to the next DIFAT sector.
    val difat = mutable.ArrayBuffer.empty[Int]
    (0 until 109).foreach(i => difat += buf.getInt(76 + 4 * i))
    var ds = firstDifat
    var guard = 0
    while (ds != ENDOFCHAIN && ds != FREESECT && guard <= numDifat + 1) {
      val s = ByteBuffer.wrap(sector(ds)).order(ByteOrder.LITTLE_ENDIAN)
      (0 until ssz / 4 - 1).foreach(i => difat += s.getInt(4 * i))
      ds = s.getInt(ssz - 4)
      guard += 1
    }
    val fat = mutable.ArrayBuffer.empty[Int]
    difat.take(numFat).filter(_ != FREESECT).foreach { fs =>
      val s = ByteBuffer.wrap(sector(fs)).order(ByteOrder.LITTLE_ENDIAN)
      (0 until ssz / 4).foreach(i => fat += s.getInt(4 * i))
    }
    def chain(start: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var cur = start
      while (cur != ENDOFCHAIN && cur != FREESECT) {
        require(cur >= 0 && cur < fat.length, s"FAT chain out of range: $cur")
        out += cur
        require(out.length <= fat.length, "cyclic FAT chain")
        cur = fat(cur)
      }
      out.toSeq
    }
    val dirBytes = chain(firstDir).flatMap(sector).toArray
    val dirBuf = ByteBuffer.wrap(dirBytes).order(ByteOrder.LITTLE_ENDIAN)
    // 128-byte directory entries: name UTF-16LE @0 (64), nameLen @64 (2,
    // includes the null terminator), type @66 (5=root storage, 2=stream),
    // start sector @116, stream size @120
    final case class Entry(name: String, typ: Int, start: Int, size: Long)
    val typed = (0 until dirBytes.length / 128).map { i =>
      val base = i * 128
      val nameLen = math.max(0, (dirBuf.getShort(base + 64) & 0xffff) - 2)
      Entry(
        new String(dirBytes, base, math.min(nameLen, 64), "UTF-16LE"),
        dirBytes(base + 66) & 0xff,
        dirBuf.getInt(base + 116), dirBuf.getLong(base + 120))
    }
    val wbEntry = typed.find(e => e.typ == 2 &&
        (e.name.equalsIgnoreCase("Workbook") || e.name.equalsIgnoreCase("Book")))
      .getOrElse(throw new IllegalArgumentException(
        "no Workbook/Book stream in compound file"))
    if (wbEntry.size >= MiniCutoff) {
      chain(wbEntry.start).flatMap(sector).toArray.take(wbEntry.size.toInt)
    } else {
      // ministream: the ROOT entry's chain holds the mini sectors' bytes;
      // the mini FAT (its own regular-sector chain) links 64-byte slots
      val root = typed.find(_.typ == 5).getOrElse(
        throw new IllegalArgumentException("compound file has no root entry"))
      val mini = chain(root.start).flatMap(sector).toArray
      val miniFat = mutable.ArrayBuffer.empty[Int]
      chain(firstMiniFat).foreach { fs =>
        val s = ByteBuffer.wrap(sector(fs)).order(ByteOrder.LITTLE_ENDIAN)
        (0 until ssz / 4).foreach(i => miniFat += s.getInt(4 * i))
      }
      val out = mutable.ArrayBuffer.empty[Byte]
      var cur = wbEntry.start
      while (cur != ENDOFCHAIN && cur != FREESECT) {
        require(cur >= 0 && (cur + 1) * MiniSectorSize <= mini.length,
          s"mini chain out of range: $cur")
        out ++= java.util.Arrays.copyOfRange(
          mini, cur * MiniSectorSize, (cur + 1) * MiniSectorSize)
        require(out.length <= mini.length, "cyclic mini FAT chain")
        cur = miniFat(cur)
      }
      out.toArray.take(wbEntry.size.toInt)
    }
  }

  // --------------------------------------------------- BIFF stream (read)

  /** Parse the workbook stream: SST from the globals substream, then the
    * FIRST worksheet substream's cell records (located by its BOUNDSHEET
    * offset), as sparse colIndex → cell maps in row order.
    */
  private def parseWorkbook(wb: Array[Byte]): Seq[Map[Int, Cell]] = {
    val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    // record iterator over [type(2) len(2) payload(len)]
    def records(from: Int): Iterator[(Int, Int, Int)] = // (type, off, len)
      new Iterator[(Int, Int, Int)] {
        private var off = from
        def hasNext: Boolean = off + 4 <= wb.length
        def next(): (Int, Int, Int) = {
          val t = buf.getShort(off) & 0xffff
          val l = buf.getShort(off + 2) & 0xffff
          val r = (t, off + 4, l)
          off += 4 + l
          r
        }
      }
    val sst = mutable.ArrayBuffer.empty[String]
    var firstSheetPos = -1
    var done = false
    val globals = records(0)
    while (globals.hasNext && !done) {
      val (t, off, len) = globals.next()
      t match {
        case RecSst => parseSst(wb, off, len, sst)
        case RecBoundSheet =>
          if (firstSheetPos < 0) firstSheetPos = buf.getInt(off)
        case RecEof => done = true
        case _ => ()
      }
    }
    require(firstSheetPos >= 0, "no BOUNDSHEET record in globals substream")
    val rows = mutable.SortedMap.empty[Int, mutable.Map[Int, Cell]]
    def cellMap(r: Int): mutable.Map[Int, Cell] =
      rows.getOrElseUpdate(r, mutable.Map.empty)
    var sheetDone = false
    val sheet = records(firstSheetPos)
    while (sheet.hasNext && !sheetDone) {
      val (t, off, len) = sheet.next()
      t match {
        case RecNumber =>
          cellMap(buf.getShort(off) & 0xffff)
            .put(buf.getShort(off + 2) & 0xffff,
              Cell(buf.getDouble(off + 6))): Unit
        case RecRk =>
          cellMap(buf.getShort(off) & 0xffff)
            .put(buf.getShort(off + 2) & 0xffff,
              Cell(decodeRk(buf.getInt(off + 6)))): Unit
        case RecMulRk =>
          val row = buf.getShort(off) & 0xffff
          val colFirst = buf.getShort(off + 2) & 0xffff
          val n = (len - 6) / 6
          (0 until n).foreach { i =>
            cellMap(row).put(colFirst + i,
              Cell(decodeRk(buf.getInt(off + 4 + 6 * i + 2)))): Unit
          }
        case RecLabelSst =>
          val idx = buf.getInt(off + 6)
          cellMap(buf.getShort(off) & 0xffff)
            .put(buf.getShort(off + 2) & 0xffff, Cell(sst(idx))): Unit
        case RecLabel =>
          val cch = buf.getShort(off + 6) & 0xffff
          val high = (wb(off + 8) & 0x01) != 0
          val s =
            if (high) new String(wb, off + 9, cch * 2, "UTF-16LE")
            else new String(wb, off + 9, cch, "ISO-8859-1")
          cellMap(buf.getShort(off) & 0xffff)
            .put(buf.getShort(off + 2) & 0xffff, Cell(s)): Unit
        case RecBoolErr =>
          if ((wb(off + 7) & 0xff) == 0) // fError=0: boolean, not error
            cellMap(buf.getShort(off) & 0xffff)
              .put(buf.getShort(off + 2) & 0xffff,
                Cell(wb(off + 6) != 0)): Unit
        case RecEof => sheetDone = true
        case _ => ()
      }
    }
    rows.values.map(_.toMap).toSeq
  }

  /** RK packing: bit0 = ×1/100, bit1 = 30-bit signed int vs truncated
    * IEEE double (high 32 bits, low 2 masked).
    */
  private[io] def decodeRk(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  /** SST: cstTotal(4) cstUnique(4), then XLUnicodeRichExtendedString
    * entries. Strings may split across CONTINUE records; a split that
    * lands INSIDE a string's character data re-issues the flags byte at
    * the start of the continuation (the grbit may differ — a compressed
    * string can continue in UTF-16 and vice versa), which is the part
    * naive readers get wrong. Rich-text runs / ext data are skipped via
    * their declared lengths.
    */
  private def parseSst(wb: Array[Byte], off: Int, len: Int,
      out: mutable.ArrayBuffer[String]): Unit = {
    val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    // Fragments: (start, end) of SST payload then each CONTINUE payload.
    val frags = mutable.ArrayBuffer[(Int, Int)]((off, off + len))
    var nOff = off + len
    var scanning = true
    while (scanning && nOff + 4 <= wb.length) {
      val t = buf.getShort(nOff) & 0xffff
      val l = buf.getShort(nOff + 2) & 0xffff
      if (t == RecContinue) { frags += ((nOff + 4, nOff + 4 + l)); nOff += 4 + l }
      else scanning = false
    }
    var frag = 0
    var pos = frags(0)._1
    def remaining: Int = frags(frag)._2 - pos
    def nextFrag(): Unit = { frag += 1; pos = frags(frag)._1 }
    def u8(): Int = {
      while (remaining == 0) nextFrag()
      val v = wb(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        if (remaining == 0) nextFrag()
        val take = math.min(left, remaining.toLong).toInt
        pos += take; left -= take
      }
    }
    val total = u32(); val unique = u32()
    require(total >= unique, s"SST counts inverted: $total < $unique")
    var i = 0L
    while (i < unique) {
      val cch = u16()
      var flags = u8()
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) u16() else 0
      val cbExt = if (ext) u32() else 0L
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      while (read < cch) {
        if (remaining == 0) {
          nextFrag()
          // a continuation inside character data re-issues the flags
          // byte (only the fHighByte bit is meaningful mid-string)
          flags = u8()
        }
        if ((flags & 0x01) != 0) { // UTF-16LE: one char = 2 bytes
          // chars never split across a fragment boundary mid-char: the
          // writer grammar forbids it, so consume both bytes via u8()
          val lo = u8(); val hi = u8()
          sb.append(((hi << 8) | lo).toChar): Unit
        } else sb.append((u8() & 0xff).toChar): Unit
        read += 1
      }
      skip(cRun.toLong * 4 + cbExt)
      out += sb.toString
      i += 1
    }
  }

  // --------------------------------------------------------------- write

  /** Write (header, rows) as a minimal BIFF8 workbook in an OLE2
    * container: globals (BOF, SST, BOUNDSHEET, EOF) + one sheet substream
    * (BOF, DIMENSIONS, cells, EOF). Strings go through the SST
    * (LABELSST cells); integral longs that fit RK's 30-bit packing go as
    * RK records (exercising the reader's RK path on round trip), other
    * numbers as NUMBER, booleans as BOOLERR. The stream is FAT-allocated
    * (padded to the 4096-byte mini cutoff) — one less moving part than
    * the ministream, and bit-valid per [MS-CFB].
    */
  def write(path: String, header: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    val sharedIdx = mutable.LinkedHashMap.empty[String, Int]
    var totalStrings = 0L
    def sidx(s: String): Int = {
      totalStrings += 1
      sharedIdx.getOrElseUpdate(s, sharedIdx.size)
    }

    final class Rec(val id: Int) {
      val body = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Rec = { body.write(v & 0xff); this }
      def u16(v: Int): Rec = { u8(v); u8(v >> 8); this }
      def u32(v: Int): Rec = { u16(v); u16(v >> 16); this }
      def f64(v: Double): Rec = {
        val bits = java.lang.Double.doubleToLongBits(v)
        (0 until 8).foreach(i => u8((bits >>> (8 * i)).toInt)); this
      }
      def bytes: Array[Byte] = {
        val b = body.toByteArray
        require(b.length <= 8224, s"record 0x${id.toHexString} overflows")
        val out = ByteBuffer.allocate(4 + b.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        out.putShort(id.toShort).putShort(b.length.toShort).put(b)
        out.array()
      }
    }
    def bof(dt: Int): Rec = {
      // version 0x0600 (BIFF8), build/year freeform, history/lowest 0
      new Rec(RecBof).u16(0x0600).u16(dt).u16(0x0dbb).u16(0x07cc)
        .u32(0).u32(0)
    }
    // cells first (they populate the SST)
    val allRows: Seq[Seq[Any]] = header +: rows
    val cellRecs = allRows.zipWithIndex.flatMap { case (r, ri) =>
      r.zipWithIndex.flatMap { case (v, ci) =>
        def base(rec: Rec): Rec = rec.u16(ri).u16(ci).u16(15) // ixfe 15
        v match {
          case null => None
          case s: String => Some(base(new Rec(RecLabelSst)).u32(sidx(s)))
          case b: Boolean =>
            Some(base(new Rec(RecBoolErr)).u8(if (b) 1 else 0).u8(0))
          case l: Long if l >= -(1L << 29) && l < (1L << 29) =>
            Some(base(new Rec(RecRk)).u32((l.toInt << 2) | 0x02))
          case i: Int => Some(base(new Rec(RecRk)).u32((i << 2) | 0x02))
          case l: Long => Some(base(new Rec(RecNumber)).f64(l.toDouble))
          case d: Double => Some(base(new Rec(RecNumber)).f64(d))
          case f: Float => Some(base(new Rec(RecNumber)).f64(f.toDouble))
          case other =>
            Some(base(new Rec(RecLabelSst)).u32(sidx(other.toString)))
        }
      }
    }
    // SST record (+ CONTINUE splits at string boundaries — legal per the
    // grammar, and our strings are far under one record's 8224 bytes)
    val sstRecs = mutable.ArrayBuffer.empty[Array[Byte]]
    locally {
      var cur = new Rec(RecSst)
      cur.u32(totalStrings.toInt).u32(sharedIdx.size)
      sharedIdx.keysIterator.foreach { s =>
        val compressed = s.forall(_ < 0x100)
        val payload = 3 + (if (compressed) s.length else s.length * 2)
        if (cur.body.size + payload > 8000) {
          sstRecs += cur.bytes
          cur = new Rec(RecContinue)
        }
        require(s.length <= 0xffff, "SST string too long")
        cur.u16(s.length).u8(if (compressed) 0 else 1)
        if (compressed) s.foreach(c => cur.u8(c.toInt))
        else s.foreach { c => cur.u8(c.toInt); cur.u8(c.toInt >> 8) }
      }
      sstRecs += cur.bytes
    }
    val sheetName = "Sheet1"
    // globals size depends on BOUNDSHEET length (fixed here: 8-bit name)
    val boundSheetLen = 4 + (4 + 2 + 1 + 1 + sheetName.length)
    val globalsLen = bof(0x0005).bytes.length +
      sstRecs.map(_.length).sum + boundSheetLen +
      new Rec(RecEof).bytes.length
    val boundSheet = new Rec(RecBoundSheet)
      .u32(globalsLen) // lbPlyPos: sheet BOF offset = end of globals
      .u16(0x0000) // visible worksheet
      .u8(sheetName.length).u8(0) // cch, compressed
    sheetName.foreach(c => boundSheet.u8(c.toInt))

    val dims = new Rec(RecDimensions)
      .u32(0).u32(allRows.length) // rwMic, rwMac (exclusive)
      .u16(0).u16(allRows.map(_.length).foldLeft(0)(math.max)).u16(0)

    val stream = new java.io.ByteArrayOutputStream()
    stream.write(bof(0x0005).bytes)
    sstRecs.foreach(stream.write)
    stream.write(boundSheet.bytes)
    stream.write(new Rec(RecEof).bytes)
    require(stream.size == globalsLen, "globals length accounting is off")
    stream.write(bof(0x0010).bytes)
    stream.write(dims.bytes)
    cellRecs.foreach(r => stream.write(r.bytes))
    stream.write(new Rec(RecEof).bytes)
    // pad past the mini-stream cutoff: trailing zero bytes parse as
    // harmless zero-length records and keep the stream FAT-allocated
    while (stream.size < MiniCutoff) stream.write(0)

    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      compoundFile(stream.toByteArray)): Unit
  }

  /** Wrap a (≥4096-byte) `Workbook` stream in a minimal v3 compound
    * file: [FAT sectors][1 directory sector][stream sectors], no
    * ministream, header DIFAT only (109 entries cover streams to ~6.9 MB
    * — far past the BIFF sheet cap; larger would need a DIFAT chain).
    */
  private[io] def compoundFile(stream: Array[Byte]): Array[Byte] = {
    val nWb = (stream.length + SectorSize - 1) / SectorSize
    val entriesPerFat = SectorSize / 4
    // nFat FAT sectors must cover nFat + 1 (dir) + nWb entries
    var nFat = 1
    while (nFat * entriesPerFat < nFat + 1 + nWb) nFat += 1
    require(nFat <= 109, "stream too large for header-DIFAT-only writer")
    val dirSector = nFat
    val wbStart = nFat + 1
    val totalSectors = nFat + 1 + nWb

    val out = ByteBuffer.allocate(512 + totalSectors * SectorSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.putLong(0xe11ab1a1e011cfd0L) // signature
    out.position(24)
    out.putShort(0x003e.toShort) // minor version
    out.putShort(0x0003.toShort) // major version 3
    out.putShort(0xfffe.toShort) // little-endian byte order mark
    out.putShort(9.toShort) // sector shift: 512
    out.putShort(6.toShort) // mini sector shift: 64
    out.position(44)
    out.putInt(nFat) // number of FAT sectors
    out.putInt(dirSector) // first directory sector
    out.putInt(0) // transaction signature
    out.putInt(MiniCutoff) // mini stream cutoff
    out.putInt(ENDOFCHAIN) // first mini FAT sector (none)
    out.putInt(0) // number of mini FAT sectors
    out.putInt(ENDOFCHAIN) // first DIFAT sector (header only)
    out.putInt(0) // number of DIFAT sectors
    (0 until 109).foreach(i => out.putInt(if (i < nFat) i else FREESECT))
    // FAT sectors
    val fat = Array.fill(nFat * entriesPerFat)(FREESECT)
    (0 until nFat).foreach(i => fat(i) = FATSECT)
    fat(dirSector) = ENDOFCHAIN
    (0 until nWb).foreach { i =>
      fat(wbStart + i) = if (i == nWb - 1) ENDOFCHAIN else wbStart + i + 1
    }
    fat.foreach(out.putInt)
    // directory sector: Root Entry (storage) + Workbook (stream) + 2 free
    def dirEntry(name: String, typ: Int, child: Int, start: Int,
        size: Long): Unit = {
      val base = out.position()
      name.foreach(c => out.putShort(c.toShort))
      out.position(base + 64)
      out.putShort(((name.length + 1) * 2).toShort)
      out.put(typ.toByte)
      out.put(1.toByte) // black
      out.putInt(-1); out.putInt(-1); out.putInt(child) // siblings, child
      out.position(base + 116)
      out.putInt(start)
      out.putLong(size)
      out.position(base + 128): Unit
    }
    dirEntry("Root Entry", 5, child = 1, start = ENDOFCHAIN, size = 0L)
    dirEntry("Workbook", 2, child = -1, start = wbStart,
      size = stream.length.toLong)
    // two unused entries: type 0, all zero except sibling/child markers
    (0 until 2).foreach { _ =>
      val base = out.position()
      out.position(base + 68)
      out.putInt(-1); out.putInt(-1); out.putInt(-1)
      out.position(base + 128)
    }
    // stream sectors
    out.put(stream)
    out.position(out.capacity())
    out.array()
  }
}
