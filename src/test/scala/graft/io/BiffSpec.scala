package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** BIFF8 .xls reader/writer: container round trip, cell record types,
  * pandas-style typing, SST CONTINUE splits, RK packing, and the
  * miniFAT read path (hand-built container — our writer always
  * FAT-allocates, but real-world small .xls files ministream).
  */
class BiffSpec extends SparkSpec {

  private def tmp(name: String): String =
    s"${java.nio.file.Files.createTempDirectory("graft_biff")}/$name"

  test("round trip: long/double/bool/string columns + missing cells") {
    val p = tmp("rt.xls")
    Biff.write(p, Seq("id", "ratio", "flag", "name"), Seq(
      Seq[Any](1L, 1.5, true, "alpha"),
      Seq[Any](2L, -2.25, false, "beta"),
      Seq[Any](3L, null, true, null)))
    val df = Biff.read(spark, p)
    assert(df.schema.map(f => f.name -> f.dataType.typeName) === Seq(
      "id" -> "long", "ratio" -> "double", "flag" -> "boolean",
      "name" -> "string"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).toSeq === Seq(1L, 1.5, true, "alpha"))
    assert(rows(1).toSeq === Seq(2L, -2.25, false, "beta"))
    assert(rows(2).toSeq === Seq(3L, null, true, null))
  }

  test("integral doubles type as long (pandas int64 rule); one decimal " +
      "value demotes the column to double") {
    val p = tmp("typing.xls")
    Biff.write(p, Seq("a", "b"), Seq(
      Seq[Any](10.0, 10.0), Seq[Any](20.0, 20.5)))
    val df = Biff.read(spark, p)
    assert(df.schema("a").dataType.typeName === "long")
    assert(df.schema("b").dataType.typeName === "double")
  }

  test("RK packing: fInt covers ±2^29, larger longs fall back to NUMBER; " +
      "decode handles all four RK forms") {
    // decode: fInt
    assert(Biff.decodeRk((42 << 2) | 0x02) === 42.0)
    assert(Biff.decodeRk((-7 << 2) | 0x02) === -7.0)
    // decode: fInt + x100
    assert(Biff.decodeRk((1234 << 2) | 0x03) === 12.34)
    // decode: truncated IEEE double (1.0 has a clean low-30-bit-zero image)
    val bits = java.lang.Double.doubleToLongBits(1.0)
    assert(Biff.decodeRk(((bits >>> 32) & 0xfffffffcL).toInt) === 1.0)
    assert(Biff.decodeRk((((bits >>> 32) & 0xfffffffcL) | 1L).toInt) === 0.01)
    // write side: boundary longs survive the dispatch
    val p = tmp("rk.xls")
    val big = 1L << 40
    Biff.write(p, Seq("v"), Seq(Seq[Any](-(1L << 29)), Seq[Any]((1L << 29) - 1),
      Seq[Any](big)))
    val vals = Biff.read(spark, p).collect().map(_.getLong(0)).sorted
    assert(vals === Array(-(1L << 29), (1L << 29) - 1, big))
  }

  test("SST splits across CONTINUE records and survives, including " +
      "UTF-16 strings") {
    val p = tmp("sst.xls")
    // ~2500 distinct strings ≈ 40 KB of SST payload → several CONTINUEs;
    // every 7th string is non-Latin-1 (UTF-16LE lane)
    val strings = (0 until 2500).map { i =>
      if (i % 7 == 0) s"π∑_$i" else s"string_value_$i"
    }
    Biff.write(p, Seq("s"), strings.map(s => Seq[Any](s)))
    val back = Biff.read(spark, p).collect().map(_.getString(0)).toSet
    assert(back === strings.toSet)
  }

  test("reader handles a MULRK record (packed consecutive RK cells)") {
    // hand-assemble a sheet with one MULRK row: header via normal writer
    // is overkill — craft the workbook stream directly
    val recs = new java.io.ByteArrayOutputStream()
    def rec(id: Int, body: Array[Byte]): Unit = {
      val b = ByteBuffer.allocate(4 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(id.toShort).putShort(body.length.toShort).put(body)
      recs.write(b.array())
    }
    def bof(dt: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x0600.toShort).putShort(dt.toShort)
        .putShort(0.toShort).putShort(0.toShort).putInt(0).putInt(0)
      b.array()
    }
    // globals: BOF, SST("h"), BOUNDSHEET -> offset computed below, EOF
    val sst = ByteBuffer.allocate(8 + 3 + 1).order(ByteOrder.LITTLE_ENDIAN)
    sst.putInt(1).putInt(1).putShort(1.toShort).put(0.toByte)
      .put('h'.toByte)
    val boundBody = ByteBuffer.allocate(4 + 2 + 2 + 6)
      .order(ByteOrder.LITTLE_ENDIAN)
    val globalsLen = (4 + 16) + (4 + 12) + (4 + 14) + 4 // BOF SST BOUND EOF
    boundBody.putInt(globalsLen).putShort(0.toShort)
      .put(6.toByte).put(0.toByte).put("Sheet1".getBytes("ISO-8859-1"))
    rec(0x0809, bof(0x0005))
    rec(0x00fc, sst.array())
    rec(0x0085, boundBody.array())
    rec(0x000a, Array.empty)
    assert(recs.size() === globalsLen)
    // sheet: BOF, row0 LABELSST header, row1 MULRK cols 0-2, EOF
    rec(0x0809, bof(0x0010))
    val lbl = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    lbl.putShort(0.toShort).putShort(0.toShort).putShort(15.toShort)
      .putInt(0)
    rec(0x00fd, lbl.array())
    val mulrk = ByteBuffer.allocate(4 + 3 * 6 + 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    mulrk.putShort(1.toShort).putShort(0.toShort)
    Seq(100, 200, 300).foreach { v =>
      mulrk.putShort(15.toShort).putInt((v << 2) | 0x02)
    }
    mulrk.putShort(2.toShort)
    rec(0x00bd, mulrk.array())
    rec(0x000a, Array.empty)
    val stream = recs.toByteArray ++
      Array.fill(4096 - recs.size())(0.toByte)
    val p = tmp("mulrk.xls")
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      Biff.compoundFile(stream))
    val df = Biff.read(spark, p)
    // MULRK lands three cells in row 1 under the single header column
    // "h" (+ two unnamed columns)
    val row = df.collect()(0)
    assert(row.toSeq === Seq(100L, 200L, 300L))
  }

  test("ministream path: a sub-4096-byte Workbook stream reads via the " +
      "mini FAT") {
    // Build the workbook bytes with the normal writer, then strip its
    // padding and repack into a hand-built ministream container.
    val p0 = tmp("src.xls")
    Biff.write(p0, Seq("k", "v"), Seq(Seq[Any](1L, "a"), Seq[Any](2L, "b")))
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p0))
    val wb0 = Biff.workbookStream(full)
    // trim trailing zero padding back under the cutoff (records end at
    // the sheet EOF; padding is zeros by construction)
    var end = wb0.length
    while (end > 0 && wb0(end - 1) == 0) end -= 1
    val wb = java.util.Arrays.copyOf(wb0, end + 4) // keep EOF's zero len
    assert(wb.length < 4096, "fixture must be ministream-sized")
    val nMini = (wb.length + 63) / 64
    val miniSectors = (nMini + 7) / 8 // 8 mini slots per 512 sector
    // sectors: 0 FAT, 1 directory, 2 miniFAT, 3.. ministream
    val total = 3 + miniSectors
    val out = ByteBuffer.allocate(512 + total * 512)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(0xe11ab1a1e011cfd0L)
    out.position(24)
    out.putShort(0x3e.toShort); out.putShort(3.toShort)
    out.putShort(0xfffe.toShort); out.putShort(9.toShort)
    out.putShort(6.toShort)
    out.position(44)
    out.putInt(1) // one FAT sector
    out.putInt(1) // first directory sector
    out.putInt(0)
    out.putInt(4096)
    out.putInt(2) // first miniFAT sector
    out.putInt(1) // one miniFAT sector
    out.putInt(0xfffffffe) // no DIFAT chain
    out.putInt(0)
    out.putInt(0) // DIFAT[0] = FAT sector 0
    (1 until 109).foreach(_ => out.putInt(0xffffffff))
    // FAT sector 0
    val fat = Array.fill(128)(0xffffffff)
    fat(0) = 0xfffffffd // FAT
    fat(1) = 0xfffffffe // directory
    fat(2) = 0xfffffffe // miniFAT
    (0 until miniSectors).foreach { i =>
      fat(3 + i) = if (i == miniSectors - 1) 0xfffffffe else 3 + i + 1
    }
    fat.foreach(out.putInt)
    // directory: root (ministream chain at sector 3), Workbook (mini 0)
    def entry(name: String, typ: Int, child: Int, start: Int,
        size: Long): Unit = {
      val base = out.position()
      name.foreach(c => out.putShort(c.toShort))
      out.position(base + 64)
      out.putShort(((name.length + 1) * 2).toShort)
      out.put(typ.toByte); out.put(1.toByte)
      out.putInt(-1); out.putInt(-1); out.putInt(child)
      out.position(base + 116)
      out.putInt(start); out.putLong(size)
      out.position(base + 128)
    }
    entry("Root Entry", 5, 1, 3, nMini.toLong * 64)
    entry("Workbook", 2, -1, 0, wb.length.toLong)
    (0 until 2).foreach { _ =>
      val b = out.position(); out.position(b + 128)
    }
    // miniFAT sector: chain of nMini 64-byte slots
    val mfat = Array.fill(128)(0xffffffff)
    (0 until nMini).foreach { i =>
      mfat(i) = if (i == nMini - 1) 0xfffffffe else i + 1
    }
    mfat.foreach(out.putInt)
    // ministream payload
    out.put(wb)
    val p = tmp("mini.xls")
    out.position(out.capacity())
    java.nio.file.Files.write(java.nio.file.Paths.get(p), out.array())
    val df = Biff.read(spark, p)
    assert(df.columns.toSeq === Seq("k", "v"))
    assert(df.orderBy("k").collect().map(_.toSeq).toSeq ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
  }
}
