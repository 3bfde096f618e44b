package graft.etl

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.SparkTestBase

/** XlsReader against a handcrafted legacy `.xls`: a real CFB (OLE2)
  * container — FAT, directory, mini-FAT, mini stream — wrapping a BIFF8
  * Workbook stream with SST/LABELSST strings, NUMBER, RK and BOOLERR
  * cells. The fixture writer below follows [MS-CFB]/[MS-XLS] exactly the
  * way Excel writes small files (workbook under the 4096-byte cutoff ->
  * stored in the mini stream), so the reader's mini-FAT path is the one
  * exercised. */
class XlsReaderSpec extends SparkTestBase {

  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le16(n: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(n.toShort).array()
  private def rec(id: Int, body: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(body.length) ++ body

  private def biffWorkbook(): Array[Byte] = {
    def bof(dt: Int) = rec(0x0809,
      le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le(0x41) ++ le(0x06))
    val strings = Seq("name", "score", "flag", "alice", "bob")
    val sst = rec(0x00FC,
      le(strings.length) ++ le(strings.length) ++
        strings.flatMap(s => le16(s.length) ++ Array(0.toByte) ++ s.getBytes("US-ASCII")).toArray)
    val eof = rec(0x000A, Array.emptyByteArray)
    val sheetNm = "Sheet1"
    val boundsheetLen = 4 + 4 + 2 + 1 + 1 + sheetNm.length
    val globalsLen = bof(5).length + sst.length + boundsheetLen + eof.length
    val boundsheet = rec(0x0085,
      le(globalsLen) ++ le16(0) ++ Array(sheetNm.length.toByte, 0.toByte) ++
        sheetNm.getBytes("US-ASCII"))
    assert(boundsheet.length == boundsheetLen)

    def labelSst(row: Int, c: Int, isst: Int) =
      rec(0x00FD, le16(row) ++ le16(c) ++ le16(0) ++ le(isst))
    def number(row: Int, c: Int, v: Double) =
      rec(0x0203, le16(row) ++ le16(c) ++ le16(0) ++
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array())
    def rkInt(row: Int, c: Int, v: Int) =
      rec(0x027E, le16(row) ++ le16(c) ++ le16(0) ++ le((v << 2) | 0x02))
    def boolErr(row: Int, c: Int, v: Boolean) =
      rec(0x0205, le16(row) ++ le16(c) ++ le16(0) ++
        Array((if (v) 1 else 0).toByte, 0.toByte))

    val sheet = bof(0x10) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
      labelSst(1, 0, 3) ++ number(1, 1, 12.5) ++ boolErr(1, 2, v = true) ++
      labelSst(2, 0, 4) ++ rkInt(2, 1, 7) ++ boolErr(2, 2, v = false) ++
      eof
    bof(5) ++ sst ++ boundsheet ++ eof ++ sheet
  }

  /** Workbook whose SST spills across TWO CONTINUE records, covering the
    * three splice cases: (1) a split inside a string's character data —
    * the continuation restarts with a fresh flags byte AND switches
    * compression (first part 8-bit, remainder 16-bit with real >0xFF
    * chars); (2) a following string fully inside the first CONTINUE;
    * (3) a record boundary falling exactly BETWEEN strings (the next
    * string header starts the second CONTINUE directly — no flags byte). */
  private def biffWorkbookSplitSst(): (Array[Byte], String) = {
    def bof(dt: Int) = rec(0x0809,
      le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le(0x41) ++ le(0x06))
    val eof = rec(0x000A, Array.emptyByteArray)
    def compressed(s: String): Array[Byte] =
      le16(s.length) ++ Array(0.toByte) ++ s.getBytes("US-ASCII")
    val longHead = "alice_" + ("x" * 12) // 18 ascii chars in the SST record
    val longTail = "xxΩ€zzzzzz" // 10 chars incl. Ω and € -> 16-bit
    val longStr = longHead + longTail // cch = 28
    val sstBody =
      le(6) ++ le(6) ++
        compressed("name") ++ compressed("score") ++ compressed("flag") ++
        le16(longStr.length) ++ Array(0.toByte) ++ longHead.getBytes("US-ASCII")
    val cont1Body = // fresh flags byte: 0x01 = remaining chars are 16-bit
      Array(1.toByte) ++ longTail.toCharArray.flatMap(ch => le16(ch.toInt)) ++ compressed("bob")
    val cont2Body = compressed("carol") // starts at a string boundary
    val sst = rec(0x00FC, sstBody) ++ rec(0x003C, cont1Body) ++ rec(0x003C, cont2Body)
    val sheetNm = "Sheet1"
    val boundsheetLen = 4 + 4 + 2 + 1 + 1 + sheetNm.length
    val globalsLen = bof(5).length + sst.length + boundsheetLen + eof.length
    val boundsheet = rec(0x0085,
      le(globalsLen) ++ le16(0) ++ Array(sheetNm.length.toByte, 0.toByte) ++
        sheetNm.getBytes("US-ASCII"))
    assert(boundsheet.length == boundsheetLen)
    def labelSst(row: Int, c: Int, isst: Int) =
      rec(0x00FD, le16(row) ++ le16(c) ++ le16(0) ++ le(isst))
    def rkInt(row: Int, c: Int, v: Int) =
      rec(0x027E, le16(row) ++ le16(c) ++ le16(0) ++ le((v << 2) | 0x02))
    def boolErr(row: Int, c: Int, v: Boolean) =
      rec(0x0205, le16(row) ++ le16(c) ++ le16(0) ++
        Array((if (v) 1 else 0).toByte, 0.toByte))
    val sheet = bof(0x10) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
      labelSst(1, 0, 3) ++ rkInt(1, 1, 12) ++ boolErr(1, 2, v = true) ++
      labelSst(2, 0, 4) ++ rkInt(2, 1, 7) ++ boolErr(2, 2, v = false) ++
      labelSst(3, 0, 5) ++ rkInt(3, 1, 3) ++ boolErr(3, 2, v = true) ++
      eof
    (bof(5) ++ sst ++ boundsheet ++ eof ++ sheet, longStr)
  }

  private def dirEntry(name: String, objType: Int, child: Int, start: Int,
      size: Int): Array[Byte] = {
    val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    name.zipWithIndex.foreach { case (ch, i) => e.putShort(i * 2, ch.toShort) }
    e.putShort(64, (if (name.isEmpty) 0 else (name.length + 1) * 2).toShort)
    e.put(66, objType.toByte)
    e.put(67, 1.toByte) // black
    e.putInt(68, -1); e.putInt(72, -1); e.putInt(76, child)
    e.putInt(116, start)
    e.putInt(120, size)
    e.array()
  }

  private def writeXls(wb: Array[Byte] = biffWorkbook()): String = {
    assert(wb.length < 4096, "fixture must exercise the mini-stream path")
    val nMini = (wb.length + 63) / 64
    val miniBytes = nMini * 64
    val nMiniDataSectors = (miniBytes + 511) / 512
    val FREE = 0xFFFFFFFF; val EOC = 0xFFFFFFFE; val FATSECT = 0xFFFFFFFD

    val out = ByteBuffer.allocate(512 * (3 + nMiniDataSectors + 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.putShort(24, 0x3E.toShort); out.putShort(26, 3.toShort)
    out.putShort(28, 0xFFFE.toShort)
    out.putShort(30, 9.toShort); out.putShort(32, 6.toShort)
    out.putInt(44, 1) // one FAT sector
    out.putInt(48, 1) // directory at sector 1
    out.putInt(56, 4096)
    out.putInt(60, 2); out.putInt(64, 1) // miniFAT at sector 2
    out.putInt(68, EOC); out.putInt(72, 0)
    out.putInt(76, 0) // DIFAT[0] -> FAT in sector 0
    (1 until 109).foreach(i => out.putInt(76 + i * 4, FREE))
    // sector 0: FAT
    val fatBase = 512
    (0 until 128).foreach(i => out.putInt(fatBase + i * 4, FREE))
    out.putInt(fatBase, FATSECT)
    out.putInt(fatBase + 4, EOC) // directory
    out.putInt(fatBase + 8, EOC) // miniFAT
    (0 until nMiniDataSectors).foreach { i =>
      out.putInt(fatBase + (3 + i) * 4, if (i == nMiniDataSectors - 1) EOC else 3 + i + 1)
    }
    // sector 1: directory
    val dirBase = 1024
    out.position(dirBase)
    out.put(dirEntry("Root Entry", 5, child = 1, start = 3, size = miniBytes))
    out.put(dirEntry("Workbook", 2, child = -1, start = 0, size = wb.length))
    out.put(dirEntry("", 0, -1, 0, 0))
    out.put(dirEntry("", 0, -1, 0, 0))
    // sector 2: miniFAT
    val mfBase = 1536
    (0 until 128).foreach(i => out.putInt(mfBase + i * 4, FREE))
    (0 until nMini).foreach(i => out.putInt(mfBase + i * 4, if (i == nMini - 1) EOC else i + 1))
    // sectors 3..: mini stream holding the workbook
    out.position(2048)
    out.put(wb)

    val p = Files.createTempDirectory("xls").resolve("book.xls")
    Files.write(p, out.array())
    p.toString
  }

  test("SmartLoad reads a legacy .xls: header, strings, numbers, RK, booleans") {
    val df = SmartLoad.load(spark, writeXls())
    assert(df.columns.toSeq === Seq("name", "score", "flag"))
    assert(df.schema("name").dataType.typeName === "string")
    assert(df.schema("score").dataType.typeName === "double")
    assert(df.schema("flag").dataType.typeName === "boolean")
    val rows = df.orderBy("name").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "alice")
    assert(rows(0).getDouble(1) === 12.5)
    assert(rows(0).getBoolean(2) === true)
    assert(rows(1).getString(0) === "bob")
    assert(rows(1).getDouble(1) === 7.0)
    assert(rows(1).getBoolean(2) === false)
  }

  test("SST spanning CONTINUE records: mid-string split with compression switch") {
    val (wb, longStr) = biffWorkbookSplitSst()
    val df = SmartLoad.load(spark, writeXls(wb))
    assert(df.columns.toSeq === Seq("name", "score", "flag"))
    val rows = df.orderBy("name").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === longStr) // spliced across the boundary
    assert(rows(0).getLong(1) === 12L)
    assert(rows(1).getString(0) === "bob") // fully inside CONTINUE 1
    assert(rows(2).getString(0) === "carol") // starts CONTINUE 2 at a string boundary
    assert(rows(2).getBoolean(2) === true)
  }

  test("BIFF5 workbook stream fails loudly, not garbled") {
    // same CFB container, but the workbook's BOF declares version 0x0500
    val p = java.nio.file.Paths.get(writeXls())
    val bytes = Files.readAllBytes(p)
    // the workbook stream starts at the mini stream (sector 3 = offset
    // 2048); BOF vers field is 4 bytes into the record
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    assert((bb.getShort(2048) & 0xFFFF) === 0x0809) // sanity: BOF id
    bb.putShort(2048 + 4, 0x0500.toShort)
    val p5 = p.resolveSibling("book5.xls")
    Files.write(p5, bytes)
    val e = intercept[IllegalArgumentException] {
      SmartLoad.load(spark, p5.toString)
    }
    assert(e.getMessage.contains("BIFF"))
  }

  test("truncated compound file fails with a clear error") {
    val p = java.nio.file.Paths.get(writeXls())
    val bytes = Files.readAllBytes(p)
    val pT = p.resolveSibling("trunc.xls")
    Files.write(pT, bytes.take(bytes.length - 300)) // cut into the mini stream
    val e = intercept[IllegalArgumentException] {
      SmartLoad.load(spark, pT.toString)
    }
    assert(e.getMessage.contains("truncated") || e.getMessage.contains("Workbook"))
  }

  test("non-OLE2 bytes fail loudly") {
    val p = Files.createTempDirectory("xls").resolve("junk.xls")
    Files.write(p, ("x" * 600).getBytes)
    intercept[IllegalArgumentException] {
      SmartLoad.load(spark, p.toString)
    }
  }
}
