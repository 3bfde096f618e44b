package graft.etl

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal legacy `.xls` (BIFF8) reader — the second half of the
  * reference smart_load's Excel branch (main.py:80-81: pandas.read_excel
  * handles both `.xlsx` and `.xls`). Implemented from the public
  * [MS-CFB]/[MS-XLS] format specs because no Excel library ships in this
  * offline build.
  *
  * Two layers:
  *   1. a Compound File Binary (OLE2) container walk — FAT, mini-FAT and
  *      directory chains — to extract the `Workbook` (or BIFF5 `Book`)
  *      stream;
  *   2. a BIFF8 record scan: globals (SST shared strings, BOUNDSHEET
  *      sheet offsets), then the FIRST sheet's cell records (LABELSST,
  *      LABEL, NUMBER, RK, MULRK, BOOLERR).
  *
  * Driver-side by design, like XlsxReader: spreadsheet uploads are
  * interactive-scale inputs in the reference; the parsed rows feed
  * `spark.createDataFrame` and everything downstream is a normal
  * distributed DataFrame. Column typing reuses XlsxReader's inference so
  * `.xls` and `.xlsx` loads of the same sheet produce identical schemas.
  *
  * SST strings spilling into CONTINUE records are spliced per
  * [MS-XLS] (a split inside character data restarts with a fresh
  * option-flags byte, so compression can change mid-string; header and
  * rich/ext payload bytes splice raw).
  *
  * Not supported (fail-loud or skipped, all rare in data-bearing sheets):
  * formulas (cached string results skipped; cell omitted), BIFF5
  * workbooks (fail loud), date styling (serials surface as numbers,
  * same as XlsxReader), encrypted workbooks.
  */
object XlsReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val wb = Cfb.readStream(bytes, Seq("Workbook", "Book"))
      .getOrElse(throw new IllegalArgumentException(s"no Workbook stream in $path"))
    val rows = parseWorkbook(wb)
    XlsxReader.rowsToDataFrame(spark, rows)
  }

  // ---- BIFF8 record layer --------------------------------------------

  private val BOF = 0x0809
  private val EOF_R = 0x000A
  private val CONTINUE = 0x003C
  private val SST = 0x00FC
  private val BOUNDSHEET = 0x0085
  private val LABELSST = 0x00FD
  private val LABEL = 0x0204
  private val NUMBER = 0x0203
  private val RK = 0x027E
  private val MULRK = 0x00BD
  private val BOOLERR = 0x0205

  private def parseWorkbook(wb: Array[Byte]): Vector[Vector[XlsxReader.Cell]] = {
    val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    var sst = Vector.empty[String]
    var firstSheetPos = -1
    // BOF version gate: this reader speaks BIFF8 string layouts only.
    // A BIFF5/BIFF7 workbook (Excel 5.0/95, stream named "Book", byte
    // strings without option flags) must fail loud, not parse garbled.
    if (wb.length >= 8 && (buf.getShort(0) & 0xFFFF) == BOF) {
      val vers = buf.getShort(4) & 0xFFFF
      if (vers != 0x0600) throw new IllegalArgumentException(
        f"unsupported BIFF version 0x$vers%04X (only BIFF8 / Excel 97+ is supported)")
    }
    // globals substream: BOF .. EOF
    var pos = 0
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val id = buf.getShort(pos) & 0xFFFF
      val len = buf.getShort(pos + 2) & 0xFFFF
      val body = pos + 4
      id match {
        case SST =>
          sst = parseSst(buf, body, len, wb)
        case BOUNDSHEET =>
          if (firstSheetPos < 0) firstSheetPos = buf.getInt(body)
        case EOF_R => done = true
        case _ => ()
      }
      pos = body + len
    }
    if (firstSheetPos < 0 || firstSheetPos >= wb.length)
      throw new IllegalArgumentException("BIFF8 workbook has no worksheet substream")

    // first sheet substream: collect typed cells
    val cells = scala.collection.mutable.Map.empty[(Int, Int), XlsxReader.Cell]
    def put(row: Int, col: Int, raw: String, kind: String): Unit =
      cells((row, col)) = XlsxReader.Cell(col, raw, kind)
    pos = firstSheetPos
    done = false
    while (!done && pos + 4 <= wb.length) {
      val id = buf.getShort(pos) & 0xFFFF
      val len = buf.getShort(pos + 2) & 0xFFFF
      val b = pos + 4
      id match {
        case LABELSST =>
          val isst = buf.getInt(b + 6)
          put(buf.getShort(b) & 0xFFFF, buf.getShort(b + 2) & 0xFFFF,
            sst.lift(isst).getOrElse(""), "s")
        case LABEL =>
          val (s, _) = readXLString(buf, b + 6, cchBytes = 2)
          put(buf.getShort(b) & 0xFFFF, buf.getShort(b + 2) & 0xFFFF, s, "s")
        case NUMBER =>
          put(buf.getShort(b) & 0xFFFF, buf.getShort(b + 2) & 0xFFFF,
            numRaw(buf.getDouble(b + 6)), "n")
        case RK =>
          put(buf.getShort(b) & 0xFFFF, buf.getShort(b + 2) & 0xFFFF,
            numRaw(decodeRk(buf.getInt(b + 6))), "n")
        case MULRK =>
          val row = buf.getShort(b) & 0xFFFF
          val colFirst = buf.getShort(b + 2) & 0xFFFF
          val n = (len - 6) / 6 // 2-byte ixfe + 4-byte RK each; trailing colLast
          (0 until n).foreach { i =>
            put(row, colFirst + i, numRaw(decodeRk(buf.getInt(b + 4 + i * 6 + 2))), "n")
          }
        case BOOLERR =>
          val fErr = buf.get(b + 7) & 0xFF
          if (fErr == 0) // error cells (#DIV/0! etc.) become nulls by omission
            put(buf.getShort(b) & 0xFFFF, buf.getShort(b + 2) & 0xFFFF,
              if ((buf.get(b + 6) & 0xFF) != 0) "TRUE" else "FALSE", "b")
        case EOF_R => done = true
        case _ => ()
      }
      pos = b + len
    }

    // single grouping pass (not a per-row scan of the whole map — that
    // would be O(rows × cells) on a 65k-row sheet)
    cells.toVector
      .groupBy { case ((row, _), _) => row }
      .toVector.sortBy(_._1)
      .map { case (_, rowCells) => rowCells.map(_._2).sortBy(_.colIdx) }
      .filter(_.nonEmpty)
  }

  /** SST record spliced with its CONTINUE records: cstTotal(4)
    * cstUnique(4) then XLUnicodeRichExtendedString*. A record boundary
    * may fall anywhere in the string stream; when it splits a string's
    * CHARACTER data, the continuation restarts with a fresh option-flags
    * byte — the compression of the remaining characters, which can
    * differ from the first part's ([MS-XLS] 2.5.293). Header fields and
    * rich-run/ext payloads splice raw, with no flags byte. */
  private def parseSst(buf: ByteBuffer, body: Int, len: Int, wb: Array[Byte]): Vector[String] = {
    // body segments: the SST record itself + immediately following CONTINUEs
    val segs = Vector.newBuilder[(Int, Int)]
    segs += ((body, body + len))
    var scan = body + len
    while (scan + 4 <= wb.length && (buf.getShort(scan) & 0xFFFF) == CONTINUE) {
      val l = buf.getShort(scan + 2) & 0xFFFF
      segs += ((scan + 4, scan + 4 + l))
      scan = scan + 4 + l
    }
    val segments = segs.result()
    var seg = 0
    var pos = segments(0)._1
    def ensure(): Unit = {
      while (pos >= segments(seg)._2 && seg + 1 < segments.length) {
        seg += 1; pos = segments(seg)._1
      }
      if (pos >= segments(seg)._2) throw new IllegalArgumentException(
        "SST truncated: string data extends past the last CONTINUE record")
    }
    def readU8(): Int = { ensure(); val v = buf.get(pos) & 0xFF; pos += 1; v }
    def readU16(): Int = readU8() | (readU8() << 8)
    def readU32(): Int = readU16() | (readU16() << 16)
    def skipRaw(n: Int): Unit = {
      var r = n
      while (r > 0) {
        ensure()
        val take = math.min(r, segments(seg)._2 - pos)
        pos += take; r -= take
      }
    }
    def atBoundary: Boolean = pos >= segments(seg)._2

    readU32() // cstTotal (includes repeated uses; not needed)
    val unique = readU32()
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < unique) {
      val cch = readU16()
      val grbit = readU8()
      var high = (grbit & 0x01) != 0
      val ext = (grbit & 0x04) != 0
      val rich = (grbit & 0x08) != 0
      val cRun = if (rich) readU16() else 0
      val cbExt = if (ext) readU32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var c = 0
      while (c < cch) {
        if (atBoundary) {
          // mid-character-data split: the continuation's first byte is a
          // fresh flags byte (readU8's ensure() advances the segment)
          high = (readU8() & 0x01) != 0
        }
        sb.append(if (high) readU16().toChar else readU8().toChar)
        c += 1
      }
      skipRaw(cRun * 4 + cbExt)
      out += sb.toString
      i += 1
    }
    out.result()
  }

  /** XLUnicodeString at `at`: cch (1 or 2 bytes), grbit, chars, then any
    * rich-run/ext-rst payloads to skip. Returns (string, next offset). */
  private def readXLString(buf: ByteBuffer, at: Int, cchBytes: Int): (String, Int) = {
    val cch = if (cchBytes == 1) buf.get(at) & 0xFF else buf.getShort(at) & 0xFFFF
    var p = at + cchBytes
    val grbit = buf.get(p) & 0xFF; p += 1
    val high = (grbit & 0x01) != 0
    val ext = (grbit & 0x04) != 0
    val rich = (grbit & 0x08) != 0
    val cRun = if (rich) { val v = buf.getShort(p) & 0xFFFF; p += 2; v } else 0
    val cbExt = if (ext) { val v = buf.getInt(p); p += 4; v } else 0
    val sb = new StringBuilder(cch)
    if (high) {
      (0 until cch).foreach(i => sb.append(buf.getShort(p + i * 2).toChar))
      p += cch * 2
    } else {
      (0 until cch).foreach(i => sb.append(((buf.get(p + i) & 0xFF)).toChar))
      p += cch
    }
    (sb.toString, p + cRun * 4 + cbExt)
  }

  /** RK: 30-bit number + 2 flag bits (fX100, fInt). */
  private def decodeRk(rk: Int): Double = {
    val v =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble // signed 30-bit integer
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) v / 100.0 else v
  }

  /** Integral doubles print integral so XlsxReader's long-vs-double column
    * inference sees `.xls` numbers exactly as it sees `.xlsx` cell text. */
  private def numRaw(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  // ---- Compound File Binary (OLE2) layer -----------------------------

  /** Just enough [MS-CFB]: DIFAT -> FAT -> directory walk; stream bytes
    * come from the FAT chain, or from the mini-FAT chain inside the root
    * entry's mini stream when the stream is under the mini cutoff. */
  private object Cfb {
    private val FREE = 0xFFFFFFFF
    private val EOC = 0xFFFFFFFE

    def readStream(bytes: Array[Byte], names: Seq[String]): Option[Array[Byte]] =
      // any out-of-range read (file truncated inside the header, FAT,
      // DIFAT, or directory region) surfaces as the same diagnosable
      // error as a truncated data sector
      try readStreamImpl(bytes, names)
      catch {
        case _: IndexOutOfBoundsException =>
          throw new IllegalArgumentException(
            s"truncated compound file: structure extends past EOF (${bytes.length} bytes)")
      }

    private def readStreamImpl(bytes: Array[Byte], names: Seq[String]): Option[Array[Byte]] = {
      require(bytes.length >= 512 &&
        (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
        (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0,
        "not an OLE2 compound file (bad magic)")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val secShift = buf.getShort(30).toInt
      val secSize = 1 << secShift
      val miniSize = 1 << buf.getShort(32).toInt
      val firstDir = buf.getInt(48)
      val miniCutoff = buf.getInt(56)
      val firstMiniFat = buf.getInt(60)
      val firstDifat = buf.getInt(68)
      val numDifat = buf.getInt(72)

      def secOff(idx: Int): Int = (idx + 1) * secSize

      // FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
      val fatSectors = Vector.newBuilder[Int]
      (0 until 109).foreach { i =>
        val v = buf.getInt(76 + i * 4)
        if (v != FREE && v != EOC) fatSectors += v
      }
      var difat = firstDifat
      var difatHops = 0
      while (difat != EOC && difat != FREE && difatHops <= numDifat + 1) {
        val base = secOff(difat)
        val perSec = secSize / 4 - 1
        (0 until perSec).foreach { i =>
          val v = buf.getInt(base + i * 4)
          if (v != FREE && v != EOC) fatSectors += v
        }
        difat = buf.getInt(base + perSec * 4)
        difatHops += 1
      }
      val fat: Array[Int] = fatSectors.result().iterator.flatMap { s =>
        val base = secOff(s)
        (0 until secSize / 4).map(i => buf.getInt(base + i * 4))
      }.toArray

      def chain(start: Int): Vector[Int] = {
        val out = Vector.newBuilder[Int]
        var cur = start
        var hops = 0
        while (cur != EOC && cur != FREE && cur >= 0 && hops <= fat.length) {
          out += cur
          cur = if (cur < fat.length) fat(cur) else EOC
          hops += 1
        }
        out.result()
      }

      def chainBytes(start: Int): Array[Byte] = {
        val secs = chain(start)
        val out = new Array[Byte](secs.length * secSize)
        secs.zipWithIndex.foreach { case (s, i) =>
          if (secOff(s) + secSize > bytes.length)
            throw new IllegalArgumentException(
              s"truncated compound file: sector $s extends past EOF (${bytes.length} bytes)")
          System.arraycopy(bytes, secOff(s), out, i * secSize, secSize)
        }
        out
      }

      // directory entries: 128 bytes each across the directory chain
      val dir = chainBytes(firstDir)
      val dbuf = ByteBuffer.wrap(dir).order(ByteOrder.LITTLE_ENDIAN)
      final case class Entry(name: String, objType: Int, start: Int, size: Long)
      val entries = (0 until dir.length / 128).map { i =>
        val base = i * 128
        val nameLen = dbuf.getShort(base + 64) & 0xFFFF
        val name = if (nameLen >= 2) {
          val chars = (0 until (nameLen - 2) / 2).map(j => dbuf.getShort(base + j * 2).toChar)
          new String(chars.toArray)
        } else ""
        Entry(name, dir(base + 66) & 0xFF, dbuf.getInt(base + 116),
          dbuf.getLong(base + 120) & 0xFFFFFFFFL)
      }

      val root = entries.find(_.objType == 5)
      val target = names.iterator
        .flatMap(n => entries.find(e => e.objType == 2 && e.name == n))
        .nextOption()

      target.map { e =>
        if (e.size >= miniCutoff || root.isEmpty) {
          chainBytes(e.start).take(e.size.toInt)
        } else {
          // mini stream: 64-byte sectors inside the root entry's chain
          val mini = chainBytes(root.get.start)
          val miniFatBytes = chainBytes(firstMiniFat)
          val mbuf = ByteBuffer.wrap(miniFatBytes).order(ByteOrder.LITTLE_ENDIAN)
          val out = new java.io.ByteArrayOutputStream(e.size.toInt)
          var cur = e.start
          var hops = 0
          val maxHops = miniFatBytes.length / 4 + 1
          while (cur != EOC && cur != FREE && cur >= 0 && hops <= maxHops) {
            val off = cur * miniSize
            out.write(mini, off, math.min(miniSize, mini.length - off))
            cur = if (cur * 4 + 4 <= miniFatBytes.length) mbuf.getInt(cur * 4) else EOC
            hops += 1
          }
          out.toByteArray.take(e.size.toInt)
        }
      }
    }
  }
}
