package graft.etl

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.SparkTestBase

/** Generative writer→reader round trip for the BIFF8 `.xls` path,
  * mirroring XlsxReaderPropertySpec's OOXML battery: random workbooks —
  * SST CONTINUE splices at random points (between strings, mid-string
  * with compression switches, raw splits inside rich/ext payloads),
  * LABELSST vs inline LABEL mixes, RK int/x100/double-bits encodings,
  * MULRK runs, BOOLERR cells incl. error→null, unicode 16-bit strings,
  * missing cells — serialized to hand-built CFB containers (both the
  * mini-stream and the regular-FAT path, chosen by workbook size) and
  * read back cell-exactly. The handcrafted fixtures in XlsReaderSpec
  * pin the known splice classes; this battery walks the generator
  * through ≥100 seeded combinations of them.
  */
class XlsReaderPropertySpec extends SparkTestBase {

  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le16(n: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(n.toShort).array()
  private def rec(id: Int, body: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(body.length) ++ body

  // ------------------------------------------------------ value model

  private sealed trait Cell
  private case class S(v: String, inline: Boolean) extends Cell
  private case class NNum(v: Double) extends Cell // NUMBER record
  private case class RkInt(v: Int) extends Cell // 30-bit signed
  private case class RkIntX100(v: Int) extends Cell // v / 100.0
  private case class RkDbl(bits: Long) extends Cell // top-30-bit IEEE double
  private case class B(v: Boolean) extends Cell
  private case object BErr extends Cell // error cell -> null

  private def cellValue(c: Cell): Option[Any] = c match {
    case S(v, _)      => Some(v)
    case NNum(v)      => Some(v)
    case RkInt(v)     => Some(v.toDouble)
    case RkIntX100(v) => Some(v.toDouble / 100.0)
    case RkDbl(bits)  => Some(java.lang.Double.longBitsToDouble(bits))
    case B(v)         => Some(v)
    case BErr         => None
  }

  // --------------------------------------------- SST with random splits

  /** Serialize the shared-string table as the SST record plus CONTINUE
    * records, choosing split points from the legal [MS-XLS] 2.5.293
    * classes at random: between strings (raw), inside character data
    * (fresh flags byte, compression may switch), and inside rich-run /
    * ext payloads (raw). */
  private def buildSst(strings: Seq[String], totalUses: Int,
      rnd: scala.util.Random): Array[Byte] = {
    val parts = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Byte])
    def cur = parts.last
    def newSeg(): Unit = parts += scala.collection.mutable.ArrayBuffer.empty[Byte]
    def chars(s: String, wide: Boolean): Array[Byte] =
      if (wide) s.toCharArray.flatMap(ch => le16(ch.toInt))
      else s.getBytes("ISO-8859-1")

    cur ++= le(totalUses); cur ++= le(strings.length)
    strings.foreach { s =>
      if (cur.length > 700 || (cur.nonEmpty && rnd.nextInt(4) == 0)) newSeg()
      val needWide = s.exists(_ > 0xFF)
      val rich = rnd.nextInt(5) == 0
      val ext = rnd.nextInt(6) == 0
      val cRun = if (rich) 1 + rnd.nextInt(3) else 0
      val cbExt = if (ext) 4 + rnd.nextInt(9) else 0
      val split = s.length >= 4 && rnd.nextInt(3) == 0
      val headWide = needWide && !split || (needWide && split &&
        s.take(1 + rnd.nextInt(s.length - 2)).exists(_ > 0xFF)) || (rnd.nextInt(5) == 0)
      if (!split) {
        val wide = needWide || headWide
        cur ++= le16(s.length)
        cur += ((if (wide) 1 else 0) | (if (ext) 4 else 0) | (if (rich) 8 else 0)).toByte
        if (rich) cur ++= le16(cRun)
        if (ext) cur ++= le(cbExt)
        cur ++= chars(s, wide)
      } else {
        val cut = 1 + rnd.nextInt(s.length - 2)
        val (head, tail) = (s.substring(0, cut), s.substring(cut))
        val hw = head.exists(_ > 0xFF) || rnd.nextInt(4) == 0
        val tw = tail.exists(_ > 0xFF) || rnd.nextInt(4) == 0
        cur ++= le16(s.length)
        cur += ((if (hw) 1 else 0) | (if (ext) 4 else 0) | (if (rich) 8 else 0)).toByte
        if (rich) cur ++= le16(cRun)
        if (ext) cur ++= le(cbExt)
        cur ++= chars(head, hw)
        newSeg() // mid-character split: continuation restarts with flags
        cur += (if (tw) 1 else 0).toByte
        cur ++= chars(tail, tw)
      }
      val payload = Array.fill[Byte](cRun * 4 + cbExt)(rnd.nextInt(256).toByte)
      if (payload.length >= 2 && rnd.nextInt(3) == 0) {
        val cut = 1 + rnd.nextInt(payload.length - 1)
        cur ++= payload.take(cut)
        newSeg() // raw split inside the skip-payload
        cur ++= payload.drop(cut)
      } else cur ++= payload
    }
    rec(0x00FC, parts.head.toArray) ++
      parts.tail.filter(_.nonEmpty).flatMap(p => rec(0x003C, p.toArray))
  }

  // ------------------------------------------------- workbook stream

  private def biffWorkbook(header: Seq[String],
      body: Seq[Seq[Option[Cell]]], rnd: scala.util.Random): Array[Byte] = {
    def bof(dt: Int) = rec(0x0809,
      le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le(0x41) ++ le(0x06))
    val eof = rec(0x000A, Array.emptyByteArray)

    // shared-string table: header cells + every non-inline string cell,
    // deduped in first-use order
    val sst = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var uses = 0
    def isst(s: String): Int = { uses += 1; sst.getOrElseUpdate(s, sst.size) }
    val headerIdx = header.map(isst)
    val bodyIdx: Seq[Seq[Option[(Cell, Int)]]] = body.map(_.map {
      case Some(c @ S(v, inline)) => Some((c, if (inline) -1 else isst(v)))
      case Some(c)                => Some((c, -1))
      case None                   => None
    })
    val sstRec = buildSst(sst.keys.toSeq, uses, rnd)

    def labelSst(row: Int, c: Int, i: Int) =
      rec(0x00FD, le16(row) ++ le16(c) ++ le16(0) ++ le(i))
    def label(row: Int, c: Int, s: String) = {
      val wide = s.exists(_ > 0xFF)
      rec(0x0204, le16(row) ++ le16(c) ++ le16(0) ++ le16(s.length) ++
        Array((if (wide) 1 else 0).toByte) ++
        (if (wide) s.toCharArray.flatMap(ch => le16(ch.toInt))
         else s.getBytes("ISO-8859-1")))
    }
    def number(row: Int, c: Int, v: Double) =
      rec(0x0203, le16(row) ++ le16(c) ++ le16(0) ++
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array())
    def rkBits(cell: Cell): Int = cell match {
      case RkInt(v)     => (v << 2) | 0x02
      case RkIntX100(v) => (v << 2) | 0x03
      case RkDbl(bits)  => ((bits >>> 32) & 0xFFFFFFFCL).toInt
      case other        => sys.error(s"not an RK cell: $other")
    }
    def rk(row: Int, c: Int, cell: Cell) =
      rec(0x027E, le16(row) ++ le16(c) ++ le16(0) ++ le(rkBits(cell)))
    def mulRk(row: Int, colFirst: Int, cells: Seq[Cell]) =
      rec(0x00BD, le16(row) ++ le16(colFirst) ++
        cells.flatMap(c => le16(0) ++ le(rkBits(c))).toArray ++
        le16(colFirst + cells.length - 1))
    def boolErr(row: Int, c: Int, cell: Cell) = cell match {
      case B(v) => rec(0x0205, le16(row) ++ le16(c) ++ le16(0) ++
        Array((if (v) 1 else 0).toByte, 0.toByte))
      case BErr => rec(0x0205, le16(row) ++ le16(c) ++ le16(0) ++
        Array(0x07.toByte, 1.toByte)) // #DIV/0! -> omitted -> null
      case other => sys.error(s"not a bool cell: $other")
    }

    val sheetRecs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    headerIdx.zipWithIndex.foreach { case (i, c) => sheetRecs += labelSst(0, c, i) }
    bodyIdx.zipWithIndex.foreach { case (row, ri) =>
      val r = ri + 1
      var c = 0
      while (c < row.length) {
        row(c) match {
          case Some((cell @ (RkInt(_) | RkIntX100(_) | RkDbl(_)), _)) =>
            // gather a run of adjacent RK cells; sometimes emit as MULRK
            var end = c + 1
            while (end < row.length && row(end).exists(_._1 match {
              case RkInt(_) | RkIntX100(_) | RkDbl(_) => true; case _ => false
            })) end += 1
            if (end - c >= 2 && rnd.nextBoolean()) {
              sheetRecs += mulRk(r, c, (c until end).map(i => row(i).get._1))
              c = end
            } else { sheetRecs += rk(r, c, cell); c += 1 }
          case Some((S(v, true), _))  => sheetRecs += label(r, c, v); c += 1
          case Some((S(_, false), i)) => sheetRecs += labelSst(r, c, i); c += 1
          case Some((NNum(v), _))     => sheetRecs += number(r, c, v); c += 1
          case Some((cell @ (B(_) | BErr), _)) => sheetRecs += boolErr(r, c, cell); c += 1
          case None                   => c += 1
        }
      }
    }
    val sheet = bof(0x10) ++ sheetRecs.flatten ++ eof

    val sheetNm = "Sheet1"
    val boundsheetLen = 4 + 4 + 2 + 1 + 1 + sheetNm.length
    val globalsLen = bof(5).length + sstRec.length + boundsheetLen + eof.length
    val boundsheet = rec(0x0085,
      le(globalsLen) ++ le16(0) ++ Array(sheetNm.length.toByte, 0.toByte) ++
        sheetNm.getBytes("US-ASCII"))
    assert(boundsheet.length == boundsheetLen)
    bof(5) ++ sstRec ++ boundsheet ++ eof ++ sheet
  }

  // ------------------------------------------------------- CFB layer

  private def dirEntry(name: String, objType: Int, child: Int, start: Int,
      size: Int): Array[Byte] = {
    val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    name.zipWithIndex.foreach { case (ch, i) => e.putShort(i * 2, ch.toShort) }
    e.putShort(64, (if (name.isEmpty) 0 else (name.length + 1) * 2).toShort)
    e.put(66, objType.toByte)
    e.put(67, 1.toByte)
    e.putInt(68, -1); e.putInt(72, -1); e.putInt(76, child)
    e.putInt(116, start)
    e.putInt(120, size)
    e.array()
  }

  private val FREE = 0xFFFFFFFF; private val EOC = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD

  /** Mini-stream container (workbook under the 4096 cutoff) — the
    * layout XlsReaderSpec proves; kept byte-compatible. */
  private def writeMini(wb: Array[Byte]): Array[Byte] = {
    val nMini = (wb.length + 63) / 64
    val miniBytes = nMini * 64
    val nMiniDataSectors = (miniBytes + 511) / 512
    val out = ByteBuffer.allocate(512 * (3 + nMiniDataSectors + 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.putShort(24, 0x3E.toShort); out.putShort(26, 3.toShort)
    out.putShort(28, 0xFFFE.toShort)
    out.putShort(30, 9.toShort); out.putShort(32, 6.toShort)
    out.putInt(44, 1)
    out.putInt(48, 1)
    out.putInt(56, 4096)
    out.putInt(60, 2); out.putInt(64, 1)
    out.putInt(68, EOC); out.putInt(72, 0)
    out.putInt(76, 0)
    (1 until 109).foreach(i => out.putInt(76 + i * 4, FREE))
    val fatBase = 512
    (0 until 128).foreach(i => out.putInt(fatBase + i * 4, FREE))
    out.putInt(fatBase, FATSECT)
    out.putInt(fatBase + 4, EOC)
    out.putInt(fatBase + 8, EOC)
    (0 until nMiniDataSectors).foreach { i =>
      out.putInt(fatBase + (3 + i) * 4, if (i == nMiniDataSectors - 1) EOC else 3 + i + 1)
    }
    out.position(1024)
    out.put(dirEntry("Root Entry", 5, child = 1, start = 3, size = miniBytes))
    out.put(dirEntry("Workbook", 2, child = -1, start = 0, size = wb.length))
    out.put(dirEntry("", 0, -1, 0, 0))
    out.put(dirEntry("", 0, -1, 0, 0))
    val mfBase = 1536
    (0 until 128).foreach(i => out.putInt(mfBase + i * 4, FREE))
    (0 until nMini).foreach(i => out.putInt(mfBase + i * 4, if (i == nMini - 1) EOC else i + 1))
    out.position(2048)
    out.put(wb)
    out.array()
  }

  /** Regular-FAT container (workbook at/over the cutoff) — exercises
    * the big-stream chain the handcrafted fixtures never reach. */
  private def writeRegular(wb: Array[Byte]): Array[Byte] = {
    val n = (wb.length + 511) / 512
    require(n + 2 <= 128, s"workbook too large for one FAT sector: ${wb.length}")
    val out = ByteBuffer.allocate(512 * (2 + n + 1)).order(ByteOrder.LITTLE_ENDIAN)
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.putShort(24, 0x3E.toShort); out.putShort(26, 3.toShort)
    out.putShort(28, 0xFFFE.toShort)
    out.putShort(30, 9.toShort); out.putShort(32, 6.toShort)
    out.putInt(44, 1)
    out.putInt(48, 1)
    out.putInt(56, 4096)
    out.putInt(60, EOC); out.putInt(64, 0)
    out.putInt(68, EOC); out.putInt(72, 0)
    out.putInt(76, 0)
    (1 until 109).foreach(i => out.putInt(76 + i * 4, FREE))
    val fatBase = 512
    (0 until 128).foreach(i => out.putInt(fatBase + i * 4, FREE))
    out.putInt(fatBase, FATSECT)
    out.putInt(fatBase + 4, EOC)
    (0 until n).foreach { i =>
      out.putInt(fatBase + (2 + i) * 4, if (i == n - 1) EOC else 2 + i + 1)
    }
    out.position(1024)
    out.put(dirEntry("Root Entry", 5, child = 1, start = EOC, size = 0))
    out.put(dirEntry("Workbook", 2, child = -1, start = 2, size = wb.length))
    out.put(dirEntry("", 0, -1, 0, 0))
    out.put(dirEntry("", 0, -1, 0, 0))
    out.position(1536)
    out.put(wb)
    out.array()
  }

  private def writeXls(wb: Array[Byte]): String = {
    val bytes = if (wb.length < 4096) writeMini(wb) else writeRegular(wb)
    val p = Files.createTempDirectory("xls_prop").resolve("book.xls")
    Files.write(p, bytes)
    p.toString
  }

  // ------------------------------------------------------- generator

  private val stringPieces = Vector("plain", "Ωδ", "é中", "sp ace", "x&y",
    "longish_piece_of_text", "t\tab", "ßeta")

  private def genString(rnd: scala.util.Random): String = {
    val s = (0 until 1 + rnd.nextInt(3))
      .map(_ => stringPieces(rnd.nextInt(stringPieces.length))).mkString("|")
    // long tails force mid-string CONTINUE splits
    if (rnd.nextInt(4) == 0) s + ("y" * (20 + rnd.nextInt(40))) else s
  }

  private def genCell(kind: String, rnd: scala.util.Random): Cell = kind match {
    case "str" => S(genString(rnd), inline = rnd.nextInt(4) == 0)
    case "num" => rnd.nextInt(4) match {
      case 0 => NNum(rnd.nextInt(200001) / 8.0 - 12500.0)
      case 1 => RkInt(rnd.nextInt() >> 2)
      case 2 => RkIntX100(rnd.nextInt() >> 2)
      case _ => RkDbl(java.lang.Double.doubleToLongBits(
        rnd.nextDouble() * 2e6 - 1e6) & ~0x3FFFFFFFFL)
    }
    case _ => if (rnd.nextInt(8) == 0) BErr else B(rnd.nextBoolean())
  }

  test("random BIFF8 workbooks round-trip cell-exactly over 100 seeds") {
    (0 until 100).foreach { seed =>
      val rnd = new scala.util.Random(9200 + seed)
      val nCols = 2 + rnd.nextInt(6)
      val nRows = 1 + rnd.nextInt(if (rnd.nextInt(5) == 0) 60 else 10)
      val kinds = "str" +: (1 until nCols).map(_ =>
        Seq("str", "num", "bool")(rnd.nextInt(3)))
      val header = (0 until nCols).map(i => s"c${i}_${kinds(i)}")
      val body: Seq[Seq[Option[Cell]]] = (0 until nRows).map { ri =>
        (0 until nCols).map { ci =>
          if (ci == 0) Some(S(f"r$ri%05d", inline = rnd.nextInt(4) == 0))
          else if (rnd.nextInt(5) == 0) None
          else Some(genCell(kinds(ci), rnd))
        }
      }
      val df = SmartLoad.load(spark, writeXls(biffWorkbook(header, body, rnd)))
      assert(df.columns.toSeq === header, s"seed $seed header")
      val got = df.orderBy(header.head).collect()
      assert(got.length === nRows, s"seed $seed row count")
      body.sortBy(_.head.get.asInstanceOf[S].v).zip(got).zipWithIndex.foreach {
        case ((expRow, gotRow), ri) =>
          expRow.zipWithIndex.foreach { case (cell, ci) =>
            val ctx = s"seed $seed row $ri col $ci (${kinds(ci)})"
            cell.flatMap(cellValue) match {
              case None => assert(gotRow.isNullAt(ci), s"$ctx: expected null")
              case Some(v: String) => assert(gotRow.getString(ci) === v, ctx)
              case Some(v: Boolean) => assert(gotRow.getBoolean(ci) === v, ctx)
              case Some(v: Double) =>
                df.schema(ci).dataType.typeName match {
                  case "long" =>
                    assert(v == math.rint(v), s"$ctx: long column, fractional expected")
                    assert(gotRow.getLong(ci) === v.toLong, ctx)
                  case "double" => assert(gotRow.getDouble(ci) === v, ctx)
                  case other =>
                    // a numeric column can only degrade to string when
                    // some OTHER cell forced it; values still match raw
                    assert(other === "string", s"$ctx: unexpected type $other")
                    assert(gotRow.getString(ci).toDouble === v, ctx)
                }
              case Some(other) => fail(s"$ctx: unhandled $other")
            }
          }
      }
    }
  }
}
