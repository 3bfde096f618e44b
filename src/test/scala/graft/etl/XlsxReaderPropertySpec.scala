package graft.etl

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkTestBase

/** Generative round-trip for the OOXML reader: random string tables —
  * XML metacharacters, unicode, empty cells, >26 columns (two-letter
  * references), shared vs inline string encodings chosen per cell —
  * are serialized to hand-rolled .xlsx archives and must read back
  * exactly. Excel ingest is a core reference-surface path
  * (main.py loads workbooks first); entity-escaping or column-ref
  * defects would corrupt user tables silently.
  */
class XlsxReaderPropertySpec extends SparkTestBase {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def writeWorkbook(header: Seq[String], rows: Seq[Seq[Option[String]]],
      shared: (Int, Int) => Boolean): String = {
    val path = Files.createTempDirectory("xlsx_prop").resolve("t.xlsx").toString
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="w" Target="worksheets/s.xml"/></Relationships>""".stripMargin)
    val sst = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sstIdx(s: String): Int = sst.getOrElseUpdate(s, sst.size)
    val body = new StringBuilder
    body.append("""<row r="1">""")
    header.zipWithIndex.foreach { case (h, c) =>
      body.append(s"""<c r="${colRef(c)}1" t="s"><v>${sstIdx(h)}</v></c>""")
    }
    body.append("</row>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      val r = ri + 2
      body.append(s"""<row r="$r">""")
      row.zipWithIndex.foreach {
        case (Some(v), c) if shared(ri, c) =>
          body.append(s"""<c r="${colRef(c)}$r" t="s"><v>${sstIdx(v)}</v></c>""")
        case (Some(v), c) =>
          body.append(s"""<c r="${colRef(c)}$r" t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
        case (None, _) => ()
      }
      body.append("</row>")
    }
    entry("xl/sharedStrings.xml",
      "<?xml version=\"1.0\"?><sst>" +
        sst.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString + "</sst>")
    entry("xl/worksheets/s.xml",
      "<?xml version=\"1.0\"?><worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        s"<sheetData>${body.toString}</sheetData></worksheet>")
    zos.close()
    path
  }

  test("random tables round-trip exactly over 12 workbooks") {
    (0 until 12).foreach { scenario =>
      val rnd = new scala.util.Random(scenario)
      val pieces = Vector("plain", "a&b", "<tag>", "x>y", "\"q\"", "'s'", "é中",
        "sp ace", "trail ", "&amp;") // pre-escaped-looking literal on purpose
      def cell(): String = (0 until 1 + rnd.nextInt(3))
        .map(_ => pieces(rnd.nextInt(pieces.length))).mkString("|")
      val nCols = 2 + rnd.nextInt(30) // crosses the AA boundary often
      val header = (0 until nCols).map(i => s"c${i}_${cell().take(6)}")
        .map(_.replace("|", "_")) // header must be a sane column name
      val nRows = 1 + rnd.nextInt(12)
      val rows = (0 until nRows).map { _ =>
        (0 until nCols).map(_ => if (rnd.nextInt(5) == 0) None else Some(cell()))
      }
      // first column always present: anchors row count
      val anchored = rows.map(r => r.updated(0, Some(r(0).getOrElse("anchor"))))
      val path = writeWorkbook(header, anchored, (ri, c) => (ri + c + scenario) % 2 == 0)
      val df = SmartLoad.load(spark, path)
      assert(df.columns.toSeq === header, s"scenario $scenario headers")
      val got = df.collect().map(r =>
        (0 until nCols).map(i => Option(r.getString(i))).toSeq).toSet
      assert(got === anchored.map(_.toSeq).toSet, s"scenario $scenario cells diverged")
    }
  }
}
