package graft.etl

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkTestBase

class XlsxReaderSpec extends SparkTestBase {

  /** Hand-rolled minimal OOXML workbook (shared + inline strings, numbers,
    * bools, a sparse row). */
  private def writeWorkbook(): String = {
    val path = Files.createTempDirectory("xlsx").resolve("t.xlsx").toString
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="w" Target="worksheets/data1.xml"/></Relationships>""".stripMargin)
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst><si><t>id</t></si><si><t>name</t></si><si><t>score</t></si>
        |<si><t>active</t></si><si><t>alpha</t></si><si><t>beta gamma</t></si></sst>""".stripMargin)
    entry("xl/worksheets/data1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
        | <c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>4</v></c>
        | <c r="C2"><v>9.5</v></c><c r="D2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="inlineStr"><is><t>inline text</t></is></c>
        | <c r="C3"><v>7</v></c><c r="D3" t="b"><v>0</v></c></row>
        |<row r="4"><c r="A4"><v>3</v></c><c r="C4"><v>1.25</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    path
  }

  test("reads first sheet: header, shared/inline strings, types, sparse rows") {
    val df = SmartLoad.load(spark, writeWorkbook())
    assert(df.columns.toSeq === Seq("id", "name", "score", "active"))
    assert(df.schema("id").dataType.typeName === "long")
    assert(df.schema("score").dataType.typeName === "double")
    assert(df.schema("active").dataType.typeName === "boolean")
    val rows = df.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(1) === "alpha")
    assert(rows(1).getString(1) === "inline text")
    assert(rows(1).getBoolean(3) === false)
    // sparse row: missing name/active are null
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(3))
    assert(rows(2).getDouble(2) === 1.25)
  }

  test("column reference arithmetic") {
    assert(XlsxReader.colIndex("A1") === 0)
    assert(XlsxReader.colIndex("Z9") === 25)
    assert(XlsxReader.colIndex("AA3") === 26)
    assert(XlsxReader.colIndex("BC12") === 54)
  }

}
