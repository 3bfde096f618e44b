package graft.etl

import java.io.InputStream
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal XLSX reader (reference smart_load's Excel branch,
  * main.py:80-81: pandas.read_excel of the FIRST sheet, header row 0,
  * inferred dtypes). Implemented directly over the OOXML container
  * (zip + SpreadsheetML via the JDK's StAX parser) because no Excel
  * library ships in this offline build.
  *
  * Driver-side by design: spreadsheet uploads are interactive-scale
  * inputs in the reference (browser upload path); the parsed rows feed
  * `spark.createDataFrame`, after which everything is a normal
  * distributed DataFrame. Not intended for multi-GB workbooks.
  *
  * Supported: shared/inline strings, numbers, booleans, blank cells,
  * sparse rows (gap cells become nulls), per-column long/double/bool/
  * string inference matching the CSV loader's behavior. Not supported:
  * date styling (serial numbers surface as doubles), formulas (cached
  * values are used), multiple sheets (first sheet only, like the
  * reference).
  */
object XlsxReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e))).getOrElse(Vector.empty)
      val sheetName = firstSheetPath(zip)
      val entry = Option(zip.getEntry(sheetName))
        .getOrElse(throw new IllegalArgumentException(s"no worksheet at $sheetName in $path"))
      val rows = parseSheet(zip.getInputStream(entry), shared)
      toDataFrame(spark, rows)
    } finally zip.close()
  }

  /** Resolve the first sheet in workbook order through the relationship
    * table; falls back to xl/worksheets/sheet1.xml. */
  private def firstSheetPath(zip: ZipFile): String = {
    val default = "xl/worksheets/sheet1.xml"
    val wb = Option(zip.getEntry("xl/workbook.xml")).getOrElse(return default)
    val rels = Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    var firstRid: Option[String] = None
    val r1 = factory.createXMLStreamReader(zip.getInputStream(wb))
    try {
      while (r1.hasNext && firstRid.isEmpty) {
        if (r1.next() == XMLStreamConstants.START_ELEMENT && r1.getLocalName == "sheet")
          firstRid = (0 until r1.getAttributeCount)
            .find(i => r1.getAttributeLocalName(i) == "id")
            .map(r1.getAttributeValue)
      }
    } finally r1.close()
    (for {
      rid <- firstRid
      relEntry <- rels
    } yield {
      val r2 = factory.createXMLStreamReader(zip.getInputStream(relEntry))
      try {
        var target: Option[String] = None
        while (r2.hasNext && target.isEmpty) {
          if (r2.next() == XMLStreamConstants.START_ELEMENT && r2.getLocalName == "Relationship") {
            val attrs = (0 until r2.getAttributeCount)
              .map(i => r2.getAttributeLocalName(i) -> r2.getAttributeValue(i)).toMap
            if (attrs.get("Id").contains(rid))
              target = attrs.get("Target").map(t => if (t.startsWith("/")) t.drop(1) else s"xl/$t")
          }
        }
        target.getOrElse(default)
      } finally r2.close()
    }).getOrElse(default)
  }

  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = factory.createXMLStreamReader(in)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" if inSi => inT = true
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += cur.toString
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  /** One parsed cell value, still untyped ('n' numeric, 'b' bool, else
    * string). Shared with XlsReader so both Excel formats feed one
    * inference path. */
  private[etl] final case class Cell(colIdx: Int, raw: String, kind: String)

  private def parseSheet(in: InputStream, shared: Vector[String]): Vector[Vector[Cell]] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = factory.createXMLStreamReader(in)
    val rows = Vector.newBuilder[Vector[Cell]]
    var cells = Vector.newBuilder[Cell]
    var cellType = "n"
    var cellCol = -1
    var nextCol = 0
    var inV = false
    var inInlineT = false
    val text = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => cells = Vector.newBuilder[Cell]; nextCol = 0
              case "c" =>
                val attrs = (0 until r.getAttributeCount)
                  .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
                cellType = attrs.getOrElse("t", "n")
                cellCol = attrs.get("r").map(colIndex).getOrElse(nextCol)
                text.clear()
              case "v" => inV = true
              case "t" => inInlineT = true
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS if inV || inInlineT => text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inInlineT = false
              case "c" =>
                val raw = cellType match {
                  case "s" => shared.lift(text.toString.trim.toInt).getOrElse("")
                  case _ => text.toString
                }
                if (raw.nonEmpty || cellType == "n")
                  cells += Cell(cellCol, raw, cellType)
                nextCol = cellCol + 1
              case "row" => rows += cells.result()
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    rows.result().filter(_.nonEmpty)
  }

  /** "BC12" -> 54 (zero-based column index). */
  private[etl] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private[etl] def rowsToDataFrame(spark: SparkSession, rows: Vector[Vector[Cell]]): DataFrame =
    toDataFrame(spark, rows)

  private def toDataFrame(spark: SparkSession, rows: Vector[Vector[Cell]]): DataFrame = {
    if (rows.isEmpty) return spark.emptyDataFrame
    val headerCells = rows.head
    val nCols = math.max(headerCells.map(_.colIdx).max + 1,
      rows.map(r => r.map(_.colIdx).max + 1).max)
    val header = {
      val m = headerCells.map(c => c.colIdx -> c.raw).toMap
      (0 until nCols).map(i => m.getOrElse(i, s"col_$i")).toSeq
    }
    val body: Seq[Array[Option[(String, String)]]] = rows.tail.map { r =>
      val arr = Array.fill[Option[(String, String)]](nCols)(None)
      r.foreach(c => if (c.colIdx < nCols) arr(c.colIdx) = Some((c.raw, c.kind)))
      arr
    }
    // per-column inference: long -> double -> boolean -> string
    def longOk(s: String) = s.nonEmpty && s.matches("-?\\d+") &&
      (try { s.toLong; true } catch { case _: Throwable => false })
    def dblOk(s: String) = try { s.toDouble; true } catch { case _: Throwable => false }
    val types: Seq[DataType] = (0 until nCols).map { i =>
      val vals = body.flatMap(_(i)).filter(_._1.nonEmpty)
      if (vals.isEmpty) StringType
      else if (vals.forall(v => v._2 == "b" || v._1 == "TRUE" || v._1 == "FALSE")) BooleanType
      else if (vals.forall(v => longOk(v._1))) LongType
      else if (vals.forall(v => dblOk(v._1))) DoubleType
      else StringType
    }
    val schema = StructType(header.zip(types).map { case (n, t) => StructField(n, t, nullable = true) })
    val data: Seq[Row] = body.map { arr =>
      Row.fromSeq((0 until nCols).map { i =>
        arr(i) match {
          case None | Some(("", _)) => null
          case Some((raw, kind)) => types(i) match {
            case LongType => raw.toLong
            case DoubleType => raw.toDouble
            case BooleanType => raw == "1" || raw.equalsIgnoreCase("true")
            case _ => raw
          }
        }
      })
    }
    spark.createDataFrame(data.asJava, schema)
  }
}
