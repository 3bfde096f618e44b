package graft.etl

import java.io.StringReader

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** XML record source + sink on the JDK's StAX parser (no external XML
  * library). The record model matches pandas `read_xml` flat-record
  * semantics, which is the shape ETL uploads actually have:
  *
  *  - every element named `rowTag` (at any depth) is one row;
  *  - columns are the record's attributes (named `@attr`) plus its
  *    direct child elements (all descendant text concatenated);
  *    FIRST occurrence wins for repeated child names;
  *  - absent child / empty text -> null; per-column type inference is
  *    the CSV loader's lattice (boolean, long, double, string);
  *  - column order = first record's document order, then any
  *    later-discovered columns in name order (deterministic under
  *    parallel schema aggregation).
  *
  * Parsing is DISTRIBUTED at per-file grain (`wholeTextFiles`): XML
  * has no sync markers, so a single document cannot be split without
  * a record-boundary scanner — multi-file exports (the common case:
  * one file per day/partition/system) parallelize naturally. DTDs and
  * external entities are disabled (XXE hardening), matching the OOXML
  * readers.
  *
  * The sink writes one well-formed `part-NNNNN.xml` per non-empty
  * partition (root element + one record element per row, text
  * escaped, null columns omitted) — the exact shape the reader
  * ingests, giving a lossless round trip for the inference lattice's
  * types.
  */
object XmlIO {

  // ---------------------------------------------------------------- read

  def read(spark: SparkSession, path: String, rowTag: String = "row"): DataFrame = {
    val recs = spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, xml) => parseRecords(xml, rowTag) }
    // cached through the RETURNED frame's lifetime: schema aggregation,
    // first-record probe, and the caller's own actions all read the
    // parse once; the ContextCleaner unpersists automatically when the
    // frame (and so this RDD) becomes unreachable — an eager unpersist
    // here would silently re-parse every file on each downstream action
    recs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    locally {
      if (recs.isEmpty()) return spark.emptyDataFrame

      // ---- schema: one distributed aggregate builds the per-column
      // lattice (stillBool, stillLong, stillDouble, anyNonEmpty)
      type Lat = Map[String, (Boolean, Boolean, Boolean, Boolean)]
      def note(lat: Lat, rec: Vector[(String, String)]): Lat =
        rec.foldLeft(lat) { case (acc, (name, raw)) =>
          val (wasB, wasL, wasD, any) = acc.getOrElse(name, (true, true, true, false))
          if (raw.nonEmpty)
            acc.updated(name,
              (wasB && boolOk(raw), wasL && longOk(raw), wasD && dblOk(raw), true))
          else acc.updated(name, (wasB, wasL, wasD, any))
        }
      def merge(a: Lat, b: Lat): Lat =
        (a.keySet ++ b.keySet).map { k =>
          (a.get(k), b.get(k)) match {
            case (Some((b1, l1, d1, s1)), Some((b2, l2, d2, s2))) =>
              k -> (b1 && b2, l1 && l2, d1 && d2, s1 || s2)
            case (Some(x), None) => k -> x
            case (None, Some(x)) => k -> x
            case _ => k -> ((true, true, true, false))
          }
        }.toMap
      val lattice = recs.aggregate(Map.empty: Lat)(note, merge)
      // deterministic order: first record's document order, then rest sorted
      val firstOrder = recs.first().map(_._1)
      val names = firstOrder ++ lattice.keys.filterNot(firstOrder.contains).toSeq.sorted
      // a column whose every non-empty value parsed as X gets type X;
      // never-non-empty columns stay string
      val types: Map[String, DataType] = names.map { n =>
        val (b, l, d, any) = lattice(n)
        n -> (if (!any) StringType
              else if (b) BooleanType
              else if (l) LongType
              else if (d) DoubleType
              else StringType)
      }.toMap

      val schema = StructType(names.map(n => StructField(n, types(n), nullable = true)))
      val bNames = names
      val bTypes = names.map(types)
      val rows = recs.map { rec =>
        val m = rec.toMap
        Row.fromSeq(bNames.zip(bTypes).map { case (n, t) =>
          m.get(n) match {
            case None | Some("") => null
            case Some(raw) => t match {
              case LongType => raw.trim.toLong
              case DoubleType => raw.trim.toDouble
              case BooleanType => raw.trim.equalsIgnoreCase("true")
              case _ => raw
            }
          }
        })
      }
      spark.createDataFrame(rows, schema)
    }
  }

  private def boolOk(s: String) = {
    val t = s.trim; t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false")
  }
  private def longOk(s: String) = {
    val t = s.trim
    t.nonEmpty && t.matches("-?\\d+") &&
      (try { t.toLong; true } catch { case _: Throwable => false })
  }
  private def dblOk(s: String) =
    try { s.trim.toDouble; true } catch { case _: Throwable => false }

  /** One record per `rowTag` element: attributes as `@name`, direct
    * children as (name, descendant text); first occurrence wins. */
  private[etl] def parseRecords(xml: String, rowTag: String): Vector[Vector[(String, String)]] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new StringReader(xml))
    val out = Vector.newBuilder[Vector[(String, String)]]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == rowTag) {
          val rec = Vector.newBuilder[(String, String)]
          val seenNames = scala.collection.mutable.Set.empty[String]
          (0 until r.getAttributeCount).foreach { i =>
            val n = "@" + r.getAttributeLocalName(i)
            if (seenNames.add(n)) rec += n -> r.getAttributeValue(i)
          }
          // walk the record subtree; depth 1 elements are columns
          var depth = 0
          var colName: String = null
          val colText = new StringBuilder
          var done = false
          while (!done && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                depth += 1
                if (depth == 1) { colName = r.getLocalName; colText.setLength(0) }
              case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
                if (depth >= 1) colText.append(r.getText)
              case XMLStreamConstants.END_ELEMENT =>
                if (depth == 0) done = true // closed the rowTag element
                else {
                  if (depth == 1 && seenNames.add(colName)) rec += colName -> colText.toString
                  depth -= 1
                }
              case _ =>
            }
          }
          out += rec.result()
        }
      }
    } finally r.close()
    out.result()
  }

  // --------------------------------------------------------------- write

  /** One well-formed XML file per non-empty partition; string-rendered
    * values (Long/Double/Boolean/String and anything with a stable
    * toString), nulls omitted, text escaped. */
  def write(df: DataFrame, outDir: String, rowTag: String = "row",
      rootTag: String = "rows"): Unit = {
    val spark = df.sparkSession
    val root = new HPath(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(root, true)
    fs.mkdirs(root)
    val names = df.schema.fieldNames
    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val part = new HPath(outDir, f"part-${TaskContext.getPartitionId()}%05d.xml")
        val pfs = part.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.OutputStreamWriter(pfs.create(part, true), "UTF-8")
        try {
          out.write(s"<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<$rootTag>\n")
          rows.foreach { r =>
            out.write(s"  <$rowTag>")
            var i = 0
            while (i < names.length) {
              if (!r.isNullAt(i))
                out.write(s"<${names(i)}>${escape(String.valueOf(r.get(i)))}</${names(i)}>")
              i += 1
            }
            out.write(s"</$rowTag>\n")
          }
          out.write(s"</$rootTag>\n")
        } finally out.close()
      }
    }
  }

  private def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c => b.append(c)
    }
    b.toString
  }
}
