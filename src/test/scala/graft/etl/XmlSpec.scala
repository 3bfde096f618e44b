package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** XML source/sink (XmlIO): record extraction, attributes, nesting,
  * escaping, inference lattice, round trips, XXE hardening. */
class XmlSpec extends SparkTestBase {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_xml_spec_").toString

  private def writeFile(dir: String, name: String, content: String): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("records by rowTag: attributes as @cols, children as columns, inference") {
    val dir = tmpDir()
    writeFile(dir, "a.xml",
      """<?xml version="1.0"?>
        |<data><meta>ignored</meta>
        | <row id="1"><name>alice</name><score>10</score><ok>true</ok></row>
        | <row id="2"><name>bob</name><score>-3</score><ok>false</ok></row>
        |</data>""".stripMargin)
    val df = XmlIO.read(spark, dir + "/a.xml")
    assert(df.schema === StructType(Seq(
      StructField("@id", LongType), StructField("name", StringType),
      StructField("score", LongType), StructField("ok", BooleanType))))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).toSeq === Seq(1L, "alice", 10L, true))
    assert(rows(1).toSeq === Seq(2L, "bob", -3L, false))
  }

  test("missing children -> null; mixed numeric widens long->double; empty element -> null") {
    val dir = tmpDir()
    writeFile(dir, "b.xml",
      """<rows>
        |<row><a>1</a><b>x</b></row>
        |<row><a>2.5</a><c></c></row>
        |</rows>""".stripMargin)
    val df = XmlIO.read(spark, dir + "/b.xml")
    assert(df.schema("a").dataType === DoubleType)
    assert(df.schema("c").dataType === StringType)
    val byA = df.collect().sortBy(_.getDouble(0))
    assert(byA(0).toSeq === Seq(1.0, "x", null))
    assert(byA(1).toSeq === Seq(2.5, null, null))
  }

  test("nested children flatten to descendant text; repeated child first-wins") {
    val dir = tmpDir()
    writeFile(dir, "c.xml",
      """<rows><row>
        |<addr><street>Main</street><no>4</no></addr>
        |<tag>first</tag><tag>second</tag>
        |</row></rows>""".stripMargin)
    val df = XmlIO.read(spark, dir + "/c.xml")
    val r = df.collect().head
    assert(r.getAs[String]("addr").replaceAll("\\s+", "") === "Main4")
    assert(r.getAs[String]("tag") === "first")
  }

  test("multi-file directory read unions records from every file") {
    val dir = tmpDir()
    writeFile(dir, "p1.xml", "<rows><row><v>1</v></row><row><v>2</v></row></rows>")
    writeFile(dir, "p2.xml", "<rows><row><v>3</v></row></rows>")
    val df = XmlIO.read(spark, dir)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("write -> read round trip with escaping and nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("""a & <b> "c""""), Some(1.5)),
      (2L, None, None)).toDF("k", "s", "d").repartition(2)
    val dir = tmpDir() + "/out"
    Sinks.xmlDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("xml"))
    val rows = back.select("k", "s", "d").collect().sortBy(_.getLong(0))
    assert(rows(0).toSeq === Seq(1L, """a & <b> "c"""", 1.5))
    assert(rows(1).toSeq === Seq(2L, null, null))
  }

  test(".xml extension dispatches through SmartLoad without override") {
    val dir = tmpDir()
    val f = writeFile(dir, "t.xml", "<rows><row><v>9</v></row></rows>")
    assert(SmartLoad.load(spark, f).collect().head.getLong(0) === 9L)
  }

  test("DTD / external entities are rejected (XXE hardening)") {
    val dir = tmpDir()
    val f = writeFile(dir, "evil.xml",
      """<?xml version="1.0"?>
        |<!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/hostname">]>
        |<rows><row><v>&x;</v></row></rows>""".stripMargin)
    val e = intercept[org.apache.spark.SparkException](XmlIO.read(spark, f).collect())
    assert(e.getCause != null)
  }
}
