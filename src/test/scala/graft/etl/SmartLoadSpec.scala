package graft.etl

import java.nio.file.Files

import graft.SparkTestBase

class SmartLoadSpec extends SparkTestBase {

  private lazy val dir = Files.createTempDirectory("smartload").toString

  private def write(name: String, content: String): String = {
    val p = java.nio.file.Paths.get(dir, name)
    Files.writeString(p, content)
    p.toString
  }

  test("csv with header and inferred types") {
    val p = write("t.csv", "id,amount,name\n1,10.5,alpha\n2,20.0,beta\n")
    val df = SmartLoad.load(spark, p)
    assert(df.columns.toSeq === Seq("id", "amount", "name"))
    assert(df.schema("id").dataType.typeName === "integer")
    assert(df.schema("amount").dataType.typeName === "double")
    assert(df.count() === 2)
  }

  test("pipe-delimited .txt") {
    val p = write("t.txt", "a|b\n1|x\n2|y\n")
    val df = SmartLoad.load(spark, p)
    assert(df.columns.toSeq === Seq("a", "b"))
    assert(df.count() === 2)
  }

  test("json single-document array (pandas orientation, multiLine)") {
    val p = write("t.json", """[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]""")
    val df = SmartLoad.load(spark, p)
    assert(df.columns.sorted.toSeq === Seq("a", "b"))
    assert(df.count() === 2)
  }

  test("parquet passthrough") {
    val df = SmartLoad.load(spark, s"${sf()}/nation.parquet")
    assert(df.count() === 25)
  }

  test("format override wins over extension") {
    val p = write("odd.dat2", "a|b\n1|x\n")
    val df = SmartLoad.load(spark, p, formatOverride = Some("pipe"))
    assert(df.columns.toSeq === Seq("a", "b"))
  }

  test("unknown extension sniffs the delimiter (semicolon)") {
    val p = write("t.dat", "a;b;c\n1;2;3\n4;5;6\n")
    val df = SmartLoad.load(spark, p)
    assert(df.columns.toSeq === Seq("a", "b", "c"))
    assert(df.count() === 2)
  }

  test("sniffer prefers the consistent delimiter") {
    // ',' appears inconsistently (inside text), '\t' is consistent
    val p = write("t.log", "a\tb\nhello, world\t1\nplain\t2\n")
    val df = SmartLoad.load(spark, p)
    assert(df.columns.toSeq === Seq("a", "b"))
  }

  test("legacy .xls is a clear unsupported error (offline build)") {
    intercept[SmartLoad.UnsupportedFormatException] {
      SmartLoad.load(spark, "/tmp/whatever.xls")
    }
  }
}
