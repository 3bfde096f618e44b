package graft.etl

import java.nio.file.Files

import graft.SparkTestBase

class SftpSpec extends SparkTestBase {

  test("extract stages remote bytes through smart_load") {
    val root = Files.createTempDirectory("fakeremote")
    val transport = new LocalFsTransport(root)
    transport.put("in/data.csv", "id,name\n1,a\n2,b\n".getBytes("UTF-8"))
    val df = RemoteFiles.extract(spark, transport, "in/data.csv")
    assert(df.columns.toSeq === Seq("id", "name"))
    assert(df.count() === 2)
  }

  test("load round-trips a DataFrame as one remote CSV") {
    import spark.implicits._
    val root = Files.createTempDirectory("fakeremote2")
    val transport = new LocalFsTransport(root)
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    RemoteFiles.load(transport, df, "out/result.csv")
    val back = new String(transport.get("out/result.csv"), "UTF-8")
    assert(back.startsWith("id,v"))
    assert(back.linesIterator.size === 3)
  }

  test("SftpTransport fails loudly without an SSH library") {
    intercept[UnsupportedOperationException] {
      new SftpTransport("host", 22, "user").get("/x")
    }
  }
}
