package graft.etl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.sys.process._

/** WebDataset tar shard source/sink (WebDatasetIO): round trips at the
  * 512-byte padding edges, sample grouping, ustar prefix names, header
  * corruption, and INTEROP — GNU tar must list and extract our shards
  * byte-identically (an independent implementation as the oracle). */
class WebDatasetSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_wds_spec_").toString + "/d"

  test("round trip: string + binary columns, NULL entries omitted and restored") {
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("txt", StringType),
      StructField("img", BinaryType)))
    val rows = Seq(
      Row("s1", "hello", Array[Byte](1, 2, 3)),
      Row("s2", null, Array[Byte](9)),
      Row("s3", "only-text", null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir()
    Sinks.webDatasetShards(df, "key", dir)
    val back = WebDatasetIO.read(spark, dir).collect().sortBy(_.getString(0))
    assert(back.map(_.getString(0)).toSeq === Seq("s1", "s2", "s3"))
    val bySample = back.map(r => r.getString(0) ->
      (Option(r.getAs[Array[Byte]]("txt")), Option(r.getAs[Array[Byte]]("img")))).toMap
    assert(bySample("s1")._1.map(new String(_, UTF_8)) === Some("hello"))
    assert(bySample("s1")._2.map(_.toSeq) === Some(Seq[Byte](1, 2, 3)))
    assert(bySample("s2")._1 === None)
    assert(bySample("s3")._2 === None)
  }

  test("padding edges: entry sizes 0, 511, 512, 513 round-trip exactly") {
    val sizes = Seq(0, 511, 512, 513)
    val rows = sizes.map(n => Row(f"k$n%04d", Array.tabulate[Byte](n)(i => (i % 251).toByte)))
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false), StructField("bin", BinaryType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmpDir()
    Sinks.webDatasetShards(df, "key", dir)
    val back = WebDatasetIO.read(spark, dir).collect().sortBy(_.getString(0))
    assert(back.map(_.getAs[Array[Byte]]("bin").length).toSeq === sizes)
    back.zip(sizes).foreach { case (r, n) =>
      assert(r.getAs[Array[Byte]]("bin").toSeq ===
        Array.tabulate[Byte](n)(i => (i % 251).toByte).toSeq)
    }
  }

  test("GNU tar lists and extracts our shard (independent-implementation interop)") {
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("txt", StringType), StructField("bin", BinaryType)))
    val rows = Seq(Row("a", "alpha", Array[Byte](1, 2)), Row("b", "beta", Array[Byte](3)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmpDir()
    Sinks.webDatasetShards(df, "key", dir)
    val shard = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).head
    val listing = Seq("tar", "-tf", shard.getAbsolutePath).!!.trim.split("\n").toSeq
    assert(listing.sorted === Seq("a.bin", "a.txt", "b.bin", "b.txt"))
    val extractDir = Files.createTempDirectory("graft_wds_x_").toFile
    assert(Seq("tar", "-xf", shard.getAbsolutePath, "-C", extractDir.getAbsolutePath).! === 0)
    assert(new String(Files.readAllBytes(new java.io.File(extractDir, "a.txt").toPath), UTF_8)
      === "alpha")
    assert(Files.readAllBytes(new java.io.File(extractDir, "b.bin").toPath).toSeq
      === Seq[Byte](3))
  }

  test("GNU-tar-written archive reads back (reader interop)") {
    val src = Files.createTempDirectory("graft_wds_src_").toFile
    Files.write(new java.io.File(src, "x.txt").toPath, "from-gnu".getBytes(UTF_8))
    Files.write(new java.io.File(src, "x.bin").toPath, Array[Byte](7, 8, 9))
    val dir = tmpDir()
    Files.createDirectories(java.nio.file.Paths.get(dir))
    // --format=ustar pins the header flavor our reader implements
    assert(Seq("tar", "--format=ustar", "-cf", s"$dir/shard-00000.tar",
      "-C", src.getAbsolutePath, "x.txt", "x.bin").! === 0)
    val back = WebDatasetIO.read(spark, dir).collect()
    assert(back.length === 1)
    assert(back(0).getString(0) === "x")
    assert(new String(back(0).getAs[Array[Byte]]("txt"), UTF_8) === "from-gnu")
    assert(back(0).getAs[Array[Byte]]("bin").toSeq === Seq[Byte](7, 8, 9))
  }

  test("keys with path segments use the ustar prefix field past 100 bytes") {
    val longKey = ("d" * 60) + "/" + ("e" * 60) + "/sample-0001" // name > 100 incl. ext
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false), StructField("txt", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(longKey, "deep")), 1), schema)
    val dir = tmpDir()
    Sinks.webDatasetShards(df, "key", dir)
    val back = WebDatasetIO.read(spark, dir).collect()
    assert(back(0).getString(0) === longKey)
    assert(new String(back(0).getAs[Array[Byte]]("txt"), UTF_8) === "deep")
    // and GNU tar agrees on the reassembled name
    val shard = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).head
    assert(Seq("tar", "-tf", shard.getAbsolutePath).!!.trim === s"$longKey.txt")
  }

  test("multi-dot basenames: extension is everything after the FIRST dot") {
    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("seg.txt", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("doc1", "spanned")), 1), schema)
    val dir = tmpDir()
    Sinks.webDatasetShards(df, "key", dir)
    val back = WebDatasetIO.read(spark, dir)
    assert(back.schema.fieldNames.toSeq === Seq("key", "seg.txt"))
    assert(new String(back.collect()(0).getAs[Array[Byte]]("seg.txt"), UTF_8) === "spanned")
  }

  test("header corruption fails loud; non-bytes column rejected with hint") {
    import spark.implicits._
    val dir = tmpDir()
    Sinks.webDatasetShards(Seq(("k", "v")).toDF("key", "txt").coalesce(1), "key", dir)
    val shard = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).head
    // drop Hadoop's LocalFS .crc sidecar so the tar header checksum detects
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val bytes = Files.readAllBytes(shard.toPath)
    bytes(130) = (bytes(130) ^ 0x08).toByte // inside the size field
    Files.write(shard.toPath, bytes)
    // extension inference scans the first shard on the driver, so the
    // corrupt header is caught there, before any task launches
    val e = intercept[Exception] { WebDatasetIO.read(spark, dir).collect() }
    assert(e.toString.contains("checksum") || e.toString.contains("octal"))

    val err = intercept[IllegalArgumentException] {
      Sinks.webDatasetShards(Seq(("k", 1.5)).toDF("key", "x"), "key", tmpDir())
    }
    assert(err.getMessage.contains("binary or string"))
  }

  test("empty frame writes a valid empty shard that reads back empty") {
    import spark.implicits._
    val dir = tmpDir()
    Sinks.webDatasetShards(Seq.empty[(String, String)].toDF("key", "txt"), "key", dir)
    val shard = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).head
    assert(shard.length() === 1024) // exactly the two-zero-block trailer
    assert(Seq("tar", "-tf", shard.getAbsolutePath).!!.trim.isEmpty)
    val e = intercept[IllegalArgumentException] {
      WebDatasetIO.read(spark, dir).collect()
    }
    assert(e.getMessage.contains("infer")) // nothing to infer extensions from
    assert(WebDatasetIO.read(spark, dir, extensions = Seq("txt")).count() === 0)
  }
}
