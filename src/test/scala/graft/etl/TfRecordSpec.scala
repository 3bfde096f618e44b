package graft.etl

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.CRC32C

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** TFRecord source/sink (TfRecordIO): full type-lattice round trips,
  * CRC corruption detection, schema inference, and a DIFFERENTIAL
  * check — a test-local, independently-written Example encoder (using
  * the UNPACKED list encodings and unknown extension fields) must be
  * readable by the library decoder. */
class TfRecordSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_tfrec_spec_").toString + "/d"

  // ---- independent test-local encoder (unpacked variants on purpose)

  private def varint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v = v >>> 7 }
    out.write(v.toInt)
  }
  private def lenDelim(out: ByteArrayOutputStream, field: Int, payload: Array[Byte]): Unit = {
    varint(out, (field << 3) | 2L); varint(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
  }
  private def altFeature(kindField: Int, enc: ByteArrayOutputStream => Unit): Array[Byte] = {
    val list = new ByteArrayOutputStream(); enc(list)
    val f = new ByteArrayOutputStream(); lenDelim(f, kindField, list.toByteArray)
    f.toByteArray
  }
  private def altExample(feats: Seq[(String, Array[Byte])]): Array[Byte] = {
    val features = new ByteArrayOutputStream()
    feats.foreach { case (name, fb) =>
      val entry = new ByteArrayOutputStream()
      lenDelim(entry, 1, name.getBytes(UTF_8))
      lenDelim(entry, 2, fb)
      // an unknown varint field inside the map entry — must be skipped
      varint(entry, (9 << 3) | 0L); varint(entry, 42L)
      lenDelim(features, 1, entry.toByteArray)
    }
    val ex = new ByteArrayOutputStream()
    lenDelim(ex, 1, features.toByteArray)
    // unknown top-level length-delimited field — must be skipped
    lenDelim(ex, 7, "extension".getBytes(UTF_8))
    ex.toByteArray
  }
  private def altFrame(out: java.io.OutputStream, data: Array[Byte]): Unit = {
    def masked(b: Array[Byte]): Int = {
      val c = new CRC32C(); c.update(b, 0, b.length)
      val crc = c.getValue.toInt
      ((crc >>> 15) | (crc << 17)) + 0xa282ead8
    }
    val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(data.length.toLong).array()
    out.write(len)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(masked(len)).array())
    out.write(data)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(masked(data)).array())
  }

  // ------------------------------------------------------------- tests

  test("full lattice round trip incl. nulls, arrays, negative int64") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("f", FloatType), StructField("s", StringType),
      StructField("b", BinaryType),
      StructField("ls", ArrayType(LongType, containsNull = false)),
      StructField("fs", ArrayType(FloatType, containsNull = false)),
      StructField("ss", ArrayType(StringType, containsNull = false))))
    val rows = Seq(
      Row(Long.MinValue, -7, 1.5f, "héllo", Array[Byte](0, -1, 127),
        Seq(-1L, 0L, Long.MaxValue), Seq(0.25f, -2f), Seq("a", "ü")),
      Row(null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir()
    Sinks.tfRecordDir(df, dir)
    val back = TfRecordIO.read(spark, dir, schema).collect().sortBy(_.isNullAt(0))
    assert(back.length === 2)
    assert(back(0).getLong(0) === Long.MinValue)
    assert(back(0).getInt(1) === -7)
    assert(back(0).getFloat(2) === 1.5f)
    assert(back(0).getString(3) === "héllo")
    assert(back(0).getAs[Array[Byte]](4).toSeq === Seq[Byte](0, -1, 127))
    assert(back(0).getSeq[Long](5) === Seq(-1L, 0L, Long.MaxValue))
    assert(back(0).getSeq[Float](6) === Seq(0.25f, -2f))
    assert(back(0).getSeq[String](7) === Seq("a", "ü"))
    assert((0 to 7).forall(back(1).isNullAt))
  }

  test("multi-partition write shards one part file per non-empty partition") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v").repartition(4)
    val dir = tmpDir()
    Sinks.tfRecordDir(df, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tfrecord"))
    assert(parts.length === 4)
    val back = TfRecordIO.read(spark, dir, StructType(Seq(StructField("v", LongType))))
    assert(back.as[Long].collect().sorted.toSeq === (1L to 100L))
  }

  test("schema inference: kinds, multi-valued lists, name-sorted fields") {
    val schema = StructType(Seq(
      StructField("n", LongType), StructField("x", FloatType),
      StructField("t", StringType),
      StructField("arr", ArrayType(LongType, containsNull = false))))
    val rows = Seq(Row(1L, 2.5f, "a", Seq(1L)), Row(2L, 3.5f, "b", Seq(1L, 2L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmpDir()
    Sinks.tfRecordDir(df, dir)
    val inferred = TfRecordIO.inferSchema(spark, dir)
    // bytes infer as binary (a reader can't know UTF-8 intent); one
    // record with 2 values promotes arr to an array
    assert(inferred === StructType(Seq(
      StructField("arr", ArrayType(LongType, containsNull = false)),
      StructField("n", LongType),
      StructField("t", BinaryType),
      StructField("x", FloatType))))
    val back = SmartLoad.load(spark, dir, formatOverride = Some("tfrecord"))
    assert(back.count() === 2)
  }

  test("differential: independent unpacked encoder + unknown fields decode") {
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir))
    val out = new java.io.FileOutputStream(s"$dir/part-00000.tfrecord")
    // unpacked Int64List (repeated varints), unpacked FloatList
    // (repeated fixed32), plus unknown fields at every level
    val ex1 = altExample(Seq(
      "id" -> altFeature(3, o => { varint(o, (1 << 3) | 0L); varint(o, -5L) }),
      "score" -> altFeature(2, o => {
        varint(o, (1 << 3) | 5L)
        o.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(0.75f).array(), 0, 4)
        varint(o, (1 << 3) | 5L)
        o.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(-1f).array(), 0, 4)
      }),
      "tag" -> altFeature(1, o => lenDelim(o, 1, "free".getBytes(UTF_8)))))
    altFrame(out, ex1)
    out.close()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("score", ArrayType(FloatType, containsNull = false)),
      StructField("tag", StringType)))
    val got = TfRecordIO.read(spark, dir, schema).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === -5L)
    assert(got(0).getSeq[Float](1) === Seq(0.75f, -1f))
    assert(got(0).getString(2) === "free")
  }

  test("corruption in data or length is detected by CRC, loud") {
    import spark.implicits._
    val dir = tmpDir()
    Sinks.tfRecordDir(Seq((1L, "payload-payload")).toDF("k", "v").coalesce(1), dir)
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tfrecord")).head
    // drop Hadoop's LocalFS .crc sidecar so OUR frame CRCs do the detecting
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val bytes = Files.readAllBytes(part.toPath)
    bytes(bytes.length - 6) = (bytes(bytes.length - 6) ^ 0x40).toByte // inside data
    Files.write(part.toPath, bytes)
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val e = intercept[org.apache.spark.SparkException] {
      TfRecordIO.read(spark, dir, schema).collect()
    }
    assert(e.getMessage.contains("CRC mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("CRC mismatch")))

    bytes(3) = (bytes(3) ^ 0x01).toByte // inside the length field
    Files.write(part.toPath, bytes)
    val e2 = intercept[org.apache.spark.SparkException] {
      TfRecordIO.read(spark, dir, schema).collect()
    }
    assert(e2.toString.contains("CRC") || e2.toString.contains("implausible"))
  }

  test("empty frame round-trips; double is rejected with a cast hint") {
    import spark.implicits._
    val dir = tmpDir()
    Sinks.tfRecordDir(Seq.empty[(Long, String)].toDF("k", "v"), dir)
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    assert(TfRecordIO.read(spark, dir, schema).count() === 0)

    val err = intercept[IllegalArgumentException] {
      Sinks.tfRecordDir(Seq((1L, 2.5d)).toDF("k", "d"), tmpDir())
    }
    assert(err.getMessage.contains("float32"))
  }
}
