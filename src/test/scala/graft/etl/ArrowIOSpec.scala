package graft.etl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Arrow IPC / Feather v2 source+sink (ArrowIO): type-lattice round
  * trips, nulls, bounded multi-batch parts, empty-frame schema
  * round-trip, loud failures — and INTEROP both directions against
  * pyarrow (an independent implementation as the oracle, the
  * WebDataset GNU-tar precedent). */
class ArrowIOSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_arrow_spec_").toString + "/d"

  private def python(script: String): (Int, String) = {
    val f = Files.createTempFile("graft_arrow_py_", ".py")
    Files.write(f, script.getBytes(UTF_8))
    val pb = new ProcessBuilder("python3", f.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    (p.waitFor(), out)
  }

  private lazy val pyarrowAvailable: Boolean =
    python("import pyarrow")._1 == 0

  test("primitive round trip incl. nulls in every column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2), Some(true), Some(1.5d), Some(2.5f), Some("héllo")),
      (2L, None, None, None, None, None))
      .toDF("l", "i", "b", "d", "f", "s")
    val dir = tmpDir()
    Sinks.arrowDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("arrow"))
    assert(back.schema === df.schema)
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("date, timestamp (us, tz + ntz), decimal128, binary round trip exactly") {
    val schema = StructType(Seq(
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("ntz", TimestampNTZType),
      StructField("dec", DecimalType(12, 4)), StructField("bin", BinaryType)))
    val ts = java.sql.Timestamp.valueOf("2024-05-06 07:08:09.123456")
    val ldt = java.time.LocalDateTime.of(2024, 5, 6, 7, 8, 9, 123456000)
    val rows = Seq(
      Row(java.sql.Date.valueOf("2024-05-06"), ts, ldt,
        new java.math.BigDecimal("12345678.9012"), Array[Byte](1, 2, -3)),
      Row(null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmpDir()
    Sinks.arrowDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("arrow"))
    assert(back.schema === schema)
    val got = back.collect().sortBy(r => r.isNullAt(0))
    assert(got(0).getDate(0) === java.sql.Date.valueOf("2024-05-06"))
    assert(got(0).getTimestamp(1) === ts)
    assert(got(0).getAs[java.time.LocalDateTime](2) === ldt)
    assert(got(0).getDecimal(3) === new java.math.BigDecimal("12345678.9012"))
    assert(got(0).getAs[Array[Byte]](4).toSeq === Seq[Byte](1, 2, -3))
    assert((0 to 4).forall(got(1).isNullAt))
  }

  test("multi-batch parts: batchRows smaller than the partition round-trips all rows") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(3)
    val dir = tmpDir()
    Sinks.arrowDir(df, dir, batchRows = 7)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("arrow"))
    assert(back.count() === 1000L)
    assert(back.as[(Long, String)].collect().toSet ===
      (1 to 1000).map(i => (i.toLong, s"row$i")).toSet)
    // one file per non-empty partition
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(parts.length === 3)
  }

  test("empty frame writes one zero-batch file and the schema round-trips") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val dir = tmpDir()
    Sinks.arrowDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("arrow"))
    assert(back.schema === df.schema)
    assert(back.count() === 0L)
  }

  test("loud failure on nested types and on non-arrow directories") {
    import spark.implicits._
    val nested = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    val err = intercept[IllegalArgumentException] {
      Sinks.arrowDir(nested, tmpDir())
    }
    assert(err.getMessage.contains("unsupported Spark type"))
    val empty = tmpDir()
    new java.io.File(empty).mkdirs()
    val e2 = intercept[IllegalArgumentException] {
      ArrowIO.read(spark, empty)
    }
    assert(e2.getMessage.contains("no .arrow"))
  }

  test("interop: pyarrow reads our file byte-for-byte (values, schema, nulls)") {
    assume(pyarrowAvailable, "pyarrow not available on PATH")
    import spark.implicits._
    val df = Seq(
      (1L, Some("alpha"), Some(1.5)),
      (2L, None, None),
      (3L, Some("gamma"), Some(-2.25)))
      .toDF("id", "name", "score").coalesce(1)
    val dir = tmpDir()
    Sinks.arrowDir(df, dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow")).head
    val (rc, out) = python(
      s"""import pyarrow.ipc as ipc
         |t = ipc.open_file(r'${part.getAbsolutePath}').read_all()
         |print(t.schema.names)
         |print([t.column('id')[i].as_py() for i in range(t.num_rows)])
         |print([t.column('name')[i].as_py() for i in range(t.num_rows)])
         |print([t.column('score')[i].as_py() for i in range(t.num_rows)])
         |""".stripMargin)
    assert(rc === 0, out)
    val lines = out.trim.split("\n")
    assert(lines(0) === "['id', 'name', 'score']")
    assert(lines(1) === "[1, 2, 3]")
    assert(lines(2) === "['alpha', None, 'gamma']")
    assert(lines(3) === "[1.5, None, -2.25]")
  }

  test("interop: we read a file written by pyarrow (independent implementation)") {
    assume(pyarrowAvailable, "pyarrow not available on PATH")
    val dir = tmpDir()
    new java.io.File(dir).mkdirs()
    val (rc, out) = python(
      s"""import pyarrow as pa, pyarrow.ipc as ipc, datetime, decimal
         |t = pa.table({
         |  'id': pa.array([10, 20, None], type=pa.int64()),
         |  'name': pa.array(['a', None, 'c'], type=pa.string()),
         |  'x': pa.array([0.5, None, 2.5], type=pa.float64()),
         |  'flag': pa.array([True, False, None], type=pa.bool_()),
         |  'd': pa.array([datetime.date(2024, 1, 2), None, datetime.date(1969, 12, 31)],
         |                type=pa.date32()),
         |  'ts': pa.array([datetime.datetime(2024, 1, 2, 3, 4, 5, 678901), None, None],
         |                 type=pa.timestamp('us', tz='UTC')),
         |  'dec': pa.array([decimal.Decimal('12.3456'), None, decimal.Decimal('-0.0001')],
         |                  type=pa.decimal128(10, 4)),
         |  'bin': pa.array([b'xy', None, b''], type=pa.binary()),
         |})
         |with ipc.new_file(r'$dir/pa.arrow', t.schema) as w:
         |  w.write_table(t, max_chunksize=2)  # force 2 record batches
         |print('ok')
         |""".stripMargin)
    assert(rc === 0, out)
    val back = ArrowIO.read(spark, dir)
    assert(back.schema.fieldNames.toSeq ===
      Seq("id", "name", "x", "flag", "d", "ts", "dec", "bin"))
    assert(back.schema("dec").dataType === DecimalType(10, 4))
    val rows = back.collect().sortBy(r => Option(r.get(0)).map(_.asInstanceOf[Long]).getOrElse(Long.MaxValue))
    assert(rows.length === 3)
    assert(rows(0).getLong(0) === 10L && rows(0).getString(1) === "a")
    assert(rows(0).getBoolean(3) === true)
    assert(rows(0).getDate(4) === java.sql.Date.valueOf("2024-01-02"))
    assert(rows(0).getTimestamp(5) ===
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05.678901"))
    assert(rows(0).getDecimal(6) === new java.math.BigDecimal("12.3456"))
    assert(rows(0).getAs[Array[Byte]](7).toSeq === "xy".getBytes(UTF_8).toSeq)
    assert(rows(1).getLong(0) === 20L && rows(1).isNullAt(1) && rows(1).isNullAt(5))
    assert(rows(2).isNullAt(0) && rows(2).getString(1) === "c")
    assert(rows(2).getDecimal(6) === new java.math.BigDecimal("-0.0001"))
    assert(rows(2).getAs[Array[Byte]](7).toSeq === Seq.empty[Byte])
  }

  test("zstd write: our compressed file round-trips AND pyarrow reads it") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, "payload-" * 20 + i)).toDF("id", "s")
      .coalesce(1)
    val plain = tmpDir(); val zstd = tmpDir()
    Sinks.arrowDir(df, plain)
    Sinks.arrowDir(df, zstd, compression = Some("zstd"))
    val back = SmartLoad.load(spark, zstd, formatOverride = Some("arrow"))
    assert(back.count() === 500L)
    assert(back.where("id = 123").head().getString(1).endsWith("123"))
    // compression actually engaged: repetitive payload must shrink
    def size(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".arrow")).map(_.length()).sum
    assert(size(zstd) < size(plain) / 2, s"${size(zstd)} vs ${size(plain)}")
    if (pyarrowAvailable) {
      val part = new java.io.File(zstd).listFiles()
        .filter(_.getName.endsWith(".arrow")).head
      val (rc, out) = python(
        s"""import pyarrow.ipc as ipc
           |t = ipc.open_file(r'${part.getAbsolutePath}').read_all()
           |print(t.num_rows, t.column('id')[499].as_py())
           |""".stripMargin)
      assert(rc === 0, out)
      assert(out.trim === "500 500")
    }
    intercept[IllegalArgumentException] {
      Sinks.arrowDir(df, tmpDir(), compression = Some("gzip"))
    }
  }

  test("interop: pyarrow-compressed file (zstd) reads via the bundled codec factory") {
    assume(pyarrowAvailable, "pyarrow not available on PATH")
    val dir = tmpDir()
    new java.io.File(dir).mkdirs()
    val (rc, out) = python(
      s"""import pyarrow as pa, pyarrow.ipc as ipc
         |t = pa.table({'id': pa.array(range(100), type=pa.int64()),
         |              's': pa.array(['v%d' % i for i in range(100)])})
         |opts = ipc.IpcWriteOptions(compression='zstd')
         |with ipc.new_file(r'$dir/z.arrow', t.schema, options=opts) as w:
         |  w.write_table(t)
         |print('ok')
         |""".stripMargin)
    assert(rc === 0, out)
    val back = ArrowIO.read(spark, dir)
    assert(back.count() === 100L)
    assert(back.where("id = 42").head().getString(1) === "v42")
  }
}
