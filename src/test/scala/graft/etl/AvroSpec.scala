package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro OCF source/sink (AvroIO): type-lattice round trips, nulls,
  * multi-part directories, schema mapping edges, loud failures. */
class AvroSpec extends SparkTestBase {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_spec_").toString + "/d"

  test("primitive round trip incl. nulls in every column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2), Some(true), Some(1.5d), Some(2.5f), Some("x")),
      (2L, None, None, None, None, None))
      .toDF("l", "i", "b", "d", "f", "s")
    val dir = tmpDir()
    Sinks.avroDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("avro"))
    assert(back.schema === df.schema)
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("date, timestamp (micros), decimal, binary round trip exactly") {
    val schema = StructType(Seq(
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("dec", DecimalType(12, 4)), StructField("bin", BinaryType)))
    val ts = java.sql.Timestamp.valueOf("2024-05-06 07:08:09.123456")
    val rows = Seq(
      Row(java.sql.Date.valueOf("2024-05-06"), ts,
        new java.math.BigDecimal("12345678.9012"), Array[Byte](1, 2, -3)),
      Row(null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmpDir()
    Sinks.avroDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("avro")).collect()
      .sortBy(r => r.isNullAt(0))
    assert(back(0).getDate(0) === java.sql.Date.valueOf("2024-05-06"))
    assert(back(0).getTimestamp(1) === ts)
    assert(back(0).getDecimal(2) === new java.math.BigDecimal("12345678.9012"))
    assert(back(0).getAs[Array[Byte]](3).toSeq === Seq[Byte](1, 2, -3))
    assert((0 to 3).forall(back(1).isNullAt))
  }

  test("nested struct, array, and string-keyed map round trip") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("st", StructType(Seq(
        StructField("a", StringType), StructField("n", IntegerType)))),
      StructField("xs", ArrayType(LongType, containsNull = true)),
      StructField("m", MapType(StringType, DoubleType, valueContainsNull = true))))
    val rows = Seq(
      Row(1L, Row("in", 7), Seq(1L, 2L, 3L), Map("k" -> 1.5, "z" -> 2.5)),
      Row(2L, null, Seq.empty[Long], Map.empty[String, Double]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir()
    Sinks.avroDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("avro"))
    assert(back.schema("st").dataType === schema("st").dataType)
    val got = back.collect().sortBy(_.getLong(0))
    assert(got(0).getStruct(1) === Row("in", 7))
    assert(got(0).getSeq[Long](2) === Seq(1L, 2L, 3L))
    assert(got(0).getMap[String, Double](3) === Map("k" -> 1.5, "z" -> 2.5))
    assert(got(1).isNullAt(1) && got(1).getSeq[Long](2).isEmpty)
  }

  test("timestamp_ntz round-trips through local-timestamp-micros") {
    val schema = StructType(Seq(StructField("ntz", TimestampNTZType)))
    val ldt = java.time.LocalDateTime.of(2024, 5, 6, 7, 8, 9, 123456000)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(ldt), Row(null)), 1), schema)
    val dir = tmpDir()
    Sinks.avroDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("avro"))
    assert(back.schema.head.dataType === TimestampNTZType)
    val got = back.collect().sortBy(_.isNullAt(0))
    assert(got(0).getAs[java.time.LocalDateTime](0) === ldt)
    assert(got(1).isNullAt(0))
  }

  test("multi-partition write makes one part per non-empty partition; read unions all") {
    import spark.implicits._
    val df = (1L to 100L).toDF("v").repartition(8)
    val dir = tmpDir()
    Sinks.avroDir(df, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(parts.length > 1 && parts.length <= 8)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("avro"))
    assert(back.count() === 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) === 5050L)
  }

  test("empty frame round-trips schema through an empty container file") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("a", "b")
    val dir = tmpDir()
    Sinks.avroDir(df, dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("avro"))
    assert(back.schema === df.schema)
    assert(back.count() === 0)
  }

  test("overwrite: second write replaces the first entirely") {
    import spark.implicits._
    val dir = tmpDir()
    Sinks.avroDir((1L to 50L).toDF("v").repartition(6), dir)
    Sinks.avroDir(Seq(7L).toDF("v"), dir)
    val back = SmartLoad.load(spark, dir, formatOverride = Some("avro"))
    assert(back.collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test(".avro extension dispatches without an override") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_ext_").toString + "/t.avro"
    Sinks.avroDir(Seq((1L, "a")).toDF("k", "s"), dir)
    assert(SmartLoad.load(spark, dir).count() === 1)
  }

  test("unsupported shapes fail loud both directions") {
    import spark.implicits._
    // write: calendar-interval-free but map with non-string keys
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Map(1 -> "x")))),
      StructType(Seq(StructField("m", MapType(IntegerType, StringType)))))
    val e1 = intercept[IllegalArgumentException](AvroIO.avroType(bad.schema("m").dataType))
    assert(e1.getMessage.contains("unsupported"))
    // read: multi-branch non-null union is out of scope
    val u = org.apache.avro.SchemaBuilder.unionOf()
      .intType().and().stringType().endUnion()
    val rec = org.apache.avro.SchemaBuilder.record("r").fields()
      .name("u").`type`(u).noDefault().endRecord()
    val e2 = intercept[IllegalArgumentException](AvroIO.sparkType(rec))
    assert(e2.getMessage.contains("union"))
  }
}
