package graft.etl

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalType, LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File source + sink built directly on the
  * `org.apache.avro` core library (no connector module needed).
  *
  * Read is DISTRIBUTED: the driver opens ONE file header to learn the
  * schema (first file in name order — later files are decoded against
  * it via Avro schema resolution, so compatible writer-schema drift
  * across part files is tolerated); decoding then runs per-file on
  * executors over `binaryFiles`. Parallelism is one task per file —
  * the natural grain for directory-of-part-files layouts this sink
  * produces. Codec support (null/deflate/snappy/...) comes from
  * Avro's `CodecFactory` against libraries already on the classpath.
  *
  * Write is per-partition through the Hadoop `FileSystem` API (one
  * `part-NNNNN.avro` per non-empty partition), so the same code path
  * targets local disk and any Hadoop-API filesystem.
  *
  * Type mapping (both directions, loud failure outside it):
  * boolean/int/long/float/double/string/bytes, nullable as
  * `union(null, T)`, nested records, arrays, string-keyed maps, and
  * the logical types date (int), timestamp-millis/micros (long),
  * local-timestamp-millis/micros (long, maps to TimestampNTZ), and
  * decimal (bytes). Read-only extras: enum -> string, fixed ->
  * binary, int -> IntegerType (written back as int).
  *
  * Reference scope: the reference app loads CSV/Excel/JSON uploads
  * (main.py:69-94); Avro is the row-oriented interchange sibling a
  * pipeline tool meets at warehouse boundaries.
  */
object AvroIO {

  // ---------------------------------------------------------------- read

  def read(spark: SparkSession, path: String): DataFrame = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(hadoopConf)
    val status = fs.getFileStatus(root)
    val files =
      if (status.isDirectory)
        fs.listStatus(root).map(_.getPath).filter(_.getName.endsWith(".avro")).sortBy(_.getName)
      else Array(root)
    require(files.nonEmpty, s"no .avro files under $path")

    val readerSchema = {
      val in = fs.open(files.head)
      try {
        val s = new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema
        s
      } finally in.close()
    }
    val structType = sparkType(readerSchema) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"top-level Avro type must be a record, got $other")
    }
    val schemaJson = readerSchema.toString

    val fileList = files.map(_.toString)
    val rdd = spark.sparkContext
      .binaryFiles(fileList.mkString(","))
      .flatMap { case (_, pds) =>
        val expected = new Schema.Parser().parse(schemaJson)
        val stream = new DataFileStream(pds.open(), new GenericDatumReader[GenericRecord](expected))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = stream.hasNext
            if (!h) stream.close()
            h
          }
          def next(): Row = toRow(stream.next(), expected)
        }
      }
    spark.createDataFrame(rdd, structType)
  }

  /** Avro schema -> Spark type. Fails loud outside the supported set. */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (isLogical(s, "date")) DateType else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros => TimestampType
      case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
        TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map { f =>
        val (t, nullable) = unwrapUnion(f.schema())
        StructField(f.name(), sparkType(t), nullable)
      }.toArray)
    case Schema.Type.ARRAY =>
      val (t, nullable) = unwrapUnion(s.getElementType)
      ArrayType(sparkType(t), containsNull = nullable)
    case Schema.Type.MAP =>
      val (t, nullable) = unwrapUnion(s.getValueType)
      MapType(StringType, sparkType(t), valueContainsNull = nullable)
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type: $other in $s")
  }

  private def isLogical(s: Schema, name: String): Boolean =
    Option(s.getLogicalType).exists(_.getName == name)

  /** `union(null, T)` -> (T, nullable); bare T -> (T, false). Any other
    * union shape is out of scope and fails loud. */
  private def unwrapUnion(s: Schema): (Schema, Boolean) =
    if (s.getType != Schema.Type.UNION) (s, false)
    else s.getTypes.asScala.toList match {
      case a :: b :: Nil if a.getType == Schema.Type.NULL => (b, true)
      case a :: b :: Nil if b.getType == Schema.Type.NULL => (a, true)
      case _ => throw new IllegalArgumentException(
        s"only union(null, T) is supported, got $s")
    }

  private def toRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.map { f =>
      val (t, _) = unwrapUnion(f.schema())
      fromAvro(rec.get(f.pos()), t)
    }.toSeq)

  private def fromAvro(v: Any, s: Schema): Any = v match {
    case null => null
    case _ => s.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        val bytes = v match {
          case bb: java.nio.ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case gf: GenericData.Fixed => gf.bytes()
          case b: Array[Byte] => b
        }
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case Schema.Type.INT if isLogical(s, "date") =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case Schema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis =>
          new java.sql.Timestamp(v.asInstanceOf[Long])
        case _: LogicalTypes.TimestampMicros =>
          val micros = v.asInstanceOf[Long]
          val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          ts
        case _: LogicalTypes.LocalTimestampMillis =>
          val ms = v.asInstanceOf[Long]
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(ms, 1000L),
            (Math.floorMod(ms, 1000L) * 1000000L).toInt, java.time.ZoneOffset.UTC)
        case _: LogicalTypes.LocalTimestampMicros =>
          val micros = v.asInstanceOf[Long]
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        case _ => v
      }
      case Schema.Type.RECORD => toRow(v.asInstanceOf[GenericRecord], s)
      case Schema.Type.ARRAY =>
        val (et, _) = unwrapUnion(s.getElementType)
        v.asInstanceOf[java.util.Collection[Any]].asScala.map(fromAvro(_, et)).toSeq
      case Schema.Type.MAP =>
        val (vt, _) = unwrapUnion(s.getValueType)
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, x) => (k.toString, fromAvro(x, vt))
        }.toMap
      case _ => v // boolean / int / long / float / double
    }
  }

  // --------------------------------------------------------------- write

  /** Write one `part-NNNNN.avro` per non-empty partition under
    * `outDir` (created fresh; existing contents removed). An empty
    * frame still writes one empty file so the schema round-trips. */
  def write(df: DataFrame, outDir: String): Unit = {
    val spark = df.sparkSession
    val avroSchema = avroType(df.schema)
    val schemaJson = avroSchema.toString
    val root = new HPath(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(root, true)
    fs.mkdirs(root)

    val sparkSchema = df.schema
    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val part = new HPath(outDir, f"part-${TaskContext.getPartitionId()}%05d.avro")
        val pfs = part.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = pfs.create(part, true)
        val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, out)
        try rows.foreach(r => writer.append(toAvro(r, sparkSchema, schema).asInstanceOf[GenericRecord]))
        finally writer.close() // closes `out`
      }
    }
    if (fs.listStatus(root).isEmpty) {
      val out = fs.create(new HPath(root, "part-00000.avro"), true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
      writer.create(avroSchema, out)
      writer.close()
    }
  }

  /** Spark type -> Avro schema; nullable fields become union(null, T). */
  def avroType(t: DataType): Schema = t match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case st: StructType =>
      val b = SchemaBuilder.record(s"graft_record_${Math.abs(st.hashCode())}")
        .namespace("graft.avro").fields()
      st.fields.foldLeft(b) { (acc, f) =>
        val base = avroType(f.dataType)
        if (f.nullable)
          acc.name(f.name)
            .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
            .withDefault(null)
        else acc.name(f.name).`type`(base).noDefault()
      }.endRecord()
    case ArrayType(et, containsNull) =>
      val base = avroType(et)
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base)
    case MapType(StringType, vt, valueContainsNull) =>
      val base = avroType(vt)
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base)
    case other =>
      throw new IllegalArgumentException(s"unsupported Spark type for Avro sink: $other")
  }

  private def toAvro(v: Any, t: DataType, s: Schema): Any = {
    if (v == null) return null
    val (target, _) = unwrapUnion(s)
    (t, v) match {
      case (st: StructType, r: Row) =>
        val rec = new GenericData.Record(target)
        var i = 0
        while (i < st.fields.length) {
          rec.put(i, toAvro(r.get(i), st.fields(i).dataType, target.getFields.get(i).schema()))
          i += 1
        }
        rec
      case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
      case (TimestampType, ts: java.sql.Timestamp) =>
        Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) + ts.getNanos / 1000L
      case (TimestampType, it: java.time.Instant) =>
        Math.multiplyExact(it.getEpochSecond, 1000000L) + it.getNano / 1000L
      case (TimestampNTZType, ldt: java.time.LocalDateTime) =>
        Math.multiplyExact(ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
          ldt.getNano / 1000L
      case (_: DecimalType, d: java.math.BigDecimal) =>
        java.nio.ByteBuffer.wrap(d.unscaledValue().toByteArray)
      case (_: DecimalType, d: scala.math.BigDecimal) =>
        java.nio.ByteBuffer.wrap(d.underlying().unscaledValue().toByteArray)
      case (BinaryType, b: Array[Byte]) => java.nio.ByteBuffer.wrap(b)
      case (ArrayType(et, _), xs: scala.collection.Seq[Any @unchecked]) =>
        xs.map(toAvro(_, et, target.getElementType)).asJava
      case (MapType(StringType, vt, _), m: scala.collection.Map[String @unchecked, Any @unchecked]) =>
        m.map { case (k, x) => (k, toAvro(x, vt, target.getValueType)) }.asJava
      case (ShortType, x: Short) => x.toInt
      case (ByteType, x: Byte) => x.toInt
      case _ => v // boolean / int / long / float / double / string
    }
  }
}
