package graft.etl

import java.nio.channels.{Channels, SeekableByteChannel}
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC file (a.k.a. Feather v2) source + sink built directly on
  * the `arrow-vector` core library Spark already ships (no connector
  * module) — the zero-copy interchange format pandas / polars /
  * pyarrow / DuckDB speak natively, and the container format
  * LLM-data tooling increasingly exchanges alongside parquet.
  *
  * Read is DISTRIBUTED and STREAMING: the driver reads ONE file's
  * footer for the schema (files after the first must match it — the
  * IPC file format carries a single schema per file); decoding then
  * runs one task per file over a SEEKABLE Hadoop input channel, so a
  * file is never buffered whole — record batches load one at a time
  * (the format's own memory grain, bounded by the writer's batch
  * size). LZ4/ZSTD buffer compression is handled transparently via
  * the bundled commons-compression codec factory.
  *
  * Write is per-partition through the Hadoop `FileSystem` API (one
  * `part-NNNNN.arrow` per non-empty partition), batching `batchRows`
  * rows per record batch so writer memory stays bounded regardless of
  * partition size.
  *
  * Type mapping (both directions, loud failure outside it):
  * boolean / int8 / int16 / int32 / int64 / float32 / float64 / utf8
  * / binary, nullable via the validity bitmap, date32(day),
  * timestamp(us, tz) -> TimestampType, timestamp(us) -> TimestampNTZ,
  * decimal128. Dictionary-encoded columns and nested types are out of
  * scope for this face and fail loud.
  *
  * Reference scope: the reference app loads CSV/Excel/JSON uploads
  * (main.py:69-94); Arrow IPC is the columnar interchange sibling a
  * pipeline tool meets at dataframe-library boundaries.
  */
object ArrowIO {

  /** Minimal seekable channel over a Hadoop stream — what
    * ArrowFileReader needs to hop footer -> schema -> batch offsets
    * without buffering the file. */
  private final class HadoopSeekableChannel(in: FSDataInputStream, len: Long)
      extends SeekableByteChannel {
    private var closed = false
    override def read(dst: java.nio.ByteBuffer): Int = {
      val buf = new Array[Byte](dst.remaining())
      val n = in.read(buf, 0, buf.length)
      if (n > 0) dst.put(buf, 0, n)
      n
    }
    override def position(): Long = in.getPos
    override def position(p: Long): SeekableByteChannel = { in.seek(p); this }
    override def size(): Long = len
    override def write(src: java.nio.ByteBuffer): Int =
      throw new UnsupportedOperationException("read-only channel")
    override def truncate(s: Long): SeekableByteChannel =
      throw new UnsupportedOperationException("read-only channel")
    override def isOpen: Boolean = !closed
    override def close(): Unit = { closed = true; in.close() }
  }

  // ---------------------------------------------------------------- read

  def read(spark: SparkSession, path: String): DataFrame = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(hadoopConf)
    val status = fs.getFileStatus(root)
    val files =
      if (status.isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.endsWith(".arrow") || p.getName.endsWith(".feather"))
          .sortBy(_.getName)
      else Array(root)
    require(files.nonEmpty, s"no .arrow/.feather files under $path")

    val structType = {
      val allocator = new RootAllocator()
      val st = fs.getFileStatus(files.head)
      val ch = new HadoopSeekableChannel(fs.open(files.head), st.getLen)
      val reader = new ArrowFileReader(ch, allocator, CommonsCompressionFactory.INSTANCE)
      try sparkSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); allocator.close() }
    }

    val fileList = files.map(_.toString)
    val rdd = spark.sparkContext
      .parallelize(fileList.toIndexedSeq, fileList.length)
      .flatMap { file =>
        val p = new HPath(file)
        val pfs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val st = pfs.getFileStatus(p)
        val allocator = new RootAllocator()
        val ch = new HadoopSeekableChannel(pfs.open(p), st.getLen)
        val reader = new ArrowFileReader(ch, allocator, CommonsCompressionFactory.INSTANCE)
        val vroot = reader.getVectorSchemaRoot
        require(vroot.getSchema.getFields.size == structType.fields.length,
          s"$file: schema width differs from ${fileList.head}")
        new Iterator[Row] {
          private var batchRows = 0
          private var i = 0
          private var done = false
          private def advance(): Unit =
            while (!done && i >= batchRows) {
              if (reader.loadNextBatch()) { batchRows = vroot.getRowCount; i = 0 }
              else { done = true; reader.close(); allocator.close() }
            }
          def hasNext: Boolean = { advance(); !done }
          def next(): Row = {
            advance()
            val vals = new Array[Any](structType.fields.length)
            var c = 0
            while (c < vals.length) {
              vals(c) = readValue(vroot.getVector(c), i)
              c += 1
            }
            i += 1
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, structType)
  }

  /** Arrow schema -> Spark schema. Fails loud outside the flat
    * primitive/string/binary/temporal/decimal set. */
  def sparkSchema(s: ArrowSchema): StructType =
    StructType(s.getFields.asScala.map { f =>
      require(f.getDictionary == null,
        s"dictionary-encoded column '${f.getName}' is not supported")
      require(f.getChildren.isEmpty,
        s"nested column '${f.getName}' is not supported")
      StructField(f.getName, sparkType(f.getType, f.getName), f.isNullable)
    }.toArray)

  private def sparkType(t: ArrowType, name: String): DataType = t match {
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int if i.getIsSigned => i.getBitWidth match {
      case 8 => ByteType
      case 16 => ShortType
      case 32 => IntegerType
      case 64 => LongType
      case w => throw new IllegalArgumentException(s"int$w column '$name' unsupported")
    }
    case f: ArrowType.FloatingPoint => f.getPrecision match {
      case FloatingPointPrecision.SINGLE => FloatType
      case FloatingPointPrecision.DOUBLE => DoubleType
      case p => throw new IllegalArgumentException(s"float($p) column '$name' unsupported")
    }
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Binary => BinaryType
    case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
    case ts: ArrowType.Timestamp if ts.getUnit == TimeUnit.MICROSECOND =>
      if (ts.getTimezone != null) TimestampType else TimestampNTZType
    case d: ArrowType.Decimal if d.getBitWidth == 128 =>
      DecimalType(d.getPrecision, d.getScale)
    case other =>
      throw new IllegalArgumentException(s"unsupported Arrow type $other for column '$name'")
  }

  private def readValue(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case b: BitVector => b.get(i) == 1
      case b: TinyIntVector => b.get(i)
      case b: SmallIntVector => b.get(i)
      case b: IntVector => b.get(i)
      case b: BigIntVector => b.get(i)
      case b: Float4Vector => b.get(i)
      case b: Float8Vector => b.get(i)
      case b: VarCharVector => new String(b.get(i), UTF_8)
      case b: VarBinaryVector => b.get(i)
      case b: DateDayVector => java.time.LocalDate.ofEpochDay(b.get(i).toLong)
      case b: TimeStampMicroTZVector =>
        val us = b.get(i)
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L)
      case b: TimeStampMicroVector =>
        val us = b.get(i)
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case b: DecimalVector => b.getObject(i)
      case other =>
        throw new IllegalArgumentException(s"unsupported vector ${other.getClass.getName}")
    }

  // --------------------------------------------------------------- write

  /** Write one `part-NNNNN.arrow` per non-empty partition under
    * `outDir` (created fresh), `batchRows` rows per record batch. An
    * empty frame still writes one zero-batch file so the schema
    * round-trips. `compression` (None | "zstd" | "lz4") turns on IPC
    * buffer compression via the bundled commons-compression codecs —
    * the IO-bound-sink knob at scale; readers (ours and pyarrow's)
    * decompress transparently. */
  def write(df: DataFrame, outDir: String, batchRows: Int = 4096,
      compression: Option[String] = None): Unit = {
    require(batchRows >= 1, s"batchRows must be positive: $batchRows")
    codecType(compression) // validate on the driver before launching
    val spark = df.sparkSession
    val sparkStruct = df.schema
    arrowSchema(sparkStruct) // validate on the driver before launching
    val root = new HPath(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(root, true)
    fs.mkdirs(root)

    df.rdd.foreachPartition { rows =>
      if (rows.hasNext)
        writePart(rows, sparkStruct,
          new HPath(outDir, f"part-${TaskContext.getPartitionId()}%05d.arrow"),
          batchRows, compression)
    }
    if (fs.listStatus(root).isEmpty)
      writePart(Iterator.empty, sparkStruct, new HPath(root, "part-00000.arrow"),
        batchRows, compression)
  }

  private def codecType(compression: Option[String])
      : org.apache.arrow.vector.compression.CompressionUtil.CodecType = {
    import org.apache.arrow.vector.compression.CompressionUtil.CodecType
    compression.map(_.toLowerCase(java.util.Locale.ROOT)) match {
      case None => CodecType.NO_COMPRESSION
      case Some("zstd") => CodecType.ZSTD
      case Some("lz4") => CodecType.LZ4_FRAME
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported Arrow IPC compression '$other' (use zstd or lz4)")
    }
  }

  private def writePart(rows: Iterator[Row], st: StructType, part: HPath,
      batchRows: Int, compression: Option[String]): Unit = {
    val pfs = part.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val allocator = new RootAllocator()
    val vroot = VectorSchemaRoot.create(arrowSchema(st), allocator)
    val out = pfs.create(part, true)
    // the commons codec factory rejects NO_COMPRESSION — plain writer there
    val writer =
      if (compression.isEmpty)
        new ArrowFileWriter(vroot, null, Channels.newChannel(out))
      else
        new ArrowFileWriter(vroot, null, Channels.newChannel(out),
          null, org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          CommonsCompressionFactory.INSTANCE, codecType(compression),
          java.util.Optional.empty[Integer]())
    try {
      writer.start()
      while (rows.hasNext) {
        vroot.allocateNew()
        var n = 0
        while (n < batchRows && rows.hasNext) {
          val r = rows.next()
          var c = 0
          while (c < st.fields.length) {
            writeValue(vroot.getVector(c), n, r.get(c), st.fields(c).dataType)
            c += 1
          }
          n += 1
        }
        vroot.setRowCount(n)
        writer.writeBatch()
      }
      writer.end()
    } finally {
      writer.close() // closes `out`
      vroot.close()
      allocator.close()
    }
  }

  /** Spark schema -> Arrow schema. Fails loud outside the flat set. */
  def arrowSchema(st: StructType): ArrowSchema =
    new ArrowSchema(st.fields.map { f =>
      new Field(f.name, new FieldType(f.nullable, arrowType(f.dataType, f.name), null),
        java.util.Collections.emptyList[Field])
    }.toList.asJava)

  private def arrowType(t: DataType, name: String): ArrowType = t match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case ByteType => new ArrowType.Int(8, true)
    case ShortType => new ArrowType.Int(16, true)
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case DateType => new ArrowType.Date(DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
    case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
    case other =>
      throw new IllegalArgumentException(s"unsupported Spark type for Arrow sink: $other ('$name')")
  }

  private def writeValue(v: FieldVector, i: Int, value: Any, t: DataType): Unit =
    if (value == null) v match {
      case b: BaseFixedWidthVector => b.setNull(i)
      case b: BaseVariableWidthVector => b.setNull(i)
      case other => throw new IllegalArgumentException(
        s"unsupported vector ${other.getClass.getName}")
    } else v match {
      case b: BitVector => b.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case b: TinyIntVector => b.setSafe(i, value.asInstanceOf[Byte].toInt)
      case b: SmallIntVector => b.setSafe(i, value.asInstanceOf[Short].toInt)
      case b: IntVector => b.setSafe(i, value.asInstanceOf[Int])
      case b: BigIntVector => b.setSafe(i, value.asInstanceOf[Long])
      case b: Float4Vector => b.setSafe(i, value.asInstanceOf[Float])
      case b: Float8Vector => b.setSafe(i, value.asInstanceOf[Double])
      case b: VarCharVector => b.setSafe(i, value.asInstanceOf[String].getBytes(UTF_8))
      case b: VarBinaryVector => b.setSafe(i, value.asInstanceOf[Array[Byte]])
      case b: DateDayVector => b.setSafe(i, (value match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
      }).toInt)
      case b: TimeStampMicroTZVector => b.setSafe(i, toMicros(value))
      case b: TimeStampMicroVector => b.setSafe(i, value match {
        case ldt: java.time.LocalDateTime =>
          Math.multiplyExact(ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
            ldt.getNano / 1000L
        case other => toMicros(other)
      })
      case b: DecimalVector =>
        val bd = value match {
          case d: java.math.BigDecimal => d
          case d: scala.math.BigDecimal => d.underlying()
        }
        b.setSafe(i, bd.setScale(b.getScale))
      case other =>
        throw new IllegalArgumentException(s"unsupported vector ${other.getClass.getName}")
    }

  private def toMicros(value: Any): Long = value match {
    case ts: java.sql.Timestamp =>
      Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) + ts.getNanos / 1000L
    case it: java.time.Instant =>
      Math.multiplyExact(it.getEpochSecond, 1000000L) + it.getNano / 1000L
  }
}
