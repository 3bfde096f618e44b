package graft.etl

import java.io.{ByteArrayOutputStream, DataInputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** TFRecord source + sink over `tf.train.Example` records, built from
  * scratch on the two public specifications:
  *
  *  - the TFRecord container frame (TensorFlow `record_writer.cc`):
  *    `uint64 length (LE) · uint32 masked_crc32c(length) · data ·
  *    uint32 masked_crc32c(data)`, with
  *    `mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8`
  *    (CRC32C comes with the JDK since Java 9 — no library needed);
  *  - the protobuf wire format (LEB128 varints, tagged fields,
  *    length-delimited submessages) specialised to the fixed
  *    `Example / Features / Feature{BytesList,FloatList,Int64List}`
  *    message shape of TensorFlow's `example.proto` / `feature.proto`.
  *
  * Both CRCs are VERIFIED on read — corruption detection is the point
  * of the frame — and unknown protobuf fields are skipped by wire
  * type, so records written with extension fields still load.
  *
  * Type lattice (loud failure outside it, both directions):
  * long/int -> Int64List, float -> FloatList, string/binary ->
  * BytesList, and arrays of each -> the multi-valued list. DoubleType
  * is REJECTED on write rather than silently narrowed (FloatList is
  * float32); cast to float or long explicitly. Packed and unpacked
  * list encodings are both accepted on read; writes pack.
  *
  * Read is distributed one-task-per-file like [[AvroIO.read]]; write
  * emits one `part-NNNNN.tfrecord` per non-empty partition — the shard
  * layout training loaders expect.
  *
  * Reference scope: the reference app exchanges frames as CSV/Excel/
  * JSON uploads (main.py:69-94); TFRecord is the container the same
  * rows meet at the training-loader boundary.
  */
object TfRecordIO {

  // ------------------------------------------------------------- framing

  private val CrcMaskDelta = 0xa282ead8

  private def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + CrcMaskDelta
  }

  /** Append one framed record to `out`. */
  private def writeFrame(out: java.io.OutputStream, data: Array[Byte]): Unit = {
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.putLong(data.length.toLong)
    head.putInt(maskedCrc(head.array(), 0, 8))
    out.write(head.array())
    out.write(data)
    val tail = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(maskedCrc(data, 0, data.length))
    out.write(tail.array())
  }

  /** Iterate frames off a stream, verifying both CRCs; loud on
    * corruption or truncation. */
  private def frames(in: DataInputStream, name: String): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextData: Array[Byte] = null
      private var done = false

      private def advance(): Unit = {
        val head = new Array[Byte](12)
        val first = in.read(head, 0, 1)
        if (first < 0) { done = true; in.close(); return }
        var got = 1
        while (got < 12) {
          val n = in.read(head, got, 12 - got)
          if (n < 0) throw new EOFException(s"$name: truncated TFRecord frame header")
          got += n
        }
        val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong
        val lenCrc = bb.getInt
        require(len >= 0 && len <= Int.MaxValue, s"$name: implausible record length $len")
        if (lenCrc != maskedCrc(head, 0, 8))
          throw new java.io.IOException(s"$name: TFRecord length CRC mismatch (corrupt file)")
        val data = new Array[Byte](len.toInt)
        in.readFully(data)
        val dataCrc = new Array[Byte](4)
        in.readFully(dataCrc)
        if (ByteBuffer.wrap(dataCrc).order(ByteOrder.LITTLE_ENDIAN).getInt !=
            maskedCrc(data, 0, data.length))
          throw new java.io.IOException(s"$name: TFRecord data CRC mismatch (corrupt file)")
        nextData = data
      }

      def hasNext: Boolean = {
        if (!done && nextData == null) advance()
        !done
      }
      def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val d = nextData; nextData = null; d
      }
    }

  // ----------------------------------------------------- protobuf: write

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v = v >>> 7
    }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int, payload: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
  }

  private def int64List(values: Iterator[Long]): Array[Byte] = {
    val packed = new ByteArrayOutputStream()
    values.foreach(writeVarint(packed, _))
    val msg = new ByteArrayOutputStream()
    writeLenDelim(msg, 1, packed.toByteArray) // Int64List.value, packed
    msg.toByteArray
  }

  private def floatList(values: Iterator[Float]): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    values.foreach { f =>
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(f)
      buf.write(b.array(), 0, 4)
    }
    val msg = new ByteArrayOutputStream()
    writeLenDelim(msg, 1, buf.toByteArray) // FloatList.value, packed
    msg.toByteArray
  }

  private def bytesList(values: Iterator[Array[Byte]]): Array[Byte] = {
    val msg = new ByteArrayOutputStream()
    values.foreach(writeLenDelim(msg, 1, _)) // BytesList.value, repeated
    msg.toByteArray
  }

  /** Feature message with the given oneof field (1=bytes 2=float 3=int64). */
  private def feature(kindField: Int, listBytes: Array[Byte]): Array[Byte] = {
    val msg = new ByteArrayOutputStream()
    writeLenDelim(msg, kindField, listBytes)
    msg.toByteArray
  }

  /** Encode one Row as a serialized `tf.train.Example`. NULL fields are
    * omitted (no map entry), matching TF's absent-feature convention. */
  private def encodeExample(row: Row, schema: StructType): Array[Byte] = {
    val features = new ByteArrayOutputStream()
    var i = 0
    while (i < schema.length) {
      val v = row.get(i)
      if (v != null) {
        val f = schema(i)
        val featBytes = f.dataType match {
          case LongType => feature(3, int64List(Iterator(v.asInstanceOf[Long])))
          case IntegerType => feature(3, int64List(Iterator(v.asInstanceOf[Int].toLong)))
          case FloatType => feature(2, floatList(Iterator(v.asInstanceOf[Float])))
          case StringType => feature(1, bytesList(Iterator(v.asInstanceOf[String].getBytes(UTF_8))))
          case BinaryType => feature(1, bytesList(Iterator(v.asInstanceOf[Array[Byte]])))
          case ArrayType(LongType, _) =>
            feature(3, int64List(seqOf(v).iterator.map(_.asInstanceOf[Long])))
          case ArrayType(IntegerType, _) =>
            feature(3, int64List(seqOf(v).iterator.map(_.asInstanceOf[Int].toLong)))
          case ArrayType(FloatType, _) =>
            feature(2, floatList(seqOf(v).iterator.map(_.asInstanceOf[Float])))
          case ArrayType(StringType, _) =>
            feature(1, bytesList(seqOf(v).iterator.map(_.asInstanceOf[String].getBytes(UTF_8))))
          case ArrayType(BinaryType, _) =>
            feature(1, bytesList(seqOf(v).iterator.map(_.asInstanceOf[Array[Byte]])))
          case other => throw new IllegalArgumentException(unsupportedMsg(f.name, other))
        }
        // Features.feature map entry: key=1, value=2
        val entry = new ByteArrayOutputStream()
        writeLenDelim(entry, 1, f.name.getBytes(UTF_8))
        writeLenDelim(entry, 2, featBytes)
        writeLenDelim(features, 1, entry.toByteArray)
      }
      i += 1
    }
    val example = new ByteArrayOutputStream()
    writeLenDelim(example, 1, features.toByteArray) // Example.features
    example.toByteArray
  }

  private def seqOf(v: Any): scala.collection.Seq[Any] =
    v.asInstanceOf[scala.collection.Seq[Any]]

  private def unsupportedMsg(name: String, t: DataType): String = t match {
    case DoubleType | ArrayType(DoubleType, _) =>
      s"column '$name': DoubleType would silently narrow — tf.train.Example FloatList is " +
        "float32; cast to float (accepting the precision) or to long explicitly"
    case other =>
      s"column '$name': unsupported type $other for tf.train.Example " +
        "(supported: long/int/float/string/binary and arrays of them)"
  }

  // ------------------------------------------------------ protobuf: read

  /** Decoded feature: exactly one of the three lists is non-null. */
  private final case class Feat(
      bytes: Vector[Array[Byte]], floats: Vector[Float], longs: Vector[Long], kind: Int)

  private final class Cursor(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (true) {
        require(pos < end, "truncated varint")
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        require(shift < 64, "varint too long")
      }
      result
    }
    def readBytes(len: Int): (Int, Int) = { // (offset, length) view
      require(pos + len <= end, "truncated length-delimited field")
      val off = pos; pos += len; (off, len)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => val len = readVarint().toInt; readBytes(len)
      case 5 => require(pos + 4 <= end, "truncated fixed32"); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported protobuf wire type $w")
    }
  }

  private def subCursor(c: Cursor): Cursor = {
    val len = c.readVarint().toInt
    val (off, l) = c.readBytes(len)
    new Cursor(c.buf, off, off + l)
  }

  private def decodeFeature(c: Cursor): Feat = {
    var bytes = Vector.empty[Array[Byte]]
    var floats = Vector.empty[Float]
    var longs = Vector.empty[Long]
    var kind = 0
    while (c.hasMore) {
      val tag = c.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 if wire == 2 => // BytesList
          kind = 1
          val lc = subCursor(c)
          while (lc.hasMore) {
            val t = lc.readVarint()
            if ((t >>> 3).toInt == 1 && (t & 7).toInt == 2) {
              val len = lc.readVarint().toInt
              val (off, l) = lc.readBytes(len)
              bytes :+= java.util.Arrays.copyOfRange(lc.buf, off, off + l)
            } else lc.skip((t & 7).toInt)
          }
        case 2 if wire == 2 => // FloatList (packed or submessage with fixed32s)
          kind = 2
          val lc = subCursor(c)
          while (lc.hasMore) {
            val t = lc.readVarint()
            val w = (t & 7).toInt
            if ((t >>> 3).toInt == 1 && w == 2) { // packed
              val len = lc.readVarint().toInt
              val (off, l) = lc.readBytes(len)
              require(l % 4 == 0, "packed FloatList length not a multiple of 4")
              val bb = ByteBuffer.wrap(lc.buf, off, l).order(ByteOrder.LITTLE_ENDIAN)
              while (bb.hasRemaining) floats :+= bb.getFloat
            } else if ((t >>> 3).toInt == 1 && w == 5) { // unpacked
              val (off, _) = lc.readBytes(4)
              floats :+= ByteBuffer.wrap(lc.buf, off, 4).order(ByteOrder.LITTLE_ENDIAN).getFloat
            } else lc.skip(w)
          }
        case 3 if wire == 2 => // Int64List (packed or repeated varints)
          kind = 3
          val lc = subCursor(c)
          while (lc.hasMore) {
            val t = lc.readVarint()
            val w = (t & 7).toInt
            if ((t >>> 3).toInt == 1 && w == 2) { // packed
              val len = lc.readVarint().toInt
              val (off, l) = lc.readBytes(len)
              val pc = new Cursor(lc.buf, off, off + l)
              while (pc.hasMore) longs :+= pc.readVarint()
            } else if ((t >>> 3).toInt == 1 && w == 0) { // unpacked
              longs :+= lc.readVarint()
            } else lc.skip(w)
          }
        case _ => c.skip(wire)
      }
    }
    Feat(bytes, floats, longs, kind)
  }

  /** Parse a serialized Example into name -> Feat. */
  private def decodeExample(data: Array[Byte]): Map[String, Feat] = {
    val c = new Cursor(data, 0, data.length)
    var out = Map.empty[String, Feat]
    while (c.hasMore) {
      val tag = c.readVarint()
      if ((tag >>> 3).toInt == 1 && (tag & 7).toInt == 2) { // Example.features
        val fc = subCursor(c)
        while (fc.hasMore) {
          val ft = fc.readVarint()
          if ((ft >>> 3).toInt == 1 && (ft & 7).toInt == 2) { // map entry
            val ec = subCursor(fc)
            var key: String = null
            var feat: Feat = null
            while (ec.hasMore) {
              val et = ec.readVarint()
              ((et >>> 3).toInt, (et & 7).toInt) match {
                case (1, 2) =>
                  val len = ec.readVarint().toInt
                  val (off, l) = ec.readBytes(len)
                  key = new String(ec.buf, off, l, UTF_8)
                case (2, 2) => feat = decodeFeature(subCursor(ec))
                case (_, w) => ec.skip(w)
              }
            }
            if (key != null && feat != null) out += (key -> feat)
          } else fc.skip((ft & 7).toInt)
        }
      } else c.skip((tag & 7).toInt)
    }
    out
  }

  // ---------------------------------------------------------------- read

  /** Read a TFRecord file or directory of `.tfrecord` part files into
    * the given schema. Missing features decode as NULL; a scalar field
    * takes the list head (NULL if the list is empty); an array field
    * takes the whole list. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    schema.fields.foreach(f => checkReadable(f.name, f.dataType))
    val files = listFiles(spark, path, ".tfrecord")
    val rdd = spark.sparkContext
      .binaryFiles(files.mkString(","))
      .flatMap { case (name, pds) =>
        frames(new DataInputStream(pds.open()), name).map { data =>
          val feats = decodeExample(data)
          Row.fromSeq(schema.fields.map(f => fieldValue(f, feats.get(f.name))).toSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Infer a schema by scanning up to `sampleRecords` examples of the
    * first file: int64 -> long, float -> float, bytes -> binary; a key
    * whose list ever holds more than one value becomes an array.
    * Fields sort by name (map iteration order is not a schema). */
  def inferSchema(spark: SparkSession, path: String, sampleRecords: Int = 100): StructType = {
    val files = listFiles(spark, path, ".tfrecord")
    val hadoopConf = spark.sessionState.newHadoopConf()
    val first = new HPath(files.head)
    val in = new DataInputStream(first.getFileSystem(hadoopConf).open(first))
    val kinds = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Boolean)]
    try {
      frames(in, files.head).take(sampleRecords).foreach { data =>
        decodeExample(data).foreach { case (k, f) =>
          val n = f.kind match { case 1 => f.bytes.size; case 2 => f.floats.size; case _ => f.longs.size }
          kinds.get(k) match {
            case Some((kind, multi)) =>
              require(kind == f.kind,
                s"feature '$k' changes kind across records ($kind vs ${f.kind})")
              kinds(k) = (kind, multi || n > 1)
            case None => kinds(k) = (f.kind, n > 1)
          }
        }
      }
    } finally in.close()
    StructType(kinds.toSeq.sortBy(_._1).map { case (name, (kind, multi)) =>
      val base: DataType = kind match {
        case 1 => BinaryType
        case 2 => FloatType
        case _ => LongType
      }
      StructField(name, if (multi) ArrayType(base, containsNull = false) else base,
        nullable = true)
    }.toArray)
  }

  private def checkReadable(name: String, t: DataType): Unit = t match {
    case LongType | IntegerType | FloatType | StringType | BinaryType => ()
    case ArrayType(LongType | IntegerType | FloatType | StringType | BinaryType, _) => ()
    case other => throw new IllegalArgumentException(unsupportedMsg(name, other))
  }

  private def fieldValue(f: StructField, feat: Option[Feat]): Any = feat match {
    case None => null
    case Some(ft) =>
      def head[A](v: Vector[A]): Any = v.headOption.getOrElse(null).asInstanceOf[Any]
      f.dataType match {
        case LongType => head(ft.longs)
        case IntegerType => ft.longs.headOption.map(l => Math.toIntExact(l)).orNull
        case FloatType => head(ft.floats)
        case StringType => ft.bytes.headOption.map(new String(_, UTF_8)).orNull
        case BinaryType => head(ft.bytes)
        case ArrayType(LongType, _) => ft.longs
        case ArrayType(IntegerType, _) => ft.longs.map(Math.toIntExact)
        case ArrayType(FloatType, _) => ft.floats
        case ArrayType(StringType, _) => ft.bytes.map(new String(_, UTF_8))
        case ArrayType(BinaryType, _) => ft.bytes
        case other => throw new IllegalArgumentException(unsupportedMsg(f.name, other))
      }
  }

  private def listFiles(spark: SparkSession, path: String, ext: String): Array[String] = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(hadoopConf)
    val status = fs.getFileStatus(root)
    val files =
      if (status.isDirectory)
        fs.listStatus(root).map(_.getPath).filter(_.getName.endsWith(ext)).sortBy(_.getName)
      else Array(root)
    require(files.nonEmpty, s"no $ext files under $path")
    files.map(_.toString)
  }

  // --------------------------------------------------------------- write

  /** Write one `part-NNNNN.tfrecord` per non-empty partition under
    * `outDir` (created fresh). The schema is validated on the driver so
    * unsupported types fail before any task launches. */
  def write(df: DataFrame, outDir: String): Unit = {
    val schema = df.schema
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType | IntegerType | FloatType | StringType | BinaryType => ()
        case ArrayType(LongType | IntegerType | FloatType | StringType | BinaryType, _) => ()
        case other => throw new IllegalArgumentException(unsupportedMsg(f.name, other))
      }
    }
    val spark = df.sparkSession
    val root = new HPath(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(root, true)
    fs.mkdirs(root)

    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val part = new HPath(outDir, f"part-${TaskContext.getPartitionId()}%05d.tfrecord")
        val pfs = part.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(pfs.create(part, true))
        try rows.foreach(r => writeFrame(out, encodeExample(r, schema)))
        finally out.close()
      }
    }
    // an empty frame still leaves one zero-record file so a schema-ed
    // read of the directory yields an empty frame instead of failing
    if (fs.listStatus(root).isEmpty)
      fs.create(new HPath(root, "part-00000.tfrecord"), true).close()
  }
}
