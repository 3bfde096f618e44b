package graft.etl

import java.io.{DataInputStream, EOFException, OutputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WebDataset-style tar shard source + sink, from scratch on two
  * public specifications:
  *
  *  - the POSIX ustar tar format (512-byte headers: name/size in
  *    octal, space-blanked checksum, `ustar` magic; contents padded to
  *    512; archive ends with two zero blocks);
  *  - the WebDataset sample convention (webdataset/webdataset docs):
  *    entries named `<key>.<ext>`, all consecutive entries sharing a
  *    key form one training sample — the layout multimodal training
  *    loaders stream sequentially off object storage.
  *
  * A sample row is `(key string, <ext> binary, <ext> binary, ...)` —
  * one binary column per extension, NULL where a sample lacks that
  * entry. Write takes exactly that shape (string columns are written
  * as their UTF-8 bytes) and emits one `shard-NNNNN.tar` per
  * non-empty partition, entries of a row adjacent as the convention
  * requires. Read groups CONSECUTIVE same-key entries per the spec —
  * it never buffers more than one sample, so arbitrarily large shards
  * stream in constant memory; one task per shard file.
  *
  * Out-of-lattice honesty: entry names longer than 100 bytes use the
  * ustar `prefix` field up to 155+100; beyond that fails loud (GNU
  * long-name extensions are out of scope). Non string/binary data
  * columns are rejected with a cast hint.
  *
  * Reference scope: the reference app's upload surface is single-file
  * tabular (main.py:69-94); tar shards are how the same pipeline's
  * multimodal output (images/audio + text, see [[graft.ext.Multimodal]])
  * reaches a training loader.
  */
object WebDatasetIO {

  private val Block = 512

  // ----------------------------------------------------------- tar write

  /** Write one ustar header block. */
  private def writeHeader(out: OutputStream, name: String, size: Long): Unit = {
    val header = new Array[Byte](Block)
    val nameBytes = name.getBytes(UTF_8)
    // split into (prefix, name) at a '/' if the name overflows 100 bytes
    val (prefixB, nameB) =
      if (nameBytes.length <= 100) (Array.emptyByteArray, nameBytes)
      else {
        val slash = name.lastIndexOf('/')
        require(slash > 0, s"tar entry name longer than 100 bytes with no '/': $name")
        val p = name.substring(0, slash).getBytes(UTF_8)
        val n = name.substring(slash + 1).getBytes(UTF_8)
        require(p.length <= 155 && n.length <= 100,
          s"tar entry name exceeds ustar prefix+name capacity: $name")
        (p, n)
      }
    System.arraycopy(nameB, 0, header, 0, nameB.length)
    putOctal(header, 100, 8, 420) // mode 0644
    putOctal(header, 108, 8, 0) // uid
    putOctal(header, 116, 8, 0) // gid
    putOctal(header, 124, 12, size)
    putOctal(header, 136, 12, 0) // mtime: fixed for deterministic shards
    java.util.Arrays.fill(header, 148, 156, ' '.toByte) // checksum blank
    header(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes(US_ASCII), 0, header, 257, 5)
    header(263) = '0'; header(264) = '0' // version "00"
    System.arraycopy(prefixB, 0, header, 345, prefixB.length)
    var sum = 0L
    var i = 0
    while (i < Block) { sum += header(i) & 0xff; i += 1 }
    putOctal(header, 148, 7, sum)
    header(155) = ' '
    out.write(header)
  }

  private def putOctal(header: Array[Byte], off: Int, len: Int, value: Long): Unit = {
    val s = java.lang.Long.toOctalString(value)
    require(s.length < len, s"value $value overflows $len-byte octal field")
    val padded = ("0" * (len - 1 - s.length)) + s
    System.arraycopy(padded.getBytes(US_ASCII), 0, header, off, len - 1)
    header(off + len - 1) = 0
  }

  private def writeEntry(out: OutputStream, name: String, data: Array[Byte]): Unit = {
    writeHeader(out, name, data.length.toLong)
    out.write(data)
    val pad = (Block - (data.length % Block)) % Block
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  private def writeTrailer(out: OutputStream): Unit =
    out.write(new Array[Byte](2 * Block))

  // ------------------------------------------------------------ tar read

  /** Iterate (name, bytes) entries off a tar stream; loud on malformed
    * headers (bad checksum, non-ustar magic) and truncation. */
  private def entries(in: DataInputStream, file: String): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextEntry: (String, Array[Byte]) = null
      private var done = false

      private def advance(): Unit = {
        val header = new Array[Byte](Block)
        try in.readFully(header)
        catch { case _: EOFException => done = true; in.close(); return }
        if (header.forall(_ == 0)) { done = true; in.close(); return }
        val stored = octal(header, 148, 8, file)
        java.util.Arrays.fill(header, 148, 156, ' '.toByte)
        var sum = 0L
        var i = 0
        while (i < Block) { sum += header(i) & 0xff; i += 1 }
        require(sum == stored, s"$file: tar header checksum mismatch (corrupt shard)")
        val magic = new String(header, 257, 5, US_ASCII)
        require(magic == "ustar", s"$file: not a ustar archive (magic '$magic')")
        val name = {
          val n = cstr(header, 0, 100)
          val p = cstr(header, 345, 155)
          if (p.isEmpty) n else s"$p/$n"
        }
        val size = octal(header, 124, 12, file)
        require(size >= 0 && size <= Int.MaxValue, s"$file: implausible entry size $size")
        val data = new Array[Byte](size.toInt)
        in.readFully(data)
        val pad = (Block - (size % Block)) % Block
        if (pad > 0) in.skipNBytes(pad)
        val typeflag = header(156)
        if (typeflag == '0' || typeflag == 0) nextEntry = (name, data)
        else advance() // directories/links: skip, keep walking
      }

      def hasNext: Boolean = {
        if (!done && nextEntry == null) advance()
        !done
      }
      def next(): (String, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException
        val e = nextEntry; nextEntry = null; e
      }
    }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, UTF_8)
  }

  private def octal(b: Array[Byte], off: Int, len: Int, file: String): Long = {
    var v = 0L
    var i = off
    while (i < off + len) {
      val c = b(i)
      if (c >= '0' && c <= '7') v = v * 8 + (c - '0')
      else if (c != 0 && c != ' ')
        throw new IllegalArgumentException(s"$file: bad octal in tar header")
      i += 1
    }
    v
  }

  // -------------------------------------------------- webdataset samples

  /** `name.ext` -> (key, ext). WebDataset keys may contain dots ONLY
    * before the final component; the extension is everything after the
    * FIRST dot of the basename per the spec, so `a/b.seg.txt` has key
    * `a/b` and extension `seg.txt`. */
  private def splitName(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    require(dot > slash, s"webdataset entry without extension: $name")
    (name.substring(0, dot), name.substring(dot + 1))
  }

  /** Group consecutive same-key entries into samples. */
  private def samples(
      it: Iterator[(String, Array[Byte])]): Iterator[(String, Map[String, Array[Byte]])] =
    new Iterator[(String, Map[String, Array[Byte]])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (String, Map[String, Array[Byte]]) = {
        val (name, data) = buf.next()
        val (key, ext) = splitName(name)
        var parts = Map(ext -> data)
        var continue = true
        while (continue && buf.hasNext) {
          val (k2, e2) = splitName(buf.head._1)
          if (k2 == key) { parts += (e2 -> buf.next()._2) } else continue = false
        }
        (key, parts)
      }
    }

  // ---------------------------------------------------------------- read

  /** Read a shard file or directory of `.tar` shards into
    * `(key string, <ext> binary ...)`. Extensions are the given list;
    * pass none to infer them from the first shard's headers (data is
    * skipped, not read). */
  def read(spark: SparkSession, path: String, extensions: Seq[String] = Nil): DataFrame = {
    val files = listShards(spark, path)
    val exts =
      if (extensions.nonEmpty) extensions
      else {
        val hadoopConf = spark.sessionState.newHadoopConf()
        val first = new HPath(files.head)
        val in = new DataInputStream(first.getFileSystem(hadoopConf).open(first))
        try entries(in, files.head).map(e => splitName(e._1)._2).toSet.toSeq.sorted
        finally in.close()
      }
    require(exts.nonEmpty, s"no entries found under $path to infer extensions from")
    val schema = StructType(
      StructField("key", StringType, nullable = false) +:
        exts.map(e => StructField(e, BinaryType, nullable = true)))
    val rdd = spark.sparkContext
      .binaryFiles(files.mkString(","))
      .flatMap { case (file, pds) =>
        samples(entries(new DataInputStream(pds.open()), file)).map { case (key, parts) =>
          Row.fromSeq(key +: exts.map(parts.getOrElse(_, null)))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  private def listShards(spark: SparkSession, path: String): Array[String] = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(hadoopConf)
    val status = fs.getFileStatus(root)
    val files =
      if (status.isDirectory)
        fs.listStatus(root).map(_.getPath).filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      else Array(root)
    require(files.nonEmpty, s"no .tar shards under $path")
    files.map(_.toString)
  }

  // --------------------------------------------------------------- write

  /** Write `df` as WebDataset shards: `keyCol` names the sample, every
    * other column becomes the `<key>.<column-name>` entry (binary
    * verbatim, string as UTF-8; NULL -> entry omitted). One
    * `shard-NNNNN.tar` per non-empty partition. Callers wanting
    * bounded shard sizes repartition first — shard granularity IS the
    * partition grain, matching the training-loader contract. */
  def write(df: DataFrame, keyCol: String, outDir: String): Unit = {
    val schema = df.schema
    require(schema.fieldNames.contains(keyCol), s"key column '$keyCol' not in ${schema.fieldNames.mkString(",")}")
    require(schema(keyCol).dataType == StringType, s"key column '$keyCol' must be string")
    val dataCols = schema.fields.filter(_.name != keyCol)
    require(dataCols.nonEmpty, "need at least one data column besides the key")
    dataCols.foreach { f =>
      require(f.dataType == BinaryType || f.dataType == StringType,
        s"column '${f.name}': webdataset entries are bytes — cast $f to binary or string")
    }
    val keyIdx = schema.fieldIndex(keyCol)
    val colIdx = dataCols.map(f => (f.name, schema.fieldIndex(f.name), f.dataType))

    val spark = df.sparkSession
    val root = new HPath(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(root, true)
    fs.mkdirs(root)

    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val part = new HPath(outDir, f"shard-${TaskContext.getPartitionId()}%05d.tar")
        val pfs = part.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = new java.io.BufferedOutputStream(pfs.create(part, true))
        try {
          rows.foreach { r =>
            val key = r.getString(keyIdx)
            require(key != null && key.nonEmpty, "NULL/empty sample key")
            colIdx.foreach { case (name, idx, dt) =>
              if (!r.isNullAt(idx)) {
                val bytes = dt match {
                  case BinaryType => r.getAs[Array[Byte]](idx)
                  case _ => r.getString(idx).getBytes(UTF_8)
                }
                writeEntry(out, s"$key.$name", bytes)
              }
            }
          }
          writeTrailer(out)
        } finally out.close()
      }
    }
    if (fs.listStatus(root).isEmpty) {
      val out = fs.create(new HPath(root, "shard-00000.tar"), true)
      writeTrailer(out)
      out.close()
    }
  }
}
