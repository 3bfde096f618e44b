package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Commit-marker and versioned-directory I/O for the foreachBatch gate
  * family (upsert snapshots, drift/anomaly/hotspot/CUSUM/quality/
  * coverage/TWAP/association gates, dedup/dhash/decontam/LM/golden-
  * record indices), routed through the Hadoop FileSystem API so the
  * exactly-once protocol addresses ANY Hadoop-resolvable store —
  * `file:`, `hdfs:`, `s3a:`, ... — not just the local POSIX mount that
  * `java.io.File` can reach. State parquet already goes through Spark's
  * writers (Hadoop-FS-capable); this closes the marker side.
  *
  * Atomicity: [[flipVersion]] writes `name.tmp<v>` then renames it over
  * the live marker through `FileContext` with `Rename.OVERWRITE` — the
  * same primitive Structured Streaming's checkpoint file manager uses
  * (atomic on HDFS and on posix `file:`; an object store without atomic
  * rename substitutes its own committer, which is exactly the seam a
  * lakehouse table format would replace). Readers therefore see either
  * the old committed version or the new one, never a torn marker.
  *
  * The Hadoop conf resolves from the active SparkSession so
  * `spark.hadoop.*` settings (credentials, endpoints) apply; a bare
  * `Configuration` is the sessionless fallback.
  */
private[streaming] object StateCommit {

  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsOf(p: Path): FileSystem = p.getFileSystem(conf)

  /** The committed version in `dir/name`, or -1 when none committed. */
  def readVersion(dir: String, name: String = "_VERSION"): Long = {
    val p = new Path(dir, name)
    val fs = fsOf(p)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** [[readVersion]] that fails loud when nothing has committed yet. */
  def requireVersion(dir: String, what: String,
      name: String = "_VERSION"): Long = {
    val v = readVersion(dir, name)
    require(v >= 0L, s"no committed $what under $dir")
    v
  }

  /** Atomically flip `dir/name` to `v` (create temp + overwrite-rename).
    * Both the temp write and the rename go through the SAME
    * FileContext: a FileSystem-side create would route file: paths
    * through the checksummed LocalFileSystem and leave one orphaned
    * `.crc` sidecar per committed batch after the raw-FS rename. */
  def flipVersion(dir: String, v: Long, name: String = "_VERSION"): Unit = {
    val raw = new Path(dir)
    val fs = fsOf(raw)
    fs.mkdirs(raw)
    val dirPath = fs.makeQualified(raw)
    val tmp = new Path(dirPath, s"$name.tmp$v")
    val fc = FileContext.getFileContext(dirPath.toUri, conf)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fc.rename(tmp, new Path(dirPath, name), Options.Rename.OVERWRITE)
  }

  /** Child DIRECTORY names under `dir` (empty when `dir` is absent). */
  def listDirNames(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Recursive delete; a no-op when the path is already gone. */
  def deleteDir(dir: String): Unit = {
    val p = new Path(dir)
    fsOf(p).delete(p, true)
    ()
  }

  def dirExists(dir: String): Boolean = {
    val p = new Path(dir)
    fsOf(p).exists(p)
  }

  /** Publish a staging directory: plain rename (the caller guarantees
    * the destination is absent — crashed prior attempts are swept
    * first), failing loud if the store refuses. */
  def renameDir(src: String, dst: String): Unit = {
    val s = new Path(src)
    // FileSystem.rename reports failure as `false` on some impls and as
    // FileNotFoundException on others (RawLocal/Checksum) — normalize
    val ok =
      try fsOf(s).rename(s, new Path(dst))
      catch { case _: java.io.FileNotFoundException => false }
    require(ok, s"cannot publish $dst")
  }
}
