package graft.etl

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Remote-file connector with the reference's SFTP extract/load semantics
  * (reference: main.py:97-127): fetch remote bytes -> smart_load; result
  * -> CSV -> put remote. A connector, not an operator — data-plane compute
  * stays in Spark; only ingest/egress staging touches the transport.
  *
  * The transport is an interface so the engine never hard-depends on an
  * SSH client (none ships in this offline build): production wires a real
  * SFTP implementation (e.g. sshj/JSch); tests use [[LocalFsTransport]].
  */
trait FileTransport {
  def get(remotePath: String): Array[Byte]
  def put(remotePath: String, data: Array[Byte]): Unit
}

/** Filesystem-backed transport (tests, local staging, mounted shares). */
final class LocalFsTransport(root: Path) extends FileTransport {
  private def resolve(p: String): Path = root.resolve(p.stripPrefix("/"))
  override def get(remotePath: String): Array[Byte] = Files.readAllBytes(resolve(p = remotePath))
  override def put(remotePath: String, data: Array[Byte]): Unit = {
    val target = resolve(remotePath)
    Files.createDirectories(target.getParent)
    Files.write(target, data)
  }
}

/** Placeholder for a real SFTP transport: fails loudly (this build has no
  * SSH library), mirroring the reference's connection-error path
  * (main.py:123-127).
  *
  * Probed r17: hadoop-client-api 3.4.2 ships
  * `org.apache.hadoop.fs.sftp.SFTPFileSystem`, but its jsch dependency
  * (`com/jcraft/jsch`) is absent from every jar on the offline
  * classpath, so an `sftp://` Hadoop FS path would NoClassDefFoundError
  * at connect — the loud throw here stays the honest steady state. On a
  * cluster with jsch present, `new Path("sftp://user@host/...")` +
  * `fs.sftp.impl = org.apache.hadoop.fs.sftp.SFTPFileSystem` is the
  * drop-in network transport. */
final class SftpTransport(host: String, port: Int, user: String)
    extends FileTransport {
  private def unsupported = throw new UnsupportedOperationException(
    s"SFTP transport to $user@$host:$port requires an SSH client library " +
      "not bundled in this offline build; wire a FileTransport implementation.")
  override def get(remotePath: String): Array[Byte] = unsupported
  override def put(remotePath: String, data: Array[Byte]): Unit = unsupported
}

object RemoteFiles {

  /** Extract: fetch remote bytes, stage to a local temp file named like
    * the remote (extension drives smart_load dispatch), load. */
  def extract(spark: SparkSession, transport: FileTransport, remotePath: String): DataFrame = {
    val bytes = transport.get(remotePath)
    val name = Paths.get(remotePath).getFileName.toString
    val dir = Files.createTempDirectory("graft_sftp_in")
    val staged = dir.resolve(name)
    Files.write(staged, bytes)
    SmartLoad.load(spark, staged.toString)
  }

  /** Load: serialize the result as one header CSV (reference
    * main.py:115-122 writes a single CSV buffer) and put it remote. */
  def load(transport: FileTransport, df: DataFrame, remotePath: String): Unit = {
    val dir = Files.createTempDirectory("graft_sftp_out")
    val staged = dir.resolve("out.csv").toString
    Sinks.csvSingleFile(df, staged)
    transport.put(remotePath, Files.readAllBytes(Paths.get(staged)))
  }
}
