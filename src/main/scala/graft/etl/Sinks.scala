package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Output sinks with the reference's semantics. */
object Sinks {

  /** Write `df` as ONE header CSV file at `outFile` (the reference emits a
    * single downloadable CSV, main.py:441-442: `to_csv(index=False)`).
    *
    * Single-file output is inherently a gather; `coalesce(1)` funnels the
    * final write through one task WITHOUT inserting a shuffle (it narrows
    * the last stage), and without collecting rows to the driver. For
    * cluster-scale exports callers should use [[csvDir]] instead and keep
    * one file per partition.
    */
  def csvSingleFile(df: DataFrame, outFile: String): Unit = {
    val tmp = outFile + ".__graft_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file under $tmp"))
    Files.move(part, Paths.get(outFile), StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(Paths.get(tmp))
  }

  /** Scale path: parallel multi-part CSV directory (one file per partition). */
  def csvDir(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").option("header", true).csv(outDir)

  /** Parquet sink (partitioned columnar — the scale-native format). */
  def parquetDir(df: DataFrame, outDir: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(outDir)
  }

  /** ORC sink — same partitioned columnar shape as parquetDir for
    * warehouses standardized on ORC. */
  def orcDir(df: DataFrame, outDir: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(outDir)
  }

  /** Avro OCF sink — one container file per non-empty partition via
    * [[AvroIO.write]] (from-scratch over avro-core; see its scaladoc
    * for the supported type lattice). */
  def avroDir(df: DataFrame, outDir: String): Unit =
    AvroIO.write(df, outDir)

  /** Arrow IPC (Feather v2) sink — one file per non-empty partition,
    * bounded record batches, optional zstd/lz4 buffer compression, via
    * [[ArrowIO.write]]. */
  def arrowDir(df: DataFrame, outDir: String, batchRows: Int = 4096,
      compression: Option[String] = None): Unit =
    ArrowIO.write(df, outDir, batchRows, compression)

  /** XML sink — one well-formed file per non-empty partition via
    * [[XmlIO.write]]; the exact record shape [[XmlIO.read]] ingests. */
  def xmlDir(df: DataFrame, outDir: String, rowTag: String = "row",
      rootTag: String = "rows"): Unit =
    XmlIO.write(df, outDir, rowTag, rootTag)

  /** TFRecord sink — one `part-NNNNN.tfrecord` of `tf.train.Example`
    * frames per non-empty partition via [[TfRecordIO.write]]. */
  def tfRecordDir(df: DataFrame, outDir: String): Unit =
    TfRecordIO.write(df, outDir)

  /** WebDataset sink — one `shard-NNNNN.tar` per non-empty partition
    * via [[WebDatasetIO.write]]; shard grain = partition grain. */
  def webDatasetShards(df: DataFrame, keyCol: String, outDir: String): Unit =
    WebDatasetIO.write(df, keyCol, outDir)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
