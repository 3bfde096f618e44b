package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file statistics manifest — the table-format primitive (Iceberg/
  * Delta manifests, ClickHouse minmax indexes) that lets a planner prune
  * files WITHOUT opening their footers: one small table of
  * (file, row_count, per-column min/max), built distributedly.
  *
  * Plan shape: a single scan of the data with `input_file_name()`
  * attached, one groupBy(file) with map-side combine — at 100 TB the
  * manifest is (#files) rows, never driver-materialized, and building it
  * costs one pass (typically piggybacked right after a layout write like
  * ZOrder.zOrderWrite). `prunedFiles` then evaluates a min/max interval
  * predicate against the manifest ONLY — query planning cost proportional
  * to file count, not data size.
  */
object Manifest {

  /** Build a (file, n_rows, min_<c>, max_<c>...) manifest for `cols` of
    * the parquet table at `dir`. */
  def statsManifest(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "statsManifest needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] interval for `c` intersects [lo, hi] — the
    * candidate set a skipping scan would read. Interval logic only; a
    * file with NULL stats (all-null column) is conservatively kept. */
  def prunedFiles(manifest: DataFrame, c: String, lo: Column, hi: Column): DataFrame =
    manifest.filter(
      col(s"max_$c").isNull || col(s"min_$c").isNull ||
        (col(s"max_$c") >= lo && col(s"min_$c") <= hi))
      .select(col("file"))
}
