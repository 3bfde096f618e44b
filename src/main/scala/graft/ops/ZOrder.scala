package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional data
  * skipping.
  *
  * A table sorted by one column skips beautifully on that column and not
  * at all on any other: every file spans the full range of the second
  * dimension. Interleaving the bits of per-column RANKS gives a
  * space-filling curve whose prefix ranges are axis-aligned boxes — so a
  * file holding a contiguous z-value range covers a small rectangle in
  * (colA, colB) space, and parquet min/max footer stats prune files for
  * predicates on EITHER column (the layout Delta's OPTIMIZE ZORDER and
  * ClickHouse's mortonEncode aim for, built here from public
  * first principles).
  *
  * Scale shape:
  *  - per-column bucket boundaries come from `approxQuantile` — a
  *    sampling aggregate returning 255 doubles to the driver
  *    (control-plane sized, independent of row count);
  *  - bucketing + bit interleaving are pure column expressions (a
  *    256-entry Morton spread table as a literal array — 1 KB, constant);
  *  - the write is `repartitionByRange(zval)` + sortWithinPartitions:
  *    one range shuffle, each output file covers a tight z-range.
  * Rank-based (not value-based) bucketing makes the curve robust to
  * skewed distributions: every bucket holds ~1/256 of the data.
  */
object ZOrder {

  /** 8-bit -> 16-bit Morton spread: bit i of x moves to bit 2i. */
  private val spread: Array[Int] = Array.tabulate(256) { x =>
    var v = 0
    var i = 0
    while (i < 8) { v |= (x >> i & 1) << (2 * i); i += 1 }
    v
  }

  /** Column expression: rank-bucket of `c` against sorted `boundaries`
    * (0..boundaries.length), i.e. how many boundaries the value meets.
    * Binary-search native expression — the interpreted higher-order
    * filter scanned all 256 boundaries per row (guide §4: the hot
    * per-row loop belongs in native code). */
  private def bucketOf(c: Column, boundaries: Array[Double]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.SortedBucket(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c.cast("double")),
        boundaries))

  /** Z-value of two columns: each rank-bucketed to 8 bits via its
    * quantile `boundaries`, bits interleaved to a 16-bit Morton code. */
  def zValue(a: Column, aBounds: Array[Double], b: Column, bBounds: Array[Double]): Column = {
    require(aBounds.length <= 255 && bBounds.length <= 255,
      "at most 255 boundaries (8-bit buckets) per dimension")
    val sa = element_at(lit(spread), bucketOf(a, aBounds) + 1)
    val sb = element_at(lit(spread), bucketOf(b, bBounds) + 1)
    shiftleft(sa, 1).bitwiseOR(sb)
  }

  /** Write `df` z-clustered by (`colA`, `colB`) at `outDir`, tiled into
    * 2^`prefixBits` partitions keyed by the ALIGNED top z-prefix (a
    * hive-style partition column `__zp`). Alignment matters: a sampled
    * range partitioner cuts mid-quadrant, and a file straddling two
    * quadrants spans BOTH their extents in each dimension (measured: 12
    * of 16 files overlapped a 1/4 box vs 4 aligned tiles). With aligned
    * prefixes every partition is exactly one Morton tile — a
    * (256/2^(prefixBits/2))-bucket square — so per-partition min/max
    * stats prune on either dimension. One shuffle on the prefix; rows
    * sort by full z within each tile for row-group locality. */
  def zOrderWrite(df: DataFrame, colA: String, colB: String, outDir: String,
      prefixBits: Int = 4, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= 256, s"buckets must be in [2,256], got $buckets")
    require(prefixBits >= 2 && prefixBits <= 8 && prefixBits % 2 == 0,
      s"prefixBits must be even in [2,8], got $prefixBits")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // one sampling pass for BOTH dimensions (the multi-column
    // approxQuantile overload) — at 100 TB the boundary scan is the
    // dominant planning cost and it should be paid once, not per axis
    val Array(aB, bB) = df.stat.approxQuantile(Array(colA, colB), probs, 0.001)
    val withZ = df.withColumn("__zval", zValue(col(colA), aB, col(colB), bB))
      .withColumn("__zp", shiftright(col("__zval"), 16 - prefixBits))
    withZ
      .repartition(1 << prefixBits, col("__zp"))
      .sortWithinPartitions("__zp", "__zval")
      .drop("__zval")
      .write.mode("overwrite").partitionBy("__zp").parquet(outDir)
    withZ.sparkSession.read.parquet(outDir)
  }
}
