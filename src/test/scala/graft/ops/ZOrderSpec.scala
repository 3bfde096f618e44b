package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def fileStats(dirs: Seq[java.io.File], cols: Seq[String]): Seq[Map[String, (Double, Double)]] =
    dirs.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
          .head, cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))).tail: _*)
        .head
      cols.zipWithIndex.map { case (c, i) =>
        c -> (r.getDouble(2 * i), r.getDouble(2 * i + 1))
      }.toMap
    }

  private def partDirs(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("__zp=")).toSeq

  private def plainFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).toSeq

  test("z-order layout prunes on BOTH dimensions; single-column sort only on one") {
    // two independent uniform-ish dimensions from integer hashes
    val df = (1L to 100000L).map { i =>
      val x = (i * 2654435761L % 100003L).toDouble
      val y = (i * 972663749L % 100019L).toDouble
      (i, x, y)
    }.toDF("id", "x", "y")

    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.zOrderWrite(df, "x", "y", zDir, prefixBits = 4)
    val xDir = java.nio.file.Files.createTempDirectory("xsort").toString + "/t"
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def overlapping(stats: Seq[Map[String, (Double, Double)]],
        c: String, lo: Double, hi: Double): Int =
      stats.count { s => val (mn, mx) = s(c); mx >= lo && mn <= hi }

    val zStats = fileStats(partDirs(zDir), Seq("x", "y"))
    val xStats = fileStats(plainFiles(xDir), Seq("x", "y"))
    assert(zStats.size === 16 && xStats.size === 16)

    // y-range predicate (~1/5 of the domain, interior to quantile strips): the x-sorted layout cannot
    // prune a single file; aligned Morton tiles form a 4x4 grid, so at
    // most 2 of 4 y-strips (boundary effects) -> at most 8 tiles overlap
    val yPruneZ = overlapping(zStats, "y", 27000, 48000)
    val yPruneX = overlapping(xStats, "y", 27000, 48000)
    assert(yPruneX === 16, s"x-sorted layout unexpectedly pruned y: $yPruneX")
    assert(yPruneZ <= 8, s"z-order should skip >= half the tiles on y, overlapped $yPruneZ")

    // x-range predicate still prunes the z-layout (both dims interleave)
    val xPruneZ = overlapping(zStats, "x", 27000, 48000)
    assert(xPruneZ <= 8, s"z-order should skip >= half the tiles on x, overlapped $xPruneZ")

    // layout changes bytes on disk, not rows: content round-trips
    val back = spark.read.parquet(zDir)
    assert(back.count() === 100000L)
    assert(back.agg(sum("x"), sum("y")).head ===
      df.agg(sum("x"), sum("y")).head)
  }

  test("2-D manifest intersection prunes a box to a corner of the tile grid") {
    val df = (1L to 50000L).map { i =>
      val x = (i * 2654435761L % 100003L).toDouble
      val y = (i * 972663749L % 100019L).toDouble
      (i, x, y)
    }.toDF("id", "x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zorder2d").toString + "/t"
    ZOrder.zOrderWrite(df, "x", "y", zDir, prefixBits = 4)
    val manifest = Manifest.statsManifest(spark, zDir, Seq("x", "y"))
    val total = manifest.count()
    // quarter box on each dimension -> the intersection keeps roughly a
    // corner of the 4x4 aligned grid, far fewer files than either 1-D cut
    val kept = Manifest.prunedFiles(manifest, "x", lit(1000.0), lit(24000.0))
      .join(Manifest.prunedFiles(manifest, "y", lit(1000.0), lit(24000.0)), "file")
    val keptFiles = kept.collect().map(_.getString(0))
    assert(total >= 16L, s"expected >= 16 files, got $total")
    assert(keptFiles.nonEmpty && keptFiles.length <= total / 4,
      s"2-D intersection kept ${keptFiles.length} of $total files")
    // pruned scan + residual filter == full filter (no rows lost)
    val full = df.filter(col("x").between(1000.0, 24000.0) &&
      col("y").between(1000.0, 24000.0)).count()
    val pruned = spark.read.parquet(keptFiles.toIndexedSeq: _*)
      .filter(col("x").between(1000.0, 24000.0) &&
        col("y").between(1000.0, 24000.0)).count()
    assert(pruned === full)
  }

  test("SortedBucket binary search == higher-order filter bucketing") {
    // differential pin of the native bucket expression against the
    // filter form it replaced, over boundary-equal, between, below-min,
    // above-max, null and NaN values (null/NaN -> bucket 0, the filter
    // form's cardinality-of-empty)
    val bounds = Array(2.0, 5.0, 5.0, 9.0, 42.5)
    val vals: Seq[java.lang.Double] =
      Seq(1.0, 2.0, 3.0, 5.0, 8.9, 9.0, 42.5, 100.0, null,
        Double.NaN, -1e18, 1e18)
    val df = vals.toDF("v")
    val got = df.select(col("v"),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.SortedBucket(
          org.apache.spark.sql.graftbridge.ColumnBridge
            .expression(col("v").cast("double")), bounds)).as("b"),
      cardinality(filter(lit(bounds), b => col("v").cast("double") >= b)).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(1) === r.getInt(2), s"row $r"))
  }

  test("zValue: interleaved code is monotone in each dimension's bucket") {
    val bounds = (1 until 256).map(_.toDouble).toArray
    val df = Seq((10.0, 10.0), (10.0, 200.0), (200.0, 10.0), (200.0, 200.0))
      .toDF("a", "b")
    val zs = df.select(ZOrder.zValue(col("a"), bounds, col("b"), bounds).as("z"))
      .collect().map(_.getInt(0))
    // same a, larger b -> larger z; same b, larger a -> larger z
    assert(zs(1) > zs(0) && zs(2) > zs(0) && zs(3) > zs(1) && zs(3) > zs(2))
    // a occupies odd bits: a's contribution dominates b's within a bucket pair
    assert(zs(2) > zs(1))
  }
}
