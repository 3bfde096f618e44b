package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Storage-layout integration of the geo family: points written
  * range-clustered by Morton cell id, then a spatial predicate pruned
  * to a file subset via the min/max manifest — the Z-order data-skipping
  * story applied to geography. A top-level Morton quadrant is a
  * CONTIGUOUS z range, so the quadrant query prunes by pure interval
  * logic and must read strictly fewer files while returning exactly the
  * full-scan answer. */
class GeoLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("morton-clustered layout: quadrant query prunes files, result exact") {
    val bits = 8
    val rnd = new scala.util.Random(5L)
    val pts = (0 until 4000).map { i =>
      (i.toLong, rnd.nextDouble() * 170.0 - 85.0, rnd.nextDouble() * 350.0 - 175.0)
    }
    val df = pts.toDF("id", "lat_d", "lon_d")
      .withColumn("cell_id", Geo.mortonCellId(col("lat_d"), col("lon_d"), bits))
    val dir = java.nio.file.Files.createTempDirectory("graft_geo_layout_").toString
    df.repartitionByRange(8, col("cell_id"))
      .sortWithinPartitions(col("cell_id"))
      .write.mode("overwrite").parquet(dir)

    val manifest = Manifest.statsManifest(spark, dir, Seq("cell_id"))
    val nFiles = manifest.count()
    assert(nFiles >= 6, s"fixture must spread over several files, got $nFiles")

    // top-level quadrant 2 (lat high bit 1, lon high bit 0 pattern of
    // the interleave): z in [2 * 4^(bits-1) * ... ) — contiguous range
    val quadSpan = 1L << (2 * bits - 2)
    val lo = 2L * quadSpan
    val hi = 3L * quadSpan - 1L
    val keep = Manifest.prunedFiles(manifest, "cell_id", lit(lo), lit(hi))
      .as[String].collect().toSet
    assert(keep.nonEmpty && keep.size < nFiles,
      s"quadrant must prune: kept ${keep.size} of $nFiles")

    val full = spark.read.parquet(dir)
      .filter(col("cell_id") >= lo && col("cell_id") <= hi)
      .select("id").as[Long].collect().toSet
    val pruned = spark.read.parquet(keep.toSeq: _*)
      .filter(col("cell_id") >= lo && col("cell_id") <= hi)
      .select("id").as[Long].collect().toSet
    assert(pruned == full && full.nonEmpty)

    // the quadrant z-range is exactly the geometric quadrant: z bits
    // (15,14) = (lon hi, lat hi) = (1,0) -> lon >= 0, lat < 0
    val byGeom = pts.filter { case (_, la, lo2) => la < 0.0 && lo2 >= 0.0 }
      .map(_._1).toSet
    assert(full == byGeom)
  }
}
