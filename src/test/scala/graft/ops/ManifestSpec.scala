package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ManifestSpec extends SparkTestBase {
  import spark.implicits._

  test("manifest stats match per-file ground truth; pruning keeps exactly overlapping files") {
    val df = (1L to 20000L).map(i => (i, (i % 1000).toDouble)).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString + "/t"
    // range layout on id -> 8 files with disjoint id intervals
    df.repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(dir)

    val m = Manifest.statsManifest(spark, dir, Seq("id", "v")).collect()
    assert(m.length === 8)
    assert(m.map(_.getAs[Long]("n_rows")).sum === 20000L)
    // per-file ground truth from direct reads
    m.foreach { r =>
      val f = r.getAs[String]("file").stripPrefix("file://")
      val direct = spark.read.parquet(f).agg(
        min("id"), max("id"), count(lit(1))).head
      assert(r.getAs[Long]("min_id") === direct.getLong(0))
      assert(r.getAs[Long]("max_id") === direct.getLong(1))
      assert(r.getAs[Long]("n_rows") === direct.getLong(2))
    }

    // id interval covering ~2 of 8 disjoint ranges prunes the rest
    val kept = Manifest.prunedFiles(
      Manifest.statsManifest(spark, dir, Seq("id")), "id", lit(6000L), lit(10000L))
      .count()
    assert(kept >= 2 && kept <= 3, s"expected ~2 overlapping files, got $kept")
    // v is range-uncorrelated with the layout: nothing prunes (all files kept)
    val keptV = Manifest.prunedFiles(
      Manifest.statsManifest(spark, dir, Seq("v")), "v", lit(100.0), lit(200.0))
      .count()
    assert(keptV === 8L)
  }
}
