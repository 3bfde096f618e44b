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

  test("bloom index: no false negatives, prunes absent point lookups") {
    // 8 files, ids hash-scattered (NOT range-clustered): min/max pruning
    // is useless here — exactly the case the bloom index exists for
    val df = (1L to 4000L).filter(_ % 5 == 0).map(i => (i, i % 7)).toDF("id", "tag")
    val dir = java.nio.file.Files.createTempDirectory("bloommani").toString + "/t"
    df.repartition(8, col("id")).write.mode("overwrite").parquet(dir)
    val m = Manifest.bloomManifest(spark, dir, "id").cache()
    assert(m.count() === 8)

    // every present id must keep its own file (bloom cannot false-negative)
    val fileOf = spark.read.parquet(dir).select(input_file_name().as("f"), col("id"))
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    for (v <- Seq(5L, 1000L, 2500L, 3995L)) {
      val kept = Manifest.bloomPrunedFiles(m, lit(v)).collect().map(_.getString(0)).toSet
      assert(kept.contains(fileOf(v)), s"file holding $v was pruned")
    }
    // absent ids (non-multiples of 5): with 100 keys/file at 4096/4 the
    // fp rate is ~1e-4; these fixed probes deterministically prune all 8
    val prunedCounts = Seq(3L, 1001L, 2502L, 3998L, 12345L).map { v =>
      Manifest.bloomPrunedFiles(m, lit(v)).count()
    }
    assert(prunedCounts.sum <= 2, s"absent probes kept $prunedCounts files")
    m.unpersist()
  }

  test("compaction plan: sequential fill to target, big files left alone") {
    val sizes = Seq(
      ("f1", 40L), ("f2", 40L), ("f3", 40L),  // bin 0 (120 <= 128)
      ("f4", 100L),                           // starts at 120 -> bin 0 spillover
      ("f5", 60L),                            // starts at 220 -> bin 1
      ("f6", 500L), ("f7", 128L)              // >= target: pass through
    ).toDF("file", "bytes")
    val plan = Manifest.compactionPlan(sizes, targetBytes = 128L).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(plan("f1") === Some(0L) && plan("f2") === Some(0L) && plan("f3") === Some(0L))
    assert(plan("f4") === Some(0L)) // starts inside bin 0, spans the boundary
    assert(plan("f5") === Some(1L))
    assert(plan("f6") === None && plan("f7") === None)
  }

  test("fileSizes sums block lengths to real on-disk sizes") {
    val df = (1L to 5000L).map(i => (i, s"row_$i")).toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("fsizes").toString + "/t"
    df.repartition(4).write.mode("overwrite").parquet(dir)
    val got = Manifest.fileSizes(spark, dir).collect()
      .map(r => r.getString(0).stripPrefix("file:").replaceAll("^/+", "/") -> r.getLong(1)).toMap
    val real = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.length()).toMap
    assert(got.size === real.size)
    for ((path, bytes) <- real) assert(got(path) === bytes, s"size mismatch for $path")
  }

  test("compact rewrites each merge group to one file and preserves all rows") {
    val df = (1L to 20000L).map(i => (i, s"payload_$i")).toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("compact_in").toString + "/t"
    df.repartition(16).write.mode("overwrite").parquet(dir) // 16 tiny files
    val sizes = Manifest.fileSizes(spark, dir)
    val total = sizes.agg(org.apache.spark.sql.functions.sum("bytes")).head.getLong(0)
    val target = total / 4 // aim for ~4 output files
    val plan = Manifest.compactionPlan(sizes, target)
    val out = java.nio.file.Files.createTempDirectory("compact_out").toString
    val audit = Manifest.compact(spark, plan, out)
    val groups = audit.filter("rewritten").collect()
    assert(groups.length >= 3 && groups.length <= 6)
    // every group directory holds exactly one parquet part
    groups.foreach { g =>
      val parts = new java.io.File(s"$out/group_${g.getLong(0)}").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"group ${g.getLong(0)} has ${parts.length} parts")
    }
    // all rows survive the rewrite
    val back = spark.read.parquet(groups.map(g => s"$out/group_${g.getLong(0)}"): _*)
    assert(back.count() === 20000L)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      === (1L to 20000L).sum)
  }
}
