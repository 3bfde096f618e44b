package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Grid-DBSCAN: planted-cluster recovery vs a brute-force union-find,
  * noise exclusion, singleton clusters; hotspot-gate state fold
  * idempotence and batch==stream identity. */
class GeoDbscanSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteClusters(pts: Seq[(Long, Long)], cell: Long, minPts: Long)
      : Map[(Long, Long), Long] = {
    def fd(a: Long): Long = math.floorDiv(a, cell)
    val cells = pts.groupBy(p => (fd(p._1), fd(p._2))).view.mapValues(_.size.toLong).toMap
    val dense = cells.filter(_._2 >= minPts).keys.toSeq
    val id = dense.map(c => c -> ((c._1 + 1048576L) * 2097152L + (c._2 + 1048576L))).toMap
    val parent = scala.collection.mutable.Map(dense.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    for (a <- dense; b <- dense if a != b
         && math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    dense.map { c =>
      val members = dense.filter(d => find(d) == find(c))
      c -> members.map(id).min
    }.toMap
  }

  test("dbscanCells: two planted blobs get two clusters; scatter is noise") {
    val rnd = new scala.util.Random(21L)
    val blobA = (0 until 50).map(_ => (1000L + rnd.nextLong(2000L), 1000L + rnd.nextLong(2000L)))
    val blobB = (0 until 50).map(_ => (20000L + rnd.nextLong(2000L), 20000L + rnd.nextLong(2000L)))
    // sparse scatter: one point per far-away cell — never dense
    val noise = (0 until 20).map(i => (50000L + i * 7000L, 90000L + i * 9000L))
    val pts = blobA ++ blobB ++ noise
    val cell = 1000L
    val got = Geo.dbscanCells(pts.toDF("lat_u", "lon_u"), "lat_u", "lon_u",
        cell, minPts = 4L)
      .select("cell_lat", "cell_lon", "n", "cluster_id")
      .as[(Long, Long, Long, Long)].collect()
    val want = bruteClusters(pts, cell, 4L)
    assert(got.map(r => (r._1, r._2) -> r._4).toMap == want)
    val clusters = got.map(_._4).distinct
    assert(clusters.length >= 2, "blobs must form at least two clusters")
    // the two blobs are 17 cells apart -> never one cluster
    val aIds = got.filter(r => r._1 < 10).map(_._4).toSet
    val bIds = got.filter(r => r._1 >= 10).map(_._4).toSet
    assert(aIds.intersect(bIds).isEmpty)
  }

  test("dbscanCells: negative coordinates and an isolated singleton cluster") {
    // ten points inside ONE all-negative cell (-6, -8): floor division
    // must keep them together (truncation would split the quadrant)
    val blob = (0 until 10).map(i => (-5050L - (i % 3) * 10L, -7050L - (i % 2) * 10L))
    val lone = Seq.fill(5)((30000L, 30000L))
    val got = Geo.dbscanCells((blob ++ lone).toDF("lat_u", "lon_u"),
        "lat_u", "lon_u", 1000L, minPts = 5L)
      .select("cell_lat", "cell_lon", "cluster_id")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 2)
    val neg = got.filter(r => r._1 == -6L && r._2 == -8L)
    assert(neg.length == 1, s"negative cell missing: ${got.toSeq}")
    assert(neg.head._3 == (-6L + 1048576L) * 2097152L + (-8L + 1048576L))
    val loneRow = got.filter(r => r._1 == 30L)
    assert(loneRow.length == 1)
    assert(loneRow.head._3 == (30L + 1048576L) * 2097152L + (30L + 1048576L))
  }

  test("pointInConvexPolygon: interior, exterior, boundary-inclusive, guards") {
    // CCW unit-ish square in micro coords
    val sq = Seq((0L, 0L), (100L, 0L), (100L, 100L), (0L, 100L))
    val pts = Seq(
      (1L, 50L, 50L),   // interior
      (2L, 0L, 0L),     // vertex -> inclusive
      (3L, 100L, 50L),  // edge -> inclusive
      (4L, 101L, 50L),  // just outside
      (5L, -1L, 50L),   // outside, negative
      (6L, 50L, 100L))  // top edge -> inclusive
      .toDF("id", "lat_u", "lon_u")
    val got = Geo.pointInConvexPolygon(pts, "lat_u", "lon_u", sq)
      .select("id", "inside").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> true))
    intercept[IllegalArgumentException] {
      Geo.pointInConvexPolygon(pts, "lat_u", "lon_u", sq.reverse) // clockwise
    }
    intercept[IllegalArgumentException] {
      Geo.pointInConvexPolygon(pts, "lat_u", "lon_u", sq.take(2))
    }
  }

  test("asofEnrichStream: cross-batch state, same-second tie, no-match sentinel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.AsofEvent
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsofEvent]
    val q = StreamingOps.asofEnrichStream(mem.toDS().toDF(), "click", "purchase")
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      // batch 1: click before any purchase (-1); purchase at 20; click at 30
      mem.addData(
        AsofEvent(1L, 1L, 10L, "click", 0.0),
        AsofEvent(1L, 2L, 20L, "purchase", 7.5),
        AsofEvent(1L, 3L, 30L, "click", 0.0))
      q.processAllAvailable()
      // batch 2: the purchase state carries over; a same-second pair —
      // purchase id 5 at t=40 is visible to click id 6 at t=40 (5 < 6)
      // but purchase id 8 at t=50 is NOT visible to click id 7 at t=50
      mem.addData(
        AsofEvent(1L, 4L, 35L, "click", 0.0),
        AsofEvent(1L, 5L, 40L, "purchase", 9.0),
        AsofEvent(1L, 6L, 40L, "click", 0.0),
        AsofEvent(1L, 7L, 50L, "click", 0.0),
        AsofEvent(1L, 8L, 50L, "purchase", 11.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_out")
      .select("event_id", "r_ts", "r_value")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (-1L, 0.0))
    assert(got(3L) == (20L, 7.5))
    assert(got(4L) == (20L, 7.5)) // cross-batch state
    assert(got(6L) == (40L, 9.0)) // same-second, smaller id visible
    assert(got(7L) == (40L, 9.0)) // same-second, larger id NOT visible
  }

  test("hotspot gate: idempotent batch replay, two folds == one pass") {
    val rnd = new scala.util.Random(33L)
    val pts = (0 until 200).map(_ => (rnd.nextLong(20000L), rnd.nextLong(20000L)))
    val (b1, b2) = pts.splitAt(120)
    val stateDir = java.nio.file.Files.createTempDirectory("graft_hs_test_").toString
    graft.streaming.StreamingOps.applyHotspotBatch(
      b1.toDF("lat_u", "lon_u"), 0L, "lat_u", "lon_u", 2000L, stateDir)
    graft.streaming.StreamingOps.applyHotspotBatch(
      b2.toDF("lat_u", "lon_u"), 1L, "lat_u", "lon_u", 2000L, stateDir)
    // replay of an already-committed batch must be a no-op
    graft.streaming.StreamingOps.applyHotspotBatch(
      b2.toDF("lat_u", "lon_u"), 1L, "lat_u", "lon_u", 2000L, stateDir)
    val gate = graft.streaming.StreamingOps
      .hotspotGateResult(spark, stateDir).collect().map(_.toSeq).toSet
    val batch = Geo.hotspotCells(pts.toDF("lat_u", "lon_u"),
      "lat_u", "lon_u", 2000L).collect().map(_.toSeq).toSet
    assert(gate == batch && gate.nonEmpty)
  }
}
