package graft.ops

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  test("point-in-interval matches inclusive bounds, once per covering interval") {
    import spark.implicits._
    val points = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (1L, 999L, "p3"), (2L, 100L, "p4"))
      .toDF("k", "ts", "tag")
    val intervals = Seq((1L, 100L, 200L, "iA"), (1L, 200L, 300L, "iB"), (2L, 500L, 600L, "iC"))
      .toDF("k", "lo", "hi", "name")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "lo", "hi",
      bucketWidth = 50L)
      .select("tag", "name").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // p1 at 100: covered by iA (inclusive start); p2 at 250: iB;
    // overlapping boundary 200 belongs to both iA and iB; p3/p4 uncovered
    assert(got === Set(("p1", "iA"), ("p2", "iB")))
  }

  test("boundary point in two touching intervals matches both, exactly once each") {
    import spark.implicits._
    val points = Seq((1L, 200L, "edge")).toDF("k", "ts", "tag")
    val intervals = Seq((1L, 100L, 200L, "iA"), (1L, 200L, 300L, "iB"))
      .toDF("k", "lo", "hi", "name")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "lo", "hi", 64L)
      .select("name").collect().map(_.getString(0)).sorted.toSeq
    assert(got === Seq("iA", "iB"))
  }

  test("randomized: agrees with a brute-force cross-filter reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val points = (1 to 400).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val intervals = (1 to 120).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (rnd.nextInt(4).toLong, lo, lo + rnd.nextInt(300).toLong, i.toLong)
    }
    val got = RangeJoin.pointInInterval(
      points.toDF("k", "ts", "pid"), intervals.toDF("k", "lo", "hi", "iid"),
      Seq("k"), "ts", "lo", "hi", bucketWidth = 64L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      (pk, ts, pid) <- points
      (ik, lo, hi, iid) <- intervals
      if pk == ik && ts >= lo && ts <= hi
    } yield (pid, iid)).sorted
    assert(got === expected)
  }

  test("wide intervals with tiny buckets still dedup-free") {
    import spark.implicits._
    val points = Seq((1L, 5000L, "p")).toDF("k", "ts", "tag")
    val intervals = Seq((1L, 0L, 10000L, "wide")).toDF("k", "lo", "hi", "name")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "ts", "lo", "hi", 10L)
    assert(got.count() === 1)
  }

  test("intervalOverlap matches brute force and emits each pair once") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lhs = (1 to 120).map { i =>
      val s = rnd.nextInt(500).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(80), i.toLong)
    }
    val rhs = (1 to 120).map { i =>
      val s = rnd.nextInt(500).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(80), i.toLong)
    }
    val got = RangeJoin.intervalOverlap(
      lhs.toDF("k", "ls", "le", "lid"), rhs.toDF("k", "rs", "re", "rid"),
      Seq("k"), "ls", "le", "rs", "re", bucketWidth = 16L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      (lk, ls, le, lid) <- lhs
      (rk, rs, re, rid) <- rhs
      if lk == rk && ls <= re && rs <= le
    } yield (lid, rid)).sorted
    assert(got === expected) // equality (not set-equality): duplicates would fail
  }

  test("intervalOverlap: pairs sharing many buckets appear exactly once") {
    import spark.implicits._
    val l = Seq((1L, 0L, 1000L, "L")).toDF("k", "ls", "le", "ln")
    val r = Seq((1L, 500L, 900L, "R")).toDF("k", "rs", "re", "rn")
    assert(RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re", 10L).count() === 1)
  }

  test("intervalOverlap: touching endpoints are inclusive, disjoint are not") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L, 1L)).toDF("k", "ls", "le", "lid")
    val r = Seq((1L, 10L, 20L, 1L), (1L, 11L, 20L, 2L)).toDF("k", "rs", "re", "rid")
    val got = RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re", 7L)
      .select("rid").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }
}
