package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Property battery for the round-17 shared machinery:
  * [[Relational.cumBeforeByKey]] — the range-partitioned strictly-before
  * cumulative every rank/quantile/conformal operator rides. Random
  * histograms compare against an in-JVM prefix sum across partition
  * counts, key distributions, and multi-column count sets; the
  * partition-boundary stitching is exactly what a bug would corrupt. */
class CumBeforeByKeySpec extends SparkTestBase {
  import spark.implicits._

  private def reference(rows: Seq[(Long, Long, Long)])
      : Map[Long, (Long, Long)] = {
    // (key, cntA, cntB) -> key -> (cumbA, cumbB): sums over strictly
    // smaller keys
    val sorted = rows.sortBy(_._1)
    var (ca, cb) = (0L, 0L)
    val out = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    sorted.foreach { case (k, a, b) =>
      out(k) = (ca, cb); ca += a; cb += b
    }
    out.toMap
  }

  test("random histograms: cumb/tot match the in-JVM prefix sum for every cell") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 50 + rnd.nextInt(400)
      // keys drawn sparse-and-clustered so range partitions land
      // boundaries inside tie-free AND dense regions
      val rows = (1 to n).map { _ =>
        val k = (rnd.nextInt(40) * 1000 + rnd.nextInt(3)).toLong
        (k, rnd.nextInt(5).toLong, rnd.nextInt(100).toLong)
      }.groupBy(_._1).map { case (k, g) =>
        (k, g.map(_._2).sum, g.map(_._3).sum)
      }.toSeq
      val want = reference(rows)
      val wantTotA = rows.map(_._2).sum
      val wantTotB = rows.map(_._3).sum
      val got = Relational.cumBeforeByKey(
        rows.toDF("k", "a", "b"), "k", Seq("a", "b"))
        .collect().map(r => (r.getAs[Long]("k"),
          r.getAs[Long]("__cumb_a"), r.getAs[Long]("__cumb_b"),
          r.getAs[Long]("__tot_a"), r.getAs[Long]("__tot_b")))
      assert(got.length === rows.length, s"trial $trial row count")
      got.foreach { case (k, cba, cbb, ta, tb) =>
        assert((cba, cbb) === want(k), s"trial $trial key $k")
        assert((ta, tb) === (wantTotA, wantTotB), s"trial $trial totals")
      }
    }
  }

  test("single cell, empty frame, and zero-count columns behave") {
    val one = Relational.cumBeforeByKey(
      Seq((7L, 3L, 0L)).toDF("k", "a", "b"), "k", Seq("a", "b")).head()
    assert((one.getAs[Long]("__cumb_a"), one.getAs[Long]("__cumb_b"),
      one.getAs[Long]("__tot_a"), one.getAs[Long]("__tot_b")) ===
      (0L, 0L, 3L, 0L))
    val empty = Relational.cumBeforeByKey(
      Seq.empty[(Long, Long)].toDF("k", "a"), "k", Seq("a"))
    assert(empty.count() === 0L)
  }

  test("duplicate keys: every duplicate row gets the same strictly-before sum") {
    // keys intentionally repeated across rows (NOT pre-aggregated) —
    // the RANGE-frame cumulative must hand every duplicate of a key
    // the identical sum over strictly smaller keys, independent of
    // intra-partition row order among equal keys
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(5).toLong, rnd.nextInt(9).toLong)
    }
    val byKey = rows.groupBy(_._1).map { case (k, g) =>
      (k, g.map(_._2).sum, g.map(_._3).sum) }.toSeq
    val want = reference(byKey)
    val got = Relational.cumBeforeByKey(
      rows.toDF("k", "a", "b"), "k", Seq("a", "b"))
      .collect().map(r => (r.getAs[Long]("k"),
        r.getAs[Long]("__cumb_a"), r.getAs[Long]("__cumb_b")))
    assert(got.length === rows.length)
    got.foreach { case (k, cba, cbb) =>
      assert((cba, cbb) === want(k), s"key $k")
    }
  }

  test("partition-count invariance: 1, 4, and 32 shuffle partitions agree") {
    val rows = (1L to 300L).map(i => (i * 7 % 101, 1L)).groupBy(_._1)
      .map { case (k, g) => (k, g.map(_._2).sum) }.toSeq
    def run(parts: String): Map[Long, (Long, Long)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Relational.cumBeforeByKey(rows.toDF("k", "a"), "k", Seq("a"))
        .collect().map(r => r.getAs[Long]("k") ->
          (r.getAs[Long]("__cumb_a"), r.getAs[Long]("__tot_a"))).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val r1 = run("1")
    assert(run("4") === r1 && run("32") === r1)
  }
}
