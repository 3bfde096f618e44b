package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Randomized adversaries for the pruned-join operators whose claim is
  * exactness: as-of join (equal-timestamp ties, empty sides, keys with
  * no match), range join (intervals and points landing exactly on
  * bucket edges, zero-width intervals, bucket widths far from the
  * median width), and interval-overlap (owner-bucket exactly-once under
  * many shared buckets). Each scenario compares against an in-JVM
  * brute-force reference.
  */
class JoinExactnessPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("as-of backward/forward == brute force over 20 random tapes") {
    (0 until 20).foreach { scenario =>
      val rnd = new scala.util.Random(scenario)
      // small ts domain forces heavy ties — the boundary semantics
      val lefts = (0 until 40 + rnd.nextInt(60)).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(25).toLong, i.toLong))
      val rights = (0 until 40 + rnd.nextInt(60)).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(25).toLong, i.toLong, rnd.nextInt(100) * 1.0))
      val l = lefts.toDF("k", "ts", "lid")
      val r = rights.toDF("k", "ts", "rid", "price")
      def brute(forward: Boolean): Map[Long, Option[Double]] =
        lefts.map { case (k, ts, lid) =>
          val c = rights.filter(x => x._1 == k && (if (forward) x._2 >= ts else x._2 <= ts))
          val best =
            if (c.isEmpty) None
            else if (forward) {
              val m = c.map(_._2).min
              Some(c.filter(_._2 == m).minBy(_._3)._4) // min tiebreak
            } else {
              val m = c.map(_._2).max
              Some(c.filter(_._2 == m).maxBy(_._3)._4) // max tiebreak
            }
          lid -> best
        }.toMap
      def run(forward: Boolean): Map[Long, Option[Double]] = {
        val out = if (forward)
          AsOfJoin.forward(l, r, Seq("k"), "ts", pick = Seq("price"),
            tiebreakCol = Some("rid"))
        else
          AsOfJoin.backward(l, r, Seq("k"), "ts", pick = Seq("price"),
            tiebreakCol = Some("rid"))
        out.collect().map(row => row.getLong(row.fieldIndex("lid")) ->
          (if (row.isNullAt(row.fieldIndex("price_asof"))) None
           else Some(row.getDouble(row.fieldIndex("price_asof"))))).toMap
      }
      assert(run(forward = false) === brute(forward = false), s"scenario $scenario backward")
      assert(run(forward = true) === brute(forward = true), s"scenario $scenario forward")
    }
  }

  test("range join == brute force over 20 random interval sets incl. bucket edges") {
    (0 until 20).foreach { scenario =>
      val rnd = new scala.util.Random(100 + scenario)
      val bucketWidth = 1L + rnd.nextInt(20)
      // half the endpoints snap to bucket multiples: edge adversaries
      def t(): Long = {
        val v = rnd.nextInt(200).toLong
        if (rnd.nextBoolean()) (v / bucketWidth) * bucketWidth else v
      }
      val points = (0 until 60).map(i => (rnd.nextInt(3).toLong, t(), i.toLong))
      val intervals = (0 until 40).map { i =>
        val a = t(); val b = t()
        (rnd.nextInt(3).toLong, math.min(a, b), math.max(a, b), i.toLong)
      }
      val got = RangeJoin.pointInInterval(
        points.toDF("k", "ts", "pid"), intervals.toDF("k", "s", "e", "iid"),
        Seq("k"), "ts", "s", "e", bucketWidth)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (pk, ts, pid) <- points
        (ik, s, e, iid) <- intervals
        if pk == ik && ts >= s && ts <= e
      } yield (pid, iid)).toSet
      assert(got === brute, s"scenario $scenario bucketWidth=$bucketWidth")
    }
  }

  test("interval overlap == brute force, each pair exactly once, over 20 sets") {
    (0 until 20).foreach { scenario =>
      val rnd = new scala.util.Random(200 + scenario)
      val bucketWidth = 1L + rnd.nextInt(10)
      def iv(i: Int, tag: Long) = {
        val a = rnd.nextInt(120).toLong; val len = rnd.nextInt(40).toLong // incl. wide spans
        (rnd.nextInt(2).toLong, a, a + len, tag * 1000 + i)
      }
      val lefts = (0 until 30).map(i => iv(i, 1L))
      val rights = (0 until 30).map(i => iv(i, 2L))
      val out = RangeJoin.intervalOverlap(
        lefts.toDF("k", "ls", "le", "lid"), rights.toDF("k", "rs", "re", "rid"),
        Seq("k"), "ls", "le", "rs", "re", bucketWidth)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = (for {
        (lk, ls, le, lid) <- lefts
        (rk, rs, re, rid) <- rights
        if lk == rk && ls <= re && rs <= le
      } yield (lid, rid)).toSet
      assert(out.toSet === brute, s"scenario $scenario missing/extra pairs")
      assert(out.length === out.toSet.size,
        s"scenario $scenario: duplicates — owner-bucket exactly-once violated")
    }
  }
}
