package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Randomized differential batteries for the round-14 operator families
  * — in-JVM brute-force references over seeded adversarial tapes, the
  * discipline every "exact despite cleverness" operator here carries.
  * Ties saturate every tape: equal timestamps, duplicate values, and
  * equal distances are exactly where union+window tricks and
  * lower-quantile cuts go wrong silently. */
class Round14PropertySpec extends SparkTestBase {
  import spark.implicits._

  test("nearest as-of equals the O(n^2) brute force on tie-saturated tapes") {
    val rnd = new scala.util.Random(41)
    for (round <- 0 until 3) {
      // timestamps drawn from a SMALL domain so equal-ts and
      // equal-distance cases appear constantly
      val left = (0 until 120).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(30).toLong, i.toLong))
      val right = (0 until 80).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(30).toLong, (1000 + i).toLong))
      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "rid")
      val got = AsOfJoin.nearest(lDf, rDf, Seq("k"), "t",
          pick = Seq("rid"), suffix = "_n", tiebreakCol = Some("rid"))
        .collect().map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      // brute force: backward = max-ts <= t (ties -> max rid);
      // forward = min-ts >= t (ties -> min rid); nearest prefers
      // backward on equal distance
      left.foreach { case (k, t, lid) =>
        val cands = right.filter(_._1 == k)
        val bk = cands.filter(_._2 <= t) match {
          case Seq() => None
          case cs =>
            val mt = cs.map(_._2).max
            Some((mt, cs.filter(_._2 == mt).map(_._3).max))
        }
        val fw = cands.filter(_._2 >= t) match {
          case Seq() => None
          case cs =>
            val mt = cs.map(_._2).min
            Some((mt, cs.filter(_._2 == mt).map(_._3).min))
        }
        val want = (bk, fw) match {
          case (None, None) => None
          case (Some((_, r)), None) => Some(r)
          case (None, Some((_, r))) => Some(r)
          case (Some((bt, br)), Some((ft, fr))) =>
            if (t - bt <= ft - t) Some(br) else Some(fr)
        }
        assert(got(lid) === want, s"round $round lid=$lid k=$k t=$t")
      }
    }
  }

  test("interArrival equals a local reference on random bursty tapes") {
    val rnd = new scala.util.Random(43)
    val rows = (0 until 400).map(i =>
      ("k" + rnd.nextInt(3), rnd.nextInt(50).toLong, i.toLong))
    val got = graft.ext.Events.interArrival(
        rows.toDF("k", "sec", "id"), "k", "sec", "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.groupBy(_._1).foreach { case (k, es) =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = ordered.zip(ordered.tail).map { case (a, b) => b - a }.sorted
      val n = gaps.size.toLong
      def lowerQ(num: Long, den: Long): Long = {
        // min gap value whose cumulative count * den >= total * num
        val counts = gaps.groupBy(identity).view.mapValues(_.size.toLong)
        val distinct = gaps.distinct
        var cum = 0L
        distinct.collectFirst {
          case g if { cum += counts(g); cum * den >= n * num } => g
        }.get
      }
      val mean = (BigInt(gaps.sum) * 2000000 + n) / (2 * n)
      val (gn, p50, p90, mm) = got(k)
      assert(gn === n, s"$k n_gaps")
      assert(p50 === lowerQ(1, 2), s"$k p50")
      assert(p90 === lowerQ(9, 10), s"$k p90")
      assert(mm === mean.toLong, s"$k mean")
    }
  }

  test("robustScale equals a local reference incl. duplicates and negatives") {
    val rnd = new scala.util.Random(47)
    val rows = (0 until 500).map(_ =>
      ("g" + rnd.nextInt(3), (rnd.nextInt(41) - 20).toDouble))
    val got = graft.ext.Features.robustScale(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val cuts = rows.groupBy(_._1).map { case (g, vs) =>
      val micro = vs.map(v => math.round(v._2 * 1e6)).sorted
      val n = micro.size.toLong
      def lowerQ(num: Long, den: Long): Long = {
        val counts = micro.groupBy(identity).view.mapValues(_.size.toLong)
        var cum = 0L
        micro.distinct.collectFirst {
          case m if { cum += counts(m); cum * den >= n * num } => m
        }.get
      }
      g -> (lowerQ(1, 4), lowerQ(1, 2), lowerQ(3, 4))
    }
    got.foreach { case (g, v, r) =>
      val (q1, med, q3) = cuts(g)
      if (q3 > q1) {
        val num = BigInt(math.round(v * 1e6) - med) * 1000000
        val den = BigInt(q3 - q1)
        val rm = ((num % den) + den) % den
        val half = (num - rm) / den + (if (rm * 2 >= den) 1 else 0)
        assert(r === Some(half.toLong), s"$g v=$v")
      } else assert(r === None, s"$g degenerate IQR")
    }
  }
}
