package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Interval max-concurrency (sweep line with day-carry decomposition)
  * against a brute-force per-second scan, and Fellegi–Sunter scoring
  * edge semantics. */
class ConcurrencyFsSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteMax(iv: Seq[(Long, Long)]): Map[Long, Long] = {
    // every day touched by a sweep point; max over seconds of that day
    val points = iv.flatMap { case (s, e) => Seq(s, e + 1) }.distinct.sorted
    val days = points.map(_ / 86400L).distinct
    days.map { d =>
      val secs = points.filter(p => p / 86400L == d) ++ Seq(d * 86400L)
      val m = secs.map(t => iv.count { case (s, e) => s <= t && t <= e }.toLong).max
      d -> m
    }.toMap
  }

  test("maxConcurrency == brute force, midnight spans and coincident instants") {
    val day = 86400L
    val iv = Seq(
      (100L, 200L), (150L, 300L), (200L, 250L),        // overlap stack, shared instant 200
      (250L, 260L), (261L, 270L),                       // touching, never concurrent
      (day - 50L, day + 50L), (day - 10L, day + 100L),  // midnight spanning
      (day + 40L, day + 60L),
      (3 * day + 5L, 3 * day + 6L))                     // isolated far day
    val got = Events.maxConcurrency(
      iv.toDF("s", "e"), "s", "e")
      .as[(Long, Long)].collect().toMap
    val want = bruteMax(iv)
    // engine omits days with no sweep activity; brute enumerates only
    // sweep-point days too, so keys must line up exactly
    assert(got == want, s"got $got want $want")
  }

  test("maxConcurrency: carry-only day dip — max includes the midnight count") {
    // one long interval spans day 1 fully; a short one ENDS early in day 1,
    // so every in-day sweep point is a -1: the max must still report the
    // midnight carry (2), not the post-dip count (1)
    val day = 86400L
    val iv = Seq((0L, 3 * day), (day - 100L, day + 10L))
    val got = Events.maxConcurrency(iv.toDF("s", "e"), "s", "e")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 2L, s"got $got")
  }

  test("fellegiSunter: null agreement contributes zero, thresholds inclusive") {
    val pairs = Seq(
      (1L, Some(true), Some(true)),   // +4 +2 = 6 -> match
      (2L, Some(true), Some(false)),  // +4 -2 = 2 -> possible (>= lower 0)
      (3L, Some(false), Some(false)), // -3 -2 = -5 -> non_match
      (4L, None, Some(true)),         // 0 + 2 = 2 -> possible
      (5L, Some(true), None))         // 4 + 0 = 4 -> match (upper inclusive)
      .toDF("id", "f1", "f2")
    val got = Dedup.fellegiSunter(pairs,
        fields = Seq(("f1", 4L, -3L), ("f2", 2L, -2L)),
        upperMicro = 4L, lowerMicro = 0L)
      .select("id", "score_micro", "fs_class")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (6L, "match"))
    assert(got(2L) == (2L, "possible"))
    assert(got(3L) == (-5L, "non_match"))
    assert(got(4L) == (2L, "possible"))
    assert(got(5L) == (4L, "match"))
  }

  test("fellegiSunter: guards fail loud") {
    val df = Seq((1L, true)).toDF("id", "f")
    intercept[IllegalArgumentException] {
      Dedup.fellegiSunter(df, Seq.empty, 1L, 0L)
    }
    intercept[IllegalArgumentException] {
      Dedup.fellegiSunter(df, Seq(("f", 1L, 2L)), 1L, 0L) // agree <= disagree
    }
    intercept[IllegalArgumentException] {
      Dedup.fellegiSunter(df, Seq(("f", 2L, 1L)), 0L, 1L) // upper < lower
    }
  }

  test("spearman: monotone, anti-monotone, and tie-corrected hand case") {
    val up = (1 to 50).map(i => ("u", i.toDouble, math.exp(i / 10.0)))
    val down = (1 to 50).map(i => ("d", i.toDouble, -i * 3.0))
    val df = (up ++ down).toDF("g", "x", "y")
    val got = graft.ops.Relational.spearmanPerGroup(df, Seq("g"), "x", "y")
      .select("g", "rho_micro").as[(String, Long)].collect().toMap
    assert(got("u") == 1000000L)
    assert(got("d") == -1000000L)

    // hand case with ties: x = (1,2,2,3), y = (10,20,20,40)
    // avg ranks x: 1, 2.5, 2.5, 4; y: 1, 2.5, 2.5, 4 -> rho = 1
    val tied = Seq(("t", 1.0, 10.0), ("t", 2.0, 20.0), ("t", 2.0, 20.0), ("t", 3.0, 40.0))
      .toDF("g", "x", "y")
    val rho = graft.ops.Relational.spearmanPerGroup(tied, Seq("g"), "x", "y")
      .select("rho_micro").as[Long].head()
    assert(rho == 1000000L)

    // x ties against distinct y: x=(5,5,9), y=(1,2,3):
    // rx2 = (3,3,6) ry2 = (2,4,6); pearson((3,3,6),(2,4,6)) = sqrt(3)/2
    val mixed = Seq(("m", 5.0, 1.0), ("m", 5.0, 2.0), ("m", 9.0, 3.0)).toDF("g", "x", "y")
    val rhoM = graft.ops.Relational.spearmanPerGroup(mixed, Seq("g"), "x", "y")
      .select("rho_micro").as[Long].head()
    assert(math.abs(rhoM - math.round(math.sqrt(3.0) / 2.0 * 1e6)) <= 1, s"got $rhoM")
  }
}
