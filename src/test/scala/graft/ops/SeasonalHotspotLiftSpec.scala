package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.{Events, TextAnalysis}

/** Round-9 batch: classical seasonal decomposition (planted pattern
  * recovery, zero-fill semantics), hotspot cells vs brute force,
  * run-length islands, session lift exactness, Dunning G² hand case,
  * and the geo-radius TVF face. */
class SeasonalHotspotLiftSpec extends SparkTestBase {
  import spark.implicits._

  test("classicalSeasonal recovers a planted period-4 pattern on a flat base") {
    // x_t = 10 + s_{t mod 4}, s = (+2, 0, -1, -1): the centered MA of a
    // constant-mean periodic series is exactly the base, so detrended
    // values equal the seasonal component wherever the window is full
    val s4 = Seq(2L, 0L, -1L, -1L)
    val xs = (0L until 40L).map(t => ("k", t, 10L + s4((t % 4).toInt)))
    val got = TimeSeries.classicalSeasonal(xs.toDF("g", "t", "x"), "g", "t", "x",
        period = 4)
      .select("phase", "seasonal_micro").as[(Long, Long)].collect().toMap
    s4.zipWithIndex.foreach { case (want, p) =>
      assert(got(p.toLong) == want * 1000000L, s"phase $p: ${got(p.toLong)}")
    }
  }

  test("classicalSeasonal zero-fills gaps: omitted bucket == explicit zero") {
    val base = (0L until 30L).map(t => ("k", t, (t % 3) + 1L))
    val withZero = base.map { case (g, t, x) => (g, t, if (t == 13L) 0L else x) }
    val omitted = withZero.filterNot(_._2 == 13L)
    val a = TimeSeries.classicalSeasonal(withZero.toDF("g", "t", "x"), "g", "t", "x", 6)
      .orderBy("phase").collect().toSeq
    val b = TimeSeries.classicalSeasonal(omitted.toDF("g", "t", "x"), "g", "t", "x", 6)
      .orderBy("phase").collect().toSeq
    assert(a == b)
  }

  test("hotspotCells == brute force on a planted cluster") {
    val rnd = new scala.util.Random(7L)
    val scatter = (0 until 60).map(_ => (rnd.nextLong(10000L), rnd.nextLong(10000L)))
    val cluster = (0 until 40).map(_ => (2500L + rnd.nextLong(400L), 2500L + rnd.nextLong(400L)))
    val pts = scatter ++ cluster
    val cell = 1000L
    val got = Geo.hotspotCells(pts.toDF("lat_u", "lon_u"), "lat_u", "lon_u",
        cell, factorNum = 3L, factorDen = 2L)
      .select("cell_lat", "cell_lon", "n", "s_neigh", "hot_micro", "is_hot")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    val cells = pts.groupBy(p => (p._1 / cell, p._2 / cell)) // all coords >= 0
      .map { case (k, v) => k -> v.size.toLong }
    val nTot = pts.size.toLong
    val nCells = cells.size.toLong
    got.foreach { case (cl, cn, n, s, hm, hot) =>
      assert(cells((cl, cn)) == n)
      val sWant = (for (dl <- -1L to 1L; dn <- -1L to 1L)
        yield cells.getOrElse((cl + dl, cn + dn), 0L)).sum
      assert(s == sWant, s"cell ($cl,$cn)")
      assert(hm == s * nCells * 1000000L / (9L * nTot))
      assert(hot == (s * nCells * 2L > 3L * 9L * nTot))
    }
    assert(got.exists(_._6), "planted cluster must flag at least one hot cell")
    assert(got.exists(!_._6), "scatter must leave cold cells")
    assert(got.length == nCells)
  }

  test("runLength: hand sequence with an interleaved user") {
    val ev = Seq(
      (1L, 10L, 1L, "a", 0.0, ""), (2L, 11L, 1L, "a", 0.0, ""),
      (3L, 12L, 1L, "b", 0.0, ""), (4L, 13L, 1L, "a", 0.0, ""),
      (5L, 10L, 2L, "a", 0.0, ""), (6L, 20L, 2L, "a", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", (col("ts") * 1000000000L)) // nano-long encoding path
    val got = Events.runLength(ev)
      .select("user_id", "run_seq", "event_type", "run_len", "t_start", "t_end")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, "a", 2L, 10L, 11L),
      (1L, 2L, "b", 1L, 12L, 12L),
      (1L, 3L, "a", 1L, 13L, 13L),
      (2L, 1L, "a", 2L, 10L, 20L)))
  }

  test("sessionLift: hand sessions, exact counts and integer lift") {
    // user 1: one session with {a, b}; user 2: one session {a}; user 3: {b};
    // a 40-min gap splits user 4 into {a} and {a, b}
    def e(id: Long, u: Long, sec: Long, t: String) = (id, sec * 1000000000L, u, t, 0.0, "")
    val ev = Seq(
      e(1, 1, 100, "a"), e(2, 1, 200, "b"),
      e(3, 2, 100, "a"), e(4, 3, 100, "b"),
      e(5, 4, 100, "a"), e(6, 4, 100 + 2401, "a"), e(7, 4, 100 + 2500, "b"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.sessionLift(ev)
      .select("a", "b", "n_a", "n_b", "n_ab", "lift_micro")
      .as[(String, String, Long, Long, Long, Long)].collect()
    // sessions: {a,b}, {a}, {b}, {a}, {a,b} -> N=5, n_a=4, n_b=3, n_ab=2
    assert(got.toSeq == Seq(("a", "b", 4L, 3L, 2L, 2L * 5L * 1000000L / 12L)))
  }

  test("collocations: hand corpus, exact counts and G² against local reference") {
    val docs = Seq.fill(6)("new york is big") ++ Seq.fill(4)("new deal is old") ++
      Seq.fill(5)("york is far")
    val got = TextAnalysis.collocations(docs.toDF("text"), minCount = 5L)
      .select("w1", "w2", "n_ab", "g2_micro")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // bigram stream: 6*3 + 4*3 + 5*2 = 40 total
    val n = 40.0
    def g2(k11: Long, na: Long, nb: Long): Double = {
      def term(k: Double, r: Double, c: Double) =
        if (k == 0) 0.0 else k * math.log(k * n / (r * c))
      2.0 * (term(k11, na, nb) + term(na - k11, na, n - nb) +
        term(nb - k11, n - na, nb) + term(n - na - nb + k11, n - na, n - nb))
    }
    // "new york": 6 of n_a("new")=10, n_b("york")=6; "is big" 6/15,6; etc.
    assert(got(("new", "york"))._1 == 6L)
    assert(got(("york", "is"))._1 == 11L)
    assert(!got.contains(("new", "deal"))) // 4 < minCount
    // exact G² for ("new","york"): k11=6, n_a=10, n_b=6
    assert(math.abs(got(("new", "york"))._2 - math.round(g2(6, 10, 6) * 1e6)) <= 1)
    // ("york","is"): york as w1 appears in "york is" from both doc kinds: 6+5=11; is=15
    assert(math.abs(got(("york", "is"))._2 - math.round(g2(11, 11, 15) * 1e6)) <= 1)
  }

  test("graft_geo_radius TVF == Scala API result set") {
    graft.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(3L)
    val a = (0 until 80).map(i => (i.toLong, rnd.nextLong(5000L), rnd.nextLong(5000L)))
    val b = (0 until 70).map(i => (i.toLong, rnd.nextLong(5000L), rnd.nextLong(5000L)))
    a.toDF("aid", "lat_u", "lon_u").createOrReplaceTempView("geo_tvf_a")
    b.toDF("bid", "lat_u", "lon_u").createOrReplaceTempView("geo_tvf_b")
    val viaTvf = spark.sql(
      "SELECT aid, bid, dist2 FROM graft_geo_radius('geo_tvf_a', 'geo_tvf_b', 'lat_u', 'lon_u', 600)")
      .as[(Long, Long, Long)].collect().toSet
    val viaApi = Geo.gridRadiusJoin(
        a.toDF("aid", "lat_u", "lon_u"), b.toDF("bid", "lat_u", "lon_u"),
        "lat_u", "lon_u", 600L)
      .select("aid", "bid", "dist2").as[(Long, Long, Long)].collect().toSet
    assert(viaTvf == viaApi && viaApi.nonEmpty)
  }
}
