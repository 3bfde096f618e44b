package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("forecastBaselineErrors: hand MAEs, short-key NULLs, positional lags") {
    import spark.implicits._
    // key a: x = 1,3,2,6 -> naive |d| = 2,1,4 -> MAE = 7/3 (floor micro);
    // season 2: |2-1|,|6-3| = 1,3 -> MAE = 2
    val df = (Seq((1L, 1.0), (2L, 3.0), (3L, 2.0), (4L, 6.0)).map {
      case (t, x) => ("a", t, x) } :+ (("b", 1L, 5.0))).toDF("k", "t", "x")
    val got = TimeSeries.forecastBaselineErrors(df, "k", "t", "x", season = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(4)) === (4L, 3L, 2L))
    assert(a.getLong(3) === 7000000L / 3L) // exact floor division
    assert(a.getLong(5) === 2000000L)
    // single-observation key: no lags -> 0 comparisons, NULL MAEs
    val b = got("b")
    assert(b.getLong(2) === 0L && b.isNullAt(3) && b.isNullAt(5))
  }

  test("rollingOriginFolds: window arithmetic, per-key t_max, future rows excluded") {
    import spark.implicits._
    // key a observed on days 1..10; folds=2, horizon=3:
    // fold 1: end = 10-3 = 7 -> test (4,7], train <= 4; day 8-10 excluded
    // fold 2: end = 10 -> test (7,10], train <= 7
    val df = (1L to 10L).map(t => ("a", t, 1.0)).toDF("k", "t", "x")
    val got = TimeSeries.rollingOriginFolds(df, "k", "t", folds = 2, horizon = 3L)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getString(3)).toMap
    (1L to 4L).foreach(t => assert(got((t, 1L)) === "train"))
    (5L to 7L).foreach(t => assert(got((t, 1L)) === "test"))
    (8L to 10L).foreach(t => assert(!got.contains((t, 1L)))) // excluded: future
    (1L to 7L).foreach(t => assert(got((t, 2L)) === "train"))
    (8L to 10L).foreach(t => assert(got((t, 2L)) === "test"))
    // a short-lived key backtests over its OWN span
    val two = df.unionByName(Seq(("b", 3L, 1.0), ("b", 4L, 1.0)).toDF("k", "t", "x"))
    val gb = TimeSeries.rollingOriginFolds(two, "k", "t", 1, 1L)
      .filter($"k" === "b")
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(gb === Map(3L -> "train", 4L -> "test"))
  }

  test("grid spans each key's own observed range; gaps interpolate linearly") {
    // key A: observations at t=0 (v=10) and t=40 (v=50), step 10
    //        -> grid 0,10,20,30,40 with 20/30/40 interpolated
    // key B: single observation -> single grid row
    val df = Seq(
      ("A", 0L, 10.0), ("A", 40L, 50.0),
      ("B", 100L, 7.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.gapFillInterpolate(df, "k", "ts", "v", step = 10L)
      .orderBy("k", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("A", 0L, 10.0, true),
      ("A", 10L, 20.0, false),
      ("A", 20L, 30.0, false),
      ("A", 30L, 40.0, false),
      ("A", 40L, 50.0, true),
      ("B", 100L, 7.0, true)))
  }

  test("same-bucket values sum exactly through decimal state") {
    val df = Seq(("A", 3L, 0.1), ("A", 7L, 0.2), ("A", 23L, 1.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.gapFillInterpolate(df, "k", "ts", "v", step = 10L)
      .orderBy("bucket").collect()
    assert(out.length === 3) // buckets 0, 10, 20
    assert(out(0).getDouble(2) === 0.3) // 0.1 + 0.2 exact via DECIMAL
    assert(!out(1).getBoolean(3)) // bucket 10 interpolated
    assert(out(2).getDouble(2) === 1.0)
  }

  test("one shuffle for observation aggregation; no driver-side grid") {
    val df = (1L to 1000L).map(i => ("k" + (i % 7), i * 13L, 1.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.gapFillInterpolate(df, "k", "ts", "v", step = 100L)
    // correctness of shape: every key's buckets are contiguous at step 100
    val rows = out.groupBy("k")
      .agg(count(lit(1)).as("n"), min("bucket").as("mn"), max("bucket").as("mx"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === (r.getLong(3) - r.getLong(2)) / 100L + 1L,
        s"non-contiguous grid for ${r.getString(0)}")
    }
    // the grid generation must be an Expand/Generate, not a driver loop:
    // plan contains Generate(explode(sequence)) and exactly two exchanges
    // before AQE (obs groupBy + span groupBy reuse the key partitioning;
    // the left join and windows reuse it too)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("explode(sequence("), s"grid not plan-side:\n$plan")
  }

  test("seasonalAnomaly flags exactly the cells over the rational threshold") {
    import spark.implicits._
    // key "a", hour 0 over 3 days: counts 1, 1, 10 -> only the 10 flags
    // at 1.5x mean (10*3*2 > 3*12); hour 1 uniform -> nothing flags
    def secs(day: Long, hour: Long, n: Int) =
      Seq.fill(n)(day * 86400L + hour * 3600L + 42L)
    val rows = (secs(0, 0, 1) ++ secs(1, 0, 1) ++ secs(2, 0, 10) ++
      secs(0, 1, 3) ++ secs(1, 1, 3) ++ secs(2, 1, 3)).map(("a", _))
    val got = TimeSeries.seasonalAnomaly(rows.toDF("k", "sec"), "sec", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(("a", 2L, 0L, 10L, 3L, 12L)))
  }

  test("seasonalAnomaly threshold is strict and the factor validated") {
    import spark.implicits._
    // counts 1, 1, 4 at one hour: total 6, cells 3 -> at factor 2/1 the
    // comparison lands exactly on the boundary (4*3*1 = 2*6): NOT flagged
    val rows = (Seq.fill(1)(0L * 86400L) ++ Seq.fill(1)(1L * 86400L) ++
      Seq.fill(4)(2L * 86400L)).map(("k", _))
    assert(TimeSeries.seasonalAnomaly(rows.toDF("k", "sec"), "sec", "k",
      factorNum = 2L, factorDen = 1L).collect().isEmpty)
    intercept[IllegalArgumentException](TimeSeries.seasonalAnomaly(
      rows.toDF("k", "sec"), "sec", "k", factorNum = 1L, factorDen = 2L))
  }
}
