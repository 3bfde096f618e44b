package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class OhlcTwapSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  // 1970-01-02 10:xx UTC — epoch = 86400 + offsets; hour bucket 122400
  private val h = 86400L + 36000L

  test("ohlcBars: open/close by (ts, id) order, ties broken by id") {
    val df = Seq(
      ("A", ts(h + 5), 1L, 5.0),  // tie on ts with id 2 — open is id 1
      ("A", ts(h + 5), 2L, 7.0),  // high
      ("A", ts(h + 1800), 3L, 2.0), // low
      ("A", ts(h + 3599), 4L, 6.0), // close
      ("B", ts(h + 10), 5L, 3.0),   // single-row bar: open=close=3
      ("A", ts(h + 3600), 6L, 9.0)  // next hour — its own bar
    ).toDF("k", "t", "id", "v")
    val out = TimeSeries.ohlcBars(df, "k", "t", "id", "v").orderBy("key", "window_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7)))
    assert(out.toSeq === Seq(
      ("A", h, 5.0, 7.0, 2.0, 6.0, 4L, 20000000L),
      ("A", h + 3600L, 9.0, 9.0, 9.0, 9.0, 1L, 9000000L),
      ("B", h, 3.0, 3.0, 3.0, 3.0, 1L, 3000000L)))
  }

  test("ohlcBars: null values are excluded, not zero-counted") {
    val df = Seq(
      ("A", ts(h + 1), 1L, Some(4.0)),
      ("A", ts(h + 2), 2L, None),
      ("A", ts(h + 3), 3L, Some(8.0))
    ).toDF("k", "t", "id", "v")
    val out = TimeSeries.ohlcBars(df, "k", "t", "id", "v").collect()
    assert(out.length === 1)
    assert(out(0).getLong(6) === 2L) // n_obs skips the null
    assert(out(0).getDouble(2) === 4.0 && out(0).getDouble(5) === 8.0)
  }

  test("streaming ohlcEpoch on a batch frame equals the batch rollup") {
    val df = Seq(
      ("A", ts(h + 5), 1L, 5.0), ("A", ts(h + 5), 2L, 7.0),
      ("A", ts(h + 1800), 3L, 2.0), ("B", ts(h + 10), 4L, 3.0)
    ).toDF("event_type", "ts", "event_id", "value")
    val batch = TimeSeries.ohlcBars(df, keyCol = "event_type", tsCol = "ts",
      idCol = "event_id", valCol = "value").orderBy("key", "window_start")
    val stream = graft.streaming.StreamingOps.ohlcEpoch(df)
      .orderBy("key", "window_start")
    assert(batch.collect().toSeq === stream.collect().toSeq)
  }

  test("ohlcState: per-split states merge into EXACTLY the one-shot bars") {
    val df = Seq(
      ("A", ts(h + 5), 1L, 5.0), ("A", ts(h + 5), 2L, 7.0),
      ("A", ts(h + 1800), 3L, 2.0), ("A", ts(h + 3599), 4L, 6.0),
      ("B", ts(h + 10), 5L, 3.0), ("A", ts(h + 3600), 6L, 9.0)
    ).toDF("k", "t", "id", "v")
    // split so a bar's open and close land in DIFFERENT states — the
    // merge must re-run the (t_us, id) contest, not concatenate
    val s1 = TimeSeries.ohlcState(df.filter(col("id") % 2 === 0), "k", "t", "id", "v")
    val s2 = TimeSeries.ohlcState(df.filter(col("id") % 2 === 1), "k", "t", "id", "v")
    val merged = TimeSeries.ohlcFromState(
      TimeSeries.mergeOhlcStates(s1.unionByName(s2)))
      .orderBy("key", "window_start").collect().toSeq
    val direct = TimeSeries.ohlcBars(df, "k", "t", "id", "v")
      .orderBy("key", "window_start").collect().toSeq
    assert(merged === direct)
  }

  test("twap: interval-hold weighting, last observation carries zero") {
    // A: v=10 held 10s, v=20 held 30s, v=50 held 0
    //    num = 1e7*1e7 + 2e7*3e7 = 7e14; dur = 4e7 us; twap = 17.5
    val df = Seq(
      ("A", ts(0), 1L, 10.0), ("A", ts(10), 2L, 20.0),
      ("A", ts(40), 3L, 50.0)
    ).toDF("k", "t", "id", "v")
    val out = TimeSeries.twap(df, "k", "t", "id", "v").collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 3L)         // n_obs
    assert(out(0).getLong(2) === 40000000L)  // dur_us
    assert(out(0).getLong(3) === 17500000L)  // twap_micro = 17.5
  }

  test("twap: single observation has zero duration and NULL twap") {
    val df = Seq(("A", ts(100), 1L, 42.0)).toDF("k", "t", "id", "v")
    val out = TimeSeries.twap(df, "k", "t", "id", "v").collect()
    assert(out(0).getLong(2) === 0L)
    assert(out(0).isNullAt(3))
  }

  test("twap: equal timestamps contribute zero hold regardless of value") {
    // two obs at the same instant — only the (ts, id)-later one holds
    val df = Seq(
      ("A", ts(0), 1L, 999.0), ("A", ts(0), 2L, 10.0),
      ("A", ts(10), 3L, 10.0)
    ).toDF("k", "t", "id", "v")
    val out = TimeSeries.twap(df, "k", "t", "id", "v").collect()
    assert(out(0).getLong(3) === 10000000L) // the 999 never held
  }

  test("twapState: ordered pairwise folds equal the one-shot state") {
    val df = Seq(
      ("A", ts(0), 1L, 10.0), ("A", ts(10), 2L, 20.0),
      ("A", ts(40), 3L, 50.0), ("A", ts(60), 4L, 30.0),
      ("B", ts(25), 5L, 4.0), ("B", ts(55), 6L, 8.0)
    ).toDF("k", "t", "id", "v")
    val slices = Seq(
      df.filter(col("id") <= 2), // A's first two
      df.filter(col("id") === 3L || col("id") === 5L),
      df.filter(col("id") >= 4L && col("id") =!= 5L))
      .map(TimeSeries.twapState(_, "k", "t", "id", "v"))
    val folded = slices.reduceLeft(TimeSeries.mergeTwapStates)
    val oneShot = TimeSeries.twap(df, "k", "t", "id", "v")
      .orderBy("key").collect().map(_.toSeq)
    val viaFold = TimeSeries.twapFromState(folded)
      .orderBy("key").collect().map(_.toSeq)
    assert(viaFold.toSeq === oneShot.toSeq)
  }

  test("twap: exact half rounds up (round-half-up contract)") {
    // v=1 held 1us, v=2 held 1us, last 0: num=3e6, dur=2 -> 1.5e6 + r
    // r = 0; pick values so num/dur has remainder exactly den/2:
    // v_micro 1 held 1us + v_micro 2 held 1us => num 3, dur 2 -> 1.5 -> 2
    val df = Seq(
      ("A", Timestamp.valueOf("1970-01-01 00:00:00.000001"), 1L, 0.000001),
      ("A", Timestamp.valueOf("1970-01-01 00:00:00.000002"), 2L, 0.000002),
      ("A", Timestamp.valueOf("1970-01-01 00:00:00.000003"), 3L, 0.0)
    ).toDF("k", "t", "id", "v")
    val out = TimeSeries.twap(df, "k", "t", "id", "v").collect()
    assert(out(0).getLong(2) === 2L)
    assert(out(0).getLong(3) === 2L) // floor 1 + half-up carry
  }
}
