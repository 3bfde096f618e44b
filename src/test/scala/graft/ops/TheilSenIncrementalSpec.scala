package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.ext.TextAnalysis
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.RunEvent

/** Round-9 batch 3: Theil–Sen hand cases + outlier robustness, the two
  * exact monoid-state identities (cell counts, bigram counts), and the
  * streaming run-length operator's cross-batch state. */
class TheilSenIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  test("theilSen: exact slope on a line, unmoved by one wild outlier") {
    val line = (0L until 20L).map(t => ("clean", t, 5L + 3L * t))
    val dirty = (0L until 20L).map(t => ("dirty", t, if (t == 7L) 100000L else 5L + 3L * t))
    val got = TimeSeries.theilSen((line ++ dirty).toDF("g", "t", "x"), "g", "t", "x")
      .select("g", "n_pairs", "slope_micro").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("clean") == (190L, 3000000L))
    // 19 of 190 pairs touch the outlier; the median is still exactly 3
    assert(got("dirty") == (190L, 3000000L))
  }

  test("theilSen: even pair count averages the two middles") {
    // t = 0,1,2,3 with x = 0,1,2,10: slopes (pairs in t order):
    // 1,1,10/3, 1,9/2,8 -> sorted: 1,1,1,10/3,9/2,8 ; m=6 -> avg(1, 10/3)
    val df = Seq(("k", 0L, 0L), ("k", 1L, 1L), ("k", 2L, 2L), ("k", 3L, 10L))
      .toDF("g", "t", "x")
    val got = TimeSeries.theilSen(df, "g", "t", "x")
      .select("n_pairs", "slope_micro").as[(Long, Long)].head()
    assert(got._1 == 6L)
    assert(got._2 == math.round((1.0 + 10.0 / 3.0) / 2 * 1e6))
  }

  test("ewma: hand recurrence incl. floor quantization and key isolation") {
    // alpha = 1/2: s_1 = 8e6; s_2 = (4e6*1e6/2 ... ) hand values below;
    // the odd x=1 step exercises the floor division
    val df = Seq(("a", 1L, 8L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("b", 1L, 3L)).toDF("k", "t", "x")
    val got = TimeSeries.ewma(df, "k", "t", "x", alphaMicro = 500000L)
      .select("k", "t", "ewma_micro").as[(String, Long, Long)]
      .collect().toSet
    // a: s1 = 8_000_000; s2 = (.5*0 + .5*8e6) = 4_000_000;
    //    s3 = (500000*1e6 + 500000*4e6) / 1e6 = 2_500_000
    // b: s1 = 3_000_000 (keys fold independently)
    assert(got === Set(("a", 1L, 8000000L), ("a", 2L, 4000000L),
      ("a", 3L, 2500000L), ("b", 1L, 3000000L)))
  }

  test("ewma: exact past the old int64 product cliff, up to the domain edge") {
    // The naive alphaMicro*x*1e12 product wraps Long past x ~ 9.2e6; the
    // split recurrence must stay EXACT there. Differential vs a BigInt
    // replay of the spec recurrence at adversarial magnitudes spanning
    // just-below-cliff, just-above-cliff, and the 1e9-1 domain edge.
    val alpha = 250000L
    val xs = Seq(9222372L, 9222373L, 37000000L, 123456789L, 999999999L, 0L,
      999999999L, 7L)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "t", "x")
    val got = TimeSeries.ewma(df, "k", "t", "x", alpha)
      .select("t", "ewma_micro").as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    var s = BigInt(0); var first = true
    val want = xs.map { x =>
      s = if (first) { first = false; BigInt(x) * 1000000 }
      else (BigInt(alpha) * x * 1000000 + BigInt(1000000 - alpha) * s) / 1000000
      assert(s.isValidLong)
      s.toLong
    }
    assert(got.toSeq === want)
  }

  test("ewma: fail-loud outside the count bound") {
    val df = Seq(("a", 1L, 1000000000L)).toDF("k", "t", "x")
    intercept[org.apache.spark.SparkException] {
      TimeSeries.ewma(df, "k", "t", "x", 500000L).collect()
    }
  }

  test("cell-count state merge == single-pass counts (hotspot identity)") {
    val rnd = new scala.util.Random(11L)
    val pts = (0 until 300).map(_ => (rnd.nextLong(20000L) - 10000L, rnd.nextLong(20000L) - 10000L))
    val df = pts.toDF("lat_u", "lon_u")
    val parts = Seq(df.filter(col("lat_u") % 3 === 0), df.filter(col("lat_u") % 3 =!= 0))
    val merged = Geo.mergeCellCounts(
        parts.map(p => Geo.cellCounts(p, "lat_u", "lon_u", 1500L)): _*)
    val full = Geo.cellCounts(df, "lat_u", "lon_u", 1500L)
    val a = Geo.hotspotFromCells(merged).collect().map(_.toSeq).toSet
    val b = Geo.hotspotFromCells(full).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("bigram-count state merge == single-pass counts (collocation identity)") {
    val docs = (0 until 40).map(i => (i.toLong, s"alpha beta gamma ${if (i % 2 == 0) "alpha beta" else "delta"}"))
      .toDF("doc_id", "text")
    val merged = TextAnalysis.mergeBigramCounts(
      TextAnalysis.bigramCounts(docs.filter(col("doc_id") < 15L)),
      TextAnalysis.bigramCounts(docs.filter(col("doc_id") >= 15L)))
    val a = TextAnalysis.collocationsFromCounts(merged, minCount = 2L)
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.collocations(docs, minCount = 2L)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("runLengthStream: a run spanning microbatches emits once, continued") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RunEvent]
    val q = StreamingOps.runLengthStream(mem.toDS().toDF()).writeStream
      .format("memory").queryName("runlen_out").outputMode("append").start()
    try {
      // batch 1: user 1 starts an 'a' run (2 events)
      mem.addData(RunEvent(1L, 1L, 10L, "a"), RunEvent(1L, 2L, 11L, "a"))
      q.processAllAvailable()
      // batch 2: 'a' continues, then 'b' closes it; 'b' stays open
      mem.addData(RunEvent(1L, 3L, 12L, "a"), RunEvent(1L, 4L, 13L, "b"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("runlen_out")
      .select("user_id", "run_seq", "event_type", "run_len", "t_start", "t_end")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    // exactly ONE emission: the 3-event 'a' run spanning both batches;
    // the open 'b' run stays in state
    assert(rows == Seq((1L, 1L, "a", 3L, 10L, 12L)))
  }

  test("runLengthStream: idle-gap timeout emits the open run and evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RunEvent]
    val q = StreamingOps.runLengthStream(mem.toDS().toDF(), gapSec = 100L)
      .writeStream.format("memory").queryName("runlen_evict")
      .outputMode("append").start()
    def stateRows: Long = q.lastProgress.stateOperators(0).numRowsTotal
    try {
      // batch 1: user 1 opens an 'a' run; timeout armed at 11 + 100
      mem.addData(RunEvent(1L, 1L, 10L, "a"), RunEvent(1L, 2L, 11L, "a"))
      q.processAllAvailable()
      assert(stateRows === 1L, "open run rides the state")
      // batch 2: heartbeat (user_id < 0) raises the watermark past the
      // expiry; the follow-on no-data batch fires the timeout — the open
      // run EMITS and the user's state row is REMOVED
      mem.addData(RunEvent(-1L, -1L, 500L, "__heartbeat"))
      q.processAllAvailable()
      assert(stateRows === 0L, s"timed-out run must evict, got $stateRows")
      // batch 3: the user returns after eviction — a fresh episode whose
      // numbering restarts at run_seq = 1
      mem.addData(RunEvent(1L, 3L, 600L, "b"))
      q.processAllAvailable()
      mem.addData(RunEvent(-1L, -2L, 1000L, "__heartbeat"))
      q.processAllAvailable()
      assert(stateRows === 0L)
    } finally q.stop()
    val rows = spark.table("runlen_evict")
      .select("user_id", "run_seq", "event_type", "run_len", "t_start", "t_end")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 1L, "a", 2L, 10L, 11L), (1L, 1L, "b", 1L, 600L, 600L)))
  }

  test("runLengthStream: arrival-path gap closure renumbers from 1 like eviction") {
    // Same per-user history as the eviction test, but the gap is noticed
    // ON ARRIVAL (no heartbeat raises the watermark first). The emitted
    // run_seq must be identical — whether the timeout fired before the
    // next event's microbatch is a layout accident, not semantics.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RunEvent]
    val q = StreamingOps.runLengthStream(mem.toDS().toDF(), gapSec = 100L)
      .writeStream.format("memory").queryName("runlen_arrival_gap")
      .outputMode("append").start()
    try {
      mem.addData(RunEvent(1L, 1L, 10L, "a"), RunEvent(1L, 2L, 11L, "a"))
      q.processAllAvailable()
      // gap of 589 s > gapSec noticed on arrival: 'a' closes, 'b' is a
      // NEW EPISODE at run_seq = 1
      mem.addData(RunEvent(1L, 3L, 600L, "b"))
      q.processAllAvailable()
      mem.addData(RunEvent(-1L, -1L, 1000L, "__heartbeat"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("runlen_arrival_gap")
      .select("user_id", "run_seq", "event_type", "run_len", "t_start", "t_end")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    // byte-identical to the eviction-path drained output
    assert(rows === Set((1L, 1L, "a", 2L, 10L, 11L), (1L, 1L, "b", 1L, 600L, 600L)))
  }

  test("funnelStream: strict-after steps, cross-batch continuation, timeout eviction") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RunEvent]
    val q = StreamingOps.funnelStream(mem.toDS().toDF(), Seq("a", "b", "c"),
        gapSec = 100L)
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("append").start()
    def stateRows: Long = q.lastProgress.stateOperators(0).numRowsTotal
    try {
      // user 1: 'b' at the SAME second as step-1's reach must NOT count
      // (strictly-after contract); the 'c' before step-2's reach second
      // must not count either. user 2 never starts the funnel.
      mem.addData(RunEvent(1L, 1L, 10L, "a"), RunEvent(1L, 2L, 10L, "b"),
        RunEvent(1L, 3L, 11L, "c"), RunEvent(1L, 4L, 12L, "b"),
        RunEvent(2L, 5L, 10L, "b"))
      q.processAllAvailable()
      assert(stateRows === 2L, "both users ride the state, nothing emits")
      // batch 2: the completing 'c' arrives later — state continues
      mem.addData(RunEvent(1L, 6L, 20L, "c"))
      q.processAllAvailable()
      // heartbeat past every expiry: both users emit and evict
      mem.addData(RunEvent(-1L, -1L, 500L, "__heartbeat"))
      q.processAllAvailable()
      assert(stateRows === 0L, s"timed-out funnels must evict, got $stateRows")
    } finally q.stop()
    val rows = spark.table("funnel_evict")
      .select("user_id", "reach", "reached")
      .as[(Long, Seq[Long], Int)].collect().toSeq.sortBy(_._1)
    assert(rows === Seq((1L, Seq(10L, 12L, 20L), 3), (2L, Seq(-1L, -1L, -1L), 0)))
  }

  test("runLengthStream: within-batch iterator order does not matter") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RunEvent]
    val q = StreamingOps.runLengthStream(mem.toDS().toDF()).writeStream
      .format("memory").queryName("runlen_out2").outputMode("append").start()
    try {
      // one batch, events deliberately added out of time order
      mem.addData(RunEvent(7L, 3L, 30L, "c"), RunEvent(7L, 1L, 10L, "a"),
        RunEvent(7L, 2L, 20L, "a"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("runlen_out2")
      .select("run_seq", "event_type", "run_len").as[(Long, String, Long)]
      .collect().toSeq
    assert(rows == Seq((1L, "a", 2L))) // 'c' run open in state
  }
}
