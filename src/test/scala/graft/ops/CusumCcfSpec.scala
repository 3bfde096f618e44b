package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins TimeSeries.cusum / TimeSeries.ccf and the streaming CUSUM gate:
  * the window-identity CUSUM must equal Page's textbook recursion
  * bit-for-bit (both are exact integer arithmetic), alarms must fire
  * after an injected level shift and not before, and the gate's folded
  * daily-cell state must reproduce the one-shot batch result. */
class CusumCcfSpec extends SparkTestBase {
  import spark.implicits._

  /** Page recursion reference on the same scaled integers the operator
    * uses: D⁺ = kDen·n·x_micro − (kDen+kNum)·total, S⁺ = max(0, S⁺+D⁺);
    * micro surfaces as the identical half-up divmod. */
  private def localCusum(xs: Seq[Long], kNum: Long, kDen: Long,
      hNum: Long, hDen: Long): Seq[(Long, Long, Boolean, Boolean)] = {
    val micro = xs.map(x => BigInt(x) * 1000000)
    val n = BigInt(micro.size)
    val total = micro.sum
    val den = BigInt(kDen) * total.abs
    var sp = BigInt(0); var sn = BigInt(0)
    micro.map { x =>
      val dUp = BigInt(kDen) * n * x - BigInt(kDen + kNum) * total
      val dDn = BigInt(kDen) * n * x - BigInt(kDen - kNum) * total
      sp = (sp + dUp).max(BigInt(0))
      sn = (sn - dDn).max(BigInt(0))
      def mu(s: BigInt) = ((s * 2000000 + den) / (den * 2)).toLong
      (mu(sp), mu(sn),
        sp * hDen > BigInt(hNum * kDen) * total.abs,
        sn * hDen > BigInt(hNum * kDen) * total.abs)
    }
  }

  test("cusum equals Page's recursion on a level-shifted series") {
    // stationary around 100 for 20 steps, then shifted to 130
    val xs = (0 until 20).map(i => 100L + (i % 5) - 2) ++
      (0 until 15).map(i => 130L + (i % 3) - 1)
    val df = xs.zipWithIndex.map { case (x, t) => ("k", t.toLong, x) }
      .toDF("k", "t", "x")
    val got = TimeSeries.cusum(df, "k", "t", "x",
        kNum = 1L, kDen = 10L, hNum = 1L, hDen = 2L)
      .orderBy("t").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    val want = localCusum(xs, 1L, 10L, 1L, 2L)
    assert(got.toSeq === want)
    // the shift must alarm upward, and only after it happens
    val flags = got.map(_._3)
    assert(!flags.take(20).exists(identity), "no up-alarm before the shift")
    assert(flags.drop(20).exists(identity), "up-alarm after the shift")
  }

  test("downward shifts alarm on the negative side only") {
    val xs = (0 until 20).map(_ => 100L) ++ (0 until 15).map(_ => 70L)
    val df = xs.zipWithIndex.map { case (x, t) => ("k", t.toLong, x) }
      .toDF("k", "t", "x")
    val got = TimeSeries.cusum(df, "k", "t", "x",
        kNum = 1L, kDen = 10L, hNum = 1L, hDen = 1L)
      .orderBy("t").collect()
    assert(!got.exists(_.getBoolean(5)), "no up-alarm on a downward shift")
    assert(got.drop(20).exists(_.getBoolean(6)), "down-alarm after the drop")
    assert(got.toSeq.map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5),
      r.getBoolean(6))) === localCusum(xs, 1L, 10L, 1L, 1L))
  }

  test("cusum gate: folded daily cells equal the one-shot batch result") {
    import graft.streaming.StreamingOps
    val stateDir = java.nio.file.Files.createTempDirectory("cusum_spec_").toString
    val ev = (0L until 300L).map { i =>
      // two keys, 10 days; key B triples its volume in the last 3 days
      val key = if (i % 2 == 0) "A" else "B"
      val day = if (key == "B" && i % 30 >= 21) 7L + i % 3
      else i % 10
      (key, day * 86400L + i)
    }.toDF("k", "sec")
    val Seq(b0, b1, b2) = Seq(0L, 1L, 2L).map(m => ev.filter(pmod(col("sec"), lit(3L)) === m))
    StreamingOps.applyCusumBatch(b0, 0L, "sec", "k", stateDir)
    StreamingOps.applyCusumBatch(b1, 1L, "sec", "k", stateDir)
    StreamingOps.applyCusumBatch(b1, 1L, "sec", "k", stateDir) // replay: no-op
    StreamingOps.applyCusumBatch(b2, 2L, "sec", "k", stateDir)
    val gate = StreamingOps.cusumGateResult(spark, stateDir, "k")
      .orderBy("k", "t").collect().toSeq
    val oneShot = TimeSeries.cusum(
      TimeSeries.dayCells(ev, "sec", "k"), "k", "day", "n")
      .orderBy("k", "t").collect().toSeq
    assert(gate === oneShot)
    // marker survived the replay at the latest version
    val v = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(stateDir, "_VERSION").toPath)).trim
    assert(v === "2")
    // retention: vacuum to the newest version only; the gate result is
    // unchanged (only the marker's current version is ever read)
    val doomed = StreamingOps.vacuumVersions(stateDir, keepLast = 1)
    assert(doomed === Seq(0L, 1L))
    assert(StreamingOps.cusumGateResult(spark, stateDir, "k")
      .orderBy("k", "t").collect().toSeq === oneShot)
  }

  /** Independent Holt reference: plain BigInt floor of the unsplit
    * expressions — what the operator's overflow-free splits must
    * reproduce exactly. */
  private def localHolt(xs: Seq[Long], aMu: Long, bMu: Long): Seq[(Long, Long)] = {
    val M = BigInt(1000000)
    def fdiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b; if (a % b != 0 && (a.signum * b.signum) < 0) q - 1 else q
    }
    var l = BigInt(0); var b = BigInt(0)
    xs.zipWithIndex.map { case (x, i) =>
      if (i == 0) {
        l = BigInt(x) * M
        b = if (xs.size > 1) BigInt(xs(1) - x) * M else BigInt(0)
      } else {
        val prevL = l
        l = fdiv(BigInt(aMu) * x * M + BigInt(1000000 - aMu) * (l + b), M)
        b = fdiv(BigInt(bMu) * (l - prevL) + BigInt(1000000 - bMu) * b, M)
      }
      (l.toLong, b.toLong)
    }
  }

  test("holt equals the unsplit BigInt floor reference, signed trends") {
    for (xs <- Seq(
      (0 until 30).map(t => 100L + 3L * t),            // rising: trend > 0
      (0 until 30).map(t => 500L - 7L * t).map(_ max 0L), // falling: trend < 0
      Seq(42L),                                         // singleton: b = 0
      (0 until 25).map(i => (i * 37 % 11) * 9L))) {     // oscillating
      val df = xs.zipWithIndex.map { case (x, t) => ("k", t.toLong, x) }
        .toDF("k", "t", "x")
      val got = TimeSeries.holt(df, "k", "t", "x",
          alphaMicro = 300000L, betaMicro = 100000L)
        .orderBy("t").collect().map(r => (r.getLong(3), r.getLong(4)))
      assert(got.toSeq === localHolt(xs, 300000L, 100000L), s"series $xs")
    }
    // direction sanity on the clean linear series
    val rising = (0 until 30).map(t => 100L + 3L * t)
    val df = rising.zipWithIndex.map { case (x, t) => ("k", t.toLong, x) }
      .toDF("k", "t", "x")
    val last = TimeSeries.holt(df, "k", "t", "x", 300000L, 100000L)
      .orderBy("t").collect().last
    assert(last.getLong(4) > 0L, "rising series carries positive trend")
  }

  test("ccf: a pure shift correlates perfectly at its lag, not elsewhere") {
    // y_t = x_{t-2}: x leads y by 2, so ccf peaks at lag +2 with 1e6
    val x = Seq(5L, 9L, 2L, 7L, 4L, 8L, 1L, 6L, 3L, 9L, 2L, 7L)
    val rows = x.indices.map { t =>
      ("k", t.toLong, x(t), if (t >= 2) x(t - 2) else 0L)
    }.filter(_._2 >= 2) // drop warmup rows so y is a clean shift
    val df = rows.toDF("k", "t", "x", "y")
    val out = TimeSeries.ccf(df, "k", "t", "x", "y", maxLag = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3)))
      .toSeq.sortBy(_._1)
    val at2 = out.find(_._1 == 2L).get
    assert(at2._3 === 1000000L, s"perfect correlation at lag 2: $out")
    assert(out.filter(o => o._1 != 2L && o._3 != Long.MinValue)
      .forall(_._3 < 1000000L), s"no other lag is perfect: $out")
    // pair counts shrink by |lag| toward the edges
    val n = rows.size.toLong
    out.foreach { case (lag, m, _) => assert(m === n - math.abs(lag)) }
  }

  test("ccf(x,y) at lag L equals ccf(y,x) at -L") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 40).map(t => ("k", t.toLong,
      rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)).toDF("k", "t", "x", "y")
    def grab(xc: String, yc: String) =
      TimeSeries.ccf(df, "k", "t", xc, yc, maxLag = 5)
        .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap
    val xy = grab("x", "y"); val yx = grab("y", "x")
    (-5L to 5L).foreach { l => assert(xy(l) === yx(-l), s"lag $l") }
  }

  test("degenerate pairs surface null, never NaN-cast garbage") {
    val df = Seq(("k", 0L, 1L, 5L), ("k", 1L, 1L, 7L)).toDF("k", "t", "x", "y")
    // x is constant -> zero variance at every lag -> ccf_micro null
    val out = TimeSeries.ccf(df, "k", "t", "x", "y", maxLag = 1).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.isNullAt(3)))
  }
}
