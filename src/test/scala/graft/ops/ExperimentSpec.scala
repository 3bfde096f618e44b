package graft.ops

import graft.SparkTestBase

class ExperimentSpec extends SparkTestBase {
  import spark.implicits._

  test("srmCheck: hand-computed chi-square cells against a 1:1 allocation") {
    // A:3, B:1 vs 1:1 -> e=2 each; chi2 = (3-2)^2/2 + (1-2)^2/2 = 1.0
    val df = Seq("A", "A", "A", "B").toDF("arm")
    val got = Experiment.srmCheck(df, "arm", Seq("A" -> 1L, "B" -> 1L))
      .orderBy("arm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("A", 3L, 2000000L, 500000L),
      ("B", 1L, 2000000L, 500000L)))
  }

  test("srmCheck: declared-but-empty arm surfaces with full expected mass") {
    val df = Seq("A", "A", "B", "B").toDF("arm")
    val got = Experiment.srmCheck(df, "arm",
        Seq("A" -> 1L, "B" -> 1L, "C" -> 1L))
      .orderBy("arm").collect()
    val c = got.find(_.getString(0) == "C").get
    assert(c.getLong(1) === 0L)
    assert(c.getLong(2) === 1333333L) // 4/3 expected, floored micro
    // d = 0*3 - 4*1 = -4 -> 16e6/(4*1*3) = 1333333
    assert(c.getLong(3) === 1333333L)
  }

  test("srmCheck: an arm missing from the allocation fails loud") {
    val df = Seq("A", "X").toDF("arm")
    val e = intercept[IllegalArgumentException] {
      Experiment.srmCheck(df, "arm", Seq("A" -> 1L))
    }
    assert(e.getMessage.contains("X"))
  }

  test("srmCheck: unequal weights — 3:1 allocation hit exactly scores zero") {
    val df = (Seq.fill(6)("A") ++ Seq.fill(2)("B")).toDF("arm")
    val got = Experiment.srmCheck(df, "arm", Seq("A" -> 3L, "B" -> 1L))
      .orderBy("arm").collect()
    assert(got.map(_.getLong(3)).toSeq === Seq(0L, 0L))
    assert(got.map(_.getLong(2)).toSeq === Seq(6000000L, 2000000L))
  }

  test("cuped: perfect linear covariate collapses the metric to a constant") {
    // y = 2x exactly -> theta = 2, every adjusted value = mean(y)
    val df = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0))
      .toDF("id", "x", "y")
    val got = Experiment.cuped(df, "y", "x").orderBy("id").collect()
    assert(got.map(_.getLong(3)).toSeq === Seq(2000000L, 2000000L, 2000000L))
    assert(got.map(_.getLong(4)).toSeq === Seq(4000000L, 4000000L, 4000000L))
  }

  test("cuped: zero-variance covariate and NULL rows surface NULL, never 0") {
    val flat = Seq((1L, Some(5.0), Some(1.0)), (2L, Some(5.0), Some(9.0)))
      .toDF("id", "x", "y")
    val g1 = Experiment.cuped(flat, "y", "x").collect()
    assert(g1.forall(_.isNullAt(3)) && g1.forall(_.isNullAt(4)))
    val withNull = Seq((1L, Some(1.0), Some(2.0)), (2L, Some(2.0), Some(5.0)),
      (3L, None, Some(9.0))).toDF("id", "x", "y")
    val g2 = Experiment.cuped(withNull, "y", "x").orderBy("id").collect()
    assert(!g2(0).isNullAt(4) && !g2(1).isNullAt(4))
    assert(g2(2).isNullAt(4)) // NULL covariate row passes through
    assert(!g2(2).isNullAt(3)) // but theta is still reported on it
  }

  test("cuped: uncorrelated covariate leaves the metric nearly untouched") {
    // x symmetric around its mean, y independent of x -> theta = 0
    val df = Seq((1L, 1.0, 7.0), (2L, 3.0, 9.0), (3L, 1.0, 9.0),
      (4L, 3.0, 7.0)).toDF("id", "x", "y")
    val got = Experiment.cuped(df, "y", "x").orderBy("id").collect()
    assert(got.map(_.getLong(3)).toSeq === Seq(0L, 0L, 0L, 0L))
    assert(got.map(_.getLong(4)).toSeq ===
      Seq(7000000L, 9000000L, 9000000L, 7000000L))
  }

  test("conformal: qhat is the exact ceil((n+1)(1-alpha))-th residual") {
    import spark.implicits._
    // residuals 1..10 (n=10); alpha=0.2 -> k = ceil(11*0.8) = 9 -> qhat=9
    val calib = (1 to 10).map(i => (i.toLong, 100.0 + i, 100.0))
      .toDF("id", "pred", "actual")
    val test0 = Seq((99L, 50.0)).toDF("id", "pred")
    val got = Experiment.conformalIntervals(calib, test0, "pred", "actual",
      alphaMicro = 200000L).head()
    assert(got.getLong(1) === 50000000L)  // pred_micro
    assert(got.getLong(2) === 9000000L)   // qhat = 9 in micro
    assert(got.getLong(3) === 41000000L && got.getLong(4) === 59000000L)
  }

  test("conformal: k-th residual resolves across range-partition boundaries") {
    import spark.implicits._
    // 4001 distinct residuals over 4 shuffle partitions — the histogram
    // is genuinely multi-partition, so qhat must stitch the partition-
    // local cumulative to the control-plane offsets correctly at
    // several different k positions (first, middle, last partition)
    val calib = (1 to 4001).map(i => (i.toLong, 100.0 + i, 100.0))
      .toDF("id", "pred", "actual")
    val test0 = Seq((99L, 0.0)).toDF("id", "pred")
    def qhat(alphaMicro: Long): Long =
      Experiment.conformalIntervals(calib, test0, "pred", "actual", alphaMicro)
        .head().getLong(2) / 1000000L
    // n=4001: k = ceil(4002*(1-alpha)); residuals are 1..4001 so qhat=k
    assert(qhat(900000L) === 401L)   // k deep in the first partition
    assert(qhat(500000L) === 2001L)  // k mid-histogram
    assert(qhat(250000L) === 3002L)  // k in the back half
    assert(qhat(300L) === 4001L)     // k = n: the very last cell
  }

  test("conformal: no single-reducer window in any build-time plan") {
    import spark.implicits._
    // VERDICT r16 #1: the q̂ cumulative must use the range-partitioned
    // discipline (ksFromCounts topology), never an empty-partitionSpec
    // WindowExec — the plan every build-time Spark action runs is
    // captured via a QueryExecutionListener and audited node-by-node.
    val offenders = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        seen.incrementAndGet()
        val bad = qe.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) offenders.add(qe.sparkPlan.toString)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val calib = (1 to 4001).map(i => (i.toLong, 100.0 + i, 100.0))
        .toDF("id", "pred", "actual")
      val test0 = Seq((99L, 50.0)).toDF("id", "pred")
      val got = Experiment.conformalIntervals(calib, test0, "pred", "actual",
        alphaMicro = 250000L).collect()
      assert(got.nonEmpty)
      // listener delivery is async on the listener bus — wait until the
      // two build-time collects plus the final action have surfaced
      val deadline = System.nanoTime() + 30L * 1000L * 1000L * 1000L
      while (seen.get() < 3 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.get() >= 3, s"listener saw only ${seen.get()} executions")
    } finally spark.listenerManager.unregister(listener)
    assert(offenders.isEmpty,
      s"single-reducer window in conformal build:\n${offenders.toArray.mkString("\n")}")
  }

  test("conformal: marginal coverage >= 1 - alpha on an exchangeable holdout") {
    import spark.implicits._
    // noisy scorer: pred = actual + hash-noise in [-50, 50]; calibration
    // and evaluation slices are exchangeable by construction
    def noise(i: Long): Double = ((i * 2654435761L) % 101L - 50L).toDouble
    val rows = (1L to 3000L).map(i => (i, 1000.0 + (i % 37), 1000.0 + (i % 37) + noise(i)))
      .toDF("id", "actual", "pred")
    val calib = rows.filter($"id" % 2 === 0)
    val eval0 = rows.filter($"id" % 2 === 1)
    val iv = Experiment.conformalIntervals(calib, eval0, "pred", "actual",
      alphaMicro = 100000L)
    val joined = iv.join(eval0.select($"id", ($"actual" * 1000000).cast("long").as("am")), "id")
    val n = joined.count()
    val covered = joined.filter($"am" >= $"lo_micro" && $"am" <= $"hi_micro").count()
    assert(covered.toDouble / n >= 0.88, s"coverage ${covered.toDouble / n}")
  }

  test("conformal: calibration too small for alpha fails loud") {
    import spark.implicits._
    val calib = Seq((1L, 1.0, 2.0), (2L, 1.0, 3.0)).toDF("id", "pred", "actual")
    val test0 = Seq((9L, 5.0)).toDF("id", "pred")
    // n=2, alpha=0.1 -> k = ceil(3*0.9) = 3 > n
    val e = intercept[IllegalStateException] {
      Experiment.conformalIntervals(calib, test0, "pred", "actual", 100000L)
    }
    assert(e.getMessage.contains("too small"))
  }

  test("cqr: signed scores — k-th order statistic, negative qhat SHRINKS the band") {
    import spark.implicits._
    // fixed band [0, 10]; actuals 5..14 -> scores max(0-y, y-10) =
    // (-5,-4,...,-1, 0, 1, 2, 3, 4); n=10, alpha=0.2 -> k=9 -> 9th
    // smallest signed score = 3
    val calib = (5 to 14).map(i => (i.toLong, 0.0, 10.0, i.toDouble))
      .toDF("id", "lo", "hi", "actual")
    val test0 = Seq((99L, 2.0, 8.0)).toDF("id", "lo", "hi")
    val got = Experiment.cqrIntervals(calib, test0, "lo", "hi", "actual",
      alphaMicro = 200000L).head()
    assert(got.getLong(3) === 3000000L)  // qhat_micro
    assert(got.getLong(4) === -1000000L) // lo_micro = 2 - 3
    assert(got.getLong(5) === 11000000L) // hi_micro = 8 + 3
    // every actual deep inside the band -> all scores negative -> a
    // NEGATIVE qhat: calibration shrinks the over-wide band
    val tight = (1 to 10).map(i => (i.toLong, -100.0, 100.0, i.toDouble))
      .toDF("id", "lo", "hi", "actual")
    val g2 = Experiment.cqrIntervals(tight, test0, "lo", "hi", "actual",
      alphaMicro = 200000L).head()
    assert(g2.getLong(3) < 0L)
    assert(g2.getLong(5) < 8000000L) // hi tightened below the predicted hi
    // merged state shards == direct
    val h1 = Experiment.cqrScoreHistogram(calib.filter($"id" <= 9), "lo", "hi", "actual")
    val h2 = Experiment.cqrScoreHistogram(calib.filter($"id" > 9), "lo", "hi", "actual")
    val fromState = Experiment.cqrFromHistogram(h1.unionByName(h2), test0,
      "lo", "hi", alphaMicro = 200000L).head()
    assert(fromState.getLong(3) === got.getLong(3))
  }

  private def mwRef(a: Seq[Double], b: Seq[Double]): (Long, Long, Long, Option[Long]) = {
    // naive mid-rank reference: doubled rank sums over the pooled sort
    val pooled = (a.map((_, 'a')) ++ b.map((_, 'b'))).sortBy(_._1)
    val n = pooled.size
    val byVal = pooled.groupBy(_._1)
    val cumb = pooled.map(_._1).distinct.sorted
      .scanLeft(0L)((acc, v) => acc + byVal(v).size).init
    val cumbOf = pooled.map(_._1).distinct.sorted.zip(cumb).toMap
    val r2a = a.map(v => 2L * cumbOf(v) + byVal(v).size + 1L).sum
    val u2a = r2a - a.size.toLong * (a.size + 1L)
    val u2b = 2L * a.size * b.size - u2a
    val tie = byVal.values.map(g => g.size.toLong).map(t => t * t * t - t).sum
    val nD = n.toDouble
    val inner = nD + 1.0 - tie.toDouble / (nD * (nD - 1.0))
    val z = if (a.isEmpty || b.isEmpty || n < 2 || inner <= 0.0) None
      else Some(math.floor((u2a.toDouble - a.size.toDouble * b.size.toDouble) /
        (2.0 * math.sqrt(a.size.toDouble * b.size.toDouble / 12.0 * inner)) *
        1.0e9 + 0.5).toLong)
    (u2a, u2b, tie, z)
  }

  test("mannWhitney: hand examples — no ties, mid-rank ties, degenerate NULL z") {
    import spark.implicits._
    def run(a: Seq[Double], b: Seq[Double]) = {
      val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
      Experiment.mannWhitney(df, "g", "v", "A", "B").head()
    }
    // A={1,2}, B={3,4}: R_A=3 -> 2U_A=0, 2U_B=8, no ties
    val r1 = run(Seq(1.0, 2.0), Seq(3.0, 4.0))
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getLong(4)) === (2L, 2L, 0L, 8L, 0L))
    val want1 = mwRef(Seq(1.0, 2.0), Seq(3.0, 4.0))._4.get
    assert(r1.getLong(5) === want1)
    // ties: A={1,1,2}, B={1,2,2}: midranks 2,2,5 -> R_A=9 -> 2U_A=6
    val r2 = run(Seq(1.0, 1.0, 2.0), Seq(1.0, 2.0, 2.0))
    assert((r2.getLong(2), r2.getLong(3), r2.getLong(4)) === (6L, 12L, 48L))
    assert(r2.getLong(5) === mwRef(Seq(1.0, 1.0, 2.0), Seq(1.0, 2.0, 2.0))._4.get)
    // all values identical: zero variance -> NULL z, exact u2 intact
    val r3 = run(Seq(5.0, 5.0), Seq(5.0))
    assert(r3.getLong(2) === 2L && r3.isNullAt(5)) // 2U_A = 2R_A-na(na+1) = 8-6
    // one group absent from the data -> NULL z, counts honest
    val r4 = run(Seq(1.0, 2.0), Seq.empty)
    assert(r4.getLong(0) === 2L && r4.getLong(1) === 0L && r4.isNullAt(5))
  }

  test("mannWhitney: differential vs naive reference across range partitions") {
    import spark.implicits._
    // 2000 distinct-ish values across 4 shuffle partitions, seeded
    // hash noise, heavy ties — the cross-partition offset stitching
    // must reproduce the naive single-machine mid-rank computation
    def noise(i: Long): Double = ((i * 2654435761L) % 401L).toDouble / 4.0
    val a = (1L to 1200L).map(i => noise(i) + 10.0)
    val b = (1L to 800L).map(i => noise(i * 7L) + 12.0)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val got = Experiment.mannWhitney(df, "g", "v", "A", "B").head()
    val want = mwRef(a, b)
    assert((got.getLong(2), got.getLong(3), got.getLong(4)) ===
      (want._1, want._2, want._3))
    assert(got.getLong(5) === want._4.get)
  }

  test("quantileTreatmentEffect: type-1 order statistics per arm, full-join on missing arms") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("A", i.toDouble)) ++
      (11 to 20).map(i => ("B", i.toDouble))).toDF("g", "v")
    val got = Experiment.quantileTreatmentEffect(df, "g", "v", "A", "B",
      Seq(250000L, 500000L, 750000L, 1000000L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // k = ceil(p*10): p25->3rd, p50->5th, p75->8th, p100->10th
    assert(got(250000L) === (3000000L, 13000000L, -10000000L))
    assert(got(500000L) === (5000000L, 15000000L, -10000000L))
    assert(got(750000L) === (8000000L, 18000000L, -10000000L))
    assert(got(1000000L) === (10000000L, 20000000L, -10000000L))
    // an arm absent from the data -> NULLs on its side via the full join
    val one = (1 to 4).map(i => ("A", i.toDouble)).toDF("g", "v")
    val g2 = Experiment.quantileTreatmentEffect(one, "g", "v", "A", "B",
      Seq(500000L)).head()
    assert(g2.getLong(3) === 2000000L && g2.isNullAt(4) && g2.isNullAt(5))
  }

  test("mcnemar: discordant-pair chi-square, zero-discordance NULL") {
    import spark.implicits._
    // b = 3 (pre-only), c = 1 (post-only): chi2 = (3-1)^2/4 = 1.0
    val df = (Seq.fill(2)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(4)((false, false)))
      .toDF("pre", "post")
    val r = Experiment.mcnemar(df, "pre", "post").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (10L, 2L, 3L, 1L, 4L))
    assert(r.getLong(5) === 1000000L)
    // perfectly concordant -> no evidence -> NULL
    val conc = Seq((true, true), (false, false)).toDF("pre", "post")
    assert(Experiment.mcnemar(conc, "pre", "post").head().isNullAt(5))
  }

  test("proportionTest: hand z and exact diff; degenerate pooled rate NULL") {
    import spark.implicits._
    // A: 3/4 convert, B: 1/4: diff = 0.5 exactly; z from the pooled tree
    val df = (Seq.fill(3)(("A", true)) ++ Seq(("A", false)) ++
      Seq(("B", true)) ++ Seq.fill(3)(("B", false))).toDF("g", "s")
    val r = Experiment.proportionTest(df, "g", "s", "A", "B").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (4L, 3L, 4L, 1L))
    assert(r.getLong(4) === 500000L)
    val pp = 4.0 / 8.0
    val z = (0.75 - 0.25) / math.sqrt(pp * (1.0 - pp) * (0.25 + 0.25))
    assert(r.getLong(5) === math.floor(z * 1.0e9 + 0.5).toLong)
    // all-success pooled rate -> zero variance -> NULL z, diff exact 0
    val all = Seq(("A", true), ("B", true)).toDF("g", "s")
    val r2 = Experiment.proportionTest(all, "g", "s", "A", "B").head()
    assert(r2.getLong(4) === 0L && r2.isNullAt(5))
  }

  test("winsorizedMean: per-arm cuts clamp, tie cells clamp correctly, absent arm drops") {
    import spark.implicits._
    // arm A = 1..20 at p25/p75: cuts k=5 -> lo=5, k=15 -> hi=15;
    // sum clamp = 5*5 + (6..14) + 15*6 = 25+90+90 = 205 -> mean 10.25
    // arm B = four 10s: both cuts land on the tied cell -> mean 10
    val df = ((1 to 20).map(i => ("A", i.toDouble)) ++
      Seq.fill(4)(("B", 10.0))).toDF("g", "v")
    val got = Experiment.winsorizedMean(df, "g", "v", "A", "B",
      pLoMicro = 250000L, pHiMicro = 750000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("A") === (20L, 5000000L, 15000000L, 10250000L))
    assert(got("B") === (4L, 10000000L, 10000000L, 10000000L))
    // an arm with no rows yields no row, not garbage
    val one = (1 to 4).map(i => ("A", i.toDouble)).toDF("g", "v")
    val g2 = Experiment.winsorizedMean(one, "g", "v", "A", "B", 250000L, 750000L)
      .collect()
    assert(g2.length === 1 && g2.head.getString(0) === "A")
  }

  test("diffInDiff: hand 2x2; empty cell -> NULL estimate, cell means still reported") {
    import spark.implicits._
    val df = Seq(("T", "pre", 10.0), ("T", "post", 20.0), ("T", "post", 22.0),
      ("C", "pre", 5.0), ("C", "post", 7.0)).toDF("g", "p", "v")
    val r = Experiment.diffInDiff(df, "g", "p", "v", "T", "C", "pre", "post").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (1L, 2L, 1L, 1L))
    assert(r.getLong(5) === 21000000000L) // mean T post = 21 in nano
    assert(r.getLong(8) === 9000000000L)  // (21-10) - (7-5) = 9
    val missing = df.filter($"g" =!= "C" || $"p" =!= "post")
    val r2 = Experiment.diffInDiff(missing, "g", "p", "v", "T", "C", "pre", "post").head()
    assert(r2.getLong(3) === 0L && r2.isNullAt(7) && r2.isNullAt(8))
    assert(r2.getLong(5) === 21000000000L) // surviving cells still report
  }

  test("jackknifeRatio: constant ratio -> zero SE; reference differential; degenerate NULL") {
    import spark.implicits._
    // num = 3*den exactly -> every leave-one-out ratio is 3 -> se = 0
    val const = (1L to 500L).map(i => (i, 3.0 * (i % 7 + 1), (i % 7 + 1).toDouble))
      .toDF("id", "num", "den")
    val r = Experiment.jackknifeRatio(const, "id", "num", "den", 16).head()
    assert(r.getLong(1) === 3000000000L && r.getLong(2) === 0L)
    // seeded non-constant data vs a plain-Scala replica of the exact
    // bucket-hash + nano-quantized jackknife arithmetic
    val rows = (1L to 400L).map(i =>
      (i, ((i * 13) % 101 + 1).toDouble, ((i * 7) % 31 + 1).toDouble))
    val P = 1000000007L
    val by = rows.groupBy { case (id, _, _) => (((id % P) * 654435747L) % P) % 16 }
    val sn = by.view.mapValues(_.map(t => math.floor(t._2 * 1e6 + 0.5).toLong).sum).toMap
    val sd = by.view.mapValues(_.map(t => math.floor(t._3 * 1e6 + 0.5).toLong).sum).toMap
    val (tn, td, nb) = (sn.values.sum, sd.values.sum, by.size)
    val rN = by.keys.toSeq.map(b =>
      math.floor((tn - sn(b)).toDouble / (td - sd(b)).toDouble * 1e9 + 0.5).toLong)
    val (sr, srr) = (rN.map(BigInt(_)).sum, rN.map(x => BigInt(x) * x).sum)
    val dev2 = BigInt(nb) * nb * srr - BigInt(nb) * sr * sr
    val varN = (nb - 1).toDouble / nb.toDouble * dev2.toDouble /
      (nb.toDouble * nb.toDouble) / 1.0e18
    val wantTheta = math.floor(tn.toDouble / td.toDouble * 1e9 + 0.5).toLong
    val wantSe = math.floor(math.sqrt(varN) * 1e9 + 0.5).toLong
    val g = Experiment.jackknifeRatio(rows.toDF("id", "num", "den"),
      "id", "num", "den", 16).head()
    assert((g.getLong(1), g.getLong(2)) === (wantTheta, wantSe))
    // all-zero denominators poison every leave-one-out ratio -> NULLs
    val zero = (1L to 50L).map(i => (i, 1.0, 0.0)).toDF("id", "num", "den")
    val g3 = Experiment.jackknifeRatio(zero, "id", "num", "den", 8).head()
    assert(g3.isNullAt(1) && g3.isNullAt(2))
    // a NULL id must not mint a phantom bucket: result identical to
    // the frame with that row dropped
    val withNullId = rows.toDF("id", "num", "den").unionByName(
      Seq((null.asInstanceOf[java.lang.Long], 99.0, 1.0))
        .toDF("id", "num", "den"))
    val g4 = Experiment.jackknifeRatio(withNullId, "id", "num", "den", 16).head()
    assert((g4.getLong(1), g4.getLong(2)) === (wantTheta, wantSe))
  }

  test("kruskalWallis: hand-traced H with the per-group floor quantization; degenerates NULL") {
    import spark.implicits._
    // A={1,2}, B={3,4}, C={5,6}: ranks 1..6, R={3,7,11} -> r2={6,14,22}
    // -> S = 36//8 + 196//8 + 484//8 = 4+24+60 = 88 (floor per group,
    // the documented quantization); H = 12*88/42 - 21, no ties
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0),
      ("C", 5.0), ("C", 6.0)).toDF("g", "v")
    val r = Experiment.kruskalWallis(df, "g", "v").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (6L, 3L, 0L))
    val h = 12.0 * 88.0 / (6.0 * 7.0) - 3.0 * 7.0
    assert(r.getLong(3) === math.floor(h / 1.0 * 1.0e9 + 0.5).toLong)
    // ties across groups engage the correction: A={1,1}, B={1,2}
    // hist: v1 t=3 cumb=0, v2 t=1 cumb=3; r2_A = 2*(0+3+1)=8,
    // r2_B = (0+3+1)+(6+1+1)=12; S = 64//8 + 144//8 = 8+18=26;
    // tie = 27-3 = 24; corr = 1 - 24/(64-4) = 0.6
    val df2 = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 2.0)).toDF("g", "v")
    val r2 = Experiment.kruskalWallis(df2, "g", "v").head()
    assert(r2.getLong(2) === 24L)
    val h2 = (12.0 * 26.0 / (4.0 * 5.0) - 3.0 * 5.0) / (1.0 - 24.0 / 60.0)
    assert(r2.getLong(3) === math.floor(h2 * 1.0e9 + 0.5).toLong)
    // all values identical -> zero variance -> NULL h
    val r3 = Experiment.kruskalWallis(
      Seq(("A", 7.0), ("B", 7.0)).toDF("g", "v"), "g", "v").head()
    assert(r3.isNullAt(3))
  }

  test("wilcoxonSignedRank: mid-rank hand trace, zero-delta drop, NULL on empty") {
    import spark.implicits._
    // deltas {+1, +2, +3, -1} (one zero pair drops): |d| midranks
    // 1.5,1.5,3,4 -> W+ = 1.5+3+4 = 8.5 -> 2W+ = 17, 2W- = 3, tie = 6
    val df = Seq((10.0, 11.0), (10.0, 12.0), (10.0, 13.0), (10.0, 9.0),
      (10.0, 10.0)).toDF("pre", "post")
    val r = Experiment.wilcoxonSignedRank(df, "pre", "post").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (4L, 17L, 3L, 6L))
    val varw = 4.0 * 5.0 * 9.0 / 24.0 - 6.0 / 48.0
    val z = (17.0 - 4.0 * 5.0 / 2.0) / (2.0 * math.sqrt(varw))
    assert(r.getLong(4) === math.floor(z * 1.0e9 + 0.5).toLong)
    // all-zero deltas -> n = 0, NULL z
    val r2 = Experiment.wilcoxonSignedRank(
      Seq((1.0, 1.0), (2.0, 2.0)).toDF("pre", "post"), "pre", "post").head()
    assert(r2.getLong(0) === 0L && r2.isNullAt(4))
  }

  test("bhAdjust: step-up suffix-min, ceil quantization, per-group ranks, cap at 1e6") {
    import spark.implicits._
    // classic all-reject ladder: p = .01...05, m=5, alpha=.05 ->
    // every adjusted p is exactly 50000 and every row rejects
    val ladder = (1 to 5).map(i => ("e1", s"m$i", i * 10000L))
      .toDF("exp", "metric", "p_micro")
    val g1 = Experiment.bhAdjust(ladder, "exp", "metric", "p_micro", 50000L)
      .collect().map(r => r.getString(1) ->
        (r.getLong(3), r.getLong(5), r.getBoolean(6))).toMap
    (1 to 5).foreach { i =>
      assert(g1(s"m$i") === (i.toLong, 50000L, true), s"m$i: ${g1(s"m$i")}")
    }
    // mixed ladder: suffix-min keeps the small p, large ones stand
    val mixed = Seq(("e1", "a", 1000L), ("e1", "b", 200000L),
      ("e1", "c", 900000L)).toDF("exp", "metric", "p_micro")
    val g2 = Experiment.bhAdjust(mixed, "exp", "metric", "p_micro", 50000L)
      .collect().map(r => r.getString(1) ->
        (r.getLong(3), r.getLong(5), r.getBoolean(6))).toMap
    assert(g2("a") === (1L, 3000L, true))   // ceil(3*1000/1)
    assert(g2("b") === (2L, 300000L, false)) // ceil(3*200000/2)
    assert(g2("c") === (3L, 900000L, false))
    // two experiments adjust independently; cap at 1e6 holds
    val two = Seq(("e1", "a", 1000L), ("e2", "a", 900000L),
      ("e2", "b", 950000L)).toDF("exp", "metric", "p_micro")
    val g3 = Experiment.bhAdjust(two, "exp", "metric", "p_micro", 50000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(g3(("e1", "a")) === (1L, 1L, 1000L))
    assert(g3(("e2", "a")) === (1L, 2L, 950000L)) // min(ceil(2*.9/1)=1e6 cap? no: 1800000 capped to 1e6; suffix-min with rank2's 950000)
    assert(g3(("e2", "b")) === (2L, 2L, 950000L))
  }

  test("mondrian conformal: per-group qhat, thin groups fail soft with NULLs") {
    import spark.implicits._
    // group A residuals 1..10, group B residuals 10,20,...,100: same n,
    // different qhat (alpha=0.2 -> k=9 -> 9 vs 90); group C has ONE row
    // (k = ceil(2*0.8) = 2 > 1) -> NULL bounds
    val calib = ((1 to 10).map(i => ("A", 100.0 + i, 100.0)) ++
      (1 to 10).map(i => ("B", 100.0 + 10 * i, 100.0)) ++
      Seq(("C", 101.0, 100.0))).zipWithIndex
      .map { case ((g, p, a), i) => (i.toLong, g, p, a) }
      .toDF("id", "g", "pred", "actual")
    val test0 = Seq((1L, "A", 50.0), (2L, "B", 50.0), (3L, "C", 50.0))
      .toDF("id", "g", "pred")
    val got = Experiment.conformalIntervalsByGroup(calib, test0, "g",
      "pred", "actual", alphaMicro = 200000L)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(got("A").getLong(3) === 9000000L)
    assert(got("B").getLong(3) === 90000000L)
    assert(got("C").isNullAt(3) && got("C").isNullAt(4) && got("C").isNullAt(5))
    // single-group mondrian == the global face
    val one = calib.filter($"g" === "A")
    val t1 = Seq((9L, "A", 70.0)).toDF("id", "g", "pred")
    val m = Experiment.conformalIntervalsByGroup(one, t1, "g", "pred", "actual", 200000L).head()
    val gl = Experiment.conformalIntervals(one, t1.drop("g"), "pred", "actual", 200000L).head()
    assert(m.getLong(3) === gl.getLong(2) && m.getLong(4) === gl.getLong(3))
  }
}

