package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Adversarial-magnitude battery for the exact-integer operator family
  * (`_micro`/`_nano` outputs): every statistic must be EXACT — equal to
  * a driver-side BigInt/BigDecimal reference replaying the documented
  * formula — or fail LOUDLY (visible NULL under the non-ANSI
  * decimal→long cast, or a thrown error), never a silent int64/decimal
  * wraparound. The r11 ewma cliff proved this bug class is real: the
  * naive α·x·10¹² product wrapped int64 exactly where this battery
  * probes — at the representable edges of the input domain.
  *
  * Each test pushes one operator to its edge regime: values at the
  * quantization caps (2^62 longs, decimal(18,6) max), counts at 10^15
  * via the mergeable count states, rank sums past int64, and the
  * documented overflow cliffs themselves (asserting NULL, not garbage).
  */
class ExtremeMagnitudeSpec extends SparkTestBase {
  import spark.implicits._

  private val M = BigInt(1000000L)

  /** Integer column regardless of physical type (long or decimal). */
  private def big(r: Row, i: Int): BigInt =
    BigInt(new java.math.BigDecimal(r.get(i).toString).toBigIntegerExact)

  test("giniPerGroup exact at 2^62-magnitude values (BigInt reference)") {
    // exact powers of two are double-representable, so the ×scale
    // round-trip through double cannot perturb them; Σx stays under
    // Long.Max so the sum_q diagnostic lands without the NULL escape
    val xs: Seq[Long] = Seq(0L, 1L, 1L << 20, 1L << 40, 1L << 52,
      1L << 61, 1L << 62, 3L, 1L << 30)
    val df = xs.map(x => ("g", x.toDouble)).toDF("g", "v")
    val got = Relational.giniPerGroup(df, Seq("g"), "v", scale = 1L)
      .select("n", "sum_q", "gini_micro").head()
    val sorted = xs.sorted.map(BigInt(_))
    val n = BigInt(sorted.length)
    val s = sorted.sum
    val si = sorted.zipWithIndex.map { case (x, i) => x * BigInt(i + 1) }.sum
    val expMicro = (BigInt(2) * si - (n + 1) * s) * M / (n * s)
    assert(got.getLong(0) === xs.length.toLong)
    assert(big(got, 1) === s)
    assert(big(got, 2) === expMicro)
  }

  test("spearmanPerGroup exact at Long extremes with ties (BigInt rank reference)") {
    val pool = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      (1L << 62), Long.MaxValue - 1, Long.MaxValue)
    val rnd = new scala.util.Random(314)
    val rows = (0 until 240).map(_ =>
      (pool(rnd.nextInt(pool.length)), pool(rnd.nextInt(pool.length))))
    val got = Relational.spearmanPerGroup(
      rows.toDF("x", "y").withColumn("g", lit("g")), Seq("g"), "x", "y")
      .select("n", "rho_micro").head()
    // doubled average ranks: 2r = 2·minRank + tieCount − 1
    def ranks2(vs: Seq[Long]): Seq[BigInt] = {
      val counts = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sortedDistinct = vs.distinct.sorted
      val minRank = sortedDistinct
        .zip(sortedDistinct.scanLeft(1L)((acc, v) => acc + counts(v)).init).toMap
      vs.map(v => BigInt(2) * minRank(v) + counts(v) - 1)
    }
    val rx = ranks2(rows.map(_._1))
    val ry = ranks2(rows.map(_._2))
    val n = BigInt(rows.length)
    val sx = rx.sum; val sy = ry.sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
    val rho = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(got.getLong(0) === rows.length.toLong)
    assert((big(got, 1) - BigInt(math.round(rho * 1e6))).abs <= 1,
      s"rho_micro ${big(got, 1)} vs reference ${math.round(rho * 1e6)}")
  }

  test("ksFromState exact at 10^15 counts; d_num overflow is NULL, never a wrap") {
    // mergeable-state counts reach magnitudes unit-test rows cannot:
    // cum·n products at 10^30 must stay exact through decimal(38,0)
    val c = 1000000000000000L // 1e15
    val ref = Seq((0.0, c), (1.0, c)).toDF("v", "c")
    val cur = Seq((0.0, 2 * c)).toDF("v", "c")
    val got = DataQuality.ksFromState(ref, cur)
      .select("n_ref", "n_cur", "d_num", "ks_micro").head()
    val (nRef, nCur) = (BigInt(2) * c, BigInt(2) * c)
    // distinct v ascending: 0 → |c·2c − 2c·2c| = 2c², 1 → 0
    val dNum = BigInt(2) * BigInt(c) * BigInt(c)
    assert(big(got, 0) === nRef && big(got, 1) === nCur)
    assert(got.isNullAt(2), "d_num past Long.Max must surface as NULL")
    assert(big(got, 3) === dNum * M / (nRef * nCur))
  }

  test("w1FromState exact across the full long value range (gap > Long.Max)") {
    // a lone outlier at −2^62 against mass at 0: the consecutive-gap
    // exceeds Long.Max (long subtraction would wrap negative and
    // silently corrupt W1) yet the true micro result fits int64 — it
    // must come out EXACT, which forces the gap into decimal
    val hi = 1L << 62
    val c = 1000000000L
    val ref = Seq((-hi.toDouble, 1L), (0.0, c - 1)).toDF("v", "c")
    val cur = Seq((0.0, c)).toDF("v", "c")
    val got = DataQuality.w1FromState(ref, cur, scale = 1L)
      .select("n_ref", "n_cur", "w1_num", "w1_micro").head()
    val (nRef, nCur) = (BigInt(c), BigInt(c))
    // at v=−2^62: diff |1·c − 0·c| = c, gap 2^62
    val w1Num = BigInt(c) * BigInt(2).pow(62)
    assert(got.isNullAt(2), "w1_num past Long.Max must surface as NULL")
    assert(big(got, 3) === w1Num * M / (nRef * nCur),
      s"w1_micro ${got.get(3)}")
    // all the mass shifted by 2^62: micro-units exceed Long.Max — the
    // long output cannot represent it and must surface NULL, never the
    // low-64-bit truncation Spark's decimal IntegralDivide produces
    val refB = Seq((-hi.toDouble, 5L), (hi.toDouble, 5L)).toDF("v", "c")
    val curB = Seq((0.0, 7L)).toDF("v", "c")
    val gotB = DataQuality.w1FromState(refB, curB, scale = 1L)
      .select("w1_micro").head()
    assert(gotB.isNullAt(0),
      s"w1_micro past Long.Max must be NULL, got ${gotB.get(0)}")
  }

  test("w1FromState exact at 10^9 counts (w1_num NULL past Long.Max, micro exact)") {
    val c = 1000000000L // 1e9
    val ref = Seq((0.0, c), (1000000.0, c)).toDF("v", "c")
    val cur = Seq((0.0, 2 * c)).toDF("v", "c")
    val got = DataQuality.w1FromState(ref, cur, scale = 1L)
      .select("w1_num", "w1_micro").head()
    val (nRef, nCur) = (BigInt(2) * c, BigInt(2) * c)
    val w1Num = BigInt(2) * BigInt(c) * BigInt(c) * BigInt(1000000)
    assert(got.isNullAt(0), "w1_num past Long.Max must surface as NULL")
    assert(big(got, 1) === w1Num * M / (nRef * nCur))
  }

  test("chi2Drift exact vs BigInt reference, adversarial proportions + NULL category") {
    val ref = (Seq.fill(997)("a") ++ Seq.fill(2)("b") ++ Seq("c") ++
      Seq.fill(3)(null: String)).toDF("v")
    val cur = (Seq.fill(1)("a") ++ Seq.fill(998)("b") ++ Seq.fill(4)("d") ++
      Seq.fill(3)(null: String)).toDF("v")
    val got = DataQuality.chi2Drift(ref, cur, "v")
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"),
        r.getLong(1), r.getLong(2), big(r, 3)))
      .map(t => t._1 -> t).toMap
    val refCounts = Map("a" -> 997L, "b" -> 2L, "c" -> 1L, "<null>" -> 3L)
    val curCounts = Map("a" -> 1L, "b" -> 998L, "d" -> 4L, "<null>" -> 3L)
    val (tRef, tCur) = (BigInt(1003), BigInt(1006))
    assert(got.keySet === refCounts.keySet ++ curCounts.keySet)
    (refCounts.keySet ++ curCounts.keySet).foreach { cat =>
      val nr = BigInt(refCounts.getOrElse(cat, 0L))
      val nc = BigInt(curCounts.getOrElse(cat, 0L))
      val d = nr * tCur - nc * tRef
      val den = tRef * tCur * (nr + nc)
      val exp = (d * d / den) * M + (d * d % den) * M / den
      val (_, gotNr, gotNc, gotCell) = got(cat)
      assert(BigInt(gotNr) === nr && BigInt(gotNc) === nc, s"category $cat counts")
      assert(gotCell === exp, s"category $cat: $gotCell vs $exp")
    }
  }

  test("cohensKappa exact vs BigInt reference; degenerate pe=1 reports 1.0") {
    val rnd = new scala.util.Random(99)
    val labels = Seq("A", "B", "C", "D")
    val rows = (0 until 600).map(_ =>
      (labels(rnd.nextInt(4)), labels(rnd.nextInt(4))))
    val got = DataQuality.cohensKappa(rows.toDF("la", "lb"), "la", "lb")
      .select("n", "n_agree", "kappa_micro").head()
    val n = BigInt(rows.length)
    val agree = BigInt(rows.count(r => r._1 == r._2))
    val ra = rows.groupBy(_._1).view.mapValues(g => BigInt(g.size)).toMap
    val cb = rows.groupBy(_._2).view.mapValues(g => BigInt(g.size)).toMap
    val pe = labels.map(l =>
      ra.getOrElse(l, BigInt(0)) * cb.getOrElse(l, BigInt(0))).sum
    val (num, den) = (agree * n - pe, n * n - pe)
    // SQL div truncates toward zero, as does BigInt./
    val expMicro = if (den == 0) BigInt(1000000) else num * M / den
    assert(big(got, 0) === n && big(got, 1) === agree)
    assert(big(got, 2) === expMicro)
    // degenerate: both annotators constant on the same label → pe = n²
    val gotDeg = DataQuality.cohensKappa(
      Seq.fill(10)(("X", "X")).toDF("la", "lb"), "la", "lb")
      .select("kappa_micro").head()
    assert(big(gotDeg, 0) === BigInt(1000000))
  }

  test("fleissKappa exact vs BigInt reference; single-category panel reports 1.0") {
    val rnd = new scala.util.Random(7)
    val nItems = 40; val nRaters = 5
    val rows = for (i <- 0 until nItems; _ <- 0 until nRaters)
      yield (i.toLong, s"L${rnd.nextInt(3)}")
    val got = DataQuality.fleissKappa(rows.toDF("item", "label"), "item", "label")
      .select("n_items", "n_raters", "a_sum", "s_sum", "kappa_micro").head()
    val nij = rows.groupBy(identity).view.mapValues(g => BigInt(g.size)).toMap
    val a = nij.values.map(x => x * x).sum
    val cj = rows.groupBy(_._2).view.mapValues(g => BigInt(g.size)).toMap
    val s = cj.values.map(x => x * x).sum
    val t = BigInt(nItems) * nRaters
    val expMicro = if (t * t == s) BigInt(1000000)
      else (t * (a - t) - s * (nRaters - 1)) * M /
        ((nRaters - 1) * (t * t - s))
    assert(got.getLong(0) === nItems.toLong && got.getLong(1) === nRaters.toLong)
    assert(big(got, 2) === a && big(got, 3) === s)
    assert(big(got, 4) === expMicro)
    val deg = DataQuality.fleissKappa(
      (0 until 6).flatMap(i => Seq.fill(3)((i.toLong, "only")))
        .toDF("item", "label"),
      "item", "label").select("kappa_micro").head()
    assert(big(deg, 0) === BigInt(1000000))
  }

  test("acf exact(±1µ) at decimal(18,6)-cap values; past the Σx² cliff → NULL, never garbage") {
    // |x| at the quantization cap 999 999 999 999 → __x ≈ 10^18 micro;
    // 40 points keep Σx² ≈ 4·10^37 inside decimal(38,0)
    val cap = 999999999999.0
    val rnd = new scala.util.Random(21)
    val vals40 = (0 until 40).map(_ =>
      (if (rnd.nextBoolean()) 1 else -1) * (cap - rnd.nextInt(1000)))
    val df40 = vals40.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
      .toDF("k", "t", "v")
    val got = TimeSeries.acf(df40, "k", "t", "v", maxLag = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).sortBy(_._1)
    val xs = vals40.map(v => (BigDecimal(v).setScale(6) * 1000000).toBigInt)
    val n = xs.length
    val sAll = xs.sum; val ssAll = xs.map(x => x * x).sum
    (1 to 2).foreach { lag =>
      val pairs = (0 until n - lag).map(i => (xs(i), xs(i + lag)))
      val m = pairs.length
      val aa = pairs.map { case (a, b) => a * b }.sum
      val bb = pairs.map(_._1).sum; val cc = pairs.map(_._2).sum
      val xbar = sAll.toDouble / n
      val num = aa.toDouble - xbar * bb.toDouble - xbar * cc.toDouble +
        m.toDouble * xbar * xbar
      val den = ssAll.toDouble - n.toDouble * xbar * xbar
      val expMicro = math.round(num / den * 1e6)
      val (_, gotM, gotAcf) = got(lag - 1)
      assert(gotM === m.toLong)
      assert(gotAcf.isDefined && math.abs(gotAcf.get - expMicro) <= 1L,
        s"lag $lag: $gotAcf vs $expMicro")
    }
    // 140 cap-magnitude points push Σx² ≈ 1.4·10^38 past decimal(38,0):
    // ANSI (Spark 4 default) throws ARITHMETIC_OVERFLOW loudly; a
    // non-ANSI session would surface NULL — either is acceptable,
    // a wrapped finite value never is
    val df140 = (0 until 140).map(t => ("k", t.toLong, cap)).toDF("k", "t", "v")
    scala.util.Try(TimeSeries.acf(df140, "k", "t", "v", maxLag = 1).collect()) match {
      case scala.util.Failure(e) =>
        assert(Option(e.getMessage).exists(_.contains("ARITHMETIC_OVERFLOW")) ||
          Option(e.getCause).exists(c =>
            Option(c.getMessage).exists(_.contains("ARITHMETIC_OVERFLOW"))),
          s"cliff must fail loudly on overflow, got: $e")
      case scala.util.Success(rows) =>
        assert(rows.nonEmpty && rows.forall(_.isNullAt(4)),
          "past the Σx² cliff acf_micro must be NULL, not a wrapped value")
    }
  }

  test("pettitt exact at Long-extreme values with ties (rank-based: magnitude-immune)") {
    val vals = Seq(Long.MinValue, Long.MinValue, -5L, Long.MaxValue,
      Long.MaxValue, Long.MaxValue, 0L, Long.MinValue + 1, 7L, 7L)
    val df = vals.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
      .toDF("k", "t", "v")
    val got = TimeSeries.pettitt(df, "k", "t", "v")
      .select("n", "k_stat", "cp_t").head()
    // reference: doubled average ranks; U2_t = Σ_{i≤t} 2r_i − t(n+1)
    val n = vals.length
    val counts = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sortedDistinct = vals.distinct.sorted
    val minRank = sortedDistinct
      .zip(sortedDistinct.scanLeft(1L)((acc, v) => acc + counts(v)).init).toMap
    val r2 = vals.map(v => BigInt(2) * minRank(v) + counts(v) - 1)
    val cums = r2.scanLeft(BigInt(0))(_ + _).tail
    val us = cums.zipWithIndex.map { case (c, i) =>
      (c - BigInt(i + 1) * (n + 1), i.toLong)
    }.dropRight(1)
    val k = us.map(_._1.abs).max
    val cpT = us.filter(_._1.abs == k).map(_._2).min
    assert(got.getLong(0) === n.toLong)
    assert(big(got, 1) === k)
    assert(got.getLong(2) === cpT)
  }

  test("PageRank bit-identical to a BigInt simulation at near-bound r0") {
    // r0 = 10^15 on 8 nodes: worst-case inbound mass ·85 ≈ 1.4·10^18,
    // inside int64 by design — the recurrence must land exactly there
    val r0 = 1000000000000000L
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (5L, 6L),
      (6L, 7L), (2L, 3L), (3L, 4L), (4L, 2L), (8L, 1L))
    val got = PageRank.run(edges.toDF("src", "dst"), iterations = 5, r0 = r0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // driver-side replay of the documented recurrence in BigInt
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.distinct.size.toLong).toMap
    val base = BigInt(15L * r0 / 100)
    var rank = nodes.map(_ -> BigInt(r0)).toMap
    (1 to 5).foreach { _ =>
      val inbound = scala.collection.mutable.Map.empty[Long, BigInt]
      nodes.foreach(nd => inbound(nd) = BigInt(0)) // zero-weight self-loops
      edges.distinct.foreach { case (s, d) => inbound(d) += rank(s) / deg(s) }
      rank = nodes.map(nd => nd -> (base + (inbound(nd) * 85) / 100)).toMap
    }
    nodes.foreach { nd =>
      assert(BigInt(got(nd)) === rank(nd), s"node $nd: ${got(nd)} vs ${rank(nd)}")
      assert(rank(nd) <= BigInt(Long.MaxValue), "reference itself must fit int64")
    }
  }

  test("attributionMultiTouch decay weights exact at halflife boundaries") {
    val h = 1800L
    // touches at Δ = 0, h−1, h, 2h, 30h, 60h before the conversion
    val deltas = Seq(0L, h - 1, h, 2 * h, 30 * h, 60 * h)
    val convNs = 1000000L * 1000000000L
    val events = ((100L, "purchase", convNs) +: deltas.zipWithIndex.map {
      case (d, i) => (200L + i, "click", convNs - d * 1000000000L)
    }).map { case (id, tpe, ns) => (1L, id, tpe, ns) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = graft.ext.Events.attributionMultiTouch(events,
      lookbackSeconds = 70L * h, halflifeSeconds = h)
      .collect().map(r => (r.getAs[Long]("t_id"),
        big(r, r.fieldIndex("w_linear_micro")),
        big(r, r.fieldIndex("w_decay_micro")))).sortBy(_._1)
    assert(got.map(_._1) === Seq(200L, 201L, 202L, 203L, 204L, 205L))
    assert(got.map(_._2).distinct === Seq(M / 6)) // ⌊10^6/6⌋ each
    val expDecay = deltas.map(d =>
      BigInt(1000000L / (1L << math.min(d / h, 30L).toInt)))
    assert(got.map(_._3) === expDecay,
      s"decay weights ${got.map(_._3)} vs $expDecay")
  }

  test("survivalCurve exact(±1µ) at nanosecond-extreme timestamps") {
    // ns at ±2^61: tsSec's div-10^9 bounds seconds to ±2.3·10^9, so
    // last−first can never overflow — the curve must come out exact
    val lo = -(1L << 61); val hi = 1L << 61
    val events = Seq(
      (1L, lo), (1L, hi),                        // censored at corpus max
      (2L, lo), (2L, lo + 86400L * 1000000000L), // 1 day, churned
      (3L, lo), (3L, lo),                        // 0 days, churned
      (4L, hi), (4L, hi)                         // 0 days at corpus max → censored
    ).toDF("user_id", "ts")
    val got = graft.ext.Events.survivalCurve(events, censorGapSec = 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // SQL div truncates toward zero — mirror it exactly
    def sec(ns: Long) = ns / 1000000000L
    val bigDay = (sec(hi) - sec(lo)) / 86400L
    // per-day (leaving, events): day 0 = user3 churn + user4 censored,
    // day 1 = user2 churn, day bigDay = user1 censored
    val perDay = Seq((0L, 2L, 1L), (1L, 1L, 1L), (bigDay, 1L, 0L))
    var atRisk = 4L
    var cum = 0L
    val expected = perDay.map { case (day, leaving, ev) =>
      val term = if (ev > 0 && ev < atRisk)
        math.round(math.log((atRisk - ev).toDouble / atRisk) * 1e9) else 0L
      cum += term
      val dead = ev == atRisk
      val surv = if (dead) 0L else math.round(math.exp(cum / 1e9) * 1e6)
      val row = (day, atRisk, ev, leaving - ev, surv)
      atRisk -= leaving
      row
    }
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 === e._1 && g._2 === e._2 && g._3 === e._3 && g._4 === e._4,
        s"day-row mismatch: $g vs $e")
      assert(math.abs(g._5 - e._5) <= 1L, s"surv_micro ${g._5} vs ${e._5}")
    }
  }

  test("twap exact past int64: year-long holds × 10^12 values (BigInt reference)") {
    // per-term v_micro·hold_us ≈ 10^12·10^11 = 10^23 — a long numerator
    // would have wrapped 10^4 times over; decimal(38,0) must carry it
    // exactly and the floor-divmod division must replay in BigInt
    def t(us: Long) = new java.sql.Timestamp(us / 1000L) // whole-ms epochs
    val obs = Seq(
      (0L, 1000000.0),             // v_micro 10^12 held 10^11+e6 us
      (100000001000000L, 2000000.0), // v_micro 2·10^12 held 10^11-e6 us
      (200000000000000L, 0.0))     // terminal, zero hold
    val df = obs.zipWithIndex
      .map { case ((us, v), i) => ("g", t(us), i.toLong, v) }
      .toDF("k", "ts", "id", "v")
    val got = TimeSeries.twap(df, "k", "ts", "id", "v").head()
    val vMicro = obs.map(o => BigInt(math.round(o._2 * 1e6)))
    val tsUs = obs.map(o => BigInt(o._1))
    val holds = tsUs.sliding(2).map(p => p(1) - p(0)).toSeq :+ BigInt(0)
    val num = vMicro.zip(holds).map { case (v, h) => v * h }.sum
    val dur = holds.sum
    val expected = (num - num.mod(dur)) / dur +
      (if (num.mod(dur) * 2 >= dur) 1 else 0)
    assert(BigInt(got.getLong(2)) === dur)
    assert(BigInt(got.getLong(3)) === expected)
  }

  test("cramersVFromCells exact at 10^7-scale counts (BigInt reference); " +
    "past the decimal cliff χ² is NULL, never a wrap") {
    // strongly-associated 2x2 with counts a unit test could never
    // generate by rows: d ≈ 10^14, so d²·10^6 ≈ 10^34 exercises the
    // top of decimal(38,0) while staying exact
    val (xu, xw, yu, yw) = (10000000L, 1L, 1L, 10000000L)
    val cells = Seq(("x", "u", xu), ("x", "w", xw),
      ("y", "u", yu), ("y", "w", yw)).toDF("a", "b", "n_ab")
    val got = DataQuality.cramersVFromCells(cells).head()
    val n = BigInt(xu) + xw + yu + yw
    val (ra1, ra2) = (BigInt(xu) + xw, BigInt(yu) + yw)
    val (cb1, cb2) = (BigInt(xu) + yu, BigInt(xw) + yw)
    val chi2 = Seq(
      (BigInt(xu), ra1, cb1), (BigInt(xw), ra1, cb2),
      (BigInt(yu), ra2, cb1), (BigInt(yw), ra2, cb2))
      .map { case (nab, ra, cb) =>
        val d = n * nab - ra * cb
        d * d * 1000000 / (n * ra * cb)
      }.sum
    assert(big(got, 0) === n)
    assert(big(got, 3) === chi2)
    // replay the operator's exact pipeline: floor-div by n·(k−1),
    // THEN the one double sqrt — not a pure-double reformulation
    val vExp = math.round(math.sqrt((chi2 / n).toLong / 1e6) * 1e6)
    assert(got.getLong(4) === vExp)
    // cliff: diagonal counts at 10^10 give d = 10^20, d² = 10^40 —
    // past decimal(38,0): LOUD (ANSI overflow error, or visible NULL
    // under a non-ANSI session), never a silently wrapped χ²
    val over = Seq(("x", "u", 10000000000L), ("y", "w", 10000000000L))
      .toDF("a", "b", "n_ab")
    try {
      val o = DataQuality.cramersVFromCells(over).head()
      assert(o.isNullAt(3), "chi2 past the decimal cliff must surface NULL")
    } catch {
      case e: Exception =>
        val m = e.getMessage
        assert(m.contains("OUT_OF_RANGE") || m.contains("OVERFLOW"),
          s"expected an overflow error, got: $m")
    }
  }

  test("weightedQuantilePerGroup integer threshold exact at 10^12-unit weights") {
    // w_micro ≈ 9·10^17 per row: cum·10^6 ≈ 10^24 would wrap a long —
    // the threshold product must run in decimal. Two heavy rows: the
    // first holds exactly half the mass -> lower median is the first.
    val w = 900000000000.0 // 9e11 units -> 9e17 micro, double-exact
    val df = Seq(("g", 1.0, w), ("g", 2.0, w)).toDF("k", "v", "w")
    val r = Relational.weightedQuantilePerGroup(df, "k", "v", "w").head()
    assert(r.getDouble(1) === 1.0)
    assert(BigInt(r.getLong(2)) === BigInt(math.round(w * 1e6)) * 2)
  }

  test("cusum exact at decimal(18,6)-cap values (BigInt Page reference)") {
    // x at the quantization cap 999 999 999 999 -> x_micro ≈ 10^18;
    // cum ≈ kDen·n·x_micro·n ≈ 1.6·10^22, s·2·10^6 ≈ 3·10^28 — all
    // deep inside decimal(38,0); the statistic must equal Page's
    // recursion on the same scaled BigInts EXACTLY (no tolerance).
    val cap = 999999999999L
    val xs = (0 until 25).map(i => cap - 500L + (i % 7)) ++
      (0 until 15).map(i => cap - 100L + (i % 3)) // upward shift at the cap
    val df = xs.zipWithIndex.map { case (x, t) => ("k", t.toLong, x.toDouble) }
      .toDF("k", "t", "x")
    val got = TimeSeries.cusum(df, "k", "t", "x",
        kNum = 1L, kDen = 10L, hNum = 1L, hDen = 2L)
      .orderBy("t").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    // Page recursion in BigInt on the identical scaled integers
    val micro = xs.map(x => BigInt(x) * 1000000)
    val n = BigInt(micro.size); val total = micro.sum
    val den = BigInt(10) * total.abs
    var sp = BigInt(0); var sn = BigInt(0)
    val want = micro.map { x =>
      sp = (sp + (BigInt(10) * n * x - BigInt(11) * total)).max(BigInt(0))
      sn = (sn - (BigInt(10) * n * x - BigInt(9) * total)).max(BigInt(0))
      def mu(s: BigInt) = ((s * 2000000 + den) / (den * 2)).toLong
      (mu(sp), mu(sn), sp * 2 > BigInt(10) * total.abs,
        sn * 2 > BigInt(10) * total.abs)
    }
    assert(got.toSeq === want)
    // at cap magnitude the relative shift is ~4e-10 of mu, so no alarm
    // fires — the differential above is the guarantee; flag semantics
    // at alarm-scale shifts are pinned in CusumCcfSpec
    assert(!got.exists(_._3) && !got.exists(_._4))
  }

  test("ccf exact(±1µ) at 10^11-scale values; past the m·Σx² cliff → loud, never garbage") {
    // ccf's final m·Σx² decimal product bounds the exact domain near
    // |x| ≈ 2.4·10^11 for a 40-point series (vs acf, which drops to
    // double before the n· product) — far above any count series; the
    // cliff is LOUD under ANSI (pinned below at the quantization cap)
    val cap = 200000000000.0
    val rnd = new scala.util.Random(33)
    val rows = (0 until 40).map { t =>
      ("k", t.toLong,
        (if (rnd.nextBoolean()) 1 else -1) * (cap - rnd.nextInt(1000)),
        (if (rnd.nextBoolean()) 1 else -1) * (cap - rnd.nextInt(1000)))
    }
    val df = rows.toDF("k", "t", "x", "y")
    val got = TimeSeries.ccf(df, "k", "t", "x", "y", maxLag = 1)
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val xs = rows.map(r => (BigDecimal(r._3).setScale(6) * 1000000).toBigInt)
    val ys = rows.map(r => (BigDecimal(r._4).setScale(6) * 1000000).toBigInt)
    (-1 to 1).foreach { lag =>
      // pair x_t with y_{t+lag} over valid indices
      val idx = rows.indices.filter(i => i + lag >= 0 && i + lag < rows.size)
      val m = idx.size
      val sxy = idx.map(i => xs(i) * ys(i + lag)).sum
      val sx = idx.map(xs(_)).sum; val sy = idx.map(i => ys(i + lag)).sum
      val sxx = idx.map(i => xs(i) * xs(i)).sum
      val syy = idx.map(i => ys(i + lag) * ys(i + lag)).sum
      val num = (BigInt(m) * sxy - sx * sy).toDouble
      val d = math.sqrt((BigInt(m) * sxx - sx * sx).toDouble *
        (BigInt(m) * syy - sy * sy).toDouble)
      val exp = math.round(num / d * 1e6)
      assert(got(lag.toLong).isDefined &&
        math.abs(got(lag.toLong).get - exp) <= 1L, s"lag $lag")
    }
    // at the decimal(18,6) quantization cap, m·Σx² ≈ 1.5·10^39 crosses
    // decimal(38,0) — ANSI throws loudly; non-ANSI surfaces NULL. A
    // wrapped value never.
    val hard = 999999999999.0
    val big = (0 until 40).map(t => ("k", t.toLong, hard, hard)).toDF("k", "t", "x", "y")
    scala.util.Try(TimeSeries.ccf(big, "k", "t", "x", "y", maxLag = 1).collect()) match {
      case scala.util.Failure(e) =>
        def loud(m: String) = m.contains("ARITHMETIC_OVERFLOW") ||
          m.contains("NUMERIC_VALUE_OUT_OF_RANGE")
        assert(Option(e.getMessage).exists(loud) ||
          Option(e.getCause).exists(c => Option(c.getMessage).exists(loud)),
          s"cliff must fail loudly, got: $e")
      case scala.util.Success(rs) =>
        assert(rs.nonEmpty && rs.forall(_.isNullAt(3)),
          "past the cliff ccf_micro must be NULL, not a wrapped value")
    }
  }

  test("holt exact at the count-domain edge; out-of-domain fails loud") {
    // x just under the documented 10^9 bound: the splits stay ≤ ~10^15
    // by construction — the result must equal the unsplit BigInt floor
    val top = 999999999L
    val xs = (0 until 30).map(i => top - 1000L + (i % 13) * 3L)
    val df = xs.zipWithIndex.map { case (x, t) => ("k", t.toLong, x) }
      .toDF("k", "t", "x")
    val got = TimeSeries.holt(df, "k", "t", "x", 300000L, 100000L)
      .orderBy("t").collect().map(r => (r.getLong(3), r.getLong(4)))
    val M = BigInt(1000000)
    def fdiv(a: BigInt, b: BigInt) = {
      val q = a / b; if (a % b != 0 && (a.signum * b.signum) < 0) q - 1 else q
    }
    var l = BigInt(0); var b = BigInt(0)
    val want = xs.zipWithIndex.map { case (x, i) =>
      if (i == 0) { l = BigInt(x) * M; b = BigInt(xs(1) - x) * M }
      else {
        val prevL = l
        l = fdiv(BigInt(300000) * x * M + BigInt(700000) * (l + b), M)
        b = fdiv(BigInt(100000) * (l - prevL) + BigInt(900000) * b, M)
      }
      (l.toLong, b.toLong)
    }
    assert(got.toSeq === want)
    val bad = Seq(("k", 0L, 1000000000L)).toDF("k", "t", "x")
    val ex = intercept[org.apache.spark.SparkException] {
      TimeSeries.holt(bad, "k", "t", "x", 300000L, 100000L).collect()
    }
    assert(ex.getMessage.contains("holt input") ||
      Option(ex.getCause).exists(_.getMessage.contains("holt input")))
  }
}
