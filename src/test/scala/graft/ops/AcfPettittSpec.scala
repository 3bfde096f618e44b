package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Time-series diagnostics: ACF against hand-computed values (pairs
  * semantics under gaps), Pettitt against a brute-force double-loop
  * reference (ties via average ranks, earliest-argmax determinism). */
class AcfPettittSpec extends SparkTestBase {
  import spark.implicits._

  private def acfRef(xs: Seq[(Long, Double)], lag: Int): (Long, Double) = {
    val n = xs.size
    val mean = xs.map(_._2).sum / n
    val byT = xs.toMap
    val pairs = xs.collect { case (t, x) if byT.contains(t + lag) => (x, byT(t + lag)) }
    val num = pairs.map { case (a, b) => (a - mean) * (b - mean) }.sum
    val den = xs.map { case (_, x) => (x - mean) * (x - mean) }.sum
    (pairs.size.toLong, num / den)
  }

  test("acf: alternating series has lag-1 ~ -1, lag-2 ~ +1") {
    val xs = (1L to 40L).map(t => (t, if (t % 2 == 0) 10.0 else 2.0))
    val df = xs.map { case (t, x) => ("k", t, x) }.toDF("g", "t", "x")
    val got = TimeSeries.acf(df, "g", "t", "x", maxLag = 2)
      .select("lag", "m", "n", "acf_micro")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    for (lag <- Seq(1, 2)) {
      val (m, r) = acfRef(xs, lag)
      val row = got(lag.toLong)
      assert(row._2 == m && row._3 == 40L)
      assert(math.abs(row._4 - math.round(r * 1e6)) <= 1, s"lag=$lag got ${row._4} want ${r}")
    }
  }

  test("acf: gap in the series drops only the straddling pairs") {
    // t = 1..10 without 5: lag-1 pairs lose (4,5) and (5,6) -> m = 7
    val xs = ((1L to 10L).filterNot(_ == 5L)).map(t => (t, t * 1.5 + (t % 3)))
    val df = xs.map { case (t, x) => ("k", t, x) }.toDF("g", "t", "x")
    val got = TimeSeries.acf(df, "g", "t", "x", maxLag = 1)
      .select("m", "acf_micro").as[(Long, Long)].head()
    val (m, r) = acfRef(xs, 1)
    assert(got._1 == 7L && m == 7L)
    assert(math.abs(got._2 - math.round(r * 1e6)) <= 1)
  }

  test("acf: two keys stay independent") {
    val df = ((1L to 20L).map(t => ("a", t, t.toDouble)) ++
      (1L to 20L).map(t => ("b", t, (t % 2).toDouble))).toDF("g", "t", "x")
    val got = TimeSeries.acf(df, "g", "t", "x", maxLag = 1)
      .select("g", "acf_micro").as[(String, Long)].collect().toMap
    assert(got("a") > 800000L)  // strong positive autocorrelation on a ramp
    assert(got("b") < -800000L) // alternating
  }

  private def pettittRef(xs: Seq[Double]): (Long, Int) = {
    val n = xs.size
    // U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j), exact on rationals via sign
    var best = 0L
    var bestT = -1
    for (t <- 1 until n) {
      var u = 0L
      for (i <- 0 until t; j <- t until n)
        u += java.lang.Double.compare(xs(i), xs(j)).sign
      if (math.abs(u) > best) { best = math.abs(u); bestT = t }
      else if (bestT < 0) bestT = t
    }
    (best, bestT)
  }

  test("pettitt == brute-force sign double-loop, step series") {
    val xs = Seq(1.0, 2.0, 1.5, 1.2, 9.0, 8.5, 9.2, 8.8, 9.1)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong + 1, x) }
      .toDF("g", "t", "x")
    // valCol is cast to long inside pettitt — feed scaled integers
    val dfi = df.withColumn("x", (col("x") * 10).cast("long"))
    val got = TimeSeries.pettitt(dfi, "g", "t", "x")
      .select("n", "k_stat", "cp_t").as[(Long, Long, Long)].head()
    val (k, t) = pettittRef(xs)
    assert(got._1 == xs.size.toLong)
    assert(got._2 == k, s"k_stat ${got._2} want $k")
    assert(got._3 == t.toLong, s"cp_t ${got._3} want $t (1-based t index)")
  }

  test("pettitt: ties handled via average ranks, earliest argmax wins") {
    val xs = Seq(3.0, 3.0, 3.0, 3.0, 7.0, 7.0, 7.0, 7.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong + 1, x) }
      .toDF("g", "t", "x").withColumn("x", col("x").cast("long"))
    val got = TimeSeries.pettitt(df, "g", "t", "x")
      .select("k_stat", "cp_t").as[(Long, Long)].head()
    val (k, t) = pettittRef(xs)
    assert(got._1 == k && got._2 == t.toLong)
  }

  test("pettitt == brute force across 10 seeded random series with ties") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(500L + seed)
      val n = 8 + rnd.nextInt(25)
      // small value alphabet forces heavy ties (the average-rank path)
      val xs = (0 until n).map(_ => (rnd.nextInt(5) + 1).toDouble)
      val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong + 1, x.toLong) }
        .toDF("g", "t", "x")
      val got = TimeSeries.pettitt(df, "g", "t", "x")
        .select("k_stat", "cp_t").as[(Long, Long)].head()
      val (k, t) = pettittRef(xs)
      assert(got._1 == k, s"seed=$seed xs=$xs")
      assert(got._2 == t.toLong, s"seed=$seed xs=$xs")
    }
  }

  test("acf == local reference across 8 seeded gappy series") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(900L + seed)
      val xs = (1L to 60L).filter(_ => rnd.nextDouble() > 0.2)
        .map(t => (t, rnd.nextInt(1000) / 10.0))
      val df = xs.map { case (t, x) => ("k", t, x) }.toDF("g", "t", "x")
      val got = TimeSeries.acf(df, "g", "t", "x", maxLag = 3)
        .select("lag", "m", "acf_micro").as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      for (lag <- 1 to 3) {
        val (m, r) = acfRef(xs, lag)
        if (m > 0) {
          assert(got(lag.toLong)._1 == m, s"seed=$seed lag=$lag")
          assert(math.abs(got(lag.toLong)._2 - math.round(r * 1e6)) <= 1,
            s"seed=$seed lag=$lag got=${got(lag.toLong)._2} want=$r")
        }
      }
    }
  }

  test("pettitt: constant series has k_stat 0") {
    val df = (1L to 12L).map(t => ("k", t, 5L)).toDF("g", "t", "x")
    val got = TimeSeries.pettitt(df, "g", "t", "x")
      .select("k_stat", "p_micro").as[(Long, Long)].head()
    assert(got._1 == 0L)
    assert(got._2 == 2000000L) // 2*exp(0) in micro
  }
}
