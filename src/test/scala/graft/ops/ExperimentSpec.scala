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

