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
}
