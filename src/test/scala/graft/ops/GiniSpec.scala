package graft.ops

import graft.SparkTestBase

class GiniSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)], scale: Long = 1L) =
    Relational.giniPerGroup(rows.toDF("g", "v"), Seq("g"), "v", scale)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("hand-computed concentration, exact integers") {
    // all-equal group -> G = 0; {0,0,10} -> G = (2*30 - 4*10)/(3*10) = 2/3
    val got = run(Seq(
      ("eq", 5.0), ("eq", 5.0), ("eq", 5.0),
      ("skew", 0.0), ("skew", 0.0), ("skew", 10.0)))
    assert(got("eq") === ((3L, 15L, 0L)))
    assert(got("skew") === ((3L, 10L, 666666L)))
  }

  test("rank ties commute: permuting equal values never changes the statistic") {
    val base = Seq(("g", 3.0), ("g", 3.0), ("g", 3.0), ("g", 1.0), ("g", 8.0))
    val shuffles = Seq(base, base.reverse, scala.util.Random.shuffle(base))
    val results = shuffles.map(run(_)("g"))
    assert(results.distinct.size === 1)
  }

  test("negative values and zero-total groups are excluded, not wrong") {
    val got = run(Seq(("a", -1.0), ("a", 2.0), ("a", 2.0), ("z", 0.0)))
    // the -1 row drops; {2,2} -> G = 0; the all-zero group drops entirely
    assert(got === Map("a" -> ((2L, 4L, 0L))))
  }

  test("matches the mean-absolute-difference definition on random data") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(80)(rnd.nextInt(500).toDouble)
    val microGot = run(xs.map(("g", _)))("g")._3
    // G = sum_{i,j} |x_i - x_j| / (2 n^2 mu) ... with the (n+1) rank form
    // equal to (2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x)) over sorted x
    val sorted = xs.map(_.toLong).sorted
    val n = sorted.length.toLong
    val s = sorted.sum
    val si = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expect = (BigInt(2 * si - (n + 1) * s) * 1000000 / BigInt(n * s)).toLong
    assert(microGot === expect)
  }
}
