package graft.ops

import graft.SparkTestBase

class RankingWindowsSpec extends SparkTestBase {

  test("all five ranking columns share one exchange and one sort") {
    val df = Relational.rankingWindows(spark, sf())
    df.collect() // force final plan under AQE
    // string rendering: the final adaptive plan nests inside
    // AdaptiveSparkPlanExec, which TreeNode.foreach does not descend into
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE renders both sections
    val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val so = plan.linesIterator.count(_.matches(""".*\bSort \[.*"""))
    assert(ex == 1, s"expected a single exchange, plan had $ex:\n$plan")
    assert(so == 1, s"expected a single sort, plan had $so:\n$plan")
  }

  test("percent_rank and cume_dist are exact rationals of the row number") {
    // re-derive from first principles on the driver
    val got = Relational.rankingWindows(spark, sf())
      .collect()
      .groupBy(_.getLong(0))
    got.take(20).foreach { case (_, part) =>
      val n = part.length
      val sorted = part.sortBy(r => (-r.getDouble(2), r.getLong(1)))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
        assert(r.getDouble(4) == pr, s"pct_rank row $i of $n")
        assert(r.getDouble(5) == (i + 1).toDouble / n, s"cume_dist row $i of $n")
      }
    }
  }
}
