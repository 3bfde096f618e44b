package graft.ops

import graft.SparkTestBase
import graft.etl.Merge
import graft.ext.Features
import org.apache.spark.sql.functions._

/** Plan-shape assertions for the round-5 operators: the 100 TB
  * contract is a property of the PLAN (what shuffles, what broadcasts,
  * what reaches the scan), so it is pinned like any other behavior. */
class PlanShapeSpec extends SparkTestBase {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Shuffle exchanges only — BroadcastExchange is not a shuffle. */
  private def shuffleCount(plan: String): Int =
    "Exchange (hash|range|Single)".r.findAllIn(plan).length

  test("temporalJoin drives on the equi key — no cartesian/nested-loop join") {
    val facts = (1L to 1000L).map(i => (i, i % 50, i % 300)).toDF("fid", "k", "ts")
    val dim = (0L until 50L).map(k => (k, s"v$k", 0L, Option.empty[Long]))
      .toDF("k", "attr", "valid_from", "valid_to")
      .select($"k", $"attr", $"valid_from", $"valid_to".cast("long"))
    val plan = planOf(Merge.temporalJoin(facts, dim, Seq("k"), "ts"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval predicate must ride the equi join as a residual:\n$plan")
  }

  test("tableDigest aggregates in two phases: partial before the exchange") {
    val df = (1L to 1000L).map(i => (i, s"s$i")).toDF("k", "s")
    val plan = planOf(Cdc.tableDigest(df, Seq("k"), buckets = 32))
    // one shuffle total (the bucket groupBy), with a map-side partial
    assert(shuffleCount(plan) === 1, s"expected exactly one shuffle:\n$plan")
    assert(plan.toLowerCase.contains("partial"), s"expected map-side partial agg:\n$plan")
  }

  test("drillDiff probes the dirty-bucket set via broadcast, not shuffle") {
    val a = (1L to 2000L).map(i => (i, s"s$i")).toDF("k", "s")
    val b = (1L to 2000L).map(i => (i, if (i == 7) "X" else s"s$i")).toDF("k", "s")
    val plan = planOf(Cdc.drillDiff(a, b, Seq("k"), buckets = 32))
    assert(plan.contains("BroadcastHashJoin"), s"dirty-bucket semi join must broadcast:\n$plan")
  }

  test("quantileBinsDiscrete broadcasts the value->bin map back to the rows") {
    val df = (1L to 5000L).map(i => (i, i % 20)).toDF("id", "v")
    val plan = planOf(Features.quantileBinsDiscrete(df, "v", k = 4))
    assert(plan.contains("BroadcastHashJoin"), s"bin map must broadcast:\n$plan")
    // shuffles touch only the histogram (agg + tiny window), never the table
    assert(shuffleCount(plan) <= 2,
      s"too many shuffles for a histogram-broadcast plan:\n$plan")
  }

  test("modePerGroup shuffles pairs then groups — no raw-row window") {
    val df = (1L to 1000L).map(i => (i % 7, i % 13)).toDF("g", "v")
    val plan = planOf(Relational.modePerGroup(df, Seq("g"), "v"))
    assert(!plan.contains("Window"), s"mode must not window over raw rows:\n$plan")
  }

  test("cusum runs on ONE shuffle: totals and running extrema reuse the key partitioning") {
    val df = (1L to 2000L).map(i => ("k" + i % 5, i % 200, i % 7)).toDF("k", "t", "x")
    val plan = planOf(TimeSeries.cusum(df, "k", "t", "x"))
    assert(shuffleCount(plan) === 1,
      s"windows must all ride the single key exchange:\n$plan")
  }

  test("robustScale broadcasts the quartile cuts back — the table never re-shuffles") {
    val df = (1L to 5000L).map(i => ("g" + i % 3, (i % 40).toDouble)).toDF("g", "v")
    val plan = planOf(Features.robustScale(df, "g", "v"))
    assert(plan.contains("BroadcastHashJoin"), s"cuts must broadcast:\n$plan")
    // shuffles touch only the distinct-value histogram (agg + window)
    assert(shuffleCount(plan) <= 2,
      s"too many shuffles for the histogram topology:\n$plan")
  }

  test("ccf is one lag-Expand equi-join — no window over the series") {
    val df = (0L until 500L).map(t => ("k", t, t % 9, t % 11)).toDF("k", "t", "x", "y")
    val plan = planOf(TimeSeries.ccf(df, "k", "t", "x", "y", maxLag = 3))
    assert(!plan.contains("Window"), s"ccf must not window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"lag pairing must be an equi join:\n$plan")
    assert(plan.contains("Expand") || plan.toLowerCase.contains("generate"),
      s"lags must fan out as a zero-shuffle Expand/Generate:\n$plan")
  }
}
