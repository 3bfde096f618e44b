package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("grid spans each key's own observed range; gaps interpolate linearly") {
    // key A: observations at t=0 (v=10) and t=40 (v=50), step 10
    //        -> grid 0,10,20,30,40 with 20/30/40 interpolated
    // key B: single observation -> single grid row
    val df = Seq(
      ("A", 0L, 10.0), ("A", 40L, 50.0),
      ("B", 100L, 7.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.gapFillInterpolate(df, "k", "ts", "v", step = 10L)
      .orderBy("k", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("A", 0L, 10.0, true),
      ("A", 10L, 20.0, false),
      ("A", 20L, 30.0, false),
      ("A", 30L, 40.0, false),
      ("A", 40L, 50.0, true),
      ("B", 100L, 7.0, true)))
  }

  test("same-bucket values sum exactly through decimal state") {
    val df = Seq(("A", 3L, 0.1), ("A", 7L, 0.2), ("A", 23L, 1.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.gapFillInterpolate(df, "k", "ts", "v", step = 10L)
      .orderBy("bucket").collect()
    assert(out.length === 3) // buckets 0, 10, 20
    assert(out(0).getDouble(2) === 0.3) // 0.1 + 0.2 exact via DECIMAL
    assert(!out(1).getBoolean(3)) // bucket 10 interpolated
    assert(out(2).getDouble(2) === 1.0)
  }

  test("one shuffle for observation aggregation; no driver-side grid") {
    val df = (1L to 1000L).map(i => ("k" + (i % 7), i * 13L, 1.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.gapFillInterpolate(df, "k", "ts", "v", step = 100L)
    // correctness of shape: every key's buckets are contiguous at step 100
    val rows = out.groupBy("k")
      .agg(count(lit(1)).as("n"), min("bucket").as("mn"), max("bucket").as("mx"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === (r.getLong(3) - r.getLong(2)) / 100L + 1L,
        s"non-contiguous grid for ${r.getString(0)}")
    }
    // the grid generation must be an Expand/Generate, not a driver loop:
    // plan contains Generate(explode(sequence)) and exactly two exchanges
    // before AQE (obs groupBy + span groupBy reuse the key partitioning;
    // the left join and windows reuse it too)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("explode(sequence("), s"grid not plan-side:\n$plan")
  }
}
