package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class WeightedQuantileSpec extends SparkTestBase {
  import spark.implicits._

  test("weighted median lands where the WEIGHT mass crosses half") {
    // values 1,2,3 with weights 1,1,10: half the mass sits at v=3
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0))
      .toDF("k", "v", "w")
    val r = Relational.weightedQuantilePerGroup(df, "k", "v", "w").head()
    assert(r.getDouble(1) === 3.0)
    assert(r.getLong(2) === 12000000L)
  }

  test("exact threshold tie: cumulative weight EQUAL to half qualifies") {
    // w(1)=5, w(2)=5: W(1)*2 == W_total -> lower weighted median is 1
    val df = Seq(("g", 1.0, 5.0), ("g", 2.0, 5.0)).toDF("k", "v", "w")
    val r = Relational.weightedQuantilePerGroup(df, "k", "v", "w").head()
    assert(r.getDouble(1) === 1.0)
  }

  test("duplicate values pool their weight before the threshold test") {
    // v=2 appears twice with w=3 each (pooled 6 of 10): W(1)=4 < 5,
    // W(2)=10 >= 5 regardless of how the two v=2 rows are ordered
    val df = Seq(("g", 1.0, 4.0), ("g", 2.0, 3.0), ("g", 2.0, 3.0))
      .toDF("k", "v", "w")
    val r = Relational.weightedQuantilePerGroup(df, "k", "v", "w").head()
    assert(r.getDouble(1) === 2.0)
  }

  test("pMicro generalizes: p=0.25 and p=1.0 hit the expected values") {
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0),
      ("g", 4.0, 1.0)).toDF("k", "v", "w")
    val q25 = Relational.weightedQuantilePerGroup(df, "k", "v", "w",
      pMicro = 250000L).head().getDouble(1)
    val q100 = Relational.weightedQuantilePerGroup(df, "k", "v", "w",
      pMicro = 1000000L).head().getDouble(1)
    assert(q25 === 1.0) // W(1)=1 = 25% of 4 exactly
    assert(q100 === 4.0)
  }

  test("unweighted degenerate (all w=1) agrees with the exact percentile") {
    val vals = (1 to 101).map(i => ("g", i.toDouble, 1.0))
    val df = vals.toDF("k", "v", "w")
    val r = Relational.weightedQuantilePerGroup(df, "k", "v", "w").head()
    assert(r.getDouble(1) === 51.0) // ceil-median of 1..101
  }

  test("per-day histogram states union into the one-shot quantile") {
    val df = Seq(("g", 1.0, 4.0), ("g", 2.0, 3.0), ("g", 2.0, 3.0),
      ("g", 3.0, 2.0), ("h", 9.0, 1.0)).toDF("k", "v", "w")
    val s1 = Relational.weightedValueHistogram(
      df.filter(col("w") > 2.5), "k", "v", "w")
    val s2 = Relational.weightedValueHistogram(
      df.filter(col("w") <= 2.5), "k", "v", "w")
    val merged = Relational.weightedQuantileFromState(
      s1.unionByName(s2), "k").orderBy("k").collect().map(_.toSeq)
    val direct = Relational.weightedQuantilePerGroup(df, "k", "v", "w")
      .orderBy("k").collect().map(_.toSeq)
    assert(merged.toSeq === direct.toSeq)
  }

  test("groups are independent; window runs over distinct values only") {
    val df = Seq(("a", 1.0, 1.0), ("a", 9.0, 3.0), ("b", 5.0, 2.0))
      .toDF("k", "v", "w")
    val out = Relational.weightedQuantilePerGroup(df, "k", "v", "w")
      .orderBy("k").collect()
    assert(out.map(_.getDouble(1)).toSeq === Seq(9.0, 5.0))
    val plan = Relational.weightedQuantilePerGroup(df, "k", "v", "w")
      .queryExecution.optimizedPlan.toString
    // the pre-aggregation on (group, value) must sit BELOW the window
    assert(plan.contains("Window"))
    assert(plan.indexOf("Aggregate") >= 0)
  }
}
