package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WinsorizeSpec extends SparkTestBase {
  import spark.implicits._

  test("clamps exactly to the interpolated percentile band") {
    // 1..100 in one group: p05 sits at rank 99*0.05 = 4.95 ->
    // v[4] + 0.95*(v[5]-v[4]) = 5.95; p95 at 94.05 -> 95.05
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Relational.winsorize(df, "grp", "v", pLo = 0.05, pHi = 0.95)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(math.abs(out(1.0) - 5.95) < 1e-12)
    assert(math.abs(out(5.0) - 5.95) < 1e-12)
    assert(out(50.0) === 50.0)
    assert(math.abs(out(100.0) - 95.05) < 1e-12)
    assert(math.abs(out(96.0) - 95.05) < 1e-12)
  }

  test("row count is preserved and groups are independent") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 1000.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0)).toDF("grp", "v")
    val out = Relational.winsorize(df, "grp", "v", pLo = 0.0, pHi = 0.5)
    assert(out.count() === 6)
    // group b's median (6.0) must not touch group a's values
    val a = out.filter(col("grp") === "a").agg(max("winsorized")).head.getDouble(0)
    assert(a === 2.0) // a's p50 over (1, 2, 1000) interpolates to 2.0
  }

  test("keeps passthrough columns for a full-row face") {
    val df = Seq((1L, "g", 10.0), (2L, "g", 20.0)).toDF("id", "grp", "v")
    val out = Relational.winsorize(df, "grp", "v", 0.25, 0.75)
    assert(out.columns.toSet === Set("id", "grp", "v", "winsorized"))
  }
}
