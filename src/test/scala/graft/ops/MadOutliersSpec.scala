package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MadOutliersSpec extends SparkTestBase {
  import spark.implicits._

  test("finds exactly the injected anomalies; clean groups emit nothing") {
    // group a: tight cluster around 100 with two 10x spikes
    // group b: same cluster, no spikes -> no output row for b
    val rows =
      (1 to 200).map(i => ("a", 100.0 + (i % 11))) ++
      Seq(("a", 1000.0), ("a", 1500.0)) ++
      (1 to 200).map(i => ("b", 100.0 + (i % 11)))
    val out = Relational.madOutliers(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out === Map("a" -> ((2L, 1000.0, 1500.0))))
  }

  test("median/MAD are robust: the outliers do not mask themselves") {
    // 30% contamination at 100x still detected (mean/stddev would have
    // absorbed it: stddev ~ 4600 puts the spikes within 2.2 sigma)
    val rows = (1 to 70).map(i => ("g", 50.0 + (i % 5))) ++
      (1 to 30).map(_ => ("g", 5000.0))
    val out = Relational.madOutliers(rows.toDF("g", "v"), "g", "v")
      .collect()
    assert(out.length === 1 && out(0).getLong(1) === 30L)
  }

  test("all-identical group has MAD 0 and no outliers") {
    val rows = (1 to 50).map(_ => ("g", 7.0))
    assert(Relational.madOutliers(rows.toDF("g", "v"), "g", "v").count() === 0L)
  }
}
