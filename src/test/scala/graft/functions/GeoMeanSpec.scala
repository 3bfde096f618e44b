package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.udaf

class GeoMeanSpec extends SparkTestBase {

  test("geometric mean via typed Aggregator with partial aggregation") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 0.0), ("b", 27.0))
      .toDF("k", "v").repartition(4)
    val gm = udaf(GeoMean)
    val got = df.groupBy("k").agg(gm($"v").as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 4.0) < 1e-12) // sqrt(2*8)
    assert(math.abs(got("b") - 9.0) < 1e-12) // zero ignored: sqrt(3*27)
  }

  test("empty group yields NaN") {
    import spark.implicits._
    val df = Seq(("a", -1.0)).toDF("k", "v")
    val gm = udaf(GeoMean)
    val got = df.groupBy("k").agg(gm($"v")).collect().head.getDouble(1)
    assert(got.isNaN)
  }
}
