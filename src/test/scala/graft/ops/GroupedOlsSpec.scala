package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GroupedOlsSpec extends SparkTestBase {
  import spark.implicits._

  test("perfect line recovers slope/intercept exactly, r = 1") {
    val df = (1 to 50).map(i => ("g", i.toDouble, 2.0 * i + 3.0))
      .toDF("grp", "x", "y")
    val r = Relational.groupedOls(df, "grp", "x", "y").collect().head
    assert(r.getLong(1) === 50L)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("agrees with Spark's regr_slope/regr_intercept/corr per group") {
    // deterministic pseudo-noise so the fit is non-trivial
    val df = (1 to 400).map { i =>
      val g = if (i % 2 == 0) "even" else "odd"
      val noise = ((i * 2654435761L) % 97).toDouble / 10.0
      (g, i.toDouble, 0.5 * i + noise)
    }.toDF("grp", "x", "y")
    val ours = Relational.groupedOls(df, "grp", "x", "y").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ref = df.groupBy("grp").agg(
      expr("regr_slope(y, x)").as("s"), expr("regr_intercept(y, x)").as("i"),
      corr(col("y"), col("x")).as("r")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for (g <- Seq("even", "odd")) {
      assert(math.abs(ours(g)._1 - ref(g)._1) < 1e-9, s"slope $g")
      assert(math.abs(ours(g)._2 - ref(g)._2) < 1e-6, s"intercept $g")
      assert(math.abs(ours(g)._3 - ref(g)._3) < 1e-9, s"r $g")
    }
  }

  test("one shuffle: the closed form rides the single grouped aggregate") {
    val df = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val plan = Relational.groupedOls(df, "l_returnflag", "l_quantity", "l_extendedprice")
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"expected one shuffle (plus AQE read), got:\n$plan")
  }
}
