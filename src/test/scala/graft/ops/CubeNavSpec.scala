package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CubeNavSpec extends SparkTestBase {
  import spark.implicits._

  private def base = Seq(
    ("a", 1, 10.0), ("a", 1, 5.0), ("a", 2, 1.0),
    ("b", 1, 2.0), ("b", 2, 4.0), ("b", 2, 8.0)
  ).toDF("d1", "d2", "v")

  private def cube = CubeNav.materializeCube(base, Seq("d1", "d2"), "v")

  test("every marginal navigated from the cube equals a direct GROUP BY") {
    // by d1
    val byD1 = CubeNav.fromCube(cube, Seq("d1", "d2"), Seq("d1"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).sortBy(_._1)
    assert(byD1.toSeq === Seq(("a", 3L, 16.0), ("b", 3L, 14.0)))
    // by d2
    val byD2 = CubeNav.fromCube(cube, Seq("d1", "d2"), Seq("d2"))
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).sortBy(_._1)
    assert(byD2.toSeq === Seq((1, 3L, 17.0), (2, 3L, 13.0)))
    // grand total
    val total = CubeNav.fromCube(cube, Seq("d1", "d2"), Seq.empty)
      .collect().map(r => (r.getLong(0), r.getDecimal(1).doubleValue))
    assert(total.toSeq === Seq((6L, 30.0)))
    // finest level
    val fine = CubeNav.fromCube(cube, Seq("d1", "d2"), Seq("d1", "d2"))
    assert(fine.count() === 4L)
  }

  test("navigation rejects non-dimensions") {
    intercept[IllegalArgumentException] {
      CubeNav.fromCube(cube, Seq("d1", "d2"), Seq("nope"))
    }
  }

  test("navigation is a filter, not a re-aggregation") {
    val plan = CubeNav.fromCube(cube, Seq("d1", "d2"), Seq("d1"))
      .queryExecution.optimizedPlan.toString
    // exactly the one cube aggregate; navigating adds no second Aggregate
    assert(plan.split("Aggregate").length - 1 === 1)
  }
}
