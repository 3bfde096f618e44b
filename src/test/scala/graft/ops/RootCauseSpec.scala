package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RootCauseSpec extends SparkTestBase {
  import spark.implicits._

  test("dimensionDeltas: the shifted segment carries the delta; others net out") {
    // A: region X carries 10, Y carries 10. B: X collapses to 2, Y grows to 18
    // -> region dimension shows +/-8 per segment; tier is uniform (no signal)
    val a = Seq(("X", "gold", 10.0), ("Y", "gold", 5.0), ("Y", "blue", 5.0))
      .toDF("region", "tier", "rev")
    val b = Seq(("X", "gold", 2.0), ("Y", "gold", 13.0), ("Y", "blue", 5.0))
      .toDF("region", "tier", "rev")
    val got = RootCause.dimensionDeltas(a, b, Seq("region", "tier"), "rev")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(6)))).toMap
    assert(got(("region", "X")) === ((1L, 1L, -8000000L)))
    assert(got(("region", "Y")) === ((2L, 2L, 8000000L)))
    assert(got(("tier", "gold")) === ((2L, 2L, 0L)))
    assert(got(("tier", "blue")) === ((1L, 1L, 0L)))
  }

  test("dimensionDeltas: NULL segments are a real bucket; one-sided segments survive") {
    val a = Seq((Some("X"), 4.0)).toDF("region", "rev")
    val b = Seq((None: Option[String], 4.0)).toDF("region", "rev")
    val got = RootCause.dimensionDeltas(a, b, Seq("region"), "rev")
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(6)))).toMap
    // the metric MOVED into the NULL bucket — the logging-regression signal
    assert(got("X") === ((1L, 0L, -4000000L)))
    assert(got("<NULL>") === ((0L, 1L, 4000000L)))
  }

  test("dimensionDeltas: one Expand pass — a single shuffle for all dimensions") {
    val a = Seq(("X", "g", 1.0)).toDF("region", "tier", "rev")
    val b = Seq(("X", "g", 2.0)).toDF("region", "tier", "rev")
    val plan = RootCause.dimensionDeltas(a, b, Seq("region", "tier"), "rev")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected one grouped shuffle, got:\n$plan")
  }
}
