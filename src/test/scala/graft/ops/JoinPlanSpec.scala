package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}

/** Scale-shape assertions for the flagship join queries: SF-scaling
  * tables (orders, customer, supplier, lineitem) must never carry a
  * forced broadcast hint — at 100× data a forced broadcast of a
  * linearly-scaling table is an executor OOM. Only the fixed-size
  * dimensions (nation = 25 rows, region = 5 rows) may be hinted;
  * everything else is left to Catalyst statistics + AQE runtime
  * decisions. */
class JoinPlanSpec extends SparkTestBase {

  /** Output column names of every join side that carries an explicit
    * BROADCAST hint in the optimized logical plan. */
  private def broadcastHintedSides(df: DataFrame): Seq[Set[String]] =
    df.queryExecution.optimizedPlan.collect { case j: Join =>
      Seq(
        j.hint.leftHint.flatMap(_.strategy).collect { case BROADCAST =>
          j.left.output.map(_.name).toSet
        },
        j.hint.rightHint.flatMap(_.strategy).collect { case BROADCAST =>
          j.right.output.map(_.name).toSet
        }).flatten
    }.flatten

  private def isFixedSizeDim(cols: Set[String]): Boolean =
    cols.forall(c => c.startsWith("n_") || c.startsWith("r_"))

  test("q3_revenue_topk: no broadcast hint on any SF-scaling table") {
    val df = Relational.revenueTopOrders(spark, sf())
    val hinted = broadcastHintedSides(df)
    assert(hinted.forall(isFixedSizeDim),
      s"forced broadcast of SF-scaling side(s): $hinted")
    assert(df.count() > 0)
  }

  test("q5_revenue_by_nation: broadcast hints only on nation/region") {
    val df = Relational.revenueByNation(spark, sf())
    val hinted = broadcastHintedSides(df)
    assert(hinted.nonEmpty, "expected nation/region broadcast hints to survive")
    assert(hinted.forall(isFixedSizeDim),
      s"forced broadcast of SF-scaling side(s): $hinted")
    assert(df.count() > 0)
  }
}
