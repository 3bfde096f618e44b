package graft.ops

import graft.SparkTestBase

class SqlInterfaceSpec extends SparkTestBase {

  test("sqlInterface: concurrent calls on one session never collide or leak views") {
    // fixed temp-view names would let two concurrent callers clobber
    // each other's registration between register and analyze; the
    // per-invocation names must make parallel calls safe and leave the
    // session catalog clean afterwards
    val expected = Relational.sqlInterface(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val runs = (1 to 8).map { _ =>
        scala.concurrent.Future {
          Relational.sqlInterface(spark, sf()).collect()
            .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        }
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(runs),
        scala.concurrent.duration.Duration(120, "s"))
      results.foreach(r => assert(r === expected))
    } finally pool.shutdown()
    // analysis-time binding means the views can drop immediately: none
    // may outlive their call
    val leftover = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("v_orders"))
    assert(leftover.isEmpty, s"leaked temp views: ${leftover.mkString(",")}")
  }
}
