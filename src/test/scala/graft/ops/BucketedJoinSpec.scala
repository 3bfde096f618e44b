package graft.ops


import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketing: the co-located-join strategy for repeated large-large joins
  * at scale — both sides pre-hashed into the same bucket layout, so the
  * join runs with ZERO shuffles (at 100 TB this converts the dominant
  * network cost of a fact-fact join into a local merge). */
class BucketedJoinSpec extends SparkTestBase {

  test("join between co-bucketed tables is shuffle-free") {
    // warehouse dir is a static conf; the default (./spark-warehouse) is
    // used and the tables are dropped in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet(s"${sf()}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      assert(joined.count() === 6000) // every lineitem matches its order

      val outer = joined.queryExecution.executedPlan
      val plan = outer.collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan }
        .getOrElse(outer)
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected shuffle-free bucketed join:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
