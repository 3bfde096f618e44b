package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Evidence that runtime skew mitigation is ACTIVE for plain sort-merge
  * joins — the 100 TB story for skewed join keys is "AQE splits the hot
  * partition", and this pins that the engine's plans actually let AQE do
  * it (a hand-tuned physical plan or disabled adaptive execution would
  * silently lose the protection). Salting (ops/Skew) covers aggregation
  * skew; this covers join skew. */
class AqeSkewJoinSpec extends SparkTestBase {

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k))
    try {
      // force shuffle joins and make the skew detector fire on KB-scale data
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.shuffle.partitions", "8")

      // one hot key carrying ~95% of fact rows, with a payload wide
      // enough that its partition crosses the threshold
      val pad = "x" * 64
      val fact = spark.range(0, 30000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit(pad), col("id")).as("payload"))
      val dim = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 2).as("attr"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS query execution (count() would plan its
      // own), so the adaptive plan below is the final, executed one
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join (plan:\n${finalPlan.take(2000)})")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
