package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted aggregation equals plain group-by on a skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a tail
    val df = (Seq.fill(10000)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .map { case (k, i) => (k, i.toDouble) }.toDF("k", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salts = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,6)")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(salted === plain)
  }

  test("partial stage spreads the hot key over multiple groups") {
    import spark.implicits._
    val df = Seq.fill(5000)(("hot", 1.0)).toDF("k", "v").repartition(8)
    val partialGroups = df
      .withColumn("__salt",
        pmod(xxhash64(col("v"), spark_partition_id(), monotonically_increasing_id()), lit(8)))
      .groupBy("k", "__salt").count().count()
    assert(partialGroups > 1, "salt must split the hot key")
  }
}
