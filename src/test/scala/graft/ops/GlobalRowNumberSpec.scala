package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRowNumberSpec extends SparkTestBase {
  import spark.implicits._

  test("matches the single-reducer ROW_NUMBER window on shuffled input") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 5000L).map(i => (rnd.nextInt(1000), i)).toDF("v", "id")
      .repartition(13)
    val got = Relational.globalRowNumber(df, Seq("v", "id"), numPartitions = 8)
      .select($"v", $"id", $"row_num")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    val exp = df.withColumn("row_num",
        row_number().over(Window.orderBy($"v", $"id")).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    assert(got.toSeq === exp.toSeq)
    assert(got.map(_._3).toSeq === (1L to 5000L))
  }

  test("plan never funnels data through a single partition") {
    val df = (1L to 100L).map(i => (i % 10, i)).toDF("v", "id")
    val plan = Relational.globalRowNumber(df, Seq("v", "id"), numPartitions = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"found a single-partition exchange:\n$plan")
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Long)].toDF("v", "id")
    assert(Relational.globalRowNumber(df, Seq("v", "id"), numPartitions = 4)
      .count() === 0L)
  }
}
