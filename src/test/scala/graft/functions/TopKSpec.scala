package graft.functions

import graft.SparkTestBase
import graft.ops.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  test("aggregator semantics: ordered, bounded, deterministic ties") {
    val a = new TopK(3)
    val fed = Seq((1.0, 5L), (3.0, 1L), (2.0, 2L), (3.0, 9L), (0.5, 7L))
      .foldLeft(a.zero)(a.reduce)
    assert(fed === Seq((3.0, 9L), (3.0, 1L), (2.0, 2L))) // score desc, id desc
    // merge of two partial buffers equals feeding everything into one
    val l = Seq((5.0, 1L), (3.0, 1L)).foldLeft(a.zero)(a.reduce)
    val r = Seq((4.0, 2L), (3.0, 9L)).foldLeft(a.zero)(a.reduce)
    assert(a.merge(l, r) === Seq((5.0, 1L), (4.0, 2L), (3.0, 9L)))
    assert(a.merge(r, l) === a.merge(l, r)) // commutative
  }

  test("topKPerKey equals the window row_number form on random data") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 5000L).map(i =>
      (i % 37, rnd.nextInt(100).toDouble, i)).toDF("key", "score", "id")
    val got = Relational.topKPerKey(df, "key", "score", "id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id".desc)
    val exp = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 4).select($"key", $"rank", $"id", $"score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(got === exp && got.nonEmpty)
  }

  test("keys with fewer than k rows return all their rows") {
    val df = Seq((1L, 9.0, 100L)).toDF("key", "score", "id")
    val got = Relational.topKPerKey(df, "key", "score", "id", k = 5).collect()
    assert(got.length === 1 && got(0).getLong(1) === 1L)
  }

  test("plan partial-aggregates: no Sort over the input, two-phase aggregate") {
    val df = (1L to 100L).map(i => (i % 5, i.toDouble, i)).toDF("key", "score", "id")
    val plan = Relational.topKPerKey(df, "key", "score", "id", k = 2)
      .queryExecution.executedPlan.toString
    // partial + final ScalaAggregator phases around one exchange, no window sort
    assert(plan.contains("partial_topk") || plan.toLowerCase.contains("partial"))
    assert(!plan.contains("Window"))
  }
}
