package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  test("merge of arbitrary splits equals the full recompute, exactly") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 5000).map { i =>
      ("g" + rnd.nextInt(11), math.round(rnd.nextDouble() * 1e5) / 100.0)
    }
    val df = rows.toDF("g", "v")
    val full = IncrementalAgg.partial(df, Seq("g"), "v")
      .orderBy("g").collect().map(_.toSeq)

    // split three ways on an arbitrary predicate and merge the partials
    val parts = Seq(
      df.filter(crc32(col("g")) % 3 === 0),
      df.filter(crc32(col("g")) % 3 === 1),
      df.filter(crc32(col("g")) % 3 === 2))
    val merged = IncrementalAgg.merge(parts.map(p =>
        IncrementalAgg.partial(p, Seq("g"), "v")): _*)
      .orderBy("g").collect().map(_.toSeq)
    assert(merged.toSeq === full.toSeq)
  }

  test("incremental step: merge(state, partial(delta)) == partial(history ∪ delta)") {
    val hist = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("g", "v")
    val delta = Seq(("a", 10.0), ("c", 7.0)).toDF("g", "v")
    val state = IncrementalAgg.partial(hist, Seq("g"), "v")
    val stepped = IncrementalAgg.merge(state, IncrementalAgg.partial(delta, Seq("g"), "v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue, r.getDouble(3), r.getDouble(4)))
    assert(stepped.toSeq === Seq(
      ("a", 3L, 13.0, 1.0, 10.0),
      ("b", 1L, 5.0, 5.0, 5.0),
      ("c", 1L, 7.0, 7.0, 7.0)))
  }

  test("empty delta is the monoid identity") {
    val hist = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    val state = IncrementalAgg.partial(hist, Seq("g"), "v")
    val emptyDelta = IncrementalAgg.partial(hist.filter(lit(false)), Seq("g"), "v")
    val merged = IncrementalAgg.merge(state, emptyDelta)
    assert(merged.orderBy("g").collect().map(_.toSeq).toSeq ===
      state.orderBy("g").collect().map(_.toSeq).toSeq)
  }

  test("incremental distinct sketches: merged deltas track the exact count within tolerance") {
    val df = (1L to 6000L).map(i => (i % 5, i % 997)).toDF("g", "v")
    val exact = df.groupBy("g").agg(countDistinct("v").as("exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // three delta batches merged incrementally
    val deltas = (0 until 3).map(p =>
      IncrementalAgg.partialDistinct(df.filter(pmod($"v", lit(3)) === p), Seq("g"), "v"))
    val merged = IncrementalAgg.estimateDistinct(
      IncrementalAgg.mergeDistinct(deltas: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    exact.foreach { case (g, ex) =>
      val est = merged(g)
      assert(math.abs(est - ex) / ex.toDouble < 0.05,
        s"group $g: estimate $est vs exact $ex drifted past 5%")
    }
    // and the merge-of-deltas tracks the single-pass sketch
    val onePass = IncrementalAgg.estimateDistinct(
      IncrementalAgg.partialDistinct(df, Seq("g"), "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    onePass.foreach { case (g, full) =>
      assert(math.abs(merged(g) - full) / full < 0.05)
    }
  }
}
