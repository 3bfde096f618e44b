package graft.ops

import graft.SparkTestBase

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force reference: full groupBy, same tie-break. */
  private def reference(vals: Seq[String], k: Int): Seq[(String, Long)] =
    vals.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (v, c) => (-c, v) }.take(k)

  test("skewed data: sketch path matches brute force exactly") {
    // Zipf-ish: value i appears ~ N/i times -> heavy head, long tail
    val vals = (1 to 60).flatMap(i => Seq.fill(1200 / i)(s"v$i"))
    val got = HeavyHitters.topK(spark.createDataset(vals).repartition(8), 10, sketchSize = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === reference(vals, 10))
  }

  test("near-uniform data defeats the proof but the fallback stays exact") {
    // 500 distinct values, frequencies 2..3: kth freq can never beat
    // n/m with a tiny sketch -> fallback path
    val vals = (1 to 500).flatMap(i => Seq.fill(2 + i % 2)(f"u$i%03d"))
    val got = HeavyHitters.topK(spark.createDataset(vals).repartition(8), 10, sketchSize = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === reference(vals, 10))
  }

  test("tie-break at the boundary is deterministic (value ASC)") {
    val vals = Seq.fill(50)("aaa") ++ Seq.fill(7)("bbb") ++ Seq.fill(7)("ccc") ++
      Seq.fill(7)("bba") ++ Seq.fill(3)("zzz")
    val got = HeavyHitters.topK(spark.createDataset(vals).repartition(3), 3, sketchSize = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("aaa", 50L), ("bba", 7L), ("bbb", 7L)))
  }

  test("domain smaller than k returns the whole exact histogram") {
    val vals = Seq("a", "a", "b")
    val got = HeavyHitters.topK(spark.createDataset(vals), 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
  }

  test("empty input yields an empty result") {
    assert(HeavyHitters.topK(spark.emptyDataset[String], 5).count() === 0L)
  }
}
