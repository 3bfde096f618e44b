package graft.ext

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import Multimodal._

  private def items = {
    import spark.implicits._
    Seq(
      MediaItem(1L, "image", "image/png", 640, 480, 0L, Array[Byte](1, 2, 3, 4, 5)),
      MediaItem(2L, "video", "video/mp4", 1920, 1080, 10000L,
        Array.tabulate[Byte](300)(i => (i % 127).toByte)),
      MediaItem(3L, "audio", "audio/wav", 0, 0, 5000L, Array[Byte](9, 9, 9)),
      MediaItem(4L, "image", "image/png", 640, 480, 0L, Array[Byte](1, 2, 3, 4, 5))
    ).toDS().repartition(2)
  }

  test("extractFeatures: deterministic, dimension-stable, batched") {
    val f = extractFeatures(items, dim = 8, batchSize = 2).collect()
      .map(x => x.media_id -> x).toMap
    assert(f.size === 4)
    assert(f.values.forall(_.features.length === 8))
    // same payload -> same features (determinism of the stub decoder)
    assert(f(1L).features.toSeq === f(4L).features.toSeq)
    assert(f(1L).features.toSeq !== f(3L).features.toSeq)
    assert(f(2L).n_bytes === 300L)
  }

  test("resize touches only images") {
    val r = resize(items, 100, 100).collect().map(m => m.media_id -> m).toMap
    assert(r(1L).width === 100 && r(1L).height === 100)
    assert(r(2L).width === 1920) // video untouched
  }

  test("sampleFrames: n evenly-spaced frames per video, no shuffle") {
    val frames = sampleFrames(items, n = 4)
    assert(frames.count() === 4) // only one video row
    val collected = frames.collect().sortBy(_.frame_idx)
    assert(collected.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3))
    assert(collected.map(_.ts_ms).toSeq === Seq(0L, 2500L, 5000L, 7500L))
    assert(collected.forall(_.content.length <= 64))
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
  }

  test("withContentFeatures attaches array<float> to a DataFrame") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](4, 5))).toDF("id", "payload")
    val out = withContentFeatures(df, "payload", dim = 4)
    assert(out.columns.toSeq === Seq("id", "payload", "content_features"))
    assert(out.collect().forall(_.getSeq[Float](2).length === 4))
    // no df.rdd round trip: the plan must be a single map stage over the
    // source scan, not a re-created ExistingRDD barrier
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD scan barrier in plan:\n$plan")
  }

  test("withContentFeatures: null payload yields null features, not a crash") {
    import spark.implicits._
    val df = Seq((1L, Some(Array[Byte](1, 2, 3))), (2L, None))
      .toDF("id", "payload")
    val out = withContentFeatures(df, "payload", dim = 4).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty)
  }
}
