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

  test("dHash: gradient bits match a brute-force reference on a 9x8 frame") {
    // deterministic gray ramp with a wrap so both bit values occur
    def f(x: Int, y: Int): Int = (x * 37 + y * 29) % 256
    val rgb = new Array[Byte](9 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 9) {
      val o = (y * 9 + x) * 3
      rgb(o) = f(x, y).toByte; rgb(o + 1) = f(x, y).toByte; rgb(o + 2) = f(x, y).toByte
    }
    val (hi, lo) = Multimodal.dHash(9, 8, rgb)
    var expHi = 0L; var expLo = 0L
    for (y <- 0 until 8; x <- 0 until 8; if f(x, y) > f(x + 1, y)) {
      val k = y * 8 + x
      if (k >= 32) expHi |= 1L << (k - 32) else expLo |= 1L << k
    }
    assert((hi, lo) === (expHi, expLo))
    assert(hi >= 0L && lo >= 0L && hi < (1L << 32) && lo < (1L << 32))
  }

  test("dHash: 2x block upscale leaves the hash invariant (block-mean downsample)") {
    def f(x: Int, y: Int): Int = (x * 53 + y * 17) % 256
    val base = new Array[Byte](9 * 8 * 3)
    val big = new Array[Byte](18 * 16 * 3)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = f(x, y).toByte
      val o = (y * 9 + x) * 3
      base(o) = v; base(o + 1) = v; base(o + 2) = v
      for (dy <- 0 to 1; dx <- 0 to 1) {
        val o2 = ((2 * y + dy) * 18 + 2 * x + dx) * 3
        big(o2) = v; big(o2 + 1) = v; big(o2 + 2) = v
      }
    }
    assert(Multimodal.dHash(9, 8, base) === Multimodal.dHash(18, 16, big))
  }

  test("dhashPairs: banded join == brute force; one-pixel twin within distance 3") {
    import spark.implicits._
    // 30 hashes from a seeded LCG, plus a planted twin of id 0 with 2 bits flipped
    var s0 = 12345L
    def next(): Long = { s0 = s0 * 6364136223846793005L + 1442695040888963407L; (s0 >>> 32) }
    val base = (0L until 30L).map { i => (i, next(), next()) }
    val twin = (100L, base.head._2 ^ 1L, base.head._3 ^ 4L) // 2 bits from id 0
    val all = (base :+ twin).toDF("doc_id", "h_hi", "h_lo")
    val got = Dedup.dhashPairs(all, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same rows
    val rowsSeq = base :+ twin
    val exp = (for {
      a <- rowsSeq; b <- rowsSeq; if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= 3
    } yield (a._1, b._1, d)).toSet
    assert(got === exp)
    assert(exp.contains((0L, 100L, 2)), "planted 2-bit twin must surface")
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
