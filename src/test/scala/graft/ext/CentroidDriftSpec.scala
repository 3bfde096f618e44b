package graft.ext

import graft.SparkTestBase

/** Pins Embeddings.centroidDrift: the cosine-of-sums identity, the
  * nano-quantized mean-delta L2, and the zero-centroid NULL contract. */
class CentroidDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("orthogonal centroids: cosine 0; hand L2 from the mean deltas") {
    val a = vecs(1L -> Array(1.0f, 0.0f), 2L -> Array(1.0f, 0.0f))
    val b = vecs(3L -> Array(0.0f, 2.0f))
    val r = Embeddings.centroidDrift(a, b).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (2L, 1L, 2L))
    assert(r.getLong(3) === 0L) // centroids (1,0) vs (0,2) -> cos 0
    // mean deltas (1, -2) -> dq (1e9, -2e9) -> sqrt(5e18)
    assert(r.getLong(4) === math.floor(math.sqrt(5.0e18) + 0.5).toLong)
  }

  test("identical slices: cosine exactly 1e6, L2 exactly 0") {
    val a = vecs(1L -> Array(0.25f, -0.5f, 0.125f))
    val b = vecs(2L -> Array(0.25f, -0.5f, 0.125f))
    val r = Embeddings.centroidDrift(a, b).head()
    assert(r.getLong(3) === 1000000L && r.getLong(4) === 0L)
  }

  test("zero-vector slice: NULL cosine, L2 still defined") {
    val a = vecs(1L -> Array(0.0f, 0.0f))
    val b = vecs(2L -> Array(3.0f, 4.0f))
    val r = Embeddings.centroidDrift(a, b).head()
    assert(r.isNullAt(3))
    assert(r.getLong(4) === math.floor(math.sqrt(9.0e18 + 16.0e18) + 0.5).toLong)
  }
}
