package graft.ext

import graft.SparkTestBase

/** JL Rademacher projection (Embeddings.randomProject) vs an
  * independent in-JVM reference (BigInt sums over an independently
  * derived md5 sign matrix), plus the JL property itself on the
  * fixture: pairwise squared distances preserved in expectation.
  */
class RandomProjectionSpec extends SparkTestBase {

  /** Independent sign derivation: full hex string via String.format,
    * first char looked up in the digit alphabet (vs the operator's
    * high-nibble arithmetic). */
  private def refSign(seed: String, j: Int, k: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$j:$k".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if ("0123456789abcdef".indexOf(hex.charAt(0)) % 2 == 0) 1L else -1L
  }

  private def refProject(v: Array[Float], outDim: Int): Array[Long] =
    Array.tabulate(outDim) { k =>
      v.zipWithIndex.map { case (x, j) =>
        BigInt(math.floor(x.toDouble * 1e6 + 0.5).toLong) * refSign("rp", j, k)
      }.sum.toLong
    }

  test("exact agreement with the independent reference on hand vectors") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array.tabulate(8)(i => (i - 3) * 0.25f)),
      (1L, Array.fill(8)(0.0f)),
      (2L, Array.tabulate(8)(i => math.sin(i + 1).toFloat)))
    val got = Embeddings.randomProject(
      vecs.toDF("vec_id", "embedding"), inDim = 8, outDim = 5)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    vecs.foreach { case (id, v) =>
      val want = refProject(v, 5)
      (0 until 5).foreach(k => assert(got((id, k)) === want(k), s"vec $id dim $k"))
    }
  }

  test("sign matrix is balanced (md5 digits are uniform)") {
    val signs = for (j <- 0 until 64; k <- 0 until 16) yield refSign("rp", j, k)
    val plus = signs.count(_ == 1L)
    assert(plus > 400 && plus < 624, s"suspicious sign balance: $plus/1024")
  }

  test("JL property on the fixture: pairwise distances preserved in expectation") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .limit(40).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val proj = emb.map { case (id, v) => (id, refProject(v, 16)) }.toMap
    val ratios = for {
      i <- emb.indices; jj <- (i + 1) until emb.length
    } yield {
      val (ia, va) = emb(i); val (ib, vb) = emb(jj)
      val d2 = va.zip(vb).map { case (a, b) =>
        val d = a.toDouble - b.toDouble; d * d }.sum
      val p2 = proj(ia).zip(proj(ib)).map { case (a, b) =>
        val d = (a - b) / 1e6; d * d }.sum / 16.0
      p2 / d2
    }
    val mean = ratios.sum / ratios.size
    // E[ratio] = 1; with outDim 16 individual pairs vary, the mean over
    // ~800 pairs concentrates
    assert(mean > 0.8 && mean < 1.25, s"JL mean distortion off: $mean")
    assert(ratios.count(r => r > 0.2 && r < 5.0) > ratios.size * 9 / 10)
  }
}
