package graft.ext

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("jacobiEigen recovers a known spectrum") {
    // A = diag(5, 2) rotated by 30 degrees: eigenvalues must be {5, 2}
    val c = math.cos(math.Pi / 6); val s = math.sin(math.Pi / 6)
    val a = Array(
      Array(5 * c * c + 2 * s * s, (5 - 2) * s * c),
      Array((5 - 2) * s * c, 5 * s * s + 2 * c * c))
    val (values, vectors) = Embeddings.jacobiEigen(a)
    assert(values.sorted.zip(Array(2.0, 5.0)).forall { case (g, e) => math.abs(g - e) < 1e-12 })
    // eigenvector columns orthonormal
    val dot = (0 until 2).map(k => vectors(k)(0) * vectors(k)(1)).sum
    assert(math.abs(dot) < 1e-12)
  }

  test("covarianceMatrix matches an in-JVM computation") {
    val rnd = new scala.util.Random(11)
    val data = (1 to 200).map { i =>
      val base = rnd.nextFloat() - 0.5f
      (i.toLong, Array(base, base * 2f + rnd.nextFloat() * 0.1f, rnd.nextFloat() - 0.5f))
    }
    val df = data.toDF("vec_id", "embedding")
    val got = Embeddings.covarianceMatrix(df, dim = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val n = data.size
    def col9(k: Int) = data.map(d => BigDecimal(d._2(k).toDouble).setScale(9, BigDecimal.RoundingMode.HALF_UP))
    for (i <- 0 until 3; j <- i until 3) {
      val (xs, ys) = (col9(i), col9(j))
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val exp = (sxy.toDouble - xs.sum.toDouble * ys.sum.toDouble / n) / (n - 1.0)
      assert(math.abs(got((i, j)) - exp) < 1e-12, s"cell ($i,$j)")
    }
  }

  test("fitPca finds the dominant direction; projection concentrates variance") {
    // points along direction (3,4)/5 with small orthogonal noise
    val rnd = new scala.util.Random(5)
    val data = (1 to 500).map { i =>
      val t = (rnd.nextFloat() - 0.5f) * 2f       // spread along the line
      val e = (rnd.nextFloat() - 0.5f) * 0.05f    // tiny orthogonal noise
      (i.toLong, Array(0.6f * t - 0.8f * e, 0.8f * t + 0.6f * e))
    }
    val df = data.toDF("vec_id", "embedding")
    val model = Embeddings.fitPca(df, dim = 2, k = 2)
    assert(model.eigenvalues(0) > model.eigenvalues(1) * 50)
    // first component ~ (0.6, 0.8), sign-canonicalized positive
    assert(math.abs(model.components(0)(0) - 0.6) < 0.02)
    assert(math.abs(model.components(0)(1) - 0.8) < 0.02)
    // unit norm
    val norm = math.sqrt(model.components(0).map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    // projected first coordinate carries almost all the variance
    val proj = Embeddings.projectPca(df, model).collect()
      .map(r => (r.getSeq[Double](1)(0), r.getSeq[Double](1)(1)))
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val (v0, v1) = (variance(proj.map(_._1).toSeq), variance(proj.map(_._2).toSeq))
    assert(v0 > v1 * 50, s"v0=$v0 v1=$v1")
    // eigenvalues ARE the projected variances
    assert(math.abs(v0 - model.eigenvalues(0)) / v0 < 0.02)
  }

  test("fitPca rejects dims past the driver-Jacobi bound, naming the alternative") {
    val emb = spark.range(1).selectExpr("id as vec_id", "array(0.0f, 1.0f) as embedding")
    val e = intercept[IllegalArgumentException] {
      Embeddings.fitPca(emb, dim = Embeddings.maxJacobiDim + 1, k = 2)
    }
    assert(e.getMessage.contains("distributed eigensolver"))
  }
}
