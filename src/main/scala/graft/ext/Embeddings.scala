package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column transforms for storage/serving pipelines. All are
  * elementwise projections — zero shuffle at any scale.
  */
object Embeddings {

  /** Embedding-distribution drift between two corpus slices — the
    * "did this week's crawl move in embedding space?" monitor a
    * training-data pipeline runs next to its KS/PSI scalar drift: the
    * cosine between the two slice CENTROIDS plus their L2 separation.
    *
    * Exactness: per-dim sums accumulate in decimal(27,10) (order-
    * independent — a float sum over shuffled partitions is not), then
    * micro-quantize to exact ints. The 1/n factors cancel inside
    * cosine, so centroid cosine = cosine of the per-dim SUM vectors —
    * exact integer dot products in decimal(38,0), one √-tree at the
    * end. The L2 path quantizes each per-dim MEAN DELTA to nano
    * BEFORE squaring, so its sum is an exact integer too (64 doubles
    * summed distributively would be order-nondeterministic).
    *
    * Plan shape: one posexplode + dim aggregation per slice
    * (map-side combined, dims-sized shuffle), a dims-sized join, one
    * scalar aggregate. Output: one row — (n_a, n_b, n_dims,
    * centroid_cos_micro, centroid_l2_nano); NULL cosine when either
    * centroid is the zero vector. */
  def centroidDrift(a: DataFrame, b: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val dec = "decimal(38,0)"
    def sums(df: DataFrame, sName: String, nName: String): DataFrame = df
      .filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(floor(sum(col("v").cast("decimal(27,10)")) * lit(1000000L))
        .cast(dec).as(sName), count(lit(1)).as(nName))
    val j = sums(a, "sa", "na").join(sums(b, "sb", "nb"), Seq("dim"), "full")
    val saD = col("sa").cast("double") / col("na").cast("double")
    val sbD = col("sb").cast("double") / col("nb").cast("double")
    // per-dim mean delta in nano mean-units, quantized BEFORE squaring
    val dq = floor((saD - sbD) * lit(1000.0) + lit(0.5)).cast("long")
    val agg = j
      .withColumn("__dq", coalesce(dq, lit(0L)))
      .agg(
        sum(col("sa") * col("sb")).as("dot"),
        sum(col("sa") * col("sa")).as("naa"),
        sum(col("sb") * col("sb")).as("nbb"),
        sum(col("__dq").cast(dec) * col("__dq").cast(dec)).as("dd"),
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        count(lit(1)).as("n_dims"))
    val cos = col("dot").cast("double") /
      (sqrt(col("naa").cast("double")) * sqrt(col("nbb").cast("double")))
    agg.select(
      coalesce(col("n_a"), lit(0L)).as("n_a"),
      coalesce(col("n_b"), lit(0L)).as("n_b"),
      col("n_dims"),
      when(col("naa") > 0L && col("nbb") > 0L,
        floor(cos * lit(1000000.0) + lit(0.5)).cast("long"))
        .as("centroid_cos_micro"),
      floor(sqrt(col("dd").cast("double")) + lit(0.5)).cast("long")
        .as("centroid_l2_nano"))
  }

  /** Symmetric per-vector int8 quantization: q[i] = round(v[i] / maxabs *
    * 127), the classic storage-compression step before ANN serving (4×
    * smaller than float32; recall loss negligible for cosine work).
    *
    * Engine-portable determinism: floats are widened to double BEFORE any
    * arithmetic; rounding is floor(x + 0.5) (identical semantics in every
    * SQL engine, unlike round()'s dialect-dependent half-even modes). An
    * all-zero vector quantizes to zeros with scale 0.
    *
    * Output: (idCol, scale double = maxabs, q array<int>).
    */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val maxabs = array_max(transform(v, x => abs(x)))
    emb.select(
      col(idCol),
      maxabs.as("scale"),
      when(maxabs === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v, x => floor(x / maxabs * 127.0 + 0.5).cast("int")))
        .as("q"))
  }

  /** L2 normalization to the unit sphere (cosine work becomes dot
    * products). Zero vectors stay zero. */
  def l2Normalize(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    emb.select(
      col(idCol),
      when(norm === 0.0, v).otherwise(transform(v, x => x / norm)).as("unit"))
  }

  /** Upper-triangle sample covariance matrix of an embedding column, as
    * (i, j, cov) rows with i <= j, from EXACT decimal sums.
    *
    * Scale shape: one posexplode (n·d rows), a plan-side second index
    * from `sequence(i, d-1)` — NO self-join — so the d²/2 product terms
    * flow straight into a partially-aggregated groupBy(i, j): shuffle is
    * the d(d+1)/2-cell aggregate, compute is the unavoidable n·d²/2
    * multiplies, spread across every core. Means are a second d-row
    * aggregate broadcast back. Sums accumulate in DECIMAL(18,9) (exact,
    * order-independent); the closed form runs in double on group-count
    * rows. This is the Gram-matrix primitive under PCA/whitening. */
  def covarianceMatrix(emb: DataFrame, dim: Int,
      vecCol: String = "embedding"): DataFrame = {
    require(dim >= 2, s"need dim >= 2, got $dim")
    val dec = "decimal(18,9)"
    val p = emb.select(col(vecCol), posexplode(col(vecCol)))
      .select(col("pos").as("i"), col("col").cast(dec).as("xi"), col(vecCol))
    val prods = p
      .select(col("i"), col("xi"),
        explode(sequence(col("i"), lit(dim - 1))).as("j"), col(vecCol))
      .select(col("i"), col("j"),
        (col("xi") * element_at(col(vecCol), col("j") + 1).cast(dec)).as("xy"))
    val s = prods.groupBy(col("i"), col("j"))
      .agg(sum(col("xy")).as("sxy"), count(lit(1)).as("n"))
    val m = p.groupBy(col("i").as("d")).agg(sum(col("xi")).as("sx"))
    val nD = col("n").cast("double")
    s.join(broadcast(m.select(col("d").as("i"), col("sx").as("sx_i"))), Seq("i"))
      .join(broadcast(m.select(col("d").as("j"), col("sx").as("sx_j"))), Seq("j"))
      .select(col("i"), col("j"),
        ((col("sxy").cast("double") -
          col("sx_i").cast("double") * col("sx_j").cast("double") / nD)
          / (nD - 1.0)).as("cov"))
  }

  /** Eigenvalues (descending) + top-k orthonormal principal components
    * of the embedding covariance. The d×d eigenproblem is CONTROL-PLANE
    * work: the covariance collapses to d(d+1)/2 numbers regardless of
    * corpus size, so the cyclic-Jacobi solve runs on the driver in
    * microseconds while every data-sized pass stays distributed.
    * Component signs are canonicalized (largest-|coordinate| entry
    * positive) so results are deterministic across runs. */
  final case class PcaModel(eigenvalues: Array[Double],
      components: Array[Array[Double]]) // k rows, each length d

  /** Upper bound on `dim` for [[fitPca]]: cyclic Jacobi is O(d³) per
    * sweep ON THE DRIVER, fine to ~2048 (seconds) but silently minutes
    * at 4096+ — past this, eigensolving stops being control-plane work
    * and belongs distributed (power iteration / randomized-SVD over the
    * covariance as a DataFrame, multiplying through the same exact Gram
    * pass covarianceMatrix already does). */
  val maxJacobiDim: Int = 2048

  def fitPca(emb: DataFrame, dim: Int, k: Int,
      vecCol: String = "embedding"): PcaModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    require(dim <= maxJacobiDim,
      s"fitPca dim=$dim exceeds maxJacobiDim=$maxJacobiDim: the driver-side " +
        "Jacobi eigensolve is O(dim^3) and would silently burn minutes; use a " +
        "distributed eigensolver (power iteration / randomized SVD over the " +
        "covarianceMatrix frame) for wider embeddings")
    val a = Array.ofDim[Double](dim, dim)
    covarianceMatrix(emb, dim, vecCol).collect().foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    val (values, vectors) = jacobiEigen(a)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { ci =>
      val v = Array.tabulate(dim)(r => vectors(r)(ci))
      val mx = v.indices.maxBy(i => math.abs(v(i)))
      if (v(mx) < 0) v.map(-_) else v
    }.toArray
    PcaModel(order.map(values).toArray, comps)
  }

  /** Project embeddings onto fitted components: k codegen'd zip_with/
    * aggregate dot products per row — elementwise, zero shuffle; the
    * k×d component matrix rides the plan (tiny by construction). */
  def projectPca(emb: DataFrame, model: PcaModel, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val dots = model.components.map { c =>
      val carr = array(c.map(lit(_)): _*)
      aggregate(zip_with(v, carr, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
    }
    emb.select(col(idCol), array(dots: _*).as("projected"))
  }

  /** Rademacher (±1) random projection — the Johnson-Lindenstrauss
    * dimensionality reduction of Achlioptas 2001 ("Database-friendly
    * random projections"): out[k] = Σ_j sign(j,k) · v[j], preserving
    * pairwise distances within (1±ε) at outDim = O(log n / ε²). Unlike
    * fitPca this needs NO fit pass and NO driver-side model — the right
    * first reduction at 100 TB, where even one extra corpus scan
    * matters.
    *
    * Engine-portable determinism, twice over:
    *  - values quantize to micro-ints FIRST (floor(x·1e6 + 0.5), the
    *    quantizeInt8 widening/rounding discipline), so each projection
    *    is an exact int64 sum — no float summation order anywhere;
    *  - the sign matrix derives from md5: sign(j,k) = +1 iff the first
    *    hex digit of md5("seed:j:k") is even — the shardByMd5
    *    portability argument: any engine with an md5 function replays
    *    the identical matrix, where a seeded rand() replays only
    *    inside one engine+plan.
    *
    * The inDim×outDim sign matrix rides the plan as literals (KBs).
    * One codegen'd zip_with/aggregate per output dim, zero shuffle.
    * Consumers wanting unbiased norms rescale by 1/√outDim (kept out
    * of the operator to preserve exact integers). Vectors must carry
    * exactly inDim elements (same contract as covarianceMatrix).
    * Output: (idCol, k int, proj_micro long) — long format, one row
    * per (vector, output dim). */
  def randomProject(emb: DataFrame, inDim: Int, outDim: Int,
      seed: String = "rp", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(inDim >= 1 && outDim >= 1, s"bad dims: $inDim -> $outDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, k: Int): Long = {
      val h = md.digest(s"$seed:$j:$k".getBytes("UTF-8"))
      // first hex digit = high nibble of byte 0
      if (((h(0) >> 4) & 0xF) % 2 == 0) 1L else -1L
    }
    val vm = transform(col(vecCol),
      x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))
    val projections = (0 until outDim).map { k =>
      val sk = array((0 until inDim).map(j => lit(sign(j, k))): _*)
      aggregate(zip_with(vm, sk, (x, s) => x * s), lit(0L), (acc, t) => acc + t)
    }
    emb.select(col(idCol), posexplode(array(projections: _*)))
      .select(col(idCol), col("pos").cast("int").as("k"),
        col("col").as("proj_micro"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * O(d³) per sweep, converges quadratically; plenty for the d ≤ a few
    * thousand of any embedding pipeline (d×d fits on the driver long
    * before the data fits anywhere). */
  private[graft] def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > tol) {
      for (p <- 0 until n - 1; q <- p + 1 until n if math.abs(a(p)(q)) > tol) {
        val apq = a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t =
          if (theta == 0.0) 1.0
          else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        val app = a(p)(p); val aqq = a(q)(q)
        a(p)(p) = app - t * apq
        a(q)(q) = aqq + t * apq
        a(p)(q) = 0.0; a(q)(p) = 0.0
        var k = 0
        while (k < n) {
          if (k != p && k != q) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
            a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
          }
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
          k += 1
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
