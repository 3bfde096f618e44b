package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall-bound batteries for the two approximate ANN paths, the
  * quantitative pin for the only rows registered without a SQL oracle
  * by design (probe/bucket selection is the approximation; everything
  * downstream is exact re-ranking).
  *
  * Methodology: seeded CLUSTERED corpora — unit-norm cluster centers
  * with tight Gaussian jitter — the regime real embedding corpora
  * occupy (the sf fixture is near-uniform random, where any
  * bucket/probe scheme's recall is data-dependent noise; SimilaritySpec
  * / SimilarityIvfSpec keep weaker sanity bounds there). Ground truth
  * is bruteForceTopK — the exact operator the driver oracle-checks —
  * and recall@k is |approx ∩ exact| / k averaged over all queries.
  *
  * Bound and tolerance: mean recall@10 ≥ 0.9 per seed, at the CONTRACT
  * parameters (ivfTopK: auto cells, nProbe = 4; lshTopK: planes = 12,
  * 1-bit multiprobe). Everything is seeded (corpus, KMeans fit, SRP
  * planes), so the measured values are DETERMINISTIC, not statistical:
  * IVF = 1.0000 on all three seeds; LSH = 0.9083 / 0.9167 / 0.9917 —
  * the 12-plane signature match keeps ~0.99 per-neighbor collision
  * probability at these within-cluster angles, and the assertion bound
  * sits just under the weakest seed while a real probe-selection
  * regression (broken probe order, wrong bucket join) scores ≤ 0.5
  * here. Three seeds ≈ three independent corpora; per-seed assertion
  * (not pooled) so one bad corpus cannot hide in an average.
  */
class SimilarityRecallSpec extends SparkTestBase {

  private val Dim = 16
  private val Clusters = 12
  private val PerCluster = 50

  /** Unit-norm cluster centers + sigma-0.02 jitter: within-cluster
    * cosine ≈ 0.999, cross-cluster ≈ random — every query's true
    * top-10 lives in its own cluster. */
  private def clusteredCorpus(seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(Clusters) {
      val c = Array.fill(Dim)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    (for (c <- 0 until Clusters; i <- 0 until PerCluster) yield {
      val v = centers(c).map(x => (x + 0.02 * rnd.nextGaussian()).toFloat)
      ((c * PerCluster + i).toLong, v)
    }).toDF("vec_id", "embedding")
  }

  /** One query per cluster (its first member). */
  private def queriesOf(corpus: DataFrame): DataFrame =
    corpus.filter(pmod(col("vec_id"), lit(PerCluster.toLong)) === 0)

  private def topSets(df: DataFrame): Map[Long, Set[Long]] = df.collect()
    .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private def meanRecall(exact: Map[Long, Set[Long]],
      approx: Map[Long, Set[Long]]): Double = {
    val rs = exact.map { case (q, ex) =>
      ex.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / ex.size
    }
    rs.sum / rs.size
  }

  test("ivfTopK recall@10 >= 0.9 on three seeded clustered corpora (contract params)") {
    for (seed <- Seq(101L, 202L, 303L)) {
      val corpus = clusteredCorpus(seed)
      val queries = queriesOf(corpus)
      val exact = topSets(Similarity.bruteForceTopK(corpus, queries, k = 10))
      val ivf = topSets(Similarity.ivfTopK(corpus, queries, k = 10))
      val r = meanRecall(exact, ivf)
      info(f"seed $seed: IVF mean recall@10 = $r%.4f")
      assert(r >= 0.9, s"seed $seed: IVF mean recall@10 $r below the 0.9 bound")
    }
  }

  test("lshTopK recall@10 >= 0.9 on three seeded clustered corpora (contract params)") {
    for (seed <- Seq(101L, 202L, 303L)) {
      val corpus = clusteredCorpus(seed)
      val queries = queriesOf(corpus)
      val exact = topSets(Similarity.bruteForceTopK(corpus, queries, k = 10))
      val lsh = topSets(Similarity.lshTopK(corpus, queries, k = 10))
      val r = meanRecall(exact, lsh)
      info(f"seed $seed: LSH mean recall@10 = $r%.4f")
      assert(r >= 0.9, s"seed $seed: LSH mean recall@10 $r below the 0.9 bound")
    }
  }

  test("pqTopK recall@10 >= 0.9 at production resolution; coarse codes degrade gracefully") {
    // ADC ranks by L2 while the exact reference ranks by cosine; on the
    // near-unit-norm clustered corpora the orderings agree, which is
    // the regime PQ is used in (normalized embedding stores). The
    // contract configuration is IVFADC+R: raw ADC ranks the codes, and
    // the top-50 window re-ranks by exact distance — quantization then
    // only costs recall when a true neighbor misses the window.
    for (seed <- Seq(101L, 202L, 303L)) {
      val corpus = clusteredCorpus(seed)
      val queries = queriesOf(corpus)
      val exact = topSets(Similarity.bruteForceTopK(corpus, queries, k = 10))
      val pq = topSets(Similarity.pqTopK(corpus, queries, k = 10,
        m = 4, codebookSize = 256, refine = 50))
      val r = meanRecall(exact, pq)
      info(f"seed $seed: PQ+refine mean recall@10 = $r%.4f")
      assert(r >= 0.9, s"seed $seed: PQ mean recall@10 $r below the 0.9 bound")
      // unrefined ADC: the quantization-distortion floor (measured
      // 0.72-0.8 here — the literature's raw-ADC regime); a broken
      // codebook/encode path scores near 10/|corpus| ~ 0.02
      val raw = meanRecall(exact, topSets(Similarity.pqTopK(
        corpus, queries, k = 10, m = 4, codebookSize = 256)))
      info(f"seed $seed: raw-ADC mean recall@10 = $raw%.4f")
      assert(raw >= 0.6, s"seed $seed: raw ADC $raw below the distortion floor")
    }
    // the coarse-code floor: same-cluster candidates tie on identical
    // codes, so recall collapses toward the id-order floor — still
    // cluster-correct (every returned neighbor IS from the right
    // cluster), never garbage
    val corpus = clusteredCorpus(101L)
    val queries = queriesOf(corpus)
    val coarse = Similarity.pqTopK(corpus, queries, k = 10,
      m = 4, codebookSize = 16).collect()
    assert(coarse.forall(r =>
      r.getLong(1) / PerCluster === r.getLong(0) / PerCluster),
      "coarse PQ neighbors must still come from the query's own cluster")
  }

  test("pqTopK is deterministic and k-bounded per query") {
    val corpus = clusteredCorpus(7L)
    val queries = queriesOf(corpus)
    def run() = Similarity.pqTopK(corpus, queries, k = 5, m = 4)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val a = run()
    assert(a.toSeq === run().toSeq, "same seed, same ranking")
    assert(a.groupBy(_._1).forall(_._2.length === 5))
  }

  test("pqTopKFromState off persisted codebooks == fresh-fit pqTopK") {
    // the train-once discipline: persist pqCodebookState, reload, and
    // the stateless search must reproduce the fresh fit bit-for-bit
    // (same codebooks in, same ADC ranking out)
    val corpus = clusteredCorpus(7L)
    val queries = queriesOf(corpus)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_pqstate_").toString
    Similarity.pqCodebookState(corpus, m = 4, codebookSize = 16)
      .write.mode("overwrite").parquet(stateDir)
    val fresh = Similarity.pqTopK(corpus, queries, k = 5, m = 4,
      codebookSize = 16, refine = 20)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val fromState = Similarity.pqTopKFromState(corpus, queries,
      spark.read.parquet(stateDir), k = 5, refine = 20)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(fromState.toSeq === fresh.toSeq)
    // the state frame is control-plane sized: m·codebookSize rows
    assert(spark.read.parquet(stateDir).count() === 4L * 16L)
  }

  test("ivfTopKFromState off persisted centroids == fresh-fit ivfTopK") {
    val corpus = clusteredCorpus(7L)
    val queries = queriesOf(corpus)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_ivfstate_").toString
    Similarity.ivfCentroidState(corpus, nCells = 8)
      .write.mode("overwrite").parquet(stateDir)
    val fresh = Similarity.ivfTopK(corpus, queries, k = 5, nCells = 8)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val fromState = Similarity.ivfTopKFromState(corpus, queries,
      spark.read.parquet(stateDir), k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(fromState.toSeq === fresh.toSeq)
    assert(spark.read.parquet(stateDir).count() === 8L)
  }

  test("ivfPqTopK recall@10 >= 0.9 on three seeded clustered corpora") {
    // IVF cell filter upstream of the PQ/ADC code scan + exact refine —
    // both approximations composed still clear the battery bound on
    // the clustered regime
    for (seed <- Seq(101L, 202L, 303L)) {
      val corpus = clusteredCorpus(seed)
      val queries = queriesOf(corpus)
      val exact = topSets(Similarity.bruteForceTopK(corpus, queries, k = 10))
      val ivfpq = topSets(Similarity.ivfPqTopK(corpus, queries, k = 10,
        nProbe = 4, m = 4, codebookSize = 256, refine = 50))
      val r = meanRecall(exact, ivfpq)
      info(f"seed $seed: IVF-PQ mean recall@10 = $r%.4f")
      assert(r >= 0.9, s"seed $seed: IVF-PQ mean recall@10 $r below the 0.9 bound")
    }
  }

  test("recall harness sanity: brute force against itself scores exactly 1") {
    val corpus = clusteredCorpus(7L)
    val queries = queriesOf(corpus)
    val exact = topSets(Similarity.bruteForceTopK(corpus, queries, k = 10))
    assert(meanRecall(exact, exact) === 1.0)
    assert(exact.size === Clusters)
  }
}
