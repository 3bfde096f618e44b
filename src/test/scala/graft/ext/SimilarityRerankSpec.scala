package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins Similarity.mmrRerank (greedy diversified re-ranking) and
  * ops.Graph.kCore (iterative peel) — the two round-14 operators whose
  * semantics are not SQL-expressible, so a differential/property spec
  * is their correctness gate instead of the DuckDB oracle. */
class SimilarityRerankSpec extends SparkTestBase {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("lambda = 1 degenerates to pure relevance order") {
    val corpus = emb(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.5f, 0.5f)),
      (4L, Seq(0f, 1f)), (100L, Seq(1f, 0.05f)))
    val queries = emb((100L, Seq(1f, 0.05f)))
    val out = Similarity.mmrRerank(corpus, queries, k = 4, fetch = 4,
        lambdaMicro = 1000000L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // ranks follow rel_micro desc (ties by id): 1, 2, 3, 4
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L))
    // rel is non-increasing down the ranking
    assert(out.map(_._3).toSeq === out.map(_._3).sortBy(-_).toSeq)
  }

  test("diversity: the second pick jumps to the other cluster") {
    // cluster A: two near-identical vectors, both closest to the query;
    // B sits on the query's other side (closer to q than to A). Pure
    // relevance picks A, A'; MMR at lambda=0.5 drops the redundant A'
    // for B: MMR(A') = (rel−sim(A,A'))/2 ≈ −0.0019 < MMR(B) ≈ +0.0115.
    val corpus = emb(
      (1L, Seq(1f, 0.05f)),   // A  (closest)
      (2L, Seq(1f, 0.1f)),    // A' (near-duplicate of A)
      (3L, Seq(0.9f, -0.44f)),// B  (diverse)
      (9L, Seq(1f, 0f)))
    val queries = emb((9L, Seq(1f, 0f)))
    val pure = Similarity.mmrRerank(corpus, queries, k = 2, fetch = 3,
      lambdaMicro = 1000000L).orderBy("rank").collect().map(_.getLong(2))
    val mmr = Similarity.mmrRerank(corpus, queries, k = 2, fetch = 3,
      lambdaMicro = 500000L).orderBy("rank").collect().map(_.getLong(2))
    assert(pure.toSeq === Seq(1L, 2L), "relevance keeps the duplicate")
    assert(mmr.toSeq === Seq(1L, 3L), "MMR swaps in the diverse pick")
  }

  test("anti-correlated candidate earns a redundancy BONUS, not a clamp") {
    // After S = (0.8, 0.6) is picked: X ⊥ S (sim 0, rel 0.6) vs
    // Y anti-correlated with S (sim −0.6, rel 0). At λ = 0.3 the true
    // MMR is X: 0.3·0.6 − 0.7·0 = 0.18 < Y: 0 − 0.7·(−0.6) = 0.42, so
    // Y must win — a clamp of the redundancy term at 0 would flip the
    // pick to X (Carbonell & Goldstein define max over the selected
    // set, with no floor).
    val corpus = emb(
      (1L, Seq(0.8f, 0.6f)),  // S: top relevance, picked first
      (2L, Seq(0.6f, -0.8f)), // X: orthogonal to S
      (3L, Seq(0f, -1f)))     // Y: anti-correlated with S
    val queries = emb((9L, Seq(1f, 0f)))
    val out = Similarity.mmrRerank(corpus, queries, k = 2, fetch = 3,
        lambdaMicro = 300000L)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(out.toSeq === Seq(1L, 3L))
  }

  test("deterministic, k rows per query, first pick = top relevance") {
    val rnd = new scala.util.Random(11)
    val corpus = emb((0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat()))): _*)
    val queries = corpus.filter(col("vec_id") < 3)
    def run() = Similarity.mmrRerank(corpus, queries, k = 5, fetch = 20)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = run(); val b = run()
    assert(a.toSeq === b.toSeq, "same input, same ranking")
    assert(a.groupBy(_._1).forall(_._2.length === 5))
    // rank 1 carries each query's maximum rel_micro
    a.groupBy(_._1).foreach { case (_, rows) =>
      val top = rows.find(_._2 == 1L).get._4
      assert(rows.forall(_._4 <= top))
    }
  }

  test("kCore equals a local reference peel on a random graph") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 300).map { _ =>
      val u = rnd.nextInt(40).toLong; val v = rnd.nextInt(40).toLong
      (math.min(u, v), math.max(u, v))
    }.filter(e => e._1 != e._2).distinct
    def localKCore(k: Int): Map[Long, Int] = {
      var adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
      var changed = true
      while (changed) {
        val weak = adj.filter(_._2.size < k).keySet
        changed = weak.nonEmpty
        adj = (adj -- weak).map { case (n, ns) => n -> (ns -- weak) }
      }
      adj.map { case (n, ns) => n -> ns.size }
    }
    val df = edges.toDF("u", "v")
    for (k <- Seq(2, 5, 8, 12)) {
      val got = graft.ops.Graph.kCore(df, k).collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got === localKCore(k), s"k=$k")
      assert(got.values.forall(_ >= k), s"core degree >= $k")
    }
  }

  test("kCore: empty core and loud non-convergence guard") {
    // a 10-node path has no 2-core; with maxRounds too small the peel
    // (which eats one end pair per round) must fail loud, not spin
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("u", "v")
    assert(graft.ops.Graph.kCore(path, 2).collect().isEmpty)
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Graph.kCore(path, 2, maxRounds = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // a cycle IS its own 2-core: nothing peels, one probe round
    val cycle = ((0L until 9L).map(i => (i, i + 1)) :+ (0L, 9L)).toDF("u", "v")
    val core = graft.ops.Graph.kCore(cycle, 2, maxRounds = 1).collect()
    assert(core.length === 10 && core.forall(_.getLong(1) === 2L))
  }
}
