package graft.ext

import graft.SparkTestBase

/** Randomized adversaries for the prefix-filtered similarity joins,
  * whose claim is EXACT pair sets despite aggressive candidate pruning:
  * random corpora of short mutated token sequences (duplicates,
  * near-dups, containments, unrelated noise over a tiny vocabulary so
  * shingles collide densely) are compared against an in-JVM all-pairs
  * reference at thresholds around the pruning boundaries. A
  * prefix-length off-by-one — the classic AllPairs bug — loses pairs
  * exactly at the threshold; these batteries make that a test failure.
  */
class DedupExactnessPropertySpec extends SparkTestBase {
  import spark.implicits._

  // order-sensitive distinct n-token shingles, mirroring shingle_hashes
  private def shingles(s: String, n: Int): Set[Seq[String]] = {
    val toks = s.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.length < n) Set.empty
    else (0 to toks.length - n).map(i => toks.slice(i, i + n)).toSet
  }

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("ab", "cd", "ef", "gh", "ij") // tiny: dense collisions
    def words(len: Int) = (0 until len).map(_ => vocab(rnd.nextInt(vocab.length)))
    val bases = (0 until 6).map(_ => words(5 + rnd.nextInt(8)))
    (0 until 40).map { i =>
      val b = bases(rnd.nextInt(bases.length))
      val doc = rnd.nextInt(4) match {
        case 0 => b                                              // exact dup
        case 1 => b.updated(rnd.nextInt(b.length), vocab(rnd.nextInt(vocab.length))) // near-dup
        case 2 => words(1 + rnd.nextInt(2)) ++ b                 // containment-ish
        case _ => words(4 + rnd.nextInt(8))                      // noise
      }
      (i.toLong, doc.mkString(" "))
    }
  }

  test("ngramJaccard == all-pairs brute force over 15 corpora x 3 thresholds") {
    (0 until 15).foreach { scenario =>
      val docs = corpus(scenario)
      val df = docs.toDF("doc_id", "text")
      Seq(0.5, 0.7, 0.9).foreach { t =>
        val got = Dedup.ngramJaccard(df, threshold = t, n = 3)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
          .map { p: (Long, Long) => (math.min(p._1, p._2), math.max(p._1, p._2)) }
        val brute = (for {
          (ia, a) <- docs; (ib, b) <- docs if ia < ib
          sa = shingles(a, 3); sb = shingles(b, 3)
          if sa.nonEmpty && sb.nonEmpty
          j = sa.intersect(sb).size.toDouble / sa.union(sb).size
          if j >= t
        } yield (ia, ib)).toSet
        assert(got === brute, s"scenario $scenario t=$t")
      }
    }
  }

  test("containment == all-pairs brute force over 15 corpora x 2 thresholds") {
    (0 until 15).foreach { scenario =>
      val docs = corpus(100 + scenario)
      val df = docs.toDF("doc_id", "text")
      Seq(0.6, 0.85).foreach { t =>
        val got = Dedup.containment(df, threshold = t, n = 3)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val brute = (for {
          (ia, a) <- docs; (ib, b) <- docs if ia != ib
          sa = shingles(a, 3); sb = shingles(b, 3)
          if sa.nonEmpty && sb.nonEmpty
          c = sa.intersect(sb).size.toDouble / sa.size
          if c >= t
        } yield (ia, ib)).toSet
        assert(got === brute, s"scenario $scenario t=$t")
      }
    }
  }
}
