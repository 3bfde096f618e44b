package graft.ext

import graft.SparkTestBase

/** Winnowing fingerprints (Dedup.winnowPairs) vs a brute-force in-JVM
  * reference, plus the paper's detection guarantee: any shared token
  * run of length >= w + k - 1 yields >= 1 shared fingerprint. */
class DedupWinnowSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Brute-force winnow: distinct window-min md5 gram hashes per doc. */
  private def refFps(text: String, k: Int, w: Int): Set[String] = {
    val ts = text.trim.split("\\s+").filter(_.nonEmpty)
    if (ts.length < k + w - 1) return Set.empty
    val hs = (0 to ts.length - k).map(i => md5hex(ts.slice(i, i + k).mkString(" ")))
    (0 to hs.length - w).map(j => hs.slice(j, j + w).min).toSet
  }

  private def refPairs(corpus: Seq[(Long, String)], k: Int, w: Int,
      minShared: Int): Map[(Long, Long), Long] = {
    val fps = corpus.map { case (id, t) => (id, refFps(t, k, w)) }
    (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      n = fa.intersect(fb).size if n >= minShared
    } yield ((a, b), n.toLong)).toMap
  }

  private def run(corpus: Seq[(Long, String)], k: Int, w: Int,
      minShared: Long): Map[(Long, Long), Long] = {
    import spark.implicits._
    Dedup.winnowPairs(corpus.toDF("doc_id", "text"), k = k, w = w, minShared = minShared)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
  }

  test("detection guarantee: a shared run of w+k-1 tokens is always found") {
    val rnd = new scala.util.Random(11)
    def words(n: Int, tag: String) = Seq.tabulate(n)(i => s"$tag${rnd.nextInt(50)}x$i")
    val k = 3; val w = 5
    val shared = words(w + k - 1, "s").mkString(" ") // exactly the guarantee length
    val corpus = Seq(
      (0L, (words(20, "a") :+ shared).mkString(" ")),
      (1L, (shared +: words(20, "b")).mkString(" ")),
      (2L, words(30, "c").mkString(" ")))
    val got = run(corpus, k, w, minShared = 1L)
    assert(got.contains((0L, 1L)), "guarantee violated: shared w+k-1 run not detected")
    assert(!got.contains((0L, 2L)) && !got.contains((1L, 2L)))
  }

  test("short docs (< w+k-1 tokens) are excluded; empty/blank safe") {
    import spark.implicits._
    val corpus = Seq((0L, "a b c d e"), (1L, ""), (2L, "   "),
      (3L, "a b c d e f g h i j k l m n o p"), (4L, "a b c d e f g h i j k l m n o p"))
    val got = run(corpus, k = 4, w = 8, minShared = 1L)
    // only docs 3 and 4 (16 tokens, >= 11) participate; identical text
    // -> identical fingerprint sets
    assert(got.keySet === Set((3L, 4L)))
    val fpCount = Dedup.winnowPairs(corpus.toDF("doc_id", "text"), 4, 8, 1L)
      .collect().head.getLong(2)
    assert(fpCount === refFps("a b c d e f g h i j k l m n o p", 4, 8).size.toLong)
  }

  test("matches brute-force reference on adversarial random corpora") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 17)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      def tape(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val base = (0L until 16L).map(i => (i, tape(8 + rnd.nextInt(30))))
      val corpus = base ++ Seq(
        (16L, base(0)._2),                       // exact copy
        (17L, base(1)._2 + " " + base(2)._2),    // stitched partial overlap
        (18L, " \t" + base(3)._2 + "\n "))       // whitespace-noise copy
      for ((k, w) <- Seq((2, 4), (3, 5))) {
        val expected = refPairs(corpus, k, w, minShared = 2)
        val got = run(corpus, k, w, minShared = 2L)
        assert(got === expected, s"seed=$seed k=$k w=$w")
      }
    }
  }
}
