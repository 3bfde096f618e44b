package graft.ext

import graft.SparkTestBase

class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest"
  ).toDF("text")

  /** Independent in-test reference: recompute pair + symbol counts
    * from scratch each round and argmax the exact rational score with
    * BigInt — no shared code with the trainer's incremental loop. */
  private def referenceTrain(docs: Seq[String], numMerges: Int)
      : Seq[(String, String, Long, Long, Long)] = {
    val hist = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    docs.flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .foreach(w => hist.update(w, hist.getOrElse(w, 0L) + 1L))
    var words = hist.toSeq.map { case (w, f) =>
      (w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c }.toVector, f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long, Long)]
    var r = 0
    var live = true
    while (r < numMerges && live) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (ss, f) =>
        ss.foreach(s => sc.update(s, sc.getOrElse(s, 0L) + f))
        ss.zip(ss.drop(1)).foreach(p => pc.update(p, pc.getOrElse(p, 0L) + f))
      }
      if (pc.isEmpty) live = false
      else {
        val best = pc.toSeq.map { case ((a, b), n) => (a, b, n, sc(a), sc(b)) }
          .reduceLeft { (x, y) =>
            val c = (BigInt(y._3) * x._4 * x._5).compare(BigInt(x._3) * y._4 * y._5)
            if (c > 0 || (c == 0 && (y._1 < x._1 ||
              (y._1 == x._1 && y._2 < x._2)))) y else x
          }
        out += best
        val (a, b) = (best._1, best._2)
        val tok = a + b.stripPrefix("##")
        words = words.map { case (ss, f) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) {
              nb += tok; i += 2
            } else { nb += ss(i); i += 1 }
          }
          (nb.result(), f)
        }
        r += 1
      }
    }
    out.toSeq
  }

  test("train matches the from-scratch recount reference on the toy corpus") {
    val got = WordPieceTrainer.train(corpus, "text", numMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val want = referenceTrain(corpus.as[String].collect().toSeq, 8)
    assert(got === want)
  }

  test("likelihood objective differs from raw pair frequency (it is not BPE)") {
    // BPE's first merge here is (e, s) (count 9); WordPiece's score
    // n/(cl*cr) rewards rarer constituents — verify the first pick
    // maximizes the exact rational, and document that order
    val m = WordPieceTrainer.train(corpus, "text", numMerges = 1).head()
    val (n, cl, cr) = (m.getLong(3), m.getLong(4), m.getLong(5))
    // the winning score must dominate the (e, s) pair's score: e appears
    // in lower(2)+newest(6)+widest(3)=11, s in 9 words... compute both
    val bpeFirst = BpeTrainer.collectMerges(
      BpeTrainer.train(corpus, "text", 1)).head
    assert((m.getString(1), m.getString(2)) !== bpeFirst,
      "fixture should separate the two objectives")
    assert(n > 0 && cl >= n && cr >= n)
  }

  test("local and distributed paths are bit-identical") {
    val local = WordPieceTrainer.train(corpus, "text", numMerges = 8)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val dist = WordPieceTrainer.train(corpus.repartition(5), "text",
      numMerges = 8, maxLocalWords = 0L)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(local === dist)
  }

  test("train is deterministic across repartitionings") {
    val m1 = WordPieceTrainer.train(corpus, "text", 6).collect().map(_.toSeq).toSeq
    val m2 = WordPieceTrainer.train(corpus.repartition(7), "text", 6)
      .collect().map(_.toSeq).toSeq
    assert(m1 === m2)
  }

  test("vocab = corpus alphabet symbols plus merge products; encode reassembles words") {
    val merges = WordPieceTrainer.train(corpus, "text", 6)
    val vocab = WordPieceTrainer.collectVocab(
      WordPieceTrainer.vocab(corpus, "text", merges))
    // every single-char symbol of the corpus present
    assert(vocab.contains("l") && vocab.contains("##o") && vocab.contains("##w"))
    val toks = WordPieceTrainer.encode(
      Seq("newest lowest").toDF("text"), "text", vocab)
      .select("wp_tokens").as[Seq[String]].head()
    // tokens reassemble the words with ## continuation stripped
    assert(toks.map(_.stripPrefix("##")).mkString("") === "newestlowest")
    assert(toks.tail.forall(t => t.startsWith("##") || !toks.contains("##" + t)))
  }

  test("greedy longest-match-first: longest prefix wins over trained shorter pieces") {
    val vocab = Seq("a", "ab", "abc", "##b", "##c", "##d")
    val toks = WordPieceTrainer.encode(Seq("abcd").toDF("text"), "text", vocab)
      .select("wp_tokens").as[Seq[String]].head()
    assert(toks === Seq("abc", "##d"))
  }

  test("unmatched position or overlong word yields [UNK] for the whole word") {
    val vocab = Seq("a", "##b")
    val got = WordPieceTrainer.encode(
      Seq("ab az ab").toDF("text"), "text", vocab)
      .select("wp_tokens").as[Seq[String]].head()
    // 'az': 'a' matches, '##z' does not -> whole word UNK, partial dropped
    assert(got === Seq("a", "##b", WordPieceTrainer.Unk, "a", "##b"))
    val long = WordPieceTrainer.encode(
      Seq(("a" * 12)).toDF("text"), "text", Seq("a", "##a"),
      maxWordLen = 10)
      .select("wp_tokens").as[Seq[String]].head()
    assert(long === Seq(WordPieceTrainer.Unk))
  }

  test("encode lowercases via Locale.ROOT: tr_TR default locale cannot degrade pieces") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val toks = WordPieceTrainer.encode(
        Seq("IT it").toDF("text"), "text", Seq("i", "it", "##t"))
        .select("wp_tokens").as[Seq[String]].head()
      assert(toks === Seq("it", "it"))
    } finally java.util.Locale.setDefault(prev)
  }

  test("encode on the training corpus reproduces the trainer's final symbol state") {
    val tiny = Seq("abc abc abc").toDF("text")
    val merges = WordPieceTrainer.train(tiny, "text", 10)
    val vocab = WordPieceTrainer.collectVocab(
      WordPieceTrainer.vocab(tiny, "text", merges))
    val toks = WordPieceTrainer.encode(Seq("abc").toDF("text"), "text", vocab)
      .select("wp_tokens").as[Seq[String]].head()
    assert(toks === Seq("abc"))
  }
}
