package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins UnigramTrainer (hard-EM unigram-LM tokenizer) and the native
  * UnigramEncode Viterbi expression: hand semantics, the deterministic
  * tie rule, unseen-char floor, and the local == distributed
  * differential over three seeded corpora (the BpeSpec discipline). */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def sm(pairs: (String, Long)*): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pairs.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  test("encode lowercases via Locale.ROOT: a Turkish default locale cannot degrade trained pieces") {
    // tr_TR default-locale lowercasing maps 'I' -> dotless 'ı', which
    // would drop every trained piece containing 'i' to the char
    // fallback for capitalized input; the expression pins Locale.ROOT
    val vocab = Seq(("io", 0L), ("i", -1000000000L), ("o", -1000000000L),
      ("ı", -1000000000L))
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
    try {
      val got = UnigramTrainer.encode(docs("IO io"), "text", vocab)
        .select("pieces").as[Seq[String]].head()
      assert(got === Seq("io", "io"))
    } finally java.util.Locale.setDefault(prev)
  }

  test("viterbi maximizes summed scores; ties prefer the longer piece") {
    // "abc": {abc: -10} beats {ab: -4, c: -7} (-10 > -11)
    assert(UnigramTrainer.viterbiSegment("abc",
      sm("abc" -> -10L, "ab" -> -4L, "c" -> -7L, "a" -> -9L, "b" -> -9L),
      maxPieceLen = 3) === Seq("abc"))
    // equal total: {ab,c} = -11 == {a,bc} = -11 -> the tie rule prefers
    // the LONGER piece at each boundary scanning right-to-left, i.e.
    // the longest LAST piece wins: "bc" (len 2) beats "c"
    assert(UnigramTrainer.viterbiSegment("abc",
      sm("ab" -> -4L, "c" -> -7L, "a" -> -7L, "bc" -> -4L, "b" -> -9L),
      maxPieceLen = 3) === Seq("a", "bc"))
  }

  test("unseen characters segment as floor-scored singletons") {
    val out = UnigramTrainer.viterbiSegment("axb", sm("a" -> -1L, "b" -> -1L),
      maxPieceLen = 3)
    assert(out === Seq("a", "x", "b"))
  }

  test("train learns the repeated piece on a toy corpus; encode reuses it") {
    // 'abab' dominates: the EM keeps "ab" (and longer repeats) ahead of
    // the char fallback, so encoding segments through trained pieces
    val d = docs("abab abab abab ab", "abab ab abab", "cd cd")
    val vocab = UnigramTrainer.train(d, "text", vocabSize = 8,
      rounds = 2, maxPieceLen = 4)
    val pieces = vocab.select("piece").as[String].collect().toSet
    assert(pieces.contains("ab"), s"expected 'ab' in vocab, got $pieces")
    // every single char survives pruning
    assert(Set("a", "b", "c", "d").subsetOf(pieces))
    val enc = UnigramTrainer.encode(docs("abab cd zz"), "text",
        UnigramTrainer.collectVocab(vocab), maxPieceLen = 4)
      .select("pieces").as[Seq[String]].head()
    // trained pieces reassemble the text; unseen 'z' passes through
    assert(enc.mkString("") === "ababcdzz")
    assert(enc.count(_ == "z") === 2)
  }

  test("encode on the training corpus matches the trainer's own Viterbi") {
    val d = docs("the theme then the", "then theme the the")
    val vocabDf = UnigramTrainer.train(d, "text", vocabSize = 12,
      rounds = 2, maxPieceLen = 5)
    val vocab = UnigramTrainer.collectVocab(vocabDf)
    val scores = sm(vocab: _*)
    val got = UnigramTrainer.encode(d, "text", vocab, maxPieceLen = 5)
      .orderBy("doc_id").select("pieces").as[Seq[String]].collect()
    val want = Seq("the theme then the", "then theme the the").map(
      _.split(" ").toSeq.flatMap(w =>
        UnigramTrainer.viterbiSegment(w, scores, 5)))
    assert(got.toSeq === want)
  }

  test("local == distributed over three seeded corpora (piece, count, score)") {
    val words = Seq("alpha", "beta", "gamma", "alphabet", "bet", "game",
      "gam", "ma", "al", "ha", "pha", "met", "theme", "them")
    for (seed <- Seq(11L, 22L, 33L)) {
      val rnd = new scala.util.Random(seed)
      val d = docs((0 until 30).map(_ =>
        Seq.fill(rnd.nextInt(6) + 2)(words(rnd.nextInt(words.length)))
          .mkString(" ")): _*)
      val local = UnigramTrainer.train(d, "text", vocabSize = 24, rounds = 3,
          maxPieceLen = 5, maxLocalWords = 1000000L)
        .orderBy("piece").collect().toSeq
      val dist = UnigramTrainer.train(d, "text", vocabSize = 24, rounds = 3,
          maxPieceLen = 5, maxLocalWords = 0L)
        .orderBy("piece").collect().toSeq
      assert(dist === local, s"seed $seed: distributed EM diverged from local")
    }
  }

  test("viterbi == brute-force enumeration over 400 random (word, vocab) cases") {
    // exhaustively enumerate every segmentation of words <= 8 chars and
    // apply the documented total order (score desc, then longer pieces
    // right-to-left); the DP must agree on every case, including
    // unseen-char floors and negative scores
    val rnd = new scala.util.Random(20260815L)
    val alpha = "abc"
    def allSegs(w: String, maxLen: Int): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, w.length)).flatMap(l =>
        allSegs(w.drop(l), maxLen).map(w.take(l) +: _))
    for (_ <- 0 until 400) {
      val w = (0 until (rnd.nextInt(7) + 1))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      // random vocab over substrings; singles included at random — the
      // floor path must cover the gaps
      val pieces = (for {
        i <- 0 until w.length; j <- (i + 1) to math.min(i + 4, w.length)
      } yield w.substring(i, j)).distinct.filter(_ => rnd.nextBoolean())
      val vocab = pieces.map(p => p -> (-(rnd.nextInt(20) + 1).toLong * 1000L))
      val scores = sm(vocab: _*)
      def segScore(seg: Seq[String]): Option[Long] = {
        val ss = seg.map { p =>
          val v = scores.get(p)
          if (v != null) v.longValue()
          else if (p.length == 1) UnigramTrainer.FloorNano
          else return None
        }
        Some(ss.sum)
      }
      val feasible = allSegs(w, 4).flatMap(s => segScore(s).map(sc => (s, sc)))
      assert(feasible.nonEmpty, s"'$w' must always segment via char floors")
      val bestScore = feasible.map(_._2).max
      // among max-score segs: longest last piece, then longest before it...
      val want = feasible.filter(_._2 == bestScore).map(_._1)
        .minBy(seg => seg.reverse.map(p => -p.length).toIndexedSeq)(
          Ordering.Implicits.seqOrdering[IndexedSeq, Int])
      val got = UnigramTrainer.viterbiSegment(w, scores, maxPieceLen = 4)
      assert(got === want,
        s"word '$w' vocab ${vocab.toMap}: got $got want $want")
    }
  }

  test("train is deterministic across repartitionings") {
    val d = docs("one two three two one", "three three one two")
    def run(parts: Int) = UnigramTrainer.train(d.repartition(parts), "text",
      vocabSize = 16, rounds = 2).orderBy("piece").collect().toSeq
    assert(run(1) === run(7))
  }
}
