package graft.ext

import graft.SparkTestBase

/** Span-level dedup (Dedup.substringSpans) vs a brute-force in-JVM
  * reference built from the actual token-sequence STRINGS (no hashes),
  * plus hand-built edge cases: exact-dup full coverage, within-doc
  * repetition, overlapping-window union, sub-k docs excluded. */
class DedupSubstringSpec extends SparkTestBase {

  /** Brute force on gram strings: (n_shingles, n_dup_shingles,
    * dup_tokens) per doc with >= k tokens. */
  private def ref(corpus: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => (id, t.trim.split("\\s+").filter(_.nonEmpty)) }
    val grams = toks.flatMap { case (id, w) =>
      (0 to w.length - k).map(i => (id, i, w.slice(i, i + k).mkString(" ")))
    }
    val occ = grams.groupBy(_._3).map { case (g, v) => (g, v.size) }
    val dup = grams.filter(g => occ(g._3) >= 2)
    val nDup = dup.groupBy(_._1).map { case (id, v) => (id, v.size.toLong) }
    val cov = dup.groupBy(_._1).map { case (id, v) =>
      (id, v.flatMap(t => t._2 until t._2 + k).toSet.size.toLong)
    }
    toks.collect { case (id, w) if w.length >= k =>
      (id, ((w.length - k + 1).toLong, nDup.getOrElse(id, 0L), cov.getOrElse(id, 0L)))
    }.toMap
  }

  private def run(corpus: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Dedup.substringSpans(corpus.toDF("doc_id", "text"), k = k)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("exact duplicate pair: every window duplicated, full token coverage") {
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val got = run(Seq((0L, t), (1L, t), (2L, "unrelated words here entirely now today")), k = 4)
    // 8 tokens, k=4 -> 5 windows, all duplicated, all 8 positions covered
    assert(got(0L) === ((5L, 5L, 8L)))
    assert(got(1L) === ((5L, 5L, 8L)))
    assert(!got.contains(2L) || got(2L) === ((3L, 0L, 0L)))
    assert(got(2L) === ((3L, 0L, 0L)))
  }

  test("docs shorter than k are excluded; empty and null-ish text safe") {
    val got = run(Seq((0L, "one two three"), (1L, ""), (2L, "   "),
      (3L, "a b c d e f g h i j")), k = 5)
    assert(got.keySet === Set(3L))
    assert(got(3L) === ((6L, 0L, 0L)))
  }

  test("within-doc repetition counts as duplication") {
    // "x y z w x y z w x y z w": window 'x y z w' occurs at 0,4,8 in ONE doc
    val got = run(Seq((0L, "x y z w x y z w x y z w"),
      (1L, "p q r s t u v a b c d e")), k = 4)
    val (n, d, c) = got(0L)
    assert(n === 9L)
    // windows at 0,4,8 are identical; windows 1..3 == 5..7 etc: ALL windows
    // repeat (the tape has period 4), so every position duplicated
    assert(d === 9L && c === 12L)
    assert(got(1L) === ((9L, 0L, 0L)))
  }

  test("overlapping duplicated windows union their coverage (no double count)") {
    // shared 6-token run inside otherwise-distinct docs, k=4 -> 3
    // overlapping duplicated windows covering exactly 6 positions
    val shared = "m1 m2 m3 m4 m5 m6"
    val got = run(Seq(
      (0L, s"aa bb cc $shared dd ee ff"),
      (1L, s"gg hh ii jj $shared kk ll")), k = 4)
    assert(got(0L)._2 === 3L && got(0L)._3 === 6L)
    assert(got(1L)._2 === 3L && got(1L)._3 === 6L)
  }

  test("sentenceSpans: C4 three-sentence spans, cross- and within-doc dups") {
    import spark.implicits._
    // docs 1 and 2 share sentences A. B! C. -> their (A,B,C) span is a
    // corpus-wide dup; doc 1 has a 4th unique sentence so its (B,C,U)
    // span is not; doc 3 repeats one sentence triple INSIDE itself
    // (A. A. A. A.) -> both its spans are the same hash = both dup;
    // doc 4 has only 2 sentences and doc 5 none -> both still surface
    // with n_spans = 0 (the short-document contract)
    val docs = Seq(
      (1L, "Aa aa. Bb bb! Cc cc. Uu uu?"),
      (2L, "Aa  aa. Bb\tbb! Cc cc."), // whitespace-normalized equal
      (3L, "Same s. Same s. Same s. Same s."),
      (4L, "One. Two."),
      (5L, "no terminal punctuation")).toDF("doc_id", "text")
    val got = Dedup.sentenceSpans(docs, n = 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 4L, 2L, 1L),  // spans (A,B,C) dup + (B,C,U) unique
      (2L, 3L, 1L, 1L),  // its only span IS (A,B,C)
      (3L, 4L, 2L, 2L),  // both spans identical -> both duplicated
      (4L, 2L, 0L, 0L),  // short doc: present, zero spans
      (5L, 0L, 0L, 0L))) // sentence-free doc: present, zero everything
    // unterminated trailing text is not a sentence
    val tail = Seq((9L, "Aa. Bb. Cc. trailing without punct"))
      .toDF("doc_id", "text")
    val t = Dedup.sentenceSpans(tail, n = 3).collect().head
    assert(t.getLong(1) === 3L && t.getLong(2) === 1L)
  }

  test("removeDuplicateSpans: first occurrence keeps, later ones lose their sentences") {
    import spark.implicits._
    // docs 1 and 2 share the (A,B,C) triple: doc 1 holds the first
    // occurrence (min (id, pos)) so it keeps everything; doc 2's copy
    // is a non-first occurrence so ALL THREE of its sentences go
    val docs = Seq(
      (1L, "Aa aa. Bb bb! Cc cc. Uu uu?"),
      (2L, "Aa  aa. Bb\tbb! Cc cc."),
      (3L, "One. Two."),
      (4L, "no terminal punctuation")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, n = 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "Aa aa. Bb bb! Cc cc. Uu uu?", 4L, 0L),
      (2L, "", 3L, 3L),        // fully-boilerplate doc -> empty, row kept
      (3L, "One. Two.", 2L, 0L), // short doc passes through untouched
      (4L, "", 0L, 0L)))         // sentence-free doc: empty both ways
  }

  test("removeDuplicateSpans: within-doc repeat keeps one copy of the span") {
    import spark.implicits._
    // spans at pos 1 and pos 2 hash identically; pos 1 is the first
    // occurrence, so the removal set is pos 2's sentences {2,3,4}
    val docs = Seq((7L, "Same s. Same s. Same s. Same s."))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, n = 3).collect().head
    assert(got.getString(1) === "Same s." && got.getLong(2) === 4L &&
      got.getLong(3) === 3L)
  }

  test("removeDuplicateSubstrings: first window keeps, later ones lose their tokens") {
    import spark.implicits._
    val t = "alpha beta gamma delta"
    val docs = Seq(
      (1L, t),                       // first occurrence of the window
      (2L, s"pre $t post"),          // later copy: 4 tokens drop
      (3L, "one two three"),         // sub-k doc passes through whole
      (4L, "")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSubstrings(docs, k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "alpha beta gamma delta", 4L, 0L),
      (2L, "pre post", 6L, 4L),
      (3L, "one two three", 3L, 0L),
      (4L, "", 0L, 0L)))
  }

  test("removeDuplicateSubstrings: within-doc periodic tape keeps one period") {
    import spark.implicits._
    // period-4 tape: all 9 windows share hashes pairwise across the
    // period; the first occurrence of each distinct window is at
    // positions 0..3, so removal covers positions 4..11 plus the
    // overlap-union of positions the later windows touch
    val docs = Seq((5L, "x y z w x y z w x y z w")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSubstrings(docs, k = 4).collect().head
    // windows at 0 and 4 and 8 are identical: winners at 0..3 keep
    // tokens 0..6 only where no later window covers them; later
    // windows 4..8 cover positions 4..11
    assert(got.getString(1) === "x y z w" && got.getLong(2) === 12L &&
      got.getLong(3) === 8L)
  }

  test("matches brute-force reference on adversarial random corpora") {
    for (seed <- 1 to 4; k <- Seq(3, 5)) {
      val rnd = new scala.util.Random(seed * 31 + k)
      // tiny vocab + planted copies force heavy span sharing
      val vocab = Vector("a", "b", "c", "d")
      val base = (0L until 24L).map { i =>
        (i, Seq.fill(2 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      // plant: doc 24 = copy of doc 0, doc 25 = doc 1 with a tail glued on
      val corpus = base ++ Seq(
        (24L, base(0)._2),
        (25L, base(1)._2 + " " + base(2)._2),
        (26L, "\t" + base(3)._2 + "  \n")) // whitespace-noise copy
      val expected = ref(corpus, k)
      val got = run(corpus, k)
      assert(got === expected, s"seed=$seed k=$k")
    }
  }
}
