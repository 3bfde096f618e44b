package graft.ext

import graft.SparkTestBase
import graft.functions.BpeEncode

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest"
  ).toDF("text")

  test("train learns the classic 'est'-family merges on the toy corpus") {
    val merges = BpeTrainer.collectMerges(BpeTrainer.train(corpus, "text", 6))
    // (e,s) count: newest 6 + widest 3 = 9 — the unambiguous first merge
    assert(merges.head === (("e", "s")))
    assert(merges.contains(("es", "t"))) // second: est count 9
    assert(merges.length === 6)
  }

  test("train is deterministic across repartitionings") {
    val m1 = BpeTrainer.collectMerges(BpeTrainer.train(corpus, "text", 5))
    val m2 = BpeTrainer.collectMerges(
      BpeTrainer.train(corpus.repartition(7), "text", 5))
    assert(m1 === m2)
  }

  test("encode applies lowest-rank-first merges; tokens reassemble the word") {
    val merges = BpeTrainer.collectMerges(BpeTrainer.train(corpus, "text", 6))
    val toks = BpeTrainer.encode(Seq("newest lowest").toDF("text"), "text", merges)
      .select("tokens").as[Seq[String]].head()
    // every word reassembles exactly from its tokens
    assert(toks.mkString("") === "newestlowest")
    // trained words segment to few symbols; 'est' must survive as one token
    assert(toks.contains("est") || toks.exists(_.endsWith("est")))
  }

  test("encode on the training corpus reproduces the trainer's symbol state") {
    // after training to exhaustion on a tiny vocab, each training word
    // becomes ONE token
    val tiny = Seq("abc abc abc").toDF("text")
    val merges = BpeTrainer.collectMerges(BpeTrainer.train(tiny, "text", 10))
    val toks = BpeTrainer.encode(Seq("abc").toDF("text"), "text", merges)
      .select("tokens").as[Seq[String]].head()
    assert(toks === Seq("abc"))
  }

  test("unseen characters pass through as singleton symbols") {
    val merges = BpeTrainer.collectMerges(BpeTrainer.train(corpus, "text", 4))
    val toks = BpeTrainer.encode(Seq("xyz").toDF("text"), "text", merges)
      .select("tokens").as[Seq[String]].head()
    assert(toks === Seq("x", "y", "z"))
  }

  test("encode lowercases via Locale.ROOT: a Turkish default locale cannot degrade trained pieces") {
    // under the tr_TR default locale, String.toLowerCase() maps 'I' to
    // dotless 'ı' — a default-locale lowercase at encode time would
    // silently miss every trained piece containing 'i' for capitalized
    // input. The expression pins Locale.ROOT (matching Spark's
    // locale-independent lower() used at training), so segmentation is
    // identical whatever the JVM's default locale is.
    val merges = Seq(("i", "o"))
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
    try {
      val got = BpeTrainer.encode(Seq("IO io").toDF("text"), "text", merges)
        .select("tokens").collect()
      assert(got(0).getSeq[String](0) === Seq("io", "io"))
    } finally java.util.Locale.setDefault(prev)
  }

  test("expression is null-safe and lowercases like the trainer") {
    val merges = Seq(("l", "o"))
    val df = Seq(Some("LO lo"), None).toDF("text")
    val got = BpeTrainer.encode(df, "text", merges)
      .select("tokens").collect()
    assert(got(0).getSeq[String](0) === Seq("lo", "lo"))
    assert(got(1).isNullAt(0))
  }

  test("local heap trainer == distributed per-round trainer, ranks and counts") {
    // seeded corpora over a tiny alphabet force dense pair collisions
    // and count ties — the regimes where the heap's lazy deletion and
    // tie-break must agree exactly with the distributed ordered take(1)
    for (seed <- Seq(11, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 120).map { _ =>
        (0 until (2 + rnd.nextInt(6)))
          .map(_ => (0 until (1 + rnd.nextInt(4)))
            .map(_ => "abcd".charAt(rnd.nextInt(4))).mkString)
          .mkString(" ")
      }.toDF("text")
      def rows(maxLocal: Long) =
        BpeTrainer.train(docs, "text", 12, maxLocalWords = maxLocal)
          .orderBy("rank").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(rows(1000000L) === rows(0L), s"seed $seed: local != distributed")
    }
  }

  test("distributed loop batches provably-sequential merges: jobs << merges") {
    import spark.implicits._
    // symbol-disjoint head pairs with distinct counts — the natural-
    // language regime where one top-m ranking yields many safe merges
    val words = Seq(
      (Seq("a", "a"), 100L), (Seq("b", "b"), 90L), (Seq("c", "c"), 80L),
      (Seq("d", "d"), 70L), (Seq("e", "e"), 60L), (Seq("f", "f"), 50L))
      .toDS()
    val (merges, jobs) = BpeTrainer.trainDistributed(words, 6, topM = 64)
    assert(merges.map { case (r, a, b, n) => (r, a + b, n) } ===
      Seq((0, "aa", 100L), (1, "bb", 90L), (2, "cc", 80L),
        (3, "dd", 70L), (4, "ee", 60L), (5, "ff", 50L)))
    // all 6 merges accepted off ONE ranking job — versus 6 jobs for
    // the old one-merge-per-job loop
    assert(jobs === 1, s"expected 1 aggregation job, ran $jobs")
  }

  test("batch selection never diverges from sequential on adversarial ties") {
    import spark.implicits._
    // interlocking symbols + count ties: the acceptance proof must stop
    // batches early, never reorder — exactness beats amortization
    for (seed <- Seq(7, 13)) {
      val rnd = new scala.util.Random(seed)
      val words = (0 until 60).map { _ =>
        ((0 until (2 + rnd.nextInt(5)))
          .map(_ => "ab".charAt(rnd.nextInt(2)).toString).toList: Seq[String],
          (1 + rnd.nextInt(3)).toLong)
      }.groupBy(_._1).map { case (s, g) => (s, g.map(_._2).sum) }.toSeq.toDS()
      val (dist, jobs) = BpeTrainer.trainDistributed(words, 10, topM = 8)
      val local = BpeTrainer.trainLocal(
        words.collect().map { case (s, f) => (s, f) }, 10)
      assert(dist === local, s"seed $seed: batched distributed != sequential")
      assert(jobs <= 11, s"seed $seed: jobs must never exceed merges+1, got $jobs")
    }
  }

  // ------------------------------------------------- second reference

  /** Independent greedy-BPE reference: list recursion instead of the
    * expression's vector loop, written from the spec alone (per word:
    * merge every occurrence of the LOWEST-rank present pair left to
    * right, resuming after each merge; repeat until no trainable pair
    * remains). Divergences adjudicate against Sennrich et al. 2016 /
    * the GPT-2 encoder convention. */
  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    def mergeAll(syms: List[String], a: String, b: String): List[String] = {
      @annotation.tailrec
      def go(rest: List[String], acc: List[String]): List[String] = rest match {
        case x :: y :: t if x == a && y == b => go(t, (a + b) :: acc)
        case x :: t                          => go(t, x :: acc)
        case Nil                             => acc
      }
      go(syms, Nil).reverse
    }
    @annotation.tailrec
    def step(syms: List[String]): List[String] = {
      val present = syms.zip(syms.drop(1)).flatMap(rank.get)
      if (present.isEmpty) syms
      else { val (a, b) = merges(present.min); step(mergeAll(syms, a, b)) }
    }
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      .flatMap(w => step(w.map(_.toString).toList))
  }

  private def nativeEncode(texts: Seq[String], merges: Seq[(String, String)]): Seq[Seq[String]] =
    BpeTrainer.encode(texts.toDF("text"), "text", merges)
      .select("tokens").collect().map(_.getSeq[String](0)).toSeq

  test("differential battery: native encode == independent reference on seeded corpora") {
    // Random words over a 3-letter alphabet (heavy repetition → overlap
    // edge cases) against TRAINED tables, plus arbitrary adversarial
    // merge tables the trainer would never emit.
    (0 until 20).foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val alphabet = "abc"
      def word() = (0 until 1 + rnd.nextInt(10))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val docs = (0 until 30).map(_ => (0 until 1 + rnd.nextInt(8)).map(_ => word()).mkString(" "))
      val merges = BpeTrainer.collectMerges(
        BpeTrainer.train(docs.toDF("text"), "text", 1 + rnd.nextInt(12)))
      val got = nativeEncode(docs, merges)
      docs.zip(got).foreach { case (text, tokens) =>
        assert(tokens === refEncode(text, merges), s"seed $seed text '$text'")
        assert(tokens.mkString === text.toLowerCase.replaceAll("\\s+", ""),
          s"seed $seed tokens must reassemble '$text'")
      }
    }
  }

  test("differential battery: adversarial tie-rank and self-overlap merge tapes") {
    // Hand-adversarial tables: self-pairs on runs (left-to-right
    // collapse), chained merges whose outputs re-match later ranks,
    // rank ties between overlapping candidates, and pairs absent from
    // the text. Each case checked against the independent reference.
    val tapes: Seq[(Seq[String], Seq[(String, String)])] = Seq(
      // run collapse: aaaa -> aa aa; then (aa,aa) -> aaaa
      (Seq("aaaa", "aaa", "aaaaa"), Seq(("a", "a"), ("aa", "aa"))),
      // chain: (a,b)->ab, (ab,c)->abc, then self-chain (abc,abc)
      (Seq("abcabc", "ababc", "abc"), Seq(("a", "b"), ("ab", "c"), ("abc", "abc"))),
      // overlapping candidates with adjacent ranks: ba vs ab on 'ababab'
      (Seq("ababab", "bababa"), Seq(("b", "a"), ("a", "b"))),
      (Seq("ababab", "bababa"), Seq(("a", "b"), ("b", "a"))),
      // merged symbol recreates an earlier pair's left side
      (Seq("aab", "aaab", "aaaab"), Seq(("a", "b"), ("a", "ab"), ("a", "aab"))),
      // table with pairs never present
      (Seq("xyz"), Seq(("q", "r"), ("x", "q"))),
      // single chars and empty-ish inputs
      (Seq("a", "  a  b  ", "ab"), Seq(("a", "b"))))
    tapes.zipWithIndex.foreach { case ((texts, merges), i) =>
      val got = nativeEncode(texts, merges)
      texts.zip(got).foreach { case (text, tokens) =>
        assert(tokens === refEncode(text, merges), s"tape $i text '$text' merges $merges")
      }
    }
  }

  test("differential battery: random merge tables over random unicode-ish words") {
    // Tables built from random symbol pairs (single chars AND composite
    // strings) — shapes a trained table cannot produce, probing the
    // expression's rank scan outside the trained-vocabulary happy path.
    (0 until 10).foreach { seed =>
      val rnd = new scala.util.Random(7700 + seed)
      val chars = "abßπ"
      def sym() = (0 until 1 + rnd.nextInt(2)).map(_ => chars(rnd.nextInt(chars.length))).mkString
      val merges = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      (0 until 3 + rnd.nextInt(8)).foreach(_ => merges += ((sym(), sym())))
      val texts = (0 until 15).map(_ =>
        (0 until 1 + rnd.nextInt(12)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
      val got = nativeEncode(texts, merges.toSeq)
      texts.zip(got).foreach { case (text, tokens) =>
        assert(tokens === refEncode(text, merges.toSeq), s"seed $seed text '$text'")
      }
    }
  }
}
