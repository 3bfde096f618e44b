package graft.ext

import graft.SparkTestBase

class TextEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def eval(cand: Seq[(Long, String)], ref: Seq[(Long, String)], n: Int) =
    TextEval.ngramOverlap(cand.toDF("doc_id", "text"), ref.toDF("doc_id", "text"), n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long]))).toMap

  test("ROUGE-1: hand-computed clipped counts, P/R/F1 exact micro") {
    // cand: "the cat the cat sat" (the:2 cat:2 sat:1, 5 grams)
    // ref:  "the cat sat down"    (the:1 cat:1 sat:1 down:1, 4 grams)
    // clipped m = min(2,1)+min(2,1)+min(1,1) = 3
    val got = eval(Seq(1L -> "the cat the cat sat"),
      Seq(1L -> "the cat sat down"), n = 1)(1L)
    assert(got._1 === 3L && got._2 === 5L && got._3 === 4L)
    assert(got._4 === Some(600000L))  // 3/5
    assert(got._5 === Some(750000L))  // 3/4
    assert(got._6 === Some(666666L))  // 2*3/9
  }

  test("ROUGE-2: clipping counts repeated bigrams once per reference occurrence") {
    // cand bigrams: (a b) x3           ref bigrams: (a b) x1, (b a) x1, (a b)...
    // cand "a b a b a b": a-b:3? tokens a b a b a b -> bigrams: ab ba ab ba ab (ab:3, ba:2), 5 grams
    // ref "a b a": ab:1 ba:1, 2 grams -> m = min(3,1)+min(2,1) = 2
    val got = eval(Seq(1L -> "a b a b a b"), Seq(1L -> "a b a"), n = 2)(1L)
    assert(got._1 === 2L && got._2 === 5L && got._3 === 2L)
    assert(got._4 === Some(400000L) && got._5 === Some(1000000L))
  }

  test("identical texts score perfect 1e6 on all three metrics") {
    val got = eval(Seq(7L -> "spark engines at scale"),
      Seq(7L -> "spark engines at scale"), n = 2)(7L)
    assert(got._4 === Some(1000000L) && got._5 === Some(1000000L) &&
      got._6 === Some(1000000L))
  }

  test("disjoint texts score zero; empty/short side yields NULL metric not a crash") {
    val got = eval(Seq(1L -> "aa bb"), Seq(1L -> "cc dd"), n = 1)(1L)
    assert(got._1 === 0L && got._4 === Some(0L) && got._5 === Some(0L))
    // ref too short for bigrams: recall NULL, precision 0
    val short = eval(Seq(2L -> "aa bb cc"), Seq(2L -> "dd"), n = 2)(2L)
    assert(short._1 === 0L && short._3 === 0L)
    assert(short._4 === Some(0L) && short._5 === None)
    // pair present on one side only (full-join path)
    val lonely = eval(Seq(3L -> "aa bb"), Seq.empty, n = 1)(3L)
    assert(lonely._2 === 2L && lonely._3 === 0L && lonely._5 === None)
  }

  test("tokenization is lowercased whitespace; case folds before matching") {
    val got = eval(Seq(1L -> "The CAT"), Seq(1L -> "the cat"), n = 1)(1L)
    assert(got._4 === Some(1000000L) && got._5 === Some(1000000L))
  }

  test("chrF: hand-computed char-3-gram clip and one-division F-beta") {
    // cand "abcabc" -> grams abc bca cab abc (abc:2 bca:1 cab:1, 4)
    // ref  "abcd"   -> grams abc bcd (2) -> m = min(2,1) = 1
    // P = 1/4, R = 1/2, chrF2 = 5*1/(4*2+4) = 5/12
    val r = TextEval.charNgramOverlap(
      Seq((1L, "abcabc")).toDF("doc_id", "text"),
      Seq((1L, "a b cd")).toDF("doc_id", "text"), n = 3, betaSq = 4).head()
    assert(r.getLong(1) === 1L && r.getLong(2) === 4L && r.getLong(3) === 2L)
    assert(r.getLong(4) === 250000L && r.getLong(5) === 500000L)
    assert(r.getLong(6) === 416666L) // 5/12
  }

  test("chrF: whitespace strips before gramming; identical streams score 1e6") {
    val r = TextEval.charNgramOverlap(
      Seq((1L, "ab cd ef")).toDF("doc_id", "text"),
      Seq((1L, "a bcde f")).toDF("doc_id", "text"), n = 3, betaSq = 4).head()
    assert(r.getLong(4) === 1000000L && r.getLong(5) === 1000000L &&
      r.getLong(6) === 1000000L)
  }

  /** Independent LCS reference: recursive with memoization — no shared
    * code with the expression's two-row iterative DP. */
  private def lcsRef(a: Seq[String], b: Seq[String]): Int = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Int]
    def go(i: Int, j: Int): Int =
      if (i == a.length || j == b.length) 0
      else memo.getOrElseUpdate((i, j),
        if (a(i) == b(j)) 1 + go(i + 1, j + 1)
        else math.max(go(i + 1, j), go(i, j + 1)))
    go(0, 0)
  }

  private def rougeL(cand: Seq[(Long, String)], ref: Seq[(Long, String)]) =
    TextEval.rougeL(cand.toDF("doc_id", "text"), ref.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(6)).map(_.asInstanceOf[Long]))).toMap

  test("ROUGE-L: hand case — in-order overlap at a gap beats no bigram match") {
    // cand "a x b y c" vs ref "a b c": LCS = 3 (a b c) though no
    // shared bigram exists
    val got = rougeL(Seq(1L -> "a x b y c"), Seq(1L -> "a b c"))(1L)
    assert(got._1 === 3L && got._2 === 5L && got._3 === 3L)
    assert(got._4 === Some(750000L)) // f1 = 2*3/8
  }

  test("ROUGE-L: lcs_length matches an independent recursive-memo reference on random tapes") {
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("a", "b", "c", "d")
    val pairs = (0 until 25).map { i =>
      val mk = () => Seq.fill(rnd.nextInt(14))(alphabet(rnd.nextInt(4))).mkString(" ")
      (i.toLong, mk(), mk())
    }
    val got = rougeL(pairs.map(p => (p._1, p._2)), pairs.map(p => (p._1, p._3)))
    pairs.foreach { case (id, c, r) =>
      val want = lcsRef(c.split(" ").filter(_.nonEmpty).toSeq,
        r.split(" ").filter(_.nonEmpty).toSeq)
      assert(got(id)._1 === want.toLong, s"pair $id: '$c' vs '$r'")
    }
  }

  test("ROUGE-L: empty side gives lcs 0 with NULL-safe metrics; unpaired docs drop (inner join)") {
    val got = rougeL(Seq(1L -> "a b", 2L -> "a"), Seq(1L -> "   "))
    assert(got.keySet === Set(1L)) // pair 2 has no reference row
    assert(got(1L)._1 === 0L && got(1L)._3 === 0L && got(1L)._4 === Some(0L))
  }

  test("ROUGE-L maxTokens slices both sides to the prefix before the DP") {
    // full tapes: cand "a b c d e", ref "x a b c d" -> LCS 4; with
    // maxTokens = 3 the prefixes are "a b c" vs "x a b" -> LCS 2,
    // and the token denominators shrink to the sliced lengths.
    val full = TextEval.rougeL(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"),
      Seq((1L, "x a b c d")).toDF("doc_id", "text")).head()
    assert(full.getLong(1) === 4L && full.getLong(2) === 5L)
    val capped = TextEval.rougeL(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"),
      Seq((1L, "x a b c d")).toDF("doc_id", "text"), maxTokens = 3).head()
    assert(capped.getLong(1) === 2L)
    assert(capped.getLong(2) === 3L && capped.getLong(3) === 3L)
  }

  /** Independent Levenshtein reference: recursive with memoization —
    * no shared code with the expression's two-row iterative DP. */
  private def levRef(a: Seq[String], b: Seq[String]): Int = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Int]
    def go(i: Int, j: Int): Int =
      if (i == a.length) b.length - j
      else if (j == b.length) a.length - i
      else memo.getOrElseUpdate((i, j),
        if (a(i) == b(j)) go(i + 1, j + 1)
        else 1 + math.min(go(i + 1, j + 1),
          math.min(go(i + 1, j), go(i, j + 1))))
    go(0, 0)
  }

  private def wer(cand: Seq[(Long, String)], ref: Seq[(Long, String)],
      maxTokens: Int = 0) =
    TextEval.wer(cand.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
        maxTokens = maxTokens)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap

  test("WER: hand case — substitution is ONE edit at token grain") {
    // cand "the cat sat" vs ref "the bat sat": 1 substitution, ref 3
    // tokens -> wer 1/3. Char-level levenshtein would also say 1 but
    // for a multi-char divergence only the token grain is right:
    val got = wer(Seq(1L -> "the cat sat"), Seq(1L -> "the bat sat"))(1L)
    assert(got._1 === 1L && got._2 === 3L && got._3 === 3L)
    assert(got._4 === Some(333333L))
    // "kitten sitting" vs "kitten sat" -> 1 token substitution even
    // though the words differ in 4+ chars
    val g2 = wer(Seq(2L -> "kitten sitting"), Seq(2L -> "kitten sat"))(2L)
    assert(g2._1 === 1L && g2._4 === Some(500000L))
  }

  test("WER: insertions and deletions count; WER can exceed 1e6") {
    // cand "a b c d e" vs ref "c": 4 deletions -> edits 4, ref 1
    val got = wer(Seq(1L -> "a b c d e"), Seq(1L -> "c"))(1L)
    assert(got._1 === 4L && got._4 === Some(4000000L))
    // identical -> 0; empty ref -> NULL wer with edits = cand length
    val id = wer(Seq(2L -> "x y z"), Seq(2L -> "x y z"))(2L)
    assert(id._1 === 0L && id._4 === Some(0L))
    val er = wer(Seq(3L -> "x y"), Seq(3L -> "   "))(3L)
    assert(er._1 === 2L && er._3 === 0L && er._4 === None)
  }

  test("WER: edit_distance matches an independent recursive-memo reference on random tapes") {
    val rnd = new scala.util.Random(13)
    val alphabet = Vector("a", "b", "c", "d")
    val pairs = (0 until 25).map { i =>
      val mk = () => Seq.fill(rnd.nextInt(14))(alphabet(rnd.nextInt(4))).mkString(" ")
      (i.toLong, mk(), mk())
    }
    val got = wer(pairs.map(p => (p._1, p._2)), pairs.map(p => (p._1, p._3)))
    pairs.foreach { case (id, c, r) =>
      val want = levRef(c.split(" ").filter(_.nonEmpty).toSeq,
        r.split(" ").filter(_.nonEmpty).toSeq)
      assert(got(id)._1 === want.toLong, s"pair $id: '$c' vs '$r'")
    }
  }

  test("WER: maxTokens slices both sides before the DP; unpaired docs drop; case folds") {
    // full: cand "a b c d e" vs ref "x a b c d" -> lev 2 (del x-ish:
    // actually sub a->x chain) — independent ref pins it; capped at 3:
    // "a b c" vs "x a b" -> lev 2
    val full = wer(Seq(1L -> "a b c d e", 2L -> "a"), Seq(1L -> "x a b c d"))
    assert(full.keySet === Set(1L))
    assert(full(1L)._1 === levRef(Seq("a","b","c","d","e"), Seq("x","a","b","c","d")).toLong)
    val capped = wer(Seq(1L -> "a b c d e"), Seq(1L -> "x a b c d"), maxTokens = 3)(1L)
    assert(capped._1 === 2L && capped._2 === 3L && capped._3 === 3L)
    val folded = wer(Seq(4L -> "The CAT"), Seq(4L -> "the cat"))(4L)
    assert(folded._1 === 0L)
  }

  private def meteor(cand: Seq[(Long, String)], ref: Seq[(Long, String)],
      maxTokens: Int = 0) =
    TextEval.meteor(cand.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
        maxTokens = maxTokens)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("METEOR: hand tapes — identical, scrambled, unmatched-break, duplicate first-fit") {
    // identical: m=3 ch=1, Fmean=1, penalty=(1/3)^3/2 -> 5*53e6/270
    assert(meteor(Seq(1L -> "a b c"), Seq(1L -> "a b c"))(1L) ===
      ((3L, 1L, 3L, 3L, 981481L)))
    // full scramble: every match its own chunk -> penalty 1/2, score .5
    assert(meteor(Seq(2L -> "c b a"), Seq(2L -> "a b c"))(2L) ===
      ((3L, 3L, 3L, 3L, 500000L)))
    // unmatched candidate token breaks the run: (1,1) then (3,2) ->
    // 2 chunks; Fmean=20/21, penalty=1/2 -> 40e6 div 84
    assert(meteor(Seq(3L -> "a x b"), Seq(3L -> "a b"))(3L) ===
      ((2L, 2L, 3L, 2L, 476190L)))
    // duplicates take the SMALLEST unused ref position: "a a" aligns
    // (1,1),(2,2) -> one chunk; 5*15e6 div (4*29)
    assert(meteor(Seq(4L -> "a a"), Seq(4L -> "a a a"))(4L) ===
      ((2L, 1L, 2L, 3L, 646551L)))
    // zero overlap scores exactly 0; chunks 0
    assert(meteor(Seq(5L -> "x y"), Seq(5L -> "p q"))(5L) ===
      ((0L, 0L, 2L, 2L, 0L)))
  }

  test("METEOR: greedy alignment matches an independent reference on random tapes") {
    // independent greedy first-fit — no shared code with the expression
    def alignRef(c: Seq[String], r: Seq[String]): (Int, Int) = {
      val used = scala.collection.mutable.Set.empty[Int]
      var (m, ch, li, lj) = (0, 0, -2, -2)
      c.zipWithIndex.foreach { case (t, i) =>
        r.indices.find(j => !used(j) && r(j) == t).foreach { j =>
          used += j; m += 1
          if (!(i == li + 1 && j == lj + 1)) ch += 1
          li = i; lj = j
        }
      }
      (m, ch)
    }
    val rnd = new scala.util.Random(29)
    val alphabet = Vector("a", "b", "c", "d")
    val pairs = (0 until 30).map { i =>
      val mk = () => Seq.fill(rnd.nextInt(14))(alphabet(rnd.nextInt(4))).mkString(" ")
      (i.toLong, mk(), mk())
    }
    val got = meteor(pairs.map(p => (p._1, p._2)), pairs.map(p => (p._1, p._3)))
    pairs.foreach { case (id, c, r) =>
      val (m, ch) = alignRef(c.split(" ").filter(_.nonEmpty).toSeq,
        r.split(" ").filter(_.nonEmpty).toSeq)
      assert((got(id)._1, got(id)._2) === ((m.toLong, ch.toLong)),
        s"pair $id: '$c' vs '$r'")
    }
  }

  test("METEOR: maxTokens slices both sides; unpaired docs drop; empty side scores 0") {
    val capped = meteor(Seq(1L -> "a b c d e"), Seq(1L -> "c d e a b"),
      maxTokens = 3)
    // prefixes "a b c" vs "c d e": only c matches -> m=1 ch=1
    assert(capped(1L)._1 === 1L && capped(1L)._2 === 1L)
    assert(capped(1L)._3 === 3L && capped(1L)._4 === 3L)
    val got = meteor(Seq(2L -> "a b", 3L -> "a"), Seq(2L -> "   "))
    assert(got.keySet === Set(2L))
    assert(got(2L) === ((0L, 0L, 2L, 0L, 0L)))
  }

  test("CER: char-grain hand case; whitespace collapses; empty ref is NULL") {
    def cer(c: String, r: String) = TextEval.cer(
      Seq((1L, c)).toDF("doc_id", "text"), Seq((1L, r)).toDF("doc_id", "text"))
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
        Option(x.get(4)).map(_.asInstanceOf[Long]))).head
    // "the cat" vs "the bat": 1 char edit over 7 ref chars
    assert(cer("the cat", "the bat") === ((1L, 7L, 7L, Some(142857L))))
    // formatting-only churn: runs of whitespace collapse, case folds
    assert(cer("The  cat\n sat", "the cat sat") === ((0L, 11L, 11L, Some(0L))))
    // empty reference: NULL cer, edits = candidate length
    assert(cer("ab", "   ") === ((2L, 2L, 0L, None)))
    // CER exceeds 1e6 when the candidate balloons
    assert(cer("aaaa", "a")._4 === Some(3000000L))
  }

  private def bleu(cand: Seq[(Long, String)], ref: Seq[(Long, String)]) = {
    val r = TextEval.corpusBleu(
      cand.toDF("doc_id", "text"), ref.toDF("doc_id", "text")).head()
    (0 until r.length).map(i =>
      r.schema(i).name -> Option(r.get(i)).map(_.asInstanceOf[Long])).toMap
  }

  test("corpus BLEU: hand case — perfect precisions, brevity penalty only") {
    // pair 1 identical 6-token texts; pair 2 cand 4 tokens vs ref 5.
    // All clipped precisions are 1 -> every nano-ln term is 0.
    // c = 10, r = 11 -> bp = (11-10)*1e9 div 10 = 1e8;
    // bleu = round(exp(-0.1)*1e6) = 904837.
    val got = bleu(
      Seq(1L -> "the cat sat on the mat", 2L -> "a b c d"),
      Seq(1L -> "the cat sat on the mat", 2L -> "a b c d e"))
    assert(got("cand_len") === Some(10L) && got("ref_len") === Some(11L))
    assert(got("match_1") === Some(10L) && got("total_1") === Some(10L))
    assert(got("match_4") === Some(4L) && got("total_4") === Some(4L))
    assert(got("bp_penalty_nano") === Some(100000000L))
    assert(got("prec_penalty_nano") === Some(0L))
    assert(got("log_bleu_nano") === Some(-100000000L))
    assert(got("bleu_micro") === Some(904837L))
  }

  test("corpus BLEU: hand case — mixed precisions, nano-ln tape") {
    // cand "a b c d e f" vs ref "a b c d f e":
    // m/t per order: 6/6, 3/5, 2/4, 1/3; c = r = 6 -> bp = 0.
    // nano-ln terms: 0, round(ln(5/3)e9)=510825624,
    // round(ln 2 e9)=693147181, round(ln 3 e9)=1098612289;
    // sum 2302585094 div 4 = 575646273.
    val got = bleu(Seq(1L -> "a b c d e f"), Seq(1L -> "a b c d f e"))
    assert(got("match_2") === Some(3L) && got("total_2") === Some(5L))
    assert(got("match_3") === Some(2L) && got("total_3") === Some(4L))
    assert(got("match_4") === Some(1L) && got("total_4") === Some(3L))
    assert(got("bp_penalty_nano") === Some(0L))
    assert(got("prec_penalty_nano") === Some(575646273L))
    assert(got("log_bleu_nano") === Some(-575646273L))
    assert(got("bleu_micro") === Some(562341L))
  }

  test("corpus BLEU: a zero-match order zeroes the score (unsmoothed); empty candidate is NULL") {
    // cand "a b" / ref "a c": unigram match 1, bigram match 0 -> 0.
    val z = bleu(Seq(1L -> "a b"), Seq(1L -> "a c"))
    assert(z("match_1") === Some(1L) && z("match_2") === Some(0L))
    assert(z("bleu_micro") === Some(0L))
    assert(z("log_bleu_nano") === None && z("prec_penalty_nano") === None)
    assert(z("bp_penalty_nano") === Some(0L))
    val e = bleu(Seq.empty, Seq(1L -> "a b c"))
    assert(e("cand_len") === Some(0L) && e("ref_len") === Some(3L))
    assert(e("bleu_micro") === None && e("bp_penalty_nano") === None)
  }

  test("sentence BLEU: +1 smoothing hand tape; zero unigram overlap scores exactly 0") {
    // cand "a b c d e f" vs ref "a b c d f e": m/t = 6/6, 3/5, 2/4, 1/3
    // p1 = 1 (unsmoothed), p2..p4 = (m+1)/(t+1); nano-ln terms
    // 0, ln(6/4), ln(5/3), ln(4/2) -> sum 1609437913 div 4 = 402359478
    val rows = TextEval.sentenceBleu(
      Seq((1L, "a b c d e f"), (2L, "p q r s")).toDF("doc_id", "text"),
      Seq((1L, "a b c d f e"), (2L, "x y")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getAs[Long]("match_2") === 3L && r1.getAs[Long]("total_2") === 5L)
    assert(r1.getAs[Long]("bp_penalty_nano") === 0L)
    assert(r1.getAs[Long]("prec_penalty_nano") === 402359478L)
    assert(r1.getAs[Long]("bleu_micro") === 668740L)
    val r2 = rows(2L)
    assert(r2.getAs[Long]("match_1") === 0L)
    assert(r2.getAs[Long]("bleu_micro") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("log_bleu_nano")))
  }

  test("sentence BLEU scoreable-pair contract: short candidate or empty reference drops") {
    // pair 1: cand only 3 tokens (< maxN=4) -> dropped
    // pair 2: ref whitespace-only -> no ref unigrams -> dropped
    // pair 3: unpaired candidate -> dropped (inner join)
    val rows = TextEval.sentenceBleu(
      Seq((1L, "a b c"), (2L, "a b c d"), (3L, "a b c d")).toDF("doc_id", "text"),
      Seq((1L, "a b c"), (2L, "   ")).toDF("doc_id", "text"))
      .collect()
    assert(rows.isEmpty)
  }

  test("corpus BLEU by group: each group row equals corpusBleu on that group's slice") {
    import org.apache.spark.sql.functions.col
    val cand = Seq((1L, "the cat sat on the mat", "a"), (2L, "a b c d", "b"),
      (3L, "x y z", "a"), (4L, "p q", "b"))
      .toDF("doc_id", "text", "dom")
    val ref = Seq((1L, "the cat sat on the mat"), (2L, "a b c d e"),
      (3L, "x w z"), (4L, "r s"))
      .toDF("doc_id", "text")
    val grouped = TextEval.corpusBleuByGroup(cand, ref, "dom")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(grouped.keySet === Set("a", "b"))
    Seq("a", "b").foreach { g =>
      val slice = cand.filter(col("dom") === g).drop("dom")
      val ids = slice.select("doc_id").collect().map(_.getLong(0)).toSet
      val one = TextEval.corpusBleu(slice,
        ref.filter(col("doc_id").isin(ids.toSeq: _*))).head()
      val gr = grouped(g)
      one.schema.fieldNames.foreach { f =>
        assert(Option(gr.getAs[Any](f)) === Option(one.getAs[Any](f)),
          s"group $g column $f")
      }
    }
  }

  test("CER by group: grouped sums equal per-slice recompute; empty-ref group NULL") {
    import org.apache.spark.sql.functions.col
    val cand = Seq((1L, "the cat", "a"), (2L, "x y", "a"), (3L, "ab", "b"))
      .toDF("doc_id", "text", "dom")
    val ref = Seq((1L, "the bat"), (2L, "x y"), (3L, "   "))
      .toDF("doc_id", "text")
    val got = TextEval.cerByGroup(cand, ref, "dom")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    // group a: edits 1 + 0 over ref chars 7 + 3 = 10 -> 100000
    assert(got("a") === ((2L, 1L, 10L, Some(100000L))))
    // group b: only an empty reference -> NULL rate, edits = cand len
    assert(got("b") === ((1L, 2L, 0L, None)))
  }

  test("corpus BLEU sums corpus-wide before ratios (not a mean of per-pair scores)") {
    // Two pairs whose per-pair unigram precisions are 1 and 1/3; the
    // corpus precision is (2+1)/(2+3) = 3/5, not the mean 2/3.
    val got = bleu(Seq(1L -> "x y", 2L -> "p q r"), Seq(1L -> "x y", 2L -> "p"))
    assert(got("match_1") === Some(3L) && got("total_1") === Some(5L))
  }
}
