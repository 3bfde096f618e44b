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

  test("expression is null-safe and lowercases like the trainer") {
    val merges = Seq(("l", "o"))
    val df = Seq(Some("LO lo"), None).toDF("text")
    val got = BpeTrainer.encode(df, "text", merges)
      .select("tokens").collect()
    assert(got(0).getSeq[String](0) === Seq("lo", "lo"))
    assert(got(1).isNullAt(0))
  }
}
