package graft.ext

import graft.SparkTestBase
import graft.functions.DictionaryScan

/** Dictionary tagging / C4 blocklist filter (functions.DictionaryTags,
  * Curation.dictionaryTags/blocklistFilter) vs a brute-force reference
  * that implements the SAME normalization contract independently
  * (regex-based, vs the expression's single-pass char scan) and tests
  * each phrase by space-flanked containment — plus hand cases pinning
  * the contract's edges.
  */
class DictionaryTagSpec extends SparkTestBase {

  /** Independent normalization: regexes over the published classes. */
  private def refNormalize(raw: String): String =
    raw.toLowerCase(java.util.Locale.ROOT)
      .split(TextAnalysis.WhitespaceClass)
      .map(_.replaceAll("^" + DictionaryScan.EdgePunctClass + "+", "")
        .replaceAll(DictionaryScan.EdgePunctClass + "+$", ""))
      .filter(_.nonEmpty).mkString(" ")

  /** Brute-force tags: space-flanked containment per phrase, sorted. */
  private def refTags(text: String, dict: Seq[String]): Seq[String] = {
    val s = " " + refNormalize(text) + " "
    dict.map(refNormalize).filter(_.nonEmpty).distinct
      .filter(p => s.contains(" " + p + " ")).sorted
  }

  private def runTags(corpus: Seq[(Long, String)], dict: Seq[String]): Map[Long, (String, Int)] = {
    import spark.implicits._
    Curation.dictionaryTags(corpus.toDF("doc_id", "text"), dict)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
  }

  private val dict = Seq("spark", "dup", "batch batch", "gambling",
    "online casino", "casino bonus", "ord", "quantum flux")

  test("whole-token only: 'ord' never fires inside 'order'") {
    val got = runTags(Seq((0L, "order ordinal record ord!"), (1L, "order only")), dict)
    assert(got(0L) === (("ord", 1)))
    assert(got(1L) === (("", 0)))
  }

  test("overlapping phrases both report; punctuation edges strip; case folds") {
    val got = runTags(Seq((0L, "try Online, CASINO bonus? now")), dict)
    assert(got(0L) === (("casino bonus,online casino", 2)))
  }

  test("phrase suffix of another phrase reports independently") {
    val d = Seq("online casino", "casino")
    val got = runTags(Seq((0L, "an online casino here"), (1L, "just casino")), d)
    assert(got(0L) === (("casino,online casino", 2)))
    assert(got(1L) === (("casino", 1)))
  }

  test("internal punctuation is part of the token — 'foo' does not match 'foo,bar'") {
    val got = runTags(Seq((0L, "foo,bar baz"), (1L, "foo bar")), Seq("foo", "qux"))
    assert(got(0L) === (("", 0)))
    assert(got(1L) === (("foo", 1)))
  }

  test("within-doc repeats dedup; multi-word across whitespace runs") {
    val got = runTags(Seq((0L, "batch batch\t batch  spark spark")), dict)
    // "batch batch batch" contains the 2-gram twice (overlap) -> once
    assert(got(0L) === (("batch batch,spark", 2)))
  }

  test("null and empty text surface with zero tags") {
    import spark.implicits._
    val df = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "?!... ..."))
      .toDF("doc_id", "text")
    val got = Curation.dictionaryTags(df, dict)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    assert(got === Map(0L -> (("", 0)), 1L -> (("", 0)), 2L -> (("", 0))))
  }

  test("blocklistFilter drops exactly the docs with a hit, keeps all columns") {
    import spark.implicits._
    val df = Seq(
      (0L, "a clean document", "en"),
      (1L, "visit the ...GAMBLING! den", "en"),
      (2L, "ordinary text", "fr"),
      (3L, null.asInstanceOf[String], "de")).toDF("doc_id", "text", "lang")
    val kept = Curation.blocklistFilter(df, Seq("gambling", "casino bonus"))
    assert(kept.columns.toSeq === Seq("doc_id", "text", "lang"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted === Array(0L, 2L, 3L))
  }

  test("randomized differential vs brute-force containment reference") {
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("alpha", "beta", "gamma", "Delta", "ALPHA", "ord",
      "order", "casino", "bonus", "online", "x1", "re-use", "a")
    val punct = Vector("", "!", "...", ",", "?!", "(", ")", ";")
    val ws = Vector(" ", "  ", "\t", "\n", " \t ")
    def doc(): String = (0 until (1 + rnd.nextInt(30))).map { _ =>
      punct(rnd.nextInt(punct.size)) + vocab(rnd.nextInt(vocab.size)) +
        punct(rnd.nextInt(punct.size))
    }.mkString(ws(rnd.nextInt(ws.size)), ws(rnd.nextInt(ws.size)), "")
    val d = Seq("alpha", "beta gamma", "ord", "online casino", "casino",
      "casino bonus", "re-use", "a", "delta", "missing term")
    val corpus = (0L until 60L).map(i => (i, doc()))
    val got = runTags(corpus, d)
    corpus.foreach { case (id, text) =>
      val want = refTags(text, d)
      assert(got(id) === ((want.mkString(","), want.size)),
        s"doc $id text=${text.replace("\n", "\\n")}")
    }
  }

  test("sf0.001 documents: expression agrees with the brute-force reference") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val got = runTags(docs.toSeq, dict)
    docs.foreach { case (id, text) =>
      val want = refTags(text, dict)
      assert(got(id) === ((want.mkString(","), want.size)), s"doc $id")
    }
  }
}
