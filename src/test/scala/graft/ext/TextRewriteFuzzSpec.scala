package graft.ext

import graft.SparkTestBase

/** Randomized differential batteries for the round-16 text REWRITE
  * faces (TextAnalysis.c4LineClean, Curation.chunkBySentences):
  * independent plain-JVM references (String.split / Regex, vs the
  * operators' Catalyst array lambdas) over adversarial generated pages
  * — empty lines, whitespace runs incl. \x0B, javascript/lorem/brace
  * traps, quote terminals, unterminated tails, multi-byte-free ASCII
  * punctuation storms. Pins the Java-regex-vs-Catalyst seam the same
  * way HtmlEntityDecode's 3k-string fuzz does. */
class TextRewriteFuzzSpec extends SparkTestBase {

  private val terminal = Set('.', '!', '?', '"')

  private def refClean(raw: String, minWords: Int): (String, Int, Int, Boolean) = {
    val kept = raw.split("\n", -1).toSeq
      .map(l => l.replaceAll(TextAnalysis.WhitespaceClass, " ").trim)
      .filter(l => l.nonEmpty && terminal.contains(l.last) &&
        l.split(" ").length >= minWords &&
        !l.toLowerCase(java.util.Locale.ROOT).contains("javascript"))
    val cleaned = kept.mkString("\n")
    val nSent = "[^.!?]+[.!?]+".r.findAllIn(cleaned).length
    val keep = nSent >= 3 && !raw.contains("{") &&
      !raw.toLowerCase(java.util.Locale.ROOT).contains("lorem ipsum")
    (cleaned, kept.size, nSent, keep)
  }

  private def refChunks(raw: String, window: Int, stride: Int): Seq[(Int, String, Int, Int)] = {
    val ss = "[^.!?]+[.!?]+".r.findAllIn(raw).toSeq
      .map(s => s.replaceAll(TextAnalysis.WhitespaceClass, " ").trim)
      .filter(_.nonEmpty)
    if (ss.isEmpty) Seq.empty
    else {
      val nc = if (ss.size <= window) 1
        else math.ceil((ss.size - window).toDouble / stride).toInt + 1
      (0 until nc).map { i =>
        val c = ss.slice(i * stride, i * stride + window)
        val text = c.mkString(" ")
        (i, text, c.size, text.split(" ").length)
      }
    }
  }

  private def randomPage(rnd: scala.util.Random): String = {
    val words = Vector("alpha", "beta", "Gamma", "JavaScript", "javascript",
      "lorem", "ipsum", "lorem ipsum", "x", "sentence", "words", "enough",
      "brace{", "}", "q\"q", "..", "?!", "a.b")
    val ws = Vector(" ", "  ", "\t", "", " \t")
    val ends = Vector(".", "!", "?", "\"", "", "...", " .", "x")
    def line(): String = {
      val n = rnd.nextInt(9)
      (0 until n).map(_ => words(rnd.nextInt(words.size)))
        .mkString(ws(rnd.nextInt(ws.size))) + ends(rnd.nextInt(ends.size))
    }
    (0 until (1 + rnd.nextInt(8))).map(_ => line())
      .mkString(if (rnd.nextBoolean()) "\n" else "\n\n")
  }

  test("c4LineClean matches the independent reference on 400 adversarial pages") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val pages = (0L until 400L).map(i => (i, randomPage(rnd)))
    val got = TextAnalysis.c4LineClean(pages.toDF("doc_id", "text"), minWords = 3)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4))))
      .toMap
    pages.foreach { case (id, raw) =>
      assert(got(id) === refClean(raw, 3),
        s"page $id: ${raw.replace("\n", "\\n").take(120)}")
    }
  }

  test("chunkBySentences matches the independent reference on 400 adversarial pages") {
    import spark.implicits._
    val rnd = new scala.util.Random(99260816L)
    val pages = (0L until 400L).map(i => (i, randomPage(rnd)))
    val got = Curation.chunkBySentences(pages.toDF("doc_id", "text"),
        window = 3, stride = 2)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getString(2), r.getInt(3), r.getInt(4))))
      .toMap
    pages.foreach { case (id, raw) =>
      val want = refChunks(raw, 3, 2)
      val mine = got.filter(_._1._1 == id)
      assert(mine.size === want.size, s"page $id chunk count")
      want.foreach { case (cid, text, nS, nT) =>
        assert(mine((id, cid)) === ((text, nS, nT)), s"page $id chunk $cid")
      }
    }
  }
}
