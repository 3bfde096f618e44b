package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import TextAnalysis._

  private def one(text: String) = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
  }

  test("lexicalDiversity: TTR and hapax fraction, case folding, null/blank rows kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The the THE cat sat"),        // tokens 5, types 3 (the,cat,sat), hapax 2
      (2L, "a b c d"),                    // all hapax: ttr 1e6, hapax 1e6
      (3L, null.asInstanceOf[String]),    // kept, zero counts, NULL ratios
      (4L, "   ")                         // blank: same contract
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3)) === (5L, 3L, 2L))
    assert(d1.getLong(4) === 600000L)  // 3*1e6 // 5
    assert(d1.getLong(5) === 666666L)  // 2*1e6 // 3
    val d2 = got(2L)
    assert(d2.getLong(4) === 1000000L && d2.getLong(5) === 1000000L)
    Seq(3L, 4L).foreach { id =>
      val d = got(id)
      assert(d.getLong(1) === 0L && d.getLong(2) === 0L)
      assert(d.isNullAt(4) && d.isNullAt(5))
    }
  }

  test("tokenCount: words, blanks, empties") {
    import spark.implicits._
    val df = Seq("a b  c", "  ", "", "single").toDF("text")
      .select(tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(3, 0, 0, 1))
  }

  test("bpeTokenCount: letter/digit/punct runs, leading-space absorption, nulls") {
    import spark.implicits._
    val df = Seq(
      Some("hello world"), // "hello", " world" -> 2
      Some("it's 2024!"), // "it", "'", "s", " 2024", "!" -> 5
      Some("a  b"), // "a", " b" (second space unabsorbed, not a token) -> 2
      Some(""), None).toDF("text")
      .select(bpeTokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(2, 5, 2, 0, 0))
  }

  test("shingles: ordered 3-grams, distinct, short docs empty") {
    val got = one("a b c d c d").select(shingles(col("text")).as("s"))
      .collect().head.getSeq[String](0)
    assert(got.toSet === Set("a b c", "b c d", "c d c", "d c d"))
    assert(one("a b").select(shingles(col("text"))).collect().head.getSeq[String](0).isEmpty)
  }

  test("quality signals on a mixed string") {
    val row = one("Hello, World 42!").select(
      qualitySignals(col("text")).map { case (n, c) => c.as(n) }: _*).collect().head
    assert(row.getAs[Int]("n_chars_calc") === 16)
    assert(row.getAs[Int]("n_tokens") === 3)
    assert(row.getAs[Double]("punct_ratio") === 2.0 / 16) // ',' and '!'
    assert(row.getAs[Double]("digit_ratio") === 2.0 / 16)
    assert(row.getAs[Double]("upper_ratio") === 2.0 / 16)
  }

  test("langId picks marker-heavy language; und when no markers") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog of the house is big",
      "der hund und die katze ist gross und der baum",
      "xyzzy qwerty asdf").toDF("text").select(langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("en", "de", "und"))
  }

  test("fingerprint normalizes whitespace and case") {
    import spark.implicits._
    val df = Seq("Hello   World", "hello world ", " HELLO\tWORLD").toDF("text")
      .select(fingerprint(col("text")).as("f"))
    assert(df.collect().map(_.getString(0)).distinct.length === 1)
  }

  test("rollingHash is order-sensitive and deterministic") {
    import spark.implicits._
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(rollingHash(col("text")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) !== hs(1))
    assert(hs(0) === hs(2))
  }

  test("cleaned: lowercase, punct stripped, whitespace collapsed") {
    import spark.implicits._
    val got = Seq("  Hello,   WORLD!! x-1 ").toDF("text")
      .select(cleaned(col("text"))).collect().head.getString(0)
    assert(got === "hello world x 1")
  }

  test("analyze attaches all columns to the documents fixture") {
    val df = TextAnalysis.analyze(spark.read.parquet(s"${sf()}/documents.parquet"))
    assert(Seq("n_tokens", "punct_ratio", "lang_pred", "fingerprint")
      .forall(df.columns.contains))
    assert(df.count() === 500)
  }
  test("piiRedacted: emails, IPs, phones replaced; clean text untouched") {
    import spark.implicits._
    val got = Seq(
      "mail bob.smith+x@corp.example.com now",
      "server at 192.168.001.7 port 80",
      "call +1 555-010-1234 today",
      "three 1.2 dots or v1.2.3 are not an ip",
      "plain text stays as is"
    ).toDF("text").select(piiRedacted(col("text"))).collect().map(_.getString(0))
    assert(got(0) === "mail <EMAIL> now")
    assert(got(1) === "server at <IP> port 80")
    assert(got(2) === "call <PHONE> today")
    assert(got(3) === "three 1.2 dots or v1.2.3 are not an ip")
    assert(got(4) === "plain text stays as is")
  }

  test("c4LineClean: line rules rewrite the page, page rules are independent") {
    import spark.implicits._
    val pages = Seq(
      // 3 good lines -> survives; short/unterminated/js lines drop
      (0L, "One good line with five words here.\nshort.\nno terminal punct line words\n" +
        "Please enable JavaScript to proceed now.\nSecond good line with enough words too!\n" +
        "Third  good line with  double spaces inside?"),
      // only 2 good lines -> keep_page false, cleaned text still emitted
      (1L, "One good line with five words here.\nSecond good line with enough words too!"),
      // lorem ipsum kills the page even though its line passes
      (2L, "One good line with five words here.\nSecond good line with enough words too!\n" +
        "Third good line with enough words here.\nlorem ipsum dolor sit amet filler text."),
      // a brace anywhere kills the page
      (3L, "One good line with five words here.\nSecond good line with enough words too!\n" +
        "Third good line { braces } with words here."),
      // quote counts as terminal punctuation
      (4L, "He said the quoted words end like this \"\nSecond good line with enough words too!\n" +
        "Third good line with enough words here.\nFourth good line with enough words again."),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.c4LineClean(pages).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4))))
      .toMap
    assert(got(0L) === (("One good line with five words here.\n" +
      "Second good line with enough words too!\n" +
      "Third good line with double spaces inside?", 3, 3, true)))
    assert(got(1L)._2 === 2 && !got(1L)._4)
    assert(got(2L)._2 === 4 && !got(2L)._4) // lorem line KEPT, page dropped
    assert(got(3L)._2 === 3 && !got(3L)._4) // brace line kept, page dropped
    assert(got(4L)._2 === 4 && got(4L)._4)  // quote-terminated line kept
    assert(got(5L) === (("", 0, 0, false))) // null text surfaces
  }

  test("piiRedacted: phone pattern is recall-biased BY CONTRACT — ISBN/order-id shapes redact too") {
    import spark.implicits._
    // pinned trade: a missed phone is a privacy leak, a redacted ISBN
    // is a lost token — long dashed/spaced digit runs all redact
    val got = Seq(
      "ISBN 978-0-306-40615-7 in print",   // 13 digits, dashed
      "order 2024-000187-55 shipped",      // dashed order id
      "population 20 000 000 people",      // space-grouped number
      "short id 12-34 stays",              // under the 9-char floor
      "year 20240101 stays"                // 8 plain digits: no dash/space run
    ).toDF("text").select(piiRedacted(col("text"))).collect().map(_.getString(0))
    assert(got(0) === "ISBN <PHONE> in print")
    assert(got(1) === "order <PHONE> shipped")
    assert(got(2) === "population <PHONE> people")
    assert(got(3) === "short id 12-34 stays")
    assert(got(4) === "year 20240101 stays")
  }

  test("repetitionSignals: duplicate token/bigram/trigram fractions") {
    import spark.implicits._
    val df = Seq("spam spam spam spam", "all words here differ now", "")
      .toDF("text")
    val out = df.select(repetitionSignals(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()
    assert(out(0).getDouble(0) === 0.75) // 4 tokens, 1 distinct
    assert(out(0).getDouble(1) === 2.0 / 3) // 3 bigrams, 1 distinct
    assert(out(1).getDouble(0) === 0.0 && out(1).getDouble(2) === 0.0)
    assert(out(2).getDouble(0) === 0.0) // empty text -> all zero
  }

  test("vocabStats: hand-counted tokens, types, hapax, exact TTR") {
    import spark.implicits._
    val docs = Seq(
      ("en", "The cat sat the CAT"),      // tokens: the,cat,sat,the,cat
      ("en", "dog"),                      // +1 token, new type, hapax
      ("de", "eins zwei zwei"),
      ("de", null.asInstanceOf[String])   // null text drops
    ).toDF("lang", "text")
    val got = TextAnalysis.vocabStats(docs, "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en: 6 tokens {the:2, cat:2, sat:1, dog:1} -> 4 types, 2 hapax
    assert(got("en") === ((6L, 4L, 2L, 666666L)))
    // de: 3 tokens {eins:1, zwei:2} -> 2 types, 1 hapax
    assert(got("de") === ((3L, 2L, 1L, 666666L)))
  }

  test("stripHtml: blocks drop wholesale, tags separate, entities single-decode") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // script/style content never leaks, even with operators inside
      (1L, "<p>keep</p><script>if (a < b && c > d) { run(); }</script><i>tail</i>",
        "keep tail"),
      (2L, "<style>p { color: red; }</style>body", "body"),
      // comments drop; tags become separators (no word gluing)
      (3L, "<!-- hidden -->a<b>b</b>c", "a b c"),
      // single-decode: &amp;lt; is the LITERAL string "&lt;" after one pass
      (4L, "x &amp;lt; y &lt; z &quot;q&quot; &#39;s&#39; &nbsp;.", "x &lt; y < z \"q\" 's' ."),
      // multiline block with attributes
      (5L, "<script type=\"text/javascript\">\nvar a = 1;\n</script>after", "after"),
      // whitespace collapse + trim
      (6L, "  <br/>  spaced   out  ", "spaced out"),
      // numeric references: decimal, hex, Latin-1, supplementary plane
      (7L, "It&#8217;s caf&#xE9; A&#x1F600;B", "It’s café A😀B"),
      // single-decode traps in BOTH directions: &#38;lt; encodes the
      // literal "&lt;", &amp;#60; encodes the literal "&#60;"
      (8L, "&#38;lt; &amp;#60; &#38;amp;", "&lt; &#60; &amp;"),
      // passthrough family: zero, surrogate (dec + hex), out-of-range,
      // overlong digit run, empty, unterminated
      (9L, "&#0; &#55296; &#xD800; &#x110000; &#12345678; &#x; &#; &#38",
        "&#0; &#55296; &#xD800; &#x110000; &#12345678; &#x; &#; &#38"),
      // apos joins the named set
      (10L, "&apos;a&apos; &gt;&lt;", "'a' ><"))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "html")
      .select(col("id"), TextAnalysis.stripHtml(col("html")).as("c"))
      .orderBy("id").collect().map(_.getString(1))
    cases.zip(got).foreach { case ((i, in, want), g) =>
      assert(g === want, s"case $i: <$in>")
    }
  }

  test("readability: hand-computed Flesch pieces") {
    import spark.implicits._
    val df = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 w, 2 s, 6 syll
      (2L, "tsk tsk"),                   // vowel-less words get 1 syllable each
      (3L, "sky!"),                      // y is a vowel
      (4L, ""),                          // empty: zero counts, NULL score
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = readability(df).orderBy("doc_id").collect()
      .map(r => (Option(r.getAs[Any]("n_words")),
        Option(r.getAs[Any]("n_sentences")),
        Option(r.getAs[Any]("n_syllables")),
        Option(r.getAs[Any]("flesch_micro"))))
    // doc 1: 206835000 - (1015000*6)//2 - (84600000*6)//6
    assert(got(0) === ((Some(6L), Some(2L), Some(6L), Some(119190000L))))
    // doc 2: 0 vowel groups + 2 vowel-less words; 1-sentence fallback
    assert(got(1) === ((Some(2L), Some(0L), Some(2L), Some(120205000L))))
    assert(got(2) === ((Some(1L), Some(1L), Some(1L),
      Some(206835000L - 1015000L - 84600000L))))
    assert(got(3) === ((Some(0L), Some(0L), Some(0L), None)))
    assert(got(4) === ((None, None, None, None)))
  }
}
