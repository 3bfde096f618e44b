package graft.functions

import graft.SparkTestBase

class UnicodeNormalizeSpec extends SparkTestBase {

  private val composed = "caf\u00e9"    // café, precomposed U+00E9
  private val decomposed = "cafe\u0301" // cafe + combining acute U+0301

  test("nfc: combining sequences compose; composed and ASCII pass through") {
    assert(UnicodeNorm.nfc(decomposed) === composed)
    assert(UnicodeNorm.nfc(composed) === composed)
    assert(UnicodeNorm.nfc("plain ascii 123") === "plain ascii 123")
    assert(UnicodeNorm.nfc("A\u030a") === "\u00c5") // A + ring = A-ring
  }

  test("stripAccents: composed, decomposed, and multi-mark forms all strip") {
    assert(UnicodeNorm.stripAccents(composed) === "cafe")
    assert(UnicodeNorm.stripAccents(decomposed) === "cafe")
    // ß (U+00DF) is a LETTER, not a mark: it must survive stripping
    assert(UnicodeNorm.stripAccents("\u00c4pfel \u00fcber stra\u00dfe")
      === "Apfel uber stra\u00dfe")
    // stacked marks: o + circumflex + acute -> o; n + tilde -> n
    assert(UnicodeNorm.stripAccents("n\u0303 o\u0302\u0301") === "n o")
    // no canonical decomposition -> pass through (DuckDB-compatible)
    assert(UnicodeNorm.stripAccents("\u0153uf") === "\u0153uf") // œuf
    assert(UnicodeNorm.stripAccents("ascii only") === "ascii only")
  }

  test("column expressions: null-safe, equal forms unify after nfc") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, composed), (2L, decomposed), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), textnorm.nfc_normalize(col("t")).as("n"),
        textnorm.strip_accents(col("t")).as("s"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows(0)._2 === rows(1)._2, "NFC must unify composed/decomposed twins")
    assert(rows(0)._2 === composed)
    assert(rows(0)._3 === "cafe" && rows(1)._3 === "cafe")
    assert(rows(2)._2 === null && rows(2)._3 === null)
  }
}
