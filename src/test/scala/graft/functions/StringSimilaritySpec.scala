package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class StringSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinkler(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
  private def j(a: String, b: String): Double =
    StringSimilarity.jaro(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("pinned values match DuckDB's jaro_winkler_similarity battery") {
    // values read directly from DuckDB (17 significant digits)
    assert(math.abs(j("MARTHA", "MARHTA") - 0.94444444444444453) < 1e-15)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.96111111111111114) < 1e-15)
    assert(math.abs(j("DIXON", "DICKSONX") - 0.76666666666666661) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.81333333333333324) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    // odd mismatch count: transpositions FLOOR, not exact halving
    assert(math.abs(j("hot gear", "small gizmo") - 0.43813131313131315) < 1e-12)
    // boost only above 0.7: common prefix but low jaro stays unboosted
    assert(j("abcdef", "abxxxx") === jw("abcdef", "abxxxx"))
    // prefix capped at 4
    assert(math.abs(jw("hello world", "hello wrld") - 0.98181818181818181) < 1e-15)
  }

  test("edge semantics: empties, identical, no matches") {
    assert(jw("", "") === 0.0) // DuckDB convention: empty -> 0, even both
    assert(jw("", "a") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("ab", "ba") === 0.0) // window 0 allows no cross-position match
    assert(jw("a", "b") === 0.0)
  }

  test("operates on UTF-8 bytes, not codepoints (DuckDB parity)") {
    // DuckDB: jaro('héllò','héllo') = 0.8492063492063492 — the 7- and
    // 6-BYTE sequences; codepoint-wise it would be (0.8+0.8+1)/3 = 0.8667
    assert(math.abs(j("héllò", "héllo") - 0.8492063492063492) < 1e-15)
  }

  test("column API and SQL registration") {
    val df = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
    val viaCol = df.select(strsim.jaro_winkler(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(viaCol - 0.96111111111111114) < 1e-15)
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("jw_in")
    val viaSql = spark.sql(
      "SELECT jaro_winkler(a, b) AS s, jaro_similarity(a, b) AS js FROM jw_in").head
    assert(math.abs(viaSql.getDouble(0) - 0.96111111111111114) < 1e-15)
    assert(math.abs(viaSql.getDouble(1) - 0.94444444444444453) < 1e-15)
  }

  test("null inputs yield null, not a crash") {
    val df = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    assert(df.select(strsim.jaro_winkler(col("a"), col("b"))).head.isNullAt(0))
  }

  private def dl(a: String, b: String): Int =
    StringSimilarity.damerauLevenshtein(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("Damerau-Levenshtein pinned against DuckDB's damerau_levenshtein") {
    // CA/ABC=2 is the UNRESTRICTED signature (OSA says 3); héllo/hello=2
    // pins the byte (not codepoint) unit
    val vectors = Seq(
      ("CA", "ABC") -> 2, ("ab", "ba") -> 1, ("kitten", "sitting") -> 3,
      ("abc", "abc") -> 0, ("", "xyz") -> 3, ("xyz", "") -> 3,
      ("abcdef", "badcfe") -> 3, ("an act", "a cat") -> 2,
      ("Green Spark", "Spark Green") -> 10, ("héllo", "hello") -> 2,
      ("totally", "different") -> 9)
    vectors.foreach { case ((a, b), want) =>
      assert(dl(a, b) == want, s"dl($a, $b)")
      assert(dl(b, a) == want, s"dl($b, $a) symmetry")
    }
  }

  test("Damerau-Levenshtein via Column API and SQL registration") {
    val df = Seq(("CA", "ABC")).toDF("a", "b")
    assert(df.select(strsim.damerau_levenshtein(col("a"), col("b"))).head.getInt(0) == 2)
    graft.GraftExtensions.register(spark)
    df.createOrReplaceTempView("dl_in")
    assert(spark.sql("SELECT damerau_levenshtein(a, b) AS d FROM dl_in").head.getInt(0) == 2)
  }
}
