package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler string similarity.
  *
  * Semantics are the textbook definition (Jaro 1989; Winkler 1990),
  * pinned cross-engine against DuckDB's `jaro_winkler_similarity` in the
  * oracle battery:
  *  - computed over RAW UTF-8 BYTES, not codepoints (verified
  *    empirically: DuckDB scores 'héllò' vs 'héllo' as 7- and 6-byte
  *    sequences) — which also makes the single pass allocation-free on
  *    Spark's UTF8String representation;
  *  - either side empty → 0.0 (including both empty);
  *  - match window = max(|a|,|b|)/2 - 1, floored at 0;
  *  - transpositions t = matched positions whose partners disagree,
  *    contributing (m - t/2) / m;
  *  - Winkler prefix boost ONLY when jaro > 0.7: common byte prefix
  *    capped at 4, scale 0.1.
  *
  * Reference semantics: fuzzy candidate scoring at 100 TB happens inside
  * a blocked/bucketed candidate join (see Curation.fuzzyJoin) — this
  * expression is the per-pair verifier/scorer, one O(|a|·window) pass,
  * no UDF boxing, usable from SQL as graft_jaro_winkler.
  */
private[graft] object StringSimilarity {

  /** Jaro–Winkler similarity over UTF-8 bytes, in [0, 1]. */
  def jaroWinkler(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(a.length, b.length))
    while (l < maxL && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Plain Jaro similarity over UTF-8 bytes, in [0, 1]. */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mism = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) mism += 1
        k += 1
      }
      i += 1
    }
    // transpositions = FLOOR(mismatched positions / 2) — integer, not
    // mism/2.0: pinned against DuckDB ('hot gear'/'small gizmo' has 3
    // mismatched matches -> t=1, giving 0.438131; exact halving gives
    // 0.382576 and diverges on every odd-mismatch pair)
    val t = mism / 2
    val md = m.toDouble
    (md / la + md / lb + (md - t) / md) / 3.0
  }

  /** FULL (unrestricted) Damerau–Levenshtein distance over UTF-8 bytes —
    * Lowrance–Wagner 1975, the variant where a transposed pair may also
    * have edits between its two characters ('CA'->'ABC' = 2, where the
    * restricted/OSA variant says 3). Pinned against DuckDB's
    * `damerau_levenshtein`, which is byte-based and unrestricted
    * (verified: 'CA'/'ABC' -> 2, 'héllo'/'hello' -> 2 = two byte edits).
    * The `da` last-occurrence table is 256-wide because the unit is a
    * byte, never a codepoint. O(|a|·|b|) time and space. */
  def damerauLevenshtein(a: Array[Byte], b: Array[Byte]): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xff)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val subst = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(subst, ins), math.min(del, trans))
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

/** double Jaro–Winkler similarity of two string columns. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override def nullSafeEval(l: Any, r: Any): Any =
    StringSimilarity.jaroWinkler(
      l.asInstanceOf[UTF8String].getBytes, r.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** double plain-Jaro similarity of two string columns. */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"
  override def nullSafeEval(l: Any, r: Any): Any =
    StringSimilarity.jaro(
      l.asInstanceOf[UTF8String].getBytes, r.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** int full Damerau–Levenshtein distance of two string columns. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override def nullSafeEval(l: Any, r: Any): Any =
    StringSimilarity.damerauLevenshtein(
      l.asInstanceOf[UTF8String].getBytes, r.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object strsim {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))
  def jaro(a: Column, b: Column): Column =
    column(JaroSimilarity(expression(a), expression(b)))
  def damerau_levenshtein(a: Column, b: Column): Column =
    column(DamerauLevenshtein(expression(a), expression(b)))
}
