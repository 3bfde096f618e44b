package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Classic Porter stemming algorithm (Porter 1980, "An algorithm for
  * suffix stripping", public specification) as a native Catalyst
  * expression — the canonical token normalizer for index/term-frequency
  * pipelines (reference semantics: the reference app tokenizes raw
  * strings only; this is the §2.5 text-analysis extension surface).
  *
  * Implemented from the published rule list: measure m counted on the
  * [C](VC)^m[V] form, steps 1a/1b/1c/2/3/4/5a/5b. ASCII lowercase input
  * expected (callers lower() first); non-alpha tokens pass through
  * unchanged. Null-safe unary expression; per-row cost is bounded by
  * word length, no allocation beyond the output buffer.
  */
object PorterStem {

  @inline private def isVowelAt(w: Array[Char], i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** measure of w[0..end) — the number of VC transitions */
  private def measure(w: Array[Char], end: Int): Int = {
    var m = 0; var i = 0
    while (i < end && !isVowelAt(w, i)) i += 1 // leading consonants
    while (i < end) {
      while (i < end && isVowelAt(w, i)) i += 1 // vowel run
      if (i < end) { m += 1; while (i < end && !isVowelAt(w, i)) i += 1 }
    }
    m
  }

  private def hasVowel(w: Array[Char], end: Int): Boolean = {
    var i = 0
    while (i < end) { if (isVowelAt(w, i)) return true; i += 1 }
    false
  }

  private def endsDoubleC(w: Array[Char], end: Int): Boolean =
    end >= 2 && w(end - 1) == w(end - 2) && !isVowelAt(w, end - 1)

  /** *o: stem ends cvc where the final c is not w, x or y */
  private def endsCvc(w: Array[Char], end: Int): Boolean =
    end >= 3 && !isVowelAt(w, end - 3) && isVowelAt(w, end - 2) &&
      !isVowelAt(w, end - 1) &&
      w(end - 1) != 'w' && w(end - 1) != 'x' && w(end - 1) != 'y'

  private def endsWith(w: Array[Char], end: Int, s: String): Boolean = {
    val n = s.length
    if (end < n) return false
    var i = 0
    while (i < n) { if (w(end - n + i) != s.charAt(i)) return false; i += 1 }
    true
  }

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word // non-lowercase-alpha: pass through
      i += 1
    }
    val w = new Array[Char](word.length + 1)
    word.getChars(0, word.length, w, 0)
    var end = word.length

    // helper closures over (w, end)
    def ew(s: String) = endsWith(w, end, s)
    def setSuffix(keep: Int, s: String): Unit = {
      var j = 0
      while (j < s.length) { w(end - keep + j) = s.charAt(j); j += 1 }
      end = end - keep + s.length
    }

    // Step 1a
    if (ew("sses")) end -= 2
    else if (ew("ies")) end -= 2
    else if (!ew("ss") && ew("s")) end -= 1

    // Step 1b
    var extraE = false
    if (ew("eed")) { if (measure(w, end - 3) > 0) end -= 1 }
    else if (ew("ed") && hasVowel(w, end - 2)) { end -= 2; extraE = true }
    else if (ew("ing") && hasVowel(w, end - 3)) { end -= 3; extraE = true }
    if (extraE) {
      if (ew("at") || ew("bl") || ew("iz")) { w(end) = 'e'; end += 1 }
      else if (endsDoubleC(w, end) && !ew("l") && !ew("s") && !ew("z")) end -= 1
      else if (measure(w, end) == 1 && endsCvc(w, end)) { w(end) = 'e'; end += 1 }
    }

    // Step 1c
    if (ew("y") && hasVowel(w, end - 1)) w(end - 1) = 'i'

    // Steps 2-4: (suffix, replacement, minMeasure) rule tables
    def rules(table: Seq[(String, String)], minM: Int): Unit = {
      var applied = false
      var k = 0
      while (!applied && k < table.length) {
        val (suf, rep) = table(k)
        if (ew(suf)) {
          applied = true // longest-match tables are ordered; one rule max
          if (measure(w, end - suf.length) > minM - 1) setSuffix(suf.length, rep)
        }
        k += 1
      }
    }
    rules(Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous",
      // longest-first within the o-group: ization before ation before ator
      "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"),
      minM = 1)
    rules(Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""),
      minM = 1)
    // Step 4: drop suffix entirely when m > 1; "ion" needs preceding s/t
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize")
    var applied4 = false
    var k4 = 0
    while (!applied4 && k4 < step4.length) {
      val suf = step4(k4)
      if (ew(suf)) {
        applied4 = true
        val stemEnd = end - suf.length
        val okIon = suf != "ion" ||
          (stemEnd >= 1 && (w(stemEnd - 1) == 's' || w(stemEnd - 1) == 't'))
        if (okIon && measure(w, stemEnd) > 1) end = stemEnd
      }
      k4 += 1
    }

    // Step 5a
    if (ew("e")) {
      val m = measure(w, end - 1)
      if (m > 1 || (m == 1 && !endsCvc(w, end - 1))) end -= 1
    }
    // Step 5b
    if (ew("ll") && measure(w, end) > 1) end -= 1

    new String(w, 0, end)
  }
}

/** `porter_stem(token)` — null-safe native expression over UTF8String. */
case class PorterStemExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PorterStem.stem(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
