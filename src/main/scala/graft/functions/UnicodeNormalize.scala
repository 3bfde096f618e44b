package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for corpus cleaning — the normalization
  * pass every multilingual training-data pipeline runs before
  * tokenizing, deduplicating, or fingerprinting: the same user-visible
  * text can arrive as precomposed code points ("é" U+00E9) or as
  * base + combining marks ("e" U+0065 + U+0301), and every downstream
  * exact operator (shingle hashes, MinHash, exact dedup, BPE) treats
  * those byte sequences as DIFFERENT documents unless they are
  * canonicalized first.
  *
  * Two native expressions (reference scope: the reference app never
  * normalizes — §2.5 text-analysis extension surface):
  *
  *  - `nfc_normalize`: Unicode Normalization Form C per the published
  *    UAX #15 algorithm (canonical decomposition + canonical
  *    composition), via the JDK's `java.text.Normalizer`.
  *  - `strip_accents`: canonical decomposition (NFD), removal of
  *    combining marks (general categories Mn/Mc/Me), recomposition to
  *    NFC — "café" → "cafe", "Äpfel" → "Apfel"; characters with no
  *    canonical decomposition (ligatures like "œ") pass through, the
  *    behavior DuckDB's `strip_accents` shares on the Latin range the
  *    driver oracle exercises.
  *
  * Both are null-safe unary string expressions; ASCII-only strings
  * short-circuit (one scan, no allocation) — the overwhelmingly common
  * case in a large crawl, so the normalization pass costs one byte
  * scan per already-clean document. */
object UnicodeNorm {

  @inline private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  def nfc(s: String): String =
    if (isAscii(s)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  def stripAccents(s: String): String = {
    if (isAscii(s)) return s
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.append(c)
      i += 1
    }
    java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
  }
}

case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNorm.nfc(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object textnorm {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def nfc_normalize(text: Column): Column = column(NfcNormalizeExpr(expression(text)))
  def strip_accents(text: Column): Column = column(StripAccentsExpr(expression(text)))
}
