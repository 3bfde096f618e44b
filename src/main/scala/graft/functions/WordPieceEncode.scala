package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece segmentation with a vocabulary
  * (graft.ext.WordPieceTrainer): per whitespace-pretokenized word, the
  * BERT-standard greedy longest-match-first scan — take the LONGEST
  * vocabulary piece prefixing the remainder (continuations carry the
  * "##" prefix), advance, repeat; if any position matches nothing, or
  * the word exceeds `maxWordLen`, the WHOLE word becomes `unk` and
  * partial tokens are discarded (the WordpieceTokenizer contract).
  *
  * The vocabulary rides the expression as a constructor param
  * (vocab-count entries — KBs). Native expression (CodegenFallback):
  * the per-word scan is bounded by word length × longest piece; no UDF
  * serialization. Locale.ROOT lowercase matches the trainer's
  * locale-independent lower() (tr_TR-proof, like BpeEncode). */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
    unk: String, maxWordLen: Int, lowercase: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val pieces: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
  // longest BODY length (## stripped) bounds the match scan
  @transient private lazy val maxBodyLen: Int =
    if (vocab.isEmpty) 0
    else vocab.iterator.map(p => p.stripPrefix("##").length).max

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  /** Greedy longest-match tokens for one word, or None → [UNK]. */
  private def encodeWord(word: String): Option[Seq[String]] = {
    if (word.length > maxWordLen) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var len = math.min(maxBodyLen, word.length - pos)
      var hit: String = null
      while (hit == null && len >= 1) {
        val body = word.substring(pos, pos + len)
        val cand = if (pos == 0) body else "##" + body
        if (pieces.contains(cand)) hit = cand
        len -= 1
      }
      if (hit == null) return None
      out += hit
      pos += hit.stripPrefix("##").length
    }
    Some(out.toSeq)
  }

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString.trim
    val text = if (lowercase) raw.toLowerCase(java.util.Locale.ROOT) else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.split(graft.ext.TextAnalysis.WhitespaceClass).foreach { w =>
      if (w.nonEmpty) encodeWord(w) match {
        case Some(toks) => toks.foreach(t => out += UTF8String.fromString(t))
        case None => out += UTF8String.fromString(unk)
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
