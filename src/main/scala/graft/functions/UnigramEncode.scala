package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM segmentation with a TRAINED vocabulary
  * (graft.ext.UnigramTrainer): per whitespace-pretokenized word, the
  * Viterbi segmentation maximizing the summed integer-nano piece
  * scores — the SentencePiece decode-time algorithm (Kudo 2018), so
  * encode(train-corpus) reproduces the trainer's final segmentation
  * exactly (same shared Viterbi, same tie rule: longer piece wins an
  * equal-score boundary). Characters outside the vocabulary take the
  * trainer's documented floor score and pass through as singletons.
  *
  * The vocabulary rides the expression as a constructor param
  * (vocab-count entries — KBs). Native expression (CodegenFallback):
  * bounded per-word DP, no UDF serialization. */
case class UnigramEncode(child: Expression, vocab: Seq[(String, Long)],
    maxPieceLen: Int, lowercase: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  // java.lang.Long values: a primitive-Long map would unbox a missing
  // key's null to score 0 (see UnigramTrainer.scoreMap)
  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
    vocab.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString.trim
    // case handling must MATCH the trainer's flag: lowercasing a
    // case-sensitive vocabulary would silently drop every capitalized
    // piece to the FloorNano char fallback. Locale.ROOT matches
    // Spark's locale-independent lower() — the default-locale form
    // maps 'I' to dotless 'ı' under tr_TR and diverges from training.
    val text = if (lowercase) raw.toLowerCase(java.util.Locale.ROOT) else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.split(graft.ext.TextAnalysis.WhitespaceClass).foreach { w =>
      if (w.nonEmpty)
        graft.ext.UnigramTrainer.viterbiSegment(w, scores, maxPieceLen)
          .foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
