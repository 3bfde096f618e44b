package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation with a TRAINED merge table (graft.ext.BpeTrainer):
  * per whitespace-pretokenized word, repeatedly merge the present
  * adjacent pair with the LOWEST merge rank (all its occurrences, left
  * to right) until no trainable pair remains — the standard GPT-2-style
  * greedy encode, so encode(train-corpus) reproduces the trainer's
  * final symbol state. The merge table rides the expression as a
  * constructor param: rank-count entries (hundreds — KBs, nowhere near
  * the plan-literal sizes the Bloom join rework banned).
  *
  * Native expression (CodegenFallback): the per-word loop is bounded by
  * word length × matched merges; no UDF serialization, no Python. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  private def encodeWord(word: String, out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length >= 2) {
      // lowest-rank pair present in the word
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val nb = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            nb += (a + b); j += 2
          } else { nb += syms(j); j += 1 }
        }
        syms = nb.result()
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  override def nullSafeEval(input: Any): Any = {
    // Locale.ROOT matches Spark's locale-independent lower() used at
    // training time (default-locale toLowerCase diverges under tr_TR)
    val text = input.asInstanceOf[UTF8String].toString.trim
      .toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.split(graft.ext.TextAnalysis.WhitespaceClass).foreach(w => if (w.nonEmpty) encodeWord(w, out))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
