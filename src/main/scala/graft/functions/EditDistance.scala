package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Token-level Levenshtein distance of two string arrays — the WER
  * core (substitutions + insertions + deletions, all unit cost): the
  * standard ASR/generation transcript metric, and [[LcsLength]]'s
  * edit-model sibling (LCS allows only insert/delete; Levenshtein adds
  * substitution). Two-row DP, O(|a|·|b|) time per pair over
  * O(min(|a|,|b|)) space — quadratic in token count, so run it AFTER
  * the page-length filters; embarrassingly parallel otherwise.
  *
  * Spark's builtin `levenshtein` is CHARACTER-level on strings; this
  * is token-level on arrays (the WER definition — "cat" vs "bat" is
  * ONE substitution at word grain, not one char edit among three).
  *
  * Native expression (CodegenFallback): no UDF serialization; exact
  * integer output, so WER stays an integer ratio downstream. */
case class EditDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "edit_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    // iterate the longer side outer, keep the DP row on the shorter
    val (nOuter, nInner, outer, inner) =
      if (xs.numElements() >= ys.numElements())
        (xs.numElements(), ys.numElements(), xs, ys)
      else (ys.numElements(), xs.numElements(), ys, xs)
    if (nInner == 0) return nOuter
    val innerToks = new Array[String](nInner)
    var i = 0
    while (i < nInner) {
      innerToks(i) = inner.getUTF8String(i).toString; i += 1
    }
    var prev = new Array[Int](nInner + 1)
    var cur = new Array[Int](nInner + 1)
    var j = 0
    while (j <= nInner) { prev(j) = j; j += 1 }
    var o = 0
    while (o < nOuter) {
      val tok = outer.getUTF8String(o).toString
      cur(0) = o + 1
      var k = 0
      while (k < nInner) {
        val sub = prev(k) + (if (innerToks(k) == tok) 0 else 1)
        val del = prev(k + 1) + 1
        val ins = cur(k) + 1
        cur(k + 1) = math.min(sub, math.min(del, ins))
        k += 1
      }
      val t = prev; prev = cur; cur = t
      o += 1
    }
    prev(nInner)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
