package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Length of the longest common subsequence of two string arrays — the
  * ROUGE-L core (Lin 2004): unlike ROUGE-N's fixed-width grams, LCS
  * rewards in-order token overlap at any gap, so it catches sentence-
  * level structure agreement. Classic two-row DP: O(|a|·|b|) time per
  * row, O(min(|a|, |b|)) space — per-document cost is quadratic in
  * token count, so cap pathological documents upstream (the usual
  * page-length filters already bound this); the operator itself is
  * embarrassingly parallel, no state beyond the two input rows.
  *
  * Native expression (CodegenFallback): no UDF serialization; exact
  * integer output, so downstream P/R/F1 stay integer ratios. */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_length"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    // iterate the longer side outer, keep the DP row on the shorter
    val (nOuter, nInner, outer, inner) =
      if (xs.numElements() >= ys.numElements())
        (xs.numElements(), ys.numElements(), xs, ys)
      else (ys.numElements(), xs.numElements(), ys, xs)
    if (nInner == 0) return 0
    val innerToks = new Array[String](nInner)
    var i = 0
    while (i < nInner) {
      innerToks(i) = inner.getUTF8String(i).toString; i += 1
    }
    var prev = new Array[Int](nInner + 1)
    var cur = new Array[Int](nInner + 1)
    var o = 0
    while (o < nOuter) {
      val tok = outer.getUTF8String(o).toString
      var j = 0
      while (j < nInner) {
        cur(j + 1) =
          if (innerToks(j) == tok) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      o += 1
    }
    prev(nInner)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
