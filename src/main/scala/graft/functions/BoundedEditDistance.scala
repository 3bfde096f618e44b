package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-bounded character Levenshtein (Ukkonen 1985 banded DP):
  * the EXACT distance when it is ≤ `maxDist`, else the sentinel
  * `maxDist + 1` — computed over only the |i−j| ≤ maxDist diagonal
  * band, O(maxDist·L) time instead of the full O(L²) table, with an
  * early exit as soon as a whole band row exceeds the threshold.
  * Cells within distance ≤ maxDist can never depend on cells outside
  * the band (leaving it costs one edit per diagonal step), so the
  * banded value is exact below the threshold.
  *
  * This is the verify kernel for similarity joins
  * ([[graft.ext.Dedup.editDistanceJoin]]): candidates only need
  * "distance, if ≤ τ" — paying the full quadratic DP per candidate
  * (the builtin `levenshtein`) wastes (L/(2τ+1))× the work, ~4.6× at
  * the join's 32-char/τ=3 defaults, and more at longer keys. */
case class BoundedEditDistance(left: Expression, right: Expression,
    maxDist: Int) extends BinaryExpression with CodegenFallback {
  require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bounded_edit_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s0 = a.asInstanceOf[UTF8String].toString
    val t0 = b.asInstanceOf[UTF8String].toString
    // iterate the longer side outer, band over the shorter
    val (s, t) = if (s0.length >= t0.length) (s0, t0) else (t0, s0)
    val n = s.length; val m = t.length
    val inf = maxDist + 1
    if (n - m > maxDist) return inf
    if (m == 0) return n // n <= maxDist here
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= maxDist) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - maxDist)
      val hi = math.min(m, i + maxDist)
      cur(lo - 1) = if (i - (lo - 1) <= maxDist && lo - 1 == 0) i else inf
      var rowMin = cur(lo - 1)
      val c = s.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (t.charAt(j - 1) == c) 0 else 1)
        val del = if (prev(j) < inf) prev(j) + 1 else inf
        val ins = if (cur(j - 1) < inf) cur(j - 1) + 1 else inf
        val v = math.min(inf, math.min(sub, math.min(del, ins)))
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf // seal the band's right edge
      if (rowMin >= inf) return inf // every surviving path already > maxDist
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), inf)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
