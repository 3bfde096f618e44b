package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Rank-bucket of a value against SORTED ascending `boundaries`: the
  * number of boundaries `b` with `value >= b`, i.e. the index of the
  * bucket the value falls in ([0, boundaries.length]). Semantically
  * identical to `cardinality(filter(lit(boundaries), b => v >= b))` —
  * the ZOrder bucketing primitive — but a binary search instead of the
  * higher-order filter's O(|boundaries|) interpreted scan per row
  * (measured: the 256-boundary filter was 77M comparisons over the
  * sf0.1 orders scan, the single hot stage of the z-order write).
  *
  * A null value returns 0, matching the filter form (a null predicate
  * drops every element, cardinality 0 — not NULL); NaN returns
  * boundaries.length (Spark numeric ordering places NaN greatest, so
  * `NaN >= b` is TRUE for every boundary). */
case class SortedBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with CodegenFallback {

  require(boundaries.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
    "SortedBucket boundaries must be sorted ascending")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_bucket"
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val x = v.asInstanceOf[Double]
    if (x.isNaN) return boundaries.length
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
