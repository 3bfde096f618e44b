package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All DISTINCT strings reachable from the input by deleting up to
  * `maxDeletes` characters (the input itself included, as the
  * zero-deletion variant) — the SymSpell key set (Garbe 2012): two
  * strings within Levenshtein distance τ always share a variant
  * reachable by ≤ τ deletions from EACH side (an optimal edit script's
  * untouched positions form a common subsequence; each of the ≤ τ ops
  * costs at most one deletion per side to reach it), so a fuzzy match
  * becomes an EQUI-join on precomputed variants — no distance
  * computation until the bounded verify.
  *
  * Output is sorted (deterministic across partitionings); size is
  * O(Σ_{d≤maxDeletes} C(L,d)) — bounded for the short-token use this
  * exists for, and the reason SymSpell bounds τ at 2.
  *
  * Native expression (CodegenFallback like [[EditDistance]]): no UDF
  * serialization; BFS over the deletion lattice with a set dedupe. */
case class DeletionVariants(child: Expression, maxDeletes: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxDeletes >= 1, s"maxDeletes must be >= 1: $maxDeletes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "deletion_variants"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val all = scala.collection.mutable.LinkedHashSet(s)
    var frontier: Set[String] = Set(s)
    var d = 0
    while (d < maxDeletes && frontier.nonEmpty) {
      val next = scala.collection.mutable.Set.empty[String]
      frontier.foreach { v =>
        var i = 0
        while (i < v.length) {
          val del = v.substring(0, i) + v.substring(i + 1)
          if (!all.contains(del)) { all += del; next += del }
          i += 1
        }
      }
      frontier = next.toSet
      d += 1
    }
    new GenericArrayData(
      all.toArray.sorted.map(UTF8String.fromString(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
