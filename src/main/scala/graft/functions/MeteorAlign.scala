package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** METEOR exact-module alignment (Banerjee & Lavie 2005) of two token
  * arrays under the GREEDY FIRST-FIT contract: candidate positions are
  * processed in ascending order, each matching the SMALLEST unused
  * reference position holding the same token (the common
  * implementation simplification of METEOR's fewest-chunks tie-break —
  * deterministic, so both engines replay it exactly). Returns
  * `[matches, chunks]`:
  *
  *  - `matches` = aligned pair count — first-fit always achieves the
  *    full multiset intersection Σ_t min(count_cand(t), count_ref(t)),
  *    since every candidate occurrence takes a reference occurrence
  *    while one remains;
  *  - `chunks` = maximal runs of alignment pairs contiguous on BOTH
  *    sides — pair (i, j) extends the current chunk iff the previous
  *    MATCHED pair was exactly (i−1, j−1); an unmatched candidate
  *    token in between breaks the run. The fragmentation penalty's
  *    numerator: identical orderings give chunks = 1, total scrambles
  *    give chunks = matches.
  *
  * O(|cand|·|ref|) worst case (first-fit scan per token over a
  * boolean used-mask), embarrassingly parallel per pair; run AFTER
  * the page-length filters like every pairwise text eval here. */
case class MeteorAlign(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "meteor_align"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cs = a.asInstanceOf[ArrayData]
    val rs = b.asInstanceOf[ArrayData]
    val nC = cs.numElements()
    val nR = rs.numElements()
    val ref = new Array[String](nR)
    var k = 0
    while (k < nR) { ref(k) = rs.getUTF8String(k).toString; k += 1 }
    val used = new Array[Boolean](nR)
    var matches = 0
    var chunks = 0
    var lastI = -2
    var lastJ = -2
    var i = 0
    while (i < nC) {
      val tok = cs.getUTF8String(i).toString
      var j = 0
      var hit = -1
      while (hit < 0 && j < nR) {
        if (!used(j) && ref(j) == tok) hit = j
        j += 1
      }
      if (hit >= 0) {
        used(hit) = true
        matches += 1
        if (!(i == lastI + 1 && hit == lastJ + 1)) chunks += 1
        lastI = i
        lastJ = hit
      }
      i += 1
    }
    new GenericArrayData(Array[Any](matches, chunks))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
