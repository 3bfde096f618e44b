package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state top-k aggregate: keeps the k best (score, id) pairs
  * per group, ordered by (score DESC, id DESC) — a total order, so the
  * result is deterministic under any partitioning.
  *
  * This is the scale-correct replacement for the
  * `ROW_NUMBER() OVER (PARTITION BY key ORDER BY score) <= k` pattern:
  * the window form shuffles and SORTS every row of every key, while an
  * aggregate with a k-bounded buffer partial-aggregates map-side —
  * each partition contributes at most k rows per key to the exchange,
  * so the shuffle carries O(partitions × k) per key instead of the
  * key's full row count, and nothing is ever globally sorted.
  *
  * Buffers stay ordered and ≤ k elements; reduce is an insertion into
  * a ≤k vector (k is small by contract — a heap would only matter for
  * large k). merge is an ordered merge-take. Associative and
  * commutative, so Catalyst applies partial aggregation exactly as for
  * built-ins.
  */
class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // (score, id) descending lexicographic
  @inline private def gt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    if (b.size == k && !gt(a, b.last)) b
    else {
      val i = b.indexWhere(e => gt(a, e)) match { case -1 => b.size; case x => x }
      val (pre, post) = b.splitAt(i)
      ((pre :+ a) ++ post).take(k)
    }
  }

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // ordered merge of two ≤k ordered runs, truncated at k
    val out = Vector.newBuilder[(Double, Long)]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < x.size || j < y.size)) {
      val takeX = j >= y.size || (i < x.size && gt(x(i), y(j)))
      if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
