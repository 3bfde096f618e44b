package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize-and-hash expressions.
  *
  * The declarative form — split + transform(sequence, slice, concat_ws) +
  * array_distinct + xxhash64 — costs ~1.25M interpreted lambda evals for
  * 5k documents (measured ~5-6 s at sf0.1, the single largest cost in the
  * dedup pipeline). One expression node doing a single pass over the
  * string is ~100× cheaper and keeps everything downstream (explode,
  * join, aggregate) declarative.
  *
  * Tokenization matches `split(trim(text), "\\s+")`: runs of ASCII
  * whitespace separate tokens. Hashes are polynomial token hashes
  * finalized with splitmix64 — internal equality classes only (any
  * injective-enough hash yields the same dedup semantics).
  */
private[graft] object TextHashing {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Ordered token hashes of one pass over the string. */
  def tokenHashes(s: String): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        var h = 1469598103934665603L // FNV-ish seed
        while (i < len && !isWs(s.charAt(i))) {
          h = h * 1099511628211L + s.charAt(i)
          i += 1
        }
        out += Mix.splitmix64(h)
      }
    }
    out.toArray
  }

  /** Levenshtein distance if <= k, else k+1 — banded DP, O(k*min(n,m))
    * space, early exit when the whole band exceeds k. */
  def boundedLevenshtein(a0: String, b0: String, k: Int): Int = {
    // ensure |a| <= |b| so the band stays centered
    val (a, b) = if (a0.length <= b0.length) (a0, b0) else (b0, a0)
    val n = a.length; val m = b.length
    if (m - n > k) return k + 1
    if (n == 0) return m // m <= k here
    val inf = k + 1
    // row i holds distances for a[0..i); band covers j in [i-k, i+k]
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      if (lo == 1) cur(0) = if (i <= k) i else inf
      var best = inf
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = if (prev(j) < inf) prev(j) + 1 else inf
        val ins = if (cur(j - 1) < inf) cur(j - 1) + 1 else inf
        val v = math.min(sub, math.min(del, ins))
        cur(j) = math.min(v, inf)
        if (cur(j) < best) best = cur(j)
        j += 1
      }
      if (best >= inf) return inf // whole band exceeded k: early exit
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.min(prev(m), inf)
  }

  /** Distinct hashes of every string reachable by deleting at most `k`
    * characters (the SymSpell deletion neighborhood, string itself
    * included). If lev(a,b) <= k then some alignment of a and b leaves a
    * common core reachable from EACH side with at most k deletions, so
    * two strings within distance k always share a neighborhood hash —
    * the exact blocking key for bounded-edit-distance joins. BFS by
    * deletion depth with string-level dedup keeps the output at
    * sum_{i<=k} C(len,i) worst case (callers bound len; fuzzyJoin only
    * uses this for its short-string block). */
  def deletionHashes(s: String, k: Int): Array[Long] = {
    @inline def hash(v: String): Long = {
      var h = 0x243F6A8885A308D3L // pi seed: distinct from token/shingle spaces
      var i = 0
      while (i < v.length) { h = h * 1099511628211L + v.charAt(i); i += 1 }
      Mix.splitmix64(h)
    }
    val seen = new java.util.HashSet[String]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](1 + s.length * k)
    seen.add(s); out += hash(s)
    var level: Array[String] = Array(s)
    var d = 0
    while (d < k && level.nonEmpty) {
      val next = new scala.collection.mutable.ArrayBuffer[String](level.length * s.length)
      var vi = 0
      while (vi < level.length) {
        val v = level(vi)
        var i = 0
        while (i < v.length) {
          val w = new java.lang.StringBuilder(v.length - 1)
            .append(v, 0, i).append(v, i + 1, v.length).toString
          if (seen.add(w)) { next += w; out += hash(w) }
          i += 1
        }
        vi += 1
      }
      level = next.toArray
      d += 1
    }
    out.toArray
  }

  /** POSITIONAL hashes of n-token shingles: one hash per start
    * position, in order, repeats kept. `out(i)` is the hash of tokens
    * `[i, i+n)`; length is `max(tokens - n + 1, 0)`. The positional
    * form is what span-level dedup needs — a shingle's start index
    * recovers the token window it covers. */
  def shingleHashesAll(s: String, n: Int): Array[Long] = {
    val toks = tokenHashes(s)
    if (toks.length < n) return Array.emptyLongArray
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      var h = 0x51095AD6BEEFCAFEL
      var j = 0
      while (j < n) {
        h = Mix.splitmix64(h ^ toks(i + j))
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Distinct hashes of n-token shingles (order-sensitive n-grams). */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val toks = tokenHashes(s)
    if (toks.length < n) return Array.emptyLongArray
    val set = new java.util.HashSet[java.lang.Long](toks.length * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
    var i = 0
    while (i + n <= toks.length) {
      var h = 0x51095AD6BEEFCAFEL
      var j = 0
      while (j < n) {
        h = Mix.splitmix64(h ^ toks(i + j))
        j += 1
      }
      if (set.add(h)) out += h
      i += 1
    }
    out.toArray
  }
}

/** array<long> of distinct n-token shingle hashes of a string column. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 16, s"shingle width must be in [1,16], got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashing.shingleHashes(input.asInstanceOf[UTF8String].toString, n))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> of POSITIONAL n-token shingle hashes: element i hashes
  * tokens [i, i+n); repeats kept, so `posexplode` recovers (start,
  * hash) pairs for span-coverage arithmetic. Same token/shingle hash
  * arithmetic as [[ShingleHashes]] — the two differ only in distinct
  * vs positional output. */
case class ShingleHashesAll(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 64, s"shingle width must be in [1,64], got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_all"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashing.shingleHashesAll(input.asInstanceOf[UTF8String].toString, n))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> of ordered whitespace-token hashes of a string column. */
case class TokenHashes(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashing.tokenHashes(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Levenshtein distance capped at `k`: returns the exact distance when
  * it is <= k, and k+1 otherwise. Ukkonen's banded DP — O(k*n) cells
  * instead of O(n*m), with an early exit as soon as every cell in the
  * band exceeds k. Built for fuzzy-join verification where candidates
  * are filtered with `<= k`: Spark's builtin levenshtein computes the
  * full matrix (measured ~8x slower at k=2 over 40-char strings across
  * millions of candidate pairs). */
case class BoundedLevenshtein(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  require(k >= 0 && k <= 64, s"k must be in [0, 64], got $k")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bounded_levenshtein"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    TextHashing.boundedLevenshtein(a, b, k)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<long> of distinct SymSpell deletion-neighborhood hashes (all
  * variants reachable with <= k character deletions, self included).
  * Exact blocking key for bounded-edit-distance joins over SHORT
  * strings: neighborhood size is sum_{i<=k} C(len,i), so callers must
  * bound len (fuzzyJoin's short block does; ~300 hashes at len 25,
  * k 2). Hash collisions only ever ADD candidates — the exact verifier
  * removes them — so completeness is unconditional. */
case class DeletionHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && k <= 6, s"deletion depth must be in [1,6], got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_hashes"
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashing.deletionHashes(input.asInstanceOf[UTF8String].toString, k))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object texthash {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def shingle_hashes(text: Column, n: Int): Column = column(ShingleHashes(expression(text), n))
  def shingle_hashes_all(text: Column, n: Int): Column = column(ShingleHashesAll(expression(text), n))
  def token_hashes(text: Column): Column = column(TokenHashes(expression(text)))
  def bounded_levenshtein(a: Column, b: Column, k: Int): Column =
    column(BoundedLevenshtein(expression(a), expression(b), k))
  def deletion_hashes(text: Column, k: Int): Column =
    column(DeletionHashes(expression(text), k))
}
