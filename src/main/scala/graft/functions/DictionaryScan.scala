package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase dictionary scan — the C4 "bad words" page filter
  * (Raffel et al. 2020 §2.2 removes any page containing a word from a
  * blocklist; reference pipelines tag/filter against dictionaries of
  * 10⁴-10⁵ phrases).
  *
  * Matching contract (single-sourced with the DuckDB oracles):
  *  1. lowercase (Locale.ROOT — Spark `lower()` semantics),
  *  2. split on [[graft.ext.TextAnalysis.WhitespaceClass]],
  *  3. strip leading/trailing ASCII punctuation
  *     ([[DictionaryScan.EdgePunctClass]]) from each token — INTERNAL
  *     punctuation is kept ("re-use" stays one token),
  *  4. join surviving tokens with single spaces,
  *  5. a phrase (normalized the same way) matches iff it appears in the
  *     stream flanked by spaces or string edges — whole-token matches
  *     only, so "ord" never fires inside "order".
  *
  * The scan is a classic Aho-Corasick automaton (goto/fail/output
  * links), built once per expression instance and shared across rows:
  * ONE O(chars) pass over each document regardless of dictionary size,
  * where the naive plan is a doc × dictionary cross join. At cluster
  * scale the automaton rides the serialized expression (phrases are
  * KBs-MBs — the Bloom-join rework's plan-literal bound is far away)
  * and each executor pays one build.
  *
  * Returns the DISTINCT matched phrases (normalized form), sorted by
  * UTF8 binary order — a deterministic pure function of the text and
  * the dictionary. Null text yields null (callers coalesce).
  */
case class DictionaryTags(child: Expression, phrases: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(phrases.nonEmpty, "dictionary must not be empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "dictionary_tags"

  /** Normalized, de-duplicated, non-empty phrase list (matching order
    * is irrelevant; output order is binary-sorted at emit time). */
  @transient private lazy val normPhrases: Array[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    phrases.foreach { p =>
      val n = DictionaryScan.normalize(p)
      if (n.nonEmpty) seen += n
    }
    require(seen.nonEmpty, "dictionary normalizes to no usable phrases")
    seen.toArray
  }

  @transient private lazy val automaton = DictionaryScan.build(normPhrases)

  override def nullSafeEval(input: Any): Any = {
    val stream = DictionaryScan.normalize(input.asInstanceOf[UTF8String].toString)
    val hits = automaton.matchedPhraseIds(stream)
    // UTF8String compareTo is byte-wise — matches DuckDB list_sort on
    // VARCHAR, unlike java.lang.String's UTF-16 order above the BMP
    val out: Array[Any] = hits.map(h => UTF8String.fromString(normPhrases(h)))
      .sortWith(_.compareTo(_) < 0).toArray[Any]
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object dictionaryscan {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def dictionary_tags(text: org.apache.spark.sql.Column, phrases: Seq[String]): org.apache.spark.sql.Column =
    column(DictionaryTags(expression(text), phrases))
}

object DictionaryScan {

  /** ASCII punctuation stripped from token EDGES during normalization:
    * the four printable-ASCII non-alphanumeric ranges. Written as
    * explicit ranges so the identical class means the identical thing
    * in Java regex (tests) and RE2 (DuckDB oracles); the JVM scan
    * checks the same ranges by char compare. */
  val EdgePunctClass = "[!-/:-@\\[-`{-~]"

  private def isEdgePunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  private def isWhitespace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  /** The normalization shared by documents and phrases (contract steps
    * 1-4 above). Single forward pass, no regex at row scope. */
  def normalize(raw: String): String = {
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWhitespace(lower.charAt(i))) i += 1
      if (i < n) {
        var j = i
        while (j < n && !isWhitespace(lower.charAt(j))) j += 1
        // token is [i, j); strip edge punctuation
        var a = i
        var b = j
        while (a < b && isEdgePunct(lower.charAt(a))) a += 1
        while (b > a && isEdgePunct(lower.charAt(b - 1))) b -= 1
        if (a < b) {
          if (sb.length > 0) sb.append(' ')
          sb.append(lower, a, b)
        }
        i = j
      }
    }
    sb.toString
  }

  /** Aho-Corasick automaton frozen into primitive arrays for the
    * per-row scan (this runs once per DOCUMENT CHAR at corpus scale —
    * no boxing, no hashing): the root gets a dense 64K char → state
    * table (one per executor, 256 KB); every other node keeps its
    * transitions as a sorted char array + parallel target array probed
    * by binary search (nodes average a handful of edges). */
  final class Automaton(
      rootNext: Array[Int], // dense: char -> state (or 0)
      nodeChars: Array[Array[Char]],
      nodeTargets: Array[Array[Int]],
      fail: Array[Int],
      // per node: phrase ids whose last char lands here (after output-
      // link merging), paired with their lengths for boundary checks
      outIds: Array[Array[Int]],
      outLens: Array[Array[Int]],
      nPhrases: Int) extends Serializable {

    private def step(st: Int, c: Char): Int =
      if (st == 0) rootNext(c)
      else {
        val idx = java.util.Arrays.binarySearch(nodeChars(st), c)
        if (idx >= 0) nodeTargets(st)(idx) else -1
      }

    /** Distinct ids of phrases occurring whole-token in the normalized
      * stream (flanked by space/edge), in first-match order. */
    def matchedPhraseIds(s: String): Array[Int] = {
      val seen = new Array[Boolean](nPhrases)
      val hits = scala.collection.mutable.ArrayBuffer.empty[Int]
      var state = 0
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        var st = state
        var nx = step(st, c)
        while (nx < 0 && st != 0) { st = fail(st); nx = step(st, c) }
        state = if (nx < 0) 0 else nx
        val ids = outIds(state)
        if (ids.length > 0 && (i + 1 == n || s.charAt(i + 1) == ' ')) {
          val lens = outLens(state)
          var k = 0
          while (k < ids.length) {
            val start = i - lens(k) + 1
            if ((start == 0 || s.charAt(start - 1) == ' ') && !seen(ids(k))) {
              seen(ids(k)) = true
              hits += ids(k)
            }
            k += 1
          }
        }
        i += 1
      }
      hits.toArray
    }
  }

  /** Standard goto/fail construction with BFS output-link merging, so a
    * phrase that is a proper suffix of another ("casino" under "online
    * casino") still reports at the longer phrase's end state. */
  def build(phrases: Array[String]): Automaton = {
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outI = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    val outL = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    phrases.zipWithIndex.foreach { case (p, id) =>
      var st = 0
      p.foreach { c =>
        val key = Character.valueOf(c)
        val ex = next(st).get(key)
        if (ex == null) {
          next += new java.util.HashMap[Character, Integer]()
          outI += Nil
          outL += Nil
          next(st).put(key, Integer.valueOf(next.length - 1))
          st = next.length - 1
        } else st = ex.intValue()
      }
      outI(st) = id :: outI(st)
      outL(st) = p.length :: outL(st)
    }
    val fail = new Array[Int](next.length)
    val queue = new java.util.ArrayDeque[Int]()
    next(0).forEach { (_, v) => fail(v) = 0; queue.add(v.intValue()) }
    while (!queue.isEmpty) {
      val u = queue.poll()
      next(u).forEach { (c, v) =>
        var f = fail(u)
        var nx = next(f).get(c)
        while (nx == null && f != 0) { f = fail(f); nx = next(f).get(c) }
        fail(v) = if (nx == null || nx.intValue() == v) 0 else nx.intValue()
        outI(v) = outI(v) ++ outI(fail(v))
        outL(v) = outL(v) ++ outL(fail(v))
        queue.add(v.intValue())
      }
    }
    // freeze into the scan-time primitive form (see Automaton)
    val rootNext = new Array[Int](Char.MaxValue + 1)
    next(0).forEach { (c, v) => rootNext(c.charValue()) = v.intValue() }
    val nodeChars = new Array[Array[Char]](next.length)
    val nodeTargets = new Array[Array[Int]](next.length)
    var ni = 0
    while (ni < next.length) {
      val entries = new Array[(Char, Int)](next(ni).size())
      var e = 0
      next(ni).forEach { (c, v) => entries(e) = (c.charValue(), v.intValue()); e += 1 }
      java.util.Arrays.sort(entries, Ordering.by((t: (Char, Int)) => t._1))
      nodeChars(ni) = entries.map(_._1)
      nodeTargets(ni) = entries.map(_._2)
      ni += 1
    }
    new Automaton(rootNext, nodeChars, nodeTargets, fail,
      outI.map(_.toArray).toArray, outL.map(_.toArray).toArray, phrases.length)
  }
}
