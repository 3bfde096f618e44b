package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * tokenizer-construction step of an LLM data pipeline, run over the
  * corpus the tokenizer will serve (Sennrich et al. 2016).
  *
  * Scale shape: the corpus collapses to a WORD HISTOGRAM first (one
  * explode + one aggregation over the raw text — the only pass that
  * touches corpus-scale data). Training then iterates on the histogram,
  * which is distinct-words-sized and stays a DataFrame (billions of
  * distinct words at 100 TB is still executor-resident; only the single
  * winning pair — a 3-field scalar — ever reaches the driver each
  * round). Each merge round is one flatMap + one aggregation + one
  * ordered take(1), then a map applying the merge; rounds re-materialize
  * through the reliable-checkpoint fence every few iterations so lineage
  * stays flat.
  *
  * Determinism contract: the winning pair is argmax by (weighted count
  * DESC, left ASC, right ASC) — a total order, so the merge table is a
  * pure function of the corpus. The spec pins it against a driver-side
  * reference trainer.
  */
object BpeTrainer {

  /** One merge step applied to a symbol sequence: adjacent (a, b) pairs
    * collapse left-to-right (the standard convention: after a merge at
    * position i the scan resumes at i+2). */
  private[ext] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Exact sequential trainer over a driver-resident word histogram:
    * a lazy-deletion max-heap keyed by (count DESC, left ASC, right
    * ASC) — the same total order the distributed loop's ordered
    * take(1) uses — with incremental pair-count maintenance, so a
    * 32k-merge production vocabulary costs zero Spark jobs per merge
    * instead of one. Occurrence lists are additive (stale entries are
    * re-checked against the live word), counts are exact. */
  private[ext] def trainLocal(words0: Array[(Seq[String], Long)],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    val words = words0.map { case (s, f) => (s.toArray, f) }
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occ = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    // max-heap by (count, then REVERSED lexicographic pair so the
    // smallest (left, right) wins ties) with lazy deletion
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val ca = y._2.compareTo(x._2)
            if (ca != 0) ca else y._3.compareTo(x._3)
          }
        }
      })
    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val nv = counts.getOrElse(p, 0L) + delta
      if (nv <= 0L) counts.remove(p)
      else {
        counts.update(p, nv)
        if (delta > 0L) {
          occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
          heap.enqueue((nv, p._1, p._2))
        } else heap.enqueue((nv, p._1, p._2))
      }
      ()
    }
    words.zipWithIndex.foreach { case ((syms, f), wi) =>
      var i = 0
      while (i + 1 < syms.length) { bump((syms(i), syms(i + 1)), f, wi); i += 1 }
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // pop to the first LIVE heap entry (count still current)
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val cand = heap.dequeue()
        if (counts.get((cand._2, cand._3)).contains(cand._1)) top = Some(cand)
      }
      top match {
        case None => exhausted = true
        case Some((n, a, b)) =>
          merges += ((rank, a, b, n))
          val touched = occ.getOrElse((a, b), scala.collection.mutable.Set.empty)
            .toArray.sorted
          touched.foreach { wi =>
            val (syms, f) = words(wi)
            val hasPair = syms.indices.dropRight(1)
              .exists(i => syms(i) == a && syms(i + 1) == b)
            if (hasPair) { // stale occurrence entries are skipped
              var i = 0
              while (i + 1 < syms.length) { bump((syms(i), syms(i + 1)), -f, wi); i += 1 }
              val next = applyMerge(syms.toSeq, a, b).toArray
              words(wi) = (next, f)
              i = 0
              while (i + 1 < next.length) { bump((next(i), next(i + 1)), f, wi); i += 1 }
            }
          }
          occ.remove((a, b))
          rank += 1
      }
    }
    merges.toSeq
  }

  /** Largest PROVABLY-SEQUENTIAL prefix batch off one stale top-`m`
    * pair ranking — the distributed loop's amortizer. `top` is ordered
    * by the training total order (count DESC, left ASC, right ASC);
    * `complete` means `top` covers EVERY live pair (fewer than m
    * exist). Scans in rank order and accepts an entry only while the
    * stale ranking is guaranteed to equal what sequential BPE would
    * compute after applying the already-accepted merges:
    *
    *  - symbol-disjointness from all accepted merges ⇒ the entry's own
    *    count is unchanged (a count can only change where an occurrence
    *    overlaps a merged occurrence, which requires a shared symbol);
    *  - pairs SPAWNED by an accepted merge (x, ab)/(ab, y) inherit at
    *    most the stale count of the overlapping pair (x, a)/(b, y) they
    *    came from. Overlapping pairs ranked before the current entry
    *    would already have stopped the scan; those ranked after it are
    *    strictly below it unless tied, and off-list pairs are bounded
    *    by the list tail — so requiring count > tail-bound and no
    *    equal-count overlapping entry later in the list rules out any
    *    spawned pair outranking (or tying) the current entry.
    *
    * Ties between accepted entries are safe: both counts are unchanged,
    * and the list order already applies the lexicographic tie-break.
    * Worst case (adversarially interlocking pairs) the batch is just
    * the head — never worse than the one-merge-per-job loop. */
  private[ext] def selectSafeBatch(top: Seq[(String, String, Long)],
      complete: Boolean): Seq[(String, String, Long)] = {
    if (top.isEmpty) return Seq.empty
    val tailBound = if (complete) 0L else top.last._3
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val symbols = scala.collection.mutable.Set.empty[String]
    var i = 0
    var stopped = false
    while (i < top.length && !stopped) {
      val (a, b, n) = top(i)
      val ok =
        if (accepted.isEmpty) true
        else if (symbols(a) || symbols(b)) false
        else if (n <= tailBound) false
        else !top.drop(i + 1).exists { case (x, y, m) =>
          m == n && (symbols(x) || symbols(y))
        }
      if (ok) { accepted += ((a, b, n)); symbols += a; symbols += b; symbols += (a + b) }
      else stopped = true
      i += 1
    }
    accepted.toSeq
  }

  /** Distributed merge loop over an executor-resident word histogram:
    * each Spark job materializes the top-`topM` stale pair ranking once
    * and [[selectSafeBatch]] extracts every merge that provably equals
    * the sequential result, so the job count is numMerges / (average
    * batch size) instead of one job per merge — on natural-language
    * histograms (sparse symbol reuse among the head pairs) batches run
    * close to topM. Returns (merge table, aggregation-job count) so the
    * spec can pin the amortization. Bit-identical to [[trainLocal]] by
    * construction (the batch acceptance rule is a proof obligation, not
    * a heuristic). */
  private[ext] def trainDistributed(words0: Dataset[(Seq[String], Long)],
      numMerges: Int, topM: Int): (Seq[(Int, String, String, Long)], Int) = {
    val spark = words0.sparkSession
    import spark.implicits._
    var words = words0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var jobs = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = words
        .flatMap { case (syms, f) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, f) }
        }
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(topM)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      jobs += 1
      val batch = selectSafeBatch(top, complete = top.length < topM)
        .take(numMerges - rank)
      if (batch.isEmpty) exhausted = true
      else {
        batch.foreach { case (a, b, n) => merges += ((rank, a, b, n)); rank += 1 }
        val applied = words.map { case (syms, f) =>
          (batch.foldLeft(syms) { case (s, (a, b, _)) => applyMerge(s, a, b) }, f)
        }.toDF("syms", "freq")
        // flat lineage each round — a round is already a full job
        words = Materialize(applied).as[(Seq[String], Long)]
      }
    }
    (merges.toSeq, jobs)
  }

  /** Train `numMerges` merges; returns (rank int, left, right,
    * pair_count long) with rank 0 = first merge. May return fewer rows
    * than numMerges when the histogram runs out of adjacent pairs.
    *
    * Hybrid execution: the corpus-scale pass is always the ONE word-
    * histogram aggregation; when the distinct-word histogram fits on
    * the driver (`maxLocalWords`, default 1M rows — the regime every
    * practical tokenizer-training corpus lands in after whitespace
    * splitting) the merge loop runs locally via [[trainLocal]] with
    * incremental counts, costing zero Spark jobs per merge. Above the
    * threshold it runs the distributed loop, amortized to ~`distTopM`
    * merges per Spark job by [[selectSafeBatch]]'s provably-sequential
    * prefix batching (exact same total order) — both paths are pinned
    * bit-identical in BpeSpec. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      lowercase: Boolean = true, maxLocalWords: Long = 1000000L,
      distTopM: Int = 64): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    require(distTopM >= 1, s"distTopM must be positive, got $distTopM")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = if (lowercase) lower(col(textCol)) else col(textCol)
    val hist: Dataset[(Seq[String], Long)] = docs
      .select(explode(split(trim(base), TextAnalysis.WhitespaceClass)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString), f) }

    val words = Materialize(hist.toDF("syms", "freq")).as[(Seq[String], Long)]
    if (words.count() <= maxLocalWords)
      trainLocal(words.collect(), numMerges)
        .toDF("rank", "left", "right", "pair_count")
    else trainDistributed(words, numMerges, distTopM)._1
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Collect a trained merge table (rank-ordered, control-plane-sized)
    * into the Seq form [[graft.functions.BpeEncode]] takes. */
  def collectMerges(mergesDf: DataFrame): Seq[(String, String)] =
    mergesDf.orderBy(col("rank")).select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** Segment `textCol` with a trained merge table: adds `tokens`
    * (array<string>) via the native greedy encode expression. Encoding
    * is embarrassingly parallel — the merge table is the only shared
    * state and it is rank-count-sized. */
  def encode(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)], outCol: String = "tokens"): DataFrame =
    docs.withColumn(outCol,
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.BpeEncode(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(textCol)),
          merges)))
}
