package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed WordPiece vocabulary training — the BERT-family
  * tokenizer-construction step (Schuster & Nakajima 2012; Wu et al.
  * 2016), the third member of the tokenizer family next to
  * [[BpeTrainer]] and [[UnigramTrainer]]. Like BPE it merges adjacent
  * symbol pairs, but the selection objective is the LIKELIHOOD score
  *
  *   score(a, b) = count(ab) / (count(a) · count(b))
  *
  * — the pair whose merge most improves a unigram LM of the symbol
  * stream, not the most frequent pair. Words pre-tokenize to a first
  * raw character plus "##"-prefixed continuations ("word" → w, ##o,
  * ##r, ##d); a merge joins the right symbol's body onto the left
  * (w + ##o → wo, ##o + ##r → ##or).
  *
  * Scale shape (the BpeTrainer discipline): the corpus collapses to a
  * WORD HISTOGRAM first — one explode + one aggregation is the only
  * corpus-scale pass. Training iterates on the distinct-words-sized
  * histogram; in the distributed loop each merge is one pair-count
  * aggregation + one symbol-count aggregation over the histogram, and
  * only a top-K scored slice (control-plane-sized) ever reaches the
  * driver. No BPE-style multi-merge batch: a likelihood score moves
  * whenever EITHER constituent symbol's count moves, so the
  * disjointness proof behind [[BpeTrainer.selectSafeBatch]] does not
  * transfer — one merge per round is the exact contract.
  *
  * Determinism contract: the winner is argmax by score with ties on
  * (left ASC, right ASC); scores compare EXACTLY — doubles only
  * pre-screen a candidate set, and the final comparison
  * cross-multiplies the integer rationals (BigInt — n·c'ₗ·c'ᵣ vs
  * n'·cₗ·cᵣ), so float rounding can never flip a selection. Both
  * paths are pinned bit-identical in WordPieceSpec.
  */
object WordPieceTrainer {

  /** The standard [UNK] token emitted by the encoder. */
  val Unk = "[UNK]"

  /** Word → initial WordPiece symbols: first character raw, every
    * continuation "##"-prefixed. */
  private[ext] def toSymbols(w: String): Seq[String] =
    w.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c
    }

  /** The token a merge produces: left + right-without-##. */
  private[ext] def joined(a: String, b: String): String =
    a + b.stripPrefix("##")

  /** One merge applied to a symbol sequence: adjacent (a, b) collapse
    * left-to-right, resuming past the merged token (the BPE scan). */
  private[ext] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += joined(a, b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Exact comparison of score₁ = n₁/(l₁·r₁) vs score₂ = n₂/(l₂·r₂):
    * sign of n₁·l₂·r₂ − n₂·l₁·r₁ (cross-multiplied in BigInt — the
    * products overflow long at corpus-scale counts). */
  private def cmpScore(n1: Long, l1: Long, r1: Long,
      n2: Long, l2: Long, r2: Long): Int =
    (BigInt(n1) * BigInt(l2) * BigInt(r2))
      .compare(BigInt(n2) * BigInt(l1) * BigInt(r1))

  /** Among pre-screened candidates (pair, n, cl, cr), the exact argmax
    * by (score DESC, left ASC, right ASC). */
  private def exactBest(cands: Seq[(String, String, Long, Long, Long)])
      : (String, String, Long, Long, Long) =
    cands.reduceLeft { (x, y) =>
      val c = cmpScore(y._3, y._4, y._5, x._3, x._4, x._5)
      if (c > 0 || (c == 0 && (y._1 < x._1 ||
        (y._1 == x._1 && y._2 < x._2)))) y else x
    }

  // double pre-screen margin: the true rational's double image sits
  // within ~4 ulps of the exact value, so anything below
  // max·(1 − 1e-9) can never be the exact argmax
  private val Margin = 1.0 - 1e-9

  /** Exact sequential trainer over a driver-resident word histogram
    * with INCREMENTAL pair/symbol counts (only merge-touched words
    * recount) and a per-round linear argmax over the live pair map:
    * doubles pre-screen, BigInt cross-multiplication decides. */
  private[ext] def trainLocal(words0: Array[(Seq[String], Long)],
      numMerges: Int): Seq[(Int, String, String, Long, Long, Long)] = {
    val words = words0.map { case (s, f) => (s.toArray, f) }
    val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
    val occ = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWord(wi: Int, syms: Array[String], f: Long): Unit = {
      var i = 0
      while (i < syms.length) {
        symCnt.update(syms(i), symCnt.getOrElse(syms(i), 0L) + f)
        if (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCnt.update(p, pairCnt.getOrElse(p, 0L) + f)
          occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
        }
        i += 1
      }
    }
    def dropWord(syms: Array[String], f: Long): Unit = {
      var i = 0
      while (i < syms.length) {
        val nv = symCnt(syms(i)) - f
        if (nv <= 0L) symCnt.remove(syms(i)) else symCnt.update(syms(i), nv)
        if (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          val pv = pairCnt(p) - f
          if (pv <= 0L) pairCnt.remove(p) else pairCnt.update(p, pv)
        }
        i += 1
      }
    }
    words.zipWithIndex.foreach { case ((syms, f), wi) => addWord(wi, syms, f) }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Long)]
    var rank = 0
    while (rank < numMerges && pairCnt.nonEmpty) {
      // pass 1: double max; pass 2: margin candidates; exact resolve
      var maxScore = 0.0
      pairCnt.foreach { case ((a, b), n) =>
        val s = n.toDouble / (symCnt(a).toDouble * symCnt(b).toDouble)
        if (s > maxScore) maxScore = s
      }
      val cands = pairCnt.iterator.flatMap { case ((a, b), n) =>
        val (la, rb) = (symCnt(a), symCnt(b))
        val s = n.toDouble / (la.toDouble * rb.toDouble)
        if (s >= maxScore * Margin) Some((a, b, n, la, rb)) else None
      }.toSeq
      val (a, b, n, la, rb) = exactBest(cands)
      merges += ((rank, a, b, n, la, rb))
      val touched = occ.getOrElse((a, b), scala.collection.mutable.Set.empty)
        .toArray.sorted
      touched.foreach { wi =>
        val (syms, f) = words(wi)
        val hasPair = syms.indices.dropRight(1)
          .exists(i => syms(i) == a && syms(i + 1) == b)
        if (hasPair) { // occ entries go stale after other merges touch the word
          dropWord(syms, f)
          val next = applyMerge(syms.toSeq, a, b).toArray
          words(wi) = (next, f)
          addWord(wi, next, f)
        }
      }
      occ.remove((a, b))
      rank += 1
    }
    merges.toSeq
  }

  /** Distributed merge loop over an executor-resident symbol-sequence
    * histogram: each round aggregates pair counts and symbol counts
    * (histogram-sized, never corpus-sized), joins them, pre-screens the
    * top-`topK` double-scored slice on the driver, and resolves the
    * exact winner by cross-multiplication. Fails loud if the screen
    * cannot prove containment (every collected row inside the margin —
    * a pathological mass-tie that a larger `topK` resolves). */
  private[ext] def trainDistributed(words0: Dataset[(Seq[String], Long)],
      numMerges: Int, topK: Int = 1024): Seq[(Int, String, String, Long, Long, Long)] = {
    val spark = words0.sparkSession
    import spark.implicits._
    var words = words0
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairs = words.flatMap { case (syms, f) =>
        if (syms.length < 2) Iterator.empty
        else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, f) }
      }.toDF("a", "b", "f").groupBy("a", "b").agg(sum(col("f")).as("n"))
      val syms = words.flatMap { case (ss, f) => ss.iterator.map(s => (s, f)) }
        .toDF("s", "f").groupBy("s").agg(sum(col("f")).as("c"))
      val top = pairs
        .join(syms.select(col("s").as("a"), col("c").as("ca")), "a")
        .join(syms.select(col("s").as("b"), col("c").as("cb")), "b")
        .withColumn("score", col("n").cast("double") /
          (col("ca").cast("double") * col("cb").cast("double")))
        .orderBy(col("score").desc, col("a").asc, col("b").asc)
        .limit(topK)
        .select("a", "b", "n", "ca", "cb", "score")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5)))
      if (top.isEmpty) exhausted = true
      else {
        val maxScore = top.iterator.map(_._6).max
        val complete = top.length < topK
        require(complete || top.last._6 < maxScore * Margin,
          s"WordPiece top-$topK screen is all within the tie margin — " +
            "raise topK to prove argmax containment")
        val cands = top.filter(_._6 >= maxScore * Margin)
          .map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq
        val (a, b, n, la, rb) = exactBest(cands)
        merges += ((rank, a, b, n, la, rb))
        val applied = words.map { case (ss, f) => (applyMerge(ss, a, b), f) }
          .toDF("syms", "freq")
        // flat lineage each round — a round is already a full job
        words = Materialize(applied).as[(Seq[String], Long)]
        rank += 1
      }
    }
    merges.toSeq
  }

  private def wordHistogram(docs: DataFrame, textCol: String,
      lowercase: Boolean): Dataset[(Seq[String], Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = if (lowercase) lower(col(textCol)) else col(textCol)
    val hist = docs
      .select(explode(split(trim(base), TextAnalysis.WhitespaceClass)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (toSymbols(w), f) }
    Materialize(hist.toDF("syms", "freq")).as[(Seq[String], Long)]
  }

  /** Train `numMerges` WordPiece merges; returns (rank, left, right,
    * pair_count, left_count, right_count) with rank 0 first — the
    * counts are the score's exact numerator and denominator factors at
    * selection time. Hybrid execution like [[BpeTrainer.train]]: local
    * incremental loop when the distinct-word histogram fits the driver
    * (`maxLocalWords`), one-merge-per-round distributed loop above it. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      lowercase: Boolean = true, maxLocalWords: Long = 1000000L,
      distTopK: Int = 1024): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordHistogram(docs, textCol, lowercase)
    val rows =
      if (words.count() <= maxLocalWords) trainLocal(words.collect(), numMerges)
      else trainDistributed(words, numMerges, distTopK)
    rows.toDF("rank", "left", "right", "pair_count", "left_count", "right_count")
  }

  /** The encoder vocabulary a merge table induces: every initial
    * symbol of the corpus (single raw first-chars + "##" continuation
    * chars — one histogram-sized pass) plus every merge product.
    * Output: one `piece` column. */
  def vocab(docs: DataFrame, textCol: String, mergesDf: DataFrame,
      lowercase: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val alphabet = wordHistogram(docs, textCol, lowercase)
      .flatMap { case (syms, _) => syms.iterator }
      .toDF("piece").distinct()
    val merged = mergesDf.select(
      concat(col("left"), regexp_replace(col("right"), "^##", "")).as("piece"))
    alphabet.unionByName(merged).distinct()
  }

  /** Collect a trained vocabulary (control-plane-sized) into the Seq
    * form [[graft.functions.WordPieceEncode]] takes. */
  def collectVocab(vocabDf: DataFrame): Seq[String] =
    vocabDf.select("piece").collect().map(_.getString(0)).toSeq.sorted

  /** Segment `textCol` with a vocabulary: adds `outCol` (array<string>)
    * via the native greedy longest-match-first encode expression —
    * embarrassingly parallel, the vocabulary is the only shared state. */
  def encode(docs: DataFrame, textCol: String, vocab: Seq[String],
      outCol: String = "wp_tokens", unk: String = Unk,
      maxWordLen: Int = 100, lowercase: Boolean = true): DataFrame =
    docs.withColumn(outCol,
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.WordPieceEncode(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(textCol)),
          vocab, unk, maxWordLen, lowercase)))
}
