package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the second
  * tokenizer family beside BPE (Kudo 2018, "Subword Regularization"):
  * instead of growing a vocabulary merge-by-merge, seed a LARGE
  * candidate piece set from substring frequencies and let hard-EM
  * shrink it — segment every word by Viterbi under the current piece
  * scores, re-estimate scores from usage, prune to the target size.
  *
  * Scale shape (the BpeTrainer discipline): the corpus collapses to a
  * WORD HISTOGRAM in one pass; seeding and every EM round then run over
  * the distinct-words histogram. Below `maxLocalWords` the whole loop
  * is driver-local with zero Spark jobs per round; above it each round
  * is one flatMap (Viterbi per word, scores broadcast) + one exact
  * count aggregation — vocabulary-sized state either way, and the two
  * paths are BIT-IDENTICAL by construction (same shared Viterbi, same
  * total orders, exact integer count sums), pinned by a 3-seed
  * differential in UnigramSpec.
  *
  * Deterministic contract (hard-EM, not stochastic EM): Viterbi ties
  * prefer the LONGER piece at each boundary; seeding and pruning order
  * by (count DESC, piece ASC); scores are integer-nano quantized
  * log-probabilities (`round(1e9·ln(cnt/total))`) so nothing depends on
  * float summation order. Single-character pieces are never pruned
  * (any string stays segmentable); unseen characters at encode time
  * take the documented `floorNano` score. */
object UnigramTrainer {

  /** Score floor for a single character absent from the vocabulary:
    * ~e^-46 per char — below any trained piece, above Long-overflow
    * territory for any realistic document. */
  val FloorNano: Long = -46000000000L

  /** Deterministic Viterbi segmentation of one word: maximize the sum
    * of piece scores; at equal score the LONGER piece wins each
    * boundary scanning right to left — i.e. among tied paths the one
    * with the longest LAST piece wins, then the longest piece before
    * it, and so on (each position fills from its longest candidate
    * first and only strictly-better paths replace it). Characters not
    * in the vocabulary fall back to [[FloorNano]] singletons, so every
    * word segments. */
  private[graft] def viterbiSegment(word: String,
      score: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Seq[String] = {
    val L = word.length
    if (L == 0) return Seq.empty
    val best = Array.fill(L + 1)(Long.MinValue)
    val back = new Array[Int](L + 1)
    best(0) = 0L
    var i = 1
    while (i <= L) {
      var j = math.max(0, i - maxPieceLen) // smallest j first = longest piece
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val piece = word.substring(j, i)
          val s0 = score.get(piece)
          val s =
            if (s0 != null) s0.longValue()
            else if (i - j == 1) FloorNano
            else Long.MinValue
          if (s != Long.MinValue) {
            val cand = best(j) + s
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = L
    while (p > 0) { out += word.substring(back(p), p); p = back(p) }
    out.reverse.toSeq
  }

  /** Shared prune + rescore: keep every single-character piece, fill
    * the rest of `vocabSize` with the top multi-character pieces by
    * (count DESC, piece ASC), then quantize scores off the kept total.
    * Pure driver-side function of a vocabulary-sized count list — the
    * one place both execution paths order and score, so they cannot
    * diverge. */
  private def pruneAndScore(counts: Seq[(String, Long)], vocabSize: Int)
      : Seq[(String, Long, Long)] = {
    val (singles, multis) = counts.partition(_._1.length == 1)
    val keptMultis = multis
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - singles.length))
    val kept = (singles ++ keptMultis).sortBy(_._1)
    val total = math.max(kept.map(_._2).sum, 1L)
    kept.map { case (p, c) =>
      (p, c, math.round(math.log(c.toDouble / total.toDouble) * 1e9))
    }
  }

  // value type is java.lang.Long ON PURPOSE: with a primitive-Long
  // value type, Scala unboxes the null of a missing key to 0 — the
  // best possible score — silently admitting every unknown piece
  private def scoreMap(vocab: Seq[(String, Long, Long)])
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
    vocab.foreach { case (p, _, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  /** All substring occurrences of a word up to maxPieceLen, each
    * weighted by the word frequency (occurrence positions count —
    * "aa" contributes "a" twice). */
  private def substrings(w: String, f: Long, maxPieceLen: Int): Iterator[(String, Long)] =
    for {
      start <- (0 until w.length).iterator
      len <- (1 to math.min(maxPieceLen, w.length - start)).iterator
    } yield (w.substring(start, start + len), f)

  /** Driver-local EM over a collected word histogram. */
  private[ext] def trainLocal(words: Array[(String, Long)], vocabSize: Int,
      rounds: Int, maxPieceLen: Int, seedSize: Int): Seq[(String, Long, Long)] = {
    // seed counts
    val seedCounts = new java.util.HashMap[String, Long]()
    words.foreach { case (w, f) =>
      substrings(w, f, maxPieceLen).foreach { case (p, c) =>
        seedCounts.merge(p, c, (a, b) => a + b); ()
      }
    }
    import scala.jdk.CollectionConverters._
    var vocab = pruneAndScore(
      seedCounts.asScala.toSeq.map { case (p, c) => (p, c) }, seedSize)
    (0 until rounds).foreach { _ =>
      val sm = scoreMap(vocab)
      val usage = new java.util.HashMap[String, Long]()
      words.foreach { case (w, f) =>
        viterbiSegment(w, sm, maxPieceLen).foreach { p =>
          usage.merge(p, f, (a, b) => a + b); ()
        }
      }
      // add-one over the CURRENT vocab: unused pieces (all the single
      // chars the corpus never segments to) stay alive at count 1
      val counts = vocab.map { case (p, _, _) =>
        (p, usage.getOrDefault(p, 0L) + 1L)
      }
      vocab = pruneAndScore(counts, vocabSize)
    }
    vocab
  }

  /** Distributed EM over an executor-resident word histogram: per round
    * ONE flatMap (Viterbi per word under the broadcast score map) and
    * ONE exact count aggregation; the vocabulary-sized count list
    * collects to the driver for the shared prune+rescore. */
  private[ext] def trainDistributed(hist: Dataset[(String, Long)], vocabSize: Int,
      rounds: Int, maxPieceLen: Int, seedSize: Int): Seq[(String, Long, Long)] = {
    val spark = hist.sparkSession
    import spark.implicits._
    // materialized: the substring-explosion aggregation feeds BOTH the
    // top-multis collect and the all-singles collect below — without the
    // fence the dominant seeding pass would execute twice
    val seedCounts = Materialize(
      hist.flatMap { case (w, f) => substrings(w, f, maxPieceLen) }
        .toDF("piece", "c").groupBy("piece").agg(sum("c").as("c")))
    // the seed selection must see every single char plus the top multis
    // in (count DESC, piece ASC) order — take seedSize + enough slack to
    // cover all singles, then let the shared prune apply the real rule
    val seedSeq = seedCounts
      .orderBy(col("c").desc, col("piece").asc)
      .limit(seedSize * 2)
      .as[(String, Long)].collect().toSeq ++
      seedCounts.filter(length(col("piece")) === 1)
        .as[(String, Long)].collect().toSeq
    var vocab = pruneAndScore(seedSeq.distinct, seedSize)
    (0 until rounds).foreach { _ =>
      val bc = spark.sparkContext.broadcast(scoreMap(vocab))
      val maxLen = maxPieceLen
      val usage = hist.flatMap { case (w, f) =>
        viterbiSegment(w, bc.value, maxLen).iterator.map(p => (p, f))
      }.toDF("piece", "u").groupBy("piece").agg(sum("u").as("u"))
        .as[(String, Long)].collect().toMap
      val counts = vocab.map { case (p, _, _) => (p, usage.getOrElse(p, 0L) + 1L) }
      vocab = pruneAndScore(counts, vocabSize)
    }
    vocab
  }

  /** Train a unigram vocabulary of (piece, count, score_nano) rows.
    * `seedSize` defaults to 8× the target vocabulary (the SentencePiece
    * convention of seeding well above target and pruning down). */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      rounds: Int = 3, maxPieceLen: Int = 6, seedSize: Int = 0,
      lowercase: Boolean = true, maxLocalWords: Long = 1000000L): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive: $vocabSize")
    require(rounds >= 1, s"rounds must be positive: $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val seeds = if (seedSize > 0) seedSize else vocabSize * 8
    val base = if (lowercase) lower(col(textCol)) else col(textCol)
    val hist = docs
      .select(explode(split(trim(base), TextAnalysis.WhitespaceClass)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
    val words = Materialize(hist.toDF("w", "freq")).as[(String, Long)]
    val vocab =
      if (words.count() <= maxLocalWords)
        trainLocal(words.collect(), vocabSize, rounds, maxPieceLen, seeds)
      else trainDistributed(words, vocabSize, rounds, maxPieceLen, seeds)
    vocab.toDF("piece", "count", "score_nano")
  }

  /** Collect a trained vocabulary (control-plane-sized) into the Seq
    * form [[graft.functions.UnigramEncode]] takes. */
  def collectVocab(vocabDf: DataFrame): Seq[(String, Long)] =
    vocabDf.select("piece", "score_nano").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Segment `textCol` with a trained vocabulary: adds `outCol`
    * (array<string>) via the native Viterbi encode expression —
    * embarrassingly parallel, vocabulary is the only shared state. */
  def encode(docs: DataFrame, textCol: String, vocab: Seq[(String, Long)],
      outCol: String = "pieces", maxPieceLen: Int = 6,
      lowercase: Boolean = true): DataFrame =
    docs.withColumn(outCol,
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.UnigramEncode(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(textCol)),
          vocab, maxPieceLen, lowercase)))
}
