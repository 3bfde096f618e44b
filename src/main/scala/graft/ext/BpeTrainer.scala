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

  /** Train `numMerges` merges; returns (rank int, left, right,
    * pair_count long) with rank 0 = first merge. May return fewer rows
    * than numMerges when the histogram runs out of adjacent pairs. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      lowercase: Boolean = true): DataFrame = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = if (lowercase) lower(col(textCol)) else col(textCol)
    val hist: Dataset[(Seq[String], Long)] = docs
      .select(explode(split(trim(base), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString), f) }

    var words = Materialize(hist.toDF("syms", "freq")).as[(Seq[String], Long)]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
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
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, n))
        val applied = words.map { case (syms, f) => (applyMerge(syms, a, b), f) }
          .toDF("syms", "freq")
        // flat lineage every few rounds; in between, lazy chaining is
        // cheap because each round's map is narrow
        words = (if (rank % 5 == 4) Materialize(applied) else applied)
          .as[(Seq[String], Long)]
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
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
