package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style corpus
  * filter: train a word-bigram model on a trusted reference slice, then
  * score candidate documents by negative log-likelihood per token pair;
  * high-NLL documents read "unlike the reference" (boilerplate, noise,
  * wrong register) and are the cut candidates.
  *
  * Scale design: bigrams are built INSIDE each row from the token array
  * (transform over sequence — no window, no per-token shuffle); the
  * count model is two keyed aggregations (map-side partial); scoring is
  * a hash join of candidate bigrams against the count tables on their
  * natural keys; the vocabulary size is a ONE-ROW broadcast frame.
  * Nothing is quadratic and the model tables are the only state — the
  * persisted-model variant stores exactly those two count frames.
  *
  * Cross-engine determinism: each pair's log-probability is computed
  * from an EXACT integer ratio ((c2+1)/(c1+V), add-one smoothing) and
  * nano-quantized per pair BEFORE summing, so the per-document total is
  * an exact integer sum — engine summation order cannot move it (the
  * PSI family's discipline applied to likelihoods).
  */
object LangModel {

  /** Token-array frame: (doc_id, toks). */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        filter(TextAnalysis.tokens(lower(col(textCol))), t => length(t) > 0).as("toks"))

  /** In-row bigram explosion: (doc_id, a, b) — one row per adjacent
    * token pair, order preserved, no shuffle. */
  private def bigrams(tok: DataFrame): DataFrame =
    tok.filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("a"),
            element_at(col("toks"), i + 1).as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))

  /** Train the bigram model on `ref`: returns (c2, c1, vocab) frames —
    * pair counts, context counts (Σ_b c2, so the conditional exactly
    * normalizes), and the one-row unigram vocabulary size. */
  def trainBigram(ref: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame, DataFrame) = {
    val tok = tokens(ref, idCol, textCol)
    val c2 = bigrams(tok).groupBy("a", "b").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("a").agg(sum("c2").as("c1"))
    val vocab = tok.select(explode(col("toks")).as("t")).agg(
      count_distinct(col("t")).as("v"))
    (c2, c1, vocab)
  }

  /** Score `cand` documents under a trained model: one row per doc with
    * the pair count and the exact-integer nano NLL total
    * (-Σ round(1e9·ln((c2+1)/(c1+V)))). Unseen contexts degrade to the
    * uniform add-one floor 1/V — never a zero probability. Documents
    * with fewer than two tokens carry no pairs and are excluded (no
    * likelihood is defined for them). */
  def scoreBigram(cand: DataFrame, c2: DataFrame, c1: DataFrame,
      vocab: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bg = bigrams(tokens(cand, idCol, textCol))
    bg.join(c2, Seq("a", "b"), "left")
      .join(c1, Seq("a"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * lit(1e9))
          .cast("long").as("lp_nano"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"), (-sum(col("lp_nano"))).as("nll_nano"))
  }

  /** The one-call face: train on the reference slice, score candidates. */
  def bigramNll(ref: DataFrame, cand: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val (c2, c1, vocab) = trainBigram(ref, idCol, textCol)
    scoreBigram(cand, c2, c1, vocab, idCol, textCol)
  }

  /** The PERSISTABLE model state: (a, b, c2) bigram counts and (t, n)
    * unigram counts — both additive monoids over disjoint document
    * batches; everything scoreBigram needs re-derives from them
    * ([[modelFromState]]), so an incrementally-maintained LM never
    * rescans corpus history. */
  def bigramCountState(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val tok = tokens(docs, idCol, textCol)
    val c2 = bigrams(tok).groupBy("a", "b").agg(count(lit(1)).as("c2"))
    val uni = tok.select(explode(col("toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    (c2, uni)
  }

  /** Fold bigram-count states (column-wise additive). */
  def mergeBigramCountState(states: (DataFrame, DataFrame)*): (DataFrame, DataFrame) = (
    states.map(_._1).reduce(_.unionByName(_))
      .groupBy("a", "b").agg(sum(col("c2")).as("c2")),
    states.map(_._2).reduce(_.unionByName(_))
      .groupBy("t").agg(sum(col("n")).as("n")))

  /** (c2, c1, vocab) scorer inputs from persisted state: c1 is the
    * context margin of c2 and the vocabulary size is the unigram-state
    * row count — both exactly what [[trainBigram]] computes directly. */
  def modelFromState(c2: DataFrame, uni: DataFrame): (DataFrame, DataFrame, DataFrame) =
    (c2, c2.groupBy("a").agg(sum("c2").as("c1")),
      uni.agg(count(lit(1)).as("v")))
}
