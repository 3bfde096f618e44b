package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained corpus-quality classifier — the CCNet/fastText-style learned
  * stage of a pretraining curation pipeline (Wenzek et al. 2020 use a
  * fastText classifier beside the LM perplexity filter; the reference
  * rule battery in [[TextAnalysis.qualityFilters]] is the label
  * bootstrap here): a distributed multinomial Naive Bayes over the
  * whitespace token stream, trained as pure aggregations and scored
  * map-side — no gradient loop, no model server, and exact enough to
  * oracle-check.
  *
  * Scale design: training is two keyed aggregations over the token
  * explosion (map-side partial combine) plus two one-row total frames;
  * the model is vocabulary-sized state (token, n_pos, n_neg) — an
  * additive monoid, so per-slice states union+sum into the full-corpus
  * model without rescanning history (the incremental-state discipline).
  * Scoring joins candidate tokens against the model on the token key
  * and sums per doc: one hash join + one aggregation, never quadratic.
  *
  * Cross-engine determinism (the Fellegi–Sunter/LangModel discipline):
  * each class log-probability is `round(1e9·ln((cnt+1)/(N+V)))` of an
  * exact integer ratio, quantized per TOKEN before the in-document
  * multiply and sum, so per-document scores are exact integer sums —
  * engine summation order cannot move them and DuckDB replays the
  * arithmetic bit-for-bit.
  */
object QualityClassifier {

  private def toks(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        filter(TextAnalysis.tokens(lower(col(textCol))), t => length(t) > 0)
          .as("toks"))

  /** Per-token class counts — THE model state: (token, n_pos, n_neg),
    * additive over disjoint document slices. `labelCol` is boolean
    * (true = positive/keep class). */
  def tokenCountState(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "label"): DataFrame =
    // label rides the token explosion — ONE narrow pass + one map-side
    // combined aggregation, no self-join back onto the corpus (this
    // runs per microbatch in the streaming gate)
    docs.filter(col(textCol).isNotNull)
      .select(col(labelCol).as("__l"),
        explode(filter(TextAnalysis.tokens(lower(col(textCol))),
          t => length(t) > 0)).as("token"))
      .groupBy("token")
      .agg(sum(when(col("__l"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__l"), 0L).otherwise(1L)).as("n_neg"))

  /** Fold per-slice token-count states (column-wise additive monoid). */
  def mergeTokenCountStates(states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_)).groupBy("token")
      .agg(sum("n_pos").as("n_pos"), sum("n_neg").as("n_neg"))

  /** Document class counts — the prior's state: one row
    * (n_pos_docs, n_neg_docs), additive like the token counts. */
  def docCountState(docs: DataFrame, idCol: String = "doc_id",
      labelCol: String = "label"): DataFrame =
    docs.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos_docs"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg_docs"))

  def mergeDocCountStates(states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .agg(sum("n_pos_docs").as("n_pos_docs"),
        sum("n_neg_docs").as("n_neg_docs"))

  /** Train on labeled docs: (token-count state, doc-count state). */
  def train(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "label")
      : (DataFrame, DataFrame) =
    (tokenCountState(docs, idCol, textCol, labelCol),
      docCountState(docs, idCol, labelCol))

  /** Score candidate documents under a trained model: one row per doc —
    * (doc_id, n_tokens, llr_nano, pred_pos) where llr_nano is the
    * integer-nano log odds
    *
    *   round(1e9·ln((Dp+1)/(Dn+1)))                        [prior]
    *   + Σ_t c(t,d)·( round(1e9·ln((n_pos(t)+1)/(Np+V)))
    *                − round(1e9·ln((n_neg(t)+1)/(Nn+V))) ) [likelihood]
    *
    * with add-one smoothing throughout. Unseen tokens still carry the
    * class-size correction ln((Nn+V)/(Np+V)) — never a zero
    * probability, never dropped. Token-free documents score the prior
    * alone. pred_pos = llr_nano > 0. */
  def score(cand: DataFrame, tokenCounts: DataFrame, docCounts: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // one-row totals frame: token mass per class + vocabulary size
    val totals = tokenCounts.agg(sum("n_pos").as("np"), sum("n_neg").as("nn"),
      count(lit(1)).as("v"))
    val t = toks(cand, idCol, textCol)
    val perTok = t.select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .join(tokenCounts, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("c"),
        (round(log((coalesce(col("n_pos"), lit(0L)) + lit(1L)).cast("double") /
          (col("np") + col("v")).cast("double")) * lit(1e9)).cast("long") -
          round(log((coalesce(col("n_neg"), lit(0L)) + lit(1L)).cast("double") /
            (col("nn") + col("v")).cast("double")) * lit(1e9)).cast("long"))
          .as("llr_tok_nano"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("llr_tok_nano")).as("lik_nano"))
    val prior = docCounts.select(
      round(log((col("n_pos_docs") + lit(1L)).cast("double") /
        (col("n_neg_docs") + lit(1L)).cast("double")) * lit(1e9))
        .cast("long").as("prior_nano"))
    // left join from the candidate set so token-free docs keep a row
    cand.select(col(idCol).as("doc_id"))
      .join(perTok, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (col("prior_nano") + coalesce(col("lik_nano"), lit(0L))).as("llr_nano"))
      .withColumn("pred_pos", col("llr_nano") > 0L)
  }

  /** The one-call face: train on the labeled slice, score candidates. */
  def trainScore(labeled: DataFrame, cand: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      labelCol: String = "label"): DataFrame = {
    val (tc, dc) = train(labeled, idCol, textCol, labelCol)
    score(cand, tc, dc, idCol, textCol)
  }
}
