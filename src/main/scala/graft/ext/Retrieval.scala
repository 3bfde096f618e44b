package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text retrieval over a document corpus — the search face of a training
  * -data pipeline (mining domain-relevant documents, sourcing hard
  * negatives for embedding training, grading corpus coverage of a query
  * set).
  *
  * Scale design: one corpus scan builds the (doc, term, tf) inverted
  * frame; document length and document frequency are windows over that
  * frame (never a second scan); corpus-level totals are a ONE-ROW
  * broadcast frame; the query-term set is a broadcast-sized dimension.
  * Scoring then touches only the postings of query terms — at 100 TB
  * the non-query postings never shuffle (the semi-join prunes them at
  * the aggregation's output), and per-term top-k ranks inside term
  * partitions with WindowGroupLimit pruning before the global sort.
  *
  * Cross-engine determinism (the oracle contract): ranking within a
  * term uses ONLY the BM25 saturation part — a single division of two
  * exact integers, bit-identical in any IEEE engine (idf is constant
  * within a term, so this IS the BM25 order). The headline score keeps
  * the Robertson-Lucene idf `ln((N+1)/(df+0.5))` with its argument
  * carried as the exact integer ratio (2N+2)/(2df+1), nano-quantized
  * like the PSI family.
  */
object Retrieval {

  /** Ranked-retrieval evaluation — the per-query metrics a RAG/search
    * pipeline reports: hits@k, precision@k, recall@k, MRR@k, DCG@k and
    * NDCG@k (Järvelin & Kekäläinen 2002) — over a (query, doc, rank)
    * ranked frame judged against a (query, doc) binary-relevance truth
    * frame.
    *
    * Exactness: the log2 rank-discount table for ranks 1..k is computed
    * ONCE driver-side (k doubles, nano-quantized to int64) and rides
    * the plan as a broadcast literal spine — each hit's gain term is
    * then an exact long, so DCG is an order-independent integer SUM
    * (distributed float summation could flip low bits per run), and
    * IDCG is a driver-side PREFIX-SUM lookup joined on min(n_rel, k).
    * NDCG/precision/recall quantize by exact integer division; MRR is
    * ⌊10^9 / first-hit-rank⌋. The oracle re-embeds the SAME driver-side
    * constants, so every output is bit-stable across engines.
    *
    * Contracts: relevance is binary (truth membership; truth dedupes);
    * ranked rows with rank > k are ignored; a query with truth but no
    * ranked hits reports zero metrics; a query absent from truth is
    * dropped (recall/NDCG undefined there — surface those with a
    * separate coverage join if needed). The run side is DEDUPED on
    * (query, doc) keeping the smallest rank before judging — a run
    * that lists a doc at several ranks (or repeats a rank) counts it
    * once, so hits/DCG can never double-count and precision/recall
    * stay <= 1e6.
    *
    * Plan shape: one semi join of the rank-bounded results against
    * truth (shuffle on (query, doc)), one grouped aggregate, two
    * broadcast spine joins (k rows each). Output: (queryCol, n_rel,
    * hits, mrr_nano, dcg_nano, idcg_nano, ndcg_micro, precision_micro,
    * recall_micro). */
  def rankingEval(ranked: DataFrame, truth: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = ranked.sparkSession
    import spark.implicits._
    val gains = (1 to k).map(r => (r.toLong,
      math.floor(1.0e9 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong))
    val idcg = gains.map(_._2).scanLeft(0L)(_ + _).tail
    val gainDf = gains.toDF(rankCol, "__gain_nano")
    val idcgDf = (1 to k).map(i => (i.toLong, idcg(i - 1)))
      .toDF("__nrel_cap", "__idcg_nano")
    val rel = truth.select(col(queryCol), col(docCol)).distinct()
    val nrel = rel.groupBy(col(queryCol)).agg(count(lit(1)).as("n_rel"))
    // dedupe the rank-bounded run on (query, doc) at its best rank —
    // map-side partial min, so a well-formed (already-unique) run
    // pays one cheap pre-aggregation on the same shuffle key
    val hits = ranked.filter(col(rankCol) <= k)
      .groupBy(col(queryCol), col(docCol))
      .agg(min(col(rankCol)).as(rankCol))
      .join(rel, Seq(queryCol, docCol), "left_semi")
      .join(broadcast(gainDf), Seq(rankCol))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("hits"),
        min(col(rankCol)).cast("long").as("__first_rank"),
        sum(col("__gain_nano")).as("dcg_nano"))
    nrel.join(hits, Seq(queryCol), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("dcg_nano", coalesce(col("dcg_nano"), lit(0L)))
      .withColumn("mrr_nano", when(col("__first_rank").isNotNull,
        call_function("div", lit(1000000000L), col("__first_rank")))
        .otherwise(lit(0L)))
      .join(broadcast(idcgDf),
        least(col("n_rel"), lit(k.toLong)) === col("__nrel_cap"))
      .select(col(queryCol), col("n_rel"), col("hits"), col("mrr_nano"),
        col("dcg_nano"), col("__idcg_nano").as("idcg_nano"),
        call_function("div", col("dcg_nano") * lit(1000000L),
          col("__idcg_nano")).as("ndcg_micro"),
        call_function("div", col("hits") * lit(1000000L), lit(k.toLong))
          .as("precision_micro"),
        call_function("div", col("hits") * lit(1000000L), col("n_rel"))
          .as("recall_micro"))
  }

  /** BM25 top-k (k1 = 6/5, b = 3/4, Lucene non-negative idf), with the
    * query set taken as the `nQueryTerms` globally most frequent terms
    * (df-desc, term-asc — deterministic). Integer-exact derivation for
    * k1 = 6/5, b = 3/4, avgdl = S/N (S = Σ dl over the corpus):
    *
    *   tf_part = tf·(k1+1) / (tf + k1·(1 − b + b·dl/(S/N)))
    *           = 44·S·tf / (20·S·tf + 6·S + 18·dl·N)
    *
    * — one division of two exact longs (safe while 44·S·tf fits a
    * long; at the ~1e16-token scale route the two operands through
    * decimal(38,0) first — the division is still single). Returns one
    * row per (term, doc) in the term's top-k:
    * (term, doc_id, rank, tf, df, dl, bm25_nano). */
  def bm25TopK(docs: DataFrame, k: Int = 10, nQueryTerms: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0 && nQueryTerms > 0, s"k and nQueryTerms must be positive")
    val d = docs.filter(col(textCol).isNotNull)
    val terms = d.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val tfd = tf
      .withColumn("dl", sum("tf").over(Window.partitionBy("doc_id")))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    // corpus totals: one row (N docs, S tokens) — exact longs
    val stats = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    // deterministic query set: top-df terms, term-asc tiebreak
    val qt = broadcast(tfd.select("term", "df").distinct()
      .orderBy(col("df").desc, col("term").asc).limit(nQueryTerms)
      .select("term"))
    val scored = tfd.join(qt, "term").crossJoin(broadcast(stats))
      .withColumn("tf_part",
        (lit(44L) * col("sum_dl") * col("tf")).cast("double") /
          (lit(20L) * col("sum_dl") * col("tf") + lit(6L) * col("sum_dl") +
            lit(18L) * col("dl") * col("n_docs")).cast("double"))
      .withColumn("idf_ratio",
        (lit(2L) * col("n_docs") + lit(2L)).cast("double") /
          (lit(2L) * col("df") + lit(1L)).cast("double"))
    val w = Window.partitionBy("term").orderBy(col("tf_part").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("rank"), col("tf"), col("df"),
        col("dl"),
        round(log(col("idf_ratio")) * col("tf_part") * lit(1e9))
          .cast("long").as("bm25_nano"))
  }

  /** Hybrid sparse + dense retrieval with reciprocal-rank fusion
    * (Cormack et al. 2009): for each query document, a SPARSE ranking
    * (count of distinct shared lowercase tokens — the inverted-index
    * lexical signal) and a DENSE ranking (exact cosine over the
    * embedding column, `Similarity.bruteForceTopK`'s contract) are each
    * truncated at `kRank`, then fused by
    * `rrf = Σ 1_000_000 div (rrfK + rank)` over the rankers that
    * surfaced the document — INTEGER division of exact integers, so the
    * fused score and final order are bit-identical in any engine and an
    * SQL oracle can replay them. A document absent from one ranker's
    * top-`kRank` simply contributes nothing for it (truncated-list RRF,
    * the standard form).
    *
    * Scale shape: the sparse side is an inverted-index equi-join on
    * token (query docs explode to (query_id, term); corpus postings of
    * non-query terms never survive the join) — the contamination-check
    * topology, never a text cross join. The dense side is one corpus
    * scan against the broadcast query vectors; swap its candidate set
    * to `Similarity.ivfTopK` output when the corpus outgrows a full
    * scan (RRF consumes ranks, so any ranker drop-in composes). Fusion
    * itself joins two k-bounded rank lists per query — dimension-sized.
    *
    * Output: (query_id, neighbor_id, rrf_micro, r_dense, r_sparse,
    * rank) — the fused top-`k` per query, rank ties broken by
    * neighbor id; r_dense / r_sparse are NULL where that ranker did
    * not surface the document. */
  def hybridRrfTopK(docs: DataFrame, vecs: DataFrame, queryIds: DataFrame,
      k: Int = 10, kRank: Int = 20, rrfK: Int = 60,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && kRank > 0 && rrfK >= 0, "k, kRank > 0 and rrfK >= 0")
    val qids = broadcast(queryIds.select(col(queryIds.columns.head).as("query_id")))
    // dense ranker: exact cosine top-kRank (ivfTopK drops in at scale)
    val dense = Similarity.bruteForceTopK(vecs,
        vecs.join(qids, col(vecIdCol) === col("query_id")).select(vecIdCol, vecCol),
        kRank, idCol = vecIdCol, vecCol = vecCol)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("int").as("r_dense"))
    // sparse ranker: distinct-shared-token count via the inverted index
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(array_distinct(TextAnalysis.tokens(lower(col(textCol))))).as("term"))
      .filter(length(col("term")) > 0)
    val qtoks = toks.join(qids, col("id") === col("query_id")).select("query_id", "term")
    val overlap = qtoks.join(toks, "term")
      .filter(col("id") =!= col("query_id"))
      .groupBy("query_id", "id").agg(count(lit(1)).as("shared"))
    val sw = Window.partitionBy("query_id").orderBy(col("shared").desc, col("id").asc)
    val sparse = overlap.withColumn("r_sparse", row_number().over(sw).cast("int"))
      .filter(col("r_sparse") <= kRank)
      .select(col("query_id"), col("id").as("neighbor_id"), col("r_sparse"))
    // truncated-list RRF: ⌊1e6/(rrfK+r)⌋ computed as the exactly-
    // divisible (N − N mod d)/d — every intermediate is an exact
    // integer below 2^53, so the double division is exact and the
    // score replays bit-for-bit in any engine (DuckDB: 1000000 // d)
    def part(r: Column): Column = {
      val d = lit(rrfK.toLong) + r.cast("long")
      coalesce(((lit(1000000L) - pmod(lit(1000000L), d)) / d).cast("long"), lit(0L))
    }
    val fused = dense.join(sparse, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf_micro", part(col("r_dense")) + part(col("r_sparse")))
    val fw = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("neighbor_id").asc)
    fused.withColumn("rank", row_number().over(fw).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rrf_micro", "r_dense", "r_sparse", "rank")
  }
}
