package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram overlap generation eval — ROUGE-N (Lin 2004) and the clipped
  * n-gram precision at the core of BLEU (Papineni et al. 2002) — over
  * (candidate, reference) document pairs: the corpus-scale readout of
  * a generation/summarization/rewrite pipeline ("how close is the
  * model output to the reference, per document, across a few billion
  * documents?").
  *
  * Per pair and order n, the CLIPPED match count is
  * Σ_g min(count_cand(g), count_ref(g)) over distinct n-grams g —
  * repeating an n-gram in the candidate beyond its reference count
  * earns nothing (the BLEU clipping rule). Then, all exact integers:
  * precision = m / |cand n-grams|, recall = m / |ref n-grams|
  * (ROUGE-N), and F1 = 2m / (|cand| + |ref|) — the P/R harmonic mean
  * collapses to one exact ratio of counts, so no float appears
  * anywhere; outputs micro-quantize by integer division and NULL out
  * on an empty denominator.
  *
  * Scale shape: n-grams are built IN-ROW from the token array
  * (transform over sequence — no window, no per-token shuffle), then
  * two (pair, n-gram) keyed counts with map-side partials; the clipped
  * overlap is ONE equi-join of those counts on their natural key —
  * never all-pairs, nothing quadratic, and the per-pair aggregation is
  * pair-count-sized. The tokenization (lowercased whitespace tokens)
  * and the space-joined n-gram key are both replayed verbatim by the
  * DuckDB oracle. */
object TextEval {

  /** (id, g, c): per-document n-gram instance counts, n-gram key =
    * space-joined tokens (tokens are whitespace-split, so the join
    * character can never collide). */
  private def ngramCounts(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        filter(TextAnalysis.tokens(lower(col(textCol))), t => length(t) > 0)
          .as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"),
        explode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))

  /** ROUGE-N / clipped-precision eval of `cand` against `ref`, paired
    * on `idCol`. One row per pair id present on either side:
    * (idCol, match_clipped, cand_ngrams, ref_ngrams, precision_micro,
    * recall_micro, f1_micro) — counts coalesce to 0, metrics NULL on a
    * zero denominator (a side with no n-grams of this order). */
  def ngramOverlap(cand: DataFrame, ref: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n-gram order must be positive, got $n")
    val cg = ngramCounts(cand, n, idCol, textCol)
    val rg = ngramCounts(ref, n, idCol, textCol)
    val ct = cg.groupBy("id").agg(sum(col("c")).as("cand_ngrams"))
    val rt = rg.groupBy("id").agg(sum(col("c")).as("ref_ngrams"))
    val m = cg.select(col("id"), col("g"), col("c").as("cc"))
      .join(rg.select(col("id"), col("g"), col("c").as("cr")), Seq("id", "g"))
      .groupBy("id").agg(sum(least(col("cc"), col("cr"))).as("m"))
    ct.join(rt, Seq("id"), "full")
      .join(m, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("m"), lit(0L)).as("match_clipped"),
        coalesce(col("cand_ngrams"), lit(0L)).as("cand_ngrams"),
        coalesce(col("ref_ngrams"), lit(0L)).as("ref_ngrams"))
      .withColumn("precision_micro", when(col("cand_ngrams") > 0L,
        call_function("div", col("match_clipped") * lit(1000000L),
          col("cand_ngrams"))))
      .withColumn("recall_micro", when(col("ref_ngrams") > 0L,
        call_function("div", col("match_clipped") * lit(1000000L),
          col("ref_ngrams"))))
      .withColumn("f1_micro",
        when(col("cand_ngrams") + col("ref_ngrams") > 0L,
          call_function("div", col("match_clipped") * lit(2000000L),
            col("cand_ngrams") + col("ref_ngrams"))))
  }

  /** chrF (Popović 2015) — character-n-gram F-β eval of `cand`
    * against `ref`, paired on `idCol`: the tokenization-free
    * generation metric (robust to word-segmentation differences, the
    * standard MT companion to ROUGE/BLEU). The character stream is
    * the lowercased text with ALL whitespace removed (the sacrebleu
    * convention); grams are substrings of length `n`; the clipped
    * match count and totals are exactly [[ngramOverlap]]'s discipline.
    * F-β stays an exact integer ratio: with P = m/c and R = m/r,
    * F_β = (1+β²)PR / (β²P + R) = (1+β²)·m / (β²·r + c) — so the
    * output micro-quantizes by one integer division (β² rides as the
    * integer `betaSq`; chrF2's β = 2 → betaSq = 4). NULL on an empty
    * denominator. Same scale shape as ngramOverlap: in-row gram
    * explosion, keyed counts, one clipped equi-join. */
  def charNgramOverlap(cand: DataFrame, ref: DataFrame, n: Int,
      betaSq: Int = 4, idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(n >= 1, s"n-gram order must be positive, got $n")
    require(betaSq >= 0, s"betaSq must be nonnegative, got $betaSq")
    def grams(df: DataFrame): DataFrame =
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"),
          regexp_replace(lower(col(textCol)), TextAnalysis.WhitespaceClass, "").as("cs"))
        .filter(length(col("cs")) >= n)
        .select(col("id"),
          explode(transform(sequence(lit(1), length(col("cs")) - (n - 1)),
            i => col("cs").substr(i, lit(n)))).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("c"))
    val cg = grams(cand)
    val rg = grams(ref)
    val ct = cg.groupBy("id").agg(sum(col("c")).as("cand_ngrams"))
    val rt = rg.groupBy("id").agg(sum(col("c")).as("ref_ngrams"))
    val m = cg.select(col("id"), col("g"), col("c").as("cc"))
      .join(rg.select(col("id"), col("g"), col("c").as("cr")), Seq("id", "g"))
      .groupBy("id").agg(sum(least(col("cc"), col("cr"))).as("m"))
    ct.join(rt, Seq("id"), "full")
      .join(m, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("m"), lit(0L)).as("match_clipped"),
        coalesce(col("cand_ngrams"), lit(0L)).as("cand_ngrams"),
        coalesce(col("ref_ngrams"), lit(0L)).as("ref_ngrams"))
      .withColumn("precision_micro", when(col("cand_ngrams") > 0L,
        call_function("div", col("match_clipped") * lit(1000000L),
          col("cand_ngrams"))))
      .withColumn("recall_micro", when(col("ref_ngrams") > 0L,
        call_function("div", col("match_clipped") * lit(1000000L),
          col("ref_ngrams"))))
      .withColumn("fbeta_micro",
        when(lit(betaSq) * col("ref_ngrams") + col("cand_ngrams") > 0L,
          call_function("div",
            col("match_clipped") * lit((1L + betaSq) * 1000000L),
            lit(betaSq.toLong) * col("ref_ngrams") + col("cand_ngrams"))))
  }

  /** ROUGE-L eval of `cand` against `ref`, paired on `idCol`: token-
    * level longest-common-subsequence P/R/F1 (Lin 2004) via the native
    * [[graft.functions.LcsLength]] expression — in-order overlap at
    * any gap, the sentence-structure companion to [[ngramOverlap]].
    * One equi-join on the pair id, then per-row O(|c|·|r|) local DP —
    * embarrassingly parallel, but quadratic in document token count,
    * so run it AFTER the page-length filters. All-integer: lcs,
    * lengths, and micro P/R/F1 (F1 = 2·lcs/(c+r)); NULL metrics on an
    * empty side. Inner-join contract: only pairs present on BOTH
    * sides score (an unpaired doc has no LCS to report). No SQL
    * oracle exists offline (LCS needs a DP), so the full-length driver
    * row is rows-only; TextEvalSpec pins the expression against an
    * independent recursive-memo reference, and text_rouge_l_exact
    * oracle-checks the SAME expression over bounded tapes
    * (`maxTokens` > 0 slices each side to its first maxTokens tokens,
    * making the LCS small enough for a chained-CTE match-point unroll
    * in SQL). */
  def rougeL(cand: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxTokens: Int = 0): DataFrame = {
    def toks(df: DataFrame, name: String) = {
      val arr = filter(TextAnalysis.tokens(lower(col(textCol))), t => length(t) > 0)
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"),
          (if (maxTokens > 0) slice(arr, 1, maxTokens) else arr).as(name))
    }
    val joined = toks(cand, "ctoks").join(toks(ref, "rtoks"), Seq("id"))
    val lcs = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.LcsLength(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ctoks")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("rtoks"))))
    joined
      .select(col("id").as(idCol), lcs.cast("long").as("lcs"),
        size(col("ctoks")).cast("long").as("cand_tokens"),
        size(col("rtoks")).cast("long").as("ref_tokens"))
      .withColumn("precision_micro", when(col("cand_tokens") > 0L,
        call_function("div", col("lcs") * lit(1000000L), col("cand_tokens"))))
      .withColumn("recall_micro", when(col("ref_tokens") > 0L,
        call_function("div", col("lcs") * lit(1000000L), col("ref_tokens"))))
      .withColumn("f1_micro", when(col("cand_tokens") + col("ref_tokens") > 0L,
        call_function("div", col("lcs") * lit(2000000L),
          col("cand_tokens") + col("ref_tokens"))))
  }

  /** Word error rate of `cand` against `ref`, paired on `idCol`:
    * token-level Levenshtein distance (the native
    * [[graft.functions.EditDistance]] expression) over the lowercased
    * whitespace tokens, and WER = edits / |ref tokens| as an exact
    * integer micro ratio (can exceed 10⁶ — WER is unbounded above;
    * NULL on an empty reference). The ASR/generation transcript
    * metric. Inner-join contract: only pairs present on BOTH sides
    * score. Quadratic per pair in token count — run AFTER the
    * page-length filters; `maxTokens` > 0 slices both sides to their
    * first maxTokens tokens (the [[rougeL]] exact-face discipline:
    * bounded tapes keep ≤ 2·maxTokens distinct tokens per pair, so a
    * SQL oracle can replay the distance through a per-pair
    * token→char bijection and a string-level Levenshtein). */
  def wer(cand: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxTokens: Int = 0): DataFrame = {
    def toks(df: DataFrame, name: String) = {
      val arr = filter(TextAnalysis.tokens(lower(col(textCol))), t => length(t) > 0)
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"),
          (if (maxTokens > 0) slice(arr, 1, maxTokens) else arr).as(name))
    }
    val joined = toks(cand, "ctoks").join(toks(ref, "rtoks"), Seq("id"))
    val dist = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.EditDistance(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ctoks")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("rtoks"))))
    joined
      .select(col("id").as(idCol), dist.cast("long").as("edits"),
        size(col("ctoks")).cast("long").as("cand_tokens"),
        size(col("rtoks")).cast("long").as("ref_tokens"))
      .withColumn("wer_micro", when(col("ref_tokens") > 0L,
        call_function("div", col("edits") * lit(1000000L), col("ref_tokens"))))
  }

  /** Character error rate of `cand` against `ref`, paired on `idCol`:
    * character-level Levenshtein distance (Spark's codegen'd builtin —
    * CER is the one edit metric where the builtin's grain is already
    * right) over the normalized character stream (lowercased, runs of
    * [[TextAnalysis.WhitespaceClass]] collapsed to one space, ends
    * trimmed — so formatting-only churn never scores as an edit), and
    * CER = edits / |ref chars| as an exact integer micro ratio (NULL
    * on an empty reference; unbounded above like [[wer]]). The
    * OCR/ASR companion to WER — robust where tokenization is unstable
    * (CJK, hyphenation, digit runs). Inner-join contract as [[wer]].
    * Quadratic per pair in CHAR count, so bound inputs with the
    * page-length filters first; fully oracle-checkable (DuckDB's
    * `levenshtein` shares the char grain). */
  def cer(cand: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def norm(df: DataFrame, name: String) =
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"),
          trim(regexp_replace(lower(col(textCol)),
            TextAnalysis.WhitespaceClass, " ")).as(name))
    norm(cand, "c").join(norm(ref, "r"), Seq("id"))
      .select(col("id").as(idCol),
        levenshtein(col("c"), col("r")).cast("long").as("edits"),
        length(col("c")).cast("long").as("cand_chars"),
        length(col("r")).cast("long").as("ref_chars"))
      .withColumn("cer_micro", when(col("ref_chars") > 0L,
        call_function("div", col("edits") * lit(1000000L), col("ref_chars"))))
  }

  /** METEOR, exact-match module (Banerjee & Lavie 2005), of `cand`
    * against `ref` paired on `idCol` — the alignment-based member of
    * the generation-eval family (BLEU/ROUGE reward overlap; METEOR
    * also PENALIZES scrambling through the chunk count). Alignment is
    * [[graft.functions.MeteorAlign]]'s deterministic greedy first-fit
    * (documented there; both engines replay it exactly), over the
    * same lowercased whitespace tokens as every eval here.
    *
    * The score collapses to ONE exact integer ratio: with m matches,
    * ch chunks, c candidate and r reference tokens,
    * Fmean = 10PR/(R+9P) = 10m/(c+9r) and
    * penalty = (ch/m)³/2, so
    * score = Fmean·(1−penalty) = 5·(2m³−ch³) / (m²(c+9r)) —
    * micro-quantized by integer division, exactly 0 when m = 0, and
    * bit-identical on any engine or partitioning (m ≤ 5·10³ keeps
    * 5·2m³·10⁶ inside a long — far above the page-length-filtered
    * token counts this runs on). Inner-join contract; `maxTokens`
    * slices both sides first (the exact-face discipline). */
  def meteor(cand: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxTokens: Int = 0): DataFrame = {
    def toks(df: DataFrame, name: String) = {
      val arr = filter(TextAnalysis.tokens(lower(col(textCol))), t => length(t) > 0)
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"),
          (if (maxTokens > 0) slice(arr, 1, maxTokens) else arr).as(name))
    }
    val align = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.MeteorAlign(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ctoks")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("rtoks"))))
    toks(cand, "ctoks").join(toks(ref, "rtoks"), Seq("id"))
      .select(col("id").as(idCol), align.as("mc"),
        size(col("ctoks")).cast("long").as("cand_tokens"),
        size(col("rtoks")).cast("long").as("ref_tokens"))
      .select(col(idCol), col("mc").getItem(0).cast("long").as("matches"),
        col("mc").getItem(1).cast("long").as("chunks"),
        col("cand_tokens"), col("ref_tokens"))
      .withColumn("meteor_micro",
        when(col("matches") === 0L, lit(0L)).otherwise(
          call_function("div",
            lit(5L) * (lit(2L) * col("matches") * col("matches") * col("matches")
              - col("chunks") * col("chunks") * col("chunks")) * lit(1000000L),
            col("matches") * col("matches")
              * (col("cand_tokens") + lit(9L) * col("ref_tokens")))))
  }

  /** Corpus CER PER GROUP — [[cer]]'s per-pair edit counts summed
    * under the candidate side's `groupCol` (the segmented corpus QC
    * face: "character error rate by domain/source in one pass").
    * Output per group: pair count, total edits, total reference
    * chars, and the exact-integer corpus micro rate (NULL when the
    * group's references are all empty). Group-count-sized output. */
  def cerByGroup(cand: DataFrame, ref: DataFrame, groupCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val gmap = cand.filter(col(textCol).isNotNull)
      .select(col(idCol).as(idCol), col(groupCol).as("grp")).distinct()
    cer(cand, ref, idCol, textCol)
      .join(gmap, Seq(idCol))
      .groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n_pairs"), sum(col("edits")).as("edits"),
        sum(col("ref_chars")).as("ref_chars"))
      .withColumn("cer_micro", when(col("ref_chars") > 0L,
        call_function("div", col("edits") * lit(1000000L), col("ref_chars"))))
  }

  /** (id, n, g, c): per-document n-gram instance counts for EVERY
    * order 1..maxN in one pass — the grams of all orders are built
    * in-row (a flatten over the order sequence of the same slice/
    * concat_ws construction [[ngramCounts]] uses per order), so the
    * corpus is scanned ONCE per side instead of once per order. The
    * inner slice bounds the position sequence to len−n+1 (slice
    * length 0 → empty, so a doc shorter than n contributes no grams
    * of that order without ever building a negative sequence). */
  private def ngramCountsAllOrders(docs: DataFrame, maxN: Int,
      idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        filter(TextAnalysis.tokens(lower(col(textCol))), t => length(t) > 0)
          .as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("id"),
        explode(flatten(transform(sequence(lit(1), lit(maxN)), n =>
          transform(
            slice(sequence(lit(1), size(col("toks"))), lit(1),
              greatest(size(col("toks")) - n + lit(1), lit(0))),
            i => struct(n.cast("int").as("n"),
              concat_ws(" ", slice(col("toks"), i, n)).as("g")))))).as("ng"))
      .select(col("id"), col("ng.n").as("n"), col("ng.g").as("g"))
      .groupBy("id", "n", "g").agg(count(lit(1)).as("c"))

  /** Corpus-level BLEU (Papineni et al. 2002) of `cand` against `ref`,
    * paired on `idCol` — the standard MT/generation corpus score:
    * geometric mean of the order-1..maxN corpus clipped precisions ×
    * the brevity penalty, where every count is summed over the WHOLE
    * corpus before any ratio is taken (corpus BLEU is NOT a mean of
    * per-document scores).
    *
    * Exactness discipline (the idf/PSI nano-ln precedent): the corpus
    * sums m_n (clipped matches), t_n (candidate grams), c (candidate
    * unigrams) and r (reference unigrams) are exact integers. Then
    *   ln BLEU = −[BP_penalty + (1/maxN)·Σ_n ln(t_n/m_n)]
    * with BP_penalty = max(0, r/c − 1) quantized as the exact integer
    * division (r−c)·10⁹ div c (nonnegative operands → truncation ==
    * floor in both engines), and each ln(t_n/m_n) ≥ 0 nano-quantized
    * by round(ln(double(t_n)/m_n)·10⁹) — one double ln per ORDER
    * (4 per corpus, not per row), summed exactly, one terminal exp
    * for the headline micro score. If any order has zero clipped
    * matches, BLEU is exactly 0 (the unsmoothed definition) and the
    * log columns are NULL; everything is NULL on an empty candidate.
    *
    * Scale shape: one scan per side building all orders in-row, two
    * (id, n, gram)-keyed counts with map-side partials, ONE equi-join
    * for clipping, then a maxN-row aggregate collapsed to a single
    * output row — never all-pairs, no window, no driver data path.
    * Output (one row): cand_len, ref_len, match_1..maxN,
    * total_1..maxN, bp_penalty_nano, prec_penalty_nano,
    * log_bleu_nano, bleu_micro. */
  /** The corpus-BLEU SUM STATE: one row of
    * (total_n, match_n for n = 1..maxN, ref_len, cand_len) — every
    * column a corpus-wide exact integer SUM, so the row is a pure sum
    * monoid: states over disjoint pair-id sets add column-wise to the
    * one-shot state (the streaming-gate face; [[corpusBleuFromSums]]
    * finishes the arithmetic). */
  def corpusBleuSums(cand: DataFrame, ref: DataFrame, maxN: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxN >= 1, s"maxN must be positive, got $maxN")
    val cg = ngramCountsAllOrders(cand, maxN, idCol, textCol)
    val rg = ngramCountsAllOrders(ref, maxN, idCol, textCol)
    val perOrder = cg.groupBy("n").agg(sum(col("c")).as("t"))
      .join(
        cg.select(col("id"), col("n"), col("g"), col("c").as("cc"))
          .join(rg.select(col("id"), col("n"), col("g"), col("c").as("cr")),
            Seq("id", "n", "g"))
          .groupBy("n").agg(sum(least(col("cc"), col("cr"))).as("m")),
        Seq("n"), "left")
    val refLen = rg.filter(col("n") === 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("ref_len"))
    val orders = 1 to maxN
    val aggExprs = orders.flatMap(n => Seq(
      coalesce(sum(when(col("n") === n, col("t"))), lit(0L)).as(s"total_$n"),
      coalesce(sum(when(col("n") === n, col("m"))), lit(0L)).as(s"match_$n")))
    val wide = perOrder.agg(aggExprs.head, aggExprs.tail: _*)
    wide.crossJoin(refLen)
      .withColumn("cand_len", col("total_1"))
  }

  /** Finish [[corpusBleuSums]]' state row(s) into the BLEU output —
    * verbatim the quantized arithmetic documented on [[corpusBleu]].
    * Row-wise, so it finishes ONE global row or one row PER GROUP
    * identically; `keyCols` are carried through (the grouped face). */
  def corpusBleuFromSums(one: DataFrame, maxN: Int = 4,
      keyCols: Seq[String] = Nil): DataFrame = {
    val orders = 1 to maxN
    val allPos = orders.map(n => col(s"match_$n") > 0L).reduce(_ && _)
    val negLnSum = orders.map(n =>
      round(log(col(s"total_$n").cast("double") / col(s"match_$n")) * 1e9)
        .cast("long")).reduce(_ + _)
    one
      .withColumn("bp_penalty_nano", when(col("cand_len") > 0L,
        when(col("ref_len") > col("cand_len"),
          call_function("div",
            (col("ref_len") - col("cand_len")) * lit(1000000000L),
            col("cand_len"))).otherwise(lit(0L))))
      .withColumn("prec_penalty_nano",
        when(allPos, call_function("div", negLnSum, lit(maxN.toLong))))
      .withColumn("log_bleu_nano",
        when(col("cand_len") > 0L && allPos,
          -(col("bp_penalty_nano") + col("prec_penalty_nano"))))
      .withColumn("bleu_micro",
        when(col("cand_len") > 0L,
          when(allPos,
            round(exp(col("log_bleu_nano").cast("double") / lit(1e9)) *
              lit(1000000.0)).cast("long"))
            .otherwise(lit(0L))))
      .select((keyCols.map(col) ++ Seq(col("cand_len"), col("ref_len")) ++
        orders.flatMap(n => Seq(col(s"match_$n"), col(s"total_$n"))) ++
        Seq(col("bp_penalty_nano"), col("prec_penalty_nano"),
          col("log_bleu_nano"), col("bleu_micro"))): _*)
  }

  def corpusBleu(cand: DataFrame, ref: DataFrame, maxN: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    corpusBleuFromSums(corpusBleuSums(cand, ref, maxN, idCol, textCol), maxN)

  /** Corpus BLEU PER GROUP — the segmented-evaluation face ("BLEU by
    * domain/language/source across the whole corpus in one pass"):
    * identical counts and quantized arithmetic as [[corpusBleu]], but
    * every sum keyed by the CANDIDATE side's `groupCol` (each pair
    * attributes to its candidate's group; reference lengths join
    * through the pair id, so an unpaired reference contributes to no
    * group — the documented contract). One n-gram build per side, two
    * grouped aggregations, and the row-wise finisher: group count ×
    * ~10 longs of state, never a per-group scan. */
  def corpusBleuByGroup(cand: DataFrame, ref: DataFrame, groupCol: String,
      maxN: Int = 4, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxN >= 1, s"maxN must be positive, got $maxN")
    val gmap = cand.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(groupCol).as("grp")).distinct()
    val cg = ngramCountsAllOrders(cand, maxN, idCol, textCol)
      .join(gmap, Seq("id"))
    val rg = ngramCountsAllOrders(ref, maxN, idCol, textCol)
    val tot = cg.groupBy("grp", "n").agg(sum(col("c")).as("t"))
    val mch = cg.select(col("grp"), col("id"), col("n"), col("g"),
        col("c").as("cc"))
      .join(rg.select(col("id"), col("n"), col("g"), col("c").as("cr")),
        Seq("id", "n", "g"))
      .groupBy("grp", "n").agg(sum(least(col("cc"), col("cr"))).as("m"))
    val orders = 1 to maxN
    val aggExprs = orders.flatMap(n => Seq(
      coalesce(sum(when(col("n") === n, col("t"))), lit(0L)).as(s"total_$n"),
      coalesce(sum(when(col("n") === n, col("m"))), lit(0L)).as(s"match_$n")))
    val wide = tot.join(mch, Seq("grp", "n"), "left")
      .groupBy("grp").agg(aggExprs.head, aggExprs.tail: _*)
    val refLen = rg.filter(col("n") === 1).join(gmap, Seq("id"))
      .groupBy("grp").agg(sum(col("c")).as("ref_len"))
    val sums = wide.join(refLen, Seq("grp"), "left")
      .withColumn("ref_len", coalesce(col("ref_len"), lit(0L)))
      .withColumn("cand_len", col("total_1"))
    corpusBleuFromSums(sums, maxN, keyCols = Seq("grp"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Sentence-level BLEU with +1 smoothing (Lin & Och 2004) of `cand`
    * against `ref`, paired on `idCol` — the per-document companion of
    * [[corpusBleu]] (rerank candidates, per-document quality gates):
    * p₁ = m₁/t₁ unsmoothed (zero unigram overlap → BLEU exactly 0),
    * pₙ = (mₙ+1)/(tₙ+1) for n ≥ 2 — the standard fix for the
    * short-text zero-n-gram cliff — and the per-pair brevity penalty
    * exp(min(0, 1 − r/c)).
    *
    * Scoreable-pair contract (identical in both engines): only pairs
    * present on BOTH sides with ≥ maxN candidate tokens and ≥ 1
    * reference token score; others are dropped, so every emitted row
    * carries t_n > 0 at every order and the smoothed ratios are
    * always defined. Quantization is [[corpusBleu]]'s verbatim —
    * exact-integer BP penalty, nano-rounded ln per (pair, order)
    * summed as longs, div maxN, one terminal exp per pair.
    *
    * Scale shape: the one-scan-per-side all-orders gram counts, one
    * clipped equi-join, then a pair-count-sized conditional-pivot
    * aggregation — never all-pairs, no window. */
  def sentenceBleu(cand: DataFrame, ref: DataFrame, maxN: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxN >= 1, s"maxN must be positive, got $maxN")
    val cg = ngramCountsAllOrders(cand, maxN, idCol, textCol)
    val rg = ngramCountsAllOrders(ref, maxN, idCol, textCol)
    val perPair = cg.groupBy("id", "n").agg(sum(col("c")).as("t"))
      .join(
        cg.select(col("id"), col("n"), col("g"), col("c").as("cc"))
          .join(rg.select(col("id"), col("n"), col("g"), col("c").as("cr")),
            Seq("id", "n", "g"))
          .groupBy("id", "n").agg(sum(least(col("cc"), col("cr"))).as("m")),
        Seq("id", "n"), "left")
    val refLen = rg.filter(col("n") === 1)
      .groupBy("id").agg(sum(col("c")).as("ref_len"))
    val orders = 1 to maxN
    val aggExprs = orders.flatMap(n => Seq(
      coalesce(sum(when(col("n") === n, col("t"))), lit(0L)).as(s"total_$n"),
      coalesce(sum(when(col("n") === n, col("m"))), lit(0L)).as(s"match_$n")))
    val wide = perPair.groupBy("id").agg(aggExprs.head, aggExprs.tail: _*)
    val one = wide.join(refLen, Seq("id"))
      .withColumn("cand_len", col("total_1"))
      .filter(col(s"total_$maxN") > 0L && col("ref_len") > 0L)
    val negLnSum = orders.map { n =>
      if (n == 1)
        round(log(col("total_1").cast("double") / col("match_1")) * 1e9)
          .cast("long")
      else
        round(log((col(s"total_$n") + lit(1L)).cast("double") /
          (col(s"match_$n") + lit(1L))) * 1e9).cast("long")
    }.reduce(_ + _)
    one
      .withColumn("bp_penalty_nano",
        when(col("ref_len") > col("cand_len"),
          call_function("div",
            (col("ref_len") - col("cand_len")) * lit(1000000000L),
            col("cand_len"))).otherwise(lit(0L)))
      .withColumn("prec_penalty_nano",
        when(col("match_1") > 0L, call_function("div", negLnSum, lit(maxN.toLong))))
      .withColumn("log_bleu_nano",
        when(col("match_1") > 0L,
          -(col("bp_penalty_nano") + col("prec_penalty_nano"))))
      .withColumn("bleu_micro",
        when(col("match_1") > 0L,
          round(exp(col("log_bleu_nano").cast("double") / lit(1e9)) *
            lit(1000000.0)).cast("long"))
          .otherwise(lit(0L)))
      .select((Seq(col("id").as(idCol), col("cand_len"), col("ref_len")) ++
        orders.flatMap(n => Seq(col(s"match_$n"), col(s"total_$n"))) ++
        Seq(col("bp_penalty_nano"), col("prec_penalty_nano"),
          col("log_bleu_nano"), col("bleu_micro"))): _*)
  }
}
