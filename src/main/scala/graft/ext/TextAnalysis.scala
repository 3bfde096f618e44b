package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-pipeline curation over a `text` column
  * (fixtures: documents.parquet — doc_id, text, lang, source, n_chars).
  *
  * Everything here is built from codegen'd `functions._` expressions — no
  * UDFs — so each operator is one narrow pass over the data: at cluster
  * scale these run at scan speed with zero shuffle.
  */
object TextAnalysis {

  /** THE whitespace class, single-sourced: written out explicitly
    * (never \s) because Java \s includes \x0B while RE2 (DuckDB)
    * \s does not — every Scala tokenization site and JVM-side
    * String.split references this constant, and each DuckDB oracle
    * spells the identical class. */
  val WhitespaceClass = "[ \\t\\n\\r\\f\\x0B]+"

  /** Whitespace tokens (split on any run of whitespace). */
  def tokens(text: Column): Column =
    split(trim(text), WhitespaceClass)

  /** Token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Per-document lexical diversity — the vocabulary-richness quality
    * signals (Gopher's "fraction of unique words" family): type-token
    * ratio, hapax-legomenon fraction, and the raw counts they derive
    * from, over lowercased whitespace tokens ([[WhitespaceClass]] —
    * the engine-portable tokenizer every text oracle mirrors).
    * Keyword-stuffed and boilerplate pages sit at the TTR extremes;
    * natural prose lives in the middle band.
    *
    * All integer: counts from one (doc, term) aggregation (map-side
    * combined; the shuffle carries distinct per-doc terms, not
    * tokens), ratios by exact integer division micro-scaled. NULL and
    * blank docs keep their row with zero counts and NULL ratios (the
    * tokenCount discipline).
    *
    * Output: (idCol, n_tokens, n_types, n_hapax, ttr_micro,
    * hapax_micro). */
  def lexicalDiversity(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("c"))
    val st = tf.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_types"),
      sum(col("c")).as("n_tokens"),
      count(when(col("c") === 1L, 1)).as("n_hapax"))
    docs.select(col(idCol)).join(st, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        when(col("n_tokens") > 0L, call_function("div",
          col("n_types") * lit(1000000L), col("n_tokens"))).as("ttr_micro"),
        when(col("n_types") > 0L, call_function("div",
          col("n_hapax") * lit(1000000L), col("n_types"))).as("hapax_micro"))
  }

  /** BPE-ish pretokenizer match pattern: letter runs, digit runs, and
    * punctuation runs, each optionally absorbing one leading space —
    * the GPT-2 pretokenizer shape MINUS its lookahead clauses, so the
    * same pattern means the same thing in Java regex (Spark codegen)
    * and RE2 (DuckDB oracle). Whitespace itself is not a token. */
  val BpeishPattern = " ?\\p{L}+| ?\\p{N}+| ?[^\\p{L}\\p{N} \\t\\n\\r\\f\\x0B]+"

  /** BPE-ish token count — the standard "how many tokens will this cost
    * roughly" estimator when the real tokenizer can't run in-engine.
    * Counts pretokenizer matches (regexp_count is codegen'd; one narrow
    * pass, no shuffle). Null-safe: null text counts 0. */
  def bpeTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit(BpeishPattern)), lit(0))

  /** All word n-grams of a token array, in order, duplicates kept;
    * documents shorter than n yield an empty array. The single n-gram
    * window expression shared by shingles (distinct) and
    * repetitionSignals (counted). */
  private def ngrams(toks: Column, n: Int): Column =
    if (n == 1) toks
    else filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(size(toks) >= n, concat_ws(" ", slice(toks, i + 1, lit(n))))),
      s => s.isNotNull)

  /** Distinct word 3-gram shingles of the token stream — the unit of
    * near-duplicate comparison (order-sensitive where raw word sets
    * saturate on small vocabularies). */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(ngrams(tokens(text), n))

  /** Quality-signal columns: lengths, ratios of punctuation / digits /
    * uppercase / whitespace, mean token length, stopword ratio. All are
    * single-pass scalar expressions. */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val len = length(text)
    val nTok = tokenCount(text)
    def ratioOf(cleaned: Column): Column =
      when(len === 0, lit(0.0)).otherwise((len - length(cleaned)).cast("double") / len)
    val stopwords = Seq("the", "a", "an", "and", "or", "of", "in", "to", "is")
    val stopCount = stopwords.map(w =>
      size(filter(tokens(lower(text)), t => t === lit(w)))).reduce(_ + _)
    Seq(
      "n_chars_calc" -> len,
      "n_tokens" -> nTok,
      "punct_ratio" -> ratioOf(regexp_replace(text, "[^a-zA-Z0-9 \\t\\n]", "")),
      "digit_ratio" -> ratioOf(regexp_replace(text, "[0-9]", "")),
      "upper_ratio" -> ratioOf(regexp_replace(text, "[A-Z]", "")),
      "mean_token_len" -> when(nTok === 0, lit(0.0))
        .otherwise(length(regexp_replace(trim(text), WhitespaceClass, "")).cast("double") / nTok),
      "stopword_ratio" -> when(nTok === 0, lit(0.0)).otherwise(stopCount.cast("double") / nTok),
    )
  }

  /** Language-ID by marker-word counting: count non-overlapping occurrences
    * of high-frequency function words per language in the space-padded
    * lowercased text, predict the max-scoring language ('und' when all
    * zero). Ties break by fixed language order. The replace-count trick
    * keeps the whole classifier a scalar expression (and is reproducible
    * in any SQL engine, which makes it oracle-checkable). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "fr" -> Seq("le", "et", "les", "est"),
    "es" -> Seq("el", "que", "los", "es"),
  )

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers.map { case (langCode, words) =>
      val score = words.map { w =>
        val m = s" $w "
        (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(m), ""))) /
          lit(m.length)
      }.reduce(_ + _)
      langCode -> score
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    // arg-max with first-listed language winning ties
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((langCode, s), acc) =>
      when(s === best && best > 0, lit(langCode)).otherwise(acc)
    }
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text.
    * Engine-portable (md5 is standard everywhere), used as the exact-dedup
    * grouping key so shuffles carry 16 bytes instead of document bodies. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), WhitespaceClass, " "))

  /** Rolling polynomial hash of the token stream (base 1000003, mod
    * 1e9+7) — an order-sensitive document signature, cheap to band on.
    * The accumulator stays below the modulus so the fold never overflows
    * a long (ANSI mode throws on overflow). Pure `aggregate`, no UDF. */
  def rollingHash(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), p), p))
  }

  /** Cleaning normalization for dedup/training pipelines: lowercase,
    * strip non-alphanumerics (keeping spaces), collapse whitespace,
    * trim. One codegen'd scalar expression. */
  def cleaned(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 \\t\\n\\r\\f\\x0B]", " "), WhitespaceClass, " "))

  /** HTML → text extraction — the step every web-corpus pipeline runs
    * between the crawl and everything else here (C4 §2.2 / CommonCrawl
    * WET-style): script and style elements drop WHOLESALE (their
    * content is never prose), comments drop, remaining tags become
    * separators, character references decode — named
    * `&amp;/&lt;/&gt;/&quot;/&apos;/&nbsp;` plus ALL terminated
    * numeric forms (`&#8217;`, `&#x27;`, …) via
    * [[graft.functions.HtmlEntities]]' single-scan single-decode
    * (`&amp;#39;` and `&#38;lt;` both yield their literal text, which
    * no per-entity replace chain can do) — and whitespace collapses.
    *
    * The tag rules are codegen'd regexp_replace calls inside the regex
    * subset shared by Java and RE2: inline `(?is)` flags and
    * non-greedy `.*?` are portable, while backreferences are NOT (RE2
    * has none), hence separate script and style rules instead of
    * `<(script|style)>.*?</\1>`. The entity scan is one native
    * expression pass; the oracle replays it as split-on-`&` + a
    * per-piece lambda. Zero shuffle end to end. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = graft.functions.htmlentities.html_entity_decode(noTags)
    trim(regexp_replace(decoded, WhitespaceClass, " "))
  }

  /** PII redaction: emails, IPv4 addresses, and phone-shaped digit runs
    * replaced with typed placeholders — the standard scrubbing pass
    * before corpus release/training. Three chained regexp_replace calls
    * (one codegen'd projection, no shuffle). Patterns stay inside the
    * regex subset shared by Java and RE2 so the operator is
    * oracle-checkable across engines. Order matters: emails first (their
    * local parts contain digits), then IPs (dots, never matched by the
    * phone pattern), then phones.
    *
    * The phone pattern is deliberately RECALL-BIASED: any 9+-character
    * run of digits with internal dashes/spaces redacts, which sweeps
    * up ISBNs ("978-0-306-40615-7"), dashed order ids, and
    * space-grouped numbers ("20 000 000") along with every phone
    * format. That is the right trade for a pre-release scrub — a
    * missed phone number is a privacy leak, a redacted ISBN is a lost
    * token — and it is the PINNED contract (spec case + oracle), not
    * an accident. A precision-first variant would need boundary
    * context (labels, country-code tables) outside the Java∩RE2
    * oracle-replayable subset. */
  def piiRedacted(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d\\- ]{7,}\\d", "<PHONE>")
  }

  /** Repetition quality signals (the Gopher-rules family): fraction of
    * repeated tokens / bigrams / trigrams per document. High values flag
    * degenerate boilerplate-heavy text for filtering. Single projection,
    * no shuffle; each fraction is (count - distinct count) / count. */
  def repetitionSignals(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    def grams(n: Int): Column = ngrams(toks, n)
    def dupFrac(g: Column): Column = {
      val nn = size(g)
      when(nn <= 0, lit(0.0))
        .otherwise((nn - size(array_distinct(g))).cast("double") / nn)
    }
    Seq(
      "dup_token_frac" -> dupFrac(grams(1)),
      "dup_bigram_frac" -> dupFrac(grams(2)),
      "dup_trigram_frac" -> dupFrac(grams(3)))
  }

  /** Per-slice corpus vocabulary statistics — the Heaps'-law audit a
    * corpus build runs per language/source slice: token volume, type
    * (distinct-term) count, hapax-legomena count (terms seen exactly
    * once — the OCR-garbage / tokenizer-damage tell when the hapax
    * share spikes), and the type-token ratio as an exact integer
    * division (`ttr_micro` = ⌊n_types·10^6 / n_tokens⌋ — no float).
    * Terms are whitespace tokens of the lowercased text, so counts
    * are exact and engine-portable.
    *
    * Output: one row per slice — (slice, n_tokens, n_types, n_hapax,
    * ttr_micro). Plan: tokenize (zero-shuffle Expand) → ONE grouped
    * count on (slice, term) with map-side combine → one slice-level
    * re-aggregation of that frame; shuffle rows scale with the
    * vocabulary, never the token stream. */
  def vocabStats(docs: DataFrame, groupCol: String,
      textCol: String = "text"): DataFrame = {
    val terms = docs.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("slice"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    terms.groupBy("slice", "term").agg(count(lit(1)).as("cnt"))
      .groupBy("slice")
      .agg(sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("cnt") === 1L, 1)).as("n_hapax"))
      .select(col("slice"), col("n_tokens"), col("n_types"), col("n_hapax"),
        call_function("div", col("n_types") * lit(1000000L), col("n_tokens"))
          .as("ttr_micro"))
  }

  /** Bigram collocations scored by Dunning's log-likelihood ratio G²
    * (Dunning 1993 — the collocation measure that stays calibrated for
    * RARE pairs, unlike PMI): for each adjacent lowercased token pair,
    * the 2×2 contingency table (pair vs left-word margin vs right-word
    * margin vs everything else) and
    *   G² = 2 Σ_cells k·ln(k·N / (row·col)),   0-cells contribute 0.
    * All counts are exact integers (one in-row zip_with builds the
    * bigram stream — no shuffle until the counting groupBys); only the
    * final ln-sum is floating, micro-quantized. Margins are computed
    * over ALL bigrams before the `minCount` cut, so reported scores are
    * unbiased by the cut. One-row totals ride an explicit broadcast
    * cross join. Output: (w1, w2, n_ab, g2_micro). */
  def collocations(docs: DataFrame, textCol: String = "text",
      minCount: Long = 5L): DataFrame =
    collocationsFromCounts(bigramCounts(docs, textCol), minCount)

  /** The (w1, w2, n_ab) bigram-count frame [[collocations]] scores —
    * exposed because bigram counts are the MONOID an incremental corpus
    * pipeline persists: the margins and total are pure re-aggregations
    * of this frame, so day-level count states re-sum into any corpus
    * window without retokenizing history. */
  def bigramCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(lower(col(textCol)))
    val n1 = greatest(size(t) - 1, lit(0))
    docs.filter(col(textCol).isNotNull)
      .select(explode(zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
  }

  /** Merge of bigram-count states (per-pair re-sum). */
  def mergeBigramCounts(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeBigramCounts needs at least one state")
    states.reduce(_.unionAll(_))
      .groupBy(col("w1"), col("w2")).agg(sum(col("n_ab")).as("n_ab"))
  }

  /** [[collocations]]'s G² scoring over a pre-aggregated bigram-count
    * frame — margins and the total derive from the counts, so this is
    * the face incremental callers run over merged stored state. */
  def collocationsFromCounts(bg: DataFrame, minCount: Long): DataFrame = {
    val left = bg.groupBy(col("w1")).agg(sum(col("n_ab")).as("n_a"))
    val right = bg.groupBy(col("w2")).agg(sum(col("n_ab")).as("n_b"))
    val totals = bg.agg(sum(col("n_ab")).as("__n"))
    def term(k: Column, r: Column, c: Column, n: Column): Column =
      when(k === 0L, lit(0.0)).otherwise(
        k.cast("double") * log(k.cast("double") * n.cast("double") /
          (r.cast("double") * c.cast("double"))))
    val joined = bg.join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(totals)) // one-row bigram total (allowlisted)
    val n = col("__n")
    val k11 = col("n_ab")
    val k12 = col("n_a") - col("n_ab")
    val k21 = col("n_b") - col("n_ab")
    val k22 = n - col("n_a") - col("n_b") + col("n_ab")
    val r1 = col("n_a"); val r2 = n - col("n_a")
    val c1 = col("n_b"); val c2 = n - col("n_b")
    joined
      .filter(col("n_ab") >= minCount)
      .select(col("w1"), col("w2"), col("n_ab"),
        round(lit(2.0) * (term(k11, r1, c1, n) + term(k12, r1, c2, n) +
          term(k21, r2, c1, n) + term(k22, r2, c2, n)) * lit(1e6))
          .cast("long").as("g2_micro"))
  }

  /** All per-document analysis columns in one projection. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val cols = qualitySignals(t) ++ Seq(
      "lang_pred" -> langId(t),
      "fingerprint" -> fingerprint(t))
    cols.foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
  }

  /** Flesch reading-ease scoring — the classic curation quality signal
    * for "is this text human-readable prose or keyword soup":
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    * micro-quantized with both ratios as exact integer floor divisions
    * so the score replays bit-for-bit in any engine.
    *
    * Counting is pure regex-count arithmetic chosen to evaluate
    * identically under Java regex and RE2 (no lookaround):
    * words = non-space runs; sentences = [.!?]+ runs (a text with no
    * terminal punctuation counts as ONE sentence — the standard
    * fragment convention); syllables = [aeiouy]+ vowel groups (they
    * never span whitespace, so a whole-text count equals the per-word
    * sum) plus one for each vowel-less word (the min-1-per-word rule;
    * vowel-less words = words − words containing a vowel). Everything
    * is a map-side expression — no shuffle, no UDF; empty/NULL texts
    * surface NULL score.
    *
    * Output: input columns + (n_words, n_sentences, n_syllables,
    * flesch_micro). */
  def readability(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val lower = org.apache.spark.sql.functions.lower(t)
    val nWords = regexp_count(t, lit("\\S+"))
    val nSent = regexp_count(t, lit("[.!?]+"))
    val vowelGroups = regexp_count(lower, lit("[aeiouy]+"))
    val vowelWords = regexp_count(lower, lit("\\S*[aeiouy]\\S*"))
    val nSyll = vowelGroups + (nWords - vowelWords)
    val sEff = greatest(lit(1L), col("n_sentences"))
    val w = col("n_words")
    val score = lit(206835000L) -
      call_function("div", lit(1015000L) * w, sEff) -
      call_function("div", lit(84600000L) * col("n_syllables"), w)
    df.withColumn("n_words", nWords.cast("long"))
      .withColumn("n_sentences", nSent.cast("long"))
      .withColumn("n_syllables", nSyll.cast("long"))
      .withColumn("flesch_micro", when(w > 0L, score))
  }

  /** C4/Gopher-style corpus quality filters (Raffel et al. 2020 §2.2,
    * Rae et al. 2021 A1.1) — the rule battery a pretraining pipeline
    * runs per document before anything expensive: word count, mean
    * word length, alphabetic ratio, line count, terminal punctuation,
    * and the boilerplate markers (braces = code/markup leakage, "lorem
    * ipsum" = placeholder text, "javascript" = cookie/JS-warning
    * chrome). `keep` is the Gopher band: 50–100k words, mean word
    * length 3–10 chars, ≥ 70% alphabetic.
    *
    * EXACT and engine-portable by construction: counts come from pure
    * length/replace arithmetic (words = spaces+1 after whitespace
    * collapse; lines = newlines+1), character classes from one
    * replace-all regex, ratios via the half-up divmod split — no
    * tokenizer, no float, so DuckDB replays the flags bit-for-bit.
    * Plan: a single codegen'd projection — zero shuffle, zero UDF; at
    * 100 TB this runs at scan speed and is the cheapest prune in the
    * pipeline, which is exactly where a 40–60% corpus cut belongs. */
  /** C4 line-level page cleaning (Raffel et al. 2020 §2.2) — the actual
    * REWRITE the paper applies before span dedup, where
    * [[qualityFilters]] is the page-level report face. Per line (split
    * on `\n`, each whitespace-normalized): keep iff it ends in terminal
    * punctuation (`.` `!` `?` `"` — the qualityFilters set), carries at
    * least `minWords` words, and does not mention "javascript"
    * (case-insensitive). The page re-emits as the kept lines joined by
    * newline; it SURVIVES iff the cleaned text carries at least 3
    * C4-convention sentences (terminated `[.!?]` runs) and the RAW page
    * had neither `{` nor "lorem ipsum" (the paper's code/placeholder
    * page drops). Every input document surfaces — `keep_page` is the
    * verdict, the cleaned text is usable either way. One codegen'd
    * projection, zero shuffle at any scale. */
  def c4LineClean(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minWords: Int = 5): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1: $minWords")
    val t = coalesce(col(textCol), lit(""))
    val lines = split(t, "\n")
    val kept = filter(
      transform(lines, l => trim(regexp_replace(l, WhitespaceClass, " "))),
      l => length(l) > 0 &&
        call_function("right", l, lit(1)).isin(".", "!", "?", "\"") &&
        size(split(l, " ")) >= minWords &&
        instr(lower(l), "javascript") === 0)
    df.select(col(idCol), t.as("__raw"),
        array_join(kept, "\n").as("cleaned_text"),
        size(kept).cast("int").as("n_lines_kept"))
      .withColumn("n_sentences",
        size(regexp_extract_all(col("cleaned_text"), lit("[^.!?]+[.!?]+"), lit(0)))
          .cast("int"))
      .withColumn("keep_page",
        col("n_sentences") >= 3 && instr(col("__raw"), "{") === 0 &&
          instr(lower(col("__raw")), "lorem ipsum") === 0)
      .drop("__raw")
  }

  def qualityFilters(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // explicit whitespace class, NOT \s: Java \s matches \x0B while
    // RE2 (DuckDB) \s does not — the shared class keeps the word-count
    // arithmetic bit-identical across both engines
    val norm = trim(regexp_replace(t, WhitespaceClass, " "))
    val nWords = when(length(norm) === 0, lit(0L))
      .otherwise((length(norm) - length(regexp_replace(norm, " ", "")) + 1)
        .cast("long"))
    val nonSpace = length(regexp_replace(norm, " ", "")).cast("long")
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast("long")
    val nLines = when(length(t) === 0, lit(0L))
      .otherwise((length(t) - length(regexp_replace(t, "\n", "")) + 1)
        .cast("long"))
    // half-up integer ratios: (2·num·scale + den) div (2·den)
    def ratioMicro(num: Column, den: Column): Column =
      when(den > 0L,
        call_function("div", num * lit(2000000L) + den, den * 2))
    val meanWl = ratioMicro(nonSpace, nWords)
    val alphaR = ratioMicro(nAlpha, length(t).cast("long"))
    val lowered = lower(t)
    df.withColumn("n_words", nWords)
      .withColumn("n_lines", nLines)
      .withColumn("mean_word_len_micro", meanWl)
      .withColumn("alpha_ratio_micro", alphaR)
      .withColumn("has_brace", instr(t, "{") > 0)
      .withColumn("has_lorem", instr(lowered, "lorem ipsum") > 0)
      .withColumn("has_js", instr(lowered, "javascript") > 0)
      .withColumn("terminal_punct",
        call_function("right", norm, lit(1)).isin(".", "!", "?", "\""))
      .withColumn("keep",
        nWords >= 50L && nWords <= 100000L &&
          coalesce(meanWl >= 3000000L && meanWl <= 10000000L, lit(false)) &&
          coalesce(alphaR >= 700000L, lit(false)) &&
          instr(t, "{") === 0 && instr(lowered, "lorem ipsum") === 0 &&
          instr(lowered, "javascript") === 0)
  }
}
